"""Offline trajectory visualizer — the headless replacement for the
reference's Vulkan viewer (SURVEY.md N5: viewer out of training scope;
replace with an offline visualizer).

Rolls a policy (or zero actions) in a clean eval env, records base/feet
trajectories and joint states, and renders a multi-panel figure: side/top
base paths, feet height traces with contact shading, joint positions and
torques, and a stick-figure strip of the robot at regular intervals.

    python tools/visualize.py --task GR1T1 [--policy <policy.npz>]
        [--steps 300] [--out traj.png]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def replay(args):
    """Animated 3D skeleton replay of a `play.py --record` artifact — the
    offline counterpart of the reference's live viewer
    (`envs/base/base_task.py:89-150`): FK over the recorded
    (base_pos, base_quat, q) trajectory, rendered as a rotating-free 3D
    line skeleton and saved as a GIF."""
    import jax.numpy as jnp
    import numpy as np

    from wiki_grx_gym_tpu.envs import task_registry
    from wiki_grx_gym_tpu.sim.kinematics import forward_kinematics
    from wiki_grx_gym_tpu.utils import maths

    data = np.load(args.replay, allow_pickle=False)
    task = str(data["task"]) if "task" in data else args.task
    env_cfg, _ = task_registry.get_cfgs(task)
    env_cfg.env.num_envs = 1
    env, _ = task_registry.make_env(task, env_cfg=env_cfg)
    model = env.model
    t_steps = data["q"].shape[0]
    stride = max(1, t_steps // args.frames)
    idxs = np.arange(0, t_steps, stride)

    frames = []
    for k in idxs:
        kin = forward_kinematics(
            model, jnp.asarray(data["base_quat"][k]), jnp.zeros(3), jnp.zeros(3),
            jnp.asarray(data["q"][k]), jnp.zeros(model.num_dof),
        )
        frames.append(np.asarray(data["base_pos"][k]) + np.asarray(kin.pos_rel))
    frames = np.stack(frames)   # (F, B, 3)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib import animation

    fig = plt.figure(figsize=(7, 6))
    ax = fig.add_subplot(projection="3d")
    bones = [(model.parent[i], i) for i in range(1, model.num_bodies)]
    lines = [ax.plot([], [], [], "o-", lw=2, ms=2.5, color="tab:blue")[0] for _ in bones]
    path, = ax.plot([], [], [], "-", lw=0.8, color="tab:gray")
    lo = frames.min(axis=(0, 1)) - 0.2
    hi = frames.max(axis=(0, 1)) + 0.2
    mid, span = (lo + hi) / 2, float(np.max(hi - lo)) / 2
    ax.set_xlim(mid[0] - span, mid[0] + span)
    ax.set_ylim(mid[1] - span, mid[1] + span)
    ax.set_zlim(0.0, 2 * span)
    ax.set(xlabel="x [m]", ylabel="y [m]", zlabel="z [m]", title=f"{task} pose replay")
    # initial camera from the task's viewer config (the reference's
    # set_camera(viewer.pos, viewer.lookat), legged_robot.py:88-95)
    try:
        from wiki_grx_gym_tpu.envs import task_registry

        v = task_registry.get_cfgs(task)[0].viewer
        d = np.asarray(v.lookat, float) - np.asarray(v.pos, float)
        ax.view_init(
            elev=float(np.degrees(np.arctan2(-d[2], np.hypot(d[0], d[1])))),
            azim=float(np.degrees(np.arctan2(d[1], d[0]))),
        )
    except Exception:
        pass  # default matplotlib view

    def draw(f):
        pts = frames[f]
        for ln, (p, i) in zip(lines, bones):
            ln.set_data([pts[p, 0], pts[i, 0]], [pts[p, 1], pts[i, 1]])
            ln.set_3d_properties([pts[p, 2], pts[i, 2]])
        path.set_data(frames[: f + 1, 0, 0], frames[: f + 1, 0, 1])
        path.set_3d_properties(frames[: f + 1, 0, 2])
        return lines + [path]

    dt = float(data["dt"]) if "dt" in data else 0.02
    ani = animation.FuncAnimation(fig, draw, frames=len(frames), blit=True)
    out = args.out if args.out.endswith(".gif") else args.out.rsplit(".", 1)[0] + ".gif"
    ani.save(out, writer=animation.PillowWriter(fps=max(1, int(round(1.0 / (dt * stride))))))
    print(f"saved {out} ({len(frames)} frames)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", default="GR1T1")
    ap.add_argument("--policy", default=None, help=".npz actor export; zero actions if omitted")
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--out", default="trajectory.png")
    ap.add_argument("--command", type=float, nargs=3, default=[0.5, 0.0, 0.0])
    ap.add_argument("--replay", default=None,
                    help="a play.py --record traj.npz: render an animated 3D "
                         "skeleton GIF instead of the trajectory panels")
    ap.add_argument("--frames", type=int, default=120, help="max GIF frames for --replay")
    args = ap.parse_args()

    if args.replay:
        if args.out == "trajectory.png":
            args.out = "replay.gif"
        return replay(args)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from wiki_grx_gym_tpu.envs import task_registry
    from wiki_grx_gym_tpu.sim.kinematics import forward_kinematics

    env_cfg, _ = task_registry.get_cfgs(args.task)
    env_cfg.env.num_envs = 1
    dr = env_cfg.domain_rand
    dr.randomize_friction = dr.randomize_restitution = False
    dr.randomize_base_mass = dr.randomize_base_com = False
    dr.randomize_motor_strength = dr.push_robots = False
    dr.randomize_init_dof_pos = dr.randomize_init_base_velocity = False
    env_cfg.noise.add_noise = False
    env, _ = task_registry.make_env(args.task, env_cfg=env_cfg)

    if args.policy:
        from wiki_grx_gym_tpu.utils.helpers import load_policy_npz

        policy = load_policy_npz(args.policy)
    else:
        policy = lambda obs: np.zeros((obs.shape[0], env.num_actions), np.float32)

    state = env.init_state(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    state, out = step(state, jnp.zeros((1, env.num_actions)))
    cmd = jnp.asarray([args.command], jnp.float32)

    fb = jnp.asarray(env.feet_bodies, jnp.int32)
    log = {k: [] for k in ("base", "feet", "q", "tau", "contact", "bodies")}
    for _ in range(args.steps):
        state = state.replace(commands=jnp.broadcast_to(cmd, state.commands.shape))
        a = policy(np.asarray(out.obs))
        state, out = step(state, jnp.asarray(a))
        ph = state.physics
        kin = forward_kinematics(
            env.model, ph.base_quat[0], ph.base_ang_vel[0], ph.base_lin_vel[0], ph.q[0], ph.qd[0]
        )
        body_pos = np.asarray(ph.base_pos[0]) + np.asarray(kin.pos_rel)
        log["base"].append(np.asarray(ph.base_pos[0]))
        log["feet"].append(body_pos[np.asarray(fb)])
        log["q"].append(np.asarray(ph.q[0]))
        log["tau"].append(np.asarray(state.torques[0]))
        log["contact"].append(np.asarray(out.pri_obs[0, env.obs_dim + 4 : env.obs_dim + 4 + env.num_feet]))
        log["bodies"].append(body_pos)

    base = np.stack(log["base"])
    feet = np.stack(log["feet"])
    qs = np.stack(log["q"])
    taus = np.stack(log["tau"])
    contact = np.stack(log["contact"])
    bodies = np.stack(log["bodies"])
    t = np.arange(len(base)) * env.dt

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axs = plt.subplots(2, 3, figsize=(16, 9))
    axs[0, 0].plot(base[:, 0], base[:, 2], label="base")
    for f in range(feet.shape[1]):
        axs[0, 0].plot(feet[:, f, 0], feet[:, f, 2], lw=0.8, label=f"foot {f}")
    axs[0, 0].set(title="Side view (x-z)", xlabel="x [m]", ylabel="z [m]")
    axs[0, 0].legend(fontsize="x-small")

    axs[0, 1].plot(base[:, 0], base[:, 1])
    axs[0, 1].set(title="Top view (x-y)", xlabel="x [m]", ylabel="y [m]")
    axs[0, 1].axis("equal")

    for f in range(feet.shape[1]):
        axs[0, 2].plot(t, feet[:, f, 2], label=f"foot {f}")
        in_c = contact[:, f] > 0.5
        axs[0, 2].fill_between(t, 0, 0.02, where=in_c, alpha=0.25)
    axs[0, 2].set(title="Feet height + contact", xlabel="t [s]", ylabel="z [m]")
    axs[0, 2].legend(fontsize="x-small")

    axs[1, 0].plot(t, qs)
    axs[1, 0].set(title="Joint positions", xlabel="t [s]", ylabel="rad")
    axs[1, 1].plot(t, taus)
    axs[1, 1].set(title="Joint torques", xlabel="t [s]", ylabel="Nm")

    # stick-figure strip: body points at regular intervals
    ax = axs[1, 2]
    idxs = np.linspace(0, len(bodies) - 1, 8).astype(int)
    for k in idxs:
        pts = bodies[k]
        ax.scatter(pts[:, 0], pts[:, 2], s=6)
        for i in range(1, env.model.num_bodies):
            p = env.model.parent[i]
            ax.plot([pts[p, 0], pts[i, 0]], [pts[p, 2], pts[i, 2]], "k-", lw=0.6, alpha=0.6)
    ax.set(title="Pose strip (x-z)", xlabel="x [m]", ylabel="z [m]")
    fig.tight_layout()
    fig.savefig(args.out, dpi=110)
    print(f"saved {args.out}; walked {base[-1,0]-base[0,0]:.2f} m in {t[-1]:.1f} s")


if __name__ == "__main__":
    main()
