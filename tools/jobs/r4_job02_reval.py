"""Round-4 job 02: the end-to-end training revalidation round 3 never
finished (VERDICT items 2, 7, 9).

One process (pool-grant wait is per process):
  1. plane, 1000 iters @ 4096 envs, shipped defaults -> tracking eval;
  2. heightfield (curriculum), 1000 iters -> tracking eval, plus a
     per-terrain-level wz breakdown (VERDICT item 7: wz tracking was 69.7%);
  3. trimesh (riser walls), 1000 iters -> tracking eval;
  4. GR1T1_full (32-DOF full body), 2000 iters -> plane tracking eval
     (VERDICT item 9; reference full-body config gr1t1_config.py:12-345).

Evals follow docs/TRAINING.md protocol: 64 envs, DR/noise/push off, fixed
command held, 60-step transient then 200-step measurement window; reference
eval flow legged_gym/scripts/play.py:96-137.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp


def out(_tag, **kw):
    print(json.dumps({"tag": _tag, **kw}), flush=True)


PLANE_COMMANDS = [
    ("vx=+0.8", 0.8, 0.0, 0.0, 0),
    ("vx=+0.4", 0.4, 0.0, 0.0, 0),
    ("stand", 0.0, 0.0, 0.0, 0),
    ("vx=-0.4", -0.4, 0.0, 0.0, 0),
    ("vy=+0.3", 0.0, 0.3, 0.0, 1),
    ("wz=+0.8", 0.0, 0.0, 0.8, 2),
]
TERRAIN_COMMANDS = [
    ("vx=+0.6", 0.6, 0.0, 0.0, 0),
    ("vx=+0.4", 0.4, 0.0, 0.0, 0),
    ("vx=-0.4", -0.4, 0.0, 0.0, 0),
    ("wz=+0.8", 0.0, 0.0, 0.8, 2),
]


def make_eval_env(task, mesh_type, num_envs):
    from wiki_grx_gym_tpu.envs import task_registry
    from wiki_grx_gym_tpu.learn.runner import OnPolicyRunner

    env_cfg, train_cfg = task_registry.get_cfgs(task)
    env_cfg.env.num_envs = num_envs
    env_cfg.noise.add_noise = False
    env_cfg.commands.resampling_command_interval_s = 1.0e6
    env_cfg.commands.heading_command = False
    dr = env_cfg.domain_rand
    dr.randomize_friction = dr.randomize_restitution = False
    dr.randomize_base_mass = dr.randomize_base_com = False
    dr.randomize_motor_strength = dr.push_robots = False
    dr.randomize_init_dof_pos = dr.randomize_init_base_velocity = False
    if mesh_type is not None:
        env_cfg.terrain.mesh_type = mesh_type
        env_cfg.terrain.curriculum = True
    env, _ = task_registry.make_env(task, env_cfg=env_cfg)
    runner = OnPolicyRunner(env, train_cfg, log_dir=None)
    return env, runner


def eval_tracking(params, task, mesh_type, commands, num_envs=64,
                  transient=60, window=200, level=None):
    """level: if set, pin every env's terrain level (heightfield wz
    investigation — does tracking degrade with difficulty?)."""
    env, runner = make_eval_env(task, mesh_type, num_envs)
    state = runner.init_state()
    state = state.replace(ppo=state.ppo.replace(params=params))
    policy = runner.get_inference_policy(state)
    step = env.step_jit

    rows = []
    for label, vx, vy, wz, idx in commands:
        if hasattr(policy, "reset"):
            policy.reset()
        env_state = state.env_state
        if level is not None and hasattr(env_state, "terrain_levels"):
            # pin the level AND move the spawn origins to that level's row
            # (reset alone keeps the init-sampled origins; legged_env
            # _reset_where only recomputes origins on curriculum updates)
            lv = jnp.full((num_envs,), level, env_state.terrain_levels.dtype)
            env_state = env_state.replace(
                terrain_levels=lv,
                env_origins=env.terrain.terrain_origins[lv, env_state.terrain_types],
            )
        env_state, o = env.reset(env_state)
        obs = o.obs
        cmd = jnp.broadcast_to(jnp.asarray([vx, vy, wz]), (num_envs, 3))
        meas, alive = [], jnp.ones(num_envs, bool)
        for t in range(transient + window):
            env_state = env_state.replace(commands=cmd)
            actions = policy(obs)
            env_state, o = step(env_state, actions)
            obs = o.obs
            alive = alive & ~o.reset
            if t >= transient:
                v = jnp.concatenate(
                    [o.extras["base_lin_vel"][:, :2], o.extras["base_ang_vel"][:, 2:3]],
                    axis=1,
                )
                meas.append(v[:, idx])
        measured = float(jnp.mean(jnp.stack(meas)))
        survival = float(jnp.mean(alive.astype(jnp.float32)))
        target = (vx, vy, wz)[idx]
        track = measured / target * 100.0 if abs(target) > 1e-6 else float("nan")
        rows.append({"cmd": label, "target": target, "measured": round(measured, 3),
                     "tracking_pct": round(track, 1),
                     "survival_pct": round(survival * 100, 1)})
        out("eval", mesh=mesh_type or "plane", level=level, **rows[-1])
    return rows


def train_run(run, mesh_type=None, iters=1000, num_envs=4096, task="GR1T1"):
    from wiki_grx_gym_tpu.envs import task_registry

    env_cfg, train_cfg = task_registry.get_cfgs(task)
    env_cfg.env.num_envs = num_envs
    if mesh_type is not None:
        env_cfg.terrain.mesh_type = mesh_type
        env_cfg.terrain.curriculum = True
    env, _ = task_registry.make_env(task, env_cfg=env_cfg)
    runner, _ = task_registry.make_alg_runner(env, task, train_cfg=train_cfg, log_root=None)
    state = runner.init_state(init_at_random_ep_len=True)
    t0 = time.time()
    state = runner.learn(iters, state=state)
    wall = time.time() - t0
    fps = iters * runner.num_steps_per_env * num_envs / wall
    out("train", run=run, iters=iters, wall_s=round(wall, 1),
        sustained_fps=round(fps, 1))
    return jax.device_get(state.ppo.params)


def main():
    out("env", platform=jax.devices()[0].platform)

    params = train_run("plane")
    eval_tracking(params, "GR1T1", None, PLANE_COMMANDS)

    params = train_run("heightfield", mesh_type="heightfield")
    eval_tracking(params, "GR1T1", "heightfield", TERRAIN_COMMANDS)
    # wz-by-difficulty breakdown (VERDICT item 7)
    for level in (0, 2, 4):
        eval_tracking(params, "GR1T1", "heightfield",
                      [("wz=+0.8", 0.0, 0.0, 0.8, 2), ("vx=+0.4", 0.4, 0.0, 0.0, 0)],
                      level=level)

    params = train_run("trimesh", mesh_type="trimesh")
    eval_tracking(params, "GR1T1", "trimesh", TERRAIN_COMMANDS)

    params = train_run("full_body", iters=2000, task="GR1T1_full")
    eval_tracking(params, "GR1T1_full", None, PLANE_COMMANDS)

    out("done")


if __name__ == "__main__":
    main()
