"""Round-3 job 08: measure + revalidate the fused-update rework.

Changes under test (vs commit 579f5ec):
  - joint_mean_value: actor+critic as one batched-matmul trunk (rollout
    forward AND every PPO grad step);
  - in-rollout packing: obs||critic_obs concatenated to storage_dtype inside
    the rollout scan; the update's wide pack pass reduces to reshape+gather
    and the f32 obs stores are dead-code-eliminated.

Plan (one process — pool-grant wait is per process):
  1. perf: full-iteration time + collection/learn split at 4096 and 8192
     envs (plane), via bench.bench_config;
  2. training revalidation, 1000 iterations @ 4096 envs each:
     plane, heightfield (curriculum), trimesh (riser walls) —
     each followed by a deterministic tracking eval (docs/TRAINING.md
     protocol; terrain evals on mixed levels 0-5).

Run:  env -u nothing python tools/jobs/r3_job08_fused_update.py > tools/jobs/r3_job08.out 2>&1
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


def eval_tracking(params, task, mesh_type, commands, num_envs=64,
                  transient=60, window=200):
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
    state = runner.init_state()
    state = state.replace(ppo=state.ppo.replace(params=params))
    policy = runner.get_inference_policy(state)
    step = env.step_jit

    rows = []
    for label, vx, vy, wz, idx in commands:
        if hasattr(policy, "reset"):
            policy.reset()
        env_state, o = env.reset(state.env_state)
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
                     "tracking_pct": round(track, 1), "survival_pct": round(survival * 100, 1)})
        out("eval", mesh=mesh_type or "plane", **rows[-1])
    return rows


def train_run(tag, mesh_type=None, iters=1000, num_envs=4096, task="GR1T1"):
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
    out("train", run=tag, iters=iters, wall_s=round(wall, 1),
        sustained_fps=round(fps, 1))
    return jax.device_get(state.ppo.params)


def main():
    out("env", platform=jax.devices()[0].platform)

    from bench import bench_config

    for n, iters in ((4096, 30), (8192, 15)):
        r = bench_config(n, iters)
        out("perf", num_envs=n, fps=round(r["fps"], 1), iter_ms=round(r["iter_ms"], 2),
            collection_ms=round(r["collection_ms"], 2), learn_ms=round(r["learn_ms"], 2),
            mfu=round(r["mfu_vs_bf16_peak"], 4))

    params = train_run("plane")
    eval_tracking(params, "GR1T1", None, PLANE_COMMANDS)

    params = train_run("heightfield", mesh_type="heightfield")
    eval_tracking(params, "GR1T1", "heightfield", TERRAIN_COMMANDS)

    params = train_run("trimesh", mesh_type="trimesh")
    eval_tracking(params, "GR1T1", "trimesh", TERRAIN_COMMANDS)

    out("done")


if __name__ == "__main__":
    main()
