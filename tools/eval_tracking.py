"""Command-tracking evaluation harness (docs/TRAINING.md methodology).

Loads a trained checkpoint, disables DR/noise/pushes, pins the commanded
velocity per run, and measures mean base-frame velocity + survival over an
evaluation window after a settling transient — the quantitative version of
the reference's human-in-the-loop `play.py` dashboards.

Usage:
    python tools/eval_tracking.py --task GR1T1 [--load_run ...] [--checkpoint N]
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


COMMANDS = [
    # (label, vx, vy, wyaw, measured index into (vx, vy, wyaw))
    ("vx=+0.8", 0.8, 0.0, 0.0, 0),
    ("vx=+0.4", 0.4, 0.0, 0.0, 0),
    ("stand", 0.0, 0.0, 0.0, 0),
    ("vx=-0.4", -0.4, 0.0, 0.0, 0),
    ("vy=+0.3", 0.0, 0.3, 0.0, 1),
    ("wz=+0.8", 0.0, 0.0, 0.8, 2),
]


def evaluate(task: str, load_run=-1, checkpoint=-1, num_envs=64,
             transient=60, window=200, log_root=None, experiment_name=None):
    from wiki_grx_gym_tpu.envs import task_registry
    from wiki_grx_gym_tpu.utils.task_registry import ROOT_DIR, get_load_path

    env_cfg, train_cfg = task_registry.get_cfgs(task)
    env_cfg.env.num_envs = num_envs
    env_cfg.noise.add_noise = False
    env_cfg.commands.resampling_command_interval_s = 1.0e6   # pin commands
    env_cfg.commands.heading_command = False
    dr = env_cfg.domain_rand
    dr.randomize_friction = dr.randomize_restitution = False
    dr.randomize_base_mass = dr.randomize_base_com = False
    dr.randomize_motor_strength = dr.push_robots = False
    dr.randomize_init_dof_pos = dr.randomize_init_base_velocity = False
    env, _ = task_registry.make_env(task, env_cfg=env_cfg)

    from wiki_grx_gym_tpu.learn.runner import OnPolicyRunner

    runner = OnPolicyRunner(env, train_cfg, log_dir=None)
    state = runner.init_state()
    root = log_root or os.path.join(
        ROOT_DIR, "logs", experiment_name or train_cfg.runner.experiment_name
    )
    path = get_load_path(root, load_run=load_run, checkpoint=checkpoint)
    print(f"[eval] loading {path}")
    state = runner.load(path, state)
    policy = runner.get_inference_policy(state)

    step = env.step_jit
    results = []
    for label, vx, vy, wz, idx in COMMANDS:
        if hasattr(policy, "reset"):
            policy.reset()
        env_state, out = env.reset(state.env_state)
        obs = out.obs
        cmd = jnp.broadcast_to(jnp.asarray([vx, vy, wz]), (num_envs, 3))
        meas, alive_mask = [], jnp.ones(num_envs, bool)
        for t in range(transient + window):
            env_state = env_state.replace(commands=cmd)
            actions = policy(obs)
            env_state, out = step(env_state, actions)
            obs = out.obs
            alive_mask = alive_mask & ~out.reset
            if t >= transient:
                v = jnp.concatenate(
                    [out.extras["base_lin_vel"][:, :2], out.extras["base_ang_vel"][:, 2:3]],
                    axis=1,
                )
                meas.append(v[:, idx])
        measured = float(jnp.mean(jnp.stack(meas)))
        survival = float(jnp.mean(alive_mask.astype(jnp.float32)))
        target = (vx, vy, wz)[idx]
        track = measured / target * 100.0 if abs(target) > 1e-6 else float("nan")
        results.append((label, target, measured, track, survival))
        print(
            f"[eval] {label:10s} target={target:+.2f} measured={measured:+.3f} "
            f"tracking={track:5.1f}% survival={survival*100:5.1f}%"
        )
    return results


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", default="GR1T1")
    ap.add_argument("--load_run", default=-1)
    ap.add_argument("--checkpoint", type=int, default=-1)
    ap.add_argument("--num_envs", type=int, default=64)
    ap.add_argument("--experiment_name", default=None,
                    help="log dir under logs/ (default: the task's configured "
                         "experiment_name, matching train.py)")
    args = ap.parse_args()
    evaluate(args.task, args.load_run, args.checkpoint, args.num_envs,
             experiment_name=args.experiment_name)
