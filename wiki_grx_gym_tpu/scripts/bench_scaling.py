"""Scaling-efficiency harness: steps/s per chip as the mesh grows.

On real hardware this measures the multi-chip story SURVEY.md §6 targets
(>=85% 1->N scaling); on a development host it runs the same sharded program
on fake CPU devices:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python -m wiki_grx_gym_tpu.scripts.bench_scaling --envs_per_dev 64

Envs are embarrassingly parallel (zero physics collectives), so the only
cross-chip traffic per iteration is the PPO gradient all-reduce and metric
scalars — scaling should stay near-linear until DCN latency matters.
Prints one JSON line per mesh size.
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs_per_dev", type=int, default=64)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import jax

    from wiki_grx_gym_tpu.envs import task_registry
    from wiki_grx_gym_tpu.learn.runner import OnPolicyRunner
    from wiki_grx_gym_tpu.parallel.mesh import make_mesh
    from wiki_grx_gym_tpu.parallel.sharding import shard_runner_state

    all_devices = jax.devices()
    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= len(all_devices)]
    base_rate = None
    for n in sizes:
        mesh = make_mesh(num_mp=1, devices=all_devices[:n])
        env_cfg, train_cfg = task_registry.get_cfgs("GR1T1")
        env_cfg.env.num_envs = args.envs_per_dev * n
        train_cfg.runner.num_steps_per_env = args.steps
        train_cfg.algorithm.num_mini_batches = 4
        train_cfg.algorithm.num_learning_epochs = 2
        env, _ = task_registry.make_env("GR1T1", env_cfg=env_cfg)
        runner = OnPolicyRunner(env, train_cfg, log_dir=None, mesh=mesh)
        state = runner.init_state(init_at_random_ep_len=True)
        state = shard_runner_state(state, mesh, env.num_envs)
        state, m = runner._train_iter(state)
        jax.block_until_ready(m)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            state, m = runner._train_iter(state)
        jax.block_until_ready(m)
        dt = time.perf_counter() - t0
        fps = args.iters * args.steps * env.num_envs / dt
        per_dev = fps / n
        if base_rate is None:
            base_rate = per_dev
        print(
            json.dumps(
                {
                    "devices": n,
                    "env_steps_per_s": round(fps, 1),
                    "per_device": round(per_dev, 1),
                    "scaling_efficiency": round(per_dev / base_rate, 3),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
