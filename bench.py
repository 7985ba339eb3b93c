"""Headline benchmark: full-training-iteration throughput on GR1T1.

Metric matches the reference's FPS definition
(`rsl_rl/runners/on_policy_runner.py:235,242`):
``num_steps_per_env * num_envs / (collection_time + learning_time)`` —
i.e., environment steps per wall-clock second including the PPO update.

Baseline anchor: ~100k env-steps/s total for massively-parallel legged-gym
training on one A100 (Rudin et al., arXiv:2109.11978 — linked from the
reference README; the reference itself publishes no numbers, BASELINE.md).

Prints ONE JSON line.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

BASELINE_ENV_STEPS_PER_S = 100_000.0


def main():
    import jax

    from wiki_grx_gym_tpu.envs import task_registry

    platform = jax.devices()[0].platform
    num_envs = 4096 if platform != "cpu" else 256
    iters_timed = 3

    env_cfg, train_cfg = task_registry.get_cfgs("GR1T1")
    env_cfg.env.num_envs = num_envs
    env, _ = task_registry.make_env("GR1T1", env_cfg=env_cfg)
    runner, _ = task_registry.make_alg_runner(env, "GR1T1", train_cfg=train_cfg, log_root=None)

    state = runner.init_state(init_at_random_ep_len=True)
    # warmup / compile
    state, metrics = runner._train_iter(state)
    jax.block_until_ready(metrics)

    t0 = time.perf_counter()
    for _ in range(iters_timed):
        state, metrics = runner._train_iter(state)
    jax.block_until_ready(metrics)
    elapsed = time.perf_counter() - t0

    steps = iters_timed * runner.num_steps_per_env * num_envs
    fps = steps / elapsed
    print(
        json.dumps(
            {
                "metric": "gr1t1_train_env_steps_per_s",
                "value": round(fps, 1),
                "unit": "env_steps/s",
                "vs_baseline": round(fps / BASELINE_ENV_STEPS_PER_S, 3),
                "config": {
                    "num_envs": num_envs,
                    "num_steps_per_env": runner.num_steps_per_env,
                    "platform": platform,
                    "physics_substeps_per_env_step": env.decimation,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
