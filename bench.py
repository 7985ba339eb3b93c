"""Headline benchmark: full-training-iteration throughput on GR1T1.

Metric matches the reference's FPS definition
(`rsl_rl/runners/on_policy_runner.py:235,242`):
``num_steps_per_env * num_envs / (collection_time + learning_time)`` —
i.e., environment steps per wall-clock second including the PPO update.

Baseline anchor: ~100k env-steps/s total for massively-parallel legged-gym
training on one A100 (Rudin et al., arXiv:2109.11978 — linked from the
reference README; the reference itself publishes no numbers, BASELINE.md).

Prints ONE JSON line. The headline is the full-contact-fidelity
(self-collision + anchored stick friction) Pallas-kernel run at 4096 envs;
the breakdown adds the 8192-env datapoint (the reference's default count,
`gr1t1_config.py:15`), the collection/learn phase split, the
reference-equivalent contact subset, and an analytic MFU estimate.
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

# persistent XLA compilation cache: the full-training-iteration programs
# (incl. the Mosaic mega-kernel) take minutes to compile cold; the cache
# makes repeat bench runs start in seconds
try:
    import jax as _jax

    _cache = str(Path(__file__).resolve().parent / ".jax_cache")
    os.makedirs(_cache, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", _cache)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:  # pragma: no cover - cache is best-effort
    pass

BASELINE_ENV_STEPS_PER_S = 100_000.0
V5E_BF16_PEAK = 197e12   # TFLOP/s, one v5e chip (public spec)


def _mlp_flops(dims):
    return 2 * sum(dims[i] * dims[i + 1] for i in range(len(dims) - 1))


def flops_per_iteration(env, runner):
    """Analytic FLOPs of one PPO iteration from static shapes (matmul 2mnk
    convention; physics counted as ~10k scalar FLOPs per env-substep)."""
    t, n = runner.num_steps_per_env, env.num_envs
    pcfg = runner.policy_cfg
    actor = _mlp_flops([env.obs_dim] + list(pcfg.actor_hidden_dims) + [env.num_actions])
    critic = _mlp_flops([env.pri_obs_dim] + list(pcfg.critic_hidden_dims) + [1])
    if getattr(pcfg, "rnn_type", None):  # LSTM memory ahead of each head
        h, nl = pcfg.rnn_hidden_size, pcfg.rnn_num_layers
        cell = 2 * 4 * h * (env.obs_dim + h) + (nl - 1) * 2 * 4 * h * (2 * h)
        cell_c = 2 * 4 * h * (env.pri_obs_dim + h) + (nl - 1) * 2 * 4 * h * (2 * h)
        actor += cell
        critic += cell_c
    rollout = t * n * (actor + 2 * critic)   # act + evaluate + last_values amortized
    alg = runner.alg
    samples = alg.num_learning_epochs * (t * n)
    update = samples * 3 * (actor + critic)  # fwd + bwd (~2x fwd)
    physics = t * n * env.decimation * 10_000
    return rollout + update + physics


def time_fn(fn, *args, iters, warmup=2):
    import jax

    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def bench_config(num_envs, iters, subset=False, platform="tpu", task="GR1T1",
                 mesh_type=None, train_hook=None, env_hook=None):
    import jax

    from wiki_grx_gym_tpu.envs import task_registry

    env_cfg, train_cfg = task_registry.get_cfgs(task)
    env_cfg.env.num_envs = num_envs
    if train_hook is not None:
        train_hook(train_cfg)
    if env_hook is not None:
        env_hook(env_cfg)
    if mesh_type is not None:
        env_cfg.terrain.mesh_type = mesh_type
        env_cfg.terrain.curriculum = True
    if subset:
        # reference-equivalent-or-better contact subset: viscous friction,
        # no self-collision (PhysX defaults exceeded by the full config)
        env_cfg.sim.contact_tangent_stiffness = 0.0
        env_cfg.asset.self_collisions = -1
    env, _ = task_registry.make_env(task, env_cfg=env_cfg)
    runner, _ = task_registry.make_alg_runner(env, task, train_cfg=train_cfg, log_root=None)

    state = runner.init_state(init_at_random_ep_len=True)

    def iter_fn(state):
        return runner._train_iter(state)

    # full iteration (donated state: re-feed the returned one)
    s, m = iter_fn(state)
    jax.block_until_ready(m)
    t0 = time.perf_counter()
    for _ in range(iters):
        s, m = iter_fn(s)
    jax.block_until_ready(m)
    iter_time = (time.perf_counter() - t0) / iters

    fps = runner.num_steps_per_env * num_envs / iter_time
    result = {
        "fps": fps,
        "iter_ms": iter_time * 1e3,
        "pallas": env._pallas_mode() is not None,
    }

    # collection/learn split (on_policy_runner.py:235-244 parity): time the
    # rollout phase alone; learn = iteration - collection
    rollout_jit = jax.jit(
        lambda st: runner._rollout(
            st.env_state, st.obs, st.critic_obs, st.ppo.params, st.rng, st.hidden
        )
    )
    coll_time = time_fn(rollout_jit, s, iters=max(iters // 2, 5))
    result["collection_ms"] = coll_time * 1e3
    result["learn_ms"] = max(iter_time - coll_time, 0.0) * 1e3

    flops = flops_per_iteration(env, runner)
    result["flops_per_iter"] = flops
    result["mfu_vs_bf16_peak"] = flops / iter_time / V5E_BF16_PEAK
    return result


def main():
    import jax

    # the full terrain/model matrix is a separate, slower run (--full);
    # the default run is sized for the driver budget: headline 4096-env
    # config + the reference's default 8192-env datapoint only
    full = "--full" in sys.argv

    platform = jax.devices()[0].platform
    on_tpu = platform != "cpu"
    n_main = 4096 if on_tpu else 256
    iters = 30 if on_tpu else 3

    main_r = bench_config(n_main, iters)
    breakdown = {
        "main": main_r,
    }
    if on_tpu:
        half = max(iters // 2, 10)
        breakdown["envs8192"] = bench_config(8192, half)
    if on_tpu and full:
        breakdown["ref_equiv_subset"] = bench_config(n_main, half, subset=True)
        # terrain modes (the reference's marquee curriculum path +
        # the trimesh stair-riser semantics, terrain_utils.py:286-361)
        breakdown["heightfield"] = bench_config(n_main, half, mesh_type="heightfield")
        breakdown["trimesh"] = bench_config(n_main, half, mesh_type="trimesh")
        # model-family matrix: 32-DOF full body + recurrent policy
        breakdown["full_body"] = bench_config(n_main, half, task="GR1T1_full")
        breakdown["lstm"] = bench_config(n_main, half, task="GR1T1_lstm")

    fps = main_r["fps"]
    print(
        json.dumps(
            {
                "metric": "gr1t1_train_env_steps_per_s",
                "value": round(fps, 1),
                "unit": "env_steps/s",
                "vs_baseline": round(fps / BASELINE_ENV_STEPS_PER_S, 3),
                "config": {
                    "num_envs": n_main,
                    "num_steps_per_env": 64,
                    "platform": platform,
                    "physics_substeps_per_env_step": 10,
                    "contact_fidelity": "full (self-collision + stick friction)",
                    "iters_timed": iters,
                },
                "breakdown": {
                    k: {
                        "env_steps_per_s": round(v["fps"], 1),
                        "iter_ms": round(v["iter_ms"], 2),
                        "collection_ms": round(v["collection_ms"], 2),
                        "learn_ms": round(v["learn_ms"], 2),
                        "pallas_kernel": v["pallas"],
                        "flops_per_iter": v["flops_per_iter"],
                        "mfu_vs_v5e_bf16_peak": round(v["mfu_vs_bf16_peak"], 4),
                    }
                    for k, v in breakdown.items()
                },
            }
        )
    )


if __name__ == "__main__":
    main()
