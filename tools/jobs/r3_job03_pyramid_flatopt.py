"""Round-3 job 03: measure the block-pyramid tile extraction, the flat
(raveled) optimizer, the trimesh walls kernel on real TPU, and microbench
the pack_shuffle stages.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np
import jax
import jax.numpy as jnp

from wiki_grx_gym_tpu.envs import task_registry
from tools.jobs.r3_job02_attribution import out, timed_chain, timed_rb, terrain_study, update_study


def pack_stage_bench(num_envs):
    from tools.jobs.r3_job01_terrain_and_update import fake_batch
    from wiki_grx_gym_tpu.learn.networks import ActorCritic
    from wiki_grx_gym_tpu.learn.ppo import PPO

    env_cfg, train_cfg = task_registry.get_cfgs("GR1T1")
    t = int(train_cfg.runner.num_steps_per_env)
    net = ActorCritic(39, 168, 10, train_cfg.policy)
    alg = PPO(net, train_cfg.algorithm)
    batch, returns, adv = fake_batch(alg, net, t, num_envs, 39, 168, 10, jax.random.PRNGKey(1))

    full = jax.jit(lambda k: alg._pack_shuffle(batch, returns, adv, k)[0])
    t_full = timed_rb(full, jax.random.PRNGKey(2), iters=20)

    # concat-only (both dtype groups)
    def concat_only(_):
        w = jnp.concatenate(
            [batch.obs.astype(alg.storage_dtype), batch.critic_obs.astype(alg.storage_dtype)],
            axis=-1,
        )
        f = jnp.concatenate(
            [batch.actions, batch.log_prob[..., None], batch.mu, batch.sigma,
             batch.values[..., None], returns[..., None], adv[..., None]], axis=-1,
        )
        return w, f

    t_concat = timed_rb(jax.jit(concat_only), 0, iters=20)

    # take-only from pre-packed
    w, f = jax.jit(concat_only)(0)
    nb = t * (num_envs // 16)
    perm = jax.random.permutation(jax.random.PRNGKey(3), nb)

    def take_only(p):
        ww = w.reshape(nb, -1)
        ff = f.reshape(nb, -1)
        return jnp.take(ww, p, axis=0), jnp.take(ff, p, axis=0)

    t_take = timed_rb(jax.jit(take_only), perm, iters=20)
    out("pack_stages", num_envs=num_envs, full_ms=t_full * 1e3,
        concat_ms=t_concat * 1e3, take_ms=t_take * 1e3)


def plane_iter(num_envs):
    env_cfg, train_cfg = task_registry.get_cfgs("GR1T1")
    env_cfg.env.num_envs = num_envs
    env, _ = task_registry.make_env("GR1T1", env_cfg=env_cfg)
    runner, _ = task_registry.make_alg_runner(env, "GR1T1", train_cfg=train_cfg, log_root=None)
    state = runner.init_state(init_at_random_ep_len=True)
    iter_t, _ = timed_chain(lambda s: runner._train_iter(s)[0], state, iters=15)
    out("plane_iter", num_envs=num_envs,
        fps=runner.num_steps_per_env * num_envs / iter_t, iter_ms=iter_t * 1e3)


def main():
    out("env", platform=jax.devices()[0].platform)
    stages = [
        ("hf", lambda: terrain_study("heightfield")),
        ("tm", lambda: terrain_study("trimesh")),
        ("p4", lambda: plane_iter(4096)),
        ("p8", lambda: plane_iter(8192)),
        ("u4", lambda: update_study(4096, tag="_flat")),
        ("u8", lambda: update_study(8192, tag="_flat")),
        ("pk4", lambda: pack_stage_bench(4096)),
        ("pk8", lambda: pack_stage_bench(8192)),
    ]
    for name, fn in stages:
        try:
            fn()
        except Exception as e:
            out("stage_error", stage=name, error=repr(e)[:500])


if __name__ == "__main__":
    main()
