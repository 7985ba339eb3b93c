"""Round-3 job 05: attribute the in-iteration learn-phase gap and A/B the
bf16-activation update path (algorithm.update_dtype).

j04 found: iter 82.1 ms at 4096 = collection 26.8 + learn 55.3, but the
update alone extrapolates to pack 6.4 + 5 epochs x 6.64 = 39.6 ms. This job
times incremental jit variants of the real iteration (same donation, same
layouts) to place the missing ~15 ms, then measures update_dtype=bfloat16
vs float32 in the full iteration.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np
import jax
import jax.numpy as jnp

from wiki_grx_gym_tpu.envs import task_registry
from tools.jobs.r3_job02_attribution import out, timed_chain, timed_rb


def make_runner(num_envs, update_dtype=None):
    env_cfg, train_cfg = task_registry.get_cfgs("GR1T1")
    env_cfg.env.num_envs = num_envs
    if update_dtype is not None:
        train_cfg.algorithm.update_dtype = update_dtype
    env, _ = task_registry.make_env("GR1T1", env_cfg=env_cfg)
    runner, _ = task_registry.make_alg_runner(env, "GR1T1", train_cfg=train_cfg, log_root=None)
    return env, runner


def attribution(num_envs):
    env, runner = make_runner(num_envs, update_dtype="float32")
    alg, net = runner.alg, runner.net
    state0 = runner.init_state(init_at_random_ep_len=True)

    # full iteration (the headline)
    full_t, state = timed_chain(lambda s: runner._train_iter(s)[0], state0, iters=15)

    # variant A: rollout only (returns the new runner state pieces)
    def v_rollout(s):
        env_state, obs, critic_obs, key, hidden, acc, batch = runner._rollout(
            s.env_state, s.obs, s.critic_obs, s.ppo.params, s.rng, s.hidden
        )
        return s.replace(env_state=env_state, obs=obs, critic_obs=critic_obs, rng=key)

    ra_t, _ = timed_chain(jax.jit(v_rollout), state, iters=15)

    # variant B: rollout + GAE (last_values + compute_returns), reduce to scalar
    def v_gae(s):
        env_state, obs, critic_obs, key, hidden, acc, batch = runner._rollout(
            s.env_state, s.obs, s.critic_obs, s.ppo.params, s.rng, s.hidden
        )
        last_values = net.evaluate(s.ppo.params, critic_obs)
        returns, advantages = alg.compute_returns(batch, last_values)
        s = s.replace(env_state=env_state, obs=obs, critic_obs=critic_obs, rng=key)
        return s, jnp.sum(returns) + jnp.sum(advantages)

    def chain_b(s):
        s, _ = jax.jit(v_gae)(s)
        return s

    rb_t, _ = timed_chain(chain_b, state, iters=15)

    # variant C: rollout + GAE + update (no metric reductions)
    def v_update(s):
        key, k_update = jax.random.split(s.rng)
        env_state, obs, critic_obs, key, hidden, acc, batch = runner._rollout(
            s.env_state, s.obs, s.critic_obs, s.ppo.params, key, s.hidden
        )
        last_values = net.evaluate(s.ppo.params, critic_obs)
        returns, advantages = alg.compute_returns(batch, last_values)
        ppo_state, _ = alg.update(s.ppo, batch, returns, advantages, k_update)
        return s.replace(env_state=env_state, obs=obs, critic_obs=critic_obs,
                         rng=key, ppo=ppo_state)

    rc_t, _ = timed_chain(jax.jit(v_update), state, iters=15)

    out("attribution", num_envs=num_envs, full_ms=full_t * 1e3,
        rollout_ms=ra_t * 1e3, rollout_gae_ms=rb_t * 1e3,
        rollout_gae_update_ms=rc_t * 1e3,
        gae_delta_ms=(rb_t - ra_t) * 1e3,
        update_delta_ms=(rc_t - rb_t) * 1e3,
        metrics_delta_ms=(full_t - rc_t) * 1e3)


def ab_update_dtype(num_envs):
    res = {}
    for name in ("float32", "bfloat16"):
        env, runner = make_runner(num_envs, update_dtype=name)
        state = runner.init_state(init_at_random_ep_len=True)
        t, _ = timed_chain(lambda s: runner._train_iter(s)[0], state, iters=15)
        res[name] = t
        out("iter_dtype", num_envs=num_envs, update_dtype=name,
            iter_ms=t * 1e3, fps=runner.num_steps_per_env * num_envs / t)
    out("ab_update_dtype", num_envs=num_envs,
        speedup=res["float32"] / res["bfloat16"])


def main():
    out("env", platform=jax.devices()[0].platform)
    stages = [
        ("attr4", lambda: attribution(4096)),
        ("ab4", lambda: ab_update_dtype(4096)),
        ("ab8", lambda: ab_update_dtype(8192)),
    ]
    for name, fn in stages:
        try:
            fn()
        except Exception as e:
            out("stage_error", stage=name, error=repr(e)[:500])


if __name__ == "__main__":
    main()
