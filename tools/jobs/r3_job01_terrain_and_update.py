"""Round-3 job 01: measure (a) heightfield-mode training throughput after
the shared-tile-extraction rework, (b) a PPO-update phase study (the update
is the dominant phase per BENCH_r02) across remat/bf16 variants.

Run on the real TPU:  python tools/jobs/r3_job01_terrain_and_update.py
Prints JSON lines; batch everything into this one process (pool-grant wait).
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp

from wiki_grx_gym_tpu.envs import task_registry


def out(tag, **kw):
    print(json.dumps({"tag": tag, **kw}), flush=True)


def timed(fn, *args, iters=20, warmup=3, donate=False):
    o = None
    for _ in range(warmup):
        o = fn(*args)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    if donate:
        s = args[0]
        for _ in range(iters):
            s, m = fn(s, *args[1:])
        jax.block_until_ready(m)
    else:
        for _ in range(iters):
            o = fn(*args)
        jax.block_until_ready(o)
    return (time.perf_counter() - t0) / iters


def bench_train(num_envs, terrain=False, iters=20, alg_overrides=None,
                policy_overrides=None):
    env_cfg, train_cfg = task_registry.get_cfgs("GR1T1")
    env_cfg.env.num_envs = num_envs
    if terrain:
        env_cfg.terrain.mesh_type = "heightfield"
        env_cfg.terrain.curriculum = True
    for k, v in (alg_overrides or {}).items():
        setattr(train_cfg.algorithm, k, v)
    for k, v in (policy_overrides or {}).items():
        setattr(train_cfg.policy, k, v)
    env, _ = task_registry.make_env("GR1T1", env_cfg=env_cfg)
    runner, _ = task_registry.make_alg_runner(env, "GR1T1", train_cfg=train_cfg, log_root=None)
    state = runner.init_state(init_at_random_ep_len=True)

    s, m = runner._train_iter(state)
    jax.block_until_ready(m)
    t0 = time.perf_counter()
    for _ in range(iters):
        s, m = runner._train_iter(s)
    jax.block_until_ready(m)
    iter_t = (time.perf_counter() - t0) / iters

    rollout_jit = jax.jit(
        lambda st: runner._rollout(
            st.env_state, st.obs, st.critic_obs, st.ppo.params, st.rng, st.hidden
        )
    )
    coll_t = timed(rollout_jit, s, iters=max(iters // 2, 5))
    # bare env.step
    step_t = timed(
        env.step_jit, s.env_state, jnp.zeros((num_envs, env.num_actions)),
        iters=max(iters // 2, 5),
    )
    return {
        "num_envs": num_envs,
        "fps": runner.num_steps_per_env * num_envs / iter_t,
        "iter_ms": iter_t * 1e3,
        "collection_ms": coll_t * 1e3,
        "learn_ms": (iter_t - coll_t) * 1e3,
        "env_step_ms": step_t * 1e3,
    }


def fake_batch(alg, net, t, n, obs_dim, pri_dim, a_dim, key):
    from wiki_grx_gym_tpu.learn.ppo import Transition

    ks = jax.random.split(key, 10)
    obs = jax.random.normal(ks[0], (t, n, obs_dim))
    cobs = jax.random.normal(ks[1], (t, n, pri_dim))
    mu = jax.random.normal(ks[2], (t, n, a_dim)) * 0.1
    sigma = jnp.full((t, n, a_dim), 0.2)
    actions = mu + sigma * jax.random.normal(ks[3], (t, n, a_dim))
    logp = net.log_prob(mu, sigma, actions)
    batch = Transition(
        obs=obs, critic_obs=cobs, actions=actions,
        rewards=jax.random.normal(ks[4], (t, n)) * 0.1,
        dones=jax.random.bernoulli(ks[5], 0.01, (t, n)),
        values=jax.random.normal(ks[6], (t, n)) * 0.1,
        log_prob=logp, mu=mu, sigma=sigma,
    )
    last_values = jax.random.normal(ks[7], (n,)) * 0.1
    returns, adv = alg.compute_returns(batch, last_values)
    return batch, returns, adv


def update_study(num_envs, variants):
    env_cfg, train_cfg = task_registry.get_cfgs("GR1T1")
    t = int(train_cfg.runner.num_steps_per_env)
    obs_dim, pri_dim, a_dim = 39, 168, 10

    for name, (alg_over, pol_over) in variants.items():
        for k, v in alg_over.items():
            setattr(train_cfg.algorithm, k, v)
        for k, v in pol_over.items():
            setattr(train_cfg.policy, k, v)
        from wiki_grx_gym_tpu.learn.networks import ActorCritic
        from wiki_grx_gym_tpu.learn.ppo import PPO

        net = ActorCritic(obs_dim, pri_dim, a_dim, train_cfg.policy)
        alg = PPO(net, train_cfg.algorithm)
        params = net.init(jax.random.PRNGKey(0))
        ppo_state = alg.init(params)
        batch, returns, adv = fake_batch(
            alg, net, t, num_envs, obs_dim, pri_dim, a_dim, jax.random.PRNGKey(1)
        )
        upd = jax.jit(alg.update)
        tt = timed(upd, ppo_state, batch, returns, adv, jax.random.PRNGKey(2), iters=10)

        # single grad step on a fixed minibatch (to split shuffle vs grad time)
        mb_rows = t * num_envs // alg.num_mini_batches
        mb = {
            "obs": batch.obs.reshape(-1, obs_dim)[:mb_rows],
            "critic_obs": batch.critic_obs.reshape(-1, pri_dim)[:mb_rows],
            "actions": batch.actions.reshape(-1, a_dim)[:mb_rows],
            "log_prob": batch.log_prob.reshape(-1)[:mb_rows],
            "mu": batch.mu.reshape(-1, a_dim)[:mb_rows],
            "sigma": batch.sigma.reshape(-1, a_dim)[:mb_rows],
            "values": batch.values.reshape(-1)[:mb_rows],
            "returns": returns.reshape(-1)[:mb_rows],
            "advantages": adv.reshape(-1)[:mb_rows],
        }
        loss_fn = (
            jax.checkpoint(alg._minibatch_loss) if alg.remat_update
            else alg._minibatch_loss
        )
        grad_fn = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
        gt = timed(grad_fn, params, mb, 1e-4, iters=50)
        n_steps = alg.num_learning_epochs * alg.num_mini_batches
        out(
            "update_variant", variant=name, num_envs=num_envs,
            update_ms=tt * 1e3, grad_step_ms=gt * 1e3,
            grad_steps=n_steps, grad_total_ms=gt * 1e3 * n_steps,
            overhead_ms=(tt - gt * n_steps) * 1e3,
        )


def main():
    out("env", platform=jax.devices()[0].platform, n_dev=len(jax.devices()))

    # (a) heightfield throughput after shared extraction
    r = bench_train(4096, terrain=True, iters=15)
    out("terrain_4096", **r)

    # (b) plane baseline sanity (should be ~82 ms iter)
    r = bench_train(4096, terrain=False, iters=15)
    out("plane_4096", **r)

    # (c) update study
    variants = {
        "base": ({"remat_update": False}, {"compute_dtype": "float32"}),
        "remat": ({"remat_update": True}, {"compute_dtype": "float32"}),
        "bf16": ({"remat_update": False}, {"compute_dtype": "bfloat16"}),
        "remat_bf16": ({"remat_update": True}, {"compute_dtype": "bfloat16"}),
    }
    update_study(4096, variants)
    update_study(8192, variants)


if __name__ == "__main__":
    main()
