"""Round-4 job 03: measure the post-physics fold + update-phase attribution.

1. bench at 4096/8192 envs (plane; the fold is active on the kernel path)
   -> collection/learn split vs job01's pre-fold numbers.
2. Update-phase micro-attribution at 4096 envs (VERDICT item 3:
   0.266 ms/grad-step vs ~0.19-0.20 roofline):
     - pack (_pack_shuffle) alone,
     - full update,
     - pure grad+Adam scan on a FIXED materialized minibatch (isolates the
       per-step get_mb slice cost),
     - variants: update_dtype f32, remat, shuffle_block 64.
3. Post-fold plane training revalidation: 1000 iters + tracking eval
   (the shipped-code path; job02's plane run predates the fold).
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp
import numpy as np
import optax

import bench
from tools.jobs.r4_job02_reval import PLANE_COMMANDS, eval_tracking, train_run


def out(_tag, **kw):
    print(json.dumps({"tag": _tag, **kw}), flush=True)


def time_fn(fn, *args, iters=20, warmup=2):
    o = None
    for _ in range(warmup):
        o = fn(*args)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(iters):
        o = fn(*args)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / iters


def build(num_envs=4096, **alg_over):
    from wiki_grx_gym_tpu.envs import task_registry

    env_cfg, train_cfg = task_registry.get_cfgs("GR1T1")
    env_cfg.env.num_envs = num_envs
    for k, v in alg_over.items():
        setattr(train_cfg.algorithm, k, v)
    env, _ = task_registry.make_env("GR1T1", env_cfg=env_cfg)
    runner, _ = task_registry.make_alg_runner(env, "GR1T1", train_cfg=train_cfg, log_root=None)
    return env, runner


def update_micro(tag, num_envs=4096, **alg_over):
    env, runner = build(num_envs, **alg_over)
    alg = runner.alg
    state = runner.init_state(init_at_random_ep_len=True)

    rollout = jax.jit(
        lambda st: runner._rollout(st.env_state, st.obs, st.critic_obs,
                                   st.ppo.params, st.rng)
    )
    env_state, obs, critic_obs, key, hidden, accm, batch, packed = rollout(state)
    last_values = runner.net.evaluate(state.ppo.params, critic_obs)
    returns, advantages = jax.jit(alg.compute_returns)(batch, last_values)
    k = jax.random.PRNGKey(0)
    ws = (env.obs_dim, critic_obs.shape[-1])

    pack = jax.jit(
        # [0]/[3] = the two shuffled buffers; the remaining tuple entries
        # are python ints/strings (not jittable return types)
        lambda b, r, a, p: alg._pack_shuffle(
            b, r, a, k, packed_wide=p, wide_sizes=ws
        )[0:4:3]
    )
    t_pack = time_fn(pack, batch, returns, advantages, packed, iters=10)
    out("update_micro_part", variant=tag, what="pack", ms=round(t_pack * 1e3, 3))

    upd = jax.jit(
        lambda ps, b, r, a, p: alg.update(ps, b, r, a, k, packed_wide=p, wide_sizes=ws)
    )
    t_upd = time_fn(upd, state.ppo, batch, returns, advantages, packed, iters=10)
    out("update_micro_part", variant=tag, what="update", ms=round(t_upd * 1e3, 3))

    # pure grad+clip+Adam scan on one fixed minibatch (no get_mb slicing)
    from jax.flatten_util import ravel_pytree

    n_steps = alg.num_learning_epochs * alg.num_mini_batches
    b_rows = (runner.num_steps_per_env * num_envs) // alg.num_mini_batches
    rng = np.random.RandomState(0)
    na = env.num_actions
    mb = {
        "obs": jnp.asarray(rng.randn(b_rows, env.obs_dim), alg.storage_dtype),
        "critic_obs": jnp.asarray(rng.randn(b_rows, ws[1]), alg.storage_dtype),
        "actions": jnp.asarray(rng.randn(b_rows, na), jnp.float32),
        "log_prob": jnp.asarray(rng.randn(b_rows), jnp.float32),
        "mu": jnp.asarray(rng.randn(b_rows, na), jnp.float32),
        "sigma": jnp.asarray(0.5 + rng.rand(b_rows, na), jnp.float32),
        "values": jnp.asarray(rng.randn(b_rows), jnp.float32),
        "returns": jnp.asarray(rng.randn(b_rows), jnp.float32),
        "advantages": jnp.asarray(rng.randn(b_rows), jnp.float32),
    }
    p0, unravel = ravel_pytree(state.ppo.params)
    grad_fn = jax.value_and_grad(
        lambda fp, m: alg._minibatch_loss(unravel(fp), m, None), has_aux=True
    )

    def mb_step(carry, _):
        params, opt_state = carry
        (_, aux), g = grad_fn(params, mb)
        upds, opt_state = alg.tx.update(g, opt_state, params)
        params = optax.apply_updates(params, upds)
        return (params, opt_state), aux["kl"]

    fixed = jax.jit(
        lambda p, o: jax.lax.scan(mb_step, (p, o), None, length=n_steps)[0][0]
    )
    t_fixed = time_fn(fixed, p0, state.ppo.opt_state, iters=10)

    out("update_micro", tag=tag, num_envs=num_envs,
        pack_ms=round(t_pack * 1e3, 3),
        update_ms=round(t_upd * 1e3, 3),
        epochs_ms=round((t_upd - t_pack) * 1e3, 3),
        per_grad_step_ms=round((t_upd - t_pack) / n_steps * 1e3, 4),
        fixed_mb_scan_ms=round(t_fixed * 1e3, 3),
        fixed_per_step_ms=round(t_fixed / n_steps * 1e3, 4),
        n_steps=n_steps, b_rows=b_rows)


def rollout_micro(num_envs=4096):
    env, runner = build(num_envs)
    state = runner.init_state(init_at_random_ep_len=True)
    es = state.env_state
    actions = 0.3 * jax.random.normal(jax.random.PRNGKey(2), (num_envs, env.num_actions))
    delay = jnp.zeros((num_envs, 1))

    deci = jax.jit(
        lambda s, a, d: env._run_decimation(s, a, d, commands=s.commands[:, :3])
    )
    t_deci = time_fn(deci, es, actions, delay, iters=20)

    step = jax.jit(env.step)
    t_step = time_fn(lambda s, a: step(s, a)[1].rew, es, actions, iters=20)

    net, params = runner.net, state.ppo.params
    act = jax.jit(
        lambda p, o, co, k: (net.act(p, o, k), net.evaluate(p, co))
    )
    t_act = time_fn(act, params, state.obs, state.critic_obs,
                    jax.random.PRNGKey(3), iters=20)

    out("rollout_micro", num_envs=num_envs,
        kernel_ms=round(t_deci * 1e3, 3),
        full_step_ms=round(t_step * 1e3, 3),
        post_xla_ms=round((t_step - t_deci) * 1e3, 3),
        policy_fwd_ms=round(t_act * 1e3, 3))


def main():
    out("env", platform=jax.devices()[0].platform)

    if "--skip-perf" not in sys.argv:
        for n, iters in ((4096, 30), (8192, 15)):
            r = bench.bench_config(n, iters)
            out("perf", num_envs=n, fps=round(r["fps"], 1), iter_ms=round(r["iter_ms"], 2),
                collection_ms=round(r["collection_ms"], 2),
                learn_ms=round(r["learn_ms"], 2), mfu=round(r["mfu_vs_bf16_peak"], 4))

        rollout_micro()

    update_micro("base")
    update_micro("ud_f32", update_dtype="float32")
    update_micro("remat", remat_update=True)
    update_micro("sb64", shuffle_block=64)

    params = train_run("plane_postfold")
    eval_tracking(params, "GR1T1", None, PLANE_COMMANDS)

    out("done")


if __name__ == "__main__":
    main()
