"""Round-3 job 02: trustworthy timing + attribution.

Job 01's sub-phase timings were implausible (collection_ms=0.28 for a 64-step
rollout) — this job times with (a) chained data dependencies (output fed back
as input) and (b) forced host readback of an output leaf, which is correct
even if block_until_ready misbehaves on the axon-tunneled TPU.

Measures:
  1. probe: block vs readback on a dummy heavy op
  2. terrain (heightfield + trimesh) iteration + env.step + tile-path pieces
  3. PPO update attribution: epochs sweep -> per-epoch/grad-step/pack split
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


def out(tag, **kw):
    print(json.dumps({"tag": tag, **kw}), flush=True)


def timed_chain(fn, state0, iters=20, warmup=3):
    """fn(state) -> state (chained); readback forces completion."""
    s = state0
    for _ in range(warmup):
        s = fn(s)
    np.asarray(jax.tree.leaves(s)[0].ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(iters):
        s = fn(s)
    np.asarray(jax.tree.leaves(s)[0].ravel()[:1])
    return (time.perf_counter() - t0) / iters, s


def timed_rb(fn, *args, iters=20, warmup=3):
    """Non-chained; forces readback of the last output's first leaf."""
    o = None
    for _ in range(warmup):
        o = fn(*args)
    np.asarray(jax.tree.leaves(o)[0].ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(iters):
        o = fn(*args)
    np.asarray(jax.tree.leaves(o)[0].ravel()[:1])
    return (time.perf_counter() - t0) / iters


def probe():
    a = jnp.ones((4096, 4096))

    @jax.jit
    def heavy(x):
        for _ in range(20):
            x = x @ a * (1.0 / 4096.0)
        return x

    t_chain, _ = timed_chain(heavy, a, iters=10)
    # block_until_ready version
    o = heavy(a)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(10):
        o = heavy(a)
    jax.block_until_ready(o)
    t_block = (time.perf_counter() - t0) / 10
    out("probe", chain_ms=t_chain * 1e3, block_ms=t_block * 1e3)


def terrain_study(mesh_type, num_envs=4096):
    env_cfg, train_cfg = task_registry.get_cfgs("GR1T1")
    env_cfg.env.num_envs = num_envs
    env_cfg.terrain.mesh_type = mesh_type
    env_cfg.terrain.curriculum = True
    env, _ = task_registry.make_env("GR1T1", env_cfg=env_cfg)
    runner, _ = task_registry.make_alg_runner(env, "GR1T1", train_cfg=train_cfg, log_root=None)
    state = runner.init_state(init_at_random_ep_len=True)

    def it(s):
        return runner._train_iter(s)[0]

    iter_t, state = timed_chain(it, state, iters=10)

    # env.step chained on env_state
    acts = jnp.zeros((num_envs, env.num_actions))

    def st(es):
        return env.step_jit(es, acts)[0]

    step_t, es = timed_chain(st, state.env_state, iters=20)

    terr = env.terrain
    pos = es.physics.base_pos

    # tile extraction alone
    ext = jax.jit(lambda p: terr.extract_tiles(p[:, :2]))
    ext_t = timed_rb(ext, pos, iters=30)

    # measured heights (extraction + min-derive + 1tap over 121 points)
    mh = jax.jit(lambda ph: env._measured_heights(ph, ph.base_quat))
    mh_t = timed_rb(mh, es.physics, iters=30)

    # ground sampling (extraction + plane/channel query over P points)
    def gp(ph):
        tiles = terr.extract_tiles(ph.base_pos[:, :2])
        pp = ph.base_pos[:, None, :] + jnp.zeros((1, env.model.num_points, 3))
        return env._sample_point_planes(pp, tiles=tiles)

    gp_t = timed_rb(jax.jit(gp), es.physics, iters=30)

    out(
        f"terrain_{mesh_type}", num_envs=num_envs,
        fps=runner.num_steps_per_env * num_envs / iter_t,
        iter_ms=iter_t * 1e3, env_step_ms=step_t * 1e3,
        rollout_est_ms=step_t * 1e3 * runner.num_steps_per_env,
        extract_ms=ext_t * 1e3, measured_ms=mh_t * 1e3, ground_ms=gp_t * 1e3,
    )
    return env, runner, state


def update_study(num_envs, alg_overrides=None, policy_overrides=None, tag=""):
    from tools.jobs.r3_job01_terrain_and_update import fake_batch

    env_cfg, train_cfg = task_registry.get_cfgs("GR1T1")
    for k, v in (alg_overrides or {}).items():
        setattr(train_cfg.algorithm, k, v)
    for k, v in (policy_overrides or {}).items():
        setattr(train_cfg.policy, k, v)
    from wiki_grx_gym_tpu.learn.networks import ActorCritic
    from wiki_grx_gym_tpu.learn.ppo import PPO

    t = int(train_cfg.runner.num_steps_per_env)
    obs_dim, pri_dim, a_dim = 39, 168, 10
    net = ActorCritic(obs_dim, pri_dim, a_dim, train_cfg.policy)

    res = {}
    for epochs in (1, 8):
        train_cfg.algorithm.num_learning_epochs = epochs
        alg = PPO(net, train_cfg.algorithm)
        params = net.init(jax.random.PRNGKey(0))
        ppo_state = alg.init(params)
        batch, returns, adv = fake_batch(
            alg, net, t, num_envs, obs_dim, pri_dim, a_dim, jax.random.PRNGKey(1)
        )
        upd = jax.jit(
            lambda ps: alg.update(ps, batch, returns, adv, jax.random.PRNGKey(2))[0]
        )
        tt, _ = timed_chain(upd, ppo_state, iters=10)
        res[f"e{epochs}_ms"] = tt * 1e3
    per_epoch = (res["e8_ms"] - res["e1_ms"]) / 7.0
    res["per_epoch_ms"] = per_epoch
    res["pack_fixed_ms"] = res["e1_ms"] - per_epoch
    out(f"update{tag}", num_envs=num_envs, **res)


def main():
    out("env", platform=jax.devices()[0].platform)
    stages = [
        ("probe", lambda: probe()),
        ("hf", lambda: terrain_study("heightfield")),
        ("tm", lambda: terrain_study("trimesh")),
        ("u1", lambda: update_study(4096, tag="_base")),
        ("u2", lambda: update_study(8192, tag="_base")),
        ("u3", lambda: update_study(4096, {"storage_dtype": "float32"}, tag="_storef32")),
        ("u4", lambda: update_study(4096, {"remat_update": True}, tag="_remat")),
        ("u5", lambda: update_study(4096, None, {"compute_dtype": "bfloat16"}, tag="_bf16")),
        ("u6", lambda: update_study(4096, {"shuffle_block": 64}, tag="_blk64")),
    ]
    for name, fn in stages:
        try:
            fn()
        except Exception as e:  # keep later stages alive
            out("stage_error", stage=name, error=repr(e)[:500])


if __name__ == "__main__":
    main()
