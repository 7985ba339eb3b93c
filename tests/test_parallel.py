"""Multi-chip correctness: collective-traffic contracts (inspected from
compiled HLO) and dp1-vs-dp8 numerical equivalence (VERDICT round-1 item 2;
the SURVEY §2.6 contract: zero collectives in the physics/rollout phase,
gradient all-reduce only in the update)."""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wiki_grx_gym_tpu.envs import task_registry
from wiki_grx_gym_tpu.learn.runner import OnPolicyRunner
from wiki_grx_gym_tpu.parallel.mesh import make_mesh
from wiki_grx_gym_tpu.parallel.sharding import shard_runner_state

_COLLECTIVES = re.compile(
    r"\b(all-reduce|all-gather|all-to-all|collective-permute|reduce-scatter)\b"
)


def _make(n_envs, mesh=None, perm_groups=0, steps=4):
    env_cfg, train_cfg = task_registry.get_cfgs("GR1T1")
    env_cfg.env.num_envs = n_envs
    train_cfg.runner.num_steps_per_env = steps
    train_cfg.algorithm.num_mini_batches = 2
    train_cfg.algorithm.num_learning_epochs = 1
    train_cfg.algorithm.permutation_groups = perm_groups
    # f32 update keeps the equivalence tolerances sharp: with the default
    # bf16 activations, dp1-vs-dp8 reduction-order differences round
    # differently and drift past the f32-calibrated atol — dtype noise,
    # not sharding corruption, which is what these tests are for
    train_cfg.algorithm.update_dtype = "float32"
    env, _ = task_registry.make_env("GR1T1", env_cfg=env_cfg)
    runner = OnPolicyRunner(env, train_cfg, log_dir=None, mesh=mesh)
    return env, runner


@pytest.fixture(scope="module")
def mesh8():
    assert jax.device_count() >= 8, "conftest must fake 8 host devices"
    return make_mesh(num_mp=1, devices=jax.devices()[:8])


@pytest.mark.slow
def test_rollout_phase_has_zero_collectives(mesh8):
    """The compiled 16-step rollout (policy fwd + physics + storage) over a
    dp8 mesh must contain no cross-device communication at all — envs are
    independent and metric reductions are deferred to the learn phase."""
    env, runner = _make(16, mesh=mesh8)
    state = runner.init_state()
    state = shard_runner_state(state, mesh8, env.num_envs)

    lowered = jax.jit(runner._rollout).lower(
        state.env_state, state.obs, state.critic_obs, state.ppo.params, state.rng
    )
    hlo = lowered.compile().as_text()
    found = sorted(set(_COLLECTIVES.findall(hlo)))
    assert not found, f"rollout phase emits collectives: {found}"


@pytest.mark.slow
def test_update_phase_has_no_gather_collectives(mesh8):
    """The PPO update on a dp8 mesh may all-reduce (gradients, scalar loss
    means) but must not all-gather/all-to-all — the group-local minibatch
    permutation keeps every batch gather on-device."""
    env, runner = _make(16, mesh=mesh8)
    assert runner.alg.perm_groups == 8  # auto = dp size
    state = runner.init_state()
    state = shard_runner_state(state, mesh8, env.num_envs)

    t, n = runner.num_steps_per_env, env.num_envs
    from wiki_grx_gym_tpu.learn.ppo import Transition

    def update_only(ppo_state, batch, returns, advantages, key):
        return runner.alg.update(ppo_state, batch, returns, advantages, key)

    # batch shaped/sharded exactly as the rollout produces it
    from jax.sharding import NamedSharding, PartitionSpec as P

    env_sh = NamedSharding(mesh8, P(None, "dp"))

    def mk(shape):
        return jax.device_put(jnp.zeros(shape), env_sh)

    obs_d, pri_d, act_d = env.obs_dim, env.pri_obs_dim, env.num_actions
    batch = Transition(
        obs=jax.device_put(jnp.zeros((t, n, obs_d)), NamedSharding(mesh8, P(None, "dp", None))),
        critic_obs=jax.device_put(
            jnp.zeros((t, n, pri_d)), NamedSharding(mesh8, P(None, "dp", None))
        ),
        actions=jax.device_put(
            jnp.zeros((t, n, act_d)), NamedSharding(mesh8, P(None, "dp", None))
        ),
        rewards=mk((t, n)),
        dones=mk((t, n)),
        values=mk((t, n)),
        log_prob=mk((t, n)),
        mu=jax.device_put(jnp.zeros((t, n, act_d)), NamedSharding(mesh8, P(None, "dp", None))),
        sigma=jax.device_put(
            jnp.ones((t, n, act_d)), NamedSharding(mesh8, P(None, "dp", None))
        ),
    )
    hlo = (
        jax.jit(update_only)
        .lower(state.ppo, batch, mk((t, n)), mk((t, n)), jax.random.PRNGKey(0))
        .compile()
        .as_text()
    )
    found = sorted(set(_COLLECTIVES.findall(hlo)))
    assert "all-gather" not in found, f"update gathers batch across devices: {found}"
    assert "all-to-all" not in found, f"update reshuffles batch across devices: {found}"


@pytest.mark.slow
def test_dp1_vs_dp8_training_step_equivalence(mesh8):
    """The same seed must produce the same training step whether the program
    runs replicated on one device or sharded over eight (permutation groups
    pinned to 8 in both so the minibatch composition matches)."""
    mesh1 = make_mesh(num_mp=1, devices=jax.devices()[:1])

    results = {}
    for name, mesh in (("dp1", mesh1), ("dp8", mesh8)):
        env, runner = _make(16, mesh=mesh, perm_groups=8)
        state = runner.init_state(init_at_random_ep_len=True)
        state = shard_runner_state(state, mesh, env.num_envs)
        state, metrics = runner._train_iter(state)
        state, metrics = runner._train_iter(state)
        results[name] = (
            jax.device_get(
                {k: v for k, v in metrics.items() if getattr(v, "ndim", 1) == 0}
            ),
            jax.device_get(jax.tree.leaves(state.ppo.params)),
        )

    m1, p1 = results["dp1"]
    m8, p8 = results["dp8"]
    # float32 reduction-order noise across two chained iterations bounds
    # the achievable tolerance (the raveled-optimizer clip sums in yet
    # another order); anything beyond ~1e-4 would indicate real sharding
    # corruption
    # surrogate_loss is a near-cancelling mean (|net| ~ 2e-2 from +-1
    # summands), so its tolerance is absolute at the f32 noise floor of
    # the summands rather than relative to the cancelled result
    for k in ("value_loss", "surrogate_loss", "kl", "mean_step_reward", "done_count"):
        np.testing.assert_allclose(m1[k], m8[k], rtol=1e-4, atol=6e-5, err_msg=k)
    # Adam's per-parameter normalization amplifies reduction-order noise in
    # near-zero gradients, so params get a slightly looser atol (real
    # sharding corruption shows up orders of magnitude above this)
    for a, b in zip(p1, p8):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=4e-5)


@pytest.mark.slow
def test_dp1_vs_dp8_equivalence_bf16_default_path(mesh8):
    """Sharding coverage for the bf16-update OPTION (algorithm.update_dtype
    = "bfloat16"; the shipped default is float32, which the other
    equivalence tests pin explicitly): one training step, dp1 vs dp8, at
    bf16-calibrated tolerances. bf16 reduction-order noise rounds
    differently across shardings, so tolerances are loose — real sharding
    corruption (wrong minibatch composition, clobbered shards) produces
    O(1) divergence, orders of magnitude above these bounds."""
    mesh1 = make_mesh(num_mp=1, devices=jax.devices()[:1])

    results = {}
    for name, mesh in (("dp1", mesh1), ("dp8", mesh8)):
        env_cfg, train_cfg = task_registry.get_cfgs("GR1T1")
        env_cfg.env.num_envs = 16
        train_cfg.runner.num_steps_per_env = 4
        train_cfg.algorithm.num_mini_batches = 2
        train_cfg.algorithm.num_learning_epochs = 1
        train_cfg.algorithm.permutation_groups = 8
        train_cfg.algorithm.update_dtype = "bfloat16"
        env, _ = task_registry.make_env("GR1T1", env_cfg=env_cfg)
        runner = OnPolicyRunner(env, train_cfg, log_dir=None, mesh=mesh)
        state = runner.init_state(init_at_random_ep_len=True)
        state = shard_runner_state(state, mesh, env.num_envs)
        state, metrics = runner._train_iter(state)
        results[name] = (
            jax.device_get(
                {k: v for k, v in metrics.items() if getattr(v, "ndim", 1) == 0}
            ),
            jax.device_get(jax.tree.leaves(state.ppo.params)),
        )

    m1, p1 = results["dp1"]
    m8, p8 = results["dp8"]
    # rollout is f32 and bit-reproducible across shardings; these differ
    # only through the update's bf16 grad steps
    np.testing.assert_allclose(m1["mean_step_reward"], m8["mean_step_reward"],
                               rtol=1e-5, atol=1e-6)
    assert m1["done_count"] == m8["done_count"]
    for k in ("value_loss", "surrogate_loss", "kl"):
        np.testing.assert_allclose(m1[k], m8[k], rtol=2e-2, atol=1e-3, err_msg=k)
    for a, b in zip(p1, p8):
        np.testing.assert_allclose(a, b, rtol=1e-2, atol=5e-3)


@pytest.mark.slow
def test_dp8_update_no_gather_collectives_bf16_default_path(mesh8):
    """HLO contract on the bf16-update-option iteration (packed rollout)
    over dp8: gradient all-reduce only — no
    all-gather / all-to-all anywhere in the compiled program."""
    env_cfg, train_cfg = task_registry.get_cfgs("GR1T1")
    env_cfg.env.num_envs = 16
    train_cfg.runner.num_steps_per_env = 4
    train_cfg.algorithm.num_mini_batches = 2
    train_cfg.algorithm.num_learning_epochs = 1
    train_cfg.algorithm.update_dtype = "bfloat16"
    env, _ = task_registry.make_env("GR1T1", env_cfg=env_cfg)
    runner = OnPolicyRunner(env, train_cfg, log_dir=None, mesh=mesh8)
    assert runner.alg.update_dtype == jnp.bfloat16
    assert runner.alg.pack_rollout and not runner.alg.fused_trunk  # shipped defaults
    state = runner.init_state(init_at_random_ep_len=True)
    state = shard_runner_state(state, mesh8, env.num_envs)
    hlo = jax.jit(runner._iteration).lower(state).compile().as_text()
    found = sorted(set(_COLLECTIVES.findall(hlo)))
    assert "all-gather" not in found, f"default path gathers across devices: {found}"
    assert "all-to-all" not in found, f"default path reshuffles across devices: {found}"


@pytest.mark.slow
def test_mp1_vs_mp2_training_step_equivalence():
    """TP must be a pure config change (the SURVEY §2.6 "shard_map-ready"
    claim): the same seed produces the same training step on a dp4 mesh
    whether the MLP hidden dims are replicated (mp1) or column/row-split
    over two model-parallel devices (dp4 x mp2). Permutation groups pinned
    to 4 in both so the minibatch composition matches."""
    mesh_a = make_mesh(num_mp=1, devices=jax.devices()[:4])
    mesh_b = make_mesh(num_mp=2, devices=jax.devices()[:8])
    assert dict(mesh_b.shape) == {"dp": 4, "mp": 2}

    results = {}
    for name, mesh in (("mp1", mesh_a), ("mp2", mesh_b)):
        env, runner = _make(16, mesh=mesh, perm_groups=4)
        state = runner.init_state(init_at_random_ep_len=True)
        state = shard_runner_state(state, mesh, env.num_envs)
        state, metrics = runner._train_iter(state)
        state, metrics = runner._train_iter(state)
        results[name] = (
            jax.device_get(
                {k: v for k, v in metrics.items() if getattr(v, "ndim", 1) == 0}
            ),
            jax.device_get(jax.tree.leaves(state.ppo.params)),
        )

    m1, p1 = results["mp1"]
    m2, p2 = results["mp2"]
    for k in ("value_loss", "surrogate_loss", "kl", "mean_step_reward", "done_count"):
        np.testing.assert_allclose(m1[k], m2[k], rtol=1e-4, atol=2e-5, err_msg=k)
    for a, b in zip(p1, p2):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=4e-5)


@pytest.mark.slow
def test_mp2_update_collectives_are_reduce_only():
    """At dp4 x mp2 the update may all-reduce (dp gradient sum + the TP
    row-parallel partial sums) but must not all-to-all; the minibatch
    shuffle stays device-local."""
    mesh = make_mesh(num_mp=2, devices=jax.devices()[:8])
    env, runner = _make(16, mesh=mesh, perm_groups=4)
    state = runner.init_state(init_at_random_ep_len=True)
    state = shard_runner_state(state, mesh, env.num_envs)
    hlo = (
        jax.jit(runner._iteration)
        .lower(state)
        .compile()
        .as_text()
    )
    found = sorted(set(_COLLECTIVES.findall(hlo)))
    assert "all-to-all" not in found, f"unexpected reshuffle collectives: {found}"


@pytest.mark.slow
def test_rollout_zero_collectives_on_heightfield_curriculum(mesh8):
    """Terrain mode must stay shard-safe: the rollout over a dp8 mesh with a
    heightfield curriculum (terrain levels/origins in state, tile-extraction
    gathers from the replicated heightfield, measured-height observations)
    must still contain zero cross-device communication (VERDICT r2 item 4a)."""
    env_cfg, train_cfg = task_registry.get_cfgs("GR1T1")
    env_cfg.env.num_envs = 16
    env_cfg.terrain.mesh_type = "heightfield"
    env_cfg.terrain.curriculum = True
    env_cfg.terrain.num_rows = 3
    env_cfg.terrain.num_cols = 4
    env_cfg.terrain.border_size = 5
    train_cfg.runner.num_steps_per_env = 4
    train_cfg.algorithm.num_mini_batches = 2
    train_cfg.algorithm.num_learning_epochs = 1
    mesh = make_mesh(num_mp=1, devices=jax.devices()[:8])
    env, _ = task_registry.make_env("GR1T1", env_cfg=env_cfg)
    runner = OnPolicyRunner(env, train_cfg, log_dir=None, mesh=mesh)
    state = runner.init_state()
    state = shard_runner_state(state, mesh, env.num_envs)
    lowered = jax.jit(runner._rollout).lower(
        state.env_state, state.obs, state.critic_obs, state.ppo.params, state.rng
    )
    hlo = lowered.compile().as_text()
    found = sorted(set(_COLLECTIVES.findall(hlo)))
    assert not found, f"terrain rollout emits collectives: {found}"


def test_dp2_smoke_fast_tier():
    """Fast-tier sharding canary (VERDICT r4 weak #5): the <8-min tier a
    developer actually runs must catch sharding breakage. One dp2 runner at
    minimal geometry: execute one full _train_iter on the fake mesh (finite
    losses = the sharded program runs) and grep its compiled HLO — gradient
    all-reduce is allowed, batch all-gather/all-to-all are not."""
    mesh2 = make_mesh(num_mp=1, devices=jax.devices()[:2])
    env_cfg, train_cfg = task_registry.get_cfgs("GR1T1")
    env_cfg.env.num_envs = 8
    env_cfg.control.decimation = 2
    train_cfg.runner.num_steps_per_env = 2
    train_cfg.algorithm.num_mini_batches = 2
    train_cfg.algorithm.num_learning_epochs = 1
    env, _ = task_registry.make_env("GR1T1", env_cfg=env_cfg)
    runner = OnPolicyRunner(env, train_cfg, log_dir=None, mesh=mesh2)
    assert runner.alg.perm_groups == 2

    state = runner.init_state()
    state = shard_runner_state(state, mesh2, env.num_envs)
    compiled = runner._train_iter.lower(state).compile()
    hlo = compiled.as_text()
    found = sorted(set(_COLLECTIVES.findall(hlo)))
    assert "all-gather" not in found, f"iteration gathers across devices: {found}"
    assert "all-to-all" not in found, f"iteration reshuffles across devices: {found}"

    state, metrics = runner._train_iter(state)
    m = jax.device_get(metrics)
    assert np.isfinite(m["value_loss"]) and np.isfinite(m["kl"])
