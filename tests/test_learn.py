"""Learner tests: GAE golden values, PPO update behavior, networks,
checkpoint roundtrip, multi-device sharded training (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wiki_grx_gym_tpu.envs import task_registry
from wiki_grx_gym_tpu.learn.networks import ActorCritic
from wiki_grx_gym_tpu.learn.ppo import PPO, Transition


def small_cfgs(n_envs=8, steps=8, mb=2, epochs=2):
    env_cfg, train_cfg = task_registry.get_cfgs("GR1T1")
    env_cfg.env.num_envs = n_envs
    train_cfg.runner.num_steps_per_env = steps
    train_cfg.algorithm.num_mini_batches = mb
    train_cfg.algorithm.num_learning_epochs = epochs
    return env_cfg, train_cfg


def make_alg(train_cfg, obs=12, pri=16, act=4):
    net = ActorCritic(obs, pri, act, train_cfg.policy)
    return net, PPO(net, train_cfg.algorithm)


def test_gae_matches_numpy_reference():
    """GAE vs a literal numpy transcription of base_storage.py:120-141."""
    _, train_cfg = small_cfgs()
    net, alg = make_alg(train_cfg)
    t, n = 12, 5
    rng = np.random.RandomState(0)
    rewards = rng.randn(t, n).astype(np.float32)
    dones = (rng.rand(t, n) < 0.2).astype(np.float32)
    values = rng.randn(t, n).astype(np.float32)
    last_values = rng.randn(n).astype(np.float32)

    batch = Transition(
        obs=None, critic_obs=None, actions=None,
        rewards=jnp.asarray(rewards), dones=jnp.asarray(dones),
        values=jnp.asarray(values), log_prob=None, mu=None, sigma=None,
    )
    returns, adv = alg.compute_returns(batch, jnp.asarray(last_values))

    # reference implementation
    ref_returns = np.zeros((t, n), np.float32)
    advantage = 0
    for step in reversed(range(t)):
        nv = last_values if step == t - 1 else values[step + 1]
        nnt = 1.0 - dones[step]
        delta = rewards[step] + nnt * alg.gamma * nv - values[step]
        advantage = delta + nnt * alg.gamma * alg.lam * advantage
        ref_returns[step] = advantage + values[step]
    ref_adv = ref_returns - values
    ref_adv = (ref_adv - ref_adv.mean()) / (ref_adv.std() + 1e-8)

    np.testing.assert_allclose(np.asarray(returns), ref_returns, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(adv), ref_adv, rtol=1e-3, atol=1e-4)


def test_log_prob_matches_gaussian():
    _, train_cfg = small_cfgs()
    net, _ = make_alg(train_cfg)
    mean = jnp.asarray([[0.5, -1.0]])
    std = jnp.asarray([[0.3, 2.0]])
    a = jnp.asarray([[0.7, 0.0]])
    lp = net.log_prob(mean, std, a)
    from scipy import stats

    want = stats.norm.logpdf([0.7, 0.0], [0.5, -1.0], [0.3, 2.0]).sum()
    np.testing.assert_allclose(float(lp[0]), want, rtol=1e-5)
    ent = net.entropy(std)
    want_ent = stats.norm.entropy([0.0, 0.0], [0.3, 2.0]).sum()
    np.testing.assert_allclose(float(ent[0]), want_ent, rtol=1e-5)


def test_update_improves_surrogate_objective():
    """PPO update on a synthetic batch must move the policy toward
    higher-advantage actions and adapt the learning rate."""
    _, train_cfg = small_cfgs(mb=2, epochs=8)
    train_cfg.algorithm.schedule = "fixed"
    train_cfg.algorithm.learning_rate = 5e-3
    net, alg = make_alg(train_cfg, obs=6, pri=6, act=2)
    key = jax.random.PRNGKey(0)
    params = net.init(key)
    state = alg.init(params)

    t, n = 8, 16
    k1, k2 = jax.random.split(key)
    obs = jax.random.normal(k1, (t, n, 6))
    actions, logp, mu, sigma = jax.vmap(lambda o, k: net.act(params, o, k))(
        obs, jax.random.split(k2, t)
    )
    values = jax.vmap(lambda o: net.evaluate(params, o))(obs)
    rewards = jnp.sum(actions, axis=-1)  # bigger actions = better
    dones = jnp.zeros((t, n), bool)
    batch = Transition(obs, obs, actions, rewards, dones, values, logp, mu, sigma)
    returns, adv = alg.compute_returns(batch, values[-1])

    new_state, metrics = jax.jit(alg.update)(state, batch, returns, adv, jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["value_loss"]))
    assert np.isfinite(float(metrics["kl"]))
    # the new policy mean should favor larger actions on these observations
    old_mean = net.action_mean(params, obs.reshape(-1, 6)).mean()
    new_mean = net.action_mean(new_state.params, obs.reshape(-1, 6)).mean()
    assert float(new_mean) > float(old_mean)
    # fixed schedule leaves the LR untouched
    assert float(new_state.learning_rate) == pytest.approx(5e-3)


def test_one_shot_shuffle_partitions_batch_exactly():
    """The packed block-shuffle must visit every (t, env) sample exactly
    once per epoch, reuse the same partition across epochs (the reference
    draws one permutation per update, base_storage.py:169), keep the
    shuffle group-local, and keep shuffle blocks of consecutive envs at one
    timestep together."""
    _, train_cfg = small_cfgs(mb=4, epochs=2)
    train_cfg.algorithm.shuffle_block = 2
    train_cfg.algorithm.permutation_groups = 2
    net = ActorCritic(2, 2, 2, train_cfg.policy)
    alg = PPO(net, train_cfg.algorithm, perm_groups=2, shuffle_block=2)

    t, n = 4, 8
    # obs channel 0 = timestep, channel 1 = env index (small ints: exact in
    # the bf16 storage dtype)
    tt, nn = jnp.meshgrid(jnp.arange(t), jnp.arange(n), indexing="ij")
    obs = jnp.stack([tt, nn], axis=-1).astype(jnp.float32)
    z2, zt = jnp.zeros((t, n, 2)), jnp.zeros((t, n))
    batch = Transition(
        obs, obs, z2, zt, jnp.zeros((t, n), bool), zt, zt, z2, jnp.ones((t, n, 2))
    )

    captured = []

    def fake_run_epochs(ppo_state, idx, get_mb, loss_fn):
        for i in np.asarray(idx):
            captured.append(get_mb(jnp.asarray(i)))
        return ppo_state, {}

    alg._run_epochs = fake_run_epochs
    state = alg.init(net.init(jax.random.PRNGKey(0)))
    alg.update(state, batch, zt, zt, jax.random.PRNGKey(1))

    assert len(captured) == 2 * 4  # epochs x minibatches

    def ids(mb):
        return {(int(r[0]), int(r[1])) for r in np.asarray(mb["obs"], np.float64)}

    ep1, ep2 = [ids(m) for m in captured[:4]], [ids(m) for m in captured[4:]]
    # exact partition: every sample exactly once per epoch
    assert sum(len(s) for s in ep1) == t * n
    assert set().union(*ep1) == {(a, b) for a in range(t) for b in range(n)}
    # one permutation per update: epoch 2 repeats epoch 1's partition
    assert ep1 == ep2
    for m in captured[:4]:
        envs = np.asarray(m["obs"])[:, 1]
        # group-local shuffle: equal rows from each env group
        assert (envs < 4).sum() == (envs >= 4).sum()
    for rows in ep1:
        # block integrity: consecutive env pairs at one timestep stay together
        for a, b in rows:
            assert (a, b + 1 if b % 2 == 0 else b - 1) in rows


def test_adaptive_lr_rules():
    _, train_cfg = small_cfgs()
    _, alg = make_alg(train_cfg)
    lr = jnp.asarray(1e-4)
    # high KL -> /1.5 ; low KL -> *1.5 (ppo.py:207-213), desired_kl=0.03
    np.testing.assert_allclose(float(alg._adapt_lr(lr, jnp.asarray(0.1))), 1e-4 / 1.5, rtol=1e-5)
    np.testing.assert_allclose(float(alg._adapt_lr(lr, jnp.asarray(0.001))), 1.5e-4, rtol=1e-5)
    np.testing.assert_allclose(float(alg._adapt_lr(lr, jnp.asarray(0.03))), 1e-4, rtol=1e-5)


@pytest.mark.slow
def test_runner_short_training_and_checkpoint(tmp_path):
    env_cfg, train_cfg = small_cfgs(n_envs=8, steps=4, mb=2, epochs=1)
    env, _ = task_registry.make_env("GR1T1", env_cfg=env_cfg)
    from wiki_grx_gym_tpu.learn.runner import OnPolicyRunner

    runner = OnPolicyRunner(env, train_cfg, log_dir=None)
    state = runner.learn(2, init_at_random_ep_len=True)

    path = str(tmp_path / "model_2")
    runner.current_learning_iteration = 2
    runner.save(path, state)

    runner2 = OnPolicyRunner(env, train_cfg, log_dir=None)
    state2 = runner2.init_state()
    state2 = runner2.load(path, state2)
    assert runner2.current_learning_iteration == 2
    for a, b in zip(
        jax.tree.leaves(state.ppo.params), jax.tree.leaves(state2.ppo.params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # inference policies agree
    p1 = runner.get_inference_policy(state)
    p2 = runner2.get_inference_policy(state2)
    obs = jnp.ones((3, env.obs_dim))
    np.testing.assert_allclose(np.asarray(p1(obs)), np.asarray(p2(obs)), atol=1e-6)


@pytest.mark.slow
def test_multichip_dryrun_8_devices():
    """The driver's dry-run contract: full train step on a fake 8-device
    mesh with dp x mp sharding."""
    assert jax.device_count() >= 8, "conftest must fake 8 host devices"
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_policy_export_roundtrip(tmp_path):
    env_cfg, train_cfg = small_cfgs()
    net, _ = make_alg(train_cfg, obs=39, pri=168, act=10)
    params = net.init(jax.random.PRNGKey(0))
    from wiki_grx_gym_tpu.utils.helpers import export_policy_npz, load_policy_npz

    path = str(tmp_path / "policy.npz")
    export_policy_npz(net, params, path)
    np_policy = load_policy_npz(path)
    obs = np.random.RandomState(0).randn(5, 39).astype(np.float32)
    want = np.asarray(net.act_inference(params, jnp.asarray(obs)))
    got = np_policy(obs)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_get_load_path_resolves_orbax_checkpoints(tmp_path):
    """`--load_run`/`--checkpoint` resolution against orbax `model_<it>`
    directories (reference semantics: helpers.py:108-130, but without the
    torch `.pt` suffix)."""
    from wiki_grx_gym_tpu.utils.task_registry import get_load_path

    run = tmp_path / "Aug17_14-00-00_run1"
    for it in (9, 100, 1000):
        (run / f"model_{it}").mkdir(parents=True)
    # latest checkpoint of latest run (numeric order, not lexicographic)
    assert get_load_path(str(tmp_path)) == str(run / "model_1000")
    # explicit checkpoint, latest run
    assert get_load_path(str(tmp_path), checkpoint=100) == str(run / "model_100")
    # explicit run + checkpoint
    assert get_load_path(
        str(tmp_path), load_run="Aug17_14-00-00_run1", checkpoint=9
    ) == str(run / "model_9")
    with pytest.raises(ValueError, match="Checkpoint 300"):
        get_load_path(str(tmp_path), checkpoint=300)
    with pytest.raises(ValueError, match="No runs"):
        get_load_path(str(tmp_path / "nope"))


@pytest.mark.slow
def test_explicit_checkpoint_resume_end_to_end(tmp_path):
    """`--resume --load_run <run> --checkpoint N` through make_alg_runner
    must restore that exact checkpoint (task_registry.py:150-155 parity)."""
    env_cfg, train_cfg = small_cfgs(n_envs=8, steps=4, mb=2, epochs=1)
    env, _ = task_registry.make_env("GR1T1", env_cfg=env_cfg)
    from wiki_grx_gym_tpu.learn.runner import OnPolicyRunner

    runner = OnPolicyRunner(env, train_cfg, log_dir=None)
    state = runner.learn(1)
    run_dir = tmp_path / "exp" / "Aug17_14-00-00_"
    runner.current_learning_iteration = 7
    runner.save(str(run_dir / "model_7"), state)

    train_cfg2 = small_cfgs(n_envs=8, steps=4, mb=2, epochs=1)[1]
    train_cfg2.runner.resume = True
    train_cfg2.runner.load_run = "Aug17_14-00-00_"
    train_cfg2.runner.checkpoint = 7
    runner2, _ = task_registry.make_alg_runner(
        env, "GR1T1", train_cfg=train_cfg2, log_root=str(tmp_path / "exp")
    )
    assert runner2.current_learning_iteration == 7
    np.testing.assert_array_equal(
        np.asarray(runner2._loaded_state.ppo.params.std),
        np.asarray(state.ppo.params.std),
    )


@pytest.mark.slow
def test_resume_flow_uses_loaded_state(tmp_path):
    """task_registry resume path: load() must feed the state that learn()
    continues from (params + iteration counter)."""
    env_cfg, train_cfg = small_cfgs(n_envs=8, steps=4, mb=2, epochs=1)
    env, _ = task_registry.make_env("GR1T1", env_cfg=env_cfg)
    from wiki_grx_gym_tpu.learn.runner import OnPolicyRunner

    runner = OnPolicyRunner(env, train_cfg, log_dir=None)
    state = runner.learn(1)
    runner.current_learning_iteration = 5
    path = str(tmp_path / "model_5")
    runner.save(path, state)

    runner2 = OnPolicyRunner(env, train_cfg, log_dir=None)
    runner2.load(path)
    assert runner2.current_learning_iteration == 5
    state2 = runner2.learn(1)  # state=None -> must resume the loaded state
    assert runner2.current_learning_iteration == 6
    # params actually evolved from the checkpoint (not reinitialized): the
    # loaded std was partially annealed, a fresh one would be 0.2 exactly
    import numpy as np

    assert not np.allclose(np.asarray(state2.ppo.params.std), 0.2)


def test_bf16_compute_dtype_matches_f32_within_tolerance():
    """compute_dtype="bfloat16" must produce the same policy up to bf16
    rounding: identical params, forward outputs within ~1e-2 absolute, and a
    full PPO update that stays finite and moves the policy the same way."""
    _, train_cfg = small_cfgs(mb=2, epochs=2)
    net32, alg32 = make_alg(train_cfg, obs=6, pri=6, act=2)
    train_cfg.policy.compute_dtype = "bfloat16"
    net16, alg16 = make_alg(train_cfg, obs=6, pri=6, act=2)
    assert net16.compute_dtype == jnp.bfloat16 and net32.compute_dtype is None

    key = jax.random.PRNGKey(0)
    params = net32.init(key)          # identical init for both
    obs = jax.random.normal(jax.random.PRNGKey(1), (64, 6))

    m32 = net32.action_mean(params, obs)
    m16 = net16.action_mean(params, obs)
    assert m16.dtype == jnp.float32   # f32 in/out contract
    assert float(jnp.max(jnp.abs(m16 - m32))) < 1e-2
    v32 = net32.evaluate(params, obs)
    v16 = net16.evaluate(params, obs)
    assert float(jnp.max(jnp.abs(v16 - v32))) < 2e-2

    # one PPO update each from the same synthetic batch / same rng
    t, n = 8, 16
    obs_b = jax.random.normal(jax.random.PRNGKey(2), (t, n, 6))
    actions, logp, mu, sigma = jax.vmap(lambda o, k: net32.act(params, o, k))(
        obs_b, jax.random.split(jax.random.PRNGKey(3), t)
    )
    values = jax.vmap(lambda o: net32.evaluate(params, o))(obs_b)
    rewards = jnp.sum(actions, axis=-1)
    dones = jnp.zeros((t, n), bool)
    batch = Transition(obs_b, obs_b, actions, rewards, dones, values, logp, mu, sigma)
    returns, adv = alg32.compute_returns(batch, values[-1])

    s32, met32 = jax.jit(alg32.update)(alg32.init(params), batch, returns, adv, jax.random.PRNGKey(4))
    s16, met16 = jax.jit(alg16.update)(alg16.init(params), batch, returns, adv, jax.random.PRNGKey(4))
    for k in ("value_loss", "surrogate_loss", "kl"):
        assert np.isfinite(float(met16[k])), k
        assert float(met16[k]) == pytest.approx(float(met32[k]), abs=5e-2), k
    # updated params stay f32 and agree to bf16-rounding tolerance
    for a, b in zip(jax.tree.leaves(s16.params), jax.tree.leaves(s32.params)):
        assert a.dtype == jnp.float32
        assert float(jnp.max(jnp.abs(a - b))) < 2e-2


def test_joint_mean_value_matches_separate_stacks():
    """The fused actor+critic trunk (networks.joint_mean_value — one batched
    dot_general per hidden layer, padded+stacked output heads) must compute
    exactly the separate-stack forward (`actor_critic_mlp.py:59-74`)."""
    _, train_cfg = small_cfgs()
    net, _ = make_alg(train_cfg, obs=12, pri=16, act=4)
    params = net.init(jax.random.PRNGKey(0))
    obs = jax.random.normal(jax.random.PRNGKey(1), (33, 12))
    cobs = jax.random.normal(jax.random.PRNGKey(2), (33, 16))
    mean, value = net.joint_mean_value(params, obs, cobs)
    np.testing.assert_allclose(
        np.asarray(mean), np.asarray(net.action_mean(params, obs)), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(value), np.asarray(net.evaluate(params, cobs)), atol=1e-6
    )
    # mismatched hidden shapes fall back to the separate stacks
    train_cfg.policy.critic_hidden_dims = [64, 32]
    net2, _ = make_alg(train_cfg, obs=12, pri=16, act=4)
    params2 = net2.init(jax.random.PRNGKey(0))
    mean2, value2 = net2.joint_mean_value(params2, obs, cobs)
    np.testing.assert_allclose(
        np.asarray(mean2), np.asarray(net2.action_mean(params2, obs)), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(value2), np.asarray(net2.evaluate(params2, cobs)), atol=1e-6
    )


def test_update_with_in_rollout_packed_wide_matches_unpacked():
    """update(packed_wide=...) — the in-rollout-packed obs||critic_obs buffer
    (runner._rollout) — must reproduce update() from the raw Transition
    fields exactly (same permutation key, same storage dtype)."""
    _, train_cfg = small_cfgs(mb=2, epochs=2)
    net, alg = make_alg(train_cfg, obs=6, pri=9, act=2)
    params = net.init(jax.random.PRNGKey(0))

    t, n = 8, 16
    obs = jax.random.normal(jax.random.PRNGKey(2), (t, n, 6))
    cobs = jax.random.normal(jax.random.PRNGKey(5), (t, n, 9))
    actions, logp, mu, sigma = jax.vmap(lambda o, k: net.act(params, o, k))(
        obs, jax.random.split(jax.random.PRNGKey(3), t)
    )
    values = jax.vmap(lambda o: net.evaluate(params, o))(cobs)
    rewards = jnp.sum(actions, axis=-1)
    dones = jnp.zeros((t, n), bool)
    batch = Transition(obs, cobs, actions, rewards, dones, values, logp, mu, sigma)
    returns, adv = alg.compute_returns(batch, values[-1])

    packed = jnp.concatenate(
        [obs.astype(alg.storage_dtype), cobs.astype(alg.storage_dtype)], axis=-1
    )
    key = jax.random.PRNGKey(4)
    s_a, m_a = jax.jit(alg.update)(alg.init(params), batch, returns, adv, key)
    s_b, m_b = jax.jit(
        lambda st, b, r, a, k, p: alg.update(st, b, r, a, k, packed_wide=p, wide_sizes=(6, 9))
    )(alg.init(params), batch, returns, adv, key, packed)
    for k in ("value_loss", "surrogate_loss", "kl"):
        np.testing.assert_allclose(float(m_a[k]), float(m_b[k]), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(s_a.params), jax.tree.leaves(s_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
