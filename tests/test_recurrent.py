"""Recurrent (LSTM) path tests: cell math vs torch.nn.LSTM, exact
rollout-replay equivalence (the no-padding counterpart of rsl_rl's
split_and_pad machinery), and end-to-end GR1T1_lstm training."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wiki_grx_gym_tpu.envs import task_registry
from wiki_grx_gym_tpu.learn.recurrent import (
    ActorCriticRecurrent,
    Hidden,
    _lstm_cell,
    _memory_step,
)


def _policy_cfg(hidden=16, layers=1):
    _, train_cfg = task_registry.get_cfgs("GR1T1_lstm")
    train_cfg.policy.rnn_hidden_size = hidden
    train_cfg.policy.rnn_num_layers = layers
    return train_cfg


def test_lstm_cell_matches_torch():
    import torch

    torch.manual_seed(0)
    i_dim, h_dim, n = 7, 5, 3
    lstm = torch.nn.LSTM(i_dim, h_dim, num_layers=1)
    x = torch.randn(1, n, i_dim)
    h0 = torch.randn(1, n, h_dim)
    c0 = torch.randn(1, n, h_dim)
    with torch.no_grad():
        out, (h1, c1) = lstm(x, (h0, c0))

    from wiki_grx_gym_tpu.learn.recurrent import LSTMLayerParams

    p = LSTMLayerParams(
        w_ih=jnp.asarray(lstm.weight_ih_l0.detach().numpy().T),
        w_hh=jnp.asarray(lstm.weight_hh_l0.detach().numpy().T),
        b_ih=jnp.asarray(lstm.bias_ih_l0.detach().numpy()),
        b_hh=jnp.asarray(lstm.bias_hh_l0.detach().numpy()),
    )
    h, c = _lstm_cell(
        p, jnp.asarray(x[0].numpy()), jnp.asarray(h0[0].numpy()), jnp.asarray(c0[0].numpy())
    )
    np.testing.assert_allclose(np.asarray(h), h1[0].numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(c), c1[0].numpy(), rtol=1e-5, atol=1e-6)


def test_seq_replay_matches_stepwise_with_resets():
    """features_seq with done-boundary zeroing must reproduce the rollout's
    per-step features exactly (this is what makes padding unnecessary)."""
    train_cfg = _policy_cfg()
    net = ActorCriticRecurrent(10, 12, 4, train_cfg.policy)
    params = net.init(jax.random.PRNGKey(0))
    t, n = 12, 6
    rng = np.random.RandomState(1)
    obs = jnp.asarray(rng.randn(t, n, 10).astype(np.float32))
    dones = jnp.asarray((rng.rand(t, n) < 0.25).astype(np.float32))

    # step-wise rollout with post-step resets
    hidden = net.initial_hidden(n)
    means = []
    for k in range(t):
        feat, ha, ca = _memory_step(params.memory_a, obs[k], hidden.ha, hidden.ca)
        from wiki_grx_gym_tpu.learn.networks import apply_mlp

        means.append(apply_mlp(params.actor, feat, net.activation, net.actor_out_act))
        live = (1.0 - dones[k])[None, :, None]
        hidden = Hidden(ha * live, ca * live, hidden.hc, hidden.cc)
    want = jnp.stack(means)

    done_prev = jnp.concatenate([jnp.zeros((1, n)), dones[:-1]], axis=0)
    got = net.action_mean_seq(params, obs, done_prev, net.initial_hidden(n))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_gr1t1_lstm_trains():
    env_cfg, train_cfg = task_registry.get_cfgs("GR1T1_lstm")
    env_cfg.env.num_envs = 8
    train_cfg.runner.num_steps_per_env = 8
    train_cfg.algorithm.num_mini_batches = 2
    train_cfg.algorithm.num_learning_epochs = 2
    train_cfg.policy.rnn_hidden_size = 32
    env, _ = task_registry.make_env("GR1T1_lstm", env_cfg=env_cfg)
    from wiki_grx_gym_tpu.learn.runner import OnPolicyRunner

    runner = OnPolicyRunner(env, train_cfg, log_dir=None)
    assert runner.recurrent
    state = runner.init_state(init_at_random_ep_len=True)
    std0 = np.asarray(state.ppo.params.std).copy()
    for _ in range(2):
        state, metrics = runner._train_iter(state)
    m = jax.device_get(metrics)
    for k in ("value_loss", "surrogate_loss", "kl"):
        assert np.isfinite(float(m[k])), (k, m)
    # memory evolved and optimizer touched the LSTM weights
    assert float(jnp.max(jnp.abs(state.hidden.ha))) > 0
    assert not np.allclose(np.asarray(state.ppo.params.std), std0)

    # stateful inference policy runs and carries memory
    policy = runner.get_inference_policy(state)
    obs = jnp.ones((8, env.obs_dim))
    a1 = policy(obs)
    a2 = policy(obs)   # same obs, different memory -> different action
    assert a1.shape == (8, env.num_actions)
    assert not np.allclose(np.asarray(a1), np.asarray(a2))
    policy.reset()
    a3 = policy(obs)
    np.testing.assert_allclose(np.asarray(a3), np.asarray(a1), atol=1e-6)


@pytest.mark.slow
def test_lstm_checkpoint_roundtrip(tmp_path):
    env_cfg, train_cfg = task_registry.get_cfgs("GR1T1_lstm")
    env_cfg.env.num_envs = 8
    train_cfg.runner.num_steps_per_env = 4
    train_cfg.algorithm.num_mini_batches = 2
    train_cfg.algorithm.num_learning_epochs = 1
    train_cfg.policy.rnn_hidden_size = 16
    env, _ = task_registry.make_env("GR1T1_lstm", env_cfg=env_cfg)
    from wiki_grx_gym_tpu.learn.runner import OnPolicyRunner

    runner = OnPolicyRunner(env, train_cfg, log_dir=None)
    state = runner.learn(1)
    path = str(tmp_path / "model_1")
    runner.save(path, state)

    runner2 = OnPolicyRunner(env, train_cfg, log_dir=None)
    state2 = runner2.load(path, runner2.init_state())
    for a, b in zip(jax.tree.leaves(state.ppo.params), jax.tree.leaves(state2.ppo.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
