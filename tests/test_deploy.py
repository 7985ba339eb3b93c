"""Native deployment runtime: C++ MLP inference must match the JAX actor
bit-for-bit (within float32 accumulation order)."""

import numpy as np
import pytest

from wiki_grx_gym_tpu.envs import task_registry
from wiki_grx_gym_tpu.learn.networks import ActorCritic


@pytest.fixture(scope="module")
def native_policy(tmp_path_factory):
    import jax

    _, train_cfg = task_registry.get_cfgs("GR1T1")
    net = ActorCritic(39, 168, 10, train_cfg.policy)
    params = net.init(jax.random.PRNGKey(7))
    from wiki_grx_gym_tpu.deploy.runtime import NativePolicy, export_policy_bin

    path = str(tmp_path_factory.mktemp("deploy") / "policy.grxpolicy")
    export_policy_bin(params, path)
    return net, params, NativePolicy(path)


def test_native_matches_jax(native_policy):
    import jax.numpy as jnp

    net, params, native = native_policy
    assert native.input_dim == 39
    assert native.output_dim == 10
    obs = np.random.RandomState(0).randn(32, 39).astype(np.float32)
    want = np.asarray(net.act_inference(params, jnp.asarray(obs)))
    got = native(obs)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_native_single_obs(native_policy):
    _, _, native = native_policy
    act = native(np.zeros(39, np.float32))
    assert act.shape == (10,)
    assert np.all(np.isfinite(act))


def test_native_control_rate(native_policy):
    """The runtime must comfortably beat the 50 Hz policy rate
    (gr1t1_config.py:12,185) on one core."""
    import time

    _, _, native = native_policy
    obs = np.zeros(39, np.float32)
    native(obs)
    t0 = time.perf_counter()
    n = 1000
    for _ in range(n):
        native(obs)
    per_call = (time.perf_counter() - t0) / n
    assert per_call < 0.02 / 10, f"too slow for 50 Hz control: {per_call * 1e3:.2f} ms"


def test_native_lstm_matches_jax(tmp_path):
    """Version-2 (LSTM) export: the native streaming forward must replay the
    JAX recurrent actor step-for-step, and reset() must zero the memory."""
    import jax
    import jax.numpy as jnp

    from wiki_grx_gym_tpu.learn.recurrent import ActorCriticRecurrent
    from wiki_grx_gym_tpu.deploy.runtime import NativePolicy, export_policy_bin

    _, train_cfg = task_registry.get_cfgs("GR1T1_lstm")
    train_cfg.policy.rnn_hidden_size = 64
    train_cfg.policy.rnn_num_layers = 2
    net = ActorCriticRecurrent(39, 168, 10, train_cfg.policy)
    params = net.init(jax.random.PRNGKey(11))

    path = str(tmp_path / "policy_lstm.grxpolicy")
    export_policy_bin(params, path)
    native = NativePolicy(path)
    assert native.num_lstm_layers == 2
    assert native.input_dim == 39
    assert native.output_dim == 10

    obs_seq = np.random.RandomState(3).randn(20, 39).astype(np.float32)
    hidden = net.initial_hidden(1)
    for t in range(20):
        want, hidden = net.act_inference_rnn(params, jnp.asarray(obs_seq[t:t + 1]), hidden)
        got = native(obs_seq[t])
        np.testing.assert_allclose(got, np.asarray(want)[0], rtol=1e-4, atol=1e-5)

    # reset zeroes the memory: replay from the start must match again
    native.reset()
    hidden = net.initial_hidden(1)
    want, _ = net.act_inference_rnn(params, jnp.asarray(obs_seq[:1]), hidden)
    np.testing.assert_allclose(native(obs_seq[0]), np.asarray(want)[0], rtol=1e-4, atol=1e-5)
