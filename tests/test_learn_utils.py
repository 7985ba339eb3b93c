"""rsl_rl-utils parity tests (`rsl_rl/utils/utils.py`)."""

import jax
import jax.numpy as jnp
import numpy as np

from wiki_grx_gym_tpu.learn.utils import (
    RunningMeanStd,
    quaternion_slerp,
    split_and_pad_trajectories,
    swap_lr,
)
from wiki_grx_gym_tpu.utils.maths import quat_from_angle_axis, quat_unit


def test_running_mean_std_converges():
    rms = RunningMeanStd.create((3,))
    rng = np.random.RandomState(0)
    data = rng.randn(1000, 3) * np.array([1.0, 2.0, 0.5]) + np.array([1.0, -1.0, 0.0])
    update = jax.jit(lambda s, b: s.update(b))
    for i in range(0, 1000, 100):
        rms = update(rms, jnp.asarray(data[i : i + 100], jnp.float32))
    np.testing.assert_allclose(np.asarray(rms.mean), data.mean(0), atol=0.05)
    np.testing.assert_allclose(np.sqrt(np.asarray(rms.var)), data.std(0), atol=0.05)
    z = rms.normalize(jnp.asarray(data[:10], jnp.float32))
    assert float(jnp.abs(z).max()) < 10.0


def test_split_and_pad_rebases_trajectories():
    t, n = 6, 2
    x = jnp.arange(t * n, dtype=jnp.float32).reshape(t, n, 1)
    dones = jnp.zeros((t, n), bool).at[2, 0].set(True)
    padded, mask = split_and_pad_trajectories(x, dones)
    # env 0: second trajectory (rows 3..5) re-based to rows 0..2
    np.testing.assert_allclose(np.asarray(padded[:3, 0, 0]), [6.0, 8.0, 10.0])
    assert bool(mask[2, 0]) and not bool(mask[5, 0])
    # env 1: single full trajectory unchanged
    np.testing.assert_allclose(np.asarray(padded[:, 1, 0]), np.asarray(x[:, 1, 0]))


def test_quaternion_slerp_endpoints_and_midpoint():
    q0 = quat_unit(jnp.asarray([[0.0, 0.0, 0.0, 1.0]]))
    q1 = quat_from_angle_axis(jnp.asarray([jnp.pi / 2]), jnp.asarray([[0.0, 0.0, 1.0]]))
    np.testing.assert_allclose(
        np.asarray(quaternion_slerp(q0, q1, jnp.asarray([0.0]))), np.asarray(q0), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(quaternion_slerp(q0, q1, jnp.asarray([1.0]))), np.asarray(q1), atol=1e-6
    )
    # the reference divides by angle instead of sin(angle) (utils.py:199-203),
    # so outputs are not unit quaternions; the *direction* is exact slerp
    mid = quat_unit(quaternion_slerp(q0, q1, jnp.asarray([0.5])))
    want = quat_from_angle_axis(jnp.asarray([jnp.pi / 4]), jnp.asarray([[0.0, 0.0, 1.0]]))
    np.testing.assert_allclose(np.asarray(mid), np.asarray(want), atol=1e-5)


def test_swap_lr():
    x = jnp.asarray([[1.0, 2.0, 3.0, 4.0]])
    y = swap_lr(x, [0, 1], [2, 3])
    np.testing.assert_allclose(np.asarray(y), [[3.0, 4.0, 1.0, 2.0]])
