"""Golden-value and property tests for the quaternion library, mirroring the
semantics of `isaacgym/torch_utils.py:19-222` (SURVEY.md §4 implication)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wiki_grx_gym_tpu.utils import maths as m


def rand_quat(key, shape=()):
    q = jax.random.normal(key, shape + (4,))
    return m.quat_unit(q)


def test_quat_mul_identity():
    key = jax.random.PRNGKey(0)
    q = rand_quat(key, (5,))
    ident = m.quat_identity((5,))
    np.testing.assert_allclose(m.quat_mul(q, ident), q, atol=1e-6)
    np.testing.assert_allclose(m.quat_mul(ident, q), q, atol=1e-6)


def test_quat_mul_conjugate_is_identity():
    q = rand_quat(jax.random.PRNGKey(1), (7,))
    qq = m.quat_mul(q, m.quat_conjugate(q))
    np.testing.assert_allclose(qq[..., 3], 1.0, atol=1e-5)
    np.testing.assert_allclose(qq[..., :3], 0.0, atol=1e-5)


def test_quat_apply_matches_rotmat():
    key = jax.random.PRNGKey(2)
    q = rand_quat(key, (11,))
    v = jax.random.normal(jax.random.PRNGKey(3), (11, 3))
    got = m.quat_apply(q, v)
    want = jnp.einsum("bij,bj->bi", m.quat_to_rotmat(q), v)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_quat_rotate_inverse_roundtrip():
    q = rand_quat(jax.random.PRNGKey(4), (6,))
    v = jax.random.normal(jax.random.PRNGKey(5), (6, 3))
    np.testing.assert_allclose(m.quat_rotate_inverse(q, m.quat_apply(q, v)), v, atol=1e-5)


def test_quat_golden_90deg_yaw():
    # 90° about z: (x=1,0,0) -> (0,1,0); quat = (0,0,sin45,cos45)
    q = m.quat_from_angle_axis(jnp.asarray(jnp.pi / 2), jnp.asarray([0.0, 0.0, 1.0]))
    np.testing.assert_allclose(q, [0.0, 0.0, np.sqrt(0.5), np.sqrt(0.5)], atol=1e-6)
    v = m.quat_apply(q, jnp.asarray([1.0, 0.0, 0.0]))
    np.testing.assert_allclose(v, [0.0, 1.0, 0.0], atol=1e-6)


def test_euler_roundtrip():
    rpy = jnp.asarray([[0.3, -0.4, 1.2], [0.0, 0.0, 0.0], [-1.0, 0.2, -2.4]])
    q = m.quat_from_euler_xyz(rpy[:, 0], rpy[:, 1], rpy[:, 2])
    r, p, y = m.get_euler_xyz(q)
    np.testing.assert_allclose(jnp.stack([r, p, y], axis=-1), rpy, atol=1e-5)


def test_quat_from_euler_matches_zyx_composition():
    # URDF rpy semantics: R = Rz(yaw) @ Ry(pitch) @ Rx(roll)
    roll, pitch, yaw = 0.5, -0.7, 0.9
    q = m.quat_from_euler_xyz(jnp.asarray(roll), jnp.asarray(pitch), jnp.asarray(yaw))
    qx = m.quat_from_angle_axis(jnp.asarray(roll), jnp.asarray([1.0, 0, 0]))
    qy = m.quat_from_angle_axis(jnp.asarray(pitch), jnp.asarray([0.0, 1, 0]))
    qz = m.quat_from_angle_axis(jnp.asarray(yaw), jnp.asarray([0.0, 0, 1]))
    q_ref = m.quat_mul(qz, m.quat_mul(qy, qx))
    np.testing.assert_allclose(q, q_ref, atol=1e-6)


def test_quat_apply_yaw_strips_roll_pitch():
    # semantics of legged_gym utils/math.py:38-42: zero the x/y components and
    # renormalize — the effective yaw is 2*atan2(qz, qw) of the original quat
    q = m.quat_from_euler_xyz(jnp.asarray(0.4), jnp.asarray(-0.3), jnp.asarray(1.1))
    v = jnp.asarray([1.0, 0.0, 0.0])
    got = m.quat_apply_yaw(q, v)
    yaw_eff = 2.0 * np.arctan2(float(q[2]), float(q[3]))
    np.testing.assert_allclose(got, [np.cos(yaw_eff), np.sin(yaw_eff), 0.0], atol=1e-5)
    # pure-yaw quats are untouched
    qz = m.quat_from_euler_xyz(jnp.asarray(0.0), jnp.asarray(0.0), jnp.asarray(0.8))
    np.testing.assert_allclose(
        m.quat_apply_yaw(qz, v), [np.cos(0.8), np.sin(0.8), 0.0], atol=1e-5
    )


def test_wrap_to_pi():
    x = jnp.asarray([0.0, np.pi + 0.1, -np.pi - 0.1, 3 * np.pi])
    w = m.wrap_to_pi(x)
    np.testing.assert_allclose(w, [0.0, -np.pi + 0.1, np.pi - 0.1, np.pi], atol=1e-5)
    assert jnp.all(jnp.abs(w) <= np.pi + 1e-6)


def test_rotmat_to_quat_roundtrip():
    q = rand_quat(jax.random.PRNGKey(8), (20,))
    q2 = m.rotmat_to_quat(m.quat_to_rotmat(q))
    # q and -q are the same rotation
    sign = jnp.sign(jnp.sum(q * q2, axis=-1, keepdims=True))
    np.testing.assert_allclose(q2 * sign, q, atol=1e-4)


def test_quat_integrate_constant_omega():
    q0 = m.quat_identity()
    omega = jnp.asarray([0.0, 0.0, 1.0])  # 1 rad/s yaw
    q = q0
    for _ in range(100):
        q = m.quat_integrate(q, omega, 0.01)
    _, _, yaw = m.get_euler_xyz(q)
    np.testing.assert_allclose(yaw, 1.0, atol=1e-4)


def test_uniform_bounds():
    x = m.uniform(jax.random.PRNGKey(9), -2.0, 3.0, (1000,))
    assert float(x.min()) >= -2.0 and float(x.max()) < 3.0
