"""Quaternion / rotation math for the simulator and env layers.

Semantics mirror the reference's torch math libraries so that observation and
reward pipelines are numerically comparable:

- quaternion layout is ``(x, y, z, w)`` (IsaacGym convention), matching
  ``isaacgym/python/isaacgym/torch_utils.py:19-222``;
- ``quat_apply_yaw`` / ``wrap_to_pi`` mirror
  ``legged_gym/legged_gym/utils/math.py:38-56``.

All functions are pure jnp, broadcast over leading batch dimensions, and are
safe under ``jit``/``vmap``/``grad``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_EPS = 1e-9


def normalize(x: jax.Array, axis: int = -1) -> jax.Array:
    """Unit-normalize along ``axis`` (guarding the zero vector)."""
    n = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(n, _EPS)


def quat_unit(q: jax.Array) -> jax.Array:
    return normalize(q)


def quat_identity(batch_shape=()) -> jax.Array:
    q = jnp.zeros(batch_shape + (4,), dtype=jnp.float32)
    return q.at[..., 3].set(1.0)


def quat_conjugate(q: jax.Array) -> jax.Array:
    return jnp.concatenate([-q[..., :3], q[..., 3:4]], axis=-1)


def quat_mul(a: jax.Array, b: jax.Array) -> jax.Array:
    """Hamilton product of (x, y, z, w) quaternions (torch_utils.py:20-46)."""
    ax, ay, az, aw = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bx, by, bz, bw = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    x = aw * bx + ax * bw + ay * bz - az * by
    y = aw * by - ax * bz + ay * bw + az * bx
    z = aw * bz + ax * by - ay * bx + az * bw
    w = aw * bw - ax * bx - ay * by - az * bz
    return jnp.stack([x, y, z, w], axis=-1)


def quat_apply(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vector(s) ``v`` by quaternion(s) ``q`` (torch_utils.py:49-56)."""
    xyz = q[..., :3]
    w = q[..., 3:4]
    t = 2.0 * jnp.cross(xyz, v)
    return v + w * t + jnp.cross(xyz, t)


# torch_utils.py exposes both quat_apply and quat_rotate with identical
# semantics; keep both names for drop-in familiarity.
quat_rotate = quat_apply


def quat_rotate_inverse(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate ``v`` by the inverse of ``q`` (torch_utils.py:72-81)."""
    return quat_apply(quat_conjugate(q), v)


def quat_from_angle_axis(angle: jax.Array, axis: jax.Array) -> jax.Array:
    """(torch_utils.py:129-134); ``axis`` need not be unit length."""
    axis = normalize(axis)
    half = 0.5 * angle
    s = jnp.sin(half)
    xyz = axis * s[..., None]
    w = jnp.cos(half)[..., None]
    return jnp.concatenate([xyz, w], axis=-1)


def quat_from_euler_xyz(roll: jax.Array, pitch: jax.Array, yaw: jax.Array) -> jax.Array:
    """Intrinsic XYZ euler → quat (torch_utils.py:177-192)."""
    cy = jnp.cos(yaw * 0.5)
    sy = jnp.sin(yaw * 0.5)
    cr = jnp.cos(roll * 0.5)
    sr = jnp.sin(roll * 0.5)
    cp = jnp.cos(pitch * 0.5)
    sp = jnp.sin(pitch * 0.5)
    qw = cy * cr * cp + sy * sr * sp
    qx = cy * sr * cp - sy * cr * sp
    qy = cy * cr * sp + sy * sr * cp
    qz = sy * cr * cp - cy * sr * sp
    return jnp.stack([qx, qy, qz, qw], axis=-1)


def get_euler_xyz(q: jax.Array):
    """Quat → (roll, pitch, yaw), mirroring torch_utils.py:154-174."""
    qx, qy, qz, qw = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    sinr_cosp = 2.0 * (qw * qx + qy * qz)
    cosr_cosp = qw * qw - qx * qx - qy * qy + qz * qz
    roll = jnp.arctan2(sinr_cosp, cosr_cosp)

    sinp = 2.0 * (qw * qy - qz * qx)
    pitch = jnp.where(
        jnp.abs(sinp) >= 1.0, jnp.sign(sinp) * (jnp.pi / 2.0), jnp.arcsin(jnp.clip(sinp, -1.0, 1.0))
    )

    siny_cosp = 2.0 * (qw * qz + qx * qy)
    cosy_cosp = qw * qw + qx * qx - qy * qy - qz * qz
    yaw = jnp.arctan2(siny_cosp, cosy_cosp)
    return roll, pitch, yaw


def quat_apply_yaw(q: jax.Array, v: jax.Array) -> jax.Array:
    """Apply only the yaw component of ``q`` (legged_gym utils/math.py:38-42)."""
    q_yaw = q.at[..., 0].set(0.0).at[..., 1].set(0.0)
    return quat_apply(quat_unit(q_yaw), v)


def wrap_to_pi(angle: jax.Array) -> jax.Array:
    """Wrap to (-pi, pi] — same boundary behavior as the reference
    (legged_gym utils/math.py:45-48: mod 2pi, then subtract 2pi where > pi)."""
    a = jnp.mod(angle, 2.0 * jnp.pi)
    return a - 2.0 * jnp.pi * (a > jnp.pi)


def quat_to_rotmat(q: jax.Array) -> jax.Array:
    """Quat (x,y,z,w) → rotation matrix, shape ``(..., 3, 3)``."""
    qx, qy, qz, qw = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = qx * qx, qy * qy, qz * qz
    xy, xz, yz = qx * qy, qx * qz, qy * qz
    wx, wy, wz = qw * qx, qw * qy, qw * qz
    m = jnp.stack(
        [
            1.0 - 2.0 * (yy + zz), 2.0 * (xy - wz), 2.0 * (xz + wy),
            2.0 * (xy + wz), 1.0 - 2.0 * (xx + zz), 2.0 * (yz - wx),
            2.0 * (xz - wy), 2.0 * (yz + wx), 1.0 - 2.0 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def rotmat_to_quat(m: jax.Array) -> jax.Array:
    """Rotation matrix → quat (x,y,z,w). Branchless Shepperd-style blend."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    def cand(w2x4, x, y, z, w):
        s = jnp.sqrt(jnp.maximum(w2x4, _EPS)) * 2.0
        return jnp.stack([x / s, y / s, z / s, w / s], axis=-1)

    q0 = cand(1.0 + tr, m21 - m12, m02 - m20, m10 - m01, (1.0 + tr) / 1.0)
    # scale: q0 computed with s = 2*sqrt(1+tr); w = s/4 => w entry (1+tr)/s
    q1 = cand(1.0 + m00 - m11 - m22, (1.0 + m00 - m11 - m22), m01 + m10, m02 + m20, m21 - m12)
    q2 = cand(1.0 - m00 + m11 - m22, m01 + m10, (1.0 - m00 + m11 - m22), m12 + m21, m02 - m20)
    q3 = cand(1.0 - m00 - m11 + m22, m02 + m20, m12 + m21, (1.0 - m00 - m11 + m22), m10 - m01)

    cond0 = tr > 0.0
    cond1 = (m00 >= m11) & (m00 >= m22)
    cond2 = m11 >= m22
    q = jnp.where(
        cond0[..., None],
        q0,
        jnp.where(cond1[..., None], q1, jnp.where(cond2[..., None], q2, q3)),
    )
    return quat_unit(q)


def quat_integrate(q: jax.Array, omega_world: jax.Array, dt) -> jax.Array:
    """Integrate orientation by a world-frame angular velocity over ``dt``.

    Uses the exact exponential map (stable for small |w| via safe axis).
    """
    angle = jnp.linalg.norm(omega_world, axis=-1)
    axis = omega_world / jnp.maximum(angle, _EPS)[..., None]
    dq = quat_from_angle_axis(angle * dt, axis)
    return quat_unit(quat_mul(dq, q))


def skew(v: jax.Array) -> jax.Array:
    """Skew-symmetric cross-product matrix, shape ``(..., 3, 3)``."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    m = jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero], axis=-1)
    return m.reshape(v.shape[:-1] + (3, 3))


# ---------------------------------------------------------------------------
# component-form small-matrix ops.
#
# On TPU, batched (N, 3, 3) dot_generals run on the 128x128 MXU at ~0.05%
# utilization and force HBM layout conversions either side (profiled: 70% of
# a physics substep). These helpers express the same math as elementwise VPU
# ops over the batch — use them for every small fixed-size contraction in
# device code.
# ---------------------------------------------------------------------------


def mat3_vec(m: jax.Array, v: jax.Array) -> jax.Array:
    """(..., 3, 3) @ (..., 3) without dot_general."""
    return jnp.stack(
        [
            m[..., 0, 0] * v[..., 0] + m[..., 0, 1] * v[..., 1] + m[..., 0, 2] * v[..., 2],
            m[..., 1, 0] * v[..., 0] + m[..., 1, 1] * v[..., 1] + m[..., 1, 2] * v[..., 2],
            m[..., 2, 0] * v[..., 0] + m[..., 2, 1] * v[..., 1] + m[..., 2, 2] * v[..., 2],
        ],
        axis=-1,
    )


def mat3_mul(a: jax.Array, b: jax.Array) -> jax.Array:
    """(..., 3, 3) @ (..., 3, 3) without dot_general."""
    rows = []
    for i in range(3):
        cols = []
        for j in range(3):
            cols.append(
                a[..., i, 0] * b[..., 0, j]
                + a[..., i, 1] * b[..., 1, j]
                + a[..., i, 2] * b[..., 2, j]
            )
        rows.append(jnp.stack(cols, axis=-1))
    return jnp.stack(rows, axis=-2)


def mat3_sandwich(r: jax.Array, m: jax.Array) -> jax.Array:
    """R @ M @ R^T in component form."""
    rm = mat3_mul(r, m)
    # rm @ r^T: rows of rm dotted with rows of r
    rows = []
    for i in range(3):
        cols = []
        for j in range(3):
            cols.append(
                rm[..., i, 0] * r[..., j, 0]
                + rm[..., i, 1] * r[..., j, 1]
                + rm[..., i, 2] * r[..., j, 2]
            )
        rows.append(jnp.stack(cols, axis=-1))
    return jnp.stack(rows, axis=-2)


def outer3(a: jax.Array, b: jax.Array) -> jax.Array:
    """(..., 3) outer (..., 3) -> (..., 3, 3)."""
    return a[..., :, None] * b[..., None, :]


def uniform(key: jax.Array, lo, hi, shape) -> jax.Array:
    """Uniform sample in [lo, hi) — the ``torch_rand_float`` equivalent
    (torch_utils.py:194-196)."""
    return jax.random.uniform(key, shape, minval=lo, maxval=hi, dtype=jnp.float32)


def sample_distribution(key: jax.Array, rng, shape, distribution="uniform") -> jax.Array:
    """Domain-randomization sampler, the counterpart of isaacgym's
    ``gymutil.generate_random_samples`` (gymutil.py:521-583):

    - ``uniform``: ``rng = (lo, hi)`` -> U[lo, hi);
    - ``loguniform``: ``rng = (lo, hi)``, both > 0 -> exp(U[ln lo, ln hi));
    - ``gaussian``: ``rng = (mu, var)`` -> N(mu, sqrt(var)) (the reference
      parameterizes by (mu, var), gymutil.py:551-568).
    """
    lo, hi = float(rng[0]), float(rng[1])
    if distribution == "uniform":
        return uniform(key, lo, hi, shape)
    if distribution == "loguniform":
        assert lo > 0.0 and hi > 0.0, "loguniform needs a positive range"
        return jnp.exp(uniform(key, float(np.log(lo)), float(np.log(hi)), shape))
    if distribution == "gaussian":
        return lo + jnp.sqrt(hi) * jax.random.normal(key, shape, dtype=jnp.float32)
    raise ValueError(f"unknown DR distribution {distribution!r}")


def rand_sqrt_uniform(key: jax.Array, lo, hi, shape) -> jax.Array:
    """Signed-sqrt-shaped uniform (legged_gym utils/math.py:51-56)."""
    r = jax.random.uniform(key, shape, minval=-1.0, maxval=1.0, dtype=jnp.float32)
    r = jnp.where(r < 0.0, -jnp.sqrt(-r), jnp.sqrt(r))
    return (r + 1.0) / 2.0 * (hi - lo) + lo


def tensor_clamp(x: jax.Array, lo: jax.Array, hi: jax.Array) -> jax.Array:
    """Elementwise clamp with tensor bounds (torch_utils.py:207-209)."""
    return jnp.clip(x, lo, hi)
