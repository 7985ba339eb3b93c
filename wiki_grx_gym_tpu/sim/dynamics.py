"""Articulated rigid-body dynamics: CRBA mass matrix + RNEA bias + dense solve.

This is the TPU-native replacement for the PhysX GPU articulation solver
(reference N2: `libPhysXGpu_64.so`, TGS solver configured at
`legged_gym/envs/base/legged_robot_config.py:41-52`). Instead of translating
an iterative GPU constraint solver, the equations of motion are formed
explicitly:

    M(q) [a0; qdd] = [0; tau] - C(q, v, f_ext)

- ``M`` via the Composite Rigid Body Algorithm,
- ``C`` (Coriolis + gravity + external/contact wrenches) via a zero-qdd
  recursive Newton-Euler pass,
- solved with one batched Cholesky factorization of a (6+D)x(6+D) SPD
  matrix per env.

For D = 10..32 DOF humanoids this is a handful of (B,6)-shaped fused ops and
an MXU-friendly batched small-matrix solve — the per-env cost is tiny and
everything vectorizes perfectly over thousands of envs (no warp divergence,
no contact-pair buffers, cf. ``max_gpu_contact_pairs = 2**23`` sizing in the
reference).

All tree loops unroll over the static topology at trace time. ``mass_matrix``
and ``bias_forces`` are exposed separately so tests can verify them against
autodiff of the Lagrangian (M == Hessian of kinetic energy in generalized
velocities; gravity bias == grad of potential energy).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from wiki_grx_gym_tpu.models.robot import RobotModel
from wiki_grx_gym_tpu.sim.kinematics import Kinematics
from wiki_grx_gym_tpu.sim.spatial import (
    force_cross,
    motion_cross,
    spatial_inertia,
    wrench_at,
)
from wiki_grx_gym_tpu.utils.maths import quat_apply, quat_to_rotmat

_RIDGE = 1e-6
GRAVITY = jnp.asarray([0.0, 0.0, -9.81])


def _ancestor_matrix(model: RobotModel) -> jnp.ndarray:
    """(D, D) mask: A[i, j] = 1 iff joint j is an ancestor-or-self of joint i
    (computed from static topology; constant-folded by XLA)."""
    d = model.num_dof
    a = np.zeros((d, d), dtype=np.float32)
    for i in range(d):
        b = i + 1
        while b > 0:
            a[i, b - 1] = 1.0
            b = model.parent[b]
    return jnp.asarray(a)


def inertial_quantities(
    model: RobotModel,
    kin: Kinematics,
    base_mass_scale=None,
    base_com_offset=None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(masses (B,), world com_rel (B,3), spatial inertias (B,6,6)).

    Base-mass scaling / com shifting implement the reference's rigid-body
    property DR (`legged_robot.py:618-648`) as traced per-env scalars."""
    mass = model.mass
    com_local = model.com
    if base_mass_scale is not None:
        mass = mass.at[0].multiply(base_mass_scale)
    if base_com_offset is not None:
        com_local = com_local.at[0].add(base_com_offset)
    rot = quat_to_rotmat(kin.quat)
    com_rel = kin.pos_rel + quat_apply(kin.quat, com_local)
    inertia_w = rot @ model.inertia @ jnp.swapaxes(rot, -1, -2)
    return mass, com_rel, spatial_inertia(mass, com_rel, inertia_w)


def mass_matrix(model: RobotModel, kin: Kinematics, inertia6: jax.Array) -> jax.Array:
    """Full (6+D, 6+D) generalized mass matrix via CRBA."""
    nb, nd = model.num_bodies, model.num_dof
    subspace = kin.subspace

    ic = [inertia6[i] for i in range(nb)]
    for i in range(nb - 1, 0, -1):
        ic[model.parent[i]] = ic[model.parent[i]] + ic[i]
    if nd == 0:
        return ic[0]
    f_crb = jnp.stack([ic[i + 1] @ subspace[i + 1] for i in range(nd)])  # (D,6)
    s_joint = subspace[1:]
    gram = f_crb @ s_joint.T                                             # F_i . S_j
    lower = _ancestor_matrix(model) * gram
    m_joint = lower + lower.T - jnp.diag(jnp.diagonal(gram)) + jnp.diag(model.armature)

    m_full = jnp.concatenate(
        [
            jnp.concatenate([ic[0], f_crb.T], axis=1),
            jnp.concatenate([f_crb, m_joint], axis=1),
        ],
        axis=0,
    )
    return 0.5 * (m_full + m_full.T)


def bias_forces(
    model: RobotModel,
    kin: Kinematics,
    qd: jax.Array,
    inertia6: jax.Array,
    ext_wrench: jax.Array,   # (B, 6) total external wrench (incl. gravity) per body
) -> jax.Array:
    """Generalized bias C (6+D,): force needed for zero acceleration."""
    nb, nd = model.num_bodies, model.num_dof
    subspace, twist = kin.subspace, kin.twist
    dtype = twist.dtype

    bias_acc = [jnp.zeros(6, dtype)]
    for i in range(1, nb):
        p = model.parent[i]
        bias_acc.append(bias_acc[p] + motion_cross(twist[i], subspace[i] * qd[i - 1]))
    bias_acc = jnp.stack(bias_acc)

    momentum = jnp.einsum("bij,bj->bi", inertia6, twist)
    f_body = (
        jnp.einsum("bij,bj->bi", inertia6, bias_acc)
        + force_cross(twist, momentum)
        - ext_wrench
    )

    f_acc = [f_body[i] for i in range(nb)]
    for i in range(nb - 1, 0, -1):
        f_acc[model.parent[i]] = f_acc[model.parent[i]] + f_acc[i]
    if nd == 0:
        return f_acc[0]
    c_joint = jnp.stack([jnp.dot(subspace[i + 1], f_acc[i + 1]) for i in range(nd)])
    return jnp.concatenate([f_acc[0], c_joint])


class ForwardDynamics(NamedTuple):
    base_acc: jax.Array   # (6,) spatial acceleration of the base at the ref origin
    qdd: jax.Array        # (D,) joint accelerations
    inertia6: jax.Array   # (B, 6, 6) world spatial inertias (reused by tests)


def forward_dynamics(
    model: RobotModel,
    kin: Kinematics,
    qd: jax.Array,             # (D,)
    tau: jax.Array,            # (D,) joint torques
    ext_wrench: jax.Array,     # (B, 6) external wrenches at ref origin (world axes)
    base_mass_scale: jax.Array = None,   # DR: mass multiplier on body 0
    base_com_offset: jax.Array = None,   # DR: (3,) body-frame com shift on body 0
    fixed_base: bool = False,            # asset option fix_base_link (legged_robot_config.py:119)
) -> ForwardDynamics:
    nd = model.num_dof
    mass, com_rel, inertia6 = inertial_quantities(model, kin, base_mass_scale, base_com_offset)

    # gravity as an explicit external force at each com (no "gravity trick",
    # so the solved base acceleration is the true spatial acceleration)
    w_total = wrench_at(com_rel, mass[:, None] * GRAVITY) + ext_wrench

    c_full = bias_forces(model, kin, qd, inertia6, w_total)
    m_full = mass_matrix(model, kin, inertia6)

    from wiki_grx_gym_tpu.ops.linalg import spd_solve

    if fixed_base:
        m_jj = m_full[6:, 6:] + _RIDGE * jnp.eye(nd, dtype=qd.dtype)
        qdd = spd_solve(m_jj, tau - c_full[6:])
        return ForwardDynamics(base_acc=jnp.zeros(6, qd.dtype), qdd=qdd, inertia6=inertia6)

    m_full = m_full + _RIDGE * jnp.eye(6 + nd, dtype=qd.dtype)
    rhs = jnp.concatenate([jnp.zeros(6, qd.dtype), tau]) - c_full
    x = spd_solve(m_full, rhs)
    return ForwardDynamics(base_acc=x[:6], qdd=x[6:], inertia6=inertia6)
