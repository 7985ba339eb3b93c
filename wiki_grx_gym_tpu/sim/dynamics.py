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
- solved with one batched unrolled Cholesky of a (6+D)x(6+D) SPD matrix per
  env (`ops/linalg.py`).

**Block form.** All per-body inertial state is kept as the triplet
``(m, h = m*com, I_org)`` (mass, first moment, rotational inertia about the
reference origin, world axes) instead of 6x6 spatial-inertia matrices:
composite inertias become plain additions, and applying an inertia to a
twist ``[w; v]`` is

    momentum = [I_org w + h x v;  m v + w x h]

— a handful of (batch, 3)-shaped cross products. Profiling on v5e showed the
(N, B, 6, 6) tensors of the naive formulation dominate the substep through
HBM traffic; the block form removes them entirely (the only 6x6 object left
is the final mass matrix). Tree loops unroll over static topology.

``mass_matrix`` and ``bias_forces`` stay exposed so tests can verify them
against autodiff of the Lagrangian (M == Hessian of kinetic energy; gravity
bias == grad of potential energy).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from wiki_grx_gym_tpu.models.robot import RobotModel
from wiki_grx_gym_tpu.sim.kinematics import Kinematics
from wiki_grx_gym_tpu.sim.spatial import spatial_inertia, wrench_at
from wiki_grx_gym_tpu.utils.maths import (
    mat3_sandwich,
    mat3_vec,
    outer3,
    quat_apply,
    quat_to_rotmat,
    skew,
)

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


class BlockInertia(NamedTuple):
    """Per-body inertial triplet at the reference origin (world axes)."""

    m: jax.Array       # (B,)
    h: jax.Array       # (B, 3) first moment m * com_rel
    i_org: jax.Array   # (B, 3, 3) rotational inertia about the ref origin


def inertial_quantities(
    model: RobotModel,
    kin: Kinematics,
    base_mass_scale=None,
    base_com_offset=None,
) -> Tuple[jax.Array, jax.Array, BlockInertia]:
    """(masses (B,), world com_rel (B,3), block inertias).

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
    inertia_w = mat3_sandwich(rot, model.inertia)
    # (cx cx) = c c^T - |c|^2 E, so i_org = I_w + m (|c|^2 E - c c^T)
    c2 = jnp.sum(com_rel * com_rel, axis=-1)
    eye = jnp.eye(3, dtype=com_rel.dtype)
    i_org = inertia_w + mass[:, None, None] * (
        c2[:, None, None] * eye - outer3(com_rel, com_rel)
    )
    blocks = BlockInertia(m=mass, h=mass[:, None] * com_rel, i_org=i_org)
    return mass, com_rel, blocks


def spatial_inertia6(mass, com_rel, blocks: BlockInertia) -> jax.Array:
    """Dense (B, 6, 6) spatial inertias — for tests/energy computations.
    ``i_org = I_w - m cx cx``, so ``I_w = i_org + m cx cx``."""
    cx = skew(com_rel)
    i_w = blocks.i_org + mass[:, None, None] * (cx @ cx)
    return spatial_inertia(mass, com_rel, i_w)


def _apply(blocks: BlockInertia, idx, w, v):
    """Momentum [L; p] of inertia ``idx`` under twist [w; v] (3x3 block form)."""
    m = blocks.m[idx] if idx is not None else blocks.m
    h = blocks.h[idx] if idx is not None else blocks.h
    io = blocks.i_org[idx] if idx is not None else blocks.i_org
    l_ang = mat3_vec(io, w) + jnp.cross(h, v)
    p_lin = m[..., None] * v + jnp.cross(w, h)
    return l_ang, p_lin


def mass_matrix(model: RobotModel, kin: Kinematics, blocks: BlockInertia) -> jax.Array:
    """Full (6+D, 6+D) generalized mass matrix via CRBA in block form."""
    nb, nd = model.num_bodies, model.num_dof
    subspace = kin.subspace

    # composite inertias: triplets add along the tree
    cm = [blocks.m[i] for i in range(nb)]
    ch = [blocks.h[i] for i in range(nb)]
    cio = [blocks.i_org[i] for i in range(nb)]
    for i in range(nb - 1, 0, -1):
        p = model.parent[i]
        cm[p] = cm[p] + cm[i]
        ch[p] = ch[p] + ch[i]
        cio[p] = cio[p] + cio[i]

    if nd == 0:
        hx = skew(ch[0])
        eye = jnp.eye(3, dtype=hx.dtype)
        return jnp.concatenate(
            [
                jnp.concatenate([cio[0], hx], axis=-1),
                jnp.concatenate([-hx, cm[0] * eye], axis=-1),
            ],
            axis=-2,
        )

    # F_j = Ic_{j+1} S_{j+1} with S = [a; s]
    sw = subspace[1:, :3]   # (D, 3)
    sv = subspace[1:, 3:]   # (D, 3)
    c_m = jnp.stack([cm[i + 1] for i in range(nd)])          # (D,)
    c_h = jnp.stack([ch[i + 1] for i in range(nd)])          # (D, 3)
    c_io = jnp.stack([cio[i + 1] for i in range(nd)])        # (D, 3, 3)
    f_ang = mat3_vec(c_io, sw) + jnp.cross(c_h, sv)
    f_lin = c_m[:, None] * sv + jnp.cross(sw, c_h)
    f_crb = jnp.concatenate([f_ang, f_lin], axis=-1)         # (D, 6)

    s_joint = subspace[1:]
    # (D, 6) @ (6, D) as a sum of rank-1 outer products (VPU, no MXU pad)
    gram = sum(f_crb[:, None, k] * s_joint[None, :, k] for k in range(6))
    lower = _ancestor_matrix(model) * gram
    m_joint = lower + lower.T - jnp.diag(jnp.diagonal(gram)) + jnp.diag(model.armature)

    hx = skew(ch[0])
    eye = jnp.eye(3, dtype=hx.dtype)
    m_bb = jnp.concatenate(
        [
            jnp.concatenate([cio[0], hx], axis=-1),
            jnp.concatenate([-hx, cm[0] * eye], axis=-1),
        ],
        axis=-2,
    )
    m_full = jnp.concatenate(
        [
            jnp.concatenate([m_bb, f_crb.T], axis=1),
            jnp.concatenate([f_crb, m_joint], axis=1),
        ],
        axis=0,
    )
    return 0.5 * (m_full + m_full.T)


def bias_forces(
    model: RobotModel,
    kin: Kinematics,
    qd: jax.Array,
    blocks: BlockInertia,
    ext_ang: jax.Array,   # (B, 3) external torque about ref origin (incl. gravity)
    ext_lin: jax.Array,   # (B, 3) external force
) -> jax.Array:
    """Generalized bias C (6+D,): force needed for zero acceleration."""
    nb, nd = model.num_bodies, model.num_dof
    subspace, twist = kin.subspace, kin.twist
    dtype = twist.dtype

    bias_acc = [jnp.zeros(6, dtype)]
    for i in range(1, nb):
        p = model.parent[i]
        sqd = subspace[i] * qd[i - 1]
        tw = twist[i]
        cross = jnp.concatenate(
            [
                jnp.cross(tw[:3], sqd[:3]),
                jnp.cross(tw[:3], sqd[3:]) + jnp.cross(tw[3:], sqd[:3]),
            ]
        )
        bias_acc.append(bias_acc[p] + cross)
    bias_acc = jnp.stack(bias_acc)                        # (B, 6)

    w, v = twist[:, :3], twist[:, 3:]
    l_mom, p_mom = _apply(blocks, None, w, v)             # momentum
    ia_ang, ia_lin = _apply(blocks, None, bias_acc[:, :3], bias_acc[:, 3:])
    # v x* P = [w x L + v x p; w x p]
    f_ang = ia_ang + jnp.cross(w, l_mom) + jnp.cross(v, p_mom) - ext_ang
    f_lin = ia_lin + jnp.cross(w, p_mom) - ext_lin
    f_body = jnp.concatenate([f_ang, f_lin], axis=-1)     # (B, 6)

    f_acc = [f_body[i] for i in range(nb)]
    for i in range(nb - 1, 0, -1):
        f_acc[model.parent[i]] = f_acc[model.parent[i]] + f_acc[i]
    if nd == 0:
        return f_acc[0]
    f_joint = jnp.stack([f_acc[i + 1] for i in range(nd)])       # (D, 6)
    c_joint = jnp.sum(subspace[1:] * f_joint, axis=-1)
    return jnp.concatenate([f_acc[0], c_joint])


class ForwardDynamics(NamedTuple):
    base_acc: jax.Array   # (6,) spatial acceleration of the base at the ref origin
    qdd: jax.Array        # (D,) joint accelerations
    blocks: BlockInertia  # per-body block inertias (reused by tests)


def forward_dynamics(
    model: RobotModel,
    kin: Kinematics,
    qd: jax.Array,             # (D,)
    tau: jax.Array,            # (D,) joint torques
    ext_wrench: jax.Array,     # (B, 6) external wrenches at ref origin (world axes)
    base_mass_scale: jax.Array = None,   # DR: mass multiplier on body 0
    base_com_offset: jax.Array = None,   # DR: (3,) body-frame com shift on body 0
    fixed_base: bool = False,            # asset option fix_base_link (legged_robot_config.py:119)
    joint_diag: jax.Array = None,        # (D,) extra joint-block diagonal (implicit PD damping)
) -> ForwardDynamics:
    nd = model.num_dof
    mass, com_rel, blocks = inertial_quantities(model, kin, base_mass_scale, base_com_offset)

    # gravity as an explicit external force at each com (no "gravity trick",
    # so the solved base acceleration is the true spatial acceleration)
    grav_lin = mass[:, None] * (GRAVITY * getattr(model, 'gravity_scale', 1.0))
    ext_ang = jnp.cross(com_rel, grav_lin) + ext_wrench[:, :3]
    ext_lin = grav_lin + ext_wrench[:, 3:]

    c_full = bias_forces(model, kin, qd, blocks, ext_ang, ext_lin)
    m_full = mass_matrix(model, kin, blocks)

    from wiki_grx_gym_tpu.ops.linalg import spd_solve

    if joint_diag is not None:
        # implicit actuator damping: solving (M + dt*D) qdd = tau_explicit is
        # the exact backward-Euler treatment of the -D*qd drive term — the
        # TPU-native analogue of PhysX's implicit joint drives, which is what
        # keeps kd stable on tiny-inertia links (wrists: kd*dt/M ~ 200 with
        # explicit damping vs the <2 stability bound)
        m_full = m_full + jnp.diag(
            jnp.concatenate([jnp.zeros(6, qd.dtype), joint_diag])
        )

    if fixed_base:
        m_jj = m_full[6:, 6:] + _RIDGE * jnp.eye(nd, dtype=qd.dtype)
        qdd = spd_solve(m_jj, tau - c_full[6:])
        return ForwardDynamics(base_acc=jnp.zeros(6, qd.dtype), qdd=qdd, blocks=blocks)

    m_full = m_full + _RIDGE * jnp.eye(6 + nd, dtype=qd.dtype)
    rhs = jnp.concatenate([jnp.zeros(6, qd.dtype), tau]) - c_full
    x = spd_solve(m_full, rhs)
    return ForwardDynamics(base_acc=x[:6], qdd=x[6:], blocks=blocks)
