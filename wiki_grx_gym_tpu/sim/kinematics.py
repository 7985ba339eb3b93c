"""Forward kinematics for a single robot (vmapped over envs by the engine).

Replaces the pose/velocity channels of the reference's global state-tensor
cache (`rigid_body_state_tensor`, acquired at
`legged_gym/envs/base/legged_robot.py:113,135`): body poses and twists are
recomputed from minimal coordinates every step — cheaper than storing 13
floats per body per env in HBM, and always consistent with ``(q, qd)``.

All loops below unroll over the static kinematic tree (≤ 33 bodies), so XLA
sees a straight-line program of small fused tensor ops.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from wiki_grx_gym_tpu.models.robot import RobotModel
from wiki_grx_gym_tpu.utils.maths import quat_apply, quat_from_angle_axis, quat_mul
from wiki_grx_gym_tpu.sim.spatial import revolute_subspace


class Kinematics(NamedTuple):
    """Per-body world kinematics in base-origin reference coordinates."""

    quat: jax.Array      # (B, 4) body orientation, world axes
    pos_rel: jax.Array   # (B, 3) body origin relative to base origin (world axes)
    axis_w: jax.Array    # (B, 3) joint axis in world axes (row 0 zero)
    subspace: jax.Array  # (B, 6) revolute motion subspace S_i (row 0 zero)
    twist: jax.Array     # (B, 6) spatial velocity [w; v_at_base_origin]

    def point_pos_rel(self, body: int, offset: jax.Array) -> jax.Array:
        """World-axes position of a body-frame point, relative to base origin."""
        return self.pos_rel[body] + quat_apply(self.quat[body], offset)

    def point_vel(self, body: int, pos_rel: jax.Array) -> jax.Array:
        """World-axes linear velocity of a body-fixed point at ``pos_rel``."""
        tw = self.twist[body]
        return tw[3:] + jnp.cross(tw[:3], pos_rel)


def forward_kinematics(
    model: RobotModel,
    base_quat: jax.Array,   # (4,)
    base_ang_vel: jax.Array,  # (3,) world
    base_lin_vel: jax.Array,  # (3,) world, of the base origin
    q: jax.Array,           # (D,)
    qd: jax.Array,          # (D,)
) -> Kinematics:
    nb = model.num_bodies
    quats = [base_quat]
    pos_rel = [jnp.zeros(3, base_quat.dtype)]
    axis_w = [jnp.zeros(3, base_quat.dtype)]
    subspace = [jnp.zeros(6, base_quat.dtype)]
    twists = [jnp.concatenate([base_ang_vel, base_lin_vel])]

    for i in range(1, nb):
        p = model.parent[i]
        d = i - 1
        # parent frame -> joint frame (static) -> rotate about joint axis
        q_static = quat_mul(quats[p], model.tree_quat[i])
        q_joint = quat_from_angle_axis(q[d], model.axis[i])
        quats.append(quat_mul(q_static, q_joint))
        pos_rel.append(pos_rel[p] + quat_apply(quats[p], model.tree_pos[i]))
        a_w = quat_apply(quats[i], model.axis[i])
        axis_w.append(a_w)
        s = revolute_subspace(a_w, pos_rel[i])
        subspace.append(s)
        twists.append(twists[p] + s * qd[d])

    return Kinematics(
        quat=jnp.stack(quats),
        pos_rel=jnp.stack(pos_rel),
        axis_w=jnp.stack(axis_w),
        subspace=jnp.stack(subspace),
        twist=jnp.stack(twists),
    )


def _body_ancestor_mask(model: RobotModel):
    """(B, D) static mask: m[i, d] = 1 iff dof ``d`` (joint ``d+1``) is an
    ancestor-or-self joint of body ``i``. Python-built from the static tree,
    constant-folded by XLA."""
    import numpy as np

    nb, nd = model.num_bodies, model.num_dof
    m = np.zeros((nb, nd), dtype=np.float32)
    for i in range(1, nb):
        b = i
        while b > 0:
            m[i, b - 1] = 1.0
            b = model.parent[b]
    return jnp.asarray(m)


def jacobians(model: RobotModel, kin: Kinematics) -> jax.Array:
    """Per-body geometric Jacobian — the analysis channel the reference
    exposes as ``gym.acquire_jacobian_tensor`` (IsaacGym
    ``docs/_sources/programming/tensors.rst.txt:209-262``; unused by the GRx
    training path, provided for API completeness).

    Returns ``J`` of shape ``(B, 6, 6 + D)`` mapping generalized velocity
    ``[base_ang_vel; base_lin_vel; qd]`` (world axes, matching
    ``PhysicsState``) to each body's spatial velocity ``[w_i; v_i]`` with
    ``v_i`` the linear velocity of body ``i``'s frame origin, world axes.
    Off the hot path: recompute on demand from ``forward_kinematics``;
    ``vmap`` over envs for a batched ``(N, B, 6, 6+D)`` tensor.
    """
    nb, nd = model.num_bodies, model.num_dof
    dtype = kin.quat.dtype
    mask = _body_ancestor_mask(model).astype(dtype)            # (B, D)
    # joint columns at the shared base-origin reference: S_d masked per body
    s = kin.subspace[1:]                                       # (D, 6)
    j_joints = mask[:, None, :] * s.T[None, :, :]              # (B, 6, D)
    # base columns: a base twist maps to every body's twist unchanged at the
    # shared reference
    j_base = jnp.broadcast_to(jnp.eye(6, dtype=dtype), (nb, 6, 6))
    j = jnp.concatenate([j_base, j_joints], axis=-1)           # (B, 6, 6+D)
    # shift the linear rows from the base-origin reference point to each
    # body's own origin: v_i = v_ref + w x p_i, applied per column
    w_cols = j[:, :3, :].transpose(0, 2, 1)                    # (B, C, 3)
    shift = jnp.cross(w_cols, kin.pos_rel[:, None, :])         # (B, C, 3)
    return j.at[:, 3:, :].add(shift.transpose(0, 2, 1))
