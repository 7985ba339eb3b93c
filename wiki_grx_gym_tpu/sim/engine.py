"""The simulation engine: one pure-functional physics substep.

TPU-native counterpart of the reference hot loop
(`legged_robot_fftai.py:56-76`):

    gym.set_dof_actuation_force_tensor(...)   ->  `tau` argument
    gym.simulate(sim)                         ->  `physics_step`
    gym.refresh_*_tensor(...)                 ->  outputs are plain arrays

There is no global mutable tensor cache and no setter/refresh protocol: state
in, state out. The env layer vmaps :func:`physics_step` over the env axis and
`lax.scan`s it over the decimation loop.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

from wiki_grx_gym_tpu.models.robot import RobotModel
from wiki_grx_gym_tpu.sim.contact import (
    ContactParams,
    HeightFn,
    body_wrenches,
    contact_forces,
    self_collision_forces,
)
from wiki_grx_gym_tpu.sim.dynamics import forward_dynamics
from wiki_grx_gym_tpu.sim.kinematics import Kinematics, forward_kinematics
from wiki_grx_gym_tpu.utils.maths import quat_apply, quat_integrate

_MAX_LIN_VEL = 100.0   # asset max_linear_velocity (legged_robot_config.py:128-129)
_MAX_ANG_VEL = 100.0
_MAX_DOF_VEL = 100.0   # PhysX maxJointVelocity analogue — breaks contact
                       # runaway feedback loops that otherwise reach inf


@struct.dataclass
class PhysicsState:
    """Minimal-coordinate state of one robot (batched to (N, ...) by vmap).

    The world-frame base layout mirrors the reference root-state tensor
    (pos[0:3], quat[3:7], lin_vel[7:10], ang_vel[10:13] —
    `legged_robot.py:121-131`) but joints live in reduced coordinates
    instead of a (D, 2) interleaved dof_state."""

    base_pos: jax.Array      # (3,) world
    base_quat: jax.Array     # (4,) x,y,z,w
    base_lin_vel: jax.Array  # (3,) world, velocity of the base origin
    base_ang_vel: jax.Array  # (3,) world
    q: jax.Array             # (D,)
    qd: jax.Array            # (D,)
    anchor: jax.Array        # (P, 3) stick-friction anchors (world)


@struct.dataclass
class BodyRandomization:
    """Per-env domain randomization of the physical model — the TPU-native
    form of the reference's per-env property callbacks
    (`legged_robot.py:538-648`), applied as traced per-env scalars instead of
    per-actor host-side property edits."""

    friction: jax.Array         # scalar
    restitution: jax.Array      # scalar
    base_mass_scale: jax.Array  # scalar
    base_com_offset: jax.Array  # (3,)

    @staticmethod
    def identity():
        return BodyRandomization(
            friction=jnp.float32(1.0),
            restitution=jnp.float32(0.0),
            base_mass_scale=jnp.float32(1.0),
            base_com_offset=jnp.zeros(3, jnp.float32),
        )


class PhysicsOutput(NamedTuple):
    kin: Kinematics           # per-body kinematics (ref coords at base origin)
    point_force: jax.Array    # (P, 3) world contact force per proxy sphere
    point_pos: jax.Array      # (P, 3) world sphere centers
    qdd: jax.Array            # (D,)


def default_state(model: RobotModel, base_pos, base_quat, q) -> PhysicsState:
    return PhysicsState(
        base_pos=jnp.asarray(base_pos, jnp.float32),
        base_quat=jnp.asarray(base_quat, jnp.float32),
        base_lin_vel=jnp.zeros(3, jnp.float32),
        base_ang_vel=jnp.zeros(3, jnp.float32),
        q=jnp.asarray(q, jnp.float32),
        qd=jnp.zeros(model.num_dof, jnp.float32),
        anchor=jnp.zeros((model.num_points, 3), jnp.float32),
    )


def physics_step(
    model: RobotModel,
    state: PhysicsState,
    tau: jax.Array,             # (D,) actuation torques (already clipped)
    height_fn: HeightFn,
    contact_params: ContactParams,
    rand: BodyRandomization,
    dt: float,
    fixed_base: bool = False,
    self_pairs: tuple = ((), ()),   # static (pairs_i, pairs_j) for self-collision
    joint_damping: jax.Array = None,  # (D,) actuator damping solved implicitly
    ground_query=None,  # riser-aware 9-channel query (trimesh mesh_type)
) -> tuple[PhysicsState, PhysicsOutput]:
    # joint position limits (legged_robot.py:594-615 reads them from the
    # URDF; PhysX enforces them as hard constraints). Effort-scaled penalty:
    # k_i = effort_i / joint_limit_violation, damping 2*k*dt active only
    # inside the violation. The damping is integrated implicitly (see
    # forward_dynamics joint_diag), which makes the pair unconditionally
    # stable for ANY k and inertia: with D = 2k*dt the spring's discrete
    # contraction factor is dt*k/D = 1/2 regardless of M (explicit damping
    # was unstable on the full-body wrists, kd*dt/M ~ 80).
    if contact_params.joint_limit_violation > 0.0 and model.num_dof:
        k_lim = model.dof_effort_limit / contact_params.joint_limit_violation
        over = jnp.maximum(state.q - model.dof_upper, 0.0)
        under = jnp.maximum(model.dof_lower - state.q, 0.0)
        violating = ((over > 0.0) | (under > 0.0)).astype(state.q.dtype)
        lim_damp = (2.0 * k_lim * dt) * violating
        tau = tau + k_lim * (under - over) - lim_damp * state.qd
        joint_damping = lim_damp if joint_damping is None else joint_damping + lim_damp

    kin = forward_kinematics(
        model, state.base_quat, state.base_ang_vel, state.base_lin_vel, state.q, state.qd
    )

    # contact proxy spheres: world position + velocity
    pb = jnp.asarray(model.point_body, jnp.int32)
    point_quat = kin.quat[pb]
    point_rel = kin.pos_rel[pb] + quat_apply(point_quat, model.point_offset)
    tw = kin.twist[pb]
    point_vel = tw[:, 3:] + jnp.cross(tw[:, :3], point_rel)
    point_pos = state.base_pos + point_rel

    if contact_params.tangent_stiffness > 0.0:
        f_points, new_anchor = contact_forces(
            contact_params,
            height_fn,
            point_pos,
            point_vel,
            model.point_radius,
            rand.friction,
            rand.restitution,
            dt,
            anchor=state.anchor,
            ground_query=ground_query,
        )
    else:
        f_points = contact_forces(
            contact_params,
            height_fn,
            point_pos,
            point_vel,
            model.point_radius,
            rand.friction,
            rand.restitution,
            dt,
            ground_query=ground_query,
        )
        new_anchor = state.anchor
    if self_pairs[0]:
        f_points = f_points + self_collision_forces(
            contact_params, point_pos, point_vel, model.point_radius,
            self_pairs[0], self_pairs[1], dt,
        )
    ext = body_wrenches(model.num_bodies, model.point_body, point_rel, f_points)

    dyn = forward_dynamics(
        model,
        kin,
        state.qd,
        tau,
        ext,
        base_mass_scale=rand.base_mass_scale,
        base_com_offset=rand.base_com_offset,
        fixed_base=fixed_base,
        joint_diag=None if joint_damping is None else joint_damping * dt,
    )

    # semi-implicit Euler; conventional base-point acceleration needs the
    # w x v correction (spatial -> conventional, RBDA eq. 2.47)
    if fixed_base:
        ang_vel = jnp.zeros(3, state.base_pos.dtype)
        lin_vel = jnp.zeros(3, state.base_pos.dtype)
        base_pos, base_quat = state.base_pos, state.base_quat
    else:
        ang_vel = state.base_ang_vel + dyn.base_acc[:3] * dt
        lin_acc = dyn.base_acc[3:] + jnp.cross(state.base_ang_vel, state.base_lin_vel)
        lin_vel = state.base_lin_vel + lin_acc * dt
        ang_vel = jnp.clip(ang_vel, -_MAX_ANG_VEL, _MAX_ANG_VEL)
        lin_vel = jnp.clip(lin_vel, -_MAX_LIN_VEL, _MAX_LIN_VEL)
        base_pos = state.base_pos + lin_vel * dt
        base_quat = quat_integrate(state.base_quat, ang_vel, dt)
    qd = jnp.clip(state.qd + dyn.qdd * dt, -_MAX_DOF_VEL, _MAX_DOF_VEL)

    new_state = PhysicsState(
        base_pos=base_pos,
        base_quat=base_quat,
        base_lin_vel=lin_vel,
        base_ang_vel=ang_vel,
        q=state.q + qd * dt,
        qd=qd,
        anchor=new_anchor,
    )
    return new_state, PhysicsOutput(kin=kin, point_force=f_points, point_pos=point_pos, qdd=dyn.qdd)


def flat_ground(x: jax.Array, y: jax.Array) -> jax.Array:
    """Plane terrain (`legged_robot.py:868-876`)."""
    return jnp.zeros_like(x)
