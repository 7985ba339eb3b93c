"""Penalty-based contact between robot proxy spheres and the ground.

Replaces PhysX contact generation + TGS solving (reference N2) with a
branchless, shape-static compliant contact model: every proxy sphere tests
against the terrain height function every substep — there is no broad phase,
no contact-pair buffer (`max_gpu_contact_pairs`, `legged_robot_config.py:50`)
and no data-dependent shapes, which is exactly what XLA wants.

Force model per point (world axes):
- penetration ``d = h(x, y) - (z - r)``; active iff ``d > 0``;
- normal: ``f_n = k_n d - d_n v_n`` clipped to ``>= 0`` (compliant spring +
  dissipative damper; damping scales down with per-env restitution so DR of
  restitution — `legged_robot.py:565-578` — changes bounciness);
- tangential: viscous friction clamped to the Coulomb cone
  ``|f_t| <= mu f_n`` with per-env friction ``mu`` (DR buckets,
  `legged_robot.py:550-563`).

The per-body *net* contact force (the reference's
``net_contact_force_tensor``, `legged_robot.py:112,134`) is recovered by
masked sums over points.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
from flax import struct


# height_fn: (x, y) -> height; world-frame, broadcasts over point batches.
HeightFn = Callable[[jax.Array, jax.Array], jax.Array]


@struct.dataclass
class ContactParams:
    """Global contact material/solver constants (static per build).

    ``point_mass`` is the effective inertia a single proxy sphere "sees" at
    high frequency; damping and friction coefficients are capped at
    ``point_mass / dt`` (the impulse that stops the point's relative motion in
    one substep), which makes the explicit integration unconditionally stable
    regardless of how many points share a foot."""

    stiffness: float = struct.field(pytree_node=False, default=1.0e4)   # N/m
    damping_ratio: float = struct.field(pytree_node=False, default=0.7)
    point_mass: float = struct.field(pytree_node=False, default=0.25)   # kg
    slip_velocity: float = struct.field(pytree_node=False, default=1e-5)
    # anchored (stick) friction: tangential spring to a per-point anchor that
    # slips along the Coulomb cone. 0 disables (pure capped-viscous friction).
    tangent_stiffness: float = struct.field(pytree_node=False, default=1.0e4)  # N/m
    # joint position limits (PhysX enforces URDF limits as hard constraints;
    # here a stiff effort-scaled penalty): a joint driven at its full effort
    # limit penetrates its bound by at most this many radians. 0 disables.
    joint_limit_violation: float = struct.field(pytree_node=False, default=0.05)  # rad
    # sphere-sphere self-collision spring: stiffer than the ground spring so
    # full hip torque pressing the legs together stays under ~5 mm
    # penetration (limb-limb effective masses are kg-scale, so this is well
    # inside the explicit-integration stability bound at dt=0.002)
    self_collision_stiffness: float = struct.field(pytree_node=False, default=1.0e5)  # N/m


def ground_normal(height_fn: HeightFn, x: jax.Array, y: jax.Array, eps: float = 0.05):
    """Terrain normal from central differences of the height function."""
    dhdx = (height_fn(x + eps, y) - height_fn(x - eps, y)) / (2.0 * eps)
    dhdy = (height_fn(x, y + eps) - height_fn(x, y - eps)) / (2.0 * eps)
    n = jnp.stack([-dhdx, -dhdy, jnp.ones_like(dhdx)], axis=-1)
    return n / jnp.linalg.norm(n, axis=-1, keepdims=True)


def wall_forces(params: ContactParams, pos, vel, radius, walls, d_n):
    """Near-vertical riser-face penalty forces from per-point wall channels
    (the last 6 of `terrain/composer.riser_channels`: per axis
    ``(pos, top, sign)``; solid occupies ``sign*(coord-pos) > 0`` below
    ``top``). The face is frictionless — a foot pressed against a stair
    riser slides down it instead of climbing, which is the PhysX-trimesh
    behavior the reference's slope correction exists to produce
    (`terrain_utils.py:286-328`).

    Returns ``(force (..., 3), inside (...))`` where ``inside`` marks points
    whose *center* is strictly within a wall's solid below its top — their
    vertical tread force must be suppressed (the nearest surface is the
    riser face; resolving such a point up through the high tread launches
    it ballistically — the r3 tunneling failure mode)."""
    out = jnp.zeros_like(pos)
    inside = jnp.zeros(pos.shape[:-1], bool)
    for a in range(2):
        wp = walls[..., 3 * a + 0]
        wt = walls[..., 3 * a + 1]
        ws = walls[..., 3 * a + 2]
        below = pos[..., 2] < wt
        pen = ws * (pos[..., a] - wp) + radius
        act = (ws != 0.0) & (pen > 0.0) & below
        v_n = -ws * vel[..., a]   # velocity along the face's OUTWARD normal
        f = jnp.maximum(params.stiffness * jnp.minimum(pen, 0.5) - d_n * v_n, 0.0)
        f = jnp.where(act, f, 0.0)
        out = out.at[..., a].add(-ws * f)
        inside = inside | ((ws != 0.0) & (ws * (pos[..., a] - wp) > 0.0) & below)
    return out, inside


def contact_forces(
    params: ContactParams,
    height_fn: HeightFn,
    pos: jax.Array,       # (P, 3) world point positions (sphere centers)
    vel: jax.Array,       # (P, 3) world point velocities
    radius: jax.Array,    # (P,)
    friction: jax.Array,      # per-env scalar (or (P,)) friction coefficient
    restitution: jax.Array,   # per-env scalar in [0, 1]
    dt: float,
    anchor: jax.Array = None,  # (P, 3) stick-friction anchors (world)
    ground_query=None,    # (x, y) -> (..., 9) riser channels (trimesh mode)
):
    """World-frame contact force (P, 3) on each proxy sphere.

    With ``anchor`` given, tangential friction is a spring to a per-point
    anchor that slips along the Coulomb cone (true static friction — no
    creep under sustained shear); returns ``(force, new_anchor)``.
    Without it, friction is the capped-viscous law and only the force is
    returned.

    With ``ground_query`` (trimesh mesh_type), the tread height/normal come
    from the riser-aware channels (analytic in-cell gradient, riser cells
    flattened to the low tread) and vertical riser faces push back
    horizontally via :func:`wall_forces`."""
    if ground_query is not None:
        ch = ground_query(pos[..., 0], pos[..., 1])
        h = ch[..., 0] + ch[..., 1] * pos[..., 0] + ch[..., 2] * pos[..., 1]
        nv = jnp.stack(
            [-ch[..., 1], -ch[..., 2], jnp.ones_like(h)], axis=-1
        )
        n = nv / jnp.linalg.norm(nv, axis=-1, keepdims=True)
        walls = ch[..., 3:]
    else:
        h = height_fn(pos[..., 0], pos[..., 1])
        n = ground_normal(height_fn, pos[..., 0], pos[..., 1])
        walls = None

    # deep-penetration clamp bounds the restoring force if a body tunnels
    # (PhysX: max_depenetration_velocity, legged_robot_config.py:49)
    depth = jnp.minimum(h - (pos[..., 2] - radius), 0.5)
    active = depth > 0.0

    v_n = jnp.sum(vel * n, axis=-1)
    v_t = vel - v_n[..., None] * n

    imp_cap = params.point_mass / dt  # max stable viscous coefficient
    zeta = params.damping_ratio * jnp.clip(1.0 - restitution, 0.05, 1.0)
    d_n = jnp.minimum(2.0 * zeta * jnp.sqrt(params.stiffness * params.point_mass), imp_cap)
    f_n = jnp.maximum(params.stiffness * depth - d_n * v_n, 0.0)
    f_n = jnp.where(active, f_n, 0.0)
    if walls is not None:
        f_wall, inside_wall = wall_forces(params, pos, vel, radius, walls, d_n)
        # a center inside a riser solid resolves horizontally, not up
        # through the high tread
        f_n = jnp.where(inside_wall, 0.0, f_n)

    cone = friction * f_n
    use_anchor = anchor is not None and params.tangent_stiffness > 0.0
    if use_anchor:
        # spring to anchor (projected to the tangent plane) + stabilizing
        # damping; the error clamp re-anchors gracefully across teleporting
        # resets
        err = jnp.clip(pos - anchor, -0.1, 0.1)
        err = err - jnp.sum(err * n, axis=-1, keepdims=True) * n
        d_t = jnp.minimum(
            2.0 * jnp.sqrt(params.tangent_stiffness * params.point_mass), imp_cap
        )
        f_t = -params.tangent_stiffness * err - d_t * v_t
        mag = jnp.linalg.norm(f_t, axis=-1)
        scale = jnp.minimum(1.0, cone / jnp.maximum(mag, 1e-9))
        f_t = f_t * scale[..., None]
        # slipping pairs drag their anchor to the cone boundary; airborne
        # points re-anchor at their current position
        new_anchor = pos + f_t / params.tangent_stiffness
        new_anchor = jnp.where(active[..., None], new_anchor, pos)
        f_t = jnp.where(active[..., None], f_t, 0.0)
    else:
        speed_t = jnp.linalg.norm(v_t, axis=-1)
        k_t = jnp.minimum(imp_cap, cone / jnp.maximum(speed_t, params.slip_velocity))
        f_t = -k_t[..., None] * v_t

    force = f_n[..., None] * n + f_t
    if walls is not None:
        force = force + f_wall
    if use_anchor:
        return force, new_anchor
    return force


def self_collision_forces(
    params: ContactParams,
    pos: jax.Array,       # (P, 3) world sphere centers
    vel: jax.Array,       # (P, 3) world sphere velocities
    radius: jax.Array,    # (P,)
    pairs_i,              # static tuple of point indices
    pairs_j,              # static tuple of point indices
    dt: float,
) -> jax.Array:
    """Sphere-sphere self-collision penalty forces, accumulated per point
    (P, 3).

    The reference enables robot self-collision in PhysX by default
    (``self_collisions = 0`` = enabled, `legged_robot_config.py:121`); here a
    static candidate pair list (filtered at env build: different bodies,
    non-adjacent, separated at the default pose) is tested every substep —
    pairs are O(10^2), branchless, VPU-only."""
    if not pairs_i:
        return jnp.zeros_like(pos)
    ii = jnp.asarray(pairs_i, jnp.int32)
    jj = jnp.asarray(pairs_j, jnp.int32)
    d = pos[ii] - pos[jj]                       # (K, 3)
    dist = jnp.linalg.norm(d, axis=-1)
    n = d / jnp.maximum(dist, 1e-6)[..., None]
    pen = (radius[ii] + radius[jj]) - dist
    active = pen > 0.0

    rel_v = vel[ii] - vel[jj]
    v_n = jnp.sum(rel_v * n, axis=-1)
    imp_cap = params.point_mass / dt
    k_self = params.self_collision_stiffness
    d_n = jnp.minimum(
        2.0 * params.damping_ratio * jnp.sqrt(k_self * params.point_mass), imp_cap
    )
    f_mag = jnp.maximum(k_self * jnp.minimum(pen, 0.1) - d_n * v_n, 0.0)
    f = jnp.where(active, f_mag, 0.0)[..., None] * n   # force on point i (+n), on j (-n)

    # accumulate per point via a static padded incidence table (a scatter-add
    # here cost 30% of the whole substep on TPU)
    num_points = pos.shape[-2]
    k = len(pairs_i)
    incidence = [[] for _ in range(num_points)]
    for slot, (a, b) in enumerate(zip(pairs_i, pairs_j)):
        incidence[a].append((slot, 1.0))
        incidence[b].append((slot, -1.0))
    maxdeg = max(len(lst) for lst in incidence)
    import numpy as _np

    slots = _np.full((num_points, maxdeg), k, _np.int32)   # k = zero-pad row
    signs = _np.zeros((num_points, maxdeg), _np.float32)
    for p, lst in enumerate(incidence):
        for col, (slot, sign) in enumerate(lst):
            slots[p, col] = slot
            signs[p, col] = sign
    f_pad = jnp.concatenate([f, jnp.zeros_like(f[:1])], axis=0)   # (K+1, 3)
    return jnp.sum(jnp.asarray(signs)[..., None] * f_pad[jnp.asarray(slots)], axis=1)


def body_wrenches(
    num_bodies: int,
    point_body: Tuple[int, ...],
    point_pos_rel: jax.Array,   # (P, 3) relative to the reference origin
    point_force: jax.Array,     # (P, 3)
) -> jax.Array:
    """Aggregate point forces into per-body spatial wrenches (B, 6) at the
    reference origin. Static topology -> unrolled per-body sums (elementwise;
    a one-hot matmul here would hit the MXU with a tiny contraction)."""
    tau = jnp.cross(point_pos_rel, point_force)
    wrench_p = jnp.concatenate([tau, point_force], axis=-1)   # (P, 6)
    zero = jnp.zeros(6, wrench_p.dtype)
    per_body = []
    for b in range(num_bodies):
        idx = [p for p, pb in enumerate(point_body) if pb == b]
        if not idx:
            per_body.append(zero)
        elif len(idx) == 1:
            per_body.append(wrench_p[idx[0]])
        else:
            per_body.append(jnp.sum(wrench_p[jnp.asarray(idx, jnp.int32)], axis=0))
    return jnp.stack(per_body)                                 # (B, 6)
