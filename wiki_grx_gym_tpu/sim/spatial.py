"""6D spatial-vector algebra (Featherstone), angular-first convention.

All spatial quantities live in a *single shared coordinate system per env*:
world-aligned axes with the origin placed at the robot's current base
position. Using one shared frame turns the usual frame-transform bookkeeping
of recursive dynamics into plain adds/matmuls — ideal for XLA fusion — and
keeping the origin at the base bounds the lever arms so float32 stays
accurate arbitrarily far from the world origin.

A motion vector (twist) is ``[w; v]`` where ``v`` is the linear velocity of
the body-fixed point currently coincident with the reference origin.
A force vector (wrench) is ``[tau; f]`` with ``tau`` the moment about the
reference origin.

This module replaces the spatial math inside the reference's PhysX binary
(`libPhysXGpu_64.so`, preloaded at `isaacgym/gymdeps.py:44-51`) with
batched jnp ops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from wiki_grx_gym_tpu.utils.maths import skew


def motion_cross(a: jax.Array, b: jax.Array) -> jax.Array:
    """Spatial motion cross product ``a x b`` for twists (..., 6)."""
    aw, av = a[..., :3], a[..., 3:]
    bw, bv = b[..., :3], b[..., 3:]
    return jnp.concatenate(
        [jnp.cross(aw, bw), jnp.cross(aw, bv) + jnp.cross(av, bw)], axis=-1
    )


def force_cross(a: jax.Array, f: jax.Array) -> jax.Array:
    """Spatial force cross product ``a x* f`` (twist a, wrench f)."""
    aw, av = a[..., :3], a[..., 3:]
    ft, ff = f[..., :3], f[..., 3:]
    return jnp.concatenate(
        [jnp.cross(aw, ft) + jnp.cross(av, ff), jnp.cross(aw, ff)], axis=-1
    )


def spatial_inertia(mass: jax.Array, com: jax.Array, inertia_com: jax.Array) -> jax.Array:
    """Spatial inertia (..., 6, 6) at the reference origin.

    Args:
        mass: (...,) body mass.
        com: (..., 3) center of mass position relative to the reference
            origin, in reference axes.
        inertia_com: (..., 3, 3) rotational inertia about the com, in
            reference axes.

    ``I = [[I_c - m cx cx, m cx], [-m cx, m E]]`` with ``cx = skew(com)``.
    """
    cx = skew(com)
    m = mass[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=cx.dtype), cx.shape)
    top_left = inertia_com - m * (cx @ cx)
    top_right = m * cx
    bot_left = -m * cx
    bot_right = m * eye
    top = jnp.concatenate([top_left, top_right], axis=-1)
    bot = jnp.concatenate([bot_left, bot_right], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def wrench_at(point: jax.Array, force: jax.Array, torque: jax.Array | None = None) -> jax.Array:
    """Wrench (..., 6) at the reference origin from a force applied at ``point``
    (position relative to the reference origin)."""
    tau = jnp.cross(point, force)
    if torque is not None:
        tau = tau + torque
    return jnp.concatenate([tau, force], axis=-1)


def revolute_subspace(axis_world: jax.Array, anchor: jax.Array) -> jax.Array:
    """Motion subspace S (..., 6) of a revolute joint: world-axes ``axis``
    through point ``anchor`` (relative to the reference origin)."""
    return jnp.concatenate([axis_world, jnp.cross(anchor, axis_world)], axis=-1)


def twist_kinetic_energy(inertia6: jax.Array, twist: jax.Array) -> jax.Array:
    """0.5 * v^T I v — used by energy-conservation tests."""
    return 0.5 * jnp.einsum("...i,...ij,...j->...", twist, inertia6, twist)
