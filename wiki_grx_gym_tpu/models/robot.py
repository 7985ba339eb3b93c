"""Static robot description pytree — the TPU-native replacement for the
reference's native asset pipeline.

In the reference, `gym.load_asset` (called from
`legged_gym/legged_gym/envs/base/legged_robot.py:966`) hands a URDF to the
binary importer (`liburdfFileFormat.so`) and every later query goes through
handles (`find_actor_rigid_body_handle`, DOF property arrays, ...). Here the
entire robot is compiled **once, at build time, on the host** into a
`RobotModel`: a pytree of small arrays plus hashable metadata. All
name→index resolution happens at compile time; nothing in the hot path ever
touches a string or a handle.

Conventions:
- Moving bodies are topologically ordered; body 0 is the floating base.
- Every moving body ``i > 0`` is connected to ``parent[i]`` by revolute DOF
  ``i - 1`` (fixed joints are welded away at compile time, mirroring what
  IsaacGym's ``collapse_fixed_joints`` asset option does —
  `legged_robot_config.py:118`).
- Contact proxy spheres are generated from the URDF collision geometry and
  attached to moving bodies; each remembers which *original* link it came
  from so per-named-body net contact forces (the reference's
  ``net_contact_force_tensor``) stay available.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class RobotModel:
    # --- joint geometry (device arrays) ---
    tree_pos: jax.Array        # (B, 3) parent-frame position of joint/body frame at q=0
    tree_quat: jax.Array       # (B, 4) parent-frame orientation (x,y,z,w) at q=0
    axis: jax.Array            # (B, 3) revolute axis in body frame (row 0 unused)
    # --- per-body inertial params (body frame) ---
    mass: jax.Array            # (B,)
    com: jax.Array             # (B, 3)
    inertia: jax.Array         # (B, 3, 3) about com
    # --- per-DOF params (D = B - 1) ---
    armature: jax.Array        # (D,)
    dof_lower: jax.Array       # (D,)
    dof_upper: jax.Array       # (D,)
    dof_vel_limit: jax.Array   # (D,)
    dof_effort_limit: jax.Array  # (D,)
    # --- contact proxy spheres ---
    point_offset: jax.Array    # (P, 3) body-frame offset of sphere center
    point_radius: jax.Array    # (P,)
    # --- static topology (hashable; drives unrolled tree loops at trace time) ---
    parent: Tuple[int, ...] = struct.field(pytree_node=False, default=())
    point_body: Tuple[int, ...] = struct.field(pytree_node=False, default=())
    point_link: Tuple[int, ...] = struct.field(pytree_node=False, default=())
    # --- static metadata (hashable; not traced) ---
    # asset option disable_gravity (legged_robot.py:960): 0.0 turns gravity
    # off for the whole articulation; folds at trace time
    gravity_scale: float = struct.field(pytree_node=False, default=1.0)
    name: str = struct.field(pytree_node=False, default="")
    body_names: Tuple[str, ...] = struct.field(pytree_node=False, default=())
    dof_names: Tuple[str, ...] = struct.field(pytree_node=False, default=())
    link_names: Tuple[str, ...] = struct.field(pytree_node=False, default=())
    # link_name -> (moving body idx, offset xyz, offset quat xyzw)
    link_frames: Tuple[Tuple[str, int, Tuple[float, ...], Tuple[float, ...]], ...] = struct.field(
        pytree_node=False, default=()
    )

    @property
    def num_bodies(self) -> int:
        return len(self.parent)

    @property
    def num_dof(self) -> int:
        return len(self.parent) - 1

    @property
    def num_points(self) -> int:
        return len(self.point_body)

    def ancestors(self, body: int) -> Tuple[int, ...]:
        """Chain of ancestor bodies of ``body`` (excluding the base, including
        ``body`` itself if > 0), root-most first."""
        chain = []
        b = body
        while b > 0:
            chain.append(b)
            b = self.parent[b]
        return tuple(reversed(chain))

    # ---- name resolution (host-side, build time only) ----

    def link_frame(self, link_name: str) -> Tuple[int, jnp.ndarray, jnp.ndarray]:
        """(moving body index, body-frame offset pos, quat) of an original link."""
        for name, body, pos, quat in self.link_frames:
            if name == link_name:
                return body, jnp.asarray(pos, jnp.float32), jnp.asarray(quat, jnp.float32)
        raise KeyError(f"unknown link {link_name!r}")

    def find_links(self, substring: str) -> Tuple[str, ...]:
        """All original link names containing ``substring`` — mirrors the
        substring matching of `gr1t1.py:21-37` (`_create_envs_get_indices`)."""
        return tuple(n for n in self.link_names if substring in n)

    def find_dofs(self, substring: str) -> Tuple[int, ...]:
        """DOF indices whose joint name contains ``substring`` — mirrors
        `gr1t1.py:180-253` (`_init_buffers_joint_indices`)."""
        return tuple(i for i, n in enumerate(self.dof_names) if substring in n)

    def link_point_mask(self, link_names) -> jnp.ndarray:
        """(P,) float mask of contact points belonging to any of the links."""
        idx = {self.link_names.index(n) for n in link_names}
        return jnp.asarray([1.0 if l in idx else 0.0 for l in self.point_link], jnp.float32)

    def summary(self) -> Dict[str, Any]:
        return {
            "name": self.name,
            "num_bodies": self.num_bodies,
            "num_dof": self.num_dof,
            "num_points": self.num_points,
            "total_mass": float(jnp.sum(self.mass)),
            "dof_names": list(self.dof_names),
        }
