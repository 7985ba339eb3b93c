"""Save/load compiled RobotModel specs as JSON.

The compiled spec (collapsed bodies, composed inertias, proxy spheres) is the
framework's native asset format — the analogue of what the reference's binary
importer produces in-memory from a URDF at startup
(`legged_robot.py:947-1005`). Shipping the compiled spec makes the framework
standalone; `tools/import_urdf.py` regenerates specs from any URDF.
"""

from __future__ import annotations

import json
from typing import Union

import numpy as np
import jax.numpy as jnp

from wiki_grx_gym_tpu.models.robot import RobotModel

_ARRAY_FIELDS = (
    "tree_pos",
    "tree_quat",
    "axis",
    "mass",
    "com",
    "inertia",
    "armature",
    "dof_lower",
    "dof_upper",
    "dof_vel_limit",
    "dof_effort_limit",
    "point_offset",
    "point_radius",
)
_STATIC_FIELDS = ("parent", "point_body", "point_link", "name", "body_names", "dof_names", "link_names", "link_frames")


def save_robot(model: RobotModel, path: str) -> None:
    blob = {}
    for f in _ARRAY_FIELDS:
        blob[f] = np.asarray(getattr(model, f)).tolist()
    for f in _STATIC_FIELDS:
        blob[f] = getattr(model, f)
    with open(path, "w") as fh:
        json.dump(blob, fh, indent=1)


def _tuplify(x):
    if isinstance(x, list):
        return tuple(_tuplify(v) for v in x)
    return x


def load_robot(path: str) -> RobotModel:
    with open(path) as fh:
        blob = json.load(fh)
    kwargs = {}
    for f in _ARRAY_FIELDS:
        kwargs[f] = jnp.asarray(np.asarray(blob[f], dtype=np.float32))
    for f in _STATIC_FIELDS:
        v = blob[f]
        kwargs[f] = _tuplify(v) if isinstance(v, list) else v
    return RobotModel(**kwargs)
