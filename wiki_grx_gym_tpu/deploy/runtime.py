"""Python binding for the native policy runtime (ctypes).

Deployment-path parity with the reference's TorchScript export consumed by a
C++ controller (`legged_gym/utils/helpers.py:188-231`): policies are written
as flat `.grxpolicy` binaries (:func:`export_policy_bin`) and evaluated by
`deploy/native/libgrxpolicy.so` — no Python, no JAX, no torch on the robot.

The shared library is built on demand from the in-tree C++ source with g++
(the native toolchain is a build requirement, not a runtime one).
"""

from __future__ import annotations

import ctypes
import os
import struct
import subprocess
from typing import Sequence

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libgrxpolicy.so")

_ACT_IDS = {"elu": 0, "relu": 1, "tanh": 2}


def export_policy_bin(params, path: str, activation: str = "elu") -> None:
    """Write actor MLP weights as a .grxpolicy flat binary."""
    layers = [(np.asarray(w, np.float32), np.asarray(b, np.float32)) for w, b in params.actor]
    with open(path, "wb") as f:
        f.write(struct.pack("<IIII", 0x47525850, 1, len(layers), _ACT_IDS[activation]))
        for w, b in layers:
            f.write(struct.pack("<II", w.shape[0], w.shape[1]))
            f.write(w.tobytes(order="C"))
            f.write(b.tobytes(order="C"))


def ensure_library() -> str:
    """Build libgrxpolicy.so from source if missing; return its path."""
    if not os.path.exists(_LIB_PATH):
        subprocess.run(["sh", os.path.join(_NATIVE_DIR, "build.sh")], check=True)
    return _LIB_PATH


class NativePolicy:
    """Deterministic actor evaluated by the C++ runtime."""

    def __init__(self, policy_path: str):
        lib = ctypes.CDLL(ensure_library())
        lib.grx_policy_load.restype = ctypes.c_void_p
        lib.grx_policy_load.argtypes = [ctypes.c_char_p]
        lib.grx_policy_input_dim.argtypes = [ctypes.c_void_p]
        lib.grx_policy_output_dim.argtypes = [ctypes.c_void_p]
        lib.grx_policy_forward_batch.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
        ]
        lib.grx_policy_free.argtypes = [ctypes.c_void_p]
        self._lib = lib
        self._handle = lib.grx_policy_load(policy_path.encode())
        if not self._handle:
            raise IOError(f"failed to load policy {policy_path!r}")
        self.input_dim = lib.grx_policy_input_dim(self._handle)
        self.output_dim = lib.grx_policy_output_dim(self._handle)

    def __call__(self, obs: Sequence[float]) -> np.ndarray:
        obs = np.ascontiguousarray(obs, np.float32)
        squeeze = obs.ndim == 1
        if squeeze:
            obs = obs[None]
        assert obs.shape[1] == self.input_dim, (obs.shape, self.input_dim)
        out = np.empty((obs.shape[0], self.output_dim), np.float32)
        rc = self._lib.grx_policy_forward_batch(
            self._handle,
            obs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            obs.shape[0],
        )
        if rc:
            raise RuntimeError("native policy forward failed")
        return out[0] if squeeze else out

    def __del__(self):
        if getattr(self, "_handle", None):
            self._lib.grx_policy_free(self._handle)
            self._handle = None
