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
    """Write the actor as a .grxpolicy flat binary.

    MLP actors produce a version-1 file. Recurrent actors (params carrying
    ``memory_a``, learn/recurrent.RecurrentParams) produce a version-2 file
    with the actor's LSTM memory stack ahead of the MLP head — the native
    runtime then keeps hidden state inside the handle, the torch-free
    equivalent of the reference's PolicyExporterLSTM
    (`legged_gym/utils/helpers.py:204-231`)."""
    layers = [(np.asarray(w, np.float32), np.asarray(b, np.float32)) for w, b in params.actor]
    memory = getattr(params, "memory_a", None)
    with open(path, "wb") as f:
        version = 2 if memory else 1
        f.write(struct.pack("<IIII", 0x47525850, version, len(layers), _ACT_IDS[activation]))
        if memory:
            hidden = int(np.asarray(memory[0].w_hh).shape[0])
            f.write(struct.pack("<II", len(memory), hidden))
            for cell in memory:
                w_ih = np.asarray(cell.w_ih, np.float32)
                w_hh = np.asarray(cell.w_hh, np.float32)
                # b_ih and b_hh always enter the gates summed — fold them
                b = np.asarray(cell.b_ih, np.float32) + np.asarray(cell.b_hh, np.float32)
                f.write(struct.pack("<I", w_ih.shape[0]))
                f.write(w_ih.tobytes(order="C"))
                f.write(w_hh.tobytes(order="C"))
                f.write(b.tobytes(order="C"))
        for w, b in layers:
            f.write(struct.pack("<II", w.shape[0], w.shape[1]))
            f.write(w.tobytes(order="C"))
            f.write(b.tobytes(order="C"))


def ensure_library() -> str:
    """Build libgrxpolicy.so from source if missing or stale; return its path."""
    sources = [
        os.path.join(_NATIVE_DIR, "policy_runtime.cc"),
        os.path.join(_NATIVE_DIR, "policy_runtime.h"),
    ]
    if not os.path.exists(_LIB_PATH) or os.path.getmtime(_LIB_PATH) < max(
        os.path.getmtime(s) for s in sources
    ):
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
        lib.grx_policy_num_lstm_layers.argtypes = [ctypes.c_void_p]
        lib.grx_policy_reset.argtypes = [ctypes.c_void_p]
        self._lib = lib
        self._handle = lib.grx_policy_load(policy_path.encode())
        if not self._handle:
            raise IOError(f"failed to load policy {policy_path!r}")
        self.input_dim = lib.grx_policy_input_dim(self._handle)
        self.output_dim = lib.grx_policy_output_dim(self._handle)
        self.num_lstm_layers = lib.grx_policy_num_lstm_layers(self._handle)

    def reset(self) -> None:
        """Zero the recurrent hidden state (PolicyExporterLSTM.reset_memory);
        no-op for pure-MLP policies."""
        self._lib.grx_policy_reset(self._handle)

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
