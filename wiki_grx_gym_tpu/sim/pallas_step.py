"""Pallas TPU mega-kernel for the physics hot loop.

Runs the entire decimation loop (PD torques -> 10x [FK -> contact ->
CRBA/RNEA -> unrolled Cholesky -> integrate] -> foot accumulators) as ONE
`pallas_call`, executing the component-form program of `sim/scalarized.py`
entirely in VMEM.

Layout: the env batch is the vector axis. Every scalar component (a quat
element, one mass-matrix entry, ...) is an (8, 128) float32 tile of 1024
envs; component arrays are packed as ``(C, num_blocks, 8, 128)`` and the
grid walks ``num_blocks``. Per policy step the kernel reads the ~150
input components and writes the ~230 outputs exactly once — the
(N, B, 3, 3)-shaped HBM intermediates of the batched XLA path (the measured
bottleneck, docs/STATUS.md) do not exist.

Correctness contract: bit-compatible (to float-assoc tolerance) with the
`lax.scan` engine path, enforced by tests/test_scalarized.py +
tests/test_pallas.py (interpret mode on CPU, compiled on TPU).

Replaces: reference N2 hot loop `gym.simulate` x decimation
(`legged_robot_fftai.py:56-76`).
"""

from __future__ import annotations

import math
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from wiki_grx_gym_tpu.sim.scalarized import ScalarDecimation

_SUB = 8
_LANE = 128
ENV_BLOCK = _SUB * _LANE   # 1024 envs per grid step


def _schema(nd: int, np_: int, nf: int, with_last_qd: bool, npost: int = 0,
            plane_lanes: int = 0, post_extra=(), post_out=()):
    """(name, count) component layout for kernel input/output packing."""
    with_plane = plane_lanes > 0
    state = [
        ("pos", 3), ("quat", 4), ("lin", 3), ("ang", 3),
        ("q", nd), ("qd", nd), ("anchor", 3 * np_),
    ]
    inputs = state + [
        ("actions", nd), ("last_actions", nd), ("motor", nd),
        ("delay", 1), ("friction", 1), ("restitution", 1),
        ("mass_scale", 1), ("com_offset", 3),
    ]
    if with_last_qd:
        inputs.append(("last_qd", nd))
    if with_plane:
        # per-contact-point local ground lanes: (c, gx, gy) for heightfield
        # terrain, + per-axis riser walls (9 lanes) for trimesh
        # (scalarized.ScalarSubstep terrain_mode)
        inputs.append(("plane", plane_lanes * np_))
    # extra inputs of the in-kernel post-physics stage (LanePost.extra_schema)
    inputs += list(post_extra)
    outputs = state + [
        ("force_sum", nf), ("vxyz_sum", 3 * nf), ("vrpy_sum", 3 * nf),
        ("tau", nd), ("point_force", 3 * np_),
    ]
    if npost:
        # final-state FK of the env's post-physics bodies (feet + frames)
        outputs += [("post_quat", 4 * npost), ("post_rel", 3 * npost)]
    if with_plane:
        # final-state point positions: where the env resamples the planes
        outputs += [("point_pos", 3 * np_)]
    # post-physics stage outputs (LanePost.out_schema)
    outputs += list(post_out)
    return inputs, outputs


def _offsets(schema):
    off, out = 0, {}
    for name, cnt in schema:
        out[name] = (off, cnt)
        off += cnt
    return out, off


class PallasDecimation:
    """Callable wrapper: (batched arrays in) -> pallas_call -> (batched out).

    ``interpret=True`` runs the kernel through the Pallas interpreter
    (CPU-testable); on TPU the Mosaic-compiled kernel is used."""

    def __init__(self, deci: ScalarDecimation, interpret: bool = False,
                 lanes: bool = False):
        self.deci = deci
        self.interpret = bool(interpret)
        # lanes mode: run the exact kernel program as plain XLA ops on (N,)
        # lanes — no pallas_call, no (8,128) packing. CPU-testable
        # full-fidelity backend for the fold parity tests.
        self.lanes = bool(lanes)
        self.nd = deci.sub.nd
        self.np_ = deci.sub.np_
        self.nf = len(deci.feet_bodies)
        self.npost = len(deci.post_bodies)
        self.post = deci.post
        self.with_last_qd = deci.control_type == "V" or self.post is not None
        self.plane_lanes = deci.sub.plane_lanes
        self.with_plane = self.plane_lanes > 0
        self.post_extra = self.post.extra_schema() if self.post else ()
        self.post_out = self.post.out_schema() if self.post else ()
        self.in_schema, self.out_schema = _schema(
            self.nd, self.np_, self.nf, self.with_last_qd, self.npost,
            self.plane_lanes, self.post_extra, self.post_out,
        )
        self.in_off, self.c_in = _offsets(self.in_schema)
        self.out_off, self.c_out = _offsets(self.out_schema)

    # -- packing ------------------------------------------------------------

    def _pack(self, phys, actions, last_actions, motor, delay, rand, last_qd,
              plane=None, extra=None):
        """(N, ...) arrays -> (C_in, nb, 8, 128) component array."""
        n = actions.shape[0]
        cols = [
            phys.base_pos, phys.base_quat, phys.base_lin_vel, phys.base_ang_vel,
            phys.q, phys.qd, phys.anchor.reshape(n, -1),
            actions, last_actions, motor,
            delay.reshape(n, 1), rand.friction.reshape(n, 1),
            rand.restitution.reshape(n, 1), rand.base_mass_scale.reshape(n, 1),
            rand.base_com_offset,
        ]
        if self.with_last_qd:
            cols.append(last_qd)
        if self.with_plane:
            cols.append(plane.reshape(n, -1))
        for name, cnt in self.post_extra:
            cols.append(extra[name].reshape(n, cnt))
        comp = jnp.concatenate([c.astype(jnp.float32) for c in cols], axis=1).T  # (C, N)
        pad = (-n) % ENV_BLOCK
        if pad:
            comp = jnp.pad(comp, ((0, 0), (0, pad)), mode="edge")
        nb = comp.shape[1] // ENV_BLOCK
        return comp.reshape(self.c_in, nb, _SUB, _LANE), nb, n

    def _lanes_from_ref(self, ref, name):
        off, cnt = self.in_off[name]
        return [ref[off + i, 0] for i in range(cnt)]

    # -- kernel -------------------------------------------------------------

    def _kernel(self, in_ref, out_ref):
        g = self._lanes_from_ref
        nd, np_, nf = self.nd, self.np_, self.nf
        anchor_flat = g(in_ref, "anchor")
        state = {
            "pos": g(in_ref, "pos"),
            "quat": g(in_ref, "quat"),
            "lin": g(in_ref, "lin"),
            "ang": g(in_ref, "ang"),
            "q": g(in_ref, "q"),
            "qd": g(in_ref, "qd"),
            "anchor": [anchor_flat[3 * p: 3 * p + 3] for p in range(np_)],
            "friction": g(in_ref, "friction")[0],
            "restitution": g(in_ref, "restitution")[0],
            "mass_scale": g(in_ref, "mass_scale")[0],
            "com_offset": g(in_ref, "com_offset"),
        }
        if self.with_plane:
            plane_flat = g(in_ref, "plane")
            pl = self.plane_lanes
            state["plane"] = [plane_flat[pl * p: pl * p + pl] for p in range(np_)]
        actions = g(in_ref, "actions")
        last_actions = g(in_ref, "last_actions")
        motor = g(in_ref, "motor")
        delay = g(in_ref, "delay")[0]
        last_qd = g(in_ref, "last_qd") if self.with_last_qd else None
        extra = {name: g(in_ref, name) for name, _ in self.post_extra}

        state, acc = self.deci.run(
            state, actions, last_actions, motor, delay, last_qd, extra=extra
        )

        flat_out: List = (
            state["pos"] + state["quat"] + state["lin"] + state["ang"]
            + state["q"] + state["qd"]
            + [c for a in state["anchor"] for c in a]
            + acc["force_sum"]
            + [c for v in acc["vxyz_sum"] for c in v]
            + [c for v in acc["vrpy_sum"] for c in v]
            + acc["tau"]
            + [c for p in acc["point_force"] for c in p]
        )
        if self.npost:
            flat_out += [c for q in acc["post_quat"] for c in q]
            flat_out += [c for r in acc["post_rel"] for c in r]
        if self.with_plane:
            flat_out += [c for p in acc["point_pos"] for c in p]
        if self.post is not None:
            po = acc["post"]
            for name, cnt in self.post_out:
                lanes = po[name]
                assert len(lanes) == cnt, (name, len(lanes), cnt)
                flat_out += list(lanes)
        assert len(flat_out) == self.c_out
        for i, lane in enumerate(flat_out):
            out_ref[i, 0] = jnp.broadcast_to(lane, (_SUB, _LANE)).astype(jnp.float32)

    # -- call ---------------------------------------------------------------

    def __call__(self, phys, actions, last_actions, motor, delay, rand, last_qd=None,
                 plane=None, extra=None):
        """Returns (new_phys, force_sum (N,F), vxyz_sum (N,F,3),
        vrpy_sum (N,F,3), tau (N,D), point_force (N,P,3),
        post_kin: (post_rel (N,R,3), post_quat (N,R,4)) or None,
        point_pos (N,P,3) or None,
        post_out: dict of (N, cnt) arrays per LanePost.out_schema or None)."""
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        if self.lanes:
            return self._call_lanes(
                phys, actions, last_actions, motor, delay, rand, last_qd, plane, extra
            )

        comp, nb, n = self._pack(
            phys, actions, last_actions, motor, delay, rand, last_qd, plane, extra
        )

        out = pl.pallas_call(
            self._kernel,
            out_shape=jax.ShapeDtypeStruct((self.c_out, nb, _SUB, _LANE), jnp.float32),
            grid=(nb,),
            in_specs=[
                pl.BlockSpec(
                    (self.c_in, 1, _SUB, _LANE),
                    lambda i: (0, i, 0, 0),
                    memory_space=pltpu.VMEM,
                )
            ],
            out_specs=pl.BlockSpec(
                (self.c_out, 1, _SUB, _LANE),
                lambda i: (0, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            interpret=self.interpret,
        )(comp)

        flat = out.reshape(self.c_out, nb * ENV_BLOCK)[:, :n]  # (C_out, N)

        def take(name):
            off, cnt = self.out_off[name]
            return flat[off: off + cnt].T  # (N, cnt)

        new_phys = phys.replace(
            base_pos=take("pos"),
            base_quat=take("quat"),
            base_lin_vel=take("lin"),
            base_ang_vel=take("ang"),
            q=take("q"),
            qd=take("qd"),
            anchor=take("anchor").reshape(n, self.np_, 3),
        )
        post_kin = None
        if self.npost:
            post_kin = (
                take("post_rel").reshape(n, self.npost, 3),
                take("post_quat").reshape(n, self.npost, 4),
            )
        point_pos = (
            take("point_pos").reshape(n, self.np_, 3) if self.with_plane else None
        )
        post_out = (
            {name: take(name) for name, _ in self.post_out}
            if self.post is not None else None
        )
        return (
            new_phys,
            take("force_sum"),
            take("vxyz_sum").reshape(n, self.nf, 3),
            take("vrpy_sum").reshape(n, self.nf, 3),
            take("tau"),
            take("point_force").reshape(n, self.np_, 3),
            post_kin,
            point_pos,
            post_out,
        )

    # -- lanes mode (no pallas machinery, same program) ----------------------

    def _call_lanes(self, phys, actions, last_actions, motor, delay, rand,
                    last_qd, plane, extra):
        from wiki_grx_gym_tpu.sim.scalarized import state_to_lanes

        n = actions.shape[0]
        lanes = state_to_lanes(phys)
        lanes.update(
            friction=rand.friction, restitution=rand.restitution,
            mass_scale=rand.base_mass_scale,
            com_offset=[rand.base_com_offset[..., k] for k in range(3)],
        )
        if self.with_plane:
            pl_ = self.plane_lanes
            lanes["plane"] = [
                [plane[:, p, k] for k in range(pl_)] for p in range(self.np_)
            ]
        cols = lambda a: [a[..., i] for i in range(a.shape[-1])]
        extra_lanes = {
            name: cols(extra[name].reshape(n, cnt)) for name, cnt in self.post_extra
        }
        state, acc = self.deci.run(
            lanes, cols(actions), cols(last_actions), cols(motor), delay,
            cols(last_qd) if self.with_last_qd else None, extra=extra_lanes,
        )
        stack = lambda ls: jnp.stack([jnp.broadcast_to(x, (n,)) for x in ls], axis=-1)
        new_phys = phys.replace(
            base_pos=stack(state["pos"]), base_quat=stack(state["quat"]),
            base_lin_vel=stack(state["lin"]), base_ang_vel=stack(state["ang"]),
            q=stack(state["q"]), qd=stack(state["qd"]),
            anchor=jnp.stack([stack(a) for a in state["anchor"]], axis=-2),
        )
        post_kin = None
        if self.npost:
            post_kin = (
                jnp.stack([stack(r) for r in acc["post_rel"]], axis=-2),
                jnp.stack([stack(q) for q in acc["post_quat"]], axis=-2),
            )
        point_pos = (
            jnp.stack([stack(p) for p in acc["point_pos"]], axis=-2)
            if self.with_plane else None
        )
        post_out = None
        if self.post is not None:
            post_out = {
                name: stack(acc["post"][name]) for name, _ in self.post_out
            }
        return (
            new_phys,
            stack(acc["force_sum"]),
            jnp.stack([stack(v) for v in acc["vxyz_sum"]], axis=-2),
            jnp.stack([stack(v) for v in acc["vrpy_sum"]], axis=-2),
            stack(acc["tau"]),
            jnp.stack([stack(p) for p in acc["point_force"]], axis=-2),
            post_kin,
            point_pos,
            post_out,
        )
