"""Fused PPO update as Pallas kernels.

The PPO update is 200 sequential grad steps (8 epochs x 25 minibatches,
`gr1t1_config.py:273-274`, mirroring the reference
`rsl_rl/algorithms/ppo.py:215-309`) over a tiny [512, 256, 128] MLP pair.
As XLA ops each step is ~30 separate kernels (16 matmuls + the loss/Adam
elementwise chain), each a launch + HBM round trip over (B, width)
activations — measured 0.276 ms/step at B~=10480 on v5e against a ~0.18 ms
MXU-padded roofline (docs/STATUS.md j13), 54.6 ms of a 79.1 ms iteration.

Two kernels, sharing one tile program (`_tile_body`):

- ``grads``: ONE minibatch's gradient — actor+critic forward, the
  clipped-PPO loss math, and a hand-derived backward — as one
  `pallas_call`. Weights/accumulators live in VMEM across the batch-tile
  grid (constant `index_map`); hidden activations exist only as VMEM
  values between the fused matmuls; the minibatch is selected by a
  scalar-prefetch index straight out of the update's shuffled buffer.
- ``update_scan``: the ENTIRE update — all 200 grad steps PLUS
  clip-by-global-norm, Adam, the adaptive-KL learning rate and the
  NaN-loss skip — as one `pallas_call` over a (steps, tiles) grid.
  Parameters, Adam moments and grad accumulators persist in VMEM scratch
  for the whole update (DMA'd in once, out once); per-step HBM traffic is
  just the streamed minibatch tiles. Kills the 200 kernel launches, the
  per-step parameter/optimizer HBM round trips, and the ~10-op optax
  chain (measured 11 us/step) of the scan-of-kernels form.

Matmul operands are bf16 with f32 accumulation — numerically the same
class as the XLA path, whose DEFAULT-precision f32 matmuls run bf16
passes on the MXU anyway. Backward math mirrors `jax.grad` of
`PPO._minibatch_loss` exactly, including JAX's subgradient conventions
(`maximum` ties and `clip` boundaries get 0.5); optimizer math mirrors
`optax.clip_by_global_norm` + `optax.adam` step for step. Equivalence is
enforced by tests/test_fused_update.py against `jax.value_and_grad` (and
the whole XLA update) at f32 in interpreter mode.

Reference counterpart: `rsl_rl/rsl_rl/algorithms/ppo.py:215-309`
(compute losses + backprop + step); there it is torch autograd over cuBLAS
calls — here the whole update phase is one TPU kernel program.
"""

from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LOG_2PI = float(np.log(2.0 * np.pi))


def _elu(z):
    # expm1 has no Mosaic lowering; exp(z) - 1 is adequate for z <= 0
    # (no cancellation: exp(z) <= 1, and near z ~= 0 the absolute error is
    # ~1e-8 f32 — far below the kernel's bf16 operand rounding)
    return jnp.where(z > 0, z, jnp.exp(z) - 1.0)


def _elu_grad_from_h(h):
    # h = elu(z): for z > 0, h = z and elu' = 1; else h = e^z - 1, elu' = h + 1.
    return jnp.where(h > 0, 1.0, h + 1.0)


def _max_grad(a, b):
    """d max(a, b) / da with JAX's tie convention (0.5 at a == b)."""
    return jnp.where(a > b, 1.0, jnp.where(a < b, 0.0, 0.5))


def _clip_grad(x, lo, hi):
    """d clip(x, lo, hi) / dx: 1 interior, 0 outside, 0.5 at the boundary
    (jnp.clip = minimum(maximum(x, lo), hi); each tie contributes 0.5)."""
    return jnp.where(
        (x > lo) & (x < hi),
        1.0,
        jnp.where((x == lo) | (x == hi), 0.5, 0.0),
    )


class FusedPPOGrad:
    """Builds and calls the fused PPO-update kernels.

    Static spec captured at construction: layer dims, loss + optimizer
    constants, batch geometry.
    """

    def __init__(
        self,
        net,                    # learn.networks.ActorCritic (MLP, elu, no out act)
        clip_param: float,
        value_loss_coef: float,
        entropy_coef: float,
        use_clipped_value_loss: bool,
        rows: int,              # samples per minibatch (static)
        num_mini_batches: int,
        num_epochs: int = 1,
        tile: int = 512,
        op_dtype=jnp.bfloat16,  # matmul operand dtype (f32 for exact CPU tests)
        # optimizer/LR constants (update_scan only)
        max_grad_norm: float = 1.0,
        adam_b1: float = 0.9,
        adam_b2: float = 0.999,
        adam_eps: float = 1e-8,
        adaptive_lr: bool = True,
        desired_kl: float = 0.01,
        lr_min: float = 1e-5,
        lr_max: float = 1e-2,
        vmem_limit_mb: int = 16,
        interpret: bool = False,
    ):
        self.net = net
        self.obs_dim = int(net.num_actor_input)
        self.cobs_dim = int(net.num_critic_input)
        self.act_dim = int(net.num_actions)
        self.actor_dims = [self.obs_dim] + list(net.actor_hidden) + [self.act_dim]
        self.critic_dims = [self.cobs_dim] + list(net.critic_hidden) + [1]
        self.fixed_std = bool(net.fixed_std)
        self.init_noise_std = float(net.init_noise_std)
        # exploration floor: std projected back after each in-kernel Adam
        # step (mirrors PPO._project_std on the XLA / per-step paths)
        self.std_floor = (
            0.0 if self.fixed_std else float(getattr(net, "noise_std_floor", 0.0))
        )
        self.clip_param = float(clip_param)
        self.value_loss_coef = float(value_loss_coef)
        self.entropy_coef = float(entropy_coef)
        self.use_clipped_value_loss = bool(use_clipped_value_loss)
        self.rows = int(rows)
        self.num_mini_batches = int(num_mini_batches)
        self.num_epochs = int(num_epochs)
        self.tile = int(min(tile, max(8, rows)))
        self.n_tiles = pl.cdiv(self.rows, self.tile)
        self.op_dtype = op_dtype
        self.max_grad_norm = float(max_grad_norm)
        self.adam_b1 = float(adam_b1)
        self.adam_b2 = float(adam_b2)
        self.adam_eps = float(adam_eps)
        self.adaptive_lr = bool(adaptive_lr)
        self.desired_kl = float(desired_kl)
        self.lr_min = float(lr_min)
        self.lr_max = float(lr_max)
        self.vmem_limit_mb = int(vmem_limit_mb)
        self.interpret = bool(interpret)

    def mega_vmem_bytes(self, tile: int) -> int:
        """Scoped-VMEM estimate for the whole-update kernel at a given batch
        tile: persistent p/m/v/grad scratches (padded to the (8, 128) f32
        tiling), double-buffered data windows, and the tile's live
        activations/transients. Calibrated against the Mosaic allocator's
        reported sizes (GR1T1 @512 fits ~14.5 MB; the 32-DOF full-body
        @512 was refused at >16 MB)."""
        p8 = lambda x: -(-x // 8) * 8
        p128 = lambda x: -(-x // 128) * 128
        per_tensor = 0
        dims_all = [self.actor_dims, self.critic_dims]
        for dims in dims_all:
            for a, b in zip(dims[:-1], dims[1:]):
                per_tensor += p8(a) * p128(b) + 8 * p128(b)   # W + bias row
        per_tensor += 8 * p128(self.act_dim)                  # std
        scratch = 4 * per_tensor * 4                          # p, m, v, g f32
        fdim = 3 * self.act_dim + 4
        data = 2 * tile * (
            (p128(self.obs_dim) + p128(self.cobs_dim)) * 2    # bf16 windows
            + p128(fdim) * 4
        )
        width = sum(self.actor_dims[1:]) + sum(self.critic_dims[1:])
        act = tile * p128(width) * 6                          # h/z/g transients
        return scratch + data + act + (1 << 19)

    def pick_mega_tile(self, budget: int = (15 << 20) + (1 << 19)):
        """Largest batch tile whose whole-update kernel fits the scoped-VMEM
        budget; None = the model is too large for the mega form (fall back
        to the per-step kernel scan)."""
        for t in (self.tile, 384, 256, 128):
            if t <= self.tile and self.mega_vmem_bytes(t) <= budget:
                return t
        return None

    @staticmethod
    def supported(net, extra_loss_fn) -> bool:
        """The kernels cover the reference MLP path: elu hidden activations,
        linear heads, no calculate_other_loss hook."""
        import jax.nn

        return (
            extra_loss_fn is None
            and getattr(net, "actor_hidden", None) is not None
            and net.activation is jax.nn.elu
            and net.actor_out_act is None
            and net.critic_out_act is None
        )

    # ------------------------------------------------------------------
    # shared tile program: fwd + loss + bwd for one (tile, feat) batch slab
    # ------------------------------------------------------------------

    def _tile_body(self, t, data, aW, cW, std_r, d_aW, d_cW, d_std):
        """Run one batch tile: forward both MLPs, the loss math, the
        backward; accumulate wgrads into ``d_*`` refs. Returns
        (surr_sum, vl_sum, kl_sum) scalar partial sums for this tile.

        ``t``: tile index (for the last-tile row mask). ``data``: the three
        (T, F) tile values — obs, critic_obs, and the packed f32 fields
        (actions | log_prob | mu | sigma | values | returns | advantages,
        exactly the update's shuffle-buffer lane order: one narrow window
        instead of six separately lane-padded ones saves ~1.5 MB of VMEM).
        Param refs are read with ``[...]`` — works for both pipelined
        windows and VMEM scratch."""
        op = self.op_dtype
        T = self.tile
        A = self.act_dim
        B = float(self.rows)

        row = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0) + t * T
        mask = row < self.rows          # (T, 1) bool

        def clean(x, fill=0.0):
            return jnp.where(mask, x, jnp.asarray(fill, x.dtype))

        obs_t, cobs_t, fs = data
        obs_t = clean(obs_t).astype(op)         # (T, O)
        cobs_t = clean(cobs_t).astype(op)       # (T, P)
        actions = clean(fs[:, 0:A])             # (T, A) f32
        old_logp = clean(fs[:, A : A + 1])
        old_mu = clean(fs[:, A + 1 : 2 * A + 1])
        old_sigma = clean(fs[:, 2 * A + 1 : 3 * A + 1], 1.0)
        old_values = clean(fs[:, 3 * A + 1 : 3 * A + 2])
        returns = clean(fs[:, 3 * A + 2 : 3 * A + 3])
        adv = clean(fs[:, 3 * A + 3 : 3 * A + 4])

        # ---- forward: both MLPs, activations held as VMEM values ----
        def fwd(x_bf, layers):
            hs = [x_bf]
            z = None
            for li, (w, b) in enumerate(layers):
                z = (
                    jnp.dot(hs[-1], w[...].astype(op),
                            preferred_element_type=jnp.float32)
                    + b[...]
                )
                if li < len(layers) - 1:
                    hs.append(_elu(z).astype(op))
            return hs, z                        # layer inputs, final f32

        h_a, mean = fwd(obs_t, aW)              # mean (T, A) f32
        h_c, value = fwd(cobs_t, cW)            # value (T, 1) f32

        if self.fixed_std:
            std = jnp.full((1, self.act_dim), self.init_noise_std, jnp.float32)
        else:
            std = std_r[...]                    # (1, A) f32
        var = std * std

        # ---- loss forward (per-row, f32) ----
        diff = actions - mean                   # (T, A)
        logp = (
            -0.5 * jnp.sum(diff * diff / var, axis=1, keepdims=True)
            - (0.5 * self.act_dim * _LOG_2PI + jnp.sum(jnp.log(std)))
        )                                       # (T, 1)
        ratio = jnp.exp(logp - old_logp)
        lo, hi = 1.0 - self.clip_param, 1.0 + self.clip_param
        ratio_c = jnp.clip(ratio, lo, hi)
        surr1 = -adv * ratio
        surr2 = -adv * ratio_c
        surr = jnp.maximum(surr1, surr2)

        kl_row = jnp.sum(
            jnp.log(std / old_sigma + 1e-5)
            + (old_sigma * old_sigma + (old_mu - mean) ** 2) / (2.0 * var)
            - 0.5,
            axis=1,
            keepdims=True,
        )

        e = value - returns
        if self.use_clipped_value_loss:
            vdelta = value - old_values
            ec = old_values + jnp.clip(vdelta, -self.clip_param, self.clip_param) - returns
            e2, ec2 = e * e, ec * ec
            vl = jnp.maximum(e2, ec2)
            gm = _max_grad(e2, ec2)
            gv_raw = gm * (2.0 * e) + (1.0 - gm) * (
                2.0 * ec * _clip_grad(vdelta, -self.clip_param, self.clip_param)
            )
        else:
            vl = e * e
            gv_raw = 2.0 * e

        # ---- backward seeds (masked SELECTS — NaN-safe) ----
        gm_s = _max_grad(surr1, surr2)
        d_ratio = gm_s * (-adv) + (1.0 - gm_s) * (-adv * _clip_grad(ratio, lo, hi))
        zero = jnp.zeros((), jnp.float32)
        coef = jnp.where(mask, d_ratio * ratio * (1.0 / B), zero)     # dL/dlogp
        g_mean = coef * (diff / var)                                  # (T, A)
        g_val = jnp.where(mask, gv_raw * (self.value_loss_coef / B), zero)

        if not self.fixed_std:
            # d logp / d std = (diff^2/var - 1) / std, weighted by coef
            d_std[...] += jnp.sum(
                coef * (diff * diff / var - 1.0) / std, axis=0, keepdims=True
            )

        # ---- backward through both MLPs ----
        def bwd(g_out, hs, layers, d_layers):
            g = g_out.astype(op)                # (T, out)
            for li in range(len(layers) - 1, -1, -1):
                w, _ = layers[li]
                dw, db = d_layers[li]
                # wgrad: contract the batch dim of h^T g
                dw[...] += jax.lax.dot_general(
                    hs[li], g,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                db[...] += jnp.sum(g, axis=0, keepdims=True, dtype=jnp.float32)
                if li > 0:
                    # dgrad: g @ W^T, then through elu
                    gx = jax.lax.dot_general(
                        g, w[...].astype(op),
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    g = (gx * _elu_grad_from_h(hs[li].astype(jnp.float32))).astype(op)

        bwd(g_mean, h_a, aW, d_aW)
        bwd(g_val, h_c, cW, d_cW)

        def s(x):
            return jnp.sum(jnp.where(mask, x, zero))

        return s(surr), s(vl), s(kl_row)

    def _entropy(self, std_r):
        if self.fixed_std:
            return float(
                self.act_dim * (0.5 + 0.5 * _LOG_2PI)
                + self.act_dim * np.log(self.init_noise_std)
            )
        return jnp.sum(0.5 + 0.5 * _LOG_2PI + jnp.log(std_r[...]))

    # ------------------------------------------------------------------
    # kernel 1: one minibatch's gradients
    # ------------------------------------------------------------------

    def _grads_kernel(self, *refs):
        nA = len(self.actor_dims) - 1
        nC = len(self.critic_dims) - 1
        it = iter(refs)
        _idx = next(it)                 # consumed by index_map only
        data_refs = [next(it) for _ in range(3)]
        aW = [(next(it), next(it)) for _ in range(nA)]
        cW = [(next(it), next(it)) for _ in range(nC)]
        std_r = next(it)
        d_aW = [(next(it), next(it)) for _ in range(nA)]
        d_cW = [(next(it), next(it)) for _ in range(nC)]
        d_std = next(it)
        aux_r = next(it)

        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            for dw, db in d_aW + d_cW:
                dw[...] = jnp.zeros_like(dw)
                db[...] = jnp.zeros_like(db)
            d_std[...] = jnp.zeros_like(d_std)
            aux_r[...] = jnp.zeros_like(aux_r)

        data = [r[0] for r in data_refs]
        ss, sv, sk = self._tile_body(i, data, aW, cW, std_r, d_aW, d_cW, d_std)
        aux_r[...] += jnp.concatenate(
            [ss.reshape(1, 1), sv.reshape(1, 1), sk.reshape(1, 1),
             jnp.zeros((1, 5), jnp.float32)],
            axis=1,
        )

    def split_buffers(self, shuf_w, shuf_f, obs_dim: int):
        """Slice the update's wide shuffle buffer (1, MB, rows, O+P) into
        the obs/critic_obs operands ONCE per update (the critic slice at
        lane offset O is not expressible as a BlockSpec index_map); the f32
        fields stay as the packed buffer and are lane-sliced in-kernel."""
        mb = self.num_mini_batches
        w = shuf_w.reshape(mb, self.rows, -1)
        return dict(
            obs=w[..., :obs_dim],
            cobs=w[..., obs_dim:],
            fscal=shuf_f.reshape(mb, self.rows, -1),
        )

    def _data_arrays(self, bufs):
        return [bufs["obs"], bufs["cobs"], bufs["fscal"]]

    def _param_ops(self, params):
        """Flatten params into the kernel operand list; weights pre-cast to
        the operand dtype ONCE per call (beats 17 per-tile casts in-kernel,
        each a VPU relayout between f32 (8,128) and bf16 (16,128) tilings).
        Grads stay f32 regardless."""
        cast = (
            (lambda w: w.astype(self.op_dtype))
            if self.op_dtype != jnp.float32
            else (lambda w: w)
        )

        def as2d(b):
            return b.reshape(1, -1)

        ops: List[jax.Array] = []
        for w, b in params.actor:
            ops += [cast(w), as2d(b)]
        for w, b in params.critic:
            ops += [cast(w), as2d(b)]
        ops.append(as2d(params.std))
        return ops

    def _grad_shapes(self, params):
        shapes = []
        for w, b in list(params.actor) + list(params.critic):
            shapes += [jax.ShapeDtypeStruct(w.shape, jnp.float32),
                       jax.ShapeDtypeStruct((1,) + b.shape, jnp.float32)]
        shapes.append(jax.ShapeDtypeStruct((1,) + params.std.shape, jnp.float32))
        return shapes

    @functools.partial(jax.jit, static_argnums=0)
    def grads(self, params, bufs, mb_index):
        """Gradient of PPO._minibatch_loss for minibatch ``mb_index``.

        ``bufs``: dict from :meth:`split_buffers` (leaves (MB, rows, F)).
        Returns (loss, grads pytree shaped like params, aux dict)."""
        nA = len(self.actor_dims) - 1
        nC = len(self.critic_dims) - 1
        T = self.tile

        def data_spec(feat):
            return pl.BlockSpec(
                (1, T, feat), lambda i, idx: (idx[0], i, 0), memory_space=pltpu.VMEM
            )

        def const_spec(shape):
            return pl.BlockSpec(
                shape, lambda i, idx: (0,) * len(shape), memory_space=pltpu.VMEM
            )

        data = self._data_arrays(bufs)
        param_ops = self._param_ops(params)
        in_specs = [data_spec(x.shape[-1]) for x in data]
        in_specs += [const_spec(p.shape) for p in param_ops]

        out_shapes = self._grad_shapes(params) + [
            jax.ShapeDtypeStruct((1, 8), jnp.float32)
        ]
        out_specs = [const_spec(o.shape) for o in out_shapes]

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(self.n_tiles,),
            in_specs=in_specs,
            out_specs=out_specs,
        )
        outs = pl.pallas_call(
            self._grads_kernel,
            grid_spec=grid_spec,
            out_shape=out_shapes,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=self.vmem_limit_mb << 20,
            ),
            interpret=self.interpret,
        )(jnp.asarray(mb_index, jnp.int32).reshape(1), *data, *param_ops)

        it = iter(outs)
        g_actor = [(next(it), next(it)[0]) for _ in range(nA)]
        g_critic = [(next(it), next(it)[0]) for _ in range(nC)]
        g_std_kernel = next(it)[0]
        aux_acc = next(it)

        B = float(self.rows)
        surr_mean = aux_acc[0, 0] / B
        vl_mean = aux_acc[0, 1] / B
        kl_mean = aux_acc[0, 2] / B

        if self.fixed_std:
            g_std = jnp.zeros_like(params.std)
        else:
            # entropy term: loss has -ce * mean(entropy); entropy is
            # row-constant = sum_a(0.5 + 0.5 log 2pi + log std_a)
            g_std = g_std_kernel - self.entropy_coef / params.std
        entropy = (
            self._entropy(None)
            if self.fixed_std
            else jnp.sum(0.5 + 0.5 * _LOG_2PI + jnp.log(params.std))
        )
        loss = (
            surr_mean
            + self.value_loss_coef * vl_mean
            - self.entropy_coef * entropy
        )
        grads = type(params)(actor=g_actor, critic=g_critic, std=g_std)
        aux = {
            "value_loss": vl_mean,
            "surrogate_loss": surr_mean,
            "kl": kl_mean,
        }
        return loss, grads, aux

    # ------------------------------------------------------------------
    # kernel 2: the whole update (epochs x minibatches + clip/Adam/LR)
    # ------------------------------------------------------------------

    def _update_kernel(self, *refs):
        nA = len(self.actor_dims) - 1
        nC = len(self.critic_dims) - 1
        nP = 2 * (nA + nC) + 1          # param tensor count (incl std)
        MB = self.num_mini_batches
        steps = self.num_epochs * MB

        it = iter(refs)
        data_refs = [next(it) for _ in range(3)]
        p_in = [next(it) for _ in range(nP)]    # ANY (HBM)
        m_in = [next(it) for _ in range(nP)]
        v_in = [next(it) for _ in range(nP)]
        cnt_r = next(it)                        # (1, 1) int32 SMEM
        lr_in = next(it)                        # (1, 1) f32 SMEM
        p_out = [next(it) for _ in range(nP)]   # ANY, aliased with p_in
        m_out = [next(it) for _ in range(nP)]
        v_out = [next(it) for _ in range(nP)]
        aux_r = next(it)                        # (1, 8) f32 VMEM
        ps = [next(it) for _ in range(nP)]      # VMEM scratch: params
        ms = [next(it) for _ in range(nP)]
        vs = [next(it) for _ in range(nP)]
        gs = [next(it) for _ in range(nP)]
        sem = next(it)
        scal = next(it)                         # (1, 8) f32 SMEM scratch

        s = pl.program_id(0)
        t = pl.program_id(1)
        last_t = self.n_tiles - 1

        def dma_all(srcs, dsts):
            for a, b in zip(srcs, dsts):
                cp = pltpu.make_async_copy(a, b, sem)
                cp.start()
                cp.wait()

        @pl.when((s == 0) & (t == 0))
        def _init():
            dma_all(p_in, ps)
            dma_all(m_in, ms)
            dma_all(v_in, vs)
            scal[0, 0] = lr_in[0, 0]            # live learning rate
            scal[0, 1] = 0.0                    # vl sum over steps
            scal[0, 2] = 0.0                    # surr sum
            scal[0, 3] = 0.0                    # kl sum

        @pl.when(t == 0)
        def _zero_grads():
            for g in gs:
                g[...] = jnp.zeros_like(g)
            scal[0, 4] = 0.0                    # per-step surr sum
            scal[0, 5] = 0.0                    # per-step vl sum
            scal[0, 6] = 0.0                    # per-step kl sum

        # scratch views in the (aW, cW, std) structure _tile_body expects
        aW = [(ps[2 * i], ps[2 * i + 1]) for i in range(nA)]
        cW = [(ps[2 * nA + 2 * i], ps[2 * nA + 2 * i + 1]) for i in range(nC)]
        std_r = ps[-1]
        d_aW = [(gs[2 * i], gs[2 * i + 1]) for i in range(nA)]
        d_cW = [(gs[2 * nA + 2 * i], gs[2 * nA + 2 * i + 1]) for i in range(nC)]
        d_std = gs[-1]

        data = [r[0] for r in data_refs]
        ss, sv, sk = self._tile_body(t, data, aW, cW, std_r, d_aW, d_cW, d_std)
        scal[0, 4] += ss
        scal[0, 5] += sv
        scal[0, 6] += sk

        @pl.when(t == last_t)
        def _finalize_step():
            B = float(self.rows)
            surr_mean = scal[0, 4] / B
            vl_mean = scal[0, 5] / B
            kl_mean = scal[0, 6] / B

            # entropy + std grad finalization (grads() docstring)
            ent = self._entropy(std_r)
            if not self.fixed_std:
                d_std[...] += -self.entropy_coef / std_r[...]
            loss = (
                surr_mean + self.value_loss_coef * vl_mean
                - self.entropy_coef * ent
            )

            # adaptive-KL LR (rsl_rl ppo.py:207-213), applied to THIS step
            lr = scal[0, 0]
            if self.adaptive_lr:
                lr_dn = jnp.maximum(self.lr_min, lr / 1.5)
                lr_up = jnp.minimum(self.lr_max, lr * 1.5)
                lr = jnp.where(
                    kl_mean > self.desired_kl * 2.0,
                    lr_dn,
                    jnp.where(
                        (kl_mean < self.desired_kl / 2.0) & (kl_mean > 0.0),
                        lr_up,
                        lr,
                    ),
                )
                scal[0, 0] = lr

            ok = jnp.isfinite(loss)             # NaN-loss skip (ppo.py:297-299)
            okf = jnp.where(ok, 1.0, 0.0)

            # clip by global norm (optax.clip_by_global_norm semantics)
            gsq = 0.0
            for g in gs:
                gsq += jnp.sum(jnp.square(g[...] * okf))
            gnorm = jnp.sqrt(gsq)
            trigger = gnorm < self.max_grad_norm
            gscale = okf * jnp.where(trigger, 1.0, self.max_grad_norm / gnorm)

            # Adam (optax.scale_by_adam, eps_root=0) + scale(-lr)
            c = (cnt_r[0, 0] + s + 1).astype(jnp.float32)
            b1, b2 = self.adam_b1, self.adam_b2
            bc1 = 1.0 - jnp.exp(c * float(np.log(b1)))
            bc2 = 1.0 - jnp.exp(c * float(np.log(b2)))
            for p_ref, m_ref, v_ref, g_ref in zip(ps, ms, vs, gs):
                g = g_ref[...] * gscale
                m = b1 * m_ref[...] + (1.0 - b1) * g
                v = b2 * v_ref[...] + (1.0 - b2) * (g * g)
                m_ref[...] = m
                v_ref[...] = v
                p_ref[...] -= lr * (m / bc1) / (jnp.sqrt(v / bc2) + self.adam_eps)

            if self.std_floor > 0.0:
                # projected std floor, matching PPO._project_std
                ps[-1][...] = jnp.maximum(ps[-1][...], self.std_floor)

            scal[0, 1] += vl_mean
            scal[0, 2] += surr_mean
            scal[0, 3] += kl_mean

            @pl.when(s == steps - 1)
            def _writeback():
                dma_all(ps, p_out)
                dma_all(ms, m_out)
                dma_all(vs, v_out)
                n = float(steps)
                aux_r[...] = jnp.concatenate(
                    [
                        scal[0, 0].reshape(1, 1),       # final lr
                        (scal[0, 1] / n).reshape(1, 1),  # value_loss mean
                        (scal[0, 2] / n).reshape(1, 1),  # surrogate mean
                        (scal[0, 3] / n).reshape(1, 1),  # kl mean
                        jnp.zeros((1, 4), jnp.float32),
                    ],
                    axis=1,
                )

    @functools.partial(jax.jit, static_argnums=0)
    def update_scan(self, p_tree, m_tree, v_tree, count, lr, bufs):
        """The entire PPO update as ONE kernel. ``m_tree``/``v_tree`` are the
        Adam moments unravelled to param shapes; ``count`` the Adam step
        count; ``lr`` the live learning rate. Returns
        (p', m', v', lr_final, metric_means)."""
        nA = len(self.actor_dims) - 1
        nC = len(self.critic_dims) - 1
        nP = 2 * (nA + nC) + 1
        MB = self.num_mini_batches
        steps = self.num_epochs * MB
        T = self.tile

        def data_spec(feat):
            return pl.BlockSpec(
                (1, T, feat), lambda s, t: (s % MB, t, 0), memory_space=pltpu.VMEM
            )

        def flat_ops(tree):
            ops = []
            for w, b in tree.actor:
                ops += [w, b.reshape(1, -1)]
            for w, b in tree.critic:
                ops += [w, b.reshape(1, -1)]
            ops.append(tree.std.reshape(1, -1))
            return ops

        data = self._data_arrays(bufs)
        p_ops = flat_ops(p_tree)
        m_ops = flat_ops(m_tree)
        v_ops = flat_ops(v_tree)

        any_spec = pl.BlockSpec(memory_space=pl.ANY)
        smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
        in_specs = (
            [data_spec(x.shape[-1]) for x in data]
            + [any_spec] * (3 * nP)
            + [smem_spec, smem_spec]
        )
        pshapes = [jax.ShapeDtypeStruct(p.shape, jnp.float32) for p in p_ops]
        out_shapes = pshapes * 3 + [jax.ShapeDtypeStruct((1, 8), jnp.float32)]
        out_specs = [any_spec] * (3 * nP) + [
            pl.BlockSpec((1, 8), lambda s, t: (0, 0), memory_space=pltpu.VMEM)
        ]
        scratch = (
            [pltpu.VMEM(p.shape, jnp.float32) for p in p_ops] * 4
            + [pltpu.SemaphoreType.DMA(())]
            + [pltpu.SMEM((1, 8), jnp.float32)]
        )
        outs = pl.pallas_call(
            self._update_kernel,
            grid=(steps, self.n_tiles),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shapes,
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
                # the default 16 MB scoped-vmem cap is conservative; the
                # persistent p/m/v/grad scratches + pipeline windows need
                # slightly more at tile 512 (measured 16.05 MB)
                vmem_limit_bytes=self.vmem_limit_mb << 20,
            ),
            interpret=self.interpret,
        )(
            *data, *p_ops, *m_ops, *v_ops,
            jnp.asarray(count, jnp.int32).reshape(1, 1),
            jnp.asarray(lr, jnp.float32).reshape(1, 1),
        )

        def untree(ops_iter, like):
            actor = []
            for w, b in like.actor:
                actor.append((next(ops_iter), next(ops_iter)[0]))
            critic = []
            for w, b in like.critic:
                critic.append((next(ops_iter), next(ops_iter)[0]))
            std = next(ops_iter)[0]
            return type(like)(actor=actor, critic=critic, std=std)

        it = iter(outs)
        p2 = untree(it, p_tree)
        m2 = untree(it, p_tree)
        v2 = untree(it, p_tree)
        aux = next(it)
        lr_final = aux[0, 0]
        metrics = {
            "value_loss": aux[0, 1],
            "surrogate_loss": aux[0, 2],
            "kl": aux[0, 3],
            "lr": lr_final,
        }
        return p2, m2, v2, lr_final, metrics
