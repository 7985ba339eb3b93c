"""Fused PPO minibatch gradient as ONE Pallas kernel.

The PPO update is 200 sequential grad steps (8 epochs x 25 minibatches,
`gr1t1_config.py:273-274`, mirroring the reference
`rsl_rl/algorithms/ppo.py:215-309`) over a tiny [512, 256, 128] MLP pair.
As XLA ops each step is ~30 separate kernels (16 matmuls + the loss/Adam
elementwise chain), each a launch + HBM round trip over (B, width)
activations — measured 0.276 ms/step at B~=10480 on v5e against a ~0.18 ms
MXU-padded roofline (docs/STATUS.md j13), 54.6 ms of a 79.1 ms iteration.

This kernel computes the ENTIRE minibatch gradient — actor+critic forward,
the clipped-PPO loss math, and the hand-derived backward — in one
`pallas_call`:

- weights, biases and the grad accumulators live in VMEM for the whole
  kernel (constant `index_map`: Pallas skips the re-DMA between grid
  steps), so per-step HBM traffic is just the minibatch tiles + one
  read/write of the 437k-param gradient;
- the batch is streamed in (TILE, feat) blocks; hidden activations exist
  only as VMEM values between the fused matmuls — the (B, 512) HBM
  round trips of the XLA path disappear;
- the minibatch is selected by a scalar-prefetch index straight out of the
  update's big shuffled buffer (no per-step XLA slice copies);
- matmul operands are bf16 with f32 accumulation — numerically the same
  class as the XLA path, whose DEFAULT-precision f32 matmuls run bf16
  passes on the MXU anyway.

Backward math mirrors `jax.grad` of `PPO._minibatch_loss` exactly,
including JAX's subgradient conventions (`maximum` ties and `clip`
boundaries get 0.5); equivalence is enforced by tests/test_fused_update.py
against `jax.value_and_grad` at f32 (tight tolerance) and bf16 (loose).

Reference counterpart: `rsl_rl/rsl_rl/algorithms/ppo.py:215-309`
(compute losses + backprop + step); there it is torch autograd over cuBLAS
calls — here the whole step is one TPU kernel program.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

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
    """Builds and calls the fused minibatch-gradient kernel.

    Static spec captured at construction: layer dims, loss constants, batch
    geometry. ``__call__(params, buffers, mb_index)`` returns
    ``(grads: ActorCriticParams-pytree, aux: dict)``.
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
        tile: int = 512,
        op_dtype=jnp.bfloat16,  # matmul operand dtype (f32 for exact CPU tests)
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
        self.clip_param = float(clip_param)
        self.value_loss_coef = float(value_loss_coef)
        self.entropy_coef = float(entropy_coef)
        self.use_clipped_value_loss = bool(use_clipped_value_loss)
        self.rows = int(rows)
        self.num_mini_batches = int(num_mini_batches)
        self.tile = int(min(tile, max(8, rows)))
        self.n_tiles = pl.cdiv(self.rows, self.tile)
        self.op_dtype = op_dtype
        self.interpret = bool(interpret)

    @staticmethod
    def supported(net, extra_loss_fn) -> bool:
        """The kernel covers the reference MLP path: elu hidden activations,
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
    # kernel body
    # ------------------------------------------------------------------

    def _kernel(self, *refs):
        nA = len(self.actor_dims) - 1   # actor layer count
        nC = len(self.critic_dims) - 1
        # unpack refs: [idx(scalar-prefetch), data x6, actorW/b x nA*2,
        # criticW/b x nC*2, std] then outputs in the same param order + aux
        it = iter(refs)
        _idx = next(it)                 # consumed by index_map only
        obs_r, cobs_r, act_r, mu_r, sig_r, sc_r = (next(it) for _ in range(6))
        aW = [(next(it), next(it)) for _ in range(nA)]
        cW = [(next(it), next(it)) for _ in range(nC)]
        std_r = next(it)
        d_aW = [(next(it), next(it)) for _ in range(nA)]
        d_cW = [(next(it), next(it)) for _ in range(nC)]
        d_std = next(it)
        aux_r = next(it)

        i = pl.program_id(0)
        op = self.op_dtype
        T = self.tile
        B = float(self.rows * 1.0)

        @pl.when(i == 0)
        def _init():
            for dw, db in d_aW + d_cW:
                dw[...] = jnp.zeros_like(dw)
                db[...] = jnp.zeros_like(db)
            d_std[...] = jnp.zeros_like(d_std)
            aux_r[...] = jnp.zeros_like(aux_r)

        # ---- row mask for the (possibly partial) last tile ----
        row = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0) + i * T
        mask = row < self.rows          # (T, 1) bool

        def clean(x, fill=0.0):
            return jnp.where(mask, x, jnp.asarray(fill, x.dtype))

        obs_t = clean(obs_r[0]).astype(op)      # (T, O)
        cobs_t = clean(cobs_r[0]).astype(op)    # (T, P)
        actions = clean(act_r[0])               # (T, A) f32
        old_mu = clean(mu_r[0])
        old_sigma = clean(sig_r[0], 1.0)
        sc = sc_r[0]                            # (T, 4): logp, values, returns, adv
        old_logp = clean(sc[:, 0:1])
        old_values = clean(sc[:, 1:2])
        returns = clean(sc[:, 2:3])
        adv = clean(sc[:, 3:4])

        # ---- forward: both MLPs, activations held as VMEM values ----
        def fwd(x_bf, layers):
            hs = [x_bf]
            z = None
            for li, (w, b) in enumerate(layers):
                z = (
                    jnp.dot(hs[-1], w[...].astype(op), preferred_element_type=jnp.float32)
                    + b[...]
                )
                if li < len(layers) - 1:
                    hs.append(_elu(z).astype(op))
            return hs, z                        # hidden inputs per layer, final f32

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

        # ---- scalar accumulators (one (1, 8) row-vector add) ----
        def s(x):
            return jnp.sum(jnp.where(mask, x, zero)).reshape(1, 1)

        aux_r[...] += jnp.concatenate(
            [s(surr), s(vl), s(kl_row), jnp.zeros((1, 5), jnp.float32)], axis=1
        )

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
                db[...] += jnp.sum(g.astype(jnp.float32), axis=0, keepdims=True)
                if li > 0:
                    # dgrad: g @ W^T, then through elu
                    gx = jax.lax.dot_general(
                        g, w[...].astype(op),
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    h = hs[li].astype(jnp.float32)
                    g = (gx * _elu_grad_from_h(h)).astype(op)

        bwd(g_mean, h_a, aW, d_aW)
        bwd(g_val, h_c, cW, d_cW)

    # ------------------------------------------------------------------
    # call
    # ------------------------------------------------------------------

    def split_buffers(self, shuf_w, shuf_f, obs_dim: int):
        """Slice the update's two packed shuffle buffers (1, MB, rows, F)
        into the kernel's lane-offset-0 operands, ONCE per update (the
        in-kernel alternative — lane slices at offsets 23/39/47 — costs a
        Mosaic relayout per tile)."""
        mb = self.num_mini_batches
        w = shuf_w.reshape(mb, self.rows, -1)
        f = shuf_f.reshape(mb, self.rows, -1)
        a = self.act_dim
        return dict(
            obs=w[..., :obs_dim],
            cobs=w[..., obs_dim:],
            actions=f[..., 0:a],
            mu=f[..., a + 1 : 2 * a + 1],
            sigma=f[..., 2 * a + 1 : 3 * a + 1],
            scalars=jnp.concatenate(
                [f[..., a : a + 1], f[..., 3 * a + 1 :]], axis=-1
            ),  # logp, values, returns, advantages
        )

    @functools.partial(jax.jit, static_argnums=0)
    def grads(self, params, bufs, mb_index):
        """Gradient of PPO._minibatch_loss for minibatch ``mb_index``.

        ``bufs``: dict from :meth:`split_buffers` (leaves (MB, rows, F)).
        Returns (grads pytree shaped like params, aux dict)."""
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

        data = [
            bufs["obs"], bufs["cobs"], bufs["actions"], bufs["mu"],
            bufs["sigma"], bufs["scalars"],
        ]
        in_specs = [data_spec(x.shape[-1]) for x in data]

        def as2d(b):
            return b.reshape(1, -1)

        param_ops: List[jax.Array] = []
        for w, b in params.actor:
            param_ops += [w, as2d(b)]
        for w, b in params.critic:
            param_ops += [w, as2d(b)]
        param_ops.append(as2d(params.std))
        in_specs += [const_spec(p.shape) for p in param_ops]

        out_shapes = [
            jax.ShapeDtypeStruct(p.shape, jnp.float32) for p in param_ops
        ] + [jax.ShapeDtypeStruct((1, 8), jnp.float32)]
        out_specs = [const_spec(o.shape) for o in out_shapes]

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(self.n_tiles,),
            in_specs=in_specs,
            out_specs=out_specs,
        )
        outs = pl.pallas_call(
            self._kernel,
            grid_spec=grid_spec,
            out_shape=out_shapes,
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
            std = jnp.full((self.act_dim,), self.init_noise_std)
            g_std = jnp.zeros_like(params.std)
        else:
            std = params.std
            # entropy term: loss has -ce * mean(entropy); entropy is
            # row-constant = sum_a(0.5 + 0.5 log 2pi + log std_a)
            g_std = g_std_kernel - self.entropy_coef / std
        entropy = jnp.sum(0.5 + 0.5 * _LOG_2PI + jnp.log(std))
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
