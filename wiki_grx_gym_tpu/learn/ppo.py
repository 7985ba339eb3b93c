"""PPO: rollout storage, GAE, and the minibatch update — all functional.

Semantics mirror `rsl_rl/algorithms/ppo.py` + `storage/base_storage.py`:

- timeout bootstrapping: ``rew += gamma * V * time_outs`` (ppo.py:190-191);
- GAE reverse scan with advantage normalization (base_storage.py:120-141),
  implemented as `jax.lax.scan` over the T axis;
- clipped surrogate + clipped value loss + entropy bonus (ppo.py:270-295);
- adaptive learning rate from a per-minibatch KL estimate
  (ppo.py:207-213,254-268): /1.5 above 2x target, x1.5 below target/2,
  clamped to [lr_min, lr_max];
- NaN-loss skip (ppo.py:297-299) as a zero-masked update;
- grad-norm clip + Adam (ppo.py:304-305).

The whole update (epochs x minibatches) is one `lax.scan`, so the entire
learning phase is a single XLA program — no per-minibatch host round trips.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from wiki_grx_gym_tpu.learn.networks import ActorCritic, ActorCriticParams


class Transition(NamedTuple):
    """One rollout step across all envs (the (T, N, ...) storage layout of
    base_storage.py:56-73 arises from stacking these under lax.scan)."""

    obs: jax.Array
    critic_obs: jax.Array
    actions: jax.Array
    rewards: jax.Array
    dones: jax.Array
    values: jax.Array
    log_prob: jax.Array
    mu: jax.Array
    sigma: jax.Array


@struct.dataclass
class PPOState:
    params: ActorCriticParams
    opt_state: optax.OptState
    learning_rate: jax.Array   # () adapted by KL


class PPO:
    def __init__(self, net: ActorCritic, alg_cfg, extra_loss_fn=None, perm_groups: int = 1,
                 shuffle_block: int = 16, flat_optimizer: bool = True, mesh=None):
        """``extra_loss_fn(params, minibatch) -> scalar`` is the extension
        hook the reference exposes as ``calculate_other_loss``
        (ppo.py:289-295,323-324) for imitation/symmetry losses — e.g. a
        mirror-symmetry loss built from `learn/utils.swap_lr`.

        ``perm_groups``: number of env groups the minibatch shuffle is local
        to. With ``perm_groups`` a multiple of the dp mesh size, every
        minibatch gather stays on-device (operand sharded over the group
        axis, indices replicated) and each minibatch draws equally from
        every group — zero cross-dp traffic in the update besides the
        gradient all-reduce. 1 == the reference's global shuffle
        (base_storage.py:157-198).

        ``shuffle_block``: the shuffle's sample granularity. Permuting
        individual (t, env) samples makes XLA gather each scalar field 4
        bytes at a time — measured at ~107 ms of a 192 ms training
        iteration at 4096 envs. Permuting *blocks* of ``shuffle_block``
        consecutive envs at one timestep moves all fields as one packed
        contiguous row (block x features, ~15 KB) per gather — HBM-speed —
        and, because a block is a slice of the scan's natural (T, N, feat)
        storage, the pack is a pure reshape: no (N, T) transpose, and no
        transposed layout propagating back into the rollout scan's output
        buffers (an earlier time-window block scheme made XLA store every
        rollout step strided — the rollout while-loop cost 69 ms vs 26 ms
        with natural layouts). Same-timestep env blocks are also better
        decorrelated than consecutive-timestep windows of one trajectory.
        1 == the reference's exact per-sample shuffle semantics."""
        self.net = net
        self.cfg = alg_cfg
        # learnable-std exploration floor (base_config.policy.noise_std_floor):
        # projected after every optimizer step in all update paths so the
        # rollout's floored std (networks.ActorCritic.std) and the update's
        # raw params.std read never diverge
        self.std_floor = (
            0.0 if getattr(net, "fixed_std", False)
            else float(getattr(net, "noise_std_floor", 0.0))
        )
        self.extra_loss_fn = extra_loss_fn
        self.perm_groups = int(perm_groups)
        self.shuffle_block = int(shuffle_block)
        self.gamma = float(alg_cfg.gamma)
        self.lam = float(alg_cfg.lam)
        self.clip_param = float(alg_cfg.clip_param)
        self.value_loss_coef = float(alg_cfg.value_loss_coef)
        self.entropy_coef = float(alg_cfg.entropy_coef)
        self.num_learning_epochs = int(alg_cfg.num_learning_epochs)
        self.num_mini_batches = int(alg_cfg.num_mini_batches)
        self.desired_kl = float(alg_cfg.desired_kl)
        self.adaptive = alg_cfg.schedule == "adaptive"
        self.lr_init = float(alg_cfg.learning_rate)
        self.lr_min = float(alg_cfg.learning_rate_min)
        self.lr_max = float(alg_cfg.learning_rate_max)
        self.max_grad_norm = float(alg_cfg.max_grad_norm)
        self.use_clipped_value_loss = bool(alg_cfg.use_clipped_value_loss)
        # minibatch *storage* dtype for the wide matmul-input fields
        # (obs/critic_obs) inside the update's packed shuffle buffer. bf16
        # is numerically what the MXU consumes anyway (XLA's default f32
        # matmul precision on TPU runs bf16 passes and stores bf16
        # activations), so rounding at storage time changes nothing
        # material, while halving the pack+gather HBM traffic of the
        # update's dominant data-movement ops (v5e trace, job26).
        # Ratio/KL-critical fields (actions, log_prob, mu, sigma, values,
        # returns, advantages) always stay float32.
        sd = str(getattr(alg_cfg, "storage_dtype", "bfloat16") or "float32")
        self.storage_dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[sd]
        # rematerialize the minibatch forward in the backward pass instead of
        # storing activations: trades ~1/3 more MXU work for zero
        # activation HBM traffic in the update's grad steps
        self.remat_update = bool(getattr(alg_cfg, "remat_update", False))
        # update-phase MLP activation dtype. The grad steps are HBM-bound on
        # the (B, width) hidden activations (f32 at B=65536: ~2.8 GB/step,
        # v5e roofline r3 job05); bf16 activations halve that traffic while
        # params/optimizer/distribution math stay f32. Scoped to the update
        # only — the rollout's policy forward keeps the network's own
        # compute_dtype, so deployment-path numerics are untouched.
        # Training-quality validation tables live in docs/TRAINING.md.
        ud = str(getattr(alg_cfg, "update_dtype", "float32") or "float32")
        self.update_dtype = {"float32": None, "bfloat16": jnp.bfloat16}[ud]
        # actor+critic as one stacked batched-matmul trunk vs the
        # reference's two separate stacks; also consumed by the runner's
        # rollout. Default off — measured 16 ms/iter SLOWER at 4096 envs
        # (v5e, tools/jobs/r4_job01_ab.py; base_config.algorithm.fused_trunk)
        self.fused_trunk = bool(getattr(alg_cfg, "fused_trunk", False))
        # obs||critic_obs packed inside the rollout scan vs a separate
        # concat pass here (base_config.algorithm.pack_rollout)
        self.pack_rollout = bool(getattr(alg_cfg, "pack_rollout", True))
        # fused minibatch-gradient Pallas kernel (learn/fused_update.py):
        # the whole grad step — both MLP forwards, the clipped-PPO loss and
        # the hand-derived backward — as ONE kernel with VMEM-resident
        # weights/accumulators. "auto" = on for single-device TPU runs on
        # the supported path (MLP + elu + no extra loss); True forces it
        # (interpret mode off-TPU, for tests); False = XLA scan path.
        fu = getattr(alg_cfg, "fused_update", "auto")
        self.fused_update_tile = int(getattr(alg_cfg, "fused_update_tile", 512) or 512)
        # data-parallel fused path: per-shard grads kernel under shard_map
        # with a gradient pmean before clip/Adam (tensor parallelism keeps
        # the XLA path — the kernel assumes whole weight tensors)
        dp_ok = mesh is None or ("mp" not in mesh.axis_names or mesh.shape["mp"] == 1)
        self.fused_dp_mesh = (
            mesh if (mesh is not None and dp_ok and "dp" in mesh.axis_names
                     and mesh.shape["dp"] > 1 and self.perm_groups == mesh.shape["dp"])
            else None
        )
        if fu == "auto":
            fu = jax.default_backend() == "tpu" and dp_ok
        if fu:
            from wiki_grx_gym_tpu.learn.fused_update import FusedPPOGrad

            fu = FusedPPOGrad.supported(net, extra_loss_fn)
        self.fused_update = (
            bool(fu) and flat_optimizer
            and (self.perm_groups == 1 or self.fused_dp_mesh is not None)
        )
        # whole-update mega-kernel vs per-step kernel scan (both Pallas);
        # on a dp mesh the per-step form is required (the gradient pmean
        # sits between the kernel and Adam)
        self.fused_mega = (
            bool(getattr(alg_cfg, "fused_mega", True)) and self.fused_dp_mesh is None
        )
        self._mega_ok = True
        self._fused_cache = {}
        # run clip+Adam over ONE raveled parameter vector instead of the
        # 10+-leaf pytree: optax maps ~8 elementwise ops per leaf, and those
        # ~100 launch-bound kernels measured ~60% of each grad step (v5e,
        # r3 job02: 0.267 ms/step in-scan vs 0.110 ms for the grad math).
        # The runner disables this on an mp (tensor-parallel) mesh, where
        # raveling would force XLA to all-gather the TP-sharded params.
        self.flat_optimizer = bool(flat_optimizer)

        self.tx = optax.inject_hyperparams(
            lambda learning_rate: optax.chain(
                optax.clip_by_global_norm(self.max_grad_norm),
                optax.adam(learning_rate, b1=0.9, b2=0.999, eps=1e-8),
            )
        )(learning_rate=self.lr_init)

    def init(self, params: ActorCriticParams) -> PPOState:
        if self.flat_optimizer:
            from jax.flatten_util import ravel_pytree

            opt_target = ravel_pytree(params)[0]
        else:
            opt_target = params
        return PPOState(
            params=params,
            opt_state=self.tx.init(opt_target),
            learning_rate=jnp.asarray(self.lr_init, jnp.float32),
        )

    # ------------------------------------------------------------------

    def compute_returns(self, batch: Transition, last_values: jax.Array):
        """GAE (base_storage.py:120-141). ``batch`` leaves are (T, N, ...).

        The backward recurrence ``adv_t = delta_t + (gamma*lam*notdone_t) *
        adv_{t+1}`` is a first-order linear recurrence, evaluated as a
        parallel prefix (`lax.associative_scan`, log2(T) passes over the
        whole (T, N) batch) instead of T sequential launch-latency-bound
        steps.

        Returns (returns, normalized advantages), each (T, N)."""
        not_terminal = 1.0 - batch.dones.astype(jnp.float32)
        next_values = jnp.concatenate([batch.values[1:], last_values[None]], axis=0)
        delta = batch.rewards + not_terminal * self.gamma * next_values - batch.values
        coeff = not_terminal * (self.gamma * self.lam)

        def combine(a, b):
            # a = accumulated earlier prefix, b = next element of
            # y_k = d_k + c_k * y_{k-1}  (applied to the time-reversed arrays)
            return a[0] * b[0], b[1] + b[0] * a[1]

        _, adv_rev = jax.lax.associative_scan(
            combine, (jnp.flip(coeff, 0), jnp.flip(delta, 0))
        )
        adv_raw = jnp.flip(adv_rev, 0)
        returns = adv_raw + batch.values
        adv = (adv_raw - adv_raw.mean()) / (adv_raw.std() + 1e-8)
        return returns, adv

    # ------------------------------------------------------------------

    def _minibatch_loss(self, params, mb, lr_unused):
        net = self.net
        if self.fused_trunk:
            # one batched-matmul trunk for actor mean + critic value (halves
            # the grad step's matmul dispatch count; networks.joint_mean_value)
            mean, value = net.joint_mean_value(
                params, mb["obs"], mb["critic_obs"], dtype=self.update_dtype
            )
        else:
            mean = net.action_mean(params, mb["obs"], dtype=self.update_dtype)
            value = net.evaluate(params, mb["critic_obs"], dtype=self.update_dtype)
        std = jnp.broadcast_to(net.std(params), mean.shape)
        logp = net.log_prob(mean, std, mb["actions"])
        entropy = net.entropy(std)

        # KL of the new dist from the rollout dist (ppo.py:257-262)
        old_mu, old_sigma = mb["mu"], mb["sigma"]
        kl = jnp.sum(
            jnp.log(std / old_sigma + 1e-5)
            + (jnp.square(old_sigma) + jnp.square(old_mu - mean)) / (2.0 * jnp.square(std))
            - 0.5,
            axis=-1,
        )
        kl_mean = jax.lax.stop_gradient(jnp.mean(kl))

        ratio = jnp.exp(logp - mb["log_prob"])
        adv = mb["advantages"]
        surrogate = -adv * ratio
        surrogate_clipped = -adv * jnp.clip(ratio, 1.0 - self.clip_param, 1.0 + self.clip_param)
        surrogate_loss = jnp.mean(jnp.maximum(surrogate, surrogate_clipped))

        if self.use_clipped_value_loss:
            value_clipped = mb["values"] + jnp.clip(
                value - mb["values"], -self.clip_param, self.clip_param
            )
            value_loss = jnp.mean(
                jnp.maximum(
                    jnp.square(value - mb["returns"]),
                    jnp.square(value_clipped - mb["returns"]),
                )
            )
        else:
            value_loss = jnp.mean(jnp.square(mb["returns"] - value))

        loss = (
            surrogate_loss
            + self.value_loss_coef * value_loss
            - self.entropy_coef * jnp.mean(entropy)
        )
        if self.extra_loss_fn is not None:
            loss = loss + self.extra_loss_fn(params, mb)
        aux = {"value_loss": value_loss, "surrogate_loss": surrogate_loss, "kl": kl_mean}
        return loss, aux

    def _adapt_lr(self, lr, kl_mean):
        """ppo.py:207-213."""
        if not self.adaptive:
            return lr
        lr_down = jnp.maximum(self.lr_min, lr / 1.5)
        lr_up = jnp.minimum(self.lr_max, lr * 1.5)
        return jnp.where(
            kl_mean > self.desired_kl * 2.0,
            lr_down,
            jnp.where((kl_mean < self.desired_kl / 2.0) & (kl_mean > 0.0), lr_up, lr),
        )

    def _pack_shuffle(self, batch: Transition, returns, advantages, key,
                      packed_wide=None, wide_sizes=None):
        """Pack the nine rollout fields into two (G, MB, rows, F) buffers
        (wide matmul inputs in ``storage_dtype``, ratio/KL-critical scalars
        in f32), shuffled ONCE by the update's single block permutation so
        every minibatch of every epoch is a contiguous slice.

        ``packed_wide``: optional (T, N, O+P) buffer of obs||critic_obs
        already concatenated in ``storage_dtype`` — produced *inside* the
        rollout scan (runner._rollout), where the concat+downcast fuses into
        the scan step for free. Passing it skips the wide buffer's separate
        concat/astype pass here (a full read+write of the rollout's largest
        field), and lets XLA dead-code-eliminate the f32 obs/critic_obs
        stores from the rollout scan entirely. ``wide_sizes`` = (O, P)."""
        t, n = batch.rewards.shape
        g = self.perm_groups
        assert n % g == 0, f"num_envs {n} not divisible by perm_groups {g}"
        npg = n // g

        # block size: as configured, but (a) a divisor of the group's env
        # count so blocks never straddle groups, (b) small enough that every
        # minibatch gets >= 1 block
        b = max(1, min(self.shuffle_block, npg))
        while b > 1 and ((npg % b) or (t * (npg // b)) < self.num_mini_batches):
            b -= 1
        nb_t = npg // b                  # blocks per group per timestep
        n_blocks = t * nb_t              # block rows per group
        mb_blocks = n_blocks // self.num_mini_batches
        used = mb_blocks * self.num_mini_batches
        rows_per_mb = mb_blocks * b      # sample rows per group per minibatch

        def feat(x):
            return x[..., None] if x.ndim == 2 else x

        wide_fields = [
            ("obs", feat(batch.obs)),
            ("critic_obs", feat(batch.critic_obs)),
        ]
        f32_fields = [
            ("actions", feat(batch.actions)),
            ("log_prob", feat(batch.log_prob)),
            ("mu", feat(batch.mu)),
            ("sigma", feat(batch.sigma)),
            ("values", feat(batch.values)),
            ("returns", feat(returns)),
            ("advantages", feat(advantages)),
        ]

        # one group-local permutation per update (base_storage.py:169)
        perm = jax.random.permutation(key, n_blocks)[:used]

        def concat(fields, dtype):
            sizes = [x.shape[-1] for _, x in fields]
            offs = [0]
            for sz in sizes:
                offs.append(offs[-1] + sz)
            return jnp.concatenate([x.astype(dtype) for _, x in fields], axis=-1), offs, sizes

        def pack_shuffle(p, f):
            # (T, N, F) -> (G, n_blocks, B*F); the g<->t transpose is local
            # on a dp mesh (g is the sharded axis)
            p = p.reshape(t, g, nb_t, b * f)
            # "wrap" lowers to GatherScatterMode.PROMISE_IN_BOUNDS (indices
            # are a permutation, always in bounds; the mod folds away)
            hints = dict(unique_indices=True, mode="wrap")
            if g == 1:
                # (n_blocks, b, F) axis-0 row gather: the fastest measured
                # form on v5e (3.43 vs 4.29 ms for the flat-2D take and
                # 4.47 for the axis=1 original, .tpujobs/j19; the pattern
                # is intrinsically ~40 GB/s — lane-alignment padding did
                # not help)
                p = p.reshape(n_blocks, b, f)
                p = jnp.take(p, perm, axis=0, **hints)
            else:
                # the one gather of the whole update, then minibatches are
                # slices; axis=1 keeps the sharded g axis leading so the
                # gather stays device-local (tests/test_parallel.py HLO
                # contract)
                p = jnp.swapaxes(p, 0, 1).reshape(g, n_blocks, b * f)
                p = jnp.take(p, perm, axis=1, **hints)
            return p.reshape(g, self.num_mini_batches, rows_per_mb, f)

        if packed_wide is not None:
            sizes_w = [int(s) for s in wide_sizes]
            offs_w = [0, sizes_w[0], sizes_w[0] + sizes_w[1]]
            pw = packed_wide.astype(self.storage_dtype)
        else:
            pw, offs_w, sizes_w = concat(wide_fields, self.storage_dtype)
        pf, offs_f, sizes_f = concat(f32_fields, jnp.float32)
        shuf_w = pack_shuffle(pw, offs_w[-1])
        shuf_f = pack_shuffle(pf, offs_f[-1])
        return (
            shuf_w, offs_w, sizes_w, shuf_f, offs_f, sizes_f,
            [nm for nm, _ in wide_fields], [nm for nm, _ in f32_fields],
            g, rows_per_mb,
        )

    def update(
        self, ppo_state: PPOState, batch: Transition, returns, advantages, key,
        packed_wide=None, wide_sizes=None,
    ) -> Tuple[PPOState, Dict[str, jax.Array]]:
        """Epochs x minibatches over the flattened (T*N) batch as one scan.

        Shuffle strategy (v5e trace-driven, see git history):

        - The shuffle unit is a *block* of ``shuffle_block`` consecutive
          envs at one timestep — contiguous in the scan-native (T, N, feat)
          rollout storage, so a block row moves as one ~15 KB DMA.
          Per-sample permutation made XLA gather scalar fields 4 bytes at a
          time (the single most expensive op of the iteration);
          ``shuffle_block=1`` recovers those exact reference semantics.
        - ONE permutation per update, reused by every epoch — exactly
          `base_storage.py:169` (the generator draws once; epochs iterate
          the same partition). This lets the whole batch be shuffled ONCE
          up front (a single big gather), after which every minibatch of
          every epoch is a contiguous slice: the per-minibatch
          gather/reshape/layout-copy chain (~12 ms/iteration at 4096 envs)
          disappears from the 200-step update scan.
        - The permutation is group-local (``perm_groups`` = dp mesh size):
          the gather indexes an unsharded axis, so on a dp mesh the update
          does zero cross-device traffic besides the gradient all-reduce.
        - Fields are packed into two buffers: the wide matmul inputs
          (obs/critic_obs) in ``storage_dtype`` (bf16 by default —
          bit-identical on TPU, where XLA's default f32 matmul truncates
          operands to bf16 anyway; measured param delta exactly 0.0), and
          the ratio/KL-critical scalars in f32."""
        shuf_w, offs_w, sizes_w, shuf_f, offs_f, sizes_f, names_w, names_f, g, rows_per_mb = (
            self._pack_shuffle(batch, returns, advantages, key,
                               packed_wide=packed_wide, wide_sizes=wide_sizes)
        )
        if self.fused_update:
            return self._update_fused(ppo_state, shuf_w, shuf_f, sizes_w[0], rows_per_mb)
        squeeze = {"log_prob", "values", "returns", "advantages"}  # (T, N) scalars

        def get_mb(i):
            # the wide (matmul-input) fields stay in storage_dtype — the MLPs
            # consume bf16 directly (update_dtype) or XLA upcasts per-layer;
            # an eager whole-buffer astype here cost a 54 MB f32 copy per
            # grad step. Ratio/KL scalars are f32 in their own buffer.
            mb = {}
            for shuf, names, offs, sizes in (
                (shuf_w, names_w, offs_w, sizes_w),
                (shuf_f, names_f, offs_f, sizes_f),
            ):
                x = jax.lax.dynamic_index_in_dim(shuf, i, axis=1, keepdims=False)
                flat = x.reshape(g * rows_per_mb, offs[-1])
                for name, o, s in zip(names, offs, sizes):
                    v = jax.lax.slice_in_dim(flat, o, o + s, axis=1)
                    mb[name] = v[:, 0] if name in squeeze else v
            return mb

        idx = jnp.tile(
            jnp.arange(self.num_mini_batches, dtype=jnp.int32),
            self.num_learning_epochs,
        )
        loss_fn = (
            jax.checkpoint(self._minibatch_loss) if self.remat_update
            else self._minibatch_loss
        )
        return self._run_epochs(ppo_state, idx, get_mb, loss_fn)

    def _get_fused(self, rows: int):
        if rows not in self._fused_cache:
            from wiki_grx_gym_tpu.learn.fused_update import FusedPPOGrad

            # bf16 matmul operands unless the whole update is pinned f32
            op = (
                jnp.float32
                if (self.storage_dtype == jnp.float32 and self.update_dtype is None
                    and jax.default_backend() != "tpu")
                else jnp.bfloat16
            )
            mk = lambda tile: FusedPPOGrad(
                self.net,
                clip_param=self.clip_param,
                value_loss_coef=self.value_loss_coef,
                entropy_coef=self.entropy_coef,
                use_clipped_value_loss=self.use_clipped_value_loss,
                rows=rows,
                num_mini_batches=self.num_mini_batches,
                num_epochs=self.num_learning_epochs,
                tile=tile,
                op_dtype=op,
                max_grad_norm=self.max_grad_norm,
                adaptive_lr=self.adaptive,
                desired_kl=self.desired_kl,
                lr_min=self.lr_min,
                lr_max=self.lr_max,
                interpret=jax.default_backend() != "tpu",
            )
            fused = mk(self.fused_update_tile)
            if self.fused_mega:
                # shrink the batch tile until the whole-update kernel's
                # persistent scratches fit scoped VMEM (the 32-DOF
                # full-body model overflows at 512); no tile fits -> the
                # per-step kernel scan for this geometry
                t = fused.pick_mega_tile()
                if t is None:
                    self._mega_ok = False
                elif t != fused.tile:
                    fused = mk(t)
            self._fused_cache[rows] = fused
        return self._fused_cache[rows]

    def _opt_state_pieces(self, opt_state, n_params: int):
        """Locate (count, mu, nu, lr) inside the optax state pytree by
        shape: the tx chain is inject_hyperparams(clip_by_global_norm +
        adam), whose only array leaves are the int32 step counts (all equal
        by construction), the learning-rate scalar, and the two (P,) Adam
        moments (mu before nu in ScaleByAdamState). Returns
        (leaves, rebuild(count', mu', nu', lr') -> opt_state')."""
        leaves, treedef = jax.tree_util.tree_flatten(opt_state)
        idx_count = [
            i for i, l in enumerate(leaves)
            if jnp.issubdtype(jnp.asarray(l).dtype, jnp.integer)
            and jnp.asarray(l).ndim == 0
        ]
        idx_big = [
            i for i, l in enumerate(leaves)
            if jnp.asarray(l).ndim == 1 and jnp.asarray(l).size == n_params
        ]
        idx_lr = [
            i for i, l in enumerate(leaves)
            if jnp.asarray(l).ndim == 0
            and jnp.issubdtype(jnp.asarray(l).dtype, jnp.floating)
        ]
        assert len(idx_big) == 2 and len(idx_lr) == 1 and idx_count, (
            f"unexpected optax state layout: counts={idx_count}, "
            f"big={idx_big}, lr={idx_lr}"
        )
        count = leaves[idx_count[0]]
        mu, nu = leaves[idx_big[0]], leaves[idx_big[1]]

        def rebuild(count2, mu2, nu2, lr2):
            out = list(leaves)
            for i in idx_count:
                out[i] = count2
            out[idx_big[0]], out[idx_big[1]] = mu2, nu2
            out[idx_lr[0]] = lr2
            return jax.tree_util.tree_unflatten(treedef, out)

        return count, mu, nu, rebuild

    def _update_fused(self, ppo_state: PPOState, shuf_w, shuf_f, obs_dim, rows):
        """The PPO update phase on the Pallas path (learn/fused_update.py).

        Single device (``fused_mega``): the ENTIRE update — all grad steps
        plus clip/Adam/adaptive-LR — is ONE kernel; parameters and Adam
        moments stay in VMEM across every step. dp mesh: the per-grad-step
        kernel runs per shard under shard_map on its group-local minibatch,
        with a gradient/metric pmean between the kernel and the flat
        clip/Adam — the same all-reduce-only collective contract as the
        XLA dp path (tests/test_parallel.py). Semantics are identical to
        the XLA path either way (tests/test_fused_update.py)."""
        if self.fused_dp_mesh is not None:
            try:
                from jax import shard_map
            except ImportError:  # older jax
                from jax.experimental.shard_map import shard_map
            from jax.sharding import PartitionSpec as P

            f = lambda st, w, fb: self._fused_step_scan(
                st, w, fb, obs_dim, rows, axis="dp"
            )
            return shard_map(
                f, mesh=self.fused_dp_mesh,
                in_specs=(P(), P("dp"), P("dp")),
                out_specs=(P(), P()),
                # the pallas_call inside predates the vma annotation API
                check_vma=False,
            )(ppo_state, shuf_w, shuf_f)

        from jax.flatten_util import ravel_pytree

        fused = self._get_fused(rows)
        bufs = fused.split_buffers(shuf_w, shuf_f, obs_dim)
        p0, unravel = ravel_pytree(ppo_state.params)

        if self.fused_mega and self._mega_ok:
            count, mu, nu, rebuild = self._opt_state_pieces(
                ppo_state.opt_state, p0.size
            )
            p2, m2, v2, lr_final, metrics = fused.update_scan(
                ppo_state.params, unravel(mu), unravel(nu), count,
                ppo_state.learning_rate, bufs,
            )
            steps = self.num_learning_epochs * self.num_mini_batches
            opt2 = rebuild(
                count + steps, ravel_pytree(m2)[0], ravel_pytree(v2)[0], lr_final
            )
            return (
                PPOState(params=p2, opt_state=opt2, learning_rate=lr_final),
                metrics,
            )

        return self._fused_step_scan(ppo_state, shuf_w, shuf_f, obs_dim, rows)

    def _fused_step_scan(self, ppo_state, shuf_w, shuf_f, obs_dim, rows, axis=None):
        """Per-grad-step kernel + flat optax clip/Adam as a lax.scan; with
        ``axis`` set (inside shard_map) the kernel's shard-local grads,
        loss and metrics are pmean'd over it before the optimizer — the
        global-minibatch mean, since every shard holds an equal row
        count."""
        from jax.flatten_util import ravel_pytree

        fused = self._get_fused(rows)
        bufs = fused.split_buffers(shuf_w, shuf_f, obs_dim)
        p0, unravel = ravel_pytree(ppo_state.params)

        def mb_step(carry, idx):
            params_flat, opt_state, lr = carry
            params = unravel(params_flat)
            loss, grads, aux = fused.grads(params, bufs, idx)
            if axis is not None:
                loss, grads, aux = jax.lax.pmean((loss, grads, aux), axis)

            lr = self._adapt_lr(lr, aux["kl"])
            opt_state.hyperparams["learning_rate"] = lr

            ok = jnp.isfinite(loss)  # NaN-loss skip (ppo.py:297-299)
            flat_grads = ravel_pytree(grads)[0]
            flat_grads = jnp.where(ok, flat_grads, jnp.zeros_like(flat_grads))
            updates, opt_state = self.tx.update(flat_grads, opt_state, params_flat)
            params_flat = optax.apply_updates(params_flat, updates)
            params_flat = self._project_std(params_flat, unravel)
            metrics = {
                "value_loss": aux["value_loss"],
                "surrogate_loss": aux["surrogate_loss"],
                "kl": aux["kl"],
                "lr": lr,
            }
            return (params_flat, opt_state, lr), metrics

        idx = jnp.tile(
            jnp.arange(self.num_mini_batches, dtype=jnp.int32),
            self.num_learning_epochs,
        )
        (p_final, opt_state, lr), metrics = jax.lax.scan(
            mb_step, (p0, ppo_state.opt_state, ppo_state.learning_rate), idx
        )
        mean_metrics = jax.tree.map(jnp.mean, metrics)
        mean_metrics["lr"] = lr
        return (
            PPOState(params=unravel(p_final), opt_state=opt_state, learning_rate=lr),
            mean_metrics,
        )

    def _project_std(self, params, unravel=None):
        """Project the learnable std to the exploration floor after an
        optimizer step (projected gradient; no-op when the floor is 0).
        ``unravel`` set means ``params`` is the raveled flat vector."""
        if self.std_floor <= 0.0:
            return params
        if unravel is None:
            return params.replace(std=jnp.maximum(params.std, self.std_floor))
        from jax.flatten_util import ravel_pytree

        p = unravel(params)
        p = p.replace(std=jnp.maximum(p.std, self.std_floor))
        return ravel_pytree(p)[0]

    def _run_epochs(self, ppo_state: PPOState, perms, get_mb, loss_fn):
        """Shared epochs-x-minibatches scan: grads, adaptive-KL LR, NaN skip,
        clip + Adam (ppo.py:215-309). ``get_mb(idx)`` materializes one
        minibatch from a permutation row.

        With ``flat_optimizer`` the scan carries ONE raveled parameter
        vector: the loss unravels it (free slices/reshapes under XLA) and
        clip+Adam run as a handful of whole-vector ops instead of ~8 ops per
        pytree leaf — the per-step launch overhead was ~60% of each grad
        step (r3 job02)."""
        if self.flat_optimizer:
            from jax.flatten_util import ravel_pytree

            p0, unravel = ravel_pytree(ppo_state.params)
            wrapped_loss = lambda fp, mb, lr: loss_fn(unravel(fp), mb, lr)
        else:
            p0, unravel = ppo_state.params, lambda p: p
            wrapped_loss = loss_fn
        grad_fn = jax.value_and_grad(wrapped_loss, has_aux=True)

        def mb_step(carry, idx):
            params, opt_state, lr = carry
            mb = get_mb(idx)
            (loss, aux), grads = grad_fn(params, mb, lr)

            # adaptive LR from this minibatch's KL, applied to this step
            lr = self._adapt_lr(lr, aux["kl"])
            opt_state.hyperparams["learning_rate"] = lr

            # NaN-loss skip (ppo.py:297-299)
            ok = jnp.isfinite(loss)
            grads = jax.tree.map(lambda g: jnp.where(ok, g, jnp.zeros_like(g)), grads)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            params = self._project_std(params, unravel if self.flat_optimizer else None)
            metrics = {
                "value_loss": aux["value_loss"],
                "surrogate_loss": aux["surrogate_loss"],
                "kl": aux["kl"],
                "lr": lr,
            }
            return (params, opt_state, lr), metrics

        (p_final, opt_state, lr), metrics = jax.lax.scan(
            mb_step, (p0, ppo_state.opt_state, ppo_state.learning_rate), perms
        )
        mean_metrics = jax.tree.map(jnp.mean, metrics)
        mean_metrics["lr"] = lr
        return (
            PPOState(params=unravel(p_final), opt_state=opt_state, learning_rate=lr),
            mean_metrics,
        )

    # ------------------------------------------------------------------
    # recurrent update (whole-trajectory minibatches, learn/recurrent.py)
    # ------------------------------------------------------------------

    def _minibatch_loss_recurrent(self, params, mb, lr_unused):
        """Same clipped PPO objective, but the policy/value forward is an
        LSTM replay over the (T, M) sequence with done-boundary resets —
        rsl_rl's recurrent generator semantics without padding/masks."""
        net = self.net
        # one fused T-scan for both memories (learn/recurrent.py)
        mean, value = net.joint_mean_value_seq(
            params, mb["obs"], mb["critic_obs"], mb["done_prev"], mb["hidden0"]
        )
        std = jnp.broadcast_to(net.std(params), mean.shape)
        logp = net.log_prob(mean, std, mb["actions"])
        entropy = net.entropy(std)

        old_mu, old_sigma = mb["mu"], mb["sigma"]
        kl = jnp.sum(
            jnp.log(std / old_sigma + 1e-5)
            + (jnp.square(old_sigma) + jnp.square(old_mu - mean)) / (2.0 * jnp.square(std))
            - 0.5,
            axis=-1,
        )
        kl_mean = jax.lax.stop_gradient(jnp.mean(kl))

        ratio = jnp.exp(logp - mb["log_prob"])
        adv = mb["advantages"]
        surrogate = -adv * ratio
        surrogate_clipped = -adv * jnp.clip(ratio, 1.0 - self.clip_param, 1.0 + self.clip_param)
        surrogate_loss = jnp.mean(jnp.maximum(surrogate, surrogate_clipped))

        if self.use_clipped_value_loss:
            value_clipped = mb["values"] + jnp.clip(
                value - mb["values"], -self.clip_param, self.clip_param
            )
            value_loss = jnp.mean(
                jnp.maximum(
                    jnp.square(value - mb["returns"]),
                    jnp.square(value_clipped - mb["returns"]),
                )
            )
        else:
            value_loss = jnp.mean(jnp.square(mb["returns"] - value))

        loss = (
            surrogate_loss
            + self.value_loss_coef * value_loss
            - self.entropy_coef * jnp.mean(entropy)
        )
        if self.extra_loss_fn is not None:
            loss = loss + self.extra_loss_fn(params, mb)
        aux = {"value_loss": value_loss, "surrogate_loss": surrogate_loss, "kl": kl_mean}
        return loss, aux

    def update_recurrent(
        self, ppo_state: PPOState, batch: Transition, returns, advantages, key, hidden0
    ) -> Tuple[PPOState, Dict[str, jax.Array]]:
        """Minibatches are whole env columns (= whole trajectories); the
        group-local env permutation keeps dp sharding gather-free exactly as
        in :meth:`update`."""
        t, n = batch.rewards.shape
        g = self.perm_groups
        assert n % g == 0, f"num_envs {n} not divisible by perm_groups {g}"
        per_group = n // g
        mb_envs = max(per_group // self.num_mini_batches, 1)
        used = mb_envs * self.num_mini_batches

        done_prev = jnp.concatenate(
            [jnp.zeros((1, n)), batch.dones[:-1].astype(jnp.float32)], axis=0
        )

        def to_groups(x):   # (T, N, ...) -> (T, g, n/g, ...)
            return x.reshape(t, g, per_group, *x.shape[2:])

        data = {
            "obs": to_groups(batch.obs),
            "critic_obs": to_groups(batch.critic_obs),
            "actions": to_groups(batch.actions),
            "log_prob": to_groups(batch.log_prob),
            "mu": to_groups(batch.mu),
            "sigma": to_groups(batch.sigma),
            "values": to_groups(batch.values),
            "returns": to_groups(returns),
            "advantages": to_groups(advantages),
            "done_prev": to_groups(done_prev),
        }
        hid = jax.tree.map(
            lambda x: x.reshape(x.shape[0], g, per_group, x.shape[-1]), hidden0
        )

        # one permutation per update, reused across epochs (base_storage.py:169)
        perm = jax.random.permutation(key, per_group)[:used]
        perms = jnp.tile(
            perm.reshape(self.num_mini_batches, mb_envs),
            (self.num_learning_epochs, 1),
        )

        def get_mb(idx):
            mb = {
                k: v[:, :, idx].reshape(t, g * mb_envs, *v.shape[3:])
                for k, v in data.items()
            }
            mb["hidden0"] = jax.tree.map(
                lambda x: x[:, :, idx].reshape(x.shape[0], g * mb_envs, x.shape[-1]),
                hid,
            )
            return mb

        return self._run_epochs(ppo_state, perms, get_mb, self._minibatch_loss_recurrent)
