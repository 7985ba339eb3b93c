"""Learner-side utilities — parity with `rsl_rl/utils/utils.py`:

- :class:`RunningMeanStd` / :class:`Normalizer` (utils.py:96-150): Welford
  running statistics as a functional jax pytree (observation normalization —
  unused by the GRx training path but part of the learner's API);
- :func:`split_and_pad_trajectories` / :func:`unpad_trajectories`
  (utils.py:10-57): trajectory padding for recurrent policies, with static
  shapes (padded length == T), jit-compatible;
- :func:`quaternion_slerp` (utils.py:171-205);
- :func:`swap_lr` (utils.py:207-228): left/right mirror for symmetry losses.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class RunningMeanStd:
    """Functional running mean/var (parallel-algorithm update)."""

    mean: jax.Array
    var: jax.Array
    count: jax.Array

    @staticmethod
    def create(shape: Tuple[int, ...] = (), epsilon: float = 1e-4) -> "RunningMeanStd":
        return RunningMeanStd(
            mean=jnp.zeros(shape, jnp.float32),
            var=jnp.ones(shape, jnp.float32),
            count=jnp.asarray(epsilon, jnp.float32),
        )

    def update(self, batch: jax.Array) -> "RunningMeanStd":
        batch_mean = jnp.mean(batch, axis=0)
        batch_var = jnp.var(batch, axis=0)
        batch_count = batch.shape[0]
        delta = batch_mean - self.mean
        tot = self.count + batch_count
        new_mean = self.mean + delta * batch_count / tot
        m2 = (
            self.var * self.count
            + batch_var * batch_count
            + jnp.square(delta) * self.count * batch_count / tot
        )
        return RunningMeanStd(mean=new_mean, var=m2 / tot, count=tot)

    def normalize(self, x: jax.Array, clip: float = 10.0, epsilon: float = 1e-4) -> jax.Array:
        return jnp.clip(
            (x - self.mean) / jnp.sqrt(self.var + epsilon), -clip, clip
        )


class Normalizer(RunningMeanStd):
    """Alias with the reference's clip-on-normalize defaults (utils.py:131-150)."""


def split_and_pad_trajectories(tensor: jax.Array, dones: jax.Array):
    """Static-shape variant of utils.py:10-57 for recurrent policies.

    Input (T, N, F) + dones (T, N); output (T, T_traj_max=N*T//?, ...) — here
    we keep the jit-friendly formulation: each env column is split at dones
    and re-based to t=0, producing (T, N, F) padded trajectories where every
    trajectory starts at row 0, plus (T, N) validity masks. Trajectories
    longer than one rollout stay contiguous (equivalent information content
    to the reference's ragged version, without dynamic shapes)."""
    t, n = dones.shape[0], dones.shape[1]
    dones = dones.at[-1].set(True)
    # index of the trajectory start for every (t, env)
    step_idx = jnp.arange(t)[:, None]
    # start[t, e] = 1 + last done strictly before t (or 0)
    done_before = jnp.cumsum(dones, axis=0) - dones.astype(jnp.int32)
    # position within current trajectory
    first_of_traj = jnp.concatenate(
        [jnp.ones((1, n), bool), dones[:-1]], axis=0
    )
    traj_start = jnp.where(first_of_traj, step_idx, 0)
    traj_start = jax.lax.associative_scan(jnp.maximum, traj_start, axis=0)
    pos = step_idx - traj_start
    # scatter rows into position-based layout per env
    out = jnp.zeros_like(tensor)
    mask = jnp.zeros((t, n), bool)
    env_idx = jnp.broadcast_to(jnp.arange(n)[None, :], (t, n))
    out = out.at[pos, env_idx].set(tensor)
    mask = mask.at[pos, env_idx].set(True)
    return out, mask


def unpad_trajectories(trajectories: jax.Array, masks: jax.Array) -> jax.Array:
    """Inverse of the padding for loss masking: simply multiplies by mask
    (static-shape equivalent of utils.py:54-57)."""
    return trajectories * masks[..., None]


def quaternion_slerp(q0: jax.Array, q1: jax.Array, fraction: jax.Array,
                     spin: int = 0, shortestpath: bool = True) -> jax.Array:
    """Batched slerp, branchless (utils.py:171-205)."""
    eps = 1e-7
    d = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    if shortestpath:
        q1 = jnp.where(d < 0, -q1, q1)
        d = jnp.abs(d)
    d = jnp.clip(d, -1.0, 1.0)
    angle = jnp.arccos(d) + spin * jnp.pi
    safe = jnp.abs(angle) > eps
    isin = 1.0 / jnp.where(safe, angle, 1.0)
    f = fraction[..., None] if fraction.ndim < q0.ndim else fraction
    s0 = jnp.sin((1.0 - f) * angle) * isin
    s1 = jnp.sin(f * angle) * isin
    blended = s0 * q0 + s1 * q1
    lerp = (1.0 - f) * q0 + f * q1  # fall back to lerp at tiny angles
    out = jnp.where(safe, blended, lerp)
    out = jnp.where(jnp.isclose(f, 0.0), q0, out)
    out = jnp.where(jnp.isclose(f, 1.0), q1, out)
    return out


def swap_lr(value: jax.Array, left_idx: Sequence[int], right_idx: Sequence[int]) -> jax.Array:
    """Swap left/right channels along the last axis (utils.py:207-228)."""
    assert len(left_idx) == len(right_idx)
    swapped = value
    for l, r in zip(left_idx, right_idx):
        swapped = swapped.at[..., l].set(value[..., r]).at[..., r].set(value[..., l])
    return swapped
