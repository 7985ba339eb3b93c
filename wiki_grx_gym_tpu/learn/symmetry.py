"""Mirror-symmetry loss: the end-to-end wiring of the reference's dormant
symmetry scaffolding.

The reference parses ``symmetry_coef`` (`rsl_rl/algorithms/ppo.py:96`), keeps
runner hooks (`runners/on_policy_runner.py:161-167`) and ships
:func:`swap_lr` (`rsl_rl/utils/utils.py:207-228`), but the env-side
reflection methods it calls never exist — the feature is dead code there.
Here it is completed the TPU way: the left/right reflection is a static
(permutation, sign) pair derived from the robot model once at build time,
and the loss is a pure function added to the PPO objective through
``extra_loss_fn`` (the `calculate_other_loss` hook, ppo.py:323).

Reflection math. Mirroring about the robot's sagittal (x-z) plane with
``M = diag(1, -1, 1)``: a rotation by angle theta about world axis ``a``
maps to a rotation by ``-theta`` about ``M a`` (mirroring flips
handedness). For a joint ``i`` whose left/right counterpart is ``j`` (same
name with left<->right swapped; self for unpaired joints), the mirrored
angle is

    q'_j = -q_i   if  axis_j ==  M axis_i
    q'_j = +q_i   if  axis_j == -M axis_i

with axes taken in world frame at the URDF zero pose. This derives the
usual humanoid convention automatically (pitch joints keep sign, roll/yaw
joints flip) instead of hand-maintaining sign tables per robot.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

_MIRROR = np.diag([1.0, -1.0, 1.0]).astype(np.float32)

# left/right name patterns, most specific first
_LR_PATTERNS = (("left", "right"), ("l_", "r_"), ("_l", "_r"))


def _counterpart_name(name: str) -> str:
    for a, b in _LR_PATTERNS:
        if a in name:
            return name.replace(a, b)
        if b in name:
            return name.replace(b, a)
    return name


class MirrorSpec(NamedTuple):
    """Static reflection operators (host numpy; baked into the jit)."""

    dof_perm: np.ndarray   # (D,) int — mirrored dof index
    dof_sign: np.ndarray   # (D,) float — sign applied after permuting
    obs_perm: np.ndarray   # (O,) int
    obs_sign: np.ndarray   # (O,) float


def mirror_dof_map(model) -> tuple[np.ndarray, np.ndarray]:
    """(perm, sign) such that ``q_mirrored = sign * q[perm]``."""
    names = list(model.dof_names)
    perm = np.zeros(len(names), np.int64)
    for i, nm in enumerate(names):
        cp = _counterpart_name(nm)
        if cp not in names:
            raise ValueError(f"no mirror counterpart for dof {nm!r}")
        perm[i] = names.index(cp)

    # world joint axes at the URDF zero pose
    from wiki_grx_gym_tpu.sim.kinematics import forward_kinematics

    d = model.num_dof
    kin = forward_kinematics(
        model,
        jnp.asarray([0.0, 0.0, 0.0, 1.0]),
        jnp.zeros(3), jnp.zeros(3), jnp.zeros(d), jnp.zeros(d),
    )
    axes = np.asarray(kin.subspace)[1:, :3]  # (D, 3) world axis per joint

    sign = np.zeros(d, np.float32)
    for i in range(d):
        j = perm[i]
        dot = float(np.dot(_MIRROR @ axes[i], axes[j]))
        if abs(dot) < 0.9:
            raise ValueError(
                f"dofs {names[i]!r}/{names[j]!r} axes are not mirror images "
                f"(|cos|={abs(dot):.3f}); cannot derive a symmetry map"
            )
        # axis_j == +M axis_i -> angle negates; == -M axis_i -> preserved
        sign[j] = -1.0 if dot > 0 else 1.0
    return perm, sign


def build_mirror_spec(env) -> MirrorSpec:
    """Reflection operators for the actor obs layout
    ``[cmd(3), ang_vel(3), gravity(3), dof_pos(D), dof_vel(D), actions(D)]``
    (gr1t1.py:281-313 / `LeggedEnv._observations`)."""
    dof_perm, dof_sign = mirror_dof_map(env.model)
    d = env.num_dof

    blocks = []   # (offset, perm, sign) per block
    # commands [vx, vy, wyaw]
    blocks.append((np.arange(3), np.array([1.0, -1.0, -1.0], np.float32)))
    # base angular velocity [wx, wy, wz] -> pseudo-vector: M a flips handedness
    blocks.append((np.arange(3), np.array([-1.0, 1.0, -1.0], np.float32)))
    # projected gravity (true vector)
    blocks.append((np.arange(3), np.array([1.0, -1.0, 1.0], np.float32)))
    for _ in range(3):  # dof_pos, dof_vel, actions
        blocks.append((dof_perm, dof_sign))

    obs_perm = []
    obs_sign = []
    off = 0
    for perm, sign in blocks:
        obs_perm.append(np.asarray(perm) + off)
        obs_sign.append(sign)
        off += len(perm)
    obs_perm = np.concatenate(obs_perm)
    obs_sign = np.concatenate(obs_sign)
    if off != env.obs_dim:
        raise ValueError(
            f"obs layout mismatch: mirror covers {off} dims, obs_dim={env.obs_dim}"
        )
    return MirrorSpec(
        dof_perm=dof_perm, dof_sign=dof_sign.astype(np.float32),
        obs_perm=obs_perm, obs_sign=obs_sign.astype(np.float32),
    )


def mirror_obs(spec: MirrorSpec, obs: jax.Array) -> jax.Array:
    return obs[..., spec.obs_perm] * spec.obs_sign


def mirror_actions(spec: MirrorSpec, actions: jax.Array) -> jax.Array:
    return actions[..., spec.dof_perm] * spec.dof_sign


def make_mirror_loss(env, net, coef: float):
    """``extra_loss_fn(params, mb) -> scalar``: squared distance between the
    policy mean on mirrored observations and the mirrored policy mean —
    zero iff the policy is sagittal-plane equivariant on the batch."""
    spec = build_mirror_spec(env)
    coef = float(coef)

    def loss_fn(params, mb):
        obs = mb["obs"]
        mean = net.action_mean(params, obs)
        mean_of_mirror = net.action_mean(params, mirror_obs(spec, obs))
        mirror_of_mean = mirror_actions(spec, mean)
        return coef * jnp.mean(jnp.square(mean_of_mirror - mirror_of_mean))

    return loss_fn


def make_mirror_loss_recurrent(env, net, coef: float):
    """Recurrent-policy mirror loss over the trajectory minibatch.

    The LSTM memory after a mirrored input prefix is exactly the "mirrored
    hidden state" — there is no operator on the hidden vector itself, the
    state is *defined* by replaying mirrored inputs. So the loss compares
    the seq-to-seq policy from a ZERO initial state on (obs, mirrored obs):
    if the map is equivariant from the zero state, every reachable
    mirrored-prefix state preserves equivariance by induction. (Using the
    rollout's ``hidden0`` for the original branch would compare policies
    conditioned on *different* histories — not a symmetry residual.)"""
    spec = build_mirror_spec(env)
    coef = float(coef)

    def loss_fn(params, mb):
        obs, done_prev = mb["obs"], mb["done_prev"]
        zero = net.initial_hidden(obs.shape[1])
        mean = net.action_mean_seq(params, obs, done_prev, zero)
        mean_of_mirror = net.action_mean_seq(
            params, mirror_obs(spec, obs), done_prev, zero
        )
        return coef * jnp.mean(jnp.square(mean_of_mirror - mirror_actions(spec, mean)))

    return loss_fn
