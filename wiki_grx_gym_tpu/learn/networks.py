"""Actor-critic MLP in pure JAX pytrees.

Mirrors `rsl_rl/modules/actor_critic_mlp.py` + `modules/mlp.py:7-42`:
separate actor/critic MLP stacks, ELU activations, and a **learnable per-dim
std parameter** (raw std, not log-std — `actor_critic_mlp.py:82-83`), with
torch-default Linear initialization so learning dynamics are comparable.

The policy is a 3-layer MLP ([512, 256, 128], `gr1t1_config.py:338-339`);
matmuls are batched (num_envs x width) — MXU work under jit.
"""

from __future__ import annotations

from typing import Callable, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

_LOG_2PI = float(np.log(2.0 * np.pi))


def get_activation(name: str) -> Callable:
    """Mirror of rsl_rl utils get_activation (`rsl_rl/utils/utils.py:231-256`)."""
    table = {
        "elu": jax.nn.elu,
        "relu": jax.nn.relu,
        "selu": jax.nn.selu,
        "crelu": lambda x: jnp.concatenate([jax.nn.relu(x), jax.nn.relu(-x)], axis=-1),
        "lrelu": jax.nn.leaky_relu,
        "tanh": jnp.tanh,
        "sigmoid": jax.nn.sigmoid,
        None: lambda x: x,
        "none": lambda x: x,
    }
    return table[name]


def _torch_linear_init(key, fan_in: int, fan_out: int):
    """torch.nn.Linear default init: kaiming-uniform(a=sqrt(5)) for W,
    U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for b."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / np.sqrt(fan_in)
    w = jax.random.uniform(kw, (fan_in, fan_out), minval=-bound, maxval=bound)
    b = jax.random.uniform(kb, (fan_out,), minval=-bound, maxval=bound)
    return w, b


def init_mlp(key, in_dim: int, hidden: Sequence[int], out_dim: int) -> List[Tuple[jax.Array, jax.Array]]:
    dims = [in_dim] + list(hidden) + [out_dim]
    keys = jax.random.split(key, len(dims) - 1)
    return [
        _torch_linear_init(k, dims[i], dims[i + 1]) for i, k in enumerate(keys)
    ]


def apply_mlp(params, x, activation: Callable, out_activation: Callable = None, dtype=None):
    """MLP forward. With ``dtype=jnp.bfloat16`` the matmuls run on the MXU in
    bf16 AND the hidden activations stay bf16 end-to-end (params remain f32
    master weights; the last layer accumulates f32 and returns f32 so the
    downstream distribution/value math is unaffected).

    Keeping the activations bf16 matters more than the matmul precision on
    TPU: XLA's default f32 matmul already runs bf16 passes on the MXU, but a
    (65536, 512) f32 hidden activation is 134 MB of HBM traffic per layer
    per direction — the PPO update's grad steps are HBM-bound on exactly
    that traffic (v5e roofline, r3 job05: ~2.8 GB/grad-step ~= the measured
    2.8 ms at 819 GB/s). bf16 halves it.
    """
    if dtype is None:
        for w, b in params[:-1]:
            x = activation(x @ w + b)
        w, b = params[-1]
        x = x @ w + b
    else:
        x = x.astype(dtype)
        for w, b in params[:-1]:
            y = jnp.dot(x, w.astype(dtype), preferred_element_type=dtype)
            x = activation(y + b.astype(dtype))
        w, b = params[-1]
        x = jnp.dot(x, w.astype(dtype), preferred_element_type=jnp.float32) + b
    if out_activation is not None:
        x = out_activation(x)
    return x


_UNSET = object()   # sentinel: "use the network's configured compute_dtype"


@struct.dataclass
class ActorCriticParams:
    actor: list
    critic: list
    std: jax.Array   # (A,) raw per-dim std (actor_critic_mlp.py:82-83)


class ActorCritic:
    """Static network spec + pure apply functions."""

    def __init__(self, num_actor_input, num_critic_input, num_actions, policy_cfg):
        self.num_actor_input = num_actor_input
        self.num_critic_input = num_critic_input
        self.num_actions = num_actions
        self.actor_hidden = list(policy_cfg.actor_hidden_dims)
        self.critic_hidden = list(policy_cfg.critic_hidden_dims)
        self.activation = get_activation(policy_cfg.activation)
        self.actor_out_act = (
            get_activation(policy_cfg.actor_output_activation)
            if policy_cfg.actor_output_activation
            else None
        )
        self.critic_out_act = (
            get_activation(policy_cfg.critic_output_activation)
            if policy_cfg.critic_output_activation
            else None
        )
        self.fixed_std = bool(policy_cfg.fixed_std)
        self.init_noise_std = float(policy_cfg.init_noise_std)
        # exploration floor for the learnable std (projected after every
        # optimizer step; base_config.policy.noise_std_floor). 0 = off —
        # the reference's unconstrained learnable std.
        self.noise_std_floor = float(getattr(policy_cfg, "noise_std_floor", 0.0))
        # mixed precision: bf16 matmuls (MXU-native on TPU), f32 params /
        # optimizer / distribution math. No reference equivalent (the
        # reference trains f32 throughout); validated for learning parity in
        # docs/TRAINING.md before being enabled in a shipped config.
        name = getattr(policy_cfg, "compute_dtype", "float32") or "float32"
        self.compute_dtype = {"float32": None, "bfloat16": jnp.bfloat16}[str(name)]

    def init(self, key) -> ActorCriticParams:
        ka, kc = jax.random.split(key)
        return ActorCriticParams(
            actor=init_mlp(ka, self.num_actor_input, self.actor_hidden, self.num_actions),
            critic=init_mlp(kc, self.num_critic_input, self.critic_hidden, 1),
            std=self.init_noise_std * jnp.ones(self.num_actions),
        )

    # ---- distribution ops (actor_critic_mlp.py:165-217) ----

    def action_mean(self, params: ActorCriticParams, obs, dtype=_UNSET):
        dt = self.compute_dtype if dtype is _UNSET else dtype
        return apply_mlp(params.actor, obs, self.activation, self.actor_out_act, dt)

    def std(self, params: ActorCriticParams):
        if self.fixed_std:
            return jnp.full((self.num_actions,), self.init_noise_std)
        if self.noise_std_floor > 0.0:
            # safety net only: the update paths project params.std back to
            # the floor after every optimizer step, so this max is normally
            # the identity — it guards checkpoints written below the floor.
            return jnp.maximum(params.std, self.noise_std_floor)
        return params.std

    def act(self, params: ActorCriticParams, obs, key):
        """Sample actions; returns (actions, log_prob, mean, std)."""
        mean = self.action_mean(params, obs)
        std = jnp.broadcast_to(self.std(params), mean.shape)
        actions = mean + std * jax.random.normal(key, mean.shape)
        logp = self.log_prob(mean, std, actions)
        return actions, logp, mean, std

    @staticmethod
    def log_prob(mean, std, actions):
        var = jnp.square(std)
        lp = -0.5 * (jnp.square(actions - mean) / var + _LOG_2PI) - jnp.log(std)
        return jnp.sum(lp, axis=-1)

    @staticmethod
    def entropy(std):
        return jnp.sum(0.5 + 0.5 * _LOG_2PI + jnp.log(std), axis=-1)

    def act_inference(self, params: ActorCriticParams, obs):
        return self.action_mean(params, obs)

    def joint_mean_value(self, params: ActorCriticParams, obs, critic_obs, dtype=_UNSET):
        """Actor mean AND critic value as ONE batched-matmul trunk.

        The reference runs actor and critic as two separate MLP stacks
        (`actor_critic_mlp.py:59-74`); semantically this does the same math,
        but when the two stacks share hidden shapes (they do for every GRx
        config, `gr1t1_config.py:338-339`) the hidden layers are stacked
        into (2, in, out) weights and run as a single batched `dot_general`
        per layer, and the output heads are padded to a common width and
        stacked the same way. Halves the matmul op count of the PPO grad
        step, whose per-step time was dispatch-bound past the MXU roofline
        (v5e, r3 job04: 0.266 ms measured vs ~0.20 ms roofline at B=10485).
        Falls back to the separate stacks when shapes/activations differ.
        """
        dt = self.compute_dtype if dtype is _UNSET else dtype
        fusable = (
            self.actor_hidden == self.critic_hidden
            and len(self.actor_hidden) >= 1
            and self.actor_out_act is None
            and self.critic_out_act is None
        )
        if not fusable:
            return (
                self.action_mean(params, obs, dtype=dtype),
                self.evaluate(params, critic_obs, dtype=dtype),
            )
        act = self.activation
        (wa, ba), (wc, bc) = params.actor[0], params.critic[0]
        (wo, bo), (wv, bv) = params.actor[-1], params.critic[-1]
        a = self.num_actions
        w_out = jnp.stack([wo, jnp.pad(wv, ((0, 0), (0, a - 1)))])
        b_out = jnp.stack([bo, jnp.pad(bv, (0, a - 1))])
        if dt is None:
            x = jnp.stack([act(obs @ wa + ba), act(critic_obs @ wc + bc)])
            for (w0, b0), (w1, b1) in zip(params.actor[1:-1], params.critic[1:-1]):
                w = jnp.stack([w0, w1])
                b = jnp.stack([b0, b1])
                x = act(jnp.einsum("sbi,sio->sbo", x, w) + b[:, None, :])
            y = jnp.einsum("sbi,sio->sbo", x, w_out) + b_out[:, None, :]
        else:
            ha = jnp.dot(obs.astype(dt), wa.astype(dt), preferred_element_type=dt)
            hc = jnp.dot(critic_obs.astype(dt), wc.astype(dt), preferred_element_type=dt)
            x = jnp.stack([act(ha + ba.astype(dt)), act(hc + bc.astype(dt))])
            for (w0, b0), (w1, b1) in zip(params.actor[1:-1], params.critic[1:-1]):
                w = jnp.stack([w0, w1]).astype(dt)
                b = jnp.stack([b0, b1]).astype(dt)
                x = act(
                    jnp.einsum("sbi,sio->sbo", x, w, preferred_element_type=dt)
                    + b[:, None, :]
                )
            y = (
                jnp.einsum(
                    "sbi,sio->sbo", x, w_out.astype(dt),
                    preferred_element_type=jnp.float32,
                )
                + b_out[:, None, :]
            )
        return y[0], y[1][:, 0]

    def evaluate(self, params: ActorCriticParams, critic_obs, dtype=_UNSET):
        dt = self.compute_dtype if dtype is _UNSET else dtype
        v = apply_mlp(params.critic, critic_obs, self.activation, self.critic_out_act, dt)
        return jnp.squeeze(v, axis=-1)
