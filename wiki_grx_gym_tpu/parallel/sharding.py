"""Sharding placement rules for the training state.

Rule: any array leaf whose leading dimension equals ``num_envs`` is sharded
over the ``dp`` mesh axis; everything else (network params, optimizer
moments, scalars, PRNG keys) is replicated. Parameters additionally shard
their hidden dimension over ``mp`` when the mesh has one (tensor
parallelism for wide policies).

With these placements a single `jax.jit` of the training iteration makes XLA
emit exactly the collectives SURVEY.md §2.6 calls for: nothing in the
physics/rollout phase, one gradient all-reduce per minibatch in the update
phase, scalar all-reduces for metrics.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def shard_env_state(tree, mesh: Mesh, num_envs: int):
    """Place env-batched leaves on the dp axis, replicate the rest."""

    def place(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == num_envs:
            spec = P("dp", *([None] * (x.ndim - 1)))
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(place, tree)


def shard_params(params, mesh: Mesh):
    """Replicate over dp; shard MLP hidden dims over mp if the mesh has it.

    Layers are [(W (in, out), b (out,)), ...]; we alternate sharding the
    output/input feature dims so consecutive layers chain without resharding
    (Megatron-style column/row split)."""
    if "mp" not in mesh.axis_names or mesh.shape["mp"] == 1:
        return jax.device_put(params, NamedSharding(mesh, P()))

    def place_stack(stack):
        out = []
        for i, (w, b) in enumerate(stack):
            if i % 2 == 0:  # column parallel: shard output features
                w_s = NamedSharding(mesh, P(None, "mp"))
                b_s = NamedSharding(mesh, P("mp"))
            else:  # row parallel: shard input features
                w_s = NamedSharding(mesh, P("mp", None))
                b_s = NamedSharding(mesh, P())
            out.append((jax.device_put(w, w_s), jax.device_put(b, b_s)))
        return out

    return params.replace(
        actor=place_stack(params.actor),
        critic=place_stack(params.critic),
        std=jax.device_put(params.std, NamedSharding(mesh, P())),
    )


def shard_runner_state(state, mesh: Mesh, num_envs: int):
    """Shard a full RunnerState: env state on dp, learner state replicated/TP."""
    env_state = shard_env_state(state.env_state, mesh, num_envs)
    obs = shard_env_state(state.obs, mesh, num_envs)
    critic_obs = shard_env_state(state.critic_obs, mesh, num_envs)
    params = shard_params(state.ppo.params, mesh)
    # optimizer state mirrors params placement automatically on next update;
    # replicate it initially
    opt_state = jax.device_put(state.ppo.opt_state, NamedSharding(mesh, P()))
    ppo = state.ppo.replace(
        params=params,
        opt_state=opt_state,
        learning_rate=jax.device_put(state.ppo.learning_rate, NamedSharding(mesh, P())),
    )
    rng = jax.device_put(state.rng, NamedSharding(mesh, P()))
    # recurrent memory leaves are (L, N, H): env axis second
    hidden = state.hidden
    if hidden is not None:
        hidden = jax.tree.map(
            lambda x: jax.device_put(
                x,
                NamedSharding(
                    mesh,
                    P(None, "dp", *([None] * (x.ndim - 2)))
                    if x.ndim >= 2 and x.shape[1] == num_envs
                    else P(),
                ),
            ),
            hidden,
        )
    return state.replace(
        env_state=env_state, obs=obs, critic_obs=critic_obs, ppo=ppo, rng=rng,
        hidden=hidden,
    )
