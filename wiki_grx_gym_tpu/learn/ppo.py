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
    def __init__(self, net: ActorCritic, alg_cfg, extra_loss_fn=None):
        """``extra_loss_fn(params, minibatch) -> scalar`` is the extension
        hook the reference exposes as ``calculate_other_loss``
        (ppo.py:289-295,323-324) for imitation/symmetry losses — e.g. a
        mirror-symmetry loss built from `learn/utils.swap_lr`."""
        self.net = net
        self.cfg = alg_cfg
        self.extra_loss_fn = extra_loss_fn
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

        self.tx = optax.inject_hyperparams(
            lambda learning_rate: optax.chain(
                optax.clip_by_global_norm(self.max_grad_norm),
                optax.adam(learning_rate, b1=0.9, b2=0.999, eps=1e-8),
            )
        )(learning_rate=self.lr_init)

    def init(self, params: ActorCriticParams) -> PPOState:
        return PPOState(
            params=params,
            opt_state=self.tx.init(params),
            learning_rate=jnp.asarray(self.lr_init, jnp.float32),
        )

    # ------------------------------------------------------------------

    def compute_returns(self, batch: Transition, last_values: jax.Array):
        """GAE (base_storage.py:120-141). ``batch`` leaves are (T, N, ...).

        Returns (returns, normalized advantages), each (T, N)."""

        def scan_fn(carry, xs):
            advantage, next_values = carry
            reward, done, value = xs
            not_terminal = 1.0 - done
            delta = reward + not_terminal * self.gamma * next_values - value
            advantage = delta + not_terminal * self.gamma * self.lam * advantage
            return (advantage, value), advantage + value

        n = batch.rewards.shape[1]
        (_, _), returns = jax.lax.scan(
            scan_fn,
            (jnp.zeros(n), last_values),
            (batch.rewards, batch.dones.astype(jnp.float32), batch.values),
            reverse=True,
        )
        adv = returns - batch.values
        adv = (adv - adv.mean()) / (adv.std() + 1e-8)
        return returns, adv

    # ------------------------------------------------------------------

    def _minibatch_loss(self, params, mb, lr_unused):
        net = self.net
        mean = net.action_mean(params, mb["obs"])
        std = jnp.broadcast_to(net.std(params), mean.shape)
        logp = net.log_prob(mean, std, mb["actions"])
        value = net.evaluate(params, mb["critic_obs"])
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

    def update(
        self, ppo_state: PPOState, batch: Transition, returns, advantages, key
    ) -> Tuple[PPOState, Dict[str, jax.Array]]:
        """Epochs x minibatches over the flattened (T*N) batch as one scan."""
        t, n = batch.rewards.shape
        total = t * n
        mb_size = total // self.num_mini_batches
        used = mb_size * self.num_mini_batches

        flat = {
            "obs": batch.obs.reshape(total, -1),
            "critic_obs": batch.critic_obs.reshape(total, -1),
            "actions": batch.actions.reshape(total, -1),
            "log_prob": batch.log_prob.reshape(total),
            "mu": batch.mu.reshape(total, -1),
            "sigma": batch.sigma.reshape(total, -1),
            "values": batch.values.reshape(total),
            "returns": returns.reshape(total),
            "advantages": advantages.reshape(total),
        }

        # one fresh permutation per epoch (base_storage.py:169 draws once per
        # update; per-epoch draws are strictly more shuffled)
        epoch_keys = jax.random.split(key, self.num_learning_epochs)
        perms = jnp.stack(
            [jax.random.permutation(k, total)[:used] for k in epoch_keys]
        ).reshape(self.num_learning_epochs * self.num_mini_batches, mb_size)

        grad_fn = jax.value_and_grad(self._minibatch_loss, has_aux=True)

        def mb_step(carry, idx):
            params, opt_state, lr = carry
            mb = {k: v[idx] for k, v in flat.items()}
            (loss, aux), grads = grad_fn(params, mb, lr)

            # adaptive LR from this minibatch's KL, applied to this step
            lr = self._adapt_lr(lr, aux["kl"])
            opt_state.hyperparams["learning_rate"] = lr

            # NaN-loss skip (ppo.py:297-299)
            ok = jnp.isfinite(loss)
            grads = jax.tree.map(lambda g: jnp.where(ok, g, jnp.zeros_like(g)), grads)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            metrics = {
                "value_loss": aux["value_loss"],
                "surrogate_loss": aux["surrogate_loss"],
                "kl": aux["kl"],
                "lr": lr,
            }
            return (params, opt_state, lr), metrics

        (params, opt_state, lr), metrics = jax.lax.scan(
            mb_step, (ppo_state.params, ppo_state.opt_state, ppo_state.learning_rate), perms
        )
        mean_metrics = jax.tree.map(jnp.mean, metrics)
        mean_metrics["lr"] = lr
        return (
            PPOState(params=params, opt_state=opt_state, learning_rate=lr),
            mean_metrics,
        )
