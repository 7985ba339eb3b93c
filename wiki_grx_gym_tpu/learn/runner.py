"""On-policy runner: the training loop driver.

Mirrors `rsl_rl/runners/on_policy_runner.py` (ctor :51-113, learn :115-206,
log :209-295, save/load :297-331, inference policy :333-345) with one key
re-design: **the entire iteration — 64-step rollout, GAE, and the 8x25
minibatch PPO update — is a single jitted, buffer-donated function.** The
host only reads back a small metrics dict per iteration; there are no
per-step host round trips (the reference crosses into native code ~10 times
per policy step).

Logging writes the same TensorBoard scalars as the reference
(`Loss/value_function`, `Loss/surrogate`, `Loss/learning_rate`,
`Perf/total_fps`, `Train/mean_reward`, `Episode/rew_*`, ...).
"""

from __future__ import annotations

import os
import statistics
import time
from collections import deque
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from wiki_grx_gym_tpu.learn.networks import ActorCritic
from wiki_grx_gym_tpu.learn.ppo import PPO, PPOState, Transition


@struct.dataclass
class RunnerState:
    """Everything that evolves across iterations, donated to the jit step."""

    env_state: object          # EnvState
    obs: jax.Array             # (N, O)
    critic_obs: jax.Array      # (N, OP)
    ppo: PPOState
    rng: jax.Array


class OnPolicyRunner:
    def __init__(self, env, train_cfg, log_dir: Optional[str] = None, mesh=None):
        self.env = env
        self.cfg = train_cfg.runner
        self.alg_cfg = train_cfg.algorithm
        self.policy_cfg = train_cfg.policy
        self.log_dir = log_dir
        self.mesh = mesh
        self.num_steps_per_env = int(self.cfg.num_steps_per_env)
        self.save_interval = int(self.cfg.save_interval)
        self.seed = int(getattr(train_cfg, "seed", 1))

        num_pri_obs = env.pri_obs_dim if env.cfg.env.num_pri_obs else env.obs_dim
        self.net = ActorCritic(
            num_actor_input=env.obs_dim,
            num_critic_input=num_pri_obs,
            num_actions=env.num_actions,
            policy_cfg=self.policy_cfg,
        )
        # mirror-symmetry loss through PPO's calculate_other_loss hook
        # (on_policy_runner.py:161-167; completed in learn/symmetry.py)
        extra_loss_fn = None
        symmetry_coef = float(getattr(self.alg_cfg, "symmetry_coef", 0.0))
        if symmetry_coef > 0.0:
            from wiki_grx_gym_tpu.learn.symmetry import make_mirror_loss

            extra_loss_fn = make_mirror_loss(env, self.net, symmetry_coef)
        self.alg = PPO(self.net, self.alg_cfg, extra_loss_fn=extra_loss_fn)

        self.writer = None
        self.tot_timesteps = 0
        self.tot_time = 0.0
        self.current_learning_iteration = 0
        self.rewbuffer = deque(maxlen=100)
        self.lenbuffer = deque(maxlen=100)
        self._loaded_state: Optional[RunnerState] = None  # set by load()

        self._train_iter = jax.jit(self._iteration, donate_argnums=(0,))

    # ------------------------------------------------------------------
    # state init
    # ------------------------------------------------------------------

    def init_state(self, init_at_random_ep_len: bool = False) -> RunnerState:
        key = jax.random.PRNGKey(self.seed)
        k_env, k_net, k_run, k_len = jax.random.split(key, 4)
        env_state = self.env.init_state(k_env)
        if init_at_random_ep_len:
            # on_policy_runner.py:125-127
            env_state = env_state.replace(
                episode_length=jax.random.randint(
                    k_len, (self.env.num_envs,), 0, self.env.max_episode_length, jnp.int32
                )
            )
        params = self.net.init(k_net)
        ppo_state = self.alg.init(params)
        # initial observations: one zero-action step (BaseTask.reset semantics);
        # the jitted step is cached on the env so play/tests share the compile
        env_state, out = self.env.step_jit(
            env_state, jnp.zeros((self.env.num_envs, self.env.num_actions))
        )
        state = RunnerState(
            env_state=env_state,
            obs=out.obs,
            critic_obs=out.pri_obs,
            ppo=ppo_state,
            rng=k_run,
        )
        if self.mesh is not None:
            from wiki_grx_gym_tpu.parallel.sharding import shard_runner_state

            state = shard_runner_state(state, self.mesh, self.env.num_envs)
        return state

    # ------------------------------------------------------------------
    # one full PPO iteration (jitted)
    # ------------------------------------------------------------------

    def _iteration(self, state: RunnerState):
        env, net, alg = self.env, self.net, self.alg
        key, k_update = jax.random.split(state.rng)

        params = state.ppo.params

        def rollout_step(carry, _):
            env_state, obs, critic_obs, key = carry
            key, k_act = jax.random.split(key)
            actions, logp, mu, sigma = net.act(params, obs, k_act)
            values = net.evaluate(params, critic_obs)
            env_state, out = env.step(env_state, actions)
            # timeout bootstrapping (ppo.py:190-191)
            rewards = out.rew + alg.gamma * values * out.extras["time_outs"]
            trans = Transition(
                obs=obs,
                critic_obs=critic_obs,
                actions=actions,
                rewards=rewards,
                dones=out.reset,
                values=values,
                log_prob=logp,
                mu=mu,
                sigma=sigma,
            )
            metrics = {
                "reward": jnp.mean(out.rew),
                "done_count": out.extras["done_count"],
                "episode": out.extras["episode"],
                "ep_len_done": jnp.sum(
                    jnp.where(out.reset, env_state.episode_length, 0).astype(jnp.float32)
                ),
            }
            return (env_state, out.obs, out.pri_obs, key), (trans, metrics)

        (env_state, obs, critic_obs, key), (batch, roll_metrics) = jax.lax.scan(
            rollout_step,
            (state.env_state, state.obs, state.critic_obs, key),
            None,
            length=self.num_steps_per_env,
        )

        last_values = net.evaluate(params, critic_obs)
        returns, advantages = alg.compute_returns(batch, last_values)
        ppo_state, update_metrics = alg.update(state.ppo, batch, returns, advantages, k_update)

        # aggregate rollout episode metrics weighted by done counts
        dc = roll_metrics["done_count"]
        total_done = jnp.maximum(jnp.sum(dc), 1.0)
        ep_metrics = {
            k: jnp.sum(v * dc) / total_done for k, v in roll_metrics["episode"].items()
        }
        metrics = {
            "mean_step_reward": jnp.mean(roll_metrics["reward"]),
            "done_count": jnp.sum(dc),
            "mean_action_std": jnp.mean(net.std(ppo_state.params)),
            **{f"episode/{k}": v for k, v in ep_metrics.items()},
            **update_metrics,
        }
        new_state = RunnerState(
            env_state=env_state, obs=obs, critic_obs=critic_obs, ppo=ppo_state, rng=key
        )
        return new_state, metrics

    # ------------------------------------------------------------------
    # host loop (on_policy_runner.learn, :115-206)
    # ------------------------------------------------------------------

    def learn(self, num_learning_iterations: int, init_at_random_ep_len: bool = True,
              state: Optional[RunnerState] = None,
              profile_dir: Optional[str] = None) -> RunnerState:
        """Train for N iterations.

        ``profile_dir`` captures a jax.profiler device trace of iterations
        2-4 (the tracing/profiling aux subsystem, SURVEY.md §5 — view with
        xprof / tensorboard-plugin-profile)."""
        if state is None:
            # resume path: reuse the state prepared by load() (task_registry
            # make_alg_runner resume flow, task_registry.py:150-155)
            state = self._loaded_state
        if state is None:
            state = self.init_state(init_at_random_ep_len)
        # multi-host: only process 0 writes logs/checkpoints (restart
        # tolerance: any process can re-read them on resume)
        is_lead = jax.process_index() == 0
        if self.log_dir is not None and self.writer is None and is_lead:
            os.makedirs(self.log_dir, exist_ok=True)
            from torch.utils.tensorboard import SummaryWriter

            self.writer = SummaryWriter(log_dir=self.log_dir, flush_secs=10)

        steps_per_iter = self.num_steps_per_env * self.env.num_envs
        start_iter = self.current_learning_iteration
        for it in range(start_iter, start_iter + num_learning_iterations):
            rel = it - start_iter
            if profile_dir is not None and rel == 2:
                jax.profiler.start_trace(profile_dir)
            t0 = time.time()
            state, metrics = self._train_iter(state)
            metrics = jax.device_get(metrics)
            elapsed = time.time() - t0
            if profile_dir is not None and rel == 4:
                jax.profiler.stop_trace()

            self.tot_timesteps += steps_per_iter
            self.tot_time += elapsed
            self.current_learning_iteration = it + 1
            self._log(it, metrics, elapsed, steps_per_iter)

            if self.log_dir is not None and is_lead and (it + 1) % self.save_interval == 0:
                self.save(os.path.join(self.log_dir, f"model_{it + 1}"), state)
        if self.log_dir is not None and is_lead:
            self.save(
                os.path.join(self.log_dir, f"model_{self.current_learning_iteration}"), state
            )
        return state

    def _log(self, it: int, m: Dict, elapsed: float, steps_per_iter: int):
        fps = steps_per_iter / elapsed
        self.rewbuffer.append(float(m["mean_step_reward"]))
        if self.writer is not None:
            w = self.writer
            w.add_scalar("Loss/value_function", float(m["value_loss"]), it)
            w.add_scalar("Loss/surrogate", float(m["surrogate_loss"]), it)
            w.add_scalar("Loss/learning_rate", float(m["lr"]), it)
            w.add_scalar("Loss/kl_mean", float(m["kl"]), it)
            w.add_scalar("Policy/mean_noise_std", float(m["mean_action_std"]), it)
            w.add_scalar("Perf/total_fps", fps, it)
            w.add_scalar("Perf/iteration_time", elapsed, it)
            w.add_scalar("Train/mean_reward", float(m["mean_step_reward"]), it)
            for k, v in m.items():
                if k.startswith("episode/"):
                    w.add_scalar("Episode/" + k.split("/", 1)[1], float(v), it)
        line = (
            f"it {it:5d} | fps {fps:9.0f} | rew {float(m['mean_step_reward']):7.3f} "
            f"| vloss {float(m['value_loss']):7.3f} | sloss {float(m['surrogate_loss']):7.4f} "
            f"| kl {float(m['kl']):6.4f} | lr {float(m['lr']):.2e} "
            f"| std {float(m['mean_action_std']):5.3f} | dones {float(m['done_count']):6.0f}"
        )
        print(line, flush=True)

    # ------------------------------------------------------------------
    # checkpointing (on_policy_runner.py:297-331) via orbax
    # ------------------------------------------------------------------

    def save(self, path: str, state: RunnerState, infos=None):
        import orbax.checkpoint as ocp

        ckpt = {
            "params": state.ppo.params,
            "opt_state": state.ppo.opt_state,
            "learning_rate": state.ppo.learning_rate,
            "iter": self.current_learning_iteration,
        }
        with ocp.PyTreeCheckpointer() as ckptr:
            ckptr.save(os.path.abspath(path), ckpt, force=True)

    def load(self, path: str, state: Optional[RunnerState] = None, load_optimizer: bool = True):
        import orbax.checkpoint as ocp

        if state is None:
            state = self.init_state()
        template = {
            "params": state.ppo.params,
            "opt_state": state.ppo.opt_state,
            "learning_rate": state.ppo.learning_rate,
            "iter": 0,
        }
        restore_args = ocp.checkpoint_utils.construct_restore_args(template)
        with ocp.PyTreeCheckpointer() as ckptr:
            restored = ckptr.restore(
                os.path.abspath(path),
                args=ocp.args.PyTreeRestore(item=template, restore_args=restore_args),
            )
        ppo = state.ppo.replace(
            params=restored["params"],
            learning_rate=restored["learning_rate"],
        )
        if load_optimizer:
            ppo = ppo.replace(opt_state=restored["opt_state"])
        self.current_learning_iteration = int(restored["iter"])
        state = state.replace(ppo=ppo)
        self._loaded_state = state
        return state

    # ------------------------------------------------------------------

    def get_inference_policy(self, state: RunnerState):
        """Jitted deterministic policy (on_policy_runner.py:333-345)."""
        params = state.ppo.params

        @jax.jit
        def policy(obs):
            return self.net.act_inference(params, obs)

        return policy
