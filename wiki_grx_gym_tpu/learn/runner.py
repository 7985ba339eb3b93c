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
    hidden: object = None      # recurrent memory (learn/recurrent.Hidden) or None


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
        # class dispatch by config name, the reference's `eval(cfg[...])`
        # idiom (on_policy_runner.py:84-89) with a closed registry: an
        # unknown name fails loudly exactly as the reference's eval would
        pcn = str(getattr(self.cfg, "policy_class_name", "ActorCritic"))
        if pcn not in ("ActorCritic", "ActorCriticMLP", "ActorCriticRecurrent"):
            raise ValueError(f"unknown policy_class_name {pcn!r}")
        acn = str(getattr(self.alg_cfg, "algorithm_class_name", "PPO"))
        if acn != "PPO":
            raise ValueError(f"unknown algorithm_class_name {acn!r}")
        scn = str(getattr(self.alg_cfg, "storage_class", "RolloutStorage"))
        if scn != "RolloutStorage":
            raise ValueError(f"unknown storage_class {scn!r}")
        # rnn_type additionally selects the recurrent net (the reference's
        # recurrent path is config-scaffolded the same way)
        self.recurrent = pcn == "ActorCriticRecurrent" or bool(
            getattr(self.policy_cfg, "rnn_type", None)
        )
        if self.recurrent:
            from wiki_grx_gym_tpu.learn.recurrent import ActorCriticRecurrent

            net_cls = ActorCriticRecurrent
        else:
            net_cls = ActorCritic
        self.net = net_cls(
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
            from wiki_grx_gym_tpu.learn.symmetry import (
                make_mirror_loss,
                make_mirror_loss_recurrent,
            )

            make = make_mirror_loss_recurrent if self.recurrent else make_mirror_loss
            extra_loss_fn = make(env, self.net, symmetry_coef)
        # minibatch-shuffle locality: defaults to the dp mesh size so the
        # update's gathers never cross devices (see PPO docstring); an
        # explicit algorithm.permutation_groups pins it (e.g. to compare a
        # dp1 and a dp8 run bit-for-bit)
        pg = int(getattr(self.alg_cfg, "permutation_groups", 0) or 0)
        if pg == 0:
            if mesh is not None and "dp" in mesh.axis_names:
                pg = int(mesh.shape["dp"])
            else:
                pg = 1
        shuffle_block = int(getattr(self.alg_cfg, "shuffle_block", 16) or 16)
        # flat (raveled) clip+Adam except under tensor parallelism, where
        # raveling would all-gather the mp-sharded params every step
        flat_opt = mesh is None or "mp" not in mesh.axis_names or mesh.shape["mp"] == 1
        self.alg = PPO(self.net, self.alg_cfg, extra_loss_fn=extra_loss_fn, perm_groups=pg,
                       shuffle_block=shuffle_block, flat_optimizer=flat_opt, mesh=mesh)

        # a task with no active reward terms trains on pure noise — this
        # bit silently in a 2000-iteration full-body run (the reference's
        # full-body GR1T1Cfg ships with empty reward scales)
        if not getattr(env, "reward_names", ("_",)):
            print(
                "WARNING: env has ZERO active reward terms (all scales are 0) "
                "— training will not learn anything. Check cfg.rewards.scales.",
                flush=True,
            )

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
            hidden=self.net.initial_hidden(self.env.num_envs) if self.recurrent else None,
        )
        if self.mesh is not None:
            from wiki_grx_gym_tpu.parallel.sharding import shard_runner_state

            state = shard_runner_state(state, self.mesh, self.env.num_envs)
        return state

    # ------------------------------------------------------------------
    # one full PPO iteration (jitted)
    # ------------------------------------------------------------------

    def _rollout(self, env_state, obs, critic_obs, params, key, hidden=None):
        """Collection phase: T steps of act->env.step->store as one lax.scan.

        Metric reductions are deliberately NOT performed here: per-env
        accumulators ride the scan carry and are reduced once per iteration
        in :meth:`_iteration`, so on a dp mesh the compiled rollout contains
        **zero cross-device collectives** (asserted by
        tests/test_parallel.py; the SURVEY §2.6 contract)."""
        env, net, alg = self.env, self.net, self.alg
        n = env.num_envs

        def rollout_step(carry, _):
            env_state, obs, critic_obs, key, hidden, acc = carry
            key, k_act = jax.random.split(key)
            if self.recurrent:
                # both memories stepped in one dispatch chain
                actions, logp, mu, sigma, values, hidden = net.act_evaluate_rnn(
                    params, obs, critic_obs, hidden, k_act
                )
                packed = jnp.zeros((n, 0), alg.storage_dtype)
            else:
                if alg.fused_trunk:
                    # actor + critic as one batched trunk (networks.joint_mean_value)
                    mu, values = net.joint_mean_value(params, obs, critic_obs)
                    sigma = jnp.broadcast_to(net.std(params), mu.shape)
                    actions = mu + sigma * jax.random.normal(k_act, mu.shape)
                    logp = net.log_prob(mu, sigma, actions)
                else:
                    actions, logp, mu, sigma = net.act(params, obs, k_act)
                    values = net.evaluate(params, critic_obs)
                if alg.pack_rollout:
                    # obs||critic_obs pre-packed in the update's storage dtype:
                    # the PPO update consumes THIS buffer, so the f32 obs stores
                    # below are dead and XLA eliminates them (see _pack_shuffle)
                    packed = jnp.concatenate(
                        [obs.astype(alg.storage_dtype), critic_obs.astype(alg.storage_dtype)],
                        axis=-1,
                    )
                else:
                    packed = jnp.zeros((n, 0), alg.storage_dtype)
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
            acc = {
                "rew": acc["rew"] + out.rew,
                "done": acc["done"] + out.reset.astype(jnp.float32),
                "ep_sums": acc["ep_sums"] + out.extras["episode_done_sums"],
                "ep_len_done": acc["ep_len_done"] + out.extras["ep_len_done"],
            }
            if self.recurrent:
                # zero recurrent memory of reset envs (rsl_rl reset semantics)
                live = (1.0 - out.reset.astype(jnp.float32))[None, :, None]
                hidden = type(hidden)(*(h * live for h in hidden))
            return (env_state, out.obs, out.pri_obs, key, hidden, acc), (trans, packed)

        acc0 = {
            "rew": jnp.zeros(n),
            "done": jnp.zeros(n),
            "ep_sums": jnp.zeros((n, len(self.env.all_reward_names))),
            "ep_len_done": jnp.zeros(n),
        }
        (env_state, obs, critic_obs, key, hidden, acc), (batch, packed) = jax.lax.scan(
            rollout_step,
            (env_state, obs, critic_obs, key, hidden, acc0),
            None,
            length=self.num_steps_per_env,
        )
        return env_state, obs, critic_obs, key, hidden, acc, batch, packed

    def _iteration(self, state: RunnerState):
        env, net, alg = self.env, self.net, self.alg
        key, k_update = jax.random.split(state.rng)
        params = state.ppo.params

        hidden0 = state.hidden   # memory at rollout start (recurrent replay)
        env_state, obs, critic_obs, key, hidden, acc, batch, packed = self._rollout(
            state.env_state, state.obs, state.critic_obs, params, key, state.hidden
        )

        if self.recurrent:
            last_values, _ = net.evaluate_rnn(params, critic_obs, hidden)
            returns, advantages = alg.compute_returns(batch, last_values)
            ppo_state, update_metrics = alg.update_recurrent(
                state.ppo, batch, returns, advantages, k_update, hidden0
            )
        else:
            last_values = net.evaluate(params, critic_obs)
            returns, advantages = alg.compute_returns(batch, last_values)
            ppo_state, update_metrics = alg.update(
                state.ppo, batch, returns, advantages, k_update,
                packed_wide=packed if alg.pack_rollout else None,
                wide_sizes=(self.env.obs_dim, critic_obs.shape[-1]),
            )

        # metric reductions: once per iteration (the only rollout-side
        # collectives on a dp mesh, matching on_policy_runner.py:178-179
        # semantics: per-reward episode means over done envs)
        total_done = jnp.maximum(jnp.sum(acc["done"]), 1.0)
        ep_metrics = {
            name: jnp.sum(acc["ep_sums"][:, i]) / total_done / env.max_episode_length_s
            for i, name in enumerate(env.all_reward_names)
        }
        # curriculum telemetry (legged_robot.py:426-436)
        if env.custom_origins and env.cfg.terrain.curriculum:
            ep_metrics["terrain_level"] = jnp.mean(env_state.terrain_levels.astype(jnp.float32))
        if env.cfg.commands.curriculum:
            ep_metrics["max_command_x"] = env_state.cmd_lin_vel_x_range[1]
        metrics = {
            "mean_step_reward": jnp.sum(acc["rew"]) / (self.num_steps_per_env * env.num_envs),
            "done_count": jnp.sum(acc["done"]),
            "mean_ep_len_done": jnp.sum(acc["ep_len_done"]) / total_done,
            "mean_action_std": jnp.mean(net.std(ppo_state.params)),
            **{f"episode/{k}": v for k, v in ep_metrics.items()},
            **update_metrics,
        }
        new_state = RunnerState(
            env_state=env_state, obs=obs, critic_obs=critic_obs, ppo=ppo_state,
            rng=key, hidden=hidden,
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
        if float(m["done_count"]) > 0:
            self.lenbuffer.append(float(m["mean_ep_len_done"]))
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
            if self.lenbuffer:
                w.add_scalar(
                    "Train/mean_episode_length", statistics.mean(self.lenbuffer), it
                )
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
        """Jitted deterministic policy (on_policy_runner.py:333-345).

        Recurrent policies return a *stateful* closure carrying the LSTM
        memory across calls (PolicyExporterLSTM semantics,
        helpers.py:204-231); call ``policy.reset()`` to zero it."""
        params = state.ppo.params

        if not self.recurrent:
            @jax.jit
            def policy(obs):
                return self.net.act_inference(params, obs)

            return policy

        net = self.net
        cell = {"hidden": None}

        @jax.jit
        def _step(obs, hidden):
            return net.act_inference_rnn(params, obs, hidden)

        def policy(obs):
            if cell["hidden"] is None:
                cell["hidden"] = net.initial_hidden(obs.shape[0])
            actions, cell["hidden"] = _step(obs, cell["hidden"])
            return actions

        policy.reset = lambda: cell.update(hidden=None)
        return policy
