"""Round-3 job 04: post-raveled-optimizer state of the plane path.

Measures full-iteration throughput + collection/learn split at 4096/8192
envs, plus the update phase in isolation, to decide the remaining lever
order for the >=4M at 4096 target (VERDICT item 2).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np
import jax
import jax.numpy as jnp

from wiki_grx_gym_tpu.envs import task_registry
from tools.jobs.r3_job02_attribution import out, timed_chain, timed_rb, update_study


def plane_split(num_envs, iters=20):
    env_cfg, train_cfg = task_registry.get_cfgs("GR1T1")
    env_cfg.env.num_envs = num_envs
    env, _ = task_registry.make_env("GR1T1", env_cfg=env_cfg)
    runner, _ = task_registry.make_alg_runner(env, "GR1T1", train_cfg=train_cfg, log_root=None)
    state = runner.init_state(init_at_random_ep_len=True)

    iter_t, state = timed_chain(lambda s: runner._train_iter(s)[0], state, iters=iters)

    rollout_jit = jax.jit(
        lambda st: runner._rollout(
            st.env_state, st.obs, st.critic_obs, st.ppo.params, st.rng, st.hidden
        )
    )
    coll_t = timed_rb(rollout_jit, state, iters=iters)
    out("plane_split", num_envs=num_envs,
        fps=runner.num_steps_per_env * num_envs / iter_t,
        iter_ms=iter_t * 1e3, collection_ms=coll_t * 1e3,
        learn_ms=(iter_t - coll_t) * 1e3)


def main():
    out("env", platform=jax.devices()[0].platform)
    stages = [
        ("p4", lambda: plane_split(4096)),
        ("p8", lambda: plane_split(8192, iters=12)),
        ("u4", lambda: update_study(4096, tag="_now")),
        ("u8", lambda: update_study(8192, tag="_now")),
    ]
    for name, fn in stages:
        try:
            fn()
        except Exception as e:
            out("stage_error", stage=name, error=repr(e)[:500])


if __name__ == "__main__":
    main()
