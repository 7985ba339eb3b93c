"""Round-3 job 06: localize the in-iteration update overhead.

j05: update costs 58.7 ms inside the real (donated) iteration but only
39.6 ms standalone on a fresh fake batch — and bf16 activations are a wash.
This sweeps num_learning_epochs inside the REAL iteration: the slope is the
true per-epoch cost in context, the intercept (minus rollout+GAE) is the
in-context pack/layout cost. Also A/Bs the get_mb astype fix.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax

from wiki_grx_gym_tpu.envs import task_registry
from tools.jobs.r3_job02_attribution import out, timed_chain


def iter_with_epochs(num_envs, epochs):
    env_cfg, train_cfg = task_registry.get_cfgs("GR1T1")
    env_cfg.env.num_envs = num_envs
    train_cfg.algorithm.num_learning_epochs = epochs
    env, _ = task_registry.make_env("GR1T1", env_cfg=env_cfg)
    runner, _ = task_registry.make_alg_runner(env, "GR1T1", train_cfg=train_cfg, log_root=None)
    state = runner.init_state(init_at_random_ep_len=True)
    t, _ = timed_chain(lambda s: runner._train_iter(s)[0], state, iters=15)
    out("iter_epochs", num_envs=num_envs, epochs=epochs, iter_ms=t * 1e3,
        fps=runner.num_steps_per_env * num_envs / t)
    return t


def main():
    out("env", platform=jax.devices()[0].platform)
    ts = {}
    for e in (1, 5, 8):
        try:
            ts[e] = iter_with_epochs(4096, e)
        except Exception as err:
            out("stage_error", stage=f"e{e}", error=repr(err)[:400])
    if 1 in ts and 8 in ts:
        per = (ts[8] - ts[1]) / 7.0
        out("fit", per_epoch_ms=per * 1e3, fixed_ms=(ts[1] - per) * 1e3)


if __name__ == "__main__":
    main()
