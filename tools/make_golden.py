"""Generate the golden regression fixture for tests/test_golden.py.

Run on CPU after any *intended* numerics change:

    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python tools/make_golden.py
"""

import os
import sys
from pathlib import Path

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def build():
    from wiki_grx_gym_tpu.envs import task_registry

    env_cfg, _ = task_registry.get_cfgs("GR1T1")
    env_cfg.env.num_envs = 2
    env, _ = task_registry.make_env("GR1T1", env_cfg=env_cfg)
    state = env.init_state(jax.random.PRNGKey(123))
    step = jax.jit(env.step)
    acts = 0.1 * jax.random.normal(jax.random.PRNGKey(7), (3, 2, 10))
    obs_list, pri_list, rew_list = [], [], []
    for i in range(3):
        state, out = step(state, acts[i])
        obs_list.append(np.asarray(out.obs))
        pri_list.append(np.asarray(out.pri_obs))
        rew_list.append(np.asarray(out.rew))
    return {
        "obs": np.stack(obs_list),
        "pri_obs": np.stack(pri_list),
        "rew": np.stack(rew_list),
        "q": np.asarray(state.physics.q),
        "base_pos": np.asarray(state.physics.base_pos),
    }


if __name__ == "__main__":
    blob = build()
    out = Path(__file__).resolve().parents[1] / "tests" / "golden" / "gr1t1_step.npz"
    out.parent.mkdir(exist_ok=True)
    np.savez(out, **blob)
    print(f"wrote {out}")
    for k, v in blob.items():
        print(f"  {k}: {v.shape} mean={v.mean():+.6f}")
