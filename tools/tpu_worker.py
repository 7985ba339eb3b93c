"""Persistent TPU job worker (dev tool, not part of the framework).

The axon TPU pool grant costs ~5-8 min per process at first device use
(see CLAUDE.md), so interactive kernel iteration in fresh processes is
impractical. This worker pays the grant once, then executes python job
files dropped into ``.tpujobs/`` in a shared namespace (so compiled
functions and arrays persist between jobs).

Protocol:
  - submit:   write ``.tpujobs/<name>.py``
  - result:   worker writes ``.tpujobs/<name>.out`` (stdout+stderr+traceback)
              and ``.tpujobs/<name>.done`` (empty marker) when finished
  - shutdown: submit a job calling ``WORKER_EXIT()``

Jobs run in submission order (mtime, then name).
"""

import io
import os
import sys
import time
import traceback
from contextlib import redirect_stderr, redirect_stdout
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
JOBS = REPO / ".tpujobs"
JOBS.mkdir(exist_ok=True)
sys.path.insert(0, str(REPO))


def main():
    t0 = time.time()
    import jax

    # same persistent compile cache as bench.py: worker restarts (required
    # after any package edit) would otherwise recompile every program cold
    cache = REPO / ".jax_cache"
    cache.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache))

    devs = jax.devices()
    print(f"[worker] jax ready in {time.time() - t0:.1f}s: {devs}", flush=True)
    # force a real allocation so the grant is fully established
    import jax.numpy as jnp

    jax.block_until_ready(jnp.ones((8, 128)) @ jnp.ones((128, 8)))
    print(f"[worker] device warm in {time.time() - t0:.1f}s", flush=True)
    (JOBS / "READY").write_text(f"{devs}\n")

    shared = {"__name__": "__tpujob__", "WORKER_EXIT": sys.exit}
    done = set()
    while True:
        jobs = sorted(
            (p for p in JOBS.glob("*.py") if p.stem not in done and not (JOBS / (p.stem + ".done")).exists()),
            key=lambda p: (p.stat().st_mtime, p.name),
        )
        for job in jobs:
            out_path = JOBS / (job.stem + ".out")
            print(f"[worker] running {job.name}", flush=True)
            # always run against current code: drop project modules so each
            # job re-imports them (stale cached modules silently ran old
            # classes after edits — r4/r5 operational pain, CLAUDE.md)
            for m in [k for k in sys.modules if k.split(".")[0] in
                      ("wiki_grx_gym_tpu", "bench", "__graft_entry__")]:
                del sys.modules[m]
            t1 = time.time()
            status = "ok"
            # stream to the .out file LIVE (line-buffered): long jobs used
            # to buffer everything in memory and lose it all when a wedged
            # TPU grant forced a kill (r5 full-body job, 2 h of results)
            buf = open(out_path, "w", buffering=1)
            try:
                code = compile(job.read_text(), str(job), "exec")
                with redirect_stdout(buf), redirect_stderr(buf):
                    exec(code, shared)
            except SystemExit:
                buf.write("\n[worker] exiting\n")
                buf.close()
                (JOBS / (job.stem + ".done")).touch()
                print("[worker] shutdown requested", flush=True)
                return
            except Exception:
                buf.write(traceback.format_exc())
                status = "error"
            buf.write(f"\n[worker] job {job.name}: {status} in {time.time() - t1:.1f}s\n")
            buf.close()
            (JOBS / (job.stem + ".done")).touch()
            done.add(job.stem)
            print(f"[worker] {job.name} {status} ({time.time() - t1:.1f}s)", flush=True)
        time.sleep(0.5)


if __name__ == "__main__":
    main()
