"""r4 job01: A/B the round-3 final-commit update rework (VERDICT item 1).

Four variants at 4096 envs (plane GR1T1, full fidelity), same timing
methodology as bench.py (donated full-iteration jit, 3 warmups, 30 timed):

  fused_trunk x pack_rollout:
    TT  = HEAD default (joint actor+critic trunk, in-rollout packing)
    FT, TF = each change alone
    FF  = the pre-bf0479a path (579f5ec equivalent)

Then the winner and FF again at 8192 envs (the reference default count,
gr1t1_config.py:15) to check the 3.44M@8192 claim from the raveled-optimizer
commit (683d86e).
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import bench  # noqa: E402


def run(num_envs, fused, pack, iters=30):
    def hook(train_cfg):
        train_cfg.algorithm.fused_trunk = fused
        train_cfg.algorithm.pack_rollout = pack

    r = bench.bench_config(num_envs, iters, train_hook=hook)
    out = {
        "num_envs": num_envs,
        "fused_trunk": fused,
        "pack_rollout": pack,
        "fps": round(r["fps"], 1),
        "iter_ms": round(r["iter_ms"], 2),
        "collection_ms": round(r["collection_ms"], 2),
        "learn_ms": round(r["learn_ms"], 2),
    }
    print(json.dumps(out), flush=True)
    return out


def main():
    results = []
    for fused, pack in ((True, True), (False, True), (True, False), (False, False)):
        results.append(run(4096, fused, pack))
    best = min(results, key=lambda r: r["iter_ms"])
    print(f"# best@4096: fused={best['fused_trunk']} pack={best['pack_rollout']} "
          f"{best['iter_ms']} ms", flush=True)
    run(8192, best["fused_trunk"], best["pack_rollout"], iters=15)
    if (best["fused_trunk"], best["pack_rollout"]) != (False, False):
        run(8192, False, False, iters=15)


if __name__ == "__main__":
    main()
