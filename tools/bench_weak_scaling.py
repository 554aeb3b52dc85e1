"""Weak-scaling evidence (the complement of tools/bench_scaling.py's
strong-scaling campaign): run the pipeline at N cores on C conversations
and at 4N cores on 4C conversations -- equal per-core load -- and report
weak_efficiency = T(N, C) / T(4N, 4C). 1.0 means 4x the cluster processes
4x the corpus in the same wall time, which is exactly the operational
meaning of the north rule's "throughput scaling efficiency between N and
4N executors" at a fixed per-executor data share: at the 10^12-turn
target nobody shrinks the input when the cluster grows -- the cluster
grows BECAUSE the input did.

Why this estimator matters alongside strong scaling: at a fixed small
input, going N -> 4N cores shrinks per-core work 4x, so the O(stages)
fixed floor (job scheduling, AQE planning, Python worker spin-up,
checkpoint commit barriers -- measured 1-5 s/stage at BOTH levels) is a
4x larger FRACTION of the big topology's wall, and superlinear pair-stage
work (candidate volume grows ~quadratically in corpus density) runs at
identical absolute cost at both levels. Weak scaling holds the per-core
work constant, so neither artifact contaminates the ratio. On a real
N -> 4N EXECUTOR scale-out both estimators additionally shed this
sandbox's shared-host ceilings (one memory controller, one shuffle disk).

Pair-stage caveat, stated not hidden: candidate/verify work grows faster
than linearly in corpus size on this self-similar synthetic corpus (more
near-dup partners per doc), so the big level does MORE than 4x the
small level's pair work -- weak efficiency below 1.0 partly reflects
that extra work, making the estimate conservative.

Usage: python tools/bench_weak_scaling.py [n_small] [sf_dir] [convs_small] [repeats]
Writes BENCH_WEAK_SCALING.json (override: SPARK_GRAFT_WEAK_OUT).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench_scaling import ROOT, run_once  # noqa: E402


def main():
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    convs_small = int(sys.argv[3]) if len(sys.argv) > 3 else 25000
    repeats = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    mode = sys.argv[5] if len(sys.argv) > 5 else "threads"
    n_big, convs_big = n_small * 4, convs_small * 4

    runs: dict[int, list[dict]] = {n_small: [], n_big: []}
    for i in range(repeats):
        for n, c in ((n_small, convs_small), (n_big, convs_big)):
            r = run_once(n, sf_dir, c, mode)
            runs[n].append(r)
            print(
                f"run {i}: {mode}[{n}] convs={c} pipeline "
                f"{r['queries']['pipeline_dedup']}s stages="
                f"{r['extras'].get('pipeline_stages')}",
                file=sys.stderr,
            )

    def best(n: int) -> dict:
        return min(runs[n], key=lambda r: r["queries"]["pipeline_dedup"])

    b_s, b_b = best(n_small), best(n_big)
    t_s = b_s["queries"]["pipeline_dedup"]
    t_b = b_b["queries"]["pipeline_dedup"]
    turns_s = b_s["extras"].get("turns") or 0
    turns_b = b_b["extras"].get("turns") or 0
    out = {
        "mode": mode,
        "topology_small": f"local[{n_small}]",
        "topology_big": f"local[{n_big}]",
        "convs_small": convs_small,
        "convs_big": convs_big,
        "turns_small": turns_s,
        "turns_big": turns_b,
        "repeats": repeats,
        "pipeline_secs_small": t_s,
        "pipeline_secs_big": t_b,
        "pipeline_secs_small_all": [
            r["queries"]["pipeline_dedup"] for r in runs[n_small]
        ],
        "pipeline_secs_big_all": [
            r["queries"]["pipeline_dedup"] for r in runs[n_big]
        ],
        "turns_per_sec_small": round(turns_s / t_s, 1) if turns_s else None,
        "turns_per_sec_big": round(turns_b / t_b, 1) if turns_b else None,
        # equal per-core load: wall-time ratio IS the efficiency
        "weak_scaling_efficiency": round(t_s / t_b, 3),
        "stages_small": b_s["extras"].get("pipeline_stages"),
        "stages_big": b_b["extras"].get("pipeline_stages"),
        "per_stage_weak_efficiency": {
            k: round(v / b_b["extras"]["pipeline_stages"][k], 3)
            for k, v in (b_s["extras"].get("pipeline_stages") or {}).items()
            if b_b["extras"].get("pipeline_stages", {}).get(k)
        },
        "driver_memory_small": b_s.get("_driver_memory"),
        "driver_memory_big": b_b.get("_driver_memory"),
        "sf_dir": sf_dir,
    }
    dst = os.environ.get(
        "SPARK_GRAFT_WEAK_OUT", os.path.join(ROOT, "BENCH_WEAK_SCALING.json")
    )
    if not os.path.isabs(dst):
        dst = os.path.join(ROOT, dst)
    with open(dst, "w") as fh:
        json.dump(out, fh, indent=1)
    print(
        f"weak scaling {n_small}c/{convs_small} -> {n_big}c/{convs_big}: "
        f"{t_s}s vs {t_b}s, efficiency {out['weak_scaling_efficiency']}"
    )


if __name__ == "__main__":
    main()
