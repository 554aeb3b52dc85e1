"""Finalize the round's scaling artifact: merge the 24k headline campaign,
the 40k secondary-size campaign, the no-Spark kernel probe, and the 24k
sensitivity campaigns into BENCH_SCALING.json, then compute the derived
summary numbers the narrative cites (compute-stage efficiency with the
O(stages) floor netted out, per-stage efficiencies at both sizes).

Usage: python tools/finalize_scaling.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# stages whose wall time is O(stages)/fixed-floor at these corpus sizes
# (1-5s at BOTH parallelism levels: job scheduling + AQE planning + commit
# barriers, not data-proportional compute)
FLOOR_STAGES = {"assembled", "exact_groups", "clusters"}


def main():
    subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "merge_scaling.py")],
        check=True,
    )
    path = os.path.join(ROOT, "BENCH_SCALING.json")
    with open(path) as fh:
        out = json.load(fh)

    def net_floor(stages: dict) -> dict:
        sm = sum(
            v["secs_small"] for s, v in stages.items() if s not in FLOOR_STAGES
        )
        bg = sum(
            v["secs_big"] for s, v in stages.items() if s not in FLOOR_STAGES
        )
        return {
            "compute_secs_small": round(sm, 3),
            "compute_secs_big": round(bg, 3),
            "compute_stage_efficiency": round(sm / bg / 4, 3) if bg else None,
        }

    out["floor_netted_24k"] = net_floor(out["stages"])
    sec = out.get("secondary_size_convs40000")
    if sec:
        out["floor_netted_40k"] = net_floor(sec["stages"])

    out["notes"] = (
        "Round 4, post-join-pin code with the positional-window containment "
        "recall fix INCLUDED in the measured pipeline. N=4 vs 4N=16 cores "
        "(task brief: 'N and 4N cores'; PROBE_HW_CEILING/kernel_probe shows "
        "the host's 8->32 region caps at 0.59-0.71 with zero Spark, while "
        "4->16 stays at 0.85-1.03 for the Levenshtein kernel and 0.85 for "
        "MinHash). Headline campaign: 3 interleaved repeats, ParallelGC, "
        "per-core-constant driver heap (3 GB/core). Two same-commit "
        "sensitivity campaigns (sensitivity_campaigns_24k) bracket the "
        "methodology: 9 total repeats per level at 24k. The 40k secondary "
        "size is measured on the SAME commit as the headline (closing the "
        "r3 'pinned after measurement' caveat). Fixed-floor attribution: "
        "footer+commit are <0.2s; the floor stages' 1-5s at both levels is "
        "Spark job scheduling/AQE planning per stage (see "
        "stage_breakdown_*), size-independent and irrelevant at the "
        "10^12-turn target; floor_netted_* reports compute-stage-only "
        "efficiency. Known residuals, quantified in stages: the "
        "positional-window containment stage (new this round, +64s/+35s "
        "at 4/16 cores vs r3) and a bimodal verified_pairs slow mode at "
        "local[16] (bimodality visible in pipeline_secs_big_all across "
        "campaigns); both are instrumented via SPARK_GRAFT_PHASE_TIMING "
        "sub-phase timers for next-round attribution."
    )
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)

    print("headline 24k:", out["scaling_efficiency"], "stage_sum:",
          out["scaling_efficiency_stage_sum"])
    print("floor-netted 24k:", out["floor_netted_24k"])
    if sec:
        print("40k:", sec["scaling_efficiency"], "stage_sum:",
              sec.get("scaling_efficiency_stage_sum"))
        print("floor-netted 40k:", out["floor_netted_40k"])
        print("40k stages:")
        for st, v in sec["stages"].items():
            print("  ", st, v)


if __name__ == "__main__":
    main()
