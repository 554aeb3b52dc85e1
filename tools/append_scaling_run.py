"""Append one more interleaved repeat pair to the 40k campaign artifact
(BENCH_SCALING_40k.json) from two raw bench.py outputs, recomputing the
best-of/stage-minima aggregation identically to tools/bench_scaling.py,
then re-run the finalize merge. Used to extend a campaign without
re-running its earlier repeats (interleaving is preserved: the new pair
runs small-then-big like every prior repeat).

Usage: python tools/append_scaling_run.py <small.out> <big.out> [campaign.json]
"""

from __future__ import annotations

import ast
import json
import os
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_bench(path: str) -> dict:
    line = [
        l for l in open(path).read().splitlines() if l.startswith("{")
    ][-1]
    return json.loads(line)


def main():
    small_out, big_out = sys.argv[1], sys.argv[2]
    cpath = sys.argv[3] if len(sys.argv) > 3 else os.path.join(
        ROOT, "BENCH_SCALING_40k.json"
    )
    log = sys.argv[4] if len(sys.argv) > 4 else "/tmp/scaling_40k.log"

    with open(cpath) as fh:
        camp = json.load(fh)
    n_small, n_big = camp["n_small"], camp["n_big"]

    # per-run history: prefer the campaign's own persisted raw_runs list
    # (written by this tool on every append, so repeated appends never
    # drop earlier appended pairs); fall back to reconstructing the
    # ORIGINAL campaign's repeats from its stderr log only on the first
    # append (any run mode label, not just threads[N]).
    runs: dict[int, list[dict]] = {n_small: [], n_big: []}
    if "raw_runs" in camp:
        for n in (n_small, n_big):
            runs[n] = list(camp["raw_runs"][str(n)])
    else:
        pat = re.compile(
            r"run \d+: [\w-]+\[(\d+)[^\]]*\] pipeline ([0-9.]+)s stages=(\{.*\})"
        )
        for line in open(log):
            m = pat.search(line)
            if m:
                runs[int(m.group(1))].append(
                    {
                        "secs": float(m.group(2)),
                        "stages": ast.literal_eval(m.group(3)),
                        "breakdown": None,
                        "turns_per_sec": None,
                    }
                )
    for n, path in ((n_small, small_out), (n_big, big_out)):
        b = load_bench(path)
        runs[n].append(
            {
                "secs": b["queries"]["pipeline_dedup"],
                "stages": b["extras"]["pipeline_stages"],
                "breakdown": b["extras"].get("pipeline_stage_breakdown"),
                "turns_per_sec": b["extras"]["turns_per_sec"],
            }
        )

    def best(n):
        return min(runs[n], key=lambda r: r["secs"])

    def stage_min(n):
        acc: dict[str, float] = {}
        for r in runs[n]:
            for st, secs in r["stages"].items():
                acc[st] = min(acc.get(st, 1e18), secs)
        return {k: round(v, 3) for k, v in acc.items()}

    t_small, t_big = best(n_small)["secs"], best(n_big)["secs"]
    ratio = n_big / n_small
    st_small, st_big = stage_min(n_small), stage_min(n_big)
    camp.update(
        repeats=len(runs[n_small]),
        pipeline_secs_small=t_small,
        pipeline_secs_big=t_big,
        pipeline_secs_small_all=[r["secs"] for r in runs[n_small]],
        pipeline_secs_big_all=[r["secs"] for r in runs[n_big]],
        turns_per_sec_small=round(camp["turns"] / t_small, 1),
        turns_per_sec_big=round(camp["turns"] / t_big, 1),
        speedup=round(t_small / t_big, 3),
        scaling_efficiency=round(t_small / t_big / ratio, 3),
    )
    table = {
        st: {
            "secs_small": st_small[st],
            "secs_big": st_big.get(st, 0.0),
            "speedup": round(st_small[st] / st_big[st], 3) if st_big.get(st) else None,
            "efficiency": round(st_small[st] / st_big[st] / ratio, 3)
            if st_big.get(st)
            else None,
        }
        for st in st_small
    }
    camp["stages"] = table
    sum_small = sum(v["secs_small"] for v in table.values())
    sum_big = sum(v["secs_big"] for v in table.values())
    camp["stage_sum_secs_small"] = round(sum_small, 3)
    camp["stage_sum_secs_big"] = round(sum_big, 3)
    camp["speedup_stage_sum"] = round(sum_small / sum_big, 3)
    camp["scaling_efficiency_stage_sum"] = round(sum_small / sum_big / ratio, 3)
    for n, key in ((n_small, "stage_breakdown_small"), (n_big, "stage_breakdown_big")):
        b = best(n)
        # the breakdown must describe the run whose pipeline_secs is
        # reported as best; a log-reconstructed best has no breakdown, so
        # drop a stale one rather than misattribute it
        if b["breakdown"]:
            camp[key] = b["breakdown"]
        else:
            camp.pop(key, None)

    # persist the full run history so the next append rebuilds aggregates
    # from data, not from a log re-parse
    camp["raw_runs"] = {str(n): runs[n] for n in (n_small, n_big)}

    with open(cpath, "w") as fh:
        json.dump(camp, fh, indent=1)
    print(
        f"appended: repeats={camp['repeats']} small_all="
        f"{camp['pipeline_secs_small_all']} big_all="
        f"{camp['pipeline_secs_big_all']} eff={camp['scaling_efficiency']}"
        f" stage_sum_eff={camp['scaling_efficiency_stage_sum']}"
    )
    subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "finalize_scaling.py")],
        check=True,
    )


if __name__ == "__main__":
    main()
