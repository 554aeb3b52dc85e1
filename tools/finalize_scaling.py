"""Finalize the round's scaling artifact: merge the per-size campaigns
(headline = the LARGEST corpus, where the O(stages) fixed floor is most
amortized -- the direction the 10^12-turn target lives in), the no-Spark
kernel probe, the bare-multiprocessing verify probe, and smaller-size
history into BENCH_SCALING.json, then compute the derived summary numbers
the narrative cites (compute-stage efficiency with the O(stages) floor
netted out, per-stage efficiencies at every size).

Usage: python tools/finalize_scaling.py [headline.json] [secondary.json ...]
Defaults: BENCH_SCALING_100k.json headline, BENCH_SCALING_64k.json
secondary, plus any BENCH_SCALING_{40k,24k}.json present as history.
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# stages whose wall time is O(stages)/fixed-floor at these corpus sizes
# (1-5s at BOTH parallelism levels: job scheduling + AQE planning rounds +
# commit barriers, not data-proportional compute)
FLOOR_STAGES = {"assembled", "exact_groups", "clusters"}

SECONDARY_KEYS = (
    "convs", "turns", "repeats",
    "pipeline_secs_small", "pipeline_secs_big",
    "pipeline_secs_small_all", "pipeline_secs_big_all",
    "turns_per_sec_small", "turns_per_sec_big",
    "speedup", "scaling_efficiency",
    "scaling_efficiency_stage_sum", "stages",
)


def net_floor(stages: dict) -> dict:
    sm = sum(v["secs_small"] for s, v in stages.items() if s not in FLOOR_STAGES)
    bg = sum(v["secs_big"] for s, v in stages.items() if s not in FLOOR_STAGES)
    return {
        "compute_secs_small": round(sm, 3),
        "compute_secs_big": round(bg, 3),
        "compute_stage_efficiency": round(sm / bg / 4, 3) if bg else None,
    }


def main():
    headline = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        ROOT, "BENCH_SCALING_100k.json"
    )
    secondaries = sys.argv[2:] if len(sys.argv) > 2 else [
        p
        for name in ("BENCH_SCALING_64k.json",)
        if os.path.exists(p := os.path.join(ROOT, name))
    ]

    with open(headline) as fh:
        out = json.load(fh)
    out["floor_netted_headline"] = net_floor(out["stages"])

    for path in secondaries:
        with open(path) as fh:
            sec = json.load(fh)
        key = f"secondary_size_convs{sec['convs']}"
        out[key] = {k: sec[k] for k in SECONDARY_KEYS if k in sec}
        out[key + "_floor_netted"] = net_floor(sec["stages"])

    probe = os.path.join(ROOT, "artifacts", "probe_hw_now.json")
    if os.path.exists(probe):
        with open(probe) as fh:
            out["kernel_probe"] = json.load(fh)
    else:
        print(f"WARNING: kernel probe missing at {probe}", file=sys.stderr)

    vps = sorted(
        f
        for f in os.listdir(os.path.join(ROOT, "artifacts"))
        if f.startswith("probe_verify_mp_")
    )
    if vps:
        with open(os.path.join(ROOT, "artifacts", vps[-1])) as fh:
            vp = json.load(fh)
        out["verify_mp_probe"] = {
            k: vp[k]
            for k in (
                "convs", "n_pairs", "repeats",
                "bare_best_4", "bare_best_16", "bare_efficiency_4_to_16",
                "bare_spread_16",
                "spark_stage_best_4", "spark_stage_best_16",
                "spark_stage_efficiency_4_to_16", "spark_stage_spread_16",
            )
            if k in vp
        }

    # smaller-size history (round-4 artifacts, pre-r5 plan changes) --
    # kept as the efficiency-vs-size trend line, clearly labeled
    history = {}
    for name, label in (
        ("BENCH_SCALING_40k.json", "convs40000_r4_code"),
        ("BENCH_SCALING_24k.json", "convs24000_r4_code"),
    ):
        p = os.path.join(ROOT, name)
        if os.path.exists(p):
            with open(p) as fh:
                d = json.load(fh)
            history[label] = {
                "scaling_efficiency": d.get("scaling_efficiency"),
                "repeats": d.get("repeats"),
                "pipeline_secs_small_all": d.get("pipeline_secs_small_all"),
                "pipeline_secs_big_all": d.get("pipeline_secs_big_all"),
            }
    if history:
        out["smaller_size_history"] = history

    # executor-topology probe (local-cluster[1,4] vs [4,4] -- real
    # per-executor JVMs + loopback shuffle): kept as disclosed context for
    # which stages pay cross-executor serialization on one host
    cprobe = os.path.join(ROOT, "artifacts", "cluster_mode_probe_64k.json")
    if os.path.exists(cprobe):
        with open(cprobe) as fh:
            cp = json.load(fh)
        out["cluster_mode_probe"] = {
            k: cp[k]
            for k in (
                "mode", "topology_small", "topology_big", "convs", "repeats",
                "pipeline_secs_small", "pipeline_secs_big",
                "scaling_efficiency", "stages",
            )
            if k in cp
        }

    weak = os.path.join(ROOT, "BENCH_WEAK_SCALING.json")
    if os.path.exists(weak):
        with open(weak) as fh:
            out["weak_scaling"] = json.load(fh)

    notes = os.path.join(ROOT, "artifacts", "scaling_notes.txt")
    if os.path.exists(notes):
        with open(notes) as fh:
            out["notes"] = fh.read().strip()

    dst = os.path.join(ROOT, "BENCH_SCALING.json")
    with open(dst, "w") as fh:
        json.dump(out, fh, indent=1)

    print("headline:", out.get("convs"), "convs, efficiency",
          out["scaling_efficiency"], "stage_sum",
          out.get("scaling_efficiency_stage_sum"))
    print("floor-netted:", out["floor_netted_headline"])
    for k in sorted(out):
        if k.startswith("secondary_size_convs") and not k.endswith("_floor_netted"):
            print(k, "efficiency", out[k]["scaling_efficiency"],
                  "stage_sum", out[k].get("scaling_efficiency_stage_sum"))
    print("stages (headline):")
    for st, v in out["stages"].items():
        print("  ", st, v)


if __name__ == "__main__":
    main()
