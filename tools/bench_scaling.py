"""Scaling-efficiency evidence (BASELINE.json two-cluster-size criterion,
sandbox proxy): run the identical dedup pipeline at local[N] and local[4N]
on the same input in separate JVMs, report throughput at both plus
efficiency = (T_N / T_4N) / 4.

Usage: python tools/bench_scaling.py [n_small] [sf_dir]
Writes BENCH_SCALING.json at the repo root.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_once(cpus: int, sf_dir: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus), SPARK_GRAFT_SF_DIR=sf_dir)
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        check=True,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main():
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    n_big = n_small * 4
    small = run_once(n_small, sf_dir)
    big = run_once(n_big, sf_dir)
    t_small = small["queries"]["pipeline_dedup"]
    t_big = big["queries"]["pipeline_dedup"]
    speedup = t_small / t_big
    efficiency = speedup / 4
    result = {
        "n_small": n_small,
        "n_big": n_big,
        "pipeline_secs_small": t_small,
        "pipeline_secs_big": t_big,
        "turns_per_sec_small": small["extras"]["turns_per_sec"],
        "turns_per_sec_big": big["extras"]["turns_per_sec"],
        "speedup": round(speedup, 3),
        "scaling_efficiency": round(efficiency, 3),
        "total_secs_small": small["value"],
        "total_secs_big": big["value"],
        "sf_dir": sf_dir,
    }
    with open(os.path.join(ROOT, "BENCH_SCALING.json"), "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
