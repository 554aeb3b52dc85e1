"""No-Spark host probe: how far does MEMORY-BANDWIDTH-shaped work scale
from 4 to 16 processes on this machine?

The compute kernels' ceiling is already documented (probe_hw_ceiling.py:
MinHash permutations scale 0.85-1.03 at 4->16 procs). But after the r5
plan optimizations the pipeline's residual non-scaling wall is SHUFFLE-
shaped -- serialize rows, copy buffers, hash-partition, spill -- which is
a memory-copy workload, not an ALU workload. This probe times the same
total volume of large out-of-cache numpy copies + hash mixes at 1, 4 and
16 processes: if aggregate throughput stops growing past 4 procs, the
host's memory controllers -- not the Spark plan -- bound every shuffle at
both campaign parallelism levels, and the measured pipeline scaling
efficiency must be read against THIS ceiling, the way the kernel probe
calibrates the sketch stages.

Usage: python tools/probe_membw.py [mb_per_proc=512] [repeats=3]
Writes artifacts/probe_membw.json.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def worker(mb: int, out_q) -> None:
    n = mb * 1024 * 1024 // 8
    src = np.random.randint(0, 1 << 62, size=n, dtype=np.int64)
    dst = np.empty_like(src)
    t0 = time.time()
    passes = 8
    for _ in range(passes):
        # copy + mix: the byte traffic pattern of shuffle serialization
        np.copyto(dst, src)
        dst ^= dst >> np.int64(27)
        src, dst = dst, src
    dt = time.time() - t0
    out_q.put(mb * passes * 2 / dt)  # MB moved (read+write) per second


def run_level(procs: int, mb: int) -> float:
    q = mp.Queue()
    ps = [mp.Process(target=worker, args=(mb, q)) for _ in range(procs)]
    t0 = time.time()
    for p in ps:
        p.start()
    rates = [q.get() for _ in ps]
    for p in ps:
        p.join()
    wall = time.time() - t0
    total_mb = mb * 8 * 2 * procs
    return total_mb / wall  # aggregate MB/s over the slowest-straggler wall


def main():
    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    out = {"mb_per_proc": mb, "repeats": repeats, "aggregate_mb_s": {}}
    for procs in (1, 4, 16):
        best = 0.0
        for _ in range(repeats):
            best = max(best, run_level(procs, mb))
        out["aggregate_mb_s"][str(procs)] = round(best, 1)
        print(f"{procs} procs: {best:.0f} MB/s aggregate", flush=True)
    a4 = out["aggregate_mb_s"]["4"]
    a16 = out["aggregate_mb_s"]["16"]
    out["scaling_4_to_16"] = round(a16 / a4, 3)
    out["efficiency_4_to_16"] = round(a16 / a4 / 4, 3)
    print(json.dumps(out))
    path = os.path.join(ROOT, "artifacts", "probe_membw.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
