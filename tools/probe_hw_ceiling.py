"""Hardware-ceiling attribution probe: run the pipeline's two hottest
Python kernels OUTSIDE Spark, in P concurrent processes, and report
aggregate throughput at each P. If per-core throughput decays as P grows
toward the machine's core count, the decay is a property of this host
(one memory controller shared by 32 cores), not of the Spark plan -- the
evidence that separates "the job would scale on a real cluster, where
every node brings its own DRAM" from "the plan serializes".

Kernels probed:
  * MinHash signature kernel (dedup/functions/sketch.py): mulmod + segment
    min over a 512k-gram chunk -- streaming numpy, bandwidth-hungry.
  * Staged Levenshtein ratio (dedup/functions/similarity.py): bit-parallel
    LCS / banded DP on ~1.5k-char near-dup pairs -- cache-resident CPU.

Usage: python tools/probe_hw_ceiling.py   -> one JSON line
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def minhash_work(n_rounds: int) -> int:
    import numpy as np

    from dedup.config import DEFAULT_CONFIG
    from dedup.functions.sketch import _MINHASH_CHUNK_GRAMS, _mulmod_p, _to_field

    rng = np.random.RandomState(os.getpid() % 1000)
    total = 512_000
    x_full = _to_field(rng.randint(-(2**63), 2**63, size=total, dtype=np.int64))
    a_params, b_params = DEFAULT_CONFIG.perm_params()
    p = np.uint64((1 << 61) - 1)
    # CHUNKED exactly like the production kernel (cache-resident working
    # set; the whole point of the probe is to measure what the pipeline's
    # actual inner loop can extract from this host's cores)
    for _ in range(n_rounds):
        for s in range(0, total, _MINHASH_CHUNK_GRAMS):
            x = x_full[s : s + _MINHASH_CHUNK_GRAMS]
            work = np.empty((3, len(x)), dtype=np.uint64)
            offsets = np.arange(0, len(x), 2000, dtype=np.int64)
            for i in range(DEFAULT_CONFIG.num_perm):
                h = _mulmod_p(np.uint64(a_params[i]), x, work)
                np.add(h, b_params[i], out=h)
                np.subtract(h, p, out=work[1])
                np.minimum(h, work[1], out=h)
                np.minimum.reduceat(h, offsets)
    return n_rounds * total * DEFAULT_CONFIG.num_perm  # gram-perm ops


def lev_work(n_pairs: int) -> int:
    import random

    from dedup.functions.similarity import staged_ratio_py

    rng = random.Random(os.getpid() % 1000)
    base = "".join(rng.choice("abcdefgh ") for _ in range(1500))
    # near-dup partner: delete a 40-char chunk (forces real DP work)
    other = base[:700] + base[740:]
    for _ in range(n_pairs):
        staged_ratio_py(base, other, 94)
    return n_pairs


def measure(fn, arg, procs: int) -> float:
    """aggregate work units per second with `procs` concurrent processes"""
    with mp.Pool(procs) as pool:
        t0 = time.time()
        results = pool.map(fn, [arg] * procs)
        dt = time.time() - t0
    return sum(results) / dt


def main():
    out = {"cores": os.cpu_count()}
    for name, fn, arg in (
        ("minhash_gramperm_per_s", minhash_work, 3),
        ("lev_pairs_per_s", lev_work, 300),
    ):
        per_p = {}
        for procs in (1, 4, 8, 16, 32):
            tput = measure(fn, arg, procs)
            per_p[str(procs)] = round(tput, 1)
        base = per_p["1"]
        out[name] = per_p
        out[name + "_efficiency_vs_1"] = {
            p: round(v / (base * int(p)), 3) for p, v in per_p.items()
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
