"""Close the verified_pairs bimodal-slow-mode case (VERDICT r4 #2): run
the verify stage's actual CPU work -- narrow sketch comparison, exact
gram-set Jaccard, bigram-bounded Levenshtein DP -- as a BARE
multiprocessing job (no Spark, no JVM, no shuffle) over the real
candidate set of a given corpus, at 4 vs 16 workers, INTERLEAVED with
runs of the real Spark verify stage on the same checkpointed inputs.

Interpretation matrix:
  * bare probe bimodal/slow at 16 too      -> host-level degradation; the
    Spark gate is argued on best-of (documented).
  * bare probe clean, Spark stage bimodal  -> plan/Spark issue: suspects
    are Python-worker churn across localCheckpoint barriers,
    lev_partitions vs cores, shuffle-partition count.

Usage:
  python tools/probe_verify_mp.py [convs=40000] [repeats=3]
Writes artifacts/probe_verify_mp_<convs>.json and prints one JSON line.

The warehouse under /tmp/probe_vfy_wh_<convs> persists (resume makes
repeat invocations cheap); stage tables come from the production pipeline
so the pair population is the real one, not a synthetic stand-in.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

# fork-inherited read-only data for worker processes
_DOCS: dict = {}
_PAIRS: list = []


def _prepare_inputs(convs: int) -> str:
    """Run the pipeline through candidate_pairs (resumable) and return the
    warehouse path. Uses the same corpus cache as bench.py."""
    wh = f"/tmp/probe_vfy_wh_{convs}"
    if os.path.exists(os.path.join(wh, "candidate_pairs", "_MANIFEST.json")):
        return wh
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS="16",
        SPARK_DRIVER_MEMORY="48g",
    )
    code = f"""
import os
from dedup.session import get_spark
from dedup.config import DedupConfig
from dedup.generate import make_corpus
from dedup.pipeline import run_pipeline
cfg = DedupConfig(shuffle_partitions=32, conv_partitions=32)
spark = get_spark('probe_prep', master='local[16]', config=cfg)
spark.sparkContext.setLogLevel('ERROR')
corpus = make_corpus(n_conversations={convs}, seed=42)
tdf = spark.createDataFrame(corpus.transcripts)
run_pipeline(spark, tdf, {wh!r}, cfg)
spark.stop()
"""
    subprocess.run([sys.executable, "-c", code], env=env, check=True)
    return wh


def _load(wh: str):
    """Warehouse parquet -> in-memory numpy structures (no Spark)."""
    import numpy as np
    import pyarrow.dataset as ds

    prep = ds.dataset(
        os.path.join(wh, "prepared"), format="parquet"
    ).to_table(columns=["doc_id", "norm_text", "gram_hashes", "minhash", "simhash"])
    ids = prep["doc_id"].to_pylist()
    idx = {d: i for i, d in enumerate(ids)}
    docs = {
        "text": prep["norm_text"].to_pylist(),
        "grams": [np.sort(np.asarray(g, dtype=np.int64)) for g in prep["gram_hashes"].to_pylist()],
        "mh": np.stack([np.asarray(m, dtype=np.int64) for m in prep["minhash"].to_pylist()]),
        "sh": np.asarray(prep["simhash"].to_pylist(), dtype=np.int64),
    }
    docs["len"] = np.asarray([len(t) for t in docs["text"]], dtype=np.int64)
    cands = ds.dataset(
        os.path.join(wh, "candidate_pairs"), format="parquet"
    ).to_table(columns=["id_a", "id_b"])
    pairs = [
        (idx[a], idx[b])
        for a, b in zip(cands["id_a"].to_pylist(), cands["id_b"].to_pylist())
        if a in idx and b in idx
    ]
    return docs, pairs


def _verify_chunk(span: tuple[int, int]) -> dict:
    """The verify cascade's per-pair CPU work, mirroring
    dedup/operators/verify.py gates: minhash estimate -> simhash hamming
    -> deletion-ratio -> exact Jaccard for estimate survivors -> staged
    Levenshtein DP for the rest."""
    import numpy as np

    from dedup.config import DEFAULT_CONFIG as cfg
    from dedup.functions.similarity import staged_ratio_py
    from dedup.operators.verify import jaccard_gate_threshold

    gate = jaccard_gate_threshold(cfg)
    thr = cfg.lev_threshold
    mh, sh, ln = _DOCS["mh"], _DOCS["sh"], _DOCS["len"]
    grams, texts = _DOCS["grams"], _DOCS["text"]
    lo, hi = span
    n_jac = n_lev = n_pass = 0
    for ia, ib in _PAIRS[lo:hi]:
        est = float(np.mean(mh[ia] == mh[ib]))
        ham = int(sh[ia] ^ sh[ib]).bit_count()
        la, lb = int(ln[ia]), int(ln[ib])
        tot = la + lb
        del_ratio = 100.0 if tot == 0 else (tot - abs(la - lb)) / tot * 100.0
        jac = 0.0
        if est >= gate:
            inter = len(np.intersect1d(grams[ia], grams[ib], assume_unique=True))
            union = len(grams[ia]) + len(grams[ib]) - inter
            jac = inter / union if union else 0.0
            n_jac += 1
        if jac >= cfg.jaccard_threshold or ham <= cfg.simhash_hamming_threshold:
            n_pass += 1
            continue
        if del_ratio >= thr and est >= cfg.lev_est_gate:
            n_lev += 1
            if staged_ratio_py(texts[ia], texts[ib], thr) > thr:
                n_pass += 1
    return {"jac": n_jac, "lev": n_lev, "passed": n_pass}


def _bare_run(procs: int) -> dict:
    n = len(_PAIRS)
    chunks = 4 * procs
    spans = [
        ((k * n) // chunks, ((k + 1) * n) // chunks) for k in range(chunks)
    ]
    t0 = time.time()
    with mp.Pool(procs) as pool:
        parts = pool.map(_verify_chunk, spans)
    dt = time.time() - t0
    agg = {k: sum(p[k] for p in parts) for k in parts[0]}
    return {"procs": procs, "secs": round(dt, 2), "pairs_per_sec": round(n / dt, 1), **agg}


def _spark_stage_run(wh: str, procs: int) -> dict:
    """The real Spark verify stage on the same checkpointed inputs, in a
    fresh JVM at local[procs] (per-core heap, same as the campaigns)."""
    env = dict(os.environ, SPARK_DRIVER_MEMORY=f"{3 * procs}g")
    code = f"""
import json, time
from dedup.session import get_spark
from dedup.config import DedupConfig
from dedup.operators.verify import verify_pairs
cfg = DedupConfig(shuffle_partitions={2 * procs}, conv_partitions={2 * procs})
spark = get_spark('probe_vfy', master='local[{procs}]', config=cfg)
spark.sparkContext.setLogLevel('ERROR')
prepared = spark.read.parquet({wh!r} + '/prepared')
cands = spark.read.parquet({wh!r} + '/candidate_pairs')
t0 = time.time()
n = verify_pairs(cands, prepared, cfg).count()
print('RESULT ' + json.dumps({{'secs': round(time.time() - t0, 2), 'rows': n}}))
spark.stop()
"""
    out = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True, text=True, check=True
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("RESULT ")][-1]
    return {"procs": procs, **json.loads(line[len("RESULT "):])}


def main():
    global _DOCS, _PAIRS
    convs = int(sys.argv[1]) if len(sys.argv) > 1 else 40000
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    wh = _prepare_inputs(convs)
    _DOCS, _PAIRS = _load(wh)
    result = {
        "convs": convs,
        "n_pairs": len(_PAIRS),
        "repeats": repeats,
        "bare": {"4": [], "16": []},
        "spark_stage": {"4": [], "16": []},
    }
    # interleave bare and Spark runs at both levels within each repeat so
    # a drifting host hits all four measurement kinds in every window
    for r in range(repeats):
        for procs in (4, 16):
            b = _bare_run(procs)
            result["bare"][str(procs)].append(b)
            s = _spark_stage_run(wh, procs)
            result["spark_stage"][str(procs)].append(s)
            print(
                f"repeat {r} procs {procs}: bare {b['secs']}s "
                f"({b['pairs_per_sec']}/s), spark stage {s['secs']}s",
                file=sys.stderr,
                flush=True,
            )
    for kind in ("bare", "spark_stage"):
        t4 = min(x["secs"] for x in result[kind]["4"])
        t16 = min(x["secs"] for x in result[kind]["16"])
        result[f"{kind}_best_4"] = t4
        result[f"{kind}_best_16"] = t16
        result[f"{kind}_efficiency_4_to_16"] = round(t4 / t16 / 4.0, 3)
        all16 = [x["secs"] for x in result[kind]["16"]]
        result[f"{kind}_spread_16"] = [min(all16), max(all16)]
    dst = os.path.join(ROOT, "artifacts", f"probe_verify_mp_{convs}.json")
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    with open(dst, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
