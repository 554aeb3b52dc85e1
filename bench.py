"""Benchmark harness. Runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Headline work:
  * pipeline_dedup -- the full transcript dedup pipeline (assemble ->
    prepare -> exact -> LSH -> verify -> cluster, with checkpoint writes)
    on a deterministic synthetic corpus sized by sf; also reports
    turns_per_sec, the BASELINE.json throughput metric.
  * documents-corpus operators (LSH+verify pair finding, IDF-Jaccard
    top-k, text stats, knn) on the driver's parquet tables.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # array-heavy operators (array_intersect, zip_with) allocate per row; a
    # single local-mode JVM running 32 task threads on a 16g heap spends a
    # large fraction of wall time in GC and stops scaling with threads --
    # give the bench the headroom a per-executor heap would have.
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)

    import __spark_entry__ as entry
    from dedup.config import DedupConfig
    from dedup.generate import make_corpus
    from dedup.pipeline import run_pipeline
    from dedup.session import get_spark

    config = DedupConfig(
        shuffle_partitions=max(int(cpus) * 2, 8),
        conv_partitions=max(int(cpus) * 2, 8),
    )
    # SPARK_GRAFT_MASTER overrides (e.g. local-cluster[8,4,12288] -- real
    # per-executor JVMs, the honest scaling-measurement topology)
    master = os.environ.get("SPARK_GRAFT_MASTER") or f"local[{cpus}]"
    spark = get_spark("bench", master=master, config=config)
    spark.sparkContext.setLogLevel("ERROR")

    queries: dict[str, float] = {}
    extras: dict[str, float] = {}

    # ---- full dedup pipeline on a synthetic transcript corpus ----
    n_conv = int(
        os.environ.get("SPARK_GRAFT_BENCH_CONVS", max(int(20000 * sf), 200))
    )
    # Optional corpus cache: make_corpus is single-threaded driver Python
    # (~3-5 min at 24k+ conversations), pure overhead for repeated scaling
    # runs on the identical deterministic corpus. The cache is keyed by
    # (convs, seed, GENERATOR VERSION) -- the version component is a hash
    # of dedup/generate.py, so editing the generator (or a foreign process
    # squatting the world-writable /tmp path) can never silently feed a
    # stale corpus into round-over-round comparisons.
    corpus_cache = os.environ.get(
        "SPARK_GRAFT_CORPUS_CACHE", "/tmp/spark_graft_corpus_cache"
    )
    if corpus_cache:
        import hashlib

        gen_src = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "dedup", "generate.py"
        )
        with open(gen_src, "rb") as fh:
            gen_ver = hashlib.sha256(fh.read()).hexdigest()[:10]
        corpus_cache = os.path.join(corpus_cache, f"gen_{gen_ver}")
        os.makedirs(corpus_cache, exist_ok=True)
    if corpus_cache:
        path = os.path.join(corpus_cache, f"transcripts_c{n_conv}_s42")
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            corpus = make_corpus(n_conversations=n_conv, seed=42)
            spark.createDataFrame(corpus.transcripts).repartition(
                config.conv_partitions
            ).write.mode("overwrite").parquet(path)
        tdf = spark.read.parquet(path).cache()
        n_turns = tdf.count()
    else:
        corpus = make_corpus(n_conversations=n_conv, seed=42)
        n_turns = len(corpus.transcripts)
        tdf = spark.createDataFrame(corpus.transcripts).cache()
        tdf.count()
    # best-of-N with a fresh warehouse per run (default 2, like the
    # operator queries): single-shot pipeline timings on this shared host
    # swing 1.5-2x (r4's 81.6s single run was contradicted by its own 4x
    # probe), so the headline must not be hostage to one noisy run. All
    # runs are reported (pipeline_dedup_all) so the spread stays visible.
    pipe_repeats = int(os.environ.get("SPARK_GRAFT_BENCH_PIPE_REPEATS", "2"))
    pipe_all: list[float] = []
    best_secs, best_report = None, None
    for _ in range(pipe_repeats):
        wh = tempfile.mkdtemp(prefix="bench_wh_")
        t0 = time.time()
        report = run_pipeline(spark, tdf, wh, config)
        run_secs = time.time() - t0
        pipe_all.append(round(run_secs, 3))
        if best_secs is None or run_secs < best_secs:
            best_secs, best_report = run_secs, report
        shutil.rmtree(wh, ignore_errors=True)
        spark.catalog.clearCache()
    secs, report = best_secs, best_report
    queries["pipeline_dedup"] = round(secs, 3)
    extras["pipeline_dedup_all"] = pipe_all
    extras["turns"] = n_turns
    extras["turns_per_sec"] = round(n_turns / secs, 1)
    # per-stage seconds: the evidence trail for the scaling-efficiency
    # analysis (which stage stops scaling with cores) -- build-time per
    # stage, measured by the checkpoint catalog (best run's stages).
    extras["pipeline_stages"] = {
        s.table: round(s.seconds, 3) for s in report.stages
    }
    # within-stage attribution: build (operator eager work) / job (the
    # parallel parquet write) / footer + commit (per-stage fixed costs) --
    # the evidence for netting the O(stages) floor out of scaling numbers.
    extras["pipeline_stage_breakdown"] = {
        s.table: s.breakdown for s in report.stages if s.breakdown
    }
    tdf.unpersist()
    spark.catalog.clearCache()

    # ---- size-scaling probe: same pipeline at 4x conversations ----
    # Tracks the throughput-vs-corpus-size trend per round (a slow mode
    # that only appears at bigger inputs -- like the r3 40k-conv verify
    # strategy flip -- shows up here a round early instead of only in the
    # dedicated scaling campaign). turns_per_sec_ratio_4x ~ 1.0 means
    # size-linear work; << 1 flags a superlinear stage.
    only_pipeline = os.environ.get("SPARK_GRAFT_BENCH_ONLY_PIPELINE") == "1"
    if not only_pipeline and os.environ.get("SPARK_GRAFT_BENCH_4X", "1") == "1":
        n4 = n_conv * 4
        if corpus_cache:
            path4 = os.path.join(corpus_cache, f"transcripts_c{n4}_s42")
            if not os.path.exists(os.path.join(path4, "_SUCCESS")):
                c4 = make_corpus(n_conversations=n4, seed=42)
                spark.createDataFrame(c4.transcripts).repartition(
                    config.conv_partitions
                ).write.mode("overwrite").parquet(path4)
            tdf4 = spark.read.parquet(path4).cache()
            n_turns4 = tdf4.count()
        else:
            c4 = make_corpus(n_conversations=n4, seed=42)
            n_turns4 = len(c4.transcripts)
            tdf4 = spark.createDataFrame(c4.transcripts).cache()
            tdf4.count()
        wh4 = tempfile.mkdtemp(prefix="bench_wh4_")
        t0 = time.time()
        report4 = run_pipeline(spark, tdf4, wh4, config)
        secs4 = time.time() - t0
        # extras, NOT queries: the headline total must stay definitionally
        # comparable round-over-round (r1-r3 totals exclude any 4x run);
        # the probe's deliverable is the throughput RATIO, not wall time.
        extras["pipeline_dedup_4x_secs"] = round(secs4, 3)
        extras["turns_4x"] = n_turns4
        extras["turns_per_sec_4x"] = round(n_turns4 / secs4, 1)
        extras["turns_per_sec_ratio_4x"] = round(
            (n_turns4 / secs4) / (n_turns / secs), 3
        )
        extras["pipeline_stages_4x"] = {
            s.table: round(s.seconds, 3) for s in report4.stages
        }
        shutil.rmtree(wh4, ignore_errors=True)
        tdf4.unpersist()
        spark.catalog.clearCache()

    # ---- operator benchmarks on driver tables ----
    # best-of-2 per query with a cache drain between runs: single-shot
    # timings on this shared host swing 1.5-4x (r2's dup_clusters recorded
    # 161s vs 42s fresh), and accumulated cache blocks from earlier queries
    # starve later ones. drain_tracked() inside each entry query releases
    # the previous query's caches; clearCache() sweeps anything else.
    from dedup.tracking import drain_tracked

    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "2"))
    for name in [] if only_pipeline else [
        "dup_pairs_jaccard",
        "idf_jaccard_topk",
        "text_stats",
        "knn_cosine_topk",
        "dup_clusters",
        "assemble_events",
    ]:
        fn = entry.queries()[name]
        best, n = None, 0
        for _ in range(repeats):
            t0 = time.time()
            n = fn(spark, sf_dir).count()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
            drain_tracked()
            spark.catalog.clearCache()
        queries[name] = round(best, 3)
        extras[f"{name}_rows"] = n

    total = round(sum(queries.values()), 3)
    print(
        json.dumps(
            {
                "metric": "dedup_pipeline_and_operators_total",
                "value": total,
                "unit": "sec",
                "queries": queries,
                "sf": sf,
                "cpus": int(cpus),
                "extras": extras,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
