"""Noop-sink isolation bench (guide §1.4): times each declared entry query
by computing every column of every row into the built-in noop data source,
so the measurement excludes toPandas()/count() artifacts and the driver.
Separate from the FROZEN bench.py on purpose -- this file's numbers feed
OPTIMIZATION_r06.md, not the driver's round measurement.

Usage:
    python bench_extra.py [sf_dir] [repeats] [q1,q2,...]
Env: SPARK_GRAFT_CPUS (default 32).
Prints one JSON line: {"queries": {name: [secs...]}, "min": {...}}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DEFAULT_QUERIES = [
    "dup_pairs_jaccard",
    "idf_jaccard_topk",
    "text_stats",
    "knn_cosine_topk",
    "dup_clusters",
    "assemble_events",
    "containment_pairs",
    "containment_mid",
    "idf_jaccard_pruned",
    "minhash_lsh_candidates",
    "simhash_pairs",
    "levenshtein_verify",
    "srp_embedding_near_dups",
    "word_count_vectors",
    "quality_lang",
    "exact_dup_groups",
    "normalize",
    "ngram_doc_freq",
    "word_idf",
    "group_argmax_unique",
    "grouped_topk",
]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    names = sys.argv[3].split(",") if len(sys.argv) > 3 else DEFAULT_QUERIES
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")

    import __spark_entry__ as entry
    from dedup.session import get_spark
    from dedup.tracking import drain_tracked

    spark = get_spark("bench-extra", master=f"local[{cpus}]", config=entry.CFG)
    spark.sparkContext.setLogLevel("ERROR")

    qs = entry.queries()
    out: dict[str, list[float]] = {}
    for name in names:
        fn = qs[name]
        times = []
        for i in range(repeats):
            spark.sparkContext.setJobDescription(f"{name}#{i}")
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times.append(round(time.time() - t0, 3))
            drain_tracked()
            spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(None)
        out[name] = times
        print(f"# {name}: {times}", file=sys.stderr)
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "cpus": int(cpus),
                "queries": out,
                "min": {k: min(v) for k, v in out.items()},
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
