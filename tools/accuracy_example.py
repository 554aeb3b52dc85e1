"""Run the title-matching cascade on the reference's shipped example
dataset (30k truth titles, 10k misspelled queries) and score it with the
reference's own accuracy buckets, writing ACCURACY.json at the repo root.

Reference harness: get-predictions-accuracy
(/root/reference/doppelspeller/cli.py:86-132); its published numbers for
this dataset (/root/reference/README.md:62-68):
  correctly_matched=5929  incorrectly_matched=114
  correctly_not_found=3894  incorrectly_not_found=63  custom_error=633
The reference's final tier is an XGBoost re-ranker; this engine replaces it
with the deterministic verify stack (BASELINE.json north_rule), so the
expected trade is: fewer incorrect matches (the deterministic chain only
accepts ratio > 94) at the cost of more not-found misses on heavy
misspellings only the model tier could accept.

Usage: python tools/accuracy_example.py [cpus]
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

EXAMPLE = "/root/reference/example_dataset"
GOLDEN = {
    "correctly_matched": 5929,
    "incorrectly_matched": 114,
    "correctly_not_found": 3894,
    "incorrectly_not_found": 63,
    "custom_error": 63 + 5 * 114,
}


def main():
    cpus = sys.argv[1] if len(sys.argv) > 1 else os.environ.get("SPARK_GRAFT_CPUS", "32")

    from dedup.config import DEFAULT_CONFIG
    from dedup.io import TEST_MAPPING, TRUTH_MAPPING, read_titles_csv
    from dedup.operators.evaluate import prediction_accuracy
    from dedup.operators.match import match_titles
    from dedup.session import get_spark

    config = DEFAULT_CONFIG.with_(
        shuffle_partitions=max(int(cpus) * 2, 8),
        conv_partitions=max(int(cpus) * 2, 8),
        # stop-gram pruned candidate generation (exact rescoring): cuts the
        # tier-2 gram join from 267M to ~10M rows on this dataset; misses
        # only queries sharing no df<=300 gram with their title (3/10000
        # measured on the train split).
        gram_df_cutoff=300,
    )
    spark = get_spark("accuracy-example", master=f"local[{cpus}]", config=config)
    spark.sparkContext.setLogLevel("ERROR")

    truth = read_titles_csv(spark, f"{EXAMPLE}/example_truth.csv.gz", TRUTH_MAPPING)
    queries = read_titles_csv(spark, f"{EXAMPLE}/example_test.csv.gz", TEST_MAPPING)
    actuals = read_titles_csv(
        spark,
        f"{EXAMPLE}/example_test_with_actuals.csv.gz",
        [("query_id", ("test_index", "long")), ("expected_title_id", ("company_id", "long"))],
    )

    t0 = time.time()
    preds = match_titles(queries, truth, config).localCheckpoint()
    n = preds.count()
    secs = time.time() - t0

    acc = prediction_accuracy(preds, actuals).asDict()
    tiers = {r["tier"]: r["cnt"] for r in preds.groupBy("tier").count().withColumnRenamed("count", "cnt").collect()}
    result = {
        "dataset": EXAMPLE,
        "queries": n,
        "truth_titles": truth.count(),
        "seconds": round(secs, 2),
        "matches_per_sec": round(n / secs, 1),
        "accuracy": acc,
        "tiers": tiers,
        "reference_golden": GOLDEN,
        "delta_vs_reference": {k: acc[k] - v for k, v in GOLDEN.items()},
        "cpus": int(cpus),
    }
    with open(os.path.join(ROOT, "ACCURACY.json"), "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
