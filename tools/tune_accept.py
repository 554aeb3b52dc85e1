"""Grid-search the deterministic tier-4 acceptance thresholds on the
reference's example TRAIN split (never the test split).

Computes the cascade's pair-feature table ONCE on Spark (tiers 1-2 + the
exact ratio/score features via dedup.operators.match.cascade_pair_features,
with the deletion gate widened to the lowest floor in the grid), then
replays tiers 3/4a/4b in pandas on the driver for every grid point --
the feature table is ~|queries| * top_n rows, trivially driver-sized, and
replaying there avoids ~100 Spark jobs.

Metric: the reference's custom error = incorrectly_not_found +
5 * incorrectly_matched (/root/reference/doppelspeller/cli.py:86-132).

Usage: python tools/tune_accept.py [cpus]   -> prints the grid, best point
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pandas as pd

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

EXAMPLE = "/root/reference/example_dataset"
TRAIN_MAPPING = [
    ("query_id", ("train_index", "long")),
    ("title", ("name", "string")),
]
TRAIN_ACTUALS = [
    ("query_id", ("train_index", "long")),
    ("expected_title_id", ("company_id", "long")),
]


def _unique_argmax(df: pd.DataFrame, key: str) -> pd.DataFrame:
    """Per query_id: (max(key), whether the argmax row is unique, its
    title_id) -- vectorized (no per-group Python loop)."""
    mx = df.groupby("query_id")[key].transform("max")
    top = df[df[key] == mx]
    cnt = top.groupby("query_id")["title_id"].transform("size")
    out = top[cnt == 1][["query_id", "title_id", key]].rename(
        columns={key: "mx", "title_id": "win"}
    )
    ties = top[cnt > 1][["query_id"]].drop_duplicates()
    return out, set(ties["query_id"])


class Replayer:
    """Precomputes the grid-independent structure (tier 3 winners, per-query
    ratio argmax, per-floor score argmax) so each grid point is a handful of
    vectorized filters. Mirrors match_titles' tiers 3 -> 4a -> 4b exactly:
    staged chain > thr with unique argmax, ratio acceptance >= t4, score
    acceptance >= s4 at ratio floor (4b runs on queries 4a left)."""

    def __init__(self, pairs, exact, actual, thr, floors):
        self.actual = actual
        self.exact_pred = dict(zip(exact["query_id"], exact["title_id"]))
        p = pairs[~pairs["query_id"].isin(self.exact_pred.keys())].copy()
        p["staged"] = np.where(
            p["del_ratio"] < thr,
            0,
            np.where(p["lev"] > thr, p["lev"], p["tsort"]),
        )
        t3 = p[p["staged"] > thr]
        w3, _ = _unique_argmax(t3, "staged")
        self.t3_pred = dict(zip(w3["query_id"], w3["win"]))

        p4 = p[~p["query_id"].isin(self.t3_pred.keys())].copy()
        p4["r"] = np.maximum(p4["lev"], p4["tsort"])
        self.w4, _ = _unique_argmax(p4, "r")  # (query_id, win, mx=r_max)
        self.w5 = {}
        for f in floors:
            pf = p4[p4["r"] >= f]
            wf, _ = _unique_argmax(pf, "score")
            self.w5[f] = wf  # (query_id, win, mx=score_max)

    def run(self, t4: int, s4: float | None, floor: int | None) -> dict:
        pred = dict(self.exact_pred)
        pred.update(self.t3_pred)
        a4 = self.w4[(self.w4["mx"] >= t4) & ~self.w4["query_id"].isin(pred)]
        pred.update(dict(zip(a4["query_id"], a4["win"])))
        if s4:
            wf = self.w5[floor]
            a5 = wf[(wf["mx"] >= s4) & ~wf["query_id"].isin(pred)]
            pred.update(dict(zip(a5["query_id"], a5["win"])))
        got = np.array([pred.get(q, -1) for q in self.actual.index])
        exp = self.actual.values
        cm = int(((got == exp) & (exp != -1)).sum())
        im = int(((got != exp) & (got != -1)).sum())
        cnf = int(((got == -1) & (exp == -1)).sum())
        inf_ = int(((got == -1) & (exp != -1)).sum())
        return {
            "correctly_matched": cm,
            "incorrectly_matched": im,
            "correctly_not_found": cnf,
            "incorrectly_not_found": inf_,
            "custom_error": inf_ + 5 * im,
        }


def main():
    cpus = sys.argv[1] if len(sys.argv) > 1 else os.environ.get("SPARK_GRAFT_CPUS", "32")

    from dedup.config import DEFAULT_CONFIG
    from dedup.io import TRUTH_MAPPING, read_titles_csv
    from dedup.operators.match import cascade_pair_features
    from dedup.session import get_spark

    floors = [60, 70, 80]
    config = DEFAULT_CONFIG.with_(
        shuffle_partitions=max(int(cpus) * 2, 8),
        conv_partitions=max(int(cpus) * 2, 8),
        gram_df_cutoff=300,
        # widen the pair gate to the lowest floor in the grid so every
        # grid point sees EXACT ratios (cascade_pair_features bands at it)
        match_accept_score=0.5,
        match_accept_score_ratio_floor=min(floors),
    )
    spark = get_spark("tune-accept", master=f"local[{cpus}]", config=config)
    spark.sparkContext.setLogLevel("ERROR")

    truth = read_titles_csv(spark, f"{EXAMPLE}/example_truth.csv.gz", TRUTH_MAPPING)
    queries = read_titles_csv(spark, f"{EXAMPLE}/example_train.csv.gz", TRAIN_MAPPING)
    actuals = read_titles_csv(
        spark, f"{EXAMPLE}/example_train.csv.gz", TRAIN_ACTUALS
    ).toPandas()
    actual = actuals.set_index("query_id")["expected_title_id"]

    _, exact_df, pairs_df = cascade_pair_features(queries, truth, config)
    exact = exact_df.select("query_id", "title_id").toPandas()
    pairs = pairs_df.toPandas()
    print(f"features: {len(pairs)} pairs, {len(exact)} exact", file=sys.stderr)

    thr = config.lev_threshold
    rp = Replayer(pairs, exact, actual, thr, floors)
    results = []
    # baseline: tiers 1-4a only (current shipped config)
    base = rp.run(90, None, None)
    results.append({"t4": 90, "s4": None, "floor": None, **base})
    print(f"baseline 4a-only: {base}", file=sys.stderr)

    for t4 in (88, 90, 92):
        for s4 in (0.35, 0.4, 0.45, 0.5, 0.55, 0.6, 0.65):
            for floor in floors:
                acc = rp.run(t4, s4, floor)
                results.append({"t4": t4, "s4": s4, "floor": floor, **acc})

    results.sort(key=lambda r: r["custom_error"])
    for r in results[:15]:
        print(json.dumps(r), file=sys.stderr)
    best = results[0]
    with open(os.path.join(ROOT, "TUNE_ACCEPT.json"), "w") as fh:
        json.dump({"train_grid_top": results[:15], "best": best}, fh, indent=1)
    print(json.dumps(best))
    spark.stop()


if __name__ == "__main__":
    main()
