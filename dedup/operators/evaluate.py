"""Accuracy harness: confusion matrix + the reference's custom error
metric (FN_like + 5 * FP_like).

Reference: ``get-predictions-accuracy``
(/root/reference/doppelspeller/cli.py:86-132) joins predictions against
actuals and buckets into correctly/incorrectly matched and
correctly/incorrectly not-found; custom error = incorrect_not_found +
FALSE_POSITIVE_PENALTY_FACTOR * incorrect_matched (cli.py:128-129,
settings.py:77; same metric numba'd for training at train.py:17-29).

One distributed agg -- SURVEY.md A6/A7.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row
import pyspark.sql.functions as F

NOT_FOUND = -1
FALSE_POSITIVE_PENALTY_FACTOR = 5  # reference settings.py:77


def prediction_accuracy(
    predictions: DataFrame,
    actuals: DataFrame,
    penalty: int = FALSE_POSITIVE_PENALTY_FACTOR,
) -> Row:
    """predictions: (query_id, title_id); actuals: (query_id,
    expected_title_id). Returns one row of confusion counts + custom_error.

    Bucket semantics follow the reference exactly (cli.py:107-126):
      correctly_matched      pred != -1 and pred == expected
      incorrectly_matched    pred != -1 and pred != expected  (FP-like)
      correctly_not_found    pred == -1 and expected == -1
      incorrectly_not_found  pred == -1 and expected != -1    (FN-like)
    """
    joined = predictions.select("query_id", "title_id").join(
        actuals.select("query_id", "expected_title_id"), "query_id", "inner"
    )
    pred, exp = F.col("title_id"), F.col("expected_title_id")
    agg = joined.agg(
        F.count(F.lit(1)).alias("total"),
        F.sum(((pred != NOT_FOUND) & (pred == exp)).cast("long")).alias(
            "correctly_matched"
        ),
        F.sum(((pred != NOT_FOUND) & (pred != exp)).cast("long")).alias(
            "incorrectly_matched"
        ),
        F.sum(((pred == NOT_FOUND) & (exp == NOT_FOUND)).cast("long")).alias(
            "correctly_not_found"
        ),
        F.sum(((pred == NOT_FOUND) & (exp != NOT_FOUND)).cast("long")).alias(
            "incorrectly_not_found"
        ),
    ).withColumn(
        "custom_error",
        F.col("incorrectly_not_found") + penalty * F.col("incorrectly_matched"),
    )
    return agg.first()


def dup_pair_metrics(
    truth_clusters: DataFrame, got_clusters: DataFrame, id_col: str = "conv_id"
) -> Row:
    """Distributed dup-pair recall/precision: same-cluster unordered pairs
    from each side via self-joins (never collected to the driver -- the
    pytest-scale pandas version lives in tests)."""

    def pairs(df: DataFrame, cl: str) -> DataFrame:
        a = df.select(F.col(id_col).alias("id_a"), F.col(cl).alias("c"))
        b = df.select(F.col(id_col).alias("id_b"), F.col(cl).alias("c"))
        return (
            a.join(b, "c").filter(F.col("id_a") < F.col("id_b")).select("id_a", "id_b")
        )

    tp = pairs(truth_clusters, "cluster_id")
    gp = pairs(got_clusters, "cluster_id")
    n_t = tp.count()
    n_g = gp.count()
    n_i = tp.join(gp, ["id_a", "id_b"], "left_semi").count()
    return Row(
        truth_pairs=n_t,
        got_pairs=n_g,
        matched_pairs=n_i,
        recall=(n_i / n_t) if n_t else 1.0,
        precision=(n_i / n_g) if n_g else 1.0,
    )
