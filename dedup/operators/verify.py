"""Verification tier: exact Jaccard + banded Levenshtein re-rank +
SimHash containment path over candidate pairs.

Reference analog: the close-match tier
(/root/reference/doppelspeller/predict.py:163-183) -- deletion-ratio gate
-> cost-2 Levenshtein ratio -> token-sort fallback, threshold 94
(/root/reference/doppelspeller/settings.py:75) -- plus the "modified"
IDF-weighted Jaccard the MatchMaker scores with
(/root/reference/doppelspeller/match_maker.py:16-50). Here the pair
population is LSH candidates instead of top-100-per-query, and verification
emits a typed ``tier`` so downstream accounting can attribute every edge.

Verification ladder per pair (cheapest first, every gate native-column so
Catalyst filters before the one Python UDF):
  0. MinHash-estimate pre-gate (zip_with agreement over the signatures the
     pair already carries) decides whether the exact set intersection is
     worth computing at all -- on high-background-similarity corpora this
     is the difference between O(candidates) cheap ops and O(candidates)
     array intersections.
  1. exact shingle-set Jaccard on the xxhash64 gram arrays
     (``array_intersect`` -- JVM) >= jaccard_threshold => tier 'jaccard'.
  2. SimHash hamming distance (bit_count(a^b) -- JVM) <=
     simhash_hamming_threshold => tier 'simhash': catches long-span
     containment / boilerplate-heavy dups where set Jaccard dilutes.
  3. deletion-ratio length gate (native), then the banded Levenshtein
     re-rank (pandas UDF) > lev_threshold => tier 'levenshtein'.
Pairs failing all gates are dropped.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
import pyspark.sql.functions as F

from dedup.config import DedupConfig, DEFAULT_CONFIG
from dedup.functions.similarity import (
    deletion_ratio_col,
    exact_jaccard_col,
    minhash_estimate_col,
    staged_levenshtein_ratio_col,
)
from dedup.functions.sketch import hamming_col


def jaccard_gate_threshold(config: DedupConfig) -> float:
    """Estimate-gate cut: threshold - sigmas * binomial sd at the threshold."""
    j = config.jaccard_threshold
    sd = math.sqrt(max(j * (1 - j), 1e-9) / config.num_perm)
    return max(0.0, j - config.minhash_gate_sigmas * sd)


def verify_pairs(
    pairs: DataFrame,
    prepared: DataFrame,
    config: DedupConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """(id_a, id_b) candidates x prepared docs -> verified edges
    (id_a, id_b, jaccard, hamming, lev_ratio, tier).

    Join strategy: two shuffle hash joins against ``prepared`` on doc_id
    (AQE broadcasts at low SF). The wide gram-hash arrays ride the join for
    the (gated) exact Jaccard, then drop immediately."""
    side = prepared.select("doc_id", "norm_text", "gram_hashes", "minhash", "simhash")
    a = side.select(
        F.col("doc_id").alias("id_a"),
        F.col("norm_text").alias("text_a"),
        F.col("gram_hashes").alias("gh_a"),
        F.col("minhash").alias("mh_a"),
        F.col("simhash").alias("sim_a"),
    )
    b = side.select(
        F.col("doc_id").alias("id_b"),
        F.col("norm_text").alias("text_b"),
        F.col("gram_hashes").alias("gh_b"),
        F.col("minhash").alias("mh_b"),
        F.col("simhash").alias("sim_b"),
    )
    joined = pairs.join(a, "id_a").join(b, "id_b")

    gate = jaccard_gate_threshold(config)
    scored = (
        joined.withColumn("est", minhash_estimate_col("mh_a", "mh_b"))
        .withColumn(
            "jaccard",
            F.when(
                F.col("est") >= F.lit(gate),
                exact_jaccard_col("gh_a", "gh_b"),
            ).otherwise(F.lit(0.0)),
        )
        .withColumn("hamming", hamming_col("sim_a", "sim_b"))
        .drop("gh_a", "gh_b", "mh_a", "mh_b", "sim_a", "sim_b", "est")
    )

    jac_ok = F.col("jaccard") >= F.lit(config.jaccard_threshold)
    sim_ok = F.col("hamming") <= F.lit(config.simhash_hamming_threshold)
    gate_ok = deletion_ratio_col("text_a", "text_b") >= F.lit(
        float(config.lev_threshold)
    )

    # Only pairs that failed both JVM-side sketch checks AND pass the
    # native length gate pay the Levenshtein UDF.
    scored = scored.withColumn(
        "lev_ratio",
        F.when(
            jac_ok | sim_ok | ~gate_ok,
            F.lit(None).cast("int"),
        ).otherwise(staged_levenshtein_ratio_col("text_a", "text_b", config)),
    )

    lev_ok = F.col("lev_ratio") > F.lit(config.lev_threshold)
    verified = scored.withColumn(
        "tier",
        F.when(jac_ok, F.lit("jaccard"))
        .when(sim_ok, F.lit("simhash"))
        .when(lev_ok, F.lit("levenshtein")),
    ).filter(F.col("tier").isNotNull())

    return verified.select(
        "id_a", "id_b", "jaccard", "hamming", "lev_ratio", "tier"
    )
