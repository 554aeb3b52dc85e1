"""Candidate-pair generation: MinHash + LSH band equi-join with skew
accounting.

This REPLACES (not ports) the reference's brute-force candidate scan --
one query's IDF posting lists accumulated against all N truth titles
(/root/reference/doppelspeller/match_maker.py:16-50,192-203), O(Q*N) work
that is the single biggest scaling wall (SURVEY.md J2). LSH makes candidate
count O(#near-dups): docs sharing any (band_idx, band_hash) key meet in an
equi-join; everything else never shuffles together.

Skew story (north_rule "salted hash join to defuse hot-band skew"):
boilerplate-heavy corpora (identical system prompts) produce band groups
with thousands of members => a naive self-join does size^2 work inside one
key. Three defenses, in order:
  1. exact tier already collapsed *identical* docs to one representative;
  2. band groups larger than ``max_band_group`` are counted + dropped into
     a skew-accounting DataFrame (returned, persisted to metrics -- no
     silent truncation). A real near-dup pair lost here still meets in any
     of the other b-1 bands, so recall loss is (fraction of oversized
     bands)^b -- measured, not assumed;
  3. within surviving groups the join is salted: the build side is split
     into ``salt_buckets`` sub-keys so one hot band spreads over several
     tasks (AQE skew-join then handles residual partition skew).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
import pyspark.sql.functions as F

from dedup.config import DedupConfig, DEFAULT_CONFIG
from dedup.functions.normalize import normalize_text_col, normalize_ascii_col
from dedup.functions.shingle import char_ngrams_col, gram_hashes_col
from dedup.functions.sketch import minhash_signature_udf, band_hashes_udf, simhash_udf
from dedup.tracking import register


def prepare_docs(
    docs: DataFrame,
    id_col: str = "conv_id",
    text_col: str = "doc_text",
    config: DedupConfig = DEFAULT_CONFIG,
    ascii_fast_path: bool = False,
) -> DataFrame:
    """One projection pass: normalize -> shingle -> hash shingles ->
    MinHash signature + SimHash sketch. Everything except the two sketch
    UDFs stays in whole-stage codegen; the sketch UDFs receive only the
    ``array<bigint>`` hash column (narrow Arrow transfer, no raw text)."""
    norm = (
        normalize_ascii_col(text_col, config)
        if ascii_fast_path
        else normalize_text_col(text_col, config)
    )
    # CPU-heavy (3 UDF/sketch passes per row) but often byte-small input
    # (a checkpointed assembled table is a handful of parquet files):
    # repartition explicitly or the whole stage runs in 1-2 tasks.
    docs = docs.repartition(config.conv_partitions, id_col)
    out = (
        docs.withColumn("norm_text", norm)
        .withColumn(
            "gram_hashes",
            gram_hashes_col(char_ngrams_col("norm_text", config.k_shingle)),
        )
        .withColumn("minhash", minhash_signature_udf("gram_hashes", config))
        .withColumn("simhash", simhash_udf("gram_hashes", config))
    )
    # NOTE: the string gram arrays are deliberately NOT materialized -- all
    # downstream consumers (LSH, estimate gate, exact-Jaccard verify) work
    # on the 64-bit gram hashes; that halves checkpoint width and removes
    # two duplicate evaluations of the shingling expression.
    return out.select(
        F.col(id_col).alias("doc_id"),
        "norm_text",
        "gram_hashes",
        "minhash",
        "simhash",
    )


@dataclass
class CandidateResult:
    pairs: DataFrame          # (id_a, id_b) canonical, deduped
    band_skew: DataFrame      # (band_idx, band_hash, group_size) for dropped groups


def candidate_pairs(
    prepared: DataFrame,
    config: DedupConfig = DEFAULT_CONFIG,
    tracker: list[DataFrame] | None = None,
) -> CandidateResult:
    """prepared docs (doc_id, minhash) -> candidate (id_a < id_b) pairs.

    Plan shape: posexplode(band_hashes) -> (band_idx, band_hash, doc_id)
    postings -> group-size accounting -> salted self-join on the band key
    -> canonical pair dedup. The self-join is an equi hash join on
    (band_idx, band_hash[, salt]); AQE may broadcast the smaller side at
    low SF and splits skewed partitions at high SF.

    ``tracker``: persisted intermediates are appended here so long-lived
    drivers (pipeline stages, streaming micro-batches) can unpersist them
    once the pairs have materialized -- otherwise cached band postings
    accumulate across batches."""
    # The band postings feed MANY branches (size accounting, skew ledger,
    # and four join sides) -- cache them so the sketch-UDF explode runs
    # once, not once per branch. On a cluster this is the natural stage to
    # checkpoint instead (the pipeline checkpoints its parent 'prepared').
    bands = prepared.select(
        "doc_id",
        F.posexplode(band_hashes_udf("minhash", config)).alias(
            "band_idx", "band_hash"
        ),
    ).persist()
    register(bands, tracker)

    sizes = bands.groupBy("band_idx", "band_hash").agg(
        F.count(F.lit(1)).alias("group_size")
    )
    band_skew = sizes.filter(F.col("group_size") > config.max_band_group)

    # postings surviving the boilerplate cap; singleton groups can never
    # produce a pair -- drop them before the join, they are the vast
    # majority of postings.
    postings = (
        bands.join(
            sizes.filter(
                (F.col("group_size") > 1)
                & (F.col("group_size") <= config.max_band_group)
            ),
            on=["band_idx", "band_hash"],
            how="inner",
        )
        .select("band_idx", "band_hash", "doc_id", "group_size")
        .persist()
    )
    register(postings, tracker)

    # Split skew-join: groups under the hotness threshold take a plain
    # band-key equi-join; hot groups (the boilerplate tail) take a SALTED
    # join -- probe side gets a deterministic salt bucket from its doc_id,
    # build side explodes over all buckets, so one hot band key spreads
    # over salt_buckets reducers instead of serializing in one. Salting
    # only the hot slice keeps shuffle volume ~1x instead of n_salt-x.
    hot_flag = F.col("group_size") > config.salt_hot_threshold
    cool = postings.filter(~hot_flag).select(
        "band_idx", "band_hash", "doc_id", "group_size"
    )
    hot = postings.filter(hot_flag).select(
        "band_idx", "band_hash", "doc_id", "group_size"
    )

    cool_pairs = cool.alias("l").join(
        cool.drop("group_size").alias("r"),
        on=["band_idx", "band_hash"],
        how="inner",
    ).select(
        F.col("l.doc_id").alias("id_a"),
        F.col("r.doc_id").alias("id_b"),
        F.col("l.group_size").alias("gsz"),
    )

    n_salt = config.salt_buckets
    hot_left = hot.select(
        "band_idx",
        "band_hash",
        F.col("doc_id").alias("id_a"),
        "group_size",
        F.pmod(F.xxhash64("doc_id"), F.lit(n_salt)).cast("bigint").alias("salt"),
    )
    hot_right = hot.select(
        "band_idx",
        "band_hash",
        F.col("doc_id").alias("id_b"),
        F.explode(F.sequence(F.lit(0).cast("bigint"), F.lit(n_salt - 1).cast("bigint"))).alias("salt"),
    )
    hot_pairs = hot_left.join(
        hot_right, on=["band_idx", "band_hash", "salt"], how="inner"
    ).select("id_a", "id_b", F.col("group_size").alias("gsz"))

    # Band-hit counting replaces a plain pair dedup (same discipline as the
    # containment path): a true J >= threshold pair collides in >= 2 of the
    # 32 bands w.p. 1 - 5e-6, while the r=4 scheme's soft knee floods the
    # candidate set with single-hit boilerplate collisions (J ~ 0.3-0.5)
    # that the verify tier then pays ~100x their worth to reject. Pairs
    # whose quietest colliding group is small stay candidates even with a
    # single hit -- isolated collisions are cheap to verify and may be
    # legitimate low-J Levenshtein-tier duplicates.
    pairs = (
        cool_pairs.unionByName(hot_pairs)
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(
            F.count(F.lit(1)).alias("band_hits"),
            F.min("gsz").alias("min_gsz"),
        )
        .filter(
            (F.col("band_hits") >= config.lsh_min_band_hits)
            | (F.col("min_gsz") <= config.lsh_noise_group_size)
        )
        .select("id_a", "id_b")
    )
    return CandidateResult(pairs=pairs, band_skew=band_skew)
