"""Word-level feature vectors (SURVEY.md P6, the one remaining optional
inventory row): per-title truth-word document-count vectors -- for each of
the first ``n_slots`` words of a title, the number of times that word
occurs across the ENTIRE truth corpus, 0-padded to fixed width.

Reference analog: ``get_truth_words_counts``
(/root/reference/doppelspeller/feature_engineering.py:309-319) with
``NUMBER_OF_WORDS_FEATURES = 15`` (settings.py:65) -- there a driver-side
``words_counter`` dict consulted per row; here the corpus word counts are
a distributed aggregate joined back to the exploded words, so no driver
dictionary exists at any scale.

100 TB shape: the probe-side shuffle key is ``word``, which is Zipf-skewed
(stop words are hot keys). The count table rides a shuffled hash join
(each probe row matches exactly one build row) and AQE's skew-join
splitting spreads oversized probe partitions; the build side stays the
distinct vocabulary, never the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F


def truth_word_count_vectors(
    titles: DataFrame,
    id_col: str = "title_id",
    title_col: str = "title",
    n_slots: int = 15,
) -> DataFrame:
    """-> (id_col, wc_vec array<bigint> of length exactly n_slots).

    Slot i holds the corpus-wide occurrence count (WITH multiplicity,
    matching the reference's Counter semantics) of the title's i-th word;
    titles shorter than n_slots words 0-pad, longer ones truncate, and
    titles with no words at all get the all-zero vector."""
    words = titles.select(
        F.col(id_col).alias("__id"),
        F.posexplode(
            F.filter(F.split(F.col(title_col), " "), lambda x: x != F.lit(""))
        ).alias("pos", "word"),
    )
    counts = words.groupBy("word").agg(F.count(F.lit(1)).alias("wc"))
    per_title = (
        words.filter(F.col("pos") < n_slots)
        .join(counts.hint("shuffle_hash"), "word")
        .groupBy("__id")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "wc"))).alias("pw"))
        .select(
            "__id", F.transform("pw", lambda x: x["wc"]).alias("cnts")
        )
    )
    pad = F.array_repeat(F.lit(0).cast("bigint"), n_slots)
    return (
        titles.select(F.col(id_col).alias("__id"))
        .join(per_title, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            F.slice(
                F.concat(F.coalesce(F.col("cnts"), pad), pad), 1, n_slots
            ).alias("wc_vec"),
        )
    )
