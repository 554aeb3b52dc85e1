"""Text-analysis operators (training-data pipeline): token counts, lang-id
heuristic, quality score bounds, fingerprints."""

import pyspark.sql.functions as F

from dedup.textstats import (
    bpe_ish_token_count_col,
    fingerprint_col,
    lang_id_col,
    quality_score_col,
    rolling_hash_col,
    token_count_col,
)


def test_token_counts(spark):
    df = spark.createDataFrame(
        [("the quick brown fox",), ("hello, world! 42",), ("",)], "text string"
    )
    rows = df.select(
        token_count_col("text").alias("w"), bpe_ish_token_count_col("text").alias("b")
    ).collect()
    assert [r["w"] for r in rows] == [4, 3, 0]
    # "hello , world ! 42" -> 5 bpe-ish tokens
    assert rows[1]["b"] == 5


def test_lang_id(spark):
    df = spark.createDataFrame(
        [
            ("the cat and the dog is here",),
            ("el gato y la casa es grande",),
            ("der hund und die katze ist da",),
            ("xyzzy qwerty",),
        ],
        "text string",
    )
    got = [r[0] for r in df.select(lang_id_col("text")).collect()]
    assert got == ["en", "es", "de", "und"]


def test_quality_score_bounds(spark):
    df = spark.createDataFrame(
        [("the quick brown fox jumps over the lazy dog",), ("!!! ??? ###",)],
        "text string",
    )
    rows = [r[0] for r in df.select(quality_score_col("text")).collect()]
    assert 0.0 <= rows[1] < rows[0] <= 1.0


def test_fingerprints_deterministic(spark):
    df = spark.createDataFrame([("abc",), ("abc",), ("abd",)], "text string")
    rows = df.select(
        fingerprint_col("text").alias("m"), rolling_hash_col("text").alias("r")
    ).collect()
    assert rows[0]["m"] == rows[1]["m"] != rows[2]["m"]
    assert rows[0]["r"] == rows[1]["r"] != rows[2]["r"]
    # rolling hash matches the python formula
    exp = 0
    for ch in "abc":
        exp = (exp * 31 + ord(ch)) % 1_000_000_007
    assert rows[0]["r"] == exp


def test_fingerprint_matches_md5(spark):
    import hashlib

    df = spark.createDataFrame([("some document text",)], "text string")
    got = df.select(fingerprint_col("text")).first()[0]
    assert got == hashlib.md5(b"some document text").hexdigest()
