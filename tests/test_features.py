"""P6 truth-word document-count vectors (reference
feature_engineering.py:309-319 semantics: corpus-wide word occurrence
counts with multiplicity, first 15 words, 0-padded fixed width)."""

from dedup.operators.features import truth_word_count_vectors


def test_word_count_vectors_semantics(spark):
    rows = [
        (1, "coolblue bv"),
        (2, "coolblue holding bv"),
        (3, "coolblue coolblue"),       # in-title multiplicity counts
        (4, ""),                        # no words -> all-zero vector
        (5, "a b c d e f g h i j k l m n o p q r"),  # 18 words -> truncate
    ]
    df = spark.createDataFrame(rows, "title_id long, title string")
    got = {
        r["title_id"]: list(r["wc_vec"])
        for r in truth_word_count_vectors(df, n_slots=15).collect()
    }
    # corpus counts: coolblue x4 (multiplicity), bv x2, holding x1
    assert got[1][:2] == [4, 2] and got[1][2:] == [0] * 13
    assert got[2][:3] == [4, 1, 2]
    assert got[3][:2] == [4, 4]
    assert got[4] == [0] * 15
    assert len(got[5]) == 15 and all(v == 1 for v in got[5])
    # fixed width for every row
    assert all(len(v) == 15 for v in got.values())


def test_word_count_vectors_multispace_tokenization(spark):
    df = spark.createDataFrame(
        [(1, "x  y"), (2, " x ")], "title_id long, title string"
    )
    got = {
        r["title_id"]: list(r["wc_vec"])
        for r in truth_word_count_vectors(df, n_slots=4).collect()
    }
    # empty tokens from repeated/leading spaces never occupy slots
    assert got[1] == [2, 1, 0, 0]
    assert got[2] == [2, 0, 0, 0]
