"""Exact-duplicate tier: grouping semantics + representative selection
(reference exact-match tier, /root/reference/doppelspeller/predict.py:97-113).
"""

import pyspark.sql.functions as F

from dedup.operators.exact import (
    exact_duplicate_groups,
    exact_duplicate_pairs,
    representatives,
)


def _docs(spark):
    rows = [
        ("a", "same text"),
        ("b", "same text"),
        ("c", "same text"),
        ("d", "unique one"),
        ("e", "another unique"),
    ]
    return spark.createDataFrame(rows, "conv_id string, norm_text string")


def test_groups_and_representative(spark):
    g = exact_duplicate_groups(_docs(spark)).collect()
    by_size = {r["group_size"]: r for r in g}
    assert by_size[3]["representative"] == "a"
    assert by_size[3]["member_ids"] == ["a", "b", "c"]
    assert sum(1 for r in g if r["group_size"] == 1) == 2


def test_pairs_are_star_edges(spark):
    groups = exact_duplicate_groups(_docs(spark))
    pairs = {(r["id_a"], r["id_b"]) for r in exact_duplicate_pairs(groups).collect()}
    assert pairs == {("a", "b"), ("a", "c")}  # O(n) star, not O(n^2) clique


def test_representatives_filter(spark):
    docs = _docs(spark)
    groups = exact_duplicate_groups(docs)
    reps = representatives(docs, groups, "conv_id")
    assert {r["conv_id"] for r in reps.collect()} == {"a", "d", "e"}
