"""Normalization parity with the reference's transform_title
(/root/reference/doppelspeller/common.py:20-47), including its own unit
test's golden string (/root/reference/doppelspeller/tests/test_common.py:16-19).
"""

import pyspark.sql.functions as F
import pytest

from dedup.functions.normalize import (
    normalize_ascii_col,
    normalize_text_col,
    transform_title,
)

GOLDEN = [
    # the reference's own unit-test case
    (
        """LKJblksd skjasl dfkjf &* 8*&&&8 GGdjsdkj--sdsd-"sdi..//' d'  k   bkjh77_asda33""",
        "lkjblksd skjasl dfkjf 88 ggdjsdkj sdsd sdi d k bkjh77asda33",
    ),
    ("ab", "0ab"),                      # rjust pad (common.py:34-38)
    ("", "000"),
    ("Café Brontë", "cafe bronte"),     # NFD accent folding
    ("A-B-C", "a b c"),                 # dash -> space
    ("x" * 300, "x" * 255),             # truncation to 255 (settings.py:68)
    ("  many    spaces  ", "many spaces"),
]


@pytest.mark.parametrize("raw,expected", GOLDEN)
def test_transform_title_python(raw, expected):
    assert transform_title(raw) == expected


def test_normalize_udf_matches_python(spark, config):
    title_cfg = config.with_(max_chars=255)  # reference title parity
    raws = [g[0] for g in GOLDEN] + [None]
    df = spark.createDataFrame([(r,) for r in raws], "text string")
    got = [
        r["norm"]
        for r in df.select(
            normalize_text_col("text", title_cfg).alias("norm")
        ).collect()
    ]
    expected = [transform_title(r or "") for r in raws]
    assert got == expected


def test_normalize_ascii_col_parity_on_ascii(spark, config):
    title_cfg = config.with_(max_chars=255)
    ascii_goldens = [g for g in GOLDEN if g[0].isascii()]
    df = spark.createDataFrame([(r,) for r, _ in ascii_goldens], "text string")
    got = [
        r["norm"]
        for r in df.select(
            normalize_ascii_col("text", title_cfg).alias("norm")
        ).collect()
    ]
    assert got == [e for _, e in ascii_goldens]
