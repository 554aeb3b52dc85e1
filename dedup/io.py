"""Sources/sinks with reference parity.

* ``read_titles_csv``: delimiter + column-mapping + cast CSV scan, the
  Spark form of ``read_and_transform_input_csv``
  (/root/reference/doppelspeller/common.py:50-72) including its schema
  validation (common.py:78-81) -- but WITHOUT eagerly materializing the
  derived columns; normalization/shingling happen lazily in the consuming
  operator so Catalyst can prune and push down.
* ``write_predictions_csv``: the sorted final-output CSV sink
  (/root/reference/doppelspeller/predict.py:269-270), pipe-delimited like
  the reference's settings (settings.py:39).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F


def read_titles_csv(
    spark: SparkSession,
    path: str,
    column_mapping: list[tuple[str, tuple[str, str]]],
    delimiter: str = "|",
) -> DataFrame:
    """``column_mapping`` = [(internal_name, (source_column, spark_type))],
    the shape of the reference's ``*_COLUMNS_MAPPING`` lists
    (/root/reference/doppelspeller/settings.py:20-23,28-32,40-43)."""
    df = spark.read.csv(path, sep=delimiter, header=True, inferSchema=False)
    missing = [src for _, (src, _) in column_mapping if src not in df.columns]
    if missing:
        raise ValueError(
            f"input file {path!r} is missing mapped columns {missing}; "
            f"found {df.columns}"
        )
    return df.select(
        *[
            F.col(src).cast(typ).alias(internal)
            for internal, (src, typ) in column_mapping
        ]
    )


TRUTH_MAPPING = [("title_id", ("company_id", "long")), ("title", ("name", "string"))]
TEST_MAPPING = [("query_id", ("test_index", "long")), ("title", ("name", "string"))]


def write_predictions_csv(
    predictions: DataFrame, path: str, delimiter: str = "|"
) -> None:
    """Sorted (query_id asc) single-file CSV, columns (title_id, query_id)
    like the reference's final output (predict.py:259-270)."""
    (
        predictions.select(
            F.col("title_id").cast("long"), F.col("query_id").cast("long")
        )
        .orderBy("query_id")
        .coalesce(1)
        .write.mode("overwrite")
        .option("header", True)
        .option("sep", delimiter)
        .csv(path)
    )
