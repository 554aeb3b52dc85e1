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
    required_keys: list[str] | None = None,
) -> DataFrame:
    """``column_mapping`` = [(internal_name, (source_column, spark_type))],
    the shape of the reference's ``*_COLUMNS_MAPPING`` lists
    (/root/reference/doppelspeller/settings.py:20-23,28-32,40-43).

    ``required_keys``: when given, the mapping's internal keys must equal
    this list EXACTLY (same names, same order) -- the reference's loader
    key-order audit (/root/reference/doppelspeller/common.py:78-81,
    94-97,110-113), which guards downstream positional consumers against
    a silently reordered settings edit."""
    if required_keys is not None:
        keys = [internal for internal, _ in column_mapping]
        if keys != list(required_keys):
            raise ValueError(
                f"column_mapping keys {keys} must exactly match the "
                f"required key order {list(required_keys)}"
            )
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

# fixed key orders the typed loaders audit user-supplied mappings against,
# mirroring required_columns_in_mapping in the reference's
# get_ground_truth/get_test_data (common.py:78-81,110-113)
REQUIRED_TRUTH_KEYS = ["title_id", "title"]
REQUIRED_TEST_KEYS = ["query_id", "title"]


def read_ground_truth(
    spark: SparkSession,
    path: str,
    column_mapping: list[tuple[str, tuple[str, str]]] = TRUTH_MAPPING,
    delimiter: str = "|",
) -> DataFrame:
    """Typed truth loader: the mapping (user-configurable, like the
    reference's settings.py lists) must yield exactly (title_id, title)."""
    return read_titles_csv(
        spark, path, column_mapping, delimiter, required_keys=REQUIRED_TRUTH_KEYS
    )


def read_test_queries(
    spark: SparkSession,
    path: str,
    column_mapping: list[tuple[str, tuple[str, str]]] = TEST_MAPPING,
    delimiter: str = "|",
) -> DataFrame:
    """Typed query loader: mapping must yield exactly (query_id, title)."""
    return read_titles_csv(
        spark, path, column_mapping, delimiter, required_keys=REQUIRED_TEST_KEYS
    )


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
