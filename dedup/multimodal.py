"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, decoded / feature-extracted via
``mapInPandas`` batches.

The decode step is STUBBED (no image/audio libraries ship in this
container): ``decode_image_batch`` raises ``NotImplementedError`` unless
``fake=True``, in which case a deterministic fake decoder (hash-derived
"pixels") exercises the real Spark plumbing -- schema, partitioning, Arrow
batch shape, UDF signature -- end to end (tests/test_multimodal.py).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
import pyspark.sql.functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("kind", StringType(), False),      # image|audio|video
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
        StructField("payload", BinaryType(), True),    # opaque bytes
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", IntegerType(), True),
        StructField("feature", ArrayType(FloatType()), True),
    ]
)


def _real_decode(payload: bytes, kind: str) -> np.ndarray:
    raise NotImplementedError(
        "media decoding requires image/audio libraries not present in this "
        "environment; pass fake=True for the deterministic stub decoder"
    )


def _fake_decode(payload: bytes, kind: str, dim: int = 16) -> np.ndarray:
    """Deterministic fake 'decoder': derives a float feature vector from a
    sha256 stream of the payload -- stable across runs and executors."""
    if payload is None:
        payload = b""
    digest = hashlib.sha256(payload).digest()
    raw = np.frombuffer((digest * ((dim * 4) // len(digest) + 1))[: dim * 4], dtype=np.uint32)
    return (raw % 1000).astype(np.float32) / 1000.0


def extract_media_features(
    media: DataFrame, fake: bool = False, dim: int = 16
) -> DataFrame:
    """mapInPandas over media rows -> FEATURE_SCHEMA. Batches arrive as
    Arrow record batches; the decode loop is per-row by necessity (opaque
    bytes) but the surrounding plumbing is fully distributed and the fake
    path is vectorizable."""
    decode = _fake_decode if fake else _real_decode

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode(p, k, dim).tolist() if fake else decode(p, k)
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "feature": feats,
                }
            )

    return media.repartition(8, "media_id").mapInPandas(_extract, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per (media_id, frame_ts) without
    decoding -- pure column math over duration metadata, showing how frame
    fan-out partitions ahead of a decode UDF."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.coalesce(F.col("duration_ms"), F.lit(0)) - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
    )
