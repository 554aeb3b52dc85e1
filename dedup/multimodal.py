"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, decoded / feature-extracted via
``mapInPandas`` batches.

Decode coverage: stdlib-decodable containers decode for REAL -- PCM WAV
(``wave`` module), uncompressed 24-bit BMP and binary PPM (header parse +
numpy pixel math) -- so the component has genuine end-to-end byte-decoding
tests (tests/test_multimodal.py). Compressed formats (JPEG/MP3/H.264 ...)
need codec libraries this container does not ship; those payloads raise
``NotImplementedError`` (honest stub), or pass ``fake=True`` for the
deterministic hash-derived decoder that exercises the same Spark plumbing
-- schema, partitioning, Arrow batch shape, UDF signature -- regardless of
format.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
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


def _decode_wav(payload: bytes, dim: int) -> np.ndarray:
    """PCM WAV -> ``dim``-bucket mean-|amplitude| envelope in [0, 1]."""
    with wave.open(io.BytesIO(payload), "rb") as wf:
        n_frames = wf.getnframes()
        width = wf.getsampwidth()
        n_ch = wf.getnchannels()
        raw = wf.readframes(n_frames)
    if width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 1:  # 8-bit WAV is unsigned
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise NotImplementedError(f"unsupported WAV sample width {width}")
    if n_ch > 1:
        x = x.reshape(-1, n_ch).mean(axis=1)
    if len(x) == 0:
        return np.zeros(dim, dtype=np.float32)
    # mean |amplitude| per time bucket: bucket i covers samples
    # [i*n/dim, (i+1)*n/dim) -- a stable coarse envelope
    idx = (np.arange(dim + 1) * len(x)) // dim
    env = np.array(
        [np.abs(x[idx[i] : max(idx[i + 1], idx[i] + 1)]).mean() for i in range(dim)]
    )
    return env.astype(np.float32)


def _grid_feature(gray: np.ndarray, dim: int) -> np.ndarray:
    """(h, w) grayscale in [0,1] -> sqrt(dim) x sqrt(dim) block-mean grid,
    flattened. dim must be a perfect square (default 16 -> 4x4 grid)."""
    g = int(round(dim ** 0.5))
    if g * g != dim:
        raise ValueError(f"image feature dim {dim} must be a perfect square")
    h, w = gray.shape
    ri = (np.arange(g + 1) * h) // g
    ci = (np.arange(g + 1) * w) // g
    out = np.empty((g, g), dtype=np.float32)
    for r in range(g):
        for c in range(g):
            out[r, c] = gray[
                ri[r] : max(ri[r + 1], ri[r] + 1), ci[c] : max(ci[c + 1], ci[c] + 1)
            ].mean()
    return out.ravel()


def _decode_bmp(payload: bytes, dim: int) -> np.ndarray:
    """Uncompressed 24-bit BMP (BITMAPINFOHEADER) -> block-mean grid."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise NotImplementedError("BMP core-header variant not supported")
    w, h = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError(f"only uncompressed 24-bit BMP (got bpp={bpp})")
    flip = h > 0  # positive height = bottom-up row order
    h = abs(h)
    row_stride = (w * 3 + 3) & ~3  # rows pad to 4 bytes
    px = np.frombuffer(payload, dtype=np.uint8, count=row_stride * h, offset=data_offset)
    px = px.reshape(h, row_stride)[:, : w * 3].reshape(h, w, 3)
    if flip:
        px = px[::-1]
    # BGR byte order; ITU-R 601 luma
    gray = (
        0.114 * px[:, :, 0] + 0.587 * px[:, :, 1] + 0.299 * px[:, :, 2]
    ) / 255.0
    return _grid_feature(gray, dim)


def _decode_ppm(payload: bytes, dim: int) -> np.ndarray:
    """Binary PPM (P6, maxval <= 255) -> block-mean grid."""
    parts: list[bytes] = []
    pos = 0
    while len(parts) < 4:  # magic, width, height, maxval
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        parts.append(payload[start:pos])
    pos += 1  # single whitespace after maxval
    if parts[0] != b"P6":
        raise NotImplementedError(f"only binary P6 PPM (got {parts[0]!r})")
    w, h, maxval = int(parts[1]), int(parts[2]), int(parts[3])
    if maxval > 255:
        raise NotImplementedError("16-bit PPM not supported")
    px = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
    px = px.reshape(h, w, 3).astype(np.float64)
    gray = (0.299 * px[:, :, 0] + 0.587 * px[:, :, 1] + 0.114 * px[:, :, 2]) / maxval
    return _grid_feature(gray, dim)


def _real_decode(payload: bytes, kind: str, dim: int = 16) -> np.ndarray:
    """Dispatch on container magic bytes; stdlib-decodable formats decode
    for real, anything needing an external codec raises (honest stub)."""
    if payload is None or len(payload) < 12:
        raise ValueError("empty/truncated media payload")
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return _decode_wav(payload, dim)
    if payload[:2] == b"BM":
        return _decode_bmp(payload, dim)
    if payload[:2] == b"P6":
        return _decode_ppm(payload, dim)
    raise NotImplementedError(
        "payload format requires codec libraries not present in this "
        "environment (stdlib decoders cover PCM WAV / 24-bit BMP / P6 "
        "PPM); pass fake=True for the deterministic stub decoder"
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
                decode(p, k, dim).tolist()
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
