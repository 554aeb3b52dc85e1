"""Multimodal plumbing: schema, mapInPandas batch shape, deterministic fake
decoder, frame-sample fan-out. Stdlib-decodable formats (PCM WAV, 24-bit
BMP, P6 PPM) decode REAL BYTES end-to-end through the Spark path; formats
needing codec libraries remain an explicit stub."""

import io
import struct
import wave

import numpy as np
import pytest

from dedup.multimodal import (
    MEDIA_SCHEMA,
    extract_media_features,
    frame_sample_plan,
    _real_decode,
)


def _wav_bytes(samples: np.ndarray, rate: int = 8000) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes((samples * 32767).astype("<i2").tobytes())
    return buf.getvalue()


def _bmp_bytes(px: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> uncompressed 24-bit bottom-up BMP."""
    h, w, _ = px.shape
    stride = (w * 3 + 3) & ~3
    body = bytearray()
    for row in px[::-1]:  # bottom-up
        line = bytearray()
        for r, g, b in row:
            line += bytes([b, g, r])  # BGR
        line += b"\x00" * (stride - len(line))
        body += line
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + len(body), 0, 0, 54
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return header + bytes(body)


def _ppm_bytes(px: np.ndarray) -> bytes:
    h, w, _ = px.shape
    return f"P6\n# test\n{w} {h}\n255\n".encode() + px.astype(np.uint8).tobytes()


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        ("m1", "image", "image/png", 64, 64, None, b"\x89PNGfakebytes"),
        ("m2", "image", "image/png", 64, 64, None, b"\x89PNGother"),
        ("m3", "video", "video/mp4", 640, 360, 3500, b"\x00\x00ftyp"),
        ("m4", "audio", "audio/wav", None, None, 2000, None),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_real_decode_stub_for_codec_formats():
    # formats needing external codecs stay an explicit, honest stub
    with pytest.raises(NotImplementedError):
        _real_decode(b"\x89PNG\r\n\x1a\nxxxxxxxx", "image")
    with pytest.raises(ValueError):
        _real_decode(b"x", "image")  # truncated payload


def test_real_decode_wav_envelope():
    # first half silence, second half full-scale square wave -> the
    # envelope's first buckets ~0, last buckets ~1
    x = np.concatenate([np.zeros(4000), np.ones(4000) * 0.9])
    feat = _real_decode(_wav_bytes(x), "audio", dim=8)
    assert len(feat) == 8
    assert all(v < 0.01 for v in feat[:4])
    assert all(v > 0.8 for v in feat[4:])


def test_real_decode_bmp_and_ppm_grid():
    # left half black, right half white, 8x8 -> 4x4 grid: cols 0-1 dark,
    # cols 2-3 bright; BMP and PPM agree on the same pixels
    px = np.zeros((8, 8, 3), dtype=np.uint8)
    px[:, 4:, :] = 255
    for payload in (_bmp_bytes(px), _ppm_bytes(px)):
        feat = _real_decode(payload, "image", dim=16).reshape(4, 4)
        assert feat[:, :2].max() < 0.05
        assert feat[:, 2:].min() > 0.95


def test_real_decode_through_spark(spark):
    """Real bytes through the distributed mapInPandas path (no fake)."""
    x = np.linspace(0, 1, 2000)
    px = np.full((6, 6, 3), 128, dtype=np.uint8)
    rows = [
        ("w1", "audio", "audio/wav", None, None, 250, _wav_bytes(x)),
        ("i1", "image", "image/bmp", 6, 6, None, _bmp_bytes(px)),
        ("i2", "image", "image/x-portable-pixmap", 6, 6, None, _ppm_bytes(px)),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in extract_media_features(media, dim=16).collect()}
    assert set(out) == {"w1", "i1", "i2"}
    # uniform gray image -> every grid cell ~128/255 in both formats
    for mid in ("i1", "i2"):
        assert all(abs(v - 128 / 255) < 0.01 for v in out[mid]["feature"])
    # spark-path WAV decode matches the local decode bit-for-bit
    local = _real_decode(_wav_bytes(x), "audio", dim=16)
    assert np.allclose(out["w1"]["feature"], local)


def test_fake_feature_extraction(spark, media):
    out = extract_media_features(media, fake=True, dim=8).collect()
    by_id = {r["media_id"]: r for r in out}
    assert set(by_id) == {"m1", "m2", "m3", "m4"}
    assert all(len(r["feature"]) == 8 for r in out)
    assert by_id["m1"]["feature"] != by_id["m2"]["feature"]  # payload-dependent
    assert by_id["m1"]["n_bytes"] == 13 and by_id["m4"]["n_bytes"] == 0
    # deterministic across runs
    again = {r["media_id"]: r["feature"] for r in extract_media_features(media, fake=True, dim=8).collect()}
    assert all(again[k] == by_id[k]["feature"] for k in again)


def test_frame_sample_plan(spark, media):
    frames = frame_sample_plan(media, every_ms=1000).collect()
    assert {r["media_id"] for r in frames} == {"m3"}
    assert sorted(r["frame_ts_ms"] for r in frames) == [0, 1000, 2000, 3000]
