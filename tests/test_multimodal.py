"""Multimodal plumbing: schema, mapInPandas batch shape, deterministic fake
decoder, frame-sample fan-out; the real decoder is an explicit stub."""

import pytest

from dedup.multimodal import (
    MEDIA_SCHEMA,
    extract_media_features,
    frame_sample_plan,
    _real_decode,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        ("m1", "image", "image/png", 64, 64, None, b"\x89PNGfakebytes"),
        ("m2", "image", "image/png", 64, 64, None, b"\x89PNGother"),
        ("m3", "video", "video/mp4", 640, 360, 3500, b"\x00\x00ftyp"),
        ("m4", "audio", "audio/wav", None, None, 2000, None),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_real_decode_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        _real_decode(b"x", "image")


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
