"""Multimodal plumbing: binary columns + Arrow-batched kernels (stubbed
codecs, real distributed plumbing)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datapump_spark.operators.multimodal import (
    FEATURE_DIM,
    MEDIA_SCHEMA,
    extract_features,
    media_stats,
    resize_images,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, b"\x89PNG-fake-bytes-1", ("image", "png", 64, 64, None)),
        (2, b"\x89PNG-fake-bytes-22", ("image", "png", 128, 128, None)),
        (3, b"RIFF-fake-wav", ("audio", "wav", None, None, 3500)),
        (4, b"\x00\x00ftyp-fake-mp4", ("video", "mp4", 640, 480, 4200)),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA).repartition(2)


def test_extract_features_shape_and_determinism(media):
    out = extract_features(media, fake=True)
    rows = {r["media_id"]: r for r in out.collect()}
    assert set(rows) == {1, 2, 3, 4}
    assert all(len(r["features"]) == FEATURE_DIM for r in rows.values())
    assert all(0.0 <= x < 1.0 for r in rows.values() for x in r["features"])
    # deterministic across runs (hash-derived, not random)
    again = {r["media_id"]: r["features"] for r in extract_features(media, fake=True).collect()}
    assert all(again[k] == rows[k]["features"] for k in rows)
    assert rows[1]["n_bytes"] == len(b"\x89PNG-fake-bytes-1")


def test_extract_features_real_path_raises(media):
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        extract_features(media, fake=False).collect()


def test_resize_passthrough_stamps_dims(media):
    out = resize_images(media, 32, 32, fake=True).collect()
    assert all(r["width"] == 32 and r["height"] == 32 for r in out)


def test_sample_frames_from_metadata(media):
    frames = sample_frames(media, every_ms=1000, fake=True)
    got = frames.where(F.col("media_id") == 4).collect()
    # 4200 ms → frames at 0,1000,2000,3000
    assert [r["frame_ts_ms"] for r in sorted(got, key=lambda r: r["frame_idx"])] == [0, 1000, 2000, 3000]


def test_media_stats(media):
    stats = {(r["kind"], r["format"]): r for r in media_stats(media).collect()}
    assert stats[("image", "png")]["n"] == 2
    assert stats[("video", "mp4")]["avg_duration_ms"] == 4200.0
