"""MJPEG-in-AVI video path gates (operators/avi.py, round 9) — the
real frame extraction that cleared the package's former single
NotImplementedError (multimodal.sample_frames fake-only)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from datapump_spark.operators.avi import (
    avi_info,
    decode_avi_frames,
    encode_avi_mjpeg,
)
from datapump_spark.operators.codecs import UnsupportedMediaError


def _frames(n=3, h=32, w=48):
    # solid frames survive JPEG q95 closely; distinct means per frame
    return [np.full((h, w, 3), 20 + 70 * i, np.uint8) for i in range(n)]


def test_roundtrip_frames_and_timing():
    b = encode_avi_mjpeg(_frames(3), fps=5, quality=95)
    out = list(decode_avi_frames(b))
    assert [(i, ts) for i, ts, _ in out] == [(0, 0), (1, 200), (2, 400)]
    for i, (_, _, rgb) in enumerate(out):
        assert rgb.shape == (32, 48, 3)
        assert abs(int(rgb.mean()) - (20 + 70 * i)) <= 2


def test_avi_info_header():
    b = encode_avi_mjpeg(_frames(4, 16, 16), fps=10)
    assert avi_info(b) == (16, 16, 400, 4)
    assert avi_info(b"RIFF\x04\x00\x00\x00AVI ") == (None,) * 4
    assert avi_info(b"not avi") == (None,) * 4


def test_non_mjpeg_codec_refused():
    b = bytearray(encode_avi_mjpeg(_frames(1), fps=10))
    at = b.index(b"vidsMJPG")
    b[at + 4:at + 8] = b"H264"
    with pytest.raises(UnsupportedMediaError, match="H264"):
        list(decode_avi_frames(bytes(b)))


def test_malformed_container_raises():
    with pytest.raises(ValueError, match="not an AVI"):
        list(decode_avi_frames(b"RIFF\x08\x00\x00\x00WAVEdata"))
    # hdrl without movi
    b = encode_avi_mjpeg(_frames(1), fps=10)
    at = b.index(b"movi")
    broken = b[:at] + b"xxxx" + b[at + 4:]
    with pytest.raises(ValueError, match="movi"):
        list(decode_avi_frames(broken))


def test_sniffer_both_paths(spark):
    from datapump_spark.operators.mediasniff import (
        parse_media_header,
        sniff_media,
    )
    b = encode_avi_mjpeg(_frames(5, 24, 40), fps=10)
    info = parse_media_header(b)
    assert info["format"] == "avi" and info["kind"] == "video"
    assert (info["width"], info["height"]) == (40, 24)
    assert info["duration_ms"] == 500
    df = spark.createDataFrame([(1, bytearray(b))],
                               "media_id long, payload binary")
    for strategy in ("expr", "pandas"):
        row = sniff_media(df, strategy=strategy).collect()[0]
        assert (row["format"], row["kind"]) == ("avi", "video"), strategy
        assert (row["width"], row["height"]) == (40, 24), strategy
        assert row["duration_ms"] == 500, strategy


def test_sample_video_frames_real_path(spark):
    """The every_ms tick walk holds the frame on display (like the GIF
    path) and re-encodes it as PNG — decode one back to prove real
    pixels flow end to end."""
    from datapump_spark.operators.codecs import decode_png
    from datapump_spark.operators.multimodal import sample_frames

    b = encode_avi_mjpeg(_frames(4, 16, 16), fps=2, quality=95)  # 500ms/f
    df = spark.createDataFrame([(7, bytearray(b))],
                               "media_id long, payload binary")
    rows = sorted(sample_frames(df, every_ms=1000, fake=False).collect(),
                  key=lambda r: r["frame_idx"])
    # frames at 0,500,1000,1500 -> ticks 0 and 1000 show frames 0 and 2
    assert [r["frame_ts_ms"] for r in rows] == [0, 1000]
    png = decode_png(bytes(rows[1]["frame_png"]))
    assert abs(int(png[..., :3].mean()) - (20 + 70 * 2)) <= 2
    # undecodable payloads drop under on_error='null'
    bad = spark.createDataFrame([(8, bytearray(b"RIFFxxxxAVI junk"))],
                                "media_id long, payload binary")
    assert sample_frames(bad, every_ms=1000, fake=False).count() == 0
