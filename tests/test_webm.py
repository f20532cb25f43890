"""WebM (Matroska) VP8 video gates (operators/webm.py, round 9): EBML
Segment/Tracks/Cluster/SimpleBlock walk over the real VP8 decoder,
honest codec/inter-frame/lacing seams, sniffer parity, kernel route."""

from __future__ import annotations

import numpy as np
import pytest

from datapump_spark.operators.codecs import UnsupportedMediaError
from datapump_spark.operators.webm import (
    decode_webm_frames,
    encode_webm_vp8,
)


def _frames(n=3, h=16, w=32):
    return [np.full((h, w, 3), 40 * (i + 1), np.uint8) for i in range(n)]


def test_roundtrip_solid_qi0_exact():
    b = encode_webm_vp8(_frames(3), fps=2, qi=0)
    out = list(decode_webm_frames(b))
    assert [(i, ts) for i, ts, _ in out] == [(0, 0), (1, 500), (2, 1000)]
    for i, (_, _, rgb) in enumerate(out):
        assert rgb.shape == (16, 32, 3)
        assert (rgb == 40 * (i + 1)).all()       # qi=0 solid is exact


def test_timestamp_scale_respected():
    b = bytearray(encode_webm_vp8(_frames(2), fps=10, qi=0))
    # TimestampScale element (0x2AD7B1) holds 1,000,000 ns = 1 ms
    at = b.index(bytes.fromhex("2AD7B1"))
    size_len = 1
    val_at = at + 3 + size_len
    assert int.from_bytes(b[val_at:val_at + 3], "big") == 1_000_000
    # halve the tick scale -> timestamps halve
    b[val_at:val_at + 3] = (500_000).to_bytes(3, "big")
    out = list(decode_webm_frames(bytes(b)))
    assert [ts for _, ts, _ in out] == [0, 50]


def test_codec_and_frame_seams():
    b = encode_webm_vp8(_frames(1), qi=0)
    with pytest.raises(UnsupportedMediaError, match="V_VP9"):
        list(decode_webm_frames(b.replace(b"V_VP8", b"V_VP9")))
    # flip the keyframe flag off -> honest inter-frame refusal
    raw = bytearray(b)
    at = raw.index(b"\x81\x00\x00\x80")          # block header
    raw[at + 3] = 0x00
    with pytest.raises(UnsupportedMediaError, match="inter"):
        list(decode_webm_frames(bytes(raw)))
    # lacing bits -> refusal
    raw = bytearray(b)
    raw[at + 3] = 0x80 | 0x02
    with pytest.raises(UnsupportedMediaError, match="laced"):
        list(decode_webm_frames(bytes(raw)))


def test_malformed_raises():
    with pytest.raises(ValueError, match="not a Matroska"):
        list(decode_webm_frames(b"RIFF....AVI "))
    b = encode_webm_vp8(_frames(1), qi=0)
    # strip the Tracks element id -> no video track
    with pytest.raises(ValueError, match="video track"):
        list(decode_webm_frames(
            b.replace(bytes.fromhex("1654AE6B"), bytes.fromhex("1654AE6C"))))


def test_sniffer_and_kernel_route(spark):
    from datapump_spark.operators.codecs import decode_png
    from datapump_spark.operators.mediasniff import parse_media_header
    from datapump_spark.operators.multimodal import sample_frames

    b = encode_webm_vp8(_frames(4), fps=2, qi=0)  # 500 ms/frame
    info = parse_media_header(b)
    assert (info["format"], info["kind"]) == ("mkv", "video")
    assert (info["width"], info["height"]) == (32, 16)
    assert info["duration_ms"] == 2000
    df = spark.createDataFrame([(9, bytearray(b))],
                               "media_id long, payload binary")
    rows = sorted(sample_frames(df, every_ms=1000, fake=False).collect(),
                  key=lambda r: r["frame_idx"])
    assert [r["frame_ts_ms"] for r in rows] == [0, 1000]
    png = decode_png(bytes(rows[1]["frame_png"]))
    assert (png[..., :3] == 120).all()            # frame 2 on display
