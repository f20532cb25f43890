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
    # r11: the VP8 frame tag is authoritative, not the SimpleBlock
    # flag — an inter-tagged payload with no prior key frame raises
    raw = bytearray(b)
    at = raw.index(b"\x81\x00\x00\x80")          # block header
    raw[at + 3] = 0x00                           # clear block kf flag
    raw[at + 4] |= 1                             # VP8 tag: inter frame
    with pytest.raises(ValueError, match="before any key frame"):
        list(decode_webm_frames(bytes(raw)))
    # lacing bits on an UNlaced block: the frame count byte eats the
    # first payload byte, so the sizes cannot fit — malformed, caught
    # (real laced blocks DECODE since r10 — test_laced_blocks_decode)
    raw = bytearray(b)
    raw[at + 3] = 0x80 | 0x02
    with pytest.raises(ValueError):
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


def test_laced_blocks_decode():
    """r10: Xiph, EBML and fixed lacing — all frames of one laced
    SimpleBlock decode (sharing the block timestamp); sizes come from
    the lacing header with the last frame as remainder."""
    frames = [np.full((16, 16, 3), 40 * (i + 1), np.uint8)
              for i in range(4)]
    ref = [f for _, _, f in decode_webm_frames(
        encode_webm_vp8(frames, qi=0))]
    for mode in ("xiph", "ebml"):
        got = list(decode_webm_frames(
            encode_webm_vp8(frames, qi=0, lacing=mode)))
        assert [i for i, _, _ in got] == [0, 1, 2, 3], mode
        for (_, ts, f), r in zip(got, ref):
            assert ts == 0 and (f == r).all(), mode
    # fixed lacing needs byte-identical payloads: identical frames
    same = [np.full((16, 16, 3), 77, np.uint8)] * 4
    got = list(decode_webm_frames(
        encode_webm_vp8(same, qi=0, lacing="fixed")))
    assert len(got) == 4 and all((f == 77).all() for _, _, f in got)
    # variable-size frames through xiph/ebml (fixed would refuse)
    var = [np.full((16 * (i + 1), 16, 3), 90, np.uint8) for i in range(3)]
    for mode in ("xiph", "ebml"):
        got = list(decode_webm_frames(
            encode_webm_vp8(var, qi=0, lacing=mode)))
        assert [f.shape[0] for _, _, f in got] == [16, 32, 48], mode
    with pytest.raises(ValueError, match="equal frame sizes"):
        encode_webm_vp8(var, qi=0, lacing="fixed")
    # r11 advice fix: a SINGLE-frame laced block stores count-1 = 0
    # size fields; the EBML branch used to still write the first-size
    # vint, which the reader then consumed as frame data.
    one = [np.full((16, 16, 3), 55, np.uint8)]
    for mode in ("xiph", "ebml", "fixed"):
        got = list(decode_webm_frames(
            encode_webm_vp8(one, qi=0, lacing=mode)))
        assert len(got) == 1 and (got[0][2] == 55).all(), mode


def test_laced_seams_stay_honest():
    frames = [np.full((16, 16, 3), 80, np.uint8)] * 2
    b = bytearray(encode_webm_vp8(frames, qi=0, lacing="xiph"))
    # corrupt the lace count so sizes exceed the block
    at = b.index(b"\x81\x00\x00")        # block: track 1, rel 0...
    assert b[at + 3] & 0x06              # flags carry lacing bits
    b[at + 4] = 250                      # claim 251 frames
    with pytest.raises(ValueError):
        list(decode_webm_frames(bytes(b)))
