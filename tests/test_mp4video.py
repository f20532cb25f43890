"""Photo-JPEG MP4/MOV video path gates (operators/mp4video.py, round
9) — the second real video container after MJPEG-in-AVI: the full
ISO-BMFF sample-table walk (stsd/stts/stsc/stsz/stco|co64) with real
JPEG pixel output."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from datapump_spark.operators.codecs import UnsupportedMediaError
from datapump_spark.operators.mp4video import (
    _sample_table,
    decode_mp4_frames,
    encode_mp4_mjpeg,
    mp4_video_track,
)


def _frames(n=3, h=32, w=48):
    return [np.full((h, w, 3), 20 + 40 * i, np.uint8) for i in range(n)]


def test_roundtrip_odd_sample_count():
    # 5 samples at 2-per-chunk -> 3 chunks, last chunk short: the
    # stsc run table needs its second entry
    b = encode_mp4_mjpeg(_frames(5), fps=5, quality=95)
    out = list(decode_mp4_frames(b))
    assert [(i, ts) for i, ts, _ in out] == [
        (0, 0), (1, 200), (2, 400), (3, 600), (4, 800)]
    for i, (_, _, rgb) in enumerate(out):
        assert rgb.shape == (32, 48, 3)
        assert abs(int(rgb.mean()) - (20 + 40 * i)) <= 2


def test_roundtrip_even_and_single():
    for n in (1, 4):
        b = encode_mp4_mjpeg(_frames(n, 16, 16), fps=10, quality=95)
        out = list(decode_mp4_frames(b))
        assert len(out) == n
        assert [ts for _, ts, _ in out] == [i * 100 for i in range(n)]


def test_co64_chunk_offsets():
    # hand-built stbl: same tables as the writer but chunk offsets in
    # a 64-bit co64 box — the large-file layout the writer never emits
    b = encode_mp4_mjpeg(_frames(2, 8, 8), fps=10)
    at = b.index(b"stco") - 4
    size = struct.unpack(">I", b[at:at + 4])[0]
    body = b[at + 8:at + size]
    n = int.from_bytes(body[4:8], "big")
    offs = [int.from_bytes(body[8 + i * 4:12 + i * 4], "big")
            for i in range(n)]
    co64_body = body[:8] + b"".join(o.to_bytes(8, "big") for o in offs)
    co64 = struct.pack(">I", 8 + len(co64_body)) + b"co64" + co64_body
    patched = b[:at] + co64 + b[at + size:]
    # grow every ancestor box (moov/trak/mdia/minf/stbl) by the delta
    delta = len(co64) - size
    out = bytearray(patched)
    for tag in (b"moov", b"trak", b"mdia", b"minf", b"stbl"):
        i = out.index(tag) - 4
        old = struct.unpack(">I", out[i:i + 4])[0]
        out[i:i + 4] = struct.pack(">I", old + delta)
    fourcc, timescale, deltas, sizes, offsets = mp4_video_track(bytes(out))
    # per-SAMPLE offsets: chunk base + intra-chunk accumulation
    assert fourcc == b"jpeg" and offsets == [offs[0], offs[0] + sizes[0]]
    assert len(list(decode_mp4_frames(bytes(out)))) == 2


def test_non_jpeg_codec_refused():
    b = bytearray(encode_mp4_mjpeg(_frames(1), fps=10))
    at = b.index(b"jpeg")
    b[at:at + 4] = b"avc1"
    with pytest.raises(UnsupportedMediaError, match="avc1"):
        list(decode_mp4_frames(bytes(b)))


def test_malformed_raises():
    with pytest.raises(ValueError, match="ISO-BMFF"):
        list(decode_mp4_frames(b"RIFF\x08\x00\x00\x00AVI junk"))
    b = encode_mp4_mjpeg(_frames(1), fps=10)
    # cut the stsz table out of the stbl: incomplete sample table
    at = b.index(b"stsz") - 4
    size = struct.unpack(">I", b[at:at + 4])[0]
    hollow = b[:at + 4] + b"free" + b[at + 8:]
    assert len(hollow) == len(b) and size > 8
    with pytest.raises(ValueError, match="sample table"):
        list(decode_mp4_frames(hollow))
    # a moov with no video trak at all
    with pytest.raises(ValueError, match="video track"):
        mp4_video_track(b[:b.index(b"moov") - 4])


def test_sniffer_both_paths(spark):
    from datapump_spark.operators.mediasniff import (
        parse_media_header,
        sniff_media,
    )
    b = encode_mp4_mjpeg(_frames(4, 24, 40), fps=10)
    info = parse_media_header(b)
    assert info["format"] == "mp4" and info["kind"] == "video"
    assert (info["width"], info["height"]) == (40, 24)
    assert info["duration_ms"] == 400
    df = spark.createDataFrame([(1, bytearray(b))],
                               "media_id long, payload binary")
    for strategy in ("expr", "pandas"):
        row = sniff_media(df, strategy=strategy).collect()[0]
        assert (row["format"], row["kind"]) == ("mp4", "video"), strategy
    # dims/duration need the box walk: the pandas kernel's job (the
    # expr path abstains with nulls — variable box layout, by design)
    row = sniff_media(df, strategy="pandas").collect()[0]
    assert (row["width"], row["height"]) == (40, 24)
    assert row["duration_ms"] == 400


def test_sample_video_frames_dispatches_both_containers(spark):
    """One DataFrame mixing an MJPEG AVI and a photo-JPEG MP4: the
    kernel dispatches on magic bytes and both decode for real."""
    from datapump_spark.operators.avi import encode_avi_mjpeg
    from datapump_spark.operators.codecs import decode_png
    from datapump_spark.operators.multimodal import sample_frames

    avi = encode_avi_mjpeg(_frames(4, 16, 16), fps=2, quality=95)
    mp4 = encode_mp4_mjpeg(_frames(4, 16, 16), fps=2, quality=95)
    df = spark.createDataFrame(
        [(1, bytearray(avi)), (2, bytearray(mp4))],
        "media_id long, payload binary")
    rows = sorted(sample_frames(df, every_ms=1000, fake=False).collect(),
                  key=lambda r: (r["media_id"], r["frame_idx"]))
    # 4 frames at 500 ms spacing -> ticks 0 and 1000 show frames 0, 2
    assert [(r["media_id"], r["frame_ts_ms"]) for r in rows] == [
        (1, 0), (1, 1000), (2, 0), (2, 1000)]
    for r in rows[2:]:
        png = decode_png(bytes(r["frame_png"]))
        want = 20 + 40 * (2 * (r["frame_ts_ms"] // 1000))
        assert abs(int(png[..., :3].mean()) - want) <= 2
