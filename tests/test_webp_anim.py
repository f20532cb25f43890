"""Animated WebP gates (operators/webp.py ANIM/ANMF walk, round 9):
per-frame sub-image decode, canvas compositing (offsets, blend,
disposal), timeline, and the frame-sampling kernel route."""

from __future__ import annotations

import numpy as np
import pytest

from datapump_spark.operators.webp import (
    decode_webp,
    decode_webp_anim_frames,
    encode_webp_anim,
)


def _solid(h, w, rgba):
    f = np.zeros((h, w, 4), np.uint8)
    f[:] = rgba
    return f


def test_lossless_fullframe_roundtrip_exact():
    f0 = _solid(10, 12, (10, 20, 30, 255))
    f1 = _solid(10, 12, (200, 100, 50, 255))
    b = encode_webp_anim([f0, f1], [120, 80])
    out = list(decode_webp_anim_frames(b))
    assert [(i, ts) for i, ts, _ in out] == [(0, 0), (1, 120)]
    assert (out[0][2] == f0).all() and (out[1][2] == f1).all()


def test_subrect_composite_and_disposal():
    base = _solid(8, 10, (10, 20, 30, 255))
    patch = _solid(4, 6, (200, 100, 50, 255))
    tail = _solid(2, 2, (1, 2, 3, 255))
    b = encode_webp_anim(
        [base, patch, tail], [100, 100, 100],
        offsets=[(0, 0), (2, 2), (0, 0)],
        dispose=[False, True, False], bg=(90, 91, 92, 255))
    f0, f1, f2 = [c for _, _, c in decode_webp_anim_frames(b)]
    # frame 1: patch overwrites its rect, base shows elsewhere
    assert (f1[2:6, 2:8] == (200, 100, 50, 255)).all()
    assert (f1[0, 0] == (10, 20, 30, 255)).all()
    # frame 2: the disposed patch rect is BACKGROUND, not base
    assert (f2[3, 3] == (90, 91, 92, 255)).all()
    assert (f2[0, 0] == (1, 2, 3, 255)).all()     # new tail frame
    assert (f2[7, 9] == (10, 20, 30, 255)).all()  # untouched base


def test_alpha_blend_over():
    base = _solid(4, 4, (100, 100, 100, 255))
    half = _solid(4, 4, (200, 200, 200, 128))     # ~50% alpha
    b = encode_webp_anim([base, half], [50, 50], blend=[False, True])
    _, f1 = [c for _, _, c in decode_webp_anim_frames(b)]
    # over an opaque canvas: out = f*a + c*(1-a), a = 128/255
    want = round(200 * (128 / 255) + 100 * (1 - 128 / 255))
    assert abs(int(f1[0, 0, 0]) - want) <= 1
    assert f1[0, 0, 3] == 255                     # stays opaque


def test_overwrite_vs_blend_semantics():
    base = _solid(4, 4, (100, 100, 100, 255))
    half = _solid(4, 4, (200, 200, 200, 128))
    b = encode_webp_anim([base, half], [50, 50], blend=[False, False])
    _, f1 = [c for _, _, c in decode_webp_anim_frames(b)]
    # B=1 (do not blend): the frame REPLACES the rect, alpha included
    assert (f1[0, 0] == (200, 200, 200, 128)).all()


def test_first_frame_still_api_and_lossy_path():
    f0 = _solid(16, 16, (60, 60, 60, 255))
    f1 = _solid(16, 16, (160, 160, 160, 255))
    b = encode_webp_anim([f0, f1], [100, 100])
    assert (decode_webp(b) == f0).all()
    # lossy VP8 frames flow through the same walk (solid qi=4 is exact)
    bl = encode_webp_anim([f[:, :, :3] for f in (f0, f1)],
                          [100, 100], lossless=False, qi=0)
    out = list(decode_webp_anim_frames(bl))
    assert len(out) == 2
    assert (out[1][2][:, :, :3] == 160).all()


def test_malformed_and_seams():
    f = _solid(4, 4, (9, 9, 9, 255))
    b = encode_webp_anim([f], [100])
    # odd offsets are unrepresentable (format stores x/2)
    with pytest.raises(ValueError, match="even"):
        encode_webp_anim([f], [100], offsets=[(1, 0)])
    # frame extending past the canvas
    with pytest.raises(ValueError, match="canvas"):
        list(decode_webp_anim_frames(
            encode_webp_anim([f], [100], canvas_size=(3, 3))))
    # bare animation flag with no ANMF frames stays a refusal
    from datapump_spark.operators.codecs import UnsupportedMediaError
    from datapump_spark.operators.webp import encode_webp_vp8x
    still = bytearray(encode_webp_vp8x(f, lossless=True))
    still[still.index(b"VP8X") + 8] |= 0x02
    with pytest.raises(UnsupportedMediaError, match="animated"):
        decode_webp(bytes(still))
    with pytest.raises(ValueError, match="not a WebP"):
        list(decode_webp_anim_frames(b"RIFF\x04\x00\x00\x00WAVE"))


def test_sample_video_frames_routes_animated_webp(spark):
    from datapump_spark.operators.codecs import decode_png
    from datapump_spark.operators.multimodal import sample_frames

    frames = [_solid(8, 8, (40 * (i + 1), 10, 10, 255)) for i in range(4)]
    b = encode_webp_anim(frames, [500] * 4)       # 2 fps
    df = spark.createDataFrame([(3, bytearray(b))],
                               "media_id long, payload binary")
    rows = sorted(sample_frames(df, every_ms=1000, fake=False).collect(),
                  key=lambda r: r["frame_idx"])
    assert [r["frame_ts_ms"] for r in rows] == [0, 1000]
    png = decode_png(bytes(rows[1]["frame_png"]))
    assert png[0, 0, 0] == 120                    # frame 2 on display
