"""GIF codec (operators/gif.py): LZW round-trips under dictionary
pressure, interlacing, transparency/disposal compositing, animation
frames, seams. The encoder is palette-exact (GIF is lossless within 256
colors), so every round-trip assertion is equality, not a bound.

Decoder-independence guard: the compositing tests hand-build streams
(descriptor offsets, graphic-control blocks) rather than relying on the
encoder, which never emits multi-frame or transparent streams."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from datapump_spark.operators.codecs import UnsupportedMediaError
from datapump_spark.operators.gif import (
    _lzw_encode,
    decode_gif,
    decode_gif_frames,
    encode_gif,
)


def test_roundtrip_simple_palette():
    img = np.zeros((20, 30, 3), np.uint8)
    img[:, :15] = [255, 0, 0]
    img[10:, 15:] = [0, 128, 255]
    assert (decode_gif(encode_gif(img)) == img).all()


def test_roundtrip_full_palette_under_dictionary_pressure():
    """256 random colors over 19 200 pixels: crosses every LZW code-width
    boundary and forces a 12-bit dictionary reset."""
    rng = np.random.default_rng(5)
    pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
    img = pal[rng.integers(0, 256, (120, 160))]
    assert (decode_gif(encode_gif(img)) == img).all()


def test_roundtrip_interlaced():
    rng = np.random.default_rng(6)
    pal = rng.integers(0, 256, (64, 3), dtype=np.uint8)
    img = pal[rng.integers(0, 64, (33, 21))]   # h not divisible by 8
    assert (decode_gif(encode_gif(img, interlace=True)) == img).all()


def test_roundtrip_tiny_and_two_color():
    img = np.zeros((1, 1, 3), np.uint8)
    assert (decode_gif(encode_gif(img)) == img).all()
    img2 = np.zeros((3, 3, 3), np.uint8)
    img2[1, 1] = 255
    assert (decode_gif(encode_gif(img2)) == img2).all()


def test_too_many_colors_raises():
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)  # ~1k colors
    with pytest.raises(UnsupportedMediaError, match="palette"):
        encode_gif(img)


def _hand_built_two_frame() -> bytes:
    """2×2 canvas: frame 1 solid red; frame 2 a 1×1 transparent-aware
    green patch at (1,1) with delay 50 ms."""
    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 0, 0, 0])  # R,G,B,pad
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", 2, 2, 0x80 | 0x01, 3, 0)  # 4-entry GCT
    out += pal

    def frame(x, y, w, h, indices, transparent=None, delay_cs=0):
        seg = bytearray()
        flags = 0x01 if transparent is not None else 0x00
        seg += bytes([0x21, 0xF9, 4, flags])
        seg += struct.pack("<H", delay_cs)
        seg += bytes([transparent or 0, 0])
        seg += struct.pack("<BHHHHB", 0x2C, x, y, w, h, 0)
        seg += bytes([2])  # min code size
        seg += _lzw_encode(np.array(indices, np.int32), 2)
        seg += b"\x00"
        return seg

    out += frame(0, 0, 2, 2, [0, 0, 0, 0])                  # all red
    out += frame(1, 1, 1, 1, [1], transparent=None, delay_cs=5)  # green px
    out += b"\x3b"
    return bytes(out)


def test_multiframe_compositing_and_delays():
    frames = list(decode_gif_frames(_hand_built_two_frame()))
    assert len(frames) == 2
    f1, d1 = frames[0]
    f2, d2 = frames[1]
    assert (f1 == [255, 0, 0]).all()
    assert d1 == 0 and d2 == 50
    assert (f2[1, 1] == [0, 255, 0]).all()      # patch composited
    assert (f2[0, 0] == [255, 0, 0]).all()      # rest persists


def test_first_frame_via_decode_image_dispatch():
    from datapump_spark.operators.codecs import decode_image

    img = decode_image(_hand_built_two_frame())
    assert img.shape == (2, 2, 3)
    assert (img == [255, 0, 0]).all()


def test_transparency_keeps_underlying_pixels():
    pal = bytes([10, 10, 10, 200, 200, 200] + [0] * 6)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", 2, 1, 0x80 | 0x01, 0, 0)
    out += pal
    out += bytes([0x21, 0xF9, 4, 0x00, 0, 0, 0, 0])
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, 2, 1, 0)
    out += bytes([2]) + _lzw_encode(np.array([0, 1], np.int32), 2) + b"\x00"
    # second frame: full-size, index 0 transparent, index 1 drawn
    out += bytes([0x21, 0xF9, 4, 0x01, 0, 0, 0, 0])
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, 2, 1, 0)
    out += bytes([2]) + _lzw_encode(np.array([0, 0], np.int32), 2) + b"\x00"
    out += b"\x3b"
    frames = [f for f, _ in decode_gif_frames(bytes(out))]
    # transparent second frame leaves frame-1 pixels in place
    assert (frames[1] == frames[0]).all()


def test_seams():
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"NOPE")
    with pytest.raises(ValueError):
        decode_gif(b"GIF89a" + b"\x00" * 8)  # no image data


def _animated(colors, delay_cs) -> bytes:
    """n solid 2×2 frames from a 4-entry palette, each with the given
    delay (hand-built; the encoder is single-frame by design)."""
    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255])
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", 2, 2, 0x80 | 0x01, 0, 0)
    out += pal
    for c, d in zip(colors, delay_cs):
        out += bytes([0x21, 0xF9, 4, 0x00]) + struct.pack("<H", d) \
            + bytes([0, 0])
        out += struct.pack("<BHHHHB", 0x2C, 0, 0, 2, 2, 0)
        out += bytes([2])
        out += _lzw_encode(np.array([c] * 4, np.int32), 2) + b"\x00"
    out += b"\x3b"
    return bytes(out)


def test_gce_scope_does_not_leak_to_next_frame():
    """A Graphic Control Extension governs only the single image that
    follows it (GIF89a §23): frame 1 declares index 1 transparent; frame
    2 has NO GCE and paints index 1 — its pixels must render (and its
    delay must read 0), not inherit frame 1's transparency/delay."""
    pal = bytes([255, 0, 0, 0, 255, 0] + [0] * 6)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", 2, 1, 0x80 | 0x01, 0, 0)
    out += pal
    # frame 1: GCE transparent=1, delay 30 cs; paints [0, 1]
    out += bytes([0x21, 0xF9, 4, 0x01]) + struct.pack("<H", 30) \
        + bytes([1, 0])
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, 2, 1, 0)
    out += bytes([2]) + _lzw_encode(np.array([0, 1], np.int32), 2) + b"\x00"
    # frame 2: NO GCE; paints [1, 1]
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, 2, 1, 0)
    out += bytes([2]) + _lzw_encode(np.array([1, 1], np.int32), 2) + b"\x00"
    out += b"\x3b"
    frames = list(decode_gif_frames(bytes(out)))
    (f1, d1), (f2, d2) = frames
    assert d1 == 300 and d2 == 0
    # frame 1: pixel 1 transparent → background (red, the bg color)
    assert tuple(f1[0, 0]) == (255, 0, 0)
    # frame 2: index 1 must PAINT green everywhere (no inherited
    # transparency)
    assert (f2 == [0, 255, 0]).all()


@pytest.mark.slow  # sampling timeline + compositing are pinned by the
# pure hand-built-animation tests above; this adds the Spark wiring
def test_sample_gif_frames_real_path(spark):
    """Distributed REAL animation sampling: 3 frames × 200 ms sampled at
    100 ms ticks → each frame emitted twice, PNG payloads decode back to
    the right solid color; a corrupt payload nulls out, not crashes."""
    from datapump_spark.operators.codecs import decode_png
    from datapump_spark.operators.multimodal import sample_gif_frames

    anim = _animated([0, 1, 2], [20, 20, 20])       # 3 × 200 ms
    df = spark.createDataFrame(
        [(1, bytearray(anim)), (2, bytearray(b"GIF89a-corrupt"))],
        "media_id long, payload binary")
    rows = sorted(sample_gif_frames(df, every_ms=100).collect(),
                  key=lambda r: r["frame_idx"])
    assert [r["media_id"] for r in rows] == [1] * 6
    assert [r["frame_ts_ms"] for r in rows] == [0, 100, 200, 300, 400, 500]
    expect = [(255, 0, 0)] * 2 + [(0, 255, 0)] * 2 + [(0, 0, 255)] * 2
    for r, rgb in zip(rows, expect):
        img = decode_png(bytes(r["frame_png"]))
        assert img.shape == (2, 2, 3)
        assert tuple(img[0, 0]) == rgb
    # raise mode propagates the corrupt payload
    with pytest.raises(Exception):
        sample_gif_frames(df, every_ms=100, on_error="raise").collect()


def test_deferred_clear_codes_foreign_stream():
    """Foreign-encoder fixture (r9, hand-built LZW stream): when the
    code table fills at 4096, many real encoders EMIT NO CLEAR CODE
    and keep coding from the frozen table (the 'deferred clear'
    GIF89a allowance). Our own encoder always clears at the cap, so
    only a custom stream exercises the frozen-table decode path."""
    import struct

    import numpy as np

    from datapump_spark.operators.gif import decode_gif

    rng = np.random.default_rng(42)
    h, w = 80, 80                        # 6400 px: fills 4096 at 8-bit
    idx = rng.integers(0, 256, (h, w)).astype(np.int32)

    # GIF-variant LZW encoder that NEVER emits clear after the initial
    # one: at table-full it freezes the table (deferred clear)
    min_code = 8
    clear, eoi = 256, 257
    table = {bytes([i]): i for i in range(256)}
    next_code, width = 258, 9
    acc = nbits = 0
    data = bytearray()

    def emit(code):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    prev = b""
    frozen = False
    for v in idx.reshape(-1):
        cur = prev + bytes([int(v)])
        if cur in table:
            prev = cur
            continue
        emit(table[prev])
        if not frozen:
            table[cur] = next_code
            next_code += 1
            if next_code > (1 << width):
                if width < 12:
                    width += 1
                else:
                    frozen = True        # deferred clear: just stop
        prev = bytes([int(v)])
    if prev:
        emit(table[prev])
    emit(eoi)
    if nbits:
        data.append(acc & 0xFF)
    assert frozen, "fixture must actually reach the 4096 cap"

    pal = np.stack([np.arange(256)] * 3, axis=1).astype(np.uint8)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | 7, 0, 0)
    out += pal.tobytes()
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)
    out += bytes([min_code])
    for i in range(0, len(data), 255):   # sub-block the stream
        blk = data[i:i + 255]
        out += bytes([len(blk)]) + blk
    out += b"\x00\x3b"

    img = decode_gif(bytes(out))
    assert np.array_equal(img[..., 0].astype(np.int32), idx)
