"""Pure-stdlib codecs (operators/codecs.py): PNG/BMP/WAV real decode.

The PNG filter tests build the compressed stream by FORWARD-filtering a
known image in test code (an independent implementation of the spec's
direction), so decode must invert it exactly — not just round-trip the
encoder's filter-0 output.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from datapump_spark.operators import codecs
from datapump_spark.operators.codecs import (
    PNG_SIG,
    UnsupportedMediaError,
    decode_bmp,
    decode_image,
    decode_png,
    decode_wav,
    encode_bmp,
    encode_png,
    encode_wav,
    resize_nearest,
)


def _img(h, w, c, seed=0):
    return np.random.default_rng(seed).integers(0, 256, (h, w, c), np.uint8)


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_png_roundtrip(channels):
    img = _img(13, 17, channels, seed=channels)
    out = decode_png(encode_png(img))
    assert out.shape == img.shape
    assert (out == img).all()


def test_png_gray_2d_input():
    img = _img(5, 6, 1)[:, :, 0]
    out = decode_png(encode_png(img))
    assert out.shape == (5, 6, 1)
    assert (out[:, :, 0] == img).all()


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data)))


def _forward_filter(img: np.ndarray, ftype: int) -> bytes:
    """Spec-direction scanline filtering (independent of the decoder's
    inverse): returns the raw pre-compression byte stream."""
    h, w, c = img.shape
    rows = img.reshape(h, w * c).astype(np.int64)
    stride = w * c
    out = bytearray()
    prev = np.zeros(stride, np.int64)
    for y in range(h):
        cur = rows[y]
        line = bytearray([ftype])
        for x in range(stride):
            a = int(cur[x - c]) if x >= c else 0
            b = int(prev[x])
            cc = int(prev[x - c]) if x >= c else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) >> 1
            else:  # Paeth
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
            line.append((int(cur[x]) - pred) & 0xFF)
        out += line
        prev = cur
    return bytes(out)


def _assemble_png(img: np.ndarray, raw: bytes, color: int) -> bytes:
    h, w, c = img.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(raw))
            + _png_chunk(b"IEND", b""))


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_png_all_filter_types_invert(ftype):
    img = _img(7, 9, 3, seed=ftype + 10)
    b = _assemble_png(img, _forward_filter(img, ftype), color=2)
    assert (decode_png(b) == img).all()


def test_png_mixed_filters_per_row():
    img = _img(5, 4, 4, seed=99)
    h, w, c = img.shape
    # one row per filter type, then filter 0 for the remainder
    raw = bytearray()
    for y in range(h):
        one = _forward_filter(img[max(0, y - 1):y + 1], min(y, 4))
        # _forward_filter filters the LAST row of the slice against the
        # row before it (or zeros for y=0), matching stream semantics
        raw += one[-(1 + w * c):]
    b = _assemble_png(img, bytes(raw), color=6)
    assert (decode_png(b) == img).all()


def test_png_palette_resolves_to_rgb():
    pal = _img(1, 16, 3, seed=3).reshape(16, 3)
    idx = np.random.default_rng(4).integers(0, 16, (6, 8, 1), np.uint8)
    raw = _forward_filter(idx, 0)
    ihdr = struct.pack(">IIBBBBB", 8, 6, 8, 3, 0, 0, 0)
    b = (PNG_SIG + _png_chunk(b"IHDR", ihdr)
         + _png_chunk(b"PLTE", pal.tobytes())
         + _png_chunk(b"IDAT", zlib.compress(raw))
         + _png_chunk(b"IEND", b""))
    out = decode_png(b)
    assert out.shape == (6, 8, 3)
    assert (out == pal[idx[:, :, 0]]).all()


def test_png_out_of_scope_raises():
    img = _img(4, 4, 3)
    # sub-byte depth on a TRUECOLOR image is invalid per spec
    ihdr = struct.pack(">IIBBBBB", 4, 4, 4, 2, 0, 0, 0)
    b = (PNG_SIG + _png_chunk(b"IHDR", ihdr)
         + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 100)))
    with pytest.raises(UnsupportedMediaError, match="bit depth"):
        decode_png(b)
    # Adam7 interlace decodes since round 8, but a corrupt interlaced
    # stream (wrong total length) still fails loudly
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 1)
    b = (PNG_SIG + _png_chunk(b"IHDR", ihdr)
         + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 100)))
    with pytest.raises(ValueError, match="interlaced IDAT"):
        decode_png(b)
    with pytest.raises(ValueError):
        decode_png(b"\x89PNG-not-really")
    # truncated IDAT must raise, not return garbage
    good = encode_png(img)
    with pytest.raises(ValueError):
        decode_png(good[:40] + _png_chunk(b"IDAT", zlib.compress(b"\x00"))
                   + _png_chunk(b"IEND", b""))


# ---------------------------------------------------------------------------
# BMP
# ---------------------------------------------------------------------------

def test_bmp_roundtrip_with_row_padding():
    # w=11 → 33-byte rows padded to 36: exercises the stride math
    img = _img(9, 11, 3, seed=7)
    out = decode_bmp(encode_bmp(img))
    assert (out == img).all()


def test_bmp_top_down_and_32bit():
    img = _img(3, 2, 3, seed=8)
    b = bytearray(encode_bmp(img))
    # flip height sign → top-down; rows were written bottom-up, so the
    # decoded image must come back vertically flipped
    h = struct.unpack("<i", bytes(b[22:26]))[0]
    b[22:26] = struct.pack("<i", -h)
    assert (decode_bmp(bytes(b)) == img[::-1]).all()
    # hand-built 32-bit BGRA, top-down, single pixel (B,G,R,A)=(1,2,3,9)
    info = struct.pack("<IiiHHIIiiII", 40, 1, -1, 1, 32, 0, 4, 0, 0, 0, 0)
    hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + 4, 0, 0, 54)
    out = decode_bmp(hdr + info + bytes([1, 2, 3, 9]))
    assert out.shape == (1, 1, 3) and list(out[0, 0]) == [3, 2, 1]


def test_bmp_out_of_scope_raises():
    img = _img(2, 2, 3)
    b = bytearray(encode_bmp(img))
    b[30:34] = struct.pack("<I", 1)  # BI_RLE8
    with pytest.raises(UnsupportedMediaError, match="compression"):
        decode_bmp(bytes(b))


# ---------------------------------------------------------------------------
# WAV
# ---------------------------------------------------------------------------

def test_wav_roundtrip_16bit_stereo():
    t = np.arange(400) / 100.0
    s = np.stack([np.sin(t), np.cos(t)], axis=1) * 0.8
    out, sr = decode_wav(encode_wav(s, 16000))
    assert sr == 16000 and out.shape == (400, 2)
    assert np.abs(out - s).max() < 1e-4


def test_wav_noncanonical_chunk_order_and_odd_padding():
    s = np.linspace(-0.5, 0.5, 101)
    canonical = encode_wav(s, 8000)
    fmt_chunk = canonical[12:36]          # 'fmt ' + len + 16 bytes
    data_chunk = canonical[36:]
    # LIST chunk with ODD length before fmt — walker must pad to even
    lst = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    body = lst + fmt_chunk + data_chunk
    b = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    out, sr = decode_wav(b)
    assert sr == 8000 and out.shape == (101, 1)
    assert np.abs(out[:, 0] - s).max() < 1e-4


def test_wav_8bit_and_float32():
    # 8-bit unsigned PCM: 128 → 0.0, 255 → ~1.0
    fmt = struct.pack("<HHIIHH", 1, 1, 4000, 4000, 1, 8)
    data = bytes([0, 128, 255])
    b = (b"RIFF" + struct.pack("<I", 36 + 3) + b"WAVE"
         + b"fmt " + struct.pack("<I", 16) + fmt
         + b"data" + struct.pack("<I", 3) + data)
    out, sr = decode_wav(b)
    assert sr == 4000
    assert np.allclose(out[:, 0], [-1.0, 0.0, 127 / 128])
    # IEEE float32
    f = np.array([0.25, -0.75], "<f4")
    fmt = struct.pack("<HHIIHH", 3, 1, 4000, 16000, 4, 32)
    b = (b"RIFF" + struct.pack("<I", 36 + 8) + b"WAVE"
         + b"fmt " + struct.pack("<I", 16) + fmt
         + b"data" + struct.pack("<I", 8) + f.tobytes())
    out, _ = decode_wav(b)
    assert np.allclose(out[:, 0], [0.25, -0.75])


def test_wav_out_of_scope_raises():
    # GSM 6.10 (0x31) — a format the decoder genuinely does not cover
    # (MS-ADPCM format 2 decodes as of r12)
    fmt = struct.pack("<HHIIHH", 0x31, 1, 8000, 8000, 65, 0)
    b = (b"RIFF" + struct.pack("<I", 36) + b"WAVE"
         + b"fmt " + struct.pack("<I", 16) + fmt
         + b"data" + struct.pack("<I", 0))
    with pytest.raises(UnsupportedMediaError):
        decode_wav(b)


# ---------------------------------------------------------------------------
# Resize + dispatch
# ---------------------------------------------------------------------------

def test_resize_nearest_pins():
    img = np.arange(16, dtype=np.uint8).reshape(4, 4, 1)
    up = resize_nearest(img, 8, 8)
    assert up.shape == (8, 8, 1)
    # half-pixel centers: output pixel (0,0) samples input (0,0),
    # output (7,7) samples input (3,3)
    assert up[0, 0, 0] == 0 and up[7, 7, 0] == 15
    down = resize_nearest(img, 2, 2)
    # centers at input rows/cols 1 and 3
    assert down[:, :, 0].tolist() == [[5, 7], [13, 15]]
    # identity resize is exact
    assert (resize_nearest(img, 4, 4) == img).all()


def test_decode_image_dispatch_and_seams():
    img = _img(3, 5, 3, seed=11)
    assert (decode_image(encode_png(img)) == img).all()
    assert (decode_image(encode_bmp(img)) == img).all()
    # baseline JPEG now decodes for real (operators/jpeg.py); lossy, so
    # bound the error instead of requiring identity
    from datapump_spark.operators.jpeg import encode_jpeg

    out = decode_image(encode_jpeg(img, quality=95))
    assert out.shape == img.shape
    assert abs(out.astype(int) - img.astype(int)).mean() < 8
    # progressive JPEG (SOF2) decodes for real since round 8 — and
    # reconstructs the SAME pixels as baseline (identical coefficients)
    from datapump_spark.operators.jpeg import encode_jpeg_progressive

    assert (decode_image(encode_jpeg_progressive(img, quality=95))
            == out).all()
    # arithmetic coding (SOF9) decodes for real since round 10 — and
    # reconstructs the SAME pixels as baseline (identical coefficients)
    from datapump_spark.operators.jpeg_arith import encode_jpeg_arith

    assert (decode_image(encode_jpeg_arith(img, quality=95)) == out).all()
    # corrupt/truncated JPEG fails loudly, not silently
    with pytest.raises(ValueError):
        decode_image(b"\xff\xd8\xff\xe0" + b"\x00" * 32)
    # GIF now decodes for real (operators/gif.py) — palette-exact
    from datapump_spark.operators.gif import encode_gif

    assert (decode_image(encode_gif(img)) == img).all()
    # lossless WebP (VP8L) decodes for real since round 8 — exact
    from datapump_spark.operators.webp import encode_webp_vp8l

    assert (decode_image(encode_webp_vp8l(img)) == img).all()
    # lossy WebP (VP8) and VP8X stills decode for real since round 9
    # (operators/vp8.py, webp.decode_webp_extended); ANIMATED extended
    # files are the remaining honest seam
    from datapump_spark.operators.vp8 import encode_webp_vp8
    from datapump_spark.operators.webp import encode_webp_vp8x

    lossy = decode_image(encode_webp_vp8(
        np.full((16, 16, 3), 99, np.uint8), qi=0))
    assert (lossy == 99).all()
    anim = bytearray(encode_webp_vp8x(
        np.full((16, 16, 3), 5, np.uint8), qi=0))
    anim[anim.index(b"VP8X") + 8] |= 0x02
    with pytest.raises(UnsupportedMediaError, match="animated"):
        decode_image(bytes(anim))
    with pytest.raises(ValueError, match="unrecognized"):
        decode_image(b"not media at all")


def test_codecs_agree_with_header_sniffer():
    """The real decoders and the header sniffer must report the same
    dimensions/rates on files they both understand."""
    from datapump_spark.operators.mediasniff import parse_media_header
    img = _img(21, 34, 3, seed=12)
    for payload in (encode_png(img), encode_bmp(img)):
        meta = parse_media_header(payload)
        assert (meta["width"], meta["height"]) == (34, 21)
        dec = decode_image(payload)
        assert dec.shape == (meta["height"], meta["width"], 3)
    wav = encode_wav(np.zeros(1600), 16000)
    meta = parse_media_header(wav)
    s, sr = decode_wav(wav)
    assert meta["sample_rate"] == sr == 16000
    assert meta["channels"] == s.shape[1] == 1
    assert meta["duration_ms"] == s.shape[0] * 1000 // sr == 100


@pytest.mark.parametrize("shape", [(1, 1), (7, 7, 3), (8, 8, 4),
                                   (13, 17, 3), (33, 41), (5, 9, 2)])
def test_adam7_interlaced_png_roundtrip(shape):
    """Adam7 (round 8): the seven sub-images scatter back exactly for
    every color type and for dimensions that leave passes empty."""
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    out = decode_png(encode_png(img, interlace=True))
    want = img if img.ndim == 3 else img[:, :, None]
    assert np.array_equal(out, want)


def test_png_sub_byte_and_16bit_depths():
    """Round 8: 1/2/4-bit grayscale+palette unpack MSB-first (grayscale
    scales to 0..255 exactly); 16-bit keeps the high byte."""
    def build(w, h, depth, color, raw, plte=None):
        ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, 0)
        out = PNG_SIG + _png_chunk(b"IHDR", ihdr)
        if plte is not None:
            out += _png_chunk(b"PLTE", plte)
        return out + _png_chunk(b"IDAT", zlib.compress(raw)) \
            + _png_chunk(b"IEND", b"")

    # 1-bit checkerboard
    bits = np.indices((3, 10)).sum(0) % 2
    raw = b"".join(b"\x00" + np.packbits(r.astype(np.uint8)).tobytes()
                   for r in bits)
    img = decode_png(build(10, 3, 1, 0, raw))
    assert (img[:, :, 0] == bits * 255).all()

    # 2-bit grayscale: 0..3 -> 0/85/170/255
    img = decode_png(build(7, 1, 2, 0, b"\x00\x1b\xe4"))
    assert list(img[0, :, 0]) == [0, 85, 170, 255, 255, 170, 85]

    # 4-bit palette
    pal = np.arange(48, dtype=np.uint8).reshape(16, 3)
    img = decode_png(build(5, 1, 4, 3, b"\x00\x0f\x78\x30",
                           plte=pal.tobytes()))
    assert (img[0] == pal[[0, 15, 7, 8, 3]]).all()

    # 16-bit RGB: high-byte projection
    img = decode_png(build(1, 1, 16, 2, b"\x00\x12\x34\xff\x00\x00\xff"))
    assert list(img[0, 0]) == [0x12, 0xFF, 0x00]


# ---------------------------------------------------------------------------
# IMA-ADPCM WAV (round 8)
# ---------------------------------------------------------------------------

def test_adpcm_wav_roundtrip_mono_and_stereo():
    """IMA/DVI ADPCM (format tag 0x11): block headers carry predictor +
    step index, nibbles decode through the standard tables. 4-bit
    quantization bounds the error (~2% of full scale for smooth
    signals)."""
    from datapump_spark.operators.codecs import encode_wav_adpcm
    t = np.arange(5000) / 8000.0
    sine = 0.6 * np.sin(2 * np.pi * 440 * t)
    out, sr = decode_wav(encode_wav_adpcm(sine, 8000))
    assert sr == 8000 and out.shape[1] == 1
    n = min(len(sine), out.shape[0])
    assert np.abs(out[:n, 0] - sine[:n]).max() < 0.04
    # quiet signals quantize much tighter
    quiet = 0.01 * np.sin(2 * np.pi * 100 * t)
    out, _ = decode_wav(encode_wav_adpcm(quiet, 8000))
    assert np.abs(out[:n, 0] - quiet[:n]).max() < 0.001
    # stereo with a small block size (per-channel 4-byte group layout)
    stereo = np.stack([sine, 0.3 * np.cos(2 * np.pi * 220 * t)], axis=1)
    out, _ = decode_wav(encode_wav_adpcm(stereo, 8000, block_align=512))
    n = min(5000, out.shape[0])
    assert np.abs(out[:n] - stereo[:n]).max() < 0.04


def test_adpcm_invalid_block_align_raises():
    from datapump_spark.operators.codecs import encode_wav_adpcm
    b = bytearray(encode_wav_adpcm(np.zeros(100), 8000))
    at = b.index(b"fmt ") + 8 + 12
    b[at:at + 2] = (2).to_bytes(2, "little")   # block_align <= 4*ch
    with pytest.raises(ValueError, match="block align"):
        decode_wav(bytes(b))


def test_png_trns_transparency():
    """tRNS (round 8): palette per-entry alpha; gray/RGB color keys
    (compared via the same high-byte projection as 16-bit samples)."""
    pal = np.arange(24, dtype=np.uint8).reshape(8, 3)
    ihdr = struct.pack(">IIBBBBB", 4, 1, 8, 3, 0, 0, 0)
    b = (PNG_SIG + _png_chunk(b"IHDR", ihdr)
         + _png_chunk(b"PLTE", pal.tobytes())
         + _png_chunk(b"tRNS", bytes([255, 255, 255, 0]))
         + _png_chunk(b"IDAT", zlib.compress(
             b"\x00" + bytes([0, 3, 7, 5])))
         + _png_chunk(b"IEND", b""))
    img = decode_png(b)
    assert img.shape == (1, 4, 4)
    assert list(img[0, :, 3]) == [255, 0, 255, 255]

    ihdr = struct.pack(">IIBBBBB", 3, 1, 8, 0, 0, 0, 0)
    b = (PNG_SIG + _png_chunk(b"IHDR", ihdr)
         + _png_chunk(b"tRNS", struct.pack(">H", 10))
         + _png_chunk(b"IDAT", zlib.compress(b"\x00" + bytes([10, 20, 10])))
         + _png_chunk(b"IEND", b""))
    assert list(decode_png(b)[0, :, 1]) == [0, 255, 0]

    ihdr = struct.pack(">IIBBBBB", 2, 1, 8, 2, 0, 0, 0)
    b = (PNG_SIG + _png_chunk(b"IHDR", ihdr)
         + _png_chunk(b"tRNS", struct.pack(">HHH", 1, 2, 3))
         + _png_chunk(b"IDAT", zlib.compress(
             b"\x00" + bytes([1, 2, 3, 9, 9, 9])))
         + _png_chunk(b"IEND", b""))
    assert list(decode_png(b)[0, :, 3]) == [0, 255]


def test_adpcm_fact_chunk_truncates_padding():
    """The fact chunk (mandatory for compressed WAV) carries the true
    frame count; decode drops the encoder's final-block padding
    (round-8 review finding: padded frames inflated n_frames/duration
    for any non-block-multiple signal)."""
    from datapump_spark.operators.codecs import encode_wav_adpcm
    sig = np.stack([np.sin(np.arange(4000) / 30.0),
                    np.cos(np.arange(4000) / 17.0)], axis=1) * 0.5
    out, _ = decode_wav(encode_wav_adpcm(sig, 8000, block_align=256))
    assert out.shape == (4000, 2)
    out, _ = decode_wav(encode_wav_adpcm(
        0.3 * np.sin(np.arange(777) / 9.0), 8000))
    assert out.shape[0] == 777


def test_adam7_interlaced_palette_with_trns():
    """Foreign-style fixture (r9): Adam7-interlaced color-type-3 PNG
    with per-entry tRNS alpha — a combination our encoder never emits
    (it writes RGB), so the pass-extraction x palette x alpha
    interaction only a hand-built file exercises."""
    from datapump_spark.operators.codecs import _ADAM7

    h = w = 8
    idx = (np.arange(h * w).reshape(h, w) % 4).astype(np.uint8)
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255],
                    [7, 7, 7]], np.uint8)
    raw = bytearray()
    for x0, y0, dx, dy in _ADAM7:
        sub = idx[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        for row in sub:
            raw += b"\x00" + row.tobytes()     # filter 0 per pass row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 1)  # interlace=1
    b = (PNG_SIG + _png_chunk(b"IHDR", ihdr)
         + _png_chunk(b"PLTE", pal.tobytes())
         + _png_chunk(b"tRNS", bytes([255, 128, 0]))     # entry 3 opaque
         + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
         + _png_chunk(b"IEND", b""))
    img = decode_png(b)
    assert img.shape == (h, w, 4)
    assert np.array_equal(img[..., :3].reshape(-1, 3), pal[idx.reshape(-1)])
    alpha = np.array([255, 128, 0, 255], np.uint8)
    assert np.array_equal(img[..., 3].reshape(-1), alpha[idx.reshape(-1)])


def test_g711_conformance_vs_audioop():
    """r12: mu-law/A-law decode tables and encoders pinned BYTE-EXACT
    against CPython's audioop (C G.711 reference) over the FULL
    domains — all 256 companded bytes, all 65536 PCM values."""
    import warnings

    import numpy as np

    from datapump_spark.operators.codecs import (
        _encode_g711,
        _g711_decode_tables,
        decode_wav,
        encode_wav_g711,
    )

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        import audioop
    alaw, ulaw = _g711_decode_tables()
    assert (ulaw == np.frombuffer(
        audioop.ulaw2lin(bytes(range(256)), 2), "<i2")).all()
    assert (alaw == np.frombuffer(
        audioop.alaw2lin(bytes(range(256)), 2), "<i2")).all()
    x = np.arange(-32768, 32768, dtype=np.int16)
    assert (_encode_g711(x, "ulaw") == np.frombuffer(
        audioop.lin2ulaw(x.tobytes(), 2), np.uint8)).all()
    assert (_encode_g711(x, "alaw") == np.frombuffer(
        audioop.lin2alaw(x.tobytes(), 2), np.uint8)).all()
    # WAV container round trip (format tags 7/6) within companding error
    t = np.sin(np.linspace(0, 440 * 2 * np.pi, 4000))
    for law, tag_err in (("ulaw", 0.03), ("alaw", 0.03)):
        s, sr = decode_wav(encode_wav_g711(t, 8000, law=law))
        assert sr == 8000 and abs(s[:, 0] - t).max() < tag_err
    # stereo interleave survives
    st = np.stack([t[:100], -t[:100]], axis=1)
    s2, _ = decode_wav(encode_wav_g711(st, 8000, law="alaw"))
    assert s2.shape == (100, 2) and abs(s2 - st).max() < 0.03


def test_msadpcm_roundtrip_and_table_pins():
    """r12: MS-ADPCM (format 2) — from-spec DSP like the r8 IMA path:
    the published adaptation table and the seven coefficient pairs are
    pinned, and encode->decode stays within ADPCM quantization noise
    for mono, stereo and non-block-aligned lengths."""
    import numpy as np

    from datapump_spark.operators.codecs import (
        _MSADPCM_ADAPT,
        _MSADPCM_COEFS,
        decode_wav,
        encode_wav_msadpcm,
    )

    # authoritative constants (identical in every implementation)
    assert _MSADPCM_ADAPT == (230, 230, 230, 230, 307, 409, 512, 614,
                              768, 614, 512, 409, 307, 230, 230, 230)
    assert _MSADPCM_COEFS[0] == (256, 0) and _MSADPCM_COEFS[1] == (512, -256)
    assert len(_MSADPCM_COEFS) == 7

    t = np.sin(np.linspace(0, 440 * 2 * np.pi, 8000)) * 0.8
    s, sr = decode_wav(encode_wav_msadpcm(t, 8000))
    assert sr == 8000 and s.shape == (8000, 1)
    assert np.abs(s[:, 0] - t).max() < 0.12          # 4-bit ADPCM noise
    st = np.stack([t, -0.5 * t], axis=1)
    s2, _ = decode_wav(encode_wav_msadpcm(st, 8000))
    assert s2.shape == (8000, 2) and np.abs(s2 - st).max() < 0.12
    # fact chunk truncates final-block padding exactly
    s3, _ = decode_wav(encode_wav_msadpcm(t[:37], 8000,
                                          samples_per_block=16))
    assert s3.shape == (37, 1)


def test_msadpcm_bad_predictor_raises():
    import numpy as np
    import pytest as _pytest

    from datapump_spark.operators.codecs import (
        decode_wav,
        encode_wav_msadpcm,
    )

    wav = bytearray(encode_wav_msadpcm(
        np.zeros(32) + 0.1, 8000, samples_per_block=16))
    at = wav.find(b"data") + 8
    wav[at] = 9                                      # predictor > 6
    with _pytest.raises(UnsupportedMediaError, match="predictor"):
        decode_wav(bytes(wav))
