"""WebP lossless (VP8L) codec: every bitstream feature the decoder
claims faces an exact encode→decode round-trip (RFC 9649 §4)."""

from __future__ import annotations

import numpy as np
import pytest

from datapump_spark.operators.codecs import UnsupportedMediaError, decode_image
from datapump_spark.operators.webp import (
    _DIST_MAP,
    decode_webp,
    encode_webp_vp8l,
)


def _rt(img, **kw):
    out = decode_webp(encode_webp_vp8l(img, **kw))
    want = img if img.ndim == 3 else np.stack([img] * 3, axis=2)
    if want.shape[2] == 4 and (want[:, :, 3] == 255).all():
        want = want[:, :, :3]
    assert np.array_equal(out, want), kw
    return out


def test_plain_literals_roundtrip():
    rng = np.random.default_rng(1)
    _rt(rng.integers(0, 256, (13, 17, 3), dtype=np.uint8))
    _rt(rng.integers(0, 256, (1, 1, 3), dtype=np.uint8))
    _rt(rng.integers(0, 256, (6, 8), dtype=np.uint8))        # grayscale


def test_alpha_preserved_and_opaque_dropped():
    rng = np.random.default_rng(2)
    rgba = rng.integers(0, 256, (7, 9, 4), dtype=np.uint8)
    rgba[0, 0, 3] = 7
    assert _rt(rgba).shape == (7, 9, 4)
    opaque = rgba.copy()
    opaque[:, :, 3] = 255
    assert _rt(opaque).shape == (7, 9, 3)


def test_subtract_green_transform():
    rng = np.random.default_rng(3)
    _rt(rng.integers(0, 256, (13, 17, 3), dtype=np.uint8),
        subtract_green=True)


@pytest.mark.parametrize("mode", range(14))
def test_all_predictor_modes(mode):
    rng = np.random.default_rng(4)
    _rt(rng.integers(0, 256, (13, 17, 3), dtype=np.uint8),
        predictor_mode=mode)


def test_color_transform():
    rng = np.random.default_rng(5)
    _rt(rng.integers(0, 256, (9, 9, 3), dtype=np.uint8),
        color_transform=(16, 200, 7))
    _rt(rng.integers(0, 256, (9, 9, 3), dtype=np.uint8),
        color_transform=(255, 1, 128))


@pytest.mark.parametrize("n_colors", [2, 4, 13, 40, 256])
def test_palette_including_bundling(n_colors):
    """<=16 colors exercises sub-byte pixel bundling (1/2/4 bpp)."""
    rng = np.random.default_rng(n_colors)
    pal = rng.integers(0, 256, (n_colors, 3), dtype=np.uint8)
    idx = rng.integers(0, n_colors, (11, 23))
    _rt(pal[idx], palette=True)


def test_color_cache():
    rng = np.random.default_rng(6)
    # few distinct colors -> lots of cache hits
    pal = rng.integers(0, 256, (5, 3), dtype=np.uint8)
    img = pal[rng.integers(0, 5, (19, 21))]
    for bits in (1, 4, 8, 11):
        _rt(img, cache_bits=bits)


def test_lz77_runs_and_row_copies():
    rng = np.random.default_rng(7)
    cols = np.repeat(rng.integers(0, 256, (13, 1, 3), dtype=np.uint8),
                     17, axis=1)                  # distance-1 runs
    rows = np.repeat(rng.integers(0, 256, (1, 17, 3), dtype=np.uint8),
                     13, axis=0)                  # row-above (2D map) copies
    small = encode_webp_vp8l(cols, lz77=True)
    assert len(small) < len(encode_webp_vp8l(cols))
    _rt(cols, lz77=True)
    _rt(rows, lz77=True)


def test_combined_features():
    rng = np.random.default_rng(8)
    img = np.repeat(rng.integers(0, 256, (9, 1, 3), dtype=np.uint8),
                    31, axis=1)
    _rt(img, cache_bits=6, lz77=True, subtract_green=True)


def test_distance_map_is_complete_and_near():
    assert len(_DIST_MAP) == 120
    assert len(set(_DIST_MAP)) == 120
    assert all(-8 <= dx <= 8 and 0 <= dy <= 7 for dx, dy in _DIST_MAP)
    assert _DIST_MAP[0] == (0, 1) and _DIST_MAP[1] == (1, 0)


def test_container_seams():
    # lossy VP8 and VP8X stills decode since round 9; truncated chunks
    # fail loudly, and animation stays the honest seam (test_vp8)
    with pytest.raises(ValueError, match="truncated VP8"):
        decode_webp(b"RIFF\x10\x00\x00\x00WEBPVP8 \x04\x00\x00\x00"
                    + b"\x00" * 4)
    with pytest.raises(ValueError, match="truncated VP8X"):
        decode_webp(b"RIFF\x10\x00\x00\x00WEBPVP8X\x04\x00\x00\x00"
                    + b"\x00" * 4)
    with pytest.raises(ValueError, match="not a WebP"):
        decode_webp(b"RIFF\x10\x00\x00\x00WAVE" + b"\x00" * 8)
    with pytest.raises(ValueError):
        decode_webp(b"RIFF\x10\x00\x00\x00WEBPVP8L\x04\x00\x00\x00"
                    + b"\x00" * 4)                # bad signature byte
    # truncated entropy data fails loudly
    rng = np.random.default_rng(9)
    good = encode_webp_vp8l(rng.integers(0, 256, (8, 8, 3), dtype=np.uint8))
    with pytest.raises(ValueError):
        decode_webp(good[:len(good) - 6])


def test_dispatches_through_decode_image():
    rng = np.random.default_rng(10)
    img = rng.integers(0, 256, (5, 7, 3), dtype=np.uint8)
    assert np.array_equal(decode_image(encode_webp_vp8l(img)), img)


def test_sniffer_reports_vp8l_dims():
    from datapump_spark.operators.mediasniff import parse_media_header
    rng = np.random.default_rng(11)
    b = encode_webp_vp8l(rng.integers(0, 256, (21, 47, 3), dtype=np.uint8))
    info = parse_media_header(b)
    assert info["format"] == "webp" and info["kind"] == "image"
    assert (info["width"], info["height"]) == (47, 21)


def test_simple_code_symbols_in_read_order_not_canonical():
    """Foreign-encoder fixture (hand-written bitstream): a 2-symbol
    simple prefix code stores symbols in READ order — code 0 is the
    FIRST symbol even when it is numerically larger. Our encoder
    always writes them sorted, so only a hand-built stream exercises
    this."""
    import struct

    from datapump_spark.operators.webp import _LSBWriter
    bw = _LSBWriter()
    bw.write(0, 14)                     # width - 1
    bw.write(0, 14)                     # height - 1
    bw.write(0, 1)                      # alpha hint
    bw.write(0, 3)                      # version
    bw.write(0, 1)                      # no transforms
    bw.write(0, 1)                      # no color cache
    bw.write(0, 1)                      # no meta prefix image
    # green: simple, 2 symbols, first 8-bit: 200 then 100 (DESCENDING)
    bw.write(1, 1); bw.write(1, 1); bw.write(1, 1)
    bw.write(200, 8); bw.write(100, 8)
    for val in (10, 20, 255):           # red/blue/alpha: 1-symbol codes
        bw.write(1, 1); bw.write(0, 1); bw.write(1, 1); bw.write(val, 8)
    bw.write(1, 1); bw.write(0, 1); bw.write(0, 1); bw.write(0, 1)  # dist
    bw.write(0, 1)                      # pixel: green code bit 0 -> 200
    payload = b"\x2f" + bw.data()
    vp8l = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        vp8l += b"\x00"
    out = decode_webp(b"RIFF" + struct.pack("<I", 4 + len(vp8l))
                      + b"WEBP" + vp8l)
    assert out.shape == (1, 1, 3)
    assert list(out[0, 0]) == [10, 200, 20]


def test_limited_lengths_kraft_complete():
    """ADVICE r8: the depth-limit fallback used to hand every symbol
    one flat length, which is Kraft-INCOMPLETE (sum 2^-l < 1) for
    non-power-of-two alphabets — strict VP8L decoders (libwebp) reject
    under-subscribed tables. The fold must redistribute to an exact
    Kraft sum of 1."""
    from fractions import Fraction

    from datapump_spark.operators.webp import _limited_lengths

    # geometric frequencies force depths past the limit; non-power-of-
    # two counts are the Kraft-incomplete cases (300 uses the literal
    # code's limit of 15 — the 7 limit is the 19-symbol cl code's)
    for n, limit in ((3, 7), (5, 7), (6, 7), (7, 7), (300, 15)):
        freqs = {s: 1 << min(s, 40) for s in range(n)}
        lengths = _limited_lengths(freqs, limit)
        assert set(lengths) == set(freqs)
        assert max(lengths.values()) <= limit
        assert min(lengths.values()) >= 1
        assert sum(Fraction(1, 2 ** ln) for ln in lengths.values()) == 1
        # most frequent symbols got the shorter codes
        top = max(freqs, key=freqs.get)
        assert lengths[top] == min(lengths.values())
