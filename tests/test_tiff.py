"""Baseline TIFF gates (operators/tiff.py, round 9): strip assembly,
all four compressions, predictor 2, both byte orders, 1-bit bilevel,
palette, honest seams, sniffer and decode_image routing."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from datapump_spark.operators.codecs import UnsupportedMediaError
from datapump_spark.operators.tiff import (
    _packbits_decode,
    _packbits_encode,
    decode_tiff,
    encode_tiff,
)


def _img(h=13, w=17, c=3, seed=7):
    return np.random.default_rng(seed).integers(
        0, 256, (h, w, c) if c else (h, w), dtype=np.uint8)


def test_roundtrip_all_compressions_both_orders():
    img = _img()
    for comp in ("none", "lzw", "deflate", "packbits"):
        for be in (False, True):
            assert (decode_tiff(encode_tiff(img, comp, big_endian=be))
                    == img).all(), (comp, be)


def test_predictor_and_channel_shapes():
    for c in (0, 3, 4):                 # gray 2-D, RGB, RGBA
        img = _img(9, 5, c)
        for comp in ("lzw", "deflate"):
            out = decode_tiff(encode_tiff(img, comp, predictor=True))
            assert out.shape == img.shape and (out == img).all()
    with pytest.raises(ValueError, match="predictor"):
        encode_tiff(_img(), "packbits", predictor=True)


def test_multi_strip_odd_tail():
    # height 13 at rows_per_strip 4 -> 4 strips, last one short
    img = _img(13, 6, 3)
    out = decode_tiff(encode_tiff(img, "packbits", rows_per_strip=4))
    assert (out == img).all()


def test_bilevel_both_photometrics():
    """Hand-built 1-bit fixtures (the writer only emits 8-bit): row
    bytes are bit-packed MSB-first; photometric 0 means WhiteIsZero."""
    w, h = 10, 3
    bits = np.array([[1, 0] * 5, [0, 1] * 5, [1] * 10], np.uint8)
    rows = np.packbits(bits, axis=1).tobytes()
    for photo, want in ((1, bits * 255), (0, 255 - bits * 255)):
        ifd = struct.pack("<H", 8)
        entries = [
            (256, 3, 1, w), (257, 3, 1, h), (258, 3, 1, 1),
            (259, 3, 1, 1), (262, 3, 1, photo), (277, 3, 1, 1),
            (273, 4, 1, 8 + 2 + 8 * 12 + 4), (279, 4, 1, len(rows)),
        ]
        for tag, typ, cnt, val in sorted(entries):
            ifd += struct.pack("<HHI", tag, typ, cnt)
            ifd += struct.pack("<I" if typ == 4 else "<HH", val, 0)[
                :4] if typ == 3 else struct.pack("<I", val)
        ifd += struct.pack("<I", 0)
        b = b"II*\x00" + struct.pack("<I", 8) + ifd + rows
        assert (decode_tiff(b) == want).all(), photo


def test_palette_colormap():
    img = _img(5, 4, 3)
    # build a palette file by hand: indices + 16-bit ColorMap
    idx = np.arange(20, dtype=np.uint8).reshape(5, 4)
    cmap = np.zeros((3, 256), np.uint16)
    cmap[0, :20] = np.arange(20) * 13 << 8
    cmap[1, :20] = np.arange(20) * 7 << 8
    cmap[2, :20] = np.arange(20) * 3 << 8
    data = idx.tobytes()
    n = 9
    cmap_at = 8 + 2 + n * 12 + 4 + len(data)
    entries = [
        (256, 3, 1, 4), (257, 3, 1, 5), (258, 3, 1, 8),
        (259, 3, 1, 1), (262, 3, 1, 3), (277, 3, 1, 1),
        (273, 4, 1, 8 + 2 + n * 12 + 4), (279, 4, 1, len(data)),
        (320, 3, 768, cmap_at),
    ]
    ifd = struct.pack("<H", n)
    for tag, typ, cnt, val in sorted(entries):
        ifd += struct.pack("<HHII", tag, typ, cnt, val)
    ifd += struct.pack("<I", 0)
    b = (b"II*\x00" + struct.pack("<I", 8) + ifd + data
         + cmap.tobytes())
    out = decode_tiff(b)
    assert out.shape == (5, 4, 3)
    assert (out[2, 3] == ((11 * 13) & 0xFF, (11 * 7) & 0xFF,
                          (11 * 3) & 0xFF)).all()


def test_seams_and_malformed():
    img = _img(8, 8, 3)
    b = bytearray(encode_tiff(img, "none"))
    # flip the compression tag value to CCITT G3 (3)
    at = b.index(struct.pack("<HHI", 259, 3, 1))
    b[at + 8] = 3
    with pytest.raises(UnsupportedMediaError, match="compression 3"):
        decode_tiff(bytes(b))
    with pytest.raises(ValueError, match="not a TIFF"):
        decode_tiff(b"ACME")
    # IFD offset beyond EOF
    with pytest.raises(ValueError, match="truncated"):
        decode_tiff(b"II*\x00" + struct.pack("<I", 9999))
    # a tile-width tag with NO tile offset table: malformed, caught
    # (tiles themselves DECODE since r10 — test_tiled_layout_*)
    b2 = bytearray(encode_tiff(img, "none"))
    at = b2.index(struct.pack("<HHI", 278, 3, 1))
    b2[at:at + 2] = struct.pack("<H", 322)     # RowsPerStrip -> TileWidth
    with pytest.raises(ValueError, match="tile table"):
        decode_tiff(bytes(b2))


def test_packbits_edge_cases():
    for payload in (b"", b"a", b"ab", b"aaab", b"a" * 300,
                    bytes(range(200)) * 2):
        assert _packbits_decode(_packbits_encode(payload)) == payload


@pytest.mark.slow  # the decode_image/sniffer routing is exercised
# every round by the q_tiff_decode driver hash gate and the
# test_mediasniff per-path pins; this test adds only the Spark-session
# cross-check of the same route (r10 rebalance)
def test_sniffer_and_decode_image_route(spark):
    from datapump_spark.operators.codecs import decode_image
    from datapump_spark.operators.mediasniff import (
        parse_media_header,
        sniff_media,
    )
    img = _img(7, 9, 3)
    b = encode_tiff(img, "lzw", big_endian=True)
    assert (decode_image(b) == img).all()
    info = parse_media_header(b)
    assert (info["format"], info["kind"]) == ("tiff", "image")
    assert (info["width"], info["height"]) == (9, 7)
    df = spark.createDataFrame([(1, bytearray(b))],
                               "media_id long, payload binary")
    for st in ("expr", "pandas"):
        row = sniff_media(df, strategy=st).collect()[0]
        assert (row["format"], row["kind"]) == ("tiff", "image"), st
    assert sniff_media(df, strategy="pandas").collect()[0]["width"] == 9


def test_packbits_literal_run_at_eof_is_well_formed():
    """ADVICE r9: a buffer ending mid-literal used to emit a count
    byte declaring one more literal byte than was written (encode
    (b'ab') -> 02 61 62, claiming 3); spec-strict PackBits decoders
    (libtiff/PIL) reject such strips. Walk every strip strictly."""
    for payload in (b"ab", b"a", b"abc" + bytes(range(130)), b"aaab",
                    b"abab", b"xy" * 64 + b"z", b"aaa" + b"bc"):
        enc = _packbits_encode(payload)
        out = bytearray()
        i = 0
        while i < len(enc):
            n = enc[i]
            i += 1
            if n < 128:                  # literal: n+1 bytes MUST exist
                assert i + n + 1 <= len(enc), (payload, "declared "
                                               "literal overruns strip")
                out += enc[i:i + n + 1]
                i += n + 1
            elif n > 128:                # repeat of 257-n
                assert i < len(enc), (payload, "repeat byte missing")
                out += bytes([enc[i]]) * (257 - n)
                i += 1
        assert bytes(out) == payload, payload
        assert _packbits_decode(enc) == payload, payload


def test_tiled_layout_round_trips():
    """r10: tiles (tags 322-325) with edge cropping, every
    compression, both byte orders, and per-tile predictor restart."""
    img = _img(37, 45, 3)                # not multiples of 16: crops
    for comp in ("none", "lzw", "deflate", "packbits"):
        for be in (False, True):
            out = decode_tiff(encode_tiff(img, comp, big_endian=be,
                                          tile=(16, 16)))
            assert (out == img).all(), (comp, be)
    out = decode_tiff(encode_tiff(img, "lzw", tile=(32, 16),
                                  predictor=True))
    assert (out == img).all()
    with pytest.raises(ValueError, match="multiples of 16"):
        encode_tiff(img, tile=(10, 16))


def test_planar_configuration_round_trips():
    """r10: planar config 2 — one sample plane per strip sequence —
    for strips AND tiles, gray/RGB/RGBA, with predictor."""
    for c in (3, 4):
        img = _img(21, 17, c)
        assert (decode_tiff(encode_tiff(img, "deflate", planar=True))
                == img).all()
        assert (decode_tiff(encode_tiff(img, "packbits", planar=True,
                                        tile=(16, 16))) == img).all()
        assert (decode_tiff(encode_tiff(img, "lzw", planar=True,
                                        predictor=True)) == img).all()
    g = _img(9, 13, 0)
    assert (decode_tiff(encode_tiff(g, "none", planar=True)) == g).all()


def test_tiled_planar_seams_stay_honest():
    import struct as _s
    img = _img(20, 20, 3)
    b = bytearray(encode_tiff(img, tile=(16, 16)))
    # truncate the last tile's byte count claim -> truncated tile
    b2 = bytes(b)[:len(b) - 40]
    with pytest.raises(ValueError):
        decode_tiff(b2)


def test_g4_fax_round_trips():
    """r10: CCITT G4 (T.6/MMR) — the fax compression — decodes through
    the TIFF layer: pass/vertical/horizontal modes, makeup runs,
    multi-strip, both byte orders; photometric 0 maps ink to dark."""
    rng = np.random.default_rng(3)
    # document-like bilevel page: white background, black strokes
    page = np.full((40, 120), 255, np.uint8)
    page[5:8, 10:90] = 0
    page[12:30, 40:44] = 0
    page[20, :] = 0
    for be in (False, True):
        out = decode_tiff(encode_tiff(page, "g4", big_endian=be))
        assert out.shape == page.shape and (out == page).all(), be
    # noisy bilevel exercises horizontal mode heavily
    noise = np.where(rng.random((30, 77)) > 0.7, 0, 255).astype(np.uint8)
    assert (decode_tiff(encode_tiff(noise, "g4")) == noise).all()
    # wide runs exercise makeup codes (> 64 and > 1728)
    wide = np.full((6, 2200), 255, np.uint8)
    wide[:, 100:2000] = 0
    assert (decode_tiff(encode_tiff(wide, "g4")) == wide).all()
    # G4 compresses documents hard
    assert len(encode_tiff(page, "g4")) < len(encode_tiff(page, "none")) // 4


def test_g4_seams_stay_honest():
    from datapump_spark.operators.ccitt import ccitt_g4_decode
    img = np.full((16, 16), 255, np.uint8)
    b = bytearray(encode_tiff(img, "g4"))
    # flip T6Options to claim the uncompressed-mode extension
    at = b.index(struct.pack("<HHI", 293, 4, 1))
    b[at + 8] = 0x02
    with pytest.raises(UnsupportedMediaError, match="uncompressed-mode"):
        decode_tiff(bytes(b))
    # FillOrder 2 refuses
    b2 = bytearray(encode_tiff(img, "g4"))
    at = b2.index(struct.pack("<HHI", 266, 3, 1))
    b2[at + 8] = 2
    with pytest.raises(UnsupportedMediaError, match="FillOrder"):
        decode_tiff(bytes(b2))
    # garbage stream fails loudly
    with pytest.raises(ValueError):
        ccitt_g4_decode(b"\x00\x00\x00", 16, 4)
    with pytest.raises(ValueError):
        encode_tiff(np.zeros((8, 8, 3), np.uint8), "g4")


def test_jpeg_in_tiff_decodes():
    """r11 (TTN2 compression 7): per-strip JPEG streams, abbreviated
    layouts against the shared JPEGTables tag, a hand-built TILED
    variant, and honest seams. Solid q95 content reconstructs exactly
    (the q_jpeg_decode argument)."""
    import struct as _s

    from datapump_spark.operators.tiff import _assemble_tiff
    for spp in (1, 3):
        img = np.full((20, 24, spp), 77, np.uint8)
        src = img[:, :, 0] if spp == 1 else img
        for jt in (False, True):
            out = decode_tiff(encode_tiff(src, "jpeg",
                                          rows_per_strip=8,
                                          jpeg_tables=jt))
            assert out.shape == src.shape and (out == 77).all(), \
                (spp, jt)
    # gradient content stays within the quantizer bound
    x = np.tile((np.arange(32) * 8 % 256).astype(np.uint8), (24, 1))
    rgb = np.stack([x, 255 - x, x // 2], axis=-1)
    out = decode_tiff(encode_tiff(rgb, "jpeg", rows_per_strip=8))
    assert np.abs(out.astype(int) - rgb.astype(int)).mean() < 4
    # hand-built TILED JPEG layout (the twin writes strips only)
    from datapump_spark.operators.jpeg import encode_jpeg
    tiles = [encode_jpeg(np.full((16, 16), v, np.uint8), quality=95)
             for v in (50, 90, 130, 170)]
    entries = [(256, 3, 1, [30]), (257, 3, 1, [28]),
               (258, 3, 1, [8]), (259, 3, 1, [7]),
               (262, 3, 1, [1]), (277, 3, 1, [1]),
               (322, 3, 1, [16]), (323, 3, 1, [16])]
    b = _assemble_tiff(entries, tiles, False, off_tag=324, cnt_tag=325)
    out = decode_tiff(b)
    assert out.shape == (28, 30)
    assert out[0, 0] == 50 and out[0, 20] == 90
    assert out[20, 0] == 130 and out[20, 20] == 170
    # seams: alpha / planar / tiled refuse in the twin
    with pytest.raises(ValueError, match="jpeg TIFF"):
        encode_tiff(np.zeros((8, 8, 4), np.uint8), "jpeg")
    # a chunk without SOI is caught
    bad = bytearray(encode_tiff(np.full((8, 8), 5, np.uint8), "jpeg"))
    at = bad.index(b"\xff\xd8\xff", 8)
    bad[at:at + 2] = b"\x00\x00"
    with pytest.raises(ValueError):
        decode_tiff(bytes(bad))
