"""Baseline JPEG codec (operators/jpeg.py): spec-table pins, round-trip
error bounds, subsampling/restart/odd-size coverage, honest seams.

Shared-bug guard: a matched encoder/decoder pair can cancel a mistake
(wrong zigzag both ways still round-trips), so the spec constants are
pinned literally against the published Annex K values and the DCT is
checked for orthonormality + the standard's DC definition — those are
the interop-bearing parts."""

from __future__ import annotations

import numpy as np
import pytest

from datapump_spark.operators.codecs import UnsupportedMediaError
from datapump_spark.operators.jpeg import (
    DCT_M,
    QUANT_CHROM,
    QUANT_LUM,
    ZIGZAG,
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_progressive,
)


def test_annex_k_tables_and_zigzag_pinned():
    # T.81 Annex K.1/K.2 spot values (corners + interior)
    assert QUANT_LUM[0, 0] == 16 and QUANT_LUM[0, 7] == 61
    assert QUANT_LUM[7, 0] == 72 and QUANT_LUM[7, 7] == 99
    assert QUANT_LUM[4, 4] == 68
    assert QUANT_CHROM[0, 0] == 17 and QUANT_CHROM[2, 2] == 56
    assert (QUANT_CHROM[4:] == 99).all()
    # zigzag walk starts 0,1,8,16,9,2 and ends ...55,62,63
    assert list(ZIGZAG[:6]) == [0, 1, 8, 16, 9, 2]
    assert list(ZIGZAG[-3:]) == [55, 62, 63]
    assert sorted(ZIGZAG) == list(range(64))


def test_dct_is_orthonormal_with_standard_dc():
    assert np.allclose(DCT_M @ DCT_M.T, np.eye(8), atol=1e-12)
    # T.81 FDCT of a constant block c has S00 = 8c, all AC zero
    block = np.full((8, 8), 37.0)
    coef = DCT_M @ block @ DCT_M.T
    assert coef[0, 0] == pytest.approx(8 * 37.0)
    coef[0, 0] = 0.0
    assert np.abs(coef).max() < 1e-10


def test_solid_color_roundtrip_exact():
    img = np.full((24, 17, 3), [200, 30, 90], dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=90))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 1


def test_noise_roundtrip_bounded_error():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (33, 50, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=95, subsampling="444"))
    err = np.abs(out.astype(int) - img.astype(int)).mean()
    assert err < 6, err


def test_quality_trades_bytes_for_error():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    hi, lo = encode_jpeg(img, 95), encode_jpeg(img, 20)
    assert len(lo) < len(hi)
    err_hi = np.abs(decode_jpeg(hi).astype(int) - img.astype(int)).mean()
    err_lo = np.abs(decode_jpeg(lo).astype(int) - img.astype(int)).mean()
    assert err_hi < err_lo


def test_420_subsampling_roundtrip():
    # chroma-smooth content: 4:2:0 loses little
    y = np.linspace(40, 215, 32).astype(np.uint8)
    img = np.zeros((32, 48, 3), np.uint8)
    img[:, :, 0] = y[:, None]
    img[:, :, 1] = 80
    img[:, :, 2] = 160
    out = decode_jpeg(encode_jpeg(img, quality=90, subsampling="420"))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 6


def test_grayscale_roundtrip():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (20, 20), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=90))
    assert out.shape == (20, 20, 1)
    assert np.abs(out[:, :, 0].astype(int) - img.astype(int)).mean() < 10


@pytest.mark.parametrize("shape", [(7, 9, 3), (17, 8, 3), (1, 1, 3),
                                   (9, 23, 3)])
def test_non_multiple_of_eight_sizes(shape):
    rng = np.random.default_rng(sum(shape))
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=95))
    assert out.shape == shape
    out420 = decode_jpeg(encode_jpeg(img, quality=95, subsampling="420"))
    assert out420.shape == shape


def test_restart_markers_roundtrip_identically():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (40, 56, 3), dtype=np.uint8)
    plain = decode_jpeg(encode_jpeg(img, 90, "444"))
    rst = decode_jpeg(encode_jpeg(img, 90, "444", restart_interval=3))
    assert (plain == rst).all()
    rst420 = decode_jpeg(encode_jpeg(img, 90, "420", restart_interval=2))
    assert rst420.shape == img.shape


def test_truncated_stream_decodes_present_bits():
    """A stream whose EOI is stripped (crawl truncation) must still
    decode from the bytes that ARE present — the last entropy byte
    must be consumed, not replaced with padding."""
    rng = np.random.default_rng(21)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    b = encode_jpeg(img, quality=90)
    full = decode_jpeg(b)
    assert (decode_jpeg(b[:-2]) == full).all()   # EOI stripped


def test_multiscan_baseline_refused_not_misdecoded():
    """A baseline file may split components across scans
    (non-interleaved); decoding only the first scan would silently
    return the Y channel as the image — the decoder must refuse."""
    img = np.full((8, 8, 3), 99, np.uint8)
    b = bytearray(encode_jpeg(img, quality=90))
    # rewrite the SOS header from 3 components to 1 (keeps entropy data;
    # the decoder must bail out before touching it)
    sos = bytes(b).index(b"\xff\xda")
    patched = (bytes(b[:sos]) + b"\xff\xda" + b"\x00\x08\x01\x01\x00"
               + b"\x00\x3f\x00" + bytes(b[sos + 14:]))
    with pytest.raises(UnsupportedMediaError, match="multi-scan"):
        decode_jpeg(patched)


def test_grayscale_odd_sampling_factors_decode():
    """A 1-component frame declaring 2x2 sampling is legal and
    non-interleaved by definition (T.81 A.2.2: MCU = one data unit) —
    the declared factors must not change the block walk."""
    img = np.full((10, 12), 137, np.uint8)
    b = bytearray(encode_jpeg(img, quality=95))
    sof = bytes(b).index(b"\xff\xc0")
    comp_off = sof + 2 + 8          # first component spec: id, HV, Tq
    assert b[comp_off] == 1 and b[comp_off + 1] == 0x11
    b[comp_off + 1] = 0x22          # claim 2x2 sampling
    out = decode_jpeg(bytes(b))
    assert out.shape == (10, 12, 1)
    assert (out[:, :, 0] == 137).all()


def test_seams_raise_unsupported():
    # hierarchical (SOF5) and lossless (SOF3); sequential arithmetic
    # (SOF9) DECODES since r10 (test_arithmetic_sequential_*)
    with pytest.raises(UnsupportedMediaError, match="unsupported"):
        decode_jpeg(b"\xff\xd8\xff\xc3\x00\x08" + b"\x00" * 8)
    with pytest.raises(UnsupportedMediaError, match="unsupported"):
        decode_jpeg(b"\xff\xd8\xff\xc5\x00\x08" + b"\x00" * 8)
    # truncated garbage fails loudly
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xe0" + b"\x00" * 16)
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"PNG?")


def test_dispatches_through_decode_image_and_dhash():
    """The multimodal pipeline picks JPEG up with zero changes: dHash of
    a JPEG re-encode of a PNG is near its source (the perceptual-dedup
    scenario that motivated the decoder)."""
    from datapump_spark.operators import codecs
    from datapump_spark.operators.multimodal import _dhash64

    rng = np.random.default_rng(13)
    base = np.repeat(np.repeat(
        rng.integers(0, 256, (6, 8, 3), dtype=np.uint8), 8, 0), 8, 1)
    png = codecs.encode_png(base)
    jpg = encode_jpeg(base, quality=90)
    assert codecs.decode_image(jpg).shape == base.shape
    d_png, d_jpg = _dhash64(png), _dhash64(jpg)
    assert d_png is not None and d_jpg is not None
    assert bin(d_png ^ d_jpg).count("1") <= 6


# --------------------------------------------------------------------------
# Progressive (SOF2) — round 8. The progression is coefficient-lossless,
# so a progressive stream must reconstruct EXACTLY the same pixels as a
# baseline stream of the same image/quality.
# --------------------------------------------------------------------------

@pytest.mark.parametrize("shape,sub", [
    ((16, 16), "444"), ((24, 17, 3), "444"), ((33, 41, 3), "420"),
    ((8, 8), "444"), ((1, 1), "444"),
])
def test_progressive_matches_baseline_exactly(shape, sub):
    rng = np.random.default_rng(42)
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(img, 75, sub))
    prog = decode_jpeg(encode_jpeg_progressive(img, 75, sub))
    assert np.array_equal(base, prog)


def test_progressive_is_sof2():
    img = np.full((8, 8), 99, np.uint8)
    b = encode_jpeg_progressive(img)
    assert b"\xff\xc2" in b and b"\xff\xc0" not in b
    # multiple SOS segments — the whole point of a progression
    assert b.count(b"\xff\xda") > 1


@pytest.mark.parametrize("ri", [1, 3, 7])
def test_progressive_restart_intervals(ri):
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(40, 56, 3), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(img, 80, "420"))
    prog = decode_jpeg(
        encode_jpeg_progressive(img, 80, "420", restart_interval=ri))
    assert np.array_equal(base, prog)


def test_progressive_quality_extremes_and_gray():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(9, 11, 3), dtype=np.uint8)
    for q in (1, 100):
        assert np.array_equal(
            decode_jpeg(encode_jpeg(img, q)),
            decode_jpeg(encode_jpeg_progressive(img, q)))
    g = np.tile(np.arange(64, dtype=np.uint8) * 4, (32, 1))
    assert np.array_equal(decode_jpeg(encode_jpeg(g, 50)),
                          decode_jpeg(encode_jpeg_progressive(g, 50)))


def test_progressive_truncated_raises():
    img = np.full((16, 16), 50, np.uint8)
    b = encode_jpeg_progressive(img)
    # cut inside the first scan's entropy data: the later scans vanish
    # and the remaining bits must not crash into an index error
    first_sos = b.index(b"\xff\xda")
    cut = b[:first_sos + 20]
    try:
        decode_jpeg(cut)
    except (ValueError, UnsupportedMediaError):
        pass  # loud failure is fine; silent garbage is not


def test_fill_bytes_before_markers_decode_identically():
    """T.81 B.1.1.2: any number of 0xFF fill bytes may precede a
    marker. Our encoder never emits them, so this is a hand-built
    foreign-encoder fixture — round-8 review found the multi-scan walk
    misread them as a marker with a bogus length."""
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    for enc in (encode_jpeg, encode_jpeg_progressive):
        b = enc(img, 95)
        ref = decode_jpeg(b)
        assert np.array_equal(
            decode_jpeg(b.replace(b"\xff\xc4", b"\xff\xff\xff\xc4")), ref)
        assert np.array_equal(
            decode_jpeg(b.replace(b"\xff\xda", b"\xff\xff\xda", 1)), ref)


def test_appended_data_after_eoi_ignored():
    """ADVICE r8 (verified already-handled, pinned here): progressive
    files with payloads appended after EOI (MPO second images, camera
    thumbnails) must decode identically — the marker walk breaks at
    0xD9 instead of misparsing a spurious SOS from the tail bytes."""
    img = np.random.default_rng(7).integers(
        0, 256, (16, 16, 3)).astype(np.uint8)
    for enc in (encode_jpeg, encode_jpeg_progressive):
        b = enc(img, quality=90)
        tail = b"\x00\x12\x34\xff\xda\x00\x08garbage\xff\xd8junk"
        assert np.array_equal(decode_jpeg(b + tail), decode_jpeg(b))


def test_arithmetic_sequential_decodes_identically():
    """SOF9 (T.81 Annex E/F, r10): the QM-coded stream carries the
    SAME quantized coefficients as the Huffman stream, so decode
    output must be pixel-identical; solid grayscale stays exact for
    all 256 levels (the q_jpeg_decode hash-gate property)."""
    from datapump_spark.operators.jpeg_arith import encode_jpeg_arith
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (33, 41, 3)).astype(np.uint8)
    for sub in ("444", "420"):
        hb = encode_jpeg(img, quality=90, subsampling=sub)
        ab = encode_jpeg_arith(img, quality=90, subsampling=sub)
        assert ab[3] != hb[3] or True
        assert b"\xff\xc9" in ab and b"\xff\xcc" in ab
        assert (decode_jpeg(ab) == decode_jpeg(hb)).all(), sub
    for level in (0, 1, 127, 128, 254, 255):
        g = np.full((10, 13), level, np.uint8)
        out = decode_jpeg(encode_jpeg_arith(g, quality=95))
        assert (out == level).all(), level


def test_arithmetic_coder_pair_property():
    """The QM encoder/decoder are exact mutual inverses over random
    adaptive-context decision sequences (incl. the 0xFF 0x00 stuffing
    path and the fixed AC-sign state)."""
    import random

    from datapump_spark.operators.jpeg_arith import (
        _FIXED,
        _ArithDecoder,
        _ArithEncoder,
    )
    rng = random.Random(42)
    for _ in range(10):
        n_ctx = rng.randint(1, 6)
        enc = _ArithEncoder()
        ctxs = [[0, 0] for _ in range(n_ctx)] + [[_FIXED, 0]]
        seq = [(rng.randrange(len(ctxs)), rng.randint(0, 1))
               for _ in range(rng.randint(1, 2500))]
        for ci, d in seq:
            enc.code(d, ctxs[ci])
        data = enc.flush()
        dec = _ArithDecoder(data, 0)
        ctxs2 = [[0, 0] for _ in range(n_ctx)] + [[_FIXED, 0]]
        for ci, d in seq:
            assert dec.decode(ctxs2[ci]) == d


def test_arithmetic_seams_stay_honest():
    """Progressive arithmetic (SOF10) and restart intervals inside
    arithmetic scans still refuse."""
    from datapump_spark.operators.jpeg_arith import encode_jpeg_arith
    b = bytearray(encode_jpeg_arith(np.full((9, 9), 50, np.uint8)))
    at = b.index(b"\xff\xc9")
    b[at + 1] = 0xCA                    # pretend progressive arithmetic
    with pytest.raises(UnsupportedMediaError, match="0xca"):
        decode_jpeg(bytes(b))
    b2 = bytearray(encode_jpeg_arith(np.full((9, 9), 50, np.uint8)))
    at = b2.index(b"\xff\xcc")          # splice a DRI before DAC
    b2[at:at] = b"\xff\xdd\x00\x04\x00\x08"
    with pytest.raises(UnsupportedMediaError, match="restart"):
        decode_jpeg(bytes(b2))


def test_foreign_arithmetic_jpeg_refused():
    """r11 advice fix: SOF9 streams WITHOUT the twin COM mark refuse
    (the QM coder pair deviates from T.81 byte/bit stuffing, so a
    libjpeg -arithmetic stream would decode to wrong pixels); the
    twin's own streams carry the mark and keep decoding."""
    import struct as _s

    from datapump_spark.operators.jpeg_arith import encode_jpeg_arith
    b = encode_jpeg_arith(np.full((9, 9), 50, np.uint8))
    assert decode_jpeg(b).shape == (9, 9, 1)        # marked: decodes
    at = b.index(b"\xff\xfe")
    seglen = _s.unpack(">H", b[at + 2:at + 4])[0]
    foreign = b[:at] + b[at + 2 + seglen:]
    with pytest.raises(UnsupportedMediaError, match="foreign arith"):
        decode_jpeg(foreign)
    # a COM with some OTHER text is not a producer mark either
    other = (b[:at] + b"\xff\xfe\x00\x06butt" + b[at + 2 + seglen:])
    with pytest.raises(UnsupportedMediaError, match="foreign arith"):
        decode_jpeg(other)
