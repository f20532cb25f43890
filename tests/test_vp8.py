"""Lossy WebP (VP8 key-frame) codec gates (operators/vp8.py, round 9).

Round-trips run against our own encoder (no libwebp/libvpx exists in
this container — the conformance seam recorded in COVERAGE.md), so the
suite leans on: exact reconstruction cases (solid blocks at qi=0),
tolerance round-trips across modes/quantizers/filters, hand-built
foreign-style streams for header paths the encoder never emits, and
structural checks of the transforms and boolean coder.
"""

from __future__ import annotations

import numpy as np
import pytest

from datapump_spark.operators.codecs import UnsupportedMediaError
from datapump_spark.operators.vp8 import (
    _BoolDecoder,
    _BoolEncoder,
    _rgb_to_yuv420,
    decode_vp8,
    encode_vp8,
    encode_webp_vp8,
    fdct4x4,
    fwht4x4,
    idct4x4,
    iwht4x4,
)
from datapump_spark.operators.webp import decode_webp


def _gradient(h, w, seed=0):
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    return np.stack([(xx * 3) % 256, (yy * 5) % 256,
                     ((xx + yy) * 2) % 256], axis=2).astype(np.uint8)


# ---------------------------------------------------------------------------
# Boolean coder
# ---------------------------------------------------------------------------

def test_bool_coder_roundtrip_random():
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, 20000)
    probs = rng.integers(1, 255, 20000)
    be = _BoolEncoder()
    for b, p in zip(bits, probs):
        be.bool(int(b), int(p))
    bd = _BoolDecoder(be.flush())
    assert [bd.bool(int(p)) for p in probs] == list(bits)


def test_bool_coder_extreme_probs_and_carry():
    # long runs at prob 1 and 254 force renormalization carries
    be = _BoolEncoder()
    seq = [(1, 1)] * 500 + [(0, 254)] * 500 + [(1, 128)] * 7
    for b, p in seq:
        be.bool(b, p)
    bd = _BoolDecoder(be.flush())
    assert all(bd.bool(p) == b for b, p in seq)


def test_bool_literal_signed_tree_roundtrip():
    from datapump_spark.operators.vp8 import KF_YMODE_PROBS, KF_YMODE_TREE
    be = _BoolEncoder()
    be.literal(0x5A, 8)
    be.signed(-13, 6)
    for v in (0, 1, 2, 3, 4):
        be.tree(KF_YMODE_TREE, KF_YMODE_PROBS, v)
    bd = _BoolDecoder(be.flush())
    assert bd.literal(8) == 0x5A
    assert bd.signed(6) == -13
    assert [bd.tree(KF_YMODE_TREE, KF_YMODE_PROBS)
            for _ in range(5)] == [0, 1, 2, 3, 4]


# ---------------------------------------------------------------------------
# Transforms
# ---------------------------------------------------------------------------

def test_idct_dc_only_is_flat():
    blk = np.zeros((4, 4), np.int32)
    blk[0, 0] = 80
    out = idct4x4(blk)
    assert (out == out[0, 0]).all() and out[0, 0] == 10   # (80+4)>>3


def test_fdct_idct_roundtrip_small_residuals():
    rng = np.random.default_rng(1)
    for _ in range(50):
        r = rng.integers(-255, 256, (4, 4)).astype(np.int32)
        out = idct4x4(fdct4x4(r))
        assert np.abs(out - r).max() <= 2


def test_fwht_iwht_roundtrip_exact():
    rng = np.random.default_rng(2)
    for _ in range(50):
        dcs = rng.integers(-2000, 2000, (4, 4)).astype(np.int32)
        assert np.abs(iwht4x4(fwht4x4(dcs)) - dcs).max() <= 1


# ---------------------------------------------------------------------------
# Frame round-trips
# ---------------------------------------------------------------------------

def test_solid_blocks_exact_at_q0():
    """qi=0 solid frames reconstruct bit-exactly (the q_jpeg_decode
    trick: DC-only residuals whose quantization error is zero) — the
    foundation of the q_vp8_decode oracle gate."""
    for v in (0, 34, 77, 128, 200, 255):
        img = np.full((32, 32, 3), v, np.uint8)
        assert (decode_vp8(encode_vp8(img, qi=0)) == img).all(), v


def test_gradient_roundtrip_quality_ladder():
    img = _gradient(32, 48)
    prev = -1.0
    for qi in (0, 20, 60, 100):
        out = decode_vp8(encode_vp8(img, qi=qi))
        err = np.abs(out.astype(int) - img.astype(int)).mean()
        assert err < 12
        assert err >= prev - 0.5     # roughly monotone in quantizer
        prev = err


def test_gray_noise_near_exact_at_q0():
    # no chroma content -> 4:2:0 subsampling is lossless; luma at
    # qi=0 must be within the DCT rounding bound
    rng = np.random.default_rng(3)
    g = rng.integers(0, 256, (32, 32)).astype(np.uint8)
    img = np.stack([g, g, g], axis=2)
    out = decode_vp8(encode_vp8(img, qi=0))
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 3


def test_color_noise_luma_tight_chroma_subsampled():
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (32, 32, 3)).astype(np.uint8)
    out = decode_vp8(encode_vp8(img, qi=0))
    ys, _, _ = _rgb_to_yuv420(img)
    yo, _, _ = _rgb_to_yuv420(out)
    assert np.abs(ys.astype(int) - yo.astype(int)).mean() < 2


def test_bpred_all_submodes_roundtrip():
    img = _gradient(32, 32)
    out = decode_vp8(encode_vp8(img, qi=0, use_bpred=True))
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 3


@pytest.mark.parametrize("mode", [0, 1, 2, 3])
def test_forced_whole_mb_modes(mode):
    img = _gradient(32, 48, seed=mode)
    out = decode_vp8(encode_vp8(img, qi=0, force_mode=mode))
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 4


def test_skip_flag_and_multi_partitions():
    img = np.full((64, 64, 3), 77, np.uint8)
    for n_parts in (1, 2, 4, 8):
        b = encode_vp8(img, qi=0, use_skip=True, n_parts=n_parts)
        assert (decode_vp8(b) == img).all()


def test_non_mb_multiple_dimensions_crop():
    rng = np.random.default_rng(5)
    for h, w in ((21, 35), (1, 1), (16, 17), (15, 48)):
        img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        out = decode_vp8(encode_vp8(img, qi=0))
        assert out.shape == (h, w, 3)


def test_loop_filter_normal_and_simple():
    img = _gradient(48, 48)
    base = decode_vp8(encode_vp8(img, qi=60, filter_level=0))
    for simple in (False, True):
        out = decode_vp8(encode_vp8(img, qi=60, filter_level=25,
                                    sharpness=0, simple_filter=simple))
        # filtering changes pixels but must not wreck fidelity
        assert not np.array_equal(out, base)
        err = np.abs(out.astype(int) - img.astype(int)).mean()
        base_err = np.abs(base.astype(int) - img.astype(int)).mean()
        assert err < base_err + 3.0


def test_loop_filter_flat_region_untouched():
    # a uniform frame has no edges above any threshold: the filter
    # must be a no-op (masks all false)
    img = np.full((32, 32, 3), 90, np.uint8)
    a = decode_vp8(encode_vp8(img, qi=0, filter_level=0))
    b = decode_vp8(encode_vp8(img, qi=0, filter_level=40))
    assert np.array_equal(a, b)


# ---------------------------------------------------------------------------
# Container + sniff integration
# ---------------------------------------------------------------------------

def test_decode_webp_routes_vp8():
    img = np.full((24, 40, 3), 150, np.uint8)
    out = decode_webp(encode_webp_vp8(img, qi=0))
    assert (out == img).all()


def test_decode_image_dispatch():
    from datapump_spark.operators.codecs import decode_image
    img = np.full((16, 16, 3), 60, np.uint8)
    assert (decode_image(encode_webp_vp8(img, qi=0)) == img).all()


def test_sniffer_reports_vp8_dims():
    from datapump_spark.operators.mediasniff import parse_media_header
    b = encode_webp_vp8(_gradient(21, 47), qi=40)
    info = parse_media_header(b)
    assert info["format"] == "webp" and info["kind"] == "image"
    assert (info["width"], info["height"]) == (47, 21)


# ---------------------------------------------------------------------------
# Error seams
# ---------------------------------------------------------------------------

def test_inter_frame_raises():
    b = bytearray(encode_vp8(np.full((16, 16, 3), 5, np.uint8)))
    b[0] |= 1                              # frame_type = inter
    with pytest.raises(UnsupportedMediaError, match="inter"):
        decode_vp8(bytes(b))


def test_bad_start_code_raises():
    b = bytearray(encode_vp8(np.full((16, 16, 3), 5, np.uint8)))
    b[3] = 0x00
    with pytest.raises(ValueError, match="start code"):
        decode_vp8(bytes(b))


def test_truncated_first_partition_raises():
    b = encode_vp8(_gradient(32, 32), qi=0)
    with pytest.raises(ValueError):
        decode_vp8(b[:12])


def test_per_segment_quantizers_refused():
    """Hand-built foreign-style stream: segmentation enabled with a
    nonzero per-segment quantizer delta — reconstruction would be
    silently wrong, so the decoder must refuse."""
    be = _BoolEncoder()
    be.literal(0, 1)                       # color space
    be.literal(0, 1)                       # clamping
    be.bool(1, 128)                        # segmentation enabled
    be.bool(0, 128)                        # no map update
    be.bool(1, 128)                        # update data
    be.bool(0, 128)                        # delta mode
    be.bool(1, 128)                        # segment 0 quant delta flagged
    be.signed(10, 7)                       # nonzero delta
    part0 = be.flush()
    from datapump_spark.operators.vp8 import VP8_TWIN_MARK
    payload = (bytes(((len(part0) << 5) & 0xFF, (len(part0) >> 3) & 0xFF,
                      (len(part0) >> 11) & 0xFF))
               + b"\x9d\x01\x2a" + bytes((16, 0, 16, 0)) + part0
               + VP8_TWIN_MARK)   # marked so it reaches the inner check
    with pytest.raises(UnsupportedMediaError, match="segment"):
        decode_vp8(payload)


def test_bpred_vr_hd_hand_computed():
    """B_VR / B_HD pinned to hand-computed §12.3 values (round-9
    review found off-by-ones here that round-trips CANNOT catch — the
    encoder shares the predictor, so self-consistency hides them)."""
    from datapump_spark.operators.vp8 import B_HD_PRED, B_VR_PRED, _pred_b

    a = np.array([20, 30, 40, 50], np.int32)
    l = np.array([12, 14, 16, 18], np.int32)
    ar = np.array([60, 70, 80, 90], np.int32)
    al = 10
    # E = [18,16,14,12,10,20,30,40,50]
    vr = _pred_b(B_VR_PRED, a, l, al, ar)
    assert vr[0, 0] == (10 + 20 + 1) >> 1
    assert vr[0, 3] == (40 + 50 + 1) >> 1
    assert vr[3, 0] == (16 + 2 * 14 + 12 + 2) >> 2
    assert vr[1, 3] == (30 + 2 * 40 + 50 + 2) >> 2
    assert vr[2, 1] == vr[0, 0] and vr[3, 1] == vr[1, 0]
    hd = _pred_b(B_HD_PRED, a, l, al, ar)
    assert hd[3, 0] == (18 + 16 + 1) >> 1
    assert hd[0, 0] == (12 + 10 + 1) >> 1
    assert hd[0, 3] == (20 + 2 * 30 + 40 + 2) >> 2
    assert hd[2, 0] == hd[3, 2] and hd[1, 1] == hd[2, 3]


# ---------------------------------------------------------------------------
# Extended container (VP8X) stills + ALPH (round 9)
# ---------------------------------------------------------------------------

def test_vp8x_lossless_rgba_exact():
    from datapump_spark.operators.webp import decode_webp, encode_webp_vp8x
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (20, 30, 4)).astype(np.uint8)
    assert np.array_equal(decode_webp(encode_webp_vp8x(
        img, lossless=True)), img)


@pytest.mark.parametrize("alpha_filter", [0, 1, 2, 3])
def test_vp8x_lossy_with_raw_alpha_filters(alpha_filter):
    """ALPH raw compression with all four prediction filters: the
    alpha plane must come back bit-exactly over a solid qi=0 VP8
    frame (so the color is exact too)."""
    from datapump_spark.operators.webp import decode_webp, encode_webp_vp8x
    alpha = (np.arange(24 * 40).reshape(24, 40) % 256).astype(np.uint8)
    img = np.dstack([np.full((24, 40, 3), 90, np.uint8), alpha])
    out = decode_webp(encode_webp_vp8x(img, qi=0,
                                       alpha_filter=alpha_filter))
    assert out.shape == (24, 40, 4)
    assert np.array_equal(out[..., 3], alpha)
    assert (out[..., :3] == 90).all()


def test_vp8x_headless_vp8l_alpha():
    """ALPH compression method 1: a headless VP8L stream whose GREEN
    channel carries the alpha plane."""
    from datapump_spark.operators.webp import decode_webp, encode_webp_vp8x
    rng = np.random.default_rng(9)
    alpha = rng.integers(0, 256, (16, 16)).astype(np.uint8)
    img = np.dstack([np.full((16, 16, 3), 40, np.uint8), alpha])
    out = decode_webp(encode_webp_vp8x(img, qi=0, alpha_lossless=True,
                                       alpha_filter=2))
    assert np.array_equal(out[..., 3], alpha)


def test_vp8x_animation_and_mismatch_seams():
    from datapump_spark.operators.webp import decode_webp, encode_webp_vp8x
    img = np.full((16, 16, 3), 7, np.uint8)
    b = bytearray(encode_webp_vp8x(img, qi=0))
    at = b.index(b"VP8X") + 8
    b[at] |= 0x02                      # animation flag
    with pytest.raises(UnsupportedMediaError, match="animated"):
        decode_webp(bytes(b))
    b = bytearray(encode_webp_vp8x(img, qi=0))
    b[b.index(b"VP8X") + 8 + 4] = 99   # corrupt canvas width
    with pytest.raises(ValueError, match="canvas"):
        decode_webp(bytes(b))


@pytest.mark.slow  # VP8X dims are pinned per-path in test_mediasniff
# hand-built buffers and ride the q_webp_decode/q_sniff_av oracle gates;
# this test adds only the expr-vs-pandas Spark-session cross-check
# (r10 rebalance)
def test_vp8x_sniffer_both_paths(spark):
    from datapump_spark.operators.mediasniff import (
        parse_media_header,
        sniff_media,
    )
    from datapump_spark.operators.webp import encode_webp_vp8x
    b = encode_webp_vp8x(np.full((21, 47, 3), 9, np.uint8), qi=40)
    info = parse_media_header(b)
    assert (info["format"], info["width"], info["height"]) == \
        ("webp", 47, 21)
    df = spark.createDataFrame([(1, bytearray(b))],
                               "media_id long, payload binary")
    for strategy in ("expr", "pandas"):
        row = sniff_media(df, strategy=strategy).collect()[0]
        assert (row["format"], row["width"], row["height"]) == \
            ("webp", 47, 21), strategy


def test_foreign_coef_prob_updates_decode_identically():
    """Foreign-fixture round 4 (VERDICT r9 #6): streams whose header
    UPDATES coefficient probabilities (RFC 6386 §13.4) — bytes the
    default encoder never emits — must decode to the same pixels as
    the default-table stream of the same content: the probabilities
    change the entropy coding, never the reconstruction."""
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (24, 40, 3)).astype(np.uint8)
    ref = decode_vp8(encode_vp8(img, qi=4))
    # moderate and extreme updates, spread across plane/band/context
    for updates in (
        {(0, 0, 0, 0): 30, (0, 1, 1, 1): 200, (2, 0, 0, 0): 77},
        {(i, j, k, t): 1 if (i + j + k + t) % 2 else 254
         for i in range(4) for j in range(0, 8, 3)
         for k in range(3) for t in range(0, 11, 4)},
    ):
        b = encode_vp8(img, qi=4, coef_prob_updates=updates)
        assert (decode_vp8(b) == ref).all()
        # the stream really is different bytes
        assert b != encode_vp8(img, qi=4)


def test_foreign_segmentation_header_decodes_identically():
    """Segmentation enabled with an updated id map (2-level tree over
    custom probs), present-but-zero quantizer deltas and loop-filter
    deltas: the decoder must parse and tolerate all of it and still
    reconstruct the same pixels."""
    rng = np.random.default_rng(12)
    img = rng.integers(0, 256, (33, 18, 3)).astype(np.uint8)
    ref = decode_vp8(encode_vp8(img, qi=2))
    for seg in ({"tree_probs": [90, 160, 40], "lf_deltas": False},
                {"tree_probs": [1, 254, 128], "lf_deltas": True}):
        b = encode_vp8(img, qi=2, segmentation=seg)
        assert (decode_vp8(b) == ref).all()
    # combined: segmentation + prob updates + skip + multi-partition
    b = encode_vp8(img, qi=2,
                   segmentation={"tree_probs": [128, 77, 200],
                                 "lf_deltas": True},
                   coef_prob_updates={(1, 0, 0, 0): 10, (3, 2, 1, 5): 250},
                   use_skip=True, n_parts=2)
    assert (decode_vp8(b) == ref).all()


def test_nonzero_segment_quantizer_delta_still_refuses():
    """The honest seam stays: a NONZERO per-segment quantizer delta
    would silently change reconstruction, so the decoder refuses it
    (the fixture path only emits present-but-zero deltas)."""
    from datapump_spark.operators.vp8 import _BoolEncoder
    img = np.full((16, 16, 3), 90, np.uint8)
    b = bytearray(encode_vp8(img, qi=2,
                             segmentation={"tree_probs": [128, 128, 128],
                                           "lf_deltas": False}))
    # rebuild with a nonzero delta: flip the first quantizer delta by
    # re-encoding the header is complex, so craft a minimal stream by
    # patching via the encoder with a monkeypatched signed value
    import datapump_spark.operators.vp8 as vp8mod
    orig = _BoolEncoder.signed

    def bad_signed(self, v, n):
        orig(self, 3 if n == 7 else v, n)

    _BoolEncoder.signed = bad_signed
    try:
        raw = encode_vp8(img, qi=2,
                         segmentation={"tree_probs": [128, 128, 128],
                                       "lf_deltas": False})
    finally:
        _BoolEncoder.signed = orig
    with pytest.raises(UnsupportedMediaError, match="quantizer delta"):
        decode_vp8(raw)


def test_unmarked_foreign_vp8_refused():
    """r12 honesty gate: every VP8 decode touches the documented
    stand-in probability tables, so a stream without the twin trailer
    (i.e. any libwebp/libvpx-encoded file) must refuse, not decode to
    plausible-but-wrong pixels — mirroring the MP3 private-bit and
    SOF9 COM gates."""
    import struct
    from datapump_spark.operators.vp8 import VP8_TWIN_MARK
    from datapump_spark.operators.webp import decode_webp

    marked = encode_vp8(_gradient(32, 32), qi=0)
    assert marked.endswith(VP8_TWIN_MARK)
    foreign = marked[:-len(VP8_TWIN_MARK)]     # valid bytes, no mark
    with pytest.raises(UnsupportedMediaError, match="foreign VP8"):
        decode_vp8(foreign)
    # and through the WebP container route
    chunk = b"VP8 " + struct.pack("<I", len(foreign)) + foreign
    if len(foreign) & 1:
        chunk += b"\x00"
    riff = b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
    with pytest.raises(UnsupportedMediaError, match="foreign VP8"):
        decode_webp(riff)
    # the marked stream still decodes
    assert decode_vp8(marked).shape == (32, 32, 3)
