"""VP8 inter-frame gates (operators/vp8inter.py, r11): MV entropy
round trips, the near/nearest survey, motion compensation kernels,
twin round trips (exact at qi=0, bounded at qi=4), golden references,
not-shown frames, honest seams, and the WebM integration."""

from __future__ import annotations

import numpy as np
import pytest

from datapump_spark.operators.codecs import UnsupportedMediaError
from datapump_spark.operators.vp8 import _BoolDecoder, _BoolEncoder
from datapump_spark.operators.vp8inter import (
    BILINEAR,
    GOLDEN,
    LAST,
    MV_PROB_COUNT,
    NEARESTMV,
    NEWMV,
    SIXTAP,
    SPLITMV,
    ZEROMV,
    VP8Stream,
    _mc_block,
    _pad_ref,
    clamp_mv,
    encode_vp8_inter_frames,
    find_near_mvs,
    mv_ref_probs,
    read_mv_component,
    write_mv_component,
)


def _moving_frames(n=4, h=32, w=48):
    base = np.tile((np.arange(w) * 5 % 200).astype(np.uint8), (h, 1))
    out = []
    for t in range(n):
        img = np.stack([base, base // 2 + 40, 255 - base], axis=-1).copy()
        img[8:24, 4 + t * 8:16 + t * 8] = (200, 60, 60)
        out.append(img)
    return out


def test_mv_component_round_trip():
    """Short-tree, long-bits (incl. the implied bit 3 for 8..15),
    sign — every representable quarter-pel value round-trips."""
    probs = tuple(100 + (i * 7) % 100 for i in range(MV_PROB_COUNT))
    vals = ([0, 2, -2, 6, -14, 16, -16, 30, 62, -62, 64, 126, -2046,
             2046] + [v * 2 for v in range(-40, 41, 7)])
    be = _BoolEncoder()
    for v in vals:
        write_mv_component(be, probs, v)
    bd = _BoolDecoder(be.flush())
    for v in vals:
        assert read_mv_component(bd, probs) == v
    with pytest.raises(ValueError, match="out of range"):
        write_mv_component(_BoolEncoder(), probs, 2048)


def test_mv_survey_and_clamp():
    info = {(0, 0): (True, LAST, (8, 8)), (0, 1): (True, LAST, (8, 8)),
            (0, 2): (False, 0, (0, 0))}
    best, nearest, near, cnt = find_near_mvs(info, 1, 1, 3,
                                             [0, 0, 0], LAST)
    # above (8,8) w2 + aboveleft (8,8) w1 agree -> weight 3
    assert best == nearest == (8, 8) and near == (0, 0)
    assert cnt[1] == 3 and cnt[0] == 0
    # intra neighbors count toward the zero context (above = w2)
    best, nearest, near, cnt = find_near_mvs(info, 1, 2, 4,
                                             [0, 0, 0], LAST)
    assert cnt[0] == 2
    # sign-bias flip negates foreign-bias candidates
    best, _, _, _ = find_near_mvs({(0, 0): (True, GOLDEN, (8, -8))},
                                  1, 0, 2, [0, 1, 0], LAST)
    assert best == (-8, 8)
    assert len(mv_ref_probs(cnt)) == 4
    # clamping keeps MC inside the padded border
    mv = clamp_mv((10_000, -10_000), 0, 0, 2, 3)
    assert mv[0] <= (2 * 16 + 15) * 8 and mv[1] >= -(16 + 15) * 8


def test_mc_block_kernels():
    ref = _pad_ref(np.tile(np.arange(64, dtype=np.int32) * 4, (16, 1)))
    # full-pel copy
    blk = _mc_block(ref, 0, 8 * 8, 4, 3)
    assert (blk[0] == [32, 36, 40, 44]).all()
    # version 3 ignores fractional bits
    assert (_mc_block(ref, 3, 8 * 8 + 5, 4, 3) == blk).all()
    # bilinear half-pel = neighbor average
    half = _mc_block(ref, 0, 8 * 8 + 4, 4, 1)
    assert (half[0] == [34, 38, 42, 46]).all()
    assert BILINEAR[4] == (64, 64)
    # six-tap on a LINEAR ramp reproduces the interpolated line
    # (all kernels have zero second-moment error on affine signals)
    six = _mc_block(ref, 0, 8 * 8 + 4, 4, 0)
    assert (six[0] == [34, 38, 42, 46]).all()
    assert all(sum(row) == 128 for row in SIXTAP)


def test_inter_round_trip_matches_quantizer_bound():
    frames = _moving_frames()
    payloads = encode_vp8_inter_frames(frames, qi=4)
    assert payloads[0][0] & 1 == 0 and all(p[0] & 1 for p in payloads[1:])
    st = VP8Stream()
    for p, ref in zip(payloads, frames):
        out = st.decode(p)
        assert out.shape == ref.shape
        assert np.abs(out.astype(int) - ref.astype(int)).mean() < 3.0
    # inter frames must be cheaper than intra coding of the same frames
    from datapump_spark.operators.vp8 import encode_vp8
    intra_sizes = [len(encode_vp8(f, qi=4)) for f in frames[1:]]
    assert sum(len(p) for p in payloads[1:]) < sum(intra_sizes)


def test_solid_qi0_exact_and_skip():
    frames = [np.full((32, 48, 3), (40 + i * 50) % 200 + 20, np.uint8)
              for i in range(3)]
    st = VP8Stream()
    for p, ref in zip(encode_vp8_inter_frames(frames, qi=0), frames):
        assert (st.decode(p) == ref).all()
    # identical frames: ZEROMV + skip everywhere, tiny payloads
    same = [np.full((32, 48, 3), 77, np.uint8)] * 3
    payloads = encode_vp8_inter_frames(same, qi=0)
    from datapump_spark.operators.vp8 import VP8_TWIN_MARK
    assert all(len(p) < 40 + len(VP8_TWIN_MARK) for p in payloads[1:])
    st = VP8Stream()
    assert all((st.decode(p) == 77).all() for p in payloads)


def test_golden_reference_and_refresh():
    frames = _moving_frames(5)
    payloads = encode_vp8_inter_frames(frames, qi=4,
                                       golden_refresh={1},
                                       golden_ref={3, 4})
    st = VP8Stream()
    for p, ref in zip(payloads, frames):
        out = st.decode(p)
        assert np.abs(out.astype(int) - ref.astype(int)).mean() < 3.0


def test_not_shown_frame_updates_state_only():
    frames = [np.full((16, 16, 3), 60, np.uint8),
              np.full((16, 16, 3), 90, np.uint8),
              np.full((16, 16, 3), 90, np.uint8)]
    payloads = encode_vp8_inter_frames(frames, qi=0)
    hidden = bytearray(payloads[1])
    hidden[0] &= ~0x10                     # clear the show bit
    st = VP8Stream()
    assert st.decode(payloads[0]) is not None
    assert st.decode(bytes(hidden)) is None
    out = st.decode(payloads[2])           # predicts from hidden frame
    assert (out == 90).all()


def test_seams():
    st = VP8Stream()
    inter = encode_vp8_inter_frames(
        [np.full((16, 16, 3), 5, np.uint8)] * 2, qi=0)[1]
    with pytest.raises(ValueError, match="before any key frame"):
        st.decode(inter)
    assert UnsupportedMediaError is not None   # import exercised


def test_splitmv_round_trips_and_modes():
    """r11: SPLITMV decodes — partition types 8x8 and 4x4 through the
    twin knob (sub-MVs equal to the searched vector: the LEFT/ABOVE
    copy modes and NEW deltas are all exercised), exact at qi=0 on
    solid frames, quantizer-bounded on moving content, and split
    neighbors feed the survey's cnt[3]."""
    frames = _moving_frames(4)
    payloads = encode_vp8_inter_frames(frames, qi=4, split_every=2)
    st = VP8Stream()
    for p, ref in zip(payloads, frames):
        out = st.decode(p)
        assert np.abs(out.astype(int) - ref.astype(int)).mean() < 3.0
    # solid qi=0 with EVERY inter MB split: bit exact
    solid = [np.full((32, 48, 3), (40 + i * 50) % 200 + 20, np.uint8)
             for i in range(3)]
    st = VP8Stream()
    for p, ref in zip(encode_vp8_inter_frames(solid, qi=0,
                                              split_every=1), solid):
        assert (st.decode(p) == ref).all()
    # cnt[3] counts split neighbors
    from datapump_spark.operators.vp8inter import find_near_mvs
    info = {(0, 0): (True, LAST, (8, 8), True)}
    _, _, _, cnt = find_near_mvs(info, 1, 0, 2, [0, 0, 0], LAST)
    assert cnt[3] == 2


def test_webm_inter_round_trip_and_kernel():
    from datapump_spark.operators.webm import (decode_webm_frames,
                                               encode_webm_vp8)
    frames = [np.full((32, 48, 3), (40 + i * 50) % 200 + 20, np.uint8)
              for i in range(3)]
    b = encode_webm_vp8(frames, fps=2, qi=0, inter=True)
    got = list(decode_webm_frames(b))
    assert [ts for _, ts, _ in got] == [0, 500, 1000]
    for (_, _, f), ref in zip(got, frames):
        assert (f == ref).all()
    # the inter stream is smaller than the all-intra twin of the same
    # content
    assert len(b) < len(encode_webm_vp8(frames, fps=2, qi=0))
    with pytest.raises(ValueError, match="lacing with inter"):
        encode_webm_vp8(frames, qi=0, inter=True, lacing="xiph")


def test_unmarked_foreign_inter_stream_refused():
    """r12 honesty gate on the WebM/raw-sequence route: VP8Stream
    refuses unmarked key AND inter payloads."""
    import numpy as np
    import pytest
    from datapump_spark.operators.codecs import UnsupportedMediaError
    from datapump_spark.operators.vp8 import VP8_TWIN_MARK
    from datapump_spark.operators.vp8inter import (VP8Stream,
                                                   encode_vp8_inter_frames)

    rng = np.random.default_rng(3)
    frames = [rng.integers(0, 255, (32, 32, 3)).astype(np.uint8)
              for _ in range(3)]
    payloads = encode_vp8_inter_frames(frames, qi=4)
    assert all(p.endswith(VP8_TWIN_MARK) for p in payloads)
    st = VP8Stream()
    with pytest.raises(UnsupportedMediaError, match="foreign VP8"):
        st.decode(payloads[0][:-len(VP8_TWIN_MARK)])
    st.decode(payloads[0])                      # marked key frame OK
    with pytest.raises(UnsupportedMediaError, match="foreign VP8"):
        st.decode(payloads[1][:-len(VP8_TWIN_MARK)])
    assert st.decode(payloads[1]) is not None   # marked inter OK
