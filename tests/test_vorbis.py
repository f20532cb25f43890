"""Ogg Vorbis gates (operators/vorbis.py, r11): Ogg container layer,
the spec's codeword-assignment example, TDAC identity, twin round
trips across residue/lookup knobs, granule end-trim, honest seams,
decode_audio routing."""

from __future__ import annotations

import numpy as np
import pytest

from datapump_spark.operators.codecs import (UnsupportedMediaError,
                                             decode_audio)
from datapump_spark.operators.vorbis import (_VBW, _mdct_fwd_scale,
                                             _mdct_roundtrip,
                                             assign_codewords,
                                             decode_vorbis,
                                             encode_vorbis, ogg_packets,
                                             ogg_pages)


def _tone(f: int, sr: int, secs: float = 1.0, amp: float = 0.5):
    t = np.arange(int(sr * secs)) / sr
    return amp * np.sin(2 * np.pi * f * t)


def _dominant(x: np.ndarray, sr: int) -> float:
    sp = np.abs(np.fft.rfft(x * np.hanning(len(x))))
    return np.argmax(sp) * sr / len(x)


def test_codeword_assignment_matches_spec_example():
    """Vorbis I §3.2.1 worked example: lengths [2,4,4,4,4,2,3,3]."""
    codes = assign_codewords([2, 4, 4, 4, 4, 2, 3, 3])
    assert codes == {0: 0b00, 1: 0b0100, 2: 0b0101, 3: 0b0110,
                     4: 0b0111, 5: 0b10, 6: 0b110, 7: 0b111}
    with pytest.raises(ValueError, match="over-specified"):
        assign_codewords([1, 1, 1])
    # unused entries (length 0) are skipped
    assert assign_codewords([0, 1, 0, 1]) == {1: 0, 3: 1}


def test_ogg_layer_round_trip_crc_and_continuation():
    pkts = [b"first", b"x" * 700, b"", b"last"]
    blob = ogg_pages(pkts, serial=9)
    got = [(s, p) for s, _, p in ogg_packets(blob)]
    assert [p for _, p in got] == pkts and all(s == 9 for s, _ in got)
    bad = bytearray(blob)
    bad[30] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        list(ogg_packets(bytes(bad)))
    # hand-built packet CONTINUED across two pages (the writer never
    # emits this): page 1 ends with a 255 lace, page 2 carries the
    # continuation flag
    import datapump_spark.operators.vorbis as V
    payload = bytes(range(256)) + b"tail"

    def page(seq, htype, laces, body):
        pg = bytearray(b"OggS\x00")
        pg.append(htype)
        pg += (0).to_bytes(8, "little")
        pg += (5).to_bytes(4, "little")
        pg += seq.to_bytes(4, "little")
        pg += b"\x00" * 4
        pg.append(len(laces))
        pg += bytes(laces)
        pg += body
        pg[22:26] = V._ogg_crc(bytes(pg)).to_bytes(4, "little")
        return bytes(pg)

    blob2 = (page(0, 0x02, [255], payload[:255])
             + page(1, 0x05, [len(payload) - 255], payload[255:]))
    got2 = [p for _, _, p in ogg_packets(blob2)]
    assert got2 == [payload]


def test_mdct_tdac_identity():
    """Analysis (adjoint, 4/n scale) -> IMDCT/OLA synthesis is unity
    for the Vorbis power-complementary window."""
    rng = np.random.default_rng(3)
    x = rng.standard_normal(8192)
    rec = _mdct_roundtrip(x, 2048, _mdct_fwd_scale(2048))
    assert np.max(np.abs(rec - x)) < 1e-9


def test_tone_round_trip_mono():
    sr = 8000
    sig = _tone(440, sr)
    out, got_sr = decode_vorbis(encode_vorbis(sig, sr))
    assert got_sr == sr and out.shape == (sr, 1)   # granule end-trim
    assert round(_dominant(out[:, 0], sr)) == 440
    snr = 10 * np.log10(np.sum(sig ** 2)
                        / np.sum((out[:, 0] - sig) ** 2))
    assert snr > 25


def test_stereo_channels_stay_apart():
    sr = 16000
    st = np.stack([_tone(440, sr, 0.5), _tone(880, sr, 0.5, 0.3)],
                  axis=1)
    out, got_sr = decode_vorbis(encode_vorbis(st, sr))
    assert got_sr == sr and out.shape == (sr // 2, 2)
    assert round(_dominant(out[:, 0], sr)) == 440
    assert round(_dominant(out[:, 1], sr)) == 880


def test_residue_types_and_lookup_knobs():
    """Fixture knobs (the VP8 foreign-round pattern): residue types
    0 and 1 (per-channel vectors) and VQ lookup type 2 — decode paths
    the default type-2/lookup-1 twin never drives — all reconstruct
    the same tones."""
    sr = 8000
    st = np.stack([_tone(300, sr, 0.5), _tone(700, sr, 0.5, 0.4)],
                  axis=1)
    for rt in (0, 1, 2):
        for lk in (1, 2):
            out, _ = decode_vorbis(
                encode_vorbis(st, sr, residue_type=rt, lookup=lk))
            assert round(_dominant(out[:, 0], sr)) == 300, (rt, lk)
            assert round(_dominant(out[:, 1], sr)) == 700, (rt, lk)


def test_int16_input_and_normalize():
    sr = 8000
    sig = (_tone(500, sr, 0.25) * 32767).astype(np.int16)
    out, _ = decode_vorbis(encode_vorbis(sig, sr))
    assert round(_dominant(out[:, 0], sr)) == 500


def test_honest_seams():
    with pytest.raises(ValueError, match="no Vorbis"):
        decode_vorbis(ogg_pages([b"not a codec header", b"b", b"c",
                                 b"d"]))
    # Opus-only Ogg refuses with the codec named
    opus = ogg_pages([b"OpusHead" + bytes(11), b"OpusTags", b"\x01"])
    with pytest.raises(UnsupportedMediaError, match="Opus"):
        decode_vorbis(opus)
    # floor type 0 (LSP) refuses honestly: minimal hand-built headers
    ident = bytearray(b"\x01vorbis")
    w = _VBW()
    w.write(0, 32)
    w.write(1, 8)
    w.write(8000, 32)
    w.write(0, 32), w.write(0, 32), w.write(0, 32)
    w.write(11, 4), w.write(11, 4)
    w.write(1, 1)
    ident += w.bytes_padded()
    w = _VBW()
    w.write(0, 8)                        # one codebook
    w.write(0x564342, 24)
    w.write(1, 16)                       # dims 1
    w.write(1, 24)                       # 1 entry
    w.write(0, 1), w.write(0, 1)         # unordered, dense
    w.write(0, 5)                        # length 1
    w.write(0, 4)                        # lookup 0
    w.write(0, 6), w.write(0, 16)        # time transform
    w.write(0, 6)                        # one floor
    w.write(0, 16)                       # TYPE 0 -> refuse
    setup = b"\x05vorbis" + w.bytes_padded()
    blob = ogg_pages([bytes(ident), b"\x03vorbis" + bytes(9) + b"\x01",
                      setup, b"\x00audio"])
    with pytest.raises(UnsupportedMediaError, match="floor type 0"):
        decode_vorbis(blob)
    with pytest.raises(UnsupportedMediaError, match="2 channels"):
        encode_vorbis(np.zeros((100, 3)), 8000)


def test_decode_audio_routes_ogg():
    sr = 8000
    f, got_sr = decode_audio(encode_vorbis(_tone(660, sr, 0.5), sr))
    assert got_sr == sr and f.shape == (4000, 1)
    assert round(_dominant(f[:, 0], sr)) == 660


def test_flac_in_ogg_mapping():
    """r11: the xiph FLAC-in-Ogg mapping — BOS packet carries the
    fLaC magic + STREAMINFO, audio packets are raw frames; lossless
    round trip, granule end-trim, decode_audio dispatch."""
    from datapump_spark.operators.vorbis import (decode_ogg_flac,
                                                 encode_ogg_flac)
    sr = 8000
    x = (_tone(400, sr, 0.25) * 32767).astype(np.int16)
    b = encode_ogg_flac(x, sr)
    out, got = decode_ogg_flac(b)
    assert got == sr and out.shape == (2000, 1)
    assert np.allclose(out[:, 0] * 32768, x, atol=1.0)   # lossless
    f, got2 = decode_audio(b)                # OggS dispatch
    assert got2 == sr and round(_dominant(f[:, 0], sr)) == 400
    with pytest.raises(ValueError, match="no FLAC"):
        decode_ogg_flac(ogg_pages([b"\x01vorbis junk", b"x", b"y",
                                   b"z"]))


def test_block_switching_round_trip():
    """r11 second pass: the block-switched twin (blocksizes 512/2048,
    two modes, a long/long/short pattern) drives the decoder's
    prev/next window flags, short-frame floor clamp and mixed-size
    lapped OLA — paths the single-mode twin never touches. The
    window-switched TDAC is exact (adjoint analysis, scale 4/n), so
    SNR sits at the scalar-quantizer floor."""
    sr = 8000
    sig = _tone(440, sr)
    b = encode_vorbis(sig, sr, block_switching=True)
    out, got = decode_vorbis(b)
    assert got == sr and out.shape == (sr, 1)   # granule end-trim
    assert round(_dominant(out[:, 0], sr)) == 440
    snr = 10 * np.log10(np.sum(sig ** 2)
                        / np.sum((out[:, 0] - sig) ** 2))
    assert snr > 22
    st = np.stack([_tone(440, sr, 0.5), _tone(880, sr, 0.5, 0.4)],
                  axis=1)
    out, _ = decode_vorbis(encode_vorbis(st, sr, block_switching=True))
    assert round(_dominant(out[:, 0], sr)) == 440
    assert round(_dominant(out[:, 1], sr)) == 880
    # the stream genuinely mixes both modes (id header declares
    # 512/2048 and packets carry 1 mode bit)
    from datapump_spark.operators.vorbis import _VBits
    pkts = [p for _s, _g, p in ogg_packets(b)]
    r = _VBits(pkts[0][7:])
    r.read(32 + 8 + 32 + 96)
    assert r.read(4) == 9 and r.read(4) == 11


def test_switch_window_tdac_identity():
    """Mixed 512/2048 window sequence: adjoint analysis -> decoder
    synthesis reconstructs the interior to 1e-9 (the window-switched
    Princen-Bradley identity with per-frame scale 4/n)."""
    from datapump_spark.operators.vorbis import (_imdct_matrix,
                                                 _switch_window)
    bs0, bs1 = 512, 2048
    sizes = [bs1, bs1, bs0, bs0, bs1, bs0, bs1, bs1]
    rng = np.random.default_rng(0)
    xp = np.zeros(10 * bs1)
    xp[bs1:-bs1] = rng.standard_normal(8 * bs1)
    rec = np.zeros_like(xp)
    pos = 2 * bs1
    for i, n_i in enumerate(sizes):
        pl = i > 0 and sizes[i - 1] == bs1
        nl = i + 1 < len(sizes) and sizes[i + 1] == bs1
        wv, (ls, le, rs, re) = _switch_window(n_i, pl, nl, bs0)
        st = pos - ls
        M = _imdct_matrix(n_i)
        X = (4.0 / n_i) * (M.T @ (wv * xp[st:st + n_i]))
        rec[st:st + n_i] += wv * (M @ X)
        pos += rs - ls
    lo, hi = 2 * bs1 + bs1, pos - bs1
    assert np.max(np.abs(rec[lo:hi] - xp[lo:hi])) < 1e-9


def test_floor1_segment_past_half_block_keeps_true_slope():
    """Spec §7.2.4: the Bresenham slope comes from the TRUE segment
    endpoint (hx, hy); only the fill loop clamps at n/2. A floor
    config whose X coordinates exceed the current block's n/2
    (short blocks reusing a long-block floor) must render the same
    leading curve at both block sizes (r12 advice fix: the call site
    clamped px to n2, changing the slope)."""
    from datapump_spark.operators.vorbis import _VBits, _decode_floor1

    class _FakeBook:
        def __init__(self, vals):
            self.vals = list(vals)

        def decode_scalar(self, r):
            return self.vals.pop(0)

    fl = {"class_list": [0], "dims": [1], "subs": [0], "masters": [-1],
          "sub_books": [[0]], "multiplier": 1,
          "xs": [0, 256, 128], "order": [0, 2, 1]}

    def run(n2):
        w = _VBW()
        w.write(1, 1)            # nonzero flag
        w.write(10, 8)           # y at x=0
        w.write(50, 8)           # y at x=256
        r = _VBits(w.bytes_padded())
        # y token at x=128: pred=30, room=60, val=20 -> final 40
        return _decode_floor1(r, fl, [_FakeBook([20])], n2)

    short, full = run(64), run(256)
    assert len(short) == 64 and len(full) == 256
    assert np.array_equal(short, full[:64])
    # and the slope really is the 30/128 line, not the clamped 30/64
    from datapump_spark.operators.vorbis import _render_line
    wrong = np.zeros(64)
    _render_line(wrong, 0, 10, 64, 40, 1)
    assert not np.array_equal(short, wrong)
