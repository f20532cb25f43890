"""MP3 (MPEG-1 Layer III) gates (operators/mp3.py, round 10): table
validity, filterbank near-PR, encode/decode round trips across rates
and channel modes, bit-reservoir handling, the decode-only paths the
encoder twin never emits (linbits escapes, count1 table B, short
blocks, MS stereo, scalefactor requantization), honest seams, and
the decode_audio route."""

from __future__ import annotations

import math

import numpy as np
import pytest

from datapump_spark.operators.codecs import UnsupportedMediaError, decode_audio
from datapump_spark.operators import mp3
from datapump_spark.operators.mp3 import decode_mp3, encode_mp3


def _tone(freq, sr, secs=0.5, amp=0.5):
    t = np.arange(int(sr * secs)) / sr
    return amp * np.sin(2 * np.pi * freq * t)


def _dominant(y, sr, skip=4096, n=8192):
    seg = y[skip:skip + n]
    spec = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
    return np.fft.rfftfreq(len(seg), 1 / sr)[int(np.argmax(spec))]


def _snr_db(y, x, search=3500, n=8000):
    best = max(range(search), key=lambda d: float(np.dot(y[d:d + n], x[:n])))
    s, r = y[best:best + n], x[:n]
    g = float(np.dot(s, r) / np.dot(r, r))
    err = s - g * r
    return 10 * math.log10(float(np.dot(r, r)) * g * g
                           / float(np.dot(err, err)))


# ---------------------------------------------------------------------------
# Tables and filterbank invariants
# ---------------------------------------------------------------------------


def test_all_huffman_tables_kraft_complete_and_prefix_free():
    for code_id in sorted(set(mp3._CODE_OF.values())):
        if mp3._TABLE_INFO[code_id][0] == 0:
            continue                     # table 0 carries no codes
        codes = mp3._pair_codes(code_id)  # _validate_prefix runs inside
        n = mp3._TABLE_INFO[code_id][0] + 1
        assert set(codes) == {(x, y) for x in range(n) for y in range(n)}
        assert max(l for _, l in codes.values()) <= mp3._MAXLEN
    for sel in (0, 1):
        assert set(mp3._quad_codes(sel)) == set(range(16))


def test_pqmf_round_trip_snr():
    """Adjoint-constructed analysis/synthesis is near-PR: > 40 dB on
    white noise at the 480-sample filterbank delay."""
    x = np.random.default_rng(0).standard_normal(32 * 300)
    y = mp3._synthesis(mp3._analysis(x))
    s, r = y[480:480 + 6000], x[:6000]
    g = float(np.dot(s, r) / np.dot(r, r))
    err = s - g * r
    snr = 10 * math.log10(float(np.dot(r, r)) * g * g
                          / float(np.dot(err, err)))
    assert snr > 40.0 and abs(g - 1.0) < 0.01, (snr, g)


def test_mdct_adjoint_scale_is_exact():
    """Forward scale 1/9 makes MDCT -> IMDCT+OLA identity (TDAC)."""
    rng = np.random.default_rng(1)
    s = rng.standard_normal(18 * 20)
    G = 18
    X = np.stack([mp3._MDCT_FWD_SCALE * (s[g * 18:g * 18 + 36]
                                         @ mp3._WM36) for g in range(G)])
    out = np.zeros(len(s))
    for g in range(G):
        out[g * 18:g * 18 + 36] += (mp3._M36 @ X[g]) * mp3._W_NORMAL
    assert np.allclose(out[36:(G - 1) * 18], s[36:(G - 1) * 18], atol=1e-9)


# ---------------------------------------------------------------------------
# Round trips
# ---------------------------------------------------------------------------


def test_tone_round_trip_all_rates():
    for sr in (44100, 48000, 32000):
        x = _tone(440, sr)
        out, got = decode_mp3(encode_mp3(x, sr))
        assert got == sr and out.shape[1] == 1
        assert abs(_dominant(out[:, 0], sr) - 440) < 10
        assert _snr_db(out[:, 0], x) > 18


def test_stereo_round_trip_keeps_channels_apart():
    sr = 44100
    x = np.stack([_tone(440, sr), _tone(1000, sr, amp=0.4)], 1)
    out, got = decode_mp3(encode_mp3(x, sr))
    assert got == sr and out.shape[1] == 2
    assert abs(_dominant(out[:, 0], sr) - 440) < 10
    assert abs(_dominant(out[:, 1], sr) - 1000) < 10


def test_noise_and_int16_round_trip():
    rng = np.random.default_rng(2)
    x = 0.3 * rng.standard_normal(44100 // 2)
    assert _snr_db(decode_mp3(encode_mp3(x, 44100))[0][:, 0], x) > 12
    xi = (_tone(440, 44100) * 32767).astype(np.int16)
    out, _ = decode_mp3(encode_mp3(xi, 44100))
    assert abs(_dominant(out[:, 0], 44100) - 440) < 10


def test_id3_tag_skipped_and_silence():
    b = encode_mp3(_tone(440, 44100, 0.1), 44100)
    tagged = b"ID3\x04\x00\x00\x00\x00\x00\x0a" + b"\x00" * 10 + b
    out, sr = decode_mp3(tagged)
    assert sr == 44100 and len(out)
    out, _ = decode_mp3(encode_mp3(np.zeros(500), 44100))
    assert np.max(np.abs(out)) < 1e-6


def test_bit_reservoir_reconstruction():
    """Move the head of frame 2's main data into frame 1's padding and
    set main_data_begin accordingly: decode must be IDENTICAL — this
    is the reservoir path our no-reservoir encoder never emits."""
    sr = 44100
    b = bytearray(encode_mp3(_tone(300, sr, 0.2, amp=0.05), sr))
    # locate frames (encoder emits VBR frames back to back)
    frames = []
    i = 0
    while i < len(b) - 4:
        h = mp3._parse_header(bytes(b), i)
        assert h is not None
        frames.append((i, h["frame_len"]))
        i += h["frame_len"]
    assert len(frames) >= 3
    (o1, l1), (o2, l2) = frames[1], frames[2]
    si_len = 17
    main2_at = o2 + 4 + si_len
    J = 8
    # frame 1 must end in >= J zero-pad bytes for the move to be legal
    assert bytes(b[o1 + l1 - J:o1 + l1]) == b"\x00" * J
    moved = bytes(b[main2_at:main2_at + J])
    b[o1 + l1 - J:o1 + l1] = moved
    b[main2_at:o2 + l2 - J] = b[main2_at + J:o2 + l2]
    b[o2 + l2 - J:o2 + l2] = b"\x00" * J
    # main_data_begin = J: first 9 bits of frame 2's side info
    b[o2 + 4] = J >> 1
    b[o2 + 5] = ((J & 1) << 7) | (b[o2 + 5] & 0x7F)
    ref, _ = decode_mp3(encode_mp3(_tone(300, sr, 0.2, amp=0.05), sr))
    got, _ = decode_mp3(bytes(b))
    assert np.allclose(got, ref, atol=1e-12)


# ---------------------------------------------------------------------------
# Decode-only paths (hand-built granules)
# ---------------------------------------------------------------------------


def _build_frame(granule_bits: str, *, table=16, big_values, count1table=1,
                 global_gain=210, scalefac_compress=0, sr_idx=0):
    """Wrap hand-written granule main data (bit string) in a valid
    mono frame; granule 1 is empty (part2_3_length 0)."""
    bw = mp3._BW()
    bw.write(0, 9)                       # main_data_begin
    bw.write(0, 5)
    for _ in range(4):
        bw.write(0, 1)                   # scfsi
    for gr in range(2):
        bw.write(len(granule_bits) if gr == 0 else 0, 12)
        bw.write(big_values if gr == 0 else 0, 9)
        bw.write(global_gain, 8)
        bw.write(scalefac_compress, 4)
        bw.write(0, 1)                   # no window switching
        for _ in range(3):
            bw.write(table, 5)
        bw.write(7, 4)
        bw.write(7, 3)
        bw.write(0, 1)                   # preflag
        bw.write(0, 1)                   # scalefac_scale
        bw.write(count1table, 1)
    si = bw.bytes_padded()
    assert len(si) == 17
    mw = mp3._BW()
    for bit in granule_bits:
        mw.write(int(bit), 1)
    main = mw.bytes_padded()
    need = 4 + 17 + len(main)
    br_idx = next(i for i in range(1, 15)
                  if 144000 * mp3._BITRATE[i] // 44100 >= need)
    flen = 144000 * mp3._BITRATE[br_idx] // 44100
    hdr = bytes([0xFF, 0xFB, (br_idx << 4) | (sr_idx << 2), 3 << 6])
    return hdr + si + main + b"\x00" * (flen - need)


def _code_bits(codes, sym):
    c, l = codes[sym]
    return format(c, "b").zfill(l)


def test_linbits_escape_and_count1_table_b():
    """A value of 15+esc through table 24's linbits-4 escape, signs,
    and a count1 quad through fixed table B — none of which the
    encoder twin emits."""
    codes = mp3._pair_codes(24)
    bits = _code_bits(codes, (15, 0)) + "0110" + "1"   # x=15+6=21, neg
    bits += _code_bits(codes, (2, 3)) + "0" + "1"      # (2, -3)
    # count1 table B: fixed 4-bit ~v code; v=0b1010 -> (1,0,1,0)
    bits += format((~0b1010) & 0xF, "b").zfill(4) + "0" + "1"
    frame = _build_frame(bits, table=24, big_values=2, count1table=1)
    out, sr = decode_mp3(frame)
    assert sr == 44100 and np.isfinite(out).all()
    # reconstruct the expected spectrum through the public requantizer
    xs = np.zeros(576)
    xs[:8] = [-21, 0, 2, -3, 1, 0, -1, 0]
    g = {"window_switching": 0, "block_type": 0, "mixed": 0,
         "scalefac_scale": 0, "global_gain": 210, "preflag": 0,
         "subblock_gain": [0, 0, 0]}
    xr = mp3._requantize(xs, g, 44100, [0] * 22, [[0] * 3] * 13)
    assert xr[0] == pytest.approx(-(21 ** (4 / 3)))
    assert xr[3] == pytest.approx(-(3 ** (4 / 3)))


def test_scalefactor_requantization_paths():
    """scalefac_scale, preflag/pretab and subblock gain all change the
    requantized magnitude exactly as the spec formula says."""
    xs = np.zeros(576)
    xs[100] = 2.0                        # sfb 13 at 44.1 kHz long
    base = {"window_switching": 0, "block_type": 0, "mixed": 0,
            "global_gain": 210, "preflag": 0, "scalefac_scale": 0,
            "subblock_gain": [0, 0, 0]}
    sf = [0] * 22
    ref = mp3._requantize(xs, base, 44100, sf, [[0] * 3] * 13)[100]
    sf9 = list(sf)
    sf9[13] = 2
    halfstep = mp3._requantize(xs, base, 44100, sf9, [[0] * 3] * 13)[100]
    assert halfstep == pytest.approx(ref * 2.0 ** -1.0)   # 0.5 * 2
    full = dict(base, scalefac_scale=1)
    fullstep = mp3._requantize(xs, full, 44100, sf9, [[0] * 3] * 13)[100]
    assert fullstep == pytest.approx(ref * 2.0 ** -2.0)
    pre = dict(base, preflag=1)
    xs2 = np.zeros(576)
    xs2[450] = 2.0                       # sfb 21 at 44.1 kHz: pretab 2?
    got = mp3._requantize(xs2, pre, 44100, sf, [[0] * 3] * 13)[450]
    want = mp3._requantize(xs2, base, 44100, sf, [[0] * 3] * 13)[450]
    sfb = next(s for s in range(22)
               if mp3._SFB_LONG[44100][s] <= 450 < mp3._SFB_LONG[44100][s + 1])
    assert got == pytest.approx(want * 2.0 ** (-0.5 * mp3._PRETAB[sfb]))


def test_short_block_reorder_is_permutation_and_imdct_runs():
    for mixed in (False, True):
        _, _, _, perm = mp3._line_maps(44100, True, mixed)
        assert sorted(perm) == list(range(576))
    g = {"window_switching": 1, "block_type": 2, "mixed": 0,
         "global_gain": 220, "preflag": 0, "scalefac_scale": 0,
         "subblock_gain": [0, 1, 2]}
    xs = np.zeros(576)
    xs[:60] = 3.0
    xr = mp3._requantize(xs, g, 44100, [0] * 22, [[0] * 3] * 13)
    assert np.isfinite(xr).all() and (np.abs(xr) > 0).sum() == 60
    out = mp3._imdct_short(xr[:18])
    assert out.shape == (36,) and np.isfinite(out).all()


def test_ms_stereo_matrix_inverts():
    sr = 44100
    hdr = {"mode": 1, "mode_ext": 0x2}
    L = np.linspace(1, 2, 576)
    R = np.linspace(-1, 1, 576)
    m = (L + R) / math.sqrt(2)
    s = (L - R) / math.sqrt(2)
    g_r = {"window_switching": 0, "block_type": 0, "mixed": 0}
    mp3._stereo(m, s, 576, g_r, hdr, [0] * 22, [[0] * 3] * 13, sr)
    assert np.allclose(m, L) and np.allclose(s, R)


def test_intensity_stereo_long():
    sr = 44100
    hdr = {"mode": 1, "mode_ext": 0x1}
    xl = np.zeros(576)
    xl[540:576] = 1.0                    # inside sfb 21 (418..576)
    xr = np.zeros(576)
    sf_r = [0] * 22
    sf_r[21] = 3                         # is_pos 3 for the last sfb
    g_r = {"window_switching": 0, "block_type": 0, "mixed": 0}
    mp3._stereo(xl, xr, 418, g_r, hdr, sf_r, [[0] * 3] * 13, sr)
    ratio = math.tan(3 * math.pi / 12)
    assert xl[540] == pytest.approx(ratio / (1 + ratio))
    assert xr[540] == pytest.approx(1 / (1 + ratio))


# ---------------------------------------------------------------------------
# Seams + dispatch
# ---------------------------------------------------------------------------


def test_honest_seams():
    with pytest.raises(ValueError, match="no MPEG-1 Layer III"):
        decode_mp3(b"\x00" * 64)
    b = bytearray(encode_mp3(_tone(440, 44100, 0.1), 44100))
    free = bytearray(b)
    free[2] = free[2] & 0x0F             # bitrate index 0 = free format
    with pytest.raises(UnsupportedMediaError, match="free-format"):
        decode_mp3(bytes(free))
    with pytest.raises(UnsupportedMediaError, match="sample rate"):
        encode_mp3(np.zeros(100), 7000)


def test_decode_audio_routes_mp3():
    x = _tone(440, 44100)
    f, sr = decode_audio(encode_mp3(x, 44100))
    assert sr == 44100 and f.shape[1] == 1
    assert abs(_dominant(f[:, 0], sr) - 440) < 10
    tagged = b"ID3\x04\x00\x00\x00\x00\x00\x0a" + b"\x00" * 10 \
        + encode_mp3(x, 44100)
    f2, sr2 = decode_audio(tagged)
    assert sr2 == 44100 and len(f2)


def _clear_private_bits(b: bytes) -> bytes:
    """Rewrite every frame header with the private bit cleared —
    turns a twin-marked stream into a 'foreign' one byte-for-byte."""
    from datapump_spark.operators.mp3 import _parse_header
    bb = bytearray(b)
    i = 0
    while i < len(bb) - 4:
        h = _parse_header(bytes(bb[i:i + 4]), 0)
        if h is not None:
            bb[i + 2] &= 0xFE
            i += h["frame_len"]
        else:
            i += 1
    return bytes(bb)


def test_standin_table_gate_refuses_unmarked_foreign_streams():
    """r11 advice fix: the big Huffman pair tables are documented
    stand-ins — decode_audio must refuse a stream that selects one
    UNLESS it carries encode_mp3's private-bit producer mark; streams
    confined to the exactly-transcribed tables decode regardless."""
    from datapump_spark.operators.mp3 import _ENC_TABLES
    # loud tone -> big quantized values -> stand-in table 15 selected
    loud = encode_mp3(_tone(440, 44100, 0.2), 44100)
    _, _, info = decode_mp3(loud, return_info=True)
    assert info["standin_tables"] and info["twin_marked"]
    foreign = _clear_private_bits(loud)
    _, _, info_f = decode_mp3(foreign, return_info=True)
    assert info_f["standin_tables"] and not info_f["twin_marked"]
    with pytest.raises(UnsupportedMediaError, match="stand-in"):
        decode_audio(foreign)
    # plain decode_mp3 still decodes (callers opt into the gate)
    out, sr = decode_mp3(foreign)
    assert sr == 44100 and len(out)
    # an unmarked hand-built frame confined to EXACT table 5 decodes
    # through decode_audio (the gate only fires on stand-in tables)
    assert (3, 6) in _ENC_TABLES          # exact-table tier exists
    codes = mp3._pair_codes(5)
    bits = (_code_bits(codes, (2, 3)) + "0" + "1"      # (2, -3)
            + _code_bits(codes, (1, 0)) + "0")         # (1, 0)
    frame = _build_frame(bits, table=5, big_values=2, count1table=1)
    _, _, info_e = decode_mp3(frame, return_info=True)
    assert not info_e["standin_tables"] and not info_e["twin_marked"]
    f, sr = decode_audio(frame)
    assert sr == 44100 and len(f)


def test_lsf_round_trip_all_rates():
    """r10: MPEG-2 (/2) and MPEG-2.5 (/4) LSF streams — one granule
    per frame, 8-bit main_data_begin, 9-bit scalefac_compress, LSF
    band tables — round-trip at every rate."""
    for sr in (22050, 24000, 16000, 11025, 12000, 8000):
        x = _tone(300, sr, secs=1.0)
        out, got = decode_mp3(encode_mp3(x, sr))
        assert got == sr and out.shape[1] == 1
        assert abs(_dominant(out[:, 0], sr, skip=2048, n=4096) - 300) < 8
        assert _snr_db(out[:, 0], x, search=3000, n=3000) > 18, sr


def test_lsf_scalefac_partitions():
    """The three scalefac_compress partitions read the right bit
    counts and the >= 500 range implies preflag."""
    from datapump_spark.operators.mp3 import _BR, _read_scalefacs_lsf
    # sfc 0: all slens zero -> zero bits, no preflag
    g = {"scalefac_compress": 0, "window_switching": 0, "block_type": 0,
         "mixed": 0, "preflag": 0}
    r = _BR(b"\xff" * 8)
    long_sf, _ = _read_scalefacs_lsf(r, g)
    assert r.pos == 0 and long_sf == [0] * 22 and g["preflag"] == 0
    # sfc 500: slen (0,0) -> zero bits but preflag IMPLIED
    g = {"scalefac_compress": 500, "window_switching": 0,
         "block_type": 0, "mixed": 0, "preflag": 0}
    r = _BR(b"\xff" * 8)
    _read_scalefacs_lsf(r, g)
    assert g["preflag"] == 1
    # sfc 35: slen [(35>>4)//5, (35>>4)%5, (35>>2)&3, 35&3] = [0,2,0,3]
    # over long groups [6,5,5,5] -> 5*2 + 5*3 = 25 bits
    g = {"scalefac_compress": 35, "window_switching": 0,
         "block_type": 0, "mixed": 0, "preflag": 0}
    r = _BR(b"\xff" * 8)
    long_sf, _ = _read_scalefacs_lsf(r, g)
    assert r.pos == 25 and long_sf[6] == 3 and long_sf[11] == 0 \
        and long_sf[16] == 7


# ---------------------------------------------------------------------------
# Foreign-fixture round (r11, VERDICT r10 #6): hand-built streams the
# encoder twin never emits, confined to the EXACTLY-transcribed small
# tables so they also pass the r11 stand-in gate unmarked.
# ---------------------------------------------------------------------------


def _gr_bits(pairs, quads=(), table=5, count1table=1):
    """Granule main-data bits: big-value pairs + count1 quads."""
    codes = mp3._pair_codes(table)
    bits = ""
    for x, y in pairs:
        bits += _code_bits(codes, (abs(x), abs(y)))
        if x:
            bits += "1" if x < 0 else "0"
        if y:
            bits += "1" if y < 0 else "0"
    qcodes = mp3._quad_codes(count1table)
    for vals in quads:
        v = ((abs(vals[0]) << 3) | (abs(vals[1]) << 2)
             | (abs(vals[2]) << 1) | abs(vals[3]))
        c, ln = qcodes[v]
        bits += format(c, "b").zfill(ln)
        for val in vals:
            if val:
                bits += "1" if val < 0 else "0"
    return bits


def _frame2(granules, *, scfsi=(0, 0, 0, 0), mdb=0, slots=None,
            sf_bits=("", "")):
    """Mono MPEG-1 44.1 kHz frame from two granule specs
    ({bits, big_values, table, ws, block_type, mixed, sfc, count1table,
    p23}); ``slots`` overrides the main-data bytes (reservoir
    fixtures), ``sf_bits`` prepends raw scalefactor bits per granule."""
    bw = mp3._BW()
    bw.write(mdb, 9)
    bw.write(0, 5)
    for f in scfsi:
        bw.write(f, 1)
    mw = mp3._BW()
    for gi, g in enumerate(granules):
        bits = sf_bits[gi] + g.get("bits", "")
        p23 = g.get("p23", len(bits))
        bw.write(p23, 12)
        bw.write(g.get("big_values", 0), 9)
        bw.write(g.get("global_gain", 210), 8)
        bw.write(g.get("sfc", 0), 4)
        ws = g.get("ws", 0)
        bw.write(ws, 1)
        tbl = g.get("table", 5)
        if ws:
            bw.write(g["block_type"], 2)
            bw.write(g.get("mixed", 0), 1)
            bw.write(tbl, 5), bw.write(tbl, 5)
            for sb in g.get("subblock_gain", (0, 0, 0)):
                bw.write(sb, 3)
        else:
            for _ in range(3):
                bw.write(tbl, 5)
            bw.write(7, 4), bw.write(7, 3)
        bw.write(0, 1)                     # preflag
        bw.write(g.get("scalefac_scale", 0), 1)
        bw.write(g.get("count1table", 1), 1)
        for bit in bits:
            mw.write(int(bit), 1)
    si = bw.bytes_padded()
    assert len(si) == 17
    main = slots if slots is not None else mw.bytes_padded()
    need = 4 + 17 + len(main)
    br_idx = next(i for i in range(1, 15)
                  if 144000 * mp3._BITRATE[i] // 44100 >= need)
    flen = 144000 * mp3._BITRATE[br_idx] // 44100
    hdr = bytes([0xFF, 0xFB, (br_idx << 4), 3 << 6])
    return hdr + si + main + b"\x00" * (flen - need)


def test_foreign_reservoir_spans_three_frames():
    """main_data_begin reaching back across THREE frames' slots — the
    twin writes no reservoir at all, and the r8 hand fixture spanned
    one frame. The same granule decoded from in-frame slots must give
    identical PCM, and decode_audio must admit the unmarked stream
    (small tables only: the stand-in gate stays quiet)."""
    pairs = [(3, -3)] * 160
    quads = [(1, 0, -1, 0), (0, 1, 0, -1)]
    bits = _gr_bits(pairs, quads, table=5, count1table=1)
    g3 = {"bits": bits, "big_values": 160, "table": 5,
          "count1table": 1}
    gz = {"bits": "", "big_values": 0}
    mw = mp3._BW()
    for bit in bits:
        mw.write(int(bit), 1)
    payload = mw.bytes_padded()
    assert len(payload) > 170              # spans >2 x 83-byte slots
    k = len(payload) - 166
    slots0 = b"\x00" * (83 - k) + payload[:k]
    carrier = [
        _frame2([gz, gz], slots=slots0),
        _frame2([gz, gz], slots=payload[k:k + 83]),
        _frame2([gz, gz], slots=payload[k + 83:k + 166]),
        _frame2([g3, gz], mdb=len(payload), slots=b""),
    ]
    reference = [
        _frame2([gz, gz], slots=b"\x00" * 83),
        _frame2([gz, gz], slots=b"\x00" * 83),
        _frame2([gz, gz], slots=b"\x00" * 83),
        _frame2([g3, gz]),
    ]
    out_c, sr_c = decode_mp3(b"".join(carrier))
    out_r, sr_r = decode_mp3(b"".join(reference))
    assert sr_c == sr_r == 44100
    assert out_c.shape == out_r.shape
    assert np.allclose(out_c, out_r, atol=1e-12)
    assert np.abs(out_c).max() > 0         # the granule really decoded
    f, _ = decode_audio(b"".join(carrier))  # unmarked + exact tables
    assert len(f)


def test_foreign_window_switching_blocks():
    """Short (incl. MIXED) and start/stop block granules — the twin
    emits long blocks only. Each must decode to finite, nonzero PCM
    through the reorder / IMDCT-window paths."""
    bits = _gr_bits([(2, 1)] * 12, [(1, 0, 0, -1)], table=5)
    for bt, mixed in ((2, 0), (2, 1), (1, 0), (3, 0)):
        g = {"bits": bits, "big_values": 12, "table": 5, "ws": 1,
             "block_type": bt, "mixed": mixed}
        out, sr = decode_mp3(_frame2([g, {"bits": ""}]))
        assert sr == 44100 and np.isfinite(out).all(), (bt, mixed)
        assert np.abs(out).max() > 0, (bt, mixed)
    # subblock gains shift short windows without breaking decode
    g = {"bits": bits, "big_values": 12, "table": 5, "ws": 1,
         "block_type": 2, "subblock_gain": (1, 2, 3)}
    out, _ = decode_mp3(_frame2([g, {"bits": ""}]))
    assert np.isfinite(out).all()


def test_foreign_scfsi_reuses_granule0_scalefactors():
    """scfsi group bits — the twin always writes zero scfsi. Granule 1
    with all four groups flagged reads NO scalefactor bits and must
    reuse granule 0's values: PCM identical to the explicit twin-style
    stream that repeats the same scalefactors."""
    slen1, slen2 = mp3._SLEN[13]           # sfc 13: (3, 3)
    sf_vals = [(i * 3) % 7 for i in range(21)]
    sf_bits = "".join(format(v, "b").zfill(slen1 if i < 11 else slen2)
                      for i, v in enumerate(sf_vals))
    bits = _gr_bits([(1, 1)] * 30, table=5)
    g = {"bits": bits, "big_values": 30, "table": 5, "sfc": 13}
    shared = _frame2([dict(g), dict(g)], scfsi=(1, 1, 1, 1),
                     sf_bits=(sf_bits, ""))
    explicit = _frame2([dict(g), dict(g)], scfsi=(0, 0, 0, 0),
                       sf_bits=(sf_bits, sf_bits))
    out_s, _ = decode_mp3(shared)
    out_e, _ = decode_mp3(explicit)
    assert out_s.shape == out_e.shape
    assert np.allclose(out_s, out_e, atol=1e-12)
    assert np.abs(out_s).max() > 0
    # and a partial mask: groups 2-3 shared, 0-1 re-read
    half_bits = "".join(
        format(v, "b").zfill(slen1) for i, v in enumerate(sf_vals[:11])
        if i < 11)
    partial = _frame2([dict(g), dict(g)], scfsi=(0, 0, 1, 1),
                      sf_bits=(sf_bits, half_bits))
    out_p, _ = decode_mp3(partial)
    assert np.allclose(out_p, out_e, atol=1e-12)
