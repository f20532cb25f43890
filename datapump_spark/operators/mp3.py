"""MP3 (MPEG-1/2/2.5 Audio Layer III) decode/encode in pure Python +
numpy (round 10).

MP3 is the most common audio payload in any crawl and until now it
was sniff-only (frame walk + Xing/VBRI duration in mediasniff) while
WAV/ADPCM/FLAC fully decode. This implements the public ISO/IEC
11172-3 Layer III decode chain:

- frame headers (MPEG-1 AND the MPEG-2/2.5 LSF extensions — /2 and
  /4 sample rates, one granule per frame — Layer III, CRC skipped),
  ID3v2 tag skip;
- side information (main_data_begin bit reservoir, scfsi, per-granule
  part2_3_length / big_values / global_gain / scalefac_compress /
  window switching / block types / table_select / subblock_gain /
  region counts / preflag / scalefac_scale / count1table_select);
- scalefactors (slen pairs, scfsi reuse groups, short/mixed layouts);
- Huffman spectrum decode (big-value region pairs with linbits
  escapes + sign bits, count1 quads, rzero), region boundaries from
  the scalefactor-band tables per sample rate;
- requantization (global gain, scalefac_scale, pretab, subblock
  gain), short-block reordering, stereo (MS and intensity),
  alias-reduction butterflies, the 36/12-point IMDCT hybrid with
  sine/start/stop/short windows, frequency inversion, and the
  32-band polyphase synthesis filterbank;
- an encoder twin (long blocks, scalefactors zero, no reservoir)
  that exercises the full decode chain in round-trip tests.

Spec-fidelity seams (honest, recorded in COVERAGE.md): the small
Huffman pair tables (1,2,3,5,6) and the count1 quad tables are the
spec tables (Kraft-validated at import); the LARGE pair tables
(7..13,15,16,24 and their linbits families) are self-consistent
canonical stand-ins built from a documented Laplacian model — same
epistemic class as the VP8 trained-probability stand-ins, because no
reference encoder exists in this container to conform against. The
polyphase prototype is a Kaiser windowed-sinc pseudo-QMF stand-in
for the spec's Table B.3 window (the table is not closed-form); the
analysis side is constructed as the exact adjoint of the synthesis
operator, so round trips are near-perfect-reconstruction by
construction. LSF streams decode with the 9-bit scalefac_compress
partitioning (implied preflag, four slen band groups) and the Annex-B
LSF band tables; LSF intensity stereo and free-format bitrates are
refused honestly.

Scale note: decode runs as an Arrow mapInPandas kernel per document
(operators/multimodal.decode_audio dispatch); the synthesis and
IMDCT stages are whole-signal numpy matmuls (no per-slot Python
loop), and the only per-symbol Python is the Huffman walk, which
uses flat peek-LUTs per table.

Reference parity note: the reference (datapump.py) has no audio
surface; charter extension for multimodal pipelines.
"""

from __future__ import annotations

import math
from functools import lru_cache

import numpy as np

from datapump_spark.operators.codecs import UnsupportedMediaError

# ---------------------------------------------------------------------------
# Normative constants (ISO/IEC 11172-3)
# ---------------------------------------------------------------------------

_SR = {0: 44100, 1: 48000, 2: 32000}
# LSF sample-rate tables: version code 2 = MPEG-2 (/2), 0 = MPEG-2.5 (/4)
_SR_BY_VERSION = {3: {0: 44100, 1: 48000, 2: 32000},
                  2: {0: 22050, 1: 24000, 2: 16000},
                  0: {0: 11025, 1: 12000, 2: 8000}}
_BITRATE = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320]
_BITRATE_V2 = [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160]

_SFB_LONG = {
    44100: [0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 52, 62, 74, 90, 110,
            134, 162, 196, 238, 288, 342, 418, 576],
    48000: [0, 4, 8, 12, 16, 20, 24, 30, 36, 42, 50, 60, 72, 88, 106,
            128, 156, 190, 230, 276, 330, 384, 576],
    32000: [0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 54, 66, 82, 102, 126,
            156, 194, 240, 296, 364, 448, 550, 576],
}
_SFB_SHORT = {
    44100: [0, 4, 8, 12, 16, 22, 30, 40, 52, 66, 84, 106, 136, 192],
    48000: [0, 4, 8, 12, 16, 22, 28, 38, 50, 64, 80, 100, 126, 192],
    32000: [0, 4, 8, 12, 16, 22, 30, 42, 58, 78, 104, 138, 180, 192],
}
# LSF band tables (ISO 13818-3 Annex B; same transcription caveat as
# the other normative tables — see module docstring)
_SFB_LONG.update({
    22050: [0, 6, 12, 18, 24, 30, 36, 44, 54, 66, 80, 96, 116, 140,
            168, 200, 238, 284, 336, 396, 464, 522, 576],
    24000: [0, 6, 12, 18, 24, 30, 36, 44, 54, 66, 80, 96, 114, 136,
            162, 194, 232, 278, 332, 394, 464, 540, 576],
    16000: [0, 6, 12, 18, 24, 30, 36, 44, 54, 66, 80, 96, 116, 140,
            168, 200, 238, 284, 336, 396, 464, 522, 576],
    8000: [0, 12, 24, 36, 48, 60, 72, 88, 108, 132, 160, 192, 232,
           280, 336, 400, 476, 566, 568, 570, 572, 574, 576],
})
_SFB_LONG[11025] = _SFB_LONG[22050]
_SFB_LONG[12000] = _SFB_LONG[24000]
_SFB_SHORT.update({
    22050: [0, 4, 8, 12, 18, 24, 32, 42, 56, 74, 100, 132, 174, 192],
    24000: [0, 4, 8, 12, 18, 26, 36, 48, 62, 80, 104, 136, 180, 192],
    16000: [0, 4, 8, 12, 18, 26, 36, 48, 62, 80, 104, 134, 174, 192],
    8000: [0, 8, 16, 24, 36, 52, 72, 96, 124, 160, 162, 164, 166, 192],
})
_SFB_SHORT[11025] = _SFB_SHORT[22050]
_SFB_SHORT[12000] = _SFB_SHORT[24000]

# LSF scalefactor partitioning (ISO 13818-3 2.4.3.2): slen values and
# band-group counts per scalefac_compress range and block shape
# (0 = long, 1 = short, 2 = mixed)
_LSF_NSFB = {
    0: ([6, 5, 5, 5], [9, 9, 9, 9], [6, 9, 9, 9]),
    1: ([6, 5, 7, 3], [9, 9, 12, 6], [6, 9, 12, 6]),
    2: ([11, 10, 0, 0], [18, 18, 0, 0], [15, 18, 0, 0]),
}

_PRETAB = [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 3, 3, 3, 2, 0]

_SLEN = [(0, 0), (0, 1), (0, 2), (0, 3), (3, 0), (1, 1), (1, 2), (1, 3),
         (2, 1), (2, 2), (2, 3), (3, 1), (3, 2), (3, 3), (4, 2), (4, 3)]

# alias-reduction butterflies (Table B.9 c_i values)
_ALIAS_CI = np.array([-0.6, -0.535, -0.33, -0.185, -0.095, -0.041,
                      -0.0142, -0.0037])
_ALIAS_CS = 1.0 / np.sqrt(1.0 + _ALIAS_CI ** 2)
_ALIAS_CA = _ALIAS_CI * _ALIAS_CS

# intensity-stereo ratios tan(p * pi / 12); position 7 is illegal
_IS_RATIO = [math.tan(p * math.pi / 12) for p in range(7)]

# ---------------------------------------------------------------------------
# Huffman tables.  Spec tables 1,2,3,5,6 and quad table A are transcribed
# from ISO 11172-3 Table B.7 (Kraft-validated below); quad table B is the
# fixed 4-bit ~v code.  The large pair tables are canonical stand-ins (see
# module docstring).  Tables 17-23 reuse table 16's codes and 25-31 reuse
# table 24's, per the spec's table-sharing scheme; only linbits differ.
# ---------------------------------------------------------------------------

_EXACT_PAIR = {
    1: ["0 0 1", "0 1 001", "1 0 01", "1 1 000"],
    2: ["0 0 1", "0 1 010", "0 2 000001", "1 0 011", "1 1 001",
        "1 2 00001", "2 0 00011", "2 1 00010", "2 2 000000"],
    3: ["0 0 11", "0 1 10", "0 2 000001", "1 0 001", "1 1 01",
        "1 2 00001", "2 0 00011", "2 1 00010", "2 2 000000"],
    5: ["0 0 1", "0 1 010", "0 2 000110", "0 3 0000101",
        "1 0 011", "1 1 001", "1 2 000100", "1 3 0000100",
        "2 0 000111", "2 1 000101", "2 2 0000111", "2 3 00000001",
        "3 0 0000110", "3 1 000001", "3 2 0000010", "3 3 00000000"],
    6: ["0 0 111", "0 1 011", "0 2 00101", "0 3 0000001",
        "1 0 110", "1 1 10", "1 2 0100", "1 3 00011",
        "2 0 0101", "2 1 0001", "2 2 00100", "2 3 000001",
        "3 0 000011", "3 1 00010", "3 2 000010", "3 3 0000000"],
}

# count1 quad table A (16 entries over the 4-bit (v,w,x,y) pattern)
_QUAD_A = {0: "1", 1: "0101", 2: "0100", 3: "00101", 4: "0110",
           5: "000101", 6: "00100", 7: "000100", 8: "0111", 9: "00011",
           10: "00110", 11: "000011", 12: "00111", 13: "000010",
           14: "000001", 15: "000000"}

# (xmax, linbits) for every big-value table id; None = invalid table
_TABLE_INFO = {
    0: (0, 0), 1: (1, 0), 2: (2, 0), 3: (2, 0), 5: (3, 0), 6: (3, 0),
    7: (5, 0), 8: (5, 0), 9: (5, 0), 10: (7, 0), 11: (7, 0), 12: (7, 0),
    13: (15, 0), 15: (15, 0),
    16: (15, 1), 17: (15, 2), 18: (15, 3), 19: (15, 4), 20: (15, 6),
    21: (15, 8), 22: (15, 10), 23: (15, 13),
    24: (15, 4), 25: (15, 5), 26: (15, 6), 27: (15, 7), 28: (15, 8),
    29: (15, 9), 30: (15, 11), 31: (15, 13),
}
# which code table each id shares (spec table-sharing scheme)
_CODE_OF = {i: i for i in _TABLE_INFO}
_CODE_OF.update({i: 16 for i in range(17, 24)})
_CODE_OF.update({i: 24 for i in range(25, 32)})

_MAXLEN = 19                             # spec maximum hcod length


def _depth_limited_lengths(freqs: list[int], limit: int) -> list[int]:
    """Optimal Huffman code lengths, then zlib-style overflow
    adjustment down to ``limit`` (Kraft-complete by construction)."""
    import heapq
    n = len(freqs)
    if n == 1:
        return [1]
    heap = [(f, i, (i,)) for i, f in enumerate(freqs)]
    heapq.heapify(heap)
    depth = [0] * n
    while len(heap) > 1:
        f1, _, s1 = heapq.heappop(heap)
        f2, _, s2 = heapq.heappop(heap)
        for i in s1 + s2:
            depth[i] += 1
        heapq.heappush(heap, (f1 + f2, min(s1 + s2), s1 + s2))
    # clamp + restore Kraft equality (sum 2^-l == 1)
    depth = [min(d, limit) for d in depth]
    kraft = sum(2.0 ** -d for d in depth)
    order = sorted(range(n), key=lambda i: (-depth[i], i))
    while kraft > 1.0 + 1e-12:
        # deepen the shallowest-frequency symbol that is under limit
        cand = min((i for i in range(n) if depth[i] < limit),
                   key=lambda i: (freqs[i], -depth[i]))
        kraft -= 2.0 ** -depth[cand] - 2.0 ** -(depth[cand] + 1)
        depth[cand] += 1
    while kraft < 1.0 - 1e-12:
        cand = max(range(n), key=lambda i: depth[i])
        kraft += 2.0 ** -(depth[cand] - 1) - 2.0 ** -depth[cand]
        depth[cand] -= 1
    return depth


def _canonical_codes(symbols, lengths):
    """Canonical code assignment ordered by (length, symbol)."""
    order = sorted(range(len(symbols)), key=lambda i: (lengths[i], i))
    codes, code, prev = {}, 0, 0
    for i in order:
        code <<= lengths[i] - prev
        prev = lengths[i]
        codes[symbols[i]] = (code, lengths[i])
        code += 1
    return codes


def _standin_pair_codes(n: int) -> dict:
    """Self-consistent stand-in for a large spec pair table: canonical
    Huffman over a Laplacian model p(x,y) ~ 0.42^(x+y) (documented in
    COVERAGE.md; no reference encoder exists in-container to conform
    the true spec codes against)."""
    syms = [(x, y) for x in range(n) for y in range(n)]
    freqs = [max(1, int(1e9 * 0.42 ** (x + y))) for x, y in syms]
    lengths = _depth_limited_lengths(freqs, _MAXLEN)
    return _canonical_codes(syms, lengths)


def _parse_exact(entries) -> dict:
    out = {}
    for e in entries:
        x, y, code = e.split()
        out[(int(x), int(y))] = (int(code, 2), len(code))
    return out


def _validate_prefix(codes: dict, name: str):
    kraft = sum(2.0 ** -l for _, l in codes.values())
    if abs(kraft - 1.0) > 1e-9:
        raise AssertionError(f"huffman table {name}: Kraft sum {kraft}")
    seen = set()
    for c, l in codes.values():
        key = (c, l)
        if key in seen:
            raise AssertionError(f"huffman table {name}: duplicate code")
        seen.add(key)


@lru_cache(maxsize=None)
def _pair_codes(code_id: int) -> dict:
    if code_id in _EXACT_PAIR:
        codes = _parse_exact(_EXACT_PAIR[code_id])
    else:
        codes = _standin_pair_codes(_TABLE_INFO[code_id][0] + 1)
    _validate_prefix(codes, str(code_id))
    return codes


@lru_cache(maxsize=None)
def _quad_codes(select: int) -> dict:
    if select == 0:
        codes = {v: (int(c, 2), len(c)) for v, c in _QUAD_A.items()}
    else:                                # table B: 4-bit ~v
        codes = {v: ((~v) & 0xF, 4) for v in range(16)}
    _validate_prefix(codes, f"quad{select}")
    return codes


@lru_cache(maxsize=None)
def _decode_lut(kind: str, ident: int):
    """Flat peek-LUT: index by the next ``maxlen`` bits, value packed
    (length << 16 | x << 8 | y) for pairs, (length << 16 | v) for
    quads."""
    codes = _pair_codes(ident) if kind == "pair" else _quad_codes(ident)
    maxlen = max(l for _, l in codes.values())
    lut = np.zeros(1 << maxlen, np.int32)
    for sym, (c, l) in codes.items():
        lo = c << (maxlen - l)
        hi = lo + (1 << (maxlen - l))
        if kind == "pair":
            packed = (l << 16) | (sym[0] << 8) | sym[1]
        else:
            packed = (l << 16) | sym
        lut[lo:hi] = packed
    return lut, maxlen


# ---------------------------------------------------------------------------
# Bit I/O (MSB-first, as the MPEG bitstream)
# ---------------------------------------------------------------------------


class _BR:
    __slots__ = ("b", "pos")

    def __init__(self, b: bytes, bitpos: int = 0):
        self.b = b + b"\x00\x00\x00\x00"
        self.pos = bitpos

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        p = self.pos
        self.pos = p + n
        byte, off = p >> 3, p & 7
        span = (off + n + 7) >> 3
        v = int.from_bytes(self.b[byte:byte + span], "big")
        return (v >> (span * 8 - off - n)) & ((1 << n) - 1)

    def peek24(self) -> int:
        p = self.pos
        byte, off = p >> 3, p & 7
        v = int.from_bytes(self.b[byte:byte + 4], "big")
        return (v >> (8 - off)) & 0xFFFFFF


class _BW:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, v: int, n: int):
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.out.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def bits_written(self) -> int:
        return len(self.out) * 8 + self.nbits

    def extend(self, other: "_BW"):
        for byte in other.out:
            self.write(byte, 8)
        if other.nbits:
            self.write(other.acc, other.nbits)

    def bytes_padded(self) -> bytes:
        if self.nbits:
            return bytes(self.out) + bytes([(self.acc << (8 - self.nbits))
                                            & 0xFF])
        return bytes(self.out)


# ---------------------------------------------------------------------------
# Hybrid filterbank pieces (IMDCT + polyphase), built as whole-signal
# matrix operators.  The analysis side is the exact adjoint of the
# synthesis side, so encode->decode is near-PR by construction.
# ---------------------------------------------------------------------------

_M36 = np.cos(np.pi / 72 * (2 * np.arange(36)[:, None] + 19)
              * (2 * np.arange(18)[None, :] + 1))          # (36, 18)
_M12 = np.cos(np.pi / 24 * (2 * np.arange(12)[:, None] + 7)
              * (2 * np.arange(6)[None, :] + 1))           # (12, 6)

_W_NORMAL = np.sin(np.pi / 36 * (np.arange(36) + 0.5))
_W_SHORT12 = np.sin(np.pi / 12 * (np.arange(12) + 0.5))
_W_START = _W_NORMAL.copy()
_W_START[18:24] = 1.0
_W_START[24:30] = np.sin(np.pi / 12 * (np.arange(24, 30) - 18 + 0.5))
_W_START[30:] = 0.0
_W_STOP = _W_NORMAL.copy()
_W_STOP[:6] = 0.0
_W_STOP[6:12] = np.sin(np.pi / 12 * (np.arange(6, 12) - 6 + 0.5))
_W_STOP[12:18] = 1.0
_WINDOWS = {0: _W_NORMAL, 1: _W_START, 3: _W_STOP}

# polyphase: 512-tap Kaiser windowed-sinc pseudo-QMF prototype
# (stand-in for spec Table B.3, which is table-only), cutoff pi/64,
# with the (-1)^(i//64) sign pattern that turns the V-FIFO fold into
# a true cosine modulation (see derivation in docstring).
# center 256 (NOT 255.5): the structure's cos((n+16)(2k+1)pi/64)
# modulation needs the prototype centered so the per-band phase lands
# on the classic (2k+1)pi/4 pseudo-QMF alias-cancellation grid; the
# cutoff stretch 1.16 and Kaiser beta 13 were grid-searched for max
# round-trip SNR (46 dB on white noise; see test_mp3).
_n = np.arange(512)
_t = (_n - 256.0) * 1.16 / 64.0
_PROTO = np.kaiser(512, 13.0) * np.sinc(_t)
_PROTO /= _PROTO.sum()                   # unit DC gain
_D_WIN = _PROTO * ((-1.0) ** (_n // 64))
_N64 = np.cos(np.pi / 64 * (16 + np.arange(64))[:, None]
              * (2 * np.arange(32)[None, :] + 1))          # (64, 32)

_G = np.empty((16, 32, 32))
for _d in range(16):
    _a, _odd = divmod(_d, 2)
    if not _odd:
        _G[_d] = _D_WIN[64 * _a:64 * _a + 32, None] * _N64[0:32]
    else:
        _G[_d] = _D_WIN[64 * _a + 32:64 * _a + 64, None] * _N64[32:64]
# analysis normalization: mean diagonal of sum_d G_d^T G_d
_PQMF_GAIN = float(np.trace(sum(g.T @ g for g in _G)) / 32.0)
del _n, _t, _d, _a, _odd


def _synthesis(S: np.ndarray) -> np.ndarray:
    """(T, 32) subband slots -> (T*32,) PCM via y_t = sum_d S_{t-d} G_d^T."""
    T = S.shape[0]
    y = np.zeros((T, 32))
    for d in range(16):
        if d == 0:
            y += S @ _G[0].T
        elif d < T:
            y[d:] += S[:-d] @ _G[d].T
    return y.reshape(-1)


def _analysis(x: np.ndarray) -> np.ndarray:
    """(T*32,) PCM -> (T, 32) subband slots: exact adjoint of
    :func:`_synthesis`, normalized; 15-slot latency."""
    xb = x.reshape(-1, 32)
    T = xb.shape[0]
    S = np.zeros((T, 32))
    for d in range(16):
        shift = d - 15                    # x_{t-15+d}
        if shift == 0:
            S += xb @ _G[d]
        else:                             # shift < 0: past samples
            S[-shift:] += xb[:shift] @ _G[d]
    return S / _PQMF_GAIN


def _imdct_long(X: np.ndarray, block_type: int) -> np.ndarray:
    """(18,) spectral -> (36,) windowed time for long block types."""
    return (_M36 @ X) * _WINDOWS[block_type]


def _imdct_short(X: np.ndarray) -> np.ndarray:
    """(18,) spectral (3 interleaved windows of 6) -> (36,) assembled."""
    out = np.zeros(36)
    for w in range(3):
        xi = (_M12 @ X[w::3]) * _W_SHORT12
        out[6 + 6 * w:18 + 6 * w] += xi
    return out


# ---------------------------------------------------------------------------
# Header / side info
# ---------------------------------------------------------------------------


def _parse_header(b: bytes, i: int):
    """Return dict or None if b[i:] is not a valid MPEG Layer III
    header. MPEG-1 and the LSF extensions (MPEG-2 at /2 rates,
    MPEG-2.5 at /4 rates — r10) both parse; version code 1 is
    reserved."""
    if i + 4 > len(b) or b[i] != 0xFF or (b[i + 1] & 0xE0) != 0xE0:
        return None
    version = (b[i + 1] >> 3) & 0x3
    layer = (b[i + 1] >> 1) & 0x3
    if layer != 1 or version == 1:        # not Layer III / reserved
        return None
    lsf = version != 3
    prot = b[i + 1] & 1
    br_idx = b[i + 2] >> 4
    sr_idx = (b[i + 2] >> 2) & 0x3
    if sr_idx == 3 or br_idx == 15:
        return None
    if br_idx == 0:
        raise UnsupportedMediaError("free-format MP3 bitrate unsupported")
    padding = (b[i + 2] >> 1) & 1
    mode = b[i + 3] >> 6
    mode_ext = (b[i + 3] >> 4) & 0x3
    sr = _SR_BY_VERSION[version][sr_idx]
    kbps = (_BITRATE_V2 if lsf else _BITRATE)[br_idx]
    # LSF frames carry ONE granule (576 samples): 72000 factor
    frame_len = (72000 if lsf else 144000) * kbps // sr + padding
    return {"sr": sr, "sr_idx": sr_idx, "bitrate": kbps, "lsf": lsf,
            "version": version, "private": b[i + 2] & 1,
            "prot": prot, "mode": mode, "mode_ext": mode_ext,
            "nch": 1 if mode == 3 else 2, "frame_len": frame_len}


def _parse_side_info(b: bytes, nch: int, lsf: bool = False):
    r = _BR(b)
    si = {"main_data_begin": r.read(8 if lsf else 9)}
    if lsf:
        r.read(1 if nch == 1 else 2)
        si["scfsi"] = [[0] * 4 for _ in range(nch)]   # no scfsi in LSF
    else:
        r.read(5 if nch == 1 else 3)
        si["scfsi"] = [[r.read(1) for _ in range(4)] for _ in range(nch)]
    grs = []
    for _g in range(1 if lsf else 2):
        chs = []
        for _c in range(nch):
            g = {"part2_3_length": r.read(12), "big_values": r.read(9),
                 "global_gain": r.read(8),
                 "scalefac_compress": r.read(9 if lsf else 4),
                 "lsf": lsf,
                 "window_switching": r.read(1)}
            if g["window_switching"]:
                g["block_type"] = r.read(2)
                g["mixed"] = r.read(1)
                g["table_select"] = [r.read(5), r.read(5), 0]
                g["subblock_gain"] = [r.read(3) for _ in range(3)]
                if g["block_type"] == 0:
                    raise ValueError("window switching with block type 0")
                g["region0_count"] = (8 if g["block_type"] == 2
                                      and not g["mixed"] else 7)
                g["region1_count"] = 20 - g["region0_count"]
            else:
                g["block_type"] = 0
                g["mixed"] = 0
                g["table_select"] = [r.read(5) for _ in range(3)]
                g["region0_count"] = r.read(4)
                g["region1_count"] = r.read(3)
                g["subblock_gain"] = [0, 0, 0]
            # LSF has no preflag bit: it is implied by the
            # scalefac_compress >= 500 partition (set during
            # scalefactor decode)
            g["preflag"] = 0 if lsf else r.read(1)
            g["scalefac_scale"] = r.read(1)
            g["count1table_select"] = r.read(1)
            chs.append(g)
        grs.append(chs)
    si["granules"] = grs
    return si


# ---------------------------------------------------------------------------
# Scalefactors + Huffman spectrum
# ---------------------------------------------------------------------------

_SCFSI_BANDS = [(0, 6), (6, 11), (11, 16), (16, 21)]


def _read_scalefacs_lsf(r: _BR, g: dict):
    """LSF scalefactors (ISO 13818-3 2.4.3.2, r10): scalefac_compress
    (9 bits) partitions into four slen values over four band groups;
    the >= 500 partition implies preflag. Intensity-coded channels
    use a different partition and are refused upstream."""
    sfc = g["scalefac_compress"]
    if sfc < 400:
        slen = [(sfc >> 4) // 5, (sfc >> 4) % 5, (sfc >> 2) & 3, sfc & 3]
        part = 0
    elif sfc < 500:
        t = sfc - 400
        slen = [(t >> 2) // 5, (t >> 2) % 5, t & 3, 0]
        part = 1
    else:
        t = sfc - 500
        slen = [t // 3, t % 3, 0, 0]
        part = 2
        g["preflag"] = 1
    short = g["window_switching"] and g["block_type"] == 2
    shape = 0 if not short else (2 if g["mixed"] else 1)
    nsfb = _LSF_NSFB[part][shape]
    long_sf = [0] * 22
    short_sf = [[0, 0, 0] for _ in range(13)]
    li = si = 0
    for grp in range(4):
        n = nsfb[grp]
        sl = slen[grp]
        if shape == 0:
            for _ in range(n):
                long_sf[li] = r.read(sl)
                li += 1
        elif shape == 1:
            for _ in range(n // 3):
                for w in range(3):
                    short_sf[si][w] = r.read(sl)
                si += 1
        else:                            # mixed: first group is long
            if grp == 0:
                for _ in range(n):
                    long_sf[li] = r.read(sl)
                    li += 1
            else:
                for _ in range(n // 3):
                    for w in range(3):
                        short_sf[si + 3][w] = r.read(sl)
                    si += 1
    return long_sf, short_sf


def _read_scalefacs(r: _BR, g: dict, scfsi, gr: int, prev):
    """Returns (long_sf[22], short_sf[13][3])."""
    slen1, slen2 = _SLEN[g["scalefac_compress"]]
    long_sf = [0] * 22
    short_sf = [[0, 0, 0] for _ in range(13)]
    if g["window_switching"] and g["block_type"] == 2:
        if g["mixed"]:
            for sfb in range(8):
                long_sf[sfb] = r.read(slen1)
            for sfb in range(3, 6):
                for w in range(3):
                    short_sf[sfb][w] = r.read(slen1)
            for sfb in range(6, 12):
                for w in range(3):
                    short_sf[sfb][w] = r.read(slen2)
        else:
            for sfb in range(6):
                for w in range(3):
                    short_sf[sfb][w] = r.read(slen1)
            for sfb in range(6, 12):
                for w in range(3):
                    short_sf[sfb][w] = r.read(slen2)
    else:
        for grp, (lo, hi) in enumerate(_SCFSI_BANDS):
            slen = slen1 if grp < 2 else slen2
            if gr == 1 and scfsi[grp]:
                for sfb in range(lo, hi):
                    long_sf[sfb] = prev[0][sfb]
            else:
                for sfb in range(lo, hi):
                    long_sf[sfb] = r.read(slen)
    return long_sf, short_sf


def _decode_pair(r: _BR, table_id: int):
    lut, maxlen = _decode_lut("pair", _CODE_OF[table_id])
    packed = int(lut[r.peek24() >> (24 - maxlen)])
    l = packed >> 16
    if l == 0:
        raise ValueError("invalid MP3 Huffman code")
    r.pos += l
    x, y = (packed >> 8) & 0xFF, packed & 0xFF
    linbits = _TABLE_INFO[table_id][1]
    if x == 15 and linbits:
        x += r.read(linbits)
    if x and r.read(1):
        x = -x
    if y == 15 and linbits:
        y += r.read(linbits)
    if y and r.read(1):
        y = -y
    return x, y


def _decode_spectrum(r: _BR, g: dict, sr: int, end_bit: int,
                     standin_used: set | None = None):
    """576 spectral values + count1 end position (zero bound).
    ``standin_used`` (r11) collects every big-value table id whose
    CODE table is a documented Laplacian stand-in rather than an
    exact ISO 11172-3 Table B.7 transcription — the caller decides
    whether plausible-but-unverified output is acceptable."""
    xs = np.zeros(576)
    big = g["big_values"] * 2
    if g["window_switching"]:
        r1, r2 = 36, 576
    else:
        lb = _SFB_LONG[sr]
        r1 = lb[min(g["region0_count"] + 1, 22)]
        r2 = lb[min(g["region0_count"] + g["region1_count"] + 2, 22)]
    i = 0
    while i < big:
        region = 0 if i < r1 else (1 if i < r2 else 2)
        tid = g["table_select"][region]
        if tid in (4, 14) or tid not in _TABLE_INFO:
            raise ValueError(f"invalid MP3 Huffman table {tid}")
        if _TABLE_INFO[tid][0] == 0:      # table 0: both values zero
            i += 2
            continue
        if standin_used is not None and _CODE_OF[tid] not in _EXACT_PAIR:
            standin_used.add(tid)
        x, y = _decode_pair(r, tid)
        xs[i], xs[i + 1] = x, y
        i += 2
    # count1 region: quads until the granule's bit budget is exhausted
    lut, maxlen = _decode_lut("quad", g["count1table_select"])
    while i + 4 <= 576 and r.pos < end_bit:
        packed = int(lut[r.peek24() >> (24 - maxlen)])
        l = packed >> 16
        r.pos += l
        v = packed & 0xFFFF
        vals = [(v >> 3) & 1, (v >> 2) & 1, (v >> 1) & 1, v & 1]
        for k, val in enumerate(vals):
            if val and r.read(1):
                vals[k] = -1
        if r.pos > end_bit:               # overran: discard this quad
            break
        xs[i:i + 4] = vals
        i += 4
    return xs, i


# ---------------------------------------------------------------------------
# Requantize / reorder / stereo / alias
# ---------------------------------------------------------------------------


@lru_cache(maxsize=8)
def _line_maps(sr: int, short: bool, mixed: bool):
    """Per-line sfb / window index arrays in DECODE order, plus the
    short-block reorder permutation into subband-interleaved order."""
    lb, sb = _SFB_LONG[sr], _SFB_SHORT[sr]
    sfb_of = np.zeros(576, np.int32)
    win_of = np.zeros(576, np.int32)
    is_long = np.zeros(576, bool)
    perm = np.arange(576)
    if not short:
        for s in range(22):
            sfb_of[lb[s]:lb[s + 1]] = s
        is_long[:] = True
        return sfb_of, win_of, is_long, perm
    start_line = 0
    first_short_sfb = 0
    if mixed:
        start_line = 36
        first_short_sfb = 3
        for s in range(8):
            sfb_of[lb[s]:lb[s + 1]] = s
        is_long[:36] = True
    pos = start_line
    for s in range(first_short_sfb, 13):
        width = sb[s + 1] - sb[s]
        for w in range(3):
            sfb_of[pos:pos + width] = s
            win_of[pos:pos + width] = w
            # reorder: decode pos (sfb-major, window, i) -> interleaved
            base = start_line + 3 * (sb[s] - sb[first_short_sfb])
            perm[base + 3 * np.arange(width) + w] = np.arange(pos,
                                                              pos + width)
            pos += width
        if pos >= 576:
            break
    return sfb_of, win_of, is_long, perm


def _requantize(xs: np.ndarray, g: dict, sr: int, long_sf, short_sf):
    short = g["window_switching"] and g["block_type"] == 2
    sfb_of, win_of, is_long, perm = _line_maps(sr, short, bool(g["mixed"]))
    step = 1.0 if g["scalefac_scale"] else 0.5
    gain = 0.25 * (g["global_gain"] - 210.0)
    lsf = np.array(long_sf, float)
    if g["preflag"]:
        lsf = lsf + np.array(_PRETAB, float)
    ssf = np.array(short_sf, float)
    sbg = np.array(g["subblock_gain"], float)
    exp = np.full(576, gain)
    if short:
        sl = is_long
        exp[sl] -= step * lsf[sfb_of[sl]]
        ss = ~sl
        exp[ss] += (-step * ssf[sfb_of[ss], win_of[ss]]
                    - 2.0 * sbg[win_of[ss]])
    else:
        exp -= step * lsf[sfb_of]
    xr = np.sign(xs) * np.abs(xs) ** (4.0 / 3.0) * np.exp2(exp)
    return xr[perm] if short else xr


def _alias_reduce(xr: np.ndarray, g: dict):
    short = g["window_switching"] and g["block_type"] == 2
    if short and not g["mixed"]:
        return xr
    n_bound = 1 if short else 31          # mixed: only the long seam
    for b in range(1, n_bound + 1):
        lo = xr[18 * b - 8:18 * b][::-1].copy()
        hi = xr[18 * b:18 * b + 8].copy()
        xr[18 * b - 8:18 * b] = (lo * _ALIAS_CS - hi * _ALIAS_CA)[::-1]
        xr[18 * b:18 * b + 8] = hi * _ALIAS_CS + lo * _ALIAS_CA
    return xr


def _stereo(xr_l, xr_r, zero_r, g_r, hdr, long_sf_r, short_sf_r, sr):
    """In-place MS / intensity processing (joint stereo)."""
    if hdr["mode"] != 1:
        return
    ms = hdr["mode_ext"] & 0x2
    intensity = hdr["mode_ext"] & 0x1
    bound = 576
    if intensity:
        short = g_r["window_switching"] and g_r["block_type"] == 2
        sfb_of, win_of, is_long, _ = _line_maps(
            sr, short, bool(g_r["mixed"]))
        lb, sb = _SFB_LONG[sr], _SFB_SHORT[sr]
        if not short:
            # intensity bound: first sfb boundary at/above zero_r
            sfb0 = next((s for s in range(22) if lb[s] >= zero_r), 22)
            bound = lb[sfb0] if sfb0 < 22 else 576
            for s in range(sfb0, 22):
                p = long_sf_r[s]
                lo, hi = lb[s], lb[s + 1]
                if p < 7:
                    ratio = _IS_RATIO[p]
                    seg = xr_l[lo:hi].copy()
                    xr_l[lo:hi] = seg * (ratio / (1 + ratio))
                    xr_r[lo:hi] = seg * (1 / (1 + ratio))
                elif ms:                  # illegal position: fall back
                    m, s_ = xr_l[lo:hi].copy(), xr_r[lo:hi].copy()
                    xr_l[lo:hi] = (m + s_) / math.sqrt(2)
                    xr_r[lo:hi] = (m - s_) / math.sqrt(2)
        else:
            # short: per-window bound at the sfb covering zero_r
            sfb0 = next((s for s in range(13) if 3 * sb[s] >= zero_r), 13)
            bound = 3 * sb[sfb0] if sfb0 < 13 else 576
            mask = (~is_long) & (sfb_of >= sfb0)
            idx = np.nonzero(mask)[0]
            for i in idx:
                p = short_sf_r[sfb_of[i]][win_of[i]]
                if p < 7:
                    ratio = _IS_RATIO[p]
                    v = xr_l[i]
                    xr_l[i] = v * (ratio / (1 + ratio))
                    xr_r[i] = v * (1 / (1 + ratio))
    if ms:
        m, s = xr_l[:bound].copy(), xr_r[:bound].copy()
        xr_l[:bound] = (m + s) / math.sqrt(2)
        xr_r[:bound] = (m - s) / math.sqrt(2)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def _skip_id3(b: bytes) -> int:
    if b[:3] == b"ID3" and len(b) >= 10:
        size = ((b[6] & 0x7F) << 21) | ((b[7] & 0x7F) << 14) \
            | ((b[8] & 0x7F) << 7) | (b[9] & 0x7F)
        return 10 + size
    return 0


def decode_mp3(b: bytes, return_info: bool = False):
    """Decode an MPEG-1/2/2.5 Layer III stream.  Returns (samples float64 in
    [-1, 1] shape (n, channels), sample_rate).  Frames whose bit
    reservoir reaches before the available history are skipped (the
    standard seek/cut behavior).

    ``return_info`` (r11) appends a third element
    ``{"standin_tables": set[int], "twin_marked": bool}``:
    the big-value Huffman table ids decoded through a documented
    Laplacian STAND-IN code table (module docstring — tables 7-13,
    15, 16/24 families are not exact ISO transcriptions, so foreign
    streams that select them decode to plausible-but-unverified
    samples), and whether EVERY decoded frame carries the header
    private bit that encode_mp3 sets (ISO 11172-3 §2.4.2.3 reserves
    that bit for private use; the twin uses it as a producer mark,
    so twin round trips through stand-in tables remain exact by
    construction while unmarked foreign streams can be refused by
    the ingest path)."""
    i = _skip_id3(b)
    # resync to the first parseable header
    first = None
    while i < len(b) - 4:
        h = _parse_header(b, i)
        if h is not None:
            first = h
            break
        i += 1
    if first is None:
        raise ValueError("no MPEG-1 Layer III frame found")
    sr, nch = first["sr"], first["nch"]
    reservoir = b""
    pcm = []
    standin_tables: set[int] = set()
    twin_marked = True
    overlap = np.zeros((nch, 32, 18))
    synth_slots = [[] for _ in range(nch)]
    while i < len(b) - 4:
        h = _parse_header(b, i)
        if h is None:
            i += 1
            continue
        if h["sr"] != sr or h["nch"] != nch:
            break                          # stream parameter change
        frame = b[i:i + h["frame_len"]]
        if len(frame) < h["frame_len"]:
            break                          # truncated final frame
        off = 4 + (2 if h["prot"] == 0 else 0)
        if h["lsf"]:
            si_len = 9 if nch == 1 else 17
        else:
            si_len = 17 if nch == 1 else 32
        si = _parse_side_info(frame[off:off + si_len], nch, h["lsf"])
        slots = frame[off + si_len:]
        mdb = si["main_data_begin"]
        if mdb > len(reservoir):
            reservoir = (reservoir + slots)[-511:]
            i += h["frame_len"]
            continue                       # reservoir not yet primed
        data = (reservoir[len(reservoir) - mdb:] if mdb else b"") + slots
        r = _BR(data)
        twin_marked = twin_marked and bool(h["private"])
        prev_sf = [None] * nch
        if h["lsf"] and h["mode"] == 1 and h["mode_ext"] & 0x1:
            raise UnsupportedMediaError(
                "LSF intensity stereo unsupported")
        for gr in range(1 if h["lsf"] else 2):
            xrs = []
            zeros = []
            for ch in range(nch):
                g = si["granules"][gr][ch]
                start = r.pos
                end_bit = start + g["part2_3_length"]
                if h["lsf"]:
                    long_sf, short_sf = _read_scalefacs_lsf(r, g)
                else:
                    long_sf, short_sf = _read_scalefacs(
                        r, g, si["scfsi"][ch], gr, prev_sf[ch])
                prev_sf[ch] = (long_sf, short_sf)
                xs, zero = _decode_spectrum(r, g, sr, end_bit,
                                            standin_tables)
                r.pos = end_bit
                xr = _requantize(xs, g, sr, long_sf, short_sf)
                xrs.append(xr)
                zeros.append(zero)
            if nch == 2:
                g_r = si["granules"][gr][1]
                _stereo(xrs[0], xrs[1], zeros[1], g_r, h,
                        prev_sf[1][0], prev_sf[1][1], sr)
            for ch in range(nch):
                g = si["granules"][gr][ch]
                xr = _alias_reduce(xrs[ch], g)
                short = g["window_switching"] and g["block_type"] == 2
                if not short:             # hot path: one matmul for all
                    t32 = ((_M36 @ xr.reshape(32, 18).T)
                           * _WINDOWS[g["block_type"]][:, None])
                    sub = t32[:18].T + overlap[ch]
                    overlap[ch] = t32[18:].T
                    sub = np.ascontiguousarray(sub)
                else:
                    sub = np.empty((32, 18))
                    for sb in range(32):
                        X = xr[18 * sb:18 * sb + 18]
                        if g["mixed"] and sb < 2:
                            t = _imdct_long(X, 0)
                        else:
                            t = _imdct_short(X)
                        sub[sb] = t[:18] + overlap[ch, sb]
                        overlap[ch, sb] = t[18:]
                # frequency inversion: odd subbands, odd time samples
                sub[1::2, 1::2] *= -1.0
                synth_slots[ch].append(sub.T)   # (18 slots, 32 bands)
        reservoir = (reservoir + slots)[-511:]
        i += h["frame_len"]
    if not synth_slots[0]:
        raise ValueError("no decodable MP3 frames")
    for ch in range(nch):
        S = np.concatenate(synth_slots[ch], axis=0)
        pcm.append(_synthesis(S))
    out = np.stack(pcm, axis=1)
    if return_info:
        return np.clip(out, -1.0, 1.0), sr, {
            "standin_tables": standin_tables,
            "twin_marked": twin_marked}
    return np.clip(out, -1.0, 1.0), sr


# ---------------------------------------------------------------------------
# Encoder twin (fixtures / sink side): long blocks, zero scalefactors,
# no bit reservoir, per-granule VBR frame sizing.  Exercises the full
# decode chain (header, side info, Huffman pairs + count1 quads,
# requantization, alias butterflies, IMDCT, synthesis) in round trips.
# ---------------------------------------------------------------------------

_WM36 = _W_NORMAL[:, None] * _M36                # (36, 18) windowed kernel
# composite gain of (adjoint MDCT) -> (IMDCT + OLA) for the sine
# window; calibrated against the TDAC identity and asserted in tests.
_MDCT_FWD_SCALE = 1.0 / 9.0

# encoder table choice: smallest table whose xmax covers the region max
_ENC_TABLES = [(1, 1), (2, 3), (3, 6), (5, 8), (7, 10), (15, 15)]


def _alias_expand(xr: np.ndarray) -> np.ndarray:
    """Inverse alias-reduction butterflies (the decoder's butterfly is
    an orthogonal rotation, so the inverse is its transpose)."""
    for b in range(1, 32):
        lo = xr[18 * b - 8:18 * b][::-1].copy()
        hi = xr[18 * b:18 * b + 8].copy()
        xr[18 * b - 8:18 * b] = (lo * _ALIAS_CS + hi * _ALIAS_CA)[::-1]
        xr[18 * b:18 * b + 8] = hi * _ALIAS_CS - lo * _ALIAS_CA
    return xr


def _quantize(xr: np.ndarray, bump: int = 0):
    """(is_values int, global_gain) with max |is| <= 15; ``bump``
    coarsens by whole global_gain steps (the encoder's rate loop)."""
    amax = float(np.max(np.abs(xr)))
    if amax <= 0.0:
        return np.zeros(576, np.int64), 210
    qexp = math.ceil(4 * math.log2(amax / 15.0 ** (4 / 3))) + bump
    qexp = max(-210, min(45, qexp))
    q = np.round((np.abs(xr) / 2.0 ** (qexp / 4.0)) ** 0.75).astype(np.int64)
    q = np.minimum(q, 15)
    return np.sign(xr).astype(np.int64) * q, 210 + qexp


def _encode_granule(q: np.ndarray, gg: int, bw: _BW) -> dict:
    """Huffman-encode one granule's quantized spectrum into ``bw``;
    returns the side-info fields."""
    nz = np.nonzero(q)[0]
    lnz = int(nz[-1]) + 1 if len(nz) else 0
    big_idx = np.nonzero(np.abs(q) > 1)[0]
    big = (int(big_idx[-1]) + 2) & ~1 if len(big_idx) else 0
    # quads must not overrun line 576: absorb any unquadable tail
    # (at most 2 lines of |v|<=1) into the big-value region
    while True:
        count1 = -(-max(0, lnz - big) // 4) * 4
        if big + count1 <= 576:
            break
        big += 2
    maxv = int(np.max(np.abs(q[:big]))) if big else 0
    tid = next(t for xm, t in _ENC_TABLES if maxv <= xm)
    start = bw.bits_written()
    codes = _pair_codes(_CODE_OF[tid])
    for i in range(0, big, 2):
        x, y = int(q[i]), int(q[i + 1])
        c, l = codes[(abs(x), abs(y))]
        bw.write(c, l)
        if x:
            bw.write(1 if x < 0 else 0, 1)
        if y:
            bw.write(1 if y < 0 else 0, 1)
    qcodes = _quad_codes(0)
    for i in range(big, big + count1, 4):
        vals = [int(q[i + k]) for k in range(4)]
        v = ((abs(vals[0]) << 3) | (abs(vals[1]) << 2)
             | (abs(vals[2]) << 1) | abs(vals[3]))
        c, l = qcodes[v]
        bw.write(c, l)
        for val in vals:
            if val:
                bw.write(1 if val < 0 else 0, 1)
    return {"part2_3_length": bw.bits_written() - start,
            "big_values": big // 2, "global_gain": gg,
            "table_select": tid}


def _write_side_info(gr_info, nch: int, lsf: bool = False) -> bytes:
    bw = _BW()
    bw.write(0, 8 if lsf else 9)          # main_data_begin
    if lsf:
        bw.write(0, 1 if nch == 1 else 2)
    else:
        bw.write(0, 5 if nch == 1 else 3)
        for _ in range(nch * 4):
            bw.write(0, 1)                # scfsi
    for gr in range(1 if lsf else 2):
        for ch in range(nch):
            g = gr_info[gr][ch]
            bw.write(g["part2_3_length"], 12)
            bw.write(g["big_values"], 9)
            bw.write(g["global_gain"], 8)
            bw.write(0, 9 if lsf else 4)  # scalefac_compress
            bw.write(0, 1)                # window_switching
            for _r in range(3):
                bw.write(g["table_select"], 5)
            bw.write(7, 4)                # region0_count
            bw.write(7, 3)                # region1_count
            if not lsf:
                bw.write(0, 1)            # preflag (absent in LSF)
            bw.write(0, 1)                # scalefac_scale
            bw.write(0, 1)                # count1table_select (A)
    return bw.bytes_padded()


def encode_mp3(x, sr: int, normalize: bool = True) -> bytes:
    """Encode PCM to a Layer III stream — MPEG-1 at 32/44.1/48 kHz,
    MPEG-2 at 16/22.05/24 kHz, MPEG-2.5 at 8/11.025/12 kHz (long
    blocks, zero scalefactors, no reservoir; per-frame VBR bitrate
    selection). ``x``: (n,) or (n, channels<=2), int16 or float in
    [-1, 1]."""
    _VER_SR = {44100: (3, 0), 48000: (3, 1), 32000: (3, 2),
               22050: (2, 0), 24000: (2, 1), 16000: (2, 2),
               11025: (0, 0), 12000: (0, 1), 8000: (0, 2)}
    if sr not in _VER_SR:
        raise UnsupportedMediaError(
            f"Layer III sample rate {sr} unsupported (MPEG-1 or LSF "
            "rates only)")
    version, sr_idx = _VER_SR[sr]
    lsf = version != 3
    spf = 576 if lsf else 1152
    grs = 1 if lsf else 2
    brtab = _BITRATE_V2 if lsf else _BITRATE
    factor = 72000 if lsf else 144000
    x = np.asarray(x)
    if x.dtype.kind in "iu":
        x = x.astype(np.float64) / 32768.0
    x = np.atleast_2d(x.T).T.astype(np.float64)
    if x.shape[1] > 2:
        raise UnsupportedMediaError("more than 2 channels")
    nch = x.shape[1]
    n_frames = max(1, -(-x.shape[0] // spf))
    total = n_frames * spf + 1152         # + flush for filterbank delay
    pcm = np.zeros((total, nch))
    pcm[:x.shape[0]] = np.clip(x, -1.0, 1.0)
    n_gr = n_frames * grs
    spectra = np.empty((nch, n_gr, 576))
    for ch in range(nch):
        S = _analysis(np.ascontiguousarray(pcm[:, ch]))
        S[1::2, 1::2] *= -1.0             # frequency inversion (adjoint)
        for g in range(n_gr):
            seg = S[g * 18:g * 18 + 36]   # (36, 32)
            X = _MDCT_FWD_SCALE * (seg.T @ _WM36)     # (32, 18)
            spectra[ch, g] = _alias_expand(X.reshape(576).copy())
    # per-granule bit budget: the 12-bit part2_3_length field AND an
    # equal share of the largest (320 kbps) frame's main-data capacity
    if lsf:
        si_len = 9 if nch == 1 else 17
    else:
        si_len = 17 if nch == 1 else 32
    cap = min(4095, (factor * brtab[14] // sr - 4 - si_len) * 8
              // (grs * nch))
    out = bytearray()
    for f in range(n_frames):
        gr_info = [[None] * nch for _ in range(grs)]
        bw = _BW()
        for gr in range(grs):
            for ch in range(nch):
                bump = 0
                while True:               # rate loop: coarsen until fit
                    q, gg = _quantize(spectra[ch, grs * f + gr], bump)
                    gbw = _BW()
                    info = _encode_granule(q, gg, gbw)
                    if info["part2_3_length"] <= cap or bump > 255:
                        break
                    bump += 4
                bw.extend(gbw)
                gr_info[gr][ch] = info
        main = bw.bytes_padded()
        si = _write_side_info(gr_info, nch, lsf)
        need = 4 + len(si) + len(main)
        br_idx = next((i for i in range(1, 15)
                       if factor * brtab[i] // sr >= need), None)
        if br_idx is None:
            raise ValueError("frame too large for the top bitrate")
        frame_len = factor * brtab[br_idx] // sr
        # private bit (byte 2 bit 0, ISO 11172-3 §2.4.2.3 "for
        # private use") set = twin producer mark; decode_mp3 reports
        # it so the ingest path can refuse UNmarked streams that
        # select a stand-in Huffman table (r11)
        hdr = bytes([0xFF, 0xE0 | (version << 3) | 0x02 | 0x01,
                     (br_idx << 4) | (sr_idx << 2) | 0x01,
                     ((3 if nch == 1 else 0) << 6)])
        out += hdr + si + main + b"\x00" * (frame_len - need)
    return bytes(out)
