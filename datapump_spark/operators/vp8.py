"""Lossy WebP (VP8 key-frame) decode/encode in pure Python + numpy.

Covers the photographic slice of a web crawl — where lossy VP8 is the
dominant WebP flavor (the VP8L path in operators/webp.py covers the
lossless slice). ``decode_vp8`` implements the intra (key-frame) half
of the published VP8 Data Format and Decoding Guide (RFC 6386): the
boolean arithmetic decoder (§7), frame/segment/filter/quantizer
headers (§9), per-macroblock intra mode decoding (§11), the DCT/WHT
coefficient token decoder with per-band contextual probabilities
(§13), dequantization (§14.1), the exact integer inverse WHT/DCT
(§14.3-14.4), all intra prediction modes — 16x16 (§12.2), chroma 8x8,
and the ten 4x4 B_PRED sub-modes (§12.3) — and both the normal and
simple in-loop deblocking filters (§15). Inter frames raise
``UnsupportedMediaError`` (a WebP file is always a single key frame,
so this seam only excludes raw VP8 video payloads).

``encode_vp8`` emits spec-shaped key-frame streams for the fixture and
sink side: whole-MB intra prediction (DC/V/H/TM chosen by SAD, or
forced), the exact inverse-transform-matched forward DCT/WHT from the
reference encoder, in-loop reconstruction (each MB predicts from the
RECONSTRUCTED neighbors, as the decoder will), and default-probability
token coding — so every decoder path above faces a round-trip test.

Conformance seam (same honesty rule as COVERAGE.md records for the
other codecs — no libwebp/libvpx exists in this container to generate
or cross-check reference bytes): the structural constants below
(trees, coefficient bands, zigzag, quantizer lookups, token category
probabilities, mode probabilities) are the published RFC 6386 values;
the two LARGE trained probability tables (``KF_BMODE_PROBS``
10x10x9 and ``COEF_UPDATE_PROBS``/``DEFAULT_COEF_PROBS`` 4x8x3x11)
are documented SELF-CONSISTENT defaults, not byte-for-byte RFC
transcriptions — encoder and decoder share them, so every bit path is
exercised and round-trips exactly, but a libwebp-encoded file that
relies on the exact trained values would desynchronize. Because every
frame's coefficient decode reads those tables, decoding a foreign
stream can only produce plausible-but-wrong pixels — so (r12 honesty
gate, mirroring jpeg.ARITH_TWIN_COM and the MP3 private-bit mark)
``encode_vp8`` / ``encode_vp8_inter_frames`` append ``VP8_TWIN_MARK``
as a payload trailer (decoders never read past the last token, so the
trailer is invisible to decoding), and ``decode_vp8`` /
``VP8Stream.decode`` raise ``UnsupportedMediaError`` on unmarked
streams so media ingest quarantines them instead of poisoning image
features and perceptual dedup. Swap-in seam for a real decoder: drop
the ``_require_twin_mark`` calls and replace the two trained tables
with libwebp's — everything else is the published RFC structure.

Reference parity note: the reference (datapump.py) has no multimodal
surface at all (requirements.txt:1-9); this extends the engine for
training-data pipelines per the build charter.
"""

from __future__ import annotations

import numpy as np

from datapump_spark.operators.codecs import UnsupportedMediaError

# Twin trailer appended to every payload the in-repo encoders emit
# (see the module docstring's conformance seam). 13 opaque bytes after
# the last token partition; VP8 decoders never read them.
VP8_TWIN_MARK = b"dps-vp8-twin1"


def _require_twin_mark(payload: bytes) -> None:
    if not payload.endswith(VP8_TWIN_MARK):
        raise UnsupportedMediaError(
            "foreign VP8 stream refused: the in-repo coefficient/mode "
            "probability tables are documented self-consistent "
            "stand-ins, exact only for streams from the mirrored "
            "encode_vp8/encode_vp8_inter_frames twins (which append "
            "VP8_TWIN_MARK); decoding foreign bytes would produce "
            "plausible-but-wrong pixels (no libwebp/libvpx "
            "in-container to conformance-pin the trained tables)")


# --------------------------------------------------------------------------
# Structural constants (RFC 6386)
# --------------------------------------------------------------------------

# Intra prediction modes
DC_PRED, V_PRED, H_PRED, TM_PRED, B_PRED = 0, 1, 2, 3, 4
(B_DC_PRED, B_TM_PRED, B_VE_PRED, B_HE_PRED, B_LD_PRED, B_RD_PRED,
 B_VR_PRED, B_VL_PRED, B_HD_PRED, B_HU_PRED) = range(10)

# Key-frame luma mode tree (§11.2: B_PRED first on key frames)
KF_YMODE_TREE = (-B_PRED, 2, 4, 6, -DC_PRED, -V_PRED, -H_PRED, -TM_PRED)
KF_YMODE_PROBS = (145, 156, 163, 128)
UV_MODE_TREE = (-DC_PRED, 2, -V_PRED, 4, -H_PRED, -TM_PRED)
KF_UV_MODE_PROBS = (142, 114, 183)
BMODE_TREE = (-B_DC_PRED, 2, -B_TM_PRED, 4, -B_VE_PRED, 6, 8, 12,
              -B_HE_PRED, 10, -B_RD_PRED, -B_VR_PRED, -B_LD_PRED, 14,
              -B_VL_PRED, 16, -B_HD_PRED, -B_HU_PRED)

# Coefficient token alphabet (§13.2)
(DCT_0, DCT_1, DCT_2, DCT_3, DCT_4, DCT_CAT1, DCT_CAT2, DCT_CAT3,
 DCT_CAT4, DCT_CAT5, DCT_CAT6, DCT_EOB) = range(12)
COEF_TREE = (-DCT_EOB, 2, -DCT_0, 4, -DCT_1, 6, 8, 12, -DCT_2, 10,
             -DCT_3, -DCT_4, 14, 16, -DCT_CAT1, -DCT_CAT2, 18, 20,
             -DCT_CAT3, -DCT_CAT4, -DCT_CAT5, -DCT_CAT6)
# Extra-bit probabilities and base values per category (§13.2)
CAT_PROBS = ((159,), (165, 145), (173, 148, 140), (176, 155, 140, 135),
             (180, 157, 141, 134, 130),
             (254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129))
CAT_BASE = (5, 7, 11, 19, 35, 67)

# Coefficient position -> probability band (§13.3)
COEF_BANDS = (0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7)
ZIGZAG = (0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)

# Quantizer lookups (§14.1)
DC_QLOOKUP = (
    4, 5, 6, 7, 8, 9, 10, 10, 11, 12, 13, 14, 15, 16, 17, 17, 18, 19,
    20, 20, 21, 21, 22, 22, 23, 23, 24, 25, 25, 26, 27, 28, 29, 30, 31,
    32, 33, 34, 35, 36, 37, 37, 38, 39, 40, 41, 42, 43, 44, 45, 46, 46,
    47, 48, 49, 50, 51, 52, 53, 54, 55, 56, 57, 58, 59, 60, 61, 62, 63,
    64, 65, 66, 67, 68, 69, 70, 71, 72, 73, 74, 75, 76, 76, 77, 78, 79,
    80, 81, 82, 83, 84, 85, 86, 87, 88, 89, 91, 93, 95, 96, 98, 100,
    101, 102, 104, 106, 108, 110, 112, 114, 116, 118, 122, 124, 126,
    128, 130, 134, 138, 142, 146, 150, 154, 158, 162, 167, 172, 177)
AC_QLOOKUP = (
    4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19, 20, 21,
    22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34, 35, 36, 37, 38,
    39, 40, 41, 42, 43, 44, 45, 46, 47, 48, 49, 50, 51, 52, 53, 54, 55,
    56, 57, 58, 60, 62, 64, 66, 68, 70, 72, 74, 76, 78, 80, 82, 84, 86,
    88, 90, 92, 94, 96, 98, 100, 102, 104, 106, 108, 110, 112, 114,
    116, 119, 122, 125, 128, 131, 134, 137, 140, 143, 146, 149, 152,
    155, 158, 161, 164, 167, 170, 173, 177, 181, 185, 189, 193, 197,
    201, 205, 209, 213, 217, 221, 225, 229, 234, 239, 245, 249, 254,
    259, 264, 269, 274, 279, 284)

# Self-consistent trained-table stand-ins (see module docstring):
# uniform 128s keep every tree/update path live and exactly
# round-trippable between this encoder and decoder.
KF_BMODE_PROBS = tuple(tuple((128,) * 9 for _ in range(10))
                       for _ in range(10))
# All-255 update probs mean "update flag is a near-certain 0" — the
# encoder never updates, so each header carries 1056 cheap zero bits.
COEF_UPDATE_PROBS = tuple(tuple(tuple((255,) * 11 for _ in range(3))
                                for _ in range(8)) for _ in range(4))
DEFAULT_COEF_PROBS = tuple(tuple(tuple((128,) * 11 for _ in range(3))
                                 for _ in range(8)) for _ in range(4))


# --------------------------------------------------------------------------
# Boolean coder (§7)
# --------------------------------------------------------------------------

class _BoolDecoder:
    """RFC 6386 §7.3 boolean decoder: 2-byte big-endian value window,
    range in [128, 255], renormalized a bit at a time."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 2
        self.value = ((data[0] << 8) | data[1]) if len(data) >= 2 else (
            (data[0] << 8) if data else 0)
        self.range = 255
        self.bit_count = 0

    def bool(self, prob: int) -> int:
        split = 1 + (((self.range - 1) * prob) >> 8)
        big = split << 8
        if self.value >= big:
            ret = 1
            self.range -= split
            self.value -= big
        else:
            ret = 0
            self.range = split
        while self.range < 128:
            self.value <<= 1
            self.range <<= 1
            self.bit_count += 1
            if self.bit_count == 8:
                self.bit_count = 0
                if self.pos < len(self.data):
                    self.value |= self.data[self.pos]
                    self.pos += 1
        return ret

    def literal(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bool(128)
        return v

    def signed(self, n: int) -> int:
        v = self.literal(n)
        return -v if self.bool(128) else v

    def tree(self, tree, probs, start: int = 0) -> int:
        i = start
        while True:
            i = tree[i + self.bool(probs[i >> 1])]
            if i <= 0:
                return -i


class _BoolEncoder:
    """RFC 6386 §7.4 boolean encoder (32-bit bottom register with
    carry propagation into already-emitted bytes)."""

    def __init__(self):
        self.out = bytearray()
        self.range = 255
        self.bottom = 0
        self.bit_count = 24

    def _carry(self):
        i = len(self.out) - 1
        while self.out[i] == 255:
            self.out[i] = 0
            i -= 1
        self.out[i] += 1

    def bool(self, bit: int, prob: int) -> None:
        split = 1 + (((self.range - 1) * prob) >> 8)
        if bit:
            self.bottom += split
            self.range -= split
        else:
            self.range = split
        while self.range < 128:
            self.range <<= 1
            if self.bottom & (1 << 31):
                self._carry()
            self.bottom = (self.bottom << 1) & 0xFFFFFFFF
            self.bit_count -= 1
            if not self.bit_count:
                self.out.append((self.bottom >> 24) & 0xFF)
                self.bottom &= 0xFFFFFF
                self.bit_count = 8

    def literal(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bool((v >> i) & 1, 128)

    def signed(self, v: int, n: int) -> None:
        self.literal(abs(v), n)
        self.bool(1 if v < 0 else 0, 128)

    def tree(self, tree, probs, value: int, start: int = 0) -> None:
        # walk the tree, emitting the branch bits that lead to -value
        path = self._path(tree, value, start)
        i = start
        for bit in path:
            self.bool(bit, probs[i >> 1])
            i = tree[i + bit]

    @staticmethod
    def _path(tree, value, start=0):
        # depth-first search for the leaf (trees are tiny)
        def walk(i, acc):
            for bit in (0, 1):
                nxt = tree[i + bit]
                if nxt <= 0:
                    if -nxt == value:
                        return acc + [bit]
                else:
                    r = walk(nxt, acc + [bit])
                    if r is not None:
                        return r
            return None

        r = walk(start, [])
        if r is None:
            raise ValueError(f"value {value} not in tree")
        return r

    def flush(self) -> bytes:
        c = self.bit_count
        v = self.bottom
        if v & (1 << (32 - c)):
            self._carry()
        v = (v << (c & 7)) & 0xFFFFFFFF
        c >>= 3
        while c > 0:
            v = (v << 8) & 0xFFFFFFFF
            c -= 1
        for _ in range(4):
            self.out.append((v >> 24) & 0xFF)
            v = (v << 8) & 0xFFFFFFFF
        return bytes(self.out)


# --------------------------------------------------------------------------
# Inverse transforms (§14.3-14.4) — exact integer arithmetic
# --------------------------------------------------------------------------

_C1 = 20091                    # cos(pi/8)*sqrt(2) - 1, 16-bit fixed point
_C2 = 35468                    # sin(pi/8)*sqrt(2)


def idct4x4(block: np.ndarray) -> np.ndarray:
    """§14.4: 4x4 inverse DCT; int32 in, int32 out (residual).
    Sparse fast paths (all-zero, DC-only — exactly the arithmetic's
    own results) carry most real blocks; the general case runs on
    Python ints (numpy scalar indexing is ~10x slower here)."""
    ip = [int(v) for v in block.reshape(16)]
    if not any(ip):
        return np.zeros((4, 4), np.int32)
    if not any(ip[1:]):
        return np.full((4, 4), (ip[0] + 4) >> 3, np.int32)
    tmp = [0] * 16
    for j in range(4):          # columns
        i0, i1, i2, i3 = ip[j], ip[4 + j], ip[8 + j], ip[12 + j]
        a1 = i0 + i2
        b1 = i0 - i2
        c1 = ((i1 * _C2) >> 16) - (i3 + ((i3 * _C1) >> 16))
        d1 = i1 + ((i1 * _C1) >> 16) + ((i3 * _C2) >> 16)
        tmp[j] = a1 + d1
        tmp[12 + j] = a1 - d1
        tmp[4 + j] = b1 + c1
        tmp[8 + j] = b1 - c1
    out = [0] * 16
    for i in range(0, 16, 4):   # rows
        t0, t1_, t2_, t3 = tmp[i], tmp[i + 1], tmp[i + 2], tmp[i + 3]
        a1 = t0 + t2_
        b1 = t0 - t2_
        c1 = ((t1_ * _C2) >> 16) - (t3 + ((t3 * _C1) >> 16))
        d1 = t1_ + ((t1_ * _C1) >> 16) + ((t3 * _C2) >> 16)
        out[i] = (a1 + d1 + 4) >> 3
        out[i + 3] = (a1 - d1 + 4) >> 3
        out[i + 1] = (b1 + c1 + 4) >> 3
        out[i + 2] = (b1 - c1 + 4) >> 3
    return np.array(out, np.int32).reshape(4, 4)


def iwht4x4(block: np.ndarray) -> np.ndarray:
    """§14.3: inverse Walsh-Hadamard for the Y2 block. Same sparse
    fast paths and Python-int arithmetic as idct4x4."""
    ip = [int(v) for v in block.reshape(16)]
    if not any(ip):
        return np.zeros((4, 4), np.int32)
    if not any(ip[1:]):
        return np.full((4, 4), (ip[0] + 3) >> 3, np.int32)
    tmp = [0] * 16
    for j in range(4):
        i0, i1, i2, i3 = ip[j], ip[4 + j], ip[8 + j], ip[12 + j]
        a1 = i0 + i3
        b1 = i1 + i2
        c1 = i1 - i2
        d1 = i0 - i3
        tmp[j] = a1 + b1
        tmp[4 + j] = c1 + d1
        tmp[8 + j] = a1 - b1
        tmp[12 + j] = d1 - c1
    out = [0] * 16
    for i in range(0, 16, 4):
        t0, t1_, t2_, t3 = tmp[i], tmp[i + 1], tmp[i + 2], tmp[i + 3]
        a1 = t0 + t3
        b1 = t1_ + t2_
        c1 = t1_ - t2_
        d1 = t0 - t3
        out[i] = (a1 + b1 + 3) >> 3
        out[i + 1] = (c1 + d1 + 3) >> 3
        out[i + 2] = (a1 - b1 + 3) >> 3
        out[i + 3] = (d1 - c1 + 3) >> 3
    return np.array(out, np.int32).reshape(4, 4)


# Forward transforms (reference-encoder arithmetic; the DECODER defines
# reconstruction, the encoder only needs coefficients whose inverse
# lands near the source residual)

def fdct4x4(block: np.ndarray) -> np.ndarray:
    ip = [int(v) for v in block.reshape(16)]
    if not any(ip):
        return np.zeros((4, 4), np.int32)
    tmp = [0] * 16
    for i in range(0, 16, 4):   # rows
        i0, i1, i2, i3 = ip[i], ip[i + 1], ip[i + 2], ip[i + 3]
        a1 = (i0 + i3) * 8
        b1 = (i1 + i2) * 8
        c1 = (i1 - i2) * 8
        d1 = (i0 - i3) * 8
        tmp[i] = a1 + b1
        tmp[i + 2] = a1 - b1
        tmp[i + 1] = (c1 * 2217 + d1 * 5352 + 14500) >> 12
        tmp[i + 3] = (d1 * 2217 - c1 * 5352 + 7500) >> 12
    out = [0] * 16
    for j in range(4):          # columns
        t0, t1_, t2_, t3 = tmp[j], tmp[4 + j], tmp[8 + j], tmp[12 + j]
        a1 = t0 + t3
        b1 = t1_ + t2_
        c1 = t1_ - t2_
        d1 = t0 - t3
        out[j] = (a1 + b1 + 7) >> 4
        out[8 + j] = (a1 - b1 + 7) >> 4
        out[4 + j] = ((c1 * 2217 + d1 * 5352 + 12000) >> 16) + (d1 != 0)
        out[12 + j] = (d1 * 2217 - c1 * 5352 + 51000) >> 16
    return np.array(out, np.int32).reshape(4, 4)


def fwht4x4(block: np.ndarray) -> np.ndarray:
    ip = block.astype(np.int64)
    tmp = np.empty((4, 4), np.int64)
    for i in range(4):
        a1 = (ip[i, 0] + ip[i, 2]) * 4
        d1 = (ip[i, 1] + ip[i, 3]) * 4
        c1 = (ip[i, 1] - ip[i, 3]) * 4
        b1 = (ip[i, 0] - ip[i, 2]) * 4
        tmp[i, 0] = a1 + d1 + (a1 != 0)
        tmp[i, 1] = b1 + c1
        tmp[i, 2] = b1 - c1
        tmp[i, 3] = a1 - d1
    out = np.empty((4, 4), np.int64)
    for j in range(4):
        a1 = tmp[0, j] + tmp[2, j]
        d1 = tmp[1, j] + tmp[3, j]
        c1 = tmp[1, j] - tmp[3, j]
        b1 = tmp[0, j] - tmp[2, j]
        a2 = a1 + d1
        b2 = b1 + c1
        c2 = b1 - c1
        d2 = a1 - d1
        a2 += a2 < 0
        b2 += b2 < 0
        c2 += c2 < 0
        d2 += d2 < 0
        out[0, j] = (a2 + 3) >> 3
        out[1, j] = (b2 + 3) >> 3
        out[2, j] = (c2 + 3) >> 3
        out[3, j] = (d2 + 3) >> 3
    return out.astype(np.int32)


# --------------------------------------------------------------------------
# Intra prediction (§12)
# --------------------------------------------------------------------------

def _pred_block(size, mode, above, left, above_left):
    """Whole-block (16x16 luma / 8x8 chroma) prediction. above/left
    may be None at frame edges (§12.2 defaults: above=127, left=129)."""
    if mode == DC_PRED:
        if above is None and left is None:
            dc = 128
        elif above is None:
            dc = (int(left.sum()) + (size >> 1)) >> (size.bit_length() - 1)
        elif left is None:
            dc = (int(above.sum()) + (size >> 1)) >> (size.bit_length() - 1)
        else:
            dc = (int(above.sum()) + int(left.sum()) + size) \
                >> size.bit_length()
        return np.full((size, size), dc, np.int32)
    if mode == V_PRED:
        a = above if above is not None else np.full(size, 127, np.int32)
        return np.tile(a.astype(np.int32), (size, 1))
    if mode == H_PRED:
        lt = left if left is not None else np.full(size, 129, np.int32)
        return np.tile(lt.astype(np.int32)[:, None], (1, size))
    # TM_PRED
    a = (above if above is not None else np.full(size, 127)).astype(np.int32)
    lt = (left if left is not None else np.full(size, 129)).astype(np.int32)
    al = int(above_left) if above_left is not None else 127
    return np.clip(lt[:, None] + a[None, :] - al, 0, 255)


def _avg3(a, b, c):
    return (a + 2 * b + c + 2) >> 2


def _avg2(a, b):
    return (a + b + 1) >> 1


def _pred_b(mode: int, a: np.ndarray, l: np.ndarray, al: int,
            ar: np.ndarray) -> np.ndarray:
    """4x4 sub-block prediction (§12.3). a: above[4], l: left[4],
    al: above-left, ar: above-right[4] — all int32, callers supply
    edge defaults."""
    b = np.empty((4, 4), np.int32)
    e = np.concatenate(([al], a, ar)).astype(np.int64)   # a[-1..7]
    ll = l.astype(np.int64)
    if mode == B_DC_PRED:
        b[:] = (int(a.sum()) + int(l.sum()) + 4) >> 3
    elif mode == B_TM_PRED:
        b[:] = np.clip(ll[:, None] + a[None, :].astype(np.int64) - al,
                       0, 255)
    elif mode == B_VE_PRED:
        row = _avg3(e[0:4], e[1:5], e[2:6])
        b[:] = row[None, :]
    elif mode == B_HE_PRED:
        col = np.array([_avg3(al, ll[0], ll[1]),
                        _avg3(ll[0], ll[1], ll[2]),
                        _avg3(ll[1], ll[2], ll[3]),
                        _avg3(ll[2], ll[3], ll[3])], np.int64)
        b[:] = col[:, None]
    elif mode == B_LD_PRED:
        p = e[1:]                                   # a[0..7]
        for r in range(4):
            for c in range(4):
                i = r + c
                b[r, c] = _avg3(p[i], p[i + 1], p[min(i + 2, 7)])
    elif mode == B_RD_PRED:
        # edge runs l[3..0], al, a[0..3]
        g = np.concatenate((ll[::-1], [al], e[1:5]))
        for r in range(4):
            for c in range(4):
                i = 3 - r + c + 1
                b[r, c] = _avg3(g[i - 1], g[i], g[i + 1])
    elif mode == B_VR_PRED:
        # direct transcription of the §12.3 reference assignments over
        # E = [L3,L2,L1,L0, X, A0,A1,A2,A3] (a closed-form indexing is
        # error-prone here — round-9 review found an off-by-one)
        g = np.concatenate((ll[::-1], [al], e[1:5]))
        b[3, 0] = _avg3(g[1], g[2], g[3])
        b[2, 0] = _avg3(g[2], g[3], g[4])
        b[3, 1] = b[1, 0] = _avg3(g[3], g[4], g[5])
        b[2, 1] = b[0, 0] = _avg2(g[4], g[5])
        b[3, 2] = b[1, 1] = _avg3(g[4], g[5], g[6])
        b[2, 2] = b[0, 1] = _avg2(g[5], g[6])
        b[3, 3] = b[1, 2] = _avg3(g[5], g[6], g[7])
        b[2, 3] = b[0, 2] = _avg2(g[6], g[7])
        b[1, 3] = _avg3(g[6], g[7], g[8])
        b[0, 3] = _avg2(g[7], g[8])
    elif mode == B_VL_PRED:
        p = e[1:]                                   # a[0..7]
        for r in range(4):
            for c in range(4):
                i = c + (r >> 1)
                if (r & 1) == 0:
                    b[r, c] = _avg2(p[i], p[i + 1])
                else:
                    b[r, c] = _avg3(p[i], p[i + 1], p[i + 2])
        b[2, 3] = _avg3(p[4], p[5], p[6])
        b[3, 3] = _avg3(p[5], p[6], p[7])
    elif mode == B_HD_PRED:
        # direct §12.3 transcription (same rationale as B_VR)
        g = np.concatenate((ll[::-1], [al], e[1:5]))
        b[3, 0] = _avg2(g[0], g[1])
        b[3, 1] = _avg3(g[0], g[1], g[2])
        b[2, 0] = b[3, 2] = _avg2(g[1], g[2])
        b[2, 1] = b[3, 3] = _avg3(g[1], g[2], g[3])
        b[1, 0] = b[2, 2] = _avg2(g[2], g[3])
        b[1, 1] = b[2, 3] = _avg3(g[2], g[3], g[4])
        b[0, 0] = b[1, 2] = _avg2(g[3], g[4])
        b[0, 1] = b[1, 3] = _avg3(g[3], g[4], g[5])
        b[0, 2] = _avg3(g[4], g[5], g[6])
        b[0, 3] = _avg3(g[5], g[6], g[7])
    elif mode == B_HU_PRED:
        for r in range(4):
            for c in range(4):
                i = r + (c >> 1)
                if i > 3:
                    b[r, c] = ll[3]
                elif i == 3 and (c & 1):
                    b[r, c] = _avg3(ll[3], ll[3], ll[3])
                elif c & 1:
                    b[r, c] = _avg3(ll[i], ll[i + 1],
                                    ll[min(i + 2, 3)])
                else:
                    b[r, c] = _avg2(ll[i], ll[min(i + 1, 3)])
    else:
        raise ValueError(f"bad b mode {mode}")
    return b


# --------------------------------------------------------------------------
# Loop filter (§15)
# --------------------------------------------------------------------------

def _s2u(v):
    return np.clip(v, -128, 127)


def _filter_common(mask, hev, p1, p0, q0, q1):
    a = np.where(hev, _s2u(p1 - q1), 0)
    f = np.where(mask, _s2u(a + 3 * (q0 - p0)), 0)
    f1 = _s2u(f + 4) >> 3
    f2 = _s2u(f + 3) >> 3
    q0n = _s2u(q0 - f1)
    p0n = _s2u(p0 + f2)
    # when not high-edge-variance, also nudge p1/q1
    f3 = np.where(~hev & mask, (f1 + 1) >> 1, 0)
    q1n = _s2u(q1 - f3)
    p1n = _s2u(p1 + f3)
    return p1n, p0n, q0n, q1n


def _filter_mb(mask, hev, p2, p1, p0, q0, q1, q2):
    # §15.3 macroblock edge filter (the 6-tap strong filter)
    w = np.where(mask & ~hev, _s2u(_s2u(p1 - q1) + 3 * (q0 - p0)), 0)
    a = (27 * w + 63) >> 7
    p0n = _s2u(p0 + a)
    q0n = _s2u(q0 - a)
    a = (18 * w + 63) >> 7
    p1n = _s2u(p1 + a)
    q1n = _s2u(q1 - a)
    a = (9 * w + 63) >> 7
    p2n = _s2u(p2 + a)
    q2n = _s2u(q2 - a)
    # high-variance edges take the common filter instead
    hm = mask & hev
    ph1, ph0, qh0, qh1 = _filter_common(hm, hev, p1, p0, q0, q1)
    p1n = np.where(hm, ph1, p1n)
    p0n = np.where(hm, ph0, p0n)
    q0n = np.where(hm, qh0, q0n)
    q1n = np.where(hm, qh1, q1n)
    return p2n, p1n, p0n, q0n, q1n, q2n


def _normal_mask(ilimit, elimit, p3, p2, p1, p0, q0, q1, q2, q3):
    m = (np.abs(p0 - q0) * 2 + (np.abs(p1 - q1) >> 1)) <= elimit
    for x, y in ((p3, p2), (p2, p1), (p1, p0), (q1, q0), (q2, q1),
                 (q3, q2)):
        m &= np.abs(x - y) <= ilimit
    return m


def _hev_mask(thresh, p1, p0, q0, q1):
    return (np.abs(p1 - p0) > thresh) | (np.abs(q1 - q0) > thresh)


def _filter_limits(level: int, sharpness: int):
    interior = level
    if sharpness:
        interior >>= 2 if sharpness > 4 else 1
        interior = min(interior, 9 - sharpness)
    interior = max(interior, 1)
    mb_elimit = ((level + 2) * 2) + interior
    sub_elimit = (level * 2) + interior
    if level >= 40:
        hev_t = 2
    elif level >= 15:
        hev_t = 1
    else:
        hev_t = 0
    return interior, mb_elimit, sub_elimit, hev_t


def _loop_filter_plane(plane: np.ndarray, mb_size: int, level: int,
                       sharpness: int, simple: bool,
                       filter_inner: np.ndarray) -> np.ndarray:
    """In-loop deblock of one plane (uint8 2D), per-MB in raster order
    per §15.1 — left MB edge, internal vertical edges, top MB edge,
    internal horizontal edges — so each MB sees its already-filtered
    neighbors exactly as the reference decoder does. ``filter_inner``
    is the (mb_rows, mb_cols) bool map: internal edges are skipped for
    coefficient-less non-B_PRED MBs (§15.2). Frame-wide single level
    (no segmentation / delta adjustments in the streams we emit)."""
    if level == 0:
        return plane
    interior, mb_elimit, sub_elimit, hev_t = _filter_limits(
        level, sharpness)
    p = plane.astype(np.int32) - 128          # signed-value domain
    h, w = p.shape

    def vert_edge(x, y0, y1, elimit, mb):
        sl = slice(y0, y1)
        p1, p0, q0, q1 = (p[sl, x - 2], p[sl, x - 1], p[sl, x],
                          p[sl, x + 1])
        if simple:
            m = (np.abs(p0 - q0) * 2 + (np.abs(p1 - q1) >> 1)) <= elimit
            f = np.where(m, _s2u(_s2u(p1 - q1) + 3 * (q0 - p0)), 0)
            p[sl, x - 1] = _s2u(p0 + (_s2u(f + 3) >> 3))
            p[sl, x] = _s2u(q0 - (_s2u(f + 4) >> 3))
            return
        p3, p2, q2, q3 = (p[sl, x - 4], p[sl, x - 3], p[sl, x + 2],
                          p[sl, x + 3])
        m = _normal_mask(interior, elimit, p3, p2, p1, p0, q0, q1,
                         q2, q3)
        hev = _hev_mask(hev_t, p1, p0, q0, q1)
        if mb:
            r = _filter_mb(m, hev, p2, p1, p0, q0, q1, q2)
            for i, col in zip(range(-3, 3), r):
                p[sl, x + i] = col
        else:
            r = _filter_common(m, hev, p1, p0, q0, q1)
            for i, col in zip(range(-2, 2), r):
                p[sl, x + i] = col

    def horiz_edge(y, x0, x1, elimit, mb):
        sl = slice(x0, x1)
        p1, p0, q0, q1 = (p[y - 2, sl], p[y - 1, sl], p[y, sl],
                          p[y + 1, sl])
        if simple:
            m = (np.abs(p0 - q0) * 2 + (np.abs(p1 - q1) >> 1)) <= elimit
            f = np.where(m, _s2u(_s2u(p1 - q1) + 3 * (q0 - p0)), 0)
            p[y - 1, sl] = _s2u(p0 + (_s2u(f + 3) >> 3))
            p[y, sl] = _s2u(q0 - (_s2u(f + 4) >> 3))
            return
        p3, p2, q2, q3 = (p[y - 4, sl], p[y - 3, sl], p[y + 2, sl],
                          p[y + 3, sl])
        m = _normal_mask(interior, elimit, p3, p2, p1, p0, q0, q1,
                         q2, q3)
        hev = _hev_mask(hev_t, p1, p0, q0, q1)
        if mb:
            r = _filter_mb(m, hev, p2, p1, p0, q0, q1, q2)
            for i, row in zip(range(-3, 3), r):
                p[y + i, sl] = row
        else:
            r = _filter_common(m, hev, p1, p0, q0, q1)
            for i, row in zip(range(-2, 2), r):
                p[y + i, sl] = row

    mb_rows = -(-h // mb_size)
    mb_cols = -(-w // mb_size)
    for mr in range(mb_rows):
        for mc in range(mb_cols):
            x0, y0 = mc * mb_size, mr * mb_size
            x1, y1 = min(x0 + mb_size, w), min(y0 + mb_size, h)
            inner = bool(filter_inner[mr, mc])
            if mc:
                vert_edge(x0, y0, y1, mb_elimit, True)
            if inner:
                for sx in range(4, mb_size, 4):
                    if x0 + sx + 2 <= w:
                        vert_edge(x0 + sx, y0, y1, sub_elimit, False)
            if mr:
                horiz_edge(y0, x0, x1, mb_elimit, True)
            if inner:
                for sy in range(4, mb_size, 4):
                    if y0 + sy + 2 <= h:
                        horiz_edge(y0 + sy, x0, x1, sub_elimit, False)
    return np.clip(p + 128, 0, 255).astype(np.uint8)

# --------------------------------------------------------------------------
# Frame decode (§9, §11, §13)
# --------------------------------------------------------------------------

def _dequant_factors(qi: int, deltas: dict) -> dict:
    def cl(v, lo=0, hi=127):
        return max(lo, min(hi, v))

    return {
        "ydc": DC_QLOOKUP[cl(qi + deltas.get("ydc", 0))],
        "yac": AC_QLOOKUP[cl(qi)],
        "y2dc": DC_QLOOKUP[cl(qi + deltas.get("y2dc", 0))] * 2,
        "y2ac": max(8, AC_QLOOKUP[cl(qi + deltas.get("y2ac", 0))]
                    * 155 // 100),
        "uvdc": min(132, DC_QLOOKUP[cl(qi + deltas.get("uvdc", 0))]),
        "uvac": AC_QLOOKUP[cl(qi + deltas.get("uvac", 0))],
    }


def _decode_tokens(bd: _BoolDecoder, plane: int, ctx: int,
                   probs4) -> np.ndarray:
    """Decode one 4x4 block's coefficient tokens (§13.2-13.3).
    Returns length-16 int32 in raster order (de-zigzagged). plane:
    0 = Y after Y2, 1 = Y2, 2 = UV, 3 = Y without Y2."""
    out = np.zeros(16, np.int32)
    i = 1 if plane == 0 else 0
    start = 0                    # tree start (2 skips the EOB branch)
    while i < 16:
        p = probs4[COEF_BANDS[i]][ctx]
        tok = bd.tree(COEF_TREE, p, start)
        if tok == DCT_EOB:
            break
        if tok == DCT_0:
            ctx = 0
            start = 2            # EOB cannot follow a zero token
            i += 1
            continue
        if tok <= DCT_4:
            val = tok            # DCT_1..4 are literal magnitudes
        else:
            cat = tok - DCT_CAT1
            extra = 0
            for cp in CAT_PROBS[cat]:
                extra = (extra << 1) | bd.bool(cp)
            val = CAT_BASE[cat] + extra
        if bd.bool(128):
            val = -val
        out[ZIGZAG[i]] = val
        ctx = 1 if abs(val) == 1 else 2
        start = 0
        i += 1
    return out


def _encode_tokens(be: _BoolEncoder, coeffs: np.ndarray, plane: int,
                   ctx: int, probs4) -> int:
    """Encoder twin of _decode_tokens. coeffs: length-16 raster
    int32. Returns 1 if any coefficient was nonzero (the context
    update for the neighbor maps)."""
    first = 1 if plane == 0 else 0
    zz = [int(coeffs[ZIGZAG[i]]) for i in range(16)]
    last = -1
    for i in range(first, 16):
        if zz[i]:
            last = i
    start = 0
    i = first
    while i <= last:
        p = probs4[COEF_BANDS[i]][ctx]
        v = zz[i]
        a = abs(v)
        if a == 0:
            be.tree(COEF_TREE, p, DCT_0, start)
            ctx = 0
            start = 2
            i += 1
            continue
        if a <= 4:
            be.tree(COEF_TREE, p, a, start)      # DCT_1..4 tokens
        else:
            cat = 0
            while cat < 5 and a >= CAT_BASE[cat + 1]:
                cat += 1
            be.tree(COEF_TREE, p, DCT_CAT1 + cat, start)
            extra = a - CAT_BASE[cat]
            for bit_i, cp in enumerate(CAT_PROBS[cat]):
                be.bool((extra >> (len(CAT_PROBS[cat]) - 1 - bit_i)) & 1,
                        cp)
        be.bool(1 if v < 0 else 0, 128)
        ctx = 1 if a == 1 else 2
        start = 0
        i += 1
    # EOB after the final nonzero (or as the sole token of an empty
    # block). i == last+1 here, and start is always 0 because the last
    # encoded token was nonzero (an all-zero block never enters the
    # loop) — EOB is never emitted in the zero-follow state, matching
    # the decoder's grammar.
    if i < 16:
        be.tree(COEF_TREE, probs4[COEF_BANDS[i]][ctx], DCT_EOB, start)
    return int(last >= first)


def decode_vp8(payload: bytes, _planes: bool = False):
    """Decode a VP8 key frame (the payload of a WebP "VP8 " chunk) to
    (h, w, 3) RGB uint8. RFC 6386 structure; see the module docstring
    for the trained-table conformance seam. ``_planes`` (r11, for
    operators/vp8inter's reference-frame state) returns the
    loop-filtered padded YUV planes + (h, w) instead of RGB. Inter
    frames raise here — feed them to vp8inter.VP8Stream, which holds
    the reference buffers they predict from."""
    if len(payload) < 10:
        raise ValueError("truncated VP8 payload")
    tag = payload[0] | (payload[1] << 8) | (payload[2] << 16)
    if tag & 1:
        raise UnsupportedMediaError(
            "VP8 inter frame (not a key frame; vp8inter.VP8Stream "
            "decodes inter-coded sequences)")
    first_size = tag >> 5
    if payload[3:6] != b"\x9d\x01\x2a":
        raise ValueError("bad VP8 key-frame start code")
    _require_twin_mark(payload)           # r12 honesty gate
    w = (payload[6] | (payload[7] << 8)) & 0x3FFF
    h = (payload[8] | (payload[9] << 8)) & 0x3FFF
    if not w or not h:
        raise ValueError("zero VP8 dimensions")
    part0 = payload[10:10 + first_size]
    if len(part0) < first_size:
        raise ValueError("truncated VP8 first partition")
    bd = _BoolDecoder(part0)

    bd.literal(1)                              # color space
    bd.literal(1)                              # clamping type
    seg_enabled = bd.bool(128)
    seg_update_map = 0
    seg_tree_probs = [255, 255, 255]
    if seg_enabled:
        seg_update_map = bd.bool(128)
        update_data = bd.bool(128)
        if update_data:
            bd.bool(128)                       # abs vs delta
            for _ in range(4):                 # quantizer deltas
                if bd.bool(128) and bd.signed(7):
                    # per-segment quantizers would silently change
                    # reconstruction; refuse rather than decode wrong
                    raise UnsupportedMediaError(
                        "VP8 per-segment quantizer deltas unsupported")
            for _ in range(4):                 # loop filter deltas
                if bd.bool(128):
                    bd.signed(6)               # filter-only: tolerated
        if seg_update_map:
            for k in range(3):
                if bd.bool(128):
                    seg_tree_probs[k] = bd.literal(8)
    simple_filter = bd.bool(128)
    filter_level = bd.literal(6)
    sharpness = bd.literal(3)
    if bd.bool(128):                           # lf delta enabled
        if bd.bool(128):                       # lf delta update
            for _ in range(8):
                if bd.bool(128):
                    bd.signed(6)               # filter-only: tolerated
    n_parts = 1 << bd.literal(2)
    y_ac_qi = bd.literal(7)
    deltas = {}
    for key in ("ydc", "y2dc", "y2ac", "uvdc", "uvac"):
        if bd.bool(128):
            deltas[key] = bd.signed(4)
    dq = _dequant_factors(y_ac_qi, deltas)
    bd.bool(128)                               # refresh entropy probs
    coef_probs = [[[list(DEFAULT_COEF_PROBS[i][j][k]) for k in range(3)]
                   for j in range(8)] for i in range(4)]
    for i in range(4):
        for j in range(8):
            for k in range(3):
                for t in range(11):
                    if bd.bool(COEF_UPDATE_PROBS[i][j][k][t]):
                        coef_probs[i][j][k][t] = bd.literal(8)
    mb_no_skip = bd.bool(128)
    prob_skip_false = bd.literal(8) if mb_no_skip else 0

    mb_cols = -(-w // 16)
    mb_rows = -(-h // 16)
    wp, hp = mb_cols * 16, mb_rows * 16

    # per-MB mode decode (rest of first partition)
    ymodes = np.empty((mb_rows, mb_cols), np.int32)
    uvmodes = np.empty((mb_rows, mb_cols), np.int32)
    skips = np.zeros((mb_rows, mb_cols), np.int32)
    bmodes = {}
    # sub-block mode context rows (B_DC_PRED outside frame)
    above_bm = np.zeros((mb_cols, 4), np.int32)
    for mr in range(mb_rows):
        left_bm = np.zeros(4, np.int32)
        for mc in range(mb_cols):
            if seg_update_map:
                # segment id tree (2 levels)
                if bd.bool(seg_tree_probs[0]):
                    bd.bool(seg_tree_probs[2])
                else:
                    bd.bool(seg_tree_probs[1])
            if mb_no_skip:
                skips[mr, mc] = bd.bool(prob_skip_false)
            ym = bd.tree(KF_YMODE_TREE, KF_YMODE_PROBS)
            ymodes[mr, mc] = ym
            if ym == B_PRED:
                sub = np.empty((4, 4), np.int32)
                for r in range(4):
                    for c in range(4):
                        am = above_bm[mc][c] if r == 0 else sub[r - 1, c]
                        lm = left_bm[r] if c == 0 else sub[r, c - 1]
                        sub[r, c] = bd.tree(
                            BMODE_TREE, KF_BMODE_PROBS[am][lm])
                bmodes[(mr, mc)] = sub
                above_bm[mc] = sub[3]
                left_bm = sub[:, 3].copy()
            else:
                # whole-MB modes imply fixed sub-modes for context
                fixed = {DC_PRED: B_DC_PRED, V_PRED: B_VE_PRED,
                         H_PRED: B_HE_PRED, TM_PRED: B_TM_PRED}[ym]
                above_bm[mc] = fixed
                left_bm[:] = fixed
            uvmodes[mr, mc] = bd.tree(UV_MODE_TREE, KF_UV_MODE_PROBS)

    # token partitions (§9.5): sizes as 3-byte LE trailers after part0
    rest = payload[10 + first_size:]
    parts = []
    if n_parts > 1:
        table = rest[:3 * (n_parts - 1)]
        data = rest[3 * (n_parts - 1):]
        off = 0
        for pi in range(n_parts - 1):
            sz = (table[3 * pi] | (table[3 * pi + 1] << 8)
                  | (table[3 * pi + 2] << 16))
            parts.append(_BoolDecoder(data[off:off + sz]))
            off += sz
        parts.append(_BoolDecoder(data[off:]))
    else:
        parts.append(_BoolDecoder(rest))

    yp = np.zeros((hp, wp), np.int32)
    up = np.zeros((hp // 2, wp // 2), np.int32)
    vp = np.zeros((hp // 2, wp // 2), np.int32)
    # nonzero contexts: above per MB col (4 Y, 2 U, 2 V, 1 Y2)
    above_nz = np.zeros((mb_cols, 9), np.int32)
    filter_inner = np.ones((mb_rows, mb_cols), bool)

    for mr in range(mb_rows):
        bt = parts[mr % n_parts]
        left_nz = np.zeros(9, np.int32)
        for mc in range(mb_cols):
            ym = ymodes[mr, mc]
            has_y2 = ym != B_PRED
            skip = bool(skips[mr, mc])
            blocks_y = np.zeros((16, 16), np.int32)   # 16 blocks x 16
            blocks_u = np.zeros((4, 16), np.int32)
            blocks_v = np.zeros((4, 16), np.int32)
            any_nz = False
            if not skip:
                if has_y2:
                    ctx = above_nz[mc, 8] + left_nz[8]
                    y2 = _decode_tokens(bt, 1, ctx, coef_probs[1])
                    nz = int(np.any(y2))
                    above_nz[mc, 8] = left_nz[8] = nz
                    any_nz = any_nz or bool(nz)
                    y2 *= np.where(np.arange(16) == 0,
                                   dq["y2dc"], dq["y2ac"]).astype(np.int32)
                    wht = iwht4x4(y2.reshape(4, 4)).reshape(16)
                else:
                    wht = None
                plane = 0 if has_y2 else 3
                for b in range(16):
                    r, c = b // 4, b % 4
                    ctx = above_nz[mc, c] + left_nz[r]
                    coeffs = _decode_tokens(bt, plane, ctx,
                                            coef_probs[plane])
                    if has_y2:
                        nz = int(np.any(coeffs[1:]))
                    else:
                        nz = int(np.any(coeffs))
                    above_nz[mc, c] = left_nz[r] = nz
                    any_nz = any_nz or bool(nz)
                    coeffs = coeffs * np.where(
                        np.arange(16) == 0, dq["ydc"],
                        dq["yac"]).astype(np.int32)
                    if has_y2:
                        coeffs[0] = wht[b]
                    blocks_y[b] = coeffs
                for pi, blocks in ((0, blocks_u), (1, blocks_v)):
                    for b in range(4):
                        r, c = b // 2, b % 2
                        sl = 4 + 2 * pi
                        ctx = above_nz[mc, sl + c] + left_nz[sl + r]
                        coeffs = _decode_tokens(bt, 2, ctx,
                                                coef_probs[2])
                        nz = int(np.any(coeffs))
                        above_nz[mc, sl + c] = left_nz[sl + r] = nz
                        any_nz = any_nz or bool(nz)
                        blocks[b] = coeffs * np.where(
                            np.arange(16) == 0, dq["uvdc"],
                            dq["uvac"]).astype(np.int32)
            else:
                # skipped MB: zero coefficients, contexts cleared
                # (Y2 context cleared only when the MB has Y2)
                above_nz[mc, :8] = 0
                left_nz[:8] = 0
                if has_y2:
                    above_nz[mc, 8] = left_nz[8] = 0
            filter_inner[mr, mc] = (not skip and any_nz) or ym == B_PRED

            # --- reconstruction ---
            x0, y0 = mc * 16, mr * 16
            if ym == B_PRED:
                sub = bmodes[(mr, mc)]
                for b in range(16):
                    r, c = b // 4, b % 4
                    yy, xx = y0 + 4 * r, x0 + 4 * c
                    a = (yp[yy - 1, xx:xx + 4] if yy else
                         np.full(4, 127, np.int32))
                    if c < 3:
                        ar = (yp[yy - 1, xx + 4:xx + 8] if yy else
                              np.full(4, 127, np.int32))
                    else:
                        src_x = x0 + 16
                        if y0 and src_x + 4 <= wp:
                            ar = yp[y0 - 1, src_x:src_x + 4]
                        else:
                            ar = np.full(4, 127, np.int32)
                    lt = (yp[yy:yy + 4, xx - 1] if xx else
                          np.full(4, 129, np.int32))
                    al = (int(yp[yy - 1, xx - 1]) if (yy and xx)
                          else (127 if yy else (129 if xx else 127)))
                    pred = _pred_b(int(sub[r, c]), a.astype(np.int32),
                                   lt.astype(np.int32), al,
                                   ar.astype(np.int32))
                    res = idct4x4(blocks_y[b].reshape(4, 4))
                    yp[yy:yy + 4, xx:xx + 4] = np.clip(
                        pred + res, 0, 255)
            else:
                a = yp[y0 - 1, x0:x0 + 16] if y0 else None
                lt = yp[y0:y0 + 16, x0 - 1] if x0 else None
                al = yp[y0 - 1, x0 - 1] if (y0 and x0) else (
                    127 if y0 else (129 if x0 else None))
                pred = _pred_block(16, ym, a, lt, al)
                for b in range(16):
                    r, c = b // 4, b % 4
                    res = idct4x4(blocks_y[b].reshape(4, 4))
                    yy, xx = y0 + 4 * r, x0 + 4 * c
                    yp[yy:yy + 4, xx:xx + 4] = np.clip(
                        pred[4 * r:4 * r + 4, 4 * c:4 * c + 4] + res,
                        0, 255)
            # chroma
            cx0, cy0 = mc * 8, mr * 8
            uvm = uvmodes[mr, mc]
            for plane_arr, blocks in ((up, blocks_u), (vp, blocks_v)):
                a = plane_arr[cy0 - 1, cx0:cx0 + 8] if cy0 else None
                lt = plane_arr[cy0:cy0 + 8, cx0 - 1] if cx0 else None
                al = plane_arr[cy0 - 1, cx0 - 1] if (cy0 and cx0) else (
                    127 if cy0 else (129 if cx0 else None))
                pred = _pred_block(8, int(uvm), a, lt, al)
                for b in range(4):
                    r, c = b // 2, b % 2
                    res = idct4x4(blocks[b].reshape(4, 4))
                    yy, xx = cy0 + 4 * r, cx0 + 4 * c
                    plane_arr[yy:yy + 4, xx:xx + 4] = np.clip(
                        pred[4 * r:4 * r + 4, 4 * c:4 * c + 4] + res,
                        0, 255)

    yout = yp.astype(np.uint8)
    uout = up.astype(np.uint8)
    vout = vp.astype(np.uint8)
    if filter_level:
        yout = _loop_filter_plane(yout, 16, filter_level, sharpness,
                                  bool(simple_filter), filter_inner)
        if not simple_filter:
            uout = _loop_filter_plane(uout, 8, filter_level, sharpness,
                                      False, filter_inner)
            vout = _loop_filter_plane(vout, 8, filter_level, sharpness,
                                      False, filter_inner)
    if _planes:
        return yout, uout, vout, (h, w)
    return _yuv420_to_rgb(yout, uout, vout)[:h, :w]


def _yuv420_to_rgb(y, u, v):
    yf = y.astype(np.float64)
    uf = np.repeat(np.repeat(u, 2, axis=0), 2, axis=1).astype(np.float64)
    vf = np.repeat(np.repeat(v, 2, axis=0), 2, axis=1).astype(np.float64)
    uf = uf[:yf.shape[0], :yf.shape[1]] - 128.0
    vf = vf[:yf.shape[0], :yf.shape[1]] - 128.0
    r = yf + 1.402 * vf
    g = yf - 0.344136 * uf - 0.714136 * vf
    b = yf + 1.772 * uf
    return np.clip(np.stack([r, g, b], axis=2).round(), 0,
                   255).astype(np.uint8)


def _rgb_to_yuv420(img: np.ndarray):
    r = img[:, :, 0].astype(np.float64)
    g = img[:, :, 1].astype(np.float64)
    b = img[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    u = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    v = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    u = (u.reshape(u.shape[0] // 2, 2, -1, 2).mean(axis=(1, 3)))
    v = (v.reshape(v.shape[0] // 2, 2, -1, 2).mean(axis=(1, 3)))
    return (np.clip(y.round(), 0, 255).astype(np.uint8),
            np.clip(u.round(), 0, 255).astype(np.uint8),
            np.clip(v.round(), 0, 255).astype(np.uint8))

# --------------------------------------------------------------------------
# Frame encode (fixture/sink side)
# --------------------------------------------------------------------------

def _quantize(coef: np.ndarray, dc_q: int, ac_q: int) -> np.ndarray:
    q = np.full(16, ac_q, np.int32)
    q[0] = dc_q
    flat = coef.reshape(16)
    lev = np.sign(flat) * ((np.abs(flat) + (q >> 1)) // q)
    return np.clip(lev, -2047, 2047).astype(np.int32)


def _dequant(levels: np.ndarray, dc_q: int, ac_q: int) -> np.ndarray:
    q = np.full(16, ac_q, np.int32)
    q[0] = dc_q
    return (levels * q).astype(np.int32)


_FIXED_BMODE = {DC_PRED: B_DC_PRED, V_PRED: B_VE_PRED,
                H_PRED: B_HE_PRED, TM_PRED: B_TM_PRED}


def encode_vp8(img: np.ndarray, qi: int = 4, *, filter_level: int = 0,
               sharpness: int = 0, simple_filter: bool = False,
               force_mode: int | None = None, use_bpred: bool = False,
               n_parts: int = 1, use_skip: bool = False,
               coef_prob_updates: dict | None = None,
               segmentation: dict | None = None) -> bytes:
    """Encode (h, w, 3) RGB uint8 as a VP8 key-frame payload (the
    bytes of a WebP "VP8 " chunk). Whole-MB intra modes by SAD (or
    ``force_mode``); ``use_bpred`` codes every MB as B_PRED with
    per-sub-block best-of-10 modes (exercises the 4x4 decode path);
    ``use_skip`` enables the mb_no_coeff_skip flag. The in-loop
    reconstruction mirrors decode_vp8 exactly, so prediction drift is
    zero and near-lossless settings (qi=0) round-trip solid blocks
    bit-exactly.

    Fixture-only knobs (r10 foreign-fixture round 4 — bytes the
    default encoder never emits, so the decoder's update paths face
    genuinely foreign streams): ``coef_prob_updates`` maps
    (i, j, k, t) -> new probability; the header carries the RFC 6386
    §13.4 update bits and the token partitions are coded with the
    UPDATED tables.  ``segmentation`` = {"tree_probs": [p0, p1, p2],
    "lf_deltas": bool} enables the segment feature block (zero-valued
    quantizer deltas — present-but-zero — plus optional loop-filter
    deltas) and codes a checkerboard segment-id map through the
    2-level id tree."""
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("encode_vp8 wants (h, w, 3) RGB")
    h, w = img.shape[:2]
    if h > 0x3FFF or w > 0x3FFF:
        raise ValueError("VP8 dimensions exceed 14 bits")
    mb_cols, mb_rows = -(-w // 16), -(-h // 16)
    wp, hp = mb_cols * 16, mb_rows * 16
    pad = np.pad(img, ((0, hp - h), (0, wp - w), (0, 0)), mode="edge")
    ysrc, usrc, vsrc = _rgb_to_yuv420(pad)
    ysrc = ysrc.astype(np.int32)
    usrc = usrc.astype(np.int32)
    vsrc = vsrc.astype(np.int32)
    dq = _dequant_factors(qi, {})

    yp = np.zeros((hp, wp), np.int32)          # in-loop recon
    up = np.zeros((hp // 2, wp // 2), np.int32)
    vp = np.zeros((hp // 2, wp // 2), np.int32)

    mbs = []                                   # per-MB coding decisions
    above_bm = np.zeros((mb_cols, 4), np.int32)

    def best_whole(pred_args, src):
        cands = (DC_PRED, V_PRED, H_PRED, TM_PRED)
        if force_mode is not None:
            cands = (force_mode,)
        best, bm, bp = None, None, None
        for m in cands:
            p = _pred_block(pred_args[0], m, *pred_args[1:])
            sad = int(np.abs(src - p).sum())
            if best is None or sad < best:
                best, bm, bp = sad, m, p
        return bm, bp

    for mr in range(mb_rows):
        left_bm = np.zeros(4, np.int32)
        for mc in range(mb_cols):
            x0, y0 = mc * 16, mr * 16
            srcy = ysrc[y0:y0 + 16, x0:x0 + 16]
            rec = {}
            if use_bpred:
                ym = B_PRED
                sub = np.empty((4, 4), np.int32)
                yblocks = np.zeros((16, 16), np.int32)
                for b in range(16):
                    r, c = b // 4, b % 4
                    yy, xx = y0 + 4 * r, x0 + 4 * c
                    a = (yp[yy - 1, xx:xx + 4] if yy else
                         np.full(4, 127, np.int32))
                    if c < 3:
                        ar = (yp[yy - 1, xx + 4:xx + 8] if yy else
                              np.full(4, 127, np.int32))
                    else:
                        src_x = x0 + 16
                        if y0 and src_x + 4 <= wp:
                            ar = yp[y0 - 1, src_x:src_x + 4]
                        else:
                            ar = np.full(4, 127, np.int32)
                    lt = (yp[yy:yy + 4, xx - 1] if xx else
                          np.full(4, 129, np.int32))
                    al = (int(yp[yy - 1, xx - 1]) if (yy and xx)
                          else (127 if yy else (129 if xx else 127)))
                    sblk = srcy[4 * r:4 * r + 4, 4 * c:4 * c + 4]
                    bbest = bbm = bbp = None
                    for m in range(10):
                        p = _pred_b(m, a.astype(np.int32),
                                    lt.astype(np.int32), al,
                                    ar.astype(np.int32))
                        sad = int(np.abs(sblk - p).sum())
                        if bbest is None or sad < bbest:
                            bbest, bbm, bbp = sad, m, p
                    sub[r, c] = bbm
                    lev = _quantize(fdct4x4(sblk - bbp),
                                    dq["ydc"], dq["yac"])
                    yblocks[b] = lev
                    res = idct4x4(_dequant(lev, dq["ydc"],
                                           dq["yac"]).reshape(4, 4))
                    yp[yy:yy + 4, xx:xx + 4] = np.clip(bbp + res, 0, 255)
                rec["bmodes"] = sub
                rec["y2"] = None
                above_bm[mc] = sub[3]
                left_bm = sub[:, 3].copy()
            else:
                a = yp[y0 - 1, x0:x0 + 16] if y0 else None
                lt = yp[y0:y0 + 16, x0 - 1] if x0 else None
                al = yp[y0 - 1, x0 - 1] if (y0 and x0) else (
                    127 if y0 else (129 if x0 else None))
                ym, pred = best_whole((16, a, lt, al), srcy)
                resid = srcy - pred
                coefs = np.empty((16, 16), np.int32)
                for b in range(16):
                    r, c = b // 4, b % 4
                    coefs[b] = fdct4x4(
                        resid[4 * r:4 * r + 4, 4 * c:4 * c + 4]
                    ).reshape(16)
                y2 = fwht4x4(coefs[:, 0].reshape(4, 4)).reshape(16)
                y2lev = _quantize(y2.reshape(4, 4), dq["y2dc"],
                                  dq["y2ac"])
                wht = iwht4x4(_dequant(y2lev, dq["y2dc"],
                                       dq["y2ac"]).reshape(4, 4)
                              ).reshape(16)
                yblocks = np.zeros((16, 16), np.int32)
                for b in range(16):
                    lev = _quantize(coefs[b].reshape(4, 4), dq["ydc"],
                                    dq["yac"])
                    lev[0] = 0                 # DC travels via Y2
                    yblocks[b] = lev
                    dqc = _dequant(lev, dq["ydc"], dq["yac"])
                    dqc[0] = wht[b]
                    r, c = b // 4, b % 4
                    res = idct4x4(dqc.reshape(4, 4))
                    yy, xx = y0 + 4 * r, x0 + 4 * c
                    yp[yy:yy + 4, xx:xx + 4] = np.clip(
                        pred[4 * r:4 * r + 4, 4 * c:4 * c + 4] + res,
                        0, 255)
                rec["y2"] = y2lev
                fixed = _FIXED_BMODE[ym]
                above_bm[mc] = fixed
                left_bm = np.full(4, fixed, np.int32)
                rec["bmodes"] = None
            # chroma (DC/V/H/TM by SAD on both planes jointly)
            cx0, cy0 = mc * 8, mr * 8
            usb = usrc[cy0:cy0 + 8, cx0:cx0 + 8]
            vsb = vsrc[cy0:cy0 + 8, cx0:cx0 + 8]
            best = uvm = None
            for m in (DC_PRED, V_PRED, H_PRED, TM_PRED):
                sad = 0
                for plane_arr, src in ((up, usb), (vp, vsb)):
                    aa = plane_arr[cy0 - 1, cx0:cx0 + 8] if cy0 else None
                    ll = plane_arr[cy0:cy0 + 8, cx0 - 1] if cx0 else None
                    aal = plane_arr[cy0 - 1, cx0 - 1] \
                        if (cy0 and cx0) else (
                            127 if cy0 else (129 if cx0 else None))
                    sad += int(np.abs(
                        src - _pred_block(8, m, aa, ll, aal)).sum())
                if best is None or sad < best:
                    best, uvm = sad, m
            ub = np.zeros((4, 16), np.int32)
            vb = np.zeros((4, 16), np.int32)
            for plane_arr, src, blocks in ((up, usb, ub), (vp, vsb, vb)):
                aa = plane_arr[cy0 - 1, cx0:cx0 + 8] if cy0 else None
                ll = plane_arr[cy0:cy0 + 8, cx0 - 1] if cx0 else None
                aal = plane_arr[cy0 - 1, cx0 - 1] if (cy0 and cx0) else (
                    127 if cy0 else (129 if cx0 else None))
                pred = _pred_block(8, uvm, aa, ll, aal)
                resid = src - pred
                for b in range(4):
                    r, c = b // 2, b % 2
                    lev = _quantize(
                        fdct4x4(resid[4 * r:4 * r + 4, 4 * c:4 * c + 4]),
                        dq["uvdc"], dq["uvac"])
                    blocks[b] = lev
                    res = idct4x4(_dequant(lev, dq["uvdc"],
                                           dq["uvac"]).reshape(4, 4))
                    yy, xx = cy0 + 4 * r, cx0 + 4 * c
                    plane_arr[yy:yy + 4, xx:xx + 4] = np.clip(
                        pred[4 * r:4 * r + 4, 4 * c:4 * c + 4] + res,
                        0, 255)
            has_y2 = ym != B_PRED
            all_zero = (not np.any(yblocks[:, 1:] if has_y2 else yblocks)
                        and (rec["y2"] is None or not np.any(rec["y2"]))
                        and not np.any(ub) and not np.any(vb))
            mbs.append({"ym": ym, "uvm": uvm, "y": yblocks, "u": ub,
                        "v": vb, "y2": rec["y2"],
                        "bmodes": rec["bmodes"],
                        "skip": use_skip and all_zero})

    # effective token tables: defaults + fixture-only updates
    probs = DEFAULT_COEF_PROBS
    if coef_prob_updates:
        mut = [[[list(DEFAULT_COEF_PROBS[i][j][k]) for k in range(3)]
                for j in range(8)] for i in range(4)]
        for (i, j, k, t), val in coef_prob_updates.items():
            mut[i][j][k][t] = val
        probs = mut

    # ---- first partition: header + modes ----
    be = _BoolEncoder()
    be.literal(0, 1)                           # color space
    be.literal(0, 1)                           # clamping
    if segmentation is None:
        be.bool(0, 128)                        # segmentation off
    else:
        be.bool(1, 128)                        # enabled
        be.bool(1, 128)                        # update map
        be.bool(1, 128)                        # update data
        be.bool(0, 128)                        # delta (not absolute)
        for _ in range(4):                     # quantizer deltas: the
            be.bool(1, 128)                    # present-but-ZERO path
            be.signed(0, 7)                    # delta = +0
        for _ in range(4):                     # loop-filter deltas
            if segmentation.get("lf_deltas"):
                be.bool(1, 128)
                be.signed(2, 6)                # delta = +2 (tolerated)
            else:
                be.bool(0, 128)
        for p in segmentation["tree_probs"]:
            be.bool(1, 128)
            be.literal(p, 8)
    be.bool(1 if simple_filter else 0, 128)
    be.literal(filter_level, 6)
    be.literal(sharpness, 3)
    be.bool(0, 128)                            # lf deltas off
    be.literal({1: 0, 2: 1, 4: 2, 8: 3}[n_parts], 2)
    be.literal(qi, 7)
    for _ in range(5):
        be.bool(0, 128)                        # no quantizer deltas
    be.bool(0, 128)                            # refresh entropy (n/a)
    for i in range(4):                         # coef prob update bits
        for j in range(8):
            for k in range(3):
                for t in range(11):
                    cur = probs[i][j][k][t]
                    upd = cur != DEFAULT_COEF_PROBS[i][j][k][t]
                    be.bool(1 if upd else 0, COEF_UPDATE_PROBS[i][j][k][t])
                    if upd:
                        be.literal(cur, 8)
    be.bool(1 if use_skip else 0, 128)
    if use_skip:
        be.literal(128, 8)                     # prob_skip_false
    above_bm[:] = 0
    mi = 0
    for mr in range(mb_rows):
        left_bm = np.zeros(4, np.int32)
        for mc in range(mb_cols):
            mb = mbs[mi]
            mi += 1
            if segmentation is not None:
                # checkerboard id through the 2-level tree (§10)
                sid = (mr + mc) % 4
                tp = segmentation["tree_probs"]
                b1, b0 = sid >> 1, sid & 1
                be.bool(b1, tp[0])
                be.bool(b0, tp[2] if b1 else tp[1])
            if use_skip:
                be.bool(1 if mb["skip"] else 0, 128)
            be.tree(KF_YMODE_TREE, KF_YMODE_PROBS, mb["ym"])
            if mb["ym"] == B_PRED:
                sub = mb["bmodes"]
                for r in range(4):
                    for c in range(4):
                        am = above_bm[mc][c] if r == 0 else sub[r - 1, c]
                        lm = left_bm[r] if c == 0 else sub[r, c - 1]
                        be.tree(BMODE_TREE, KF_BMODE_PROBS[am][lm],
                                int(sub[r, c]))
                above_bm[mc] = sub[3]
                left_bm = sub[:, 3].copy()
            else:
                fixed = _FIXED_BMODE[mb["ym"]]
                above_bm[mc] = fixed
                left_bm[:] = fixed
            be.tree(UV_MODE_TREE, KF_UV_MODE_PROBS, mb["uvm"])
    part0 = be.flush()

    # ---- token partitions ----
    encs = [_BoolEncoder() for _ in range(n_parts)]
    above_nz = np.zeros((mb_cols, 9), np.int32)
    mi = 0
    for mr in range(mb_rows):
        te = encs[mr % n_parts]
        left_nz = np.zeros(9, np.int32)
        for mc in range(mb_cols):
            mb = mbs[mi]
            mi += 1
            has_y2 = mb["ym"] != B_PRED
            if mb["skip"]:
                above_nz[mc, :8] = 0
                left_nz[:8] = 0
                if has_y2:
                    above_nz[mc, 8] = left_nz[8] = 0
                continue
            if has_y2:
                ctx = above_nz[mc, 8] + left_nz[8]
                nz = _encode_tokens(te, mb["y2"], 1, ctx, probs[1])
                above_nz[mc, 8] = left_nz[8] = nz
            plane = 0 if has_y2 else 3
            for b in range(16):
                r, c = b // 4, b % 4
                ctx = above_nz[mc, c] + left_nz[r]
                nz = _encode_tokens(te, mb["y"][b], plane, ctx,
                                    probs[plane])
                above_nz[mc, c] = left_nz[r] = nz
            for pi, blocks in ((0, mb["u"]), (1, mb["v"])):
                for b in range(4):
                    r, c = b // 2, b % 2
                    sl = 4 + 2 * pi
                    ctx = above_nz[mc, sl + c] + left_nz[sl + r]
                    nz = _encode_tokens(te, blocks[b], 2, ctx,
                                        probs[2])
                    above_nz[mc, sl + c] = left_nz[sl + r] = nz
    parts = [e.flush() for e in encs]

    first_size = len(part0)
    tag = (0 | (0 << 1) | (1 << 4) | (first_size << 5))
    out = bytearray()
    out += bytes((tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF))
    out += b"\x9d\x01\x2a"
    out += bytes((w & 0xFF, (w >> 8) & 0x3F, h & 0xFF, (h >> 8) & 0x3F))
    out += part0
    for p in parts[:-1]:
        out += bytes((len(p) & 0xFF, (len(p) >> 8) & 0xFF,
                      (len(p) >> 16) & 0xFF))
    for p in parts:
        out += p
    out += VP8_TWIN_MARK                   # r12 honesty gate trailer
    return bytes(out)


def encode_webp_vp8(img: np.ndarray, qi: int = 4, **kw) -> bytes:
    """Wrap encode_vp8 in a RIFF WebP container ("VP8 " chunk)."""
    import struct
    payload = encode_vp8(img, qi, **kw)
    chunk = b"VP8 " + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
