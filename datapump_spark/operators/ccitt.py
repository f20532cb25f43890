"""CCITT Group 4 (ITU-T T.6 / MMR) bilevel codec (round 10).

G4 is the fax compression inside scanned-document TIFFs — the last
TIFF seam after tiles/planar. The scheme is fully public (ITU-T T.6,
with the run-length code tables shared with T.4 MH):

- 2-D coding only, no EOLs: each row codes against the previous
  (reference) row via PASS (0001), HORIZONTAL (001 + two T.4
  run-length codes in the current color order) and VERTICAL modes
  (V0 1, VR1 011, VR2 000011, VR3 0000011, VL1 010, VL2 000010,
  VL3 0000010);
- run lengths use the T.4 Modified-Huffman tables: per-color
  terminating codes 0..63, makeup codes 64..1728 in steps of 64, and
  the shared extended makeups 1792..2560 (a makeup is always followed
  by a terminating code);
- the first reference line is an imaginary all-white row; rows are
  MSB-first bit-packed (TIFF FillOrder 1).

Fidelity note (the usual caveat, COVERAGE.md): the MH tables are
transcribed from the published T.4 tables and validated prefix-free
at import; no libtiff exists in-container to cross-check a foreign
fax, so conformance evidence is round trips against the mirrored
encoder twin plus hand-built streams exercising pass/vertical/
horizontal/makeup paths. Uncompressed-mode extension (T6Options bit
1) and G3 (T.4 with EOLs) are refused honestly.

Reference parity note: the reference has no image surface; charter
extension closing the COVERAGE.md CCITT seam.
"""

from __future__ import annotations

import numpy as np

from datapump_spark.operators.codecs import UnsupportedMediaError

# T.4 white run-length codes (terminating 0-63 + makeup)
_WHITE = {
    0: "00110101", 1: "000111", 2: "0111", 3: "1000", 4: "1011",
    5: "1100", 6: "1110", 7: "1111", 8: "10011", 9: "10100",
    10: "00111", 11: "01000", 12: "001000", 13: "000011", 14: "110100",
    15: "110101", 16: "101010", 17: "101011", 18: "0100111",
    19: "0001100", 20: "0001000", 21: "0010111", 22: "0000011",
    23: "0000100", 24: "0101000", 25: "0101011", 26: "0010011",
    27: "0100100", 28: "0011000", 29: "00000010", 30: "00000011",
    31: "00011010", 32: "00011011", 33: "00010010", 34: "00010011",
    35: "00010100", 36: "00010101", 37: "00010110", 38: "00010111",
    39: "00101000", 40: "00101001", 41: "00101010", 42: "00101011",
    43: "00101100", 44: "00101101", 45: "00000100", 46: "00000101",
    47: "00001010", 48: "00001011", 49: "01010010", 50: "01010011",
    51: "01010100", 52: "01010101", 53: "00100100", 54: "00100101",
    55: "01011000", 56: "01011001", 57: "01011010", 58: "01011011",
    59: "01001010", 60: "01001011", 61: "00110010", 62: "00110011",
    63: "00110100",
    64: "11011", 128: "10010", 192: "010111", 256: "0110111",
    320: "00110110", 384: "00110111", 448: "01100100", 512: "01100101",
    576: "01101000", 640: "01100111", 704: "011001100",
    768: "011001101", 832: "011010010", 896: "011010011",
    960: "011010100", 1024: "011010101", 1088: "011010110",
    1152: "011010111", 1216: "011011000", 1280: "011011001",
    1344: "011011010", 1408: "011011011", 1472: "010011000",
    1536: "010011001", 1600: "010011010", 1664: "011000",
    1728: "010011011",
}

# T.4 black run-length codes
_BLACK = {
    0: "0000110111", 1: "010", 2: "11", 3: "10", 4: "011", 5: "0011",
    6: "0010", 7: "00011", 8: "000101", 9: "000100", 10: "0000100",
    11: "0000101", 12: "0000111", 13: "00000100", 14: "00000111",
    15: "000011000", 16: "0000010111", 17: "0000011000",
    18: "0000001000", 19: "00001100111", 20: "00001101000",
    21: "00001101100", 22: "00000110111", 23: "00000101000",
    24: "00000010111", 25: "00000011000", 26: "000011001010",
    27: "000011001011", 28: "000011001100", 29: "000011001101",
    30: "000001101000", 31: "000001101001", 32: "000001101010",
    33: "000001101011", 34: "000011010010", 35: "000011010011",
    36: "000011010100", 37: "000011010101", 38: "000011010110",
    39: "000011010111", 40: "000001101100", 41: "000001101101",
    42: "000011011010", 43: "000011011011", 44: "000001010100",
    45: "000001010101", 46: "000001010110", 47: "000001010111",
    48: "000001100100", 49: "000001100101", 50: "000001010010",
    51: "000001010011", 52: "000000100100", 53: "000000110111",
    54: "000000111000", 55: "000000100111", 56: "000000101000",
    57: "000001011000", 58: "000001011001", 59: "000000101011",
    60: "000000101100", 61: "000001011010", 62: "000001100110",
    63: "000001100111",
    64: "0000001111", 128: "000011001000", 192: "000011001001",
    256: "000001011011", 320: "000000110011", 384: "000000110100",
    448: "000000110101", 512: "0000001101100", 576: "0000001101101",
    640: "0000001001010", 704: "0000001001011", 768: "0000001001100",
    832: "0000001001101", 896: "0000001110010", 960: "0000001110011",
    1024: "0000001110100", 1088: "0000001110101", 1152: "0000001110110",
    1216: "0000001110111", 1280: "0000001010010", 1344: "0000001010011",
    1408: "0000001010100", 1472: "0000001010101", 1536: "0000001011010",
    1600: "0000001011011", 1664: "0000001100100", 1728: "0000001100101",
}

# extended makeup codes, shared by both colors
_EXT = {
    1792: "00000001000", 1856: "00000001100", 1920: "00000001101",
    1984: "000000010010", 2048: "000000010011", 2112: "000000010100",
    2176: "000000010101", 2240: "000000010110", 2304: "000000010111",
    2368: "000000011100", 2432: "000000011101", 2496: "000000011110",
    2560: "000000011111",
}


def _prefix_check(codes: dict, name: str) -> None:
    vals = sorted(codes.values())
    for a, b in zip(vals, vals[1:]):
        if b.startswith(a):
            raise AssertionError(f"{name}: {a!r} prefixes {b!r}")


_prefix_check({**{f"w{k}": v for k, v in _WHITE.items()},
               **{f"e{k}": v for k, v in _EXT.items()}}, "white+ext")
_prefix_check({**{f"b{k}": v for k, v in _BLACK.items()},
               **{f"e{k}": v for k, v in _EXT.items()}}, "black+ext")

# decode tries: code string -> run length
_WHITE_DEC = {v: k for k, v in {**_WHITE, **_EXT}.items()}
_BLACK_DEC = {v: k for k, v in {**_BLACK, **_EXT}.items()}
_MAX_CODE = 14


class _Bits:
    __slots__ = ("b", "pos")

    def __init__(self, b: bytes):
        self.b = b
        self.pos = 0

    def bit(self) -> int:
        i = self.pos
        if i >= len(self.b) * 8:
            raise ValueError("CCITT G4 stream exhausted mid-row")
        self.pos = i + 1
        return (self.b[i >> 3] >> (7 - (i & 7))) & 1


def _read_run(r: _Bits, white: bool) -> int:
    """One T.4 run: makeup codes accumulate until a terminating code."""
    table = _WHITE_DEC if white else _BLACK_DEC
    total = 0
    while True:
        code = ""
        for _ in range(_MAX_CODE):
            code += "01"[r.bit()]
            if code in table:
                break
        else:
            raise ValueError("invalid CCITT run-length code")
        run = table[code]
        total += run
        if run < 64:
            return total
        # makeup: a terminating code follows (possibly another makeup
        # for the extended range per T.4 note — accept chains)


def _emit_run(out: list, run: int, white: bool) -> None:
    table = _WHITE if white else _BLACK
    while run >= 2624:                   # largest makeup + max term
        out.append(_EXT[2560])
        run -= 2560
    if run >= 64:
        makeup = min(run & ~63, 1728) if run < 1792 else (run // 64) * 64
        if makeup > 1728:
            makeup = max(k for k in _EXT if k <= run)
            out.append(_EXT[makeup])
        else:
            out.append(table[makeup])
        run -= makeup
    out.append(table[run])


def _changes(row: np.ndarray) -> list:
    """Changing-element positions: pixels whose color differs from the
    previous pixel, with an imaginary WHITE pixel before position 0
    (so a black first pixel is a change at 0). Change at even index =
    white->black, odd = black->white."""
    aug = np.concatenate([np.zeros(1, row.dtype), row])
    return (np.nonzero(np.diff(aug))[0]).tolist()


def _b1_b2(ref_ch: list, a0: int, color: int, width: int):
    """(b1, b2) per T.6: b1 = first reference change right of a0 whose
    transition color is OPPOSITE the coding color; b2 = next change
    after b1."""
    for idx, c in enumerate(ref_ch):
        if c > a0 and (idx % 2 == 0) == (color == 0):
            b2 = ref_ch[idx + 1] if idx + 1 < len(ref_ch) else width
            return c, b2
    return width, width


_V_CODES = {0: "1", 1: "011", 2: "000011", 3: "0000011",
            -1: "010", -2: "000010", -3: "0000010"}


def ccitt_g4_decode(b: bytes, width: int, height: int) -> np.ndarray:
    """Decode a T.6 (G4/MMR) stream to (height, width) uint8 with
    1 = black, 0 = white (photometric mapping is the caller's job)."""
    r = _Bits(b)
    out = np.zeros((height, width), np.uint8)
    ref = np.zeros(width, np.uint8)      # imaginary all-white row
    for y in range(height):
        row = np.zeros(width, np.uint8)
        ref_ch = _changes(ref)
        a0 = -1
        color = 0                        # coding color (0 = white)
        while a0 < width:
            b1, b2 = _b1_b2(ref_ch, a0, color, width)
            code = ""
            mode = None
            for _ in range(7):
                code += "01"[r.bit()]
                if code in ("1", "011", "010", "000011", "000010",
                            "0000011", "0000010"):
                    mode = ("V", {"1": 0, "011": 1, "010": -1,
                                  "000011": 2, "000010": -2,
                                  "0000011": 3, "0000010": -3}[code])
                elif code == "001":
                    mode = ("H", 0)
                elif code == "0001":
                    mode = ("P", 0)
                if mode:
                    break
            if mode is None:
                raise ValueError("invalid CCITT G4 mode code")
            kind, d = mode
            start = max(a0, 0)
            if kind == "P":
                if color:
                    row[start:b2] = 1
                a0 = b2
            elif kind == "V":
                a1 = b1 + d
                if a1 < 0 or a1 > width:
                    raise ValueError("CCITT vertical mode out of range")
                if color:
                    row[start:a1] = 1
                a0 = a1
                color ^= 1
            else:                        # horizontal: two coded runs
                r1 = _read_run(r, color == 0)
                r2 = _read_run(r, color != 0)
                a1 = start + r1
                a2 = a1 + r2
                if a2 > width:
                    raise ValueError("CCITT horizontal run overflow")
                if color:
                    row[start:a1] = 1
                else:
                    row[a1:a2] = 1
                a0 = a2
        out[y] = row
        ref = row
    return out


def ccitt_g4_encode(img: np.ndarray) -> bytes:
    """Encode (h, w) bilevel (0 = white, nonzero = black) as T.6 —
    the mirrored fixture/sink twin of ccitt_g4_decode."""
    a = (np.asarray(img) != 0).astype(np.uint8)
    h, w = a.shape
    bits: list = []
    ref = np.zeros(w, np.uint8)
    for y in range(h):
        row = a[y]
        ref_ch = _changes(ref)
        row_ch = _changes(row)
        a0 = -1
        color = 0
        while a0 < w:
            a1 = w
            for c in row_ch:
                if c > a0:
                    a1 = c
                    break
            b1, b2 = _b1_b2(ref_ch, a0, color, w)
            if b2 < a1:
                bits.append("0001")      # pass
                a0 = b2
                continue
            if abs(a1 - b1) <= 3:
                bits.append(_V_CODES[a1 - b1])
                a0 = a1
                color ^= 1
                continue
            a2 = w                       # horizontal
            for c in row_ch:
                if c > a1:
                    a2 = c
                    break
            bits.append("001")
            start = max(a0, 0)
            _emit_run(bits, a1 - start, color == 0)
            _emit_run(bits, a2 - a1, color != 0)
            a0 = a2
        ref = row
    s = "".join(bits)
    s += "0" * ((-len(s)) % 8)
    return bytes(int(s[i:i + 8], 2) for i in range(0, len(s), 8))
