"""WebP lossless (VP8L) encode/decode in pure Python + numpy.

Covers the stickers/diagrams/screenshots slice of a web crawl — the
images where lossless WebP dominates. ``decode_webp`` handles the full
VP8L bitstream per the published WebP Lossless Bitstream Specification
(RFC 9649 §4): LSB-first bit packing, canonical prefix codes (simple
and normal forms, code-length codes with 16/17/18 repeats and the
max-symbol short-circuit), LZ77 backward references with the 120-entry
2D distance mapping, color cache, meta prefix-code images, and all four
transforms — PREDICTOR (14 modes, including Select and the clamped
add/subtract pair), COLOR (3.5-bit fixed-point cross-channel deltas),
SUBTRACT_GREEN, and COLOR_INDEXING (with sub-byte pixel bundling for
palettes ≤16 colors). Lossy VP8 routes to operators/vp8.py (r9), and
VP8X-extended STILLS decode too (r9: canvas header, ALPH alpha in all
four prediction filters, raw or headless-VP8L compression, inner
VP8/VP8L routing); animated files raise ``UnsupportedMediaError`` —
the remaining honest seam.

``encode_webp_vp8l`` emits spec-valid lossless streams for the fixture
and sink side: literal coding with per-channel canonical prefix codes
(depth-limited by the same Annex-K-style merge/fold used for JPEG),
optional SUBTRACT_GREEN / single-mode PREDICTOR / COLOR transforms,
optional palette (COLOR_INDEXING incl. bundling), optional color cache,
and optional LZ77 run emission (distance-1 runs and row-above copies
through the 2D mapping) — so every decoder path above faces a
round-trip test.

Reference parity note: the reference (datapump.py) has no multimodal
surface at all (requirements.txt:1-9); this extends the engine for
training-data pipelines per the build charter.
"""

from __future__ import annotations

import struct

import numpy as np

from datapump_spark.operators.codecs import UnsupportedMediaError

# Order in which code-length-code lengths are stored (RFC 9649 §4.4.2).
_CL_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13,
             14, 15]

# 2D distance mapping (RFC 9649 §4.3.2): distance codes 1..120 address a
# near neighborhood; (dx, dy) with distance = dy * width + dx, min 1.
_DIST_MAP = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
]


# --------------------------------------------------------------------------
# Bit I/O (LSB-first, like DEFLATE)
# --------------------------------------------------------------------------

class _LSBReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def read(self, n: int) -> int:
        while self.n < n:
            if self.pos >= len(self.data):
                raise ValueError("truncated VP8L stream")
            self.acc |= self.data[self.pos] << self.n
            self.pos += 1
            self.n += 8
        v = self.acc & ((1 << n) - 1)
        self.acc >>= n
        self.n -= n
        return v


class _LSBWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, v: int, n: int) -> None:
        self.acc |= (v & ((1 << n) - 1)) << self.n
        self.n += n
        while self.n >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def write_code(self, code: int, length: int) -> None:
        """Prefix codes transmit their bits MSB-of-code first."""
        for i in range(length - 1, -1, -1):
            self.write((code >> i) & 1, 1)

    def data(self) -> bytes:
        if self.n:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.n = 0
        return bytes(self.out)


# --------------------------------------------------------------------------
# Canonical prefix codes
# --------------------------------------------------------------------------

def _canonical_codes(lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
    """DEFLATE-style canonical assignment: codes in (length, symbol)
    order."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    prev = 0
    for sym in sorted(lengths, key=lambda s: (lengths[s], s)):
        length = lengths[sym]
        code <<= length - prev
        out[sym] = (code, length)
        code += 1
        prev = length
    return out


class _HuffCode:
    """Decoder-side prefix code: bit-at-a-time canonical walk. A code
    with a single used symbol reads ZERO bits (the spec's simple-code
    degenerate case; libwebp treats normal-coded single-symbol tables
    the same way)."""

    __slots__ = ("single", "table", "maxlen")

    def __init__(self, lengths: dict[int, int]):
        nz = {s: ln for s, ln in lengths.items() if ln > 0}
        if not nz:
            raise ValueError("empty VP8L prefix code")
        if len(nz) == 1:
            self.single = next(iter(nz))
            self.table = None
            self.maxlen = 0
        else:
            self.single = None
            self.table = {(ln, c): s
                          for s, (c, ln) in _canonical_codes(nz).items()}
            self.maxlen = max(nz.values())

    def read(self, br: _LSBReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        length = 0
        while True:
            code = (code << 1) | br.read(1)
            length += 1
            sym = self.table.get((length, code))
            if sym is not None:
                return sym
            if length >= self.maxlen:
                raise ValueError("invalid VP8L prefix stream")


def _read_prefix_code(br: _LSBReader, alphabet_size: int) -> _HuffCode:
    """RFC 9649 §4.4.1: simple (1-2 symbol) or normal (code-length-
    coded) prefix code."""
    if br.read(1):                      # simple
        num_symbols = br.read(1) + 1
        if br.read(1):
            sym0 = br.read(8)
        else:
            sym0 = br.read(1)
        if num_symbols == 1:
            return _HuffCode({sym0: 1})  # single symbol -> 0-bit read
        sym1 = br.read(8)
        # simple codes assign 0/1 in READ order, not canonical order
        code = _HuffCode({sym0: 1, sym1: 1})
        code.table = {(1, 0): sym0, (1, 1): sym1}
        return code

    num_cl = 4 + br.read(4)
    cl_lengths = {}
    for i in range(num_cl):
        cl_lengths[_CL_ORDER[i]] = br.read(3)
    cl_code = _HuffCode(cl_lengths)

    if br.read(1):                      # explicit max-symbol count
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths: dict[int, int] = {}
    prev_len = 8
    symbol = 0
    while symbol < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        cl = cl_code.read(br)
        if cl < 16:
            lengths[symbol] = cl
            symbol += 1
            if cl:
                prev_len = cl
        elif cl == 16:
            for _ in range(3 + br.read(2)):
                lengths[symbol] = prev_len
                symbol += 1
        elif cl == 17:
            symbol += 3 + br.read(3)
        else:                           # 18
            symbol += 11 + br.read(7)
    return _HuffCode(lengths)


def _prefix_value(br_or_code, br: _LSBReader) -> int:
    """LZ77 length/distance prefix decoding (§4.3.1)."""
    prefix = br_or_code
    if prefix < 4:
        return prefix + 1
    extra = (prefix - 2) >> 1
    offset = (2 + (prefix & 1)) << extra
    return offset + br.read(extra) + 1


def _prefix_encode(value: int) -> tuple[int, int, int]:
    """Inverse of _prefix_value: value -> (prefix, extra_bits, nbits)."""
    if value <= 4:
        return value - 1, 0, 0
    v = value - 1
    nbits = v.bit_length() - 1
    extra = v - (1 << nbits)
    if extra < (1 << (nbits - 1)):
        return 2 * nbits, extra, nbits - 1
    return 2 * nbits + 1, extra - (1 << (nbits - 1)), nbits - 1


def _cache_hash(argb: int, bits: int) -> int:
    return ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - bits)


# --------------------------------------------------------------------------
# Decoder
# --------------------------------------------------------------------------

def _decode_entropy_image(br: _LSBReader, w: int, h: int,
                          is_level0: bool) -> tuple[np.ndarray, list]:
    """Decode one spatially-coded ARGB image of (h, w) uint32 pixels.
    Returns (pixels, transforms-read) — transforms only at level 0."""
    transforms = []
    tw = w                              # transformed (possibly packed) width
    if is_level0:
        seen = set()
        while br.read(1):
            ttype = br.read(2)
            if ttype in seen:
                raise ValueError("duplicate VP8L transform")
            seen.add(ttype)
            if ttype == 0:              # PREDICTOR
                size_bits = br.read(3) + 2
                bw_ = -(-tw // (1 << size_bits))
                bh_ = -(-h // (1 << size_bits))
                sub, _ = _decode_entropy_image(br, bw_, bh_, False)
                transforms.append(("predictor", size_bits, sub))
            elif ttype == 1:            # COLOR
                size_bits = br.read(3) + 2
                bw_ = -(-tw // (1 << size_bits))
                bh_ = -(-h // (1 << size_bits))
                sub, _ = _decode_entropy_image(br, bw_, bh_, False)
                transforms.append(("color", size_bits, sub))
            elif ttype == 2:            # SUBTRACT_GREEN
                transforms.append(("subtract_green",))
            else:                       # COLOR_INDEXING
                n_colors = br.read(8) + 1
                pal_deltas, _ = _decode_entropy_image(br, n_colors, 1,
                                                      False)
                # palette entries are stored as per-channel deltas
                pal = np.cumsum(
                    pal_deltas.reshape(-1).view(np.uint8)
                    .reshape(n_colors, 4).astype(np.uint32),
                    axis=0).astype(np.uint8)
                if n_colors <= 2:
                    width_bits = 3
                elif n_colors <= 4:
                    width_bits = 2
                elif n_colors <= 16:
                    width_bits = 1
                else:
                    width_bits = 0
                transforms.append(("palette", width_bits, pal, tw))
                tw = -(-tw // (1 << width_bits))

    cache_bits = br.read(4) if br.read(1) else 0
    if cache_bits > 11:
        raise ValueError("invalid VP8L color cache size")
    cache = [0] * (1 << cache_bits) if cache_bits else None

    meta = None
    meta_bits = 0
    n_groups = 1
    if is_level0 and br.read(1):        # meta prefix-code image
        meta_bits = br.read(3) + 2
        mw = -(-tw // (1 << meta_bits))
        mh = -(-h // (1 << meta_bits))
        meta_img, _ = _decode_entropy_image(br, mw, mh, False)
        # meta code index = (red << 8) | green
        meta = (((meta_img >> 16) & 0xFF) << 8) | ((meta_img >> 8) & 0xFF)
        n_groups = int(meta.max()) + 1

    green_size = 256 + 24 + (1 << cache_bits if cache_bits else 0)
    groups = []
    for _ in range(n_groups):
        codes = [_read_prefix_code(br, green_size),
                 _read_prefix_code(br, 256),
                 _read_prefix_code(br, 256),
                 _read_prefix_code(br, 256),
                 _read_prefix_code(br, 40)]
        groups.append(codes)

    n_pix = tw * h
    px = np.zeros(n_pix, np.uint32)
    pos = 0
    while pos < n_pix:
        if meta is not None:
            x, y = pos % tw, pos // tw
            g = groups[int(meta[y >> meta_bits, x >> meta_bits])]
        else:
            g = groups[0]
        sym = g[0].read(br)
        if sym < 256:                   # literal: G, R, B, A
            red = g[1].read(br)
            blue = g[2].read(br)
            alpha = g[3].read(br)
            argb = (alpha << 24) | (red << 16) | (sym << 8) | blue
            px[pos] = argb
            if cache is not None:
                cache[_cache_hash(argb, cache_bits)] = argb
            pos += 1
        elif sym < 280:                 # LZ77 backward reference
            length = _prefix_value(sym - 256, br)
            dist_code = _prefix_value(g[4].read(br), br)
            if dist_code > 120:
                dist = dist_code - 120
            else:
                dx, dy = _DIST_MAP[dist_code - 1]
                dist = dy * tw + dx
                if dist < 1:
                    dist = 1
            if dist > pos or pos + length > n_pix:
                raise ValueError("VP8L backward reference out of range")
            for _ in range(length):     # may overlap (run coding)
                argb = int(px[pos - dist])
                px[pos] = argb
                if cache is not None:
                    cache[_cache_hash(argb, cache_bits)] = argb
                pos += 1
        else:                           # color cache hit
            if cache is None:
                raise ValueError("VP8L cache symbol without cache")
            px[pos] = cache[sym - 280]
            pos += 1

    return px.reshape(h, tw), transforms


def _apply_inverse_transforms(px: np.ndarray, transforms: list,
                              width: int) -> np.ndarray:
    """Inverse transforms in reverse bitstream order (§4.2)."""
    for tr in reversed(transforms):
        kind = tr[0]
        if kind == "palette":
            _, width_bits, pal, orig_w = tr
            idx = ((px >> 8) & 0xFF).astype(np.int64)
            if width_bits:
                per = 1 << width_bits
                bpp = 8 >> width_bits
                h = idx.shape[0]
                unpacked = np.zeros((h, idx.shape[1] * per), np.int64)
                for sub in range(per):
                    unpacked[:, sub::per] = (
                        idx >> (sub * bpp)) & ((1 << bpp) - 1)
                idx = unpacked[:, :orig_w]
            if int(idx.max(initial=0)) >= pal.shape[0]:
                raise ValueError("VP8L palette index out of range")
            # palette rows are the uint8 view of little-endian packed
            # ARGB: byte order B, G, R, A
            b, g, r, a = (pal[idx, 0].astype(np.uint32),
                          pal[idx, 1].astype(np.uint32),
                          pal[idx, 2].astype(np.uint32),
                          pal[idx, 3].astype(np.uint32))
            px = (a << 24) | (r << 16) | (g << 8) | b
            px = px.astype(np.uint32)
        elif kind == "subtract_green":
            g = (px >> 8) & 0xFF
            r = (((px >> 16) & 0xFF) + g) & 0xFF
            b = ((px & 0xFF) + g) & 0xFF
            px = (px & 0xFF00FF00) | (r << 16) | b
        elif kind == "color":
            _, size_bits, sub = tr
            px = _inverse_color_transform(px, size_bits, sub)
        elif kind == "predictor":
            _, size_bits, sub = tr
            px = _inverse_predictor(px, size_bits, sub)
    return px


def _ctdelta(t: int, c: int) -> int:
    """(int8)t * (int8)c >> 5 — the 3.5 fixed-point color delta."""
    ts = t - 256 if t >= 128 else t
    cs = c - 256 if c >= 128 else c
    return (ts * cs) >> 5


def _inverse_color_transform(px: np.ndarray, size_bits: int,
                             sub: np.ndarray) -> np.ndarray:
    """Vectorized: no spatial dependency — blue only needs the FINAL
    red of the same pixel, so the whole plane is three array ops."""
    h, w = px.shape
    cte = sub[np.ix_(np.arange(h) >> size_bits,
                     np.arange(w) >> size_bits)]

    def s8(a):                          # reinterpret low byte as int8
        return (a & 0xFF).astype(np.uint8).view(np.int8).astype(np.int32)

    g2r, g2b, r2b = s8(cte), s8(cte >> 8), s8(cte >> 16)
    green = s8(px >> 8)
    red = (((px >> 16) & 0xFF).astype(np.int32)
           + ((g2r * green) >> 5)) & 0xFF
    blue = ((px & 0xFF).astype(np.int32) + ((g2b * green) >> 5)
            + ((r2b * red.astype(np.uint8).view(np.int8)
                .astype(np.int32)) >> 5)) & 0xFF
    return ((px & 0xFF00FF00) | (red.astype(np.uint32) << 16)
            | blue.astype(np.uint32))


def _bytes4(v: int) -> tuple[int, int, int, int]:
    return (v >> 24) & 0xFF, (v >> 16) & 0xFF, (v >> 8) & 0xFF, v & 0xFF


def _avg2(a: int, b: int) -> int:
    aa, ar, ag, ab = _bytes4(a)
    ba, br_, bg, bb = _bytes4(b)
    return (((aa + ba) >> 1) << 24) | (((ar + br_) >> 1) << 16) | \
           (((ag + bg) >> 1) << 8) | ((ab + bb) >> 1)


def _select(left: int, top: int, topleft: int) -> int:
    la, lr, lg, lb = _bytes4(left)
    ta, tr, tg, tb = _bytes4(top)
    ca, cr, cg, cb = _bytes4(topleft)
    pa, pr, pg, pb = la + ta - ca, lr + tr - cr, lg + tg - cg, lb + tb - cb
    p_l = abs(pa - la) + abs(pr - lr) + abs(pg - lg) + abs(pb - lb)
    p_t = abs(pa - ta) + abs(pr - tr) + abs(pg - tg) + abs(pb - tb)
    return left if p_l < p_t else top


def _clamp_add_sub_full(a: int, b: int, c: int) -> int:
    out = 0
    for shift in (24, 16, 8, 0):
        v = ((a >> shift) & 0xFF) + ((b >> shift) & 0xFF) \
            - ((c >> shift) & 0xFF)
        out |= max(0, min(255, v)) << shift
    return out


def _clamp_add_sub_half(ab: int, c: int) -> int:
    out = 0
    for shift in (24, 16, 8, 0):
        a = (ab >> shift) & 0xFF
        d = a - ((c >> shift) & 0xFF)
        # C-style truncation toward zero
        half = d // 2 if d >= 0 else -((-d) // 2)
        out |= max(0, min(255, a + half)) << shift
    return out


def _predict(mode: int, left: int, top: int, topleft: int,
             topright: int) -> int:
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return left
    if mode == 2:
        return top
    if mode == 3:
        return topright
    if mode == 4:
        return topleft
    if mode == 5:
        return _avg2(_avg2(left, topright), top)
    if mode == 6:
        return _avg2(left, topleft)
    if mode == 7:
        return _avg2(left, top)
    if mode == 8:
        return _avg2(topleft, top)
    if mode == 9:
        return _avg2(top, topright)
    if mode == 10:
        return _avg2(_avg2(left, topleft), _avg2(top, topright))
    if mode == 11:
        return _select(left, top, topleft)
    if mode == 12:
        return _clamp_add_sub_full(left, top, topleft)
    if mode == 13:
        return _clamp_add_sub_half(_avg2(left, top), topleft)
    raise ValueError(f"invalid VP8L predictor mode {mode}")


def _add_px(a: int, b: int) -> int:
    """Per-channel modular add of two packed ARGB values."""
    out = 0
    for shift in (24, 16, 8, 0):
        out |= ((((a >> shift) & 0xFF) + ((b >> shift) & 0xFF)) & 0xFF) \
            << shift
    return out


def _sub_px(a: int, b: int) -> int:
    out = 0
    for shift in (24, 16, 8, 0):
        out |= ((((a >> shift) & 0xFF) - ((b >> shift) & 0xFF)) & 0xFF) \
            << shift
    return out


def _inverse_predictor(px: np.ndarray, size_bits: int,
                       sub: np.ndarray) -> np.ndarray:
    h, w = px.shape
    out = px.astype(np.uint32).copy()
    for y in range(h):
        srow = sub[y >> size_bits]
        for x in range(w):
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = int(out[0, x - 1])           # L
            elif x == 0:
                pred = int(out[y - 1, 0])           # T
            else:
                mode = (int(srow[x >> size_bits]) >> 8) & 0xFF
                left = int(out[y, x - 1])
                top = int(out[y - 1, x])
                topleft = int(out[y - 1, x - 1])
                # rightmost column: TR wraps to the current row's first
                # pixel (the contiguous-buffer rule the format pins)
                topright = int(out[y - 1, x + 1]) if x + 1 < w \
                    else int(out[y, 0])
                pred = _predict(mode, left, top, topleft, topright)
            out[y, x] = _add_px(int(out[y, x]), pred) & 0xFFFFFFFF
    return out


def decode_vp8l(payload: bytes) -> np.ndarray:
    """Decode a raw VP8L payload (after the RIFF headers) to (h, w, 3)
    RGB or (h, w, 4) RGBA uint8."""
    if not payload or payload[0] != 0x2F:
        raise ValueError("not a VP8L stream")
    br = _LSBReader(payload[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)                          # alpha-used hint
    if br.read(3) != 0:
        raise UnsupportedMediaError("unknown VP8L version")
    px, transforms = _decode_entropy_image(br, w, h, True)
    px = _apply_inverse_transforms(px, transforms, w)
    a = ((px >> 24) & 0xFF).astype(np.uint8)
    r = ((px >> 16) & 0xFF).astype(np.uint8)
    g = ((px >> 8) & 0xFF).astype(np.uint8)
    b = (px & 0xFF).astype(np.uint8)
    if (a == 255).all():
        return np.stack([r, g, b], axis=2)
    return np.stack([r, g, b, a], axis=2)


def decode_webp(b: bytes) -> np.ndarray:
    """Decode a WebP container. Lossless (VP8L) decodes for real; lossy
    VP8 key frames route to operators/vp8.py (round 9 — see that
    module's trained-table conformance seam); extended VP8X stills
    decode canvas + ALPH + inner image; ANIMATED files (round 9)
    return the FIRST composited frame (the PIL/thumbnailer convention
    for still APIs) — the full timeline is decode_webp_anim_frames."""
    if b[:4] != b"RIFF" or b[8:12] != b"WEBP":
        raise ValueError("not a WebP")
    chunks = []
    i = 12
    while i + 8 <= len(b):
        tag = b[i:i + 4]
        size = struct.unpack("<I", b[i + 4:i + 8])[0]
        chunks.append((tag, i + 8, min(i + 8 + size, len(b))))
        i += 8 + size + (size & 1)
    tags = [t for t, _, _ in chunks]
    if b"ANMF" in tags:
        for _, _, canvas in decode_webp_anim_frames(b):
            return canvas
    if b"VP8X" in tags:
        # extended container still (r9): canvas + optional ALPH +
        # VP8/VP8L; the bare animation FLAG without frames raises
        return decode_webp_extended(b, chunks)
    for tag, p, e in chunks:
        if tag == b"VP8L":
            return decode_vp8l(b[p:e])
        if tag == b"VP8 ":
            from datapump_spark.operators.vp8 import decode_vp8
            return decode_vp8(b[p:e])
    raise ValueError("WebP container without an image chunk")


# --------------------------------------------------------------------------
# Encoder (fixtures / sink side)
# --------------------------------------------------------------------------

def _limited_lengths(freqs: dict[int, int], limit: int) -> dict[int, int]:
    """Huffman code lengths depth-limited to ``limit`` — the same
    chain-merge procedure as the JPEG encoder (T.81 K.2 shape), but
    over an arbitrary symbol set (the VP8L green alphabet exceeds the
    0..256 range jpeg._gen_optimal_table assumes)."""
    if len(freqs) == 1:
        return {next(iter(freqs)): 1}
    syms = sorted(freqs)
    n = len(syms)
    freq = [freqs[s] for s in syms]
    codesize = [0] * n
    others = [-1] * n
    while True:
        c1, best = -1, None
        for i in range(n):
            if freq[i] and (best is None or freq[i] <= best):
                best, c1 = freq[i], i
        c2, best = -1, None
        for i in range(n):
            if freq[i] and i != c1 and (best is None or freq[i] < best):
                best, c2 = freq[i], i
        if c2 < 0:
            break
        freq[c1] += freq[c2]
        freq[c2] = 0
        codesize[c1] += 1
        while others[c1] >= 0:
            c1 = others[c1]
            codesize[c1] += 1
        others[c1] = c2
        codesize[c2] += 1
        while others[c2] >= 0:
            c2 = others[c2]
            codesize[c2] += 1
    lengths = {syms[i]: codesize[i] for i in range(n)}
    if max(lengths.values()) > limit:
        # fall back to a near-flat code. A plain flat code is Kraft-
        # INCOMPLETE when the symbol count is not a power of two
        # (sum 2^-l < 1), and strict VP8L decoders (libwebp) reject
        # under-subscribed tables — so promote the (2^flat - n) most
        # frequent symbols one level to make the Kraft sum exactly 1.
        flat = max(1, (len(lengths) - 1).bit_length())
        if flat > limit:
            raise ValueError("alphabet too large for depth limit")
        by_freq = sorted(lengths, key=lambda s: (-freqs[s], s))
        k = (1 << flat) - len(lengths)
        lengths = {s: flat for s in lengths}
        if flat > 1:
            for s in by_freq[:k]:
                lengths[s] = flat - 1
    return lengths


def _write_prefix_code(bw: _LSBWriter, lengths: dict[int, int],
                       alphabet_size: int) -> dict[int, tuple[int, int]]:
    """Emit a prefix code (simple when <=2 small symbols, else the
    code-length-coded normal form with the max-symbol short-circuit)
    and return the symbol -> (code, length) map for the data pass."""
    used = sorted(s for s, ln in lengths.items() if ln > 0)
    if 1 <= len(used) <= 2 and all(s < 256 for s in used):
        bw.write(1, 1)                  # simple
        bw.write(len(used) - 1, 1)
        if used[0] <= 1:
            bw.write(0, 1)
            bw.write(used[0], 1)
        else:
            bw.write(1, 1)
            bw.write(used[0], 8)
        if len(used) == 2:
            bw.write(used[1], 8)
            return {used[0]: (0, 1), used[1]: (1, 1)}
        return {used[0]: (0, 0)}

    bw.write(0, 1)                      # normal
    seq = [lengths.get(s, 0) for s in range(max(used) + 1)]
    cl_freq: dict[int, int] = {}
    for ln in seq:
        cl_freq[ln] = cl_freq.get(ln, 0) + 1
    cl_lengths = _limited_lengths(cl_freq, 7)
    # num_code_lengths must cover every cl symbol we use (order table)
    need = {i for i, s in enumerate(_CL_ORDER) if cl_lengths.get(s, 0)}
    num_cl = max(max(need) + 1, 4)
    bw.write(num_cl - 4, 4)
    for i in range(num_cl):
        bw.write(cl_lengths.get(_CL_ORDER[i], 0), 3)
    cl_codes = _canonical_codes(cl_lengths) if len(cl_lengths) > 1 else {
        next(iter(cl_lengths)): (0, 0)}

    if len(seq) < alphabet_size:        # stop after the last nonzero
        bw.write(1, 1)
        ln_bits = 2
        while (1 << ln_bits) < len(seq) - 1:
            ln_bits += 2
        bw.write((ln_bits - 2) // 2, 3)
        bw.write(len(seq) - 2, ln_bits)
    else:
        bw.write(0, 1)
    for ln in seq:
        code, clen = cl_codes[ln]
        bw.write_code(code, clen)
    nz = {s: ln for s, ln in lengths.items() if ln}
    if len(nz) == 1:                    # decoder reads 0 bits for it
        return {next(iter(nz)): (0, 0)}
    return _canonical_codes(nz)


class _TokenStream:
    """Two-pass symbol stream: tokens are (channel, symbol) plus raw
    extra bits; pass 1 counts per-channel frequencies, pass 2 writes."""

    def __init__(self):
        self.tokens: list[tuple] = []
        self.freqs = [dict() for _ in range(5)]

    def sym(self, channel: int, symbol: int) -> None:
        self.tokens.append((channel, symbol))
        f = self.freqs[channel]
        f[symbol] = f.get(symbol, 0) + 1

    def raw(self, v: int, n: int) -> None:
        if n:
            self.tokens.append((-1, v, n))

    def write(self, bw: _LSBWriter, codes: list[dict]) -> None:
        for t in self.tokens:
            if t[0] == -1:
                bw.write(t[1], t[2])
            else:
                code, length = codes[t[0]][t[1]]
                bw.write_code(code, length)


def _tokenize_pixels(ts: _TokenStream, px: np.ndarray, tw: int,
                     cache_bits: int, lz77: bool) -> None:
    """Emit the literal/backref/cache token stream for packed ARGB
    pixels (row-major)."""
    flat = px.reshape(-1)
    n = flat.shape[0]
    cache = [0] * (1 << cache_bits) if cache_bits else None
    pos = 0
    while pos < n:
        v = int(flat[pos])
        if lz77 and pos >= 1:
            # distance-1 run (repeat previous pixel)
            run = 0
            while pos + run < n and int(flat[pos + run]) == int(
                    flat[pos + run - 1]) and run < 4096:
                run += 1
            # row-above copy via the 2D map's (0, 1) entry
            up = 0
            if run < 3 and pos >= tw:
                while pos + up < n and int(flat[pos + up]) == int(
                        flat[pos + up - tw]) and up < 4096:
                    up += 1
            if run >= 3 or up >= 3:
                length = max(run, up)
                dist_code = 121 if run >= up else 1   # plain 1 / map (0,1)
                dist = 1 if run >= up else tw
                lp, lx, ln_ = _prefix_encode(length)
                ts.sym(0, 256 + lp)
                ts.raw(lx, ln_)
                dp, dx, dn = _prefix_encode(dist_code)
                ts.sym(4, dp)
                ts.raw(dx, dn)
                if cache is not None:
                    for k in range(length):
                        a = int(flat[pos + k - dist])
                        cache[_cache_hash(a, cache_bits)] = a
                pos += length
                continue
        if cache is not None:
            idx = _cache_hash(v, cache_bits)
            if cache[idx] == v and pos > 0:
                ts.sym(0, 280 + idx)
                pos += 1
                continue
            cache[idx] = v
        ts.sym(0, (v >> 8) & 0xFF)      # green
        ts.sym(1, (v >> 16) & 0xFF)     # red
        ts.sym(2, v & 0xFF)             # blue
        ts.sym(3, (v >> 24) & 0xFF)     # alpha
        pos += 1


def _write_entropy_image(bw: _LSBWriter, px: np.ndarray, tw: int,
                         cache_bits: int = 0, lz77: bool = False,
                         level0: bool = False) -> None:
    """Write color-cache flag + prefix codes + pixel data for one
    spatially-coded image (no transforms here; the meta-prefix flag
    exists only at level 0)."""
    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)
    if level0:
        bw.write(0, 1)                  # no meta prefix image

    ts = _TokenStream()
    _tokenize_pixels(ts, px, tw, cache_bits, lz77)
    green_size = 256 + 24 + ((1 << cache_bits) if cache_bits else 0)
    sizes = [green_size, 256, 256, 256, 40]
    codes = []
    for ch in range(5):
        freqs = ts.freqs[ch] or {0: 1}  # unused alphabet: 1-symbol code
        lengths = _limited_lengths(freqs, 15)
        codes.append(_write_prefix_code(bw, lengths, sizes[ch]))
    ts.write(bw, codes)


def _pack_argb(img: np.ndarray) -> np.ndarray:
    """(h, w, 3|4) uint8 -> (h, w) packed ARGB uint32."""
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=2)
    if img.shape[2] == 3:
        a = np.full(img.shape[:2], 255, np.uint32)
    else:
        a = img[:, :, 3].astype(np.uint32)
    r, g, bl = (img[:, :, i].astype(np.uint32) for i in range(3))
    return (a << 24) | (r << 16) | (g << 8) | bl


def encode_webp_vp8l(img: np.ndarray, *, subtract_green: bool = False,
                     predictor_mode: int | None = None,
                     color_transform: tuple[int, int, int] | None = None,
                     palette: bool = False, cache_bits: int = 0,
                     lz77: bool = False) -> bytes:
    """Encode (h, w[, 3|4]) uint8 to a lossless WebP. Options pick the
    bitstream features exercised: SUBTRACT_GREEN, a single-mode
    PREDICTOR transform, a global COLOR transform (g2r, g2b, r2b),
    COLOR_INDEXING (requires <=256 distinct colors; bundles when <=16),
    a color cache, LZ77 run emission."""
    px = _pack_argb(img)
    h, w = px.shape
    if not (1 <= w <= 16384 and 1 <= h <= 16384):
        raise ValueError("VP8L dimensions out of range")

    bw = _LSBWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)                      # alpha hint (informative)
    bw.write(0, 3)                      # version

    tw = w
    if predictor_mode is not None:
        if palette or color_transform or subtract_green:
            # keep the fixture combinations that are unambiguous about
            # the width each transform operates at
            raise ValueError("predictor fixture is standalone")
        size_bits = 9                   # one block covers <=512px images
        if w > 512 or h > 512:
            raise ValueError("predictor fixture capped at 512x512")
        bw.write(1, 1)
        bw.write(0, 2)                  # PREDICTOR
        bw.write(size_bits - 2, 3)
        sub = np.array([[0xFF000000 | (predictor_mode << 8)]], np.uint32)
        _write_entropy_image(bw, sub, 1)
        px = _forward_predictor(px, predictor_mode)
    if color_transform is not None:
        if palette:
            raise ValueError("color transform fixture excludes palette")
        g2r, g2b, r2b = color_transform
        size_bits = 9
        if w > 512 or h > 512:
            raise ValueError("color fixture capped at 512x512")
        bw.write(1, 1)
        bw.write(1, 2)                  # COLOR
        bw.write(size_bits - 2, 3)
        cte = 0xFF000000 | ((r2b & 0xFF) << 16) | ((g2b & 0xFF) << 8) \
            | (g2r & 0xFF)
        _write_entropy_image(bw, np.array([[cte]], np.uint32), 1)
        px = _forward_color_transform(px, g2r, g2b, r2b)
    if subtract_green:
        bw.write(1, 1)
        bw.write(2, 2)                  # SUBTRACT_GREEN
        g = (px >> 8) & 0xFF
        r = (((px >> 16) & 0xFF) - g) & 0xFF
        b = ((px & 0xFF) - g) & 0xFF
        px = (px & 0xFF00FF00) | (r << 16) | b
    if palette:
        colors, inv = np.unique(px.reshape(-1), return_inverse=True)
        if colors.shape[0] > 256:
            raise ValueError("palette fixture needs <=256 colors")
        n_colors = colors.shape[0]
        bw.write(1, 1)
        bw.write(3, 2)                  # COLOR_INDEXING
        bw.write(n_colors - 1, 8)
        # palette written as per-channel deltas
        pal_bytes = colors.astype(np.uint32).view(np.uint8) \
            .reshape(n_colors, 4).astype(np.int32)
        deltas = np.diff(np.vstack([np.zeros((1, 4), np.int32),
                                    pal_bytes]), axis=0) & 0xFF
        pal_px = (deltas[:, 3].astype(np.uint32) << 24) | \
            (deltas[:, 2].astype(np.uint32) << 16) | \
            (deltas[:, 1].astype(np.uint32) << 8) | \
            deltas[:, 0].astype(np.uint32)
        _write_entropy_image(bw, pal_px.reshape(1, n_colors), n_colors)
        idx = inv.reshape(h, w).astype(np.uint32)
        if n_colors <= 2:
            width_bits = 3
        elif n_colors <= 4:
            width_bits = 2
        elif n_colors <= 16:
            width_bits = 1
        else:
            width_bits = 0
        if width_bits:
            per = 1 << width_bits
            bpp = 8 >> width_bits
            ptw = -(-w // per)
            packed = np.zeros((h, ptw), np.uint32)
            for sub_i in range(per):
                col = idx[:, sub_i::per]
                packed[:, :col.shape[1]] |= col << (sub_i * bpp)
            idx = packed
            tw = ptw
        px = 0xFF000000 | (idx << 8)
    bw.write(0, 1)                      # end of transforms

    _write_entropy_image(bw, px, tw, cache_bits, lz77, level0=True)
    payload = b"\x2f" + bw.data()
    vp8l = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        vp8l += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(vp8l)) + b"WEBP" + vp8l


def _forward_predictor(px: np.ndarray, mode: int) -> np.ndarray:
    h, w = px.shape
    out = px.astype(np.uint32).copy()
    # walk in reverse so residuals read already-final neighbor values
    res = np.zeros_like(out)
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = int(out[0, x - 1])
            elif x == 0:
                pred = int(out[y - 1, 0])
            else:
                left = int(out[y, x - 1])
                top = int(out[y - 1, x])
                topleft = int(out[y - 1, x - 1])
                topright = int(out[y - 1, x + 1]) if x + 1 < w \
                    else int(out[y, 0])
                pred = _predict(mode, left, top, topleft, topright)
            res[y, x] = _sub_px(int(out[y, x]), pred) & 0xFFFFFFFF
    return res


def _forward_color_transform(px: np.ndarray, g2r: int, g2b: int,
                             r2b: int) -> np.ndarray:
    h, w = px.shape
    out = px.copy()
    for y in range(h):
        for x in range(w):
            v = int(out[y, x])
            green = (v >> 8) & 0xFF
            red = (v >> 16) & 0xFF
            blue = v & 0xFF
            new_red = (red - _ctdelta(g2r & 0xFF, green)) & 0xFF
            new_blue = (blue - _ctdelta(g2b & 0xFF, green)
                        - _ctdelta(r2b & 0xFF, red)) & 0xFF
            out[y, x] = (v & 0xFF00FF00) | (new_red << 16) | new_blue
    return out


# --------------------------------------------------------------------------
# Extended container (VP8X) stills + ALPH alpha (round 9)
# --------------------------------------------------------------------------

def _unfilter_alpha(a: np.ndarray, method: int) -> np.ndarray:
    """Invert the ALPH chunk's prediction filter (container spec §
    Alpha filtering): 0 none, 1 horizontal, 2 vertical, 3 gradient.
    Boundary rule: the top-left pixel predicts 0, the rest of the top
    row predicts left, the rest of the left column predicts above."""
    if method == 0:
        return a
    out = a.astype(np.int32)
    h, w = out.shape
    if method == 1:                     # horizontal: rows cumsum; the
        out[:, 0] = np.cumsum(out[:, 0]) & 0xFF   # left col chains down
        out = np.cumsum(out, axis=1) & 0xFF
    elif method == 2:                   # vertical: top row chains right
        out[0, :] = np.cumsum(out[0, :]) & 0xFF
        out = np.cumsum(out, axis=0) & 0xFF
    elif method == 3:                   # gradient: clip makes it serial
        for y in range(h):
            for x in range(w):
                if x == 0 and y == 0:
                    pred = 0
                elif y == 0:
                    pred = out[0, x - 1]
                elif x == 0:
                    pred = out[y - 1, 0]
                else:
                    pred = min(255, max(0, int(out[y, x - 1])
                                        + int(out[y - 1, x])
                                        - int(out[y - 1, x - 1])))
                out[y, x] = (out[y, x] + pred) & 0xFF
    else:
        raise ValueError("bad ALPH filter method")
    return out.astype(np.uint8)


def _filter_alpha(a: np.ndarray, method: int) -> np.ndarray:
    """Encoder twin of _unfilter_alpha (fixture side)."""
    if method == 0:
        return a
    src = a.astype(np.int32)
    h, w = src.shape
    out = src.copy()
    for y in range(h):
        for x in range(w):
            if method == 1:
                pred = (0 if x == 0 and y == 0
                        else src[y - 1, 0] if x == 0 else src[y, x - 1])
            elif method == 2:
                pred = (0 if x == 0 and y == 0
                        else src[0, x - 1] if y == 0 else src[y - 1, x])
            else:
                if x == 0 and y == 0:
                    pred = 0
                elif y == 0:
                    pred = src[0, x - 1]
                elif x == 0:
                    pred = src[y - 1, 0]
                else:
                    pred = min(255, max(0, int(src[y, x - 1])
                                        + int(src[y - 1, x])
                                        - int(src[y - 1, x - 1])))
            out[y, x] = (src[y, x] - pred) & 0xFF
    return out.astype(np.uint8)


def decode_alph(data: bytes, w: int, h: int) -> np.ndarray:
    """Decode an ALPH chunk to (h, w) uint8 alpha. Header byte:
    bits 0-1 compression (0 raw, 1 headless VP8L), bits 2-3 filter,
    bits 4-5 preprocessing (level reduction — decode-side no-op)."""
    if not data:
        raise ValueError("empty ALPH chunk")
    comp = data[0] & 3
    filt = (data[0] >> 2) & 3
    if comp == 0:
        if len(data) - 1 < w * h:
            raise ValueError("truncated raw ALPH chunk")
        a = np.frombuffer(data, np.uint8, w * h, offset=1).reshape(h, w)
    elif comp == 1:
        # headless lossless stream: alpha travels as the GREEN channel
        br = _LSBReader(data[1:])
        px, transforms = _decode_entropy_image(br, w, h, True)
        px = _apply_inverse_transforms(px, transforms, w)
        a = ((px >> 8) & 0xFF).astype(np.uint8)
    else:
        raise UnsupportedMediaError("reserved ALPH compression method")
    return _unfilter_alpha(a, filt)


def decode_webp_extended(b: bytes, chunks: list) -> np.ndarray:
    """Decode a VP8X still (canvas header + optional ALPH + VP8/VP8L).
    Real animations route through decode_webp_anim_frames upstream
    (decode_webp); a file carrying the animation FLAG with no ANMF
    frames is contradictory and raises here."""
    tags = {t: b[p:e] for t, p, e in chunks}
    vp8x = tags[b"VP8X"]
    if len(vp8x) < 10:
        raise ValueError("truncated VP8X chunk")
    flags = vp8x[0]
    if flags & 0x02 or b"ANIM" in tags or b"ANMF" in tags:
        raise UnsupportedMediaError(
            "animated-flagged WebP without ANMF frames")
    cw = 1 + (vp8x[4] | (vp8x[5] << 8) | (vp8x[6] << 16))
    ch = 1 + (vp8x[7] | (vp8x[8] << 8) | (vp8x[9] << 16))
    if b"VP8L" in tags:
        img = decode_vp8l(tags[b"VP8L"])
    elif b"VP8 " in tags:
        from datapump_spark.operators.vp8 import decode_vp8
        img = decode_vp8(tags[b"VP8 "])
        if b"ALPH" in tags:
            a = decode_alph(tags[b"ALPH"], img.shape[1], img.shape[0])
            img = np.concatenate([img, a[:, :, None]], axis=2)
    else:
        raise UnsupportedMediaError("VP8X container without image data")
    if img.shape[:2] != (ch, cw):
        raise ValueError("VP8X canvas/frame dimension mismatch")
    return img


def encode_webp_vp8x(img: np.ndarray, *, lossless: bool = False,
                     alpha_filter: int = 0,
                     alpha_lossless: bool = False, qi: int = 4) -> bytes:
    """Encode (h, w, 3|4) uint8 as an EXTENDED (VP8X) WebP still —
    fixture twin of decode_webp_extended. RGBA + lossy picks the
    VP8 + ALPH layout (raw or headless-VP8L alpha, optional filter);
    ``lossless`` wraps a VP8L chunk instead."""
    h, w = img.shape[:2]
    has_alpha = img.ndim == 3 and img.shape[2] == 4

    def chunk(tag: bytes, body: bytes) -> bytes:
        out = tag + struct.pack("<I", len(body)) + body
        return out + (b"\x00" if len(body) & 1 else b"")

    body = b""
    flags = 0
    if lossless:
        inner = encode_webp_vp8l(img)
        at = inner.index(b"VP8L")
        size = struct.unpack("<I", inner[at + 4:at + 8])[0]
        body += chunk(b"VP8L", inner[at + 8:at + 8 + size])
        if has_alpha:
            flags |= 0x10
    else:
        from datapump_spark.operators.vp8 import encode_vp8
        if has_alpha:
            flags |= 0x10
            a = _filter_alpha(img[:, :, 3], alpha_filter)
            if alpha_lossless:
                # headless VP8L: green channel carries the alpha
                g = np.zeros((h, w, 3), np.uint8)
                g[:, :, 1] = a
                full = encode_webp_vp8l(g)
                at = full.index(b"VP8L")
                size = struct.unpack("<I", full[at + 4:at + 8])[0]
                payload = full[at + 8:at + 8 + size]
                alph = bytes([1 | (alpha_filter << 2)]) + payload[5:]
            else:
                alph = bytes([0 | (alpha_filter << 2)]) + a.tobytes()
            body += chunk(b"ALPH", alph)
        body += chunk(b"VP8 ", encode_vp8(img[:, :, :3], qi=qi))
    vp8x = (bytes([flags]) + b"\x00\x00\x00"
            + struct.pack("<I", w - 1)[:3] + struct.pack("<I", h - 1)[:3])
    body = chunk(b"VP8X", vp8x) + body
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WEBP" + body


# --------------------------------------------------------------------------
# Animated WebP (round 9): ANIM/ANMF frame walk + canvas compositing
# --------------------------------------------------------------------------

def _riff_chunks(b: bytes, i: int, end: int):
    """Yield (tag, payload_start, payload_end); bodies even-padded."""
    while i + 8 <= end:
        tag = b[i:i + 4]
        size = struct.unpack("<I", b[i + 4:i + 8])[0]
        yield tag, i + 8, min(i + 8 + size, end)
        i += 8 + size + (size & 1)


def _le24(b: bytes) -> int:
    return b[0] | (b[1] << 8) | (b[2] << 16)


def _decode_anmf_image(b: bytes, p: int, e: int) -> np.ndarray:
    """Decode the sub-chunks of one ANMF payload (optional ALPH +
    VP8/VP8L) into (h, w, 4) RGBA."""
    sub = {t: (p2, e2) for t, p2, e2 in _riff_chunks(b, p, e)}
    if b"VP8L" in sub:
        p2, e2 = sub[b"VP8L"]
        img = decode_vp8l(b[p2:e2])
    elif b"VP8 " in sub:
        from datapump_spark.operators.vp8 import decode_vp8
        p2, e2 = sub[b"VP8 "]
        img = decode_vp8(b[p2:e2])
        if b"ALPH" in sub:
            p3, e3 = sub[b"ALPH"]
            a = decode_alph(b[p3:e3], img.shape[1], img.shape[0])
            img = np.concatenate([img, a[:, :, None]], axis=2)
    else:
        raise ValueError("ANMF frame without image data")
    if img.shape[2] == 3:
        img = np.concatenate(
            [img, np.full(img.shape[:2] + (1,), 255, np.uint8)], axis=2)
    return img


def decode_webp_anim_frames(b: bytes):
    """Yield (frame_idx, ts_ms, rgba uint8 (canvas_h, canvas_w, 4))
    for every frame of an animated WebP (container spec ANIM/ANMF,
    round 9): per-frame sub-image decode (VP8L, or VP8 + ALPH),
    composited onto the canvas at the frame's (2x, 2y) offset with the
    frame's blending method (B=0 alpha-over, B=1 overwrite), then the
    disposal method applied (D=1 restores the ANIM background color
    over the frame rect). ts_ms is the cumulative display start of
    each frame. Raises ValueError on files with the animation flag but
    no ANMF frames."""
    if b[:4] != b"RIFF" or b[8:12] != b"WEBP":
        raise ValueError("not a WebP")
    chunks = list(_riff_chunks(b, 12, len(b)))
    tags = {t: (p, e) for t, p, e in chunks}
    if b"VP8X" not in tags:
        raise ValueError("animated WebP requires a VP8X header")
    p, e = tags[b"VP8X"]
    vp8x = b[p:e]
    if len(vp8x) < 10:
        raise ValueError("truncated VP8X chunk")
    cw = 1 + _le24(vp8x[4:7])
    ch = 1 + _le24(vp8x[7:10])
    if b"ANMF" not in tags:
        raise ValueError("animated WebP without ANMF frames")
    bg = (255, 255, 255, 255)
    if b"ANIM" in tags:
        p, e = tags[b"ANIM"]
        if e - p >= 4:
            ab = b[p:p + 4]                 # BGRA byte order
            bg = (ab[2], ab[1], ab[0], ab[3])
    canvas = np.empty((ch, cw, 4), np.uint8)
    canvas[:] = bg
    idx = 0
    ts = 0
    for tag, p, e in chunks:
        if tag != b"ANMF" or e - p < 16:
            continue
        hdr = b[p:p + 16]
        fx, fy = _le24(hdr[0:3]) * 2, _le24(hdr[3:6]) * 2
        fw, fh = _le24(hdr[6:9]) + 1, _le24(hdr[9:12]) + 1
        dur = _le24(hdr[12:15])
        overwrite = bool(hdr[15] & 0x02)    # B=1: do not blend
        dispose = bool(hdr[15] & 0x01)      # D=1: dispose to background
        img = _decode_anmf_image(b, p + 16, e)
        if img.shape[:2] != (fh, fw):
            raise ValueError("ANMF frame dimension mismatch")
        if fx + fw > cw or fy + fh > ch:
            raise ValueError("ANMF frame outside the canvas")
        region = canvas[fy:fy + fh, fx:fx + fw]
        if overwrite:
            region[:] = img
        else:
            # Porter-Duff 'over' in float, rounded back to uint8
            fa = img[:, :, 3:4].astype(np.float64) / 255.0
            ca = region[:, :, 3:4].astype(np.float64) / 255.0
            oa = fa + ca * (1.0 - fa)
            rgb = np.where(
                oa > 0,
                (img[:, :, :3] * fa + region[:, :, :3] * ca * (1.0 - fa))
                / np.where(oa > 0, oa, 1.0),
                0.0)
            region[:, :, :3] = np.round(rgb).astype(np.uint8)
            region[:, :, 3] = np.round(oa[:, :, 0] * 255.0).astype(np.uint8)
        yield idx, ts, canvas.copy()
        idx += 1
        ts += dur
        if dispose:
            canvas[fy:fy + fh, fx:fx + fw] = bg


def encode_webp_anim(frames, durations=None, *, offsets=None,
                     canvas_size=None, bg=(255, 255, 255, 255),
                     lossless: bool = True, blend=False, dispose=False,
                     qi: int = 4) -> bytes:
    """Encode an animated WebP — fixture/sink twin of
    decode_webp_anim_frames. ``frames`` are (h, w, 3|4) uint8 arrays;
    ``offsets`` per-frame (x, y) pairs (EVEN values — the format
    stores x/2); ``blend``/``dispose`` are bools or per-frame lists.
    ``lossless`` wraps each frame as VP8L (exact round trip), else
    lossy VP8 at ``qi``."""
    frames = list(frames)
    if not frames:
        raise ValueError("no frames")
    n = len(frames)
    durations = list(durations) if durations is not None else [100] * n
    offsets = list(offsets) if offsets is not None else [(0, 0)] * n
    blends = list(blend) if isinstance(blend, (list, tuple)) else [blend] * n
    disposes = (list(dispose) if isinstance(dispose, (list, tuple))
                else [dispose] * n)
    if canvas_size is None:
        cw = max(ox + f.shape[1] for f, (ox, oy) in zip(frames, offsets))
        ch = max(oy + f.shape[0] for f, (ox, oy) in zip(frames, offsets))
    else:
        cw, ch = canvas_size

    def chunk(tag: bytes, body: bytes) -> bytes:
        out = tag + struct.pack("<I", len(body)) + body
        return out + (b"\x00" if len(body) & 1 else b"")

    has_alpha = any(f.ndim == 3 and f.shape[2] == 4 for f in frames)
    body = chunk(b"ANIM", bytes([bg[2], bg[1], bg[0], bg[3]])
                 + struct.pack("<H", 0))
    for f, dur, (ox, oy), bl, dis in zip(frames, durations, offsets,
                                         blends, disposes):
        if ox % 2 or oy % 2:
            raise ValueError("frame offsets must be even")
        fh, fw = f.shape[:2]
        if lossless:
            full = encode_webp_vp8l(f)
            at = full.index(b"VP8L")
            size = struct.unpack("<I", full[at + 4:at + 8])[0]
            payload = chunk(b"VP8L", full[at + 8:at + 8 + size])
        else:
            from datapump_spark.operators.vp8 import encode_vp8
            payload = b""
            if f.ndim == 3 and f.shape[2] == 4:
                payload += chunk(b"ALPH", bytes([0]) + f[:, :, 3].tobytes())
                f = f[:, :, :3]
            payload += chunk(b"VP8 ", encode_vp8(f, qi=qi))
        flags = (0 if bl else 0x02) | (0x01 if dis else 0)
        hdr = ((ox // 2).to_bytes(3, "little")
               + (oy // 2).to_bytes(3, "little")
               + (fw - 1).to_bytes(3, "little")
               + (fh - 1).to_bytes(3, "little")
               + int(dur).to_bytes(3, "little") + bytes([flags]))
        body += chunk(b"ANMF", hdr + payload)
    flags = 0x02 | (0x10 if has_alpha else 0)
    vp8x = (bytes([flags]) + b"\x00\x00\x00"
            + struct.pack("<I", cw - 1)[:3] + struct.pack("<I", ch - 1)[:3])
    body = chunk(b"VP8X", vp8x) + body
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WEBP" + body
