"""Pure-Python Brotli decoder (RFC 7932) + authoring writer twin.

``decode_brotli`` implements the published Brotli format: the LSB-first
bit layer, stream header (window bits), metablock headers (nibble
lengths, metadata skip, uncompressed blocks), simple and complex prefix
codes (code-length code with repeat semantics and 32768-space
accounting), block switching for all three categories, literal context
modes (LSB6/MSB6/UTF8/Signed), context maps (RLE + inverse
move-to-front), insert-and-copy length codes (the 704-symbol combined
alphabet), distance codes (ring buffer short codes, direct codes,
postfix/extra-bit codes), and static-dictionary references with the
121 word transforms.

Conformance (UNLIKE the MP3/VP8/Vorbis stand-ins, this codec has an
in-container reference — the doctrine's first rule): pyarrow bundles
real libbrotli, so

- the DATA tables that are impractical to transcribe by hand (the
  122,784-byte static dictionary, the 121 transforms, the UTF8/Signed
  context lookup tables) are DERIVED from the reference coder by
  ``scripts/derive_brotli_tables.py``: it authors minimal valid
  streams with this module's writer toolkit (single-command dictionary
  references, 64-tree identity context maps whose output byte IS the
  context id) and decodes them with libbrotli, so every derived byte
  is pinned to reference behavior at derivation time;
- tests decode foreign libbrotli output (all quality levels, text and
  binary shapes) byte-exactly and run libbrotli over this module's
  authored streams (tests/test_brotli.py).

The derived tables live in ``datapump_spark/data/brotli_dict.bin.gz``
and ``datapump_spark/operators/brotli_tables.py`` (generated, with
provenance headers). Structural constants below (code tables, orders,
offsets) are the published RFC 7932 values.

Used by ``sources/http.py`` for ``Content-Encoding: br`` response
bodies in the WARC crawl path (VERDICT r11 #2). Spark shape: called
per payload inside Arrow ``mapInPandas`` kernels — pure CPU, no
driver state.

Reference parity note: the reference (datapump.py) has no crawl or
codec surface; charter extension.
"""

from __future__ import annotations

import gzip
import os

# ---------------------------------------------------------------------------
# Structural constants (RFC 7932)
# ---------------------------------------------------------------------------

# Insert/copy length codes (§5): value = offset + extra-bit value
_INSERT_BITS = (0, 0, 0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5,
                6, 7, 8, 9, 10, 12, 14, 24)
_INSERT_OFF = (0, 1, 2, 3, 4, 5, 6, 8, 10, 14, 18, 26, 34, 50, 66, 98,
               130, 194, 322, 578, 1090, 2114, 6210, 22594)
_COPY_BITS = (0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4,
              5, 5, 6, 7, 8, 9, 10, 24)
_COPY_OFF = (2, 3, 4, 5, 6, 7, 8, 9, 10, 12, 14, 18, 22, 30, 38, 54,
             70, 102, 134, 198, 326, 582, 1094, 2118)

# Combined insert-and-copy cells (§5): (insert_code_high, copy_code_high,
# implicit distance-code-0). 11 cells x 64 = the 704-symbol alphabet.
_IC_CELLS = ((0, 0, True), (0, 8, True), (0, 0, False), (0, 8, False),
             (8, 0, False), (8, 8, False), (0, 16, False),
             (16, 0, False), (8, 16, False), (16, 8, False),
             (16, 16, False))

# Block count code (§6): 26 symbols -> (extra bits, offset); every
# symbol probe-validated against libbrotli (tests/test_brotli.py —
# the first transcription had the wrong tail from symbol 17 on)
_BLOCK_LEN_BITS = (2, 2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 4, 5, 5, 5, 5,
                   6, 6, 7, 8, 9, 10, 11, 12, 13, 24)
_BLOCK_LEN_OFF = (1, 5, 9, 13, 17, 25, 33, 41, 49, 65, 81, 97,
                  113, 145, 177, 209, 241, 305, 369, 497, 753, 1265,
                  2289, 4337, 8433, 16625)

# Code-length code (§3.5): fixed prefix code read via a 4-bit peek LUT,
# symbols transmitted in this order
_CLC_LEN = (2, 2, 2, 3, 2, 2, 2, 4, 2, 2, 2, 3, 2, 2, 2, 4)
_CLC_VAL = (0, 4, 3, 2, 0, 4, 3, 1, 0, 4, 3, 2, 0, 4, 3, 5)
_CLC_ORDER = (1, 2, 3, 4, 0, 5, 17, 6, 16, 7, 8, 9, 10, 11, 12, 13,
              14, 15)

# Distance short codes (§4): (ring index offset from last, delta)
_DIST_SHORT = ((1, 0), (2, 0), (3, 0), (4, 0),
               (1, -1), (1, 1), (1, -2), (1, 2), (1, -3), (1, 3),
               (2, -1), (2, 1), (2, -2), (2, 2), (2, -3), (2, 3))

# Static dictionary geometry (§8): bits of word-id per word length
_DICT_NDBITS = (0, 0, 0, 0, 10, 10, 11, 11, 10, 10, 10, 10, 10, 9, 9,
                8, 7, 7, 8, 7, 7, 6, 6, 5, 5)

_LCAT, _ICAT, _DCAT = 0, 1, 2


class BrotliError(ValueError):
    pass


# ---------------------------------------------------------------------------
# Bit I/O (LSB-first, like DEFLATE)
# ---------------------------------------------------------------------------


class _Bits:
    __slots__ = ("buf", "pos", "nbits")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0
        self.nbits = len(buf) * 8

    def read(self, n: int) -> int:
        p = self.pos
        self.pos = p + n
        if self.pos > self.nbits:
            raise BrotliError("truncated brotli stream")
        if n == 0:
            return 0
        chunk = int.from_bytes(self.buf[p >> 3:(p + n + 7) >> 3],
                               "little")
        return (chunk >> (p & 7)) & ((1 << n) - 1)

    def peek(self, n: int) -> int:
        p = self.pos
        hi = min((p + n + 7) >> 3, len(self.buf))
        chunk = int.from_bytes(self.buf[p >> 3:hi], "little")
        return (chunk >> (p & 7)) & ((1 << n) - 1)

    def skip(self, n: int) -> None:
        self.pos += n
        if self.pos > self.nbits:
            raise BrotliError("truncated brotli stream")

    def align_byte(self) -> None:
        pad = -self.pos & 7
        if pad and self.read(pad):
            raise BrotliError("non-zero padding bits")

    def read_bytes(self, n: int) -> bytes:
        assert self.pos & 7 == 0
        start = self.pos >> 3
        if start + n > len(self.buf):
            raise BrotliError("truncated brotli stream")
        self.pos += n * 8
        return self.buf[start:start + n]


class _BW:
    """LSB-first bit writer (the authoring/twin side)."""

    __slots__ = ("bytes_", "acc", "bits")

    def __init__(self):
        self.bytes_ = bytearray()
        self.acc = 0
        self.bits = 0

    def write(self, v: int, n: int) -> None:
        self.acc |= (v & ((1 << n) - 1)) << self.bits
        self.bits += n
        while self.bits >= 8:
            self.bytes_.append(self.acc & 0xFF)
            self.acc >>= 8
            self.bits -= 8

    def align_byte(self) -> None:
        if self.bits:
            self.write(0, 8 - self.bits)

    def write_bytes(self, b: bytes) -> None:
        assert self.bits == 0
        self.bytes_ += b

    def getvalue(self) -> bytes:
        out = bytes(self.bytes_)
        if self.bits:
            out += bytes([self.acc & 0xFF])
        return out


# ---------------------------------------------------------------------------
# Prefix codes
# ---------------------------------------------------------------------------


class _Prefix:
    """Canonical prefix code: codes assigned shortest-first, within a
    length by the construction order; bits read first-bit-is-MSB (the
    DEFLATE convention). ``single`` = zero-bit one-symbol code."""

    __slots__ = ("map", "single", "lut", "lut_bits")

    def __init__(self, pairs, single=None):
        # pairs: ordered (symbol, length) with length > 0
        self.single = single
        self.map = {}
        self.lut = None
        self.lut_bits = 0
        if single is not None:
            return
        code = 0
        for ln in range(1, 16):
            for sym, l in pairs:
                if l == ln:
                    self.map[(ln, code)] = sym
                    code += 1
            code <<= 1
        # fast path: one-level LUT on the reversed (read-order) bits
        maxlen = max(l for _, l in pairs)
        if maxlen <= 10:
            self.lut_bits = maxlen
            lut = [None] * (1 << maxlen)
            for (ln, c), sym in self.map.items():
                # first-read bit = MSB of c; reader peeks LSB-first
                rev = int(format(c, f"0{ln}b")[::-1], 2)
                for fill in range(1 << (maxlen - ln)):
                    lut[rev | (fill << ln)] = (sym, ln)
            self.lut = lut

    def read(self, br: _Bits) -> int:
        if self.single is not None:
            return self.single
        if self.lut is not None:
            hit = self.lut[br.peek(self.lut_bits)]
            if hit is not None:
                br.skip(hit[1])
                return hit[0]
            raise BrotliError("invalid prefix code word")
        code = 0
        ln = 0
        while ln < 16:
            code = (code << 1) | br.read(1)
            ln += 1
            sym = self.map.get((ln, code))
            if sym is not None:
                return sym
        raise BrotliError("invalid prefix code word")

    def write(self, bw: _BW, sym: int) -> None:
        """Twin side: emit the canonical code for ``sym``."""
        if self.single is not None:
            if sym != self.single:
                raise BrotliError(f"symbol {sym} not in one-symbol code")
            return
        for (ln, code), s in self.map.items():
            if s == sym:
                for i in range(ln - 1, -1, -1):
                    bw.write((code >> i) & 1, 1)
                return
        raise BrotliError(f"symbol {sym} not in code")


def _alphabet_bits(n: int) -> int:
    b = 0
    while (1 << b) < n:
        b += 1
    return b


def _read_prefix_code(br: _Bits, alphabet_size: int) -> _Prefix:
    kind = br.read(2)
    if kind == 1:                        # simple code, 1-4 symbols
        nsym = br.read(2) + 1
        abits = _alphabet_bits(alphabet_size)
        syms = []
        for _ in range(nsym):
            s = br.read(abits)
            if s >= alphabet_size:
                raise BrotliError("simple-code symbol out of range")
            if s in syms:
                raise BrotliError("duplicate simple-code symbol")
            syms.append(s)
        if nsym == 1:
            return _Prefix(None, single=syms[0])
        if nsym == 2:
            syms.sort()
            return _Prefix([(syms[0], 1), (syms[1], 1)])
        if nsym == 3:
            if syms[2] < syms[1]:
                syms[1], syms[2] = syms[2], syms[1]
            return _Prefix([(syms[0], 1), (syms[1], 2), (syms[2], 2)])
        if br.read(1):                   # tree-select: lengths 1,2,3,3
            if syms[3] < syms[2]:
                syms[2], syms[3] = syms[3], syms[2]
            return _Prefix([(syms[0], 1), (syms[1], 2), (syms[2], 3),
                            (syms[3], 3)])
        syms.sort()
        return _Prefix([(s, 2) for s in syms])

    # complex code; kind is HSKIP (0, 2 or 3)
    clc_lengths = [0] * 18
    space = 32
    num_codes = 0
    for i in range(kind, 18):
        p = br.peek(4)
        v = _CLC_VAL[p]
        br.skip(_CLC_LEN[p])
        clc_lengths[_CLC_ORDER[i]] = v
        if v:
            space -= 32 >> v
            num_codes += 1
            if space <= 0:
                break
    if space < 0:
        raise BrotliError("over-subscribed code-length code")
    if num_codes == 0:
        raise BrotliError("empty code-length code")
    if num_codes == 1:
        only = next(s for s, l in enumerate(clc_lengths) if l)
        clc = _Prefix(None, single=only)
    elif space != 0:
        raise BrotliError("under-subscribed code-length code")
    else:
        clc = _Prefix([(s, l) for s, l in enumerate(clc_lengths) if l])

    lengths = [0] * alphabet_size
    symbol = 0
    prev_len = 8
    repeat = 0
    repeat_len = -1
    space = 32768
    while symbol < alphabet_size and space > 0:
        cl = clc.read(br)
        if cl < 16:
            lengths[symbol] = cl
            symbol += 1
            repeat = 0
            repeat_len = -1
            if cl:
                prev_len = cl
                space -= 32768 >> cl
        else:
            extra = 2 if cl == 16 else 3
            new_len = prev_len if cl == 16 else 0
            old = 0
            if repeat and repeat_len == new_len:
                old = repeat
                # consecutive same repeat codes stack with the code's
                # radix: 4 for code 16 (2 extra bits), 8 for code 17
                repeat = (repeat - 2) << extra
            else:
                repeat = 0
            repeat += br.read(extra) + 3
            n = repeat - old
            if symbol + n > alphabet_size:
                raise BrotliError("repeat past alphabet end")
            for _ in range(n):
                lengths[symbol] = new_len
                symbol += 1
            repeat_len = new_len
            if new_len:
                space -= n * (32768 >> new_len)
    if space < 0:
        raise BrotliError("over-subscribed prefix code")
    nonzero = [(s, l) for s, l in enumerate(lengths) if l]
    if space != 0:
        if len(nonzero) == 1:
            return _Prefix(None, single=nonzero[0][0])
        raise BrotliError("under-subscribed prefix code")
    if len(nonzero) == 1:
        return _Prefix(None, single=nonzero[0][0])
    return _Prefix(nonzero)


# ---------------------------------------------------------------------------
# Derived-table loading (see scripts/derive_brotli_tables.py)
# ---------------------------------------------------------------------------

_DATA_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "data")
_dict_blob: bytes | None = None
_dict_offsets: list[int] | None = None


def _load_tables():
    try:
        from datapump_spark.operators import brotli_tables as t
        return t
    except ImportError:
        raise BrotliError(
            "brotli derived tables missing — run "
            "scripts/derive_brotli_tables.py (needs pyarrow's bundled "
            "libbrotli) to generate operators/brotli_tables.py") \
            from None


def _load_dict() -> tuple[bytes, list[int]]:
    global _dict_blob, _dict_offsets
    if _dict_blob is None:
        path = os.path.join(_DATA_DIR, "brotli_dict.bin.gz")
        if not os.path.exists(path):
            raise BrotliError(
                "brotli static dictionary missing — run "
                "scripts/derive_brotli_tables.py to extract it from "
                "pyarrow's bundled libbrotli")
        with gzip.open(path, "rb") as fh:
            _dict_blob = fh.read()
        offs = [0] * 25
        pos = 0
        for ln in range(4, 25):
            offs[ln] = pos
            pos += ln << _DICT_NDBITS[ln]
        if pos != len(_dict_blob):
            raise BrotliError("brotli dictionary blob has wrong size")
        _dict_offsets = offs
    return _dict_blob, _dict_offsets


def _dict_word(length: int, word_id: int) -> bytes:
    blob, offs = _load_dict()
    start = offs[length] + length * word_id
    return blob[start:start + length]


# Transform op codes used by brotli_tables.TRANSFORMS entries
_T_IDENT, _T_UP_FIRST, _T_UP_ALL = 0, 1, 2
# omit-first N -> 10 + N, omit-last N -> 20 + N


def _uppercase_all(w: bytearray) -> bytearray:
    """RFC 7932 §8 ferment transform over the whole word (ASCII
    uppercasing with the spec's multibyte mutation)."""
    i = 0
    while i < len(w):
        c = w[i]
        if c < 0x80:
            if 0x61 <= c <= 0x7A:
                w[i] = c ^ 32
            i += 1
        elif c < 0xE0:
            if i + 1 < len(w):
                w[i + 1] ^= 32
            i += 2
        else:
            if i + 2 < len(w):
                w[i + 2] ^= 5
            i += 3
    return w


def _apply_transform(word: bytes, tid: int) -> bytes:
    t = _load_tables()
    prefix, op, suffix = t.TRANSFORMS[tid]
    w = bytearray(word)
    if 10 < op <= 19:                    # omit first N
        w = w[op - 10:]
    elif 20 < op <= 29:                  # omit last N
        w = w[:-(op - 20)] if (op - 20) < len(w) else bytearray()
    elif op == _T_UP_FIRST:
        # ferment just the first unicode scalar (§8)
        if w:
            c = w[0]
            if c < 0x80:
                if 0x61 <= c <= 0x7A:
                    w[0] = c ^ 32
            elif c < 0xE0 and len(w) > 1:
                w[1] ^= 32
            elif c >= 0xE0 and len(w) > 2:
                w[2] ^= 5
    elif op == _T_UP_ALL:
        w = _uppercase_all(w)
    return bytes(prefix) + bytes(w) + bytes(suffix)


# ---------------------------------------------------------------------------
# Context modes
# ---------------------------------------------------------------------------


def _context_fn(mode: int):
    if mode == 0:                        # LSB6
        return lambda p1, p2: p1 & 0x3F
    if mode == 1:                        # MSB6
        return lambda p1, p2: p1 >> 2
    t = _load_tables()
    if mode == 2:                        # UTF8
        l0, l1 = t.CTX_UTF8_P1, t.CTX_UTF8_P2
        return lambda p1, p2: l0[p1] | l1[p2]
    l0, l1 = t.CTX_SIGNED_P1, t.CTX_SIGNED_P2   # Signed
    return lambda p1, p2: (l0[p1] << 3) | l1[p2]


# ---------------------------------------------------------------------------
# Header pieces shared by decoder and twin
# ---------------------------------------------------------------------------


def _read_wbits(br: _Bits) -> int:
    if br.read(1) == 0:
        return 16
    n = br.read(3)
    if n:
        return 17 + n
    n = br.read(3)
    if n == 0:
        return 17
    if n == 1:
        raise BrotliError("reserved WBITS value")
    return 8 + n


def _read_varlen_u8(br: _Bits) -> int:
    """NBLTYPES / NTREES count code: 1, or 2^k + 1 + extra."""
    if br.read(1) == 0:
        return 1
    k = br.read(3)
    if k == 0:
        return 2
    return (1 << k) + 1 + br.read(k)


def _read_block_len(br: _Bits, tree: _Prefix) -> int:
    s = tree.read(br)
    return _BLOCK_LEN_OFF[s] + br.read(_BLOCK_LEN_BITS[s])


def _read_context_map(br: _Bits, size: int, ntrees: int) -> list[int]:
    rlemax = (br.read(4) + 1) if br.read(1) else 0
    tree = _read_prefix_code(br, ntrees + rlemax)
    cmap: list[int] = []
    while len(cmap) < size:
        s = tree.read(br)
        if s == 0:
            cmap.append(0)
        elif s <= rlemax:
            n = (1 << s) + br.read(s)
            if len(cmap) + n > size:
                raise BrotliError("context-map zero run overflow")
            cmap += [0] * n
        else:
            cmap.append(s - rlemax)
    if br.read(1):                       # inverse move-to-front
        mtf = list(range(256))
        for i, v in enumerate(cmap):
            val = mtf.pop(v)
            mtf.insert(0, val)
            cmap[i] = val
    if any(v >= ntrees for v in cmap):
        raise BrotliError("context-map value out of range")
    return cmap


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def decode_brotli(data: bytes, max_output: int = 1 << 31) -> bytes:
    """Decode a complete Brotli stream to bytes. Raises BrotliError on
    malformed input or streams larger than ``max_output``."""
    br = _Bits(data)
    wbits = _read_wbits(br)
    window = (1 << wbits) - 16
    out = bytearray()
    dist_rb = [16, 15, 11, 4]
    rb_idx = 0

    while True:
        islast = br.read(1)
        if islast and br.read(1):        # ISLASTEMPTY
            break
        nibbles = br.read(2)
        if nibbles == 3:                 # metadata block
            if islast:
                raise BrotliError("metadata block cannot be last")
            if br.read(1):
                raise BrotliError("reserved metadata bit set")
            skip_bytes = br.read(2)
            skip = 0
            if skip_bytes:
                skip = br.read(8 * skip_bytes)
                if skip_bytes > 1 and (skip >> (8 * (skip_bytes - 1))) == 0:
                    raise BrotliError("non-minimal metadata length")
                skip += 1
            br.align_byte()
            br.read_bytes(skip)
            continue
        mlen = br.read(16 + 4 * nibbles) + 1
        if nibbles and (mlen - 1) >> (16 + 4 * (nibbles - 1)) == 0:
            raise BrotliError("non-minimal MNIBBLES")
        if len(out) + mlen > max_output:
            raise BrotliError("output exceeds max_output")
        if not islast and br.read(1):    # ISUNCOMPRESSED
            br.align_byte()
            out += br.read_bytes(mlen)
            continue

        # --- block-switch state per category ---------------------------
        nbl = [0, 0, 0]
        btype = [0, 0, 0]
        btype_rb = [[1, 0], [1, 0], [1, 0]]
        blen = [1 << 28, 1 << 28, 1 << 28]
        type_tree: list[_Prefix | None] = [None, None, None]
        count_tree: list[_Prefix | None] = [None, None, None]
        for c in range(3):
            nbl[c] = _read_varlen_u8(br)
            if nbl[c] >= 2:
                type_tree[c] = _read_prefix_code(br, nbl[c] + 2)
                count_tree[c] = _read_prefix_code(br, 26)
                blen[c] = _read_block_len(br, count_tree[c])

        def _switch(c: int) -> None:
            s = type_tree[c].read(br)
            if s == 0:
                bt = btype_rb[c][0]
            elif s == 1:
                bt = btype_rb[c][1] + 1
            else:
                bt = s - 2
            if bt >= nbl[c]:
                bt -= nbl[c]
            btype_rb[c][0] = btype_rb[c][1]
            btype_rb[c][1] = bt
            btype[c] = bt
            blen[c] = _read_block_len(br, count_tree[c])

        npostfix = br.read(2)
        ndirect = br.read(4) << npostfix
        pmask = (1 << npostfix) - 1
        ctx_modes = [br.read(2) for _ in range(nbl[_LCAT])]
        ctx_fns = [_context_fn(m) for m in ctx_modes]

        ntrees_l = _read_varlen_u8(br)
        cmap_l = ([0] * (64 * nbl[_LCAT]) if ntrees_l == 1 else
                  _read_context_map(br, 64 * nbl[_LCAT], ntrees_l))
        ntrees_d = _read_varlen_u8(br)
        cmap_d = ([0] * (4 * nbl[_DCAT]) if ntrees_d == 1 else
                  _read_context_map(br, 4 * nbl[_DCAT], ntrees_d))

        lit_trees = [_read_prefix_code(br, 256) for _ in range(ntrees_l)]
        ic_trees = [_read_prefix_code(br, 704)
                    for _ in range(nbl[_ICAT])]
        dist_alpha = 16 + ndirect + (48 << npostfix)
        dist_trees = [_read_prefix_code(br, dist_alpha)
                      for _ in range(ntrees_d)]

        # --- command loop ----------------------------------------------
        while mlen > 0:
            if blen[_ICAT] == 0:
                _switch(_ICAT)
            blen[_ICAT] -= 1
            cmd = ic_trees[btype[_ICAT]].read(br)
            ih, ch, d0 = _IC_CELLS[cmd >> 6]
            icode = ih | ((cmd >> 3) & 7)
            ccode = ch | (cmd & 7)
            insert_len = _INSERT_OFF[icode] + br.read(_INSERT_BITS[icode])
            copy_len = _COPY_OFF[ccode] + br.read(_COPY_BITS[ccode])

            for _ in range(insert_len):
                if mlen == 0:
                    raise BrotliError("insert past metablock end")
                if blen[_LCAT] == 0:
                    _switch(_LCAT)
                blen[_LCAT] -= 1
                lb = btype[_LCAT]
                p1 = out[-1] if out else 0
                p2 = out[-2] if len(out) >= 2 else 0
                cid = ctx_fns[lb](p1, p2)
                lit = lit_trees[cmap_l[(lb << 6) | cid]].read(br)
                out.append(lit)
                mlen -= 1
            if mlen == 0:
                break                    # copy part of last command unused

            dcode = 0
            if d0:
                distance = dist_rb[(rb_idx - 1) & 3]
            else:
                if blen[_DCAT] == 0:
                    _switch(_DCAT)
                blen[_DCAT] -= 1
                cid = min(copy_len, 5) - 2
                dcode = dist_trees[
                    cmap_d[(btype[_DCAT] << 2) | cid]].read(br)
                if dcode == 0:
                    distance = dist_rb[(rb_idx - 1) & 3]
                elif dcode < 16:
                    ioff, delta = _DIST_SHORT[dcode]
                    distance = dist_rb[(rb_idx - ioff) & 3] + delta
                    if distance <= 0:
                        raise BrotliError("non-positive short distance")
                elif dcode < 16 + ndirect:
                    distance = dcode - 15
                else:
                    x = dcode - ndirect - 16
                    hcode = x >> npostfix
                    lcode = x & pmask
                    nbits = 1 + (x >> (npostfix + 1))
                    offset = ((2 + (hcode & 1)) << nbits) - 4
                    distance = (((offset + br.read(nbits)) << npostfix)
                                + lcode + ndirect + 1)

            max_dist = min(len(out), window)
            if distance <= max_dist:
                # only real back-references enter the ring buffer —
                # not code 0 and not dictionary references (pinned
                # against libbrotli: a dict ref followed by a short
                # code must resolve against the PRE-dict-ref buffer)
                if dcode != 0:
                    dist_rb[rb_idx & 3] = distance
                    rb_idx += 1
                if copy_len > mlen:
                    raise BrotliError("copy past metablock end")
                start = len(out) - distance
                for i in range(copy_len):   # overlap-safe byte copy
                    out.append(out[start + i])
                mlen -= copy_len
            else:
                if not 4 <= copy_len <= 24:
                    raise BrotliError("dictionary copy length out of range")
                address = distance - max_dist - 1
                ndbits = _DICT_NDBITS[copy_len]
                word_id = address & ((1 << ndbits) - 1)
                tid = address >> ndbits
                if tid >= 121:
                    raise BrotliError("transform id out of range")
                word = _apply_transform(_dict_word(copy_len, word_id), tid)
                if len(word) > mlen:
                    raise BrotliError("dictionary word past metablock end")
                out += word
                mlen -= len(word)

        if islast:
            break
    return bytes(out)


# ---------------------------------------------------------------------------
# Writer twin: a correct (ratio-1) encoder for round trips and fixtures
# ---------------------------------------------------------------------------


def encode_brotli(data: bytes, wbits: int = 22) -> bytes:
    """Emit a valid Brotli stream for ``data`` using uncompressed
    metablocks (capped at the format's 2^24 metablock limit) — the
    writer-twin half of the doctrine; the authored-stream toolkit below
    exercises the compressed paths."""
    bw = _BW()
    _w_wbits(bw, wbits)
    pos = 0
    while pos < len(data):
        chunk = data[pos:pos + (1 << 24)]
        pos += len(chunk)
        bw.write(0, 1)                   # ISLAST = 0
        _w_mlen(bw, len(chunk))
        bw.write(1, 1)                   # ISUNCOMPRESSED
        bw.align_byte()
        bw.write_bytes(chunk)
    bw.write(1, 1)                       # ISLAST
    bw.write(1, 1)                       # ISLASTEMPTY
    return bw.getvalue()


def _w_wbits(bw: _BW, wbits: int) -> None:
    if wbits == 16:
        bw.write(0, 1)
    elif 18 <= wbits <= 24:
        bw.write(1, 1)
        bw.write(wbits - 17, 3)
    elif wbits == 17:
        bw.write(1, 1)
        bw.write(0, 6)
    elif 10 <= wbits <= 15:
        bw.write(1, 1)
        bw.write(0, 3)
        bw.write(wbits - 8, 3)
    else:
        raise BrotliError(f"unencodable WBITS {wbits}")


def _w_mlen(bw: _BW, mlen: int) -> None:
    v = mlen - 1
    nibbles = 4
    while nibbles < 6 and v >> (4 * nibbles):
        nibbles += 1
    bw.write(nibbles - 4, 2)
    bw.write(v, 4 * nibbles)


def _w_clc_len(bw: _BW, v: int) -> None:
    """Write one code-length-code length with the fixed code."""
    pat = {0: (0, 2), 4: (1, 2), 3: (2, 2), 2: (3, 3), 1: (7, 4),
           5: (15, 4)}[v]
    bw.write(pat[0], pat[1])


def _w_flat_code(bw: _BW, k: int) -> _Prefix:
    """Author a complex prefix code giving ALL 2^k symbols length k
    (single-symbol code-length code => zero-bit main reads fill the
    32768 space exactly). Returns the decoder-equivalent code."""
    bw.write(0, 2)                       # complex, HSKIP 0
    for sym in _CLC_ORDER:
        _w_clc_len(bw, 1 if sym == k else 0)
    return _Prefix([(s, k) for s in range(1 << k)])


def _w_simple_code(bw: _BW, alphabet_size: int, syms: list[int],
                   flat4: bool = True) -> _Prefix:
    """Author a simple prefix code over 1-4 symbols; returns the
    decoder-equivalent code for writing symbols."""
    bw.write(1, 2)
    nsym = len(syms)
    bw.write(nsym - 1, 2)
    abits = _alphabet_bits(alphabet_size)
    for s in syms:
        bw.write(s, abits)
    order = list(syms)
    if nsym == 1:
        return _Prefix(None, single=order[0])
    if nsym == 2:
        order.sort()
        return _Prefix([(order[0], 1), (order[1], 1)])
    if nsym == 3:
        if order[2] < order[1]:
            order[1], order[2] = order[2], order[1]
        return _Prefix([(order[0], 1), (order[1], 2), (order[2], 2)])
    if flat4:
        bw.write(0, 1)
        order.sort()
        return _Prefix([(s, 2) for s in order])
    bw.write(1, 1)
    if order[3] < order[2]:
        order[2], order[3] = order[3], order[2]
    return _Prefix([(order[0], 1), (order[1], 2), (order[2], 3),
                    (order[3], 3)])


def _ic_symbol(insert_len: int, copy_len: int, d0: bool = False):
    """(symbol, insert extra (val, bits), copy extra (val, bits)) for an
    insert-and-copy pair; picks the smallest codes that fit."""
    def code(off, bits, v):
        c = max(i for i in range(24) if off[i] <= v)
        return c, v - off[c], bits[c]

    ic, ie, ib = code(_INSERT_OFF, _INSERT_BITS, insert_len)
    cc, ce, cb = code(_COPY_OFF, _COPY_BITS, copy_len)
    for cell, (ih, ch, cd0) in enumerate(_IC_CELLS):
        if cd0 != d0:
            continue
        if ic - ih in range(8) and cc - ch in range(8) \
                and ic >= ih and cc >= ch:
            sym = (cell << 6) | ((ic - ih) << 3) | (cc - ch)
            return sym, (ie, ib), (ce, cb)
    raise BrotliError("no IC cell fits")


def _dist_symbol(distance: int, npostfix: int = 0, ndirect: int = 0):
    """(dcode, extra value, extra bits) encoding an explicit distance
    with no ring-buffer reference."""
    if distance <= ndirect:
        return 16 + distance - 1, 0, 0
    x = distance - ndirect - 1
    pmask = (1 << npostfix) - 1
    lcode = x & pmask
    hi = x >> npostfix
    nbits = 1
    while True:
        for hparity in (0, 1):
            offset = ((2 + hparity) << nbits) - 4
            extra = hi - offset
            if 0 <= extra < (1 << nbits):
                hcode = ((nbits - 1) << 1) | hparity
                dcode = 16 + ndirect + ((hcode << npostfix) | lcode)
                return dcode, extra, nbits
        nbits += 1
        if nbits > 24:
            raise BrotliError("distance too large to encode")


# ---------------------------------------------------------------------------
# Authoring toolkit: construct arbitrary valid compressed streams.
# Powers scripts/derive_brotli_tables.py (tables pinned to libbrotli)
# and the foreign-fixture tests.
# ---------------------------------------------------------------------------


def _complete_lengths(symbols: list[int]) -> dict[int, int]:
    """Assign code lengths to ``symbols`` forming a COMPLETE prefix code
    (Kraft sum exactly 1): v symbols get length L-1 and u get L where
    u + 2v = 2^L."""
    m = len(symbols)
    if m == 1:
        return {symbols[0]: 0}           # caller emits a 1-symbol code
    L = _alphabet_bits(m)
    v = (1 << L) - m
    u = m - v
    out = {}
    for i, s in enumerate(sorted(symbols)):
        out[s] = L if i < u else L - 1
    # canonical order note: lengths are assigned per symbol; the
    # decoder sorts by (length, construction order) — _Prefix built
    # from the same dict round-trips.
    return out


class _LenWriter:
    """Writes a complex prefix code: first the code-length code (over
    the clc values this code needs), then the run-length-coded length
    sequence. Returns the decoder-equivalent _Prefix."""

    def __init__(self, lengths: dict[int, int], alphabet_size: int):
        self.lengths = lengths
        self.alphabet_size = alphabet_size

    def write(self, bw: _BW) -> _Prefix:
        lengths = self.lengths
        used_vals = sorted({l for l in lengths.values()})
        items = sorted(lengths.items())
        if len(items) == 1:
            # one-symbol code: simple form is smaller and always valid
            return _w_simple_code(bw, self.alphabet_size,
                                  [items[0][0]])
        # which clc symbols do we need? gaps of 1-2 (and 17-chain
        # breaks) take literal zeros; gaps >= 3 take 17-runs
        gaps = [items[0][0]] + [b[0] - a[0] - 1
                                for a, b in zip(items, items[1:])]
        clc_syms = set(used_vals)
        if any(g > 0 for g in gaps):
            clc_syms.add(0)
        if any(g >= 3 for g in gaps):
            clc_syms.add(17)
        clc_syms = sorted(clc_syms)
        clc_lens = _complete_lengths(clc_syms)
        bw.write(0, 2)                   # complex, HSKIP 0
        space = 32
        single = len(clc_syms) == 1
        for sym in _CLC_ORDER:
            v = clc_lens.get(sym, 0)
            _w_clc_len(bw, v if not single else (1 if sym in clc_lens
                                                 else 0))
            if not single and v:
                space -= 32 >> v
                if space == 0:
                    break
        if single:
            clc = _Prefix(None, single=clc_syms[0])
        else:
            if space != 0:
                raise BrotliError("authored clc not complete")
            clc = _Prefix([(s, l) for s, l in sorted(clc_lens.items())])

        def emit(v):
            clc.write(bw, v)

        pos = 0
        space = 32768
        for s, l in items:
            gap = s - pos
            # zero run (17-codes stack; break chains with literal 0)
            while gap >= 3:
                c = 3 + min(7, gap - 3)
                emit(17)
                bw.write(c - 3, 3)
                cur = c
                while True:
                    lo = ((cur - 2) << 3) + 3
                    if gap >= lo:
                        e = min(7, gap - lo)
                        emit(17)
                        bw.write(e, 3)
                        cur = lo + e
                    else:
                        break
                gap -= cur
                if gap > 0:
                    emit(0)
                    gap -= 1
            for _ in range(gap):
                emit(0)
            emit(l)
            pos = s + 1
            space -= 32768 >> l
        if space != 0:
            raise BrotliError("authored code not complete")
        return _Prefix(items)


def _w_lengths_code(bw: _BW, lengths: dict[int, int],
                    alphabet_size: int) -> _Prefix:
    return _LenWriter(lengths, alphabet_size).write(bw)


def _w_varlen_u8(bw: _BW, v: int) -> None:
    if v == 1:
        bw.write(0, 1)
        return
    bw.write(1, 1)
    k = 0
    while (1 << (k + 1)) + 1 <= v and k < 7:
        k += 1
    if v == 2:
        bw.write(0, 3)
        return
    bw.write(k, 3)
    bw.write(v - (1 << k) - 1, k)


def author_stream(metablocks: list[dict], wbits: int = 22) -> bytes:
    """Author a complete Brotli stream from explicit metablock specs —
    the derivation/fixture side of the twin. Each spec:

    - ``uncompressed``: bytes (raw metablock), OR
    - ``commands``: list of ``(insert_bytes, copy_len, distance)``
      where ``distance`` is an explicit int, ``0`` for implicit
      distance-code-0 (the d0 IC cells), or ``-1`` for explicit
      distance code 0 (last distance, via the code stream);
      plus optional keys ``ctx_mode`` (default 0 = LSB6),
      ``ntrees_l``/``cmap_l`` (context map over 64 contexts),
      ``lit_tree_syms`` (list per tree of literal byte sets).

    MLEN is derived from inserts + copies (dictionary copy lengths are
    the caller's problem: pass ``mlen`` explicitly when transforms
    change the output length). A final empty ISLAST block terminates.
    """
    bw = _BW()
    _w_wbits(bw, wbits)
    for mb in metablocks:
        if "uncompressed" in mb:
            data = mb["uncompressed"]
            bw.write(0, 1)
            _w_mlen(bw, len(data))
            bw.write(1, 1)
            bw.align_byte()
            bw.write_bytes(data)
            continue
        cmds = mb["commands"]
        mlen = mb.get("mlen")
        if mlen is None:
            mlen = sum(len(i) + c for i, c, _ in cmds)
        bw.write(0, 1)                   # never last (empty block ends)
        _w_mlen(bw, mlen)
        bw.write(0, 1)                   # compressed
        for _ in range(3):
            bw.write(0, 1)               # one block type per category
        bw.write(0, 2)                   # NPOSTFIX 0
        bw.write(0, 4)                   # NDIRECT 0
        bw.write(mb.get("ctx_mode", 0), 2)
        ntrees_l = mb.get("ntrees_l", 1)
        _w_varlen_u8(bw, ntrees_l)
        if ntrees_l > 1:
            cmap = mb["cmap_l"]
            bw.write(0, 1)               # RLE off
            cmap_code = _w_lengths_code(
                bw, _complete_lengths(sorted(set(cmap))), ntrees_l)
            for v in cmap:
                cmap_code.write(bw, v)
            bw.write(0, 1)               # no IMTF
        _w_varlen_u8(bw, 1)              # NTREESD = 1

        # literal trees
        lit_sets = mb.get("lit_tree_syms")
        if lit_sets is None:
            lits = sorted({b for i, _, _ in cmds for b in i}) or [0]
            lit_sets = [lits]
        lit_codes = []
        for syms in lit_sets:
            if len(syms) == 1:
                lit_codes.append(_w_simple_code(bw, 256, list(syms)))
            else:
                lit_codes.append(_w_lengths_code(
                    bw, _complete_lengths(sorted(syms)), 256))

        # IC tree over the used symbols
        ic_specs = []
        for ins, cpy, dist in cmds:
            # a trailing insert-only command still carries a copy code
            # but it is never consumed — don't demand a d0 cell for it
            d0 = dist == 0 and cpy > 0
            ic_specs.append(_ic_symbol(len(ins), cpy if cpy else 2, d0))
        ic_syms = sorted({s for s, _, _ in ic_specs})
        if len(ic_syms) == 1:
            ic_code = _w_simple_code(bw, 704, ic_syms)
        else:
            ic_code = _w_lengths_code(
                bw, _complete_lengths(ic_syms), 704)

        # distance tree over the used codes
        d_specs = {}
        for ins, cpy, dist in cmds:
            if dist > 0:
                d_specs[dist] = _dist_symbol(dist)
        used_d = sorted({v[0] for v in d_specs.values()}
                        | ({0} if any(d == -1 for _, _, d in cmds)
                           else set())) or [0]
        if len(used_d) == 1:
            d_code = _w_simple_code(bw, 64, used_d)
        else:
            d_code = _w_lengths_code(
                bw, _complete_lengths(used_d), 64)

        # command stream
        out_count = 0
        for (ins, cpy, dist), (sym, (ie, ib), (ce, cb)) in zip(cmds,
                                                               ic_specs):
            ic_code.write(bw, sym)
            bw.write(ie, ib)
            bw.write(ce, cb)
            for b in ins:
                if ntrees_l > 1:
                    # context-dependent tree choice: only well-defined
                    # when every tree is a zero-bit single-symbol code
                    # (the derivation probes) — nothing to write then
                    if any(c.single is None for c in lit_codes):
                        raise BrotliError(
                            "authoring literals under multi-bit "
                            "multi-tree maps is context-dependent")
                else:
                    lit_codes[0].write(bw, b)
            out_count += len(ins)
            if out_count >= mlen:
                continue                 # copy part unused
            if dist == 0:
                out_count += cpy
                continue
            if dist == -1:
                d_code.write(bw, 0)
            else:
                dc, de, db = d_specs[dist]
                d_code.write(bw, dc)
                bw.write(de, db)
            out_count += cpy
    bw.write(1, 1)                       # ISLAST
    bw.write(1, 1)                       # ISLASTEMPTY
    return bw.getvalue()
