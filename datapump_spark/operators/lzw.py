"""Unix ``compress`` (.Z) LZW decoder (round 12) — the last legacy
member of the corpus-compression dispatch (gzip/bz2/xz/zstd/lz4/br
landed earlier). Decode-only: nothing has written .Z for decades, but
old crawl dumps and mirror trees still ship ``.tar.Z``.

Format: 2-byte magic ``1F 9D``, a flags byte (low 5 bits = max code
width 9-16, bit 7 = block mode with the 256 CLEAR code), then an
LSB-first bit-packed LZW code stream with the historical ncompress
quirk: the encoder emits codes in groups of eight, so on every code
width change (and on CLEAR) the bit cursor rounds up to the next
multiple of ``8 * n_bits`` bits.

CONFORMANCE: libarchive's compress writer is in-container (``bsdtar
-cZf``) and gzip's bundled uncompress reads .Z — tests pin this
decoder byte-exact against both on foreign bsdtar-authored archives.

Reference parity note: charter extension (the reference reads loose
CSVs only).
"""

from __future__ import annotations

from datapump_spark.operators.codecs import UnsupportedMediaError

MAGIC = b"\x1f\x9d"


def decode_z(data: bytes, max_output: int = 1 << 30) -> bytes:
    """Decompress a Unix compress (.Z) stream."""
    if data[:2] != MAGIC:
        raise UnsupportedMediaError("compress: bad .Z magic")
    if len(data) < 3:
        raise UnsupportedMediaError("compress: truncated stream")
    flags = data[2]
    maxbits = flags & 0x1F
    block_mode = bool(flags & 0x80)
    if flags & 0x60:
        raise UnsupportedMediaError("compress: reserved flag bits set")
    if not 9 <= maxbits <= 16:
        raise UnsupportedMediaError(f"compress: bad max code width {maxbits}")
    buf = data[3:]
    total_bits = len(buf) * 8
    n_bits = 9
    maxcode = (1 << n_bits) - 1
    clear_code = 256 if block_mode else -1
    first_free = 257 if block_mode else 256
    next_code = first_free
    size = 1 << maxbits
    prefix = [0] * size
    suffix = bytearray(size)
    out = bytearray()
    posbits = 0
    # The encoder packs 8 codes into n_bits bytes and flushes the
    # PARTIAL group on every width change / CLEAR, so the alignment
    # anchor is the bit position of the LAST change, not stream start.
    anchor = 0
    prev = -1
    prev_first = 0
    stack = bytearray()

    def _align(pos: int) -> int:
        group = n_bits << 3
        return anchor + -(-(pos - anchor) // group) * group

    while posbits + n_bits <= total_bits:
        if next_code > maxcode and n_bits < maxbits:
            # group-alignment quirk (old width rounds), then widen
            posbits = anchor = _align(posbits)
            n_bits += 1
            maxcode = (1 << maxbits) if n_bits == maxbits \
                else (1 << n_bits) - 1
            continue
        bytepos = posbits >> 3
        chunk = int.from_bytes(buf[bytepos:bytepos + 3], "little")
        code = (chunk >> (posbits & 7)) & ((1 << n_bits) - 1)
        posbits += n_bits
        if code == clear_code:
            posbits = anchor = _align(posbits)
            n_bits = 9
            maxcode = (1 << n_bits) - 1
            next_code = first_free
            prev = -1
            continue
        if prev == -1:  # first code (or first after CLEAR): a literal
            if code > 255:
                raise UnsupportedMediaError(
                    "compress: non-literal first code")
            out.append(code)
            prev, prev_first = code, code
            continue
        incode = code
        stack.clear()
        if code >= next_code:  # KwKwK
            if code > next_code:
                raise UnsupportedMediaError("compress: code out of range")
            stack.append(prev_first)
            code = prev
        while code > 255:
            stack.append(suffix[code])
            code = prefix[code]
        stack.append(code)
        prev_first = code
        out += stack[::-1]
        if len(out) > max_output:
            raise UnsupportedMediaError(
                "compress: output exceeds decode cap")
        if next_code < size:
            prefix[next_code] = prev
            suffix[next_code] = prev_first
            next_code += 1
        prev = incode
    return bytes(out)
