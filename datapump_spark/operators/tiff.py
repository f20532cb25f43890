"""Baseline TIFF decode/encode in pure Python + numpy (round 9).

TIFF is the scan/archival format a document pipeline meets right after
PDF (faxes, scanned books, page images inside institutional dumps).
This implements TIFF 6.0 baseline + the two ubiquitous extensions:

- header/IFD walk in both byte orders (II little / MM big);
- strips (StripOffsets / StripByteCounts / RowsPerStrip);
- Compression 1 (none), 5 (LZW — the TIFF variant already implemented
  for PDF /LZWDecode in operators/pdftext.py, MSB-first 9->12-bit
  codes with early change), 8/32946 (Deflate), 32773 (PackBits);
- Predictor 2 (horizontal differencing, the standard LZW/Deflate
  companion);
- PhotometricInterpretation 0/1 (bilevel+gray, incl. 1-bit), 2 (RGB,
  with an optional unassociated alpha ExtraSample), 3 (palette via
  the 16-bit ColorMap).

Tiled TIFFs, planar configuration 2, CCITT fax and JPEG-in-TIFF
compressions are refused with UnsupportedMediaError (honest seams,
recorded in COVERAGE.md). The IFD walk shares the TIFF 6.0 layout the
EXIF parser (operators/mediasniff.parse_exif) already walks inside
JPEG APP1 segments.

Reference parity note: the reference (datapump.py) has no image
surface; charter extension.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from datapump_spark.operators.codecs import UnsupportedMediaError


def _packbits_decode(b: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(b):
        n = b[i]
        i += 1
        if n < 128:                      # literal run of n+1 bytes
            out += b[i:i + n + 1]
            i += n + 1
        elif n > 128:                    # repeat next byte 257-n times
            if i < len(b):
                out += b[i:i + 1] * (257 - n)
                i += 1
        # n == 128: no-op
    return bytes(out)


def _packbits_encode(b: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(b):
        # find a repeat run of >= 3
        j = i
        while j + 1 < len(b) and b[j + 1] == b[j] and j - i < 127:
            j += 1
        if j - i >= 2:
            out += bytes([257 - (j - i + 1), b[i]])
            i = j + 1
            continue
        # literal run until the next >=3 repeat
        j = i
        while j < len(b) and j - i < 127:
            if j + 2 < len(b) and b[j + 1] == b[j] and b[j + 2] == b[j]:
                break
            j += 1
        # clamp at EOF: the loop can exit with j == len(b), where a
        # count of j-i would declare one more literal byte than is
        # emitted — spec-conformant PackBits decoders (libtiff) reject
        # such a strip (ADVICE r9)
        lit = b[i:min(j + 1, len(b))]
        out += bytes([len(lit) - 1]) + lit
        i += len(lit)
    return bytes(out)


def _read_ifd(b: bytes, off: int, u16, u32) -> dict[int, list[int]]:
    """TIFF 6.0 IFD: count + 12-byte entries (tag, type, n, value).
    Values wider than 4 bytes live at the entry's offset."""
    sizes = {1: 1, 2: 1, 3: 2, 4: 4, 6: 1, 7: 1}
    if off + 2 > len(b):
        raise ValueError("truncated TIFF: IFD offset past EOF")
    n = u16(b, off)
    tags: dict[int, list[int]] = {}
    for i in range(n):
        e = off + 2 + 12 * i
        if e + 12 > len(b):
            raise ValueError("truncated TIFF: IFD entry past EOF")
        tag, typ = u16(b, e), u16(b, e + 2)
        cnt = u32(b, e + 4)
        if typ not in sizes:
            continue                     # rationals etc.: not needed
        width = sizes[typ]
        total = width * cnt
        at = e + 8 if total <= 4 else u32(b, e + 8)
        if at + total > len(b):
            raise ValueError("truncated TIFF: tag value past EOF")
        rd = u16 if width == 2 else (u32 if width == 4 else
                                     lambda bb, o: bb[o])
        tags[tag] = [rd(b, at + width * k) for k in range(cnt)]
    return tags


def decode_tiff(b: bytes) -> np.ndarray:
    """Decode the first IFD of a baseline TIFF into (h, w[, c]) uint8.
    Gray returns 2-D; RGB/RGBA 3-D — the same contract as decode_png."""
    if b[:4] == b"II*\x00":
        u16 = lambda bb, o: struct.unpack_from("<H", bb, o)[0]  # noqa: E731
        u32 = lambda bb, o: struct.unpack_from("<I", bb, o)[0]  # noqa: E731
    elif b[:4] == b"MM\x00*":
        u16 = lambda bb, o: struct.unpack_from(">H", bb, o)[0]  # noqa: E731
        u32 = lambda bb, o: struct.unpack_from(">I", bb, o)[0]  # noqa: E731
    else:
        raise ValueError("not a TIFF")
    tags = _read_ifd(b, u32(b, 4), u16, u32)
    if 322 in tags or 323 in tags:
        raise UnsupportedMediaError("tiled TIFF unsupported (strips only)")
    if tags.get(284, [1])[0] != 1:
        raise UnsupportedMediaError("planar TIFF unsupported")
    comp = tags.get(259, [1])[0]
    if comp not in (1, 5, 8, 32946, 32773):
        raise UnsupportedMediaError(f"TIFF compression {comp} unsupported")
    w = tags.get(256, [0])[0]
    h = tags.get(257, [0])[0]
    if not w or not h:
        raise ValueError("TIFF without dimensions")
    spp = tags.get(277, [1])[0]
    bps = tags.get(258, [1] * spp)
    if any(x != bps[0] for x in bps) or bps[0] not in (1, 8):
        raise UnsupportedMediaError(f"TIFF bits-per-sample {bps} "
                                    "unsupported (1 or 8)")
    depth = bps[0]
    photo = tags.get(262, [1])[0]
    offsets = tags.get(273)
    counts = tags.get(279)
    if not offsets or not counts or len(offsets) != len(counts):
        raise ValueError("TIFF without a consistent strip table")
    rows_per = tags.get(278, [h])[0] or h
    pred = tags.get(317, [1])[0]

    row_bytes = (w * spp * depth + 7) // 8
    raw = bytearray()
    for si, (off, cnt) in enumerate(zip(offsets, counts)):
        strip = b[off:off + cnt]
        if len(strip) < cnt:
            raise ValueError("truncated TIFF strip")
        if comp == 5:
            from datapump_spark.operators.pdftext import lzw_decode
            strip = lzw_decode(strip)
        elif comp in (8, 32946):
            strip = zlib.decompress(strip)
        elif comp == 32773:
            strip = _packbits_decode(strip)
        nrows = min(rows_per, h - si * rows_per)
        if len(strip) < nrows * row_bytes:
            raise ValueError("TIFF strip shorter than its rows")
        raw += strip[:nrows * row_bytes]

    if depth == 1:
        bits = np.unpackbits(
            np.frombuffer(bytes(raw), np.uint8).reshape(h, row_bytes),
            axis=1)[:, :w]
        px = (bits * 255).astype(np.uint8)
        if photo == 0:                   # WhiteIsZero
            px = 255 - px
        return px
    px = np.frombuffer(bytes(raw), np.uint8).reshape(h, w, spp)
    if pred == 2:
        px = np.cumsum(px.astype(np.int64), axis=1).astype(np.uint8)
    elif pred != 1:
        raise UnsupportedMediaError(f"TIFF predictor {pred} unsupported")
    if photo == 3:                       # palette: 16-bit ColorMap
        cmap = tags.get(320)
        if not cmap or len(cmap) < 3 * 256 or spp != 1:
            raise ValueError("palette TIFF without a full ColorMap")
        lut = (np.array(cmap[:3 * 256], np.uint16)
               .reshape(3, 256).T >> 8).astype(np.uint8)
        return lut[px[:, :, 0]]
    if photo == 0:                       # inverted gray
        px = 255 - px
    if spp == 1:
        return px[:, :, 0]
    if spp in (3, 4):
        return np.ascontiguousarray(px)
    raise UnsupportedMediaError(f"TIFF samples-per-pixel {spp} unsupported")


def encode_tiff(img: np.ndarray, compression: str = "none", *,
                big_endian: bool = False, rows_per_strip: int = 8,
                predictor: bool = False) -> bytes:
    """Encode (h, w[, c]) uint8 as a strip-based baseline TIFF —
    fixture/sink twin of decode_tiff. ``compression``: none / lzw /
    deflate / packbits; ``predictor`` applies horizontal differencing
    (lzw/deflate only, tag 317=2)."""
    img = np.ascontiguousarray(img, np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, spp = img.shape
    if spp not in (1, 3, 4):
        raise ValueError("encode_tiff supports 1/3/4 channels")
    e = ">" if big_endian else "<"
    comp_id = {"none": 1, "lzw": 5, "deflate": 8,
               "packbits": 32773}[compression]
    if predictor and compression not in ("lzw", "deflate"):
        raise ValueError("predictor needs lzw or deflate")

    src = img
    if predictor:
        d = src.astype(np.int16)
        d[:, 1:] = d[:, 1:] - d[:, :-1]
        src = (d & 0xFF).astype(np.uint8)
    strips = []
    for y0 in range(0, h, rows_per_strip):
        data = src[y0:y0 + rows_per_strip].tobytes()
        if comp_id == 5:
            from datapump_spark.operators.pdftext import lzw_encode
            data = lzw_encode(data)
        elif comp_id == 8:
            data = zlib.compress(data)
        elif comp_id == 32773:
            data = _packbits_encode(data)
        strips.append(data)

    entries = []                         # (tag, type, count, value(s))
    photo = 1 if spp == 1 else 2
    entries.append((256, 3, 1, [w]))
    entries.append((257, 3, 1, [h]))
    entries.append((258, 3, spp, [8] * spp))
    entries.append((259, 3, 1, [comp_id]))
    entries.append((262, 3, 1, [photo]))
    entries.append((277, 3, 1, [spp]))
    entries.append((278, 3, 1, [rows_per_strip]))
    if spp == 4:
        entries.append((338, 3, 1, [2]))      # unassociated alpha
    if predictor:
        entries.append((317, 3, 1, [2]))
    # layout: header(8) IFD strips... values...
    n = len(entries) + 2                 # + StripOffsets, StripByteCounts
    ifd_at = 8
    ifd_size = 2 + 12 * n + 4
    data_at = ifd_at + ifd_size
    strip_offs = []
    pos = data_at
    for s in strips:
        strip_offs.append(pos)
        pos += len(s)
    extra_at = pos                       # long tag values go after strips

    long_vals = b""

    def val_bytes(typ, cnt, vals):
        nonlocal long_vals, extra_at
        fmt = {3: "H", 4: "I"}[typ]
        width = {3: 2, 4: 4}[typ]
        packed = b"".join(struct.pack(e + fmt, v) for v in vals)
        if len(packed) <= 4:
            return packed.ljust(4, b"\x00")
        at = extra_at
        long_vals += packed
        extra_at += len(packed)
        return struct.pack(e + "I", at)

    entries.append((273, 4, len(strips), strip_offs))
    entries.append((279, 4, len(strips), [len(s) for s in strips]))
    entries.sort(key=lambda t: t[0])
    ifd = struct.pack(e + "H", n)
    for tag, typ, cnt, vals in entries:
        ifd += struct.pack(e + "HHI", tag, typ, cnt)
        ifd += val_bytes(typ, cnt, vals)
    ifd += struct.pack(e + "I", 0)       # no next IFD
    header = (b"MM\x00*" if big_endian else b"II*\x00") \
        + struct.pack(e + "I", ifd_at)
    return header + ifd + b"".join(strips) + long_vals
