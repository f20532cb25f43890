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

Round 10 adds TILED layouts (tags 322-325, edge-cropped tiles,
per-tile predictor restart), PLANAR configuration 2 (one sample
plane per strip/tile sequence) for both layouts, and CCITT G4 fax
strips (compression 4 via operators/ccitt.py; photometric-0 ink
mapping; uncompressed-mode extension, FillOrder 2, tiled G4 and G3
refused). JPEG-in-TIFF (compression 7, TIFF Tech Note 2) DECODES as
of r11 — per-strip/tile JPEG streams, optionally abbreviated against
a shared JPEGTables tag 347 — and the twin writes it (quality +
jpeg_tables knobs); old-style compression 6 stays refused with
UnsupportedMediaError
(honest seams, recorded in COVERAGE.md). The IFD walk shares the TIFF 6.0 layout the
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
    tiled = 322 in tags or 323 in tags
    planar = tags.get(284, [1])[0]
    if planar not in (1, 2):
        raise UnsupportedMediaError(f"TIFF planar config {planar}")
    comp = tags.get(259, [1])[0]
    if comp not in (1, 4, 5, 7, 8, 32946, 32773):
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
    pred = tags.get(317, [1])[0]
    if depth == 1 and (tiled or planar == 2) and spp != 1:
        raise UnsupportedMediaError("1-bit multi-sample tiled/planar TIFF")

    if comp == 4:                        # CCITT G4 fax (r10)
        from datapump_spark.operators.ccitt import ccitt_g4_decode
        if depth != 1 or spp != 1:
            raise UnsupportedMediaError("G4 TIFF must be 1-bit 1-sample")
        if tiled:
            raise UnsupportedMediaError("tiled G4 TIFF unsupported")
        if tags.get(293, [0])[0] & 0x02:
            raise UnsupportedMediaError(
                "G4 uncompressed-mode extension unsupported")
        if tags.get(266, [1])[0] != 1:
            raise UnsupportedMediaError("G4 FillOrder 2 unsupported")
        offsets = tags.get(273)
        counts = tags.get(279)
        if not offsets or not counts or len(offsets) != len(counts):
            raise ValueError("TIFF without a consistent strip table")
        rows_per = tags.get(278, [h])[0] or h
        rows = []
        for si, (off, cnt) in enumerate(zip(offsets, counts)):
            strip = b[off:off + cnt]
            if len(strip) < cnt:
                raise ValueError("truncated TIFF strip")
            nrows = min(rows_per, h - si * rows_per)
            rows.append(ccitt_g4_decode(strip, w, nrows))
        ink = np.concatenate(rows, axis=0)
        # photometric 0 (the fax standard): ink is dark on white
        return ((1 - ink) * 255 if photo == 0 else ink * 255) \
            .astype(np.uint8)

    if comp == 7:                        # new-style JPEG (r11, TTN2)
        if depth != 8 or planar != 1:
            raise UnsupportedMediaError(
                "JPEG-in-TIFF wants 8-bit chunky samples")
        from datapump_spark.operators.jpeg import decode_jpeg
        tables = bytes(tags.get(347, []))
        mid = b""
        if tables[:2] == b"\xff\xd8":
            mid = tables[2:]
            if mid[-2:] == b"\xff\xd9":
                mid = mid[:-2]

        def jpeg_chunk(chunk: bytes) -> np.ndarray:
            if chunk[:2] != b"\xff\xd8":
                raise ValueError("JPEG-in-TIFF chunk without SOI")
            img = decode_jpeg(b"\xff\xd8" + mid + chunk[2:])
            return img

        if tiled:
            tw = tags.get(322, [0])[0]
            tl = tags.get(323, [0])[0]
            offsets, counts = tags.get(324), tags.get(325)
            if not tw or not tl or not offsets or not counts:
                raise ValueError("tiled TIFF without a tile table")
            across = -(-w // tw)
            out = np.zeros((-(-h // tl) * tl, across * tw, spp),
                           np.uint8)
            for ti, (off, cnt) in enumerate(zip(offsets, counts)):
                block = jpeg_chunk(b[off:off + cnt])
                ty, tx = (ti // across) * tl, (ti % across) * tw
                out[ty:ty + tl, tx:tx + tw] = block[:tl, :tw] \
                    .reshape(tl, tw, -1)[:, :, :spp]
        else:
            offsets, counts = tags.get(273), tags.get(279)
            if not offsets or not counts \
                    or len(offsets) != len(counts):
                raise ValueError("TIFF without a consistent strip table")
            rows_per = tags.get(278, [h])[0] or h
            out = np.zeros((len(offsets) * rows_per, w, spp), np.uint8)
            for si, (off, cnt) in enumerate(zip(offsets, counts)):
                block = jpeg_chunk(b[off:off + cnt])
                nrows = min(rows_per, h - si * rows_per)
                out[si * rows_per:si * rows_per + nrows, :w] = \
                    block[:nrows, :w].reshape(nrows, -1,
                                              block.shape[-1]
                                              if block.ndim == 3
                                              else 1)[:, :w, :spp]
        out = out[:h, :w]
        return out[:, :, 0] if spp == 1 else out

    def decompress(chunk: bytes) -> bytes:
        if comp == 5:
            from datapump_spark.operators.pdftext import lzw_decode
            return lzw_decode(chunk)
        if comp in (8, 32946):
            return zlib.decompress(chunk)
        if comp == 32773:
            return _packbits_decode(chunk)
        return chunk

    # samples per chunk-row: chunky carries all samples interleaved,
    # planar config 2 carries ONE sample plane per strip/tile sequence
    ch_spp = spp if planar == 1 else 1
    n_planes = 1 if planar == 1 else spp

    if tiled:                            # r10: tile assembly
        tw = tags.get(322, [0])[0]
        tl = tags.get(323, [0])[0]
        offsets = tags.get(324)
        counts = tags.get(325)
        if not tw or not tl or not offsets or not counts \
                or len(offsets) != len(counts):
            raise ValueError("tiled TIFF without a consistent tile table")
        across = -(-w // tw)
        down = -(-h // tl)
        per_plane = across * down
        if len(offsets) < per_plane * n_planes:
            raise ValueError("TIFF tile table shorter than the grid")
        tile_row_bytes = (tw * ch_spp * depth + 7) // 8
        out = np.zeros((h, w, spp), np.uint8) if depth == 8 else \
            np.zeros((h, w), np.uint8)
        for p in range(n_planes):
            for ti in range(per_plane):
                off, cnt = offsets[p * per_plane + ti], \
                    counts[p * per_plane + ti]
                chunk = b[off:off + cnt]
                if len(chunk) < cnt:
                    raise ValueError("truncated TIFF tile")
                data = decompress(chunk)
                if len(data) < tl * tile_row_bytes:
                    raise ValueError("TIFF tile shorter than its rows")
                ty, tx = (ti // across) * tl, (ti % across) * tw
                ny, nx = min(tl, h - ty), min(tw, w - tx)
                if depth == 1:
                    bits = np.unpackbits(
                        np.frombuffer(data[:tl * tile_row_bytes],
                                      np.uint8).reshape(tl, -1),
                        axis=1)[:ny, :nx]
                    out[ty:ty + ny, tx:tx + nx] = bits * 255
                    continue
                px = np.frombuffer(data[:tl * tile_row_bytes], np.uint8) \
                    .reshape(tl, tw, ch_spp)
                if pred == 2:
                    px = np.cumsum(px.astype(np.int64),
                                   axis=1).astype(np.uint8)
                elif pred != 1:
                    raise UnsupportedMediaError(
                        f"TIFF predictor {pred} unsupported")
                if planar == 1:
                    out[ty:ty + ny, tx:tx + nx] = px[:ny, :nx]
                else:
                    out[ty:ty + ny, tx:tx + nx, p] = px[:ny, :nx, 0]
        if depth == 1:
            if photo == 0:
                out = 255 - out
            return out
        px = out
    else:
        offsets = tags.get(273)
        counts = tags.get(279)
        if not offsets or not counts or len(offsets) != len(counts):
            raise ValueError("TIFF without a consistent strip table")
        rows_per = tags.get(278, [h])[0] or h
        per_plane = -(-h // rows_per)
        if planar == 2 and len(offsets) < per_plane * spp:
            raise ValueError("planar TIFF strip table shorter than "
                             "planes x strips")
        row_bytes = (w * ch_spp * depth + 7) // 8
        planes = []
        for p in range(n_planes):
            raw = bytearray()
            for si in range(per_plane if planar == 2 else len(offsets)):
                idx = p * per_plane + si if planar == 2 else si
                off, cnt = offsets[idx], counts[idx]
                strip = b[off:off + cnt]
                if len(strip) < cnt:
                    raise ValueError("truncated TIFF strip")
                strip = decompress(strip)
                nrows = min(rows_per, h - si * rows_per)
                if len(strip) < nrows * row_bytes:
                    raise ValueError("TIFF strip shorter than its rows")
                raw += strip[:nrows * row_bytes]
            planes.append(bytes(raw))

        if depth == 1:
            bits = np.unpackbits(
                np.frombuffer(planes[0], np.uint8).reshape(h, row_bytes),
                axis=1)[:, :w]
            px = (bits * 255).astype(np.uint8)
            if photo == 0:                   # WhiteIsZero
                px = 255 - px
            return px
        if planar == 1:
            px = np.frombuffer(planes[0], np.uint8).reshape(h, w, spp)
        else:                            # r10: recombine sample planes
            px = np.stack([np.frombuffer(pl, np.uint8).reshape(h, w)
                           for pl in planes], axis=2)
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


def _assemble_tiff(entries, strips, big_endian: bool,
                   off_tag: int = 273, cnt_tag: int = 279) -> bytes:
    """Shared writer back end: header(8) + IFD + chunk data + long
    tag values, with chunk offsets/byte-counts appended to entries."""
    e = ">" if big_endian else "<"
    n = len(entries) + 2
    ifd_at = 8
    data_at = ifd_at + 2 + 12 * n + 4
    strip_offs = []
    pos = data_at
    for st in strips:
        strip_offs.append(pos)
        pos += len(st)
    extra_at = pos                       # long tag values after chunks
    long_vals = b""

    def val_bytes(typ, cnt, vals):
        nonlocal long_vals, extra_at
        if typ in (1, 7):                # byte-valued tags (JPEGTables)
            packed = bytes(vals)
        else:
            fmt = {3: "H", 4: "I"}[typ]
            packed = b"".join(struct.pack(e + fmt, v) for v in vals)
        if len(packed) <= 4:
            return packed.ljust(4, b"\x00")
        at = extra_at
        long_vals += packed
        extra_at += len(packed)
        return struct.pack(e + "I", at)

    entries = list(entries)
    entries.append((off_tag, 4, len(strips), strip_offs))
    entries.append((cnt_tag, 4, len(strips), [len(st) for st in strips]))
    entries.sort(key=lambda t: t[0])
    ifd = struct.pack(e + "H", n)
    for tag, typ, cnt, vals in entries:
        ifd += struct.pack(e + "HHI", tag, typ, cnt)
        ifd += val_bytes(typ, cnt, vals)
    ifd += struct.pack(e + "I", 0)       # no next IFD
    header = (b"MM\x00*" if big_endian else b"II*\x00") \
        + struct.pack(e + "I", ifd_at)
    return header + ifd + b"".join(strips) + long_vals


def encode_tiff(img: np.ndarray, compression: str = "none", *,
                big_endian: bool = False, rows_per_strip: int = 8,
                predictor: bool = False, planar: bool = False,
                tile: tuple[int, int] | None = None,
                quality: int = 95, jpeg_tables: bool = False) -> bytes:
    """Encode (h, w[, c]) uint8 as a baseline TIFF — fixture/sink twin
    of decode_tiff. ``compression``: none / lzw / deflate / packbits;
    ``predictor`` applies horizontal differencing (lzw/deflate only,
    tag 317=2). r10: ``planar=True`` writes planar configuration 2
    (one sample plane per strip/tile sequence); ``tile=(tw, tl)``
    writes a tiled layout (tags 322-325; dimensions must be multiples
    of 16 per the spec) instead of strips."""
    img = np.ascontiguousarray(img, np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, spp = img.shape
    if spp not in (1, 3, 4):
        raise ValueError("encode_tiff supports 1/3/4 channels")
    e = ">" if big_endian else "<"
    comp_id = {"none": 1, "lzw": 5, "deflate": 8,
               "packbits": 32773, "g4": 4, "jpeg": 7}[compression]
    if comp_id == 7:                     # new-style JPEG (r11, TTN2)
        from datapump_spark.operators.jpeg import encode_jpeg
        if spp == 4 or planar or tile is not None:
            raise ValueError("jpeg TIFF wants chunky 1/3-channel "
                             "strips")

        def strip_jpeg(rows: np.ndarray) -> bytes:
            src = rows[:, :, 0] if spp == 1 else rows
            return encode_jpeg(src, quality=quality, subsampling="444")

        strips = [strip_jpeg(img[y0:y0 + rows_per_strip])
                  for y0 in range(0, h, rows_per_strip)]
        entries = [(256, 3, 1, [w]), (257, 3, 1, [h]),
                   (258, 3, spp, [8] * spp), (259, 3, 1, [7]),
                   (262, 3, 1, [1 if spp == 1 else 6]),
                   (277, 3, 1, [spp]),
                   (278, 3, 1, [rows_per_strip])]
        if jpeg_tables:
            # abbreviated streams: DQT/DHT segments move to tag 347
            def split(stream: bytes):
                tables, rest = bytearray(b"\xff\xd8"), bytearray(
                    b"\xff\xd8")
                i = 2
                while i + 4 <= len(stream):
                    if stream[i] != 0xFF:
                        rest += stream[i:]
                        break
                    marker = stream[i + 1]
                    if marker == 0xD9:
                        break
                    if marker == 0xDA:           # SOS: rest follows
                        rest += stream[i:-2] if stream[-2:] \
                            == b"\xff\xd9" else stream[i:]
                        break
                    seglen = struct.unpack(">H",
                                           stream[i + 2:i + 4])[0]
                    seg = stream[i:i + 2 + seglen]
                    (tables if marker in (0xDB, 0xC4)
                     else rest).extend(seg)
                    i += 2 + seglen
                tables += b"\xff\xd9"
                rest += b"\xff\xd9"
                return bytes(tables), bytes(rest)

            tbl0, first = split(strips[0])
            strips = [first] + [split(st)[1] for st in strips[1:]]
            entries.append((347, 7, len(tbl0), list(tbl0)))
        return _assemble_tiff(entries, strips, big_endian)
    if comp_id == 4:
        from datapump_spark.operators.ccitt import ccitt_g4_encode
        if spp != 1 or tile is not None or planar:
            raise ValueError("g4 wants a 2-D bilevel image, strips only")
        # photometric 0: dark pixels are ink
        ink = (img[:, :, 0] < 128).astype(np.uint8)
        strips = []
        for y0 in range(0, h, rows_per_strip):
            strips.append(ccitt_g4_encode(ink[y0:y0 + rows_per_strip]))
        entries = [(256, 3, 1, [w]), (257, 3, 1, [h]),
                   (258, 3, 1, [1]), (259, 3, 1, [4]),
                   (262, 3, 1, [0]), (266, 3, 1, [1]),
                   (277, 3, 1, [1]), (278, 3, 1, [rows_per_strip]),
                   (293, 4, 1, [0])]
        return _assemble_tiff(entries, strips, big_endian)
    if predictor and compression not in ("lzw", "deflate"):
        raise ValueError("predictor needs lzw or deflate")

    if tile is not None and (tile[0] % 16 or tile[1] % 16):
        raise ValueError("TIFF tile dimensions must be multiples of 16")

    def pack(data: bytes) -> bytes:
        if comp_id == 5:
            from datapump_spark.operators.pdftext import lzw_encode
            return lzw_encode(data)
        if comp_id == 8:
            return zlib.compress(data)
        if comp_id == 32773:
            return _packbits_encode(data)
        return data

    def hdiff(a: np.ndarray) -> np.ndarray:
        d = a.astype(np.int16)
        d[:, 1:] = d[:, 1:] - d[:, :-1]
        return (d & 0xFF).astype(np.uint8)

    strips = []
    if tile is not None:
        tw, tl = tile
        plane_arrs = ([img[:, :, p:p + 1] for p in range(spp)] if planar
                      else [img])
        for arr in plane_arrs:
            padded = np.zeros((-(-h // tl) * tl, -(-w // tw) * tw,
                               arr.shape[2]), np.uint8)
            padded[:h, :w] = arr
            for ty in range(0, padded.shape[0], tl):
                for tx in range(0, padded.shape[1], tw):
                    block = padded[ty:ty + tl, tx:tx + tw]
                    if predictor:
                        # differencing restarts per TILE (the decoder
                        # cumsums within each tile independently)
                        block = hdiff(block)
                    strips.append(pack(block.tobytes()))
    else:
        src = hdiff(img) if predictor else img
        plane_arrs = ([src[:, :, p:p + 1] for p in range(spp)] if planar
                      else [src])
        for arr in plane_arrs:
            for y0 in range(0, h, rows_per_strip):
                strips.append(pack(arr[y0:y0 + rows_per_strip].tobytes()))

    entries = []                         # (tag, type, count, value(s))
    photo = 1 if spp == 1 else 2
    entries.append((256, 3, 1, [w]))
    entries.append((257, 3, 1, [h]))
    entries.append((258, 3, spp, [8] * spp))
    entries.append((259, 3, 1, [comp_id]))
    entries.append((262, 3, 1, [photo]))
    entries.append((277, 3, 1, [spp]))
    if tile is None:
        entries.append((278, 3, 1, [rows_per_strip]))
    else:
        entries.append((322, 3, 1, [tile[0]]))
        entries.append((323, 3, 1, [tile[1]]))
    if planar:
        entries.append((284, 3, 1, [2]))
    if spp == 4:
        entries.append((338, 3, 1, [2]))      # unassociated alpha
    if predictor:
        entries.append((317, 3, 1, [2]))
    off_tag, cnt_tag = (324, 325) if tile is not None else (273, 279)
    return _assemble_tiff(entries, strips, big_endian, off_tag, cnt_tag)
