"""GIF87a/GIF89a decode in pure Python + numpy.

Closes the GIF seam in :mod:`operators.codecs` for real: LZW
decompression, global/local color tables, interlacing, transparency
(composited per frame), and multi-frame animations with the three
standard disposal methods. ``decode_gif`` returns the FIRST frame as
(h, w, 3) RGB uint8 — the shape every image kernel here consumes;
``decode_gif_frames`` yields every composited frame plus its delay for
the frame-sampling path.

All formats/constants are from the published GIF89a specification.
The reference (datapump.py) has no media surface; this extends the
engine for multimodal training-data pipelines per the build charter.
"""

from __future__ import annotations

import struct

import numpy as np

from datapump_spark.operators.codecs import UnsupportedMediaError


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """GIF-variant LZW: variable code width 3..12 bits, clear/EOI codes,
    little-endian bit packing."""
    clear = 1 << min_code_size
    eoi = clear + 1

    # dictionary as a list of bytes objects; reset on clear
    def fresh():
        return [bytes([i]) for i in range(clear)] + [b"", b""]

    table = fresh()
    width = min_code_size + 1
    out = bytearray()
    acc = 0
    nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = fresh()
                width = min_code_size + 1
                prev = None
                continue
            if code == eoi:
                if len(out) < n_pixels:
                    raise ValueError(
                        "truncated GIF LZW stream: EOI before all pixels")
                return np.frombuffer(bytes(out[:n_pixels]), np.uint8)
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("corrupt GIF LZW stream")
            out += entry
            prev = entry
            if len(table) == (1 << width) and width < 12:
                width += 1
            if len(out) >= n_pixels:
                return np.frombuffer(bytes(out[:n_pixels]), np.uint8)
    if len(out) < n_pixels:
        raise ValueError("truncated GIF LZW stream: data ended before "
                         f"{n_pixels} pixels were decoded")
    return np.frombuffer(bytes(out[:n_pixels]), np.uint8)


def _interlace_order(h: int) -> np.ndarray:
    """Row order of the four GIF interlace passes — shared by encoder
    (writes rows in this order) and decoder (scatters them back)."""
    return np.concatenate([np.arange(0, h, 8), np.arange(4, h, 8),
                           np.arange(2, h, 4), np.arange(1, h, 2)])


def _deinterlace(idx: np.ndarray) -> np.ndarray:
    out = np.empty_like(idx)
    out[_interlace_order(idx.shape[0])] = idx
    return out


def _sub_blocks(b: bytes, i: int) -> tuple[bytes, int]:
    parts = []
    while True:
        n = b[i]
        i += 1
        if n == 0:
            break
        parts.append(b[i:i + n])
        i += n
    return b"".join(parts), i


def decode_gif_frames(b: bytes):
    """Yield (frame_rgb (h, w, 3) uint8, delay_ms) per composited frame."""
    if b[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    w, h, packed, bg, _ar = struct.unpack("<HHBBB", b[6:13])
    i = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(b[i:i + 3 * n], np.uint8).reshape(n, 3)
        i += 3 * n

    canvas = np.zeros((h, w, 3), np.uint8)
    if gct is not None:
        canvas[:] = gct[bg % len(gct)]
    transparent = None
    delay_ms = 0
    disposal = 0
    saved = None
    yielded = False
    while i < len(b):
        block = b[i]
        if block == 0x3B:                       # trailer
            break
        if block == 0x21:                       # extension
            label = b[i + 1]
            if label == 0xF9:                   # graphic control
                size = b[i + 2]
                flags, delay, tidx = struct.unpack(
                    "<BHB", b[i + 3:i + 3 + 4])
                transparent = tidx if flags & 0x01 else None
                delay_ms = delay * 10
                disposal = (flags >> 2) & 0x07
                i += 3 + size
                _, i = _sub_blocks(b, i)
            else:                               # comment/app/plain text
                i += 2
                _, i = _sub_blocks(b, i)
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        # image descriptor
        fx, fy, fw, fh, fpack = struct.unpack("<HHHHB", b[i + 1:i + 10])
        i += 10
        if fpack & 0x80:
            n = 2 << (fpack & 0x07)
            ct = np.frombuffer(b[i:i + 3 * n], np.uint8).reshape(n, 3)
            i += 3 * n
        else:
            if gct is None:
                raise ValueError("GIF frame without any color table")
            ct = gct
        min_code = b[i]
        i += 1
        data, i = _sub_blocks(b, i)
        idx = _lzw_decode(data, min_code, fw * fh).reshape(fh, fw)
        if fpack & 0x40:
            idx = _deinterlace(idx)

        if disposal == 3:
            saved = canvas.copy()
        region = canvas[fy:fy + fh, fx:fx + fw]
        rgb = ct[np.minimum(idx, len(ct) - 1)]
        if transparent is not None:
            mask = idx != transparent
            region[mask] = rgb[mask]
        else:
            region[:] = rgb
        yield canvas.copy(), delay_ms
        yielded = True
        if disposal == 2:                       # restore to background
            canvas[fy:fy + fh, fx:fx + fw] = (
                gct[bg % len(gct)] if gct is not None else 0)
        elif disposal == 3 and saved is not None:   # restore previous
            canvas = saved
        # a Graphic Control Extension governs only the single graphic
        # block that follows it (GIF89a §23) — reset for the next frame
        transparent = None
        delay_ms = 0
        disposal = 0
    if not yielded:
        raise ValueError("GIF contains no image data")


def decode_gif(b: bytes) -> np.ndarray:
    """First composited frame as (h, w, 3) RGB uint8."""
    for frame, _delay in decode_gif_frames(b):
        return frame
    raise ValueError("GIF contains no image data")


# --------------------------------------------------------------------------
# Encoder (fixture/sink side): palette-exact, optional animation
# --------------------------------------------------------------------------

def encode_gif(img: np.ndarray, interlace: bool = False) -> bytes:
    """Encode an (h, w, 3) uint8 image as a single-frame GIF89a. The
    image must use ≤ 256 distinct colors (exact palette — GIF is
    lossless within that constraint; raises otherwise)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w, c = img.shape
    if c != 3:
        raise ValueError("encode_gif expects (h, w, 3) RGB")
    flat = img.reshape(-1, 3)
    colors, idx = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise UnsupportedMediaError(
            f"{len(colors)} colors exceed GIF's 256-color palette")
    depth = max(1, int(len(colors) - 1).bit_length())
    n_pal = 1 << depth
    pal = np.zeros((n_pal, 3), np.uint8)
    pal[:len(colors)] = colors

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (depth - 1), 0, 0)
    out += pal.tobytes()
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h,
                       0x40 if interlace else 0)

    rows = idx.reshape(h, w)
    if interlace:
        rows = rows[_interlace_order(h)]
    out += bytes([max(2, depth)])
    out += _lzw_encode(rows.reshape(-1).astype(np.int32),
                       max(2, depth))
    out += b"\x00\x3b"
    return bytes(out)


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1

    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    prev = b""
    for v in indices:
        cur = prev + bytes([int(v)])
        if cur in table:
            prev = cur
            continue
        emit(table[prev])
        table[cur] = next_code
        next_code += 1
        if next_code > (1 << width):
            if width < 12:
                width += 1
            else:
                emit(clear)
                table = {bytes([i]): i for i in range(clear)}
                next_code = eoi + 1
                width = min_code_size + 1
        prev = bytes([int(v)])
    if prev:
        emit(table[prev])
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)

    blocks = bytearray()
    for j in range(0, len(out), 255):
        chunk = out[j:j + 255]
        blocks.append(len(chunk))
        blocks += chunk
    return bytes(blocks)
