"""Media header sniffing — REAL metadata extraction from binary columns.

The decode/resize kernels in ``operators.multimodal`` run real
pure-Python codecs these days (PNG/BMP/GIF/JPEG/WebP/TIFF/WAV/FLAC/
MP3/Vorbis and AVI/MP4/WebM frames — see each module's conformance
seam); this module is the stage BEFORE them: container *headers* are
plain structured bytes — magic numbers, fixed-offset dimension fields,
RIFF chunk tables — parsed without invoking any codec. This module parses them for real, with zero third-party
dependencies, giving pipelines trustworthy ``format/width/height/
sample_rate/channels/duration_ms`` metadata without ever invoking a codec —
the cheap first pass a 100 TB media-ingestion job runs on everything to
route, validate, and size-estimate before any expensive decode.

Two strategies, pinned equal in tests on their shared domain:

- ``strategy='expr'`` — pure Catalyst column expressions (``substring`` on
  binary + ``conv(hex(...))`` integer decoding). Whole-stage-codegen'd,
  zero Python. Covers every fixed-offset format (PNG, GIF, BMP, canonical
  WAV) and magic-only detection for the rest. This is the default scale
  path: header sniffing of a petabyte of media never leaves the JVM.
- ``strategy='pandas'`` — Arrow-batched ``mapInPandas`` running the same
  parsers in Python, plus the variable-offset formats an expression can't
  express: JPEG SOF segment scan, non-canonical WAV chunk walk, FLAC
  STREAMINFO bit fields. Use when JPEG dimensions or odd WAV layouts
  matter; still vectorized per batch, no per-row pickling.

Reference parity: the reference pipeline (datapump.py) has no media
handling at all; this implements SURVEY §7's multimodal extension with the
metadata stage real instead of stubbed.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

SNIFF_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("format", T.StringType()),
    T.StructField("kind", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("channels", T.IntegerType()),
    T.StructField("duration_ms", T.LongType()),
    T.StructField("n_bytes", T.LongType()),
])

_KIND = {
    "png": "image", "jpeg": "image", "gif": "image", "bmp": "image",
    "webp": "image", "tiff": "image",
    "wav": "audio", "flac": "audio", "ogg": "audio", "mp3": "audio",
    "mp4": "video", "mkv": "video", "avi": "video",
}

# JPEG start-of-frame markers that carry dimensions (C0-CF minus the
# non-SOF C4=DHT, C8=JPG, CC=DAC).
_SOF_MARKERS = frozenset(
    m for m in range(0xC0, 0xD0) if m not in (0xC4, 0xC8, 0xCC))


# ---------------------------------------------------------------------------
# Pure-Python parsers (the pandas kernel; also the test reference)
# ---------------------------------------------------------------------------

def _le(b: bytes) -> int:
    return int.from_bytes(b, "little")


def _be(b: bytes) -> int:
    return int.from_bytes(b, "big")


def parse_media_header(b: bytes) -> dict:
    """Parse one payload's container header. Returns dict with keys
    format/kind/width/height/sample_rate/channels/duration_ms (missing
    fields None; unrecognized payloads → format None, kind 'blob').

    Tolerant by design: truncated or corrupt headers degrade to Nones,
    never raise — at corpus scale some fraction of payloads is always
    damaged and the sniff must classify, not crash.
    """
    fmt = w = h = sr = ch = dur = None
    if b is None:
        return {"format": None, "kind": "blob", "width": None,
                "height": None, "sample_rate": None, "channels": None,
                "duration_ms": None}
    try:
        if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24:
            # IHDR is mandated first: width/height big-endian at 16/20.
            fmt, w, h = "png", _be(b[16:20]), _be(b[20:24])
        elif b[:3] == b"\xff\xd8\xff":
            fmt = "jpeg"
            # Segment scan for a SOFn marker: [FF mm] [len_be16] payload.
            i = 2
            while i + 9 < len(b) and b[i] == 0xFF:
                marker, seglen = b[i + 1], _be(b[i + 2:i + 4])
                if marker in _SOF_MARKERS:
                    h, w = _be(b[i + 5:i + 7]), _be(b[i + 7:i + 9])
                    break
                if seglen < 2:
                    break
                i += 2 + seglen
        elif b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
            fmt, w, h = "gif", _le(b[6:8]), _le(b[8:10])
        elif b[:4] in (b"II*\x00", b"MM\x00*"):
            # TIFF 6.0: dims from the first IFD (tags 256/257) — the
            # same IFD layout the EXIF walk reads inside JPEG APP1 (r9)
            fmt = "tiff"
            try:
                import struct as _st

                from datapump_spark.operators.tiff import _read_ifd
                if b[0] == 0x49:
                    u16 = lambda bb, o: _st.unpack_from("<H", bb, o)[0]
                    u32 = lambda bb, o: _st.unpack_from("<I", bb, o)[0]
                else:
                    u16 = lambda bb, o: _st.unpack_from(">H", bb, o)[0]
                    u32 = lambda bb, o: _st.unpack_from(">I", bb, o)[0]
                tags = _read_ifd(b, u32(b, 4), u16, u32)
                w = tags.get(256, [None])[0]
                h = tags.get(257, [None])[0]
            except Exception:
                pass                    # corrupt IFD: format only
        elif b[:2] == b"BM" and len(b) >= 26:
            # BITMAPINFOHEADER: signed LE32 at 18/22; negative height
            # means top-down row order — magnitude is the pixel height.
            fmt = "bmp"
            w = abs(int.from_bytes(b[18:22], "little", signed=True))
            h = abs(int.from_bytes(b[22:26], "little", signed=True))
        elif b[:4] == b"RIFF" and b[8:12] == b"WAVE":
            fmt = "wav"
            # Chunk walk (handles non-canonical layouts: LIST/fact chunks
            # before fmt/data, odd-length padding).
            i, byte_rate, data_size = 12, None, None
            while i + 8 <= len(b):
                cid, clen = b[i:i + 4], _le(b[i + 4:i + 8])
                # the guard must cover the LAST byte read (byte_rate ends
                # at i+20), else a fmt chunk truncated mid-field yields
                # zero/partial values instead of None
                if cid == b"fmt " and i + 20 <= len(b):
                    ch = _le(b[i + 10:i + 12])
                    sr = _le(b[i + 12:i + 16])
                    byte_rate = _le(b[i + 16:i + 20])
                elif cid == b"data":
                    data_size = clen
                i += 8 + clen + (clen & 1)
            if byte_rate and data_size is not None:
                dur = data_size * 1000 // byte_rate
        elif b[:4] == b"fLaC" and len(b) >= 38:
            # STREAMINFO (first metadata block, offset 8): 20-bit sample
            # rate, 3-bit channels-1, 36-bit total samples packed at 18.
            fmt = "flac"
            sr = (b[18] << 12) | (b[19] << 4) | (b[20] >> 4)
            ch = ((b[20] >> 1) & 0x7) + 1
            # total samples: 36 bits = low nibble of b[21] + be32(b[22:26])
            total = ((b[21] & 0x0F) << 32) | _be(b[22:26])
            if sr:
                dur = total * 1000 // sr
        elif b[:4] == b"OggS":
            fmt = "ogg"
            sr, ch, dur = _ogg_info(b)
        elif b[:3] == b"ID3" or (len(b) >= 2 and b[0] == 0xFF and (b[1] & 0xE0) == 0xE0):
            fmt = "mp3"
            sr, ch, dur = _mp3_info(b)
        elif b[4:8] == b"ftyp":
            fmt = "mp4"
            w, h, dur = _mp4_info(b)
        elif b[:4] == b"\x1aE\xdf\xa3":
            fmt = "mkv"
            w, h, dur = _mkv_info(b)
        elif b[:4] == b"RIFF" and b[8:12] == b"AVI ":
            fmt = "avi"
            from datapump_spark.operators.avi import avi_info
            w, h, dur, _ = avi_info(b)
        elif b[:4] == b"RIFF" and b[8:12] == b"WEBP":
            fmt = "webp"
            if b[12:16] == b"VP8L" and len(b) >= 25 and b[20] == 0x2F:
                # VP8L header: 14-bit w-1 then 14-bit h-1, LSB-first
                w = 1 + (b[21] | ((b[22] & 0x3F) << 8))
                h = 1 + ((b[22] >> 6) | (b[23] << 2)
                         | ((b[24] & 0x0F) << 10))
            elif (b[12:16] == b"VP8 " and len(b) >= 30
                    and not b[20] & 1
                    and b[23:26] == b"\x9d\x01\x2a"):
                # lossy VP8 key frame (r9): 14-bit w/h after the
                # start code, low 2 scale bits masked off
                w = (b[26] | (b[27] << 8)) & 0x3FFF
                h = (b[28] | (b[29] << 8)) & 0x3FFF
            elif b[12:16] == b"VP8X" and len(b) >= 30:
                # extended container (r9): 24-bit LE canvas w-1 / h-1
                w = 1 + (b[24] | (b[25] << 8) | (b[26] << 16))
                h = 1 + (b[27] | (b[28] << 8) | (b[29] << 16))
    except (IndexError, ValueError):
        pass
    return {"format": fmt, "kind": _KIND.get(fmt, "blob"), "width": w,
            "height": h, "sample_rate": sr, "channels": ch,
            "duration_ms": dur}


# MPEG-1/2/2.5 Layer III sample rates by version bits, and bitrates
# (kbps) by version — the overwhelming real-corpus case; Layer I/II
# headers yield Nones rather than guesses.
_MP3_SR = {3: (44100, 48000, 32000), 2: (22050, 24000, 16000),
           0: (11025, 12000, 8000)}
_MP3_BR_V1 = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
              256, 320)
_MP3_BR_V2 = (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144,
              160)


def _mp3_info(b: bytes):
    """(sample_rate, channels, duration_ms) from the first Layer III
    frame header: Xing/Info frame count when present (VBR), else a CBR
    estimate from the first frame's bitrate. r8."""
    i = 0
    if b[:3] == b"ID3" and len(b) >= 10:
        # syncsafe 28-bit tag size (+10 header, +10 optional footer)
        i = 10 + ((b[6] << 21) | (b[7] << 14) | (b[8] << 7) | b[9])
        if b[5] & 0x10:
            i += 10
    while i + 4 <= len(b):
        if b[i] == 0xFF and (b[i + 1] & 0xE0) == 0xE0:
            break
        i += 1
    else:
        return None, None, None
    h1 = b[i + 1]
    version = (h1 >> 3) & 0x3           # 3=V1, 2=V2, 0=V2.5
    layer = (h1 >> 1) & 0x3             # 1=Layer III
    if version == 1 or layer != 1:
        return None, None, None
    br_idx = b[i + 2] >> 4
    sr_idx = (b[i + 2] >> 2) & 0x3
    if sr_idx == 3 or br_idx in (0, 15):
        return None, None, None
    sr = _MP3_SR[version][sr_idx]
    bitrate = (_MP3_BR_V1 if version == 3 else _MP3_BR_V2)[br_idx] * 1000
    ch = 1 if (b[i + 3] >> 6) == 3 else 2
    spf = 1152 if version == 3 else 576
    dur = None
    # Xing/Info (VBR): after the side info block (+2 if the protection
    # bit is CLEAR — bit 0 low means a CRC-16 follows the header)
    side = (17 if ch == 1 else 32) if version == 3 else \
        (9 if ch == 1 else 17)
    x = i + 4 + side + (0 if h1 & 1 else 2)
    # VBRI (Fraunhofer VBR): FIXED offset 32 after the 4-byte header,
    # regardless of side-info size — frames u32 big-endian at +14 (r9)
    v = i + 4 + 32
    if b[x:x + 4] in (b"Xing", b"Info") and len(b) >= x + 12 \
            and b[x + 7] & 0x1:
        frames = _be(b[x + 8:x + 12])
        dur = frames * spf * 1000 // sr
    elif b[v:v + 4] == b"VBRI" and len(b) >= v + 18:
        frames = _be(b[v + 14:v + 18])
        dur = frames * spf * 1000 // sr
    elif bitrate:
        dur = (len(b) - i) * 8000 // bitrate
    return sr, ch, dur


def _ogg_info(b: bytes):
    """(sample_rate, channels, duration_ms) from an Ogg stream: the
    first page's codec ID header (Vorbis or Opus) gives rate/channels;
    the LAST page's granule position gives total samples (Opus
    granules run at 48 kHz minus the pre-skip). r8."""
    sr = ch = dur = None
    gp_rate = None
    preskip = 0
    # codec ID header: first packet after the first 28+nsegs header
    if len(b) < 28:
        return None, None, None
    nsegs = b[26]
    # first packet length from the lacing table (values < 255 end a
    # packet) — slicing a fixed 19 bytes would read past a short
    # OpusHead into the next page's bytes (ADVICE r8)
    plen = 0
    for lace in b[27:27 + nsegs]:
        plen += lace
        if lace < 255:
            break
    pkt = b[27 + nsegs:27 + nsegs + min(plen, 19)]
    if pkt[:7] == b"\x01vorbis" and len(pkt) >= 16:
        ch = pkt[11]
        sr = int.from_bytes(pkt[12:16], "little")
        gp_rate = sr
    elif pkt[:8] == b"OpusHead" and len(pkt) >= 12:
        ch = pkt[9]
        preskip = int.from_bytes(pkt[10:12], "little")
        # input-sample-rate field needs the full 4 bytes; a truncated
        # packet would otherwise yield a bogus short-slice rate
        sr = (int.from_bytes(pkt[12:16], "little")
              if len(pkt) >= 16 else 0) or 48000
        gp_rate = 48000                 # Opus granules are ALWAYS 48 kHz
    if gp_rate:
        # last page's granule position = total samples
        last = b.rfind(b"OggS")
        if last >= 0 and last + 14 <= len(b):
            gp = int.from_bytes(b[last + 6:last + 14], "little",
                                signed=True)
            if gp > 0:
                dur = max(0, gp - preskip) * 1000 // gp_rate
    return sr, ch, dur


_MP4_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"edts"}


def _mp4_boxes(b: bytes, i: int, end: int):
    """Yield (type, payload_start, payload_end) for ISO-BMFF boxes in
    b[i:end] (u32 size; size==1 → 64-bit largesize; size==0 → to
    end)."""
    while i + 8 <= end:
        size = _be(b[i:i + 4])
        typ = b[i + 4:i + 8]
        payload = i + 8
        if size == 1 and i + 16 <= end:
            size = int.from_bytes(b[i + 8:i + 16], "big")
            payload = i + 16
        elif size == 0:
            size = end - i
        if size < 8 or i + size > end:
            return
        yield typ, payload, i + size
        i += size


def _mp4_info(b: bytes):
    """(width, height, duration_ms) from the moov box: mvhd timescale/
    duration, and the max tkhd 16.16 fixed-point track dimensions
    (audio tracks carry 0x0) — pure box arithmetic, no codec. r8."""
    w = h = dur = None
    for typ, p, e in _mp4_boxes(b, 0, len(b)):
        if typ != b"moov":
            continue
        for t2, p2, e2 in _mp4_boxes(b, p, e):
            if t2 == b"mvhd" and e2 - p2 >= 20:
                ver = b[p2]
                if ver == 1:
                    if e2 - p2 < 32:    # u64 duration needs 32 bytes
                        continue        # truncated v1 box: no duration
                    scale = _be(b[p2 + 20:p2 + 24])
                    d = int.from_bytes(b[p2 + 24:p2 + 32], "big")
                else:
                    scale = _be(b[p2 + 12:p2 + 16])
                    d = _be(b[p2 + 16:p2 + 20])
                if scale:
                    dur = d * 1000 // scale
            elif t2 == b"trak":
                for t3, p3, e3 in _mp4_boxes(b, p2, e2):
                    if t3 != b"tkhd" or e3 - p3 < 8:
                        continue
                    # width/height: last 8 payload bytes, 16.16 fixed
                    tw = _be(b[e3 - 8:e3 - 6])
                    th = _be(b[e3 - 4:e3 - 2])
                    if tw and th:
                        w = max(w or 0, tw)
                        h = max(h or 0, th)
    return w, h, dur


def _ebml_varint(b: bytes, i: int, strip: bool):
    """(value, next_index) or (None, i). IDs keep the marker bit
    (conventional notation); sizes strip it. An all-ones size value
    means 'unknown' and returns -1."""
    if i >= len(b) or b[i] == 0:
        return None, i
    ln = 8 - b[i].bit_length() + 1
    if i + ln > len(b):
        return None, i
    val = b[i] if not strip else b[i] & ((1 << (8 - ln)) - 1)
    all_ones = (1 << (7 * ln)) - 1 if strip else None
    for k in range(1, ln):
        val = (val << 8) | b[i + k]
    if strip and val == all_ones:
        val = -1
    return val, i + ln


def _ebml_children(b: bytes, i: int, end: int):
    """Yield (id, payload_start, payload_end) for EBML elements."""
    while i < end:
        eid, i = _ebml_varint(b, i, strip=False)
        if eid is None:
            return
        size, i = _ebml_varint(b, i, strip=True)
        if size is None:
            return
        pe = end if size == -1 else min(i + size, end)
        yield eid, i, pe
        if size == -1:
            return                      # unknown size: runs to the end
        i = pe


def _mkv_info(b: bytes):
    """(width, height, duration_ms) from Matroska/WebM EBML: Segment →
    Info(TimestampScale, Duration) and Tracks → Video(PixelWidth/
    Height) — header arithmetic only, no codec. r8."""
    import struct as _struct
    w = h = dur = None
    for eid, p, e in _ebml_children(b, 0, len(b)):
        if eid != 0x18538067:           # Segment
            continue
        for e2, p2, q2 in _ebml_children(b, p, e):
            if e2 == 0x1549A966:        # Info
                scale, fdur = 1_000_000, None
                for e3, p3, q3 in _ebml_children(b, p2, q2):
                    if e3 == 0x2AD7B1:  # TimestampScale (ns)
                        scale = int.from_bytes(b[p3:q3], "big")
                    elif e3 == 0x4489:  # Duration (float ticks)
                        if q3 - p3 == 4:
                            fdur = _struct.unpack(">f", b[p3:q3])[0]
                        elif q3 - p3 == 8:
                            fdur = _struct.unpack(">d", b[p3:q3])[0]
                if fdur is not None and scale:
                    dur = int(fdur * scale / 1e6)
            elif e2 == 0x1654AE6B:      # Tracks
                for e3, p3, q3 in _ebml_children(b, p2, q2):
                    if e3 != 0xAE:      # TrackEntry
                        continue
                    for e4, p4, q4 in _ebml_children(b, p3, q3):
                        if e4 != 0xE0:  # Video
                            continue
                        for e5, p5, q5 in _ebml_children(b, p4, q4):
                            if e5 == 0xB0:
                                w = int.from_bytes(b[p5:q5], "big")
                            elif e5 == 0xBA:
                                h = int.from_bytes(b[p5:q5], "big")
    return w, h, dur


# ---------------------------------------------------------------------------
# Catalyst expression path (fixed-offset formats, pure codegen)
# ---------------------------------------------------------------------------

def _byte(c: str, off: int) -> str:
    """SQL for the unsigned value of the byte at 0-based ``off`` (int).

    These helpers return SQL STRINGS, composed into seven final
    ``F.expr`` calls (r12, guide §7.3 / the lsh_topk precedent): the
    previous Column-DSL construction built several hundred py4j tree
    nodes per call — ~0.9 s of pure DRIVER time per query using the
    sniffer. Identical expressions, one parse server-side; equivalence
    is pinned by test_mediasniff's expr≡pandas≡hand-built gates."""
    return f"cast(conv(hex(substring({c}, {off + 1}, 1)), 16, 10) as int)"


def _be_n(c: str, off: int, n: int) -> str:
    """SQL: big-endian unsigned int of ``n`` bytes at 0-based ``off``."""
    return (f"cast(conv(hex(substring({c}, {off + 1}, {n})), 16, 10) "
            f"as bigint)")


def _le_n(c: str, off: int, n: int) -> str:
    """SQL: little-endian unsigned int — a sum of shifted single-byte
    reads (conv/hex are big-endian only)."""
    parts = [f"cast({_byte(c, off)} as bigint)"]
    parts += [f"cast({_byte(c, off + i)} as bigint) * {1 << (8 * i)}"
              for i in range(1, n)]
    return "(" + " + ".join(parts) + ")"


def _magic(c: str, off: int, lit: bytes) -> str:
    return f"(substring({c}, {off + 1}, {len(lit)}) = x'{lit.hex()}')"


def _sniff_exprs(c: str) -> dict[str, Column]:
    """The format/dimension decoding as pure column expressions.

    JPEG dimensions need a segment scan (variable offsets) so the expr
    path detects JPEG but leaves its width/height null; everything else
    matches ``parse_media_header`` exactly on canonical files.
    """
    # length guards mirror parse_media_header's: a truncated header must
    # degrade to format=None, never to a claimed format with partial or
    # conv-of-partial-bytes dimensions
    n = f"length({c})"
    is_png = f"({_magic(c, 0, bytes.fromhex('89504e470d0a1a0a'))} AND {n} >= 24)"
    is_jpeg = _magic(c, 0, b"\xff\xd8\xff")
    is_gif = (f"(({_magic(c, 0, b'GIF87a')} OR {_magic(c, 0, b'GIF89a')}) "
              f"AND {n} >= 10)")
    is_bmp = f"({_magic(c, 0, b'BM')} AND {n} >= 26)"
    is_tiff = (f"({_magic(c, 0, b'II*' + bytes([0]))} OR "
               f"{_magic(c, 0, b'MM' + bytes([0]) + b'*')})")
    is_riff = _magic(c, 0, b"RIFF")
    is_wav = f"({is_riff} AND {_magic(c, 8, b'WAVE')})"
    is_webp = f"({is_riff} AND {_magic(c, 8, b'WEBP')})"
    # canonical AVI only (LIST hdrl with avih first, the layout every
    # muxer emits): avih body at 32 — usec/frame, frames, dims at
    # fixed offsets; non-canonical files stay the pandas kernel's job
    is_avi = (f"({is_riff} AND {_magic(c, 8, b'AVI ')} AND "
              f"{_magic(c, 12, b'LIST')} AND {_magic(c, 20, b'hdrl')} AND "
              f"{_magic(c, 24, b'avih')} AND {n} >= 72)")
    avi_usec = _le_n(c, 32, 4)
    avi_frames = _le_n(c, 48, 4)
    is_flac = f"({_magic(c, 0, b'fLaC')} AND {n} >= 38)"
    is_ogg = _magic(c, 0, b"OggS")
    is_mp3 = (f"({_magic(c, 0, b'ID3')} OR "
              f"({_byte(c, 0)} = 255 AND ({_byte(c, 1)} & 224) = 224))")
    is_mp4 = _magic(c, 4, b"ftyp")
    is_mkv = _magic(c, 0, bytes.fromhex("1a45dfa3"))

    # BMP dims are SIGNED LE32 (top-down bitmaps store negative height):
    # reinterpret the unsigned read as two's complement, then abs().
    def _le32_signed(off: int) -> str:
        u = _le_n(c, off, 4)
        return (f"abs(CASE WHEN {u} >= {1 << 31} THEN {u} - {1 << 32} "
                f"ELSE {u} END)")

    # Canonical WAV only (fmt at 12, data at 36) — the chunk walk is the
    # pandas kernel's job; non-canonical files get nulls here, never
    # wrong values.
    wav_canonical = (f"({is_wav} AND {_magic(c, 12, b'fmt ')} AND "
                     f"{_magic(c, 36, b'data')})")
    wav_byte_rate = _le_n(c, 28, 4)

    # lossless WebP (VP8L): 14-bit w-1 / h-1 packed LSB-first after the
    # 0x2F signature byte — fixed offsets, so the codegen path can read
    # them (VP8X dims stay the pandas kernel's job)
    is_vp8l = (f"({is_webp} AND {_magic(c, 12, b'VP8L')} AND {n} >= 25 "
               f"AND {_byte(c, 20)} = 47)")
    vp8l_w = (f"(cast({_byte(c, 21)} as bigint) "
              f"+ cast(({_byte(c, 22)} & 63) as bigint) * 256 + 1)")
    vp8l_h = (f"(cast(shiftright({_byte(c, 22)}, 6) as bigint) "
              f"+ cast({_byte(c, 23)} as bigint) * 4 "
              f"+ cast(({_byte(c, 24)} & 15) as bigint) * 1024 + 1)")
    # lossy WebP (VP8 key frame, r9): 14-bit w/h at fixed offsets after
    # the 3-byte start code, low 2 scale bits masked off
    is_vp8 = (f"({is_webp} AND {_magic(c, 12, b'VP8 ')} AND {n} >= 30 "
              f"AND ({_byte(c, 20)} & 1) = 0 AND "
              f"{_magic(c, 23, bytes.fromhex('9d012a'))})")
    vp8_w = f"cast(({_le_n(c, 26, 2)} & 16383) as bigint)"
    vp8_h = f"cast(({_le_n(c, 28, 2)} & 16383) as bigint)"
    # extended WebP (VP8X, r9): 24-bit LE canvas w-1 / h-1
    is_vp8x = f"({is_webp} AND {_magic(c, 12, b'VP8X')} AND {n} >= 30)"
    vp8x_w = f"cast({_le_n(c, 24, 3)} + 1 as bigint)"
    vp8x_h = f"cast({_le_n(c, 27, 3)} + 1 as bigint)"

    fmt = ("CASE"
           f" WHEN {is_png} THEN 'png'"
           f" WHEN {is_jpeg} THEN 'jpeg'"
           f" WHEN {is_gif} THEN 'gif'"
           f" WHEN {is_bmp} THEN 'bmp'"
           f" WHEN {is_wav} THEN 'wav'"
           f" WHEN {is_flac} THEN 'flac'"
           f" WHEN {is_ogg} THEN 'ogg'"
           f" WHEN {is_mp3} THEN 'mp3'"
           f" WHEN {is_mp4} THEN 'mp4'"
           f" WHEN {is_mkv} THEN 'mkv'"
           f" WHEN {is_avi} THEN 'avi'"
           f" WHEN {is_webp} THEN 'webp'"
           f" WHEN {is_tiff} THEN 'tiff'"
           " END")
    kind = ("CASE " + fmt + " "
            + " ".join(f"WHEN '{k}' THEN '{v}'" for k, v in _KIND.items())
            + " ELSE 'blob' END")
    flac_sr = (f"(cast({_byte(c, 18)} as bigint) * 4096 "
               f"+ cast({_byte(c, 19)} as bigint) * 16 "
               f"+ cast(shiftright({_byte(c, 20)}, 4) as bigint))")
    flac_total = (f"(cast(({_byte(c, 21)} & 15) as bigint) * {1 << 32} "
                  f"+ {_be_n(c, 22, 4)})")
    width = ("cast(CASE"
             f" WHEN {is_png} THEN {_be_n(c, 16, 4)}"
             f" WHEN {is_gif} THEN {_le_n(c, 6, 2)}"
             f" WHEN {is_bmp} THEN {_le32_signed(18)}"
             f" WHEN {is_vp8l} THEN {vp8l_w}"
             f" WHEN {is_vp8} THEN {vp8_w}"
             f" WHEN {is_vp8x} THEN {vp8x_w}"
             f" WHEN ({is_avi} AND {_le_n(c, 64, 4)} > 0)"
             f" THEN {_le_n(c, 64, 4)}"
             " END as int)")
    height = ("cast(CASE"
              f" WHEN {is_png} THEN {_be_n(c, 20, 4)}"
              f" WHEN {is_gif} THEN {_le_n(c, 8, 2)}"
              f" WHEN {is_bmp} THEN {_le32_signed(22)}"
              f" WHEN {is_vp8l} THEN {vp8l_h}"
              f" WHEN {is_vp8} THEN {vp8_h}"
              f" WHEN {is_vp8x} THEN {vp8x_h}"
              f" WHEN ({is_avi} AND {_le_n(c, 68, 4)} > 0)"
              f" THEN {_le_n(c, 68, 4)}"
              " END as int)")
    sample_rate = ("cast(CASE"
                   f" WHEN {wav_canonical} THEN {_le_n(c, 24, 4)}"
                   f" WHEN {is_flac} THEN {flac_sr}"
                   " END as int)")
    channels = ("cast(CASE"
                f" WHEN {wav_canonical} THEN {_le_n(c, 22, 2)}"
                f" WHEN {is_flac} THEN "
                f"((shiftright({_byte(c, 20)}, 1) & 7) + 1)"
                " END as int)")
    duration_ms = ("cast(CASE"
                   f" WHEN ({wav_canonical} AND {wav_byte_rate} > 0) THEN "
                   f"floor({_le_n(c, 40, 4)} * 1000 / {wav_byte_rate})"
                   f" WHEN ({is_flac} AND {flac_sr} > 0) THEN "
                   f"floor({flac_total} * 1000 / {flac_sr})"
                   f" WHEN ({is_avi} AND {avi_usec} > 0) THEN "
                   f"floor({avi_frames} * {avi_usec} / 1000)"
                   " END as bigint)")
    return {
        "format": F.expr(fmt),
        "kind": F.expr(kind),
        "width": F.expr(width),
        "height": F.expr(height),
        "sample_rate": F.expr(sample_rate),
        "channels": F.expr(channels),
        "duration_ms": F.expr(duration_ms),
    }


def sniff_media(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    strategy: str = "expr",
) -> DataFrame:
    """(media_id, format, kind, width, height, sample_rate, channels,
    duration_ms, n_bytes) parsed from real container headers.

    ``strategy='expr'`` (default): whole-stage-codegen column expressions —
    the JVM-side scale path; JPEG width/height come back null (variable
    segment offsets). ``strategy='pandas'``: Arrow-batched kernel with the
    full parsers (JPEG SOF scan, WAV chunk walk, FLAC bit fields).
    Both are deterministic and never raise on corrupt payloads.
    """
    if strategy == "expr":
        e = _sniff_exprs(payload_col)
        return df.select(
            F.col(id_col).cast("long").alias("media_id"),
            e["format"].alias("format"), e["kind"].alias("kind"),
            e["width"].alias("width"), e["height"].alias("height"),
            e["sample_rate"].alias("sample_rate"),
            e["channels"].alias("channels"),
            e["duration_ms"].alias("duration_ms"),
            F.length(payload_col).cast("long").alias("n_bytes"),
        )
    if strategy != "pandas":
        raise ValueError(f"strategy must be 'expr' or 'pandas': {strategy!r}")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # NULL payloads parse to blob/None (matching the expr path's
            # null semantics) — never crash the scan
            parsed = [parse_media_header(None if b is None else bytes(b))
                      for b in pdf[payload_col]]
            out = pd.DataFrame({
                "media_id": pdf[id_col].astype("int64"),
                "n_bytes": pdf[payload_col].map(
                    lambda b: None if b is None else len(b)),
            })
            for f in ("format", "kind", "width", "height", "sample_rate",
                      "channels", "duration_ms"):
                out[f] = [p[f] for p in parsed]
            return_cols = [f.name for f in SNIFF_SCHEMA.fields]
            yield out[return_cols]

    return df.select(id_col, payload_col).mapInPandas(kernel, SNIFF_SCHEMA)


def verify_media_format(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    claimed_col: str = "meta.format",
    strategy: str = "expr",
) -> DataFrame:
    """Mislabeled-media report: rows whose *claimed* format (extension /
    upstream metadata) disagrees with what the payload bytes actually are.

    At ingestion scale, extension lies are routine (renamed files, CDN
    content-type drift); this is the validation gate that catches them
    before a decoder segfaults on them. Returns (media_id, claimed,
    sniffed, n_bytes); rows where both sides are null are trusted-blob
    passthroughs and excluded. 'jpg'/'jpeg' normalize to 'jpeg'.
    """
    claimed = F.lower(F.expr(claimed_col))
    claimed = F.when(claimed == "jpg", "jpeg").otherwise(claimed)
    sniffed = sniff_media(df, payload_col, id_col, strategy=strategy)
    base = df.select(F.col(id_col).cast("long").alias("media_id"),
                     claimed.alias("claimed"))
    return (
        base.join(sniffed, "media_id")
        .where(~F.col("claimed").eqNullSafe(F.col("format")))
        .select("media_id", "claimed", F.col("format").alias("sniffed"),
                "n_bytes")
    )


# ---------------------------------------------------------------------------
# EXIF (round 8): APP1 TIFF/IFD walk — orientation, camera, timestamps.
# Pure byte arithmetic (TIFF 6.0 IFD layout inside the Exif APP1
# segment); both byte orders; the Exif sub-IFD is followed for the
# capture timestamp and pixel dimensions. A training-data pipeline
# needs orientation (dedup robustness) and provenance timestamps.
# ---------------------------------------------------------------------------

_EXIF_TAGS = {0x010F: "make", 0x0110: "model", 0x0112: "orientation",
              0x0132: "datetime"}
_EXIF_SUB_TAGS = {0x9003: "datetime_original",
                  0xA002: "pixel_x", 0xA003: "pixel_y"}


def _ifd_entries(t: bytes, off: int, bo: str):
    """Yield (tag, type, count, value_bytes_or_offset_field) for one
    IFD; value payloads >4 bytes live at the offset the field names."""
    if off + 2 > len(t):
        return
    n = int.from_bytes(t[off:off + 2], bo)
    for k in range(n):
        e = off + 2 + 12 * k
        if e + 12 > len(t):
            return
        tag = int.from_bytes(t[e:e + 2], bo)
        typ = int.from_bytes(t[e + 2:e + 4], bo)
        cnt = int.from_bytes(t[e + 4:e + 8], bo)
        yield tag, typ, cnt, t[e + 8:e + 12]


def _ifd_value(t: bytes, typ: int, cnt: int, field: bytes, bo: str):
    size = {1: 1, 2: 1, 3: 2, 4: 4}.get(typ)
    if size is None:
        return None
    total = size * cnt
    data = field[:total] if total <= 4 else None
    if data is None:
        off = int.from_bytes(field, bo)
        if off + total > len(t):
            return None
        data = t[off:off + total]
    if typ == 2:                        # ASCII, NUL-terminated
        return data.split(b"\x00")[0].decode("latin-1", "replace").strip()
    vals = [int.from_bytes(data[i * size:(i + 1) * size], bo)
            for i in range(cnt)]
    return vals[0] if cnt == 1 else vals


def parse_exif(b: bytes) -> dict:
    """EXIF tags from a JPEG's APP1 segment (or a bare TIFF buffer):
    {orientation, make, model, datetime, datetime_original, pixel_x,
    pixel_y} — keys absent when the file carries no EXIF. Never
    raises; malformed IFDs yield what parsed so far."""
    out: dict = {}
    t = None
    if b[:3] == b"\xff\xd8\xff":        # find the Exif APP1 segment
        i = 2
        while i + 4 <= len(b) and b[i] == 0xFF:
            marker = b[i + 1]
            if marker == 0xFF:          # fill byte (T.81 B.1.1.2)
                i += 1
                continue
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            if marker in (0xDA, 0xD9):
                break
            seglen = int.from_bytes(b[i + 2:i + 4], "big")
            if marker == 0xE1 and b[i + 4:i + 10] == b"Exif\x00\x00":
                t = b[i + 10:i + 2 + seglen]
                break
            i += 2 + seglen
    elif b[:2] in (b"II", b"MM"):
        t = b
    if t is None or len(t) < 8:
        return out
    bo = "little" if t[:2] == b"II" else "big"
    if int.from_bytes(t[2:4], bo) != 42:
        return out
    try:
        ifd0 = int.from_bytes(t[4:8], bo)
        sub_off = None
        for tag, typ, cnt, field in _ifd_entries(t, ifd0, bo):
            if tag in _EXIF_TAGS:
                v = _ifd_value(t, typ, cnt, field, bo)
                if v is not None:
                    out[_EXIF_TAGS[tag]] = v
            elif tag == 0x8769:         # Exif sub-IFD pointer
                sub_off = int.from_bytes(field, bo)
        if sub_off is not None:
            for tag, typ, cnt, field in _ifd_entries(t, sub_off, bo):
                if tag in _EXIF_SUB_TAGS:
                    v = _ifd_value(t, typ, cnt, field, bo)
                    if v is not None:
                        out[_EXIF_SUB_TAGS[tag]] = v
    except Exception:
        pass                            # partial EXIF: keep what parsed
    return out


def encode_exif_app1(tags: dict, byte_order: str = "little") -> bytes:
    """Build an Exif APP1 segment carrying ``tags`` (fixture/sink
    side): IFD0 with make/model/orientation/datetime and an Exif
    sub-IFD with datetime_original/pixel dims. Insert after SOI with
    :func:`inject_exif`."""
    bo = byte_order
    ii = b"II" if bo == "little" else b"MM"

    def u(v, n):
        return int(v).to_bytes(n, bo)

    # lay out: header(8) IFD0 [entries + next=0] subIFD, then string pool
    ifd0_tags = [(k, v) for k, v in (
        (0x010F, tags.get("make")), (0x0110, tags.get("model")),
        (0x0112, tags.get("orientation")),
        (0x0132, tags.get("datetime"))) if v is not None]
    sub_tags = [(k, v) for k, v in (
        (0x9003, tags.get("datetime_original")),
        (0xA002, tags.get("pixel_x")), (0xA003, tags.get("pixel_y")))
        if v is not None]
    n0 = len(ifd0_tags) + (1 if sub_tags else 0)
    ifd0_off = 8
    sub_ifd_off = ifd0_off + 2 + 12 * n0 + 4
    pool_off = sub_ifd_off + (2 + 12 * len(sub_tags) + 4 if sub_tags else 0)
    pool = bytearray()

    def entry(tag, val):
        nonlocal pool
        if isinstance(val, str):
            data = val.encode("latin-1") + b"\x00"
            if len(data) <= 4:
                return u(tag, 2) + u(2, 2) + u(len(data), 4) \
                    + data.ljust(4, b"\x00")
            off = pool_off + len(pool)
            pool += data
            return u(tag, 2) + u(2, 2) + u(len(data), 4) + u(off, 4)
        return u(tag, 2) + u(3, 2) + u(1, 4) + u(val, 2).ljust(4, b"\x00")

    body = bytearray(ii + u(42, 2) + u(ifd0_off, 4))
    body += u(n0, 2)
    for tag, val in ifd0_tags:
        body += entry(tag, val)
    if sub_tags:
        body += u(0x8769, 2) + u(4, 2) + u(1, 4) + u(sub_ifd_off, 4)
    body += u(0, 4)                     # next IFD
    if sub_tags:
        body += u(len(sub_tags), 2)
        for tag, val in sub_tags:
            body += entry(tag, val)
        body += u(0, 4)
    body += pool
    payload = b"Exif\x00\x00" + bytes(body)
    return b"\xff\xe1" + (len(payload) + 2).to_bytes(2, "big") + payload


def inject_exif(jpeg: bytes, app1: bytes) -> bytes:
    """Insert an APP1 segment right after SOI."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    return jpeg[:2] + app1 + jpeg[2:]
