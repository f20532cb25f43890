"""Audio tag/metadata extraction (round 11) — the audio sibling of
the EXIF path: provenance fields for crawled audio without decoding a
sample.

Formats (all public specs):
- ID3v2.3 / v2.4 (id3.org): syncsafe tag size, per-frame headers
  (v2.3 plain / v2.4 syncsafe sizes), the four text encodings
  (Latin-1, UTF-16 w/ BOM, UTF-16BE, UTF-8), the standard text frames
  (TIT2/TPE1/TALB/TRCK/TCON, TYER v2.3 / TDRC v2.4); compressed or
  encrypted frames are skipped, not garbled.
- FLAC VORBIS_COMMENT blocks (RFC 9639 §8.6 carrying the Vorbis
  comment structure).
- Ogg Vorbis comment headers (Vorbis I §5: the \\x03vorbis packet)
  and FLAC-in-Ogg metadata packets.
- WAV LIST/INFO chunks (INAM/IART/IPRD/ICRD/IGNR).

Writer twins: ``encode_id3v2`` (both versions, all four encodings),
``add_flac_comments`` (splices a VORBIS_COMMENT block after
STREAMINFO), and ``encode_vorbis(comments=...)`` in operators/vorbis.

Reference parity note: the reference has no audio surface; charter
extension (mirrors the r8 EXIF provenance path).
"""

from __future__ import annotations

import struct

_TAG_KEYS = ("title", "artist", "album", "date", "track", "genre")
_ID3_MAP = {"TIT2": "title", "TPE1": "artist", "TALB": "album",
            "TDRC": "date", "TYER": "date", "TRCK": "track",
            "TCON": "genre"}
_VC_MAP = {"TITLE": "title", "ARTIST": "artist", "ALBUM": "album",
           "DATE": "date", "TRACKNUMBER": "track", "GENRE": "genre"}
_WAV_MAP = {b"INAM": "title", b"IART": "artist", b"IPRD": "album",
            b"ICRD": "date", b"IGNR": "genre", b"ITRK": "track"}


def _syncsafe(b: bytes) -> int:
    return ((b[0] & 0x7F) << 21) | ((b[1] & 0x7F) << 14) \
        | ((b[2] & 0x7F) << 7) | (b[3] & 0x7F)


def _id3_text(data: bytes) -> str:
    if not data:
        return ""
    enc = data[0]
    body = data[1:]
    if enc == 0:
        s = body.decode("latin-1", "replace")
    elif enc == 1:
        s = body.decode("utf-16", "replace")
    elif enc == 2:
        s = body.decode("utf-16-be", "replace")
    elif enc == 3:
        s = body.decode("utf-8", "replace")
    else:
        return ""
    return s.split("\x00")[0].strip()


def _parse_id3v2(b: bytes) -> dict:
    if b[:3] != b"ID3" or len(b) < 10:
        return {}
    ver = b[3]                           # major; b[4] is the revision
    flags = b[5]
    size = _syncsafe(b[6:10])
    i = 10
    if flags & 0x40:                     # extended header
        ext = (_syncsafe(b[10:14]) if ver >= 4
               else struct.unpack(">I", b[10:14])[0] + 4)
        i += ext
    end = min(10 + size, len(b))
    out: dict = {"format": f"id3v2.{ver}"}
    while i + 10 <= end:
        fid = b[i:i + 4]
        if fid == b"\x00\x00\x00\x00":
            break
        fsize = (_syncsafe(b[i + 4:i + 8]) if ver >= 4
                 else struct.unpack(">I", b[i + 4:i + 8])[0])
        fflags = struct.unpack(">H", b[i + 8:i + 10])[0]
        data = b[i + 10:i + 10 + fsize]
        i += 10 + fsize
        # Compressed/encrypted frames: skip. v2.4 puts the format flags
        # at 0x0008/0x0004; v2.3 uses 0x0080/0x0040.
        skip_mask = 0x00C0 if ver == 3 else 0x000C
        if fflags & skip_mask:
            continue
        key = _ID3_MAP.get(fid.decode("latin-1", "replace"))
        if key and key not in out:
            out[key] = _id3_text(data)
    return out


def _parse_vorbis_comment(data: bytes, fmt: str) -> dict:
    out: dict = {"format": fmt}
    if len(data) < 8:
        return out
    vlen = struct.unpack("<I", data[:4])[0]
    out["vendor"] = data[4:4 + vlen].decode("utf-8", "replace")
    i = 4 + vlen
    if i + 4 > len(data):
        return out
    count = struct.unpack("<I", data[i:i + 4])[0]
    i += 4
    for _ in range(count):
        if i + 4 > len(data):
            break
        clen = struct.unpack("<I", data[i:i + 4])[0]
        i += 4
        item = data[i:i + clen].decode("utf-8", "replace")
        i += clen
        if "=" in item:
            k, v = item.split("=", 1)
            key = _VC_MAP.get(k.upper())
            if key and key not in out:
                out[key] = v
    return out


def _flac_comment_block(b: bytes) -> bytes | None:
    i = 4
    while i + 4 <= len(b):
        hdr = b[i]
        size = int.from_bytes(b[i + 1:i + 4], "big")
        if hdr & 0x7F == 4:
            return b[i + 4:i + 4 + size]
        i += 4 + size
        if hdr & 0x80:
            break
    return None


def parse_audio_tags(b: bytes) -> dict:
    """Best-effort provenance dict: ``format`` plus any of title /
    artist / album / date / track / genre / vendor. Unknown payloads
    return {} rather than raising (tag extraction is advisory)."""
    if b[:3] == b"ID3":
        return _parse_id3v2(b)
    if b[:4] == b"fLaC":
        vc = _flac_comment_block(b)
        return (_parse_vorbis_comment(vc, "flac")
                if vc is not None else {"format": "flac"})
    if b[:4] == b"OggS":
        from datapump_spark.operators.vorbis import ogg_packets
        try:
            for _ser, _g, pkt in ogg_packets(b):
                if pkt[:7] == b"\x03vorbis":
                    return _parse_vorbis_comment(pkt[7:], "vorbis")
                if pkt[:8] == b"OpusTags":      # RFC 7845 §5.2 (r12)
                    return _parse_vorbis_comment(pkt[8:], "opus")
                if len(pkt) > 4 and (pkt[0] & 0x7F) == 4 \
                        and pkt[:5] != b"\x7fFLAC":
                    # FLAC-in-Ogg metadata packet: one raw block
                    size = int.from_bytes(pkt[1:4], "big")
                    return _parse_vorbis_comment(pkt[4:4 + size],
                                                 "ogg-flac")
        except ValueError:
            return {}
        return {"format": "ogg"}
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        out: dict = {"format": "wav"}
        i = 12
        while i + 8 <= len(b):
            cid = b[i:i + 4]
            size = struct.unpack("<I", b[i + 4:i + 8])[0]
            if cid == b"LIST" and b[i + 8:i + 12] == b"INFO":
                j = i + 12
                while j + 8 <= i + 8 + size:
                    sub = b[j:j + 4]
                    ssz = struct.unpack("<I", b[j + 4:j + 8])[0]
                    key = _WAV_MAP.get(sub)
                    if key and key not in out:
                        out[key] = (b[j + 8:j + 8 + ssz]
                                    .split(b"\x00")[0]
                                    .decode("latin-1", "replace"))
                    j += 8 + ssz + (ssz & 1)
            i += 8 + size + (size & 1)
        return out
    return {}


# ---------------------------------------------------------------------------
# Writer twins
# ---------------------------------------------------------------------------


def encode_id3v2(tags: dict, version: int = 4,
                 encodings: dict | None = None) -> bytes:
    """ID3v2.3/2.4 tag bytes (prepend to an MP3 stream). ``encodings``
    (fixture knob) maps tag key -> encoding byte 0-3 so every text
    encoding is witnessed; default UTF-8 for v2.4, UTF-16 for v2.3."""
    if version not in (3, 4):
        raise ValueError("ID3v2.3 or v2.4 only")
    frames = bytearray()
    rev = {v: k for k, v in _ID3_MAP.items() if k != "TYER"}
    if version == 3:
        rev["date"] = "TYER"
    for key, val in tags.items():
        fid = rev[key].encode("ascii")
        enc = (encodings or {}).get(key, 3 if version == 4 else 1)
        if enc == 0:
            body = bytes([0]) + str(val).encode("latin-1", "replace")
        elif enc == 1:
            body = bytes([1]) + str(val).encode("utf-16")
        elif enc == 2:
            body = bytes([2]) + str(val).encode("utf-16-be")
        else:
            body = bytes([3]) + str(val).encode("utf-8")
        size = (len(body).to_bytes(4, "big") if version == 3 else
                bytes((len(body) >> s) & 0x7F for s in (21, 14, 7, 0)))
        frames += fid + size + b"\x00\x00" + body
    total = bytes((len(frames) >> s) & 0x7F for s in (21, 14, 7, 0))
    return (b"ID3" + bytes([version, 0, 0]) + total + bytes(frames))


def add_flac_comments(flac: bytes, tags: dict,
                      vendor: str = "datapump-spark") -> bytes:
    """Splice a VORBIS_COMMENT block after STREAMINFO (clearing its
    last-block bit) — fixture twin for the FLAC tag path."""
    if flac[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    items = [f"{k.upper() if k != 'track' else 'TRACKNUMBER'}={v}"
             .encode() for k, v in tags.items()]
    vc = struct.pack("<I", len(vendor)) + vendor.encode()
    vc += struct.pack("<I", len(items))
    for it in items:
        vc += struct.pack("<I", len(it)) + it
    si_size = int.from_bytes(flac[5:8], "big")
    si_end = 8 + si_size
    was_last = flac[4] & 0x80
    si_hdr = bytes([flac[4] & 0x7F])
    block = bytes([(0x80 if was_last else 0) | 4]) \
        + len(vc).to_bytes(3, "big") + vc
    return (flac[:4] + si_hdr + flac[5:si_end] + block
            + flac[si_end:])


def extract_audio_tags(df, on_error: str = "null"):
    """(media_id, format, title, artist, album, date, track, genre,
    vendor) via Arrow mapInPandas — the audio provenance kernel."""
    import pandas as pd

    cols = ["format", "title", "artist", "album", "date", "track",
            "genre", "vendor"]
    schema = "media_id long, " + ", ".join(f"{c} string" for c in cols)

    def kernel(batches):
        for pdf in batches:
            out = {c: [] for c in ["media_id"] + cols}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    tags = parse_audio_tags(bytes(payload))
                except Exception:
                    if on_error == "raise":
                        raise
                    tags = {}
                out["media_id"].append(mid)
                for c in cols:
                    out[c].append(tags.get(c))
            yield pd.DataFrame(out)

    return df.select("media_id", "payload").mapInPandas(kernel, schema)
