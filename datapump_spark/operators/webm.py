"""WebM (Matroska) VP8 video decode/encode in pure Python (round 9).

The third real video container: WebM wraps VP8 key frames in EBML
Clusters/SimpleBlocks, and operators/vp8.py already decodes VP8 key
frames for real — so the missing piece was the Matroska walk
(Segment -> Info timestamp scale, Tracks -> V_VP8 track number,
Cluster timestamps -> SimpleBlock framing), which this adds on top of
the EBML varint/children helpers the sniffer (mediasniff._mkv_info)
already ships. All-intra WebM (every frame a key frame) decodes end
to end; inter-frame (P-frame) streams and V_VP9/V_AV1 codecs raise
UnsupportedMediaError honestly, recorded in COVERAGE.md. Lacing is
out of scope (fixture writer never emits it; laced blocks raise).

Layout (Matroska spec / RFC 9559, public):

    EBML header (DocType webm)
    Segment
      Info      (TimestampScale ns/tick, default 1,000,000 = ms)
      Tracks -> TrackEntry (TrackNumber, TrackType 1, CodecID V_VP8,
                            Video -> PixelWidth/PixelHeight)
      Cluster   (Timestamp; SimpleBlock: vint track, s16 relative
                 timecode, flags [0x80 keyframe], frame bytes)

Reference parity note: the reference (datapump.py) has no multimodal
surface; charter extension.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np

from datapump_spark.operators.codecs import UnsupportedMediaError
from datapump_spark.operators.mediasniff import (
    _ebml_children,
    _ebml_varint,
)


def _webm_video_track(b: bytes):
    """(track_number, codec_id, timestamp_scale_ns, segment_span)."""
    for eid, p, e in _ebml_children(b, 0, len(b)):
        if eid != 0x18538067:            # Segment
            continue
        scale = 1_000_000
        track = codec = None
        for e2, p2, q2 in _ebml_children(b, p, e):
            if e2 == 0x1549A966:         # Info
                for e3, p3, q3 in _ebml_children(b, p2, q2):
                    if e3 == 0x2AD7B1:
                        scale = int.from_bytes(b[p3:q3], "big")
            elif e2 == 0x1654AE6B:       # Tracks
                for e3, p3, q3 in _ebml_children(b, p2, q2):
                    if e3 != 0xAE:       # TrackEntry
                        continue
                    num = typ = None
                    cid = None
                    for e4, p4, q4 in _ebml_children(b, p3, q3):
                        if e4 == 0xD7:
                            num = int.from_bytes(b[p4:q4], "big")
                        elif e4 == 0x83:
                            typ = int.from_bytes(b[p4:q4], "big")
                        elif e4 == 0x86:
                            cid = b[p4:q4].rstrip(b"\x00").decode(
                                "ascii", "replace")
                    if typ == 1 and track is None:
                        track, codec = num, cid
        if track is None:
            raise ValueError("WebM without a video track")
        return track, codec, scale, (p, e)
    raise ValueError("not a Matroska/WebM file (no Segment)")


def decode_webm_frames(b: bytes) -> Iterator[tuple[int, int, np.ndarray]]:
    """Yield (frame_idx, ts_ms, rgb uint8 (h, w, 3)) for every
    SimpleBlock of the first video track in an all-intra VP8 WebM.
    Non-VP8 codecs, inter frames and laced blocks raise
    UnsupportedMediaError; a malformed container raises ValueError."""
    from datapump_spark.operators.vp8 import decode_vp8

    if b[:4] != b"\x1aE\xdf\xa3":
        raise ValueError("not a Matroska/WebM file")
    track, codec, scale, (p, e) = _webm_video_track(b)
    if codec != "V_VP8":
        raise UnsupportedMediaError(
            f"WebM video codec {codec!r} unsupported (V_VP8 only)")
    idx = 0
    for e2, p2, q2 in _ebml_children(b, p, e):
        if e2 != 0x1F43B675:             # Cluster
            continue
        cluster_ts = 0
        for e3, p3, q3 in _ebml_children(b, p2, q2):
            if e3 == 0xE7:               # Timestamp
                cluster_ts = int.from_bytes(b[p3:q3], "big")
            elif e3 == 0xA3:             # SimpleBlock
                tnum, i = _ebml_varint(b, p3, strip=True)
                if tnum != track:
                    continue
                if i + 3 > q3:
                    raise ValueError("truncated SimpleBlock header")
                rel = struct.unpack(">h", b[i:i + 2])[0]
                flags = b[i + 2]
                if flags & 0x06:
                    raise UnsupportedMediaError(
                        "laced WebM blocks unsupported")
                if not flags & 0x80:
                    raise UnsupportedMediaError(
                        "WebM inter (non-key) frames unsupported "
                        "(all-intra only)")
                ts_ms = (cluster_ts + rel) * scale // 1_000_000
                yield idx, ts_ms, decode_vp8(b[i + 3:q3])
                idx += 1


def _el(eid: int, body: bytes) -> bytes:
    """EBML element: ID bytes (conventional form) + minimal-vint size."""
    idb = eid.to_bytes((eid.bit_length() + 7) // 8, "big")
    n = len(body)
    for ln in range(1, 9):
        if n < (1 << (7 * ln)) - 1:
            size = (n | (1 << (7 * ln))).to_bytes(ln, "big")
            break
    else:
        raise ValueError("element too large")
    return idb + size + body


def _uint(v: int) -> bytes:
    return v.to_bytes(max(1, (v.bit_length() + 7) // 8), "big")


def encode_webm_vp8(frames, fps: int = 10, qi: int = 4) -> bytes:
    """Encode RGB uint8 frames as an all-intra VP8 WebM (one Cluster
    per frame — exercises the cluster-timestamp walk) — fixture/sink
    twin of decode_webm_frames."""
    from datapump_spark.operators.vp8 import encode_vp8

    frames = list(frames)
    if not frames:
        raise ValueError("no frames")
    h, w = frames[0].shape[:2]
    step = 1000 // fps

    ebml = _el(0x1A45DFA3, b"".join([
        _el(0x4286, _uint(1)), _el(0x42F7, _uint(1)),
        _el(0x42F2, _uint(4)), _el(0x42F3, _uint(8)),
        _el(0x4282, b"webm"), _el(0x4287, _uint(2)),
        _el(0x4285, _uint(2)),
    ]))
    info = _el(0x1549A966, b"".join([
        _el(0x2AD7B1, _uint(1_000_000)),          # ms ticks
        _el(0x4489, struct.pack(">d", float(len(frames) * step))),
    ]))
    video = _el(0xE0, _el(0xB0, _uint(w)) + _el(0xBA, _uint(h)))
    entry = _el(0xAE, b"".join([
        _el(0xD7, _uint(1)), _el(0x73C5, _uint(1)),
        _el(0x83, _uint(1)), _el(0x86, b"V_VP8"), video,
    ]))
    tracks = _el(0x1654AE6B, entry)
    clusters = b""
    for i, f in enumerate(frames):
        payload = encode_vp8(f, qi=qi)
        block = b"\x81" + struct.pack(">h", 0) + b"\x80" + payload
        clusters += _el(0x1F43B675,
                        _el(0xE7, _uint(i * step)) + _el(0xA3, block))
    segment = _el(0x18538067, info + tracks + clusters)
    return ebml + segment
