"""WebM (Matroska) VP8 video decode/encode in pure Python (round 9).

The third real video container: WebM wraps VP8 key frames in EBML
Clusters/SimpleBlocks, and operators/vp8.py already decodes VP8 key
frames for real — so the missing piece was the Matroska walk
(Segment -> Info timestamp scale, Tracks -> V_VP8 track number,
Cluster timestamps -> SimpleBlock framing), which this adds on top of
the EBML varint/children helpers the sniffer (mediasniff._mkv_info)
already ships. All-intra WebM decodes end to end; round 11 adds
INTER-frame (P-frame) streams via operators/vp8inter (VP8Stream
holds the LAST/GOLDEN/ALTREF reference state across SimpleBlocks;
SPLITMV raises inside). V_VP9/V_AV1 codecs raise
UnsupportedMediaError honestly, recorded in COVERAGE.md. Round 10
adds all three LACING modes (Xiph 255-terminated sizes, fixed equal
split, EBML vint + signed-vint deltas) with a lacing-capable fixture
writer; laced frames share the block timestamp.

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


def _signed_vint(b: bytes, i: int) -> tuple[int, int]:
    """EBML SIGNED vint (lacing deltas): unsigned value minus
    2^(7*len-1) - 1."""
    v, j = _ebml_varint(b, i, strip=True)
    return v - ((1 << (7 * (j - i) - 1)) - 1), j


def _laced_sizes(b: bytes, i: int, end: int,
                 flags: int) -> tuple[list[int], int]:
    """Per-frame byte sizes for a (possibly laced) block: Xiph (0x02,
    255-terminated size bytes), fixed (0x04, equal split) and EBML
    (0x06, first size as vint + signed-vint deltas) lacing — r10; the
    last frame is always the remainder."""
    mode = flags & 0x06
    if mode == 0:
        return [end - i], i
    if i >= end:
        raise ValueError("truncated lacing header")
    count = b[i] + 1
    i += 1
    sizes: list[int] = []
    if mode == 0x04:                     # fixed-size lacing
        total = end - i
        if count == 0 or total % count:
            raise ValueError("fixed-lacing size not divisible")
        return [total // count] * count, i
    if mode == 0x02:                     # Xiph lacing
        for _ in range(count - 1):
            sz = 0
            while True:
                if i >= end:
                    raise ValueError("truncated Xiph lacing header")
                v = b[i]
                i += 1
                sz += v
                if v < 255:
                    break
            sizes.append(sz)
    else:                                # EBML lacing
        for k in range(count - 1):
            if i >= end:
                raise ValueError("truncated EBML lacing header")
            if k == 0:
                sz, i = _ebml_varint(b, i, strip=True)
            else:
                delta, i = _signed_vint(b, i)
                sz += delta
            if sz < 0 or i > end:
                raise ValueError("bad EBML-laced frame size")
            sizes.append(sz)
    last = end - i - sum(sizes)
    if last < 0:
        raise ValueError("laced frame sizes exceed the block")
    sizes.append(last)
    return sizes, i


def decode_webm_frames(b: bytes) -> Iterator[tuple[int, int, np.ndarray]]:
    """Yield (frame_idx, ts_ms, rgb uint8 (h, w, 3)) for every
    SimpleBlock of the first video track in a VP8 WebM — key frames
    AND inter frames (r11, operators/vp8inter: LAST/GOLDEN/ALTREF
    prediction; SPLITMV streams raise inside), including
    Xiph/fixed/EBML-laced blocks (r10; laced frames share the block
    timestamp). Not-shown frames (altref updates) advance the decoder
    state without emitting a row. Non-VP8 codecs raise
    UnsupportedMediaError; a malformed container raises ValueError."""
    from datapump_spark.operators.vp8inter import VP8Stream

    if b[:4] != b"\x1aE\xdf\xa3":
        raise ValueError("not a Matroska/WebM file")
    track, codec, scale, (p, e) = _webm_video_track(b)
    if codec != "V_VP8":
        raise UnsupportedMediaError(
            f"WebM video codec {codec!r} unsupported (V_VP8 only)")
    stream = VP8Stream()
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
                ts_ms = (cluster_ts + rel) * scale // 1_000_000
                sizes, di = _laced_sizes(b, i + 3, q3, flags)
                for sz in sizes:
                    rgb = stream.decode(b[di:di + sz])
                    di += sz
                    if rgb is not None:  # not-shown frames: state only
                        yield idx, ts_ms, rgb
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


def _lace_header(sizes: list[int], mode: str) -> bytes:
    """Lacing header for all frames of one block (the last size is
    implied by the block remainder)."""
    out = bytearray([len(sizes) - 1])
    if mode == "fixed":
        if any(s != sizes[0] for s in sizes):
            raise ValueError("fixed lacing needs equal frame sizes")
        return bytes(out)
    if mode == "xiph":
        for s in sizes[:-1]:
            while s >= 255:
                out.append(255)
                s -= 255
            out.append(s)
        return bytes(out)
    # EBML: first size as vint, then signed-vint deltas. A
    # single-frame laced block stores ZERO size fields (the lace-count
    # byte is count-1 = 0 and the reader consumes count-1 sizes), so
    # mirror the Xiph branch and emit nothing (r11 advice fix).
    if len(sizes) == 1:
        return bytes(out)

    def vint(v: int) -> bytes:
        for ln in range(1, 9):
            if v < (1 << (7 * ln)) - 1:
                return (v | (1 << (7 * ln))).to_bytes(ln, "big")
        raise ValueError("vint overflow")

    out += vint(sizes[0])
    for k in range(1, len(sizes) - 1):
        delta = sizes[k] - sizes[k - 1]
        for ln in range(1, 9):
            bias = (1 << (7 * ln - 1)) - 1
            if -bias <= delta <= bias:
                out += ((delta + bias) | (1 << (7 * ln))).to_bytes(ln,
                                                                   "big")
                break
    return bytes(out)


def encode_webm_vp8(frames, fps: int = 10, qi: int = 4,
                    lacing: str | None = None,
                    inter: bool = False, **inter_kw) -> bytes:
    """Encode RGB uint8 frames as a VP8 WebM — fixture/sink twin of
    decode_webm_frames. Default: all-intra, one Cluster per frame
    (exercises the cluster-timestamp walk). ``lacing`` (r10):
    'xiph' / 'ebml' / 'fixed' packs ALL frames into one laced
    SimpleBlock instead ('fixed' needs equal-size payloads, e.g.
    identical frames at qi=0). ``inter=True`` (r11) codes frame 0 as
    the key frame and the rest as version-3 inter frames
    (operators/vp8inter; extra keywords — golden_refresh, golden_ref,
    search, allow_intra — pass through), with the SimpleBlock
    keyframe flag set only on key frames."""
    from datapump_spark.operators.vp8 import encode_vp8

    frames = list(frames)
    if not frames:
        raise ValueError("no frames")
    h, w = frames[0].shape[:2]
    step = 1000 // fps

    if inter:
        from datapump_spark.operators.vp8inter import \
            encode_vp8_inter_frames
        vp8_payloads = encode_vp8_inter_frames(frames, qi=qi,
                                               **inter_kw)
    else:
        vp8_payloads = None

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
    if lacing is None:
        clusters = b""
        for i, f in enumerate(frames):
            payload = (vp8_payloads[i] if vp8_payloads is not None
                       else encode_vp8(f, qi=qi))
            kf = 0x80 if not payload[0] & 1 else 0x00
            block = b"\x81" + struct.pack(">h", 0) + bytes([kf]) \
                + payload
            clusters += _el(0x1F43B675,
                            _el(0xE7, _uint(i * step)) + _el(0xA3, block))
    else:
        mode_bits = {"xiph": 0x02, "fixed": 0x04, "ebml": 0x06}[lacing]
        if vp8_payloads is not None:
            raise ValueError("lacing with inter frames unsupported "
                             "in the twin")
        payloads = [encode_vp8(f, qi=qi) for f in frames]
        block = (b"\x81" + struct.pack(">h", 0)
                 + bytes([0x80 | mode_bits])
                 + _lace_header([len(p) for p in payloads], lacing)
                 + b"".join(payloads))
        clusters = _el(0x1F43B675, _el(0xE7, _uint(0)) + _el(0xA3, block))
    segment = _el(0x18538067, info + tracks + clusters)
    return ebml + segment
