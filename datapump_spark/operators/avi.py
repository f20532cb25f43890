"""MJPEG-in-AVI video decode/encode in pure Python + numpy (round 9).

The cheapest HONEST real-video path: AVI is a plain RIFF container
(the same chunk grammar as WAV/WebP, already parsed elsewhere in this
package) and MJPEG frames are baseline JPEGs — which operators/jpeg.py
decodes for real. This clears the package's former single
NotImplementedError (multimodal.sample_frames fake-only): frame
extraction over a real container with real pixel output, exercising
the full binary->frames->features plumbing a multimodal pipeline
needs. Modern codecs (H.264/VP9/AV1) remain out of scope — sniffed
(mediasniff MP4/Matroska) but not decoded, recorded in COVERAGE.md.

Layout (Microsoft AVI RIFF form, public documentation; OpenDML
extensions not needed at fixture scale):

    RIFF 'AVI '
      LIST 'hdrl'
        'avih' (56 bytes: usec/frame, ..., total frames, streams, w, h)
        LIST 'strl'
          'strh' (56: fccType 'vids', handler 'MJPG', scale, rate, len)
          'strf' (40: BITMAPINFOHEADER, biCompression 'MJPG')
      LIST 'movi'
        '00dc' <baseline JPEG bytes> ...
      'idx1' (legacy index)

Reference parity note: the reference (datapump.py) has no multimodal
surface at all (requirements.txt:1-9); charter extension.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np

from datapump_spark.operators.codecs import UnsupportedMediaError


def _chunks(b: bytes, i: int, end: int):
    """Yield (fourcc, payload_start, payload_end) for RIFF chunks in
    b[i:end]; chunk bodies are padded to even length."""
    while i + 8 <= end:
        tag = b[i:i + 4]
        size = struct.unpack("<I", b[i + 4:i + 8])[0]
        p = i + 8
        if p + size > end:
            return
        yield tag, p, p + size
        i = p + size + (size & 1)


def avi_info(b: bytes):
    """(width, height, duration_ms, n_frames) from the avih main
    header — abstains (Nones) rather than guessing on malformed
    files."""
    if b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        return None, None, None, None
    for tag, p, e in _chunks(b, 12, len(b)):
        if tag != b"LIST" or b[p:p + 4] != b"hdrl":
            continue
        for t2, p2, e2 in _chunks(b, p + 4, e):
            if t2 == b"avih" and e2 - p2 >= 40:
                usec = struct.unpack("<I", b[p2:p2 + 4])[0]
                nfr = struct.unpack("<I", b[p2 + 16:p2 + 20])[0]
                w = struct.unpack("<I", b[p2 + 32:p2 + 36])[0]
                h = struct.unpack("<I", b[p2 + 36:p2 + 40])[0]
                dur = nfr * usec // 1000 if usec else None
                return w or None, h or None, dur, nfr or None
    return None, None, None, None


def decode_avi_frames(b: bytes) -> Iterator[tuple[int, int, np.ndarray]]:
    """Yield (frame_idx, ts_ms, rgb uint8 (h, w, 3)) for every video
    frame of stream 0 in an MJPEG AVI. Non-MJPEG video streams raise
    UnsupportedMediaError; a malformed container raises ValueError."""
    from datapump_spark.operators.jpeg import decode_jpeg

    if b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise ValueError("not an AVI")
    usec = None
    handler_ok = False
    movi = None
    for tag, p, e in _chunks(b, 12, len(b)):
        if tag != b"LIST":
            continue
        form = b[p:p + 4]
        if form == b"hdrl":
            for t2, p2, e2 in _chunks(b, p + 4, e):
                if t2 == b"avih" and e2 - p2 >= 4:
                    usec = struct.unpack("<I", b[p2:p2 + 4])[0]
                elif t2 == b"LIST" and b[p2:p2 + 4] == b"strl":
                    for t3, p3, e3 in _chunks(b, p2 + 4, e2):
                        if t3 == b"strh" and e3 - p3 >= 8 \
                                and b[p3:p3 + 4] == b"vids":
                            hdl = b[p3 + 4:p3 + 8]
                            if hdl not in (b"MJPG", b"mjpg", b"jpeg"):
                                raise UnsupportedMediaError(
                                    f"AVI video codec {hdl!r} "
                                    "unsupported (MJPEG only)")
                            handler_ok = True
        elif form == b"movi":
            movi = (p + 4, e)
    if movi is None:
        raise ValueError("AVI without a movi list")
    if not handler_ok:
        raise UnsupportedMediaError("AVI without an MJPEG video stream")
    ms_per = (usec or 0) / 1000.0
    idx = 0
    for tag, p, e in _chunks(b, movi[0], movi[1]):
        # stream 0 compressed/uncompressed video chunks
        if tag[2:4] in (b"dc", b"db") and tag[:2] == b"00":
            yield idx, int(idx * ms_per), decode_jpeg(b[p:e])
            idx += 1


def encode_avi_mjpeg(frames, fps: int = 10, quality: int = 90) -> bytes:
    """Encode RGB uint8 frames (all same shape) as an MJPEG AVI —
    fixture/sink twin of decode_avi_frames."""
    from datapump_spark.operators.jpeg import encode_jpeg

    frames = list(frames)
    if not frames:
        raise ValueError("no frames")
    h, w = frames[0].shape[:2]
    jpegs = [encode_jpeg(f, quality=quality) for f in frames]
    usec = 1_000_000 // fps
    max_size = max(len(j) for j in jpegs)

    avih = struct.pack("<14I", usec, max_size * fps, 0, 0x10,
                       len(jpegs), 0, 1, max_size, w, h, 0, 0, 0, 0)
    strh = (b"vids" + b"MJPG" + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0,
                                            1, fps, 0, len(jpegs),
                                            max_size, 0, 0)
            + struct.pack("<4H", 0, 0, w, h))
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)

    def chunk(tag: bytes, body: bytes) -> bytes:
        return tag + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) & 1 else b"")

    def lst(form: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", form + body)

    strl = lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf))
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + strl)
    movi_body = b"".join(chunk(b"00dc", j) for j in jpegs)
    movi = lst(b"movi", movi_body)
    # legacy idx1: offsets relative to the start of the movi form
    entries = []
    off = 4
    for j in jpegs:
        entries.append(b"00dc" + struct.pack("<III", 0x10, off, len(j)))
        off += 8 + len(j) + (len(j) & 1)
    idx1 = chunk(b"idx1", b"".join(entries))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body
