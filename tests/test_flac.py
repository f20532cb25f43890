"""FLAC gates (operators/flac.py, round 9): lossless round trips over
every encoder branch, hand-built LPC / escape / partition / wasted-bit
foreign-style fixtures (the encoder never emits them), honest seams,
and the decode_audio route."""

from __future__ import annotations

import numpy as np
import pytest

from datapump_spark.operators.codecs import UnsupportedMediaError, decode_audio
from datapump_spark.operators.flac import (
    _BitWriter,
    _crc8,
    decode_flac,
    encode_flac,
)


def test_roundtrips_every_encoder_branch():
    rng = np.random.default_rng(3)
    cases = [
        ("fixed", (np.arange(5000) % 700 - 350).astype(np.int16), {}),
        ("constant", np.full(5000, -123, np.int16), {}),
        ("verbatim", rng.integers(-3000, 3000, 2000).astype(np.int16),
         {"mode": "verbatim"}),
        ("stereo", rng.integers(-3000, 3000, (5000, 2)).astype(np.int16),
         {}),
        ("mid_side", np.stack(
            [(np.sin(np.arange(5000) / 20) * 8000).astype(np.int16),
             (np.sin(np.arange(5000) / 25) * 6000).astype(np.int16)], 1),
         {"stereo": "mid_side"}),
        ("multi_frame", (np.arange(10000) % 97 - 48).astype(np.int16),
         {"block_size": 1024}),
    ]
    for name, x, kw in cases:
        out, sr, bps = decode_flac(encode_flac(x, 8000, **kw))
        want = x[:, None] if x.ndim == 1 else x
        assert sr == 8000 and bps == 16, name
        assert out.shape == want.shape and (out == want).all(), name


def _hand_frame(sub_writer, n=8, bits=16):
    """Wrap one hand-written mono subframe in a valid stream: header
    (8-bit end-of-header blocksize), CRC-8, aligned, CRC-16 zeros."""
    info = bytearray(34)
    info[10] = 8000 >> 12
    info[11] = (8000 >> 4) & 0xFF
    info[12] = ((8000 & 0xF) << 4) | (0 << 1) | ((bits - 1) >> 4)
    info[13] = ((bits - 1) & 0xF) << 4
    info[17] = n
    out = bytearray(b"fLaC" + bytes([0x80]) + (34).to_bytes(3, "big")
                    + info)
    w = _BitWriter()
    w.write(0x3FFE, 14)
    w.write(0, 2)
    w.write(6, 4)                        # blocksize: 8-bit at end
    w.write(0, 4)
    w.write(0, 4)                        # mono
    w.write(4, 3)                        # 16-bit
    w.write(0, 1)
    w.write(0, 8)                        # frame 0
    w.write(n - 1, 8)
    w.write(_crc8(bytes(w.out)), 8)
    sub_writer(w)
    w.align()
    w.write(0, 16)
    return bytes(out + w.out)


def test_hand_built_lpc_subframe():
    """Order-1 LPC with coeff 2, shift 1 (i.e. x[i] = res + x[i-1]) —
    a branch our encoder never emits."""
    want = [100, 101, 103, 106, 110, 115, 121, 128]

    def sub(w):
        w.write(0, 1)
        w.write(32, 6)                   # LPC order 1
        w.write(0, 1)
        w.write(want[0], 16)             # warm-up
        w.write(3, 4)                    # precision 4 -> coeff bits
        w.write(1, 5)                    # shift 1
        w.write(2, 4)                    # coeff = 2 -> (2*prev)>>1
        w.write(0, 2)                    # Rice method 0
        w.write(0, 4)                    # partition order 0
        w.write(0, 4)                    # k = 0
        for i in range(1, 8):
            res = want[i] - want[i - 1]
            u = (res << 1) ^ (res >> 63)
            w.write(0, u)
            w.write(1, 1)

    out, sr, _ = decode_flac(_hand_frame(sub))
    assert out[:, 0].tolist() == want


def test_hand_built_escape_partitions_and_wasted_bits():
    # escape partition: raw 6-bit residuals, order-1 fixed
    vals = [10, 14, 2, -5, 0, 7, -8, 3]

    def sub_escape(w):
        w.write(0, 1)
        w.write(9, 6)                    # FIXED order 1
        w.write(0, 1)
        w.write(vals[0], 16)
        w.write(0, 2)
        w.write(0, 4)
        w.write(15, 4)                   # escape
        w.write(6, 5)                    # 6 raw bits each
        for i in range(1, 8):
            w.write((vals[i] - vals[i - 1]) & 0x3F, 6)

    out, _, _ = decode_flac(_hand_frame(sub_escape))
    assert out[:, 0].tolist() == vals

    # wasted bits: constant subframe, 1 wasted bit -> value << 1
    def sub_wasted(w):
        w.write(0, 1)
        w.write(0, 6)                    # CONSTANT
        w.write(1, 1)                    # wasted-bits flag
        w.write(1, 1)                    # unary 0 -> wasted = 1
        w.write(21, 15)                  # bits - wasted = 15

    out, _, _ = decode_flac(_hand_frame(sub_wasted))
    assert (out[:, 0] == 42).all()


def test_seams_and_corruption():
    x = np.zeros(100, np.int16)
    b = bytearray(encode_flac(x, 8000))
    # STREAMINFO claiming 3 channels over 1-channel frames: caught
    # as a channel-count mismatch (r10: multichannel now decodes, so
    # the old blanket >2-channel refusal is gone)
    b3 = bytearray(b)
    b3[8 + 12] = (b3[8 + 12] & ~0x0E) | (2 << 1)
    with pytest.raises(ValueError, match="channel count mismatch"):
        decode_flac(bytes(b3))
    # header CRC-8 corruption is CAUGHT, not silently decoded
    hdr_at = len(b) - 1
    frame_at = 4 + 4 + 34
    bad = bytearray(b)
    bad[frame_at + 2] ^= 0x10            # flip a blocksize-code bit
    with pytest.raises(ValueError, match="CRC-8|sync|blocksize"):
        decode_flac(bytes(bad))
    with pytest.raises(ValueError, match="not a FLAC"):
        decode_flac(b"fLaX" + bytes(b[4:]))


def test_decode_audio_route_and_spectral_features():
    x = (0.5 * np.sin(2 * np.pi * 440 * np.arange(8000) / 8000)
         * 32767).astype(np.int16)
    f, sr = decode_audio(encode_flac(x, 8000))
    assert sr == 8000 and f.shape == (8000, 1)
    spec = np.abs(np.fft.rfft(f[:, 0] * np.hanning(8000)))
    assert int(np.argmax(spec[1:]) + 1) == 440


def test_reserved_frame_header_codes_raise():
    """ADVICE r9: sample-rate code 15 is spec-INVALID and bit-depth
    code 3 is reserved — both must reject the frame, not fall through
    to STREAMINFO defaults and decode garbage."""
    x = np.zeros(100, np.int16)
    b = encode_flac(x, 8000)
    frame_at = 4 + 4 + 34                # fLaC + STREAMINFO
    sr15 = bytearray(b)
    sr15[frame_at + 2] |= 0x0F           # sample-rate code -> 15
    with pytest.raises(ValueError, match="sample-rate code 15"):
        decode_flac(bytes(sr15))
    bd3 = bytearray(b)
    bd3[frame_at + 3] = (bd3[frame_at + 3] & ~0x0E) | (3 << 1)
    with pytest.raises(ValueError, match="reserved FLAC bit-depth"):
        decode_flac(bytes(bd3))


def test_multichannel_round_trip():
    """r10: up to 8 independent channels (5.1/7.1 payloads) round-trip
    losslessly; >8 still refuses."""
    rng = np.random.default_rng(9)
    for n_ch in (3, 6, 8):
        x = rng.integers(-3000, 3000, (2000, n_ch)).astype(np.int16)
        out, sr, bps = decode_flac(encode_flac(x, 48000))
        assert sr == 48000 and out.shape == x.shape and (out == x).all()
    with pytest.raises(ValueError, match="at most 8"):
        encode_flac(np.zeros((100, 9), np.int16), 8000)
