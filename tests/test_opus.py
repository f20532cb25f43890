"""Ogg Opus gates (operators/opus.py, r12 — SILK-only NB mono per the
stand-in doctrine): range-coder and shell-coding properties, twin
round trips, the foreign-stream refusal gate, honest CELT/hybrid/
stereo seams, decode_audio routing, OpusTags extraction."""

from __future__ import annotations

import numpy as np
import pytest

from datapump_spark.operators.codecs import UnsupportedMediaError, decode_audio
from datapump_spark.operators.opus import (
    OPUS_TWIN_MARK,
    _decode_frame,
    _decode_shell,
    _encode_shell,
    _GAIN_ABS_ICDF,
    _LSF_S2_ICDF,
    _RangeDecoder,
    _RangeEncoder,
    _SIGN_ICDF,
    decode_ogg_opus,
    encode_opus,
)
from datapump_spark.operators.vorbis import ogg_packets, ogg_pages


def _tone(f: int, secs: float = 0.5, sr: int = 8000):
    t = np.arange(int(sr * secs)) / sr
    return 0.4 * np.sin(2 * np.pi * f * t)


def test_range_coder_property():
    import random
    rng = random.Random(5)
    tables = [_GAIN_ABS_ICDF, _LSF_S2_ICDF, _SIGN_ICDF]
    for _ in range(15):
        enc = _RangeEncoder()
        seq = []
        for _ in range(rng.randrange(1, 250)):
            t = rng.choice(tables)
            s = rng.randrange(len(t))
            seq.append((t, s))
            enc.encode_icdf(s, t)
        nraw = rng.randrange(0, 25)
        raw = rng.getrandbits(nraw) if nraw else 0
        enc.raw_bits(raw, nraw)
        dec = _RangeDecoder(enc.finish())
        assert [dec.decode_icdf(t) for t, _ in seq] == [s for _, s in seq]
        assert dec.raw_bits(nraw) == raw


def test_shell_coding_exact():
    import random
    rng = random.Random(6)
    for _ in range(25):
        block = np.array([rng.randrange(-900, 901)
                          if rng.random() < 0.4 else 0
                          for _ in range(16)])
        enc = _RangeEncoder()
        _encode_shell(enc, block)
        assert np.array_equal(
            _decode_shell(_RangeDecoder(enc.finish())), block)


def test_tone_round_trips_bin_exact():
    # 0.5 s at 8 kHz = 2 Hz bins: frequencies must be even to be
    # bin-aligned (the q_opus_tone grid property). Default tier runs
    # three spread frequencies; the q_opus_tone oracle gate re-checks
    # the full 8-frequency grid every round.
    for f in (200, 874, 3400):
        x = _tone(f)
        out, sr = decode_ogg_opus(encode_opus(x))
        y = out[:, 0]
        assert sr == 8000 and len(y) == 4000
        sp = np.abs(np.fft.rfft(y * np.hanning(len(y))))
        assert abs(np.argmax(sp) * sr / len(y) - f) < 0.5, f
        snr = 10 * np.log10((x ** 2).mean()
                            / ((x - y[:len(x)]) ** 2).mean())
        assert snr > 6, (f, snr)         # documented fixture grade


def test_deterministic_and_tagged():
    from datapump_spark.operators.audiometa import parse_audio_tags
    x = _tone(440)
    b = encode_opus(x, comments={"title": "opus song", "track": "9"})
    assert encode_opus(x, comments={"title": "opus song",
                                    "track": "9"}) == b
    tags = parse_audio_tags(b)
    assert tags["format"] == "opus" and tags["title"] == "opus song"
    assert tags["track"] == "9"


def test_foreign_stream_refused():
    """The r12 honesty gate: a stream whose OpusTags lack the twin
    marker (i.e. any libopus file) refuses instead of decoding to
    plausible-but-wrong samples."""
    b = encode_opus(_tone(300))
    pkts = [p for _, _, p in ogg_packets(b)]
    # rebuild with a marker-free OpusTags
    tags = (b"OpusTags" + (7).to_bytes(4, "little") + b"libopus"
            + (0).to_bytes(4, "little"))
    grans = [0, 0] + [48000 * 4000 * (i + 1) // 8000 // len(pkts[2:])
                      for i in range(len(pkts[2:]))]
    foreign = ogg_pages([pkts[0], tags] + pkts[2:], serial=7,
                        granules=[0, 0] + [1] * len(pkts[2:]))
    with pytest.raises(UnsupportedMediaError, match="foreign Opus"):
        decode_ogg_opus(foreign)


def test_honest_seams():
    b = encode_opus(_tone(300))
    pkts = [p for _, _, p in ogg_packets(b)]

    def rebuild(audio0):
        return ogg_pages([pkts[0], pkts[1], audio0], serial=7,
                         granules=[0, 0, 960])

    # CELT-only config (16+), hybrid (12-15), wide SILK, stereo, c>0
    for toc, msg in ((16 << 3, "CELT"), (12 << 3, "hybrid"),
                     ((4 << 3), "config"), ((1 << 3) | 4, "stereo"),
                     ((1 << 3) | 1, "multi-frame")):
        with pytest.raises(UnsupportedMediaError, match=msg):
            decode_ogg_opus(rebuild(bytes([toc]) + pkts[2][1:]))
    # stereo OpusHead
    head = bytearray(pkts[0])
    head[9] = 2
    stereo = ogg_pages([bytes(head)] + pkts[1:], serial=7,
                       granules=[0] * len(pkts))
    with pytest.raises(UnsupportedMediaError, match="mono"):
        decode_ogg_opus(stereo)
    with pytest.raises(UnsupportedMediaError, match="Ogg Opus"):
        decode_ogg_opus(b"not ogg at all")


def test_foreign_style_stage2_residuals_decode():
    """Hand-built frame with NONZERO LSF stage-2 residuals (the twin
    always codes 0): decode applies them — the residual path is
    witnessed without a foreign stream."""
    from datapump_spark.operators.opus import (_encode_frame,
                                               _LSF_CB, _LSF_S2_STEP,
                                               _lsf_to_lpc, _stabilize)
    enc = _RangeEncoder()
    exc = np.zeros(160)
    exc[::20] = 64
    res = [2, -3, 0, 4, -4, 1, 0, 0, -1, 3]
    _encode_frame(enc, [30, 8, 8, 8], 5, res, exc)
    out = _decode_frame(_RangeDecoder(enc.finish()))
    assert out.shape == (160,) and np.isfinite(out).all()
    # the decoded output must differ from the zero-residual frame
    enc2 = _RangeEncoder()
    _encode_frame(enc2, [30, 8, 8, 8], 5, [0] * 10, exc)
    out2 = _decode_frame(_RangeDecoder(enc2.finish()))
    assert not np.allclose(out, out2)


def test_decode_audio_routes_opus():
    x = _tone(600)
    out, sr = decode_audio(encode_opus(x))
    assert sr == 8000 and out.shape == (4000, 1)


def test_media_kernel_admits_opus(spark):
    from datapump_spark.operators.audiofeat import audio_spectral_features
    rows = [(1, encode_opus(_tone(800)))]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = audio_spectral_features(df, on_error="raise").collect()[0]
    assert got["n_frames"] == 4000 and got["sample_rate"] == 8000
    assert abs(got["dominant_hz"] - 800) < 1.0
