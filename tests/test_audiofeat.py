"""Spectral audio features (operators/audiofeat.py) pinned against
closed-form signals: a pure tone's centroid/dominant land on its
frequency, white noise is spectrally flat and wide, DC/silence yield
level stats with null spectral shape."""

from __future__ import annotations

import numpy as np
import pytest

from datapump_spark.operators.audiofeat import _spectral
from datapump_spark.operators.codecs import encode_wav

SR = 8000


def _wav(samples) -> bytes:
    return encode_wav(np.asarray(samples, dtype=np.float64), SR)


def _feat(samples) -> dict:
    keys = ["n_frames", "sample_rate", "rms", "peak",
            "centroid", "bandwidth", "rolloff", "flatness", "dominant"]
    return dict(zip(keys, _spectral(_wav(samples))))


def test_pure_tone_concentrates_at_its_frequency():
    t = np.arange(SR) / SR                       # 1 s
    for f in (440.0, 1000.0, 2500.0):
        got = _feat(0.5 * np.sin(2 * np.pi * f * t))
        assert abs(got["dominant"] - f) <= 2.0
        assert abs(got["centroid"] - f) <= 25.0
        assert got["bandwidth"] < 200.0          # energy is concentrated
        assert got["flatness"] < 0.05            # tones are not flat
        assert abs(got["rolloff"] - f) <= 50.0


def test_white_noise_is_flat_and_wide():
    rng = np.random.default_rng(3)
    got = _feat(rng.uniform(-0.8, 0.8, SR))
    assert got["flatness"] > 0.5
    # flat spectrum: centroid near half-Nyquist, rolloff near 0.85*Nyquist
    assert abs(got["centroid"] - SR / 4) < SR * 0.05
    assert got["rolloff"] > 0.7 * SR / 2
    assert got["bandwidth"] > SR * 0.1


def test_tone_mixture_orders_by_amplitude():
    t = np.arange(SR) / SR
    mix = 0.6 * np.sin(2 * np.pi * 500 * t) + 0.2 * np.sin(2 * np.pi * 2000 * t)
    got = _feat(mix)
    assert abs(got["dominant"] - 500.0) <= 2.0
    assert 500.0 < got["centroid"] < 2000.0     # pulled toward the mass


def test_silence_and_dc_have_no_spectral_shape():
    got = _feat(np.zeros(1000))
    assert got["rms"] == 0.0 and got["centroid"] is None
    got = _feat(np.full(1000, 0.25))
    assert got["rms"] == pytest.approx(0.25, abs=1e-3)
    # DC bin is excluded; windowing leaks a little mass into low bins,
    # but no meaningful dominant above it
    assert got["dominant"] is None or got["dominant"] < 50.0


@pytest.mark.slow  # kernel wiring is the same mapInPandas shape the
# driver-gated decode queries exercise; the spectral math is pinned
# by the closed-form tests above
def test_distributed_kernel_and_null_mode(spark):
    from datapump_spark.operators.audiofeat import audio_spectral_features

    t = np.arange(SR) / SR
    rows = [(1, bytearray(_wav(0.5 * np.sin(2 * np.pi * 440 * t)))),
            (2, bytearray(b"not audio"))]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r["media_id"]: r for r in audio_spectral_features(df).collect()}
    assert abs(out[1]["dominant_hz"] - 440.0) <= 2.0
    assert out[1]["sample_rate"] == SR
    assert out[2]["rms"] is None
    with pytest.raises(Exception):
        audio_spectral_features(df, on_error="raise").collect()
