"""Spectral audio features over PCM WAV payloads — pure numpy FFT.

Extends the envelope fingerprint in :mod:`operators.multimodal` with
the standard spectral summary a training-data pipeline filters on
(speech/music/noise screening, silence and tone detection):

- ``rms``, ``peak`` — level;
- ``spectral_centroid_hz`` — magnitude-weighted mean frequency;
- ``spectral_bandwidth_hz`` — magnitude-weighted std around the
  centroid;
- ``spectral_rolloff_hz`` — frequency below which 85 % of magnitude
  mass lies;
- ``spectral_flatness`` — geometric/arithmetic mean ratio of the power
  spectrum (→1 for white noise, →0 for pure tones);
- ``dominant_hz`` — argmax bin frequency.

One ``np.fft.rfft`` over the (mono-mixed, Hann-windowed) signal per
payload inside an Arrow ``mapInPandas`` kernel — per-item CPU,
embarrassingly parallel, the same scale shape as the image decode
kernels. Non-WAV/corrupt payloads follow the image kernels' error
contract (null or raise). No SQL twin by nature (FFT); the semantics
are pinned in tests against closed-form signals (pure tones, white
noise, DC, silence).
"""

from __future__ import annotations

import pandas as pd

_AUDIO_FEAT_SCHEMA = (
    "media_id long, n_frames long, sample_rate long, rms double, "
    "peak double, spectral_centroid_hz double, "
    "spectral_bandwidth_hz double, spectral_rolloff_hz double, "
    "spectral_flatness double, dominant_hz double")

_COLS = [f.split()[0] for f in _AUDIO_FEAT_SCHEMA.split(", ")]


def _spectral(payload: bytes) -> list:
    import numpy as np

    from datapump_spark.operators import codecs

    s, sr = codecs.decode_audio(payload)
    mono = s.mean(axis=1)
    n = len(mono)
    rms = float(np.sqrt(np.mean(mono ** 2))) if n else 0.0
    peak = float(np.max(np.abs(mono))) if n else 0.0
    if n < 4 or rms == 0.0:
        # silence / degenerate: no spectral shape to report
        return [n, sr, rms, peak, None, None, None, None, None]
    windowed = mono * np.hanning(n)
    mag = np.abs(np.fft.rfft(windowed))
    freqs = np.fft.rfftfreq(n, d=1.0 / sr)
    # drop the DC bin: a constant offset is level, not spectral shape
    mag, freqs = mag[1:], freqs[1:]
    total = mag.sum()
    if total == 0.0:
        return [n, sr, rms, peak, None, None, None, None, None]
    centroid = float((freqs * mag).sum() / total)
    bandwidth = float(np.sqrt(((freqs - centroid) ** 2 * mag).sum() / total))
    cum = np.cumsum(mag)
    rolloff = float(freqs[int(np.searchsorted(cum, 0.85 * total))])
    power = mag ** 2
    # flatness over the power spectrum, guarded against log(0)
    nz = power[power > 0]
    flatness = float(np.exp(np.mean(np.log(nz))) / np.mean(power)) \
        if len(nz) else 0.0
    dominant = float(freqs[int(np.argmax(mag))])
    return [n, sr, rms, peak, centroid, bandwidth, rolloff, flatness,
            dominant]


def audio_spectral_features(df, on_error: str = "null"):
    """(media_id, n_frames, sample_rate, rms, peak, centroid, bandwidth,
    rolloff, flatness, dominant) per WAV payload. ``on_error='null'``
    yields all-null feature columns for undecodable payloads; 'raise'
    propagates."""
    if on_error not in ("null", "raise"):
        raise ValueError(f"on_error must be 'null' or 'raise': {on_error!r}")

    def kernel(batches):
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    rows.append([mid, *_spectral(bytes(payload))])
                except Exception:
                    if on_error == "raise":
                        raise
                    rows.append([mid] + [None] * (len(_COLS) - 1))
            yield pd.DataFrame(rows, columns=_COLS)

    return df.select("media_id", "payload").mapInPandas(
        kernel, _AUDIO_FEAT_SCHEMA)
