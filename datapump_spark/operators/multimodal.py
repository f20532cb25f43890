"""Multimodal (image/audio/video) column plumbing.

Media ride through the engine as opaque ``binary`` columns plus a typed
metadata struct — the same model Spark's own `image` source and petastorm
use. Heavy per-item work (decode, resize, feature extraction, frame
sampling) runs as Arrow-batched ``mapInPandas`` over the binary column:
one Python worker per partition, vectorized batches, no per-row pickling.

Codec status: PNG, BMP, PCM WAV, JPEG (baseline + progressive), GIF,
and lossless WebP (VP8L) decode FOR REAL
via the pure-Python codecs in ``operators.codecs`` / ``operators.jpeg``
/ ``operators.gif`` (zlib inflate + scanline unfilter, BI_RGB pixel
walk, RIFF chunk walk, Huffman + IDCT baseline AND progressive JPEG,
LZW + compositing GIF) — ``fake=False`` runs them end-to-end.
Arithmetic-coded JPEG, lossy WebP (VP8), and video remain honestly
stubbed: the real path raises ``UnsupportedMediaError`` on them, or
nulls them out under ``on_error='null'``. ``fake=True`` keeps the
deterministic md5-derived stand-in features so plumbing tests need no
real payloads.

Scale notes: binary payloads dominate partition size — pipelines should
set spark.sql.files.maxPartitionBytes down (or store media separately,
keyed by content hash) so a partition holds O(100) items, and repartition
by content-hash prefix before the decode stage to even out skew from
variable media sizes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("payload", T.BinaryType()),
    T.StructField("meta", T.StructType([
        T.StructField("kind", T.StringType()),      # image | audio | video
        T.StructField("format", T.StringType()),    # png/jpg/wav/mp4/...
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ])),
])

FEATURE_DIM = 8

_FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("features", T.ArrayType(T.DoubleType())),
])


def _fake_features(payload: bytes) -> list[float]:
    """Deterministic stand-in for a real feature extractor: FEATURE_DIM
    floats in [0,1) derived from the md5 of the payload."""
    d = hashlib.md5(payload).digest()
    return [b / 256.0 for b in d[:FEATURE_DIM]]


def _real_features(payload: bytes) -> list[float]:
    """Real FEATURE_DIM-float summary from an actual decode.

    Images (PNG/BMP): [width, height, channels, mean, std, mean_c0,
    mean_cmid, mean_clast] — pixel stats in 0..255.
    Audio (PCM WAV): [n_frames, channels, sample_rate, duration_ms, rms,
    peak, zero_crossing_rate, 0].
    Raises operators.codecs.UnsupportedMediaError on formats outside the
    decodable set (arithmetic JPEG / lossy-VP8 WebP / video) — the honest
    codec seam. Progressive JPEG and lossless WebP decode for real
    (round 8).
    """
    import numpy as np

    from datapump_spark.operators import codecs

    if (payload[:4] == b"RIFF" and payload[8:12] == b"WAVE") \
            or payload[:4] == b"fLaC" or payload[:3] == b"ID3" \
            or payload[:4] == b"OggS" \
            or (len(payload) > 4 and payload[0] == 0xFF
                and (payload[1] & 0xE6) == 0xE2):
        s, sr = codecs.decode_audio(payload)
        mono = s.mean(axis=1)
        zcr = float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1]))) \
            if len(mono) > 1 else 0.0
        return [float(s.shape[0]), float(s.shape[1]), float(sr),
                float(s.shape[0] * 1000 // sr) if sr else 0.0,
                float(np.sqrt(np.mean(mono ** 2))) if len(mono) else 0.0,
                float(np.max(np.abs(s))) if s.size else 0.0, zcr, 0.0]
    img = codecs.decode_image(payload)
    h, w, c = img.shape
    f = img.astype(np.float64)
    return [float(w), float(h), float(c), float(f.mean()), float(f.std()),
            float(f[:, :, 0].mean()), float(f[:, :, c // 2].mean()),
            float(f[:, :, c - 1].mean())]


def extract_features(df: DataFrame, fake: bool = True,
                     on_error: str = "raise") -> DataFrame:
    """(media_id, n_bytes, features[FEATURE_DIM]) via Arrow-batched
    mapInPandas. ``fake=False`` runs the REAL decoders (PNG/BMP/WAV/
    JPEG/GIF/VP8L-WebP via operators/codecs.py dispatch); payloads
    outside that set raise (the lossy-video codec seam) or, with
    ``on_error='null'``, yield features=null so one bad item can't fail
    a 100 TB job."""
    if on_error not in ("raise", "null"):
        raise ValueError(f"on_error must be 'raise' or 'null': {on_error!r}")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            if fake:
                feats = payloads.map(_fake_features)
            elif on_error == "raise":
                feats = payloads.map(lambda b: _real_features(bytes(b)))
            else:
                def safe(b):
                    try:
                        return _real_features(bytes(b))
                    except Exception:
                        # corrupt/truncated payloads raise struct.error,
                        # IndexError, KeyError from the decoders — null
                        # mode must survive ALL of them, not just the
                        # typed UnsupportedMediaError
                        return None
                feats = payloads.map(safe)
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "n_bytes": payloads.map(len).astype("int64"),
                "features": feats,
            })

    return df.select("media_id", "payload").mapInPandas(kernel, _FEATURES_SCHEMA)


_RESIZE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("payload", T.BinaryType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
])


def resize_images(df: DataFrame, width: int, height: int, fake: bool = True) -> DataFrame:
    """Resize kernel. ``fake=True`` passes payloads through and stamps the
    target dimensions (plumbing-only). ``fake=False`` REALLY resizes:
    decode PNG/BMP/JPEG (baseline + progressive)/GIF (codecs dispatch),
    nearest-neighbor resample, and re-encode as PNG — the output payload
    is always PNG, the normalization a training-data pipeline wants
    anyway. Lossy-WebP/arithmetic-JPEG inputs raise UnsupportedMediaError
    (codec seam)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if not fake:
            from datapump_spark.operators import codecs
        for pdf in batches:
            if fake:
                payloads = pdf["payload"]
            else:
                payloads = pdf["payload"].map(lambda b: codecs.encode_png(
                    codecs.resize_nearest(codecs.decode_image(bytes(b)),
                                          width, height)))
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "payload": payloads,
                "width": width,
                "height": height,
            })

    return df.select("media_id", "payload").mapInPandas(kernel, _RESIZE_SCHEMA)


_VIDEO_FRAME_SCHEMA = ("media_id long, frame_idx int, frame_ts_ms long, "
                       "width int, height int, frame_png binary")


def sample_frames(df: DataFrame, every_ms: int = 1000, fake: bool = True) -> DataFrame:
    """Video frame sampling. Fake mode emits one synthetic frame row
    per whole ``every_ms`` of duration (explode happens in the plan,
    sizes derived from metadata — the real decoder only changes the
    payload). ``fake=False`` (round 9) is the REAL path for the video
    containers the engine decodes: MJPEG-in-AVI and photo-JPEG MP4 via
    :func:`sample_video_frames` — it cleared the package's former
    single NotImplementedError. Animated GIFs have their own real
    path: :func:`sample_gif_frames`."""
    if not fake:
        return sample_video_frames(df, every_ms=every_ms)
    frames = df.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(
                (F.col("meta.duration_ms") / every_ms).cast("long") - 1, F.lit(0)))
        ).alias("frame_idx"),
    )
    return frames.withColumn("frame_ts_ms", F.col("frame_idx") * every_ms)


def sample_video_frames(df: DataFrame, every_ms: int = 1000,
                        on_error: str = "null") -> DataFrame:
    """REAL video frame sampling over MJPEG-AVI and photo-JPEG
    MP4/MOV payloads (round 9): container walk (RIFF in
    operators/avi.py, ISO-BMFF sample tables in operators/mp4video.py)
    + per-frame baseline-JPEG decode, emit the frame on display at
    each ``every_ms`` tick re-encoded as PNG (the same normalization
    as the GIF path). Arrow mapInPandas kernel; ``on_error='null'``
    drops undecodable/unsupported-codec payloads (one corrupt file
    can't fail a crawl-scale job), ``'raise'`` propagates."""
    if on_error not in ("null", "raise"):
        raise ValueError(f"on_error must be 'null' or 'raise': {on_error!r}")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from datapump_spark.operators import codecs
        from datapump_spark.operators.avi import decode_avi_frames
        from datapump_spark.operators.mp4video import decode_mp4_frames
        from datapump_spark.operators.webm import decode_webm_frames
        from datapump_spark.operators.webp import decode_webp_anim_frames

        for pdf in batches:
            out = {k: [] for k in ("media_id", "frame_idx", "frame_ts_ms",
                                   "width", "height", "frame_png")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    pb = bytes(payload)
                    if len(pb) >= 12 and pb[4:8] == b"ftyp":
                        dec = decode_mp4_frames
                    elif pb[:4] == b"RIFF" and pb[8:12] == b"WEBP":
                        dec = decode_webp_anim_frames
                    elif pb[:4] == b"\x1aE\xdf\xa3":
                        dec = decode_webm_frames
                    else:
                        dec = decode_avi_frames
                    frames = [(ts, rgb) for _, ts, rgb in dec(pb)]
                    if not frames:
                        continue
                    last_ts = frames[-1][0]
                    emit_idx = 0
                    png_cache: dict = {}
                    tick = 0
                    while tick <= last_ts:
                        # frame on display at `tick`
                        fi = 0
                        for j, (ts, _) in enumerate(frames):
                            if ts <= tick:
                                fi = j
                        ts, rgb = frames[fi]
                        if fi not in png_cache:
                            png_cache[fi] = codecs.encode_png(rgb)
                        out["media_id"].append(mid)
                        out["frame_idx"].append(emit_idx)
                        out["frame_ts_ms"].append(tick)
                        out["height"].append(rgb.shape[0])
                        out["width"].append(rgb.shape[1])
                        out["frame_png"].append(png_cache[fi])
                        emit_idx += 1
                        tick += every_ms
                except Exception:
                    if on_error == "raise":
                        raise
            yield pd.DataFrame(out)

    return df.select("media_id", "payload").mapInPandas(
        kernel, _VIDEO_FRAME_SCHEMA)


_GIF_FRAME_SCHEMA = ("media_id long, frame_idx int, frame_ts_ms long, "
                     "width int, height int, frame_png binary")


def sample_gif_frames(df: DataFrame, every_ms: int = 100,
                      on_error: str = "null") -> DataFrame:
    """REAL animation frame sampling over GIF payloads: decode every
    composited frame (operators/gif.decode_gif_frames), walk the
    cumulative timeline, and emit the frame on display at each
    ``every_ms`` tick, re-encoded as PNG (the same normalization the
    resize kernel applies). A frame delay of 0 is treated as 100 ms —
    the de-facto renderer convention the GIF spec left open.

    Arrow ``mapInPandas`` kernel, one decode per payload per tick walk;
    ``on_error='null'`` drops undecodable payloads (one corrupt file
    can't fail a crawl-scale job), ``'raise'`` propagates. This makes
    the frame-sampling path real for the one animation format the
    engine decodes; true video stays behind :func:`sample_frames`'s
    honest stub."""
    if on_error not in ("null", "raise"):
        raise ValueError(f"on_error must be 'null' or 'raise': {on_error!r}")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from datapump_spark.operators import codecs
        from datapump_spark.operators.gif import decode_gif_frames

        for pdf in batches:
            out = {k: [] for k in ("media_id", "frame_idx", "frame_ts_ms",
                                   "width", "height", "frame_png")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    frames = []
                    t = 0
                    for frame, delay in decode_gif_frames(bytes(payload)):
                        frames.append((t, frame))
                        t += delay if delay > 0 else 100
                    total = t
                    tick, fi = 0, 0
                    idx = 0
                    png_cache: dict = {}
                    while tick < max(total, 1):
                        while (fi + 1 < len(frames)
                               and frames[fi + 1][0] <= tick):
                            fi += 1
                        ts, frame = frames[fi]
                        png = png_cache.get(fi)
                        if png is None:
                            # one PNG per distinct frame, not per tick —
                            # a 30 s two-frame GIF at 100 ms ticks would
                            # otherwise zlib-compress 300 times
                            png_cache[fi] = png = codecs.encode_png(frame)
                        out["media_id"].append(mid)
                        out["frame_idx"].append(idx)
                        out["frame_ts_ms"].append(tick)
                        out["height"].append(frame.shape[0])
                        out["width"].append(frame.shape[1])
                        out["frame_png"].append(png)
                        idx += 1
                        tick += every_ms
                except Exception:
                    if on_error == "raise":
                        raise
            yield pd.DataFrame(out)

    return df.select("media_id", "payload").mapInPandas(
        kernel, _GIF_FRAME_SCHEMA)


def media_stats(df: DataFrame) -> DataFrame:
    """Pure-relational metadata stats over a media table (no decode):
    per (kind, format): count, total/avg payload bytes, avg duration."""
    return (
        df.groupBy(F.col("meta.kind").alias("kind"), F.col("meta.format").alias("format"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.length("payload")).alias("total_bytes"),
            F.round(F.avg(F.length("payload")), 6).alias("avg_bytes"),
            F.round(F.avg("meta.duration_ms"), 6).alias("avg_duration_ms"),
        )
    )


def _dhash64(payload: bytes) -> int:
    """64-bit difference hash (dHash): real stdlib decode → grayscale →
    9×8 nearest resize (deterministic half-pixel centers) → sign of each
    horizontal gradient, packed row-major. Robust to re-encoding, mild
    noise and rescaling — the standard cheap perceptual signature."""
    import numpy as np

    from datapump_spark.operators import codecs

    img = codecs.decode_image(bytes(payload))
    g = img.astype(np.float64).mean(axis=2)
    small = codecs.resize_nearest(g, 9, 8)
    bits = (small[:, 1:] > small[:, :-1]).flatten()
    return int.from_bytes(np.packbits(bits).tobytes(), "big", signed=True)


_DHASH_SCHEMA = "media_id long, dhash long"


def image_dhash(df: DataFrame, on_error: str = "null") -> DataFrame:
    """``(media_id, dhash)`` perceptual signatures via Arrow-batched
    mapInPandas over the REAL stdlib decoders (PNG/BMP). Payloads
    outside that set raise (``on_error='raise'``) or yield a null hash
    (default — one JPEG can't fail a crawl-scale job; route nulls to the
    quarantine the streaming media ingest already keeps)."""
    if on_error not in ("raise", "null"):
        raise ValueError(f"on_error must be 'raise' or 'null': {on_error!r}")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if on_error == "raise":
                hashes = pdf["payload"].map(_dhash64)
            else:
                def safe(b):
                    try:
                        return _dhash64(b)
                    except Exception:  # see extract_features null mode
                        return None
                hashes = pdf["payload"].map(safe)
            yield pd.DataFrame({"media_id": pdf["media_id"],
                                "dhash": hashes})

    return df.select("media_id", "payload").mapInPandas(
        kernel, _DHASH_SCHEMA)


def image_near_dup(df: DataFrame, max_hamming: int = 6,
                   max_block_size: int | None = None,
                   on_error: str = "null") -> DataFrame:
    """Perceptual image near-dedup: ``(id_a, id_b, hamming)`` for every
    image pair whose dHashes differ in ≤ ``max_hamming`` bits — re-uses
    the Manku pigeonhole index (dedup_fuzzy.hamming_pairs), so there is
    never an all-pairs join: candidates come from exact matches on one
    of ``max_hamming+1`` signature blocks, 8 bytes per image move
    through the shuffle, and only candidates pay the bit_count verify.
    The image-side twin of the text SimHash pair index, sharing its
    scale envelope and ``max_block_size`` dense-clique cap."""
    from datapump_spark.operators.dedup_fuzzy import hamming_pairs

    sigs = image_dhash(df, on_error=on_error) \
        .where(F.col("dhash").isNotNull())
    return hamming_pairs(sigs, "media_id", "dhash", bits=64,
                         max_hamming=max_hamming,
                         max_block_size=max_block_size)


def _audio_fp64(payload: bytes) -> int:
    """64-bit audio fingerprint, the dHash idea on the energy envelope:
    PCM decode → mono → 65 equal windows → RMS per window → sign of each
    consecutive delta. Robust to volume scaling (signs of deltas), small
    trims and re-encoding; NOT a spectral fingerprint (no FFT bins to
    keep it dependency-free and deterministic)."""
    import numpy as np

    from datapump_spark.operators import codecs

    samples, _sr = codecs.decode_audio(bytes(payload))
    mono = samples.astype(np.float64).mean(axis=1)
    if len(mono) < 65:
        mono = np.pad(mono, (0, 65 - len(mono)))
    edges = (np.arange(66) * len(mono)) // 65
    rms = np.array([
        np.sqrt(np.mean(mono[edges[i]:edges[i + 1]] ** 2))
        if edges[i + 1] > edges[i] else 0.0
        for i in range(65)])
    bits = rms[1:] > rms[:-1]
    return int.from_bytes(np.packbits(bits).tobytes(), "big", signed=True)


def audio_fingerprint(df: DataFrame, on_error: str = "null") -> DataFrame:
    """``(media_id, afp)`` audio fingerprints via Arrow-batched
    mapInPandas over the stdlib WAV decoder; non-PCM payloads raise or
    yield null (same contract as :func:`image_dhash`)."""
    if on_error not in ("raise", "null"):
        raise ValueError(f"on_error must be 'raise' or 'null': {on_error!r}")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if on_error == "raise":
                fps = pdf["payload"].map(_audio_fp64)
            else:
                def safe(b):
                    try:
                        return _audio_fp64(b)
                    except Exception:  # see extract_features null mode
                        return None
                fps = pdf["payload"].map(safe)
            yield pd.DataFrame({"media_id": pdf["media_id"], "afp": fps})

    return df.select("media_id", "payload").mapInPandas(
        kernel, "media_id long, afp long")


def audio_near_dup(df: DataFrame, max_hamming: int = 6,
                   max_block_size: int | None = None,
                   on_error: str = "null") -> DataFrame:
    """``(id_a, id_b, hamming)`` for audio pairs whose envelope
    fingerprints differ in ≤ ``max_hamming`` bits — the third consumer
    of the shared Manku pigeonhole core (text SimHash, image dHash,
    audio envelope), same scale envelope."""
    from datapump_spark.operators.dedup_fuzzy import hamming_pairs

    sigs = audio_fingerprint(df, on_error=on_error) \
        .where(F.col("afp").isNotNull())
    return hamming_pairs(sigs, "media_id", "afp", bits=64,
                         max_hamming=max_hamming,
                         max_block_size=max_block_size)


_EXIF_SCHEMA = ("media_id long, orientation int, make string, "
                "model string, datetime string, datetime_original string, "
                "pixel_x int, pixel_y int")


def extract_exif(df: DataFrame) -> DataFrame:
    """EXIF provenance metadata per JPEG payload (mediasniff.parse_exif
    — APP1 TIFF/IFD walk, both byte orders, r8): orientation for
    rotation-aware dedup, camera make/model and capture timestamps for
    provenance. Payloads without EXIF (or non-JPEGs) yield nulls; the
    parser never raises. Arrow mapInPandas, same kernel shape as the
    codecs."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from datapump_spark.operators.mediasniff import parse_exif
        for pdf in batches:
            rows = [parse_exif(bytes(p)) if p is not None else {}
                    for p in pdf["payload"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "orientation": pd.array(
                    [r.get("orientation") for r in rows], dtype="Int32"),
                "make": [r.get("make") for r in rows],
                "model": [r.get("model") for r in rows],
                "datetime": [r.get("datetime") for r in rows],
                "datetime_original": [r.get("datetime_original")
                                      for r in rows],
                "pixel_x": pd.array([r.get("pixel_x") for r in rows],
                                    dtype="Int32"),
                "pixel_y": pd.array([r.get("pixel_y") for r in rows],
                                    dtype="Int32"),
            })

    return df.select("media_id", "payload").mapInPandas(kernel,
                                                        _EXIF_SCHEMA)
