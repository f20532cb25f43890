"""Multimodal (image/audio/video) column plumbing.

Media ride through the engine as opaque ``binary`` columns plus a typed
metadata struct — the same model Spark's own `image` source and petastorm
use. Heavy per-item work (decode, resize, feature extraction, frame
sampling) runs as Arrow-batched ``mapInPandas`` over the binary column:
one Python worker per partition, vectorized batches, no per-row pickling.

The actual codecs (PIL/opencv/librosa) are NOT in this container, so the
decode kernels are stubbed: ``fake=True`` produces deterministic
md5-derived features (so the distributed plumbing — schema, partitioning,
batch shapes — is fully testable), ``fake=False`` raises
NotImplementedError at the point a real codec would be called.

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


def extract_features(df: DataFrame, fake: bool = True) -> DataFrame:
    """(media_id, n_bytes, features[FEATURE_DIM]) via Arrow-batched
    mapInPandas. ``fake=False`` is the seam where a real decoder
    (PIL/librosa) plugs in."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real media decode requires codec libs (PIL/opencv/librosa) "
                    "not present in this environment"
                )
            payloads = pdf["payload"]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "n_bytes": payloads.map(len).astype("int64"),
                "features": payloads.map(_fake_features),
            })

    return df.select("media_id", "payload").mapInPandas(kernel, _FEATURES_SCHEMA)


_RESIZE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("payload", T.BinaryType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
])


def resize_images(df: DataFrame, width: int, height: int, fake: bool = True) -> DataFrame:
    """Resize kernel stub: fake mode passes payloads through and stamps the
    target dimensions (plumbing-real, codec-stubbed)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError("real resize requires an image codec")
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "payload": pdf["payload"],
                "width": width,
                "height": height,
            })

    return df.select("media_id", "payload").mapInPandas(kernel, _RESIZE_SCHEMA)


def sample_frames(df: DataFrame, every_ms: int = 1000, fake: bool = True) -> DataFrame:
    """Video frame sampling stub: fake mode emits one synthetic frame row
    per whole ``every_ms`` of duration (explode happens in the plan, sizes
    derived from metadata — the real decoder only changes the payload)."""
    frames = df.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(
                (F.col("meta.duration_ms") / every_ms).cast("long") - 1, F.lit(0)))
        ).alias("frame_idx"),
    )
    if not fake:
        raise NotImplementedError("real frame extraction requires a video codec")
    return frames.withColumn("frame_ts_ms", F.col("frame_idx") * every_ms)


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
