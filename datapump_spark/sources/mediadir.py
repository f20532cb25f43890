"""Media-directory ingestion via Spark's native ``binaryFile`` source.

The raw-bytes twin of :mod:`datapump_spark.sources.textdir`: point it at
a directory of image/audio/video files and get the engine's media model
(:data:`datapump_spark.operators.multimodal.MEDIA_SCHEMA`) back — one
row per file, payload as an opaque ``binary`` column, typed metadata
derived from the path. This is the on-ramp that feeds the multimodal
decode/feature kernels.

Why ``binaryFile`` and not a Python listing: the file enumeration,
read, and row materialization all happen JVM-side inside the scan, with
Spark's normal split planning — on a 1000-executor cluster the listing
of a 100M-file bucket is distributed (driver holds file STATUS, not
bytes), predicate pushdown on ``length``/``modificationTime`` works
(e.g. incremental loads filter on mtime before a single byte is read),
and ``pathGlobFilter`` prunes at enumeration time.

Scale notes: one file = one row = one task's worth of bytes; Spark caps
row size via ``spark.sql.sources.binaryFile.maxLength``. Media
partitions are payload-dominated, so pair with a lowered
``maxPartitionBytes`` (or repartition by content-hash prefix) before a
decode stage — see the multimodal module docstring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# extension → (kind, format); anything else ingests as ("blob", ext).
_KIND_BY_EXT = {
    "png": "image", "jpg": "image", "jpeg": "image", "gif": "image",
    "bmp": "image", "webp": "image",
    "wav": "audio", "mp3": "audio", "flac": "audio", "ogg": "audio",
    "mp4": "video", "mkv": "video", "webm": "video", "avi": "video",
}


def read_media_dir(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    recursive: bool = True,
    modified_after: str | None = None,
) -> DataFrame:
    """Raw ``binaryFile`` scan: (path, modificationTime, length, content).

    ``modified_after`` (ISO timestamp string) applies the incremental-
    load filter; it prunes on file STATUS during scan planning — no
    payload bytes are read for old files (binaryFile pushes down
    length/mtime predicates)."""
    reader = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", str(recursive).lower())
    )
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    if modified_after is not None:
        df = df.where(F.col("modificationTime") > F.lit(modified_after)
                      .cast("timestamp"))
    return df


def media_table(raw: DataFrame) -> DataFrame:
    """Shape a raw binaryFile frame into the engine's media model:
    ``(media_id, payload, meta{kind, format, width, height, duration_ms},
    path, n_bytes)``.

    ``media_id`` is the 63-bit xxhash of the file path — stable across
    re-ingestion, layout, and cluster size (never ``zipWithIndex``,
    which is partition-ordering-dependent). Pixel/duration metadata
    requires a decode, so it ingests NULL here and is filled by the
    multimodal kernels downstream; kind/format come from the extension,
    entirely codegen-side."""
    ext = F.lower(F.regexp_extract(F.col("path"), r"\.([A-Za-z0-9]+)$", 1))
    kind = F.lit(None).cast("string")
    for e, k in sorted(_KIND_BY_EXT.items()):
        kind = F.when(ext == e, F.lit(k)).otherwise(kind)
    kind = F.coalesce(kind, F.lit("blob"))
    return raw.select(
        F.xxhash64("path").bitwiseAND(F.lit((1 << 63) - 1)).alias("media_id"),
        F.col("content").alias("payload"),
        F.struct(
            kind.alias("kind"),
            ext.alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
        "path",
        F.col("length").alias("n_bytes"),
    )
