"""File-level min/max statistics index + manifest-pruned reads.

The lakehouse pattern (Delta/Iceberg manifests, Hudi column stats)
rebuilt from Spark primitives: a tiny index table holding per-FILE
min/max/count for chosen columns, consulted before a scan so only files
whose [min,max] intersects the predicate are opened. Parquet row-group
stats then prune *within* the surviving files (see
:mod:`datapump_spark.operators.zorder` — the two levels compose:
z-order the layout, index the files).

Scale notes (100 TB):

- The index is built DISTRIBUTED: one scan with the ``_metadata``
  hidden column, one aggregation on file path — never a driver loop
  over footers. At 100 TB the index is ~one row per file (a few hundred
  thousand rows), trivially broadcast-able.
- Pruning collects only the surviving file PATHS to the driver —
  O(matching files) strings, which is exactly what any table format's
  manifest read does; the data itself never moves.
- The residual predicate is re-applied after the pruned scan, so
  correctness never depends on the index being fresh-complete — a stale
  index can only over-read (and `build` is one cheap scan to refresh).

Extends the reference (a pandas/CKAN pipeline has no layout/manifest
concept; SURVEY §2.11 sinks are row stores).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def build_stats_index(spark: SparkSession, path: str,
                      cols: list[str]) -> DataFrame:
    """Per-file stats for ``cols`` over the parquet table at ``path``:
    ``(file_path, n_rows, min_<c>, max_<c>, ...)``. One distributed scan
    + one aggregation keyed on the file path."""
    aggs: list[Column] = [F.count("*").cast("bigint").alias("n_rows")]
    for c in cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    return (spark.read.parquet(path)
            .select(F.col("_metadata.file_path").alias("file_path"), *cols)
            .groupBy("file_path")
            .agg(*aggs))


def prune_files(index: DataFrame,
                box: dict[str, tuple[object, object]]) -> list[str]:
    """File paths whose per-column [min,max] intersects every ``box``
    range. Collects only paths — the manifest-read step."""
    keep = F.lit(True)
    for c, (lo, hi) in box.items():
        keep = keep & (F.col(f"min_{c}") <= F.lit(hi)) \
                    & (F.col(f"max_{c}") >= F.lit(lo))
    return [r["file_path"] for r in
            index.where(keep).select("file_path").collect()]


def pruned_read(spark: SparkSession, path: str, index: DataFrame,
                box: dict[str, tuple[object, object]]) -> DataFrame:
    """Read only the files the index cannot rule out, then re-apply the
    box predicate (the index is an accelerator, never a correctness
    dependency). Equivalent to ``spark.read.parquet(path).where(box)``,
    minus the skipped IO."""
    pred = F.lit(True)
    for c, (lo, hi) in box.items():
        pred = pred & F.col(c).between(F.lit(lo), F.lit(hi))
    files = prune_files(index, box)
    if not files:
        return spark.read.parquet(path).where(F.lit(False))
    return spark.read.parquet(*files).where(pred)
