"""File-stats index: distributed build, lossless pruning, skipped IO."""

from __future__ import annotations

from pyspark.sql import functions as F

from datapump_spark.operators.zorder import zorder_by
from datapump_spark.sinks.stats_index import (
    build_stats_index,
    prune_files,
    pruned_read,
)


def _write_layout(spark, tmp_path, n_files=8):
    df = spark.range(4096).select(
        F.col("id"),
        (F.col("id") % 64).alias("x"),
        ((F.col("id") * 7) % 64).alias("y"),
    )
    p = str(tmp_path / "tbl")
    zorder_by(df, ["x", "y"], bits=6, num_partitions=n_files) \
        .write.mode("overwrite").parquet(p)
    return p


def test_index_shape_and_counts(spark, tmp_path):
    p = _write_layout(spark, tmp_path)
    idx = build_stats_index(spark, p, ["x", "y"])
    rows = idx.collect()
    assert sum(r["n_rows"] for r in rows) == 4096
    assert set(idx.columns) == {"file_path", "n_rows",
                                "min_x", "max_x", "min_y", "max_y"}
    for r in rows:
        assert r["min_x"] <= r["max_x"] and r["min_y"] <= r["max_y"]


def test_pruned_read_equals_full_filter(spark, tmp_path):
    p = _write_layout(spark, tmp_path)
    idx = build_stats_index(spark, p, ["x", "y"])
    box = {"x": (10, 20), "y": (30, 40)}
    got = sorted(r["id"] for r in pruned_read(spark, p, idx, box).collect())
    exp = sorted(r["id"] for r in
                 spark.read.parquet(p)
                 .where(F.col("x").between(10, 20)
                        & F.col("y").between(30, 40)).collect())
    assert got == exp and len(got) > 0


def test_pruning_skips_files_on_zordered_layout(spark, tmp_path):
    p = _write_layout(spark, tmp_path)
    idx = build_stats_index(spark, p, ["x", "y"])
    n_files = idx.count()
    kept = prune_files(idx, {"x": (0, 7), "y": (0, 7)})
    # a z-ordered layout confines a small box to a minority of files
    assert 0 < len(kept) < n_files / 2


def test_empty_box_reads_nothing(spark, tmp_path):
    p = _write_layout(spark, tmp_path)
    idx = build_stats_index(spark, p, ["x", "y"])
    out = pruned_read(spark, p, idx, {"x": (1000, 2000)})
    assert out.count() == 0
    assert prune_files(idx, {"x": (1000, 2000)}) == []


def test_stale_index_only_over_reads(spark, tmp_path):
    # correctness must not depend on index freshness: prune with an index
    # whose ranges are WIDENED (simulating staleness) and get same rows
    p = _write_layout(spark, tmp_path)
    idx = build_stats_index(spark, p, ["x", "y"])
    stale = idx.withColumn("min_x", F.lit(0)).withColumn("max_x", F.lit(63))
    box = {"x": (5, 9), "y": (5, 9)}
    got = sorted(r["id"] for r in pruned_read(spark, p, stale, box).collect())
    exp = sorted(r["id"] for r in pruned_read(spark, p, idx, box).collect())
    assert got == exp
