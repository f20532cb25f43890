"""Observation-based write metrics: measured on the written rows in the
same job, audit round-trip, freshness report."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from datapump_spark.sinks.observe import (
    freshness_report,
    metrics_audit,
    observed_write,
)


def test_observed_write_counts(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, None, 2.0), (3, "c", None), (4, None, None)],
        "id long, s string, v double")
    out = str(tmp_path / "t")
    got = observed_write(
        df, lambda d: d.write.parquet(out),
        custom={"min_id": F.min("id"),
                "neg_v": F.sum((F.col("v") < 0).cast("long"))})
    assert got["n_rows"] == 4
    assert got["null_id"] == 0
    assert got["null_s"] == 2
    assert got["null_v"] == 2
    assert got["min_id"] == 1
    assert got["neg_v"] == 0
    # the write really happened, with all rows
    assert spark.read.parquet(out).count() == 4


def test_observed_write_measures_post_filter_rows(spark, tmp_path):
    """Metrics bind to the observed plan node: what is measured is what
    is written, not the source row count."""
    df = spark.range(100).withColumn("v", F.col("id") * 2)
    out = str(tmp_path / "t2")
    got = observed_write(
        df.where(F.col("id") % 10 == 0),
        lambda d: d.write.parquet(out))
    assert got["n_rows"] == 10
    assert spark.read.parquet(out).count() == 10


def test_metrics_audit_roundtrip_and_freshness(spark, tmp_path):
    audit = str(tmp_path / "audit")
    metrics_audit(spark, {"n_rows": 4, "null_s": 2}, audit, job="j1")
    time.sleep(0.05)
    metrics_audit(spark, {"n_rows": 9, "null_s": 0}, audit, job="j1")
    metrics_audit(spark, {"n_rows": 7}, audit, job="j2")
    fresh = {(r["job"], r["metric"]): r["value"]
             for r in freshness_report(spark, audit).collect()}
    assert fresh[("j1", "n_rows")] == 9.0   # latest wins
    assert fresh[("j1", "null_s")] == 0.0
    assert fresh[("j2", "n_rows")] == 7.0
    # long format: two jobs, three metric names, five audit rows total
    assert spark.read.parquet(audit).count() == 5


def test_observed_write_per_microbatch(spark, tmp_path):
    """The docstring claim: under foreachBatch each micro-batch gets its
    own Observation row (Observation is per-action)."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    chk = str(tmp_path / "chk")
    spark.range(0, 10).withColumn("v", F.col("id") * 1.0) \
        .coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(
        [(100, None), (101, 2.0)], "id long, v double") \
        .coalesce(1).write.mode("append").parquet(src)

    seen = []

    def handle(batch_df, batch_id):
        m = observed_write(
            batch_df, lambda d: d.write.mode("append").parquet(out),
            null_cols=["v"])
        seen.append(m)

    q = (
        spark.readStream.schema("id long, v double")
        .option("maxFilesPerTrigger", 1).parquet(src)
        .writeStream.foreachBatch(handle)
        .option("checkpointLocation", chk)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    assert len(seen) == 2
    assert sorted(m["n_rows"] for m in seen) == [2, 10]
    assert sum(m["null_v"] for m in seen) == 1
    assert spark.read.parquet(out).count() == 12
