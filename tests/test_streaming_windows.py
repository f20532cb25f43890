"""Streaming window extension tests: watermarked tumbling windows, session
windows, and the applyInPandasWithState running aggregate — each driven
through a real file-source stream (one file per trigger so the watermark
advances deterministically) and checked against the batch equivalent."""
from __future__ import annotations

import json
import os
from pathlib import Path

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datapump_spark.streaming.windows import (
    running_user_stats, sessionized, windowed_mean,
)

EVENT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("value", T.DoubleType()),
])


def _write_hour_files(tmp: Path) -> None:
    """3 files = 3 micro-batches, each a later hour; processing them in
    order advances the watermark past earlier windows."""
    rows_by_hour = {
        0: [(1, "2024-01-01 00:05:00", 10.0), (1, "2024-01-01 00:35:00", 20.0),
            (2, "2024-01-01 00:10:00", 5.0)],
        1: [(1, "2024-01-01 01:10:00", 30.0), (2, "2024-01-01 01:20:00", 7.0)],
        2: [(1, "2024-01-01 02:30:00", 40.0)],
    }
    for h, rows in rows_by_hour.items():
        p = tmp / f"part-{h}.json"
        with open(p, "w") as f:
            for u, ts, v in rows:
                f.write(json.dumps({"user_id": u, "ts": ts, "value": v}) + "\n")
        # distinct ascending mtimes: the file source processes oldest-first,
        # making watermark progression (and thus emissions) deterministic
        os.utime(p, (1_000_000_000 + h * 1000, 1_000_000_000 + h * 1000))


def _stream(spark, tmp: Path):
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(tmp))
    )


@pytest.fixture()
def hour_dir(spark, tmp_path):
    d = tmp_path / "events"
    d.mkdir()
    _write_hour_files(d)
    return d


def _run_to_memory(stream_df, name: str, mode: str, checkpoint: Path):
    q = (
        stream_df.writeStream.format("memory").queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", str(checkpoint))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_windowed_mean_append_with_watermark(spark, hour_dir, tmp_path):
    out = windowed_mean(
        _stream(spark, hour_dir), ["user_id"], "ts", "value",
        window="1 hour", watermark="10 minutes")
    _run_to_memory(out, "wm_t", "append", tmp_path / "cp1")
    got = {(r["user_id"], r["window_start"].hour): (r["avg_value"], r["n"])
           for r in spark.table("wm_t").collect()}
    # watermark (last event 02:30 − 10 min) finalized hour-0 and hour-1
    # windows; the hour-2 window is still open → not emitted in append mode
    assert got == {(1, 0): (15.0, 2), (2, 0): (5.0, 1),
                   (1, 1): (30.0, 1), (2, 1): (7.0, 1)}


def test_windowed_mean_batch_equivalence(spark, hour_dir):
    batch = spark.read.schema(EVENT_SCHEMA).json(str(hour_dir))
    rows = windowed_mean(batch, ["user_id"], "ts", "value").collect()
    got = {(r["user_id"], r["window_start"].hour): (r["avg_value"], r["n"])
           for r in rows}
    assert got[(1, 2)] == (40.0, 1)      # batch emits ALL windows
    assert len(got) == 5


def test_sessionized_stream_closes_sessions(spark, hour_dir, tmp_path):
    out = sessionized(
        _stream(spark, hour_dir), ["user_id"], "ts", "value",
        gap="31 minutes", watermark="5 minutes")
    _run_to_memory(out, "sess_t", "append", tmp_path / "cp2")
    rows = spark.table("sess_t").collect()
    # user 1: 00:05+00:35 merge (gap 30m < 31m); 01:10 is 35m later ->
    # separate; 02:30 still open at the final watermark (02:25).
    closed = {(r["user_id"], r["session_start"].strftime("%H:%M")):
              (r["n"], r["sum_value"]) for r in rows}
    assert closed[(1, "00:05")] == (2, 30.0)
    assert closed[(1, "01:10")] == (1, 30.0)
    assert (1, "02:30") not in closed     # last session not yet closed
    # batch run on the same data agrees on the closed sessions
    batch = sessionized(
        spark.read.schema(EVENT_SCHEMA).json(str(hour_dir)),
        ["user_id"], "ts", "value", gap="31 minutes")
    b = {(r["user_id"], r["session_start"].strftime("%H:%M")):
         (r["n"], r["sum_value"]) for r in batch.collect()}
    for k, v in closed.items():
        assert b[k] == v


def test_running_user_stats_stateful(spark, hour_dir, tmp_path):
    out = running_user_stats(_stream(spark, hour_dir))
    _run_to_memory(out, "run_t", "update", tmp_path / "cp3")
    # memory sink in update mode appends each trigger's updates; the LAST
    # row per user is the final running state
    rows = spark.table("run_t").collect()
    final = {}
    for r in rows:
        final[r["user_id"]] = (r["n_events"], r["sum_value"], r["max_value"])
    assert final[1] == (4, 100.0, 40.0)
    assert final[2] == (2, 12.0, 7.0)


def _write_join_files(d: Path, name: str, ts_field: str, rows_by_batch):
    for h, rr in rows_by_batch.items():
        p = d / f"{name}-{h}.json"
        with open(p, "w") as f:
            for u, ts, v in rr:
                f.write(json.dumps(
                    {"user_id": u, ts_field: ts, "value": v}) + "\n")
        os.utime(p, (1_000_000_000 + h * 1000, 1_000_000_000 + h * 1000))


def test_interval_join_stream_stream(spark, tmp_path):
    """Impressions ⋈ clicks within [imp_ts, imp_ts + 10 min], same user:
    stream-stream result == batch range join on the same files."""
    from datapump_spark.streaming.windows import interval_join

    imp_d, clk_d = tmp_path / "imp", tmp_path / "clk"
    imp_d.mkdir(), clk_d.mkdir()
    _write_join_files(imp_d, "imp", "imp_ts", {
        0: [(1, "2024-01-01 00:00:00", 1.0), (2, "2024-01-01 00:01:00", 2.0)],
        1: [(1, "2024-01-01 01:00:00", 3.0)],
        2: [(9, "2024-01-01 03:00:00", 0.0)],   # watermark pusher
    })
    _write_join_files(clk_d, "clk", "clk_ts", {
        0: [(1, "2024-01-01 00:05:00", 10.0)],   # joins imp@00:00
        1: [(1, "2024-01-01 00:20:00", 20.0),    # outside 10 min — no join
            (2, "2024-01-01 00:02:00", 30.0)],   # joins imp@00:01
        2: [(9, "2024-01-01 03:00:00", 0.0)],
    })

    def schema(ts_field):
        return T.StructType([
            T.StructField("user_id", T.LongType()),
            T.StructField(ts_field, T.TimestampType()),
            T.StructField("value", T.DoubleType()),
        ])

    def src(d, ts_field):
        return (spark.readStream.schema(schema(ts_field))
                .option("maxFilesPerTrigger", 1).json(str(d)))

    imp = src(imp_d, "imp_ts").withColumnRenamed("value", "imp_v")
    clk = src(clk_d, "clk_ts").withColumnRenamed("value", "clk_v")
    out = interval_join(imp, clk, "user_id", "imp_ts", "clk_ts",
                        lower="0 seconds", upper="10 minutes",
                        watermark="30 minutes")
    _run_to_memory(out, "ij_t", "append", tmp_path / "cp5")
    got = {(r["user_id"], r["imp_ts"].strftime("%H:%M"),
            r["clk_ts"].strftime("%H:%M")) for r in spark.table("ij_t").collect()}
    want = {(1, "00:00", "00:05"), (2, "00:01", "00:02"),
            (9, "03:00", "03:00")}
    assert got == want

    # batch twin on the same files: identical pairs
    bi = (spark.read.schema(schema("imp_ts")).json(str(imp_d))
          .withColumnRenamed("value", "imp_v"))
    bc = (spark.read.schema(schema("clk_ts")).json(str(clk_d))
          .withColumnRenamed("value", "clk_v"))
    b = interval_join(bi, bc, "user_id", "imp_ts", "clk_ts",
                      lower="0 seconds", upper="10 minutes")
    bgot = {(r["user_id"], r["imp_ts"].strftime("%H:%M"),
             r["clk_ts"].strftime("%H:%M")) for r in b.collect()}
    assert bgot == want


def test_interval_join_left_outer_batch(spark):
    """Outer variant: unmatched left rows survive with null right side."""
    from datapump_spark.streaming.windows import interval_join

    left = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 1.0), (5, "2024-01-01 00:00:00", 5.0)],
        "user_id long, l_ts string, lv double",
    ).withColumn("l_ts", F.to_timestamp("l_ts"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 00:03:00", 7.0)],
        "user_id long, r_ts string, rv double",
    ).withColumn("r_ts", F.to_timestamp("r_ts"))
    rows = {r["user_id"]: r for r in interval_join(
        left, right, "user_id", "l_ts", "r_ts",
        upper="5 minutes", how="left_outer").collect()}
    assert rows[1]["rv"] == 7.0
    assert rows[5]["rv"] is None and rows[5]["r_ts"] is None


def test_dedupe_within_watermark(spark, tmp_path):
    from datapump_spark.streaming.windows import dedupe_within_watermark

    d = tmp_path / "dup_events"
    d.mkdir()
    # same event_key appears in batch 0 and batch 1 (within watermark):
    # only the first arrival survives; a fresh key in batch 1 passes
    rows = {
        0: [(1, "2024-01-01 00:05:00", 10.0), (2, "2024-01-01 00:06:00", 5.0)],
        1: [(1, "2024-01-01 00:05:00", 99.0), (3, "2024-01-01 00:07:00", 7.0)],
    }
    for h, rr in rows.items():
        p = d / f"part-{h}.json"
        with open(p, "w") as f:
            for u, ts, v in rr:
                f.write(json.dumps({"user_id": u, "ts": ts, "value": v}) + "\n")
        os.utime(p, (1_000_000_000 + h * 1000, 1_000_000_000 + h * 1000))

    out = dedupe_within_watermark(
        _stream(spark, d), ["user_id"], "ts", watermark="1 hour")
    _run_to_memory(out, "ddw_t", "append", tmp_path / "cp4")
    got = {r["user_id"]: r["value"] for r in spark.table("ddw_t").collect()}
    assert got == {1: 10.0, 2: 5.0, 3: 7.0}   # first arrival of key 1 won

    # batch path: plain dropDuplicates
    batch = spark.read.schema(EVENT_SCHEMA).json(str(d))
    bout = dedupe_within_watermark(batch, ["user_id"], "ts")
    assert bout.count() == 3


def test_enrich_stream_static_equals_batch(spark, tmp_path):
    from datapump_spark.streaming.windows import enrich

    src = tmp_path / "facts"
    out = tmp_path / "enriched"
    facts = spark.createDataFrame(
        [(1, 10, 5.0), (2, 20, 7.5), (3, 30, 1.25), (4, 99, 2.0)],
        "event_id int, user_id int, value double")
    facts.write.mode("overwrite").parquet(str(src))
    dim = spark.createDataFrame(
        [(10, "gold"), (20, "silver"), (30, "bronze")],
        "user_id int, tier string")

    stream = spark.readStream.schema(
        "event_id int, user_id int, value double").parquet(str(src))
    (enrich(stream, dim, "user_id")
     .writeStream.format("parquet")
     .option("path", str(out))
     .option("checkpointLocation", str(tmp_path / "ckpt"))
     .trigger(availableNow=True).start().awaitTermination(120))

    got = sorted(tuple(r) for r in spark.read.parquet(str(out))
                 .select("event_id", "tier").collect())
    exp = sorted(tuple(r) for r in enrich(facts, dim, "user_id")
                 .select("event_id", "tier").collect())
    assert got == exp
    assert (4, None) in got  # left join keeps unmatched facts
