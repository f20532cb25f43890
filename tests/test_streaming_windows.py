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
