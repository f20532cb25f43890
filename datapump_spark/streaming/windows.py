"""Streaming window extensions beyond the reference (SURVEY §2.10 lists the
reference's streaming semantics as tumbling-recompute only; §7 Phase 3 adds
these).

All functions accept either a streaming or a batch DataFrame — the same
plan serves both; on a stream the watermark bounds state, on a batch it is
a no-op. That's the Spark-idiomatic way to keep the batch backfill and the
live stream on literally the same code path.

Scale notes:
- Watermarks are what make 100 TB streams possible at all: state for a
  (key, window) pair is dropped once the watermark passes, so state size
  is O(active windows × keys), not O(history).
- Windowed aggregations shuffle once on (key, window) with map-side
  partial aggregation, same as the batch resample operator.
- ``session_window`` merges overlapping per-key sessions inside the state
  store — the streaming twin of the batch lag+running-sum sessionizer in
  queries.q_sessionize (verified equivalent in tests on closed sessions).
- The stateful running aggregate uses ``applyInPandasWithState``: Arrow
  batches per key-group, explicit GroupState, a watermark-driven timeout —
  the escape hatch for semantics window() can't express (e.g. running
  distinct-ish counters, custom eviction).
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def windowed_mean(
    df: DataFrame, keys: list[str], ts_col: str, value_col: str,
    window: str = "1 hour", slide: str | None = None,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Tumbling (or sliding, when ``slide`` differs) windowed mean with a
    watermark: (keys…, window_start, window_end, avg_value, n).

    Append-mode semantics on a stream: a window row is emitted exactly
    once, when the watermark passes window_end — late rows inside the
    watermark still count, later ones are dropped (vs the reference's
    full-recompute which silently rewrites history; SURVEY §2.10)."""
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    win = F.window(ts_col, window, slide or window)
    return (
        df.groupBy(*keys, win.alias("w"))
        .agg(F.avg(value_col).alias("avg_value"), F.count(F.lit(1)).alias("n"))
        .select(*keys, F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"), "avg_value", "n")
    )


def sessionized(
    df: DataFrame, keys: list[str], ts_col: str, value_col: str,
    gap: str = "30 minutes", watermark: str = "30 minutes",
) -> DataFrame:
    """Session windows (gap-based), the streaming twin of the batch
    lag+running-sum sessionizer: (keys…, session_start, session_end, n,
    sum_value). Overlapping sessions merge in the state store; a session
    closes (and emits, in append mode) when the watermark passes its end
    + gap."""
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    # NB: grouping by an ALIASED session_window column silently drops
    # merged sessions in Spark 4.1 (partition-dependent); the withColumn →
    # groupBy-by-name formulation is the one that plans correctly.
    return (
        df.withColumn("s", F.session_window(F.col(ts_col), gap))
        .groupBy(*keys, "s")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(value_col).alias("sum_value"))
        .select(*keys, F.col("s.start").alias("session_start"),
                F.col("s.end").alias("session_end"), "n", "sum_value")
    )


_RUNNING_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("sum_value", T.DoubleType()),
    T.StructField("max_value", T.DoubleType()),
])

_STATE_SCHEMA = "n BIGINT, s DOUBLE, m DOUBLE"


def _running_update(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState,
):
    """Custom stateful kernel: per-key running (count, sum, max) across
    micro-batches. State is a 3-tuple; each trigger emits the updated
    running row for keys that saw data."""
    if state.exists:
        n, s, m = state.get
    else:
        n, s, m = 0, 0.0, None
    for pdf in pdfs:
        # nulls carry no information: drop them so an all-null batch can't
        # poison max with NaN (max(NaN, x) stays NaN forever) and so
        # n_events counts exactly the values sum_value summed
        v = pdf["value"].dropna().astype(float)
        n += len(v)
        s += float(v.sum())
        if len(v):
            mx = float(v.max())
            m = mx if m is None else max(m, mx)
    state.update((n, s, m))
    yield pd.DataFrame({
        "user_id": [key[0]], "n_events": [n], "sum_value": [s], "max_value": [m],
    })


def running_user_stats(df: DataFrame) -> DataFrame:
    """Per-user running stats via ``applyInPandasWithState`` — the custom
    stateful-operator surface (events schema: user_id, ts, value). Works
    on a stream (update mode); state lives in the state store, keyed and
    co-partitioned by user_id."""
    return (
        df.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _running_update,
            outputStructType=_RUNNING_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def interval_join(
    left: DataFrame, right: DataFrame, key: str,
    left_ts: str = "l_ts", right_ts: str = "r_ts",
    lower: str = "0 seconds", upper: str = "15 minutes",
    watermark: str = "30 minutes", how: str = "inner",
) -> DataFrame:
    """Stream–stream interval join: pair left rows with right rows of the
    same ``key`` whose timestamp lands in ``[left_ts − lower,
    left_ts + upper]`` (the click-joins-impression shape; absent from the
    reference — SURVEY §2.10 lists stream-stream joins as a gap).

    Both sides MUST carry a watermark on a stream — that plus the time
    bound is what lets Spark evict join state: a buffered row can be
    dropped once the other side's watermark passes its interval, so state
    is O(rows in flight within the interval), not O(stream history). The
    join itself shuffles both sides on ``key`` — at 100 TB the key is the
    partition key end-to-end and the interval is the state/latency knob.
    Outer variants emit the unmatched row when the watermark closes its
    interval (never speculatively).

    On batch inputs the same plan degrades to an ordinary range-predicate
    join — the stream/batch twin contract of this module (equivalence on
    closed intervals pinned in tests). ``left_ts``/``right_ts`` (and the
    non-key payload columns) must be distinctly named — both survive into
    the output."""
    if left.isStreaming:
        left = left.withWatermark(left_ts, watermark)
    if right.isStreaming:
        right = right.withWatermark(right_ts, watermark)
    rk = "__rk"
    right = right.withColumnRenamed(key, rk)
    cond = (
        (left[key] == right[rk])
        & (right[right_ts] >= left[left_ts] - F.expr(f"interval {lower}"))
        & (right[right_ts] <= left[left_ts] + F.expr(f"interval {upper}"))
    )
    return left.join(right, cond, how).drop(rk)


def dedupe_within_watermark(
    df: DataFrame, keys: list[str], ts_col: str,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming twin of the batch PK dedupe (operators.dedupe): drops
    duplicate keys ACROSS micro-batches, with state bounded by the
    watermark (a key's dedup state is evicted once the watermark passes
    its event time — the only way cross-batch dedup state stays finite on
    an unbounded stream). On the stream the FIRST ARRIVAL wins; the batch
    fallback has no arrival order, so it keeps the EARLIEST EVENT TIME per
    key (deterministic — plain dropDuplicates would keep a partition-
    layout-dependent row), which matches the stream whenever arrival
    follows event time."""
    if df.isStreaming:
        return df.withWatermark(ts_col, watermark) \
                 .dropDuplicatesWithinWatermark(keys)
    from datapump_spark.operators.dedupe import dedupe_by_key
    return dedupe_by_key(df, keys, ts_col, "first")


def enrich(stream: DataFrame, dim: DataFrame, on: str | list[str],
           how: str = "left") -> DataFrame:
    """Stream-static enrichment: join a (possibly streaming) fact frame
    with a static dimension. The static side is explicitly broadcast —
    on a stream this is the only join flavor that needs NO state store
    at all (each micro-batch probes the broadcast map and moves on), so
    it costs a map-side lookup per row at any scale. The static plan is
    re-resolved every micro-batch, so a dim refreshed in place (e.g. the
    parquet MERGE sink's current version) is picked up without restart.

    Works identically on batch frames (same code path, same plan)."""
    return stream.join(F.broadcast(dim), on, how)
