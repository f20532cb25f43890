"""Gaps-and-islands / slowly-changing-dimension interval building.

Turns an event stream into validity intervals: for each key, contiguous
runs of an unchanged state column collapse to one row with
[effective_from, effective_to) — the SCD Type-2 shape a lakehouse
dimension build needs, and the classic "islands" answer for sensor /
status feeds.

Spark-first shape: one window pass computes the change flag (lag), a
running sum turns flags into island ids, and one aggregation collapses
islands. All three steps share the SAME (key, order) window partitioning,
so the whole operator is a single shuffle — Catalyst reuses the sort
across lag, sum, and the final groupBy because the keys are a prefix.

At 100 TB: the shuffle is by key (user/device), which is the natural
high-cardinality partitioner; no global sort, no driver state. Skewed keys
(one device = billions of rows) would need the same salting used in
operators/skew.py — islands can be built per salt-slice and merged where
slices abut, which `state_intervals` leaves to the caller by contract.

Reference has no interval logic (it last-write-wins per PK,
datapump.py:560-566); this is north-star surface for training-data
pipelines (e.g. collapsing page-state changes into visits).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def state_intervals(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    state_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Collapse per-key runs of an unchanged ``state_col`` into intervals.

    Output: one row per island with ``effective_from`` (first ts),
    ``effective_to`` (next island's first ts; null for the current island
    — the open SCD2 row), ``last_ts``, ``n_events`` and ``is_current``.

    ``tiebreak_col`` makes ordering total when timestamps can collide
    (pass the event id); required for deterministic island boundaries.
    """
    order = [F.col(ts_col).asc()]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(key_col).orderBy(*order)
    changed = F.when(
        F.lag(state_col).over(w).isNull()
        | (F.lag(state_col).over(w) != F.col(state_col)), 1).otherwise(0)
    run = (
        df.select(key_col, ts_col, state_col,
                  *( [tiebreak_col] if tiebreak_col else [] ))
        .withColumn("__chg", changed)
        .withColumn("__island",
                    F.sum("__chg").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    )
    islands = (
        run.groupBy(key_col, "__island")
        .agg(
            F.first(state_col).alias(state_col),  # constant within island
            F.min(ts_col).alias("effective_from"),
            F.max(ts_col).alias("last_ts"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    w2 = Window.partitionBy(key_col).orderBy(F.col("__island").asc())
    return (
        islands
        .withColumn("effective_to", F.lead("effective_from").over(w2))
        .withColumn("is_current", F.col("effective_to").isNull())
        .drop("__island")
        .select(key_col, state_col, "effective_from", "effective_to",
                "last_ts", "n_events", "is_current")
    )


def snapshot_at(intervals: DataFrame, ts) -> DataFrame:
    """Point-in-time read of an SCD2 interval frame: the rows valid at
    ``ts``. A pure filter — partition pruning applies when the interval
    table is stored partitioned by effective_from date."""
    t = F.lit(ts).cast("timestamp")
    return intervals.where(
        (F.col("effective_from") <= t)
        & (F.col("effective_to").isNull() | (F.col("effective_to") > t)))
