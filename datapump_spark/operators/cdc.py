"""CDC changelog apply: collapse an upsert/delete stream to table state.

The ingest side of the lakehouse pattern (Delta MERGE from a Debezium
feed, Hudi upserts): given a changelog of (key, sequence, op, payload),
produce the current state — the latest surviving row per key, with
delete tombstones removing keys. Complements the SCD2 operator
(operators/intervals.py), which keeps the full history; this keeps the
head.

Plan shape: ONE hash aggregate — ``max_by(payload_struct, seq_struct)``
per key (sortless argmax, the q_latest_event pattern: no window, no
sort, map-side partial argmax does most of the work) — then a filter on
the winning row's op. At 100 TB this shuffles one row per key per
partial, never the full changelog, and has no skew cliff beyond the
keys' own distribution.

Determinism: callers must make ``seq_cols`` a total order per key
(e.g. (ts, event_id)); ties would otherwise make the winner
partial-order-dependent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def apply_changes(
    changes: DataFrame,
    keys: list[str],
    seq_cols: list[str],
    op_col: str = "op",
    delete_op: str = "D",
    payload_cols: list[str] | None = None,
) -> DataFrame:
    """Current state: one row per key whose latest change (by
    ``seq_cols`` lexicographic) is not a delete. Output columns:
    ``keys… , seq_cols… , payload_cols…``."""
    if payload_cols is None:
        payload_cols = [c for c in changes.columns
                        if c not in set(keys) | set(seq_cols) | {op_col}]
    win = F.max_by(
        F.struct(*[F.col(c) for c in seq_cols + payload_cols],
                 F.col(op_col).alias("__op")),
        F.struct(*[F.col(c) for c in seq_cols]),
    ).alias("__w")
    return (
        changes.groupBy(*keys)
        .agg(win)
        .where(F.col("__w.__op") != delete_op)
        .select(*keys,
                *[F.col(f"__w.{c}").alias(c)
                  for c in seq_cols + payload_cols])
    )
