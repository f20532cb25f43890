"""In-flight pipeline observability via Spark ``Observation`` metrics.

Counting rows/nulls/violations at a sink normally costs a SECOND pass over
the data (or a ``count()`` that Catalyst optimizes into a different plan
than the write). Spark's observe API attaches aggregate metrics to the
plan itself: they are computed BY the write job, on exactly the rows
written, for free — the right way to audit a 100 TB write, where a second
pass is hours.

``observed_write`` wraps any writer callback with a standard metric set
(row count, per-column null counts, optional custom expressions) and
returns the collected values after the action completes; ``metrics_audit``
appends them to an audit table in the engine's standard shape (the same
append-only pattern as ``streaming.pipeline``'s row-count audit —
SURVEY §2 A4 — extended to column-level health).

Works identically under ``foreachBatch``: Observation is per-action, so
each micro-batch gets its own metric row.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observed_write(
    df: DataFrame,
    write: Callable[[DataFrame], None],
    null_cols: list[str] | None = None,
    custom: dict[str, Any] | None = None,
) -> dict[str, Any]:
    """Run ``write(df)`` with observation metrics attached; returns
    ``{"n_rows": ..., "null_<col>": ..., **custom}`` measured on the rows
    the write actually consumed (one pass, no re-scan).

    ``null_cols`` defaults to every top-level column; ``custom`` maps
    metric name → aggregate Column (e.g. ``F.min("ts")``, a violation
    count). Metric exprs must be aggregates (observe's contract).
    """
    cols = null_cols if null_cols is not None else [
        f.name for f in df.schema.fields]
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    metrics += [
        F.sum(F.col(c).isNull().cast("long")).alias(f"null_{c}")
        for c in cols]
    for name, expr in (custom or {}).items():
        metrics.append(expr.alias(name))
    obs = Observation()
    write(df.observe(obs, *metrics))
    return dict(obs.get)


def metrics_audit(
    spark, metrics: dict[str, Any], table_path: str, job: str,
) -> None:
    """Append one audit row (job, metric, value, value_str, ts) per
    metric — the long format survives schema growth (new metrics = new
    rows, never new columns), so the audit table never needs migration.
    Non-numeric observe metrics (min timestamp, max string) land in
    ``value_str`` with ``value`` null — they must not crash the audit
    append AFTER the observed write already succeeded. Partition-append
    only; same idempotence story as the pipeline audit."""
    rows = []
    for k, v in metrics.items():
        try:
            num = float(v) if v is not None else None
        except (TypeError, ValueError):
            num = None
        rows.append((job, k, num, None if v is None else str(v)))
    (
        spark.createDataFrame(
            rows, "job string, metric string, value double, value_str string")
        .withColumn("audit_ts", F.current_timestamp())
        .write.mode("append").parquet(table_path)
    )


def freshness_report(spark, table_path: str) -> DataFrame:
    """(job, metric, latest value, audit_ts) — last observation per
    (job, metric) from the audit table, via one sortless max_by aggregate
    (no window, no sort: the same latest-per-key shape as q_latest_event)."""
    t = spark.read.parquet(table_path)
    return (
        t.groupBy("job", "metric")
        .agg(F.max_by(F.struct("value", "audit_ts"), "audit_ts").alias("s"))
        .select("job", "metric", F.col("s.value").alias("value"),
                F.col("s.audit_ts").alias("audit_ts"))
    )
