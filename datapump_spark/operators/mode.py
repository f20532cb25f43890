"""Per-column mode with ties (pandas ``df.mode()`` parity).

Reference (datapump.py:337-344): ranked modal values per column; ties produce
multiple rows sorted ascending; the row index becomes a ``stat`` column
(0,1,2,…). Columns are INDEPENDENT — row k holds each column's k-th modal
value, not co-occurring records (SURVEY §2.4 A3). Spark's builtin ``mode()``
returns a single value, so ties need the count-and-rank plan below.

Scale: per column, a value-count groupBy (shuffle of distinct values only,
map-side combine first), a broadcast of the 1-row max count, and a rank over
the tied modal values — the windowed set is only the tied values (usually a
handful), not the data. Column results are assembled by a full outer join on
the rank index; each side is tiny post-aggregation, so AQE broadcasts.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _modal_ranked(df: DataFrame, col: str, out_name: str | None = None) -> DataFrame:
    """(stat bigint, <col>) — the tied modal values of ``col`` ranked
    ascending by value, stat = 0-based rank. Nulls excluded (pandas
    mode(dropna=True) default)."""
    out = out_name or col
    counts = (
        df.where(F.col(col).isNotNull())
        .groupBy(F.col(col).alias(out))
        .agg(F.count(F.lit(1)).alias("__cnt"))
    )
    mx = counts.agg(F.max("__cnt").alias("__mx"))
    w = Window.orderBy(F.col(out).asc())
    return (
        counts.join(F.broadcast(mx), counts["__cnt"] == mx["__mx"])
        .select(out)
        .withColumn("stat", F.row_number().over(w) - F.lit(1))
        .select(F.col("stat").cast("bigint").alias("stat"), out)
    )


def column_modes(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """pandas df.mode() shape: ``stat`` rank index + one column per input
    column holding its rank-k modal value (NULL once a column's ties are
    exhausted). Output sorted by stat."""
    out = None
    for c in cols:
        ranked = _modal_ranked(df, c)
        out = ranked if out is None else out.join(ranked, on="stat", how="full")
    return out.orderBy("stat")
