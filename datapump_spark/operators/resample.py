"""Frequency resample: time-bucketed mean of every numeric column per group.

Reference (datapump.py:287-327, core :294):
``data_df.groupby(GroupBy).resample(Kind).mean()`` — group by key column(s),
bucket the datetime index at a pandas offset alias, mean every numeric
column. Output = (group keys, bucket-start ts, means); the group key is kept
(the reference's attempt to drop it always fails — SURVEY §2.13.2).

Spark design: a single ``groupBy(keys, bucket(ts))`` aggregation.
- Calendar-aligned units (hour/day/week/month/quarter/year) use
  ``date_trunc`` — one codegen'd expression, bucket = period start.
- Arbitrary fixed intervals ("15 minutes") use ``window(ts, interval).start``
  (epoch-aligned tumbling window, matches pandas fixed-offset buckets).
Gap buckets: pandas resample EMITS empty all-NaN buckets per group; the
reference then elides the NaNs so gaps degenerate to key+ts-only rows
(SURVEY §2.4 A1). Default here is dense=False (no gap rows — documented
divergence, SURVEY §2.13.3); ``dense=True`` reproduces gap rows via
``sequence()`` + explode + left join.

Scale: one shuffle on (keys, bucket) with map-side partial aggregation;
Catalyst prunes the scan to keys+ts+numeric columns. At 100 TB with a
date-partitioned source table, bucket-by-day aggregations also get partition
pruning when a time filter is present. The dense variant builds the bucket
spine from the per-group min/max — a second small aggregate — and joins
spine←agg with a shuffle on the same (keys, bucket) partitioning, so AQE
reuses the exchange layout.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# pandas offset alias → (date_trunc unit | None, interval string)
# (reference validates Kind via pandas to_offset, datapump.py:386-392)
_ALIAS = {
    "H": ("hour", "1 hour"),
    "h": ("hour", "1 hour"),
    "D": ("day", "1 day"),
    "d": ("day", "1 day"),
    "W": ("week", "7 days"),
    "M": ("month", None),
    "MS": ("month", None),
    "Q": ("quarter", None),
    "QS": ("quarter", None),
    "A": ("year", None),
    "Y": ("year", None),
    "YS": ("year", None),
    "T": (None, "1 minute"),
    "min": (None, "1 minute"),
    "S": (None, "1 second"),
}


def _parse_kind(kind: str) -> tuple[str | None, str | None]:
    """Translate a pandas-style offset alias ('H', 'D', '15T', '30min'...)
    to (date_trunc unit, window interval). Raises on unknown aliases, like
    the reference's to_offset gate (datapump.py:386-392)."""
    if kind in _ALIAS:
        return _ALIAS[kind]
    # numeric-prefixed aliases: 15T, 30min, 12H, 7D ...
    i = 0
    while i < len(kind) and (kind[i].isdigit() or kind[i] == "."):
        i += 1
    if i == 0 or kind[i:] not in _ALIAS:
        raise ValueError(f"unsupported resample kind: {kind!r}")
    n = kind[:i]
    unit, interval = _ALIAS[kind[i:]]
    if interval is None:
        raise ValueError(f"unsupported multiple of calendar unit: {kind!r}")
    base_n, base_unit = interval.split(" ", 1)
    total = int(float(n) * int(base_n))
    return (None, f"{total} {base_unit}")


_NUMERIC = (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
            T.FloatType, T.DoubleType, T.DecimalType)


def numeric_columns(df: DataFrame, exclude: Sequence[str] = ()) -> list[str]:
    return [
        f.name for f in df.schema.fields
        if isinstance(f.dataType, _NUMERIC) and f.name not in exclude
    ]


def freq_resample(
    df: DataFrame,
    group_by: Sequence[str],
    ts_col: str,
    kind: str,
    value_cols: Sequence[str] | None = None,
    dense: bool = False,
    bucket_alias: str | None = None,
) -> DataFrame:
    """groupBy(group_by, bucket(ts)).avg(numeric columns).

    Output columns: *group_by, bucket ts (named ``bucket_alias`` or ts_col,
    reference keeps the date column name), mean of each value column under
    its original name (pandas .mean() keeps names).
    """
    unit, interval = _parse_kind(kind)
    if value_cols is None:
        value_cols = numeric_columns(df, exclude=[*group_by, ts_col])
    out_ts = bucket_alias or ts_col

    if unit is not None:
        bucket = F.date_trunc(unit, F.col(ts_col))
    else:
        bucket = F.window(F.col(ts_col), interval)["start"]

    aggs = [F.avg(c).alias(c) for c in value_cols]
    agg = (
        df.groupBy(*[F.col(g) for g in group_by], bucket.alias(out_ts))
        .agg(*aggs)
    )
    if not dense:
        return agg

    # Dense spine: per-group min/max bucket → sequence → explode → left join.
    if unit is not None:
        step = {"hour": "1 hour", "day": "1 day", "week": "7 days",
                "month": "1 month", "quarter": "3 months", "year": "1 year"}[unit]
    else:
        step = interval
    n, u = step.split(" ", 1)
    ival = F.expr(f"interval {n} {u}")
    spine = (
        agg.groupBy(*group_by)
        .agg(F.min(out_ts).alias("__lo"), F.max(out_ts).alias("__hi"))
        .select(*group_by,
                F.explode(F.sequence("__lo", "__hi", ival)).alias(out_ts))
    )
    return spine.join(agg, on=[*group_by, out_ts], how="left")
