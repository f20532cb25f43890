"""General as-of join: direction (backward/forward), inclusivity, and
match tolerance — the full pandas ``merge_asof`` surface, Spark-first.

Spark has no ASOF JOIN; the scalable formulation is union-merge: union
both sides on (key, ts), ONE window pass carrying the nearest right-side
payload across the merged order, then keep the left rows. One shuffle on
the key, each row touched once, no range-join explosion — at 100 TB this
beats a per-row range probe by orders of magnitude (see q_asof_join,
queries.py:614, which pins the backward-inclusive case against DuckDB).

Determinism contract: among right rows tied on (key, ts), the MAX payload
struct wins (the window orders by the struct itself), so results are
stable under any partitioning — required for the oracle hash gate.

Tolerance is applied after the merge: the carried payload embeds the
matched right-side timestamp, and matches farther than ``tolerance`` are
nulled — zero extra shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    direction: str = "backward",
    strict: bool = False,
    tolerance: str | None = None,
) -> DataFrame:
    """Attach to each left row the nearest right row's ``payload_cols``.

    - ``direction='backward'``: latest right row with ts <= left ts
      (< when ``strict``); ``'forward'``: earliest right row with
      ts >= left ts (> when ``strict``).
    - ``tolerance``: SQL interval literal (e.g. ``'INTERVAL 30 DAY'``);
      matches farther away than this are nulled out.

    Output: all left columns, then ``matched_ts`` and the payloads
    (null when unmatched).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward/forward, got {direction!r}")
    left_cols = left.columns
    l = left.select(
        *left_cols,
        F.col(on).alias("__k"),
        F.col(left_ts).cast("timestamp").alias("__ts"),
    )
    r_struct = F.struct(
        F.col(right_ts).cast("timestamp").alias("__rts"),
        *[F.col(c) for c in payload_cols])
    r = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).cast("timestamp").alias("__ts"),
        r_struct.alias("__r"),
    )
    # Side flag controls tie handling at equal ts: inclusive = right rows
    # sort before left rows (so an equal-ts right row is visible to the
    # left row); strict = after.
    l_side, r_side = (1, 0) if not strict else (0, 1)
    # Single-select projections (r13, guide §7.3): the former per-column
    # withColumn loop re-analyzed the plan once per left column (~6 py4j
    # round trips + analyses per call site) — one select builds the same
    # projection in one pass. Identical plan after analysis.
    lu = l.select("*", F.lit(l_side).alias("__side"),
                  F.lit(None).cast(r.schema["__r"].dataType).alias("__r"))
    l_types = dict(l.dtypes)
    ru = r.select(
        "*", F.lit(r_side).alias("__side"),
        *[F.lit(None).cast(l_types[c]).alias(c)
          for c in left_cols if c not in r.columns])
    u = lu.unionByName(ru.select(lu.columns))

    if direction == "backward":
        order = [F.col("__ts").asc(), F.col("__side").asc(), F.col("__r").asc()]
    else:
        order = [F.col("__ts").desc(), F.col("__side").asc(), F.col("__r").asc()]
    w = (Window.partitionBy("__k").orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    matched = u.withColumn("__m", F.last("__r", ignorenulls=True).over(w)) \
               .where(F.col("__side") == l_side)

    if tolerance is not None:
        gap = (F.col("__ts") - F.col("__m.__rts") if direction == "backward"
               else F.col("__m.__rts") - F.col("__ts"))
        matched = matched.withColumn(
            "__m", F.when(gap <= F.expr(tolerance), F.col("__m")))

    return matched.select(
        *left_cols,
        F.col("__m.__rts").alias("matched_ts"),
        *[F.col(f"__m.{c}").alias(c) for c in payload_cols],
    )
