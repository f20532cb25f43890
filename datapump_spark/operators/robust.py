"""Robust numeric conditioning: winsorization + robust scaling.

Feature-pipeline primitives for training-data prep: clamp a numeric
column to per-group percentile bounds (winsorize — kills sensor spikes
and fat tails before they dominate a loss) and rescale it by
median/IQR (robust z-score — outlier-insensitive standardization).

Plan shape: ONE exact-percentile aggregate per group computes all five
cutpoints (p_lo, p25, p50, p75, p_hi) in a single pass, then the tiny
per-group bounds table broadcast-joins back onto the fact — the fact
table never shuffles. At 100 TB the exact ``percentile`` aggregate's
per-group state is the group's value multiset; for heavy groups swap in
``percentile_approx`` (t-digest, bounded state) via ``approx=True`` —
same plan, bounded memory, documented accuracy trade.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def winsorize(
    df: DataFrame,
    col: str,
    group_cols: list[str] | None = None,
    lower: float = 0.01,
    upper: float = 0.99,
    approx: bool = False,
    out_decimals: int | None = 6,
) -> DataFrame:
    """Append ``{col}_w`` (clamped to [p_lower, p_upper]) and
    ``{col}_robust`` ((x − median)/IQR, 0 when IQR is 0) computed
    against per-``group_cols`` exact interpolated percentiles.

    ``out_decimals`` rounds the derived columns (engine-portable float
    policy); pass ``None`` to keep full precision.
    """
    group_cols = group_cols or []
    pct = "percentile_approx" if approx else "percentile"
    probs = F.lit([float(lower), 0.25, 0.5, 0.75, float(upper)])
    agg = F.expr(f"{pct}({col}, array({lower}D, 0.25D, 0.5D, 0.75D, {upper}D))") \
        if approx else F.percentile(F.col(col), probs)
    bounds = (
        df.groupBy(*group_cols)
        .agg(agg.alias("_ps"))
        .select(
            *group_cols,
            F.col("_ps")[0].alias("_lo"),
            F.col("_ps")[1].alias("_p25"),
            F.col("_ps")[2].alias("_med"),
            F.col("_ps")[3].alias("_p75"),
            F.col("_ps")[4].alias("_hi"),
        )
    )
    joined = (
        df.join(F.broadcast(bounds), group_cols)
        if group_cols
        else df.crossJoin(F.broadcast(bounds))
    )
    w = F.least(F.greatest(F.col(col), F.col("_lo")), F.col("_hi"))
    iqr = F.col("_p75") - F.col("_p25")
    robust = F.when(iqr > 0, (F.col(col) - F.col("_med")) / iqr).otherwise(0.0)
    if out_decimals is not None:
        w, robust = F.round(w, out_decimals), F.round(robust, out_decimals)
    return joined.withColumn(f"{col}_w", w).withColumn(
        f"{col}_robust", robust
    ).drop("_lo", "_p25", "_med", "_p75", "_hi")
