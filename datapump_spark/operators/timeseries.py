"""Time-series analytics beyond the reference's resample: bounded-window
EWMA smoothing, linear gap interpolation, and per-group trend fitting.

The reference's only time-series operator is the resample mean
(datapump.py:294); an IoT/metrics deployment of the same pipeline needs
smoothing, gap repair, and trend lines the moment dashboards appear.
All three are single-window or single-aggregation plans, shuffled once
on the series key — exactly the resample's shuffle, so at 100 TB they
co-partition with it (and with a sink bucketed by key, shuffle-free).

Design notes:
- **EWMA** uses a BOUNDED trailing window (last ``window`` points)
  rather than the infinite recursive form: the closed-form infinite EWMA
  needs ``(1-α)^(-i)`` prefix terms that overflow float64 beyond ~1500
  points, while a bounded window is numerically exact, oracle-expressible
  and — with ``(1-α)^window`` below machine epsilon for any practical
  (α, window) — equal to the infinite form to full precision. Weights
  are pandas' ``adjust=True`` convention (normalized by the weight sum).
- **Interpolation** computes neighbor VALUES with IGNORE-NULLS
  first/last window functions and neighbor POSITIONS with running
  conditional min/max — all six window expressions share one
  (partition, order), so the whole operator is ONE exchange + ONE sort,
  no self-joins (a join-back formulation measured 9× slower at sf0.1).
- **Trend** is the classic closed-form least squares, computed by the
  built-in ``regr_slope``/``regr_intercept``/``corr`` aggregates (one
  partial-aggregated pass).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ewma(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    value_col: str,
    alpha: float = 0.3,
    window: int = 20,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Trailing-window exponentially weighted mean per key series:
    input columns + ``ewma``. ``order_cols`` breaks timestamp ties
    (default: the value column — callers with a row id should pass it)."""
    if not 0 < alpha <= 1:
        raise ValueError(f"alpha must be in (0, 1]: {alpha}")
    order = [F.col(ts_col)] + [F.col(c) for c in (order_cols or [value_col])]
    w = (Window.partitionBy(*keys).orderBy(*order)
         .rowsBetween(-(window - 1), 0))
    vals = F.collect_list(F.col(value_col).cast("double")).over(w)
    # weight position i (1-based, oldest first) by (1-α)^(n-i); normalize
    n = F.size(vals)
    num = F.aggregate(
        F.zip_with(vals, F.sequence(F.lit(1), n),
                   lambda v, i: v * F.pow(F.lit(1.0 - alpha), n - i)),
        F.lit(0.0), lambda acc, x: acc + x)
    den = F.aggregate(
        F.transform(F.sequence(F.lit(1), n),
                    lambda i: F.pow(F.lit(1.0 - alpha), n - i)),
        F.lit(0.0), lambda acc, x: acc + x)
    return df.withColumn("ewma", F.round(num / den, 6))


def interpolate_linear(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    value_col: str,
) -> DataFrame:
    """Fill null values by linear interpolation between the nearest
    observed neighbors within the key series (ordered by ``ts_col``).
    Leading/trailing gaps (no neighbor on one side) stay null. Adds
    ``interpolated`` (the filled series) and ``was_gap``."""
    rn_w = Window.partitionBy(*keys).orderBy(ts_col)
    d = df.withColumn("__rn", F.row_number().over(rn_w))
    obs = F.when(F.col(value_col).isNotNull(), F.col("__rn"))
    # BOTH neighbor sides as RUNNING (growing) frames — the "next" side
    # over a DESC ordering rather than an UNBOUNDED FOLLOWING frame,
    # which Spark re-evaluates from scratch per row (O(n²) per series;
    # measured 10× slower at sf0.1). Two sorts, each O(n log n):
    # the prev side reuses rn_w's (keys, ts) sort outright — running
    # rows-frames see the same physical order __rn was assigned in, so
    # the results are identical to ordering by __rn — and the two
    # expressions per side sit ADJACENT so CollapseWindow merges them
    # (the old rn/rn/val/val interleave planned 5 Window + 5 Sort
    # nodes; this plans 3 Window + 2 Sort).
    prev_w = rn_w.rowsBetween(Window.unboundedPreceding, -1)
    desc_w = (Window.partitionBy(*keys).orderBy(F.desc("__rn"))
              .rowsBetween(Window.unboundedPreceding, -1))
    d = (d.withColumn("__prev_rn", F.max(obs).over(prev_w))
          .withColumn("__prev_val",
                      F.last(value_col, ignorenulls=True).over(prev_w))
          .withColumn("__next_rn", F.min(obs).over(desc_w))
          .withColumn("__next_val",
                      F.last(value_col, ignorenulls=True).over(desc_w)))
    frac = ((F.col("__rn") - F.col("__prev_rn"))
            / (F.col("__next_rn") - F.col("__prev_rn")))
    # deliberately NOT rounded: the inputs are already 6-dp decimals, so
    # the IEEE result is bit-identical across engines, while rounding
    # would reintroduce drift (Spark rounds the shortest-decimal repr of
    # a double, DuckDB rounds its binary value — they disagree on exact
    # half-boundaries, which 6-dp inputs make common)
    filled = F.when(F.col(value_col).isNotNull(), F.col(value_col)) \
        .otherwise(F.col("__prev_val")
                   + (F.col("__next_val") - F.col("__prev_val")) * frac)
    return (d
            .withColumn("interpolated", filled)
            .withColumn("was_gap", F.col(value_col).isNull())
            .drop("__rn", "__prev_rn", "__next_rn",
                  "__prev_val", "__next_val"))


def fill_forward(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    value_col: str,
    limit: int | None = None,
    backward: bool = False,
) -> DataFrame:
    """Last-observation-carried-forward gap fill (pandas ``ffill``), the
    imputation sensor/finance pipelines default to when interpolation
    would invent trends. Adds ``filled`` and ``was_gap``.

    ``limit`` bounds how many consecutive rows one observation may fill
    (pandas ``ffill(limit=)``): beyond it the gap stays null — the
    staleness guard. ``backward=True`` is ``bfill`` (one DESC ordering of
    the same single-sort plan; leading gaps fill instead of trailing).

    Plan shape: ONE running window per series (row_number + ignorenulls
    last + observed-row max), no self-joins, no O(n²) re-evaluated frames
    — the same single-sort doctrine as :func:`interpolate_linear`.
    """
    order = F.desc(ts_col) if backward else F.asc(ts_col)
    rn_w = Window.partitionBy(*keys).orderBy(order)
    run_w = rn_w.rowsBetween(Window.unboundedPreceding, -1)
    d = df.withColumn("__rn", F.row_number().over(rn_w))
    obs_rn = F.when(F.col(value_col).isNotNull(), F.col("__rn"))
    d = (d.withColumn("__prev_val",
                      F.last(value_col, ignorenulls=True).over(run_w))
          .withColumn("__prev_rn", F.max(obs_rn).over(run_w)))
    ok = F.lit(True) if limit is None else \
        (F.col("__rn") - F.col("__prev_rn") <= limit)
    filled = F.when(F.col(value_col).isNotNull(), F.col(value_col)) \
        .when(ok, F.col("__prev_val"))
    return (d.withColumn("filled", filled)
             .withColumn("was_gap", F.col(value_col).isNull())
             .drop("__rn", "__prev_val", "__prev_rn"))


def group_trend(
    df: DataFrame,
    keys: list[str],
    x_col,
    y_col: str,
) -> DataFrame:
    """Per-group least-squares line + correlation: (keys…, n, slope,
    intercept, r). ``x_col`` may be a column name or Column expression
    (e.g. epoch seconds of a timestamp)."""
    x = (F.col(x_col) if isinstance(x_col, str) else x_col).cast("double")
    y = F.col(y_col).cast("double")
    return df.groupBy(*keys).agg(
        F.count(F.when(x.isNotNull() & y.isNotNull(), 1))
        .cast("bigint").alias("n"),
        F.round(F.regr_slope(y, x), 6).alias("slope"),
        F.round(F.regr_intercept(y, x), 6).alias("intercept"),
        F.round(F.corr(y, x), 6).alias("r"),
    )


def rolling_quantile(
    df: DataFrame,
    keys: list[str],
    order_cols: list[str],
    value_col: str,
    q: float = 0.5,
    window: int = 7,
    out_col: str = "rolling_q",
) -> DataFrame:
    """Exact rolling quantile (default: the rolling MEDIAN, the robust
    smoother a spiky series needs where a moving average chases
    outliers) over the trailing ``window`` rows per series.

    Spark's exact ``percentile`` evaluated as a window aggregate — no
    sketch, no UDF; selection + linear interpolation, so the result is
    engine-identical (no summation-order float drift) and DuckDB's
    ``quantile_cont`` twins it exactly. ``order_cols`` should end in a
    unique column (same tie-break doctrine as ``cusum_changepoints``).
    Frames re-evaluate per row, so cost is O(window) per row — bounded,
    scan-shaped, one sort per series partition; keep ``window`` modest
    (tens-hundreds), which is also where a rolling median is
    statistically meaningful."""
    w = Window.partitionBy(*keys).orderBy(*order_cols) \
        .rowsBetween(-(window - 1), 0)
    return df.withColumn(
        out_col, F.percentile(value_col, F.lit(float(q))).over(w))


def autocorrelation(
    df: DataFrame,
    keys: list[str],
    order_cols: list[str],
    value_col: str,
    max_lag: int = 5,
) -> DataFrame:
    """Sample autocorrelation per series at lags 1..``max_lag``:
    (keys…, lag, n, acf) — the standard diagnostic for seasonality /
    drift-vs-noise (an EWMA/CUSUM parameterization starts here).

    acf(l) = corr(x_t, x_{t−l}) over the lag-aligned pairs (the
    pairwise-complete convention). One window sort produces every lag
    column (lag exprs share the (partition, order)), then one unpivoted
    aggregation; rounded 6 dp under the repo float policy (same corr
    precedent as ``group_trend``)."""
    if max_lag < 1:
        raise ValueError(f"max_lag must be >= 1: {max_lag}")
    w = Window.partitionBy(*keys).orderBy(*order_cols)
    d = df
    for lag in range(1, max_lag + 1):
        d = d.withColumn(f"__l{lag}", F.lag(value_col, lag).over(w))
    stacked = d.select(
        *keys,
        F.col(value_col).cast("double").alias("__v"),
        F.explode(F.array(*[
            F.struct(F.lit(lag).alias("lag"),
                     F.col(f"__l{lag}").cast("double").alias("prev"))
            for lag in range(1, max_lag + 1)])).alias("p"),
    ).select(*keys, "__v", F.col("p.lag").alias("lag"),
             F.col("p.prev").alias("prev"))
    return (
        # pairwise-complete: BOTH ends of the pair must be non-null — n is
        # the sample size corr() actually uses, not just the lag side
        stacked.where(F.col("prev").isNotNull() & F.col("__v").isNotNull())
        .groupBy(*keys, "lag")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"),
             F.round(F.corr("__v", "prev"), 6).alias("acf"))
    )


def seasonal_decompose(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    value_col: str,
    period: int = 24,
) -> DataFrame:
    """Additive seasonal decomposition of a regularly-bucketed series per
    key group: ``value = trend + seasonal + resid``.

    - ``trend``: centered rows-based moving average over ±period//2
      neighbors, null where the frame is incomplete (series edges) — the
      classical moving-average trend, frame-deterministic on any engine.
    - ``seasonal``: the per-position mean of the detrended series
      (position = 0-based rank within the group mod ``period``), centered
      by the grand detrended mean. Both means run on the 6-dp-rounded
      detrended values scaled to exact bigints — the repo's decimal-exact
      profile (queries.py float-determinism policy), so partial-sum
      order can never move the 6th decimal (the q_corpus_card lesson).
    - ``resid``: what's left, only where trend exists.

    One exchange + one sort on (keys, order): the trend frame, position
    rank, and both unbounded partition means all share the window
    partitioning; at 100 TB this co-partitions with the resample that
    produced the buckets. STL's loess refinements don't fit one-pass SQL
    semantics — this is the moving-average decomposition both engines
    can agree on bit-for-bit, which is what an oracle-gated engine wants.
    """
    half = period // 2
    w = Window.partitionBy(*keys).orderBy(order_col)
    frame = w.rowsBetween(-half, half)
    grp = Window.partitionBy(*keys)
    v = F.col(value_col).cast("double")
    trend = F.when(
        F.count(value_col).over(frame) == 2 * half + 1,
        F.avg(value_col).over(frame))
    d = (df
         .withColumn("__pos", (F.row_number().over(w) - 1) % period)
         .withColumn("__trend", trend)
         .withColumn("__detr6",
                     F.round((v - F.col("__trend")) * 1e6, 0).cast("bigint")))
    pos_w = Window.partitionBy(*keys, "__pos")
    seasonal = (
        (F.sum("__detr6").over(pos_w) / F.count("__detr6").over(pos_w)
         - F.sum("__detr6").over(grp) / F.count("__detr6").over(grp))
        / 1e6)
    out = (d.withColumn("__seasonal", seasonal)
           .select(
               *keys, order_col,
               F.round(v, 6).alias("value"),
               F.round("__trend", 6).alias("trend"),
               F.round("__seasonal", 6).alias("seasonal"),
               F.round(v - F.col("__trend") - F.col("__seasonal"), 6)
               .alias("resid"),
           ))
    return out
