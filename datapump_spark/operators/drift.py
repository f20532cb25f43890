"""Distribution drift between two table snapshots (PSI / KL / TVD).

The monitoring primitive behind "did this week's data change shape?" —
run between a baseline snapshot and the current one (two sink versions,
train vs serve, yesterday vs today) and alert on the Population
Stability Index. Complements :mod:`datapump_spark.operators.diff`
(row-level delta) with a distribution-level delta.

Plan shape (scale analysis for 100 TB):
- one tiny min/max aggregate over the union to fix the bucket edges
  (skipped when ``lo``/``hi`` are passed — production monitors pin the
  edges from the baseline so runs are single-pass and comparable),
- one map-side-combined count aggregate on (group, bucket, side) —
  the only real shuffle, output rows bounded by
  |groups| × n_buckets × 2 regardless of input size,
- one final tiny aggregate folding buckets into the three divergence
  numbers per group.
Nothing driver-side grows with the data; the per-group state is
O(n_buckets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def distribution_drift(
    base: DataFrame,
    cur: DataFrame,
    col: str,
    group_cols: list[str] | None = None,
    n_buckets: int = 10,
    lo: float | None = None,
    hi: float | None = None,
    eps: float = 0.5,
) -> DataFrame:
    """Per-group drift of ``col``'s distribution from ``base`` to ``cur``.

    Buckets are ``n_buckets`` equal-width bins over [lo, hi] (computed
    from the union when not pinned; values outside clamp to the edge
    bins, so production runs with pinned edges never drop rows). Both
    sides are Laplace-smoothed with ``eps`` pseudo-counts per bucket so
    empty buckets don't blow up the logs.

    Returns one row per group: ``n_base``, ``n_cur``,
    ``psi``   = Σ (p−q)·ln(p/q)   (symmetric, the industry alert metric),
    ``kl``    = Σ q·ln(q/p)       (base→current divergence),
    ``tvd``   = ½ Σ |p−q|         (total variation distance),
    rounded to 6 decimals (sum over ≤ n_buckets doubles; ordering error
    is ~1e-15, far below the quantum — module float policy).
    """
    group_cols = group_cols or []
    if lo is None or hi is None:
        row = (
            base.select(F.col(col).alias("_v"))
            .unionAll(cur.select(F.col(col).alias("_v")))
            .agg(F.min("_v").alias("lo"), F.max("_v").alias("hi"))
            .first()
        )
        if row["lo"] is None and (lo is None or hi is None):
            raise ValueError(
                f"distribution_drift: no non-null {col!r} values and no "
                "pinned [lo, hi] — cannot place buckets")
        lo = float(row["lo"]) if lo is None else lo
        hi = float(row["hi"]) if hi is None else hi
    width = (hi - lo) / n_buckets or 1.0

    def tagged(df: DataFrame, side: str) -> DataFrame:
        bucket = F.least(
            F.lit(n_buckets - 1),
            F.greatest(F.lit(0), F.floor((F.col(col) - F.lit(lo)) / F.lit(width))),
        )
        return df.select(
            *group_cols,
            bucket.cast("int").alias("_bucket"),
            F.lit(side).alias("_side"),
        )

    counts = (
        tagged(base, "base")
        .unionAll(tagged(cur, "cur"))
        .groupBy(*group_cols, "_bucket")
        .agg(
            F.count(F.when(F.col("_side") == "base", 1)).alias("_nb"),
            F.count(F.when(F.col("_side") == "cur", 1)).alias("_nc"),
        )
    )
    # Totals per group via window-free second aggregate: fold bucket rows.
    tot = float(n_buckets) * eps
    folded = counts.groupBy(*group_cols).agg(
        F.sum("_nb").alias("n_base"),
        F.sum("_nc").alias("n_cur"),
        F.collect_list(F.struct("_bucket", "_nb", "_nc")).alias("_cells"),
    )
    # Probabilities need group totals, so compute divergences from the
    # collected (≤ n_buckets) cells with higher-order array folds — all
    # codegen, no second shuffle. Missing buckets contribute the smoothed
    # floor on both sides: (eps/T_b − eps/T_c)·ln((eps/T_b)/(eps/T_c)) etc.,
    # which is NOT zero when the groups have different totals, so account
    # for the n_missing = n_buckets − |cells| absent cells explicitly.
    # Composed as SQL text → ONE server-side parse (r13, guide §7.3, the
    # mediasniff/lsh_topk pattern): the Column-DSL lambdas built ~1.0 s
    # of py4j tree per call (measured; the eager range scan is 0.52 s by
    # comparison). Literals carry the D suffix so they parse as DOUBLE —
    # identical expressions, identical plan after parsing.
    tbs, tcs = f"(n_base + {tot!r}D)", f"(n_cur + {tot!r}D)"

    def p(nb: str) -> str:
        return f"(({nb} + {eps!r}D) / {tbs})"

    def q(nc: str) -> str:
        return f"(({nc} + {eps!r}D) / {tcs})"

    pm, qm = f"({eps!r}D / {tbs})", f"({eps!r}D / {tcs})"
    n_miss = f"CAST({n_buckets} - size(_cells) AS DOUBLE)"

    def fold(term_present: str, term_missing: str) -> str:
        return (f"(aggregate(_cells, 0.0D, (acc, c) -> acc + "
                f"{term_present}) + {n_miss} * ({term_missing}))")

    pb, qc = p("c._nb"), q("c._nc")
    psi = fold(f"({pb} - {qc}) * ln({pb} / {qc})",
               f"({pm} - {qm}) * ln({pm} / {qm})")
    kl = fold(f"{qc} * ln({qc} / {pb})", f"{qm} * ln({qm} / {pm})")
    tvd = fold(f"abs({pb} - {qc}) / 2", f"abs({pm} - {qm}) / 2")
    return folded.selectExpr(
        *[f"`{g}`" for g in group_cols],
        "CAST(n_base AS BIGINT) AS n_base",
        "CAST(n_cur AS BIGINT) AS n_cur",
        f"round({psi}, 6) AS psi",
        f"round({kl}, 6) AS kl",
        f"round({tvd}, 6) AS tvd",
    )


def time_split_drift(
    events: DataFrame,
    ts_col: str,
    col: str,
    group_cols: list[str] | None = None,
    n_buckets: int = 10,
) -> DataFrame:
    """Drift of ``col`` between the first and second half of the table's
    time range — the self-contained "did the tail of this feed change
    shape?" check. The midpoint is exact integer microsecond arithmetic
    (engine-portable); rows at exactly the midpoint fall in the second
    half."""
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    # One driver job instead of two (r12 optimization round, guide §1.2):
    # the value bucket edges distribution_drift would compute over
    # base ∪ cur are exactly min/max(col) over the non-null-ts rows
    # (null-ts rows fall out of BOTH halves' filters), so fold them into
    # the same tiny aggregate as the time range and pass them down pinned.
    val = F.when(us.isNotNull(), F.col(col))
    b = events.agg(F.min(us).alias("lo"), F.max(us).alias("hi"),
                   F.min(val).alias("vlo"), F.max(val).alias("vhi")).first()
    if b["lo"] is None:
        raise ValueError(
            "time_split_drift: no rows with a non-null timestamp — "
            "nothing to split")
    mid = b["lo"] + (b["hi"] - b["lo"]) // 2
    base = events.where(us < F.lit(mid))
    cur = events.where(us >= F.lit(mid))
    if b["vlo"] is None:
        # no non-null values in either half: keep the exact error path
        # (distribution_drift recomputes its union aggregate and raises)
        return distribution_drift(base, cur, col, group_cols, n_buckets)
    return distribution_drift(base, cur, col, group_cols, n_buckets,
                              lo=float(b["vlo"]), hi=float(b["vhi"]))


def cusum_changepoints(
    df: DataFrame,
    keys: list[str],
    ts_col: str | list[str],
    value_col: str,
    kappa: float = 0.5,
    h: float = 5.0,
    baseline: DataFrame | None = None,
) -> DataFrame:
    """Per-series CUSUM change-point detection (Page 1954): flag the
    points where the standardized series has drifted persistently from
    its mean — the within-series complement of the between-snapshot PSI
    monitor (:func:`distribution_drift`).

    Statistic via its prefix closed form, so the WHOLE computation is
    ordered window functions (no per-series iteration, no UDF):

        B_t  = Σ_{i≤t} (r_i ∓ κ)          (running sum)
        S⁺_t = B_t − min(0, min_{j<t} B_j) (running min)
        S⁻_t symmetric with (r_i + κ) and a running max

    where r is the series standardized by its 6-dp-rounded mean/stddev
    (rounded so the constant is engine-identical — the repo-wide float
    policy). No post-alarm reset: alarms are exceedance points of the
    unreset statistic, the form the closed form allows; at 100 TB each
    series sorts once inside its key partition and nothing else moves.

    ``baseline``: optional (keys…, mu, sd) frame giving the REFERENCE
    period statistics to standardize against (the production form — a
    shift relative to last month's baseline; rounded to 6 dp
    internally). Default standardizes against the full series itself, in
    which case a level shift makes BOTH segments deviations from the
    pooled mean and the first alarm may legitimately fire in the
    pre-shift segment.

    Returns one row per (keys): n_points, n_alarms, first_alarm_pos
    (1-based, null if clean), max_sp, max_sn (rounded 6 dp), status.

    ``status`` is ``'ok'`` for normally-standardized series. A series the
    CUSUM statistic CANNOT be computed for is still reported (never
    silently dropped — the degenerate cases are exactly the alert-worthy
    ones): ``'no_baseline'`` (series absent from ``baseline``; every
    point alarms, first_alarm_pos=1) and ``'zero_sd'`` (flat reference,
    sd=0 or null; any departure from mu is an infinite standardized
    shift, so points with value != mu alarm). Both report null
    max_sp/max_sn.
    """
    from pyspark.sql import Window

    # ts_col may be a LIST ending in a unique column: with duplicate
    # timestamps the window order (and with it every running sum) would
    # otherwise be engine/layout-dependent
    order_cols = [ts_col] if isinstance(ts_col, str) else list(ts_col)

    if baseline is not None:
        stats = baseline.select(
            *keys, F.round(F.col("mu"), 6).alias("__mu"),
            F.round(F.col("sd"), 6).alias("__sd"))
    else:
        stats = df.groupBy(*keys).agg(
            F.round(F.avg(value_col), 6).alias("__mu"),
            F.round(F.stddev_pop(value_col), 6).alias("__sd"))
    # LEFT join: a series missing from the baseline, or flat in it, must
    # surface as a flagged row, not vanish (they are the alert cases)
    j = df.join(F.broadcast(stats), keys, "left")
    w_ord = Window.partitionBy(*keys).orderBy(*order_cols)

    # null-safe: a user-supplied baseline can carry non-null mu with NULL
    # sd; ~(__sd > 0) would evaluate to SQL NULL there and the series
    # would fail BOTH where(degenerate) and where(~degenerate) — silently
    # dropped, the exact contract violation the docstring forbids
    degenerate = (F.col("__mu").isNull() | F.col("__sd").isNull()
                  | (F.col("__sd") <= 0))
    bad = j.where(degenerate).withColumn(
        "__alarm",
        F.col("__mu").isNull() | (F.col(value_col) != F.col("__mu")))
    bad_agg = (
        bad.withColumn("__pos", F.row_number().over(w_ord))
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_points"),
             F.sum(F.col("__alarm").cast("long")).alias("n_alarms"),
             F.min(F.when(F.col("__alarm"), F.col("__pos")))
             .alias("first_alarm_pos"),
             F.lit(None).cast("double").alias("max_sp"),
             F.lit(None).cast("double").alias("max_sn"),
             F.when(F.first(F.col("__mu").isNull()), F.lit("no_baseline"))
             .otherwise(F.lit("zero_sd")).alias("status")))

    d = j.where(~degenerate) \
        .withColumn("__r", (F.col(value_col) - F.col("__mu")) / F.col("__sd"))
    run = w_ord.rowsBetween(Window.unboundedPreceding, 0)
    bp = F.sum(F.col("__r") - kappa).over(run)
    bn = F.sum(F.col("__r") + kappa).over(run)
    # the extremum frame INCLUDES the current row: S_t = B_t − min_{j≤t}
    # B_j (with B_0 = 0 via the least/greatest), which is ≥ 0 — Page's
    # statistic is floored at zero; an exclusive frame would let S go
    # negative and understate max_sp/max_sn
    sp = bp - F.least(F.lit(0.0), F.min(bp).over(run))
    sn = F.greatest(F.lit(0.0), F.max(bn).over(run)) - bn
    d = (d.withColumn("__sp", sp).withColumn("__sn", sn)
          .withColumn("__pos", F.row_number().over(w_ord))
          .withColumn("__alarm",
                      (F.col("__sp") > h) | (F.col("__sn") > h)))
    ok_agg = (
        d.groupBy(*keys)
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_points"),
             F.sum(F.col("__alarm").cast("long")).alias("n_alarms"),
             F.min(F.when(F.col("__alarm"), F.col("__pos")))
             .alias("first_alarm_pos"),
             F.round(F.max("__sp"), 6).alias("max_sp"),
             F.round(F.max("__sn"), 6).alias("max_sn"),
             F.lit("ok").alias("status"))
    )
    return ok_agg.unionByName(bad_agg)
