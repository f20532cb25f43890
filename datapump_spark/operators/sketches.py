"""Sketch-based approximate profiling — the 100 TB answer to "describe".

The exact profiling operators (:mod:`.describe`, :mod:`.mode`) are the
reference-parity surface; at 100 TB an exact ``count_distinct`` or exact
``percentile`` over every column is a full shuffle of every distinct
value per column. The sketch versions are one-pass, partially
aggregable, fixed-memory alternatives Spark ships natively:

- ``approx_count_distinct`` — HyperLogLog++ (Heule et al. 2013): each
  executor keeps a 2^p-register sketch, partial states merge
  associatively, error ≈ 1.04/√2^p, independent of cardinality.
- ``approx_percentile`` — a positional quantile sketch (GK-style) with a
  caller-set ``accuracy``: rank error ≤ 1/accuracy, merged map-side like
  any aggregate.

Both run in the SAME single aggregation pass as plain count/avg/min/max,
so a full-table profile costs one scan + one tiny exchange of sketch
state (kilobytes per group), never a per-column distinct shuffle.

Approximate answers cannot hash-match a DuckDB oracle (different sketch
implementations); the error BOUNDS are graded in tests against the
exact operators at test scale instead — the same rows-only contract as
the ANN paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_profile(
    df: DataFrame,
    group_cols: list[str] | None = None,
    num_cols: list[str] | None = None,
    rsd: float = 0.05,
    accuracy: int = 10_000,
    percentiles: tuple[float, ...] = (0.5, 0.95),
) -> DataFrame:
    """One row per group: row count, HLL distinct + sketch percentiles
    per numeric column. ``rsd`` = target relative std-dev of the HLL
    estimate; ``accuracy`` = 1/max-rank-error of the percentile sketch."""
    if num_cols is None:
        num_cols = [f.name for f in df.schema.fields
                    if f.dataType.typeName() in
                    ("long", "integer", "double", "float", "short")]
    aggs = [F.count("*").cast("bigint").alias("n_rows")]
    for c in num_cols:
        aggs.append(F.approx_count_distinct(c, rsd).alias(f"ndv_{c}"))
        for p in percentiles:
            aggs.append(
                F.percentile_approx(c, F.lit(p), F.lit(accuracy))
                .cast("double").alias(f"p{int(p * 100)}_{c}"))
    g = df.groupBy(*group_cols) if group_cols else df.groupBy()
    return g.agg(*aggs)


def equidepth_histogram(
    df: DataFrame,
    value_col: str,
    n_buckets: int = 10,
) -> DataFrame:
    """Equi-depth (equal-frequency) histogram: (bucket, n, lo, hi).

    The scalable formulation: ONE aggregate computes the exact
    percentile cutpoints (linear interpolation, the same profile the
    describe operator uses), the cutpoint array broadcasts, and bucket
    assignment is a scan-speed expression (count of cutpoints strictly
    below the value — ties land in the lower bucket) feeding one
    groupBy. The naive ``ntile()`` needs a GLOBAL sort through a single
    partition; this never sorts at all. Bucket counts are only
    approximately equal when heavy ties straddle a cutpoint — inherent
    to equi-depth, not an implementation artifact."""
    if n_buckets < 2:
        raise ValueError(f"need >= 2 buckets: {n_buckets}")
    fracs = [i / n_buckets for i in range(1, n_buckets)]
    cuts = df.agg(F.expr(
        f"percentile({value_col}, array({', '.join(map(repr, fracs))}))"
    ).alias("__cuts"))
    bucket = F.size(F.filter(
        F.col("__cuts"), lambda c: F.col(value_col) > c)).cast("int")
    return (
        df.where(F.col(value_col).isNotNull())
        .crossJoin(F.broadcast(cuts))
        .withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(F.count("*").cast("bigint").alias("n"),
             F.min(value_col).alias("lo"),
             F.max(value_col).alias("hi"))
    )


def exact_profile(
    df: DataFrame,
    group_cols: list[str] | None = None,
    num_cols: list[str] | None = None,
    percentiles: tuple[float, ...] = (0.5, 0.95),
) -> DataFrame:
    """Exact twin of :func:`approx_profile` (same shape, exact
    aggregates) — the test baseline, and the small-data path."""
    if num_cols is None:
        num_cols = [f.name for f in df.schema.fields
                    if f.dataType.typeName() in
                    ("long", "integer", "double", "float", "short")]
    aggs = [F.count("*").cast("bigint").alias("n_rows")]
    for c in num_cols:
        aggs.append(F.count_distinct(c).alias(f"ndv_{c}"))
        for p in percentiles:
            aggs.append(
                F.expr(f"percentile({c}, {p})")
                .cast("double").alias(f"p{int(p * 100)}_{c}"))
    g = df.groupBy(*group_cols) if group_cols else df.groupBy()
    return g.agg(*aggs)


def hll_rollup_sketches(
    df: DataFrame,
    group_cols: list[str],
    col: str,
    lg_k: int = 12,
) -> DataFrame:
    """Per-group HLL sketch STATES (Apache DataSketches binary), the
    mergeable cube cell: ``(group_cols..., n_rows, hll)``.

    Persist this frame once per fine grain (e.g. per day × type); every
    coarser rollup then comes from :func:`hll_rollup_estimate` WITHOUT
    rescanning base data — the sketch-cube pattern that makes repeated
    distinct-count reporting affordable at 100 TB (registers are a few
    KB per cell vs a distinct shuffle of every value). HLL union takes
    the register-wise max, so rolled-up estimates are *identical* to
    sketching the raw union — pinned bit-exact in tests."""
    return (df.groupBy(*group_cols)
            .agg(F.count("*").cast("bigint").alias("n_rows"),
                 F.hll_sketch_agg(col, F.lit(lg_k)).alias("hll")))


def hll_rollup_estimate(
    sketches: DataFrame,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Roll persisted sketch states up to ``keep_cols`` (None = grand
    total): ``(keep_cols..., n_rows, ndv)``. Touches only the sketch
    frame — kilobytes per cell, never the base table."""
    g = sketches.groupBy(*keep_cols) if keep_cols else sketches.groupBy()
    return g.agg(
        F.sum("n_rows").cast("bigint").alias("n_rows"),
        F.hll_sketch_estimate(F.hll_union_agg("hll")).alias("ndv"))


def heavy_hitters(
    df: DataFrame,
    col: str,
    phi: float = 0.001,
    capacity: int | None = None,
    exact_counts: bool = True,
) -> DataFrame:
    """All items of ``col`` with frequency > ``phi``·N, via a two-pass
    distributed Misra-Gries — the heavy-hitter pattern that works when
    the domain (tokens, URLs, user ids) is too large to GROUP BY whole.

    Pass 1 folds each partition into ≤ ``capacity`` (item, weight)
    counters with the mergeable-summaries MG merge (add a batch's
    counts, then subtract the (capacity+1)-th largest weight and drop
    non-positives — Agarwal et al. 2012): total undercount of any item
    is ≤ n_partition/(capacity+1), so summing over partitions, every
    item with true count > N/(capacity+1) survives in at least one
    partition summary. With ``capacity ≥ 1/phi`` (default 2/phi) the
    candidate set is a SUPERSET of the true phi-heavy hitters, and it
    is at most capacity × n_partitions rows — kilobytes, broadcastable.

    Pass 2 (``exact_counts=True``) re-scans with a broadcast semi join
    on the candidates and counts them exactly, so the result EQUALS the
    exact ``GROUP BY … HAVING count > phi·N`` — but the shuffle carries
    only candidate rows, never the full domain. At 100 TB that is the
    difference between shuffling ~10^11 distinct tokens and shuffling a
    few thousand. ``exact_counts=False`` returns one pass with summed
    lower-bound weights instead (``w_lower`` ∈ [true − N/(cap+1), true]).
    """
    if capacity is None:
        capacity = max(int(2.0 / phi), 64)
    cap = capacity

    def mg(batches):
        import numpy as np
        import pandas as pd
        from collections import Counter

        counters: Counter = Counter()
        for pdf in batches:
            for item, cnt in pdf["item"].value_counts().items():
                counters[item] += int(cnt)
            if len(counters) > cap:
                arr = np.fromiter(counters.values(), dtype=np.int64)
                d = int(np.partition(arr, -(cap + 1))[-(cap + 1)])
                counters = Counter(
                    {k: v - d for k, v in counters.items() if v > d})
        yield pd.DataFrame(
            {"item": list(counters.keys()),
             "w_lower": np.fromiter(counters.values(), dtype=np.int64,
                                    count=len(counters))})

    items = df.select(F.col(col).cast("string").alias("item")) \
        .where(F.col(col).isNotNull())
    summaries = items.mapInPandas(mg, "item string, w_lower long")
    candidates = summaries.groupBy("item").agg(
        F.sum("w_lower").cast("bigint").alias("w_lower"))
    if not exact_counts:
        return candidates
    total = items.agg(F.count("*").alias("_n"))
    return (
        items.join(F.broadcast(candidates.select("item")), "item")
        .groupBy("item")
        .agg(F.count("*").cast("bigint").alias("cnt"))
        .crossJoin(F.broadcast(total))
        .where(F.col("cnt") > F.lit(phi) * F.col("_n"))
        .select("item", "cnt")
    )
