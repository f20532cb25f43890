"""Incremental aggregate maintenance: keep a grouped rollup current by
merging per-batch partial states instead of recomputing from the full
history.

The materialized-view pattern every lakehouse pipeline needs at 100 TB:
the raw fact table is append-only and huge; the rollup (per key: count,
sum, min, max, and anything derivable from them, e.g. avg) must stay
fresh per batch. Recomputing touches all history every time — O(total);
merging touches only the new batch plus the state table — O(batch + |keys|).

Correct by algebra, not by trust: count/sum/min/max are commutative
monoids, so state(A ∪ B) == merge(state(A), state(B)) exactly — sums are
carried as DECIMAL(18,6) so the merge is bit-exact regardless of batch
order or partial-aggregation order (same policy as queries.py). The
oracle gate exploits this: the incrementally-merged result is
hash-compared against a from-scratch SQL aggregate over the full table.

Spark shape: merge = unionByName + groupBy re-aggregate. One shuffle on
the group keys; with the state table stored bucketed by the same keys,
only the batch side moves. avg/derived metrics are computed at
``finalize`` time from the state columns — never stored, so they are
always consistent with the mergeable parts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def agg_state(df: DataFrame, keys: list[str], measures: list[str]) -> DataFrame:
    """Partial-aggregate state for ``measures`` grouped by ``keys``:
    per measure `{m}_sum` (DECIMAL(18,6), exact), `{m}_cnt` (non-null
    count, so finalized means match SQL AVG under nulls), `{m}_min`,
    `{m}_max`, plus the shared row count ``n``."""
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n")]
    for m in measures:
        aggs += [
            F.sum(F.col(m).cast("decimal(18,6)")).alias(f"{m}_sum"),
            F.count(m).cast("bigint").alias(f"{m}_cnt"),  # nulls excluded
            F.min(m).alias(f"{m}_min"),
            F.max(m).alias(f"{m}_max"),
        ]
    return df.groupBy(*keys).agg(*aggs)


def merge_agg_state(states: list[DataFrame], keys: list[str],
                    measures: list[str]) -> DataFrame:
    """Fold any number of state frames into one: union + re-aggregate
    (sum of sums / sum of counts / min of mins / max of maxes). Keys
    absent from one side merge correctly because they simply contribute
    no rows to the union."""
    out = states[0]
    for s in states[1:]:
        out = out.unionByName(s)
    aggs = [F.sum("n").cast("bigint").alias("n")]
    for m in measures:
        aggs += [
            F.sum(f"{m}_sum").cast("decimal(18,6)").alias(f"{m}_sum"),
            F.sum(f"{m}_cnt").cast("bigint").alias(f"{m}_cnt"),
            F.min(f"{m}_min").alias(f"{m}_min"),
            F.max(f"{m}_max").alias(f"{m}_max"),
        ]
    return out.groupBy(*keys).agg(*aggs)


def finalize_agg(state: DataFrame, keys: list[str],
                 measures: list[str]) -> DataFrame:
    """Reader view over the state: exact double sums and round-6 means
    derived from the mergeable columns."""
    cols = [*keys, F.col("n")]
    for m in measures:
        cols += [
            F.col(f"{m}_sum").cast("double").alias(f"{m}_sum"),
            F.round(F.col(f"{m}_sum").cast("double") / F.col(f"{m}_cnt"), 6)
            .alias(f"{m}_avg"),
            F.col(f"{m}_min"),
            F.col(f"{m}_max"),
        ]
    return state.select(*cols)
