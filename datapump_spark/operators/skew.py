"""Skew-handling primitives: salted two-stage aggregation and a salted
replicated join.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime; these operators are for the cases AQE can't fix:

- ``salted_agg``: a groupBy where one key holds a huge share of rows still
  funnels that key's partials into ONE reducer. Salting fans the hot key
  across ``n_salts`` reducers (stage 1), then combines the per-salt
  partials (stage 2 — n_salts rows per key, trivial). Only works for
  algebraic aggregates (sum/count/min/max → avg), which is exactly what
  the engine's mean-centric stats need.
- ``salted_join``: fact⋈dim where a few fact keys dominate: salt the fact
  side, replicate the dim side ``n_salts``× with an exploded salt column,
  join on (key, salt). Converts one overwhelmed reducer into n_salts even
  ones at the cost of replicating the (small) right side.

Both are deterministic — the salt is a hash of stable columns, not a
random number, so retries and speculative tasks agree.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt(cols: Sequence[str], n_salts: int) -> Column:
    """Deterministic salt in [0, n_salts) from row content (xxhash64 of the
    salt-source columns — engine-internal, never compared cross-engine)."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(n_salts))


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    n_salts: int = 16,
    salt_source: Sequence[str] | None = None,
) -> DataFrame:
    """Two-stage skew-safe aggregation: (keys…, n, sum_value, avg_value).

    Stage 1 groups by (keys, salt) — the hot key's rows spread over
    ``n_salts`` reducers; stage 2 combines the ≤ n_salts partial rows per
    key. Output equals a plain groupBy exactly: ``n`` counts rows,
    ``avg_value`` divides by the NON-NULL value count (like ``F.avg``),
    and sum/count are algebraic so no precision drift vs avg-of-avgs.

    Default salt source = all columns: salting by the value alone gives
    zero spreading when the hot key's values are constant (the canonical
    skew case)."""
    salt_src = list(salt_source) if salt_source else list(df.columns)
    stage1 = (
        df.withColumn("__salt", _salt(salt_src, n_salts))
        .groupBy(*keys, "__salt")
        .agg(F.count(F.lit(1)).alias("__n"),
             F.count(value_col).alias("__nv"),
             F.sum(value_col).alias("__s"))
    )
    return (
        stage1.groupBy(*keys)
        .agg(F.sum("__n").alias("n"), F.sum("__nv").alias("__nv"),
             F.sum("__s").alias("sum_value"))
        .withColumn("avg_value",
                    F.when(F.col("__nv") > 0, F.col("sum_value") / F.col("__nv")))
        .drop("__nv")
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    n_salts: int = 16,
    fact_salt_source: Sequence[str] | None = None,
) -> DataFrame:
    """Skew-safe equi-join: salt the fact side, replicate the dim side.

    The dim side is exploded ``n_salts``× (fine for dimension tables; for
    fact-fact skew use AQE skew-join or bucketing instead). Join columns
    ``__salt`` are dropped from the output; key columns are kept from both
    sides like a plain equi-join."""
    # default salt source = ALL fact columns: salting by the join key alone
    # would give every row of the hot key the same salt (no spreading)
    salt_src = list(fact_salt_source) if fact_salt_source else list(fact.columns)
    f_salted = fact.withColumn("__salt", _salt(salt_src, n_salts))
    d_rep = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("__salt", F.col("__salt").cast("bigint"))
    out = f_salted.join(
        d_rep,
        (f_salted[fact_key] == d_rep[dim_key]) & (f_salted["__salt"] == d_rep["__salt"]),
    )
    return out.drop("__salt")
