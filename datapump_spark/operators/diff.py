"""Table diff: key-aligned comparison of two snapshots.

The operational complement of the versioned MERGE sink
(:mod:`datapump_spark.sinks.upsert`): given two table states (two
versions, a table vs its backfill, prod vs shadow), report what was
added, removed, or changed — the audit primitive behind "what did this
batch actually do?" and regression-diffing pipeline outputs.

Plan shape: ONE full-outer join on the key (both sides shuffle on it —
with both snapshots bucketed by the key, as sink tables are, it runs
shuffle-free) and per-row column comparisons via null-safe equality.
Output is only the differing rows; identical rows are filtered at the
join, so result size is the delta, not the table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_diff(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """(keys…, change_type ∈ added|removed|changed, changed_cols).

    ``added`` = in ``right`` only; ``removed`` = in ``left`` only;
    ``changed`` = present in both with at least one ``compare_cols``
    value differing (null-safe). ``changed_cols`` is the sorted
    comma-joined list of differing columns (empty for added/removed).
    Rows equal on every compared column are not emitted."""
    if compare_cols is None:
        compare_cols = [c for c in left.columns
                        if c in set(right.columns) and c not in keys]
    l = left.select(*keys, *[F.col(c).alias(f"__l_{c}")
                             for c in compare_cols],
                    F.lit(True).alias("__in_l"))
    r = right.select(*keys, *[F.col(c).alias(f"__r_{c}")
                              for c in compare_cols],
                     F.lit(True).alias("__in_r"))
    j = l.join(r, keys, "full_outer")
    diffs = F.array_sort(F.filter(
        F.array(*[
            F.when(~F.col(f"__l_{c}").eqNullSafe(F.col(f"__r_{c}")),
                   F.lit(c)).otherwise(F.lit(None))
            for c in compare_cols
        ]),
        lambda x: x.isNotNull(),
    ))
    change = (
        F.when(F.col("__in_l").isNull(), F.lit("added"))
        .when(F.col("__in_r").isNull(), F.lit("removed"))
        .when(F.size(diffs) > 0, F.lit("changed"))
    )
    return (
        j.withColumn("change_type", change)
        .where(F.col("change_type").isNotNull())
        .select(*keys, "change_type",
                F.when(F.col("change_type") == "changed",
                       F.array_join(diffs, ","))
                .otherwise(F.lit("")).alias("changed_cols"))
    )
