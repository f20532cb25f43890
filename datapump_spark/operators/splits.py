"""Train/val/test splitting that respects near-duplicate structure.

Naive hash-splitting leaks: two near-duplicate documents can land in
train and test, and the model is then evaluated on (a paraphrase of)
its own training data (the contamination mechanism quantified by Lee et
al. 2021, "Deduplicating Training Data Makes Language Models Better").
The fix is to split by DUPLICATE CLUSTER, not by document: hash the
cluster id, so every member of a near-dup cluster rides together.

Plan shape: the split column is one scan-speed expression over the
(id, cluster_id) frame from near_dup_clusters — the clustering already
paid the dedup cost; the split itself adds zero shuffles. Deterministic
(salted key hash), so re-runs, backfills, and incremental additions
(via the incremental-dedup index) keep every existing doc in its split.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from datapump_spark.functions.hashing import hash63

_DENOM = 10_000


def split_expr(cluster_col: Column, splits: dict[str, float],
               salt: str = "split") -> Column:
    """CASE expression mapping a cluster id to a split name by salted
    hash threshold. ``splits`` fractions must sum to 1; boundaries are
    cumulative in the dict's insertion order."""
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1: {splits}")
    h = hash63(F.concat(F.lit(salt + ":"), cluster_col.cast("string"))) \
        % _DENOM
    expr = None
    acc = 0.0
    names = list(splits)
    for name in names[:-1]:
        acc += splits[name]
        bound = int(round(acc * _DENOM))
        expr = (F.when(h < bound, F.lit(name)) if expr is None
                else expr.when(h < bound, F.lit(name)))
    last = F.lit(names[-1])
    return last if expr is None else expr.otherwise(last)


def leakage_safe_split(
    clusters: DataFrame,
    splits: dict[str, float] | None = None,
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
    salt: str = "split",
) -> DataFrame:
    """(id, cluster_id, split): deterministic split assignment keyed on
    the CLUSTER id, so near-duplicates can never straddle a split
    boundary. ``clusters`` is the output of ``near_dup_clusters``
    (singleton docs are their own cluster and split independently)."""
    splits = splits or {"train": 0.9, "val": 0.05, "test": 0.05}
    return clusters.select(
        id_col, cluster_col,
        split_expr(F.col(cluster_col), splits, salt).alias("split"))
