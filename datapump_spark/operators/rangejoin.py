"""Range / band joins: point-in-interval assignment as a broadcast join.

The classic shape: a big fact column (events.value, a timestamp, a score)
matched against a small table of [lo, hi) bands (rate tiers, SLA windows,
histogram buckets). Neither side shares an equi-key, so a naive join is a
cartesian product; the right strategy at scale depends on the band side:

- Small band table (the overwhelmingly common case): BROADCAST nested-loop
  join — each executor scans its fact partitions once against an in-memory
  band list; cost O(rows × bands) with zero shuffle of the fact side.
  `band_join` below pins this with an explicit broadcast hint.
- Large interval tables: bucketize both sides by a fixed stride covering
  the max interval width, equi-join on the bucket, then re-check the
  inequality — turns the product into a hash join (same trick as the
  minhash band join in dedup_fuzzy.py). `stride_interval_join` implements
  it; this is the 100 TB path when intervals number in the millions.

Reference has no joins at all (SURVEY §2.5); this is north-star surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def band_join(
    facts: DataFrame, bands: DataFrame, value_col: str,
    lo_col: str = "lo", hi_col: str = "hi", how: str = "inner",
) -> DataFrame:
    """Assign each fact row the band with ``lo <= value < hi``.

    Bands are broadcast (they are dim-sized by contract); with
    non-overlapping bands each fact row lands in ≤1 band, preserving
    cardinality. ``how='left_outer'`` keeps out-of-band rows with null
    band columns."""
    cond = (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    return facts.join(F.broadcast(bands), cond, how)


def stride_interval_join(
    facts: DataFrame, intervals: DataFrame, value_col: str,
    lo_col: str = "lo", hi_col: str = "hi", stride: float = 1.0,
) -> DataFrame:
    """Point-in-interval join for LARGE interval tables: both sides emit
    bucket keys of width ``stride`` (an interval spans ceil(width/stride)
    buckets), equi-join on bucket, then apply the exact containment
    predicate. ``stride`` should be ≥ the typical interval width so the
    explosion factor stays ~2×."""
    fb = facts.withColumn("__b", F.floor(F.col(value_col) / stride).cast("long"))
    iv = intervals.withColumn(
        "__bs",
        F.sequence(F.floor(F.col(lo_col) / stride).cast("long"),
                   F.floor((F.col(hi_col) - 1e-12) / stride).cast("long")),
    ).withColumn("__b", F.explode("__bs")).drop("__bs")
    joined = fb.join(iv, "__b").where(
        (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col)))
    return joined.drop("__b")
