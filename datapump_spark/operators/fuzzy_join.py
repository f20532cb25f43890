"""Blocked edit-distance similarity join (record-linkage / fuzzy dedup).

Extends the reference (SURVEY §2.9 — no string-similarity surface there).
The classic entity-resolution shape: a cheap *blocking* pass bounds the
candidate pair space, then the exact (expensive) ``levenshtein`` distance
runs only inside blocks.

Scale notes (100 TB):

- All-pairs levenshtein over N documents is O(N²·L²) — never. Blocking
  turns it into Σ_b |b|² over block sizes; the join is a plain equi-join
  on the block key, so Spark shuffles each side once on that key and AQE
  splits any skewed block.
- Length blocking here is *complete* for the length dimension: two
  strings within edit distance k differ by ≤ k in length (each edit
  changes length by ≤ 1), so with band width k their bands differ by
  ≤ 1. Only the probe side explodes into ``{band, band+1}`` (2 rows);
  the build side stays single — since the self-join plays every row in
  both roles, the ``band+1`` probe covers the band-below case in the
  swapped orientation. Every qualifying pair is generated 1–2×
  (canonical ``least/greatest`` order + ``distinct`` dedupes) and the
  build side is never duplicated. Residual in-block selectivity comes
  from the threshold'd levenshtein itself: Spark's 3-arg form abandons
  a cell early once the running distance exceeds k (O(k·L) not O(L²)).
- For corpora where length alone blocks poorly (everything is ~the same
  length), compose with a content block first — e.g. a MinHash band key
  from :mod:`.dedup_fuzzy` — and pass it as ``extra_block_col``; the
  plan shape is unchanged (one equi-join on a wider key).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def edit_distance_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_dist: int = 8,
    extra_block_col: str | Column | None = None,
) -> DataFrame:
    """All pairs within edit distance ``max_dist`` whose lengths fall in
    the same or adjacent length band (band width = ``max_dist``, which
    makes length blocking lossless — see module docstring). Returns
    ``(id_l, id_r, dist)`` with ``id_l < id_r``, one row per pair.
    """
    if max_dist < 1:
        raise ValueError("max_dist must be ≥ 1")
    xb = []
    if extra_block_col is not None:
        c = (extra_block_col if isinstance(extra_block_col, Column)
             else F.col(extra_block_col))
        xb = [c.alias("__xb")]
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("t"),
        F.floor(F.length(text_col) / F.lit(max_dist)).alias("__b"),
        *xb,
    )
    on = ["__band"] + (["__xb"] if xb else [])
    probe = base.select(
        F.col("id").alias("id_p"), F.col("t").alias("t_p"),
        F.explode(F.array(F.col("__b"), F.col("__b") + 1)).alias("__band"),
        *([F.col("__xb")] if xb else []),
    )
    build = base.select(
        F.col("id").alias("id_b"), F.col("t").alias("t_b"),
        F.col("__b").alias("__band"), *([F.col("__xb")] if xb else []),
    )
    swap = F.col("id_p") < F.col("id_b")
    pairs = (probe.join(build, on)
             .where(F.col("id_p") != F.col("id_b"))
             .select(
                 F.when(swap, F.col("id_p")).otherwise(F.col("id_b"))
                 .alias("id_l"),
                 F.when(swap, F.col("id_b")).otherwise(F.col("id_p"))
                 .alias("id_r"),
                 F.when(swap, F.col("t_p")).otherwise(F.col("t_b"))
                 .alias("t_l"),
                 F.when(swap, F.col("t_b")).otherwise(F.col("t_p"))
                 .alias("t_r"),
             ).distinct())
    return (pairs
            .withColumn("dist", F.levenshtein("t_l", "t_r", max_dist))
            .where(F.col("dist") >= 0)
            .select("id_l", "id_r", F.col("dist").cast("int").alias("dist")))
