"""Incremental corpus deduplication — admit only novel documents from an
incoming batch into an existing corpus.

A growing pre-training corpus is never deduplicated from scratch: each
crawl/ingest batch is checked against the fingerprints of everything
already admitted, and only first-seen content enters. The reference has
the per-file flavor of this (`datapump.py:545-566` dedupes a file against
itself, then PK-upserts), this operator is the corpus-content flavor a
100 TB pipeline needs.

Scale design:

- The comparison key is a 16-byte md5 fingerprint of normalized text
  (:func:`~datapump_spark.operators.dedup_fuzzy.normalize_text`), never
  the text itself — the anti-join shuffles ids+hashes only.
- Within-batch winners come from one ``row_number`` over the fingerprint
  (batch-sized, cheap); novelty is a ``left_anti`` join against the
  corpus fingerprint *index*, not the corpus rows.
- At 100 TB the fingerprint index is a persisted table bucketed by
  fingerprint (``writeTo(...).partitionedBy(bucket(N, 'fp'))`` or
  ``DISTRIBUTE BY``): the daily batch (GBs) shuffles to meet it; the
  index (TBs) never moves. ``fingerprints()`` exposes exactly the frame
  to persist for that. AQE turns the anti-join into a broadcast when a
  small corpus makes that cheaper.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from datapump_spark.operators.dedup_fuzzy import normalize_text


def fingerprints(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Distinct content fingerprints of a corpus — the index an
    incremental pipeline persists (bucketed by ``fp``) between batches."""
    return df.select(
        F.md5(normalize_text(F.col(text_col))).alias("fp")
    ).distinct()


def incremental_dedup(
    batch: DataFrame,
    corpus_fps: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Rows of ``batch`` that are novel: not content-duplicates of the
    existing corpus and the first (lowest ``id_col``) occurrence of their
    content within the batch.

    ``corpus_fps`` is a one-column ``fp`` frame (from :func:`fingerprints`
    or the persisted index). Returns the surviving batch rows with their
    ``fp`` appended, so callers can append them straight onto the index.
    """
    fp = F.md5(normalize_text(F.col(text_col)))
    w = Window.partitionBy("fp").orderBy(F.col(id_col).asc())
    firsts = (
        batch.withColumn("fp", fp)
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    return firsts.join(corpus_fps.select("fp"), "fp", "left_anti")
