"""Incremental corpus dedup (operators/incremental.py)."""

from __future__ import annotations

from datapump_spark.operators.incremental import fingerprints, incremental_dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_incremental_dedup_drops_corpus_and_batch_dups(spark):
    corpus = _docs(spark, [(1, "the cat sat"), (2, "dogs bark loudly")])
    batch = _docs(spark, [
        (10, "an entirely new document"),
        (11, "The CAT sat!"),            # corpus dup (normalization)
        (12, "an entirely new document"),  # in-batch dup of 10
        (13, "another novel text"),
    ])
    out = incremental_dedup(batch, fingerprints(corpus))
    kept = {r.doc_id for r in out.collect()}
    assert kept == {10, 13}
    assert set(out.columns) == {"fp", "doc_id", "text"}


def test_incremental_dedup_in_batch_keeps_lowest_id(spark):
    corpus = _docs(spark, [])
    batch = _docs(spark, [(5, "same text"), (3, "same text"), (9, "same text")])
    out = incremental_dedup(batch, fingerprints(corpus)).collect()
    assert [r.doc_id for r in out] == [3]


def test_fingerprints_distinct(spark):
    df = _docs(spark, [(1, "a b"), (2, "A, b"), (3, "c")])
    assert fingerprints(df).count() == 2
