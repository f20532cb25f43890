"""Bloom-filter membership pruning (operators/bloom.py): guarantees
(no false negatives), bounds (fp rate), codegen purity, and exactness of
the composed dedup vs the plain anti-join path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datapump_spark.operators.bloom import (
    MAX_WORDS,
    bloom_incremental_dedup,
    build_bloom,
    optimal_params,
    with_bloom_contains,
)

SF_DIR = "/root/testdata/sf0.001"


def test_optimal_params_standard_sizing():
    m, k = optimal_params(1_000_000, 0.01)
    assert 9_000_000 < m < 10_500_000      # ~9.6 bits/item at 1%
    assert k in (6, 7)
    assert m % 64 == 0
    # degenerate inputs stay sane
    m, k = optimal_params(0, 0.01)
    assert m >= 64 and k >= 1


def test_no_false_negatives_and_fp_bound(spark):
    members = spark.range(5_000).select(
        F.concat(F.lit("key-"), F.col("id")).alias("key"))
    bloom = build_bloom(members, "key", fpp=0.01)
    # every indexed key MUST probe true
    hit = with_bloom_contains(members, bloom, "key")
    assert hit.where(~F.col("bloom_maybe")).count() == 0
    # non-members probe true at ~fpp — allow 3x slack on 5k trials
    others = spark.range(5_000).select(
        F.concat(F.lit("other-"), F.col("id")).alias("key"))
    fp = with_bloom_contains(others, bloom, "key") \
        .where(F.col("bloom_maybe")).count()
    assert fp / 5_000 < 0.03, f"false-positive rate {fp / 5_000}"


def test_null_keys_probe_null(spark):
    members = spark.range(100).select(F.col("id").cast("string").alias("key"))
    bloom = build_bloom(members, "key")
    rows = with_bloom_contains(
        spark.createDataFrame([("5",), (None,)], "key string"),
        bloom, "key").collect()
    got = {r["key"]: r["bloom_maybe"] for r in rows}
    assert got["5"] is True
    assert got[None] is None  # three-valued, like SQL IN


def test_probe_is_codegen_only(spark):
    members = spark.range(1_000).select(F.col("id").alias("key"))
    bloom = build_bloom(members, "key")
    plan = with_bloom_contains(members, bloom, "key") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "MapInPandas" not in plan


def test_oversized_bitmap_raises(spark):
    tiny = spark.range(10).select(F.col("id").alias("key"))
    with pytest.raises(ValueError, match="shard the index"):
        # claim a huge item count to force m past the cap
        build_bloom(tiny, "key", n_items=MAX_WORDS * 64, fpp=1e-9)


def test_bloom_dedup_equals_exact_path(spark):
    """The filter only prunes the anti-join input — the composed output
    must equal operators.incremental.incremental_dedup row-for-row."""
    from datapump_spark.operators.incremental import (
        fingerprints,
        incremental_dedup,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text", "lang", "source")
    corpus = docs.where(F.col("doc_id") % 10 != 0)
    batch = (docs.where(F.col("doc_id") % 10 == 0)
             .unionByName(corpus.where(F.col("doc_id") % 7 == 0)
                          .withColumn("doc_id", F.col("doc_id") + 1_000_000)))
    fps = fingerprints(corpus)
    cols = ["fp", "doc_id", "text", "lang", "source"]
    exact = sorted(map(tuple, incremental_dedup(batch, fps)
                       .select(*cols).collect()))
    bloomed = sorted(map(tuple, bloom_incremental_dedup(batch, fps)
                         .select(*cols).collect()))
    assert bloomed == exact
    assert len(exact) > 0


def test_bloom_dedup_keeps_null_text_rows(spark):
    """A null text fingerprints to null, so the bloom probe is null
    (three-valued); null verdicts must route through the anti-join side
    and survive — identical to the exact path, which keeps one null-fp
    winner per batch."""
    from datapump_spark.operators.incremental import (
        fingerprints,
        incremental_dedup,
    )

    batch = spark.createDataFrame(
        [(1, "alpha"), (2, None), (3, None), (4, "beta")],
        "doc_id bigint, text string")
    corpus = spark.createDataFrame([(99, "beta")],
                                   "doc_id bigint, text string")
    fps = fingerprints(corpus)
    exact = sorted(r["doc_id"] for r in
                   incremental_dedup(batch, fps).collect())
    bloomed = sorted(r["doc_id"] for r in
                     bloom_incremental_dedup(batch, fps).collect())
    assert bloomed == exact
    assert 2 in bloomed  # the null-text winner survives


@pytest.mark.slow
def test_bloom_dedup_high_fpp_still_exact(spark):
    """Even a deliberately lousy filter (fpp=0.5 — most rows take the
    anti-join path) cannot change the answer, only the pruning rate."""
    from datapump_spark.operators.incremental import (
        fingerprints,
        incremental_dedup,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .select("doc_id", "text").limit(300)
    corpus = docs.where(F.col("doc_id") % 2 == 0)
    batch = docs.where(F.col("doc_id") % 2 == 1) \
        .unionByName(corpus.withColumn("doc_id", F.col("doc_id") + 10_000))
    fps = fingerprints(corpus)
    exact = {r["doc_id"] for r in incremental_dedup(batch, fps).collect()}
    loose = {r["doc_id"] for r in
             bloom_incremental_dedup(batch, fps, fpp=0.5).collect()}
    assert loose == exact
