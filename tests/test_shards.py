"""Training-shard sink: determinism vs input layout, completeness, order."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datapump_spark.sinks.shards import read_training_shard, write_training_shards


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "lang")


def _shard_orders(spark, path, n):
    out = {}
    for k in range(n):
        rows = read_training_shard(spark, path, k).select("doc_id").collect()
        out[k] = [r.doc_id for r in rows]
    return out


def test_complete_and_deterministic_vs_layout(spark, docs, tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    write_training_shards(docs, a, "doc_id", 4)
    write_training_shards(docs.repartition(13), b, "doc_id", 4)
    oa, ob = _shard_orders(spark, a, 4), _shard_orders(spark, b, 4)
    assert oa == ob  # layout-independent permutation
    all_ids = sorted(i for v in oa.values() for i in v)
    assert all_ids == sorted(r.doc_id for r in docs.collect())  # exactly once


def test_shards_balanced_and_order_decorrelated(spark, docs, tmp_path):
    p = str(tmp_path / "s")
    n = 4
    write_training_shards(docs, p, "doc_id", n)
    orders = _shard_orders(spark, p, n)
    total = sum(len(v) for v in orders.values())
    for v in orders.values():
        assert len(v) > 0.5 * total / n  # no empty / wildly skewed shard
    # the permutation is not doc_id order (hash order)
    assert any(v != sorted(v) for v in orders.values())


def test_partition_pruning(spark, docs, tmp_path):
    p = str(tmp_path / "s")
    write_training_shards(docs, p, "doc_id", 4)
    plan = read_training_shard(spark, p, 2)._jdf.queryExecution().executedPlan().toString()
    assert "shard" in plan
    # pruned scan reads one of four partitions
    pruned = spark.read.parquet(p).where(F.col("shard") == 2)
    assert pruned.count() == len(_shard_orders(spark, p, 4)[2])


def test_bad_n_shards(docs, tmp_path):
    with pytest.raises(ValueError):
        write_training_shards(docs, str(tmp_path / "x"), "doc_id", 0)
