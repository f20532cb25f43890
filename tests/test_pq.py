"""Product quantization: training reduces distortion, ADC search recalls
the exact neighbors, codes/search are deterministic, scan is codegen."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from datapump_spark.operators.pq import (
    pq_encode,
    pq_reconstruction_mse,
    pq_topk,
    train_pq,
)
from datapump_spark.operators.similarity import cosine_topk

SF_DIR = "/root/testdata/sf0.001"
M, K = 8, 64


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


@pytest.fixture(scope="module")
def codebooks(emb):
    return train_pq(emb, m=M, k=K, lloyd_iters=3, dim=64)


def test_train_shape_and_determinism(emb, codebooks):
    assert codebooks.shape == (M, K, 64 // M)
    again = train_pq(emb, m=M, k=K, lloyd_iters=3, dim=64)
    assert np.array_equal(codebooks, again)


@pytest.mark.slow
# slow: the quality this asserts (k-means training lowers quantization
# MSE) is re-measured every round by scripts/ann_recall.py and the
# recall-gated PQ/IVF-PQ bench variants; codebook determinism and the
# ADC path stay default-gated in this file.
def test_training_reduces_mse(emb, codebooks):
    """More Lloyd rounds → monotone-ish distortion drop; trained codebooks
    beat the round-0 (id % k seeded) codebooks clearly."""
    cb0 = train_pq(emb, m=M, k=K, lloyd_iters=1, dim=64)
    mse0 = pq_reconstruction_mse(emb, cb0)
    mse3 = pq_reconstruction_mse(emb, codebooks)
    assert mse3 < mse0 * 0.9
    # unit vectors: quantizing everything to the origin scores exactly 1.0,
    # so a trained codebook must land clearly below that
    assert mse3 < 0.8


def test_encode_contract(emb, codebooks):
    codes = pq_encode(emb, codebooks).collect()
    assert len(codes) == emb.count()
    for r in codes:
        assert len(r["codes"]) == M
        assert all(0 <= c < K for c in r["codes"])
    again = {r["id"]: r["codes"] for r in pq_encode(emb, codebooks).collect()}
    assert all(again[r["id"]] == r["codes"] for r in codes)


def test_degenerate_vectors_dropped_not_crashing(spark, emb, codebooks):
    """Zero-norm and null vectors have no cosine direction: they must be
    dropped at normalization, not turned into all-null arrays that crash
    the numpy encode kernel and fail the whole job (old behavior)."""
    dim = len(emb.first()["embedding"])
    # 900003: a null ELEMENT — array_min/array_max ignore nulls, so only
    # the forall(isNotNull) guard catches it before it becomes an
    # all-null array out of the nullif division (round-6 regression).
    bad = spark.createDataFrame(
        [(900001, [0.0] * dim), (900002, None),
         (900003, [None] + [3.0] * (dim - 1))],
        "vec_id long, embedding array<double>")
    poisoned = emb.select("vec_id", "embedding").unionByName(bad)
    codes = pq_encode(poisoned, codebooks).collect()
    assert len(codes) == emb.count()          # all degenerate rows dropped
    ids = {r["id"] for r in codes}
    assert not ids & {900001, 900002, 900003}
    # end-to-end search over the poisoned corpus still completes
    out = pq_topk(poisoned, codebooks, k=5,
                  queries=poisoned.where(
                      (F.col("vec_id") < 3) | (F.col("vec_id") > 900000)))
    assert out.where(F.col("query_id").isin(900001, 900002)).count() == 0
    assert out.count() > 0


def test_adc_recall_vs_exact(emb, codebooks):
    """Pure-ADC scan gives a (coarse) recall floor; the two-stage layout
    (ADC shortlist → exact re-rank of k·8 rows) recovers most of it.
    Measured on this corpus: ~0.35 ADC-only, ~0.9 with re-rank."""
    k = 10
    exact = cosine_topk(emb, k=k, query_max_id=20)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}

    adc_only = pq_topk(emb, codebooks, k=k, query_max_id=20)
    a0 = {(r["query_id"], r["neighbor_id"]) for r in adc_only.collect()}
    assert len(e & a0) / len(e) >= 0.25

    rer = pq_topk(emb, codebooks, k=k, query_max_id=20, rerank_factor=8)
    a1 = {(r["query_id"], r["neighbor_id"]) for r in rer.collect()}
    assert len(e & a1) / len(e) >= 0.80
    assert len(e & a1) > len(e & a0)
    # every query answered with exactly k neighbors
    per_q = rer.groupBy("query_id").count().collect()
    assert len(per_q) == 20 and all(r["count"] == k for r in per_q)


def test_adc_scan_is_codegen(emb, codebooks, tmp_path):
    """With a precomputed codes table the query-time plan never runs
    Python over the corpus: no Arrow/Batch eval nodes."""
    path = str(tmp_path / "codes")
    pq_encode(emb, codebooks).write.parquet(path)
    codes = emb.sparkSession.read.parquet(path)
    out = pq_topk(emb, codebooks, k=5, query_max_id=5, codes=codes)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "MapInPandas" not in plan
    assert out.count() == 5 * 5


def test_train_fraction_sampling(emb):
    cb = train_pq(emb, m=M, k=K, lloyd_iters=2, dim=64, train_fraction=0.5)
    assert cb.shape == (M, K, 8)
    # codebooks trained on half the data still quantize the whole corpus
    assert pq_reconstruction_mse(emb, cb) < 0.8


@pytest.mark.slow  # recall floors gated in-default by
# test_adc_recall_vs_exact and per-round by scripts/ann_recall.py;
# index structure by test_ivfpq_candidate_generation_is_equi_join +
# test_ivfpq_external_queries (r9 tier move, suite-wall budget)
def test_ivfpq_recall_and_knobs(emb):
    """IVF-PQ composes cell pruning with code compression: recall tracks
    n_probe (the IVF knob) and re-rank (the PQ knob); probing all cells
    with re-rank approaches the exact answer."""
    exact = {(r["query_id"], r["neighbor_id"])
             for r in cosine_topk(emb, k=10, query_max_id=20).collect()}
    from datapump_spark.operators.pq import ivfpq_topk

    few = ivfpq_topk(emb, k=10, query_max_id=20, n_cells=16, n_probe=4,
                     rerank_factor=8)
    a_few = {(r["query_id"], r["neighbor_id"]) for r in few.collect()}
    all_cells = ivfpq_topk(emb, k=10, query_max_id=20, n_cells=16,
                           n_probe=16, rerank_factor=8)
    a_all = {(r["query_id"], r["neighbor_id"]) for r in all_cells.collect()}
    r_few = len(exact & a_few) / len(exact)
    r_all = len(exact & a_all) / len(exact)
    assert r_few >= 0.30, r_few
    assert r_all >= 0.75, r_all
    assert r_all > r_few
    per_q = all_cells.groupBy("query_id").count().collect()
    assert len(per_q) == 20 and all(r["count"] == 10 for r in per_q)


def test_ivfpq_candidate_generation_is_equi_join(emb):
    """The probe stage must never cross-join the corpus: candidates come
    from an equi-join on the cell id."""
    from datapump_spark.operators.pq import ivfpq_topk

    out = ivfpq_topk(emb, k=5, query_max_id=5, n_cells=8, n_probe=2,
                     rerank_factor=0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


@pytest.mark.slow
def test_ivfpq_deterministic(emb):
    from datapump_spark.operators.pq import ivfpq_topk

    a = ivfpq_topk(emb, k=5, query_max_id=10, n_cells=8, n_probe=4).collect()
    b = ivfpq_topk(emb.repartition(5), k=5, query_max_id=10, n_cells=8,
                   n_probe=4).collect()
    key = lambda r: (r["query_id"], r["neighbor_id"], r["score"])
    assert sorted(map(key, a)) == sorted(map(key, b))


def test_cell_partitioned_codes_prune_probe_reads(emb, tmp_path):
    """The at-scale IVF-PQ layout claim: codes stored partitionBy(cell)
    mean a probe touches only n_probe/n_cells of the files. Asserted on
    the actual scan plan's partition filters and file listing."""
    import re

    from pyspark.sql import functions as F

    from datapump_spark.operators.pq import pq_encode, train_pq
    from datapump_spark.operators.similarity import (
        _as_double,
        _assign_cells,
        _kmeans_centroids,
    )

    base = emb.select(F.col("vec_id").alias("id"),
                      _as_double("embedding").alias("v"))
    C = _kmeans_centroids(base, n_cells=8, lloyd_iters=1)
    cells = _assign_cells(base, C, n_probe=1).select(
        "id", F.col("cells")[0].alias("cell"))
    cb = train_pq(emb, m=4, k=8, lloyd_iters=1, dim=64)
    path = str(tmp_path / "codes_by_cell")
    pq_encode(emb, cb).join(cells, "id") \
        .write.partitionBy("cell").parquet(path)

    probe = emb.sparkSession.read.parquet(path).where(
        F.col("cell").isin(2, 5))
    plan = probe._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "cell" in m.group(1)
    # the scan's selected partitions really shrink to the probed cells
    files = probe.select(F.input_file_name().alias("f")).distinct().collect()
    touched = {re.search(r"cell=(\d+)", r["f"]).group(1) for r in files}
    assert touched <= {"2", "5"}
    assert probe.count() > 0


@pytest.mark.slow  # redundancy: q_ivfpq_topk is a recall-gated
# bench variant measured every round; the external-query shape
# re-check is full-tier-only (r12 tier move)
def test_ivfpq_external_queries(emb, spark):
    """External (id, vec) query frames are first-class (the rag_search
    contract): querying with a corpus row's own vector under a fresh
    negative id must retrieve that row first."""
    from pyspark.sql import functions as F

    from datapump_spark.operators.pq import ivfpq_topk

    probe = emb.where(F.col("vec_id").isin(3, 17)).select(
        (-F.col("vec_id")).alias("vec_id"), "embedding")
    hits = ivfpq_topk(emb, k=1, n_cells=8, n_probe=8, rerank_factor=8,
                      queries=probe).collect()
    got = {r["query_id"]: r["neighbor_id"] for r in hits}
    assert got == {-3: 3, -17: 17}
    assert all(r["score"] >= 0.999999 for r in hits)
