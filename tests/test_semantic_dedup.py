"""Semantics of operators/semantic_dedup.py (SemDeDup-style pruning)."""

from __future__ import annotations

import numpy as np
import pytest

from datapump_spark.operators.semantic_dedup import semantic_dedup


def _df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )


@pytest.fixture(scope="module")
def crafted(spark):
    # two near-dup groups ({0,1,2}, {3,4}) + two singletons; cosine
    # within-group > 0.99, across groups < 0.9
    g1 = [1.0, 0.0, 0.0]
    g2 = [0.0, 1.0, 0.0]
    vecs = [
        g1, [0.999, 0.01, 0.0], [0.998, 0.02, 0.0],
        g2, [0.01, 0.999, 0.0],
        [0.0, 0.0, 1.0],
        [0.7, 0.7, 0.1],
    ]
    return _df(spark, vecs)


def test_groups_found_single_cluster(crafted):
    rows = {r["vec_id"]: r for r in
            semantic_dedup(crafted, n_clusters=1, threshold=0.95).collect()}
    assert {rows[i]["rep_id"] for i in (0, 1, 2)} == {0}
    assert {rows[i]["rep_id"] for i in (3, 4)} == {3}
    assert rows[5]["rep_id"] == 5 and rows[6]["rep_id"] == 6
    kept = [i for i, r in rows.items() if r["keep"]]
    assert sorted(kept) == [0, 3, 5, 6]


def test_single_cluster_matches_brute_force(spark, sf_dir):
    """n_clusters=1 ≡ global transitive grouping of the exact pairwise
    cos ≥ t graph (computed here with numpy as an independent model)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    t = 0.5
    got = {r["vec_id"]: r["rep_id"] for r in
           semantic_dedup(emb, n_clusters=1, threshold=t).collect()}

    rows = sorted((r["vec_id"], np.asarray(r["embedding"], dtype="float64"))
                  for r in emb.collect())
    ids = np.array([i for i, _ in rows])
    M = np.vstack([v for _, v in rows])
    M = M / np.linalg.norm(M, axis=1, keepdims=True)
    S = M @ M.T
    n = len(ids)
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i, j in zip(*np.nonzero(S >= t)):
        if i < j:
            ri, rj = find(int(i)), find(int(j))
            if ri != rj:
                parent[max(ri, rj)] = min(ri, rj)
    want = {int(ids[i]): int(ids[find(i)]) for i in range(n)}
    assert got == want


def test_clustered_run_keeps_within_cluster_property(spark, sf_dir):
    """With real clustering: exactly one keeper per (cluster, rep) and
    every rep is a member of its own component."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    rows = semantic_dedup(emb, n_clusters=8, threshold=0.5).collect()
    assert len(rows) == emb.count()                      # one row per vector
    by_rep = {}
    for r in rows:
        by_rep.setdefault((r["cluster_id"], r["rep_id"]), []).append(r)
    for (cl, rep), members in by_rep.items():
        assert sum(m["keep"] for m in members) == 1
        assert rep == min(m["vec_id"] for m in members)  # min-id policy


def test_empty_input(spark):
    out = semantic_dedup(_df(spark, []).limit(0))
    assert out.count() == 0
    assert out.columns == ["vec_id", "cluster_id", "rep_id", "keep"]
