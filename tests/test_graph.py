"""Fixed-point PageRank: exactness vs an independent Python recurrence,
structural sanity, and checkpointed-lineage equivalence."""

from __future__ import annotations

import pytest

from datapump_spark.operators.graph import SCALE, pagerank


def _python_pagerank(edges, n_iter, damping_pct=85, scale=SCALE):
    """Independent reference: same integer recurrence, plain dicts."""
    edges = sorted(set(edges))
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    n = len(nodes)
    out_deg = {}
    for s, _ in edges:
        out_deg[s] = out_deg.get(s, 0) + 1
    rank = {v: scale // n for v in nodes}
    base = ((100 - damping_pct) * (scale // n)) // 100
    for _ in range(n_iter):
        inc = {v: 0 for v in nodes}
        for s, d in edges:
            inc[d] += rank[s] // out_deg[s]
        rank = {v: base + (damping_pct * inc[v]) // 100 for v in nodes}
    return rank


EDGES = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("d", "a")]


@pytest.mark.parametrize("n_iter", [1, 3, 7])
def test_matches_python_reference_exactly(spark, n_iter):
    df = spark.createDataFrame(EDGES, "src string, dst string")
    got = {r["node"]: r["rank"]
           for r in pagerank(df, n_iter=n_iter).collect()}
    assert got == _python_pagerank(EDGES, n_iter)


def test_star_graph_center_wins(spark):
    star = [(f"leaf{i}", "center") for i in range(10)] + \
           [("center", f"leaf{i}") for i in range(10)]
    df = spark.createDataFrame(star, "src string, dst string")
    ranks = {r["node"]: r["rank"] for r in pagerank(df, n_iter=5).collect()}
    assert ranks["center"] == max(ranks.values())
    leaf_ranks = {v for k, v in ranks.items() if k != "center"}
    assert len(leaf_ranks) == 1  # symmetric leaves tie exactly


def test_mass_approximately_conserved(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string")
    total = sum(r["rank"] for r in pagerank(df, n_iter=3).collect())
    # no dangling nodes in EDGES (every node has out-edges), so the only
    # loss is integer-division truncation: a few units per node per round
    assert abs(total - SCALE) < 1000


@pytest.mark.slow
def test_checkpoint_path_identical(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string")
    a = {r["node"]: r["rank"]
         for r in pagerank(df, n_iter=6, checkpoint_every=2).collect()}
    b = {r["node"]: r["rank"]
         for r in pagerank(df, n_iter=6, checkpoint_every=100).collect()}
    assert a == b


def test_duplicate_edges_ignored(spark):
    df = spark.createDataFrame(EDGES + EDGES[:2], "src string, dst string")
    got = {r["node"]: r["rank"] for r in pagerank(df, n_iter=3).collect()}
    assert got == _python_pagerank(EDGES, 3)


def test_triangle_stats_hand_graph(spark):
    """K4 plus a pendant vertex: every K4 node sits in C(3,2)=3
    triangles; the pendant sits in none."""
    from pyspark.sql import functions as F

    from datapump_spark.operators.graph import triangle_stats

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    edges = spark.createDataFrame(
        k4 + [(3, 9), (9, 3)],  # duplicate reversed edge must not double
        "src long, dst long")
    got = {r["node"]: r for r in triangle_stats(edges).collect()}
    for n in range(3):
        assert got[n]["n_triangles"] == 3 and got[n]["degree"] == 3
        assert got[n]["clustering_coeff"] == 1.0
    assert got[3]["degree"] == 4 and got[3]["n_triangles"] == 3
    assert got[3]["clustering_coeff"] == round(2 * 3 / (4 * 3), 6)
    assert got[9]["n_triangles"] == 0 and got[9]["clustering_coeff"] == 0.0
    # plan: equi-joins only
    plan = triangle_stats(edges)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_triangle_stats_triangle_free_graph(spark):
    from datapump_spark.operators.graph import triangle_stats

    # a path graph has no triangles
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(6)], "src long, dst long")
    got = triangle_stats(edges).collect()
    assert all(r["n_triangles"] == 0 for r in got)
    assert {r["node"] for r in got} == set(range(7))
