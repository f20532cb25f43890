"""Distributed PageRank over an edge DataFrame, in fixed-point integer
arithmetic.

Why integers: float PageRank is not reproducible across engines (partial-
sum order changes the low bits every iteration, and the drift compounds),
so this implementation keeps ranks as scaled BIGINTs — rank 1.0 ==
``scale``. Every step is integer multiply/divide/sum, which is exact and
order-independent, so a fixed iteration count produces the SAME bits on
Spark and on the DuckDB oracle (unrolled CTEs). Precision loss per
division is ≤1/scale ≈ 1e-12 of total mass — far below ranking relevance.

Spark-first shape, per iteration:
- contributions = edges ⋈ ranks (hash join on src) with ``rank div out_deg``
- incoming = groupBy(dst).sum — map-side partial combine does most work
- new ranks = nodes left-join incoming (nodes without in-edges keep the
  teleport base)

Scale notes (100 TB / billions of edges):
- Edges are the big side and are iterated over unchanged: persist them
  pre-partitioned by src (``edges.repartition("src")``) so the per-
  iteration join never re-shuffles the edge list; only the (node, rank)
  frame — one long+one string column — moves each round.
- Lineage grows linearly with iterations; ``checkpoint_every`` cuts it
  with localCheckpoint (same pattern as connected components,
  dedup_fuzzy.py:427).
- Dangling nodes (no out-edges) simply contribute nothing (their mass
  evaporates); the standard redistribute-uniformly correction would need
  one extra scalar aggregate per iteration — omitted by contract, noted
  for parity with the oracle.

Reference has no graph surface; north-star operator (e.g. ranking
documents by citation/link graphs when curating a pre-training corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from datapump_spark.cachescope import scoped_persist

SCALE = 10**12


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 3,
    damping_pct: int = 85,
    scale: int = SCALE,
    checkpoint_every: int = 5,
    assume_distinct: bool = False,
    assume_symmetric: bool = False,
) -> DataFrame:
    """Fixed-point PageRank; returns (node, rank) with rank summing to
    ~``scale``. ``damping_pct`` is the damping factor ×100 (85 -> 0.85)
    so the teleport split stays integer-exact. ``assume_distinct=True``
    skips the defensive edge dedup — pass it when the caller's edge
    build already guarantees uniqueness (e.g. distinct pairs unioned in
    disjoint directions): it removes a full shuffle of the edge list,
    the largest frame in the whole computation."""
    # The edge list, node set and out-degrees are loop-invariant but may
    # sit on an expensive lineage (joins/distinct over fact tables) —
    # without persisting them every iteration would recompute that
    # upstream plan from the scans. persist() is the per-iteration
    # contract here; at cluster scale this is the "materialize the graph
    # once, pre-partitioned by src" step.
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if not assume_distinct:
        e = e.distinct()
    # Out-degree denormalized ONTO the edge list once (window over the
    # src-partitioned shuffle, no extra exchange): each iteration is
    # then one join + one aggregate instead of two joins. This is the
    # ONLY persisted copy of the edge list — nodes/degrees/iterations
    # all read it (r12: a second edge-list materialization, persisting
    # the pre-window frame too, bought nothing and cost a full pass).
    from pyspark.sql.window import Window

    e_deg = scoped_persist(
        e.repartition("src")  # the per-iteration join key: cached blocks
        .withColumn("out_deg",
                    F.count(F.lit(1)).over(Window.partitionBy("src")))
    )
    if assume_symmetric:
        # Every edge appears in both directions, so the src column alone
        # already covers the node set — and e_deg is src-partitioned, so
        # this distinct needs no exchange (r12 optimization round, guide
        # §2.4; the union+distinct variant read twice the rows through a
        # fresh node-keyed shuffle).
        nodes = e_deg.select(F.col("src").alias("node")).distinct()
    else:
        nodes = (
            e_deg.select(F.col("src").alias("node"))
            .union(e_deg.select(F.col("dst").alias("node")))
            .distinct()
        )
    cnt = nodes.agg(F.count(F.lit(1)).alias("__n"))
    base_nodes = scoped_persist(nodes.join(F.broadcast(cnt)))  # 1-row cross join

    teleport = f"(({100 - damping_pct} * ({scale} div __n)) div 100)"
    ranks = base_nodes.select(
        "node", "__n", F.expr(f"{scale} div __n").alias("rank"))
    for i in range(n_iter):
        contrib = (
            e_deg.join(ranks.select(F.col("node").alias("src"), "rank"), "src")
            .select(F.col("dst").alias("node"),
                    F.expr("rank div out_deg").alias("c"))
        )
        incoming = contrib.groupBy("node").agg(F.sum("c").alias("inc"))
        ranks = (
            base_nodes.join(incoming, "node", "left_outer")
            .select(
                "node", "__n",
                F.expr(
                    f"{teleport} + ({damping_pct} * coalesce(inc, 0L)) div 100"
                ).alias("rank"),
            )
        )
        if (i + 1) % checkpoint_every == 0 and (i + 1) < n_iter:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks.select("node", "rank")


def pagerank_oracle_sql(
    edges_cte: str,
    n_iter: int = 3,
    damping_pct: int = 85,
    scale: int = SCALE,
) -> str:
    """The DuckDB twin: the same fixed-point recurrence unrolled as CTEs.
    ``edges_cte`` must be a SELECT producing (src, dst), already distinct.
    Iteration count is baked into the SQL text — exactly mirroring the
    Spark loop above, integer op for integer op."""
    tp = f"(({100 - damping_pct} * ({scale} // n.n)) // 100)"
    parts = [
        f"e AS ({edges_cte})",
        "nodes AS (SELECT DISTINCT src AS node FROM e"
        " UNION SELECT DISTINCT dst FROM e)",
        "n AS (SELECT count(*) AS n FROM nodes)",
        "outdeg AS (SELECT src, count(*) AS od FROM e GROUP BY src)",
        f"r0 AS (SELECT node, ({scale} // n.n) AS rank FROM nodes, n)",
    ]
    for k in range(1, n_iter + 1):
        parts.append(
            f"inc{k} AS (SELECT dst AS node, SUM(rank // od) AS inc "
            f"FROM e JOIN r{k-1} ON src = r{k-1}.node "
            f"JOIN outdeg USING (src) GROUP BY dst)")
        parts.append(
            f"r{k} AS (SELECT x.node, "
            f"{tp} + ({damping_pct} * COALESCE(inc, 0)) // 100 AS rank "
            f"FROM nodes x CROSS JOIN n LEFT JOIN inc{k} ON inc{k}.node = x.node)")
    return ("WITH " + ",\n".join(parts)
            + f"\nSELECT node, CAST(rank AS BIGINT) AS rank FROM r{n_iter}")


def triangle_stats(
    edges: DataFrame, src: str = "src", dst: str = "dst",
) -> DataFrame:
    """Per-node triangle count + local clustering coefficient over an
    undirected graph: (node, degree, n_triangles, clustering_coeff) with
    coeff = 2·T / (d·(d−1)) (0 where degree < 2).

    Triangle enumeration by the oriented two-join: normalize every edge
    to (lo < hi), then e₁(a,b) ⋈ e₂(b,c) ⋈ e₃(a,c) with a<b<c — each
    triangle found exactly once, via two hash equi-joins (no cross
    product). Cost is Σ_b d(b)² on the middle vertex; for power-law
    graphs orient by DEGREE (lowest-degree vertex first) instead of id —
    same plan shape, bounds the quadratic term by the arboricity
    (Schank-Wagner) — id orientation is kept here because it is
    deterministic AND oracle-twinnable without a degree tie-break
    convention. Degrees come from one exploded aggregation; everything
    shuffles on node ids only.
    """
    # Persist the normalized edge list: it feeds FOUR consumers (deg +
    # the three oriented join branches), whose post-pruning subplans
    # differ enough that ReusedExchange cannot be relied on — without
    # the persist an expensive edge-construction lineage (e.g.
    # q_triangles' lineitem self-join + top-k window) re-executes up to
    # four times (measured r12: 58-Exchange plan). The edge list is
    # 2 ids/row — the cheapest frame in the operator to hold.
    e = scoped_persist(
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("lo"),
            F.greatest(F.col(src), F.col(dst)).alias("hi"))
        .where(F.col("lo") != F.col("hi"))
        .distinct()
    )
    deg = (
        e.select(F.explode(F.array("lo", "hi")).alias("node"))
        .groupBy("node").agg(F.count(F.lit(1)).cast("bigint").alias("degree"))
    )
    ab = e.select(F.col("lo").alias("a"), F.col("hi").alias("b"))
    bc = e.select(F.col("lo").alias("b"), F.col("hi").alias("c"))
    ac = e.select(F.col("lo").alias("a"), F.col("hi").alias("c"))
    tri = ab.join(bc, "b").join(ac, ["a", "c"])          # a < b < c
    per_node = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node").agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
    )
    return (
        deg.join(per_node, "node", "left")
        .withColumn("n_triangles", F.coalesce("n_triangles", F.lit(0)))
        .withColumn(
            "clustering_coeff",
            F.round(F.when(F.col("degree") >= 2,
                           2.0 * F.col("n_triangles")
                           / (F.col("degree") * (F.col("degree") - 1)))
                    .otherwise(F.lit(0.0)), 6))
    )
