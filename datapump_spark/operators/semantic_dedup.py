"""SemDeDup-style semantic deduplication over an embedding column.

Abbas et al. 2023 ("SemDeDup") prune web-scale corpora by clustering
document embeddings with k-means and removing near-identical items
WITHIN each cluster — the clustering bounds the pairwise work that exact
embedding dedup (:func:`~datapump_spark.operators.dedup_fuzzy.
embedding_near_dup`) spends on the full corpus, at the cost of missing
cross-cluster pairs (measured here in tests; the paper accepts the same
trade).

Plan shape / 100 TB notes:
- clustering reuses the IVF machinery (:mod:`.similarity`): centroid
  training touches only ``n_clusters × dim`` aggregate state, assignment
  is one broadcast-GEMM pass, so the only data-sized exchange is the
  ``groupBy(cluster)`` shuffle feeding the per-cluster kernel.
- the within-cluster kernel computes its cosine matrix in row blocks
  (O(block × cluster) memory, never O(cluster²)) and feeds a union-find;
  pick ``n_clusters ≈ N / 10k`` so clusters stay executor-sized — the
  same knob the paper tunes (they run 50k clusters for LAION-440M).
- at ``n_clusters=1`` the result is EXACTLY global near-dup grouping
  (pinned in tests against the blocked-GEMM exact path) — the cluster
  count only trades recall for cost, never correctness of the kept set's
  within-cluster property.

Keep policy: one representative per near-duplicate component — the
minimum id, matching :func:`~datapump_spark.operators.dedup_fuzzy.
connected_components` labels so downstream canonical-doc selection can
join either output interchangeably.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datapump_spark.operators.similarity import (
    _as_double,
    _assign_cells,
    _kmeans_centroids,
)

_BLOCK = 1024   # rows per GEMM block inside a cluster


def semantic_dedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 16,
    threshold: float = 0.9,
    lloyd_iters: int = 2,
) -> DataFrame:
    """(id, cluster_id, rep_id, keep) — one row per input vector.

    ``rep_id`` labels the near-duplicate component (min id within the
    vector's cluster whose pairwise chain of cos ≥ ``threshold`` reaches
    it); ``keep`` marks the one representative per component. Vectors
    with no near-duplicate in their cluster keep themselves."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    base = df.select(F.col(id_col).alias("id"),
                     _as_double(vec_col).alias("v"))
    C = _kmeans_centroids(base, n_clusters, lloyd_iters)
    spark = df.sparkSession
    out_schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("cluster_id", T.IntegerType()),
        T.StructField("rep_id", T.LongType()),
        T.StructField("keep", T.BooleanType()),
    ])
    if C is None:   # empty corpus
        return spark.createDataFrame([], out_schema).select(
            F.col("id").alias(id_col), "cluster_id", "rep_id", "keep")

    # with_v: the kernel passes v through, sparing the corpus-wide id
    # join that re-attached it (r12, guide §2)
    assigned = (
        _assign_cells(base, C, n_probe=1, with_v=True)
        .select("id", F.col("cells")[0].alias("cluster_id"), "v")
    )

    def dedup_cluster(key, pdf):
        ids = pdf["id"].to_numpy()
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        M = np.vstack(pdf["v"].iloc[order].map(np.asarray).to_numpy())
        nrm = np.linalg.norm(M, axis=1, keepdims=True)
        nrm[nrm == 0] = 1.0
        M = M / nrm
        n = len(ids)
        parent = np.arange(n)

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for lo in range(0, n, _BLOCK):
            S = M[lo:lo + _BLOCK] @ M.T          # (block, n)
            for bi, bj in zip(*np.nonzero(S >= threshold)):
                i = lo + int(bi)
                j = int(bj)
                if i >= j:                        # upper triangle only
                    continue
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[max(ri, rj)] = min(ri, rj)
        roots = np.array([find(i) for i in range(n)])
        rep = ids[roots]                          # ids ascending → min id
        return pd.DataFrame({
            "id": ids,
            "cluster_id": np.full(n, key[0], dtype="int32"),
            "rep_id": rep,
            "keep": rep == ids,
        })

    return (
        assigned.groupBy("cluster_id")
        .applyInPandas(dedup_cluster, out_schema)
        .select(F.col("id").alias(id_col), "cluster_id", "rep_id", "keep")
    )
