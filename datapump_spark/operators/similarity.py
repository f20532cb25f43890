"""Similarity search over embedding columns (array<float>).

Two paths, per the scale doctrine:
- ``cosine_topk``  — brute-force exact top-k: broadcast the (small) query
  set against the full corpus; one pass, no shuffle of the corpus, ranking
  via per-query window on the (tiny) query-partitioned score stream. The
  verifiable baseline.
- ``lsh_topk``     — random-hyperplane LSH: deterministic pseudo-random
  planes (seeded), sign-bit bucket key, candidates restricted to the query's
  bucket (+ optional multi-probe), exact re-rank inside the bucket. At
  100 TB the bucket join replaces the corpus-wide cross product; recall is
  tunable by planes/probes. Buckets are also the natural partition key for
  a pre-bucketed (bucketBy) corpus table, making repeated queries shuffle-
  free.

Dot products use built-in higher-order functions (zip_with + aggregate) —
JVM codegen over the array, no Python, no UDF. Ranking uses the *rounded*
cosine plus id tie-break so results are reproducible across engines and
runs (see queries.py float policy).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _as_double(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def _norm(v: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(v, lambda x: x * x), F.lit(0.0),
                              lambda acc, x: acc + x))


def _dot(a, b) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0),
                       lambda acc, x: acc + x)


def cosine_topk(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
    k: int = 5, query_max_id: int = 10,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector (id < query_max_id).

    (query_id, neighbor_id, cos) — k rows per query; self excluded; rank by
    rounded cos desc then neighbor_id asc (deterministic)."""
    base = df.select(
        F.col(id_col).alias("id"), _as_double(vec_col).alias("v"),
    ).withColumn("nrm", _norm(F.col("v")))
    q = base.where(F.col("id") < query_max_id).select(
        F.col("id").alias("query_id"), F.col("v").alias("qv"), F.col("nrm").alias("qn"))
    c = base.select(
        F.col("id").alias("neighbor_id"), F.col("v").alias("cv"), F.col("nrm").alias("cn"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", F.round(_dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .select("query_id", "neighbor_id", "cos")
    )


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes (pure python, seeded)."""
    import random

    rng = random.Random(seed)
    planes = []
    for _ in range(n_planes):
        v = [rng.gauss(0.0, 1.0) for _ in range(dim)]
        n = math.sqrt(sum(x * x for x in v)) or 1.0
        planes.append([x / n for x in v])
    return planes


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit bucket id from dot products with the fixed planes."""
    bucket = F.lit(0)
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        d = _dot(vec, plane)
        bucket = bucket + F.when(d >= 0, F.lit(2 ** i)).otherwise(F.lit(0))
    return bucket.cast("bigint")


def lsh_topk(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
    k: int = 5, query_max_id: int = 10, n_planes: int = 4, seed: int = 42,
) -> DataFrame:
    """Approximate top-k: exact re-rank restricted to the query's LSH bucket.

    Same output shape as cosine_topk; recall < 1 by design (graded in tests
    against the exact baseline, not the oracle)."""
    dim = len(df.select(vec_col).first()[0])
    planes = hyperplanes(dim, n_planes, seed)
    base = df.select(F.col(id_col).alias("id"), _as_double(vec_col).alias("v"))
    base = base.withColumn("nrm", _norm(F.col("v"))) \
               .withColumn("bucket", lsh_bucket(F.col("v"), planes))
    q = base.where(F.col("id") < query_max_id).select(
        F.col("id").alias("query_id"), F.col("v").alias("qv"),
        F.col("nrm").alias("qn"), F.col("bucket").alias("qb"))
    c = base.select(
        F.col("id").alias("neighbor_id"), F.col("v").alias("cv"),
        F.col("nrm").alias("cn"), F.col("bucket").alias("cb"))
    scored = (
        c.join(F.broadcast(q), F.col("cb") == F.col("qb"))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", F.round(_dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .select("query_id", "neighbor_id", "cos")
    )
