"""Retrieval ranking evaluation — precision/recall/MRR/nDCG@k.

The measurement half of the retrieval stack (similarity / BM25 / hybrid
fusion): given a result ranking and a relevance set, score the ranking
per query. An index change (PQ m, LSH planes, fusion weights) is only an
improvement if these numbers say so — scripts/ann_recall.py measures
recall for the ANN paths; this operator generalizes that to the full
metric set, as a DataFrame op that scales to millions of queries (one
join + one aggregation per query set, no driver loops).

Float determinism (the part that makes this oracle-able): log2 discounts
are PYTHON-computed literals embedded in the plan (engine libm
differences never enter), DCG folds them in rank order (sorted-array
fold, the bm25 precedent), and IDCG is a pure lookup into the
python-accumulated cumulative table — so every metric is bit-identical
across engines and layouts.

Reference parity: absent in the reference; part of SURVEY §7's extended
similarity-search requirement (an ANN path without measurement is not a
deliverable).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dcg_discounts(k: int) -> tuple[list[float], list[float]]:
    """(discount[1..k], cumulative[1..k]) as python floats — the shared
    constants both the Spark plan and the SQL oracle embed verbatim."""
    disc = [1.0 / math.log2(i + 1) for i in range(1, k + 1)]
    cum, acc = [], 0.0
    for d in disc:
        acc += d
        cum.append(acc)
    return disc, cum


def retrieval_metrics(
    results: DataFrame,
    relevance: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    doc_col: str = "neighbor_id",
    rank_col: str = "rank",
) -> DataFrame:
    """(query_id, n_rel, hits, precision, recall, mrr, ndcg) per query.

    ``results``: one row per (query, doc) with a 1-based ``rank_col``.
    Rows with rank > k contribute nothing to the metrics but their
    query still gets an output row — silently dropping it would bias
    any macro-average toward the queries that retrieved something
    early, the exact failure mode an eval exists to catch.
    ``relevance``: the qrels — (query_col, doc_col) pairs that are
    relevant (binary; duplicates de-duplicated). Queries present in
    ``results`` but with zero relevant docs score 0 with ``n_rel`` 0
    (recall defined as 0).

    precision = hits/k, recall = hits/n_rel, mrr = 1/first-hit-rank,
    ndcg = DCG@k / IDCG@k with binary gains. All rounded to 6 dp.
    """
    disc, cum = dcg_discounts(k)
    disc_arr = F.lit(list(disc))
    cum_arr = F.lit(list(cum))

    rel = relevance.select(query_col, doc_col).distinct() \
        .withColumn("__rel", F.lit(1))
    n_rel = rel.groupBy(query_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rel"))

    j = results.join(rel, [query_col, doc_col], "left") \
        .withColumn("__rel", F.coalesce("__rel", F.lit(0)))
    in_k = F.col(rank_col) <= k
    hit_in_k = (F.col("__rel") == 1) & in_k
    gains = F.sort_array(F.collect_list(F.struct(
        F.col(rank_col).alias("r"),
        F.when(hit_in_k,
               F.try_element_at(disc_arr, F.col(rank_col).cast("int")))
        .otherwise(F.lit(0.0)).alias("g"))))
    per_q = j.groupBy(query_col).agg(
        F.sum(F.when(in_k, F.col("__rel")).otherwise(F.lit(0)))
        .cast("bigint").alias("hits"),
        F.min(F.when(hit_in_k, F.col(rank_col))).alias("__first"),
        F.aggregate(F.transform(gains, lambda s: s["g"]),
                    F.lit(0.0), lambda acc, x: acc + x).alias("__dcg"),
    )
    out = per_q.join(n_rel, query_col, "left") \
        .withColumn("n_rel", F.coalesce("n_rel", F.lit(0)))
    idcg = F.when(
        F.col("n_rel") > 0,
        F.element_at(cum_arr, F.least(F.col("n_rel"), F.lit(k)).cast("int")))
    return out.select(
        query_col, "n_rel", "hits",
        F.round(F.col("hits") / k, 6).alias("precision"),
        F.round(F.when(F.col("n_rel") > 0,
                       F.col("hits") / F.col("n_rel"))
                .otherwise(F.lit(0.0)), 6).alias("recall"),
        F.round(F.coalesce(1.0 / F.col("__first"), F.lit(0.0)), 6)
        .alias("mrr"),
        F.round(F.coalesce(F.col("__dcg") / idcg, F.lit(0.0)), 6)
        .alias("ndcg"),
    )


def hard_negatives(
    ranking: DataFrame,
    qrels: DataFrame,
    m: int = 5,
    skip_top: int = 0,
    query_col: str = "query_id",
    doc_col: str = "neighbor_id",
    rank_col: str = "rank",
) -> DataFrame:
    """DPR-style hard-negative mining for retriever/embedding training:
    per query, the ``m`` highest-ranked retrieved docs NOT in ``qrels``
    (the known positives), optionally skipping the first ``skip_top``
    non-relevant hits — the standard guard against unlabeled positives
    masquerading as negatives (Karpukhin et al. 2020 practice).

    ``ranking`` is any (query, doc, rank) frame (BM25, cosine, hybrid);
    ``qrels`` is (query, doc). Returns (query, doc, rank, neg_rank).
    The per-query window sorts ≤ k rows — WindowGroupLimit territory,
    never a global sort; the anti-join keys are the ranking's own ids.
    """
    neg = ranking.select(query_col, doc_col, rank_col) \
        .join(qrels.select(query_col, doc_col), [query_col, doc_col],
              "anti")
    w = Window.partitionBy(query_col).orderBy(F.col(rank_col).asc())
    return (neg.withColumn("neg_rank", F.row_number().over(w))
            .where((F.col("neg_rank") > skip_top)
                   & (F.col("neg_rank") <= skip_top + m))
            .select(query_col, doc_col, rank_col, "neg_rank"))
