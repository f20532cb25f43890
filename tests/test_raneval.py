"""Ranking-evaluation metrics: hand-computed cases, edge queries, perfect
and inverted rankings. The sf0.01 oracle hash gate runs in
test_extra_oracles (q_retrieval_eval)."""

from __future__ import annotations

import math

import pytest

from datapump_spark.operators.raneval import dcg_discounts, retrieval_metrics


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_hand_computed_metrics(spark):
    # query 1: relevant docs {100, 200, 300}; ranking hits 100@1, 300@4
    res = _df(spark, [(1, 100, 1), (1, 101, 2), (1, 102, 3), (1, 300, 4)],
              "query_id long, neighbor_id long, rank int")
    rel = _df(spark, [(1, 100), (1, 200), (1, 300)],
              "query_id long, neighbor_id long")
    got = retrieval_metrics(res, rel, k=10).collect()[0]
    assert got["n_rel"] == 3 and got["hits"] == 2
    assert got["precision"] == round(2 / 10, 6)
    assert got["recall"] == round(2 / 3, 6)
    assert got["mrr"] == 1.0
    disc, cum = dcg_discounts(10)
    dcg = disc[0] + disc[3]          # hits at ranks 1 and 4
    idcg = cum[2]                    # 3 relevant docs, all ≤ k
    assert got["ndcg"] == pytest.approx(round(dcg / idcg, 6), abs=1e-9)


def test_perfect_and_inverted_rankings(spark):
    rel = _df(spark, [(1, i) for i in (10, 20)],
              "query_id long, neighbor_id long")
    perfect = _df(spark, [(1, 10, 1), (1, 20, 2), (1, 30, 3)],
                  "query_id long, neighbor_id long, rank int")
    worst = _df(spark, [(1, 30, 1), (1, 40, 2), (1, 10, 3), (1, 20, 4)],
                "query_id long, neighbor_id long, rank int")
    p = retrieval_metrics(perfect, rel, k=10).collect()[0]
    w = retrieval_metrics(worst, rel, k=10).collect()[0]
    assert p["ndcg"] == 1.0 and p["mrr"] == 1.0
    assert 0 < w["ndcg"] < 1.0 and w["mrr"] == round(1 / 3, 6)
    assert p["recall"] == w["recall"] == 1.0


def test_zero_relevance_query_scores_zero(spark):
    res = _df(spark, [(7, 1, 1), (7, 2, 2)],
              "query_id long, neighbor_id long, rank int")
    rel = _df(spark, [(8, 99)], "query_id long, neighbor_id long")
    got = {r["query_id"]: r for r in
           retrieval_metrics(res, rel, k=10).collect()}
    q7 = got[7]
    assert q7["n_rel"] == 0 and q7["hits"] == 0
    assert q7["precision"] == 0.0 and q7["recall"] == 0.0
    assert q7["mrr"] == 0.0 and q7["ndcg"] == 0.0


def test_rank_beyond_k_ignored(spark):
    res = _df(spark, [(1, 10, 1), (1, 20, 99)],
              "query_id long, neighbor_id long, rank int")
    rel = _df(spark, [(1, 20)], "query_id long, neighbor_id long")
    got = retrieval_metrics(res, rel, k=10).collect()[0]
    assert got["hits"] == 0  # the only relevant doc sits past k


def test_discount_table_shape():
    disc, cum = dcg_discounts(5)
    assert disc[0] == 1.0
    assert disc[1] == pytest.approx(1 / math.log2(3))
    assert cum[4] == pytest.approx(sum(disc))
    # strictly decreasing discounts, increasing cumulative
    assert all(a > b for a, b in zip(disc, disc[1:]))
    assert all(a < b for a, b in zip(cum, cum[1:]))


def test_query_with_all_ranks_beyond_k_still_reported(spark):
    """A query whose every result sits past k must appear with zero
    metrics, not vanish — dropping it would bias macro-averages."""
    res = _df(spark, [(1, 10, 1), (2, 20, 99)],
              "query_id long, neighbor_id long, rank int")
    rel = _df(spark, [(1, 10), (2, 20)], "query_id long, neighbor_id long")
    got = {r["query_id"]: r for r in
           retrieval_metrics(res, rel, k=10).collect()}
    assert set(got) == {1, 2}
    assert got[2]["hits"] == 0 and got[2]["ndcg"] == 0.0
    assert got[2]["n_rel"] == 1
    assert got[1]["hits"] == 1


def test_hard_negatives_hand_built(spark):
    """Skip-top guard and the m-window on a hand-built ranking:
    positives never mined, the single top negative skipped, exactly m
    negatives per query, ranks preserved."""
    from datapump_spark.operators.raneval import hard_negatives

    ranking = spark.createDataFrame(
        [(1, d, r) for r, d in enumerate([101, 102, 103, 104, 105], 1)]
        + [(2, d, r) for r, d in enumerate([201, 202, 203], 1)],
        "query_id bigint, neighbor_id bigint, rank int")
    qrels = spark.createDataFrame(
        [(1, 102), (2, 201), (2, 203)],
        "query_id bigint, neighbor_id bigint")
    out = sorted(
        (r.query_id, r.neighbor_id, r.rank, r.neg_rank)
        for r in hard_negatives(ranking, qrels, m=2, skip_top=1).collect())
    # q1 negatives by rank: 101, 103, 104, 105 -> skip 101, take 103, 104
    # q2 negatives: only 202 -> skipped entirely (it IS the top negative)
    assert out == [(1, 103, 3, 2), (1, 104, 4, 3)]

    all_negs = {(r.query_id, r.neighbor_id)
                for r in hard_negatives(ranking, qrels, m=5).collect()}
    assert (2, 202) in all_negs and (2, 201) not in all_negs
