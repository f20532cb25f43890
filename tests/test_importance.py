"""DSIR hashed n-gram importance sampling: the estimator must rank
target-like documents above off-domain ones, stay deterministic and
layout-independent, and respect the temperature contract.
(Oracle gate: q_importance_weights / q_dsir_sample in
tests/test_extra_oracles.py + scripts/check_oracle.py.)"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datapump_spark.operators.importance import (
    dsir_sample,
    hashed_ngram_logratio,
    importance_score,
)

SPORT = ("the match ended with a late goal as the home team pressed "
         "forward and the keeper saved twice before the final whistle")
CODE = ("def parse args return value for key in dict items yield "
        "function call stack trace error handler module import")


def _corpus(spark):
    rows = [(i, SPORT + f" extra{i}") for i in range(10)]          # target-like
    rows += [(100 + i, CODE + f" extra{i}") for i in range(10)]    # off-domain
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_scores_rank_target_like_docs_higher(spark):
    docs = _corpus(spark)
    target = spark.createDataFrame(
        [(1000 + i, SPORT + f" t{i}") for i in range(5)],
        "doc_id long, text string")
    w = hashed_ngram_logratio(target, docs, n_buckets=512)
    scores = {r["doc_id"]: r["score"] for r in
              importance_score(docs, w, n_buckets=512).collect()}
    sporty = [scores[i] for i in range(10)]
    cody = [scores[100 + i] for i in range(10)]
    assert min(sporty) > max(cody)


@pytest.mark.slow  # q_dsir_sample is driver-hash-gated (determinism
# included); this adds only the prefers-target property
def test_dsir_sample_prefers_target_and_is_deterministic(spark):
    docs = _corpus(spark)
    target = spark.createDataFrame(
        [(1000 + i, SPORT + f" t{i}") for i in range(5)],
        "doc_id long, text string")
    got = dsir_sample(docs, target, k=8, n_buckets=512).collect()
    assert len(got) == 8
    picked = {r["doc_id"] for r in got}
    assert sum(1 for d in picked if d < 100) >= 6    # mostly target-like
    assert sorted(r["rank"] for r in got) == list(range(1, 9))
    again = dsir_sample(docs.repartition(7), target, k=8,
                        n_buckets=512).collect()
    key = lambda r: (r["rank"], r["doc_id"])
    assert sorted(map(key, again)) == sorted(map(key, got))


def test_temperature_contract(spark):
    docs = _corpus(spark)
    target = docs.where(F.col("doc_id") < 10)
    # T→0: hard top-k by score — every pick is target-like
    cold = dsir_sample(docs, target, k=5, n_buckets=512,
                       temperature=1e-6).collect()
    assert all(r["doc_id"] < 100 for r in cold)
    with pytest.raises(ValueError, match="temperature"):
        dsir_sample(docs, target, k=5, temperature=0.0)


def test_weight_table_is_dense_and_bounded(spark):
    docs = _corpus(spark)
    w = hashed_ngram_logratio(docs.where(F.col("doc_id") < 10), docs,
                              n_buckets=256).collect()
    assert len(w) == 256                       # dense spine incl. unseen
    assert all(r["logw"] is not None for r in w)


def test_single_token_docs_contribute_no_bigrams(spark):
    """Spark's sequence(1, 0) counts DOWN — a 1-token doc must yield one
    unigram feature and no null bigram grams (regression)."""
    docs = spark.createDataFrame(
        [(1, "hello"), (2, "two words")], "doc_id long, text string")
    w = hashed_ngram_logratio(docs, docs, n_buckets=64)
    s = {r["doc_id"]: r for r in
         importance_score(docs, w, n_buckets=64).collect()}
    assert s[1]["n_feats"] == 1                # unigram only
    assert s[2]["n_feats"] == 3                # 2 unigrams + 1 bigram


@pytest.mark.slow
def test_raw_fit_fraction_approximates_full_fit(spark):
    """Sample-fit raw multinomial: scores from a 50% hash-sample fit must
    preserve the domain ordering the full fit produces (the at-scale
    contract), and the knob validates its id requirement."""
    docs = _corpus(spark)
    target = docs.where(F.col("doc_id") < 10)
    full = hashed_ngram_logratio(target, docs, n_buckets=512)
    half = hashed_ngram_logratio(target, docs, n_buckets=512,
                                 raw_fit_fraction=0.5, id_col="doc_id")
    sf = {r["doc_id"]: r["score"] for r in
          importance_score(docs, full, n_buckets=512).collect()}
    sh = {r["doc_id"]: r["score"] for r in
          importance_score(docs, half, n_buckets=512).collect()}
    assert min(sh[i] for i in range(10)) > max(sh[100 + i] for i in range(10))
    # orderings agree on the domain split even if absolute values drift
    assert all((sf[a] > sf[b]) == (sh[a] > sh[b])
               for a in range(10) for b in range(100, 110))
    with pytest.raises(ValueError, match="id_col"):
        hashed_ngram_logratio(target, docs, raw_fit_fraction=0.5)
