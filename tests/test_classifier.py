"""Logistic-regression quality classifier: distributed GD vs a numpy
replica, learning signal, and the stratified sampler's invariants."""

from __future__ import annotations

import math
import re

import numpy as np
import pytest

from datapump_spark.operators.classifier import (
    DEFAULT_BIAS,
    DEFAULT_WEIGHTS,
    FEATURE_NAMES,
    featurize,
    score_logreg,
    sigmoid,
    train_logreg,
)

STOP = {"the", "a", "an", "and", "or", "of", "to", "in", "is", "it"}


def _np_features(text: str) -> list[float]:
    toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
    n_tok = len(toks)
    nz_tok = max(n_tok, 1)
    nz_ch = max(len(text), 1)
    return [
        math.log1p(n_tok),
        len(re.sub(r"[^A-Za-z]", "", text)) / nz_ch,
        sum(1 for t in toks if t in STOP) / nz_tok,
        len(re.sub(r"[^0-9]", "", text)) / nz_ch,
        sum(len(t) for t in toks) / nz_tok,
    ]


def test_featurize_matches_numpy(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = featurize(docs).orderBy("doc_id").collect()
    texts = {r["doc_id"]: r["text"]
             for r in docs.select("doc_id", "text").collect()}
    for r in rows:
        want = _np_features(texts[r["doc_id"]])
        got = [r[n] for n in FEATURE_NAMES]
        assert np.allclose(got, want, atol=1e-12), r["doc_id"]


def test_train_matches_numpy_gd(spark, sf_dir):
    """The one-aggregate-per-iteration distributed GD must reproduce a
    single-machine numpy GD bit-for-bit (up to double sum order)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    labeled = docs.withColumn(
        "label", (docs["lang"] == "en").cast("int"))
    model = train_logreg(labeled, "label", lr=0.4, iters=12)

    pdf = labeled.select("text", "label").toPandas()
    X = np.array([_np_features(t) for t in pdf["text"]])
    y = pdf["label"].to_numpy(dtype=float)
    w = np.zeros(X.shape[1])
    b = 0.0
    for _ in range(12):
        z = X @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        w = w - 0.4 * ((p - y) @ X) / len(y)
        b = b - 0.4 * float(np.sum(p - y)) / len(y)
    assert np.allclose(model.weights, w, atol=1e-9)
    assert abs(model.bias - b) < 1e-9
    assert model.n_rows == len(y)


def test_train_learns_separable_signal(spark, sf_dir):
    """Loss decreases and the learned model beats chance on its target
    (en-vs-rest is separable via stop_ratio: English stopword list)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    labeled = docs.withColumn("label", (docs["lang"] == "en").cast("int"))
    # 14 iterations suffice for both assertions (loss < log 2 by iter ~8
    # on this fixture); 30 doubled the wall for no extra signal
    model = train_logreg(labeled, "label", lr=1.0, iters=14,
                         standardize=True)
    assert model.loss_curve[-1] < model.loss_curve[0]
    assert model.loss_curve[-1] < math.log(2)  # better than the 0.5 coin

    scored = score_logreg(docs, weights=model.weights, bias=model.bias)
    joined = scored.join(labeled.select("doc_id", "label"), "doc_id")
    agg = joined.selectExpr(
        "avg(CASE WHEN (prob >= 0.5) = (label = 1) THEN 1.0 ELSE 0.0 END) AS acc"
    ).collect()[0]
    base = labeled.selectExpr("avg(label)").collect()[0][0]
    majority = max(base, 1 - base)
    assert agg["acc"] >= majority  # at least as good as always-majority


def test_score_logreg_pinned_weights(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = score_logreg(docs).collect()
    texts = {r["doc_id"]: r["text"]
             for r in docs.select("doc_id", "text").collect()}
    for r in rows[:50]:
        x = _np_features(texts[r["doc_id"]])
        z = DEFAULT_BIAS + sum(wi * xi for wi, xi in zip(DEFAULT_WEIGHTS, x))
        assert abs(r["prob"] - round(sigmoid(z), 6)) <= 1e-6
        assert r["keep"] == (r["prob"] >= 0.5)
    assert any(r["keep"] for r in rows) and not all(r["keep"] for r in rows)


def test_train_empty_input_raises(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    with pytest.raises(ValueError, match="empty"):
        train_logreg(docs.where("doc_id < 0").withColumn(
            "label", docs["doc_id"] * 0), "label", iters=1)


def test_stratified_sample_invariants(spark, sf_dir):
    from datapump_spark.operators.sampling import stratified_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    frac = {"en": 0.5, "fr": 0.25}
    small = stratified_sample(docs, "lang", {"en": 0.25, "fr": 0.125},
                              key_col="doc_id")
    big = stratified_sample(docs, "lang", frac, key_col="doc_id")
    # nested-subset property per stratum (same salt, half the fraction)
    small_ids = {r["doc_id"] for r in small.select("doc_id").collect()}
    big_ids = {r["doc_id"] for r in big.select("doc_id").collect()}
    assert small_ids <= big_ids
    # default fraction 0.0 drops strata not in the map
    langs = {r["lang"] for r in big.select("lang").distinct().collect()}
    assert langs <= {"en", "fr"}
    # rate lands near the target for the biggest stratum
    n_en = docs.where("lang = 'en'").count()
    k_en = big.where("lang = 'en'").count()
    if n_en >= 100:
        assert abs(k_en / n_en - 0.5) < 0.15
    # determinism: same call → identical set
    again = stratified_sample(docs, "lang", frac, key_col="doc_id")
    assert {r["doc_id"] for r in again.select("doc_id").collect()} == big_ids
