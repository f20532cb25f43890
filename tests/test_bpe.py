"""BPE trainer/encoder vs an independent from-scratch reference.

The reference implementation below is the naive textbook trainer (full
pair recount every iteration, raw per-word lists) — a different
algorithm path from the incremental-bookkeeping trainer in
operators/bpe.py, so agreement pins the bookkeeping."""

from __future__ import annotations

import re

import pytest

from datapump_spark.operators.bpe import (
    EOW,
    UNK_ID,
    bpe_decode_ids,
    bpe_encode,
    train_bpe,
)

_TOK = re.compile(r"[^a-z0-9]+")


def _ref_train(texts, n_merges):
    wc: dict[str, int] = {}
    for t in texts:
        for w in (x for x in _TOK.split(t.lower()) if x):
            wc[w] = wc.get(w, 0) + 1
    seqs = {w: list(w) + [EOW] for w in wc}
    merges = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for w, seq in seqs.items():
            for i in range(len(seq) - 1):
                p = (seq[i], seq[i + 1])
                pairs[p] = pairs.get(p, 0) + wc[w]
        live = {p: c for p, c in pairs.items() if c >= 2}
        if not live:
            break
        best = min(live.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        for seq in seqs.values():
            i = 0
            while i < len(seq) - 1:
                if (seq[i], seq[i + 1]) == best:
                    seq[i:i + 2] = [seq[i] + seq[i + 1]]
                else:
                    i += 1
    return merges


CORPUS = [
    "low lower lowest low low",
    "new newer newest new new",
    "the low new deal, the newer lower deal",
    "aaa abab low",
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        list(enumerate(CORPUS)), "doc_id long, text string")


def test_matches_reference_trainer(docs):
    model = train_bpe(docs, n_merges=30)
    assert model.merges == _ref_train(CORPUS, 30)
    # vocab = alphabet then merge outputs, ids dense from 1
    assert model.vocab[:1] != [] and model.ids[model.vocab[0]] == 1
    assert model.vocab[-len(model.merges):] == [
        a + b for a, b in model.merges]


def test_training_is_deterministic(docs):
    a = train_bpe(docs, n_merges=20)
    b = train_bpe(docs, n_merges=20)
    assert a.merges == b.merges and a.vocab == b.vocab


def test_encode_decode_round_trip(spark, docs):
    model = train_bpe(docs, n_merges=30)
    enc = {r["doc_id"]: r for r in bpe_encode(docs, model).collect()}
    for i, text in enumerate(CORPUS):
        norm = " ".join(x for x in _TOK.split(text.lower()) if x)
        assert bpe_decode_ids(model, enc[i]["token_ids"]) == norm
        assert enc[i]["n_unk"] == 0


def test_frequent_word_compresses(docs):
    """'low' appears 7× — after enough merges it must encode to ONE
    token (low+</w> fully merged), while a rare word stays multi-token."""
    model = train_bpe(docs, n_merges=30)
    assert len(model.encode_word("low")) == 1
    assert len(model.encode_word("zzzq")) > 1


def test_unknown_chars_map_to_unk(spark, docs):
    model = train_bpe(docs, n_merges=10)
    oov = spark.createDataFrame([(0, "déjà ваш")], "doc_id long, text string")
    row = bpe_encode(oov, model).collect()[0]
    assert row["n_unk"] > 0
    assert UNK_ID in row["token_ids"]


def test_sf_corpus_smoke(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    model = train_bpe(docs, n_merges=100)
    assert len(model.merges) == 100
    enc = bpe_encode(docs, model)
    stats = enc.selectExpr(
        "sum(n_tokens) AS t", "count(*) AS d", "sum(n_unk) AS u").collect()[0]
    assert stats["d"] == docs.count() and stats["t"] > 0
    # merges must actually compress: fewer BPE tokens than characters
    chars = docs.selectExpr("sum(length(text))").collect()[0][0]
    assert stats["t"] < chars


def test_tokenizer_fertility_report(spark):
    """Fertility = subword tokens per word (≥ ~1 for a trained BPE on its
    own corpus), unk_rate in [0,1]; zero-word docs excluded; grouping
    column honored; word totals match a direct count."""
    from pyspark.sql import functions as F

    from datapump_spark.functions.hashing import tokens as _tokens
    from datapump_spark.operators.bpe import bpe_encode
    from datapump_spark.operators.vocab import tokenizer_fertility

    docs = spark.createDataFrame(
        [(i, t, "s0" if i % 2 else "s1") for i, t in enumerate(CORPUS)],
        "doc_id long, text string, source string")
    enc = bpe_encode(docs, train_bpe(docs, n_merges=30))
    rep = tokenizer_fertility(enc, docs).collect()
    assert len(rep) == 1
    r = rep[0]
    want_words = docs.select(
        F.sum(F.size(_tokens(F.col("text")))).alias("w")).collect()[0]["w"]
    assert r["n_words"] == want_words
    assert r["fertility"] >= 1.0          # subwords never merge across words
    assert 0.0 <= r["unk_rate"] <= 1.0

    by_src = tokenizer_fertility(enc, docs, group_cols=["source"]).collect()
    assert {row["source"] for row in by_src} == \
        {row["source"] for row in docs.select("source").distinct().collect()}
    assert sum(row["n_words"] for row in by_src) == want_words
