"""Model persistence: save/load round-trips encode identically for BPE,
unigram, and PQ codebooks; files are engine-independent JSON."""

from __future__ import annotations

import json

import numpy as np
import pytest

from datapump_spark.functions.model_io import load_model, save_model

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(100)


def test_bpe_roundtrip(spark, docs, tmp_path):
    from datapump_spark.operators.bpe import bpe_encode, train_bpe

    m = train_bpe(docs, n_merges=50)
    p = tmp_path / "bpe.json"
    save_model(m, p)
    m2 = load_model(p)
    assert m2.merges == m.merges and m2.vocab == m.vocab and m2.ids == m.ids
    a = {r["doc_id"]: r["token_ids"] for r in bpe_encode(docs, m).collect()}
    b = {r["doc_id"]: r["token_ids"] for r in bpe_encode(docs, m2).collect()}
    assert a == b


def test_unigram_roundtrip(spark, docs, tmp_path):
    from datapump_spark.operators.unigram import (
        train_unigram,
        unigram_encode,
    )

    m = train_unigram(docs, vocab_size=200, seed_size=1000,
                      max_piece_len=4, em_iters=1)
    p = tmp_path / "uni.json"
    save_model(m, p)
    m2 = load_model(p)
    assert m2.vocab == m.vocab and m2.max_piece_len == m.max_piece_len
    assert m2.logp == m.logp  # exact float round-trip through JSON repr
    a = {r["doc_id"]: r["token_ids"]
         for r in unigram_encode(docs, m).collect()}
    b = {r["doc_id"]: r["token_ids"]
         for r in unigram_encode(docs, m2).collect()}
    assert a == b


def test_pq_codebooks_roundtrip(spark, tmp_path):
    from datapump_spark.operators.pq import pq_encode, train_pq

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cb = train_pq(emb, m=4, k=8, lloyd_iters=1, dim=64)
    p = tmp_path / "pq.json"
    save_model(cb, p)
    cb2 = load_model(p)
    assert isinstance(cb2, np.ndarray)
    assert cb2.dtype == cb.dtype and np.array_equal(cb, cb2)
    a = {r["id"]: r["codes"] for r in pq_encode(emb, cb).collect()}
    b = {r["id"]: r["codes"] for r in pq_encode(emb, cb2).collect()}
    assert a == b


def test_file_is_plain_versioned_json(tmp_path):
    save_model(np.zeros((2, 2)), tmp_path / "m.json")
    d = json.load(open(tmp_path / "m.json"))
    assert d["format_version"] == 1 and d["kind"] == "ndarray"


def test_version_gate(tmp_path):
    p = tmp_path / "bad.json"
    p.write_text(json.dumps({"format_version": 99, "kind": "bpe"}))
    with pytest.raises(ValueError, match="format_version"):
        load_model(p)
