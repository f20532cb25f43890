"""Semantics of operators/chunking.py. The sf-scaled oracle equivalence
runs in test_extra_oracles.py::q_chunk_docs."""

from __future__ import annotations

import pytest

from datapump_spark.operators.chunking import chunk_documents


def _chunks(spark, text, chunk_tokens=4, overlap=1):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return sorted(
        (r["chunk_id"], r["start_tok"], r["n_tokens"], r["chunk_text"])
        for r in chunk_documents(
            df, chunk_tokens=chunk_tokens, overlap=overlap).collect())


def test_overlap_grid(spark):
    # 8 tokens, window 4, stride 3 → starts 1,4,7; last chunk short
    got = _chunks(spark, "a b c d e f g h")
    assert got == [
        (0, 1, 4, "a b c d"),
        (1, 4, 4, "d e f g"),
        (2, 7, 2, "g h"),
    ]


def test_short_doc_single_chunk(spark):
    assert _chunks(spark, "a b") == [(0, 1, 2, "a b")]


def test_exact_fit_no_trailing_chunk(spark):
    # 4 tokens exactly fill one window — no second chunk of pure overlap
    assert _chunks(spark, "a b c d") == [(0, 1, 4, "a b c d")]


def test_empty_doc_yields_nothing(spark):
    assert _chunks(spark, "  ;;  ") == []


def test_every_token_covered(spark):
    got = _chunks(spark, " ".join(f"t{i}" for i in range(25)),
                  chunk_tokens=10, overlap=3)
    covered = set()
    for _, start, n, _ in got:
        covered.update(range(start, start + n))
    assert covered == set(range(1, 26))


def test_bad_overlap_rejected(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=4, overlap=4)
