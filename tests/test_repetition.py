"""Semantics of operators/repetition.py (Gopher-style repetition
signals) on crafted documents. The sf-scaled oracle equivalence runs in
test_extra_oracles.py::q_repetition; these pin the definitions."""

from __future__ import annotations

import pytest

from datapump_spark.operators.repetition import repetition_signals


@pytest.fixture(scope="module")
def sig(spark):
    docs = spark.createDataFrame(
        [
            # 4 lines, "same line" 3×: dup_line_frac = (4-2)/4
            (1, "same line\nsame line\nsame line\nother"),
            # degenerate repetition: "spam ham " × 8 → the top 2-gram
            # ("spam ham") covers most of the text
            (2, ("spam ham " * 8).strip()),
            # no repetition at all
            (3, "one two three four five six seven eight nine ten"),
            # shorter than every gram window, single line
            (4, "tiny"),
            # whitespace-only text: no lines, no tokens
            (5, "   \n  \n "),
        ],
        "doc_id long, text string",
    )
    return {r["doc_id"]: r.asDict() for r in repetition_signals(docs).collect()}


def test_one_row_per_doc(sig):
    assert sorted(sig) == [1, 2, 3, 4, 5]


def test_dup_line_frac(sig):
    assert sig[1]["dup_line_frac"] == pytest.approx(0.5)
    # chars in the 3 duplicated "same line" lines / doc chars (incl. \n)
    assert sig[1]["dup_line_char_frac"] == pytest.approx(27 / 35, abs=1e-6)
    assert sig[3]["dup_line_frac"] == 0.0


def test_top_ngram_dominates_degenerate_doc(sig):
    # "spam ham" appears 8×; overlapping grams ("ham spam") 7×
    assert sig[2]["top_ngram_char_frac"] > 0.8
    # every 5-gram occurs ≥2× → capped at 1.0
    assert sig[2]["dup_ngram_char_frac"] == 1.0
    assert sig[3]["top_ngram_char_frac"] < 0.35
    assert sig[3]["dup_ngram_char_frac"] == 0.0


def test_many_line_doc_run_fold(spark):
    """The sorted-run fold on a liney doc: 1000 lines, 400 of them
    duplicates across 200 distinct values, interleaved so runs only form
    after the sort."""
    uniq = [f"unique line number {i}" for i in range(600)]
    dups = [f"repeated line {i % 200}" for i in range(400)]
    text = "\n".join(x for pair in zip(dups + uniq[:200], uniq[:400])
                     for x in pair) + "\n" + "\n".join(uniq[400:])
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = repetition_signals(df).collect()[0]
    # 1000 lines, 800 distinct (600 unique + 200 repeated values)
    assert r["dup_line_frac"] == pytest.approx((1000 - 800) / 1000)
    dup_chars = sum(2 * len(f"repeated line {i}") for i in range(200))
    assert r["dup_line_char_frac"] == pytest.approx(
        dup_chars / len(text), abs=1e-6)


def test_degenerate_edge_docs_report_zero(sig):
    for d in (4, 5):
        assert sig[d]["dup_line_frac"] == 0.0
        assert sig[d]["top_ngram_char_frac"] == 0.0
        assert sig[d]["dup_ngram_char_frac"] == 0.0
