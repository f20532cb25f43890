"""pretrain_corpus recipe: stream partition invariants + stage semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datapump_spark.queries import _t
from datapump_spark.recipes import CorpusRecipe, pretrain_corpus


@pytest.fixture(scope="module")
def streams(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text", "source")
    bench = docs.where(F.col("doc_id") % 20 == 0).select("doc_id", "text")
    corpus = docs.where(F.col("doc_id") % 20 != 0)
    out = pretrain_corpus(corpus, bench,
                          CorpusRecipe(min_words=10, decontam_strategy="expr"))
    return corpus, out


def test_streams_partition_the_input(streams):
    corpus, out = streams
    clean_ids = {r.doc_id for r in out["clean"].select("doc_id").collect()}
    rej = [(r.doc_id, r.reject_reason) for r in out["rejected"].collect()]
    rej_ids = {i for i, _ in rej}
    assert len(rej) == len(rej_ids), "a doc was rejected twice"
    assert clean_ids.isdisjoint(rej_ids)
    all_ids = {r.doc_id for r in corpus.select("doc_id").collect()}
    assert clean_ids | rej_ids == all_ids
    assert {rr for _, rr in rej} <= {
        "quality", "contaminated", "exact_dup", "near_dup"}
    assert clean_ids, "recipe rejected everything"


def test_clean_is_decontaminated(spark, sf_dir, streams):
    _, out = streams
    from datapump_spark.operators.decontam import decontaminate

    # re-flag the clean stream against the original benchmark slice;
    # NB the clean text is PII-redacted, which never *creates* a 13-gram
    # overlap, so zero flags is the invariant
    docs = _t(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % 20 == 0).select("doc_id", "text")
    flags = decontaminate(out["clean"].select("doc_id", "text"), bench)
    assert flags.where(F.col("contaminated")).count() == 0


def test_sequences_reference_only_clean_docs(streams):
    _, out = streams
    seq_docs = {r.doc_id for r in out["sequences"].select("doc_id").collect()}
    clean_ids = {r.doc_id for r in out["clean"].select("doc_id").collect()}
    assert seq_docs <= clean_ids


def test_pii_redacted_in_clean(spark):
    docs = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog contact "
             "a@b.com now " + " ".join(f"w{j}x{i}" for j in range(12)),
          "src0") for i in range(1, 30)],
        "doc_id bigint, text string, source string")
    out = pretrain_corpus(docs, None, CorpusRecipe(min_words=5))
    texts = [r.text for r in out["clean"].collect()]
    assert texts and all("a@b.com" not in t for t in texts)
    assert any("[EMAIL]" in t for t in texts)
