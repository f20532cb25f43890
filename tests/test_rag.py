"""Hashing-trick embedder + RAG index/search recipe: determinism, codegen
purity, self-retrieval, provenance."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from datapump_spark.operators.embeddings import hash_embed
from datapump_spark.recipes import rag_index, rag_search

SF_DIR = "/root/testdata/sf0.001"


def _cos(a, b):
    return sum(x * y for x, y in zip(a, b))


def test_hash_embed_contract(spark):
    df = spark.createDataFrame(
        [(1, "spark join shuffle join"), (2, "spark join shuffle join"),
         (3, "completely different words here"), (4, "")],
        "doc_id long, text string")
    got = {r["doc_id"]: r["embedding"] for r in hash_embed(df).collect()}
    assert 4 not in got                       # empty text has no direction
    assert got[1] == got[2]                   # pure function of text
    for v in got.values():
        assert math.isclose(sum(x * x for x in v), 1.0, rel_tol=1e-9)
        assert len(v) == 64
    # lexical similarity orders: identical > overlapping > disjoint
    sim_same = _cos(got[1], got[2])
    sim_diff = _cos(got[1], got[3])
    assert sim_same == pytest.approx(1.0)
    assert sim_diff < 0.9


def test_hash_embed_is_codegen_only(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = hash_embed(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "MapInPandas" not in plan


def test_rag_index_rejects_chunk_key_collision(spark, tmp_path):
    """chunk_key = xxhash64(doc_id, chunk_id): duplicate doc ids produce
    identical keys, which would silently cross-wire all three stores —
    the build must fail loudly instead."""
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (1, "alpha beta gamma delta")],
        "doc_id long, text string")
    with pytest.raises(ValueError, match="chunk_key collision"):
        rag_index(docs, str(tmp_path / "collidx"), chunk_tokens=4, overlap=0)


def test_rag_roundtrip_self_retrieval(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(80)
    work = str(tmp_path / "ragidx")
    paths = rag_index(docs, work, chunk_tokens=32, overlap=8, pq_k=16)
    chunks = spark.read.parquet(paths["chunks"])
    n_chunks = chunks.count()
    assert n_chunks > 80  # overlapping windows multiply rows
    # query with three chunks' own text → their chunk must rank first
    probe = chunks.orderBy("chunk_key").limit(3).collect()
    queries = [(-(i + 1), r["chunk_text"]) for i, r in enumerate(probe)]
    hits = rag_search(spark, work, queries, k=5, rerank_factor=8)
    rows = hits.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {-1, -2, -3}
    for i, src in enumerate(probe):
        top = max(by_q[-(i + 1)], key=lambda r: (r["score"],
                                                 -r["chunk_id"]))
        # the best hit is the chunk itself (score 1.0) or an identical-
        # text twin (duplicated docs exist in the corpus by design)
        assert top["score"] == pytest.approx(1.0, abs=1e-6)
        assert top["chunk_text"] == src["chunk_text"] or \
            set(top["chunk_text"].split()) == set(src["chunk_text"].split())
    # provenance columns present and populated
    assert all(r["doc_id"] is not None and r["chunk_text"] for r in rows)


def test_rag_index_artifacts_are_separable(spark, tmp_path):
    """The scan store (codes) must be readable without the vector store —
    the layout claim that makes the compressed search cheap."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(30)
    work = str(tmp_path / "ragidx2")
    paths = rag_index(docs, work, chunk_tokens=32, overlap=0, pq_k=8)
    codes = spark.read.parquet(paths["codes"])
    assert codes.columns == ["id", "codes"]
    assert codes.count() == spark.read.parquet(paths["vectors"]).count()


@pytest.mark.slow  # append-collision gate and roundtrip
# self-retrieval stay in-default; streaming-append idempotence is
# gated by the streaming-corpus tests (r9 tier move)
def test_streaming_incremental_index(spark, tmp_path):
    """Index maintenance under Structured Streaming: codebooks are frozen
    train-once state; each micro-batch hash-embeds and PQ-encodes its new
    chunks with them and APPENDS to the codes/vectors stores. A search
    after the stream drains finds a document that only ever arrived via
    the stream."""
    from pyspark.sql import functions as F

    from datapump_spark.functions.model_io import load_model, save_model
    from datapump_spark.operators.embeddings import hash_embed
    from datapump_spark.operators.pq import pq_encode, pq_topk, train_pq

    work = str(tmp_path / "inc")
    src = str(tmp_path / "src")
    # train codebooks on a seed corpus; freeze them to disk
    seed = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(40)
    seed_emb = hash_embed(seed, id_col="doc_id", text_col="text")
    cb = train_pq(seed_emb, id_col="doc_id", vec_col="embedding",
                  m=8, k=8, lloyd_iters=1, dim=64)
    save_model(cb, f"{work}/cb.json")
    pq_encode(seed_emb, cb, id_col="doc_id", vec_col="embedding") \
        .write.mode("append").parquet(f"{work}/codes")
    seed_emb.write.mode("append").parquet(f"{work}/vectors")

    # two streamed batches of brand-new docs
    spark.createDataFrame(
        [(10_001, "zebra quagga okapi wildebeest gnu antelope")],
        "doc_id long, text string").coalesce(1) \
        .write.mode("append").parquet(src)
    spark.createDataFrame(
        [(10_002, "completely unrelated streaming payload words")],
        "doc_id long, text string").coalesce(1) \
        .write.mode("append").parquet(src)

    frozen = load_model(f"{work}/cb.json")

    def absorb(batch_df, batch_id):
        emb = hash_embed(batch_df, id_col="doc_id", text_col="text")
        pq_encode(emb, frozen, id_col="doc_id", vec_col="embedding") \
            .write.mode("append").parquet(f"{work}/codes")
        emb.write.mode("append").parquet(f"{work}/vectors")

    q = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1).parquet(src)
        .writeStream.foreachBatch(absorb)
        .option("checkpointLocation", str(tmp_path / "chk"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)

    vectors = spark.read.parquet(f"{work}/vectors")
    codes = spark.read.parquet(f"{work}/codes")
    assert codes.count() == 42
    # self-retrieval query: identical text ⇒ cosine 1.0 ⇒ must win
    # regardless of how hash slots collide with the seed corpus
    queries = hash_embed(
        spark.createDataFrame(
            [(-1, "zebra quagga okapi wildebeest gnu antelope")],
            "doc_id long, text string"),
        id_col="doc_id", text_col="text")
    hits = pq_topk(vectors, frozen, id_col="doc_id", vec_col="embedding",
                   k=1, codes=codes, rerank_factor=8, queries=queries)
    top = hits.collect()
    assert len(top) == 1 and top[0]["neighbor_id"] == 10_001


# slow: append-path search correctness runs in-default via the
# streaming incremental-index test (and the drift test in the slow
# tier); what this adds is the expensive two-index rebuild-parity
# comparison.
@pytest.mark.slow
def test_rag_index_append_matches_full_rebuild(spark, tmp_path):
    """VERDICT round-6 #7: index built on batch 1, batch 2 appended
    against the FROZEN codebooks (admitted text never re-read), search
    results equal to a full rebuild's for the same queries."""
    from datapump_spark.recipes import rag_index_append

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(60)
    b1 = docs.where(F.col("doc_id") < 30)
    b2 = docs.where(F.col("doc_id") >= 30)

    inc = str(tmp_path / "inc")
    rag_index(b1, inc, chunk_tokens=32, overlap=8, pq_k=16)
    out = rag_index_append(b2, inc)
    assert out["appended_chunks"] > 0
    assert not out["retrained"], "same-distribution batch must not retrain"

    full = str(tmp_path / "full")
    rag_index(docs, full, chunk_tokens=32, overlap=8, pq_k=16)

    # store invariants: appended index covers exactly the rebuilt corpus
    for store in ("chunks", "vectors", "codes"):
        assert (spark.read.parquet(f"{inc}/{store}").count()
                == spark.read.parquet(f"{full}/{store}").count()), store

    # search parity: probe with chunk texts from BOTH batches; the
    # exact re-rank stage scores survivors with full-precision cosine,
    # so recall vs the rebuilt index must not degrade
    probe = (spark.read.parquet(f"{full}/chunks")
             .orderBy("chunk_key").limit(6).collect())
    queries = [(-(i + 1), r["chunk_text"]) for i, r in enumerate(probe)]
    hits_inc = rag_search(spark, inc, queries, k=3, rerank_factor=16)
    hits_full = rag_search(spark, full, queries, k=3, rerank_factor=16)
    got_inc = {(r["query_id"], r["doc_id"], r["chunk_id"])
               for r in hits_inc.collect()}
    got_full = {(r["query_id"], r["doc_id"], r["chunk_id"])
                for r in hits_full.collect()}
    recall = len(got_inc & got_full) / len(got_full)
    assert recall >= 0.9, f"append-vs-rebuild recall {recall}"
    # the self-chunk (cosine 1.0 after exact re-rank) is always found
    self_hits = {r["query_id"] for r in hits_inc.collect()
                 if r["score"] == pytest.approx(1.0, abs=1e-6)}
    assert self_hits == {q for q, _ in queries}


@pytest.mark.slow  # components gated in-default (train_pq/encode/mse
# in test_pq, append admission in test_streaming_incremental_index);
# this adds the retrain composition + generation-swap end-to-end
def test_rag_index_append_drift_retrains(spark, tmp_path):
    """A batch from a shifted distribution (disjoint token space) trips
    the reconstruction-MSE drift gate: codebooks retrain from the
    persisted VECTOR store (text never re-read), all codes re-encode,
    and search over the merged index still self-retrieves."""
    from datapump_spark.functions.model_io import load_model
    from datapump_spark.recipes import (
        _index_paths,
        _read_manifest,
        rag_index_append,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(30)
    work = str(tmp_path / "drift")
    rag_index(docs, work, chunk_tokens=32, overlap=0, pq_k=16)
    cb_before = load_model(f"{work}/codebooks.json")
    base_before = _read_manifest(work)["baseline_mse"]

    shifted = spark.createDataFrame(
        [(20_000 + i,
          " ".join(f"xq{i}w{j} zv{j}k{i} pf{i * 7 + j}" for j in range(40)))
         for i in range(8)],
        "doc_id long, text string")
    out = rag_index_append(shifted, work, drift_retrain_factor=1.05)
    assert out["retrained"]
    assert out["batch_mse"] > 1.05 * base_before
    # the retrain committed a NEW generation via the atomic manifest
    # swap: the active codebooks differ, the superseded gen-0 pair is
    # left intact for in-flight readers
    man = _read_manifest(work)
    assert man["gen"] == 1
    paths = _index_paths(work, man)
    assert paths["codebooks"].endswith("codebooks_g1.json")
    cb_after = load_model(paths["codebooks"])
    assert (cb_after != cb_before).any(), "retrain must move the codebooks"
    cb_old = load_model(f"{work}/codebooks.json")
    assert (cb_old == cb_before).all(), "old generation must stay intact"
    # codes were re-encoded for the WHOLE corpus under the new codebooks
    assert (spark.read.parquet(paths["codes"]).count()
            == spark.read.parquet(f"{work}/vectors").count())
    # merged index still self-retrieves a shifted doc's chunk
    probe = (spark.read.parquet(f"{work}/chunks")
             .where(F.col("doc_id") == 20_003).limit(1).collect())
    hits = rag_search(spark, work, [(-1, probe[0]["chunk_text"])],
                      k=1, rerank_factor=16).collect()
    assert hits and hits[0]["doc_id"] == 20_003
    assert hits[0]["score"] == pytest.approx(1.0, abs=1e-6)


def test_rag_index_append_rejects_reindexed_doc(spark, tmp_path):
    """Appending a doc_id that is already in the index collides on
    chunk_key and must fail loudly, not silently double-index."""
    from datapump_spark.recipes import rag_index_append

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(10)
    work = str(tmp_path / "dup")
    rag_index(docs, work, chunk_tokens=32, overlap=0)
    with pytest.raises(ValueError, match="collision"):
        rag_index_append(docs.limit(1), work)
