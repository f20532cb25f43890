"""Measure recall@k of the approximate ANN paths against the exact
cosine baseline, for the reviewer-facing table in PERF.md.

Runs at the bench scale factor (default /root/testdata/sf0.1) on the
same session profile as bench.py. Recall@k = |approx ∩ exact| / |exact|
over (query_id, neighbor_id) pairs, averaged over the query set — the
standard ANN-benchmark definition (ann-benchmarks.com).

Usage: python scripts/ann_recall.py [sf_dir]
Prints a GitHub-markdown table + one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from datapump_spark.operators.similarity import cosine_topk, ivf_topk, lsh_topk
from datapump_spark.session import get_session


def pairs(rows):
    return {(r["query_id"], r["neighbor_id"]) for r in rows}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_session("ann-recall", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n_corpus = emb.count()
    n_queries, k = 20, 10

    t0 = time.perf_counter()
    exact = cosine_topk(emb, k=k, query_max_id=n_queries).collect()
    t_exact = time.perf_counter() - t0
    exact_set = pairs(exact)

    variants = [
        ("lsh_topk n_planes=2", lambda: lsh_topk(
            emb, k=k, query_max_id=n_queries, n_planes=2)),
        ("lsh_topk n_planes=4", lambda: lsh_topk(
            emb, k=k, query_max_id=n_queries, n_planes=4)),
        ("lsh_topk 4 planes / 4 probe (multi-probe)", lambda: lsh_topk(
            emb, k=k, query_max_id=n_queries, n_planes=4, n_probe=4)),
        ("lsh_topk 6 planes / 8 probe / 4 tables (default)", lambda: lsh_topk(
            emb, k=k, query_max_id=n_queries, n_planes=6, n_probe=8,
            n_tables=4)),
        ("lsh_topk 6 planes / 16 probe / 4 tables", lambda: lsh_topk(
            emb, k=k, query_max_id=n_queries, n_planes=6, n_probe=16,
            n_tables=4)),
        ("ivf_topk 16 cells / 4 probe", lambda: ivf_topk(
            emb, k=k, query_max_id=n_queries, n_cells=16, n_probe=4)),
        ("ivf_topk 16 cells / 8 probe", lambda: ivf_topk(
            emb, k=k, query_max_id=n_queries, n_cells=16, n_probe=8)),
        ("ivf_topk 16 cells / 16 probe (≡ exact)", lambda: ivf_topk(
            emb, k=k, query_max_id=n_queries, n_cells=16, n_probe=16)),
    ]

    from datapump_spark.operators.pq import pq_encode, pq_topk, train_pq

    cb = train_pq(emb, m=8, k=64, lloyd_iters=3, dim=64)
    codes = pq_encode(emb, cb).persist()
    codes.count()
    variants += [
        ("pq m=8 k=64 ADC-only", lambda: pq_topk(
            emb, cb, k=k, query_max_id=n_queries, codes=codes)),
        ("pq m=8 k=64 + rerank 8k", lambda: pq_topk(
            emb, cb, k=k, query_max_id=n_queries, codes=codes,
            rerank_factor=8)),
        ("pq m=8 k=64 + rerank 16k", lambda: pq_topk(
            emb, cb, k=k, query_max_id=n_queries, codes=codes,
            rerank_factor=16)),
    ]

    from datapump_spark.operators.pq import ivfpq_topk

    variants += [
        ("ivfpq 16 cells / 8 probe + rerank 8k", lambda: ivfpq_topk(
            emb, k=k, query_max_id=n_queries, n_cells=16, n_probe=8,
            rerank_factor=8)),
        ("ivfpq 16 cells / 16 probe + rerank 8k", lambda: ivfpq_topk(
            emb, k=k, query_max_id=n_queries, n_cells=16, n_probe=16,
            rerank_factor=8)),
    ]

    print(f"corpus={n_corpus} vectors, {n_queries} queries, k={k}, "
          f"sf_dir={sf_dir}")
    print(f"\n| path | recall@{k} | sec | exact sec |")
    print("|---|---|---|---|")
    out = {"exact_sec": round(t_exact, 2), "k": k, "corpus": n_corpus,
           "recall": {}}
    for name, fn in variants:
        t0 = time.perf_counter()
        approx = pairs(fn().collect())
        dt = time.perf_counter() - t0
        recall = len(approx & exact_set) / len(exact_set)
        out["recall"][name] = round(recall, 3)
        print(f"| {name} | {recall:.3f} | {dt:.2f} | {t_exact:.2f} |")
    print()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
