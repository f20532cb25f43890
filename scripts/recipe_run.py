"""End-to-end pre-training corpus recipe evidence: generate a synthetic
corpus with the corpus_gen data source (known dup rate), run the FULL
pretrain_corpus chain (quality → repetition → decontam → PII → exact +
near dedup → canonical → pack), and print one JSON line of per-stage
survivor/reject counts + wall time — proof the whole pipeline composes
and what each gate costs at a given size.

Usage: python scripts/recipe_run.py [n_docs] (default 50_000)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000

    from pyspark.sql import functions as F

    from datapump_spark.queries import _t
    from datapump_spark.recipes import CorpusRecipe, pretrain_corpus
    from datapump_spark.session import tuned_builder
    from datapump_spark.sources.corpus_gen import register

    spark = (
        tuned_builder("recipe-run")
        .config("spark.driver.memory", "24g")   # local-mode heap for the
        .getOrCreate()                          # 50k+ doc tiers
    )
    spark.sparkContext.setLogLevel("ERROR")
    register(spark)
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    docs = (
        spark.read.format("corpus_gen")
        .option("rows", n_docs).option("partitions", 32)
        .option("dup_frac", 0.15).load()
        .persist()
    )
    n_in = docs.count()
    bench = _t(spark, "/root/testdata/sf0.01", "documents") \
        .limit(200).select("doc_id", "text")

    recipe = CorpusRecipe(
        min_words=20,
        max_dup_line_frac=0.8,
        weights=None,
    )
    t0 = time.perf_counter()
    out = pretrain_corpus(docs, benchmark=bench, recipe=recipe)
    clean_n = out["clean"].count()
    rejects = {r["reject_reason"]: r["n"] for r in
               out["rejected"].groupBy("reject_reason")
               .agg(F.count("*").alias("n")).collect()}
    seq_stats = out["sequences"].agg(
        F.count_distinct("seq_id").alias("n_seqs"),
        F.count("*").alias("n_doc_chunks")).first()
    wall = round(time.perf_counter() - t0, 2)

    print(json.dumps({
        "n_docs_in": n_in,
        "clean": clean_n,
        "rejected": rejects,
        "rejected_total": sum(rejects.values()),
        "n_sequences": seq_stats["n_seqs"],
        "n_doc_chunks": seq_stats["n_doc_chunks"],
        "accounted": clean_n + sum(rejects.values()) == n_in,
        "wall_sec": wall,
    }))


if __name__ == "__main__":
    main()
