"""Benchmark decontamination — n-gram overlap between a training corpus
and an evaluation set.

The standard pre-training hygiene step (GPT-3 appendix C / PaLM style):
a training document is *contaminated* when it shares at least
``min_overlap`` distinct word ``n``-grams (n=13 is the published norm)
with any benchmark document. Both sides reduce to (doc, gram-hash)
pairs; the benchmark side is tiny (eval sets are thousands of rows), so
its distinct gram set broadcasts and the corpus side never shuffles —
the only exchange is the per-document hit count aggregation, which runs
on post-join survivors (a vanishing fraction of the corpus at 100 TB).

Hashing uses the cross-engine md5→bigint profile by default so the
DuckDB oracle can replay it; production flips ``hash_fn='xxhash64'``
(same plan, JVM-native speed) — see :mod:`datapump_spark.functions.hashing`.
Extends the reference (no text analysis there, SURVEY §2.9) per the
build plan's training-data surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datapump_spark.functions.hashing import hash63, tokens


def doc_ngram_hashes(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text", n: int = 13,
                     hash_fn: str = "md5") -> DataFrame:
    """Distinct word-``n``-gram hashes per document, exploded to
    ``(id, gram)`` rows. Documents shorter than ``n`` words contribute
    nothing. Pure column expressions until the explode — no shuffle."""
    toks = tokens(F.col(text_col))
    d = df.withColumn("__t", toks).withColumn("__n", F.size("__t"))
    grams = F.when(
        F.col("__n") >= n,
        F.transform(
            F.sequence(F.lit(1), F.col("__n") - n + 1),
            lambda i: hash63(F.array_join(F.slice("__t", i, n), " "),
                             hash_fn),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    return d.select(F.col(id_col),
                    F.explode(F.array_distinct(grams)).alias("gram"))


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 13,
    min_overlap: int = 1,
    hash_fn: str = "md5",
) -> DataFrame:
    """Flag corpus documents sharing ≥ ``min_overlap`` distinct
    ``n``-grams with the benchmark.

    Returns one row per corpus document: ``(id, n_hit_grams,
    contaminated)`` — rejects are flagged, not dropped, so downstream
    routes them (same keep-column contract as
    :func:`~datapump_spark.operators.quality.gopher_filter`).
    """
    cg = doc_ngram_hashes(corpus, id_col, text_col, n, hash_fn)
    bg = (doc_ngram_hashes(benchmark, id_col, text_col, n, hash_fn)
          .select("gram").distinct())
    hits = (cg.join(F.broadcast(bg), "gram")
            .groupBy(id_col)
            .agg(F.count("*").alias("n_hit_grams")))
    return (
        corpus.select(id_col)
        .join(hits, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_hit_grams", F.lit(0)).cast("bigint")
            .alias("n_hit_grams"),
            (F.coalesce("n_hit_grams", F.lit(0)) >= min_overlap)
            .alias("contaminated"),
        )
    )
