"""TF-IDF term weighting and per-document top-k keyword extraction.

The classic sparse-retrieval / keyword-extraction primitive (Salton &
Buckley 1988; smoothing per sklearn's TfidfTransformer:
``idf = ln((1+N)/(1+df)) + 1``). Useful on its own for corpus
exploration and as the sparse sibling of the dense-embedding similarity
operators.

Plan shape: explode → ``groupBy(doc, term)`` count (high-cardinality
composite key, map-side combined) → join the term→df table (term-keyed
shuffle; broadcasts when the vocabulary fits) → rank-filter top-k per
doc. Spark 4 plans the rank filter as ``WindowGroupLimit`` (partial
top-k below the exchange), so at 100 TB at most k rows per document
cross the final shuffle.

Determinism: ranking uses the ROUNDED score (6 dp) with term ASC
tie-break, so Spark and the DuckDB oracle order identically even when
float error puts two scores within 1e-15 of each other.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from datapump_spark.functions.hashing import tokens


def tfidf_topk(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
) -> DataFrame:
    """Top-``k`` terms per document by smoothed TF-IDF:
    (id, term, tf, df, tfidf, rank)."""
    terms = df.select(
        F.col(id_col),
        F.explode(tokens(F.col(text_col))).alias("term"),
    )
    tf = terms.groupBy(id_col, "term").agg(
        F.count("*").cast("bigint").alias("tf"))
    # df folds over the (doc, term) aggregate — one row per doc-term
    # pair IS the distinct set, so the old distinct() re-explode of the
    # corpus is redundant; the shared tf exchange is reused (r12)
    docfreq = tf.groupBy("term").agg(
        F.count("*").cast("bigint").alias("df"))
    n_docs = df.agg(F.count("*").cast("double").alias("__n"))
    scored = (
        tf.join(docfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col(id_col), "term", "tf", "df",
            F.round(
                F.col("tf")
                * (F.log((F.lit(1.0) + F.col("__n"))
                         / (F.lit(1.0) + F.col("df"))) + F.lit(1.0)),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
    )
