"""Sparse-retrieval operators: inverted index construction and BM25
ranking — the lexical complement of the dense-embedding similarity
operators (:mod:`.similarity`).

A training-data platform needs lexical search for corpus forensics
("which documents mention X?"), quality auditing, and hybrid retrieval;
BM25 (Robertson & Spärck Jones probabilistic relevance, the Okapi
formulation every search engine defaults to) is the standard scorer.

Plan shapes:
- :func:`inverted_index` — one explode → one ``groupBy(term)`` with
  map-side combine; posting lists materialize as sorted arrays, the
  parquet-friendly layout (a term row = one posting block; write it
  ``bucketBy(term)`` and lookups become partition-pruned scans).
- :func:`bm25_topk` — query terms are a literal set (tiny), filtered
  BEFORE the only shuffle: the exploded token stream keeps query-term
  hits only (doc length rides each row), one partial-aggregated
  ``groupBy(doc, term)`` yields tf+dl, the per-doc score one
  aggregation, top-k a ``TakeOrderedAndProject``. Nothing driver-side,
  no cross product; at 100 TB the shuffle is the query terms' postings,
  not the corpus vocabulary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datapump_spark.cachescope import scoped_persist
from datapump_spark.functions.hashing import tokens


def doc_term_freqs(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """(id, term, tf, dl) — term frequency + document length (in
    tokens), the base table both the index and BM25 read.

    ``dl`` derives from the tf aggregate (``Σ tf`` per doc) instead of a
    second pass over the exploded tokens, so every consumer (tf, dl,
    df) shares ONE (id, term) aggregation lineage and Catalyst can
    reuse its exchange rather than re-exploding the corpus."""
    t = df.select(F.col(id_col),
                  F.explode(tokens(F.col(text_col))).alias("term"))
    tf = t.groupBy(id_col, "term").agg(
        F.count("*").cast("bigint").alias("tf"))
    dl = tf.groupBy(id_col).agg(F.sum("tf").cast("bigint").alias("dl"))
    return tf.join(dl, id_col)


def inverted_index(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text",
                   min_df: int = 1) -> DataFrame:
    """(term, df, postings) — sorted doc-id posting list per term,
    dropping terms in fewer than ``min_df`` documents."""
    terms = df.select(F.col(id_col),
                      F.explode(tokens(F.col(text_col))).alias("term"))
    # ONE shuffle (guide §2.4): collect_set dedupes (term, id) repeats in
    # the partial (map-side) aggregation state, so the separate
    # distinct() pass — a second full exchange of the token stream —
    # is unnecessary; df is the posting-list size by definition.
    return (
        terms.groupBy("term")
        .agg(F.sort_array(F.collect_set(id_col)).alias("postings"))
        .select("term",
                F.size("postings").cast("bigint").alias("df"),
                "postings")
        .where(F.col("df") >= min_df)
    )


def bm25_topk(
    df: DataFrame,
    query: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` documents for ``query`` by Okapi BM25:
    (id, n_hit_terms, score, rank).

    ``idf = ln(1 + (N − df + 0.5)/(df + 0.5))`` (the non-negative Lucene
    variant); ties rank by id ASC on the 6-dp-rounded score."""
    spark = df.sparkSession
    q_terms = sorted({t for t in
                      __import__("re").split(r"[^a-z0-9]+", query.lower())
                      if t})
    if not q_terms:
        raise ValueError("query has no tokens")

    # N and avgdl in ONE raw scan: dl ≡ size(tokens) (what Σtf folds to),
    # nullif(…, 0) excludes token-less docs from the average exactly as
    # the dl table does — no pass over the exploded/aggregated lineage.
    stats = df.agg(
        F.count("*").cast("double").alias("__n"),
        F.avg(F.nullif(F.size(tokens(F.col(text_col))), F.lit(0)))
        .alias("__avgdl"))
    # Filter to query terms BEFORE the only shuffle (guide §2.3/§2.4):
    # dl ≡ size(tokens) rides each surviving exploded row, so the old
    # corpus-wide (doc, term) aggregation + per-doc dl rollup + tf⋈dl
    # join (doc_term_freqs) never happen — only query-term occurrences
    # enter the exchange, map-side partial aggregation collapses repeats
    # first, and tf/dl come out of the same tiny aggregate. The persist
    # means this lineage runs ONCE (candidates feed both docfreq and the
    # scorer). At 100 TB the shuffle is |postings of the query terms|,
    # not |corpus vocabulary occurrences|.
    toks = tokens(F.col(text_col))
    cand = (
        df.select(F.col(id_col),
                  F.size(toks).cast("bigint").alias("dl"),
                  F.explode(toks).alias("term"))
        .where(F.col("term").isin(q_terms))
        .groupBy(id_col, "term")
        .agg(F.count("*").cast("bigint").alias("tf"),
             F.first("dl").alias("dl"))
    )
    cand = scoped_persist(cand)
    docfreq = cand.groupBy("term").agg(
        F.count("*").cast("bigint").alias("df"))

    hits = (
        cand.join(F.broadcast(docfreq), "term")
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log(F.lit(1.0) + (F.col("__n") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5)))
    tf_term = (F.col("tf") * (k1 + 1)) / (
        F.col("tf") + F.lit(k1) * (F.lit(1.0 - b)
                                   + F.lit(b) * F.col("dl") / F.col("__avgdl")))
    # fold the per-term scores in TERM-SORTED order: a plain float sum()
    # is association-order-dependent, which would make the score
    # nondeterministic across shuffles (and unmatchable by the oracle)
    scored = (
        hits.select(id_col, "term", (idf * tf_term).alias("__ts"))
        .groupBy(id_col)
        .agg(F.count("*").cast("bigint").alias("n_hit_terms"),
             F.sort_array(F.collect_list(F.struct("term", "__ts")))
             .alias("__arr"))
        .select(
            F.col(id_col), "n_hit_terms",
            F.round(F.aggregate(
                F.transform("__arr", lambda s: s["__ts"]),
                F.lit(0.0), lambda acc, x: acc + x), 6).alias("score"),
        )
    )
    # TakeOrderedAndProject (executor heaps, only k rows move), then the
    # rank window runs over k rows only
    from pyspark.sql import Window
    top = scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)
    w = Window.orderBy(F.desc("score"), F.asc(id_col))
    return top.withColumn("rank", F.row_number().over(w).cast("int"))


def rrf_fuse(
    rankings: dict[str, DataFrame],
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 10,
    c: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) of named rankings —
    the standard hybrid-search combiner (BM25 ⊕ vector ranks, immune to
    incomparable score scales because only RANKS enter):

        rrf(d) = Σ_lists∋d  1 / (c + rank_list(d))

    Input: ``{name: df}`` where each df carries (id_col, rank_col) for
    ONE query's candidates. Output: (id, <name>_rank …, rrf, rank) —
    per-list ranks kept (null where a list missed the doc) so the fused
    table explains itself. ``c=60`` is the published default.

    Plan: candidate lists are top-k-sized (not corpora), so the fusion
    is a full-outer join chain over tiny frames + one codegen sum; ties
    break on the 6-dp-rounded score then id ASC, the engine-wide rank
    policy."""
    if not rankings:
        raise ValueError("rankings must be a non-empty dict")
    out = None
    for name, df in rankings.items():
        part = df.select(F.col(id_col),
                         F.col(rank_col).alias(f"{name}_rank"))
        out = part if out is None else out.join(part, id_col, "full_outer")
    score = None
    for name in rankings:
        term = F.when(F.col(f"{name}_rank").isNotNull(),
                      1.0 / (F.lit(c) + F.col(f"{name}_rank"))) \
            .otherwise(F.lit(0.0))
        score = term if score is None else score + term
    fused = out.withColumn("rrf", F.round(score, 6))
    from pyspark.sql import Window

    w = Window.orderBy(F.col("rrf").desc(), F.col(id_col).asc())
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )
