"""DSIR-style data selection: hashed n-gram importance resampling.

Select raw-corpus documents whose hashed n-gram distribution looks like a
TARGET domain (Xie et al. 2023, "Data Selection for Language Models via
Importance Resampling" — public method description only). The estimator:

1. Featurize text as unigrams + bigrams hashed into ``n_buckets`` (the
   hashing trick bounds model size regardless of vocabulary).
2. Fit two bag-of-buckets multinomials — target and raw — with Laplace
   smoothing; keep only the per-bucket log-ratio table
   ``logw[b] = log p_target(b) − log p_raw(b)`` (a few-KB broadcast).
3. Score each raw doc by its average feature log-ratio (length-normalized
   so the score ranks mixture proximity, not document length).
4. Resample with Gumbel top-k: ``score + Gumbel(seeded per-doc hash)``
   draws WITHOUT replacement with probability ∝ exp(score) — fully
   deterministic given the seed, layout-independent, no RNG state.

Scale design: both fits are one explode + one groupBy each (map-side
partial sums; state = n_buckets cells). Scoring is one explode + one
broadcast join on the weight table + one groupBy(doc). Selection is a
global top-k (rank over one column) — use ``sample_fraction`` at extreme
scale to pre-thin with the deterministic hash before ranking. Nothing is
collected to the driver; the weight table is the only broadcast state.

Everything is engine-identical under the md5 hash profile (see
functions/hashing.py) — oracle q_importance_weights / q_dsir_sample.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from datapump_spark.cachescope import scoped_persist
from datapump_spark.functions.hashing import hash63, tokens


def _bucket_features(df: DataFrame, id_col: str, text_col: str,
                     n_buckets: int, hash_fn: str) -> DataFrame:
    """(id, bucket) — one row per unigram AND bigram occurrence (bag
    semantics, duplicates kept: the multinomial counts occurrences)."""
    toks = tokens(F.col(text_col))
    d = df.select(F.col(id_col), toks.alias("__t"))
    # guard: Spark's sequence(1, 0) counts DOWN ([1, 0]) — a single-token
    # doc must contribute zero bigrams, not null grams
    bigrams = F.when(
        F.size("__t") >= 2,
        F.expr("transform(sequence(1, size(__t) - 1), "
               "i -> concat(element_at(__t, i), ' ', "
               "element_at(__t, i + 1)))")).otherwise(
        F.array().cast("array<string>"))
    grams = F.concat(F.col("__t"), bigrams)
    return (d.where(F.size("__t") > 0)
            .select(F.col(id_col), F.explode(grams).alias("__g"))
            .select(F.col(id_col),
                    F.pmod(hash63(F.col("__g"), hash_fn),
                           F.lit(n_buckets)).alias("bucket")))


def hashed_ngram_logratio(
    target: DataFrame, raw: DataFrame, text_col: str = "text",
    n_buckets: int = 1024, hash_fn: str = "md5",
    raw_fit_fraction: float = 1.0, id_col: str | None = None,
    raw_features: DataFrame | None = None,
) -> DataFrame:
    """(bucket, logw): per-bucket ``log p_target − log p_raw`` under
    Laplace-smoothed bag-of-hashed-ngrams multinomials — the entire DSIR
    model state (≤ ``n_buckets`` rows; broadcastable anywhere).

    ``raw_fit_fraction < 1`` fits the RAW multinomial on a deterministic
    hash-sample of ``id_col`` (requires ``id_col``): at 100 TB the raw
    distribution converges on a tiny fraction of the corpus, so the fit
    pass shrinks while scoring still scans everything. The target side is
    small by contract and never sampled.

    ``logw`` is rounded to 6 dp (repo float policy) so downstream scores
    are engine-identical.

    ``raw_features`` — a precomputed :func:`_bucket_features` frame of
    the raw corpus (id, bucket) — replaces the raw-side featurize pass:
    the multinomial only needs per-bucket occurrence counts, which are
    identical whether aggregated from the shared frame or from a
    dedicated pass. :func:`dsir_sample` passes the same persisted frame
    here and to the scoring join, halving the tokenize+hash scans over
    the big side (r12, guide §1/§2 — the fit and the score shared their
    most expensive input all along).
    """
    if raw_fit_fraction < 1.0:
        if id_col is None:
            raise ValueError("raw_fit_fraction < 1 requires id_col")
        m = 1_000_000
        raw = raw.where(
            F.pmod(hash63(F.col(id_col).cast("string"), hash_fn),
                   F.lit(m)) < int(raw_fit_fraction * m))
        if raw_features is not None:
            raw_features = raw_features.where(
                F.pmod(hash63(F.col(raw_features.columns[0]).cast("string"),
                              hash_fn), F.lit(m))
                < int(raw_fit_fraction * m))

    def counts(df: DataFrame, name: str) -> DataFrame:
        f = _bucket_features(df.select(F.lit(0).alias("__id"), text_col),
                             "__id", text_col, n_buckets, hash_fn)
        return f.groupBy("bucket").agg(
            F.count(F.lit(1)).cast("double").alias(name))

    t = counts(target, "n_t")
    if raw_features is not None:
        r = raw_features.groupBy("bucket").agg(
            F.count(F.lit(1)).cast("double").alias("n_r"))
    else:
        r = counts(raw, "n_r")
    # dense bucket spine: unseen buckets still get the smoothed mass
    spine = target.sparkSession.range(n_buckets) \
        .select(F.col("id").cast("bigint").alias("bucket"))
    j = (spine.join(t, "bucket", "left").join(r, "bucket", "left")
         .select("bucket",
                 F.coalesce("n_t", F.lit(0.0)).alias("n_t"),
                 F.coalesce("n_r", F.lit(0.0)).alias("n_r")))
    totals = j.agg(F.sum("n_t").alias("__tt"), F.sum("n_r").alias("__tr"))
    b = float(n_buckets)
    logw = (F.log((F.col("n_t") + 1.0) / (F.col("__tt") + b))
            - F.log((F.col("n_r") + 1.0) / (F.col("__tr") + b)))
    return (j.crossJoin(F.broadcast(totals))
            .select("bucket", F.round(logw, 6).alias("logw")))


def importance_score(
    df: DataFrame, logratio: DataFrame, id_col: str = "doc_id",
    text_col: str = "text", n_buckets: int = 1024, hash_fn: str = "md5",
    features: DataFrame | None = None,
) -> DataFrame:
    """(id, n_feats, score): per-document mean feature log-ratio — higher
    = more target-like. Docs with zero features are dropped (no evidence
    either way). One explode + broadcast join + one aggregation.
    ``features`` — a precomputed :func:`_bucket_features` frame — skips
    the featurize pass (see :func:`dsir_sample`)."""
    feats = features if features is not None \
        else _bucket_features(df, id_col, text_col, n_buckets, hash_fn)
    return (feats.join(F.broadcast(logratio), "bucket")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_feats"),
                 F.round(F.avg("logw"), 6).alias("score")))


def dsir_sample(
    df: DataFrame, target: DataFrame, k: int, id_col: str = "doc_id",
    text_col: str = "text", n_buckets: int = 1024, hash_fn: str = "md5",
    temperature: float = 1.0, seed: int = 42,
) -> DataFrame:
    """Top-``k`` Gumbel resample of ``df`` toward ``target``'s n-gram
    distribution: rank by ``score/temperature + g`` where ``g`` is a
    Gumbel draw derived deterministically from the seeded doc-id hash
    (md5 profile ⇒ DuckDB-twinnable; pass ``hash_fn='xxhash64'`` for
    production speed). Equivalent to sampling without replacement
    ∝ exp(score/T); T→0 approaches hard top-k by score, larger T keeps
    more diversity. Returns the selected rows with (score, rank)."""
    if temperature <= 0:
        raise ValueError(f"temperature must be > 0: {temperature}")
    # ONE featurize (tokenize + md5 + explode) pass over the raw corpus,
    # persisted and shared by the multinomial fit AND the scoring join —
    # previously the most expensive input was computed twice (measured
    # ~1.2 s per pass at sf0.1; same persist-in-operator pattern as
    # sparse_sim's tf diamond). Counts/scores are identical.
    feats = scoped_persist(_bucket_features(df, id_col, text_col,
                                            n_buckets, hash_fn))
    scored = df.join(
        importance_score(df, hashed_ngram_logratio(
            target, df, text_col, n_buckets, hash_fn, raw_features=feats),
            id_col, text_col, n_buckets, hash_fn, features=feats),
        id_col)
    # uniform in (0,1) from the seeded hash; never exactly 0 or 1
    m = float(1 << 32)
    h = hash63(F.concat(F.col(id_col).cast("string"), F.lit(f":{seed}")),
               hash_fn)
    u = (F.pmod(h, F.lit(1 << 32)).cast("double") + 1.0) / (m + 2.0)
    gumbel = -F.log(-F.log(u))
    key = F.round(F.col("score") / F.lit(float(temperature)) + gumbel, 6)
    # distributed top-k (TakeOrderedAndProject), never a one-partition
    # global window over the full corpus; the rank window then runs over
    # k rows only
    top = (scored.withColumn("__key", key)
           .orderBy(F.desc("__key"), F.col(id_col)).limit(k))
    w = Window.orderBy(F.desc("__key"), F.col(id_col))
    return (top.withColumn("rank", F.row_number().over(w))
            .drop("__key"))
