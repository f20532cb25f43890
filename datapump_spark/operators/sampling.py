"""Deterministic sampling / sharding / mixing operators for training-data
pipelines.

Every operator here is *reproducible by construction* — decisions are pure
functions of row keys (hash predicates, rank-within-group), never of
partition layout or RNG state. That's the property a 100 TB pipeline needs:
re-running a failed stage, changing cluster size, or recomputing a shard
must yield byte-identical output. Spark's own ``sample``/``sampleBy`` are
partition-seeded and give none of that.

All decisions are single-pass column expressions or one windowed rank —
no collect, no driver-side data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from datapump_spark.functions.hashing import hash63, tokens

# Hash-fraction denominator: fractions are expressed in basis points of
# 10_000 so weight tables stay integral and cross-engine exact.
FRACTION_DENOM = 10_000


def _key_hash(key: Column, salt: str, hash_fn: str = "md5") -> Column:
    return hash63(F.concat(F.lit(salt + ":"), key.cast("string")), hash_fn)


def hash_fraction_filter(
    df: DataFrame, key_col: str, fraction: float, salt: str = "sample",
    hash_fn: str = "md5",
) -> DataFrame:
    """Keep a deterministic ``fraction`` of rows by key-hash threshold.

    Nested property: the rows kept at 1% are a subset of the rows kept at
    10% (same salt) — lets a pipeline carve consistent dev/holdout subsets
    at several scales from one pass."""
    thresh = int(round(fraction * FRACTION_DENOM))
    h = _key_hash(F.col(key_col), salt, hash_fn)
    return df.where(h % FRACTION_DENOM < thresh)


def stratified_sample(
    df: DataFrame, strata_col: str, fractions: dict[str, float],
    key_col: str, salt: str = "strat", hash_fn: str = "md5",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum sampling: keep ``fractions[stratum]`` of
    each stratum by key-hash threshold (strata absent from the map get
    ``default_fraction``).

    Spark's ``sampleBy`` is partition-seeded (non-reproducible across
    re-runs/cluster sizes); this is a pure predicate — zero shuffle, one
    scan, and the nested-subset property of hash_fraction_filter holds
    per stratum (a 1% stratum sample ⊂ the 10% sample, same salt)."""
    thresh: Column = F.lit(int(round(default_fraction * FRACTION_DENOM)))
    for stratum, frac in sorted(fractions.items()):
        thresh = F.when(F.col(strata_col) == F.lit(stratum),
                        F.lit(int(round(frac * FRACTION_DENOM)))).otherwise(thresh)
    h = _key_hash(F.col(key_col), salt, hash_fn)
    return df.where(h % FRACTION_DENOM < thresh)


def group_cap(
    df: DataFrame, group_col: str, order_col: str, n: int,
) -> DataFrame:
    """At most ``n`` rows per group, lowest ``order_col`` first (the
    "cap documents per domain" op). One shuffle on the group key; the
    rank prunes inside each partition. For heavily skewed groups at scale,
    pre-filter with an approximate per-group count + hash_fraction_filter
    so no single group's partition explodes before ranking."""
    w = Window.partitionBy(group_col).orderBy(F.col(order_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= n)
        .drop("__rn")
    )


def shard_assign(
    df: DataFrame, key_col: str, n_shards: int, salt: str = "shard",
    hash_fn: str = "md5",
) -> DataFrame:
    """Add a deterministic ``shard`` column in [0, n_shards): the write-
    side sharding op (``df.repartition(n, 'shard').write.partitionBy``).
    Key-hash, not round-robin, so a row lands in the same shard no matter
    when or where it is processed."""
    h = _key_hash(F.col(key_col), salt, hash_fn)
    return df.withColumn("shard", (h % n_shards).cast("int"))


def temperature_mix(
    df: DataFrame, group_col: str, key_col: str, alpha: float = 0.5,
    salt: str = "temp", hash_fn: str = "md5",
) -> DataFrame:
    """Temperature-scaled rebalancing: keep a per-group fraction so the
    output distribution follows ``p_i^alpha`` (the multilingual-training
    sampling rule — alpha<1 up-weights small groups / rare languages).

    The largest surviving group is kept whole, so fractions are
    ``(n_min / n_i)^(1-alpha)``. With the default ``alpha=0.5`` that is
    ``sqrt(n_min / n_i)`` — IEEE-correctly-rounded in every engine, which
    keeps the hash-threshold decision bit-identical cross-engine (the
    DuckDB oracle replays it exactly). Other alphas go through ``pow``;
    fine for production, not oracle-pinned.

    Plan: one count aggregation (tiny result: one row per group), the
    per-group threshold broadcast-joined back, then the same zero-shuffle
    hash predicate as :func:`weighted_mix` — the corpus itself is scanned
    once and never shuffled."""
    counts = df.groupBy(group_col).agg(F.count("*").alias("__n"))
    n_min = counts.agg(F.min("__n").alias("__n_min"))
    if alpha == 0.5:
        frac = F.sqrt(F.col("__n_min") / F.col("__n"))
    else:
        frac = F.pow(F.col("__n_min") / F.col("__n"), 1.0 - alpha)
    thresh = counts.crossJoin(F.broadcast(n_min)).select(
        group_col,
        F.round(frac * FRACTION_DENOM).cast("bigint").alias("__thresh"),
    )
    h = _key_hash(F.col(key_col), salt, hash_fn)
    return (
        df.join(F.broadcast(thresh), group_col)
        .where(h % FRACTION_DENOM < F.col("__thresh"))
        .drop("__thresh")
    )


def weighted_mix(
    df: DataFrame, source_col: str, weights: dict[str, float],
    key_col: str, salt: str = "mix", hash_fn: str = "md5",
) -> DataFrame:
    """Down-sample each source to its weight (fraction in [0,1]); sources
    absent from ``weights`` are dropped. The dataset-mixing op: one scan,
    one hash per row, no shuffle — the 100 TB way to hit a target corpus
    recipe ("keep 100% of wiki, 10% of web")."""
    expr = None
    for src, wgt in sorted(weights.items()):
        t = int(round(wgt * FRACTION_DENOM))
        cond = F.col(source_col) == src
        expr = F.when(cond, t) if expr is None else expr.when(cond, t)
    thresh = expr.otherwise(F.lit(0)) if expr is not None else F.lit(0)
    h = _key_hash(F.col(key_col), salt, hash_fn)
    return df.where(h % FRACTION_DENOM < thresh)


def uniform_sample_k(
    df: DataFrame, key_col: str, k: int, salt: str = "topk",
) -> DataFrame:
    """Exactly-``k`` deterministic uniform sample: the ``k`` rows with the
    smallest salted key hash — the distributed replacement for reservoir
    sampling (same marginal distribution, but reproducible and
    parallel-mergeable, which a sequential reservoir is not).

    Plan: sort-by-hash + limit compiles to ``TakeOrderedAndProject`` —
    each task keeps a local k-heap and only k rows per partition reach
    the driver merge; there is NO global sort/shuffle of the data. The
    nested property holds: the k=100 sample ⊂ the k=1000 sample (same
    salt), so consistent eval subsets at several sizes cost one pass.
    """
    h = F.md5(F.concat(F.lit(salt + ":"), F.col(key_col).cast("string")))
    return df.orderBy(h.asc(), F.col(key_col).asc()).limit(k)


def weighted_sample_k(
    df: DataFrame, key_col: str, weight_col: str, k: int,
    salt: str = "wsample",
) -> DataFrame:
    """Exactly-``k`` weighted sample WITHOUT replacement (Efraimidis &
    Spirakis 2006): each row draws a deterministic uniform u from its
    salted key hash and is ranked by the exponential key
    ``−ln(u)/weight``; the ``k`` smallest win. Inclusion probability is
    proportional to weight at each of the k sequential draws — the
    one-pass, shuffle-free equivalent of weighted reservoir sampling
    (quality-weighted corpus subsets, importance sampling).

    Plan: same ``TakeOrderedAndProject`` shape as
    :func:`uniform_sample_k` — per-partition k-heaps, only k rows reach
    the driver merge, no global sort. Deterministic and
    layout-independent (u is a pure function of the key). Rows with
    weight ≤ 0 or null never win (key = +∞)."""
    h = hash63(F.concat(F.lit(salt + ":"), F.col(key_col).cast("string")))
    # hash63 ∈ [0, 2^60−1] → u ∈ (0, 1]
    u = (h.cast("double") + F.lit(1.0)) / F.lit(float((1 << 60) + 1))
    w = F.col(weight_col).cast("double")
    es_key = F.when(w > 0, -F.log(u) / w).otherwise(F.lit(float("inf")))
    return df.orderBy(es_key.asc(), F.col(key_col).asc()).limit(k)


def quality_binned_mix(
    df: DataFrame,
    score_col: str,
    rates: list[float],
    by: str | None = None,
    id_col: str = "doc_id",
    hash_fn: str = "md5",
) -> DataFrame:
    """Curriculum-style quality-binned sampling: rank documents by
    ``score_col`` into ``len(rates)`` equal-population percentile bins and
    keep each bin at its rate — "keep all of the best quartile, 10% of the
    worst" as one declarative pass (the quality-pacing mix
    data-curation recipes use; cf. temperature_mix for the per-language
    analogue). Adds ``bin`` and keeps only sampled rows.

    ``by`` partitions the ranking (per-source bins — a score threshold
    then means the same thing in every source, and the window never
    concentrates a full corpus in one partition; ``by=None`` is a global
    ranking and carries that scale caveat). Ranking is the exact rational
    percent_rank with ``id_col`` tie-break; the keep decision is the
    engine's deterministic hash-Bernoulli — rerun-stable, layout-free.
    """
    n = len(rates)
    if n < 1 or any(not 0.0 <= r <= 1.0 for r in rates):
        raise ValueError(f"rates must be fractions in [0,1]: {rates}")
    part = [by] if by else []
    w = Window.partitionBy(*part).orderBy(
        F.col(score_col).asc(), F.col(id_col).asc())
    pct = F.percent_rank().over(w)
    binned = df.withColumn(
        "bin", F.least(F.floor(pct * n), F.lit(n - 1)).cast("int"))
    rate = F.element_at(F.lit([float(r) for r in rates]),
                        F.col("bin") + 1)
    # round, don't truncate: 0.3*1e6 is 299999.99999999994 in ieee754
    keep = (F.pmod(_key_hash(F.col(id_col).cast("string"), "qbin", hash_fn),
                   F.lit(1_000_000))
            < F.round(rate * 1_000_000, 0).cast("long"))
    return binned.where(keep)


def token_budget_mix(
    df: DataFrame, source_col: str, weights: dict[str, float],
    budget_tokens: int, key_col: str, token_col: str | None = None,
    text_col: str = "text", salt: str = "tokmix", hash_fn: str = "md5",
) -> DataFrame:
    """Mixture by TOKEN budget, not document count: keep, per source, the
    hash-ordered prefix of documents whose cumulative token count fits
    within ``weights[source] × budget_tokens``. The recipe languages-
    models actually train on is stated in tokens ("300B tokens: 30% web,
    3% code…") — document-count mixing (:func:`weighted_mix`) hits the
    wrong target whenever sources differ in document length.

    Deterministic and layout-independent: the per-source order is the
    salted key hash (ties broken by key), so the selected set is a pure
    function of (data, weights, budget, salt) and the nested property
    holds — a smaller budget's selection is a prefix of a larger one's.
    A document is kept iff its cumulative sum INCLUDING itself is ≤ the
    source budget (strict: the budget is never exceeded; a single doc
    larger than its source budget is dropped). Sources absent from
    ``weights`` are dropped.

    Plan: one token-count column (or ``token_col`` if precomputed), one
    window cum-sum per source partition — a single shuffle keyed on the
    source. Output adds (n_tok, cum_tok) for auditability.
    """
    if budget_tokens <= 0:
        raise ValueError(f"budget_tokens must be > 0: {budget_tokens}")
    bad = [s for s, w in weights.items() if w < 0]
    if bad:
        raise ValueError(f"negative weights for {bad}")
    n_tok = (F.col(token_col).cast("bigint") if token_col is not None
             else F.size(tokens(F.col(text_col))).cast("bigint"))
    expr = None
    for src, wgt in sorted(weights.items()):
        b = int(wgt * budget_tokens)
        cond = F.col(source_col) == src
        expr = F.when(cond, b) if expr is None else expr.when(cond, b)
    src_budget = expr.otherwise(F.lit(-1)) if expr is not None else F.lit(-1)
    h = _key_hash(F.col(key_col), salt, hash_fn)
    w = Window.partitionBy(source_col).orderBy(h.asc(), F.col(key_col).asc()) \
        .rowsBetween(Window.unboundedPreceding, 0)
    return (df.withColumn("n_tok", n_tok)
            .withColumn("cum_tok", F.sum("n_tok").over(w))
            .where((src_budget >= 0) & (F.col("cum_tok") <= src_budget)))


def curriculum_order(
    df: DataFrame,
    signal_col: str,
    n_stages: int = 4,
    id_col: str = "doc_id",
    ascending: bool = True,
    strategy: str = "exact",
    hash_fn: str = "md5",
) -> DataFrame:
    """Curriculum ordering for training data: quantile STAGES over a
    difficulty signal (easy → hard when ``ascending``), with a
    deterministic hash shuffle WITHIN each stage — the standard
    curriculum-learning data layout (train in (stage, ord) order).

    (id, signal, stage 1..n, ord 1..|stage|); layout-independent and
    replayable: stage is a pure function of the signal distribution and
    ord of the id hash.

    - ``strategy='exact'``: NTILE over a single total order — the
      verifiable profile (exact SQL twin), but the stage pass is one
      global sort.
    - ``strategy='approx'``: the 100 TB profile — stage boundaries from
      approxQuantile (driver-bounded: n_stages-1 doubles), assignment is
      a scan-speed comparison chain, no global sort; the within-stage
      shuffle window partitions by stage. Boundary-adjacent rows may
      land one stage off vs exact (the documented quantile-sketch
      tolerance); stage SIZES may differ accordingly.
    """
    if n_stages < 1:
        raise ValueError(f"n_stages must be >= 1: {n_stages}")
    sig = F.col(signal_col) if ascending else -F.col(signal_col)
    if strategy == "exact":
        w = Window.orderBy(sig.asc(), F.col(id_col).asc())
        staged = df.withColumn("stage", F.ntile(n_stages).over(w))
    elif strategy == "approx":
        qs = [i / n_stages for i in range(1, n_stages)]
        # n_stages=1 needs no cutpoints (approxQuantile([]) NPEs)
        cuts = df.approxQuantile(signal_col, qs, 0.001) if qs else []
        if not ascending:
            cuts = sorted(-c for c in cuts)
        stage = F.lit(1)
        for b in cuts:
            stage = stage + (sig > F.lit(b)).cast("int")
        # null signals: NTILE sorts them FIRST (stage 1) in the exact
        # profile; the comparison chain would yield stage NULL — match
        # the exact profile instead of emitting unsortable rows
        stage = F.when(F.col(signal_col).isNull(), F.lit(1))             .otherwise(stage)
        staged = df.withColumn("stage", stage)
    else:
        raise ValueError(f"unknown strategy {strategy!r}")
    h = _key_hash(F.col(id_col), "curr", hash_fn)
    w2 = Window.partitionBy("stage").orderBy(h.asc(), F.col(id_col).asc())
    return staged.withColumn("ord", F.row_number().over(w2))
