"""End-to-end pre-training corpus recipe: the operators composed the way
a production pipeline chains them.

    raw docs ─ quality filter ─ (repetition gate) ─ (LM-perplexity gate)
             ─ decontam ─ PII redact ─ exact dedup
             ─ near-dup clusters → canonical docs ─ (weighted mix)
             ─ sequence packing ─ (training shards)

Each stage is one of the engine's tested operators; this module only
wires them, so the composed lineage stays a single declarative Spark plan
until the optional shard write. Rejected documents are *routed*, not
dropped — every stage's reject stream carries a ``reject_reason``,
mirroring the ingest pipeline's archive/problems split
(streaming/pipeline.py).

Scale shape: quality/PII/decontam are scan-speed column passes (decontam
broadcast-set), the dedups shuffle on hash keys, packing is the two-phase
prefix sum — nothing here adds a shuffle beyond its component operators,
and nothing touches the driver except the benchmark gram set.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datapump_spark.operators.decontam import decontaminate
from datapump_spark.operators.dedup_fuzzy import (
    canonical_docs,
    exact_dedup,
    near_dup_clusters,
)
from datapump_spark.operators.packing import pack_concat_chunks
from datapump_spark.operators.pii import pii_redact
from datapump_spark.operators.quality import gopher_filter
from datapump_spark.operators.sampling import weighted_mix
from datapump_spark.operators.text import quality_score


@dataclass
class CorpusRecipe:
    """Tuning knobs for :func:`pretrain_corpus`; defaults are the
    component operators' published defaults."""

    min_words: int = 50
    decontam_n: int = 13
    decontam_strategy: str = "auto"  # measured-size gate, decontam.py
    dedup_threshold: float = 0.5
    seq_budget: int = 1024
    weights: dict[str, float] | None = None
    source_col: str = "source"
    hash_fn: str = "md5"
    gopher_kwargs: dict = field(default_factory=dict)
    # optional repetition gate (operators/repetition.py); None = off
    max_dup_line_frac: float | None = None
    max_top_ngram_char_frac: float | None = None
    # optional LM-perplexity gate (operators/lm.py, CCNet shape): keep
    # docs with ppl ≤ ppl_max under a bigram LM fitted on lm_reference
    # (or, when None, on the quality-surviving corpus itself); None = off
    ppl_max: float | None = None


def pretrain_corpus(
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    recipe: CorpusRecipe | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    lm_reference: DataFrame | None = None,
) -> dict[str, DataFrame]:
    """Run the full cleaning chain. Returns named streams:

    - ``clean``     — surviving docs (redacted text), one row per doc
    - ``rejected``  — every dropped doc with ``reject_reason``
                      (``quality`` | ``repetitive`` | ``perplexity`` |
                      ``contaminated`` | ``exact_dup`` | ``near_dup``)
    - ``sequences`` — packed (seq_id, doc_id, n_tok_in_seq) rows over
                      the clean stream

    All lazy: callers materialize the streams they need.
    """
    r = recipe or CorpusRecipe()

    # 1. quality gate (keep column, never drops)
    q = gopher_filter(docs, id_col, text_col,
                      min_words=r.min_words, **r.gopher_kwargs)
    keep_ids = q.where(F.col("keep")).select(id_col)
    rej_quality = (q.where(~F.col("keep")).select(id_col)
                   .withColumn("reject_reason", F.lit("quality")))
    cur = docs.join(keep_ids, id_col, "semi")  # AQE sizes the join at runtime

    # 1b. repetition gate (optional, Gopher-style)
    rej_rep = None
    if (r.max_dup_line_frac is not None
            or r.max_top_ngram_char_frac is not None):
        from datapump_spark.operators.repetition import repetition_signals

        sig = repetition_signals(cur, id_col, text_col)
        bad_rep = F.lit(False)
        if r.max_dup_line_frac is not None:
            bad_rep = bad_rep | (
                F.col("dup_line_frac") > r.max_dup_line_frac)
        if r.max_top_ngram_char_frac is not None:
            bad_rep = bad_rep | (
                F.col("top_ngram_char_frac") > r.max_top_ngram_char_frac)
        bad = sig.where(bad_rep).select(id_col)
        rej_rep = bad.withColumn("reject_reason", F.lit("repetitive"))
        cur = cur.join(bad, id_col, "anti")

    # 1c. LM-perplexity gate (optional, CCNet-style)
    rej_ppl = None
    if r.ppl_max is not None:
        from datapump_spark.operators.lm import train_and_score

        ref = lm_reference if lm_reference is not None else cur
        scores = train_and_score(ref, cur, id_col, text_col)
        bad = scores.where(F.col("ppl") > r.ppl_max).select(id_col)
        rej_ppl = bad.withColumn("reject_reason", F.lit("perplexity"))
        cur = cur.join(bad, id_col, "anti")

    # 2. benchmark decontamination (optional)
    if benchmark is not None:
        flags = decontaminate(cur, benchmark, id_col, text_col,
                              n=r.decontam_n, hash_fn=r.hash_fn,
                              strategy=r.decontam_strategy)
        bad = flags.where(F.col("contaminated")).select(id_col)
        rej_contam = bad.withColumn("reject_reason", F.lit("contaminated"))
        cur = cur.join(bad, id_col, "anti")
    else:
        rej_contam = None

    # 3. PII redaction (text rewrite, no row change)
    red = pii_redact(cur, id_col, text_col, out_col="__clean")
    cur = (cur.drop(text_col).join(red, id_col)
           .withColumnRenamed("__clean", text_col))

    # 4. exact dedup (normalized-hash, lowest id wins)
    survivors = exact_dedup(cur, id_col, text_col)
    rej_exact = (cur.select(id_col).join(survivors.select(id_col), id_col, "anti")
                 .withColumn("reject_reason", F.lit("exact_dup")))

    # 5. near-dup clustering → best-quality canonical per cluster
    clusters = near_dup_clusters(survivors, id_col, text_col,
                                 threshold=r.dedup_threshold,
                                 hash_fn=r.hash_fn)
    canon = canonical_docs(clusters, quality_score(survivors, id_col, text_col),
                           id_col)
    clean = survivors.join(canon.select(id_col), id_col, "semi")
    rej_near = (survivors.select(id_col)
                .join(canon.select(id_col), id_col, "anti")
                .withColumn("reject_reason", F.lit("near_dup")))

    # 6. optional corpus recipe weights
    if r.weights is not None:
        clean = weighted_mix(clean, r.source_col, r.weights, id_col)

    rejected = rej_quality.unionByName(rej_exact).unionByName(rej_near)
    for extra in (rej_contam, rej_rep, rej_ppl):
        if extra is not None:
            rejected = rejected.unionByName(extra)

    sequences = pack_concat_chunks(clean, r.seq_budget, id_col, text_col)
    return {"clean": clean, "rejected": rejected, "sequences": sequences}
