"""Corpus-level duplicate-line removal (C4 / RefinedWeb style).

C4's cleaning pass drops every occurrence-but-one of any line repeated
across the whole corpus (boilerplate: nav bars, cookie banners, license
headers). The winner is the occurrence at the smallest ``(doc order,
line position)``; all other occurrences are removed and documents are
reassembled from their surviving lines.

Plan shape, chosen for 100 TB:

1. ``posexplode(split(text, sep))`` → one row per (doc, line_no, line) —
   narrow, no shuffle.
2. Winner per line via ``groupBy(line_hash, line).agg(min(struct(ord,
   line_no)))`` — an **aggregation**, not a global window: partial
   (map-side) min states collapse the billions of occurrences of a hot
   boilerplate line to one row per task *before* the exchange, so line
   skew never concentrates in a single reducer the way a
   ``Window.partitionBy(line)`` sort would.
3. Occurrences join winners on ``(line_hash, line)`` — hash narrows the
   shuffle key, the raw line in the key makes 63-bit collisions harmless;
   AQE's skew-join split handles residual hot keys.
4. Reassemble per doc: ``sort_array(collect_list(struct(line_no, line)))``
   + ``array_join`` — one shuffle back on the doc id.

Total: two shuffles + the final doc-id shuffle, all on bounded keys.
Extends the reference (no text surface there, SURVEY §2.9).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datapump_spark.cachescope import scoped_persist
from datapump_spark.functions.hashing import hash63, tokens


def dup_passages(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 15,
    threshold: float = 0.2,
    hash_fn: str = "md5",
) -> DataFrame:
    """Duplicated-passage detection (exact-substring dedup signal, Lee et
    al. 2022 "Deduplicating Training Data Makes Language Models Better"):
    a passage is a rolling ``n``-token window; a document's *shared
    fraction* is the share of its distinct windows that also occur in at
    least one other document. Returns per document ``(id, n_grams,
    n_shared_grams, shared_frac, near_dup)`` — a flag column, so callers
    route rather than drop (suffix-array substring *removal* is the
    offline sibling; this is the scalable Spark-side detector).

    Plan: one gram explode (distinct per doc, no shuffle), ONE aggregation
    on the 63-bit gram hash whose partial (map-side) states collapse hot
    boilerplate grams before the exchange, a self-join of grams against
    multi-doc grams (broadcast-able survivors at high thresholds), and a
    per-doc count. Never all-pairs; the gram hash bounds every shuffle key
    at 8 bytes."""
    from datapump_spark.operators.decontam import doc_ngram_hashes

    # persisted: three consumers (shared-gram aggregation, the hit join,
    # per-doc totals) each re-ran the tokenize+hash explode (r12)
    grams = scoped_persist(doc_ngram_hashes(df, id_col, text_col, n, hash_fn))
    shared = (grams.groupBy("gram").agg(F.count("*").alias("__docs"))
              .where(F.col("__docs") >= 2)
              .select("gram"))
    hits = (grams.join(shared, "gram")
            .groupBy(id_col)
            .agg(F.count("*").alias("n_shared_grams")))
    totals = grams.groupBy(id_col).agg(F.count("*").alias("n_grams"))
    return (
        df.select(id_col)
        .join(totals, id_col, "left")
        .join(hits, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_grams", F.lit(0)).cast("bigint").alias("n_grams"),
            F.coalesce("n_shared_grams", F.lit(0)).cast("bigint")
            .alias("n_shared_grams"),
            F.round(
                F.coalesce("n_shared_grams", F.lit(0))
                / F.greatest(F.coalesce("n_grams", F.lit(0)), F.lit(1)),
                6,
            ).alias("shared_frac"),
        )
        .withColumn("near_dup", F.col("shared_frac") >= threshold)
    )


def explode_lines(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", sep: str = "\n") -> DataFrame:
    """One row per line: ``(id, line_no, line)``, 0-based positions.
    Empty lines are kept — they are positions, not content."""
    return df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), sep)).alias("line_no", "line"),
    )


def dedup_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
    scope: str = "corpus",
    hash_fn: str = "md5",
) -> DataFrame:
    """Remove all-but-the-first occurrence of every duplicated line.

    ``scope='corpus'``: first occurrence across the whole corpus wins
    (ordered by ``(id, line_no)``) — the C4 semantics. ``scope='doc'``:
    dedupe only within each document (no corpus-wide exchange; winner
    search and reassembly co-partition on the doc id).

    Returns one row per input document: ``(id, text, n_lines_kept,
    n_lines_removed)`` with ``text`` rebuilt from surviving lines in
    original order ('' when every line lost).
    """
    if scope not in ("corpus", "doc"):
        raise ValueError(f"scope must be 'corpus' or 'doc': {scope!r}")
    lines = explode_lines(df, id_col, text_col, sep)
    # persisted: the winner aggregation AND the occurrence join both
    # consume the hashed line stream (r12; same rationale as the gram
    # persist in remove_duplicate_spans — the md5-per-line pass costs
    # more than re-reading it)
    lines = scoped_persist(
        lines.withColumn("__h", hash63(F.col("line"), hash_fn)))
    pos = F.struct(F.col(id_col), F.col("line_no"))
    win_keys = ["__h", "line"] if scope == "corpus" else [id_col, "__h", "line"]
    winners = (lines.groupBy(*win_keys)
               .agg(F.min(pos).alias("__w")))
    kept = (lines.join(winners, win_keys)
            .where(pos == F.col("__w"))
            .select(id_col, "line_no", "line"))
    rebuilt = (kept.groupBy(id_col)
               .agg(
                   F.array_join(
                       F.transform(
                           F.array_sort(F.collect_list(F.struct("line_no", "line"))),
                           lambda s: s["line"],
                       ),
                       sep,
                   ).alias(text_col),
                   F.count("*").alias("n_lines_kept"),
               ))
    totals = df.select(
        F.col(id_col),
        F.size(F.split(F.col(text_col), sep)).alias("__n"),
    )
    return (totals.join(rebuilt, id_col, "left")
            .select(
                F.col(id_col),
                F.coalesce(text_col, F.lit("")).alias(text_col),
                F.coalesce("n_lines_kept", F.lit(0)).cast("bigint")
                .alias("n_lines_kept"),
                (F.col("__n") - F.coalesce("n_lines_kept", F.lit(0)))
                .cast("bigint").alias("n_lines_removed"),
            ))


def remove_duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 15,
    hash_fn: str = "md5",
) -> DataFrame:
    """Exact repeated-substring REMOVAL (Lee et al. 2022): every token
    ``n``-gram that occurs ≥ 2 times corpus-wide (within- or cross-doc)
    keeps only its first occurrence — smallest ``(id, position)`` — and
    every other occurrence's ``n``-token span is cut out of its document.
    Overlapping cuts merge, so a repeated 100-token passage (which is 51
    repeated overlapping ``n``-grams) disappears as one contiguous span.
    This is the distributed sibling of the paper's suffix-array ExactSubstr
    pass; :func:`dup_passages` is the flag-only detector.

    Returns one row per input document: ``(id, n_tokens, n_removed,
    clean_text)`` where ``clean_text`` is the normalized token stream
    (lowercased alphanumeric tokens, single-space joined — the same
    normalization every dedup operator here keys on) with deleted spans
    cut out ('' if everything was removed).

    Plan shape, chosen for 100 TB:
    1. gram hashes per doc via ``transform(sequence)`` + one
       ``posexplode`` — narrow, no shuffle;
    2. duplicated grams + their winning occurrence via ONE aggregation
       ``groupBy(gram).agg(count, min(struct(id, pos)))`` — partial
       (map-side) states collapse hot boilerplate grams before the
       exchange, so gram skew never lands on a single reducer;
    3. occurrences re-join the duplicated grams (AQE splits residual hot
       keys) and non-winners become per-doc sorted cut-start lists — one
       shuffle back on the doc id, list size bounded by doc length;
    4. reassembly is a single codegen ``aggregate`` over the sorted cut
       starts: slice-between-cuts with a rolling cursor — linear in doc
       length, zero Python.
    """
    # r12 (guide §1.2/§5): persist the two shared frames. `d` feeds the
    # gram pass AND the final reassembly join; `grams` feeds the winner
    # aggregation AND the occurrence re-join — unpersisted, the corpus
    # was tokenized three times and every gram md5-hashed twice. Both
    # caches spill to disk past memory; recomputing the md5-per-gram
    # pass costs more than re-reading it at any scale.
    d = scoped_persist(tokenized_docs(df, id_col, text_col))
    grams = scoped_persist(doc_gram_positions(d, id_col, n, hash_fn))
    dup = (grams.groupBy("gram")
           .agg(F.count("*").alias("__c"),
                F.min(F.struct(F.col(id_col), F.col("pos"))).alias("__w"))
           .where(F.col("__c") >= 2)
           .select("gram", "__w"))
    marked = (
        grams.join(dup, "gram")
        .where(~((F.col(id_col) == F.col(f"__w.{id_col}"))
                 & (F.col("pos") == F.col("__w.pos"))))
        .select(id_col, "pos")
    )
    return cut_spans(d, marked, id_col, n)


def tokenized_docs(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """``(id, __t tokens array, __nt count)`` — the shared span-op input."""
    return (df.select(F.col(id_col), tokens(F.col(text_col)).alias("__t"))
            .withColumn("__nt", F.size("__t")))


def doc_gram_positions(d: DataFrame, id_col: str, n: int,
                       hash_fn: str = "md5") -> DataFrame:
    """All token ``n``-gram hashes with 1-based start positions:
    ``(id, pos, gram)``. Narrow (transform + one posexplode), no shuffle."""
    return (
        d.where(F.col("__nt") >= n)
        .select(
            F.col(id_col),
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(1), F.col("__nt") - n + 1),
                    lambda i: hash63(
                        F.array_join(F.slice("__t", i, n), " "), hash_fn),
                )
            ).alias("__i", "gram"),
        )
        .select(F.col(id_col), (F.col("__i") + 1).alias("pos"), "gram")
    )


def cut_spans(d: DataFrame, marked: DataFrame, id_col: str,
              n: int) -> DataFrame:
    """Cut every ``n``-token span starting at a ``marked`` ``(id, pos)``
    out of its tokenized document (overlaps merged) and reassemble.

    The reassembly is one codegen ``aggregate`` over the per-doc sorted
    cut starts — slice-between-cuts with a rolling cursor, linear in doc
    length, zero Python. Returns ``(id, n_tokens, n_removed,
    clean_text)`` for EVERY input document ('' when everything was cut).
    """
    cuts = (marked.groupBy(id_col)
            .agg(F.sort_array(F.collect_list("pos")).alias("__starts")))
    out = (d.join(cuts, id_col, "left")
           .withColumn("__starts",
                       F.coalesce("__starts", F.array().cast("array<int>"))))
    kept = F.aggregate(
        "__starts",
        F.struct(F.lit(1).alias("cur"),
                 F.array().cast("array<string>").alias("parts")),
        lambda acc, s: F.struct(
            F.greatest(acc["cur"], s + n).alias("cur"),
            F.when(
                s > acc["cur"],
                F.concat(acc["parts"],
                         F.slice("__t", acc["cur"], s - acc["cur"])),
            ).otherwise(acc["parts"]).alias("parts"),
        ),
        lambda acc: F.concat(
            acc["parts"],
            F.when(
                acc["cur"] <= F.col("__nt"),
                F.slice("__t", acc["cur"],
                        F.col("__nt") - acc["cur"] + 1),
            ).otherwise(F.array().cast("array<string>")),
        ),
    )
    return out.select(
        F.col(id_col),
        F.col("__nt").cast("bigint").alias("n_tokens"),
        (F.col("__nt") - F.size(kept)).cast("bigint").alias("n_removed"),
        F.array_join(kept, " ").alias("clean_text"),
    )
