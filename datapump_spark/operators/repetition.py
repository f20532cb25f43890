"""Repetition signals for pre-training quality filtering (Gopher-style).

Rae et al. 2021 ("Scaling Language Models: ... Gopher", table A1) filter
documents by how internally repetitive they are: the fraction of
duplicate lines, the fraction of characters inside duplicate lines, the
fraction of characters covered by the single most frequent word n-gram,
and the fraction of characters inside any duplicated word n-gram. These
four signals catch boilerplate, scraped navigation, and degenerate
generation that plain length/stopword heuristics
(:mod:`datapump_spark.operators.text`) miss.

Plan shape: every signal — line AND gram — is strictly per-document,
so the whole operator is ONE zero-shuffle projection: each signal is a
sorted-run fold over a per-row array (``aggregate(array_sort(...))``),
O(G log G) in the document's own line/gram count. Round 12 rewrite
(guide §2.4): the gram signals previously exploded both gram sizes into
a corpus-wide ``groupBy(doc_id, kind, item)`` + a ``groupBy(doc_id)``
rollup + a join back onto the line frame — two full-corpus shuffles and
a join whose aggregation keys were per-document anyway. The sorted-run
fold computes the identical distinct-gram counts inside the row (counts
are exact integers, the (count, char-length) tie-break packing is the
same BIGINT), so results are bit-identical while the operator runs at
scan speed with no Exchange at any scale.

Determinism notes (mirrored exactly by the DuckDB oracle):
- counts-of-characters multiply overlapping grams; the dup-gram char
  fraction is therefore capped at 1.0 (the published filters threshold
  far below that).
- "most frequent n-gram" ties are broken toward the LONGEST gram string;
  the (count, char-length) pair is packed into one BIGINT
  (``count * 10^9 + len``) so a plain ``max`` resolves the tie
  identically in any engine.

Extends the reference (no text analysis there, SURVEY §2.9) per the
build plan's training-data surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from datapump_spark.functions.hashing import tokens

# (count, gram-char-length) → one orderable BIGINT; gram strings are
# < 10^9 chars by construction (a doc would not fit an executor otherwise)
PACK = 1_000_000_000


def _lines(c: Column) -> Column:
    """Non-empty trimmed lines.

    NB ``lambda x: F.trim(x)``, NOT ``F.trim``: transform() inspects the
    callable's arity and F.trim has an optional second parameter
    (trim-character set), so passing it bare makes Spark feed the array
    INDEX in as the characters to strip — line 0 silently loses its
    '0' characters (regression-tested on a many-line doc)."""
    return F.filter(F.transform(F.split(c, "\n"), lambda x: F.trim(x)),
                    lambda x: x != F.lit(""))


def _word_grams(toks: Column, n: int) -> Column:
    """Space-joined word n-grams (empty array when the doc is shorter)."""
    return F.when(
        F.size(toks) >= n,
        F.transform(F.sequence(F.lit(1), F.size(toks) - n + 1),
                    lambda i: F.array_join(F.slice(toks, i, n), " ")),
    ).otherwise(F.array().cast("array<string>"))


def repetition_signals(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_top: int = 2,
    n_dup: int = 5,
) -> DataFrame:
    """Per-document repetition profile.

    Returns ``(id, dup_line_frac, dup_line_char_frac,
    top_ngram_char_frac, dup_ngram_char_frac)`` — one row per input
    document (docs with no lines / too few tokens report 0.0).

    - ``dup_line_frac``: 1 − distinct lines / lines.
    - ``dup_line_char_frac``: chars inside lines occurring ≥ 2× ÷ doc
      chars.
    - ``top_ngram_char_frac``: occurrences × chars of the most frequent
      word ``n_top``-gram ÷ doc chars.
    - ``dup_ngram_char_frac``: chars inside word ``n_dup``-grams
      occurring ≥ 2× ÷ doc chars, capped at 1.0 (overlaps multiply).
    """
    c = F.col(text_col)
    base = df.select(
        F.col(id_col),
        F.greatest(F.length(c), F.lit(1)).cast("double").alias("__chars"),
        _lines(c).alias("__lines"),
        tokens(c).alias("__toks"),
    )

    # line signals: per-row array math, no shuffle. Duplicate-line chars
    # come from a SORTED-RUN fold — O(L log L) per document, so a
    # 10k-line scraped page costs a sort, not the O(L²) nested-filter
    # count (array_distinct itself is hash-based / linear). Integer
    # sums ⇒ values identical to any aggregation plan.
    lines = F.col("__lines")
    n_lines, n_distinct = F.size(lines), F.size(F.array_distinct(lines))
    run0 = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).cast("bigint").alias("cnt"),
        F.lit(0).cast("bigint").alias("chars"),
    )

    def _run_merge(acc, x):
        same = acc["prev"] == x
        flushed = F.when(
            ~same & (acc["cnt"] >= 2),
            acc["cnt"] * F.length(acc["prev"]).cast("bigint"),
        ).otherwise(F.lit(0).cast("bigint"))
        return F.struct(
            x.alias("prev"),
            F.when(same, acc["cnt"] + 1).otherwise(F.lit(1).cast("bigint"))
            .alias("cnt"),
            (acc["chars"] + flushed).alias("chars"),
        )

    dup_line_chars = F.aggregate(
        F.array_sort(lines), run0, _run_merge,
        lambda acc: acc["chars"] + F.when(
            acc["cnt"] >= 2,
            acc["cnt"] * F.length(acc["prev"]).cast("bigint"),
        ).otherwise(F.lit(0).cast("bigint")),
    )

    # gram signals: the same sorted-run fold, per row — a run in the
    # sorted gram array IS one distinct gram with its exact count, so
    # these reproduce the old groupBy(doc, item) counts bit-for-bit
    # with zero shuffle. '' is a safe run sentinel: grams join ≥ 1
    # non-empty tokens, so no gram is the empty string.
    dup_gram_chars = F.aggregate(
        F.array_sort(_word_grams(F.col("__toks"), n_dup)), run0, _run_merge,
        lambda acc: acc["chars"] + F.when(
            acc["cnt"] >= 2,
            acc["cnt"] * F.length(acc["prev"]).cast("bigint"),
        ).otherwise(F.lit(0).cast("bigint")),
    )

    # most frequent top-gram: max over runs of the packed (count, len)
    # BIGINT — identical tie-break to the old max() over the aggregate
    pack0 = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).cast("bigint").alias("cnt"),
        F.lit(None).cast("bigint").alias("best"),
    )

    def _pack_merge(acc, x):
        same = acc["prev"] == x
        flushed = F.when(
            ~same & (acc["cnt"] >= 1),
            acc["cnt"] * PACK + F.length(acc["prev"]).cast("bigint"),
        )
        return F.struct(
            x.alias("prev"),
            F.when(same, acc["cnt"] + 1).otherwise(F.lit(1).cast("bigint"))
            .alias("cnt"),
            F.greatest(acc["best"], flushed).alias("best"),
        )

    top_pack = F.aggregate(
        F.array_sort(_word_grams(F.col("__toks"), n_top)), pack0,
        _pack_merge,
        lambda acc: F.greatest(acc["best"], F.when(
            acc["cnt"] >= 1,
            acc["cnt"] * PACK + F.length(acc["prev"]).cast("bigint"))),
    )

    return base.select(
        F.col(id_col),
        F.round(
            F.when(n_lines > 0,
                   (n_lines - n_distinct) / n_lines.cast("double"))
            .otherwise(F.lit(0.0)), 6).alias("dup_line_frac"),
        F.round(dup_line_chars / F.col("__chars"), 6)
        .alias("dup_line_char_frac"),
        F.round(
            F.coalesce(
                (F.floor(top_pack / PACK) * (top_pack % PACK))
                / F.col("__chars"),
                F.lit(0.0)), 6).alias("top_ngram_char_frac"),
        F.round(F.least(F.lit(1.0),
                        dup_gram_chars / F.col("__chars")), 6)
        .alias("dup_ngram_char_frac"),
    )
