"""Text-analysis operators for LLM training-data pipelines.

All four operators (token counting, quality scoring, language ID, document
fingerprinting) are pure column expressions — whole-stage codegen, zero
Python in the hot path, embarrassingly parallel (no shuffle at all: each is
a per-row map over the documents scan). At 100 TB these run at scan speed
with column pruning down to (doc_id, text).

Extends the reference (no text functions on data columns exist there,
SURVEY §2.9) per the build plan's training-data-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from datapump_spark.functions.hashing import hash63, tokens

# BPE-ish pretokenizer: letter runs | digit runs | single non-space symbol
BPE_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it"]

# language → marker words (checked against the token set). Matched langs for
# the driver's documents table: en/fr/de/es/zh. Tie-break = list order.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "das", "ist"],
    "es": ["el", "los", "las", "que", "es"],
    "fr": ["le", "la", "les", "et", "est"],
    "zh": ["的", "是", "了", "在", "我"],
}


def token_count_ws(c: Column) -> Column:
    """Whitespace token count."""
    return F.size(F.filter(F.split(c, r"\s+"), lambda x: x != F.lit("")))


def token_count_bpe(c: Column) -> Column:
    """BPE-ish pretoken count (letter runs / digit runs / symbols)."""
    return F.regexp_count(c, F.lit(BPE_RE))


def text_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, n_chars, n_tokens_ws, n_tokens_bpe, n_alpha, n_punct)."""
    c = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.length(c).cast("bigint").alias("n_chars"),
        token_count_ws(c).cast("bigint").alias("n_tokens_ws"),
        token_count_bpe(c).cast("bigint").alias("n_tokens_bpe"),
        F.length(F.regexp_replace(c, "[^A-Za-z]", "")).cast("bigint").alias("n_alpha"),
        F.length(F.regexp_replace(c, "[^.,;:!?]", "")).cast("bigint").alias("n_punct"),
    )


def quality_score(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Composite quality score in [0,1]:
      0.4·min(1, tokens/64) + 0.3·alpha_ratio + 0.3·min(1, 4·stopword_ratio)

    length (enough content) + alphabetic density (not markup/noise) +
    stopword presence (natural-language-ness). Deterministic, documented,
    SQL-expressible — the point is the pipeline shape, not the constants.
    """
    c = F.col(text_col)
    toks = tokens(c)
    n_tok = F.size(toks)
    stop_arr = F.lit(list(STOPWORDS))
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x)))
    alpha_ratio = F.length(F.regexp_replace(c, "[^A-Za-z]", "")) / F.greatest(F.length(c), F.lit(1))
    len_score = F.least(F.lit(1.0), n_tok / F.lit(64.0))
    stop_score = F.least(F.lit(1.0), F.lit(4.0) * n_stop / F.greatest(n_tok, F.lit(1)))
    score = F.lit(0.4) * len_score + F.lit(0.3) * alpha_ratio + F.lit(0.3) * stop_score
    return df.select(
        F.col(id_col),
        F.round(score, 6).alias("quality"),
    )


def lang_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Marker-word language ID: score = |tokens ∩ markers(lang)| per token
    occurrence; argmax with deterministic tie-break (LANG_MARKERS order)."""
    toks = tokens(F.col(text_col))

    def _contains(arr):
        # closure (not a default arg): a 2-arg lambda would make F.filter
        # pass the element index as the second argument
        return lambda x: F.array_contains(arr, x)

    scores = {}
    for lang, markers in LANG_MARKERS.items():
        arr = F.lit(list(markers))
        scores[lang] = F.size(F.filter(toks, _contains(arr)))
    g = F.greatest(*scores.values())
    pred = None
    for lang in LANG_MARKERS:  # first max wins (dict order = priority)
        cond = scores[lang] == g
        pred = F.when(cond, F.lit(lang)) if pred is None else pred.when(cond, F.lit(lang))
    return df.select(F.col(id_col), pred.alias("pred_lang"))


def fingerprint(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                gram: int = 8, hash_fn: str = "md5") -> DataFrame:
    """Two fingerprints per document:
    - ``fp_md5``: md5 hex of the normalized text (exact-dup key).
    - ``fp_roll``: min over rolling character ``gram``-gram hashes of the
      normalized text (stable under small edits — winnowing-style; computed
      with array expressions, no explode/shuffle).
    """
    norm = F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]", "")
    df2 = df.withColumn("__norm", norm)
    grams_sql = (
        f"transform(sequence(1, greatest(length(__norm) - {gram - 1}, 1)), "
        f"i -> substring(__norm, i, {gram}))"
    )
    if hash_fn == "md5":
        hashed = F.expr(
            f"transform({grams_sql}, "
            f"g -> CAST(conv(substr(md5(g), 1, 15), 16, 10) AS BIGINT))"
        )
    else:
        hashed = F.transform(F.expr(grams_sql), lambda g: F.abs(F.xxhash64(g)))
    return df2.select(
        F.col(id_col),
        F.md5("__norm").alias("fp_md5"),
        F.array_min(hashed).alias("fp_roll"),
    )


def token_entropy(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Per-document unigram token entropy — the gibberish/spam signal a
    quality pipeline pairs with :func:`quality_score`: keyboard mash and
    word-salad have near-maximal entropy, single-phrase spam near zero.

    ``H = ln(n) − (Σ c·ln c)/n`` over token counts c, computed with one
    explode + two aggregations (token counts per doc, then the per-doc
    fold) — both hash aggs with map-side partial combine, no windows.
    ``entropy_ratio`` normalizes by the max possible ``ln(n_distinct)``
    so thresholds transfer across document lengths. Rounded to 6dp under
    the repo float policy (oracle-matched)."""
    toks = df.select(F.col(id_col),
                     F.explode(tokens(F.col(text_col))).alias("tok"))
    counts = toks.groupBy(id_col, "tok").agg(F.count("*").alias("c"))
    ent = (counts.groupBy(id_col)
           .agg(F.sum("c").alias("n"),
                F.count("*").alias("n_distinct"),
                F.sum(F.col("c") * F.log("c")).alias("clc"))
           .select(
               F.col(id_col),
               F.col("n").cast("bigint").alias("n_tokens"),
               F.col("n_distinct").cast("bigint").alias("n_distinct_tokens"),
               F.round(F.log("n") - F.col("clc") / F.col("n"), 6)
               .alias("entropy"),
               F.round(
                   (F.log("n") - F.col("clc") / F.col("n"))
                   / F.log(F.greatest(F.col("n_distinct").cast("double"),
                                      F.lit(2.0))), 6).alias("entropy_ratio"),
           ))
    return (df.select(id_col).join(ent, id_col, "left")
            .na.fill({"n_tokens": 0, "n_distinct_tokens": 0,
                      "entropy": 0.0, "entropy_ratio": 0.0}))


# (operator name, Java/Spark script class, RE2/DuckDB script class) — the
# Unicode Script property both regex engines implement; oracles.py builds
# the identical SQL from this table.
SCRIPT_CLASSES = [
    ("latin", "IsLatin", "Latin"),
    ("cyrillic", "IsCyrillic", "Cyrillic"),
    ("greek", "IsGreek", "Greek"),
    ("arabic", "IsArabic", "Arabic"),
    ("hebrew", "IsHebrew", "Hebrew"),
    ("han", "IsHan", "Han"),
    ("hiragana", "IsHiragana", "Hiragana"),
    ("katakana", "IsKatakana", "Katakana"),
    ("hangul", "IsHangul", "Hangul"),
    ("devanagari", "IsDevanagari", "Devanagari"),
]


def script_profile(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
) -> DataFrame:
    """Per-document Unicode-script composition: character counts and
    fractions for the ten major scripts plus digits — the language-ID
    complement that catches what n-gram heuristics can't (mixed-script
    spam, mislabeled CJK in a 'latin' source, transliteration noise).

    (id, n_chars, n_<script>…, frac_<script>…, frac_digit, frac_other);
    fractions are over non-whitespace characters, rounded 6 dp. Pure
    codegen ``regexp_replace``/``length`` column expressions (counting by
    deletion — the formulation both Java and RE2 regex implement
    identically, so DuckDB twins every number); one scan, no shuffle,
    no UDF."""
    # Server-side SQL strings instead of ~100 per-Column py4j round trips
    # (r12 optimization round, guide §7.3 — the simhash/mediasniff
    # precedent). Identical expressions: counting by deletion, integer
    # arithmetic, round(x, 6); SQL '/' on integers is double division
    # exactly like the Column operator.
    d = df.selectExpr(
        f"`{id_col}`",
        f"regexp_replace(`{text_col}`, '\\\\s', '') AS __t")
    count_exprs = [
        f"length(regexp_replace(__t, '[^\\\\p{{{java}}}]', '')) AS n_{name}"
        for name, java, _ in SCRIPT_CLASSES]
    d = d.selectExpr(
        f"`{id_col}`", "length(__t) AS n_chars", *count_exprs,
        "length(regexp_replace(__t, '[^0-9]', '')) AS n_digit")
    known = " + ".join(
        [f"n_{name}" for name, _, _ in SCRIPT_CLASSES] + ["n_digit"])
    frac_exprs = [
        f"round(n_{name} / greatest(n_chars, 1), 6) AS frac_{name}"
        for name, _, _ in SCRIPT_CLASSES]
    return d.selectExpr(
        f"`{id_col}`", "n_chars",
        *[f"n_{name}" for name, _, _ in SCRIPT_CLASSES],
        "n_digit", *frac_exprs,
        "round(n_digit / greatest(n_chars, 1), 6) AS frac_digit",
        f"round((n_chars - ({known})) / greatest(n_chars, 1), 6)"
        " AS frac_other")


def readability(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Flesch reading-ease per document — the classic shallow difficulty
    signal (Flesch 1948; used alongside Gopher rules to route
    too-simple/too-garbled text):

        206.835 − 1.015·(words/sentences) − 84.6·(syllables/words)

    Syllables are the standard vowel-group heuristic (runs of
    ``[aeiouy]`` in the lowercased text), sentences are runs of ``[.!?]``
    (floored at 1), words are the engine's normalized tokens. Pure
    codegen (three regexp counts + one expression), shuffle-free; the
    DuckDB oracle runs the identical regexes. Returns ``(id, n_words,
    n_sentences, n_syllables, flesch)``; empty docs score NULL.
    """
    from datapump_spark.functions.hashing import tokens

    c = F.col(text_col)
    words = F.size(tokens(c))
    sents = F.greatest(
        F.size(F.regexp_extract_all(c, F.lit(r"[.!?]+"), F.lit(0))),
        F.lit(1))
    sylls = F.size(F.regexp_extract_all(F.lower(c), F.lit("[aeiouy]+"),
                                        F.lit(0)))
    flesch = F.when(
        words > 0,
        F.round(F.lit(206.835)
                - F.lit(1.015) * (words / sents)
                - F.lit(84.6) * (sylls / words), 6))
    return df.select(
        F.col(id_col),
        words.cast("bigint").alias("n_words"),
        sents.cast("bigint").alias("n_sentences"),
        sylls.cast("bigint").alias("n_syllables"),
        flesch.alias("flesch"),
    )
