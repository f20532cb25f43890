"""Corpus cleaning: boilerplate stripping, text normalization, and a
compressibility quality signal.

Extends the reference (its surface has no text cleaning — SURVEY §2.9);
these are the standard web-corpus passes (CCNet, C4, RefinedWeb) a
pre-training pipeline runs before dedup/mixing.

Scale notes (100 TB):

- ``strip_boilerplate`` finds lines shared by a large fraction of a
  *source's* documents (nav bars, cookie banners, footers) and removes
  every occurrence. Frequency counting is an aggregation on
  ``(source, line_hash)`` with map-side partial combine, so a banner that
  appears in a billion documents collapses to one partial state per task
  before the exchange — line skew never lands on one reducer. Removal is
  a broadcast-able anti join against the (tiny, by construction:
  ``min_docs_frac`` keeps only lines in ≥ frac of a source) boilerplate
  set, then per-doc reassembly — the only corpus-sized shuffle is the
  doc-id regroup that any reassembly needs.
- ``normalize_text`` is pure ``regexp_replace``/``trim`` column
  expressions: whole-stage-codegen, zero shuffles, pushdown-transparent.
- ``compression_ratio`` (RefinedWeb-style "too compressible = spam /
  boilerplate" signal) needs zlib, which has no JVM-expression twin, so
  it is the one Python kernel here: an Arrow-batched ``mapInPandas``
  doing ``len(zlib.compress(t)) / len(t)`` per batch — no per-row Python
  UDF, no shuffle, streams with the scan.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datapump_spark.functions.hashing import hash63

# Control chars (incl. \t \r \n when normalizing to single-line) and
# whitespace runs. Kept as explicit class strings so the DuckDB oracle
# can use the identical pattern (oracles.py reuses these constants).
CONTROL_RE = "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]"
WS_RUN_RE = "[ \\t\\r\\n]+"


def normalize_text(
    df: DataFrame,
    text_col: str = "text",
    out_col: str | None = None,
    lowercase: bool = False,
) -> DataFrame:
    """Canonicalize text: drop control characters, collapse whitespace
    runs (incl. newlines) to single spaces, trim, optionally lowercase.

    Pure column expressions — codegen'd, no shuffle; safe to fuse with
    the ingest scan of a 100 TB corpus."""
    out = out_col or text_col
    c = F.regexp_replace(F.col(text_col), CONTROL_RE, "")
    c = F.regexp_replace(c, WS_RUN_RE, " ")
    c = F.trim(c)
    if lowercase:
        c = F.lower(c)
    return df.withColumn(out, c)


def boilerplate_lines(
    lines: DataFrame,
    id_col: str,
    source_col: str,
    min_docs_frac: float,
    min_docs: int,
) -> DataFrame:
    """Lines occurring in ≥ ``max(min_docs, frac·source_docs)`` distinct
    documents of their source: ``(source, __h, line, n_docs, doc_frac)``.

    Two aggregations, both with partial combine; the distinct-docs count
    dedupes (source, line, doc) *within* each doc first (cheap: per-row
    ``array_distinct`` never needed — posexplode rows for one doc sit in
    one scan task) via the two-level groupBy below."""
    per_doc = lines.select(source_col, id_col, "__h", "line").distinct()
    counts = (per_doc.groupBy(source_col, "__h", "line")
              .agg(F.count("*").alias("n_docs")))
    totals = (per_doc.select(source_col, id_col).distinct()
              .groupBy(source_col)
              .agg(F.count("*").alias("__tot")))
    return (counts.join(F.broadcast(totals), source_col)
            .withColumn("doc_frac", F.round(F.col("n_docs") / F.col("__tot"), 6))
            .where((F.col("n_docs") >= F.lit(min_docs))
                   & (F.col("n_docs") >= F.col("__tot") * F.lit(min_docs_frac)))
            .drop("__tot"))


def strip_boilerplate(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    sep: str = "\n",
    min_docs_frac: float = 0.05,
    min_docs: int = 2,
    hash_fn: str = "md5",
) -> DataFrame:
    """Remove every line that is boilerplate *within its source* (appears
    in ≥ ``min_docs_frac`` of the source's documents, and in at least
    ``min_docs`` of them). Returns one row per input document:
    ``(id, source, text, n_lines_kept, n_lines_removed)`` with ``text``
    rebuilt from surviving lines in original order ('' if all removed).

    CCNet/RefinedWeb scope the frequency table per *domain*; ``source``
    plays that role here. See module docstring for the plan shape."""
    lines = df.select(
        F.col(id_col), F.col(source_col),
        F.posexplode(F.split(F.col(text_col), sep)).alias("line_no", "line"),
    ).withColumn("__h", hash63(F.col("line"), hash_fn))
    bp = boilerplate_lines(lines, id_col, source_col, min_docs_frac, min_docs) \
        .select(source_col, "__h", "line")
    kept = (lines.join(bp, [source_col, "__h", "line"], "left_anti")
            .groupBy(id_col)
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
        F.col(id_col), F.col(source_col),
        F.size(F.split(F.col(text_col), sep)).alias("__n"),
    )
    return (totals.join(kept, id_col, "left")
            .select(
                F.col(id_col), F.col(source_col),
                F.coalesce(text_col, F.lit("")).alias(text_col),
                F.coalesce("n_lines_kept", F.lit(0)).cast("bigint")
                .alias("n_lines_kept"),
                (F.col("__n") - F.coalesce("n_lines_kept", F.lit(0)))
                .cast("bigint").alias("n_lines_removed"),
            ))


def compression_ratio(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    level: int = 6,
) -> DataFrame:
    """Per-document zlib compressibility: ``(id, n_bytes, n_compressed,
    compression_ratio)`` where ratio = compressed/raw (utf-8 bytes).

    Highly repetitive spam compresses far below normal prose (~0.3–0.5);
    RefinedWeb-style pipelines cut the low tail. zlib is deterministic for
    a fixed level, so results are stable across runs/engines — gated in
    tests against direct ``zlib.compress`` on the driver. Arrow-batched
    ``mapInPandas``; no shuffle, streams with the scan."""
    fields = [f for f in df.schema.fields if f.name == id_col]
    if not fields:
        raise ValueError(f"no column {id_col!r}")
    out_schema = T.StructType([
        fields[0],
        T.StructField("n_bytes", T.LongType()),
        T.StructField("n_compressed", T.LongType()),
        T.StructField("compression_ratio", T.DoubleType()),
    ])

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import zlib
        for pdf in batches:
            raw = pdf[text_col].fillna("").str.encode("utf-8")
            n = raw.str.len().astype("int64")
            comp = raw.map(lambda b: len(zlib.compress(b, level))).astype("int64")
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "n_bytes": n,
                "n_compressed": comp,
                "compression_ratio": (comp / n.clip(lower=1)).round(6),
            })

    return df.select(id_col, text_col).mapInPandas(kernel, out_schema)


# HTML stripping regexes — shared verbatim with the DuckDB oracle, so
# they must stay inside the RE2 ∩ Java-regex dialect: no backreferences
# (RE2 has none — hence one pattern per container tag instead of
# <(script|style)>…</\1>), no lookaround. Order matters: containers with
# content first, then comments, then remaining tags, then entities.
HTML_SCRIPT_RE = r"(?is)<script\b[^>]*>.*?</script\s*>"
HTML_STYLE_RE = r"(?is)<style\b[^>]*>.*?</style\s*>"
HTML_COMMENT_RE = r"(?s)<!--.*?-->"
HTML_TAG_RE = r"(?s)</?[A-Za-z!][^>]*>"
# &amp; MUST decode LAST: decoding it first re-exposes entity names that
# the later passes would decode again (the classic double-unescape bug —
# '&amp;lt;' means the literal text '&lt;', not '<')
_ENTITIES = [("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
             ("&quot;", '"'), ("&#39;", "'"), ("&amp;", "&")]


def strip_html(
    df: DataFrame,
    text_col: str = "text",
    out_col: str | None = None,
) -> DataFrame:
    """Extract visible text from HTML markup — the first cleaning step of
    every web-crawl pipeline (the regex baseline of what trafilatura /
    jusText do with DOM models; the DOM-aware version plugs in behind the
    same column contract when its libs are available).

    Removes <script>/<style> WITH their contents (code is not prose),
    comments, then all remaining tags; decodes the six ubiquitous
    entities; collapses whitespace runs. Pure codegen regexp_replace
    chain — scan-speed, shuffle-free, and oracle-twinnable since the
    patterns stay inside the RE2 ∩ Java dialect.
    """
    out = out_col or text_col
    c = F.col(text_col)
    c = F.regexp_replace(c, HTML_SCRIPT_RE, " ")
    c = F.regexp_replace(c, HTML_STYLE_RE, " ")
    c = F.regexp_replace(c, HTML_COMMENT_RE, " ")
    c = F.regexp_replace(c, HTML_TAG_RE, " ")
    for ent, rep in _ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(rep))
    c = F.trim(F.regexp_replace(c, r"\s+", " "))
    return df.withColumn(out, c)


# Block-level elements whose open/close tags delimit candidate text blocks
# (the jusText/Arc90 segmentation unit). Inline tags (<a>, <b>, <span>\u2026)
# deliberately stay INSIDE blocks \u2014 link density is measured per block.
HTML_BLOCK_SPLIT_RE = (
    r"(?i)</?(?:p|div|h[1-6]|li|ul|ol|table|tr|td|th|section|article|"
    r"header|footer|nav|aside|blockquote|main|form|br)\b[^>]*>")
HTML_ANCHOR_TEXT_RE = r"(?is)<a\b[^>]*>(.*?)</a\s*>"


def extract_main_content(
    df: DataFrame,
    text_col: str = "text",
    out_col: str | None = None,
    min_words: int = 5,
    max_link_density: float = 0.5,
) -> DataFrame:
    """Main-content extraction from full HTML pages \u2014 the jusText/Arc90
    block-scoring baseline: split the page into block-level segments,
    drop boilerplate blocks (navigation, footers, link farms) by LINK
    DENSITY and length, keep prose blocks, and reassemble. This is the
    step BEFORE :func:`strip_html`-style flattening: flattening a whole
    page keeps "Home | About | Contact" glued to the article text;
    block scoring removes it.

    A block survives when it has \u2265 ``min_words`` visible words AND its
    anchor-text share of visible characters \u2264 ``max_link_density``
    (boilerplate is short and link-dense; prose is long and link-sparse \u2014
    Kohlsch\u00fctter et al. 2010's two strongest shallow features).

    Returns the input plus ``out_col`` (kept blocks' visible text joined
    with newlines, entities decoded), ``n_blocks``, ``n_kept``. Pure
    codegen: one split + higher-order transform/filter per row \u2014 a
    projection fused into the scan, shuffle-free, and oracle-twinnable
    (patterns in the RE2 \u2229 Java dialect; the DuckDB twin runs the same
    regexes over unnested blocks).
    """
    out = out_col or text_col
    pre = F.col(text_col)
    for rx in (HTML_SCRIPT_RE, HTML_STYLE_RE, HTML_COMMENT_RE):
        pre = F.regexp_replace(pre, rx, " ")

    def visible(b):
        v = F.regexp_replace(b, HTML_TAG_RE, " ")
        for ent, rep in _ENTITIES:
            v = F.replace(v, F.lit(ent), F.lit(rep))
        return F.trim(F.regexp_replace(v, r"\s+", " "))

    def block_struct(b):
        link_raw = F.array_join(
            F.regexp_extract_all(b, F.lit(HTML_ANCHOR_TEXT_RE), F.lit(1)), " ")
        return F.struct(
            visible(b).alias("v"),
            visible(link_raw).alias("lv"),
        )

    scored = F.filter(
        F.transform(F.split(pre, HTML_BLOCK_SPLIT_RE), block_struct),
        lambda s: s["v"] != "",          # empty inter-tag segments aren't blocks
    )
    kept = F.filter(
        scored,
        lambda s: (F.size(F.split(s["v"], r"\s+")) >= min_words)
        & (F.length(s["lv"])
           <= max_link_density * F.greatest(F.length(s["v"]), F.lit(1))),
    )
    return (
        df.withColumn("n_blocks", F.size(scored).cast("bigint"))
        .withColumn("n_kept", F.size(kept).cast("bigint"))
        .withColumn(out, F.array_join(
            F.transform(kept, lambda s: s["v"]), "\n"))
    )


# ZWSP, ZWNJ, ZWJ, word joiner, BOM/ZWNBSP, soft hyphen
ZERO_WIDTH_RE = "[\u200b\u200c\u200d\u2060\ufeff\u00ad]"


def unicode_normalize(
    df: DataFrame,
    text_col: str = "text",
    out_col: str | None = None,
    form: str = "NFC",
    strip_zero_width: bool = True,
) -> DataFrame:
    """Unicode-canonicalize text: normalization form ``NFC``/``NFD``/
    ``NFKC``/``NFKD`` plus (default) zero-width/invisible character
    removal (ZWSP/ZWNJ/ZWJ/word-joiner/BOM/soft hyphen).

    Multilingual dedup breaks without this: 'café' composed and
    decomposed are DIFFERENT strings to every hash-based operator
    (exact_dedup fingerprints, MinHash shingles, line dedup), and
    zero-width insertions are the classic dedup-evasion artifact.
    Normalize at ingest, before any fingerprinting.

    The zero-width strip is a codegen ``regexp_replace``; normalization
    itself has no Spark built-in, so it runs as an Arrow-vectorized
    pandas UDF (`Series.str.normalize`) — a projection, not a shuffle,
    fused into the scan like every other cleaning pass. ``form='NFC'``
    is DuckDB-twinnable (``nfc_normalize``), the verifiability profile.
    """
    import pandas as pd  # noqa: F401 — signature documentation
    from pyspark.sql.functions import pandas_udf

    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"unknown normalization form {form!r}")
    out = out_col or text_col

    @pandas_udf("string")
    def _norm(s):
        return s.str.normalize(form)

    c = F.col(text_col)
    if strip_zero_width:
        c = F.regexp_replace(c, ZERO_WIDTH_RE, "")
    return df.withColumn(out, _norm(c))
