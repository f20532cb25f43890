"""Cleaning operators: normalization, boilerplate strip, compressibility."""

from __future__ import annotations

import zlib

import pytest
from pyspark.sql import functions as F

from datapump_spark.operators.cleaning import (
    compression_ratio,
    normalize_text,
    strip_boilerplate,
)


def test_normalize_text_collapses_whitespace_and_control(spark):
    df = spark.createDataFrame(
        [(1, "  a\t\tb \n c\x07d  "), (2, "clean text"), (3, ""), (4, None)],
        "id int, text string")
    out = {r["id"]: r["text"] for r in normalize_text(df).collect()}
    assert out[1] == "a b cd"  # \x07 dropped, runs collapsed, trimmed
    assert out[2] == "clean text"
    assert out[3] == ""
    assert out[4] is None


def test_normalize_text_lowercase_and_out_col(spark):
    df = spark.createDataFrame([(1, " A  B ")], "id int, text string")
    row = normalize_text(df, lowercase=True, out_col="norm").first()
    assert row["norm"] == "a b" and row["text"] == " A  B "


BP = "cookie banner accept all"


@pytest.fixture()
def bp_docs(spark):
    rows = []
    # source s0: banner in 3/4 docs -> boilerplate at frac 0.5
    rows += [(0, "s0", f"{BP}\nreal content zero"),
             (1, "s0", f"real content one\n{BP}"),
             (2, "s0", f"{BP}"),
             (3, "s0", "only real content three")]
    # source s1: banner in 1/2 docs but min_docs=2 not met
    rows += [(4, "s1", f"{BP}\nother text"), (5, "s1", "more text")]
    return spark.createDataFrame(rows, "doc_id int, source string, text string")


def test_strip_boilerplate_scoped_per_source(bp_docs):
    out = {r["doc_id"]: r for r in
           strip_boilerplate(bp_docs, min_docs_frac=0.5, min_docs=2).collect()}
    assert out[0]["text"] == "real content zero"
    assert out[1]["text"] == "real content one"
    assert out[2]["text"] == "" and out[2]["n_lines_kept"] == 0
    assert out[3]["text"] == "only real content three"
    # s1 keeps the banner: only 1 doc has it there
    assert out[4]["text"] == f"{BP}\nother text"
    assert out[4]["n_lines_removed"] == 0
    assert out[1]["n_lines_removed"] == 1


def test_strip_boilerplate_frac_threshold(bp_docs):
    # frac above 3/4 -> nothing is boilerplate in s0 either
    out = strip_boilerplate(bp_docs, min_docs_frac=0.9, min_docs=2)
    assert out.agg(F.sum("n_lines_removed")).first()[0] == 0


def test_compression_ratio_matches_driver_zlib(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text").limit(50)
    got = {r["doc_id"]: r for r in compression_ratio(docs).collect()}
    for r in docs.collect():
        raw = r["text"].encode("utf-8")
        exp = len(zlib.compress(raw, 6))
        g = got[r["doc_id"]]
        assert g["n_bytes"] == len(raw)
        assert g["n_compressed"] == exp
        assert g["compression_ratio"] == pytest.approx(
            exp / max(len(raw), 1), abs=1e-6)


def test_compression_ratio_flags_repetitive_text(spark):
    df = spark.createDataFrame(
        [(1, "spam " * 200), (2, " ".join(f"w{i}" for i in range(200)))],
        "doc_id int, text string")
    out = {r["doc_id"]: r["compression_ratio"]
           for r in compression_ratio(df).collect()}
    assert out[1] < out[2] * 0.5  # repetition compresses far better


def test_token_entropy_signals(spark):
    from datapump_spark.operators.text import token_entropy
    df = spark.createDataFrame(
        [(1, "spam spam spam spam"),            # zero entropy
         (2, "all four tokens differ here"),    # maximal entropy
         (3, ""),                               # empty -> 0s
         (4, "a a b b")],                       # H = ln 2
        "doc_id int, text string")
    out = {r["doc_id"]: r for r in token_entropy(df).collect()}
    assert out[1]["entropy"] == 0.0 and out[1]["n_distinct_tokens"] == 1
    import math
    assert out[2]["entropy"] == pytest.approx(math.log(5), abs=1e-6)
    assert out[2]["entropy_ratio"] == pytest.approx(1.0, abs=1e-6)
    assert out[3]["n_tokens"] == 0 and out[3]["entropy"] == 0.0
    assert out[4]["entropy"] == pytest.approx(math.log(2), abs=1e-6)


def test_strip_html_cases(spark):
    from datapump_spark.operators.cleaning import strip_html

    cases = [
        (1, "<p>plain <b>bold</b> text</p>", "plain bold text"),
        (2, '<SCRIPT a="b">alert("</p>")</SCRIPT>after', 'after'),
        (3, "<style>\n.x { a: 1 }\n</style>kept", "kept"),
        (4, "a <!-- \n multi\nline --> b", "a b"),
        (5, "5 &lt; 6 &amp;&nbsp;done&#39;", "5 < 6 & done'"),
        (6, "no markup at all", "no markup at all"),
        (7, "<div\nclass='x'>multi\nline tag</div>", "multi line tag"),
        (8, "", ""),
    ]
    df = spark.createDataFrame([(i, t) for i, t, _ in cases],
                               "doc_id long, text string")
    got = {r["doc_id"]: r["text"] for r in strip_html(df).collect()}
    for i, _, want in cases:
        assert got[i] == want, (i, got[i])


def test_strip_html_is_codegen(spark):
    from datapump_spark.operators.cleaning import strip_html

    df = spark.createDataFrame([(1, "<p>x</p>")], "doc_id long, text string")
    plan = strip_html(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_strip_html_no_double_decode(spark):
    """&amp;lt; is the LITERAL TEXT '&lt;' — decoding &amp; before the
    other entities would decode it twice into '<'."""
    from datapump_spark.operators.cleaning import strip_html

    df = spark.createDataFrame(
        [(1, "use &amp;lt;tag&amp;gt; to escape"),
         (2, "escaped amp: &amp;amp;")],
        "doc_id long, text string")
    got = {r["doc_id"]: r["text"] for r in strip_html(df).collect()}
    assert got[1] == "use &lt;tag&gt; to escape"
    assert got[2] == "escaped amp: &amp;"


def test_unicode_normalize_forms_and_zero_width(spark):
    """Composed ≡ decomposed after NFC; zero-width insertions stripped
    (the dedup-evasion artifact); NFKC folds compatibility forms; the
    fingerprints of normalized variants collide (the point of the op)."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from datapump_spark.operators.cleaning import unicode_normalize
    from datapump_spark.operators.dedup_fuzzy import exact_dedup

    composed = "café résumé"
    decomposed = "café résumé"
    zero_width = "café résu​mé"
    df = spark.createDataFrame(
        [(1, composed), (2, decomposed), (3, zero_width),
         (4, "ﬁle")],                       # ﬁ ligature (NFKC folds)
        "doc_id long, text string")

    nfc = {r["doc_id"]: r["text"] for r in
           unicode_normalize(df).collect()}
    assert nfc[1] == nfc[2] == nfc[3] == composed
    assert nfc[4] == "ﬁle"                  # NFC keeps ligatures

    nfkc = {r["doc_id"]: r["text"] for r in
            unicode_normalize(df, form="NFKC").collect()}
    assert nfkc[4] == "file"

    # downstream effect: all three spelling variants dedupe to one doc
    survivors = exact_dedup(unicode_normalize(df).where(F.col("doc_id") <= 3))
    assert [r["doc_id"] for r in survivors.collect()] == [1]

    with _pytest.raises(ValueError, match="form"):
        unicode_normalize(df, form="NFX")


PAGE = ('<html><head><script>var x=1;</script><style>.n:red;</style></head>'
        '<body><div class="nav"><a href="/">Home</a> <a href="/a">About</a> '
        '<a href="/c">Contact</a></div>'
        '<p>The quick brown fox jumps over the lazy dog and keeps going.</p>'
        '<p>See <a href="/r">this reference</a> for details about the '
        'brown fox story today.</p>'
        '<div class="footer"><a href="/p">Privacy</a> &amp; '
        '<a href="/t">Terms</a></div></body></html>')


def test_main_content_drops_link_dense_blocks(spark):
    from datapump_spark.operators.cleaning import extract_main_content

    df = spark.createDataFrame([(1, PAGE)], "doc_id bigint, text string")
    r = extract_main_content(df, out_col="main").collect()[0]
    assert r["n_blocks"] == 4 and r["n_kept"] == 2
    assert r["main"] == (
        "The quick brown fox jumps over the lazy dog and keeps going.\n"
        "See this reference for details about the brown fox story today.")


def test_main_content_knobs(spark):
    from datapump_spark.operators.cleaning import extract_main_content

    df = spark.createDataFrame([(1, PAGE)], "doc_id bigint, text string")
    # max_link_density=1.0 keeps every block long enough
    loose = extract_main_content(df, out_col="main",
                                 max_link_density=1.0).collect()[0]
    assert loose["n_kept"] == 2   # nav/footer still under min_words
    # min_words=2 + loose density lets the 3-word nav back in
    all_in = extract_main_content(df, out_col="main", min_words=2,
                                  max_link_density=1.0).collect()[0]
    assert all_in["n_kept"] == 4
    assert all_in["main"].startswith("Home About Contact")


def test_main_content_is_codegen(spark):
    from datapump_spark.operators.cleaning import extract_main_content

    df = spark.createDataFrame([(1, PAGE)], "doc_id bigint, text string")
    plan = (extract_main_content(df, out_col="main")
            ._jdf.queryExecution().executedPlan().toString())
    assert "mapInPandas" not in plan and "PythonUDF" not in plan


def test_main_content_plain_text_and_empty(spark):
    from datapump_spark.operators.cleaning import extract_main_content

    df = spark.createDataFrame(
        [(1, "just eleven plain words of prose with no markup at all"),
         (2, "")],
        "doc_id bigint, text string")
    out = {r["doc_id"]: r for r in
           extract_main_content(df, out_col="main").collect()}
    assert out[1]["n_blocks"] == 1 and out[1]["n_kept"] == 1
    assert out[1]["main"].startswith("just eleven")
    assert out[2]["n_blocks"] == 0 and out[2]["main"] == ""
