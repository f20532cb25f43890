"""DOCX/ODT office text-extraction gates (operators/docx.py, round 9):
stdlib zipfile + ElementTree over the two ZIP+XML office formats,
writer twins, XML escaping, whitespace elements, honest flags."""

from __future__ import annotations

import io
import zipfile

import pytest

from datapump_spark.operators.docx import (
    encode_docx,
    encode_odt,
    extract_docx_text,
    office_text,
)


def test_docx_roundtrip_with_escapes_and_tabs():
    t = "Hello & <world>\nsecond\twith tab\nA&B<C>D"
    text, n, flags = extract_docx_text(encode_docx(t))
    assert text == t and n == 3 and flags == []


def test_odt_roundtrip_preserves_space_runs():
    t = "cols:  two  spaces   three\nnext  line"
    text, n, flags = extract_docx_text(encode_odt(t))
    assert text == t and n == 2 and flags == []


def test_docx_breaks_and_table_paragraphs():
    # a hand-built document.xml: a w:br inside a run and a paragraph
    # inside a table cell must both surface in document order
    doc = (
        "<w:document xmlns:w=\"http://schemas.openxmlformats.org/"
        "wordprocessingml/2006/main\"><w:body>"
        "<w:p><w:r><w:t>a</w:t><w:br/><w:t>b</w:t></w:r></w:p>"
        "<w:tbl><w:tr><w:tc><w:p><w:r><w:t>cell</w:t></w:r></w:p>"
        "</w:tc></w:tr></w:tbl>"
        "</w:body></w:document>")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("word/document.xml", doc)
    text, n, _ = extract_docx_text(buf.getvalue())
    assert text == "a\nb\ncell" and n == 2


def test_legacy_doc_and_junk_raise():
    with pytest.raises(ValueError, match="legacy .doc"):
        extract_docx_text(b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1" + b"\x00" * 8)
    with pytest.raises(ValueError, match="not an office document"):
        extract_docx_text(b"plainly not a zip")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("unrelated.txt", "x")
    with pytest.raises(ValueError, match="without"):
        extract_docx_text(buf.getvalue())


def test_office_text_kernel_null_and_flags(spark):
    good = encode_docx("fine")
    legacy = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1" + b"\x00" * 8
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(legacy)),
         (3, bytearray(b"junk"))],
        "media_id long, payload binary")
    rows = {r["media_id"]: r for r in office_text(df).collect()}
    assert rows[1]["text"] == "fine" and rows[1]["n_paragraphs"] == 1
    assert rows[2]["text"] is None and rows[2]["flags"] == ["legacy_doc"]
    assert rows[3]["text"] is None and rows[3]["flags"] is None
    with pytest.raises(Exception):
        office_text(df, on_error="raise").collect()


@pytest.mark.slow
def test_document_corpus_mixed_tree(spark, tmp_path):
    """document_corpus over a tree mixing PDF, DOCX and ODT: one scan,
    per-payload dispatch, all three kinds reach the corpus."""
    from datapump_spark.operators.pdftext import encode_simple_pdf
    from datapump_spark.recipes import CorpusRecipe, document_corpus

    d = tmp_path / "src"
    d.mkdir()
    long = ("This is a reasonably long paragraph about data pipelines "
            "and storage engines, written to pass the quality gate. ") * 3
    (d / "a.pdf").write_bytes(encode_simple_pdf(long + "from pdf"))
    (d / "b.docx").write_bytes(encode_docx(long + "from docx"))
    (d / "c.odt").write_bytes(encode_odt(long + "from odt"))
    (d / "junk.docx").write_bytes(b"not a zip at all")
    out = document_corpus(spark, str(tmp_path),
                          recipe=CorpusRecipe(min_words=10,
                                              dedup_threshold=0.95))
    texts = [r["text"] for r in out["clean"].collect()]
    assert sorted(t.split()[-2] for t in texts) == ["from", "from", "from"]
    assert {t.split()[-1] for t in texts} == {"pdf", "docx", "odt"}
    q = out["quarantine"].collect()
    assert len(q) == 1 and q[0]["path"].endswith("junk.docx")
