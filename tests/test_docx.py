"""DOCX/ODT office text-extraction gates (operators/docx.py, round 9):
stdlib zipfile + ElementTree over the two ZIP+XML office formats,
writer twins, XML escaping, whitespace elements, honest flags."""

from __future__ import annotations

import io
import zipfile

import pytest

from datapump_spark.operators.docx import (
    encode_docx,
    encode_epub,
    encode_odt,
    extract_docx_text,
    extract_epub_text,
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
    (d / "e.epub").write_bytes(encode_epub(long + "from epub"))
    from datapump_spark.operators.docx import encode_pptx
    from datapump_spark.operators.rtf import encode_rtf
    (d / "f.pptx").write_bytes(encode_pptx(long + "from pptx"))
    (d / "g.rtf").write_bytes(encode_rtf(long + "from rtf"))
    from datapump_spark.operators.doc import encode_doc
    (d / "h.doc").write_bytes(encode_doc(long + "from doc"))
    (d / "junk.docx").write_bytes(b"not a zip at all")
    out = document_corpus(spark, str(tmp_path),
                          recipe=CorpusRecipe(min_words=10,
                                              dedup_threshold=0.95))
    texts = [r["text"] for r in out["clean"].collect()]
    assert sorted(t.split()[-2] for t in texts) == ["from"] * 7
    assert {t.split()[-1] for t in texts} == {"pdf", "docx", "odt",
                                              "epub", "pptx", "rtf",
                                              "doc"}
    q = out["quarantine"].collect()
    assert len(q) == 1 and q[0]["path"].endswith("junk.docx")


def test_epub_roundtrip_and_spine_order():
    """r11: multi-chapter EPUB round trip — spine order, 3-line
    chapters, XML escaping; chapter count is ceil(lines/3)."""
    t = "alpha & <beta>\nsecond\nthird\nchapter2 line\nfive\nsix\nseven"
    text, n, flags = extract_epub_text(encode_epub(t))
    assert text == t and n == 3 and flags == []
    text, n, flags = extract_epub_text(encode_epub(""))
    assert text == "" and n == 1 and flags == []
    # spine order is authoritative: reverse the itemrefs and the
    # chapters must come back reversed
    src = encode_epub("a\nb\nc\nd")                    # 2 chapters
    zf = zipfile.ZipFile(io.BytesIO(src))
    files = {zi.filename: zf.read(zi.filename) for zi in zf.infolist()}
    opf = files["OEBPS/content.opf"].decode()
    r0, r1 = '<itemref idref="c0"/>', '<itemref idref="c1"/>'
    files["OEBPS/content.opf"] = opf.replace(
        r0 + r1, r1 + r0).encode()
    text, n, _ = extract_epub_text(_rezip(files))
    assert text == "d\na\nb\nc" and n == 2


def _rezip(files: dict) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        zi = zipfile.ZipInfo("mimetype")
        zi.compress_type = zipfile.ZIP_STORED
        z.writestr(zi, files.get("mimetype", b"application/epub+zip"))
        for k, v in files.items():
            if k != "mimetype":
                z.writestr(k, v)
    return buf.getvalue()


def test_epub_foreign_xhtml_and_flags():
    """Foreign-style chapters: named XHTML entities substituted
    (unknown ones dropped + flagged), div-only layouts keep their
    text, script/style skipped; DRM encryption.xml flagged; spine
    idrefs without manifest targets flagged but don't fail the book;
    non-EPUB zips and wrong mimetypes refuse."""
    src = encode_epub("x")
    zf = zipfile.ZipFile(io.BytesIO(src))
    files = {zi.filename: zf.read(zi.filename) for zi in zf.infolist()}
    files["OEBPS/ch000.xhtml"] = (
        b'<?xml version="1.0"?>'
        b'<html xmlns="http://www.w3.org/1999/xhtml"><body>'
        b'<p>caf&eacute;&nbsp;&mdash; ok &amp; &unknownent; f</p>'
        b'<div><p>nested</p></div><div>bare text</div>'
        b'<script>var x = 1;</script></body></html>')
    text, n, flags = extract_epub_text(_rezip(files))
    assert text == "caf\xe9\xa0— ok &  f\nnested\nbare text"
    assert n == 1 and flags == ["entity_dropped"]
    # DRM flag: encryption.xml present, readable chapters still out
    files2 = dict(files)
    files2["META-INF/encryption.xml"] = b"<encryption/>"
    _, _, flags = extract_epub_text(_rezip(files2))
    assert "drm_encrypted" in flags
    # dangling spine idref
    files3 = {zi.filename: zf.read(zi.filename) for zi in zf.infolist()}
    del files3["OEBPS/ch000.xhtml"]
    text, n, flags = extract_epub_text(_rezip(files3))
    assert text == "" and n == 0 and flags == ["missing_item"]
    # refusals
    with pytest.raises(ValueError, match="mimetype"):
        extract_epub_text(_rezip({**files, "mimetype": b"text/plain"}))
    with pytest.raises(ValueError, match="container"):
        extract_epub_text(_rezip({"mimetype": b"application/epub+zip",
                                  "other.txt": b"hi"}))
    with pytest.raises(ValueError, match="not an EPUB"):
        extract_epub_text(b"PK\x03\x04 garbage not a zip")


def test_pptx_roundtrip_and_rel_order():
    """r11: multi-slide PPTX round trip — presentation.xml sldIdLst
    order resolved through the rels, 3-line slides, XML escaping;
    slide count is ceil(lines/3). Reversing the sldIdLst reverses the
    slide text; a package without presentation.xml falls back to
    natural slideN order with a flag only when order was declared."""
    from datapump_spark.operators.docx import (encode_pptx,
                                               extract_pptx_text)
    t = "title & <x>\nbullet\nmore\nslide2\nlast"
    text, n, flags = extract_pptx_text(encode_pptx(t))
    assert text == t and n == 2 and flags == []
    src = encode_pptx("a\nb\nc\nd")                # 2 slides
    zf = zipfile.ZipFile(io.BytesIO(src))
    files = {zi.filename: zf.read(zi.filename) for zi in zf.infolist()}
    pres = files["ppt/presentation.xml"].decode()
    s1 = '<p:sldId id="256" r:id="rId1"/>'
    s2 = '<p:sldId id="257" r:id="rId2"/>'
    files["ppt/presentation.xml"] = pres.replace(
        s1 + s2, s2 + s1).encode()
    text, n, _ = extract_pptx_text(_rezip_plain(files))
    assert text == "d\na\nb\nc" and n == 2
    # rels missing -> natural order fallback, flagged
    files2 = {zi.filename: zf.read(zi.filename) for zi in zf.infolist()}
    del files2["ppt/_rels/presentation.xml.rels"]
    text, n, flags = extract_pptx_text(_rezip_plain(files2))
    assert text == "a\nb\nc\nd" and flags == ["no_slide_order"]
    with pytest.raises(ValueError, match="slides"):
        extract_pptx_text(_rezip_plain({"other.xml": b"<x/>"}))
    with pytest.raises(ValueError, match="not a PPTX"):
        extract_pptx_text(b"not a zip")


def _rezip_plain(files: dict) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        for k, v in files.items():
            z.writestr(k, v)
    return buf.getvalue()


def test_document_text_kind_pptx_and_rtf(spark):
    from datapump_spark.operators.docx import document_text, encode_pptx
    from datapump_spark.operators.rtf import encode_rtf
    rows = [(1, encode_pptx("a\nb\nc\nd")), (2, encode_rtf("x\ny"))]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r for r in document_text(df).collect()}
    assert got[1]["kind"] == "pptx" and got[1]["n_units"] == 2
    assert got[1]["text"] == "a\nb\nc\nd"
    assert got[2]["kind"] == "rtf" and got[2]["text"] == "x\ny"


def test_document_text_kind_epub(spark):
    """The mixed dispatcher tags EPUB payloads kind='epub' with
    n_units = chapter count."""
    from datapump_spark.operators.docx import document_text
    rows = [(1, encode_epub("a\nb\nc\nd")), (2, encode_docx("x"))]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r for r in document_text(df).collect()}
    assert got[1]["kind"] == "epub" and got[1]["n_units"] == 2
    assert got[1]["text"] == "a\nb\nc\nd"
    assert got[2]["kind"] == "docx"
