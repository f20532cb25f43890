"""DOCX / ODT text extraction in pure stdlib (round 9).

Office documents are the second-biggest slice of real document dumps
after PDF, and both modern formats are ZIP packages around one XML
part — exactly the stack this repo already ships (stdlib ``zipfile``
via sources/archives.py, ``xml.etree`` here). DOCX (OOXML, ECMA-376 /
ISO 29500) keeps body text in ``word/document.xml`` under the ``w:``
namespace; ODT (OASIS OpenDocument, ISO 26300) in ``content.xml``
under ``text:``. Extraction walks paragraphs in document order
(paragraphs inside table cells included — the python-docx convention),
expands tabs/breaks, and honors ODT's ``text:s``/``text:tab``
whitespace elements.

Legacy binary ``.doc`` (OLE2/CFB) is sniffed and flagged honestly
(``legacy_doc``) rather than garbled.

Reference parity note: the reference (datapump.py) has no document
surface at all; charter extension. Writer twins (encode_docx /
encode_odt) exist for fixtures and the exact-hash gate
(q_doc_text) — XML escaping of & < > is part of what the round trip
witnesses.
"""

from __future__ import annotations

import io
import zipfile
from xml.etree import ElementTree as ET

_W = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"
_TEXT = "{urn:oasis:names:tc:opendocument:xmlns:text:1.0}"
_OLE2_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"


def _docx_paragraph(p) -> str:
    out = []
    for node in p.iter():
        tag = node.tag
        if tag == _W + "t":
            out.append(node.text or "")
        elif tag == _W + "tab":
            out.append("\t")
        elif tag in (_W + "br", _W + "cr"):
            out.append("\n")
    return "".join(out)


def _odt_text(node) -> str:
    """Recursive text of one ODT paragraph/heading: text:s expands to
    its count of spaces, text:tab to a tab, text:line-break to \\n."""
    out = [node.text or ""]
    for child in node:
        tag = child.tag
        if tag == _TEXT + "s":
            out.append(" " * int(child.get(_TEXT + "c", "1")))
        elif tag == _TEXT + "tab":
            out.append("\t")
        elif tag == _TEXT + "line-break":
            out.append("\n")
        else:
            out.append(_odt_text(child))
        out.append(child.tail or "")
    return "".join(out)


def extract_docx_text(b: bytes) -> tuple[str, int, list[str]]:
    """(text, n_paragraphs, flags) from a DOCX or ODT payload —
    dispatched on the package's parts. Raises ValueError on payloads
    that are not office documents at all; a legacy OLE2 ``.doc``
    raises with the ``legacy .doc`` message (callers flag it)."""
    if b[:8] == _OLE2_MAGIC:
        raise ValueError("legacy .doc (OLE2) is not a ZIP package")
    try:
        zf = zipfile.ZipFile(io.BytesIO(b))
    except zipfile.BadZipFile as e:
        raise ValueError(f"not an office document: {e}") from None
    names = set(zf.namelist())
    flags: list[str] = []
    if "word/document.xml" in names:
        root = ET.fromstring(zf.read("word/document.xml"))
        paras = [_docx_paragraph(p) for p in root.iter(_W + "p")]
    elif "content.xml" in names:
        root = ET.fromstring(zf.read("content.xml"))
        paras = [_odt_text(p) for p in root.iter()
                 if p.tag in (_TEXT + "p", _TEXT + "h")]
    else:
        raise ValueError("ZIP without word/document.xml or content.xml")
    return "\n".join(paras), len(paras), flags


def encode_docx(text: str) -> bytes:
    """Minimal valid DOCX — one paragraph per input line, runs marked
    xml:space='preserve' so leading/trailing spaces survive. Fixture
    and sink twin of extract_docx_text."""
    body = "".join(
        "<w:p><w:r><w:t xml:space=\"preserve\">"
        + _xml_escape(line) + "</w:t></w:r></w:p>"
        for line in text.split("\n"))
    document = (
        "<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>"
        "<w:document xmlns:w=\"http://schemas.openxmlformats.org/"
        "wordprocessingml/2006/main\"><w:body>" + body
        + "</w:body></w:document>")
    content_types = (
        "<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>"
        "<Types xmlns=\"http://schemas.openxmlformats.org/package/2006/"
        "content-types\">"
        "<Default Extension=\"xml\" ContentType=\"application/xml\"/>"
        "<Override PartName=\"/word/document.xml\" ContentType=\""
        "application/vnd.openxmlformats-officedocument.wordprocessingml."
        "document.main+xml\"/></Types>")
    rels = (
        "<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>"
        "<Relationships xmlns=\"http://schemas.openxmlformats.org/"
        "package/2006/relationships\">"
        "<Relationship Id=\"rId1\" Type=\"http://schemas.openxmlformats."
        "org/officeDocument/2006/relationships/officeDocument\" "
        "Target=\"word/document.xml\"/></Relationships>")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, data in (("[Content_Types].xml", content_types),
                           ("_rels/.rels", rels),
                           ("word/document.xml", document)):
            zf.writestr(zipfile.ZipInfo(name, (2024, 1, 1, 0, 0, 0)), data)
    return buf.getvalue()


def encode_odt(text: str) -> bytes:
    """Minimal valid ODT — fixture twin for the OpenDocument read
    path. Runs of spaces inside a line are emitted as text:s elements
    (the format's own convention) so the extractor's whitespace
    handling is witnessed."""
    paras = []
    for line in text.split("\n"):
        parts = []
        i = 0
        while i < len(line):
            if line[i] == " " and (i + 1 < len(line) and line[i + 1] == " "):
                j = i
                while j < len(line) and line[j] == " ":
                    j += 1
                parts.append(f"<text:s text:c=\"{j - i}\"/>")
                i = j
            else:
                j = i
                while j < len(line) and not (
                        line[j] == " " and j + 1 < len(line)
                        and line[j + 1] == " "):
                    j += 1
                parts.append(_xml_escape(line[i:j]))
                i = j
        paras.append("<text:p>" + "".join(parts) + "</text:p>")
    content = (
        "<?xml version=\"1.0\" encoding=\"UTF-8\"?>"
        "<office:document-content "
        "xmlns:office=\"urn:oasis:names:tc:opendocument:xmlns:office:1.0\" "
        "xmlns:text=\"urn:oasis:names:tc:opendocument:xmlns:text:1.0\">"
        "<office:body><office:text>" + "".join(paras)
        + "</office:text></office:body></office:document-content>")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr(zipfile.ZipInfo("mimetype", (2024, 1, 1, 0, 0, 0)),
                    "application/vnd.oasis.opendocument.text")
        zf.writestr(zipfile.ZipInfo("content.xml", (2024, 1, 1, 0, 0, 0)),
                    content)
    return buf.getvalue()


def _xml_escape(s: str) -> str:
    return (s.replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;"))


# --------------------------------------------------------------------------
# Spark surface
# --------------------------------------------------------------------------

_DOC_SCHEMA = ("media_id long, text string, n_chars int, "
               "n_paragraphs int, flags array<string>")


def office_text(df, on_error: str = "null"):
    """(media_id, text, n_chars, n_paragraphs, flags) via Arrow
    mapInPandas over (media_id, payload) — DOCX and ODT dispatched per
    payload. Same error contract as pdf_text: ``'null'`` drops
    undecodable payloads to null text (legacy .doc gets the
    ``legacy_doc`` flag), ``'raise'`` propagates."""
    import pandas as pd

    if on_error not in ("null", "raise"):
        raise ValueError(f"on_error must be 'null' or 'raise': {on_error!r}")

    def kernel(batches):
        for pdf_batch in batches:
            texts, chars, paras, flags = [], [], [], []
            for payload in pdf_batch["payload"]:
                try:
                    t, np_, fl = extract_docx_text(bytes(payload))
                    texts.append(t)
                    chars.append(len(t))
                    paras.append(np_)
                    flags.append(fl)
                except Exception as e:
                    if on_error == "raise":
                        raise
                    texts.append(None)
                    chars.append(None)
                    paras.append(None)
                    flags.append(["legacy_doc"]
                                 if "legacy .doc" in str(e) else None)
            yield pd.DataFrame({
                "media_id": pdf_batch["media_id"], "text": texts,
                "n_chars": chars, "n_paragraphs": paras, "flags": flags,
            })

    return df.select("media_id", "payload").mapInPandas(kernel, _DOC_SCHEMA)


_ANY_SCHEMA = ("media_id long, text string, n_chars int, n_units int, "
               "kind string, flags array<string>")


def document_text(df, on_error: str = "null", passthrough: tuple = (),
                  passwords: dict[str, str] | None = None):
    """(media_id, text, n_chars, n_units, kind, flags[, passthrough…])
    over MIXED document payloads — per-payload magic dispatch between
    the PDF parser (operators/pdftext) and the office-XML parser here.
    ``n_units`` is pages for PDFs, paragraphs for office docs; ``kind``
    is pdf / docx / odt. Error contract matches pdf_text.

    ``passwords`` (r10): per-source PDF password map — each key is a
    path substring (exact path, directory, or source name), matched
    longest-key-first against the payload's ``path`` passthrough
    column; requires 'path' in ``passthrough``. Unmatched paths fall
    back to the empty password (the permissions-only case)."""
    import pandas as pd

    if on_error not in ("null", "raise"):
        raise ValueError(f"on_error must be 'null' or 'raise': {on_error!r}")
    if passwords and "path" not in passthrough:
        raise ValueError("passwords= needs 'path' in passthrough")
    pw_items = sorted((passwords or {}).items(),
                      key=lambda kv: -len(kv[0]))
    schema = _ANY_SCHEMA + "".join(f", {c} string" for c in passthrough)

    def kernel(batches):
        from datapump_spark.operators.pdftext import extract_pdf_text

        def pw_for(path) -> str:
            for needle, pw in pw_items:
                if needle in (path or ""):
                    return pw
            return ""

        for pdf_batch in batches:
            paths = pdf_batch["path"] if pw_items \
                else [None] * len(pdf_batch)
            texts, chars, units, kinds, flags = [], [], [], [], []
            for payload, path in zip(pdf_batch["payload"], paths):
                pb = bytes(payload)
                try:
                    if pb[:5] == b"%PDF-":
                        t, n, fl = extract_pdf_text(pb, pw_for(path))
                        kind = "pdf"
                    else:
                        t, n, fl = extract_docx_text(pb)
                        kind = ("docx" if b"word/document.xml" in pb
                                else "odt")
                    texts.append(t)
                    chars.append(len(t))
                    units.append(n)
                    kinds.append(kind)
                    flags.append(list(fl))
                except Exception as e:
                    if on_error == "raise":
                        raise
                    texts.append(None)
                    chars.append(None)
                    units.append(None)
                    kinds.append(None)
                    flags.append(["legacy_doc"]
                                 if "legacy .doc" in str(e) else None)
            out = {
                "media_id": pdf_batch["media_id"], "text": texts,
                "n_chars": chars, "n_units": units, "kind": kinds,
                "flags": flags,
            }
            for c in passthrough:
                out[c] = pdf_batch[c]
            yield pd.DataFrame(out)

    return df.select("media_id", "payload",
                     *passthrough).mapInPandas(kernel, schema)
