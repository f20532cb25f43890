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
import re
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


# --------------------------------------------------------------------------
# EPUB (r11, VERDICT r10 #7): the book-corpus format — a ZIP whose
# META-INF/container.xml names an OPF package; the OPF spine orders
# XHTML chapters. Same stdlib stack as DOCX/ODT above.
# --------------------------------------------------------------------------

_CNT = "{urn:oasis:names:tc:opendocument:xmlns:container}"
_OPF = "{http://www.idpf.org/2007/opf}"
_XHTML = "{http://www.w3.org/1999/xhtml}"

# XHTML defines ~250 named character references via its DTD; a
# non-validating XML parse (ElementTree) only knows the five XML
# built-ins, so the common names are substituted before parsing.
# Unknown names are dropped and flagged ('entity_dropped') instead of
# failing the chapter.
_XHTML_ENTITIES = {
    "nbsp": " ", "shy": "­", "copy": "©",
    "reg": "®", "trade": "™", "deg": "°",
    "mdash": "—", "ndash": "–", "hellip": "…",
    "lsquo": "‘", "rsquo": "’", "ldquo": "“",
    "rdquo": "”", "laquo": "«", "raquo": "»",
    "eacute": "é", "egrave": "è", "agrave": "à",
    "ccedil": "ç", "uuml": "ü", "ouml": "ö",
    "auml": "ä", "szlig": "ß", "frac12": "½",
    "times": "×", "middot": "·", "bull": "•",
}
_XML_BUILTIN = {"amp", "lt", "gt", "quot", "apos"}
_ENTITY_RE = re.compile(r"&([A-Za-z][A-Za-z0-9]*);")

# block-level XHTML elements that become one output paragraph each
_BLOCK_TAGS = frozenset(
    f"{_XHTML}{t}" for t in ("p", "h1", "h2", "h3", "h4", "h5", "h6",
                             "li", "blockquote", "pre", "td", "th",
                             "dt", "dd", "figcaption"))


def _sub_entities(xml_text: str, flags: list[str]) -> str:
    def sub(m):
        name = m.group(1)
        if name in _XML_BUILTIN:
            return m.group(0)
        if name in _XHTML_ENTITIES:
            return _XHTML_ENTITIES[name]
        if "entity_dropped" not in flags:
            flags.append("entity_dropped")
        return ""
    return _ENTITY_RE.sub(sub, xml_text)


def _xhtml_paragraphs(xml_text: str, flags: list[str]) -> list[str]:
    """One string per top-level block element of <body>, in document
    order (nested blocks — a <p> inside an <li> — fold into their
    outermost block so no text doubles); bodies with no block markup
    fall back to one paragraph of the whole body text."""
    root = ET.fromstring(_sub_entities(xml_text, flags))
    body = root.find(_XHTML + "body")
    if body is None:
        body = root.find("body")
    if body is None:
        return []
    paras: list[str] = []
    skip = (f"{_XHTML}script", f"{_XHTML}style", "script", "style")

    def walk(node):
        for child in node:
            if child.tag in skip:
                continue
            if child.tag in _BLOCK_TAGS:
                paras.append("".join(child.itertext()))
            elif any(d.tag in _BLOCK_TAGS for d in child.iter()):
                walk(child)           # container holding blocks
            else:
                # blockless container (div-only layouts): its text is
                # one paragraph rather than silently dropped
                t = "".join(child.itertext()).strip()
                if t:
                    paras.append(t)

    walk(body)
    if not paras:
        t = "".join(body.itertext()).strip()
        return [t] if t else []
    return paras


def extract_epub_text(b: bytes) -> tuple[str, int, list[str]]:
    """(text, n_chapters, flags) from an EPUB payload: container.xml →
    OPF rootfile → manifest hrefs → spine order → XHTML chapter text
    (one line per block element, chapters joined by newlines). Flags:
    'drm_encrypted' (META-INF/encryption.xml present — commonly only
    font obfuscation, so readable chapters still extract),
    'missing_item' (a spine idref without a readable manifest target),
    'entity_dropped' (an XHTML named entity outside the supported
    set). Raises ValueError for payloads that are not EPUBs."""
    import posixpath
    from urllib.parse import unquote

    try:
        zf = zipfile.ZipFile(io.BytesIO(b))
    except zipfile.BadZipFile as e:
        raise ValueError(f"not an EPUB: {e}") from None
    names = set(zf.namelist())
    if "META-INF/container.xml" not in names:
        raise ValueError("not an EPUB: no META-INF/container.xml")
    if "mimetype" in names:
        mt = zf.read("mimetype").strip()
        if mt != b"application/epub+zip":
            raise ValueError(f"not an EPUB: mimetype {mt!r}")
    flags: list[str] = []
    if "META-INF/encryption.xml" in names:
        flags.append("drm_encrypted")
    croot = ET.fromstring(zf.read("META-INF/container.xml"))
    rootfile = croot.find(f".//{_CNT}rootfile")
    opf_path = rootfile.get("full-path") if rootfile is not None else None
    if not opf_path or opf_path not in names:
        raise ValueError("EPUB container names no readable rootfile")
    opf = ET.fromstring(zf.read(opf_path))
    base = posixpath.dirname(opf_path)
    manifest = {item.get("id"): item.get("href")
                for item in opf.iter(_OPF + "item")}
    spine = [ir.get("idref") for ir in opf.iter(_OPF + "itemref")]
    chapters: list[str] = []
    for idref in spine:
        href = manifest.get(idref)
        path = (posixpath.normpath(posixpath.join(base, unquote(href)))
                if href else None)
        if path is None or path not in names:
            if "missing_item" not in flags:
                flags.append("missing_item")
            continue
        paras = _xhtml_paragraphs(
            zf.read(path).decode("utf-8", "replace"), flags)
        chapters.append("\n".join(paras))
    return "\n".join(chapters), len(chapters), flags


def encode_epub(text: str, lines_per_chapter: int = 3,
                title: str = "fixture") -> bytes:
    """Minimal valid EPUB — fixture/sink twin of extract_epub_text:
    input lines are grouped ``lines_per_chapter`` per XHTML chapter
    (one <p> per line), so the spine walk, multi-chapter ordering and
    XML escaping are all witnessed by an exact round trip. The
    ``mimetype`` entry is STORED first, per the OCF spec."""
    lines = text.split("\n")
    groups = [lines[i:i + lines_per_chapter]
              for i in range(0, len(lines), lines_per_chapter)] or [[""]]
    items, spine, files = [], [], []
    for ci, group in enumerate(groups):
        name = f"OEBPS/ch{ci:03d}.xhtml"
        body = "".join(f"<p>{_xml_escape(line)}</p>" for line in group)
        files.append((name, (
            "<?xml version=\"1.0\" encoding=\"UTF-8\"?>"
            "<html xmlns=\"http://www.w3.org/1999/xhtml\">"
            f"<head><title>{ci}</title></head>"
            f"<body>{body}</body></html>")))
        items.append(f"<item id=\"c{ci}\" href=\"ch{ci:03d}.xhtml\" "
                     "media-type=\"application/xhtml+xml\"/>")
        spine.append(f"<itemref idref=\"c{ci}\"/>")
    opf = (
        "<?xml version=\"1.0\" encoding=\"UTF-8\"?>"
        "<package xmlns=\"http://www.idpf.org/2007/opf\" version=\"3.0\""
        " unique-identifier=\"uid\">"
        "<metadata xmlns:dc=\"http://purl.org/dc/elements/1.1/\">"
        f"<dc:identifier id=\"uid\">urn:fixture</dc:identifier>"
        f"<dc:title>{_xml_escape(title)}</dc:title>"
        "<dc:language>en</dc:language></metadata>"
        "<manifest>" + "".join(items) + "</manifest>"
        "<spine>" + "".join(spine) + "</spine></package>")
    container = (
        "<?xml version=\"1.0\" encoding=\"UTF-8\"?>"
        "<container version=\"1.0\" xmlns=\"urn:oasis:names:tc:"
        "opendocument:xmlns:container\"><rootfiles>"
        "<rootfile full-path=\"OEBPS/content.opf\" media-type=\""
        "application/oebps-package+xml\"/></rootfiles></container>")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zi = zipfile.ZipInfo("mimetype", (2024, 1, 1, 0, 0, 0))
        zi.compress_type = zipfile.ZIP_STORED
        zf.writestr(zi, "application/epub+zip")
        for name, data in ([("META-INF/container.xml", container),
                            ("OEBPS/content.opf", opf)] + files):
            zf.writestr(zipfile.ZipInfo(name, (2024, 1, 1, 0, 0, 0)), data)
    return buf.getvalue()


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
    ``n_units`` is pages for PDFs, paragraphs for office docs, RTF
    and binary .doc, chapters for EPUBs, slides for PPTX (r11);
    ``kind`` is pdf / docx / odt / epub / rtf / pptx / doc / ppt. Error
    contract matches pdf_text; non-Word OLE2 payloads (xls/ppt/msg)
    flag ``legacy_doc`` on the null path.

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
                    elif pb[:8] == _OLE2_MAGIC:
                        # binary Word .doc / PowerPoint .ppt (r11,
                        # operators/doc.py); other OLE2 raises and
                        # routes to quarantine
                        from datapump_spark.operators.doc import \
                            extract_ole2_text
                        t, n, fl, kind = extract_ole2_text(pb)
                    elif pb[:5] == b"{\\rtf":
                        from datapump_spark.operators.rtf import \
                            extract_rtf_text
                        t, n, fl = extract_rtf_text(pb)
                        kind = "rtf"
                    elif b"META-INF/container.xml" in pb:
                        # EPUB (r11): the OCF container dir name rides
                        # uncompressed in the zip central directory
                        t, n, fl = extract_epub_text(pb)
                        kind = "epub"
                    elif b"ppt/presentation.xml" in pb \
                            or b"ppt/slides/" in pb:
                        t, n, fl = extract_pptx_text(pb)
                        kind = "pptx"
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
                    msg = str(e)
                    flags.append(["legacy_doc"]
                                 if ("legacy .doc" in msg
                                     or "OLE2" in msg
                                     or "WordDocument" in msg
                                     or ".doc" in msg) else None)
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


# --------------------------------------------------------------------------
# PPTX (r11, the slide third of VERDICT r10 missing item #5):
# presentationml is the same ZIP+XML stack — presentation.xml names
# the slide order via relationship ids, slides carry a:t text runs.
# --------------------------------------------------------------------------

_P = "{http://schemas.openxmlformats.org/presentationml/2006/main}"
_A = "{http://schemas.openxmlformats.org/drawingml/2006/main}"
_R = ("{http://schemas.openxmlformats.org/officeDocument/2006/"
      "relationships}")
_REL = "{http://schemas.openxmlformats.org/package/2006/relationships}"


def extract_pptx_text(b: bytes) -> tuple[str, int, list[str]]:
    """(text, n_slides, flags) from a PPTX payload: slide order from
    presentation.xml's sldIdLst resolved through the package rels
    (falling back to natural slideN order when either is absent,
    flagged 'no_slide_order'); one line per a:p paragraph (a:br is a
    line break), slides joined by newlines. Raises ValueError for
    non-PPTX zips."""
    try:
        zf = zipfile.ZipFile(io.BytesIO(b))
    except zipfile.BadZipFile as e:
        raise ValueError(f"not a PPTX package: {e}") from None
    names = set(zf.namelist())
    flags: list[str] = []
    slide_paths: list[str] = []
    if ("ppt/presentation.xml" in names
            and "ppt/_rels/presentation.xml.rels" in names):
        rels = ET.fromstring(zf.read("ppt/_rels/presentation.xml.rels"))
        targets = {rel.get("Id"): rel.get("Target")
                   for rel in rels.iter(_REL + "Relationship")}
        pres = ET.fromstring(zf.read("ppt/presentation.xml"))
        for sld in pres.iter(_P + "sldId"):
            tgt = targets.get(sld.get(_R + "id"))
            if not tgt:
                continue
            path = "ppt/" + tgt.lstrip("/") if not tgt.startswith(
                "ppt/") else tgt
            if path in names:
                slide_paths.append(path)
    if not slide_paths:
        cands = sorted(
            (nm for nm in names
             if re.fullmatch(r"ppt/slides/slide\d+\.xml", nm)),
            key=lambda nm: int(re.search(r"(\d+)", nm).group(1)))
        if not cands:
            raise ValueError("ZIP without PPTX slides")
        slide_paths = list(cands)
        if "ppt/presentation.xml" in names:
            flags.append("no_slide_order")
    slides = []
    for path in slide_paths:
        root = ET.fromstring(zf.read(path))
        paras = []
        for p in root.iter(_A + "p"):
            run = []
            for node in p.iter():
                if node.tag == _A + "t":
                    run.append(node.text or "")
                elif node.tag == _A + "br":
                    run.append("\n")
            paras.append("".join(run))
        slides.append("\n".join(paras))
    return "\n".join(slides), len(slides), flags


def encode_pptx(text: str, lines_per_slide: int = 3) -> bytes:
    """Minimal valid PPTX — fixture/sink twin of extract_pptx_text:
    input lines grouped ``lines_per_slide`` per slide (one a:p per
    line), slide order declared through presentation.xml + rels so
    the relationship walk is witnessed."""
    lines = text.split("\n")
    groups = [lines[i:i + lines_per_slide]
              for i in range(0, len(lines), lines_per_slide)] or [[""]]
    files = []
    rel_items, sld_items, overrides = [], [], []
    for si, group in enumerate(groups, start=1):
        paras = "".join(
            "<a:p><a:r><a:t>" + _xml_escape(line) + "</a:t></a:r></a:p>"
            for line in group)
        files.append((f"ppt/slides/slide{si}.xml", (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<p:sld xmlns:p="http://schemas.openxmlformats.org/'
            'presentationml/2006/main" xmlns:a="http://schemas.'
            'openxmlformats.org/drawingml/2006/main">'
            '<p:cSld><p:spTree><p:sp><p:txBody>' + paras
            + "</p:txBody></p:sp></p:spTree></p:cSld></p:sld>")))
        rel_items.append(
            f'<Relationship Id="rId{si}" Type="http://schemas.'
            "openxmlformats.org/officeDocument/2006/relationships/"
            f'slide" Target="slides/slide{si}.xml"/>')
        sld_items.append(
            f'<p:sldId id="{255 + si}" r:id="rId{si}"/>')
        overrides.append(
            f'<Override PartName="/ppt/slides/slide{si}.xml" '
            'ContentType="application/vnd.openxmlformats-'
            'officedocument.presentationml.slide+xml"/>')
    presentation = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<p:presentation xmlns:p="http://schemas.openxmlformats.org/'
        'presentationml/2006/main" xmlns:r="http://schemas.'
        'openxmlformats.org/officeDocument/2006/relationships">'
        "<p:sldIdLst>" + "".join(sld_items)
        + "</p:sldIdLst></p:presentation>")
    pres_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/'
        'package/2006/relationships">' + "".join(rel_items)
        + "</Relationships>")
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/'
        '2006/content-types">'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Default Extension="rels" ContentType="application/vnd.'
        'openxmlformats-package.relationships+xml"/>'
        '<Override PartName="/ppt/presentation.xml" ContentType='
        '"application/vnd.openxmlformats-officedocument.'
        'presentationml.presentation.main+xml"/>'
        + "".join(overrides) + "</Types>")
    root_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/'
        'package/2006/relationships"><Relationship Id="rId1" '
        'Type="http://schemas.openxmlformats.org/officeDocument/'
        '2006/relationships/officeDocument" '
        'Target="ppt/presentation.xml"/></Relationships>')
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, data in ([("[Content_Types].xml", content_types),
                            ("_rels/.rels", root_rels),
                            ("ppt/presentation.xml", presentation),
                            ("ppt/_rels/presentation.xml.rels",
                             pres_rels)] + files):
            zf.writestr(zipfile.ZipInfo(name, (2024, 1, 1, 0, 0, 0)),
                        data)
    return buf.getvalue()
