"""PDF text extraction in pure Python — the web corpus' second-biggest
document format after HTML.

Scope (the common machine-generated case, asserted honestly):
- classic cross-reference PDFs AND xref-stream PDFs are both handled by
  object scanning (``N G obj … endobj``), so damaged/linearized files
  still extract;
- content streams stored raw or FlateDecode-compressed (zlib);
- text operators: BT/ET blocks, Tj, ' , " and TJ array shows, Td/TD/T*
  line moves (emitted as newlines);
- string syntax: literal ``( … )`` with all escape forms (octal,
  ``\\n`` etc., nested parens, line continuations) and hex ``< … >``;
- single-byte font encodings are passed through as latin-1.

Out of scope (documented seams — the flags tell the caller): CID/Type0
composite fonts (two-byte codes; would need the font's ToUnicode CMap),
encrypted documents, LZW/DCT-compressed content, Type3 glyph drawing.
``extract_pdf_text`` returns (text, n_pages, flags) where flags carries
``cid_font`` / ``encrypted`` / ``unsupported_filter`` / ``truncated``
markers instead of
silently emitting garbage.

``encode_simple_pdf`` writes a minimal valid single-font PDF (fixture
and sink side) so the extractor faces a REAL Flate + escape round-trip
in tests and in the q_pdf_text oracle gate.

The Spark surface is :func:`pdf_text` — Arrow ``mapInPandas`` over a
binary payload column, the same kernel shape as the image codecs.

Reference parity note: the reference (datapump.py) has no document
parsing; this extends the engine for training-data pipelines per the
build charter.
"""

from __future__ import annotations

import re
import zlib

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b(.*?)endobj", re.S)
_STREAM_START_RE = re.compile(rb"stream\r?\n")
# fallback only (no direct /Length): GREEDY to the object's last
# endstream — the body already ends at endobj
_STREAM_FALLBACK_RE = re.compile(rb"stream\r?\n(.*)\r?\nendstream", re.S)
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)\b(?!\s+\d+\s+R)")


def _stream_data(body: bytes) -> bytes | None:
    """Extract a stream's exact bytes. The spec's /Length is
    authoritative — a regex scanning for ``endstream`` would truncate
    one byte whenever the (compressed) data happens to END with 0x0D,
    because the EOL before the keyword is optional-\\r ambiguous."""
    sm = _STREAM_START_RE.search(body)
    if not sm:
        return None
    head = body[:sm.start()]
    lm = _LENGTH_RE.search(head)
    if lm:
        start = sm.end()
        return body[start:start + int(lm.group(1))]
    fm = _STREAM_FALLBACK_RE.search(body)
    return fm.group(1) if fm else None

_ESCAPES = {
    ord("n"): "\n", ord("r"): "\r", ord("t"): "\t", ord("b"): "\b",
    ord("f"): "\f", ord("("): "(", ord(")"): ")", ord("\\"): "\\",
}


def _parse_literal_string(data: bytes, i: int) -> tuple[str, int]:
    """Parse a ``(...)`` literal starting at the '(' byte; returns
    (decoded text, index past ')')."""
    assert data[i] == ord("(")
    i += 1
    depth = 1
    out: list[str] = []
    n = len(data)
    while i < n:
        c = data[i]
        if c == ord("\\"):
            i += 1
            if i >= n:
                break
            e = data[i]
            if e in _ESCAPES:
                out.append(_ESCAPES[e])
                i += 1
            elif ord("0") <= e <= ord("7"):
                oct_digits = chr(e)
                i += 1
                while (i < n and len(oct_digits) < 3
                       and ord("0") <= data[i] <= ord("7")):
                    oct_digits += chr(data[i])
                    i += 1
                out.append(chr(int(oct_digits, 8) & 0xFF))
            elif e in (0x0A, 0x0D):
                # line continuation: swallow the EOL (and CRLF pair)
                i += 1
                if e == 0x0D and i < n and data[i] == 0x0A:
                    i += 1
            else:
                out.append(chr(e))
                i += 1
            continue
        if c == ord("("):
            depth += 1
        elif c == ord(")"):
            depth -= 1
            if depth == 0:
                return "".join(out), i + 1
        elif c == 0x0D:
            # unescaped EOL inside a literal is \n, CRLF collapsing to
            # one (PDF 7.3.4.2)
            out.append("\n")
            i += 1
            if i < n and data[i] == 0x0A:
                i += 1
            continue
        out.append(chr(c))
        i += 1
    return "".join(out), i


def _parse_hex_string(data: bytes, i: int) -> tuple[str, int]:
    assert data[i] == ord("<")
    j = data.index(b">", i + 1)
    hx = re.sub(rb"\s", b"", data[i + 1:j])
    if len(hx) % 2:
        hx += b"0"
    return bytes.fromhex(hx.decode("ascii")).decode("latin-1"), j + 1


def _content_text(content: bytes) -> str:
    """Walk a content stream's text operators. Shows within one line
    concatenate; Td/TD/T*/'/" line moves emit newlines."""
    out: list[str] = []
    i, n = 0, len(content)
    in_text = False
    pending_strings: list[str] = []

    def flush_op(op: bytes) -> None:
        nonlocal pending_strings
        if not in_text:
            pending_strings = []
            return
        if op == b"Tj":
            out.append(pending_strings[-1] if pending_strings else "")
        elif op == b"TJ":
            out.append("".join(pending_strings))
        elif op in (b"'", b'"'):
            if out:
                out.append("\n")
            out.append(pending_strings[-1] if pending_strings else "")
        elif op in (b"Td", b"TD", b"T*"):
            # a line move BEFORE any show is positioning, not a blank line
            if out:
                out.append("\n")
        pending_strings = []

    while i < n:
        c = content[i]
        if c == ord("("):
            s, i = _parse_literal_string(content, i)
            pending_strings.append(s)
            continue
        if c == ord("<"):
            if i + 1 < n and content[i + 1] == ord("<"):
                i += 2          # dictionary — skip the delimiters
                continue
            s, i = _parse_hex_string(content, i)
            pending_strings.append(s)
            continue
        if c == ord("%"):       # comment to EOL
            while i < n and content[i] not in (0x0A, 0x0D):
                i += 1
            continue
        m = re.match(rb"[A-Za-z'\"*]+", content[i:i + 8])
        if m:
            op = m.group(0)
            if op == b"BT":
                in_text = True
                pending_strings = []
            elif op == b"ET":
                in_text = False
            else:
                flush_op(op)
            i += len(op)
            continue
        i += 1
    # a trailing line move (the writer's per-line Td) is positioning too
    return "".join(out).rstrip("\n")


def extract_pdf_text(b: bytes) -> tuple[str, int, list[str]]:
    """(text, n_pages, flags). Flags: 'encrypted', 'cid_font',
    'unsupported_filter' — present when part of the document is outside
    scope (the extracted text covers what IS in scope)."""
    if not b.startswith(b"%PDF-"):
        raise ValueError("not a PDF")
    flags: set[str] = set()
    if re.search(rb"/Encrypt\b", b):
        flags.add("encrypted")
    if re.search(rb"/Type0\b|/Identity-H\b", b):
        flags.add("cid_font")

    n_pages = 0
    texts: list[str] = []
    for m in _OBJ_RE.finditer(b):
        body = m.group(3)
        sm = _STREAM_START_RE.search(body)
        head = body if sm is None else body[:sm.start()]
        # count pages from object DICTS only — never from stream bytes,
        # where a document ABOUT pdf syntax would inflate the count
        n_pages += len(re.findall(rb"/Type\s*/Page(?![A-Za-z])", head))
        if sm is None:
            continue
        data = _stream_data(body)
        lm = _LENGTH_RE.search(head)
        if lm and data is not None and len(data) < int(lm.group(1)):
            # the object scan cut at 'endobj' BYTES inside the stream —
            # re-slice at absolute offsets from the full buffer, and say
            # so if the file really ends early
            start = m.start(3) + sm.end()
            data = b[start:start + int(lm.group(1))]
            if len(data) < int(lm.group(1)):
                flags.add("truncated")
        if data is None:
            continue
        if re.search(rb"/Filter", head):
            if re.search(rb"/FlateDecode\b", head):
                try:
                    data = zlib.decompress(data)
                except zlib.error:
                    flags.add("unsupported_filter")
                    continue
            else:
                flags.add("unsupported_filter")
                continue
        # content streams contain text operators; other streams
        # (fonts, images, xref streams) simply yield nothing
        if b"BT" in data:
            texts.append(_content_text(data))

    # a file cut mid-object has NO trailing 'endobj', so the scan above
    # never sees its last object at all — detect it, flag, and salvage
    # whatever Flate can inflate of the partial stream
    last_end = max((m.end() for m in _OBJ_RE.finditer(b)), default=0)
    hm = re.search(rb"(\d+)\s+(\d+)\s+obj\b", b[last_end:])
    if hm:
        tail = b[last_end:]
        flags.add("truncated")
        sm = _STREAM_START_RE.search(tail, hm.end())
        if sm:
            head = tail[hm.end():sm.start()]
            n_pages += len(re.findall(rb"/Type\s*/Page(?![A-Za-z])", head))
            data = tail[sm.end():]
            if re.search(rb"/FlateDecode\b", head):
                try:
                    # decompressobj tolerates truncation (yields the
                    # prefix); genuinely corrupt bytes still raise
                    data = zlib.decompressobj().decompress(data)
                except zlib.error:
                    data = b""
            elif re.search(rb"/Filter", head):
                data = b""
            if b"BT" in data:
                texts.append(_content_text(data))
    return "\n".join(t for t in texts if t), n_pages, sorted(flags)


# --------------------------------------------------------------------------
# Minimal writer (fixtures, sink side)
# --------------------------------------------------------------------------

def _pdf_escape(s: str) -> bytes:
    out = s.encode("latin-1", errors="replace")
    return (out.replace(b"\\", rb"\\").replace(b"(", rb"\(")
            .replace(b")", rb"\)").replace(b"\r", rb"\r")
            .replace(b"\n", rb"\n"))


def encode_simple_pdf(text: str, compress: bool = True) -> bytes:
    """One-page Helvetica PDF showing ``text`` (lines become Td moves),
    Flate-compressed content stream by default, valid xref table."""
    shows = b"\n".join(
        b"(" + _pdf_escape(line) + b") Tj 0 -14 Td"
        for line in text.split("\n")) or b"() Tj"
    content = b"BT /F1 12 Tf 50 780 Td " + shows + b" ET"
    filt = b""
    if compress:
        content = zlib.compress(content)
        filt = b"/Filter /FlateDecode "

    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>",
        b"<< " + filt + b"/Length " + str(len(content)).encode()
        + b" >>\nstream\n" + content + b"\nendstream",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, o in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + o + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (b"trailer\n<< /Size " + str(len(objs) + 1).encode()
            + b" /Root 1 0 R >>\nstartxref\n"
            + str(xref_at).encode() + b"\n%%EOF\n")
    return bytes(out)


# --------------------------------------------------------------------------
# Spark surface
# --------------------------------------------------------------------------

_PDF_SCHEMA = ("media_id long, text string, n_chars int, n_pages int, "
               "flags array<string>")


def pdf_text(df, on_error: str = "null", passthrough: tuple = ()):
    """(media_id, text, n_chars, n_pages, flags[, passthrough…]) via
    Arrow mapInPandas over (media_id, payload). Same error contract as
    the image kernels: ``'null'`` drops undecodable payloads to null
    text, ``'raise'`` propagates. ``passthrough`` names string columns
    copied through the kernel — callers that need provenance (path,
    source) avoid a re-scan + shuffle join back onto the input."""
    import pandas as pd

    if on_error not in ("null", "raise"):
        raise ValueError(f"on_error must be 'null' or 'raise': {on_error!r}")
    schema = _PDF_SCHEMA + "".join(f", {c} string" for c in passthrough)

    def kernel(batches):
        for pdf_batch in batches:
            texts, chars, pages, flags = [], [], [], []
            for payload in pdf_batch["payload"]:
                try:
                    t, np_, fl = extract_pdf_text(bytes(payload))
                    texts.append(t)
                    chars.append(len(t))
                    pages.append(np_)
                    flags.append(fl)
                except Exception:
                    if on_error == "raise":
                        raise
                    texts.append(None)
                    chars.append(None)
                    pages.append(None)
                    flags.append(None)
            out = {
                "media_id": pdf_batch["media_id"], "text": texts,
                "n_chars": chars, "n_pages": pages, "flags": flags,
            }
            for c in passthrough:
                out[c] = pdf_batch[c]
            yield pd.DataFrame(out)

    return df.select("media_id", "payload", *passthrough)         .mapInPandas(kernel, schema)
