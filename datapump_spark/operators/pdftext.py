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
- single-byte font encodings are passed through as latin-1;
- CID/Type0 composite fonts with an embedded ToUnicode CMap (the
  modern machine-generated case: Identity-H two-byte codes, bfchar /
  bfrange sections, Flate-compressed CMap streams). Font resource
  names (``/F1 12 Tf``) select the decoder per show string.

Out of scope (documented seams — the flags tell the caller): Type0
fonts WITHOUT a usable ToUnicode CMap (flag ``cid_font``; codes that a
present CMap doesn't cover flag ``cid_unmapped``),
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


class _CMap:
    """ToUnicode character map: raw code bytes → unicode text.
    ``code_lens`` (from the codespace ranges / observed key widths)
    drives a shortest-match-first walk; codes the map doesn't cover
    count in ``unmapped`` so the caller can flag instead of emitting
    garbage."""

    __slots__ = ("mapping", "code_lens", "unmapped")

    def __init__(self, mapping: dict[bytes, str], code_lens) -> None:
        self.mapping = mapping
        self.code_lens = sorted(set(code_lens) or {2})
        self.unmapped = 0

    def decode(self, raw: bytes) -> str:
        out: list[str] = []
        i, n = 0, len(raw)
        while i < n:
            for width in self.code_lens:
                chunk = raw[i:i + width]
                if len(chunk) == width and chunk in self.mapping:
                    out.append(self.mapping[chunk])
                    i += width
                    break
            else:
                self.unmapped += 1
                i += self.code_lens[0]
        return "".join(out)


_CS_RANGE_RE = re.compile(rb"begincodespacerange(.*?)endcodespacerange",
                          re.S)
_BFCHAR_RE = re.compile(rb"beginbfchar(.*?)endbfchar", re.S)
_BFRANGE_RE = re.compile(rb"beginbfrange(.*?)endbfrange", re.S)
_CMAP_TOK_RE = re.compile(rb"<[0-9A-Fa-f\s]*>|\[|\]")


def _unhex(tok: bytes) -> bytes:
    hx = re.sub(rb"[^0-9A-Fa-f]", b"", tok)
    if len(hx) % 2:
        hx += b"0"
    return bytes.fromhex(hx.decode("ascii"))


def _utf16_text(tok: bytes) -> str:
    db = _unhex(tok)
    if len(db) % 2:             # ToUnicode dsts are UTF-16BE code units
        db += b"\x00"
    return db.decode("utf-16-be", errors="replace")


def _parse_tounicode(data: bytes) -> _CMap:
    """Parse a ToUnicode CMap stream's bfchar/bfrange sections (PDF
    9.10.3; CMap syntax from Adobe CMap/CIDFont spec §7.2)."""
    mapping: dict[bytes, str] = {}
    code_lens: set[int] = set()
    for m in _CS_RANGE_RE.finditer(data):
        for tok in _CMAP_TOK_RE.findall(m.group(1)):
            if tok not in (b"[", b"]"):
                code_lens.add(len(_unhex(tok)))
    for m in _BFCHAR_RE.finditer(data):
        toks = [t for t in _CMAP_TOK_RE.findall(m.group(1))
                if t not in (b"[", b"]")]
        for src, dst in zip(toks[0::2], toks[1::2]):
            sb = _unhex(src)
            mapping[sb] = _utf16_text(dst)
            code_lens.add(len(sb))
    for m in _BFRANGE_RE.finditer(data):
        toks = _CMAP_TOK_RE.findall(m.group(1))
        i, n = 0, len(toks)
        while i + 2 < n or (i + 2 == n and toks[i] not in (b"[", b"]")):
            lo_b, hi_b = _unhex(toks[i]), _unhex(toks[i + 1])
            lo = int.from_bytes(lo_b, "big")
            hi = int.from_bytes(hi_b, "big")
            width = len(lo_b)
            code_lens.add(width)
            if hi - lo > 0xFFFF:        # corrupt range — refuse the bomb
                hi = lo + 0xFFFF
            if i + 2 < n and toks[i + 2] == b"[":
                j = i + 3
                code = lo
                while j < n and toks[j] != b"]":
                    mapping[code.to_bytes(width, "big")] = (
                        _utf16_text(toks[j]))
                    code += 1
                    j += 1
                i = j + 1
            else:
                dst_b = _unhex(toks[i + 2])
                base = int.from_bytes(dst_b, "big")
                for code in range(lo, hi + 1):
                    db = (base + code - lo).to_bytes(len(dst_b), "big")
                    mapping[code.to_bytes(width, "big")] = (
                        db.decode("utf-16-be", errors="replace"))
                i += 3
    return _CMap(mapping, code_lens)


_FONT_RES_RE = re.compile(rb"/Font\s*<<(.*?)>>", re.S)
_FONT_RES_IND_RE = re.compile(rb"/Font\s+(\d+)\s+\d+\s+R")
_FONT_REF_RE = re.compile(rb"/([^\s/<>\[\]()%]+)\s+(\d+)\s+\d+\s+R")
_TOUNICODE_RE = re.compile(rb"/ToUnicode\s+(\d+)\s+\d+\s+R")


def _build_type0_fonts(objs: dict[int, bytes]) -> tuple[dict, int]:
    """(font resource name → _CMap, count of Type0 fonts with no usable
    ToUnicode). Resource names are collected globally across all /Font
    dicts; a name bound to two different font objects is ambiguous and
    counts as undecoded rather than guessing."""
    name2obj: dict[str, int] = {}
    ambiguous: set[str] = set()
    font_dicts: list[bytes] = []
    for body in objs.values():
        sm = _STREAM_START_RE.search(body)
        head = body if sm is None else body[:sm.start()]
        for fm in _FONT_RES_IND_RE.finditer(head):
            ref = objs.get(int(fm.group(1)))
            if ref is not None:
                font_dicts.append(ref)
        font_dicts.extend(m.group(1) for m in _FONT_RES_RE.finditer(head))
    for fd in font_dicts:
        for nm_b, num_b in _FONT_REF_RE.findall(fd):
            nm, num = nm_b.decode("latin-1"), int(num_b)
            if name2obj.get(nm, num) != num:
                ambiguous.add(nm)
            name2obj[nm] = num

    fonts: dict[str, _CMap] = {}
    undecoded = 0
    for nm, num in name2obj.items():
        fbody = objs.get(num)
        if fbody is None or not re.search(rb"/Type0\b", fbody):
            continue
        cmap = None
        tm = _TOUNICODE_RE.search(fbody)
        if tm and nm not in ambiguous:
            tobj = objs.get(int(tm.group(1)))
            if tobj is not None:
                data = _stream_data(tobj)
                if data is not None:
                    tsm = _STREAM_START_RE.search(tobj)
                    thead = tobj[:tsm.start()] if tsm else tobj
                    if re.search(rb"/FlateDecode\b", thead):
                        try:
                            data = zlib.decompress(data)
                        except zlib.error:
                            data = None
                    if data is not None:
                        cmap = _parse_tounicode(data)
        if cmap is None or not cmap.mapping:
            undecoded += 1
        else:
            fonts[nm] = cmap
    return fonts, undecoded


def _content_text(content: bytes, fonts: dict | None = None) -> str:
    """Walk a content stream's text operators. Shows within one line
    concatenate; Td/TD/T*/'/" line moves emit newlines. ``fonts`` maps
    resource names to Type0 _CMap decoders: a ``/Name size Tf`` whose
    name is in the map routes subsequent show strings through CID
    decoding; any other font is single-byte latin-1 passthrough."""
    out: list[str] = []
    i, n = 0, len(content)
    in_text = False
    pending_strings: list[str] = []
    last_name: str | None = None
    cur: _CMap | None = None

    def show(s: str) -> str:
        if cur is None:
            return s
        return cur.decode(s.encode("latin-1"))

    def flush_op(op: bytes) -> None:
        nonlocal pending_strings, cur
        if op == b"Tf":
            cur = fonts.get(last_name) if fonts else None
            pending_strings = []
            return
        if not in_text:
            pending_strings = []
            return
        if op == b"Tj":
            out.append(show(pending_strings[-1]) if pending_strings else "")
        elif op == b"TJ":
            out.append("".join(show(s) for s in pending_strings))
        elif op in (b"'", b'"'):
            if out:
                out.append("\n")
            out.append(show(pending_strings[-1]) if pending_strings else "")
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
        if c == ord("/"):       # name token (e.g. the Tf font operand)
            m = re.match(rb"/([^\s/<>\[\]()%]*)", content[i:])
            last_name = m.group(1).decode("latin-1")
            i += m.end()
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
    """(text, n_pages, flags). Flags: 'encrypted', 'cid_font' (a Type0
    font with no usable ToUnicode CMap), 'cid_unmapped' (a CMap was
    present but some codes fell outside it), 'unsupported_filter' —
    present when part of the document is outside scope (the extracted
    text covers what IS in scope)."""
    if not b.startswith(b"%PDF-"):
        raise ValueError("not a PDF")
    flags: set[str] = set()
    if re.search(rb"/Encrypt\b", b):
        flags.add("encrypted")

    objs: dict[int, bytes] = {}
    for m in _OBJ_RE.finditer(b):
        objs[int(m.group(1))] = m.group(3)
    fonts, undecoded = _build_type0_fonts(objs)
    if undecoded or (not fonts
                     and re.search(rb"/Type0\b|/Identity-H\b", b)):
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
            texts.append(_content_text(data, fonts))

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
                texts.append(_content_text(data, fonts))
    if any(cm.unmapped for cm in fonts.values()):
        flags.add("cid_unmapped")
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


def encode_cid_pdf(text: str, compress: bool = True) -> bytes:
    """One-page Type0/Identity-H PDF showing ``text`` through 2-byte
    CIDs and an embedded ToUnicode CMap — the modern machine-generated
    layout. Printable ASCII rides a bfrange identity window
    (``<0020> <007E> <0020>``); every other character gets a bfchar
    entry at a code ≥0x0100 whose value DIFFERS from its unicode, so
    extraction proves the CMap is actually applied (a latin-1
    passthrough would come back as control bytes, not text). The CMap
    stream is Flate-compressed by default."""
    others = sorted({ch for ch in text
                     if not 0x20 <= ord(ch) <= 0x7E and ch != "\n"})
    code_of = {ch: 0x0100 + i for i, ch in enumerate(others)}

    def enc_line(line: str) -> bytes:
        hx = "".join(f"{code_of.get(ch, ord(ch)):04X}" for ch in line)
        return b"<" + hx.encode("ascii") + b">"

    shows = b"\n".join(enc_line(line) + b" Tj 0 -14 Td"
                       for line in text.split("\n")) or b"<> Tj"
    content = b"BT /F1 12 Tf 50 780 Td " + shows + b" ET"

    cmap = bytearray(
        b"/CIDInit /ProcSet findresource begin\n12 dict begin\n"
        b"begincmap\n/CMapName /Adobe-Identity-UCS def\n/CMapType 2 def\n"
        b"1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
        b"1 beginbfrange\n<0020> <007E> <0020>\nendbfrange\n")
    if others:
        cmap += f"{len(others)} beginbfchar\n".encode("ascii")
        for ch in others:
            dst = ch.encode("utf-16-be").hex().upper()
            cmap += f"<{code_of[ch]:04X}> <{dst}>\n".encode("ascii")
        cmap += b"endbfchar\n"
    cmap += (b"endcmap\nCMapName currentdict /CMap defineresource pop\n"
             b"end\nend")
    cmap = bytes(cmap)

    cfilt = mfilt = b""
    if compress:
        content = zlib.compress(content)
        cfilt = b"/Filter /FlateDecode "
        cmap = zlib.compress(cmap)
        mfilt = b"/Filter /FlateDecode "

    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>",
        b"<< " + cfilt + b"/Length " + str(len(content)).encode()
        + b" >>\nstream\n" + content + b"\nendstream",
        b"<< /Type /Font /Subtype /Type0 /BaseFont /Synthetic-Identity "
        b"/Encoding /Identity-H /DescendantFonts [6 0 R] "
        b"/ToUnicode 7 0 R >>",
        b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont "
        b"/Synthetic-Identity /CIDSystemInfo << /Registry (Adobe) "
        b"/Ordering (Identity) /Supplement 0 >> /DW 1000 >>",
        b"<< " + mfilt + b"/Length " + str(len(cmap)).encode()
        + b" >>\nstream\n" + cmap + b"\nendstream",
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
