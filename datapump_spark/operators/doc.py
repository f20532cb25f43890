"""Legacy Word .doc (binary, [MS-DOC] — public) text extraction in
pure Python (round 11) — closes the ``legacy_doc`` quarantine seam:
OLE2 Word files now extract instead of being flagged away.

Scope (Word 97-2003, nFib >= 0x00C1 — the CLX piece-table era):
- CFB container via :mod:`operators.cfb`;
- FIB: wIdent validation, the fWhichTblStm flag choosing 0Table vs
  1Table, the fEncrypted flag (honest refusal), ccpText from
  FibRgLw97, fcClx/lcbClx from FibRgFcLcb97;
- CLX walk: Prc property blocks skipped, the Pcdt PlcPcd parsed into
  (CP range, FC, fCompressed) pieces — 8-bit CP-1252 pieces at fc/2
  and UTF-16LE pieces at fc, exactly as Word interleaves them;
- control-character mapping: CR / vertical tab / page break become
  newlines, cell marks become tabs, field and object markers are
  dropped, soft hyphens removed, non-breaking variants normalized.

Word 6/95 files (no CLX) and encrypted files raise with honest
messages. The writer twin ``encode_doc`` emits a real FIB + CLX with
BOTH piece encodings (an 8-bit piece and a UTF-16 piece whenever the
text splits cleanly), inside :func:`operators.cfb.write_cfb`.

Reference parity note: the reference (datapump.py) has no document
surface; charter extension.
"""

from __future__ import annotations

import struct

from datapump_spark.operators.cfb import read_cfb, write_cfb

_FIB_LEN = 1472                          # Word 97 FIB size (cbFib)


def _map_chars(s: str) -> str:
    out = []
    for ch in s:
        o = ord(ch)
        if ch == "\r" or o in (0x0B, 0x0C):
            out.append("\n")
        elif o == 0x07:                  # cell / row mark
            out.append("\t")
        elif o in (0x01, 0x02, 0x05, 0x08, 0x13, 0x14, 0x15):
            continue                     # pictures/fields/annotations
        elif o == 0x1E:                  # non-breaking hyphen
            out.append("-")
        elif o == 0x1F:                  # soft hyphen
            continue
        elif o < 0x20 and ch != "\t":
            continue
        else:
            out.append(ch)
    return "".join(out)


def extract_doc_text(b: bytes) -> tuple[str, int, list[str]]:
    """(text, n_paragraphs, flags) from a binary Word .doc payload.
    Raises ValueError for OLE2 files without a WordDocument stream,
    pre-97 FIBs, or encrypted documents (honest messages callers can
    route on)."""
    streams = read_cfb(b)
    wd = streams.get("WordDocument")
    if wd is None:
        raise ValueError(
            "OLE2 container without a WordDocument stream")
    if len(wd) < 0x200 or struct.unpack("<H", wd[:2])[0] != 0xA5EC:
        raise ValueError("WordDocument stream without a Word FIB")
    nfib = struct.unpack("<H", wd[2:4])[0]
    flags16 = struct.unpack("<H", wd[10:12])[0]
    if flags16 & 0x0100:
        raise ValueError("encrypted .doc unsupported")
    if nfib < 0x00C1:
        raise ValueError(f"pre-Word-97 .doc (nFib 0x{nfib:04x})")
    table_name = "1Table" if flags16 & 0x0200 else "0Table"
    table = streams.get(table_name)
    if table is None:
        raise ValueError(f".doc without its {table_name} stream")
    ccp_text = struct.unpack("<i", wd[0x4C:0x50])[0]
    fc_clx = struct.unpack("<I", wd[0x1A2:0x1A6])[0]
    lcb_clx = struct.unpack("<I", wd[0x1A6:0x1AA])[0]
    if not lcb_clx or fc_clx + lcb_clx > len(table):
        raise ValueError(".doc without a readable CLX piece table")
    clx = table[fc_clx:fc_clx + lcb_clx]
    i = 0
    while i < len(clx) and clx[i] == 0x01:     # Prc blocks: skip
        cb = struct.unpack("<h", clx[i + 1:i + 3])[0]
        i += 3 + max(cb, 0)
    if i >= len(clx) or clx[i] != 0x02:
        raise ValueError(".doc CLX without a Pcdt")
    lcb = struct.unpack("<I", clx[i + 1:i + 5])[0]
    plc = clx[i + 5:i + 5 + lcb]
    if len(plc) < lcb or lcb < 4 or (lcb - 4) % 12:
        raise ValueError(".doc PlcPcd malformed")
    n = (lcb - 4) // 12
    cps = struct.unpack(f"<{n + 1}I", plc[:4 * (n + 1)])
    parts = []
    remaining = ccp_text
    for k in range(n):
        if remaining <= 0:
            break
        pcd = plc[4 * (n + 1) + 8 * k:4 * (n + 1) + 8 * k + 8]
        fc_raw = struct.unpack("<I", pcd[2:6])[0]
        count = min(cps[k + 1] - cps[k], remaining)
        if fc_raw & 0x40000000:          # fCompressed: 8-bit CP-1252
            fc = (fc_raw & 0x3FFFFFFF) // 2
            parts.append(wd[fc:fc + count].decode("cp1252", "replace"))
        else:
            fc = fc_raw & 0x3FFFFFFF
            parts.append(wd[fc:fc + 2 * count].decode("utf-16-le",
                                                      "replace"))
        remaining -= count
    text = _map_chars("".join(parts))
    text = text[:-1] if text.endswith("\n") else text
    return text, (text.count("\n") + 1 if text else 0), []


def encode_doc(text: str) -> bytes:
    """Minimal valid Word 97 .doc — fixture/sink twin of
    extract_doc_text: a real FIB (wIdent/nFib/flags/ccpText/fcClx),
    text stored as TWO pieces whenever it splits — an 8-bit CP-1252
    piece and a UTF-16LE piece — so the piece walk and both encodings
    are witnessed; paragraph marks stored as CR per the format."""
    if any(ord(c) > 0xFFFF for c in text):
        raise ValueError(
            ".doc CPs are UTF-16 code units; the twin keeps to the BMP")
    raw = text.replace("\n", "\r") + "\r"
    mid = len(raw) // 2
    pieces = []                          # (chars, bytes, compressed)
    for seg in (raw[:mid], raw[mid:]):
        if not seg:
            continue
        try:
            enc = seg.encode("cp1252")
            pieces.append((len(seg), enc, True))
        except UnicodeEncodeError:
            pieces.append((len(seg), seg.encode("utf-16-le"), False))
    if not pieces:
        pieces = [(1, b"\r", True)]
    wd = bytearray(_FIB_LEN)
    at = _FIB_LEN
    cps = [0]
    pcds = []
    for chars, data, compressed in pieces:
        if compressed:
            fc_raw = 0x40000000 | (at * 2)
        else:
            fc_raw = at
        pcds.append(struct.pack("<HIH", 0, fc_raw, 0))
        wd += data
        at += len(data)
        cps.append(cps[-1] + chars)
    plc = struct.pack(f"<{len(cps)}I", *cps) + b"".join(pcds)
    clx = b"\x02" + struct.pack("<I", len(plc)) + plc
    table = clx
    struct.pack_into("<H", wd, 0, 0xA5EC)
    struct.pack_into("<H", wd, 2, 0x00C1)          # nFib: Word 97
    struct.pack_into("<H", wd, 10, 0x0200)         # fWhichTblStm = 1
    struct.pack_into("<i", wd, 0x4C, cps[-1])      # ccpText
    struct.pack_into("<I", wd, 0x1A2, 0)           # fcClx
    struct.pack_into("<I", wd, 0x1A6, len(clx))    # lcbClx
    return write_cfb({"WordDocument": bytes(wd), "1Table": table})


# ---------------------------------------------------------------------------
# Legacy PowerPoint .ppt (binary, [MS-PPT]) — the third OLE2 format:
# the "PowerPoint Document" stream is a tree of records (u16
# version/instance, u16 type, u32 length; a record is a container
# when the low version nibble is 0xF). Slide text lives in
# TextCharsAtom (UTF-16LE) / TextBytesAtom (8-bit) leaves; a
# best-effort walk of those atoms recovers the deck text without the
# full drawing model.
# ---------------------------------------------------------------------------

_TEXT_CHARS_ATOM = 0x0FA0
_TEXT_BYTES_ATOM = 0x0FA8
_CSTRING_ATOM = 0x0FBA


def _ppt_atoms(b: bytes, depth: int = 0):
    i = 0
    while i + 8 <= len(b):
        ver_inst, rtype, ln = struct.unpack("<HHI", b[i:i + 8])
        payload = b[i + 8:i + 8 + ln]
        if (ver_inst & 0x0F) == 0x0F and depth < 16:
            yield from _ppt_atoms(payload, depth + 1)
        else:
            yield rtype, payload
        i += 8 + ln


def extract_ppt_text(b: bytes) -> tuple[str, int, list[str]]:
    """(text, n_text_atoms, flags) from a legacy binary PowerPoint
    deck: every TextCharsAtom / TextBytesAtom in record-tree order,
    one line per atom (the atoms' own CR paragraph marks become
    newlines). Raises ValueError for OLE2 files without a PowerPoint
    Document stream."""
    streams = read_cfb(b)
    ppt = streams.get("PowerPoint Document")
    if ppt is None:
        raise ValueError(
            "OLE2 container without a PowerPoint Document stream")
    parts = []
    for rtype, payload in _ppt_atoms(ppt):
        if rtype == _TEXT_CHARS_ATOM:
            parts.append(payload.decode("utf-16-le", "replace"))
        elif rtype == _TEXT_BYTES_ATOM:
            parts.append(payload.decode("cp1252", "replace"))
    text = "\n".join(p.replace("\r", "\n").rstrip("\x00")
                     for p in parts)
    return text, len(parts), []


def encode_ppt(text: str) -> bytes:
    """Minimal legacy .ppt twin: a Document container holding one
    text atom per input line — 8-bit TextBytesAtom when the line is
    cp1252-encodable, TextCharsAtom otherwise (both reader paths
    witnessed by mixed content)."""
    atoms = bytearray()
    for line in (text.split("\n") if text else [""]):
        try:
            payload = line.encode("cp1252")
            rtype = _TEXT_BYTES_ATOM
        except UnicodeEncodeError:
            payload = line.encode("utf-16-le")
            rtype = _TEXT_CHARS_ATOM
        atoms += struct.pack("<HHI", 0x0000, rtype, len(payload))
        atoms += payload
    doc = struct.pack("<HHI", 0x000F, 0x03E8, len(atoms)) + atoms
    return write_cfb({"PowerPoint Document": bytes(doc),
                      "Current User": b"\x00" * 24})


def extract_ole2_text(b: bytes) -> tuple[str, int, list[str], str]:
    """Dispatch an OLE2 payload on its stream names: Word .doc or
    PowerPoint .ppt; other compound files (xls/msg/...) raise with
    the legacy message the document kernel routes on."""
    streams = read_cfb(b)
    if "WordDocument" in streams:
        t, n, fl = extract_doc_text(b)
        return t, n, fl, "doc"
    if "PowerPoint Document" in streams:
        t, n, fl = extract_ppt_text(b)
        return t, n, fl, "ppt"
    raise ValueError(
        "OLE2 container without a WordDocument or PowerPoint "
        "Document stream")
