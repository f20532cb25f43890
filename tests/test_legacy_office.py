"""Legacy OLE2 Office gates (r11): the CFB container
(operators/cfb.py), binary Word .doc text (operators/doc.py) and
BIFF8 .xls ingestion (sources/xls.py) — formats the engine previously
quarantined as 'legacy_doc'."""

from __future__ import annotations

import struct

import pytest

from datapump_spark.operators.cfb import read_cfb, write_cfb
from datapump_spark.operators.doc import encode_doc, extract_doc_text
from datapump_spark.sources.xls import (encode_xls, iter_xls_cells,
                                        read_xls)


def test_cfb_exact_round_trip_mini_and_regular():
    """Streams below the 4096 cutoff ride the REAL mini stream
    (miniFAT chains), larger ones regular FAT chains — both byte
    exact, empty streams included."""
    streams = {
        "WordDocument": b"FIB" + bytes(range(256)) * 40,
        "1Table": b"tiny table",
        "\x05SummaryInformation": b"m" * 100,
        "Workbook": bytes(range(256)) * 17,
        "empty": b"",
    }
    blob = write_cfb(streams)
    assert read_cfb(blob) == streams
    # the mini stream is genuinely in use (miniFAT sector count > 0)
    assert struct.unpack("<I", blob[64:68])[0] >= 1


def test_cfb_seams():
    with pytest.raises(ValueError, match="not a CFB"):
        read_cfb(b"PK\x03\x04 not ole2" + b"\x00" * 600)
    blob = bytearray(write_cfb({"S": b"x" * 5000}))
    struct.pack_into("<H", blob, 30, 13)       # bad sector shift
    with pytest.raises(ValueError, match="sector shift"):
        read_cfb(bytes(blob))
    # FAT chain cycle: point the stream's first FAT entry at itself
    blob = bytearray(write_cfb({"S": b"x" * 5000}))
    fat_start = struct.unpack("<I", blob[76:80])[0]
    fat_at = 512 + fat_start * 512
    struct.pack_into("<I", blob, fat_at, 0)    # sector 0 -> sector 0
    with pytest.raises(ValueError, match="cycle"):
        read_cfb(bytes(blob))


def test_doc_round_trips_and_pieces():
    t = "hello legacy word\nsecond paragraph with\ttab\nthird café"
    text, n, flags = extract_doc_text(encode_doc(t))
    assert text == t and n == 3 and flags == []
    # mixed 8-bit + UTF-16 pieces
    t2 = "ascii start part\nthen unicode: 中文 — résumé"
    assert extract_doc_text(encode_doc(t2))[0] == t2
    assert extract_doc_text(encode_doc(""))[:2] == ("", 0)
    with pytest.raises(ValueError, match="BMP"):
        encode_doc("astral \U0001F600")


def test_doc_control_chars_and_prc_blocks():
    """Foreign constructs: Prc property blocks ahead of the Pcdt, and
    the control characters Word embeds in text (cell marks, field
    markers, soft hyphens)."""
    raw = encode_doc("seed")
    streams = read_cfb(raw)
    wd = bytearray(streams["WordDocument"])
    table = streams["1Table"]
    # splice a Prc block (clxt=1, 4 bytes) before the Pcdt
    prc = b"\x01\x04\x00ABCD"
    new_table = prc + table
    struct.pack_into("<I", wd, 0x1A2, 0)
    struct.pack_into("<I", wd, 0x1A6, len(new_table))
    blob = write_cfb({"WordDocument": bytes(wd), "1Table": new_table})
    assert extract_doc_text(blob)[0] == "seed"
    # control characters through a hand-built single piece
    body = "a\x07b\x13field\x14shown\x15 c\x1fd\x1ee\x0bf\rg"
    enc = encode_doc("x" * len(body))          # right ccp/piece shape
    streams = read_cfb(enc)
    wd = bytearray(streams["WordDocument"])
    # overwrite the stored text bytes (single cp1252 piece region)
    at = 1472
    wd[at:at + len(body)] = body.encode("cp1252")
    struct.pack_into("<i", wd, 0x4C, len(body))
    blob = write_cfb({"WordDocument": bytes(wd),
                      "1Table": streams["1Table"]})
    text, _, _ = extract_doc_text(blob)
    assert text == "a\tbfieldshown cd-e\nf\ng"


def test_doc_honest_seams():
    raw = bytearray(encode_doc("x"))
    with pytest.raises(ValueError, match="WordDocument"):
        extract_doc_text(write_cfb({"Workbook": b"not word" * 600}))
    streams = read_cfb(bytes(raw))
    wd = bytearray(streams["WordDocument"])
    struct.pack_into("<H", wd, 10, 0x0300)     # encrypted + 1Table
    with pytest.raises(ValueError, match="encrypted"):
        extract_doc_text(write_cfb({"WordDocument": bytes(wd),
                                    "1Table": streams["1Table"]}))
    wd = bytearray(streams["WordDocument"])
    struct.pack_into("<H", wd, 2, 0x0065)      # Word 6 nFib
    with pytest.raises(ValueError, match="pre-Word-97"):
        extract_doc_text(write_cfb({"WordDocument": bytes(wd),
                                    "1Table": streams["1Table"]}))


def test_xls_cell_records():
    rows = [["event_id", "name", "value", "flag"],
            [1, "alpha", 2.5, True],
            [2, "béta — unicode", -7, False],
            [3, "shared", 1234567890123.0, True],
            [4, "shared", 0.001, False]]
    cells = {(r, c): (v, t) for _, r, c, v, t
             in iter_xls_cells(encode_xls(rows))}
    assert cells[(0, 0)] == ("event_id", "s")
    assert cells[(1, 0)] == ("1", "n")          # RK int
    assert cells[(1, 2)] == ("2.5", "n")        # NUMBER f64
    assert cells[(2, 1)] == ("béta — unicode", "s")   # UTF-16 SST
    assert cells[(3, 2)] == ("1234567890123", "n")
    assert cells[(1, 3)] == ("TRUE", "b")
    assert cells[(2, 3)] == ("FALSE", "b")
    # shared strings really share one SST entry
    import re
    blob = encode_xls(rows)
    from datapump_spark.operators.cfb import read_cfb as rc
    wb = rc(blob)["Workbook"]
    assert wb.count(b"shared") == 1


def test_xls_foreign_records():
    """MULRK and RK fX100 encodings the twin never writes."""
    base = encode_xls([["h"], [1]])
    from datapump_spark.operators.cfb import read_cfb as rc
    wb = bytearray(rc(base)["Workbook"])
    # append before the sheet EOF: MULRK with two columns + RK fX100
    eof_at = wb.rfind(struct.pack("<HH", 0x000A, 0))
    mulrk = struct.pack("<HH", 0x00BD, 18) + struct.pack(
        "<HH", 5, 1) + struct.pack("<HI", 15, (7 << 2) | 0x02) \
        + struct.pack("<HI", 15, (9 << 2) | 0x02) \
        + struct.pack("<H", 2)
    rk100 = struct.pack("<HH", 0x027E, 10) + struct.pack(
        "<HHHI", 6, 0, 15, ((250 << 2) | 0x02 | 0x01) & 0xFFFFFFFF)
    wb[eof_at:eof_at] = bytes(mulrk + rk100)
    cells = {(r, c): v for _, r, c, v, _ in iter_xls_cells(
        write_cfb({"Workbook": bytes(wb)}))}
    assert cells[(5, 1)] == "7" and cells[(5, 2)] == "9"
    assert cells[(6, 0)] == "2.5"               # 250 / 100
    with pytest.raises(ValueError, match="Workbook"):
        list(iter_xls_cells(write_cfb({"Other": b"x" * 600})))


@pytest.mark.slow  # redundancy: the driver-gated q_xls_scan runs
# read_xls end-to-end (binaryFile scan + schema discovery + kernel)
# against the DuckDB oracle every round; this pytest twin re-checks
# the same path with nulls and is full-tier-only
def test_read_xls_spark_table_contract(spark, tmp_path):
    rows = [["k", "v"], ["1", "a"], ["2", "b"], ["3", None]]
    (tmp_path / "t.xls").write_bytes(encode_xls(rows))
    got = {r["k"]: r["v"] for r in read_xls(
        spark, str(tmp_path)).collect()}
    assert got == {"1": "a", "2": "b", "3": None}


def test_document_text_kind_doc_and_quarantine(spark, tmp_path):
    """The mixed dispatcher extracts .doc (kind='doc'); non-Word OLE2
    payloads keep routing to quarantine with the legacy flag."""
    from datapump_spark.operators.docx import document_text
    rows = [(1, encode_doc("real word doc\ntwo")),
            (2, write_cfb({"Workbook": b"not word" * 600}))]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r for r in document_text(df).collect()}
    assert got[1]["kind"] == "doc" and got[1]["n_units"] == 2
    assert got[1]["text"] == "real word doc\ntwo"
    assert got[2]["text"] is None and got[2]["flags"] == ["legacy_doc"]


def test_ppt_text_round_trip_and_dispatch(spark):
    """r11: legacy .ppt record-tree walk — TextBytesAtom and
    TextCharsAtom (mixed by content), container recursion, CR
    paragraph marks; the dispatcher tags kind='ppt'."""
    from datapump_spark.operators.doc import encode_ppt, extract_ppt_text
    from datapump_spark.operators.docx import document_text
    t = "Slide title\nbullet one\nbullet — ünïcödé 中文\nlast"
    text, n, flags = extract_ppt_text(encode_ppt(t))
    assert text == t and n == 4 and flags == []
    # a CR inside an atom is a paragraph mark
    raw = encode_ppt("seed")
    streams = read_cfb(raw)
    ppt = bytearray(streams["PowerPoint Document"])
    at = ppt.index(b"seed")
    ppt[at:at + 4] = b"a\rb\x00"
    blob = write_cfb({"PowerPoint Document": bytes(ppt),
                      "Current User": b"\x00" * 24})
    assert extract_ppt_text(blob)[0] == "a\nb"
    with pytest.raises(ValueError, match="PowerPoint"):
        extract_ppt_text(write_cfb({"Quill": b"pub" * 300}))
    df = spark.createDataFrame([(1, encode_ppt("x\ny"))],
                               "media_id long, payload binary")
    row = document_text(df).collect()[0]
    assert row["kind"] == "ppt" and row["n_units"] == 2


def test_biff5_workbook_reads():
    """r11 second pass: a hand-built BIFF5 (Excel 5/95) workbook —
    byte-string LABELs, no SST, version 0x0500 BOFs — reads through
    the same cell walk."""
    from datapump_spark.sources.xls import _rec

    def label5(r, c, s):
        raw = s.encode("latin-1")
        return _rec(0x0204, struct.pack("<HHHH", r, c, 15, len(raw))
                    + raw)

    sheet = (_rec(0x0809, struct.pack("<HHIH", 0x0500, 0x0010, 0, 0))
             + label5(0, 0, "hdr")
             + _rec(0x0203, struct.pack("<HHH", 1, 0, 15)
                    + struct.pack("<d", 2.5))
             + _rec(0x027E, struct.pack("<HHHI", 2, 0, 15,
                                        (9 << 2) | 0x02))
             + _rec(0x000A, b""))
    name = "Old"
    bs = _rec(0x0085, struct.pack("<IBB", 0, 0, 0)
              + bytes([len(name)]) + name.encode("latin-1"))
    glb = _rec(0x0809, struct.pack("<HHIH", 0x0500, 0x0005, 0, 0))
    pos = len(glb) + len(bs) + 4
    bs = _rec(0x0085, struct.pack("<IBB", pos, 0, 0)
              + bytes([len(name)]) + name.encode("latin-1"))
    wb = glb + bs + _rec(0x000A, b"") + sheet
    cells = {(r, c): (v, t) for nm, r, c, v, t in iter_xls_cells(
        write_cfb({"Book": wb}))}
    assert cells[(0, 0)] == ("hdr", "s")
    assert cells[(1, 0)] == ("2.5", "n")
    assert cells[(2, 0)] == ("9", "n")
    # unknown BIFF versions still refuse
    bad = _rec(0x0809, struct.pack("<HHIH", 0x0400, 0x0005, 0, 0))
    with pytest.raises(ValueError, match="BIFF"):
        list(iter_xls_cells(write_cfb({"Book": bad})))


def test_read_xls_duplicate_headers(spark, tmp_path):
    """Duplicate header names get deterministic _2/_3 suffixes in both
    the inferred schema and every per-file kernel (r12 advice fix:
    dup names collapsed to one ragged dict column)."""
    rows = [["id", "val", "val", "id"],
            ["1", "a", "b", "x"], ["2", "c", "d", "y"]]
    (tmp_path / "dup.xls").write_bytes(encode_xls(rows))
    df = read_xls(spark, str(tmp_path))
    assert df.columns == ["id", "val", "val_2", "id_2"]
    got = {r["id"]: (r["val"], r["val_2"], r["id_2"])
           for r in df.collect()}
    assert got == {"1": ("a", "b", "x"), "2": ("c", "d", "y")}


def test_sst_continue_records():
    """r12 (VERDICT r11 #3): SST strings spanning CONTINUE records —
    the real-world case for any .xls with >8 KB of shared strings.
    A tiny sst_cap forces splits mid-character-data (with the
    per-fragment fHighByte re-declaration), between strings, and
    right after a string header."""
    from datapump_spark.sources.xls import encode_xls, _record_groups
    from datapump_spark.operators.cfb import read_cfb

    long_a = "alpha-" * 40                 # 240 chars, latin-1
    long_u = "ünïcødé—" * 30               # UTF-16 path
    vals = [long_a, long_u, "short", "x" * 23]
    rows = [["h1", "h2", "h3", "h4"]] + [vals, vals]  # repeated -> SST
    for cap in (16, 23, 64, 8224):
        blob = encode_xls(rows, sst_cap=cap)
        wb = read_cfb(blob)["Workbook"]
        n_cont = sum(1 for rid, frags, _ in _record_groups(wb)
                     if rid == 0x00FC and len(frags) > 1)
        if cap < 8224:
            assert n_cont == 1, cap      # splits actually exercised
        cells = {(r, c): v for _, r, c, v, t
                 in iter_xls_cells(blob) if t == "s"}
        assert cells[(1, 0)] == long_a, cap
        assert cells[(1, 1)] == long_u, cap
        assert cells[(2, 3)] == "x" * 23, cap


def test_sst_continue_foreign_grbit_flip_and_rich_runs():
    """Hand-built foreign-style SST the twin never emits: a string
    whose continuation fragment switches fHighByte mid-string (latin-1
    head, UTF-16 tail), plus a rich-run block spanning the boundary."""
    import struct
    from datapump_spark.sources.xls import (_parse_sst, encode_xls,
                                            _rec)
    from datapump_spark.operators.cfb import read_cfb, write_cfb

    head = "abcd"                         # 4 compressed chars
    tail = "éîøü"                         # 4 UTF-16 chars
    # string 1: cch 8, fRichSt set (2 runs), chars split 4/4 across
    # the boundary with grbit flip; the 8 run bytes also span
    s1_frag1 = (struct.pack("<H", 8) + bytes([0x08])   # cch, fRichSt
                + struct.pack("<H", 2)                  # cRun
                + head.encode("latin-1"))
    s1_frag2 = (bytes([0x01])                           # re-flag: high
                + tail.encode("utf-16-le")
                + b"\x00" * 5)                          # 5 of 8 run bytes
    s2_frag = (b"\x00" * 3                              # run tail
               + struct.pack("<H", 2) + bytes([0x00]) + b"ok")
    frags = [struct.pack("<II", 2, 2) + s1_frag1, s1_frag2 + s2_frag]
    assert _parse_sst(frags) == [head + tail, "ok"]

    # and end-to-end: splice the hand-built SST into a twin workbook
    base = encode_xls([["h"], ["ok"], ["ok"]])           # SST = ['ok']
    wb = bytearray(read_cfb(base)["Workbook"])
    old = _rec(0x00FC, struct.pack("<II", 2, 1)
               + struct.pack("<H", 2) + bytes([0x00]) + b"ok")
    i = bytes(wb).find(old)
    assert i != -1
    new = (_rec(0x00FC, frags[0]) + _rec(0x003C, frags[1]))
    wb[i:i + len(old)] = new
    # the splice grew the globals substream: fix the BOUNDSHEET offset
    delta = len(new) - len(old)
    bs = bytes(wb).find(struct.pack("<H", 0x0085))
    pos0 = struct.unpack("<I", wb[bs + 4:bs + 8])[0]
    wb[bs + 4:bs + 8] = struct.pack("<I", pos0 + delta)
    cells = {(r, c): v for _, r, c, v, _ in
             iter_xls_cells(write_cfb({"Workbook": bytes(wb)}))}
    # LABELSST index 0 now resolves to the spanning string
    assert cells[(1, 0)] == head + tail and cells[(2, 0)] == head + tail


def test_label_continue_record():
    """A hand-built inline LABEL whose character data spans a
    CONTINUE record (oversized LABELs, VERDICT r11 #3)."""
    import struct
    from datapump_spark.sources.xls import encode_xls, _rec
    from datapump_spark.operators.cfb import read_cfb, write_cfb

    base = encode_xls([["h"], [1]])
    wb = bytearray(read_cfb(base)["Workbook"])
    eof_at = wb.rfind(struct.pack("<HH", 0x000A, 0))
    text = "L" * 30 + "tail"
    lab = (_rec(0x0204, struct.pack("<HHH", 7, 0, 15)
                + struct.pack("<H", len(text)) + bytes([0x00])
                + text[:30].encode())
           + _rec(0x003C, bytes([0x00]) + text[30:].encode()))
    wb[eof_at:eof_at] = lab
    cells = {(r, c): v for _, r, c, v, _ in
             iter_xls_cells(write_cfb({"Workbook": bytes(wb)}))}
    assert cells[(7, 0)] == text
