"""XLSX ingestion gates (sources/xlsx.py, round 9 — SURVEY S8 made
real): SpreadsheetML cell walk, shared vs inline strings, rich text,
sparse rows, the typed table read, and honest failures."""

from __future__ import annotations

import io
import zipfile

import pytest

from datapump_spark.sources.xlsx import (
    _col_index,
    encode_xlsx,
    iter_xlsx_cells,
    read_xlsx,
    read_xlsx_cells,
)

ROWS = [["id", "name", "score", "ok"],
        [1, "alpha & <beta>", 3.5, True],
        [2, "gamma", None, False],
        [3, "alpha & <beta>", -0.25, None]]


def test_cell_walk_shared_and_inline():
    for shared in (True, False):
        grid = {(r, c): (v, t) for _, r, c, v, t
                in iter_xlsx_cells(encode_xlsx(ROWS, shared=shared))}
        assert grid[(0, 0)] == ("id", "str")
        assert grid[(1, 1)] == ("alpha & <beta>", "str"), shared
        assert grid[(1, 2)] == ("3.5", "num")
        assert grid[(1, 3)] == ("true", "bool")
        assert (2, 2) not in grid and (3, 3) not in grid


def test_column_refs_and_rich_text():
    assert [_col_index(r) for r in ("A1", "Z3", "AA1", "AB77", "BA2")] \
        == [0, 25, 26, 27, 52]
    # rich-text shared string: runs concatenate
    b = bytearray(encode_xlsx([["x"], ["styled"]]))
    zf = zipfile.ZipFile(io.BytesIO(bytes(b)))
    sst = zf.read("xl/sharedStrings.xml").replace(
        b"<si><t xml:space=\"preserve\">styled</t></si>",
        b"<si><r><t>sty</t></r><r><t>led</t></r></si>")
    out = io.BytesIO()
    with zipfile.ZipFile(out, "w") as z2:
        for n in zf.namelist():
            z2.writestr(n, sst if n == "xl/sharedStrings.xml"
                        else zf.read(n))
    grid = {(r, c): v for _, r, c, v, _ in iter_xlsx_cells(out.getvalue())}
    assert grid[(1, 0)] == "styled"


def test_not_a_workbook_raises():
    with pytest.raises(Exception):
        list(iter_xlsx_cells(b"not a zip"))
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("other.xml", "<x/>")
    with pytest.raises(ValueError, match="workbook"):
        list(iter_xlsx_cells(buf.getvalue()))


def test_read_xlsx_typed_table(spark, tmp_path):
    d = tmp_path / "books"
    d.mkdir()
    (d / "a.xlsx").write_bytes(encode_xlsx(ROWS))
    df = read_xlsx(spark, str(d))
    assert df.columns == ["id", "name", "score", "ok"]
    rows = {r["id"]: r for r in df.collect()}
    assert rows["1"]["name"] == "alpha & <beta>"
    assert rows["2"]["score"] is None        # sparse cell -> null
    assert rows["3"]["ok"] is None
    assert rows["3"]["score"] == "-0.25"
    # cell-level read agrees
    n = read_xlsx_cells(spark, str(d)).count()
    assert n == 14


def test_read_xlsx_multiple_files_union(spark, tmp_path):
    d = tmp_path / "books"
    d.mkdir()
    (d / "a.xlsx").write_bytes(encode_xlsx([["k", "v"], [1, "x"]]))
    (d / "b.xlsx").write_bytes(encode_xlsx([["k", "v"], [2, "y"]]))
    got = {(r["k"], r["v"]) for r in read_xlsx(spark, str(d)).collect()}
    assert got == {("1", "x"), ("2", "y")}


def _workbook_without_refs() -> bytes:
    """A minimal SpreadsheetML workbook whose <row>/<c> elements omit
    the optional r attribute (position implied sequentially) — the
    layout some producers emit."""
    ns = ('xmlns="http://schemas.openxmlformats.org/'
          'spreadsheetml/2006/main"')
    wb = (f'<workbook {ns}><sheets><sheet name="S" sheetId="1"/>'
          '</sheets></workbook>')
    sheet = (
        f'<worksheet {ns}><sheetData>'
        '<row><c t="inlineStr"><is><t>a</t></is></c><c><v>1</v></c></row>'
        '<row r="4"><c r="B4"><v>2</v></c><c><v>3</v></c></row>'
        '<row><c><v>4</v></c></row>'
        '</sheetData></worksheet>')
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("xl/workbook.xml", wb)
        z.writestr("xl/worksheets/sheet1.xml", sheet)
    return buf.getvalue()


def test_implied_row_and_cell_positions():
    """ADVICE r9: ECMA-376 makes r optional on <row> and <c>; missing
    refs used to collapse every cell onto row -1 / column 0. Implied
    semantics: previous row + 1; previous cell's column + 1 (explicit
    refs re-anchor both counters)."""
    grid = {(r, c): v for _, r, c, v, _ in
            iter_xlsx_cells(_workbook_without_refs())}
    assert grid == {(0, 0): "a", (0, 1): "1",   # implied row 0, cols 0,1
                    (3, 1): "2", (3, 2): "3",   # explicit B4, implied C4
                    (4, 0): "4"}                # implied row 4 after r=4
