"""OpenDocument spreadsheet gates (sources/ods.py, r12 — VERDICT r11
missing #6): content.xml walk with ODF repeat compaction, typed
values, covered cells, the all-string Spark table contract, and the
writer twin."""

from __future__ import annotations

import pytest

from datapump_spark.sources.ods import encode_ods, iter_ods_cells, read_ods


def test_cell_types_and_values():
    rows = [["id", "name", "value", "flag"],
            [1, "alpha", 2.5, True],
            [2, "béta — unicode", -7, False],
            [3, "multi\nline", 0.001, True]]
    cells = {(r, c): (v, t) for _, r, c, v, t
             in iter_ods_cells(encode_ods(rows))}
    assert cells[(0, 0)] == ("id", "s")
    assert cells[(1, 0)] == ("1", "n")
    assert cells[(1, 2)] == ("2.5", "n")
    assert cells[(2, 1)] == ("béta — unicode", "s")
    assert cells[(3, 1)] == ("multi\nline", "s")
    assert cells[(1, 3)] == ("TRUE", "b")
    assert cells[(2, 3)] == ("FALSE", "b")


def test_repeat_compaction_round_trip():
    # equal adjacent values compact in the twin; the reader expands
    rows = [["a", "b", "c", "d"], ["x", "x", "x", 7]]
    blob = encode_ods(rows)
    assert b'table:number-columns-repeated="3"' in blob
    cells = {(r, c): v for _, r, c, v, _ in iter_ods_cells(blob)}
    assert [cells[(1, c)] for c in range(4)] == ["x", "x", "x", "7"]


def test_foreign_constructs():
    """Hand-built content.xml shapes the twin never writes: repeated
    ROWS, covered cells (merges), date/time values, repeated empty
    cells that must not explode, a second sheet."""
    content = """<?xml version="1.0" encoding="UTF-8"?>
<office:document-content
 xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0"
 xmlns:table="urn:oasis:names:tc:opendocument:xmlns:table:1.0"
 xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0">
<office:body><office:spreadsheet>
<table:table table:name="S1">
<table:table-row table:number-rows-repeated="2">
  <table:table-cell office:value-type="float" office:value="5"/>
  <table:table-cell table:number-columns-repeated="1024"/>
</table:table-row>
<table:table-row>
  <table:table-cell office:value-type="string"><text:p>m</text:p>
  </table:table-cell>
  <table:covered-table-cell table:number-columns-repeated="2"/>
  <table:table-cell office:value-type="date"
   office:date-value="2024-03-01"/>
  <table:table-cell office:value-type="time"
   office:time-value="PT01H02M03S"/>
</table:table-row>
</table:table>
<table:table table:name="S2">
<table:table-row>
  <table:table-cell office:value-type="float" office:value="9"/>
</table:table-row>
</table:table>
</office:spreadsheet></office:body></office:document-content>"""
    import io
    import zipfile
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("mimetype",
                    "application/vnd.oasis.opendocument.spreadsheet")
        zf.writestr("content.xml", content)
    cells = list(iter_ods_cells(buf.getvalue()))
    by_key = {(nm, r, c): (v, t) for nm, r, c, v, t in cells}
    assert by_key[("S1", 0, 0)] == ("5", "n")
    assert by_key[("S1", 1, 0)] == ("5", "n")      # repeated row
    assert by_key[("S1", 2, 0)] == ("m", "s")
    assert by_key[("S1", 2, 3)] == ("2024-03-01", "d")  # after merge
    assert by_key[("S1", 2, 4)] == ("PT01H02M03S", "t")
    assert by_key[("S2", 0, 0)] == ("9", "n")
    assert len(cells) == 6                          # no empty blowup
    # sheet filter
    assert {nm for nm, *_ in iter_ods_cells(buf.getvalue(),
                                            sheet="S2")} == {"S2"}


def test_refusals():
    with pytest.raises(ValueError, match="not an ODS"):
        list(iter_ods_cells(b"junk"))
    import io
    import zipfile
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("content.xml",
                    '<office:document-content xmlns:office="urn:oasis:'
                    'names:tc:opendocument:xmlns:office:1.0">'
                    "<office:body><office:text/></office:body>"
                    "</office:document-content>")
    with pytest.raises(ValueError, match="spreadsheet"):
        list(iter_ods_cells(buf.getvalue()))


def test_read_ods_spark_table_contract(spark, tmp_path):
    rows = [["k", "v", "v"], ["1", "a", "b"], ["2", None, "d"]]
    (tmp_path / "t.ods").write_bytes(encode_ods(rows))
    df = read_ods(spark, str(tmp_path))
    assert df.columns == ["k", "v", "v_2"]          # dup headers suffix
    got = {r["k"]: (r["v"], r["v_2"]) for r in df.collect()}
    assert got == {"1": ("a", "b"), "2": (None, "d")}
