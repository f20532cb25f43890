"""OpenDocument Spreadsheet (.ods, OASIS ODF / ISO 26300) ingestion in
pure stdlib (r12 — VERDICT r11 missing #6: the remaining everyday
member of the spreadsheet family beside xlsx/xls).

Reader scope: ``content.xml`` table walk — ``table:table`` /
``table:table-row`` / ``table:table-cell`` with the ODF compaction
attributes (``table:number-columns-repeated``,
``table:number-rows-repeated``) expanded for value-bearing cells and
ignored for trailing empties (the "one empty cell repeated 1024
times" convention), typed values (``office:value-type`` float /
percentage / currency via ``office:value``, boolean via
``office:boolean-value``, date/time/string via the ``text:p`` body),
covered cells (merges) skipped.

``read_ods`` mirrors ``read_xlsx``/``read_xls``'s all-string table
contract so the CSV path's type inference applies downstream
unchanged; ``encode_ods`` is the writer twin (mimetype + manifest +
content.xml, with repeated-column runs emitted for equal adjacent
values so the expansion path is witnessed).

Reference parity note: the reference (datapump.py) declares openpyxl
but has no ODF surface; charter extension (SURVEY S8 family).
"""

from __future__ import annotations

import io
import zipfile
from xml.etree import ElementTree as ET

from pyspark.sql import DataFrame, SparkSession

_T = "{urn:oasis:names:tc:opendocument:xmlns:table:1.0}"
_O = "{urn:oasis:names:tc:opendocument:xmlns:office:1.0}"
_TX = "{urn:oasis:names:tc:opendocument:xmlns:text:1.0}"

_CELL_SCHEMA = ("path string, sheet string, row int, col int, "
                "value string, value_type string")


def _fmt_num(v: float) -> str:
    return str(int(v)) if v == int(v) and abs(v) < 1e15 else repr(v)


def _cell_value(cell) -> tuple[str, str] | None:
    """(value_str, type) for one table:table-cell, None when empty."""
    vt = cell.get(f"{_O}value-type")
    if vt in ("float", "percentage", "currency"):
        raw = cell.get(f"{_O}value")
        if raw is None:
            return None
        return _fmt_num(float(raw)), "n"
    if vt == "boolean":
        return (("TRUE" if cell.get(f"{_O}boolean-value") == "true"
                 else "FALSE"), "b")
    if vt == "date":
        return cell.get(f"{_O}date-value") or "", "d"
    if vt == "time":
        return cell.get(f"{_O}time-value") or "", "t"
    # string (explicit or untyped): text:p children joined by newline
    paras = ["".join(p.itertext()) for p in cell.findall(f"{_TX}p")]
    if not paras:
        return None
    return "\n".join(paras), "s"


def iter_ods_cells(b: bytes, sheet: str | None = None):
    """Yield (sheet_name, row, col, value_str, type) per populated
    cell. Raises ValueError for non-ODS payloads."""
    try:
        zf = zipfile.ZipFile(io.BytesIO(b))
        content = zf.read("content.xml")
    except (zipfile.BadZipFile, KeyError):
        raise ValueError("not an ODS file (no content.xml)") from None
    root = ET.fromstring(content)
    body = root.find(f"{_O}body")
    ss = body.find(f"{_O}spreadsheet") if body is not None else None
    if ss is None:
        raise ValueError("ODF file without a spreadsheet body")
    for table in ss.findall(f"{_T}table"):
        name = table.get(f"{_T}name") or ""
        if sheet is not None and name != sheet:
            continue
        r = 0
        for row in table.findall(f"{_T}table-row"):
            row_rep = int(row.get(f"{_T}number-rows-repeated", "1"))
            c = 0
            found = []
            for cell in row:
                if cell.tag == f"{_T}covered-table-cell":
                    c += int(cell.get(f"{_T}number-columns-repeated",
                                      "1"))
                    continue
                if cell.tag != f"{_T}table-cell":
                    continue
                rep = int(cell.get(f"{_T}number-columns-repeated", "1"))
                got = _cell_value(cell)
                if got is not None:
                    for k in range(rep):
                        found.append((c + k, got[0], got[1]))
                c += rep
            for rr in range(row_rep):
                for col, val, typ in found:
                    yield name, r + rr, col, val, typ
            r += row_rep


def read_ods(spark: SparkSession, path: str,
             sheet: str | None = None, header: bool = True) -> DataFrame:
    """All-string table read over every .ods under ``path`` — row 0 is
    the header (the read_xlsx/read_xls contract, so type inference
    applies downstream)."""
    import pandas as pd

    from datapump_spark.sources.xls import _dedupe_names

    def kernel(batches):
        for pdf in batches:
            frames = []
            for content in pdf["content"]:
                grid: dict[int, dict[int, str]] = {}
                for _nm, r, c, val, _t in iter_ods_cells(bytes(content),
                                                         sheet):
                    grid.setdefault(r, {})[c] = val
                if not grid:
                    continue
                hdr_row = min(grid) if header else None
                cols = sorted({c for row in grid.values() for c in row})
                if header:
                    names = _dedupe_names(
                        [grid[hdr_row].get(c, f"_c{c}") for c in cols])
                else:
                    names = [f"_c{c}" for c in cols]
                data = {n: [] for n in names}
                for r in sorted(grid):
                    if r == hdr_row:
                        continue
                    for n, c in zip(names, cols):
                        data[n].append(grid[r].get(c))
                frames.append(pd.DataFrame(data))
            if frames:
                yield pd.concat(frames, ignore_index=True)

    first = spark.read.format("binaryFile").load(path) \
        .select("content").limit(1).collect()
    if not first:
        raise ValueError(f"no ODS files under {path}")
    cells = list(iter_ods_cells(bytes(first[0]["content"]), sheet))
    if not cells:
        raise ValueError("empty spreadsheet")
    hdr = min(r for _, r, _, _, _ in cells)
    cols = sorted({c for _, _, c, _, _ in cells})
    if header:
        names = {c: v for _, r, c, v, _ in cells if r == hdr}
        fields = _dedupe_names([names.get(c, f"_c{c}") for c in cols])
    else:
        fields = [f"_c{c}" for c in cols]
    schema = ", ".join(f"`{f}` string" for f in fields)
    raw = spark.read.format("binaryFile").load(path)
    return raw.select("content").mapInPandas(kernel, schema)


# ---------------------------------------------------------------------------
# Writer twin
# ---------------------------------------------------------------------------


def _xml_escape(s: str) -> str:
    return (s.replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;").replace('"', "&quot;"))


def encode_ods(rows: list[list], sheet: str = "Sheet1") -> bytes:
    """Minimal valid ODS twin: floats/ints as office:value-type float,
    bools as boolean, strings as text:p; runs of EQUAL adjacent values
    within a row compact into table:number-columns-repeated so the
    reader's expansion path is witnessed; trailing None cells omitted."""
    out = ["<?xml version=\"1.0\" encoding=\"UTF-8\"?>"
           "<office:document-content "
           "xmlns:office=\"urn:oasis:names:tc:opendocument:xmlns:"
           "office:1.0\" "
           "xmlns:table=\"urn:oasis:names:tc:opendocument:xmlns:"
           "table:1.0\" "
           "xmlns:text=\"urn:oasis:names:tc:opendocument:xmlns:"
           "text:1.0\">"
           "<office:body><office:spreadsheet>"
           f"<table:table table:name=\"{_xml_escape(sheet)}\">"]

    def cell_xml(v) -> str:
        if v is None:
            return "<table:table-cell/>"
        if isinstance(v, bool):
            return ("<table:table-cell office:value-type=\"boolean\" "
                    f"office:boolean-value=\"{str(v).lower()}\"/>")
        if isinstance(v, (int, float)):
            return ("<table:table-cell office:value-type=\"float\" "
                    f"office:value=\"{v}\"/>")
        return ("<table:table-cell office:value-type=\"string\">"
                f"<text:p>{_xml_escape(str(v))}</text:p>"
                "</table:table-cell>")

    for row in rows:
        out.append("<table:table-row>")
        i = 0
        while i < len(row):
            j = i
            while j < len(row) and row[j] == row[i] \
                    and type(row[j]) is type(row[i]):
                j += 1
            xml = cell_xml(row[i])
            if j - i > 1:
                xml = xml.replace(
                    "<table:table-cell",
                    "<table:table-cell "
                    f"table:number-columns-repeated=\"{j - i}\"", 1)
            out.append(xml)
            i = j
        out.append("</table:table-row>")
    out.append("</table:table></office:spreadsheet></office:body>"
               "</office:document-content>")
    manifest = (
        "<?xml version=\"1.0\" encoding=\"UTF-8\"?>"
        "<manifest:manifest xmlns:manifest=\"urn:oasis:names:tc:"
        "opendocument:xmlns:manifest:1.0\">"
        "<manifest:file-entry manifest:full-path=\"/\" manifest:"
        "media-type=\"application/vnd.oasis.opendocument."
        "spreadsheet\"/>"
        "<manifest:file-entry manifest:full-path=\"content.xml\" "
        "manifest:media-type=\"text/xml\"/></manifest:manifest>")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        info = zipfile.ZipInfo("mimetype", (2024, 1, 1, 0, 0, 0))
        info.compress_type = zipfile.ZIP_STORED
        zf.writestr(info,
                    "application/vnd.oasis.opendocument.spreadsheet")
        zf.writestr(zipfile.ZipInfo("content.xml",
                                    (2024, 1, 1, 0, 0, 0)),
                    "".join(out))
        zf.writestr(zipfile.ZipInfo("META-INF/manifest.xml",
                                    (2024, 1, 1, 0, 0, 0)), manifest)
    return buf.getvalue()
