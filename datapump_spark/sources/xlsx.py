"""XLSX (SpreadsheetML) ingestion in pure stdlib (round 9).

Closes SURVEY §2 S8: the reference declares ``openpyxl`` as a
dependency (requirements.txt:8) without ever calling ``read_excel`` —
the latent Excel-input surface. Here it is real: XLSX is a ZIP around
SpreadsheetML parts (ECMA-376), so the reader is stdlib ``zipfile`` +
``ElementTree`` inside the same binaryFile -> Arrow-kernel
architecture as the WARC/archive sources — no driver-side unpacking,
parallelism = workbook count.

Supported cell types: shared strings (incl. rich-text runs), inline
strings, formula-cached strings, numbers, booleans, ISO dates (t="d").
Style-driven date NUMBERS are returned as their raw serial (documented
— resolving them needs the styles part's number formats; the typed
path treats them like any numeric column). Cells are returned
sparse-safe: missing cells in a row yield nulls in the typed reader.

Writer twin ``encode_xlsx`` exists for fixtures and the q_xlsx_scan
exact-hash gate.

Reference parity note: datapump.py requirements.txt:8 (latent, never
called); this makes the declared surface real instead of n/a.
"""

from __future__ import annotations

import io
import re
import zipfile
from xml.etree import ElementTree as ET

from pyspark.sql import DataFrame, SparkSession

_MAIN = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"

CELL_SCHEMA = ("path string, sheet string, row int, col int, "
               "value string, value_type string")


def _col_index(ref: str) -> int:
    """'A1' -> 0, 'AB7' -> 27 (0-based column from the cell reference)."""
    n = 0
    for ch in ref:
        if not ch.isalpha():
            break
        n = n * 26 + (ord(ch.upper()) - 64)
    return n - 1


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        data = zf.read("xl/sharedStrings.xml")
    except KeyError:
        return []
    out = []
    for si in ET.fromstring(data).iter(_MAIN + "si"):
        # plain <t> or rich-text <r><t> runs, concatenated
        out.append("".join(t.text or "" for t in si.iter(_MAIN + "t")))
    return out


def _sheet_names(zf: zipfile.ZipFile) -> list[tuple[str, str]]:
    """[(sheet_name, member_path)] in workbook order. Sheet N of the
    workbook maps to xl/worksheets/sheetN.xml via the rels part; the
    common layout (our writer's too) is positional."""
    try:
        wb = ET.fromstring(zf.read("xl/workbook.xml"))
    except KeyError:
        raise ValueError("not an XLSX workbook (no xl/workbook.xml)")
    names = [s.get("name", f"Sheet{i+1}")
             for i, s in enumerate(wb.iter(_MAIN + "sheet"))]
    members = sorted(
        (m for m in zf.namelist()
         if re.fullmatch(r"xl/worksheets/sheet\d+\.xml", m)),
        key=lambda m: int(re.search(r"\d+", m.rsplit("/", 1)[1]).group()))
    return list(zip(names, members))


def iter_xlsx_cells(b: bytes, sheet: str | None = None):
    """Yield (sheet_name, row0, col0, value_str, value_type) for every
    populated cell. value_type: str / num / bool / date."""
    zf = zipfile.ZipFile(io.BytesIO(b))
    shared = _shared_strings(zf)
    for name, member in _sheet_names(zf):
        if sheet is not None and name != sheet:
            continue
        root = ET.fromstring(zf.read(member))
        # ECMA-376 makes the r attribute on <row> and <c> OPTIONAL —
        # position is implied sequentially (previous row + 1, previous
        # cell's column + 1). Defaulting missing refs used to collapse
        # every cell onto row -1 / column 0 (ADVICE r9).
        last_row = -1
        for row in root.iter(_MAIN + "row"):
            rattr = row.get("r")
            r = int(rattr) - 1 if rattr else last_row + 1
            last_row = r
            next_col = 0
            for c in row.iter(_MAIN + "c"):
                ref = c.get("r")
                col = _col_index(ref) if ref else next_col
                next_col = col + 1
                typ = c.get("t", "n")
                v = c.find(_MAIN + "v")
                if typ == "inlineStr":
                    is_ = c.find(_MAIN + "is")
                    text = "".join(t.text or "" for t in
                                   is_.iter(_MAIN + "t")) if is_ is not None \
                        else ""
                    yield name, r, col, text, "str"
                elif v is None or v.text is None:
                    continue
                elif typ == "s":
                    yield name, r, col, shared[int(v.text)], "str"
                elif typ == "str":
                    yield name, r, col, v.text, "str"
                elif typ == "b":
                    yield name, r, col, ("true" if v.text.strip() == "1"
                                         else "false"), "bool"
                elif typ == "d":
                    yield name, r, col, v.text, "date"
                else:
                    yield name, r, col, v.text, "num"


def read_xlsx_cells(spark: SparkSession, path: str,
                    sheet: str | None = None) -> DataFrame:
    """One row per populated CELL across every workbook under
    ``path`` — the sparse low-level surface (binaryFile scan + Arrow
    kernel; same scale shape as read_archive_members)."""
    import pandas as pd

    def kernel(batches):
        for pdf in batches:
            rows = {k: [] for k in ("path", "sheet", "row", "col",
                                    "value", "value_type")}
            for p, content in zip(pdf["path"], pdf["content"]):
                for name, r, col, val, typ in iter_xlsx_cells(
                        bytes(content), sheet):
                    rows["path"].append(p)
                    rows["sheet"].append(name)
                    rows["row"].append(r)
                    rows["col"].append(col)
                    rows["value"].append(val)
                    rows["value_type"].append(typ)
            yield pd.DataFrame(rows)

    raw = spark.read.format("binaryFile").load(path)
    return raw.select("path", "content").mapInPandas(kernel, CELL_SCHEMA)


def read_xlsx(spark: SparkSession, path: str, sheet: str | None = None,
              header: bool = True) -> DataFrame:
    """Typed-ish table read: row 0 is the header (column names), every
    other row becomes one output row of STRING columns (missing cells
    null) — the same all-string contract as the raw CSV scan, so the
    existing one-pass type inference / multi-format timestamp parse
    (sources/csv_ingest) applies downstream unchanged."""
    import pandas as pd

    def kernel(batches):
        for pdf in batches:
            frames = []
            for p, content in zip(pdf["path"], pdf["content"]):
                grid: dict[int, dict[int, str]] = {}
                for name, r, col, val, typ in iter_xlsx_cells(
                        bytes(content), sheet):
                    grid.setdefault(r, {})[col] = val
                if not grid:
                    continue
                hdr_row = min(grid) if header else None
                cols = sorted({c for row in grid.values() for c in row})
                if header:
                    from datapump_spark.sources.xls import _dedupe_names
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

    # schema discovery: parse ONE workbook's header driver-side (tiny
    # read — binaryFile pushes a limit(1))
    first = spark.read.format("binaryFile").load(path) \
        .select("content").limit(1).collect()
    if not first:
        raise ValueError(f"no XLSX files under {path}")
    cells = list(iter_xlsx_cells(bytes(first[0]["content"]), sheet))
    if not cells:
        raise ValueError("empty workbook")
    hdr = min(r for _, r, _, _, _ in cells)
    cols = sorted({c for _, r, c, _, _ in cells})
    if header:
        from datapump_spark.sources.xls import _dedupe_names
        names = {c: v for _, r, c, v, _ in cells if r == hdr}
        fields = _dedupe_names([names.get(c, f"_c{c}") for c in cols])
    else:
        fields = [f"_c{c}" for c in cols]
    schema = ", ".join(f"`{f}` string" for f in fields)
    raw = spark.read.format("binaryFile").load(path)
    return raw.select("path", "content").mapInPandas(kernel, schema)


def encode_xlsx(rows, sheet: str = "Sheet1", *,
                shared: bool = True) -> bytes:
    """Encode rows (list of lists; str/int/float/bool/None) as a
    minimal valid XLSX — fixture/sink twin. ``shared=True`` routes
    strings through sharedStrings.xml (the common producer layout),
    else inline strings — both read paths get witnessed."""
    strings: list[str] = []
    sindex: dict[str, int] = {}

    def col_ref(c: int) -> str:
        ref = ""
        c += 1
        while c:
            c, rem = divmod(c - 1, 26)
            ref = chr(65 + rem) + ref
        return ref

    body = []
    for ri, row in enumerate(rows, start=1):
        cells = []
        for ci, val in enumerate(row):
            if val is None:
                continue
            ref = f"{col_ref(ci)}{ri}"
            if isinstance(val, bool):
                cells.append(f'<c r="{ref}" t="b"><v>{int(val)}</v></c>')
            elif isinstance(val, (int, float)):
                cells.append(f'<c r="{ref}"><v>{val!r}</v></c>')
            else:
                s = str(val)
                if shared:
                    if s not in sindex:
                        sindex[s] = len(strings)
                        strings.append(s)
                    cells.append(
                        f'<c r="{ref}" t="s"><v>{sindex[s]}</v></c>')
                else:
                    cells.append(
                        f'<c r="{ref}" t="inlineStr"><is>'
                        f'<t xml:space="preserve">{_esc(s)}</t></is></c>')
        body.append(f'<row r="{ri}">' + "".join(cells) + "</row>")
    sheet_xml = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/'
        'spreadsheetml/2006/main"><sheetData>' + "".join(body)
        + "</sheetData></worksheet>")
    sst = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/'
        f'2006/main" count="{len(strings)}" uniqueCount="{len(strings)}">'
        + "".join(f'<si><t xml:space="preserve">{_esc(s)}</t></si>'
                  for s in strings) + "</sst>")
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/'
        'spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats'
        '.org/officeDocument/2006/relationships"><sheets>'
        f'<sheet name="{_esc(sheet)}" sheetId="1" r:id="rId1"/>'
        "</sheets></workbook>")
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package'
        '/2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships/worksheet" '
        'Target="worksheets/sheet1.xml"/>'
        '<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships/sharedStrings" '
        'Target="sharedStrings.xml"/></Relationships>')
    rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package'
        '/2006/relationships"><Relationship Id="rId1" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/'
        'relationships/officeDocument" Target="xl/workbook.xml"/>'
        "</Relationships>")
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
        'content-types">'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Default Extension="rels" ContentType="application/vnd.'
        'openxmlformats-package.relationships+xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/'
        'vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="'
        'application/vnd.openxmlformats-officedocument.spreadsheetml.'
        'worksheet+xml"/>'
        '<Override PartName="/xl/sharedStrings.xml" ContentType="'
        'application/vnd.openxmlformats-officedocument.spreadsheetml.'
        'sharedStrings+xml"/></Types>')
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        parts = [("[Content_Types].xml", content_types),
                 ("_rels/.rels", rels),
                 ("xl/workbook.xml", workbook),
                 ("xl/_rels/workbook.xml.rels", wb_rels),
                 ("xl/worksheets/sheet1.xml", sheet_xml)]
        if shared or strings:
            parts.append(("xl/sharedStrings.xml", sst))
        for name, data in parts:
            zf.writestr(zipfile.ZipInfo(name, (2024, 1, 1, 0, 0, 0)), data)
    return buf.getvalue()


def _esc(s: str) -> str:
    return (s.replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;").replace('"', "&quot;"))
