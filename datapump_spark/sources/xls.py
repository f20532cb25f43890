"""Legacy Excel .xls (BIFF8, [MS-XLS] — public) ingestion in pure
Python (round 11) — the binary sibling of sources/xlsx.py, over the
CFB container reader (operators/cfb.py). Closes the last legacy
Office seam the engine quarantined.

Reader scope (BIFF8, Excel 97-2003):
- Workbook stream record walk (u16 id + u16 length framing), BOF
  version check, BOUNDSHEET name/stream-position table, per-sheet
  substream walks;
- SST shared strings (XLUnicodeRichExtendedString: compressed 8-bit
  and UTF-16 payloads, rich-run and ext-block skips) + LABELSST;
- NUMBER (IEEE f64), RK and MULRK (the packed 30-bit encodings:
  fInt/fX100 variants), LABEL (inline strings), BOOLERR;
- SST and LABEL records spanning CONTINUE records (r12, VERDICT r11
  #3): scalar fields never split, character arrays split with the
  per-fragment fHighByte re-declaration, rich/ext arrays span freely
  — the real-world trap for any workbook with >8 KB of shared
  strings; the writer twin emits spec-shaped CONTINUE splits too;
- BIFF5 (Excel 5/95) sheets read too (r11 second pass: byte-string
  LABELs and BOUNDSHEET names, no SST); encrypted (FILEPASS)
  workbooks refuse with a clear message.

``read_xls`` mirrors ``read_xlsx``'s all-string table contract, so
the existing type inference applies downstream unchanged;
``encode_xls`` is the writer twin (globals + SST + BOUNDSHEET with
real stream offsets, LABELSST/NUMBER/RK/BOOLERR cells).
"""

from __future__ import annotations

import struct

from pyspark.sql import DataFrame, SparkSession

from datapump_spark.operators.cfb import read_cfb, write_cfb

_CELL_SCHEMA = ("path string, sheet string, row int, col int, "
                "value string, value_type string")


def _records(b: bytes):
    i = 0
    while i + 4 <= len(b):
        rid, ln = struct.unpack("<HH", b[i:i + 4])
        yield rid, b[i + 4:i + 4 + ln], i
        i += 4 + ln


def _record_groups(b: bytes):
    """Yield (rid, [payload fragments], pos): CONTINUE (0x003C)
    records attach to the record they extend — records over the 8224-
    byte BIFF cap (real-world SSTs, long LABELs) arrive split."""
    cur = None
    for rid, data, pos in _records(b):
        if rid == 0x003C and cur is not None:
            cur[1].append(data)
            continue
        if cur is not None:
            yield cur
        cur = (rid, [data], pos)
    if cur is not None:
        yield cur


class _FragCursor:
    """Reads [MS-XLS] structures across CONTINUE fragment boundaries.

    Field rules per the spec: scalar fields never split across a
    boundary (crossing between fields just advances); CHARACTER arrays
    may split, and each continuation fragment then re-declares the
    fHighByte flag in its first byte; rich-run/ext arrays may split
    with no flag byte."""

    __slots__ = ("frags", "fi", "off")

    def __init__(self, frags: list[bytes], off: int = 0):
        self.frags = frags
        self.fi = 0
        self.off = off

    def _avail(self) -> int:
        return len(self.frags[self.fi]) - self.off

    def _advance(self) -> None:
        if self.fi + 1 >= len(self.frags):
            raise ValueError("BIFF8 record truncated mid-structure")
        self.fi += 1
        self.off = 0

    def read(self, n: int) -> bytes:
        while self._avail() == 0 and self.fi + 1 < len(self.frags):
            self._advance()
        f = self.frags[self.fi]
        if n > len(f) - self.off:
            raise ValueError("BIFF8 scalar field split across CONTINUE")
        out = f[self.off:self.off + n]
        self.off += n
        return out

    def read_spanning(self, n: int) -> None:
        """Skip ``n`` bytes of rich-run/ext data (may span freely)."""
        while n:
            while self._avail() == 0:
                self._advance()
            take = min(n, self._avail())
            self.off += take
            n -= take

    def read_chars(self, cch: int, high: int) -> str:
        parts = []
        while cch:
            if self._avail() == 0:
                self._advance()
                high = self.frags[self.fi][0] & 1  # re-declared grbit
                self.off = 1
            unit = 2 if high else 1
            nchars = min(cch, self._avail() // unit)
            if nchars == 0:
                raise ValueError("BIFF8 character data misaligned at "
                                 "CONTINUE boundary")
            raw = self.frags[self.fi][self.off:self.off + nchars * unit]
            parts.append(raw.decode("utf-16-le" if high else "latin-1",
                                    "replace"))
            self.off += nchars * unit
            cch -= nchars
        return "".join(parts)

    def read_xl_string(self) -> str:
        """One XLUnicodeRichExtendedString at the cursor."""
        cch = struct.unpack("<H", self.read(2))[0]
        grbit = self.read(1)[0]
        c_run = struct.unpack("<H", self.read(2))[0] if grbit & 0x08 \
            else 0
        cb_ext = struct.unpack("<i", self.read(4))[0] if grbit & 0x04 \
            else 0
        text = self.read_chars(cch, grbit & 0x01)
        self.read_spanning(4 * c_run + max(cb_ext, 0))
        return text


def _parse_sst(frags: list[bytes]) -> list[str]:
    cur = _FragCursor(frags)
    cur.read(4)                          # cstTotal
    unique = struct.unpack("<I", cur.read(4))[0]
    return [cur.read_xl_string() for _ in range(unique)]


def _xl_string(b: bytes, at: int, short: bool = False):
    """(text, bytes consumed) for an XLUnicode(Rich Extended)String;
    ``short`` uses the 8-bit cch form (sheet names)."""
    if short:
        cch = b[at]
        at2 = at + 1
    else:
        cch = struct.unpack("<H", b[at:at + 2])[0]
        at2 = at + 2
    grbit = b[at2]
    at2 += 1
    c_run = 0
    cb_ext = 0
    if grbit & 0x08:                     # fRichSt
        c_run = struct.unpack("<H", b[at2:at2 + 2])[0]
        at2 += 2
    if grbit & 0x04:                     # fExtSt
        cb_ext = struct.unpack("<i", b[at2:at2 + 4])[0]
        at2 += 4
    if grbit & 0x01:                     # fHighByte: UTF-16LE
        raw = b[at2:at2 + 2 * cch]
        if len(raw) < 2 * cch:
            raise ValueError("truncated BIFF8 string")
        text = raw.decode("utf-16-le", "replace")
        at2 += 2 * cch
    else:
        raw = b[at2:at2 + cch]
        if len(raw) < cch:
            raise ValueError("truncated BIFF8 string")
        text = raw.decode("latin-1")
        at2 += cch
    at2 += 4 * c_run + max(cb_ext, 0)
    return text, at2 - at


def _rk_value(rk: int) -> float:
    if rk & 0x02:                        # fInt: signed 30-bit integer
        v = rk >> 2
        if v & 0x20000000:
            v -= 0x40000000
        val = float(v)
    else:
        val = struct.unpack("<d", struct.pack(
            "<Q", (rk & 0xFFFFFFFC) << 32))[0]
    return val / 100.0 if rk & 0x01 else val


def _fmt_num(v: float) -> str:
    return str(int(v)) if v == int(v) and abs(v) < 1e15 else repr(v)


def iter_xls_cells(b: bytes, sheet: str | None = None):
    """Yield (sheet_name, row, col, value_str, type) per populated
    cell — types 's' (string), 'n' (number), 'b' (boolean),
    'e' (error). Raises ValueError for non-BIFF8/encrypted files."""
    streams = read_cfb(b)
    wb = streams.get("Workbook") or streams.get("Book")
    if wb is None:
        raise ValueError("OLE2 container without a Workbook stream")
    if len(wb) < 8 or struct.unpack("<H", wb[:2])[0] != 0x0809:
        raise ValueError("Workbook stream without a BOF record")
    ver, dt = struct.unpack("<HH", wb[4:8])
    if ver not in (0x0600, 0x0500):
        raise ValueError(f"BIFF version 0x{ver:04x} unsupported "
                         "(BIFF8 or BIFF5)")
    biff5 = ver == 0x0500
    sst: list[str] = []
    sheets: list[tuple[str, int]] = []
    for rid, frags, _pos in _record_groups(wb):
        data = frags[0]
        if rid == 0x002F:                # FILEPASS
            raise ValueError("encrypted .xls unsupported")
        if rid == 0x0085:                # BOUNDSHEET
            pos = struct.unpack("<I", data[:4])[0]
            if biff5:                    # byte string, no grbit
                name = data[7:7 + data[6]].decode("latin-1")
            else:
                name, _ = _xl_string(data, 6, short=True)
            sheets.append((name, pos))
        elif rid == 0x00FC:              # SST (CONTINUE-spanning, r12)
            sst.extend(_parse_sst(frags))
        elif rid == 0x000A and dt == 0x0005:
            pass                         # globals EOF; sheets follow
    for name, pos in sheets:
        if sheet is not None and name != sheet:
            continue
        for rid, frags, _at in _record_groups(wb[pos:]):
            data = frags[0]
            if rid == 0x000A:            # sheet EOF
                break
            if rid == 0x00FD:            # LABELSST
                row, col, _xf, isst = struct.unpack("<HHHI", data[:10])
                if isst < len(sst):
                    yield name, row, col, sst[isst], "s"
            elif rid == 0x0203:          # NUMBER
                row, col, _xf = struct.unpack("<HHH", data[:6])
                (v,) = struct.unpack("<d", data[6:14])
                yield name, row, col, _fmt_num(v), "n"
            elif rid == 0x027E:          # RK
                row, col, _xf, rk = struct.unpack("<HHHI", data[:10])
                yield name, row, col, _fmt_num(_rk_value(rk)), "n"
            elif rid == 0x00BD:          # MULRK
                row, col0 = struct.unpack("<HH", data[:4])
                n = (len(data) - 6) // 6
                for k in range(n):
                    rk = struct.unpack(
                        "<I", data[4 + 6 * k + 2:4 + 6 * k + 6])[0]
                    yield (name, row, col0 + k,
                           _fmt_num(_rk_value(rk)), "n")
            elif rid == 0x0204:          # LABEL (inline)
                row, col, _xf = struct.unpack("<HHH", data[:6])
                if biff5:                # BIFF5: byte string, no grbit
                    cch = struct.unpack("<H", data[6:8])[0]
                    text = data[8:8 + cch].decode("latin-1")
                else:                    # may span CONTINUE (r12)
                    cur = _FragCursor(frags, off=6)
                    cch = struct.unpack("<H", cur.read(2))[0]
                    grbit = cur.read(1)[0]
                    text = cur.read_chars(cch, grbit & 0x01)
                yield name, row, col, text, "s"
            elif rid == 0x0205:          # BOOLERR
                row, col, _xf, val, ferr = struct.unpack(
                    "<HHHBB", data[:8])
                if ferr:
                    yield name, row, col, f"#ERR{val:02X}", "e"
                else:
                    yield name, row, col, ("TRUE" if val else "FALSE"), "b"


def _dedupe_names(names: list[str]) -> list[str]:
    """Deterministically de-duplicate header names: the first occurrence
    keeps its name, repeats get _2, _3, ... suffixes. Applied in BOTH
    the driver schema inference and the per-file kernel so per-file
    columns always line up with the inferred schema (a duplicate header
    would otherwise collapse two dict keys into one ragged column)."""
    seen: dict[str, int] = {}
    out = []
    for n in names:
        k = seen.get(n, 0) + 1
        seen[n] = k
        out.append(n if k == 1 else f"{n}_{k}")
    return out


def read_xls(spark: SparkSession, path: str,
             sheet: str | None = None, header: bool = True) -> DataFrame:
    """Typed-ish table read over every .xls under ``path`` — row 0 is
    the header, every other row one output row of STRING columns (the
    read_xlsx contract, so type inference applies downstream)."""
    import pandas as pd

    def kernel(batches):
        for pdf in batches:
            frames = []
            for content in pdf["content"]:
                grid: dict[int, dict[int, str]] = {}
                for _nm, r, c, val, _t in iter_xls_cells(bytes(content),
                                                         sheet):
                    grid.setdefault(r, {})[c] = val
                if not grid:
                    continue
                hdr_row = min(grid) if header else None
                cols = sorted({c for row in grid.values() for c in row})
                if header:
                    names = _dedupe_names([grid[hdr_row].get(c, f"_c{c}")
                                           for c in cols])
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
        raise ValueError(f"no XLS files under {path}")
    cells = list(iter_xls_cells(bytes(first[0]["content"]), sheet))
    if not cells:
        raise ValueError("empty workbook")
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


def _rec(rid: int, payload: bytes) -> bytes:
    return struct.pack("<HH", rid, len(payload)) + payload


def _w_xlstring(text: str, short: bool = False) -> bytes:
    try:
        raw = text.encode("latin-1")
        grbit = 0
        cch = len(raw)
    except UnicodeEncodeError:
        raw = text.encode("utf-16-le")
        grbit = 1
        cch = len(raw) // 2              # cch counts UTF-16 code UNITS
    head = bytes([cch]) if short else struct.pack("<H", cch)
    return head + bytes([grbit]) + raw


def _w_sst_records(total: int, strings: list[str],
                   cap: int = 8224) -> bytes:
    """SST + CONTINUE records (r12): strings pack into fragments of at
    most ``cap`` bytes; scalar headers never split, character data
    splits with the per-fragment fHighByte re-declaration the spec
    requires (the real-world trap for SSTs past the 8224-byte record
    cap). ``cap`` is a twin knob so tests can force splits cheaply."""
    frags = [bytearray(struct.pack("<II", total, len(strings)))]

    def room() -> int:
        return cap - len(frags[-1])

    for s in strings:
        try:
            raw = s.encode("latin-1")
            grbit, unit = 0, 1
        except UnicodeEncodeError:
            raw = s.encode("utf-16-le")
            grbit, unit = 1, 2
        head = struct.pack("<H", len(raw) // unit) + bytes([grbit])
        if room() < len(head):
            frags.append(bytearray())    # between-field break: no flag
        frags[-1] += head
        pos = 0
        while pos < len(raw):
            if room() < unit:
                frags.append(bytearray([grbit]))  # mid-chars: re-flag
            take = min(len(raw) - pos, (room() // unit) * unit)
            frags[-1] += raw[pos:pos + take]
            pos += take
    return _rec(0x00FC, bytes(frags[0])) + b"".join(
        _rec(0x003C, bytes(f)) for f in frags[1:])


def encode_xls(rows: list[list], sheet: str = "Sheet1",
               sst_cap: int = 8224) -> bytes:
    """BIFF8 workbook twin: globals substream (BOF, SST, BOUNDSHEET
    with the REAL sheet stream offset), one sheet substream. REPEATED
    strings ride the SST via LABELSST; singleton strings are inline
    LABEL records (which keeps typical SSTs small and witnesses both
    string decoders); SSTs past the 8224-byte record cap split into
    CONTINUE records (r12, ``sst_cap`` forces small splits in tests);
    int-valued numbers go through RK, other numbers through NUMBER,
    booleans through BOOLERR; wrapped in a CFB container."""
    from collections import Counter
    counts = Counter(str(v) for row in rows for v in row
                     if v is not None
                     and not isinstance(v, (bool, int, float)))
    strings: list[str] = []
    index: dict[str, int] = {}
    cells = []
    n_str_cells = 0
    for r, row in enumerate(rows):
        for c, v in enumerate(row):
            if v is None:
                continue
            if isinstance(v, bool):
                cells.append(_rec(0x0205, struct.pack(
                    "<HHHBB", r, c, 15, int(v), 0)))
            elif isinstance(v, (int, float)):
                fv = float(v)
                if fv == int(fv) and -(1 << 29) <= int(fv) < (1 << 29):
                    rk = (int(fv) << 2) | 0x02
                    cells.append(_rec(0x027E, struct.pack(
                        "<HHHI", r, c, 15, rk & 0xFFFFFFFF)))
                else:
                    cells.append(_rec(0x0203, struct.pack(
                        "<HHH", r, c, 15) + struct.pack("<d", fv)))
            else:
                s = str(v)
                if counts[s] < 2:        # singleton: inline LABEL
                    cells.append(_rec(0x0204, struct.pack(
                        "<HHH", r, c, 15) + _w_xlstring(s)))
                    continue
                if s not in index:
                    index[s] = len(strings)
                    strings.append(s)
                n_str_cells += 1
                cells.append(_rec(0x00FD, struct.pack(
                    "<HHHI", r, c, 15, index[s])))
    sheet_sub = (_rec(0x0809, struct.pack("<HHIH", 0x0600, 0x0010, 0, 0))
                 + b"".join(cells) + _rec(0x000A, b""))
    sst_records = _w_sst_records(n_str_cells, strings, cap=sst_cap)
    bsheet_name = _w_xlstring(sheet, short=True)
    # two-pass: globals size depends only on fixed-size parts
    globals_fixed = (_rec(0x0809, struct.pack("<HHIH", 0x0600, 0x0005,
                                              0, 0))
                     + sst_records)
    bsheet = _rec(0x0085, struct.pack("<IBB", 0, 0, 0) + bsheet_name)
    sheet_pos = len(globals_fixed) + len(bsheet) + 4  # + globals EOF
    bsheet = _rec(0x0085, struct.pack("<IBB", sheet_pos, 0, 0)
                  + bsheet_name)
    wb = globals_fixed + bsheet + _rec(0x000A, b"") + sheet_sub
    return write_cfb({"Workbook": wb})
