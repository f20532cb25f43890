"""cpio and ISO 9660 readers (round 12) — the remaining everyday
members of the archive family (zip/tar/*/7z landed r9-r12): cpio is
the RPM/initrd payload format, ISO images are how old document and
software collections were archived and still surface in crawls.

Formats:
- cpio: the portable ASCII ("odc", magic ``070707``, octal fields)
  and "new ASCII" (``070701``/``070702``, hex fields, 4-byte
  alignment) variants, ending at the ``TRAILER!!!`` entry. Binary
  cpio (``\\x71\\xc7``) is refused honestly.
- ISO 9660: primary volume descriptor at sector 16, recursive
  directory-extent walk (both-endian fields read little-endian,
  ``;1`` version suffixes stripped, interleaved-unit images refused),
  with Rock Ridge NM long names (SUSP system-use entries, CE
  continuation areas) when present.

CONFORMANCE: libarchive (``bsdtar --format cpio|newc|iso9660``) is
in-container and authors real fixtures — tests pin byte-exact member
extraction against the source trees bsdtar archived.

Reference parity note: charter extension (the reference reads loose
CSVs only).
"""

from __future__ import annotations

from datetime import datetime

from datapump_spark.operators.codecs import UnsupportedMediaError

CPIO_MAGICS = (b"070707", b"070701", b"070702")
_S_IFMT = 0o170000
_S_IFDIR = 0o040000
_S_IFREG = 0o100000


def read_cpio_members(data: bytes, max_total_bytes: int = 1 << 30):
    """Yield ``(name, payload|None, size, mtime, is_dir)`` per entry."""
    if data[:2] == b"\xc7\x71" or data[:2] == b"\x71\xc7":
        raise UnsupportedMediaError("cpio: binary variant unsupported")
    i = 0
    total = 0
    while True:
        magic = data[i:i + 6]
        if magic == b"070707":
            hdr = data[i:i + 76]
            if len(hdr) < 76:
                raise UnsupportedMediaError("cpio: truncated odc header")
            try:
                mode = int(hdr[18:24], 8)
                mtime = int(hdr[48:59], 8)
                namesize = int(hdr[59:65], 8)
                filesize = int(hdr[65:76], 8)
            except ValueError:
                raise UnsupportedMediaError("cpio: bad odc header field")
            name = data[i + 76:i + 76 + namesize - 1].decode(
                "utf-8", errors="replace")
            body = i + 76 + namesize
            payload = data[body:body + filesize]
            i = body + filesize
        elif magic in (b"070701", b"070702"):
            hdr = data[i:i + 110]
            if len(hdr) < 110:
                raise UnsupportedMediaError("cpio: truncated newc header")

            def fld(k):
                s = hdr[6 + 8 * k:14 + 8 * k]
                try:
                    return int(s, 16)
                except ValueError:
                    raise UnsupportedMediaError("cpio: bad newc header field")

            mode, mtime, filesize, namesize = (fld(1), fld(5), fld(6),
                                               fld(11))
            name_end = i + 110 + namesize
            name = data[i + 110:name_end - 1].decode(
                "utf-8", errors="replace")
            body = name_end + (-(name_end) % 4)
            payload = data[body:body + filesize]
            i = body + filesize
            i += -i % 4
        else:
            raise UnsupportedMediaError(
                f"cpio: bad entry magic {magic!r}")
        if name == "TRAILER!!!":
            return
        if len(payload) != filesize:
            raise UnsupportedMediaError("cpio: truncated member data")
        total += filesize
        if total > max_total_bytes:
            raise UnsupportedMediaError("cpio: archive exceeds decode cap")
        is_dir = (mode & _S_IFMT) == _S_IFDIR
        mt = datetime.utcfromtimestamp(mtime)
        yield (name.lstrip("./") or name, None if is_dir else payload,
               0 if is_dir else filesize, mt, is_dir)


_SECTOR = 2048


def _dir_records(data: bytes, lba: int, size: int):
    """Iterate directory records of one directory extent."""
    base = lba * _SECTOR
    end = base + size
    pos = base
    while pos < end:
        ln = data[pos] if pos < len(data) else 0
        if ln == 0:
            # records never span sectors: skip to the next boundary
            skip = -pos % _SECTOR
            pos += skip if skip else _SECTOR
            continue
        rec = data[pos:pos + ln]
        if len(rec) < 33:
            raise UnsupportedMediaError("iso9660: truncated record")
        yield rec
        pos += ln


def _rr_name(rec: bytes, data: bytes) -> str | None:
    """Rock Ridge NM entries from the system-use area (+ CE chains)."""
    name_len = rec[32]
    su = rec[33 + name_len + (1 - name_len % 2):]
    out: list[bytes] = []
    more = True
    while more:
        more = False
        j = 0
        next_area = None
        while j + 4 <= len(su):
            sig = su[j:j + 2]
            ln = su[j + 2]
            if ln < 4 or j + ln > len(su):
                break
            if sig == b"NM":
                flags = su[j + 4]
                out.append(su[j + 5:j + ln])
                if not flags & 0x01:  # CONTINUE not set
                    pass
            elif sig == b"CE":
                lba = int.from_bytes(su[j + 4:j + 8], "little")
                off = int.from_bytes(su[j + 12:j + 16], "little")
                sz = int.from_bytes(su[j + 20:j + 24], "little")
                next_area = data[lba * _SECTOR + off:
                                 lba * _SECTOR + off + sz]
            elif sig == b"ST":
                break
            j += ln
        if next_area is not None:
            su = next_area
            more = True
    if out:
        return b"".join(out).decode("utf-8", errors="replace")
    return None


def _iso_mtime(rec: bytes) -> datetime | None:
    y, mo, d, h, mi, s = rec[18], rec[19], rec[20], rec[21], rec[22], rec[23]
    try:
        return datetime(1900 + y, mo, d, h, mi, s)
    except ValueError:
        return None


def read_iso_members(data: bytes, max_total_bytes: int = 1 << 30):
    """Yield ``(name, payload|None, size, mtime, is_dir)`` from an
    ISO 9660 image (primary descriptor + Rock Ridge names)."""
    pvd = data[16 * _SECTOR:17 * _SECTOR]
    if len(pvd) < _SECTOR or pvd[1:6] != b"CD001":
        raise UnsupportedMediaError("iso9660: no primary volume descriptor")
    if pvd[0] != 1:
        raise UnsupportedMediaError(
            f"iso9660: descriptor type {pvd[0]} where primary expected")
    root = pvd[156:156 + 34]
    total = [0]

    def walk(rec: bytes, prefix: str):
        lba = int.from_bytes(rec[2:6], "little")
        size = int.from_bytes(rec[10:14], "little")
        for r in _dir_records(data, lba, size):
            name_len = r[32]
            raw = r[33:33 + name_len]
            if raw in (b"\x00", b"\x01"):  # self / parent
                continue
            if r[26] or r[27]:
                raise UnsupportedMediaError(
                    "iso9660: interleaved files unsupported")
            name = _rr_name(r, data)
            if name is None:
                name = raw.decode("ascii", errors="replace")
                if ";" in name:
                    name = name.split(";")[0]
                name = name.rstrip(".").lower() or "."
            full = f"{prefix}{name}"
            is_dir = bool(r[25] & 0x02)
            mt = _iso_mtime(r)
            if is_dir:
                yield full, None, 0, mt, True
                yield from walk(r, full + "/")
            else:
                flba = int.from_bytes(r[2:6], "little")
                fsize = int.from_bytes(r[10:14], "little")
                total[0] += fsize
                if total[0] > max_total_bytes:
                    raise UnsupportedMediaError(
                        "iso9660: image exceeds decode cap")
                payload = data[flba * _SECTOR:flba * _SECTOR + fsize]
                if len(payload) != fsize:
                    raise UnsupportedMediaError(
                        "iso9660: truncated file extent")
                yield full, payload, fsize, mt, False

    yield from walk(root, "")
