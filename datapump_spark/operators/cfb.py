"""Compound File Binary (OLE2/CFB, [MS-CFB] — public) reader + writer
twin (round 11). CFB is the container under every legacy Office
format: .doc (operators/doc.py), .xls (sources/xls.py), .ppt, .msg —
previously sniffed and quarantined as ``legacy_doc``.

Reader scope: v3 (512-byte sectors) and v4 (4096), header-resident +
chained DIFAT, FAT chain walks with cycle guards, the mini stream
(miniFAT chains over the root entry's stream, 64-byte sectors,
< 4096-byte streams), full directory scan (the red-black sibling tree
is ignored — every allocated entry is returned, which also reads
slightly damaged files the tree walk would lose).

Writer twin ``write_cfb``: v3 files whose streams are padded to the
mini-stream cutoff so every chain lives in the regular FAT — minimal
but fully conforming (readers locate streams by directory start
sector + size, and the legacy-format twins give exact byte offsets
inside their streams).
"""

from __future__ import annotations

import struct

CFB_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"

_ENDOFCHAIN = 0xFFFFFFFE
_FREESECT = 0xFFFFFFFF
_FATSECT = 0xFFFFFFFD
_DIFSECT = 0xFFFFFFFC


def _chain(fat: list[int], start: int, limit: int) -> list[int]:
    out = []
    cur = start
    while cur not in (_ENDOFCHAIN, _FREESECT) and len(out) <= limit:
        if cur >= len(fat):
            raise ValueError("CFB chain runs past the FAT")
        out.append(cur)
        cur = fat[cur]
    if len(out) > limit:
        raise ValueError("CFB chain cycle")
    return out


def read_cfb(b: bytes) -> dict[str, bytes]:
    """{stream name: bytes} for every stream entry in the compound
    file (names as stored, without the path; duplicate names keep the
    first). Raises ValueError for non-CFB or structurally broken
    payloads."""
    if b[:8] != CFB_MAGIC:
        raise ValueError("not a CFB (OLE2) file")
    if len(b) < 512:
        raise ValueError("truncated CFB header")
    sector_shift = struct.unpack("<H", b[30:32])[0]
    if sector_shift not in (9, 12):
        raise ValueError(f"bad CFB sector shift {sector_shift}")
    ssz = 1 << sector_shift
    n_fat = struct.unpack("<I", b[44:48])[0]
    first_dir = struct.unpack("<I", b[48:52])[0]
    first_minifat = struct.unpack("<I", b[60:64])[0]
    n_minifat = struct.unpack("<I", b[64:68])[0]
    first_difat = struct.unpack("<I", b[68:72])[0]
    n_difat = struct.unpack("<I", b[72:76])[0]
    mini_cutoff = struct.unpack("<I", b[56:60])[0] or 4096

    def sector(n: int) -> bytes:
        at = 512 + n * ssz if sector_shift == 9 else (n + 1) * ssz
        if at + ssz > len(b):
            raise ValueError("CFB sector out of range")
        return b[at:at + ssz]

    # DIFAT: 109 header entries + chained DIFAT sectors
    difat = list(struct.unpack("<109I", b[76:512]))
    cur = first_difat
    for _ in range(n_difat):
        if cur in (_ENDOFCHAIN, _FREESECT):
            break
        s = sector(cur)
        difat += struct.unpack(f"<{ssz // 4 - 1}I", s[:-4])
        cur = struct.unpack("<I", s[-4:])[0]
    fat: list[int] = []
    used = 0
    for ds in difat:
        if ds in (_FREESECT, _ENDOFCHAIN) or used >= n_fat:
            continue
        fat += struct.unpack(f"<{ssz // 4}I", sector(ds))
        used += 1

    limit = len(b) // 64 + 16
    dir_raw = b"".join(sector(s) for s in _chain(fat, first_dir, limit))
    minifat: list[int] = []
    if n_minifat and first_minifat not in (_ENDOFCHAIN, _FREESECT):
        for s in _chain(fat, first_minifat, limit):
            minifat += struct.unpack(f"<{ssz // 4}I", sector(s))

    entries = []
    for at in range(0, len(dir_raw) - 127, 128):
        e = dir_raw[at:at + 128]
        name_len = struct.unpack("<H", e[64:66])[0]
        otype = e[66]
        if otype not in (1, 2, 5) or name_len < 2 or name_len > 64:
            continue
        name = e[:name_len - 2].decode("utf-16-le", "replace")
        start = struct.unpack("<I", e[116:120])[0]
        size = struct.unpack("<Q", e[120:128])[0]
        if sector_shift == 9:
            size &= 0xFFFFFFFF           # v3: only the low 4 bytes
        entries.append((name, otype, start, size))

    root = next((e for e in entries if e[1] == 5), None)
    mini_raw = b""
    if root is not None and root[3] and root[2] not in (_ENDOFCHAIN,
                                                        _FREESECT):
        mini_raw = b"".join(sector(s)
                            for s in _chain(fat, root[2], limit))

    out: dict[str, bytes] = {}
    for name, otype, start, size in entries:
        if otype != 2 or name in out:
            continue
        if size == 0:
            out[name] = b""
        elif size < mini_cutoff:
            if not minifat:
                raise ValueError("mini stream without a miniFAT")
            data = b"".join(
                mini_raw[s * 64:s * 64 + 64]
                for s in _chain(minifat, start, limit))
            out[name] = data[:size]
        else:
            data = b"".join(sector(s)
                            for s in _chain(fat, start, limit))
            out[name] = data[:size]
    return out


def write_cfb(streams: dict[str, bytes]) -> bytes:
    """Conforming v3 CFB writer twin: streams under the 4096-byte
    cutoff live in the MINI stream (64-byte sectors chained through a
    real miniFAT, exactly like real Office files), larger streams in
    regular FAT chains; one directory chain, header-resident DIFAT.
    Exact sizes recorded — read_cfb(write_cfb(x)) == x."""
    ssz = 512
    sectors: list[bytes] = []

    def add(data: bytes) -> tuple[int, int]:
        start = len(sectors)
        for i in range(0, len(data), ssz):
            sectors.append(data[i:i + ssz].ljust(ssz, b"\x00"))
        return start, len(sectors) - start

    # split streams into mini (< 4096) and regular
    placed = {}                          # name -> (start, size, mini)
    chains = []                          # (start, count) regular chains
    mini_data = bytearray()
    minifat: list[int] = []
    for name, data in streams.items():
        if len(data) < 4096:
            mstart = len(mini_data) // 64
            n_mini = max(1, -(-len(data) // 64))
            mini_data += data.ljust(n_mini * 64, b"\x00")
            ids = list(range(mstart, mstart + n_mini))
            for a, nxt in zip(ids, ids[1:] + [_ENDOFCHAIN]):
                while len(minifat) <= a:
                    minifat.append(_FREESECT)
                minifat[a] = nxt
            placed[name] = (mstart, len(data), True)
        else:
            start, count = add(data)
            placed[name] = (start, len(data), False)
            chains.append((start, count))
    mini_start = _ENDOFCHAIN
    if mini_data:
        mini_start, mini_count = add(bytes(mini_data))
        chains.append((mini_start, mini_count))
    minifat_start = _ENDOFCHAIN
    n_minifat_sectors = 0
    if minifat:
        per = ssz // 4
        n_minifat_sectors = -(-len(minifat) // per)
        mf = minifat + [_FREESECT] * (n_minifat_sectors * per
                                      - len(minifat))
        minifat_start, mf_count = add(
            b"".join(struct.pack(f"<{per}I", *mf[k * per:(k + 1) * per])
                     for k in range(n_minifat_sectors)))
        chains.append((minifat_start, mf_count))

    # directory
    def entry(name, otype, start, size, child=_FREESECT,
              right=_FREESECT):
        nm = name.encode("utf-16-le")[:62]
        e = bytearray(128)
        e[:len(nm)] = nm
        struct.pack_into("<H", e, 64, len(nm) + 2)
        e[66] = otype
        e[67] = 1                        # black
        struct.pack_into("<III", e, 68, _FREESECT, right, child)
        struct.pack_into("<I", e, 116, start)
        struct.pack_into("<Q", e, 120, size)
        return bytes(e)

    names = list(placed)
    dir_data = bytearray()
    dir_data += entry("Root Entry", 5, mini_start, len(mini_data),
                      child=1 if names else _FREESECT)
    for i, name in enumerate(names):
        start, size, _mini = placed[name]
        right = i + 2 if i + 1 < len(names) else _FREESECT
        dir_data += entry(name, 2, start, size, right=right)
    dir_start, dir_count = add(bytes(dir_data))
    chains.append((dir_start, dir_count))

    # FAT sizing (the FAT covers its own sectors too)
    per = ssz // 4

    def build_fat(n_fat: int) -> list[int]:
        fat: list[int] = []

        def chain_ids(ids):
            for a, nxt in zip(ids, ids[1:] + [_ENDOFCHAIN]):
                while len(fat) <= a:
                    fat.append(_FREESECT)
                fat[a] = nxt

        for start, count in chains:
            chain_ids(list(range(start, start + count)))
        for k in range(n_fat):
            a = len(sectors) + k
            while len(fat) <= a:
                fat.append(_FREESECT)
            fat[a] = _FATSECT
        return fat

    n_fat = 1
    while True:
        fat = build_fat(n_fat)
        need = -(-len(fat) // per)
        if need <= n_fat:
            break
        n_fat = need
    fat += [_FREESECT] * (n_fat * per - len(fat))
    fat_start = len(sectors)
    for k in range(n_fat):
        sectors.append(struct.pack(f"<{per}I",
                                   *fat[k * per:(k + 1) * per]))

    hdr = bytearray(512)
    hdr[:8] = CFB_MAGIC
    struct.pack_into("<H", hdr, 24, 0x003E)
    struct.pack_into("<H", hdr, 26, 0x0003)
    struct.pack_into("<H", hdr, 28, 0xFFFE)
    struct.pack_into("<H", hdr, 30, 9)
    struct.pack_into("<H", hdr, 32, 6)
    struct.pack_into("<I", hdr, 44, n_fat)
    struct.pack_into("<I", hdr, 48, dir_start)
    struct.pack_into("<I", hdr, 56, 4096)
    struct.pack_into("<I", hdr, 60, minifat_start
                     if minifat else _ENDOFCHAIN)
    struct.pack_into("<I", hdr, 64, n_minifat_sectors)
    struct.pack_into("<I", hdr, 68, _ENDOFCHAIN)
    struct.pack_into("<I", hdr, 72, 0)
    difat = [fat_start + k for k in range(n_fat)]
    if len(difat) > 109:
        raise ValueError("CFB twin supports header-resident DIFAT only")
    difat += [_FREESECT] * (109 - len(difat))
    struct.pack_into("<109I", hdr, 76, *difat)
    return bytes(hdr) + b"".join(sectors)
