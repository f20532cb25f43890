"""cpio + ISO 9660 reader gates (sources/cpio_iso.py, r12).

CONFORMANCE-PINNED against libarchive: ``bsdtar --format
cpio|newc|iso9660`` authors the fixtures; tests extract those FOREIGN
archives byte-exactly (nested dirs, Rock Ridge long/lowercase names,
empty files), plus honest refusals and the Spark archive-source
dispatch."""

from __future__ import annotations

import shutil
import subprocess

import pytest

from datapump_spark.operators.codecs import UnsupportedMediaError
from datapump_spark.sources.cpio_iso import (
    read_cpio_members,
    read_iso_members,
)

BSDTAR = shutil.which("bsdtar")
pytestmark = pytest.mark.skipif(
    BSDTAR is None, reason="bsdtar (libarchive) not present")

_TREE = {
    "a.txt": b"hello cpio/iso\n",
    "big.bin": bytes(range(256)) * 200,
    "sub/LongMixedCase-Name.txt": b"rock ridge keeps this name\n",
    "empty.txt": b"",
}


def _author(tmp_path, name, fmt):
    src = tmp_path / f"src_{name}"
    for rel, payload in _TREE.items():
        p = src / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_bytes(payload)
    out = tmp_path / name
    subprocess.run(
        [BSDTAR, "-cf", str(out), "--format", fmt, "-C", str(src)]
        + sorted(_TREE), check=True)
    return out.read_bytes()


@pytest.mark.parametrize("fmt,reader", [
    ("cpio", read_cpio_members),       # odc, octal fields
    ("newc", read_cpio_members),       # new ASCII, hex fields
    ("iso9660", read_iso_members),
])
def test_foreign_archive_byte_exact(tmp_path, fmt, reader):
    data = _author(tmp_path, f"t.{fmt}", fmt)
    got = {n: p for n, p, s, m, d in reader(data) if not d}
    assert got == _TREE  # Rock Ridge / exact names, payloads, empty file


def test_refusals(tmp_path):
    with pytest.raises(UnsupportedMediaError, match="binary"):
        list(read_cpio_members(b"\xc7\x71" + b"\x00" * 100))
    with pytest.raises(UnsupportedMediaError, match="magic"):
        list(read_cpio_members(b"070999" + b"0" * 100))
    with pytest.raises(UnsupportedMediaError, match="primary"):
        list(read_iso_members(b"\x00" * 40000))
    data = _author(tmp_path, "t.cap", "newc")
    with pytest.raises(UnsupportedMediaError, match="cap"):
        list(read_cpio_members(data, max_total_bytes=100))
    iso = _author(tmp_path, "t.capiso", "iso9660")
    with pytest.raises(UnsupportedMediaError, match="cap"):
        list(read_iso_members(iso, max_total_bytes=100))


@pytest.mark.slow  # redundancy: per-format byte-exact extraction is
# pinned in-default above, and the Spark member-explode kernel shape
# is identical to the zip/tar path exercised in-default by
# test_archives; only the cpio/iso dispatch composition is deferred.
def test_spark_dispatch(spark, tmp_path):
    from datapump_spark.sources.archives import read_archive_members

    d = tmp_path / "arch"
    d.mkdir()
    (d / "a.cpio").write_bytes(_author(tmp_path, "x.cpio", "newc"))
    (d / "b.iso").write_bytes(_author(tmp_path, "x.iso", "iso9660"))
    df = read_archive_members(spark, str(d), member_glob="*.txt")
    rows = sorted((r.member_path, bytes(r.member_bytes))
                  for r in df.collect())
    want = sorted((k, v) for k, v in _TREE.items()
                  if k.endswith(".txt")) * 2
    assert rows == sorted(want)
