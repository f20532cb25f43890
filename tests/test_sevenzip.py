"""7z reader gates (sources/sevenzip.py, r12).

CONFORMANCE-PINNED against libarchive: ``bsdtar --format 7zip`` is
in-container and authors real 7z archives in all six compression
modes (store/deflate/bzip2/lzma1/lzma2/zstd — the zstd arm rides the
conformance-pinned pure-Python decoder via the 04F71101 method id).
Tests extract those FOREIGN archives byte-exactly: per-codec, solid
multi-file folders, nested dirs, unicode names, empty files, mtimes,
CRC enforcement, honest refusals, and the Spark archive-source
integration (mixed directory with zip/tar).
"""

from __future__ import annotations

import shutil
import subprocess

import pytest

from datapump_spark.operators.codecs import UnsupportedMediaError
from datapump_spark.sources.sevenzip import read_7z_members

BSDTAR = shutil.which("bsdtar")
pytestmark = pytest.mark.skipif(
    BSDTAR is None, reason="bsdtar (libarchive) not present")

_CODECS = ("store", "deflate", "bzip2", "lzma1", "lzma2", "zstd")


def _author(tmp_path, name, tree, compression="lzma2"):
    """Author a 7z with bsdtar from a dict of relpath -> bytes."""
    src = tmp_path / f"src_{name}"
    for rel, payload in tree.items():
        p = src / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_bytes(payload)
    out = tmp_path / f"{name}.7z"
    subprocess.run(
        [BSDTAR, "-cf", str(out), "--format", "7zip",
         "--options", f"7zip:compression={compression}", "-C", str(src)]
        + sorted(tree),
        check=True, env={"LANG": "C.UTF-8", "LC_ALL": "C.UTF-8",
                         "PATH": "/usr/bin:/bin:/root/miniconda/bin"})
    return out.read_bytes()


_TREE = {
    "a.txt": b"hello seven zip\n",
    "big.bin": bytes(range(256)) * 300,
    "sub/nested.txt": "δοκιμή unicode\n".encode(),
    "empty.txt": b"",
}


@pytest.mark.parametrize("codec", _CODECS)
def test_foreign_archive_byte_exact(tmp_path, codec):
    data = _author(tmp_path, codec, _TREE, compression=codec)
    got = {n: p for n, p, s, m, d in read_7z_members(data) if not d}
    assert got == _TREE


def test_solid_many_files_and_mtime(tmp_path):
    tree = {f"f{i}.txt": (f"file {i} content " * (i + 1)).encode()
            for i in range(40)}
    data = _author(tmp_path, "solid", tree)
    entries = list(read_7z_members(data))
    got = {n: p for n, p, s, m, d in entries if not d}
    assert got == tree
    # bsdtar writes mtimes; every file entry carries one
    assert all(m is not None for n, p, s, m, d in entries if not d)


def test_crc_and_signature_refusals(tmp_path):
    data = _author(tmp_path, "crc", _TREE, compression="store")
    with pytest.raises(UnsupportedMediaError, match="signature"):
        list(read_7z_members(b"NOT7Z!" + data[6:]))
    # flip a payload byte in the stored pack region -> substream CRC
    bad = bytearray(data)
    bad[40] ^= 0xFF
    with pytest.raises(UnsupportedMediaError, match="CRC"):
        list(read_7z_members(bytes(bad)))
    # corrupt the start-header CRC
    bad = bytearray(data)
    bad[8] ^= 0xFF
    with pytest.raises(UnsupportedMediaError, match="CRC"):
        list(read_7z_members(bytes(bad)))
    with pytest.raises(UnsupportedMediaError, match="truncated"):
        list(read_7z_members(data[:40]))


def test_decode_cap(tmp_path):
    data = _author(tmp_path, "cap", {"z.bin": b"\x00" * 200000})
    with pytest.raises(UnsupportedMediaError, match="cap"):
        list(read_7z_members(data, max_total_bytes=1000))


@pytest.mark.slow  # redundancy: the 7z Spark path is exact-hash
# oracle-gated every round via q_7z_scan (check_oracle + the driver
# record); the per-codec container walk is pinned in-default above.
# Only the mixed-directory composition is deferred to the full tier.
def test_spark_mixed_archive_directory(spark, tmp_path):
    """A directory mixing .7z with .zip and .tar.gz explodes through
    one read_archive_members scan (per-file magic dispatch)."""
    import io
    import tarfile
    import zipfile

    from datapump_spark.sources.archives import read_archive_members

    d = tmp_path / "mix"
    d.mkdir()
    (d / "a.7z").write_bytes(_author(tmp_path, "mix7z",
                                     {"seven.txt": b"from 7z"}))
    with zipfile.ZipFile(d / "b.zip", "w") as zf:
        zf.writestr("zipped.txt", b"from zip")
    with tarfile.open(d / "c.tar.gz", "w:gz") as tf:
        info = tarfile.TarInfo("tarred.txt")
        info.size = 8
        tf.addfile(info, io.BytesIO(b"from tar"))
    df = read_archive_members(spark, str(d))
    rows = {r.member_path: bytes(r.member_bytes) for r in df.collect()}
    assert rows == {"seven.txt": b"from 7z", "zipped.txt": b"from zip",
                    "tarred.txt": b"from tar"}
