"""ZIP/TAR archive ingestion gates (sources/archives.py, round 9):
member explode, glob pruning, zip-bomb guard accounting, mixed-format
directories, and the text-corpus handoff."""

from __future__ import annotations

import io
import tarfile
import zipfile

import pytest

from datapump_spark.sources.archives import (
    archive_stats,
    archive_text_documents,
    read_archive_members,
)


def _write_zip(path, members):
    with zipfile.ZipFile(path, "w") as zf:
        for name, data in members.items():
            zf.writestr(zipfile.ZipInfo(name, (2024, 3, 1, 12, 0, 0)), data)


def _write_tar(path, members, mode="w"):
    with tarfile.open(path, mode) as tf:
        for name, data in members.items():
            info = tarfile.TarInfo(name)
            info.size = len(data)
            info.mtime = 1709294400            # 2024-03-01T12:00:00Z
            tf.addfile(info, io.BytesIO(data))


def test_mixed_zip_and_targz_directory(spark, tmp_path):
    d = tmp_path / "arch"
    d.mkdir()
    _write_zip(d / "a.zip", {"x/one.txt": b"hello", "two.bin": b"\x00\x01"})
    _write_tar(d / "b.tar.gz", {"three.txt": b"world"}, mode="w:gz")
    rows = {r["member_path"]: r
            for r in read_archive_members(spark, str(d)).collect()}
    assert set(rows) == {"x/one.txt", "two.bin", "three.txt"}
    assert bytes(rows["x/one.txt"]["member_bytes"]) == b"hello"
    assert bytes(rows["three.txt"]["member_bytes"]) == b"world"
    assert rows["two.bin"]["member_size"] == 2
    assert rows["three.txt"]["mtime"] is not None
    assert rows["three.txt"]["archive_path"].endswith("b.tar.gz")


def test_member_glob_prunes_inside_kernel(spark, tmp_path):
    d = tmp_path / "arch"
    d.mkdir()
    _write_zip(d / "a.zip", {"keep.txt": b"k", "drop.jpg": b"d" * 10})
    out = read_archive_members(spark, str(d),
                               member_glob="*.txt").collect()
    assert [r["member_path"] for r in out] == ["keep.txt"]


def test_zip_bomb_guard_skips_with_accounting(spark, tmp_path):
    d = tmp_path / "arch"
    d.mkdir()
    _write_zip(d / "a.zip", {"small.txt": b"ok", "big.txt": b"x" * 4096})
    members = read_archive_members(spark, str(d), max_member_bytes=100)
    rows = {r["member_path"]: r for r in members.collect()}
    assert bytes(rows["small.txt"]["member_bytes"]) == b"ok"
    assert rows["big.txt"]["member_bytes"] is None      # skipped, not read
    assert rows["big.txt"]["member_size"] == 4096       # size still audited
    st = archive_stats(members).collect()[0]
    assert (st["n_members"], st["n_skipped"]) == (2, 1)
    assert st["total_bytes"] == 4098


def test_corrupt_archive_null_vs_raise(spark, tmp_path):
    d = tmp_path / "arch"
    d.mkdir()
    (d / "junk.zip").write_bytes(b"PK\x03\x04 not really a zip file")
    rows = read_archive_members(spark, str(d)).collect()
    assert len(rows) == 1 and rows[0]["member_path"] is None
    with pytest.raises(Exception):
        read_archive_members(spark, str(d), on_error="raise").collect()


def test_archive_text_documents_handoff(spark, tmp_path):
    d = tmp_path / "arch"
    d.mkdir()
    _write_zip(d / "shard1.zip",
               {"a.txt": b"alpha doc", "skip.bin": b"\x00"})
    _write_tar(d / "shard2.tar", {"b.txt": "café doc".encode()})
    docs = archive_text_documents(spark, str(d)).collect()
    by_member = {r["member_path"]: r for r in docs}
    assert set(by_member) == {"a.txt", "b.txt"}
    assert by_member["a.txt"]["source"] == "shard1.zip"
    assert by_member["b.txt"]["text"] == "café doc"
    assert all(r["doc_id"] >= 0 for r in docs)
    # deterministic ids: re-reading yields the same doc_id per member
    again = {r["member_path"]: r["doc_id"]
             for r in archive_text_documents(spark, str(d)).collect()}
    assert {m: r["doc_id"] for m, r in by_member.items()} == again


def test_tar_compressed_variants(spark, tmp_path):
    """r12: .tar.{zst,lz4,Z,lzma} shards explode like .tar.gz — one
    mixed-directory scan witnesses all four dispatches. zstd/lz4 are
    FOREIGN reference bytes (pyarrow's bundled codecs), .Z is foreign
    bsdtar/libarchive compress output through the pure-Python LZW
    decoder, .lzma is stdlib LZMA_ALONE (extension-dispatched)."""
    import lzma
    import shutil
    import subprocess

    import pyarrow as pa

    bsdtar = shutil.which("bsdtar")
    d = tmp_path / "arch"
    d.mkdir()
    _write_tar(tmp_path / "a.tar", {"zs/one.txt": b"zstd payload"})
    (d / "a.tar.zst").write_bytes(pa.Codec("zstd").compress(
        (tmp_path / "a.tar").read_bytes(), asbytes=True))
    _write_tar(tmp_path / "b.tar", {"l4/two.txt": b"lz4 payload"})
    (d / "b.tar.lz4").write_bytes(pa.Codec("lz4").compress(
        (tmp_path / "b.tar").read_bytes(), asbytes=True))
    (d / "b.tar.lzma").write_bytes(lzma.compress(
        (tmp_path / "b.tar").read_bytes(), format=lzma.FORMAT_ALONE))
    if bsdtar:
        (tmp_path / "one.txt").write_bytes(b"compress payload")
        subprocess.run(
            [bsdtar, "-cZf", str(d / "c.tar.Z"), "-C", str(tmp_path),
             "one.txt"], check=True)
    df = read_archive_members(spark, str(d))
    rows = {}
    for r in df.collect():
        rows.setdefault(r.member_path, bytes(r.member_bytes))
    assert rows["zs/one.txt"] == b"zstd payload"
    assert rows["l4/two.txt"] == b"lz4 payload"  # via .lz4 AND .lzma
    if bsdtar:
        assert rows["one.txt"] == b"compress payload"
