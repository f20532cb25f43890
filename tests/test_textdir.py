"""Text-directory source: whole-file vs per-line, glob, recursion, gzip."""

from __future__ import annotations

import gzip

from datapump_spark.sources.jsonl import read_jsonl
from datapump_spark.sources.textdir import read_text_dir


def _mk_tree(tmp_path):
    (tmp_path / "a.txt").write_text("alpha one\nalpha two\n")
    (tmp_path / "b.txt").write_text("beta\n")
    (tmp_path / "skip.md").write_text("not a txt\n")
    sub = tmp_path / "sub"
    sub.mkdir()
    (sub / "c.txt").write_text("gamma\n")
    return tmp_path


def test_whole_files(spark, tmp_path):
    root = _mk_tree(tmp_path)
    rows = {r.file_name: r for r in read_text_dir(spark, str(root)).collect()}
    assert set(rows) == {"a.txt", "b.txt", "c.txt"}  # glob + recursion
    assert rows["a.txt"].text == "alpha one\nalpha two\n"
    assert rows["a.txt"].size_bytes == 20
    assert rows["a.txt"].doc_path.endswith("/a.txt")
    assert rows["a.txt"].mtime is not None


def test_no_recursion(spark, tmp_path):
    root = _mk_tree(tmp_path)
    names = {r.file_name
             for r in read_text_dir(spark, str(root), recursive=False).collect()}
    assert names == {"a.txt", "b.txt"}


def test_per_line(spark, tmp_path):
    root = _mk_tree(tmp_path)
    df = read_text_dir(spark, str(root), whole_files=False)
    lines = sorted(r.text for r in df.collect())
    assert lines == ["alpha one", "alpha two", "beta", "gamma"]


def test_gzipped_jsonl_reads_transparently(spark, tmp_path):
    p = tmp_path / "docs.jsonl.gz"
    with gzip.open(p, "wt") as f:
        f.write('{"doc_id": 1, "text": "a"}\n{"doc_id": 2, "text": "b"}\n')
    df = read_jsonl(spark, str(p), schema="doc_id bigint, text string")
    assert sorted(r.doc_id for r in df.collect()) == [1, 2]
