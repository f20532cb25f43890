"""WARC/WET source: exact Content-Length framing, the codegen WET fast
path, gzip member handling, and the two readers agreeing byte-for-byte.

Fixtures: tests/data/warc/* (checked in; scripts/gen_warc_fixture.py)."""

from __future__ import annotations

from pathlib import Path

import pytest

from datapump_spark.sources.warc import read_warc, read_wet, read_wet_stream

WARC_DIR = str(Path(__file__).resolve().parent / "data" / "warc")
SHARDS = f"{WARC_DIR}/sample_0*.warc"


def test_exact_scan_record_inventory(spark):
    w = read_warc(spark, SHARDS)
    by_type = {r["warc_type"]: r["count"]
               for r in w.groupBy("warc_type").count().collect()}
    # 2 shards x (1 warcinfo + 12/17 conversions)
    assert by_type == {"warcinfo": 2, "conversion": 29}
    row = w.where("warc_type = 'warcinfo'").orderBy("warc_file").first()
    assert row["target_uri"] is None          # absent header -> NULL
    assert row["content_length"] == len(bytes(row["payload"]))
    assert row["warc_date"].isoformat() == "2024-03-01T00:00:00"


def test_wet_fast_path_matches_exact_reader(spark):
    """The splittable codegen path must reproduce the Content-Length-
    framed payloads bit-exactly — including multibyte UTF-8, where a
    char-counted substring would slice wrong."""
    exact = {
        r["target_uri"]: bytes(r["payload"]).decode("utf-8")
        for r in read_warc(spark, SHARDS)
                 .where("warc_type = 'conversion'").collect()
    }
    wet = {r["target_uri"]: r["text"]
           for r in read_wet(spark, SHARDS).collect()}
    assert wet == exact
    assert any(ord(c) > 127 for t in wet.values() for c in t)


def test_wet_path_is_pure_codegen(spark):
    # the suite session disables wholeStage codegen (tiny-job Janino
    # compile tax, see conftest); force it on for this plan assertion
    prior = spark.conf.get("spark.sql.codegen.wholeStage")
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
    try:
        plan = (read_wet(spark, SHARDS)._jdf.queryExecution()
                .executedPlan().toString())
    finally:
        spark.conf.set("spark.sql.codegen.wholeStage", prior)
    assert "mapInPandas" not in plan and "PythonUDF" not in plan
    assert plan.startswith("*(1)")        # one codegen'd stage, scan to output


def test_gzip_members_match_uncompressed_twin(spark):
    """sample.warc.gz is sample_00.warc re-packed one gzip member per
    record — the real .warc.gz layout; decompression must walk every
    member, not stop after the first."""
    gz = read_warc(spark, f"{WARC_DIR}/sample.warc.gz")
    plain = read_warc(spark, f"{WARC_DIR}/sample_00.warc")
    key = ["record_id", "content_length"]
    assert sorted(map(tuple, gz.select(*key).collect())) == \
           sorted(map(tuple, plain.select(*key).collect()))
    g0, p0 = (df.orderBy("record_offset").first()["payload"]
              for df in (gz, plain))
    assert bytes(g0) == bytes(p0)


def test_payload_containing_boundary_is_framed_by_content_length(spark):
    """tricky.warc embeds the record-boundary byte sequence INSIDE a
    response payload; Content-Length framing must not split there."""
    rows = read_warc(spark, f"{WARC_DIR}/tricky.warc") \
        .orderBy("record_offset").collect()
    assert [r["warc_type"] for r in rows] == ["response", "conversion"]
    evil = bytes(rows[0]["payload"])
    assert b"\r\n\r\nWARC/1.0\r\n" in evil         # the bait survived intact
    assert len(evil) == rows[0]["content_length"]
    assert rows[1]["target_uri"] == "https://example.org/after-tricky"


def test_truncated_record_raises_not_drops(spark, tmp_path):
    src = Path(WARC_DIR, "sample_00.warc").read_bytes()
    bad = tmp_path / "cut.warc"
    bad.write_bytes(src[: len(src) - 40])          # cut mid-payload
    with pytest.raises(Exception, match="truncated record"):
        read_warc(spark, str(bad)).count()


# slow: the shared _wet_transform is oracle-gated via q_wet_text and
# read_wet_stream is exercised in-default by the WET drop-box corpus
# test (test_streaming_corpus); this adds only the sink-level
# stream≡batch identity
@pytest.mark.slow
def test_wet_stream_matches_batch_reader(spark, tmp_path):
    """read_wet_stream over a drop-box of WET shards (AvailableNow drain)
    must produce exactly the batch read_wet rows — same transform, same
    framing, per-file micro-batches."""
    import shutil

    drop = tmp_path / "drop"
    drop.mkdir()
    for shard in sorted(Path(WARC_DIR).glob("sample_0*.warc")):
        shutil.copy(shard, drop / shard.name)

    stream = read_wet_stream(spark, str(drop))
    assert stream.isStreaming
    out = tmp_path / "out"
    (stream.writeStream
           .format("parquet")
           .option("path", str(out))
           .option("checkpointLocation", str(tmp_path / "cp"))
           .trigger(availableNow=True)
           .start()
           .awaitTermination(120))

    got = {r["target_uri"]: (r["text"], r["content_length"])
           for r in spark.read.parquet(str(out)).collect()}
    want = {r["target_uri"]: (r["text"], r["content_length"])
            for r in read_wet(spark, SHARDS).collect()}
    assert got == want and len(got) == 29


def _response_record(uri, html):
    body = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
            + html.encode("utf-8"))
    return (b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            + f"WARC-Target-URI: {uri}\r\n".encode()
            + b"WARC-Date: 2024-03-01T00:00:00Z\r\n"
            + f"Content-Length: {len(body)}\r\n".encode()
            + b"\r\n" + body + b"\r\n\r\n")


def test_warc_html_crawl_to_corpus(spark, tmp_path):
    """Raw HTTP captures -> HTTP header strip -> block-scored main
    content: nav/footer boilerplate dropped, prose kept, header-less or
    prose-free responses absent from the output."""
    page = ('<html><body><div><a href="/">Home</a> <a href="/a">About</a>'
            '</div><p>Ce renard brun rapide saute par-dessus le chien '
            'paresseux chaque matin, naturellement.</p>'
            '<div><a href="/p">Privacy</a></div></body></html>')
    linkfarm = ('<html><body><div><a href="/1">One</a> <a href="/2">Two</a>'
                ' <a href="/3">Three</a></div></body></html>')
    p = tmp_path / "crawl.warc"
    p.write_bytes(_response_record("https://x.example/article", page)
                  + _response_record("https://x.example/links", linkfarm))

    from datapump_spark.sources.warc import read_warc_html

    rows = read_warc_html(spark, str(p)).collect()
    assert [r["target_uri"] for r in rows] == ["https://x.example/article"]
    r = rows[0]
    assert r["main_text"].startswith("Ce renard brun rapide")  # UTF-8 intact
    assert "Home" not in r["main_text"] and "Privacy" not in r["main_text"]
    assert r["n_blocks"] == 3 and r["n_kept"] == 1
