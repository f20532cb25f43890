"""JSONL source/sink: inference vs explicit schema, quarantine, round-trip."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datapump_spark.queries import JSONL_GLOB
from datapump_spark.sources.jsonl import (
    CORRUPT_COL,
    quarantine_split,
    read_jsonl,
    write_jsonl,
)

DDL = ("doc_id bigint, text string, lang string, source string, "
       "n_chars bigint, meta struct<crawl:string, quality:double>, "
       "tags array<string>")


def test_explicit_schema_matches_inference(spark):
    inferred = read_jsonl(spark, JSONL_GLOB)
    explicit = read_jsonl(spark, JSONL_GLOB, schema=DDL)
    assert inferred.count() == explicit.count() == 500
    a = {tuple(r) for r in inferred.select("doc_id", "lang", "n_chars").collect()}
    b = {tuple(r) for r in explicit.select("doc_id", "lang", "n_chars").collect()}
    assert a == b
    # sparse fields surface as nulls, not errors
    assert explicit.where(F.col("lang").isNull()).count() > 0
    assert explicit.where(F.col("meta").isNull()).count() > 0


def test_quarantine_split(spark, tmp_path):
    p = tmp_path / "bad.jsonl"
    p.write_text('{"doc_id": 1, "text": "ok"}\n'
                 'this is not json\n'
                 '{"doc_id": 2, "text": "also ok"}\n'
                 '{"doc_id": 3 "text": "missing comma"}\n')
    scan = read_jsonl(spark, str(p), schema="doc_id bigint, text string",
                      keep_corrupt=True)
    good, bad = quarantine_split(scan)
    assert sorted(r.doc_id for r in good.collect()) == [1, 2]
    quarantined = [r[CORRUPT_COL] for r in bad.collect()]
    assert sorted(quarantined) == ["this is not json",
                                   '{"doc_id": 3 "text": "missing comma"}']


def test_quarantine_requires_corrupt_scan(spark):
    df = read_jsonl(spark, JSONL_GLOB, schema=DDL)
    with pytest.raises(ValueError):
        quarantine_split(df)


def test_roundtrip(spark, tmp_path):
    src = read_jsonl(spark, JSONL_GLOB, schema=DDL)
    out = str(tmp_path / "out")
    write_jsonl(src.repartition(4), out, max_records_per_file=100)
    back = read_jsonl(spark, out, schema=DDL)
    cols = ["doc_id", "text", "lang", "source", "n_chars"]
    assert ({tuple(r) for r in back.select(cols).collect()}
            == {tuple(r) for r in src.select(cols).collect()})
    # nested struct survives; null fields were elided on write, not corrupted
    q = {r.doc_id: r.quality
         for r in back.select("doc_id", F.col("meta.quality").alias("quality")).collect()}
    assert q[13] is None and isinstance(q[1], float)
