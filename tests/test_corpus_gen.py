"""Custom Python Data Source: deterministic synthetic corpus generator."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datapump_spark.sources.corpus_gen import register


@pytest.fixture(scope="module")
def gen(spark):
    register(spark)
    return spark


def _read(spark, **opts):
    r = spark.read.format("corpus_gen")
    for k, v in opts.items():
        r = r.option(k, str(v))
    return r.load()


@pytest.mark.slow
def test_row_count_and_schema(gen):
    df = _read(gen, rows=500, partitions=4)
    assert df.count() == 500
    assert df.columns == ["doc_id", "text", "lang", "source", "n_chars"]
    row = df.where(F.col("doc_id") == 7).first()
    assert row["n_chars"] == len(row["text"])


def test_partition_count_independence(gen):
    # same rows/seed, different parallelism -> identical content
    a = sorted(tuple(r) for r in _read(gen, rows=300, partitions=2).collect())
    b = sorted(tuple(r) for r in _read(gen, rows=300, partitions=7).collect())
    assert a == b


def test_seed_changes_content(gen):
    a = _read(gen, rows=100, seed=1).agg(F.sum("n_chars")).first()[0]
    b = _read(gen, rows=100, seed=2).agg(F.sum("n_chars")).first()[0]
    assert a != b


def test_dup_frac_produces_near_duplicates(gen):
    from datapump_spark.operators.dedup_fuzzy import exact_dedup
    from datapump_spark.operators.line_dedup import dup_passages

    df = _read(gen, rows=400, dup_frac=0.3)
    # ~30% of rows are copies; each word perturbs w.p. 0.05, so only
    # ~0.95^len survive as EXACT dups — the rest are near-dups that the
    # rolling-window detector must see
    n_exact = 400 - exact_dedup(df, id_col="doc_id", text_col="text").count()
    assert 4 <= n_exact <= 60
    near = dup_passages(df, n=10, threshold=0.3)
    n_near = near.where("near_dup").count()
    assert n_near >= 100  # dup draws ≈ 120, nearly all share passages


def test_zero_dup_frac_all_unique(gen):
    df = _read(gen, rows=200, dup_frac=0.0)
    assert df.select("text").distinct().count() == 200


def test_composes_with_operators(gen):
    from datapump_spark.operators.text import token_entropy

    df = _read(gen, rows=120, partitions=3)
    out = token_entropy(df)
    assert out.count() == 120
    assert out.where(F.col("entropy") <= 0).count() < 120
