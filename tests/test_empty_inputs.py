"""Empty-corpus robustness: every driver-gated query must behave
CLEANLY on zero-row tables with the production schemas — either return
(possibly zero rows, schema intact) or raise an intentional, typed
error (ValueError/RuntimeError with a message). Opaque crashes
(IndexError from a bare collect()[0], numpy shape errors from an empty
kernel batch, ...) are the failure mode this gate exists to catch: at
100 TB an empty partition/day/source WILL happen.

Slow set: ~50 plans over empty data is minutes of planning time; the
contract is structural, not data-dependent, so per-round coverage via
the slow pass suffices.
"""

from __future__ import annotations

import pytest

from datapump_spark.queries import QUERIES

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def empty_sf_dir(spark, sf_dir, tmp_path_factory):
    # single-FILE parquet per table, like the driver's testdata layout
    # (a Spark-written directory would break the DuckDB fixture reads)
    import pyarrow.parquet as pq

    out = tmp_path_factory.mktemp("sf_empty")
    for t in TABLES:
        schema = pq.read_schema(f"{sf_dir}/{t}.parquet")
        pq.write_table(schema.empty_table(), str(out / f"{t}.parquet"))
    return str(out)


@pytest.mark.slow
@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_handles_empty_corpus(name, spark, empty_sf_dir):
    try:
        rows = QUERIES[name](spark, empty_sf_dir).collect()
    except (ValueError, RuntimeError) as exc:
        # intentional, typed refusal is acceptable — but it must carry
        # a real message, not an empty repr
        assert str(exc), f"{name}: empty error message"
        return
    assert isinstance(rows, list)


@pytest.mark.slow
@pytest.mark.parametrize("name", sorted(
    set(__import__("datapump_spark.queries", fromlist=["EXTRA_QUERIES"])
        .EXTRA_QUERIES) |
    set(__import__("datapump_spark.queries", fromlist=["BENCH_VARIANTS"])
        .BENCH_VARIANTS)))
def test_extended_query_handles_empty_corpus(name, spark, empty_sf_dir):
    from datapump_spark.queries import BENCH_VARIANTS, EXTRA_QUERIES

    fn = {**EXTRA_QUERIES, **BENCH_VARIANTS}[name]
    try:
        rows = fn(spark, empty_sf_dir).collect()
    except (ValueError, RuntimeError) as exc:
        assert str(exc), f"{name}: empty error message"
        return
    assert isinstance(rows, list)
