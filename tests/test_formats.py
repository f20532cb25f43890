"""sources/formats.py: cross-format round-trips + ORC scan pushdown."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def sample(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/orders.parquet") \
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")


@pytest.mark.parametrize("fmt", ["parquet", "orc", "csv", "json"])
def test_round_trip(spark, sample, tmp_path, fmt):
    from datapump_spark.sources.formats import read_table, write_table

    path = str(tmp_path / fmt)
    write_table(sample, path, fmt)
    schema = ("o_orderkey bigint, o_custkey bigint, "
              "o_totalprice double, o_orderstatus string")
    back = read_table(spark, path, fmt,
                      schema=schema if fmt in ("csv", "json") else None)
    assert back.schema == sample.schema
    a = {tuple(r) for r in back.collect()}
    b = {tuple(r) for r in sample.collect()}
    assert a == b


def test_text_requires_schema(spark, tmp_path):
    from datapump_spark.sources.formats import read_table

    with pytest.raises(ValueError, match="schema"):
        read_table(spark, str(tmp_path), "csv")
    with pytest.raises(ValueError, match="unsupported"):
        read_table(spark, str(tmp_path), "avro")


def test_orc_pushdown_and_pruning(spark, sample, tmp_path):
    """ORC gets the same scan-planner treatment as parquet: the filter
    and the 2-column projection must reach the file scan."""
    from datapump_spark.sources.formats import read_table, write_table

    path = str(tmp_path / "orc")
    write_table(sample, path, "orc")
    q = read_table(spark, path, "orc") \
        .where(F.col("o_orderkey") < 100).select("o_orderkey", "o_totalprice")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(o_orderkey), LessThan(o_orderkey,100)]" \
        in plan.replace("\n", " ")
    assert "o_custkey" not in plan.split("ReadSchema")[1][:200]
