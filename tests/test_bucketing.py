"""Co-bucketed fact-fact join: the 100 TB upgrade path flagged in PERF.md
for q_star_revenue — writing both fact tables bucketed by the join key
removes the per-query shuffle entirely. This test proves it on the real
plan: the bucketed join has ZERO Exchange operators."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def warehouse(spark, sf_dir, tmp_path_factory):
    wh = tmp_path_factory.mktemp("wh")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    spark.sql("DROP TABLE IF EXISTS orders_b")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet") \
        .select("l_orderkey", "l_extendedprice", "l_discount")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet") \
        .select("o_orderkey", "o_custkey", "o_orderpriority")
    (li.write.mode("overwrite").format("parquet")
       .option("path", str(wh / "lineitem_b"))
       .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
       .saveAsTable("lineitem_b"))
    (orders.write.mode("overwrite").format("parquet")
       .option("path", str(wh / "orders_b"))
       .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
       .saveAsTable("orders_b"))
    yield wh
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    spark.sql("DROP TABLE IF EXISTS orders_b")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, warehouse):
    li = spark.table("lineitem_b")
    orders = spark.table("orders_b")
    joined = li.join(orders, li["l_orderkey"] == orders["o_orderkey"]) \
               .select("l_orderkey", "o_custkey", "l_extendedprice")
    # force a sort-merge join so the bucketing (not a broadcast) carries it
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        joined.collect()
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan       # bucket layout satisfied both sides
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")


def test_unbucketed_join_needs_exchanges(spark, sf_dir):
    """Control: the same join over plain parquet shuffles both sides."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet") \
        .select("l_orderkey", "l_extendedprice")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet") \
        .select("o_orderkey", "o_custkey")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        joined = li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        joined.collect()
        assert "Exchange" in _plan(joined)
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")


def test_bucketed_results_match_unbucketed(spark, warehouse, sf_dir):
    a = (spark.table("lineitem_b")
         .join(spark.table("orders_b"),
               F.col("l_orderkey") == F.col("o_orderkey"))
         .agg(F.count(F.lit(1)).alias("n"),
              F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,6)")), 2)
               .alias("s"))).collect()[0]
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    b = (li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
         .agg(F.count(F.lit(1)).alias("n"),
              F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,6)")), 2)
               .alias("s"))).collect()[0]
    assert (a["n"], a["s"]) == (b["n"], b["s"])
