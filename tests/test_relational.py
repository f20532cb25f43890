"""Edge-case tests for the relational extension queries (the sf0.01 oracle
gate covers the bulk data path; these pin the tricky semantics on
hand-built rows)."""
from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F


def _asof(spark, events, orders):
    """Tiny driver around the q_asof_join plan shape (union + window)."""
    from pyspark.sql import Window

    ev = spark.createDataFrame(
        events, "user_id bigint, ts timestamp, event_id bigint"
    ).select("user_id", "ts", "event_id",
             F.lit(None).cast("bigint").alias("o_orderkey"),
             F.lit(1).alias("is_event"))
    od = spark.createDataFrame(
        orders, "user_id bigint, ts timestamp, o_orderkey bigint"
    ).select("user_id", "ts",
             F.lit(None).cast("bigint").alias("event_id"),
             "o_orderkey", F.lit(0).alias("is_event"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_event", F.coalesce("o_orderkey", F.lit(-1)))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    rows = (
        ev.unionByName(od)
        .withColumn("asof", F.last("o_orderkey", ignorenulls=True).over(w))
        .where(F.col("is_event") == 1)
        .select("event_id", "asof")
        .collect()
    )
    return {r["event_id"]: r["asof"] for r in rows}


def test_asof_join_edges(spark):
    t = datetime
    got = _asof(
        spark,
        events=[
            (1, t(2024, 1, 1, 0), 100),   # before any order → NULL
            (1, t(2024, 1, 2, 0), 101),   # exactly at order ts → inclusive
            (1, t(2024, 1, 5, 0), 102),   # between orders → earlier one
            (1, t(2024, 1, 9, 0), 103),   # after tie → max orderkey wins
            (2, t(2024, 1, 1, 0), 200),   # user with no orders at all
        ],
        orders=[
            (1, t(2024, 1, 2, 0), 10),
            (1, t(2024, 1, 4, 0), 11),
            (1, t(2024, 1, 8, 0), 12),    # tie on ts with 13
            (1, t(2024, 1, 8, 0), 13),
        ],
    )
    assert got == {100: None, 101: 10, 102: 11, 103: 13, 200: None}


def test_hash_sample_deterministic(spark, sf_dir):
    from datapump_spark.queries import q_hash_sample

    a = {r["event_id"] for r in q_hash_sample(spark, sf_dir).collect()}
    b = {r["event_id"] for r in q_hash_sample(spark, sf_dir).collect()}
    assert a == b and len(a) > 0


def test_set_ops_disjoint_from_urgent(spark, sf_dir):
    from datapump_spark.queries import q_set_ops

    keys = {r["custkey"] for r in q_set_ops(spark, sf_dir).collect()}
    urgent = {
        r["o_custkey"]
        for r in spark.read.parquet(f"{sf_dir}/orders.parquet")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey").distinct().collect()
    }
    assert keys and not (keys & urgent)
