"""Salted-aggregation / salted-join correctness: results must equal the
plain formulations exactly on skewed data (one key = 90% of rows)."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datapump_spark.operators.skew import salted_agg, salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # key 0 gets 9000 rows, keys 1-9 get 100 each
    hot = spark.range(9000).select(
        F.lit(0).alias("k"), (F.col("id") % 97).cast("double").alias("v"))
    cold = spark.range(900).select(
        (F.col("id") % 9 + 1).alias("k"), (F.col("id") % 11).cast("double").alias("v"))
    return hot.unionByName(cold)


def test_salted_agg_matches_plain(spark, skewed):
    plain = {r["k"]: (r["n"], r["s"]) for r in
             skewed.groupBy("k").agg(
                 F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")).collect()}
    salted = {r["k"]: (r["n"], r["sum_value"]) for r in
              salted_agg(skewed, ["k"], "v", n_salts=8).collect()}
    assert salted == plain


def test_salted_agg_spreads_hot_key(spark, skewed):
    from datapump_spark.operators.skew import _salt

    n_distinct = (
        skewed.where(F.col("k") == 0)
        .select(_salt(["v"], 8).alias("s")).distinct().count()
    )
    assert n_distinct == 8      # hot key really fans out across all salts


def test_salted_join_matches_plain(spark, skewed):
    dim = spark.range(10).select(
        F.col("id").alias("dk"), F.concat(F.lit("name-"), F.col("id")).alias("dname"))
    plain = (
        skewed.join(dim, skewed["k"] == dim["dk"])
        .groupBy("k").agg(F.count(F.lit(1)).alias("n"))
    )
    salted = (
        salted_join(skewed, dim, "k", "dk", n_salts=8)
        .groupBy("k").agg(F.count(F.lit(1)).alias("n"))
    )
    assert {(r["k"], r["n"]) for r in plain.collect()} == \
           {(r["k"], r["n"]) for r in salted.collect()}


def test_salted_agg_null_values_match_plain_avg(spark):
    df = spark.createDataFrame(
        [(0, 10.0), (0, None), (1, None), (1, None)], "k bigint, v double")
    got = {r["k"]: (r["n"], r["sum_value"], r["avg_value"])
           for r in salted_agg(df, ["k"], "v", n_salts=4).collect()}
    # avg ignores nulls like F.avg; all-null key has NULL avg, not 0/2
    assert got[0] == (2, 10.0, 10.0)
    assert got[1] == (2, None, None)
