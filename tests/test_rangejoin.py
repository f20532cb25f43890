"""Range/band join: broadcast path vs stride-bucketed path must agree
exactly, and the broadcast path must not shuffle the fact side."""

from __future__ import annotations

import pytest

from datapump_spark.operators.rangejoin import band_join, stride_interval_join


@pytest.fixture(scope="module")
def bands(spark):
    return spark.createDataFrame(
        [("a", 0.0, 10.0), ("b", 10.0, 25.0), ("c", 25.0, 100.0)],
        "band string, lo double, hi double")


@pytest.fixture(scope="module")
def facts(spark):
    # deterministic pseudo-random values spanning all bands + out-of-band
    return spark.range(500).selectExpr(
        "id", "CAST((id * 37 % 113) AS DOUBLE) AS v")


def test_band_assignment_matches_python(spark, bands, facts):
    rows = band_join(facts, bands, "v").select("id", "band").collect()
    got = {(r["id"], r["band"]) for r in rows}
    exp = set()
    for i in range(500):
        v = float(i * 37 % 113)
        for band, lo, hi in [("a", 0, 10), ("b", 10, 25), ("c", 25, 100)]:
            if lo <= v < hi:
                exp.add((i, band))
    assert got == exp


def test_left_outer_keeps_out_of_band(spark, bands, facts):
    out = band_join(facts, bands, "v", how="left_outer")
    assert out.count() == 500  # non-overlapping bands preserve cardinality
    unmatched = out.where("band IS NULL").count()
    assert unmatched == sum(1 for i in range(500) if (i * 37 % 113) >= 100)


def test_band_join_broadcasts(spark, bands, facts):
    plan = band_join(facts, bands, "v")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan
    assert "Exchange hashpartitioning" not in plan  # fact side never shuffles


@pytest.mark.parametrize("stride", [1.0, 7.0, 40.0, 200.0])
def test_stride_join_equals_broadcast_join(spark, bands, facts, stride):
    a = {tuple(r) for r in band_join(facts, bands, "v")
         .select("id", "band").collect()}
    b = {tuple(r) for r in stride_interval_join(facts, bands, "v", stride=stride)
         .select("id", "band").collect()}
    assert a == b


def test_stride_join_overlapping_intervals(spark):
    """Overlapping intervals multiply rows — both paths must agree."""
    iv = spark.createDataFrame(
        [("x", 0.0, 50.0), ("y", 25.0, 75.0)], "tag string, lo double, hi double")
    facts = spark.range(100).selectExpr("id", "CAST(id AS DOUBLE) AS v")
    a = {tuple(r) for r in band_join(facts, iv, "v").select("id", "tag").collect()}
    b = {tuple(r) for r in stride_interval_join(facts, iv, "v", stride=10.0)
         .select("id", "tag").collect()}
    assert a == b
    assert sum(1 for _, t in a if t == "x") == 50
    assert sum(1 for _, t in a if t == "y") == 50
