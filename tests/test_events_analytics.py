"""Semantics of operators/events_analytics.py on crafted event logs.
Oracle equivalence runs in test_extra_oracles.py (q_funnel,
q_retention, q_outliers)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datapump_spark.operators.events_analytics import funnel, outliers, retention


def _events(spark, rows):
    return spark.createDataFrame(
        [(i, u, t, ty, float(v)) for i, (u, t, ty, v) in enumerate(rows)],
        "event_id long, user_id long, ts string, event_type string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))


def test_funnel_requires_strict_order(spark):
    ev = _events(spark, [
        # user 1 completes A→B→C in order
        (1, "2024-01-01 00:00:00", "A", 0),
        (1, "2024-01-02 00:00:00", "B", 0),
        (1, "2024-01-03 00:00:00", "C", 0),
        # user 2 does B BEFORE A — must not count past step A
        (2, "2024-01-02 00:00:00", "B", 0),
        (2, "2024-01-03 00:00:00", "A", 0),
        # user 3 only A, B (no C)
        (3, "2024-01-01 00:00:00", "A", 0),
        (3, "2024-01-01 00:00:01", "B", 0),
        # user 4 never enters the funnel
        (4, "2024-01-01 00:00:00", "C", 0),
    ])
    got = {r["step"]: r for r in funnel(ev, ["A", "B", "C"]).collect()}
    assert got["A"]["n_users"] == 3
    assert got["B"]["n_users"] == 2          # users 1 and 3
    assert got["C"]["n_users"] == 1          # user 1 only
    assert got["C"]["pct_of_first"] == pytest.approx(1 / 3, abs=1e-6)


def test_funnel_same_timestamp_not_counted(spark):
    # step 2 at the SAME instant as step 1 is not "after"
    ev = _events(spark, [
        (1, "2024-01-01 00:00:00", "A", 0),
        (1, "2024-01-01 00:00:00", "B", 0),
    ])
    got = {r["step"]: r["n_users"] for r in funnel(ev, ["A", "B"]).collect()}
    assert got == {"A": 1, "B": 0}


def test_retention_cohorts(spark):
    ev = _events(spark, [
        # user 1: first week W0 (Mon 2024-01-01), active W0 and W2
        (1, "2024-01-02 00:00:00", "x", 0),
        (1, "2024-01-16 00:00:00", "x", 0),
        # user 2: same cohort, only W0
        (2, "2024-01-03 00:00:00", "x", 0),
        # user 3: cohort W1, active W1 and W2
        (3, "2024-01-08 00:00:00", "x", 0),
        (3, "2024-01-15 00:00:00", "x", 0),
    ])
    got = {(r["cohort_week"].strftime("%m-%d"), r["week_offset"]):
           (r["n_users"], r["pct"]) for r in retention(ev).collect()}
    assert got[("01-01", 0)] == (2, 1.0)
    assert got[("01-01", 2)] == (1, 0.5)
    assert got[("01-08", 0)] == (1, 1.0)
    assert got[("01-08", 1)] == (1, 1.0)
    assert ("01-01", 1) not in got           # nobody from W0 active in W1


def test_outliers_flags_extremes_only(spark):
    vals = [10.0] * 20 + [11.0] * 20 + [1000.0]
    ev = _events(spark, [
        (u, "2024-01-01 00:00:00", "t", v) for u, v in enumerate(vals)])
    got = outliers(ev, ["event_type"], z_threshold=3.0).collect()
    assert len(got) == 1 and got[0]["value"] == 1000.0 and got[0]["z"] > 3
    # constant group: sd = 0 → no division, no rows
    const = _events(spark, [
        (u, "2024-01-01 00:00:00", "c", 5.0) for u in range(5)])
    assert outliers(const, ["event_type"]).count() == 0


def test_funnel_rejects_single_step(spark):
    ev = _events(spark, [(1, "2024-01-01 00:00:00", "A", 0)])
    with pytest.raises(ValueError):
        funnel(ev, ["A"])
