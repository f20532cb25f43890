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


def test_user_activity_profile(spark):
    import math

    from datapump_spark.operators.events_analytics import (
        user_activity_profile,
    )

    base = 1_700_000_000
    rows = []
    # metronome user: 4 events, exactly 10s apart, one type
    for i in range(4):
        rows.append((1, i, "a", base + 10 * i))
    # bursty user: gaps 1,1,100; two types evenly
    for i, off in enumerate([0, 1, 2, 102]):
        rows.append((2, 10 + i, "a" if i % 2 == 0 else "b", base + off))
    # single-event user: no intervals
    rows.append((3, 99, "a", base))
    df = spark.createDataFrame(rows, "user_id long, event_id long, "
                                     "event_type string, epoch long") \
        .selectExpr("user_id", "event_id", "event_type",
                    "timestamp_seconds(epoch) AS ts")
    got = {r["user_id"]: r for r in user_activity_profile(df).collect()}
    m = got[1]
    assert m["mean_gap_s"] == 10.0 and m["cv_gap"] == 0.0
    assert m["burstiness"] == -1.0          # perfectly periodic
    assert m["type_entropy"] == 0.0 and m["n_types"] == 1
    b = got[2]
    assert b["mean_gap_s"] == 34.0
    assert b["cv_gap"] > 1.0 and b["burstiness"] > 0
    assert b["type_entropy"] == round(math.log(2), 6)  # 2 types, even mix
    s = got[3]
    assert s["n_events"] == 1 and s["mean_gap_s"] is None
    assert s["cv_gap"] is None and s["burstiness"] is None
