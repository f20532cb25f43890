"""Semantics of operators/diff.py and equidepth_histogram on crafted
inputs. Oracle equivalence runs in test_extra_oracles.py (q_table_diff,
q_equidepth)."""

from __future__ import annotations

import pytest

from datapump_spark.operators.diff import table_diff
from datapump_spark.operators.sketches import equidepth_histogram


def test_table_diff_classifies(spark):
    left = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", None), (4, "d", 4.0)],
        "k long, s string, v double")
    right = spark.createDataFrame(
        [(1, "a", 1.0),          # identical → absent from output
         (2, "B", 2.5),          # two columns changed
         (3, "c", None),         # null == null (null-safe) → identical
         (5, "e", 5.0)],         # added
        "k long, s string, v double")
    got = {r["k"]: r for r in table_diff(left, right, ["k"]).collect()}
    assert set(got) == {2, 4, 5}
    assert got[2]["change_type"] == "changed"
    assert got[2]["changed_cols"] == "s,v"
    assert got[4]["change_type"] == "removed" and got[4]["changed_cols"] == ""
    assert got[5]["change_type"] == "added"


def test_table_diff_null_transitions_detected(spark):
    left = spark.createDataFrame([(1, None)], "k long, v double")
    right = spark.createDataFrame([(1, 3.0)], "k long, v double")
    got = table_diff(left, right, ["k"]).collect()
    assert len(got) == 1 and got[0]["changed_cols"] == "v"


def test_equidepth_buckets(spark):
    df = spark.createDataFrame(
        [(float(i),) for i in range(100)], "v double")
    rows = {r["bucket"]: r for r in
            equidepth_histogram(df, "v", n_buckets=4).collect()}
    assert sorted(rows) == [0, 1, 2, 3]
    assert sum(r["n"] for r in rows.values()) == 100
    # near-equal depths on a uniform column
    assert all(20 <= r["n"] <= 30 for r in rows.values())
    # buckets tile the range in order
    assert rows[0]["lo"] == 0.0 and rows[3]["hi"] == 99.0
    assert rows[0]["hi"] < rows[1]["lo"] < rows[2]["lo"] < rows[3]["lo"]


def test_equidepth_heavy_ties(spark):
    # one dominant value: ties land in ONE bucket, others still tile
    df = spark.createDataFrame(
        [(5.0,)] * 80 + [(float(i),) for i in range(10)], "v double")
    rows = equidepth_histogram(df, "v", n_buckets=4).collect()
    assert sum(r["n"] for r in rows) == 90
    tied = [r for r in rows if r["lo"] <= 5.0 <= r["hi"] and r["n"] >= 80]
    assert tied, "the tied mass must sit in a single bucket"


def test_equidepth_rejects_one_bucket(spark):
    df = spark.createDataFrame([(1.0,)], "v double")
    with pytest.raises(ValueError):
        equidepth_histogram(df, "v", n_buckets=1)
