"""Incremental aggregate maintenance: merge must be exactly lossless
(state(A ∪ B) == merge(state(A), state(B))), order-independent, and
correct under nulls and disjoint key sets."""

from __future__ import annotations

from datapump_spark.operators.incremental_agg import (
    agg_state, finalize_agg, merge_agg_state)


def _final_rows(state, keys, measures):
    return {tuple(r) for r in finalize_agg(state, keys, measures).collect()}


def _df(spark):
    rows = [
        ("a", 1.25), ("a", 2.75), ("a", None),
        ("b", 10.0), ("b", -4.5),
        ("c", 0.0),
    ]
    return spark.createDataFrame(rows, "k string, v double")


def test_merge_equals_from_scratch(spark):
    df = _df(spark)
    full = agg_state(df, ["k"], ["v"])
    halves = [df.where("v >= 2 OR v IS NULL"), df.where("v < 2")]
    merged = merge_agg_state(
        [agg_state(h, ["k"], ["v"]) for h in halves], ["k"], ["v"])
    assert _final_rows(full, ["k"], ["v"]) == _final_rows(merged, ["k"], ["v"])


def test_merge_order_independent(spark):
    df = _df(spark)
    parts = [df.where(f"abs(hash(k, v)) % 3 = {i} OR (v IS NULL AND {i} = 0)")
             for i in range(3)]
    states = [agg_state(p, ["k"], ["v"]) for p in parts]
    a = merge_agg_state(states, ["k"], ["v"])
    b = merge_agg_state(states[::-1], ["k"], ["v"])
    assert _final_rows(a, ["k"], ["v"]) == _final_rows(b, ["k"], ["v"])


def test_disjoint_keys_pass_through(spark):
    a = spark.createDataFrame([("x", 1.0)], "k string, v double")
    b = spark.createDataFrame([("y", 2.0)], "k string, v double")
    merged = merge_agg_state(
        [agg_state(a, ["k"], ["v"]), agg_state(b, ["k"], ["v"])],
        ["k"], ["v"])
    rows = {r["k"]: (r["n"], r["v_avg"]) for r in
            finalize_agg(merged, ["k"], ["v"]).collect()}
    assert rows == {"x": (1, 1.0), "y": (1, 2.0)}


def test_null_measure_excluded_from_avg(spark):
    df = _df(spark)
    out = {r["k"]: r for r in
           finalize_agg(agg_state(df, ["k"], ["v"]), ["k"], ["v"]).collect()}
    assert out["a"]["n"] == 3           # row count includes the null row
    assert out["a"]["v_avg"] == 2.0     # (1.25 + 2.75) / 2, null excluded
    assert out["b"]["v_min"] == -4.5 and out["b"]["v_max"] == 10.0


def test_merge_is_associative(spark):
    df = _df(spark)
    parts = [df.where(f"abs(hash(k, coalesce(v, -99))) % 3 = {i}")
             for i in range(3)]
    s = [agg_state(p, ["k"], ["v"]) for p in parts]
    left = merge_agg_state(
        [merge_agg_state(s[:2], ["k"], ["v"]), s[2]], ["k"], ["v"])
    right = merge_agg_state(
        [s[0], merge_agg_state(s[1:], ["k"], ["v"])], ["k"], ["v"])
    assert _final_rows(left, ["k"], ["v"]) == _final_rows(right, ["k"], ["v"])
