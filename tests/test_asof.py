"""General as-of join: direction, strictness, tolerance, tie handling."""

from __future__ import annotations

from datetime import datetime

import pytest

from datapump_spark.operators.asof import asof_join


def _ts(s):
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def quotes(spark):
    rows = [
        ("A", _ts("2024-01-01T10:00:00"), 100, 1.0),
        ("A", _ts("2024-01-01T12:00:00"), 101, 2.0),
        # tie at the same ts: max payload struct must win (qid 103)
        ("A", _ts("2024-01-01T12:00:00"), 103, 2.5),
        ("B", _ts("2024-01-01T11:00:00"), 200, 9.0),
    ]
    return spark.createDataFrame(
        rows, "sym string, qts timestamp, qid int, px double")


@pytest.fixture(scope="module")
def trades(spark):
    rows = [
        ("A", _ts("2024-01-01T09:00:00"), 1),   # before any quote
        ("A", _ts("2024-01-01T12:00:00"), 2),   # exactly on the tied quotes
        ("A", _ts("2024-01-01T23:00:00"), 3),   # long after
        ("B", _ts("2024-01-01T11:30:00"), 4),
    ]
    return spark.createDataFrame(rows, "sym string, tts timestamp, tid int")


def _match(df):
    return {r["tid"]: r["qid"] for r in df.collect()}


def test_backward_inclusive(spark, trades, quotes):
    out = asof_join(trades, quotes, "sym", "tts", "qts", ["qid", "px"])
    assert _match(out) == {1: None, 2: 103, 3: 103, 4: 200}


def test_backward_strict_excludes_equal_ts(spark, trades, quotes):
    out = asof_join(trades, quotes, "sym", "tts", "qts", ["qid"],
                    strict=True)
    assert _match(out) == {1: None, 2: 100, 3: 103, 4: 200}


def test_forward_inclusive(spark, trades, quotes):
    out = asof_join(trades, quotes, "sym", "tts", "qts", ["qid"],
                    direction="forward")
    assert _match(out) == {1: 100, 2: 103, 3: None, 4: None}


def test_forward_strict(spark, trades, quotes):
    out = asof_join(trades, quotes, "sym", "tts", "qts", ["qid"],
                    direction="forward", strict=True)
    # trade 2 at 12:00 must skip the equal-ts quotes -> no later quote
    assert _match(out) == {1: 100, 2: None, 3: None, 4: None}


def test_tolerance_nulls_far_matches(spark, trades, quotes):
    out = asof_join(trades, quotes, "sym", "tts", "qts", ["qid"],
                    tolerance="INTERVAL 2 HOUR")
    # trade 3 (23:00) is 11h after the last quote -> nulled
    assert _match(out) == {1: None, 2: 103, 3: None, 4: 200}
    r3 = [r for r in out.collect() if r["tid"] == 3][0]
    assert r3["matched_ts"] is None


def test_left_columns_and_cardinality_preserved(spark, trades, quotes):
    out = asof_join(trades, quotes, "sym", "tts", "qts", ["qid", "px"])
    assert out.count() == trades.count()
    assert set(out.columns) == {"sym", "tts", "tid", "matched_ts", "qid", "px"}


def test_single_shuffle_plan(spark, trades, quotes):
    plan = asof_join(trades, quotes, "sym", "tts", "qts", ["qid"]) \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan  # union-merge, not a join


def test_bad_direction_raises(spark, trades, quotes):
    with pytest.raises(ValueError):
        asof_join(trades, quotes, "sym", "tts", "qts", ["qid"],
                  direction="nearest")
