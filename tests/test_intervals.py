"""State-interval (gaps-and-islands / SCD2) operator tests."""

from __future__ import annotations

from datetime import datetime

from datapump_spark.operators.intervals import snapshot_at, state_intervals


def _ts(s):
    return datetime.fromisoformat(s)


def _df(spark):
    rows = [
        # key A: on, on, off, on  -> 3 islands
        ("A", _ts("2024-01-01T00:00:00"), "on", 1),
        ("A", _ts("2024-01-01T01:00:00"), "on", 2),
        ("A", _ts("2024-01-01T02:00:00"), "off", 3),
        ("A", _ts("2024-01-01T03:00:00"), "on", 4),
        # key B: single state, ts collision resolved by id tiebreak
        ("B", _ts("2024-01-01T00:00:00"), "x", 6),
        ("B", _ts("2024-01-01T00:00:00"), "y", 5),
    ]
    return spark.createDataFrame(
        rows, "k string, ts timestamp, state string, id bigint")


def test_islands_collapse_runs(spark):
    out = state_intervals(_df(spark), "k", "ts", "state", "id")
    a = sorted([tuple(r) for r in out.where("k = 'A'").collect()],
               key=lambda r: r[2])
    assert [r[1] for r in a] == ["on", "off", "on"]
    assert a[0][5] == 2  # first island has two events
    # effective_to chains to the next island's effective_from
    assert a[0][3] == a[1][2] and a[1][3] == a[2][2]
    assert a[2][3] is None and a[2][6] is True  # open current row


def test_ts_collision_uses_tiebreak(spark):
    out = state_intervals(_df(spark), "k", "ts", "state", "id")
    # both islands share the same effective_from (the colliding ts), so
    # order by currency: the closed island first, the open one second
    b = sorted([tuple(r) for r in out.where("k = 'B'").collect()],
               key=lambda r: r[6])
    # id 5 ('y') sorts before id 6 ('x') at the same ts
    assert [r[1] for r in b] == ["y", "x"]
    assert b[0][3] is not None and b[1][3] is None


def test_snapshot_at_returns_valid_rows(spark):
    iv = state_intervals(_df(spark), "k", "ts", "state", "id")
    snap = snapshot_at(iv, "2024-01-01T02:30:00")
    got = {(r["k"], r["state"]) for r in snap.collect()}
    assert got == {("A", "off"), ("B", "x")}


def test_single_shuffle(spark):
    """lag + running sum + island agg + lead all share the key
    partitioning — the whole operator must plan exactly one exchange."""
    plan = state_intervals(_df(spark), "k", "ts", "state", "id") \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


def test_counts_cover_input(spark):
    df = _df(spark)
    out = state_intervals(df, "k", "ts", "state", "id")
    total = out.agg({"n_events": "sum"}).collect()[0][0]
    assert total == df.count()
