"""A1 frequency resample vs a pandas groupby().resample().mean() model
(reference datapump.py:287-327)."""

from __future__ import annotations

from datetime import datetime

import pandas as pd
import pytest

from datapump_spark.operators.resample import _parse_kind, freq_resample

ROWS = [
    ("s1", datetime(2021, 10, 1, 0, 5), 10.0),
    ("s1", datetime(2021, 10, 1, 0, 55), 20.0),
    ("s1", datetime(2021, 10, 1, 2, 10), 30.0),   # hour 1 is a gap
    ("s2", datetime(2021, 10, 1, 0, 30), 40.0),
    ("s2", datetime(2021, 10, 2, 5, 0), 50.0),
    ("s1", datetime(2021, 10, 1, 2, 20), None),
]
COLS = ["sensor", "ts", "v"]


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(ROWS, COLS)


def pandas_resample(kind: str) -> pd.DataFrame:
    pdf = pd.DataFrame(ROWS, columns=COLS)
    out = (
        pdf.set_index("ts").groupby("sensor").resample(kind)[["v"]].mean()
        .reset_index()
    )
    return out


@pytest.mark.parametrize("kind,pandas_kind", [("H", "h"), ("D", "D"), ("15T", "15min")])
def test_matches_pandas_dense(spark, df, kind, pandas_kind):
    expected = pandas_resample(pandas_kind)
    got = (
        freq_resample(df, ["sensor"], "ts", kind, dense=True)
        .toPandas()
        .sort_values(["sensor", "ts"])
        .reset_index(drop=True)
    )
    exp = expected.sort_values(["sensor", "ts"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_sparse_drops_gap_buckets(df):
    got = freq_resample(df, ["sensor"], "ts", "H", dense=False).toPandas()
    # s1 has hours 0 and 2 only (gap hour 1 not emitted in sparse mode)
    s1 = got[got["sensor"] == "s1"]
    assert len(s1) == 2


def test_parse_kind_variants():
    assert _parse_kind("H") == ("trunc", "hour")
    assert _parse_kind("15T") == ("window", "15 minute")  # Spark accepts singular units
    assert _parse_kind("12H") == ("window", "12 hour")
    with pytest.raises(ValueError):
        _parse_kind("nope")


def test_parse_kind_calendar_multiples():
    assert _parse_kind("2M") == ("months", 2)
    assert _parse_kind("3Q") == ("months", 9)
    assert _parse_kind("2Y") == ("months", 24)
    with pytest.raises(ValueError, match="positive integer"):
        _parse_kind("1.5M")


def test_parse_kind_fractional_converts_to_seconds():
    # ADVICE r1: '1.5H' used to silently truncate to 1-hour buckets
    assert _parse_kind("1.5H") == ("window", "5400 second")
    assert _parse_kind("0.5T") == ("window", "30 second")
    assert _parse_kind("2.5min") == ("window", "150 second")
    with pytest.raises(ValueError, match="whole number of seconds"):
        _parse_kind("0.1S")
    with pytest.raises(ValueError, match="positive"):
        _parse_kind("0H")


def test_parse_kind_anchored_weeks():
    # pandas 'W-SUN' = weeks ending Sunday = starting Monday = plain trunc
    assert _parse_kind("W-SUN") == ("week_anchor", 0)
    assert _parse_kind("W-SAT") == ("week_anchor", 1)   # starts Sunday
    assert _parse_kind("W-WED") == ("week_anchor", 4)   # starts Thursday
    with pytest.raises(ValueError):
        _parse_kind("W-XYZ")


def test_fractional_equals_integer_spelling(spark, df):
    a = freq_resample(df, ["sensor"], "ts", "1.5H").toPandas()
    b = freq_resample(df, ["sensor"], "ts", "90T").toPandas()
    pd.testing.assert_frame_equal(
        a.sort_values(["sensor", "ts"]).reset_index(drop=True),
        b.sort_values(["sensor", "ts"]).reset_index(drop=True),
    )


def test_two_month_buckets_epoch_anchored(spark):
    rows = [
        ("s1", datetime(2021, 1, 15), 1.0),   # Jan 2021 → period 2021-01
        ("s1", datetime(2021, 2, 20), 3.0),   # Feb 2021 → same 2-month period
        ("s1", datetime(2021, 3, 1), 5.0),    # Mar 2021 → period 2021-03
    ]
    df = spark.createDataFrame(rows, COLS)
    got = {
        (r.sensor, r.ts.strftime("%Y-%m-%d")): r.v
        for r in freq_resample(df, ["sensor"], "ts", "2M").collect()
    }
    # months-since-epoch of Jan 2021 = 612 (even) → periods start on odd
    # calendar months Jan/Mar/May…
    assert got == {("s1", "2021-01-01"): 2.0, ("s1", "2021-03-01"): 5.0}


def test_anchored_week_starts_sunday(spark):
    rows = [
        ("s1", datetime(2021, 10, 3, 12), 1.0),   # Sunday
        ("s1", datetime(2021, 10, 9, 12), 3.0),   # Saturday, same W-SAT week
        ("s1", datetime(2021, 10, 10, 0), 9.0),   # next Sunday
    ]
    df = spark.createDataFrame(rows, COLS)
    got = {
        r.ts.strftime("%Y-%m-%d"): r.v
        for r in freq_resample(df, ["sensor"], "ts", "W-SAT").collect()
    }
    assert got == {"2021-10-03": 2.0, "2021-10-10": 9.0}


def test_plain_week_equals_w_sun(spark, df):
    a = freq_resample(df, ["sensor"], "ts", "W").toPandas()
    b = freq_resample(df, ["sensor"], "ts", "W-SUN").toPandas()
    pd.testing.assert_frame_equal(
        a.sort_values(["sensor", "ts"]).reset_index(drop=True),
        b.sort_values(["sensor", "ts"]).reset_index(drop=True),
    )
