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
    assert _parse_kind("H") == ("hour", "1 hour")
    assert _parse_kind("15T") == (None, "15 minute")  # Spark accepts singular units
    assert _parse_kind("12H") == (None, "12 hour")
    with pytest.raises(ValueError):
        _parse_kind("nope")
    with pytest.raises(ValueError):
        _parse_kind("2M")  # multiples of calendar units unsupported
