"""F3/F4: dupe count + keep-first/last dedupe vs a pandas model
(reference datapump.py:446-456)."""

from __future__ import annotations

import pandas as pd
import pytest

from datapump_spark.operators.dedupe import dedupe_by_key, dupe_count

ROWS = [
    # (ord, sensor, ts, v) — PK (sensor, ts); dupes with differing v
    (0, "a", "t1", 1.0),
    (1, "a", "t1", 2.0),
    (2, "b", "t1", 3.0),
    (3, "a", "t2", 4.0),
    (4, "b", "t1", 5.0),
    (5, "b", "t1", 6.0),
    (6, "c", "t3", 7.0),
]
COLS = ["ord", "sensor", "ts", "v"]


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(ROWS, COLS)


def test_dupe_count_matches_pandas(df):
    pdf = pd.DataFrame(ROWS, columns=COLS)
    expected = int(pdf.duplicated(subset=["sensor", "ts"], keep="first").sum())
    got = dupe_count(df, ["sensor", "ts"]).collect()[0]["dupe_count"]
    assert got == expected == 3


@pytest.mark.parametrize("keep", ["first", "last"])
def test_dedupe_matches_pandas(df, keep):
    pdf = pd.DataFrame(ROWS, columns=COLS)
    expected = pdf.drop_duplicates(subset=["sensor", "ts"], keep=keep)
    got = dedupe_by_key(df, ["sensor", "ts"], "ord", keep).toPandas()
    assert sorted(got["ord"]) == sorted(expected["ord"])
    # values of the surviving rows, not just their ids
    assert sorted(got["v"]) == sorted(expected["v"])


def test_dedupe_empty_keep_is_noop(df):
    assert dedupe_by_key(df, ["sensor", "ts"], "ord", "").count() == len(ROWS)


def test_dedupe_bad_keep_raises(df):
    with pytest.raises(ValueError):
        dedupe_by_key(df, ["sensor", "ts"], "ord", "both")
