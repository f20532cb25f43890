"""A2 describe + A3 mode vs pandas models (datapump.py:329-344)."""

from __future__ import annotations

import math

import pandas as pd
import pytest

from datapump_spark.operators.describe import describe_numeric, describe_string, describe_table
from datapump_spark.operators.mode import column_modes

ROWS = [
    (1.0, "x"), (2.0, "y"), (2.0, "x"), (3.0, "z"),
    (4.0, "x"), (None, "y"), (10.0, None),
]
COLS = ["v", "s"]


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(ROWS, "v double, s string")


def test_describe_numeric_matches_pandas(df):
    pdf = pd.DataFrame(ROWS, columns=COLS)
    desc = pdf["v"].describe()  # count mean std min 25% 50% 75% max
    got = {r["stat"]: r["value"] for r in describe_numeric(df, ["v"]).collect()}
    for stat, key in [("count", "count"), ("mean", "mean"), ("std", "std"),
                      ("min", "min"), ("25%", "25%"), ("50%", "50%"),
                      ("75%", "75%"), ("max", "max")]:
        assert math.isclose(got[stat], desc[key], rel_tol=1e-9), stat


def test_describe_string_matches_pandas(df):
    pdf = pd.DataFrame(ROWS, columns=COLS)
    desc = pdf["s"].describe()  # count unique top freq
    got = {r["stat"]: r["value"] for r in describe_string(df, ["s"]).collect()}
    assert got["count"] == str(desc["count"])
    assert got["unique"] == str(desc["unique"])
    assert got["top"] == desc["top"]
    assert got["freq"] == str(desc["freq"])


def test_describe_table_shape(df):
    wide = describe_table(df).toPandas()
    assert list(wide.columns) == ["stat", "v", "s"]
    # numeric col has no unique/top/freq; string col has no mean
    by_stat = wide.set_index("stat")
    assert by_stat.loc["unique", "v"] is None
    assert by_stat.loc["mean", "s"] is None
    assert by_stat.loc["count", "v"] == "6.0"  # non-null count, float-formatted


def test_mode_matches_pandas_with_ties(df):
    pdf = pd.DataFrame(ROWS, columns=COLS)
    expected = pdf.mode()  # v -> [2.0]; s -> [x]
    got = column_modes(df, ["v", "s"]).toPandas().sort_values("stat")
    assert list(got["v"].dropna()) == list(expected["v"].dropna())
    assert list(got["s"].dropna()) == list(expected["s"].dropna())


def test_mode_tie_ordering(spark):
    df = spark.createDataFrame([(3,), (3,), (1,), (1,), (2,)], "x int")
    got = column_modes(df, ["x"]).toPandas()
    # ties ranked ascending by value, stat = 0-based rank (pandas parity)
    assert list(got["stat"]) == [0, 1]
    assert list(got["x"]) == [1, 3]


def test_edge_empty_and_all_null_inputs(spark):
    """Operators degrade gracefully on empty / all-null input (the driver
    may call any query on any SF; no operator may throw on degenerate
    data)."""
    from datapump_spark.operators.describe import describe_numeric, describe_string
    from datapump_spark.operators.mode import column_modes
    from datapump_spark.operators.resample import freq_resample

    empty = spark.createDataFrame([], "k bigint, ts timestamp, v double, s string")
    nulls = spark.createDataFrame(
        [(1, None, None, None), (2, None, None, None)],
        "k bigint, ts timestamp, v double, s string")

    assert len(describe_numeric(empty, ["v"]).collect()) == 8   # stats rows, null values
    assert len(describe_numeric(nulls, ["v"]).collect()) == 8
    assert len(describe_string(nulls, ["s"]).collect()) == 4
    assert column_modes(nulls, ["s", "v"]).count() == 0         # no non-null modes
    assert freq_resample(empty, ["k"], "ts", "H").count() == 0


def test_gini_concentration(spark):
    from pyspark.sql import functions as F

    from datapump_spark.operators.describe import gini_concentration

    # perfectly even mass → gini 0
    even = spark.createDataFrame(
        [(f"g{i}", 10.0) for i in range(8)], "g string, w double")
    r = gini_concentration(even, "g", "w").collect()[0]
    assert r["gini"] == 0.0 and r["n_groups"] == 8 and r["total"] == 80.0
    # one group holds everything → gini → (n-1)/n
    skewed = spark.createDataFrame(
        [("a", 1000.0)] + [(f"g{i}", 0.0) for i in range(9)],
        "g string, w double")
    r2 = gini_concentration(skewed, "g", "w").collect()[0]
    assert r2["gini"] == pytest.approx(9 / 10, abs=1e-6)
    # invariance to input layout
    r3 = gini_concentration(skewed.repartition(5), "g", "w").collect()[0]
    assert r3["gini"] == r2["gini"]
