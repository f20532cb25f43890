"""Semantics of operators/timeseries.py and operators/retrieval.py on
crafted inputs. Oracle equivalence runs in test_extra_oracles.py
(q_ewma, q_interpolate, q_trend, q_inverted_index, q_bm25_topk)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datapump_spark.operators.retrieval import bm25_topk, inverted_index
from datapump_spark.operators.timeseries import (
    ewma,
    group_trend,
    interpolate_linear,
)


def _series(spark, vals):
    return spark.createDataFrame(
        [(1, i, float(v) if v is not None else None)
         for i, v in enumerate(vals)],
        "key long, t long, v double")


def test_ewma_matches_pandas_adjust_true(spark):
    import pandas as pd

    vals = [10.0, 20.0, 15.0, 30.0, 25.0, 18.0]
    got = [r["ewma"] for r in
           ewma(_series(spark, vals), ["key"], "t", "v", alpha=0.5,
                window=20, order_cols=["t"])
           .orderBy("t").collect()]
    want = pd.Series(vals).ewm(alpha=0.5, adjust=True).mean()
    assert got == pytest.approx(list(want), abs=1e-6)


def test_ewma_bounded_window_forgets(spark):
    # after `window` points, an early outlier has exactly zero influence
    vals = [1000.0] + [10.0] * 5
    got = ewma(_series(spark, vals), ["key"], "t", "v", alpha=0.5,
               window=3, order_cols=["t"]).orderBy("t").collect()
    assert got[-1]["ewma"] == pytest.approx(10.0)


def test_interpolate_linear(spark):
    rows = interpolate_linear(
        _series(spark, [10.0, None, None, 40.0, None]),
        ["key"], "t", "v").orderBy("t").collect()
    assert [r["interpolated"] for r in rows] == [10.0, 20.0, 30.0, 40.0, None]
    assert [r["was_gap"] for r in rows] == [False, True, True, False, True]


def test_interpolate_leading_gap_stays_null(spark):
    rows = interpolate_linear(
        _series(spark, [None, 10.0, None, 20.0]),
        ["key"], "t", "v").orderBy("t").collect()
    assert rows[0]["interpolated"] is None
    assert rows[2]["interpolated"] == pytest.approx(15.0)


def test_group_trend_exact_line(spark):
    df = spark.createDataFrame(
        [("a", float(x), 2.0 * x + 5.0) for x in range(10)]
        + [("b", float(x), -1.0 * x + 3.0) for x in range(10)],
        "g string, x double, y double")
    got = {r["g"]: r for r in group_trend(df, ["g"], "x", "y").collect()}
    assert got["a"]["slope"] == pytest.approx(2.0)
    assert got["a"]["intercept"] == pytest.approx(5.0)
    assert got["a"]["r"] == pytest.approx(1.0)
    assert got["b"]["slope"] == pytest.approx(-1.0)
    assert got["b"]["r"] == pytest.approx(-1.0)


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [(1, "apple banana apple cherry"),
         (2, "banana cherry durian"),
         (3, "apple apple apple apple"),
         (4, "elderberry fig")],
        "doc_id long, text string")


def test_inverted_index_postings(corpus):
    idx = {r["term"]: r for r in inverted_index(corpus).collect()}
    assert idx["apple"]["postings"] == [1, 3]
    assert idx["apple"]["df"] == 2
    assert idx["banana"]["postings"] == [1, 2]
    assert inverted_index(corpus, min_df=2).count() == 3  # apple/banana/cherry


def test_bm25_ranks_relevant_docs_first(corpus):
    rows = bm25_topk(corpus, "apple cherry", k=4).collect()
    assert [r["rank"] for r in rows] == [1, 2, 3, 4][:len(rows)]
    by_id = {r["doc_id"]: r for r in rows}
    # doc 4 shares no term — absent entirely
    assert 4 not in by_id
    # doc 1 hits both query terms, others one
    assert by_id[1]["n_hit_terms"] == 2
    assert rows[0]["doc_id"] == 1
    # monotone: scores non-increasing in rank
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_bm25_empty_query_rejected(corpus):
    with pytest.raises(ValueError):
        bm25_topk(corpus, "?!")


# --- property tests vs pandas as the independent model ---------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_PROP = dict(max_examples=10, deadline=None,
             suppress_health_check=[HealthCheck.function_scoped_fixture])

_VALS = st.lists(
    st.floats(min_value=-1e3, max_value=1e3,
              allow_nan=False, allow_infinity=False),
    min_size=1, max_size=30)


@pytest.mark.slow
@given(vals=_VALS, alpha=st.sampled_from([0.1, 0.3, 0.5, 0.9]))
@settings(**_PROP)
def test_ewma_matches_pandas_property(spark, vals, alpha):
    import pandas as pd

    got = [r["ewma"] for r in
           ewma(_series(spark, vals), ["key"], "t", "v", alpha=alpha,
                window=len(vals), order_cols=["t"])
           .orderBy("t").collect()]
    want = pd.Series(vals).ewm(alpha=alpha, adjust=True).mean()
    assert got == pytest.approx(list(want), rel=1e-5, abs=1e-5)


@given(vals=st.lists(
    st.one_of(st.none(),
              st.floats(min_value=-1e3, max_value=1e3,
                        allow_nan=False, allow_infinity=False)),
    min_size=1, max_size=30))
@pytest.mark.slow
@settings(**_PROP)
def test_interpolate_matches_pandas_property(spark, vals):
    import pandas as pd

    rows = interpolate_linear(
        _series(spark, vals), ["key"], "t", "v").orderBy("t").collect()
    got = [r["interpolated"] for r in rows]
    want = (pd.Series(vals, dtype="float64")
            .interpolate(method="linear", limit_area="inside"))
    for g, w in zip(got, want):
        if g is None:
            assert pd.isna(w)
        else:
            assert g == pytest.approx(w, rel=1e-9, abs=1e-9)


def test_fill_forward_basic_and_limit(spark):
    from datapump_spark.operators.timeseries import fill_forward

    vals = [None, 1.0, None, None, None, None, 5.0, None]
    rows = fill_forward(_series(spark, vals), ["key"], "t", "v",
                        limit=2).orderBy("t").collect()
    got = [r["filled"] for r in rows]
    # leading gap unfillable; 1.0 carries 2 rows then staleness nulls;
    # trailing gap carried from 5.0
    assert got == [None, 1.0, 1.0, 1.0, None, None, 5.0, 5.0]
    assert [r["was_gap"] for r in rows] == [
        True, False, True, True, True, True, False, True]


def test_fill_backward(spark):
    from datapump_spark.operators.timeseries import fill_forward

    vals = [None, None, 3.0, None, 7.0, None]
    rows = fill_forward(_series(spark, vals), ["key"], "t", "v",
                        backward=True).orderBy("t").collect()
    assert [r["filled"] for r in rows] == [3.0, 3.0, 3.0, 7.0, 7.0, None]


@given(vals=st.lists(
    st.one_of(st.none(),
              st.floats(min_value=-1e3, max_value=1e3,
                        allow_nan=False, allow_infinity=False)),
    min_size=1, max_size=30),
    limit=st.one_of(st.none(), st.integers(min_value=1, max_value=5)))
@pytest.mark.slow
@settings(**_PROP)
def test_fill_forward_matches_pandas_property(spark, vals, limit):
    import pandas as pd

    from datapump_spark.operators.timeseries import fill_forward

    rows = fill_forward(_series(spark, vals), ["key"], "t", "v",
                        limit=limit).orderBy("t").collect()
    got = [r["filled"] for r in rows]
    want = pd.Series(vals, dtype="float64").ffill(limit=limit)
    for g, w in zip(got, want):
        if g is None:
            assert pd.isna(w)
        else:
            assert g == pytest.approx(w, rel=1e-12)


def test_rrf_fuse_hand_computed(spark):
    from datapump_spark.operators.retrieval import rrf_fuse

    a = spark.createDataFrame([(10, 1), (20, 2), (30, 3)],
                              "doc_id long, rank int")
    b = spark.createDataFrame([(20, 1), (40, 2)], "doc_id long, rank int")
    got = {r["doc_id"]: r for r in
           rrf_fuse({"lex": a, "vec": b}, k=10, c=60).collect()}
    # doc 20 appears in both lists → highest fused score
    assert got[20]["rank"] == 1
    assert got[20]["rrf"] == round(1 / 62 + 1 / 61, 6)
    assert got[10]["rrf"] == round(1 / 61, 6)
    # single-list docs carry a null rank for the list that missed them
    assert got[40]["lex_rank"] is None and got[40]["vec_rank"] == 2
    assert got[30]["vec_rank"] is None
    # 10 vs 40: same-rank tie in different lists → equal rrf? no:
    # 1/61 (rank1) > 1/62 (rank2); and ties break by id
    order = sorted(got.values(), key=lambda r: r["rank"])
    assert [r["doc_id"] for r in order] == [20, 10, 40, 30]


def test_rrf_fuse_k_and_validation(spark):
    import pytest as _pt

    from datapump_spark.operators.retrieval import rrf_fuse

    a = spark.createDataFrame([(i, i) for i in range(1, 8)],
                              "doc_id long, rank int")
    assert rrf_fuse({"only": a}, k=3).count() == 3
    with _pt.raises(ValueError):
        rrf_fuse({})


def test_rolling_quantile_matches_pandas(spark):
    import pandas as pd

    from datapump_spark.operators.timeseries import rolling_quantile

    vals = [5.0, 1.0, 4.0, 2.0, 8.0, 3.0, 9.0, 0.0]
    got = [r["rolling_q"] for r in rolling_quantile(
        _series(spark, vals), ["key"], ["t"], "v", q=0.5, window=3)
        .orderBy("t").collect()]
    want = pd.Series(vals).rolling(3, min_periods=1).median()
    for g, w in zip(got, want):
        assert g == pytest.approx(w, rel=1e-12)
    # q=0.25 exercises the interpolated branch
    got25 = [r["rolling_q"] for r in rolling_quantile(
        _series(spark, vals), ["key"], ["t"], "v", q=0.25, window=4)
        .orderBy("t").collect()]
    want25 = pd.Series(vals).rolling(4, min_periods=1).quantile(
        0.25, interpolation="linear")
    for g, w in zip(got25, want25):
        assert g == pytest.approx(w, rel=1e-12)


def test_autocorrelation_vs_numpy(spark):
    import numpy as np

    from datapump_spark.operators.timeseries import autocorrelation

    vals = [float(((i * 13) % 17) - 8 + (3 if i % 2 == 0 else -3))
            for i in range(60)]  # strong lag-2 structure
    got = {r["lag"]: r for r in autocorrelation(
        _series(spark, vals), ["key"], ["t"], "v", max_lag=3).collect()}
    for lag in (1, 2, 3):
        a = np.array(vals[lag:]); b = np.array(vals[:-lag])
        want = float(np.corrcoef(a, b)[0, 1])
        assert got[lag]["acf"] == pytest.approx(want, abs=1e-6), lag
        assert got[lag]["n"] == 60 - lag
    # the alternating ±3 component surfaces as positive lag-2 acf above lag-1
    assert got[2]["acf"] > got[1]["acf"]


def test_autocorrelation_pairwise_complete_n(spark):
    """With nulls in the series, ``n`` must be the pairwise-complete count
    corr() actually uses — both ends non-null — not just the lag side
    (the old count overstated the sample)."""
    from datapump_spark.operators.timeseries import autocorrelation

    vals = [float(i % 7) for i in range(20)]
    rows = [("k", i, None if i in (4, 9) else v)
            for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "key string, t long, v double")
    got = {r["lag"]: r for r in autocorrelation(
        df, ["key"], ["t"], "v", max_lag=2).collect()}
    for lag in (1, 2):
        pairs = [(vals[i], vals[i - lag]) for i in range(lag, 20)
                 if i not in (4, 9) and (i - lag) not in (4, 9)]
        assert got[lag]["n"] == len(pairs), lag


def test_seasonal_decompose_recovers_components(spark):
    """Synthetic series = linear trend + exact period-4 pattern: the
    moving-average decomposition must recover the pattern (up to the
    centering convention), leave ~zero residual, and null the trend at
    the incomplete-frame edges."""
    import math

    from datapump_spark.operators.timeseries import seasonal_decompose

    period, n = 4, 40
    pattern = [2.0, -1.0, -2.0, 1.0]          # sums to zero
    rows = [("a", i, round(0.5 * i + pattern[i % period], 6))
            for i in range(n)]
    df = spark.createDataFrame(rows, "grp string, t int, v double")
    out = {r["t"]: r for r in
           seasonal_decompose(df, ["grp"], "t", "v", period=period)
           .collect()}
    assert len(out) == n
    half = period // 2
    for i in (0, half - 1, n - half, n - 1):  # incomplete frames
        assert out[i]["trend"] is None and out[i]["resid"] is None
    for i in range(half, n - half):
        # centered MA of a linear trend is the trend itself; the period
        # pattern averages to zero inside any full window of 5 rows ≠
        # multiple of period — so allow the small MA leakage, but the
        # decomposition identity must hold exactly
        r = out[i]
        assert r["value"] == pytest.approx(0.5 * i + pattern[i % period])
        assert math.isclose(r["value"],
                            r["trend"] + r["seasonal"] + r["resid"],
                            abs_tol=2e-6)
    # seasonal is a pure function of position
    seas = {}
    for i in range(half, n - half):
        seas.setdefault(i % period, set()).add(out[i]["seasonal"])
    assert all(len(v) == 1 for v in seas.values())
    # and tracks the injected pattern's ordering
    order_true = sorted(range(period), key=lambda j: pattern[j])
    order_got = sorted(seas, key=lambda j: next(iter(seas[j])))
    assert order_true == order_got
