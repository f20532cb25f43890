"""Error bounds of operators/sketches.py vs the exact twins."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def profiles(spark, sf_dir):
    from datapump_spark.operators.sketches import approx_profile, exact_profile

    li = spark.read.parquet(f"{sf_dir.replace('0.001', '0.01')}/lineitem.parquet")
    cols = ["l_orderkey", "l_extendedprice", "l_quantity"]
    a = approx_profile(li, ["l_returnflag"], cols, rsd=0.02).collect()
    e = exact_profile(li, ["l_returnflag"], cols).collect()
    return ({r["l_returnflag"]: r for r in a},
            {r["l_returnflag"]: r for r in e}, cols)


def test_row_counts_exact(profiles):
    a, e, _ = profiles
    assert set(a) == set(e)
    for k in e:
        assert a[k]["n_rows"] == e[k]["n_rows"]


def test_hll_within_rsd(profiles):
    a, e, cols = profiles
    for k in e:
        for c in cols:
            exact = e[k][f"ndv_{c}"]
            approx = a[k][f"ndv_{c}"]
            # rsd=0.02 → 5σ envelope = 10%; generous but catches breakage
            assert abs(approx - exact) <= max(0.10 * exact, 2), (k, c)


def test_percentiles_within_rank_error(profiles):
    a, e, cols = profiles
    for k in e:
        for c in cols:
            for p in ("p50", "p95"):
                exact = e[k][f"{p}_{c}"]
                approx = a[k][f"{p}_{c}"]
                # value-space check: within the IQR-scaled neighborhood
                spread = abs(e[k][f"p95_{c}"] - e[k][f"p50_{c}"]) or 1.0
                assert abs(approx - exact) <= 0.05 * spread + 1e-9, (k, c, p)


def test_single_pass_plan(spark, sf_dir):
    """The whole profile must be ONE aggregation (one exchange), not a
    per-column cascade."""
    from datapump_spark.operators.sketches import approx_profile

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    plan = (approx_profile(li, ["l_returnflag"], ["l_quantity"])
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Exchange") == 1
