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


@pytest.fixture(scope="module")
def hll_cube(spark, sf_dir):
    from pyspark.sql import functions as F

    from datapump_spark.operators.sketches import (
        hll_rollup_estimate, hll_rollup_sketches)

    ev = (spark.read.parquet(f"{sf_dir.replace('0.001', '0.01')}/events.parquet")
          .withColumn("day", F.to_date(F.col("ts").cast("timestamp"))))
    sk = hll_rollup_sketches(ev, ["event_type", "day"], "user_id")
    return ev, sk, hll_rollup_sketches, hll_rollup_estimate


def test_hll_rollup_merge_is_exact_vs_direct_sketch(hll_cube):
    # union of fine-grain sketches == sketch of the raw union, bit-exact:
    # HLL union takes register-wise max, so rolling up the cube must give
    # the IDENTICAL estimate as sketching the coarse grain directly
    ev, sk, mk, est = hll_cube
    rolled = {r["event_type"]: r["ndv"]
              for r in est(sk, ["event_type"]).collect()}
    direct = {r["event_type"]: r["ndv"]
              for r in est(mk(ev, ["event_type"], "user_id"),
                           ["event_type"]).collect()}
    assert rolled == direct


def test_hll_rollup_error_bound_and_rowcount(hll_cube):
    from pyspark.sql import functions as F
    ev, sk, _, est = hll_cube
    got = {r["event_type"]: r for r in est(sk, ["event_type"]).collect()}
    exact = {r["event_type"]: r for r in
             ev.groupBy("event_type")
             .agg(F.count("*").alias("n"),
                  F.count_distinct("user_id").alias("ndv")).collect()}
    assert set(got) == set(exact)
    for k, e in exact.items():
        assert got[k]["n_rows"] == e["n"]  # row counts are exact sums
        # lg_k=12 -> rse ~1.6%; generous 5% gate
        assert abs(got[k]["ndv"] - e["ndv"]) <= max(3, 0.05 * e["ndv"])


def test_hll_rollup_grand_total(hll_cube):
    from pyspark.sql import functions as F
    ev, sk, _, est = hll_cube
    tot = est(sk).first()
    assert tot["n_rows"] == ev.count()
    exact = ev.agg(F.count_distinct("user_id")).first()[0]
    assert abs(tot["ndv"] - exact) <= max(3, 0.05 * exact)
