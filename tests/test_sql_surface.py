"""SQL surface: the ANSI-portable oracle strings, executed THROUGH
SPARK over the registered views, must reproduce their DataFrame twins —
one SQL text, three engines, one answer."""

from __future__ import annotations

import pytest

from datapump_spark.oracles import EXTRA_ORACLES, ORACLES
from datapump_spark.queries import EXTRA_QUERIES, QUERIES
from datapump_spark.sql_surface import register_views, run_sql

# rotation-proof: queries move between the driver-gated and EXTRA
# registries (the driver caps at 50), the SQL-parity pin shouldn't care
ALL_ORACLES = {**ORACLES, **EXTRA_ORACLES}
ALL_QUERIES = {**QUERIES, **EXTRA_QUERIES}

# oracle strings that are pure ANSI (no DuckDB list/lambda functions, no
# double-quoted identifiers — Spark parses those as string literals)
PORTABLE = [
    "q_pricing_summary",
    "q_top_customers",
    "q_semi_join",
    "q_anti_join",
    "q_rollup",
    "q_star_revenue",
    "q_moving_avg",
    "q_latest_event",
]


@pytest.fixture(scope="module")
def views(spark, sf_dir):
    return register_views(spark, sf_dir)


def test_all_tables_registered(views):
    assert set(views) >= {"lineitem", "orders", "customer", "events",
                          "documents", "embeddings"}


@pytest.mark.parametrize("name", PORTABLE)
def test_sql_matches_dataframe_twin(name, spark, sf_dir, views):
    sql_rows = sorted(map(tuple, spark.sql(ALL_ORACLES[name]).collect()),
                      key=str)
    df_rows = sorted(map(tuple, ALL_QUERIES[name](spark, sf_dir).collect()),
                     key=str)
    assert sql_rows == df_rows


def test_run_sql_ad_hoc(spark, sf_dir):
    got = run_sql(
        spark, sf_dir,
        "SELECT count(*) AS n FROM lineitem WHERE l_quantity > 25",
    ).collect()[0]["n"]
    want = QUERIES["q_pricing_summary"]  # just sanity that views exist
    assert got > 0 and want is not None
