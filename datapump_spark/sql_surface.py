"""SQL surface: the reference has none (SURVEY §2 — "no SQL surface");
Spark gives us a full one for free. This module makes that concrete:
register the engine's tables as temp views (with the same central type
normalization every DataFrame query gets via ``queries._t``) and run
arbitrary SQL against them.

The test suite closes the loop by executing the ANSI-portable DuckDB
oracle strings THROUGH SPARK and checking they reproduce the DataFrame
twins — one SQL text, three engines (Spark DataFrame plan, Spark SQL,
DuckDB), one answer.
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame, SparkSession

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# (r12 optimization round) registering all ten views cost ~1.4 s of driver
# work per run_sql call (10 × _t + 10 × createOrReplaceTempView over py4j).
# The views are deterministic functions of (session, sf_dir, table files),
# so re-registration is skipped while those are unchanged — same staleness
# key as queries._T_MEMO (view creation itself stores no data; the SQL
# still scans parquet when it runs). Keyed by live session object; a
# different sf_dir (or regenerated files) re-registers everything.
_VIEWS_MEMO: "weakref.WeakKeyDictionary[SparkSession, dict]" = (
    weakref.WeakKeyDictionary())


def register_views(spark: SparkSession, sf_dir: str,
                   tables: list[str] | None = None) -> list[str]:
    """Create/replace a temp view per parquet table, normalized exactly
    like the DataFrame queries' ``_t`` (so SQL and DataFrame surfaces
    agree on types). Returns the registered names."""
    import os

    from datapump_spark.queries import _t

    done = []
    per_session = _VIEWS_MEMO.setdefault(spark, {})
    for t in tables or TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            st = os.stat(path)
            key = (path, st.st_mtime_ns, st.st_size)
            # staleness AND existence: a caller that dropped/overwrote
            # the temp view between calls must get it re-created, not a
            # stale `done` report (r12 ADVICE). tableExists is a catalog
            # lookup, no Spark job.
            if (per_session.get(t) != key
                    or not spark.catalog.tableExists(t)):
                _t(spark, sf_dir, t).createOrReplaceTempView(t)
                per_session[t] = key
            done.append(t)
    return done


def run_sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Register the views and run one SQL query."""
    register_views(spark, sf_dir)
    return spark.sql(query)
