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

from pyspark.sql import DataFrame, SparkSession

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def register_views(spark: SparkSession, sf_dir: str,
                   tables: list[str] | None = None) -> list[str]:
    """Create/replace a temp view per parquet table, normalized exactly
    like the DataFrame queries' ``_t`` (so SQL and DataFrame surfaces
    agree on types). Returns the registered names."""
    import os

    from datapump_spark.queries import _t

    done = []
    for t in tables or TABLES:
        if os.path.exists(f"{sf_dir}/{t}.parquet"):
            _t(spark, sf_dir, t).createOrReplaceTempView(t)
            done.append(t)
    return done


def run_sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Register the views and run one SQL query."""
    register_views(spark, sf_dir)
    return spark.sql(query)
