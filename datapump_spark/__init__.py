"""datapump_spark — a PySpark-native analytics/ETL engine.

Re-expresses the capabilities of the reference single-node pandas ETL pump
(dathere/datapump, surveyed in SURVEY.md) as an idiomatic Spark engine:

- ``operators``  — pure DataFrame→DataFrame query operators (dedupe, resample,
  describe, mode, joins, text analysis, near-dup, similarity search).
- ``sources``    — CSV/parquet scan builders with multi-format timestamp parse
  and reference-parity schema inference.
- ``sinks``      — idempotent upsert writers (parquet-MERGE local profile,
  JDBC ON CONFLICT profile) replacing the reference's CKAN datastore_upsert.
- ``streaming``  — the job pipeline engine (Structured Streaming file source,
  foreachBatch upsert, archive/quarantine, derived stats tables).
- ``jobspec``    — declarative job validation (reference datapump.py:22-53).

Every operator is designed for a multi-executor cluster at ~100 TB: plans are
declarative (Catalyst optimizes), small dimensions broadcast, per-key work
shuffles once on the grouping key, no collect() in any hot path.
"""

from datapump_spark.session import get_session, tuned_builder

__version__ = "0.1.0"

__all__ = ["get_session", "tuned_builder", "__version__"]
