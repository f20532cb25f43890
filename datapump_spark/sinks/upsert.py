"""Idempotent primary-key upsert sinks.

The reference's sink is CKAN ``datastore_upsert(method='upsert')`` — a
PostgreSQL upsert keyed on the PK declared at create time
(datapump.py:560-566,594), plus truncate (datastore_delete,
datapump.py:545-555) and metadata stamping (datapump.py:616-630). Spark has
no native upsert, so two profiles:

- ``ParquetMergeSink`` — lake profile for local/testing: MERGE emulated as
  anti-join(current, batch-keys) ∪ batch, written via a temp-dir swap (the
  poor man's ACID commit). At production scale the same call shape maps to
  Delta ``MERGE INTO`` (log-backed ACID, partition-pruned merge-on-read);
  this class documents the seam and keeps semantics testable with zero
  extra dependencies.
- ``JdbcUpsertSink`` — CKAN-datastore-parity profile: per-partition batched
  ``INSERT … ON CONFLICT (pk) DO UPDATE`` through a user-supplied DB-API
  connection factory (no driver baked into the engine). Writes happen on
  executors via ``foreachPartition`` — the driver never materializes rows
  (the reference's ``to_dict('records')`` full-copy, datapump.py:475, is
  exactly what this avoids).

Scale notes: the merge anti-join shuffles on the PK — the same key the
dedupe stage already partitioned by, so AQE reuses the exchange; a Delta
profile would additionally prune merge targets by partition column. JDBC
batches default to 1000 rows/execute to bound round-trips.
"""

from __future__ import annotations

import json
import re
import shutil
import tempfile
import time
from collections.abc import Callable, Sequence
from datetime import datetime, timezone
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Reference description stamp: '… (UPDATED: 2021-01-01 00:00:00)' appended /
# rewritten in place (datapump.py:616-630, regex datapump.py:618).
_UPDATED_RE = re.compile(r" \(UPDATED: (.*?)\)$")


class ParquetMergeSink:
    """Directory-per-table parquet sink with PK-upsert semantics."""

    def __init__(self, root: str | Path):
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)

    def path(self, table: str) -> Path:
        return self.root / table

    def exists(self, table: str) -> bool:
        return self.path(table).exists()

    def read(self, spark: SparkSession, table: str) -> DataFrame:
        return spark.read.parquet(str(self.path(table)))

    def _swap_write(self, df: DataFrame, table: str) -> None:
        """Write to a temp dir, then atomically swap into place — a reread
        during write sees the old version, never a torn one."""
        target = self.path(table)
        tmp = Path(tempfile.mkdtemp(dir=self.root, prefix=f".{table}-tmp-"))
        try:
            df.write.mode("overwrite").parquet(str(tmp / "data"))
            stage = self.root / f".{table}-new-{time.time_ns()}"
            (tmp / "data").rename(stage)
            if target.exists():
                old = self.root / f".{table}-old-{time.time_ns()}"
                target.rename(old)
                stage.rename(target)
                shutil.rmtree(old, ignore_errors=True)
            else:
                stage.rename(target)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    def truncate(self, table: str) -> None:
        """K3 (datastore_delete-on-Truncate, datapump.py:545-555)."""
        shutil.rmtree(self.path(table), ignore_errors=True)

    # ---------------------------------------------------------- metadata (K1/K4)

    def _meta_path(self, table: str) -> Path:
        return self.root / f".{table}.meta.json"

    def get_properties(self, table: str) -> dict:
        """Table properties sidecar — the stand-in for `ALTER TABLE … SET
        TBLPROPERTIES` / CKAN resource metadata (SURVEY §1.1)."""
        p = self._meta_path(table)
        return json.loads(p.read_text()) if p.exists() else {}

    def set_properties(self, table: str, **props) -> None:
        merged = {**self.get_properties(table), **props}
        self._meta_path(table).write_text(json.dumps(merged, sort_keys=True))

    def stamp_updated(self, table: str, when: datetime | None = None) -> None:
        """K4: rewrite the description's ``(UPDATED: ts)`` suffix in place
        (append on first stamp) — the reference's regex-split/rejoin
        behavior (datapump.py:616-630) — and set an ``updated_at``
        property for programmatic readers."""
        when = when or datetime.now(timezone.utc)
        ts = when.strftime("%Y-%m-%d %H:%M:%S")
        props = self.get_properties(table)
        desc = _UPDATED_RE.sub("", props.get("description", ""))
        props["description"] = f"{desc} (UPDATED: {ts})"
        props["updated_at"] = ts
        self.set_properties(table, **props)

    def set_alias(self, table: str, alias: str) -> None:
        """K1's resource alias ('org-package-resource',
        datapump.py:224-225): recorded as a property; a SQL catalog
        profile maps this to CREATE VIEW."""
        self.set_properties(table, alias=alias)

    def overwrite(self, df: DataFrame, table: str) -> None:
        """Full-refresh write (stats tables are replaced per run, K6)."""
        self._swap_write(df, table)

    def upsert(self, spark: SparkSession, df: DataFrame, table: str,
               keys: Sequence[str]) -> None:
        """K2 MERGE: batch rows win on PK collision (reference upsert
        semantics; Delta equivalent: WHEN MATCHED UPDATE ALL / WHEN NOT
        MATCHED INSERT ALL)."""
        if not self.exists(table):
            self._swap_write(df, table)
            return
        current = self.read(spark, table)
        batch_keys = df.select(*keys).distinct()
        kept = current.join(batch_keys, on=list(keys), how="left_anti")
        merged = kept.unionByName(df, allowMissingColumns=True)
        self._swap_write(merged, table)


class JdbcUpsertSink:
    """Executor-side DB-API upsert: INSERT … ON CONFLICT (pk) DO UPDATE.

    ``connection_factory`` must be a picklable zero-arg callable returning a
    DB-API connection (psycopg2.connect partial, sqlite3 for tests, …).
    """

    def __init__(self, connection_factory: Callable[[], object],
                 batch_size: int = 1000, dialect: str = "postgres"):
        self.connection_factory = connection_factory
        self.batch_size = batch_size
        self.dialect = dialect

    def upsert_sql(self, table: str, columns: Sequence[str],
                   keys: Sequence[str]) -> str:
        cols = ", ".join(f'"{c}"' for c in columns)
        ph = ", ".join(["?" if self.dialect == "sqlite" else "%s"] * len(columns))
        pk = ", ".join(f'"{k}"' for k in keys)
        updates = ", ".join(
            f'"{c}" = excluded."{c}"' for c in columns if c not in keys
        ) or f'"{keys[0]}" = excluded."{keys[0]}"'
        return (
            f'INSERT INTO "{table}" ({cols}) VALUES ({ph}) '
            f"ON CONFLICT ({pk}) DO UPDATE SET {updates}"
        )

    def upsert(self, df: DataFrame, table: str, keys: Sequence[str]) -> None:
        columns = df.columns
        sql = self.upsert_sql(table, columns, keys)
        factory = self.connection_factory
        batch_size = self.batch_size

        def write_partition(rows):
            conn = factory()
            try:
                cur = conn.cursor()
                batch = []
                for row in rows:
                    batch.append(tuple(row))
                    if len(batch) >= batch_size:
                        cur.executemany(sql, batch)
                        batch.clear()
                if batch:
                    cur.executemany(sql, batch)
                conn.commit()
            finally:
                conn.close()

        df.foreachPartition(write_partition)
