"""DeltaMergeProfile: shape-pin the Delta SQL each ParquetMergeSink
operation maps to (the SURVEY §1.3 seam). delta-spark is not in this
container, so these are pure string contracts — the same pattern as
test_jdbc_sink.test_upsert_sql_postgres_shape; the execute path is
gated by DeltaMergeProfile.is_available."""

from __future__ import annotations

import pytest

from datapump_spark.sinks.delta import DeltaMergeProfile

P = DeltaMergeProfile()


def test_upsert_merge_shape():
    sql = P.upsert_sql("m", ["k1", "k2"])
    assert sql == (
        "MERGE INTO `default`.`m` t USING __merge_batch s "
        "ON t.`k1` = s.`k1` AND t.`k2` = s.`k2` "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *"
    )


def test_cdc_merge_is_sequence_guarded_and_tombstone_aware():
    """Explicit column lists: the staged view carries __tombstone, which
    the target must never receive — SET */INSERT * would propagate it
    (schema mismatch, or a silent marker column under autoMerge)."""
    sql = P.cdc_merge_sql("t", ["k"], ["ts", "seq"], ["v"])
    assert sql == (
        "MERGE INTO `default`.`t` t USING __merge_batch s ON t.`k` = s.`k` "
        "WHEN MATCHED AND s.`__tombstone` "
        "AND (s.`ts`, s.`seq`) >= (t.`ts`, t.`seq`) THEN DELETE "
        "WHEN MATCHED AND NOT s.`__tombstone` "
        "AND (s.`ts`, s.`seq`) >= (t.`ts`, t.`seq`) "
        "THEN UPDATE SET t.`ts` = s.`ts`, t.`seq` = s.`seq`, t.`v` = s.`v` "
        "WHEN NOT MATCHED AND NOT s.`__tombstone` "
        "THEN INSERT (`k`, `ts`, `seq`, `v`) "
        "VALUES (s.`k`, s.`ts`, s.`seq`, s.`v`)"
    )
    assert "SET *" not in sql and "INSERT *" not in sql


def test_maintenance_statements():
    assert P.compact_sql("t") == "OPTIMIZE `default`.`t`"
    assert (P.compact_sql("t", zorder_by=["a", "b"])
            == "OPTIMIZE `default`.`t` ZORDER BY (`a`, `b`)")
    assert P.vacuum_sql("t", 24) == "VACUUM `default`.`t` RETAIN 24.0 HOURS"
    assert (P.time_travel_sql("t", 3)
            == "SELECT * FROM `default`.`t` VERSION AS OF 3")
    assert P.truncate_sql("t") == "DELETE FROM `default`.`t`"
    assert (P.stamp_updated_sql("t", "2026-01-01 00:00:00")
            == "ALTER TABLE `default`.`t` SET TBLPROPERTIES "
               "('updated_at' = '2026-01-01 00:00:00')")


def test_create_partitions_by_bucket_key():
    assert P.create_sql("t", partition_by=["pk_bucket"]) == (
        "CREATE OR REPLACE TABLE `default`.`t` USING DELTA "
        "PARTITIONED BY (`pk_bucket`) AS SELECT * FROM __merge_batch"
    )


def test_identifier_quoting_resists_backticks():
    sql = P.upsert_sql("we`ird", ["k`ey"])
    assert "`we``ird`" in sql and "`k``ey`" in sql


def test_execute_refuses_without_delta(spark):
    df = spark.createDataFrame([(1, "a")], "k long, v string")
    if DeltaMergeProfile.is_available(spark):
        pytest.skip("delta available here; execute path exercised for real")
    with pytest.raises(RuntimeError, match="delta-spark"):
        P.upsert(df, "m", ["k"])
