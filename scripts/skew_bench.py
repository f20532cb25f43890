"""Skewed-PK MERGE evidence (VERDICT round-6 #8).

The reference's real workload is sensor upserts, and sensor IDs are the
canonical hot key: one chatty sensor can contribute half a batch. This
script measures, at a configurable row count, with one PK value holding
50% of the batch rows:

1. the engine's dedupe (sortless min_by/max_by groupBy — partial
   aggregation collapses the hot key map-side) vs the naive window
   variant (row_number over partitionBy(PK) — every hot-key row lands in
   ONE reducer task) — hot vs uniform key distributions;
2. the full ParquetMergeSink.upsert (dedupe → bucket → anti-join →
   partitioned write) with a hot vs a uniform batch against the same
   pre-seeded table;
3. a skewed fact⋈dim join: plain shuffle join vs operators/skew.py's
   salted_join (AQE off for the comparison — AQE's runtime skew split is
   the production default and is measured too).

Prints one JSON line per measurement; paste the table into PERF.md.

Usage: python scripts/skew_bench.py [n_rows] (default 4_000_000)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def timed(label: str, fn, **extra) -> float:
    t0 = time.perf_counter()
    n = fn()
    dt = round(time.perf_counter() - t0, 3)
    print(json.dumps({"measure": label, "sec": dt, "rows_out": n, **extra}))
    return dt


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000

    import shutil
    import tempfile

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from datapump_spark.session import get_session

    spark = get_session("skew-bench")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def batch(hot: bool):
        """(sensor_id, ts, value, file_order): 50% of rows on sensor -1
        when hot, else uniform over 100k sensors. PK = sensor_id alone —
        the worst case: every hot row is a PK duplicate."""
        df = spark.range(n_rows).select(
            F.when(F.lit(hot) & (F.col("id") % 2 == 0), F.lit(-1))
            .otherwise(F.pmod(F.xxhash64("id"), F.lit(100_000)))
            .alias("sensor_id"),
            (F.col("id") % 86_400).alias("ts"),
            (F.col("id") % 1000).cast("double").alias("value"),
            F.col("id").alias("file_order"),
        )
        return df

    # --- 1. dedupe: engine groupBy(min_by) vs naive window ---------------
    def engine_dedupe(df):
        out = df.groupBy("sensor_id").agg(
            F.max_by("value", "file_order").alias("value"),
            F.max_by("ts", "file_order").alias("ts"))
        out.write.format("noop").mode("overwrite").save()
        return None

    def window_dedupe(df):
        w = Window.partitionBy("sensor_id").orderBy(F.col("file_order").desc())
        out = (df.withColumn("__rn", F.row_number().over(w))
               .where(F.col("__rn") == 1).drop("__rn"))
        out.write.format("noop").mode("overwrite").save()
        return None

    for hot in (False, True):
        df = batch(hot)
        timed("dedupe_groupby_minby", lambda: engine_dedupe(df),
              hot_key=hot, n=n_rows)
        timed("dedupe_window_rownum", lambda: window_dedupe(df),
              hot_key=hot, n=n_rows)

    # --- 2. full upsert against a seeded table ----------------------------
    from datapump_spark.sinks.upsert import ParquetMergeSink

    for hot in (False, True):
        tmp = tempfile.mkdtemp(prefix="skewlake-")
        try:
            sink = ParquetMergeSink(tmp)
            seed = spark.range(200_000).select(
                F.pmod(F.xxhash64("id"), F.lit(100_000)).alias("sensor_id"),
                F.lit(0).alias("ts"), F.lit(0.0).alias("value"),
                F.lit(0).alias("file_order"))
            sink.upsert(spark, seed, "sensors", ["sensor_id"])
            deduped = batch(hot).groupBy("sensor_id").agg(
                F.max_by("value", "file_order").alias("value"),
                F.max_by("ts", "file_order").alias("ts"),
                F.max("file_order").alias("file_order"))
            timed("merge_upsert",
                  lambda: sink.upsert(spark, deduped, "sensors",
                                      ["sensor_id"]),
                  hot_key=hot, n=n_rows)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    # --- 3. skewed fact join: plain vs salted (AQE on and off) ------------
    from datapump_spark.operators.skew import salted_join

    dim = spark.range(100_000).select(
        F.col("id").alias("sensor_id"),
        F.concat(F.lit("zone"), (F.col("id") % 50)).alias("zone"),
    ).union(spark.createDataFrame([(-1, "zone_hot")],
                                  "sensor_id long, zone string"))
    # force the shuffle-join comparison: no broadcast, so the hot key's
    # rows meet in one reducer unless salted or AQE-split
    fact = batch(True)

    def plain_join():
        (fact.hint("merge").join(dim.hint("merge"), "sensor_id")
         .groupBy("zone").agg(F.sum("value").alias("v"))
         .write.format("noop").mode("overwrite").save())

    def salted(n_salts):
        (salted_join(fact, dim, "sensor_id", "sensor_id", n_salts=n_salts)
         .groupBy("zone").agg(F.sum("value").alias("v"))
         .write.format("noop").mode("overwrite").save())

    for aqe in ("true", "false"):
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", aqe)
        timed("join_plain_shuffle", plain_join, aqe=aqe, hot_key=True)
        timed("join_salted", lambda: salted(16), aqe=aqe, hot_key=True,
              n_salts=16)
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")


if __name__ == "__main__":
    main()
