"""Reference-architecture yardstick: time the reference's three stat
families (datapump.py:294,332,339 — groupby().resample().mean(),
describe(include='all'), mode()) implemented the reference's way —
single-threaded eager pandas — on the driver's sf0.1 events table, next to
the Spark engine's timings for the same operators.

Usage: python scripts/pandas_yardstick.py [sf_dir] [scale_mult]
``scale_mult`` replicates the table in memory N× on BOTH sides (pandas
concat vs Spark crossJoin with a range) to show where single-threaded
eager execution crosses over; 1 = raw sf0.1.
Prints one JSON line {"pandas": {...}, "spark": {...}, "rows": n}.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 1

    pdf = pd.read_parquet(f"{sf_dir}/events.parquet",
                          columns=["user_id", "ts", "value", "event_type"])
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    if mult > 1:
        reps = []
        for i in range(mult):
            r = pdf.copy()
            # shift users per replica so group cardinality scales too
            r["user_id"] = r["user_id"] + i * 1000
            reps.append(r)
        pdf = pd.concat(reps, ignore_index=True)
    n = len(pdf)

    out: dict[str, dict[str, float]] = {"pandas": {}, "spark": {}}

    t0 = time.perf_counter()
    pdf.set_index("ts").groupby("user_id").resample("h")["value"].mean()
    out["pandas"]["resample_hourly"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    pdf.describe(include="all")
    out["pandas"]["describe"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    pdf[["user_id", "value", "event_type"]].mode()
    out["pandas"]["mode"] = round(time.perf_counter() - t0, 3)

    from datapump_spark.queries import QUERIES
    from datapump_spark.session import get_session

    spark = get_session("yardstick")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm-up

    if mult == 1:
        for qname, label in [("q_resample_hourly", "resample_hourly"),
                             ("q_describe_numeric", "describe"),
                             ("q_mode", "mode")]:
            t0 = time.perf_counter()
            QUERIES[qname](spark, sf_dir).write.format("noop").mode("overwrite").save()
            out["spark"][label] = round(time.perf_counter() - t0, 3)
    else:
        from pyspark.sql import functions as F

        from datapump_spark.operators.describe import describe_numeric
        from datapump_spark.operators.mode import column_modes
        from datapump_spark.operators.resample import freq_resample
        from datapump_spark.queries import _t

        base = _t(spark, sf_dir, "events").select(
            "user_id", "ts", "value", "event_type")
        big = base.crossJoin(spark.range(mult).select(F.col("id").alias("__rep"))) \
                  .withColumn("user_id", F.col("user_id") + F.col("__rep") * 1000) \
                  .drop("__rep")

        t0 = time.perf_counter()
        freq_resample(big, ["user_id"], "ts", "H", value_cols=["value"]) \
            .write.format("noop").mode("overwrite").save()
        out["spark"]["resample_hourly"] = round(time.perf_counter() - t0, 3)

        t0 = time.perf_counter()
        describe_numeric(big, ["value"]).write.format("noop").mode("overwrite").save()
        out["spark"]["describe"] = round(time.perf_counter() - t0, 3)

        t0 = time.perf_counter()
        column_modes(big, ["user_id", "value", "event_type"]) \
            .write.format("noop").mode("overwrite").save()
        out["spark"]["mode"] = round(time.perf_counter() - t0, 3)

    print(json.dumps({**out, "rows": n, "sf_dir": sf_dir}))


if __name__ == "__main__":
    main()
