"""Measure the data-skipping payoff of the z-order layout.

Writes lineitem (sf from $SPARK_GRAFT_SF_DIR, default sf0.1) in three
layouts — as-generated, sorted by l_partkey only, z-ordered on
(l_partkey, l_suppkey) — with small row groups so one file contains many
prunable units, then evaluates a 2-column box predicate:

1. **Row groups that statistics prune** (ground truth, read from parquet
   footers with pyarrow): a row group survives only if the predicate box
   intersects its [min,max] on both columns.
2. **Spark wall time** for the same filter per layout.

At 100 TB this is THE scan economics: parquet min/max stats (and any
lakehouse file-skipping index) prune on exactly these footers, so
"row groups kept" is a direct proxy for bytes read on a cluster.

Usage: python scripts/zorder_skipping.py [--rows-per-group 4096]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import pyarrow.parquet as pq  # noqa: E402


def footer_stats(path: str, cols: list[str]):
    """Per-row-group [min,max] for cols across all parquet files under path."""
    groups = []
    for f in sorted(Path(path).glob("*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for g in range(md.num_row_groups):
            rg = md.row_group(g)
            st = {}
            for c in cols:
                s = rg.column(idx[c]).statistics
                st[c] = (s.min, s.max)
            st["rows"] = rg.num_rows
            groups.append(st)
    return groups


def kept_groups(groups, box):
    kept = [g for g in groups
            if all(g[c][0] <= hi and g[c][1] >= lo
                   for c, (lo, hi) in box.items())]
    return len(kept), sum(g["rows"] for g in kept)


def main() -> None:
    rows_per_group = 4096
    if "--rows-per-group" in sys.argv:
        rows_per_group = int(sys.argv[sys.argv.index("--rows-per-group") + 1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F

    from datapump_spark.operators.zorder import zorder_by
    from datapump_spark.session import get_session

    spark = get_session("zorder-skipping")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.files.minPartitionNum", "1")

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet") \
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
                "l_quantity", "l_extendedprice")
    stats = li.agg(F.min("l_partkey"), F.max("l_partkey"),
                   F.min("l_suppkey"), F.max("l_suppkey")).first()
    pmn, pmx, smn, smx = stats
    # a ~10% x 10% box in the middle of both domains
    box = {
        "l_partkey": (pmn + (pmx - pmn) * 45 // 100,
                      pmn + (pmx - pmn) * 55 // 100),
        "l_suppkey": (smn + (smx - smn) * 45 // 100,
                      smn + (smx - smn) * 55 // 100),
    }
    pred = ((F.col("l_partkey").between(*box["l_partkey"]))
            & (F.col("l_suppkey").between(*box["l_suppkey"])))

    tmp = tempfile.mkdtemp(prefix="zorder_")
    w = {"parquet.block.size": str(rows_per_group * 64)}  # small groups
    layouts = {
        "unsorted": li.repartition(8),
        "sorted_partkey": li.repartition(8, "l_partkey")
        .sortWithinPartitions("l_partkey"),
        "zorder": zorder_by(li, ["l_partkey", "l_suppkey"], bits=16,
                            num_partitions=8),
    }
    out = {"box": {k: list(v) for k, v in box.items()},
           "layouts": {}}
    for name, df in layouts.items():
        p = f"{tmp}/{name}"
        (df.write.mode("overwrite")
         .option("parquet.page.row.count.limit", rows_per_group)
         .option("parquet.block.size", 256 * 1024)
         .save(p))
        groups = footer_stats(p, ["l_partkey", "l_suppkey"])
        n_kept, rows_kept = kept_groups(groups, box)
        t0 = time.perf_counter()
        n = spark.read.parquet(p).where(pred).count()
        dt = round(time.perf_counter() - t0, 3)
        out["layouts"][name] = {
            "row_groups_total": len(groups),
            "row_groups_kept": n_kept,
            "rows_scanned_after_pruning": rows_kept,
            "selected_rows": n,
            "spark_filter_sec": dt,
        }
    shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(out, indent=2, default=int))


if __name__ == "__main__":
    main()
