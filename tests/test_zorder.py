"""Z-order key math vs a python reference + layout clustering property."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datapump_spark.operators.zorder import with_zvalue, zorder_by


def _interleave(vals: list[int], bits: int) -> int:
    z = 0
    for i in range(bits):
        for j, v in enumerate(vals):
            z |= ((v >> i) & 1) << (i * len(vals) + j)
    return z


def _scale(x: int, mn: int, mx: int, bits: int) -> int:
    return ((x - mn) * ((1 << bits) - 1)) // max(mx - mn, 1)


def test_zvalue_matches_python_reference(spark):
    rows = [(i, x, y) for i, (x, y) in enumerate(
        [(0, 0), (1, 1), (7, 3), (100, 50), (255, 255), (13, 200)])]
    df = spark.createDataFrame(rows, "id int, x long, y long")
    out = {r["id"]: r["zval"]
           for r in with_zvalue(df, ["x", "y"], bits=8).collect()}
    xs = [x for _, x, _ in rows]
    ys = [y for _, _, y in rows]
    for i, x, y in rows:
        sx = _scale(x, min(xs), max(xs), 8)
        sy = _scale(y, min(ys), max(ys), 8)
        assert out[i] == _interleave([sx, sy], 8)


def test_zvalue_constant_column_degrades_gracefully(spark):
    df = spark.createDataFrame([(1, 5, 9), (2, 5, 17)], "id int, x long, y long")
    out = with_zvalue(df, ["x", "y"], bits=4).collect()
    # constant x scales to 0 everywhere; zval is then just spread y bits
    assert all(r["zval"] >= 0 for r in out)
    assert len({r["zval"] for r in out}) == 2


def test_bits_validation(spark):
    df = spark.createDataFrame([(1, 1, 1)], "id int, x long, y long")
    with pytest.raises(ValueError):
        with_zvalue(df, ["x", "y"], bits=32)  # 64 bits > 63


def test_zorder_by_clusters_both_columns(spark):
    # a z-ordered layout must keep BOTH columns locally clustered:
    # per-partition value ranges should cover far less than the full domain
    n = 1 << 10
    rows = [(i, i % 32, (i * 7) % 32) for i in range(n)]
    df = spark.createDataFrame(rows, "id int, x long, y long").repartition(8)
    z = zorder_by(df, ["x", "y"], bits=5, num_partitions=8)
    assert z.columns == ["id", "x", "y"]  # helper column dropped
    spans = (z.withColumn("p", F.spark_partition_id())
             .groupBy("p")
             .agg((F.max("x") - F.min("x")).alias("sx"),
                  (F.max("y") - F.min("y")).alias("sy"))
             .collect())
    assert len(spans) == 8
    avg_sx = sum(r["sx"] for r in spans) / len(spans)
    avg_sy = sum(r["sy"] for r in spans) / len(spans)
    # unclustered (or single-column-sorted) the non-sort column spans ~31
    # per partition; z-order keeps BOTH well under the full domain even
    # with sampled (inexact) range boundaries
    assert avg_sx <= 24 and avg_sy <= 24
