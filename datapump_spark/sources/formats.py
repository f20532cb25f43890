"""Uniform columnar/text format façade: parquet, ORC, CSV, JSONL.

One read/write surface over Spark's native datasources so pipelines can
switch storage formats by name without touching operator code. Parquet
is the default interchange format everywhere else in the package; ORC
matters for interop with Hive-era warehouses and keeps the same
columnar virtues (column pruning + predicate pushdown reach the scan —
pinned by a plan assertion in tests), CSV/JSONL are the text on-ramps
(with the richer ingestion paths in csv_ingest/jsonl for inference,
quarantine, and multi-format timestamps).

Scale note: both columnar formats get identical treatment from the
scan planner (split by maxPartitionBytes, footer-stats row-group skip);
the text formats split by line only when uncompressed — gzip inputs are
one split per file, so pipelines should shard text uploads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_COLUMNAR = {"parquet", "orc"}
_TEXT = {"csv", "json"}
FORMATS = _COLUMNAR | _TEXT


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: str | None = None,
    **options,
) -> DataFrame:
    """Read ``path`` in ``fmt``. Text formats REQUIRE an explicit schema
    (inference costs an extra full pass and types drift run-to-run —
    the engine's ingestion policy; use sources.csv_ingest for sniffing).
    """
    fmt = fmt.lower()
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {sorted(FORMATS)}")
    reader = spark.read.format(fmt)
    if fmt in _TEXT:
        if schema is None:
            raise ValueError(f"{fmt} read requires an explicit schema")
        if fmt == "csv":
            reader = reader.option("header", True)
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    **options,
) -> None:
    fmt = fmt.lower()
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {sorted(FORMATS)}")
    writer = df.write.format(fmt).mode(mode)
    if fmt == "csv":
        writer = writer.option("header", True)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save(path)
