"""Training-shard materialization: deterministic global shuffle → N
parquet shards.

The last step of a pre-training data pipeline: emit the corpus as
``n_shards`` directories whose concatenation, read shard-by-shard in
``order_key`` order, is a reproducible global permutation of the corpus.
Loaders stream shard files sequentially, so the permutation must be baked
into the layout, not applied at read time.

Determinism comes from the sampling module's key-hash discipline
(operators/sampling.py): shard = hash(key, shard_salt) % n, intra-shard
position = hash(key, order_salt) — pure functions of the row key, so a
re-run, a different cluster size, or a different input partitioning
produces byte-identical shards. Spark's ``df.orderBy(rand())`` gives none
of that, and a single global ``row_number`` window would serialize the
corpus through one task.

Plan: ONE shuffle (``repartition(n_shards, shard)``) + a sort *within*
partitions (no extra exchange) + ``partitionBy('shard')`` dir layout.
Hash-partitioning may co-locate a few shard values in one task; that only
means a shard dir gets its rows from one writer task — correctness and
per-file ordering are unaffected because every file holds a sorted run of
exactly one shard and files within a shard are disjoint hash ranges only
when tasks collide (readers merge by ``order_key``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datapump_spark.operators.sampling import _key_hash, shard_assign

ORDER_COL = "order_key"


def write_training_shards(
    df: DataFrame,
    path: str,
    key_col: str,
    n_shards: int,
    shard_salt: str = "shard",
    order_salt: str = "order",
    hash_fn: str = "md5",
    mode: str = "error",
    max_records_per_file: int | None = None,
) -> None:
    """Shuffle-shard ``df`` into ``path/shard=K/`` parquet dirs.

    ``order_salt`` is independent of ``shard_salt`` so the within-shard
    permutation is decorrelated from shard assignment. The ``order_key``
    column is persisted — readers sort by it to restore the permutation.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1: {n_shards}")
    sharded = (
        shard_assign(df, key_col, n_shards, shard_salt, hash_fn)
        .withColumn(ORDER_COL, _key_hash(F.col(key_col), order_salt, hash_fn))
    )
    w = (
        sharded.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", ORDER_COL, key_col)
        .write.mode(mode)
    )
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", str(max_records_per_file))
    w.partitionBy("shard").parquet(path)


def read_training_shard(
    spark: SparkSession, path: str, shard: int | None = None
) -> DataFrame:
    """Read shards back in permutation order.

    ``shard=K`` prunes to one directory (partition pruning — the scan
    never lists the other shards). The returned frame is ordered by
    ``(shard, order_key, …)`` — a range-partitioned distributed sort over
    presorted files, which AQE keeps cheap."""
    df = spark.read.parquet(path)
    if shard is not None:
        df = df.where(F.col("shard") == shard)
    return df.orderBy("shard", ORDER_COL)
