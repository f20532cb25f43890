"""Sequence packing — assembling documents into fixed token-budget
training sequences.

Two strategies, the two used in practice:

- :func:`pack_concat_chunks` — GPT-style "concatenate everything, cut
  every ``budget`` tokens". Documents straddle chunk boundaries; zero
  padding waste. Needs a global token prefix-sum, computed scalably in
  two phases: per-bucket partial sums (one small aggregate over
  ``O(#buckets)`` rows) are turned into bucket offsets, then a
  within-bucket window (partitioned by bucket — never a single global
  window) adds the local running sum. Pure DataFrame ops, shuffle keyed
  on the bucket; SQL-expressible end-to-end, so it carries a DuckDB
  oracle.
- :func:`pack_greedy_bins` — boundary-respecting first-fit-decreasing:
  no document is split; each shard packs independently (hash-sharded →
  ``applyInPandas`` per shard), so packing parallelizes across executors
  and stays deterministic under any input partitioning (each group is
  sorted before packing). The greedy loop is per-shard Python over Arrow
  batches — the standard escape hatch for genuinely sequential logic —
  bounded by shard size, not corpus size. Not SQL-expressible
  (bin state is order-dependent), so it is invariant-tested instead of
  oracle-checked.

Extends the reference (nothing comparable exists there) per the build
plan's training-data-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from datapump_spark.functions.hashing import tokens


def _with_token_counts(df: DataFrame, id_col: str, text_col: str | None,
                       token_col: str | None) -> DataFrame:
    if token_col is not None:
        return df.select(F.col(id_col), F.col(token_col).alias("n_tok"))
    return df.select(
        F.col(id_col),
        F.size(tokens(F.col(text_col))).cast("bigint").alias("n_tok"),
    )


def pack_concat_chunks(
    df: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    text_col: str | None = "text",
    token_col: str | None = None,
    bucket_width: int = 10_000,
) -> DataFrame:
    """Concat-and-chunk packing over ascending ``id_col`` order.

    Returns one row per (sequence, document) overlap:
    ``(seq_id, doc_id, n_tok_in_seq)`` — a document spanning a boundary
    appears in each sequence it touches with its token share. Zero-token
    documents are dropped (they occupy no positions).

    The global prefix sum never materializes on one node: documents are
    range-bucketed by ``floor(id / bucket_width)``; bucket subtotal rows
    (thousands, not billions) get a tiny ordered window for offsets and
    are broadcast back; the per-document running sum is a window
    partitioned *by bucket*.
    """
    toks = (_with_token_counts(df, id_col, text_col, token_col)
            .where(F.col("n_tok") > 0)
            .withColumn("__b", F.floor(F.col(id_col) / bucket_width)))

    totals = toks.groupBy("__b").agg(F.sum("n_tok").alias("__bt"))
    off_w = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "__b", F.coalesce(F.sum("__bt").over(off_w), F.lit(0)).alias("__off"))

    in_w = (Window.partitionBy("__b").orderBy(id_col)
            .rowsBetween(Window.unboundedPreceding, -1))
    pos = (
        toks.join(F.broadcast(offsets), "__b")
        .withColumn("__start",
                    F.col("__off") + F.coalesce(F.sum("n_tok").over(in_w),
                                                F.lit(0)))
    )
    start, end = F.col("__start"), F.col("__start") + F.col("n_tok")
    seqs = F.sequence(F.floor(start / budget), F.floor((end - 1) / budget))
    return (
        pos.select(F.col(id_col), "n_tok", "__start",
                   F.explode(seqs).alias("seq_id"))
        .select(
            F.col("seq_id").cast("bigint"),
            F.col(id_col),
            (F.least(end, (F.col("seq_id") + 1) * budget)
             - F.greatest(start, F.col("seq_id") * budget))
            .cast("bigint").alias("n_tok_in_seq"),
        )
    )


def pack_greedy_bins(
    df: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    text_col: str | None = "text",
    token_col: str | None = None,
    n_shards: int = 32,
) -> DataFrame:
    """First-fit-decreasing packing, no document split across sequences.

    Documents are hash-sharded; each shard is packed independently with
    FFD over (n_tok desc, id asc) — deterministic for any input
    partitioning. A document longer than ``budget`` gets a bin of its
    own with ``overflow = true`` (callers decide: truncate or reject).

    Returns ``(shard, bin_id, doc_id, n_tok, overflow)``; the packed
    sequence key is ``(shard, bin_id)``.
    """
    toks = (_with_token_counts(df, id_col, text_col, token_col)
            .where(F.col("n_tok") > 0)
            .withColumn("shard",
                        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards))
                        .cast("int")))

    out_schema = (f"shard int, bin_id bigint, {id_col} bigint, "
                  "n_tok bigint, overflow boolean")

    def pack(pdf):
        import pandas as pd

        pdf = pdf.sort_values(["n_tok", id_col],
                              ascending=[False, True], ignore_index=True)
        bins: list[int] = []        # remaining capacity per bin
        rows = []
        for doc, n in zip(pdf[id_col], pdf["n_tok"]):
            n = int(n)
            if n > budget:
                bins.append(0)      # closed overflow bin
                rows.append((int(pdf["shard"].iat[0]), len(bins) - 1,
                             int(doc), n, True))
                continue
            for b, cap in enumerate(bins):
                if cap >= n:
                    bins[b] = cap - n
                    break
            else:
                bins.append(budget - n)
                b = len(bins) - 1
            rows.append((int(pdf["shard"].iat[0]), b, int(doc), n, False))
        return pd.DataFrame(
            rows, columns=["shard", "bin_id", id_col, "n_tok", "overflow"])

    return toks.groupBy("shard").applyInPandas(pack, out_schema)
