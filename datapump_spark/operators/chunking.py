"""Sliding-window document chunking (RAG / context-window prep).

Splits each document's token stream into fixed-size windows with
overlap — the standard retrieval-corpus and long-document-training prep
(every RAG stack and the Pile's long-doc handling do exactly this).
Contrast :mod:`datapump_spark.operators.packing`, which packs WHOLE
short documents into training sequences; chunking cuts LONG documents
down, preserving ``overlap`` tokens of context across the cut.

Chunk grid: starts at token 1, advances by ``chunk_tokens − overlap``;
the last chunk is the first one whose window reaches the document's end
(it may be short). Every token lands in ≥ 1 chunk; no chunk is fully
contained in its predecessor. Docs with zero tokens yield no chunks.

Plan shape: pure column expressions (tokens → start grid → posexplode) —
zero shuffle, scan-speed, whole-stage codegen except the higher-order
transform. At 100 TB this is a map-only pass whose output partitioning
inherits the input's; downstream embedding/indexing repartitions as it
needs.

Extends the reference (no text analysis there, SURVEY §2.9) per the
build plan's training-data surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datapump_spark.functions.hashing import tokens


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """(id, chunk_id, start_tok, n_tokens, chunk_text) — one row per
    chunk; ``chunk_id`` counts from 0 per document, ``start_tok`` is the
    1-based token offset of the window."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"need 0 <= overlap < chunk_tokens: {overlap}, {chunk_tokens}")
    stride = chunk_tokens - overlap
    d = df.select(F.col(id_col), tokens(F.col(text_col)).alias("__t"))
    n = F.size("__t")
    # chunks beyond the first: enough strides to reach the end of the doc
    n_chunks = F.when(n <= 0, F.lit(0)).otherwise(
        1 + F.greatest(
            F.lit(0),
            F.floor((n - chunk_tokens + stride - 1) / F.lit(stride))
            .cast("int"),
        )
    )
    # guard: sequence(0, -1) would DESCEND, not be empty
    starts = F.when(
        n_chunks > 0,
        F.transform(F.sequence(F.lit(0), n_chunks - 1),
                    lambda j: j * stride + 1),
    ).otherwise(F.array().cast("array<int>"))
    e = d.select(
        id_col, "__t",
        F.posexplode(starts).alias("chunk_id", "start_tok"),
    )
    piece = F.slice("__t", F.col("start_tok"), chunk_tokens)
    return e.select(
        F.col(id_col),
        F.col("chunk_id").cast("bigint").alias("chunk_id"),
        F.col("start_tok").cast("bigint").alias("start_tok"),
        F.size(piece).cast("bigint").alias("n_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )
