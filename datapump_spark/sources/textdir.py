"""Raw-text directory source: one document per file.

Corpora often arrive as trees of ``.txt``/``.md`` files rather than
JSONL/parquet. ``read_text_dir`` scans a directory into
``(doc_path, file name, mtime, size, text)`` rows using Spark's
``wholetext`` reader, so downstream operators (quality, dedup, packing)
see the same (id, text) shape the documents table has.

Scale notes:
- ``wholetext=True`` makes the *file* the record: a file is never split
  across tasks, so one pathological multi-GB file becomes one
  executor-memory-sized record — bound inputs upstream (the reference's
  pipeline has the same per-file granularity, datapump.py:694-707).
- File listing is driver-side metadata work; at millions of files point
  the path at fewer, bigger containers (or compact to parquet early —
  this source is an ingest edge, not the at-rest format).
- Identity is the file path (``_metadata.file_path``), stable across
  re-runs; mtime/size ride along for audit parity with the CSV pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_text_dir(
    spark: SparkSession,
    path: str,
    glob: str = "*.txt",
    recursive: bool = True,
    whole_files: bool = True,
) -> DataFrame:
    """Scan a directory of text files.

    ``whole_files=True``: one row per file (document granularity).
    ``whole_files=False``: one row per line, same metadata columns —
    the splittable variant for line-oriented corpora.
    """
    # NB: the wholetext switch only takes effect as a text() kwarg — the
    # generic .option("wholetext", …) route is silently ignored.
    df = spark.read.text(
        path,
        wholetext=whole_files,
        pathGlobFilter=glob,
        recursiveFileLookup=recursive,
    )
    return df.select(
        F.col("_metadata.file_path").alias("doc_path"),
        F.col("_metadata.file_name").alias("file_name"),
        F.col("_metadata.file_modification_time").alias("mtime"),
        F.col("_metadata.file_size").alias("size_bytes"),
        F.col("value").alias("text"),
    )
