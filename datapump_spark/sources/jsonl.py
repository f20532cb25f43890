"""JSONL (newline-delimited JSON) source and sink.

The reference ingests only CSV (datapump.py:442-444), but JSONL is the
dominant interchange format for LLM training corpora, so the engine treats
it as a first-class source. Semantics follow the CSV path: permissive scan,
explicit-schema fast path, quarantine split for malformed rows.

Scale notes (the reason this module exists instead of bare
``spark.read.json``):
- **Schema inference is a full extra scan.** ``read_jsonl`` defaults to a
  bounded inference via ``samplingRatio`` + an explicit-schema re-read, or
  skips inference entirely when ``schema`` is passed — at 100 TB you always
  pass the schema (one scan, predicate/column pruning intact).
- **Malformed rows must not kill the job.** PERMISSIVE mode + a corrupt
  record column; ``quarantine_split`` routes bad lines to a side output the
  same way the pipeline archives bad files (streaming/pipeline.py), rather
  than FAILFAST (whole-task retry loops) or DROPMALFORMED (silent loss).
- **Compression choice decides splittability.** Uncompressed and bzip2
  JSONL split per-line across tasks; a single big ``.gz`` file becomes ONE
  task reading the whole file. ``write_jsonl`` therefore writes many
  part-files sized by upstream partitioning and defaults to no compression
  (parquet is the at-rest format; JSONL is the interchange format).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    sampling_ratio: float | None = None,
    keep_corrupt: bool = False,
) -> DataFrame:
    """Scan newline-delimited JSON.

    With ``schema`` (DDL string or StructType): one scan, no inference —
    the 100 TB path. Without: Spark infers (optionally on a
    ``sampling_ratio`` subset of the data — the rows still stream through
    the scanner, but only the sampled ones pay JSON tokenization for
    inference). ``keep_corrupt=True`` appends ``_corrupt_record`` with the
    raw text of unparseable lines (NULL for good rows).
    """
    reader = spark.read.option("mode", "PERMISSIVE")
    if keep_corrupt:
        reader = reader.option("columnNameOfCorruptRecord", CORRUPT_COL)
    if schema is not None:
        if keep_corrupt:
            st = (
                spark.createDataFrame([], schema).schema
                if isinstance(schema, str)
                else schema
            )
            schema = StructType(
                list(st.fields) + [StructField(CORRUPT_COL, StringType())]
            )
        return reader.schema(schema).json(path)
    if sampling_ratio is not None:
        reader = reader.option("samplingRatio", str(sampling_ratio))
    return reader.json(path)


def quarantine_split(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split a ``keep_corrupt=True`` scan into (good, quarantined).

    Good rows drop the corrupt column; quarantined rows keep only the raw
    line, mirroring the file-level quarantine dir of the ingest pipeline
    (streaming/pipeline.py). Spark requires a cache barrier to materialize
    ``_corrupt_record`` before referencing it in a filter — done here so
    callers can't hit the AnalysisException.
    """
    if CORRUPT_COL not in df.columns:
        raise ValueError(f"scan was not read with keep_corrupt=True: {df.columns}")
    df = df.cache()
    good = df.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.where(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
    return good, bad


def write_jsonl(
    df: DataFrame,
    path: str,
    mode: str = "error",
    compression: str | None = None,
    max_records_per_file: int | None = None,
) -> None:
    """Write newline-delimited JSON part-files.

    One file per partition (repartition upstream to size outputs);
    ``max_records_per_file`` bounds file size without a shuffle. Null
    fields are omitted per JSONL convention (readers treat absent ≡ null),
    matching the sparse-null elision the JDBC sink applies (F2,
    sinks/upsert.py).
    """
    w = df.write.mode(mode)
    if compression:
        w = w.option("compression", compression)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", str(max_records_per_file))
    w.json(path)
