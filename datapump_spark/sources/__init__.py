from datapump_spark.sources.csv_ingest import (
    DEFAULT_DATE_FORMATS,
    infer_ckan_fields,
    ingest_csv,
    multi_format_ts,
    read_csv_raw,
)

__all__ = [
    "DEFAULT_DATE_FORMATS",
    "infer_ckan_fields",
    "ingest_csv",
    "multi_format_ts",
    "read_csv_raw",
]
