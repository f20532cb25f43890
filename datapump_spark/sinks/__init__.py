from datapump_spark.sinks.upsert import JdbcUpsertSink, ParquetMergeSink

__all__ = ["JdbcUpsertSink", "ParquetMergeSink"]
