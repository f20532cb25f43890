from datapump_spark.functions.hashing import hash63, hash63_sql, tokens, tokens_sql

__all__ = ["hash63", "hash63_sql", "tokens", "tokens_sql"]
