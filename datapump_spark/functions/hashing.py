"""Cross-engine deterministic hashing + tokenization primitives.

The correctness gate compares Spark output against DuckDB, so hash-based
operators (MinHash, SimHash, fingerprints) need a hash function both engines
compute identically. Neither engine's native 64-bit hash matches the other
(Spark xxhash64 vs DuckDB hash), but both have md5 with identical lowercase
hex output, and both can turn 15 hex chars into a BIGINT:

- Spark : ``CAST(conv(substr(md5(s), 1, 15), 16, 10) AS BIGINT)``
- DuckDB: ``('0x' || substr(md5(s), 1, 15))::BIGINT``

giving the same 60-bit non-negative integer. md5 costs more than xxhash64;
production at 100 TB should flip ``hash_fn='xxhash64'`` (same plan shape,
Spark-native speed) — md5 is the verifiability profile.

Tokenization: lowercase, split on non-alphanumeric runs, drop empties —
expressed with the same lambda semantics in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hash63(col: Column | str, hash_fn: str = "md5") -> Column:
    """Deterministic non-negative BIGINT hash of a string column."""
    c = F.col(col) if isinstance(col, str) else col
    if hash_fn == "md5":
        return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")
    if hash_fn == "xxhash64":
        # fast path for production; not cross-engine-comparable
        return F.abs(F.xxhash64(c))
    raise ValueError(f"unknown hash_fn {hash_fn!r}")


def hash63_sql(expr: str) -> str:
    """DuckDB twin of :func:`hash63` (md5 profile) as a SQL fragment."""
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


def tokens(col: Column | str) -> Column:
    """Lowercased alphanumeric tokens, empties dropped."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(
        F.split(F.lower(c), r"[^a-z0-9]+"),
        lambda x: x != F.lit(""),
    )


def tokens_sql(expr: str) -> str:
    """DuckDB twin of :func:`tokens`."""
    return (
        f"list_filter(string_split_regex(lower({expr}), '[^a-z0-9]+'), x -> x != '')"
    )
