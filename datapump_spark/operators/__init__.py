"""Operator library: pure DataFrame -> DataFrame functions.

Each operator mirrors one row of SURVEY.md §2's inventory (reference
citations in the individual docstrings) or one of the §7 Phase-3 extended
operators, expressed Catalyst-first: built-in functions, explicit broadcasts,
no Python row loops.
"""

from datapump_spark.operators.dedupe import dedupe_by_key, dupe_count
from datapump_spark.operators.resample import freq_resample
from datapump_spark.operators.describe import describe_numeric, describe_string, describe_table
from datapump_spark.operators.mode import column_modes

__all__ = [
    "dedupe_by_key",
    "dupe_count",
    "freq_resample",
    "describe_numeric",
    "describe_string",
    "describe_table",
    "column_modes",
]
