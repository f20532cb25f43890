"""Python UDTF surface (Spark 4): table functions for row-expanding
transforms that don't reduce to a single ``explode`` expression.

Policy: UDTFs here are the EXTENSIBILITY seam, not the hot path — a
Python UDTF runs row-at-a-time in a Python worker, so anything
expressible as codegen (``explode(split(...))`` and friends) ships as
native expressions elsewhere in the package. ``sentence_split`` is
deliberately implemented BOTH ways: the UDTF (this module) for API
parity with engines whose users write table functions, and
:func:`sentences_native` as the codegen twin — tests pin them equal, so
the seam stays honest about what the slow path costs.

Scale note: a ``LATERAL`` UDTF call parallelizes like any projection
(no shuffle introduced); the cost is Python-worker serialization per
row. Use for low-volume expansion (config tables, manifests) or
genuinely imperative row logic; use the native twin for corpus-scale.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf resolves string type hints

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf

# Sentence boundary: ., !, ? runs followed by whitespace. Shared by both
# paths so they are definitionally equivalent.
_SENT_SPLIT_RE = r"(?<=[.!?])\s+"


@udtf(returnType="sent_idx int, sentence string")
class SentenceSplit:
    """One output row per sentence of the input text, with its 0-based
    index. Empty/NULL text yields no rows (table-function semantics —
    callers wanting to keep empty docs use a LATERAL ... LEFT JOIN)."""

    def eval(self, text: str):  # noqa: D102 — UDTF contract
        import re

        if not text:
            return
        for i, s in enumerate(s for s in re.split(_SENT_SPLIT_RE, text)
                              if s.strip()):
            yield i, s


def split_sentences_udtf(df: DataFrame, text_col: str, keys: list[str]) -> DataFrame:
    """UDTF path: ``keys… , sent_idx, sentence`` via a LATERAL join."""
    spark = df.sparkSession
    spark.udtf.register("sentence_split", SentenceSplit)
    df.createOrReplaceTempView("__udtf_in")
    key_list = ", ".join(f"t.{k}" for k in keys)
    return spark.sql(
        f"SELECT {key_list}, s.sent_idx, s.sentence "
        f"FROM __udtf_in t, LATERAL sentence_split(t.{text_col}) s"
    )


def sentences_native(text: Column) -> Column:
    """Codegen twin: array of non-empty sentences (same regex)."""
    return F.filter(
        F.split(text, _SENT_SPLIT_RE),
        lambda s: F.trim(s) != "",
    )


def split_sentences_native(df: DataFrame, text_col: str, keys: list[str]) -> DataFrame:
    """Native path, identical output contract to the UDTF path — this is
    what corpus-scale pipelines should run (whole-stage codegen, no
    Python workers)."""
    return df.select(
        *keys, F.posexplode(sentences_native(F.col(text_col)))
        .alias("sent_idx", "sentence")
    )


# ---------------------------------------------------------------- UDAF seam

def geometric_mean_udaf():
    """Pandas GROUPED_AGG UDAF (Arrow-batched custom aggregate) — the
    third leg of the UDF surface next to scalar exprs (everything in
    operators/) and the UDTF above. Same policy: extensibility seam,
    not hot path — :func:`geometric_mean_native` is the codegen twin
    (``exp(avg(ln x))``), pinned equal in tests.

    A GROUPED_AGG UDAF is NOT partially aggregated: every group's full
    column ships to one Python worker (fine for bounded groups,
    pathological for skewed ones) — the reason the package's real
    aggregates are built-ins or two-phase formulations."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def geo_mean(v: pd.Series) -> float:
        arr = v.dropna().to_numpy(dtype="float64")
        if arr.size == 0 or (arr <= 0).any():
            return float("nan")
        return float(np.exp(np.log(arr).mean()))

    return geo_mean


def geometric_mean_native(col: Column) -> Column:
    """Codegen twin: exp(avg(ln x)) over positive values."""
    return F.exp(F.avg(F.log(col)))
