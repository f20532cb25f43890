"""Property-based tests (SURVEY §5.3): dedupe vs a pure-Python model,
multi-format timestamp parsing, and type inference — hypothesis generates
the inputs, a trivial sequential model defines the truth.

One shared Spark session; hypothesis drives the data, not the session, so
deadlines are disabled (Spark job latency dominates)."""
from __future__ import annotations

from datetime import datetime

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

SETTINGS = dict(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# rows: (key, payload); small key space forces collisions
ROWS = st.lists(
    st.tuples(st.integers(0, 4), st.integers(-1000, 1000)),
    min_size=0, max_size=40,
)


@pytest.mark.slow
@given(rows=ROWS, keep=st.sampled_from(["first", "last"]))
@settings(**SETTINGS)
def test_dedupe_matches_python_model(spark, rows, keep):
    from datapump_spark.operators.dedupe import dedupe_by_key

    model: dict[int, tuple[int, int]] = {}
    for i, (k, v) in enumerate(rows):
        if keep == "first":
            model.setdefault(k, (i, v))
        else:
            model[k] = (i, v)

    df = spark.createDataFrame(
        [(k, v, i) for i, (k, v) in enumerate(rows)],
        "k bigint, v bigint, ord bigint",
    )
    got = {r["k"]: (r["ord"], r["v"])
           for r in dedupe_by_key(df, ["k"], "ord", keep).collect()}
    assert got == model


@pytest.mark.slow
@given(rows=ROWS)
@settings(**SETTINGS)
def test_dupe_count_matches_model(spark, rows):
    from datapump_spark.operators.dedupe import dupe_count

    expected = len(rows) - len({k for k, _ in rows})
    df = spark.createDataFrame(
        [(k, v) for k, v in rows] or [(None, None)],
        "k bigint, v bigint",
    )
    if not rows:
        df = df.where(F.lit(False))
    got = dupe_count(df, ["k"]).collect()[0]["dupe_count"]
    assert got == expected


TS = st.datetimes(min_value=datetime(2000, 1, 1), max_value=datetime(2037, 12, 31))


@pytest.mark.slow
@given(ts=TS, fmt_idx=st.integers(0, 3))
@settings(**SETTINGS)
def test_multiformat_ts_roundtrip(spark, ts, fmt_idx):
    """Any timestamp rendered in any supported format parses back exactly
    (second precision)."""
    from datapump_spark.sources.csv_ingest import DEFAULT_DATE_FORMATS, multi_format_ts

    ts = ts.replace(microsecond=0)
    py_fmts = ["%y-%m-%d %H:%M:%S", "%y/%m/%d %H:%M:%S",
               "%Y-%m-%d %H:%M:%S", "%Y/%m/%d %H:%M:%S"]
    rendered = ts.strftime(py_fmts[fmt_idx])
    df = spark.createDataFrame([(rendered,)], "raw string")
    got = df.select(multi_format_ts("raw", DEFAULT_DATE_FORMATS).alias("p")).collect()[0]["p"]
    # 2-digit-year formats are tried first and Spark pivots yy to 20yy:
    # dates outside 2000-2099 can't round-trip through them, but the
    # 4-digit formats must always win when the 2-digit parse fails
    assert got == ts


@given(
    ints=st.lists(st.integers(-2**40, 2**40), min_size=1, max_size=8),
    floats=st.lists(
        st.floats(allow_nan=False, allow_infinity=False, width=32),
        min_size=1, max_size=8),
    texts=st.lists(st.text(alphabet="abcXYZ _-", min_size=1, max_size=12),
                   min_size=1, max_size=8),
)
@pytest.mark.slow
@settings(**SETTINGS)
def test_type_inference_classes(spark, ints, floats, texts):
    """All-int columns infer int; ints+floats infer float; anything
    non-numeric infers text (reference get_col_dtype, datapump.py:149-166)."""
    from datapump_spark.sources.csv_ingest import infer_ckan_fields

    n = max(len(ints), len(floats), len(texts))
    pad = lambda xs: (xs * n)[:n]
    rows = list(zip(
        [str(i) for i in pad(ints)],
        [repr(f) for f in pad(floats)],
        pad(texts),
    ))
    df = spark.createDataFrame(rows, "c_int string, c_float string, c_text string")
    fields = {f.name: f.ckan_type for f in infer_ckan_fields(df)}
    assert fields["c_int"] == "int"
    assert fields["c_float"] in ("float", "int")  # 1.0-style renders stay float
    # a float column with only integral reprs like '1.0' still parses as
    # float because of the decimal point
    if any("." in repr(f) or "e" in repr(f) for f in pad(floats)):
        assert fields["c_float"] == "float"
    assert fields["c_text"] == "text"


# documents: tiny vocab + short lengths force heavy n-gram collisions
_SPAN_DOCS = st.lists(
    st.lists(st.sampled_from(list("abcdef")), min_size=0, max_size=12),
    min_size=0, max_size=8,
)


def _span_model(docs: list[list[str]], n: int):
    """Sequential truth for remove_duplicate_spans: duplicated n-grams
    keep their first (doc, pos) occurrence; every other occurrence marks
    [pos, pos+n); marked tokens are removed."""
    occ: dict[tuple[str, ...], list[tuple[int, int]]] = {}
    for d, toks in enumerate(docs):
        for p in range(len(toks) - n + 1):
            occ.setdefault(tuple(toks[p:p + n]), []).append((d, p))
    cut = {d: set() for d in range(len(docs))}
    for places in occ.values():
        if len(places) >= 2:
            for d, p in sorted(places)[1:]:
                cut[d].update(range(p, p + n))
    out = {}
    for d, toks in enumerate(docs):
        kept = [t for i, t in enumerate(toks) if i not in cut[d]]
        out[d] = (len(toks), len(toks) - len(kept), " ".join(kept))
    return out


@pytest.mark.slow
@given(docs=_SPAN_DOCS, n=st.integers(2, 4))
@settings(**SETTINGS)
def test_span_dedup_matches_python_model(spark, docs, n):
    from datapump_spark.operators.line_dedup import remove_duplicate_spans

    if not docs:
        return
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id bigint, text string")
    got = {r.doc_id: (r.n_tokens, r.n_removed, r.clean_text)
           for r in remove_duplicate_spans(df, n=n).collect()}
    assert got == _span_model(docs, n)
