"""Regression net for testdata timestamp-encoding drift.

The driver has regenerated the testdata twice, changing ``events.ts``'s
physical parquet type each time (TIMESTAMP(NANOS) → int64 epoch-nanos →
TIMESTAMP(MICROS)/NTZ). Round 2's only red row was a query calling
``unix_micros`` on the new NTZ column. ``_t()`` in queries.py now normalizes
every temporal column to session-TZ TIMESTAMP at the read boundary; this test
pins that by writing the same events rows in all three historical encodings
and asserting every events-consuming query (a) analyzes and (b) — for a
value-bearing representative — produces identical results on each.
"""

from __future__ import annotations

import inspect
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from datapump_spark.queries import EXTRA_QUERIES, QUERIES

SF_DIR = "/root/testdata/sf0.001"

ALL_QUERIES = {**QUERIES, **EXTRA_QUERIES}

# Every registered query whose source reads the events table via _t().
EVENTS_QUERIES = sorted(
    name for name, fn in ALL_QUERIES.items()
    if '"events"' in inspect.getsource(fn)
)


def _write_variant(tmpdir: str, encoding: str) -> str:
    """Materialize sf0.001 with events.ts re-encoded; other tables symlinked."""
    out = os.path.join(tmpdir, encoding)
    os.makedirs(out)
    for f in os.listdir(SF_DIR):
        if f != "events.parquet":
            os.symlink(os.path.join(SF_DIR, f), os.path.join(out, f))
    t = pq.read_table(os.path.join(SF_DIR, "events.parquet"))
    i = t.schema.get_field_index("ts")
    ts = t.column(i).cast(pa.timestamp("us"))  # normalize source first
    if encoding == "ntz_micros":
        new = ts
    elif encoding == "tz_micros":
        new = ts.cast(pa.timestamp("us", tz="UTC"))
    elif encoding == "nanos_bigint":
        new = ts.cast(pa.timestamp("ns")).cast(pa.int64())
    else:  # pragma: no cover
        raise ValueError(encoding)
    t = t.set_column(i, pa.field("ts", new.type), new)
    pq.write_table(t, os.path.join(out, "events.parquet"))
    return out


@pytest.fixture(scope="module")
def variants(tmp_path_factory):
    base = str(tmp_path_factory.mktemp("tsdrift"))
    dirs = {e: _write_variant(base, e)
            for e in ("ntz_micros", "tz_micros", "nanos_bigint")}
    yield dirs
    shutil.rmtree(base, ignore_errors=True)


def test_events_query_list_nonempty():
    # The registry introspection must actually find the ts consumers;
    # if this shrinks to zero the whole module silently tests nothing.
    assert "q_sessionize" in EVENTS_QUERIES
    assert len(EVENTS_QUERIES) >= 15


@pytest.mark.parametrize("encoding", [
    # ALL analysis-only sweeps are `slow` (round 7): the exact-value
    # sessionize check below still runs all three encodings in-default,
    # and every gated events query analyzes the driver's actual nanos
    # encoding on every oracle run
    pytest.param("ntz_micros", marks=pytest.mark.slow),
    pytest.param("tz_micros", marks=pytest.mark.slow),
    pytest.param("nanos_bigint", marks=pytest.mark.slow),
])
def test_all_events_queries_analyze(spark, variants, encoding):
    """Schema resolution (Catalyst analysis) must succeed for every
    events-consuming query under every historical ts encoding."""
    sf = variants[encoding]
    failed = []
    for name in EVENTS_QUERIES:
        try:
            ALL_QUERIES[name](spark, sf).schema  # triggers analysis only
        except Exception as exc:  # noqa: BLE001
            failed.append(f"{name}: {type(exc).__name__}: {exc}")
    assert not failed, "\n".join(failed)


def test_sessionize_identical_across_encodings(spark, variants):
    """Exact-value check: the µs-precision session math must not shift
    across encodings (nanos truncate to µs; NTZ wall clock == UTC instant)."""
    results = {}
    for enc, sf in variants.items():
        rows = ALL_QUERIES["q_sessionize"](spark, sf).collect()
        results[enc] = sorted(tuple(r) for r in rows)
    assert results["ntz_micros"] == results["tz_micros"] == results["nanos_bigint"]
    assert len(results["ntz_micros"]) > 0
