"""Bench-harness safety net: every query bench.py times must BUILD and RUN
at sf0.001, and the bench list must only name registered queries.

Round-2 post-mortem: one query crashing erased the whole round's bench
evidence because nothing exercised the bench registry end-to-end between
testdata regenerations. bench.py is now per-query fault-tolerant AND this
gate fails CI the moment any benched query stops running.
"""

from __future__ import annotations

import pytest

from datapump_spark.queries import BENCH_VARIANTS, EXTRA_QUERIES, QUERIES

SF_DIR = "/root/testdata/sf0.001"

ALL = {**QUERIES, **EXTRA_QUERIES, **BENCH_VARIANTS}


def bench_names() -> list[str]:
    import bench

    return list(bench.BENCH_QUERIES)


def test_bench_list_is_registered():
    missing = [n for n in bench_names() if n not in ALL]
    assert not missing, f"bench.py names unregistered queries: {missing}"


# The two heaviest variants (multi-second ANN index builds) run behind
# All variant smokes are `slow` (round 7): the driver executes every
# BENCH_QUERIES entry per round with errors recorded (bench.py n_errors),
# and their recall/value semantics are pinned in test_pq /
# test_text_dedup — this parametrization adds only registry wiring,
# which test_bench_list_is_registered still covers in-default.
@pytest.mark.parametrize("name", [
    pytest.param(n, marks=pytest.mark.slow) for n in sorted(BENCH_VARIANTS)])
def test_bench_variant_runs(spark, name):
    """BENCH_VARIANTS are outside the driver's 50-query correctness gate
    and outside EXTRA_ORACLES — this smoke is their only registry-wide
    net. Row counts/values are pinned in each operator's own test file;
    here: analyzes, executes, returns a stable non-empty schema."""
    df = BENCH_VARIANTS[name](spark, SF_DIR)
    assert df.schema.fields
    assert df.count() >= 0
