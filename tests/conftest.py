from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


@pytest.fixture(scope="session")
def spark():
    import os

    from datapump_spark.session import get_session

    # Suite-wide wall-clock knobs: 8 cores serve the heavy recipe/PQ/
    # pipeline tests without starving them, and 8 shuffle partitions (AQE
    # still coalesces below that) cut per-job scheduling overhead on the
    # hundreds of tiny-data jobs that dominate the suite.
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "8")
    s = get_session("tests", master="local[8]")
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"
