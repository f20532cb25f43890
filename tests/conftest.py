from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


@pytest.fixture(scope="session")
def spark():
    import os

    # Suite-wide wall-clock knobs: 8 cores serve the heavy recipe/PQ/
    # pipeline tests without starving them, and 4 shuffle partitions (AQE
    # still coalesces below that) cut per-job scheduling overhead on the
    # hundreds of tiny-data jobs that dominate the suite. The UI serves
    # nothing in CI and its listener work taxes every one of those jobs.
    from datapump_spark.session import tuned_builder

    os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "4")
    s = (tuned_builder("tests").master("local[8]")
         .config("spark.ui.enabled", "false")
         .config("spark.ui.showConsoleProgress", "false")
         .getOrCreate())
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"
