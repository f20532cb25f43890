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
    b = (tuned_builder("tests").master("local[8]")
         .config("spark.ui.enabled", "false")
         .config("spark.ui.showConsoleProgress", "false"))
    if os.environ.get("SPARK_GRAFT_TEST_NO_AQE"):
        b = b.config("spark.sql.adaptive.enabled", "false")
    # WholeStage codegen OFF for the suite: Janino compiles each unique
    # tiny query for ~50-300 ms that interpretation never earns back on
    # sf0.001 data (measured ~8% of suite wall; production sessions via
    # tuned_builder keep it on). test_wet_path_is_pure_codegen re-enables
    # it locally for its fusion assertion.
    if not os.environ.get("SPARK_GRAFT_TEST_CODEGEN"):
        b = b.config("spark.sql.codegen.wholeStage", "false")
    s = b.getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"
