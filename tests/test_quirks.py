"""Quirks-ledger tests (SURVEY §2.13): each documented replicate/diverge
decision pinned by a test so the behavior is a contract, not an accident."""
from __future__ import annotations

import shutil
import time
from pathlib import Path

import pytest

from datapump_spark.jobspec import JobSpec
from datapump_spark.sinks.upsert import ParquetMergeSink
from datapump_spark.streaming.pipeline import Pipeline

FIXTURE_DIR = Path(__file__).parent / "data" / "iot"


def test_quirk2_group_key_survives_freq_output(spark, sf_dir):
    """§2.13.2: the reference's post-agg group-key drop always fails and is
    swallowed — the group key stays in the output. We replicate the
    OUTCOME (key present), not the buggy drop."""
    from datapump_spark.operators.resample import freq_resample
    from datapump_spark.queries import _t

    ev = _t(spark, sf_dir, "events")
    out = freq_resample(ev, ["user_id"], "ts", "H")
    assert "user_id" in out.columns


def test_quirk3_each_stat_sees_pristine_table(spark, tmp_path):
    """§2.13.3: reference DropColumns mutates the shared frame so stat #2
    can't use a column stat #1 dropped. We diverge: every stat computes
    from the pristine table."""
    job = JobSpec.from_dict({
        "InputFile": str(tmp_path / "in" / "*.csv"),
        "TargetOrg": "o", "TargetPackage": "p", "TargetResource": "r",
        "PrimaryKey": "DateTime,Sensor_id", "Dedupe": "last",
        "Truncate": False,
        "Stats": [
            # stat 1 drops PM25; stat 2 groups stats that NEED PM25
            {"Kind": "H", "GroupBy": "Sensor_id", "DropColumns": "PM25"},
            {"Kind": "D", "GroupBy": "Sensor_id"},
        ],
    })
    (tmp_path / "in").mkdir()
    src = sorted(FIXTURE_DIR.glob("*.csv"))[0]
    shutil.copy(src, tmp_path / "in" / src.name)
    sink = ParquetMergeSink(tmp_path / "lake")
    pipe = Pipeline(spark, job, sink, tmp_path / "done", tmp_path / "bad")
    res = pipe.run_available()
    assert res.processed and not res.quarantined
    hourly = sink.read(spark, "r-H")
    daily = sink.read(spark, "r-D")
    assert "PM25" not in hourly.columns       # stat 1's drop applied
    assert "PM25" in daily.columns            # …but did NOT leak into stat 2


def test_quirk5_oldest_first_newest_wins(spark, tmp_path):
    """§1.3/§2.13.5: reference processes newest-mtime-first so the OLDEST
    file wins PK collisions (a bug). We process oldest-first: the NEWEST
    file's value lands last and wins the upsert."""
    inbox = tmp_path / "in"
    inbox.mkdir()
    header = "DateTime,Sensor_id,PM25\n"
    old = inbox / "old.csv"
    new = inbox / "new.csv"
    old.write_text(header + "2021-01-01 00:00:00,s1,10\n")
    new.write_text(header + "2021-01-01 00:00:00,s1,99\n")
    now = time.time()
    import os
    os.utime(old, (now - 1000, now - 1000))
    os.utime(new, (now, now))

    job = JobSpec.from_dict({
        "InputFile": str(inbox / "*.csv"),
        "TargetOrg": "o", "TargetPackage": "p", "TargetResource": "r2",
        "PrimaryKey": "DateTime,Sensor_id", "Dedupe": "last",
        "Truncate": False, "Stats": [],
    })
    sink = ParquetMergeSink(tmp_path / "lake")
    pipe = Pipeline(spark, job, sink, tmp_path / "done", tmp_path / "bad")
    pipe.run_available()
    rows = sink.read(spark, "r2").collect()
    assert len(rows) == 1
    assert float(rows[0]["PM25"]) == 99.0     # newest file won


def test_quirk9_stats_failure_still_archives(spark, tmp_path, monkeypatch):
    """§2.13.9: a stats error logs to the audit but the input file still
    moves to processed/ (stats are non-fatal)."""
    inbox = tmp_path / "in"
    inbox.mkdir()
    src = sorted(FIXTURE_DIR.glob("*.csv"))[0]
    shutil.copy(src, inbox / src.name)
    job = JobSpec.from_dict({
        "InputFile": str(inbox / "*.csv"),
        "TargetOrg": "o", "TargetPackage": "p", "TargetResource": "r3",
        "PrimaryKey": "DateTime,Sensor_id", "Dedupe": "last",
        "Truncate": False, "Stats": [{"Kind": "descriptive"}],
    })
    sink = ParquetMergeSink(tmp_path / "lake")
    pipe = Pipeline(spark, job, sink, tmp_path / "done", tmp_path / "bad")
    monkeypatch.setattr(
        pipe, "_recompute_stats",
        lambda: (_ for _ in ()).throw(RuntimeError("boom")))
    res = pipe.run_available()
    assert res.processed and not res.quarantined      # file archived anyway
    assert sink.read(spark, "r3").count() > 0         # data landed


def test_k4_updated_stamp_rewrites_in_place(spark, tmp_path):
    """K4: the description's '(UPDATED: ts)' suffix is REWRITTEN, not
    appended twice (reference regex-split behavior, datapump.py:616-630)."""
    from datetime import datetime, timezone

    from datapump_spark.sinks.upsert import ParquetMergeSink

    sink = ParquetMergeSink(tmp_path / "lake")
    sink.set_properties("t", description="Air quality feed")
    sink.stamp_updated("t", datetime(2021, 1, 1, tzinfo=timezone.utc))
    p1 = sink.get_properties("t")
    assert p1["description"] == "Air quality feed (UPDATED: 2021-01-01 00:00:00)"
    sink.stamp_updated("t", datetime(2022, 2, 2, tzinfo=timezone.utc))
    p2 = sink.get_properties("t")
    assert p2["description"] == "Air quality feed (UPDATED: 2022-02-02 00:00:00)"
    assert p2["description"].count("UPDATED") == 1       # rewritten, not stacked
    assert p2["updated_at"] == "2022-02-02 00:00:00"
