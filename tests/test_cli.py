"""CLI drain entry point (`python -m datapump_spark`) — reference
datapump() main-loop parity (datapump.py:682-713)."""

from __future__ import annotations

import pytest

import json
import shutil
import subprocess
import sys
from pathlib import Path

from datapump_spark.cli import drain, parse_args
from datapump_spark.sinks.upsert import ParquetMergeSink

FIXTURE_DIR = Path(__file__).parent / "data" / "iot"

JOB = {
    "InputFile": "",
    "TargetOrg": "o", "TargetPackage": "p", "TargetResource": "air",
    "PrimaryKey": "DateTime,Sensor_id", "Dedupe": "last", "Truncate": False,
    "Stats": [{"Kind": "H", "GroupBy": "Sensor_id"}],
}


def _setup(tmp_path, n_files=2):
    inbox = tmp_path / "input"
    inbox.mkdir()
    for f in sorted(FIXTURE_DIR.glob("*.csv"))[:n_files]:
        shutil.copy(f, inbox / f.name)
    job = {**JOB, "InputFile": str(inbox / "*.csv")}
    (inbox / "air-job.json").write_text(json.dumps(job))
    return inbox


def test_parse_args_precedence(tmp_path, monkeypatch):
    ini = tmp_path / "datapump.ini"
    ini.write_text("[datapump]\ninputdir = /from/ini\nlakedir = /ini/lake\n")
    # ini beats default
    args = parse_args(["--config", str(ini)])
    assert args.inputdir == "/from/ini" and args.lakedir == "/ini/lake"
    # env beats ini
    monkeypatch.setenv("DATAPUMP_INPUTDIR", "/from/env")
    args = parse_args(["--config", str(ini)])
    assert args.inputdir == "/from/env" and args.lakedir == "/ini/lake"
    # CLI beats env
    args = parse_args(["--config", str(ini), "--inputdir", "/from/cli"])
    assert args.inputdir == "/from/cli"
    assert args.processeddir == "./processed"  # untouched default


def test_drain_runs_all_jobs(spark, tmp_path):
    inbox = _setup(tmp_path)
    (inbox / "broken-job.json").write_text("{not json")
    args = parse_args([
        "--inputdir", str(inbox),
        "--processeddir", str(tmp_path / "done"),
        "--problemsdir", str(tmp_path / "bad"),
        "--lakedir", str(tmp_path / "lake"),
        "--logfile", str(tmp_path / "datapump.log"),
    ])
    summary = drain(args, spark=spark)
    assert summary["jobs_run"] == 1 and summary["jobs_invalid"] == 1
    assert len(summary["processed"]) == 2 and not summary["quarantined"]

    sink = ParquetMergeSink(tmp_path / "lake")
    data = sink.read(spark, "air")
    assert data.count() > 0
    assert sink.exists("air-H")
    # all four reference log streams exist
    assert (tmp_path / "datapump.log").exists()
    assert (inbox / "job.log").read_text().count("executed") == 1
    assert (tmp_path / "done" / "processed.log").exists()


@pytest.mark.slow
def test_module_entry_subprocess(tmp_path):
    """`python -m datapump_spark` end-to-end in a fresh interpreter."""
    inbox = _setup(tmp_path, n_files=1)
    out = subprocess.run(
        [sys.executable, "-m", "datapump_spark",
         "--inputdir", str(inbox),
         "--processeddir", str(tmp_path / "done"),
         "--problemsdir", str(tmp_path / "bad"),
         "--lakedir", str(tmp_path / "lake"),
         "--logfile", str(tmp_path / "datapump.log"),
         "--master", "local[2]"],
        capture_output=True, text=True, timeout=300,
        cwd=Path(__file__).resolve().parents[1],
    )
    assert out.returncode == 0, out.stderr[-2000:]
    summary = json.loads(out.stdout.strip().splitlines()[-1])
    assert summary["jobs_run"] == 1 and len(summary["processed"]) == 1


@pytest.mark.slow  # K5 catalog semantics gated in-default by
# test_catalog; drain mechanics by test_drain_runs_all_jobs
# (r9 tier move)
def test_drain_with_orgs_gate(spark, tmp_path):
    """--orgs enables the K5 catalog: allowed org's views registered,
    unknown org's job fails without consuming its queue files."""
    inbox = _setup(tmp_path, n_files=1)
    bad = {**JOB, "InputFile": str(inbox / "*.csv"), "TargetOrg": "ghost",
           "TargetResource": "air2"}
    (inbox / "zz-ghost-job.json").write_text(json.dumps(bad))
    args = parse_args([
        "--inputdir", str(inbox),
        "--processeddir", str(tmp_path / "done"),
        "--problemsdir", str(tmp_path / "bad"),
        "--lakedir", str(tmp_path / "lake"),
        "--logfile", str(tmp_path / "datapump.log"),
        "--orgs", "o",
    ])
    try:
        summary = drain(args, spark=spark)
        # first job (org "o") consumed the queue; ghost job found it empty
        # but its org gate fired first and counted the job as failed
        assert summary["jobs_run"] == 1 and summary["jobs_invalid"] == 1
        assert spark.sql("SELECT * FROM `o__p`.`air`").count() > 0
        assert spark.sql("SELECT * FROM `default`.`o_p_air`").count() > 0
        assert not spark.catalog.databaseExists("ghost__p")
    finally:
        for db in ("_dp_org__o", "o__p"):
            spark.sql(f"DROP DATABASE IF EXISTS `{db}` CASCADE")
        spark.sql("DROP VIEW IF EXISTS `default`.`o_p_air`")
