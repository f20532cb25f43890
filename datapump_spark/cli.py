"""The ``datapump`` CLI — the reference's ``datapump()`` main re-expressed
for the Spark engine (datapump.py:69-126,682-713).

``python -m datapump_spark [options]`` scans ``--inputdir`` for
``*-job.json`` files (S1), validates each (S2), and drains every job's file
queue through :class:`~datapump_spark.streaming.pipeline.Pipeline` against a
:class:`~datapump_spark.sinks.upsert.ParquetMergeSink` at ``--lakedir`` (the
CKAN host/apikey pair of the reference maps to the lake location — there is
no remote portal in the Spark profile).

Option precedence mirrors click's ``auto_envvar_prefix='DATAPUMP'`` +
``click_config_file`` behavior (datapump.py:110,713): command line >
``DATAPUMP_<OPTION>`` environment variables > ``datapump.ini`` ``[datapump]``
section > defaults.

Log streams mirror the reference's four loggers (datapump.py:115-126): the
main ``--logfile``, ``processed.log`` in ``--processeddir``,
``problems.log`` in ``--problemsdir``, and ``job.log`` in ``--inputdir``.

Invalid job JSON is logged and skipped — the drain continues with the next
job (datapump.py:703-707).
"""

from __future__ import annotations

import argparse
import configparser
import json
import logging
import os
import sys
from pathlib import Path

from datapump_spark.jobspec import JobSpec, JobValidationError, scan_job_dir
from datapump_spark.sinks.upsert import ParquetMergeSink
from datapump_spark.sources.csv_ingest import DEFAULT_DATE_FORMATS
from datapump_spark.streaming.pipeline import Pipeline

# (option, default, help) — the reference's surface minus CKAN host/apikey,
# plus the lake dir and Spark master (datapump.py:70-110)
OPTIONS = [
    ("inputdir", "./input", "directory holding *-job.json files and queue files"),
    ("processeddir", "./processed", "where successfully processed input files move"),
    ("problemsdir", "./problems", "where unsuccessful input files move"),
    ("datecolumn", "DateTime", "name of the datetime column"),
    ("dateformats", ", ".join(DEFAULT_DATE_FORMATS),
     "comma-separated Spark datetime patterns tried in order"),
    ("lakedir", "./lake", "ParquetMergeSink root (the CKAN-host equivalent)"),
    ("logfile", "./datapump.log", "main log file path"),
    ("master", None, "Spark master override (default local[$SPARK_GRAFT_CPUS])"),
    ("orgs", "", "comma-separated org allowlist; non-empty enables the K5 "
     "Spark-catalog namespace (databases + resource/alias views)"),
]


def _config_defaults(config_path: str | None) -> dict:
    """Read the ``[datapump]`` section of ``datapump.ini`` if present."""
    path = Path(config_path or "datapump.ini")
    if not path.exists():
        return {}
    cp = configparser.ConfigParser()
    cp.read(path)
    return dict(cp["datapump"]) if cp.has_section("datapump") else {}


def parse_args(argv: list[str] | None = None) -> argparse.Namespace:
    pre = argparse.ArgumentParser(add_help=False)
    pre.add_argument("--config", default=None)
    known, _ = pre.parse_known_args(argv)
    ini = _config_defaults(known.config)

    ap = argparse.ArgumentParser(
        prog="datapump",
        description="Pumps time-series data into a Spark lake using a "
                    "simple filesystem-based queueing system.",
    )
    ap.add_argument("--config", default=None, help="ini file (default ./datapump.ini)")
    for name, default, help_ in OPTIONS:
        # precedence: CLI > DATAPUMP_<NAME> env > ini section > default
        fallback = os.environ.get(f"DATAPUMP_{name.upper()}", ini.get(name, default))
        ap.add_argument(f"--{name}", default=fallback, help=help_)
    for flag in ("verbose", "debug"):
        env = os.environ.get(f"DATAPUMP_{flag.upper()}", ini.get(flag, ""))
        ap.add_argument(f"--{flag}", action="store_true",
                        default=str(env).lower() in ("1", "true", "yes"))
    return ap.parse_args(argv)


def _setup_logger(name: str, path: str | Path, level: int = logging.INFO) -> logging.Logger:
    """One file logger per stream (reference setup_logger, datapump.py:50-67)."""
    logger = logging.getLogger(name)
    logger.setLevel(level)
    logger.handlers.clear()
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    h = logging.FileHandler(path)
    h.setFormatter(logging.Formatter("%(asctime)s %(levelname)s %(message)s"))
    logger.addHandler(h)
    return logger


def drain(args: argparse.Namespace, spark=None) -> dict:
    """Run every valid job in ``inputdir`` once (the reference's per-cron
    invocation loop, datapump.py:694-707). Returns a summary dict."""
    for d in (args.inputdir, args.processeddir, args.problemsdir):
        Path(d).mkdir(parents=True, exist_ok=True)
    log = _setup_logger("datapump.main", args.logfile,
                        logging.DEBUG if args.debug else logging.INFO)
    job_log = _setup_logger("datapump.job", Path(args.inputdir) / "job.log")
    processed_log = _setup_logger(
        "datapump.processed", Path(args.processeddir) / "processed.log")
    problems_log = _setup_logger(
        "datapump.problems", Path(args.problemsdir) / "problems.log")

    if spark is None:
        from datapump_spark.session import get_session
        spark = get_session("datapump-cli", master=args.master)

    sink = ParquetMergeSink(args.lakedir)
    formats = [f.strip() for f in args.dateformats.split(",") if f.strip()]
    catalog = None
    org_seed = [o.strip() for o in (args.orgs or "").split(",") if o.strip()]
    if org_seed:
        from datapump_spark.sinks.catalog import SparkCatalogNamespace
        catalog = SparkCatalogNamespace(spark, orgs=org_seed)
    summary = {"jobs_run": 0, "jobs_invalid": 0, "processed": [], "quarantined": []}

    log.info("Starting datapump drain of %s", args.inputdir)
    for job_path in scan_job_dir(args.inputdir):
        log.info("Reading job - %s", job_path)
        job_log.info("Reading job - %s", job_path)
        try:
            job = JobSpec.from_file(job_path)
        except (JobValidationError, json.JSONDecodeError, OSError) as err:
            log.error("Invalid job json %s: %s", job_path, err)
            job_log.error("%s invalid: %s", job_path, err)
            summary["jobs_invalid"] += 1
            continue
        pipe = Pipeline(
            spark, job, sink, args.processeddir, args.problemsdir,
            date_column=args.datecolumn, date_formats=formats,
            catalog=catalog,
        )
        try:
            result = pipe.run_available()
        except Exception as err:            # noqa: BLE001 — e.g. K5 org gate
            log.error("Job %s failed: %s", job_path, err)
            job_log.error("%s failed: %s", job_path, err)
            summary["jobs_invalid"] += 1
            continue
        for p in result.processed:
            processed_log.info("%s", p)
        for p in result.quarantined:
            problems_log.error("%s", p)
        job_log.info("%s executed", job_path)
        summary["jobs_run"] += 1
        summary["processed"] += result.processed
        summary["quarantined"] += result.quarantined
    log.info("Ending datapump: %s", summary)
    return summary


def demo(argv: list[str] | None = None) -> int:
    """``python -m datapump_spark demo [workdir]`` — one-command
    reproducibility: runs (1) the IoT parity pipeline (the reference's
    actual workload: job-json scan → CSV queue drain → PK upsert →
    resample stats) on the bundled fixture CSVs, and (2) a mini
    pretrain_corpus recipe (quality → decontam → PII → exact + near
    dedup) on a synthetic corpus from the corpus_gen data source, then
    prints both audit tables. Everything is generated or bundled — no
    external data, network, or services."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from datapump_spark.session import get_session

    workdir = Path(argv[0]) if argv else Path(tempfile.mkdtemp(prefix="datapump-demo-"))
    fixture_dir = Path(__file__).resolve().parents[1] / "tests" / "data" / "iot"
    if not fixture_dir.exists():
        print(f"bundled fixtures not found at {fixture_dir} — run from a "
              "repo checkout", file=sys.stderr)
        return 1

    spark = get_session("datapump-demo")
    spark.sparkContext.setLogLevel("ERROR")

    # ---- 1. IoT parity pipeline -----------------------------------------
    inbox = workdir / "input"
    inbox.mkdir(parents=True, exist_ok=True)
    for f in sorted(fixture_dir.glob("*.csv")):
        shutil.copy(f, inbox / f.name)
    job = {
        "InputFile": str(inbox / "*.csv"),
        "TargetOrg": "demo", "TargetPackage": "airq", "TargetResource": "air",
        "PrimaryKey": "DateTime,Sensor_id", "Dedupe": "last",
        "Truncate": False, "Stats": [{"Kind": "H", "GroupBy": "Sensor_id"}],
    }
    (inbox / "air-job.json").write_text(json.dumps(job))
    args = parse_args([
        "--inputdir", str(inbox),
        "--processeddir", str(workdir / "processed"),
        "--problemsdir", str(workdir / "problems"),
        "--lakedir", str(workdir / "lake"),
        "--logfile", str(workdir / "datapump.log"),
    ])
    summary = drain(args, spark=spark)
    sink = ParquetMergeSink(workdir / "lake")
    print("\n== IoT parity pipeline (bundled fixture CSVs) ==")
    print(f"jobs_run={summary['jobs_run']} "
          f"files_processed={len(summary['processed'])} "
          f"quarantined={len(summary['quarantined'])}")
    print(f"lake rows after PK upsert: {sink.read(spark, 'air').count()}")
    print("hourly resample stats (air-H), first sensor-hours:")
    sink.read(spark, "air-H").orderBy("Sensor_id", "DateTime").show(
        8, truncate=False)

    # ---- 2. mini pretrain_corpus recipe ----------------------------------
    from datapump_spark.queries import _t
    from datapump_spark.recipes import CorpusRecipe, pretrain_corpus
    from datapump_spark.sources.corpus_gen import register

    register(spark)
    docs = (spark.read.format("corpus_gen")
            .option("rows", 2000).option("partitions", 8)
            .option("dup_frac", 0.15).load().persist())
    sf001 = "/root/testdata/sf0.001/documents.parquet"
    bench = (_t(spark, "/root/testdata/sf0.001", "documents")
             .limit(50).select("doc_id", "text")
             if Path(sf001).exists()
             else docs.where(F.col("doc_id") % 40 == 0)
             .select("doc_id", "text"))
    out = pretrain_corpus(docs, benchmark=bench,
                          recipe=CorpusRecipe(min_words=10))
    audit = (out["rejected"].groupBy("reject_reason")
             .agg(F.count(F.lit(1)).alias("n"))
             .unionByName(out["clean"].agg(
                 F.lit("CLEAN (admitted)").alias("reject_reason"),
                 F.count(F.lit(1)).alias("n")))
             .orderBy("reject_reason"))
    print("== mini pretrain_corpus recipe (synthetic corpus_gen docs) ==")
    print(f"input docs: {docs.count()}")
    audit.show(truncate=False)

    # ---- 3. multimodal: generate media files, stream-ingest, real decode
    import numpy as np

    from datapump_spark.operators import codecs
    from datapump_spark.streaming.media import StreamingMediaIngest

    media_in = workdir / "media"
    media_in.mkdir(parents=True, exist_ok=True)
    for i in range(4):
        img = np.full((8 + i, 12 + i, 3), 40 * (i + 1), np.uint8)
        (media_in / f"img{i}.png").write_bytes(codecs.encode_png(img))
    (media_in / "tone.wav").write_bytes(
        codecs.encode_wav(np.sin(np.arange(1600) / 9.0) * 0.5, 16000))
    (media_in / "renamed.bmp").write_bytes(
        codecs.encode_png(np.zeros((4, 4, 3), np.uint8)))  # mislabeled
    ing = StreamingMediaIngest(spark, str(media_in), str(workdir / "media_out"))
    ing.drain(workdir / "media_cp")
    print("== streaming media ingest (real stdlib decode per batch) ==")
    # feature layout (multimodal._real_features): images [w, h, c, ...],
    # audio [frames, channels, sample_rate, ...]
    (spark.read.parquet(ing.features_dir)
     .select("sniffed_format", "n_bytes",
             F.when(F.col("sniffed_format") == "wav",
                    F.concat(F.element_at("features", 1).cast("int"),
                             F.lit(" frames @ "),
                             F.element_at("features", 3).cast("int"),
                             F.lit(" Hz")))
             .otherwise(F.concat(F.element_at("features", 1).cast("int"),
                                 F.lit("x"),
                                 F.element_at("features", 2).cast("int"),
                                 F.lit(" px")))
             .alias("decoded"))
     .orderBy("n_bytes").show(truncate=False))
    print("quarantine (extension/bytes mismatches and undecodables):")
    (spark.read.parquet(ing.quarantine_dir)
     .select("claimed_format", "sniffed_format", "reason")
     .show(truncate=False))

    # ---- 4. web crawl → training streams in one call --------------------
    from datapump_spark.recipes import web_corpus

    def _rec(uri: str, html: str) -> bytes:
        body = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
                + html.encode())
        return (b"WARC/1.0\r\nWARC-Type: response\r\n"
                + f"WARC-Target-URI: {uri}\r\n".encode()
                + b"WARC-Date: 2024-03-01T00:00:00Z\r\n"
                + f"Content-Length: {len(body)}\r\n\r\n".encode()
                + body + b"\r\n\r\n")

    crawl = workdir / "crawl"
    crawl.mkdir(parents=True, exist_ok=True)
    nav = ('<div><a href="/">Home</a> <a href="/a">About</a> '
           '<a href="/c">Contact</a></div>')
    prose = ("the quick brown fox story "
             "{} over the lazy dog while a small bird watches and sings")
    shard = b"".join(
        [_rec(f"https://site{i}.example/article",
              f"<html><body>{nav}<p>{prose.format(f'part{i} p{i}a p{i}b')}"
              f"</p></body></html>") for i in range(4)]
        + [_rec("https://mirror.example/copy",
                f"<html><body>{nav}<p>{prose.format('part0 p0a p0b')}"
                f"</p></body></html>"),
           _rec("https://farm.example/",
                f"<html><body>{nav}</body></html>")])
    (crawl / "crawl-00000.warc").write_bytes(shard)
    web = web_corpus(spark, str(crawl / "*.warc"),
                     recipe=CorpusRecipe(min_words=10))
    print("== web_corpus: raw WARC shard → training streams ==")
    (web["clean"].select("source", "text")
     .orderBy("source").show(truncate=60))
    print("rejected (the mirror page dedupes; the link farm never "
          "reaches the corpus):")
    web["rejected"].show(truncate=False)

    print(f"demo artifacts under: {workdir}")
    return 0


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if argv and argv[0] == "demo":
        return demo(argv[1:])
    summary = drain(parse_args(argv))
    print(json.dumps(summary))
    return 0 if not summary["jobs_invalid"] else 1


if __name__ == "__main__":
    sys.exit(main())
