"""Measured end-to-end StreamingCorpusIngest throughput (VERDICT r6 #8).

Drops the sf documents table into a jsonl drop-box as N equal batches,
drains the full streaming pipeline (gopher quality gate → cross-batch
incremental exact dedup vs the persisted fingerprint index → corpus +
index + audit appends) with AvailableNow, and prints rows/s plus the
per-batch wall read back from the pipeline's own audit table.

Usage:
    python scripts/streaming_throughput.py [n_batches] [sf_dir]

Run alone — local[32] self-contention fakes regressions (PERF.md
measurement-hygiene note).
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from datapump_spark.session import get_session
    from datapump_spark.streaming.corpus import StreamingCorpusIngest

    spark = get_session("streaming-throughput")
    spark.sparkContext.setLogLevel("ERROR")

    work = Path(tempfile.mkdtemp(prefix="stream_tp_"))
    drop = work / "drop"
    drop.mkdir()
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text", "lang", "source"))
    n_docs = docs.count()
    # one json file per batch: maxFilesPerTrigger=1 makes each a
    # micro-batch, the shape a cron-fed drop-box produces
    for b in range(n_batches):
        (docs.where(F.pmod(F.col("doc_id"), n_batches) == b)
         .coalesce(1).write.mode("append").json(str(drop)))

    ing = StreamingCorpusIngest(spark, str(drop), str(work / "out"),
                                min_words=10)
    t0 = time.perf_counter()
    ing.drain(work / "chk", timeout=1800)
    wall = time.perf_counter() - t0

    audit = spark.read.parquet(ing.audit_dir).orderBy("__batch_id").collect()
    admitted = sum(r["n_admitted"] for r in audit)
    out = {
        "metric": "streaming_corpus_ingest",
        "sf_dir": sf_dir,
        "n_docs_in": n_docs,
        "n_batches": len(audit),
        "wall_s": round(wall, 2),
        "rows_per_s": round(n_docs / wall, 1),
        "avg_batch_s": round(wall / max(1, len(audit)), 2),
        "admitted": admitted,
        "per_batch": [
            {"batch": r["__batch_id"], "n_in": r["n_in"],
             "n_admitted": r["n_admitted"]} for r in audit],
    }
    print(json.dumps(out))
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
