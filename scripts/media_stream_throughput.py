"""Measured end-to-end StreamingMediaIngest throughput (VERDICT r8 #9).

The corpus path has a measured rows/s curve; this is the media twin:
generate a deterministic mix of REAL media files (PNG / baseline JPEG /
VP8L WebP / lossy-VP8 WebP / PCM WAV / IMA-ADPCM WAV / GIF — the r8/r9
codec fixtures), drop them into a watched directory, drain the full
streaming pipeline (binaryFile stream → codegen sniff → mislabel gate →
REAL decode feature kernel → features/quarantine appends) with
AvailableNow at a given files-per-trigger, and print files/s and MB/s.

Usage:
    python scripts/media_stream_throughput.py [n_files] [files_per_trigger]

Run alone — local[32] self-contention fakes regressions (PERF.md
measurement-hygiene note). Run two batch sizes for the PERF.md table:
    python scripts/media_stream_throughput.py 2000 250
    python scripts/media_stream_throughput.py 2000 1000
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _build_files(drop: Path, n: int) -> int:
    import numpy as np

    from datapump_spark.operators import codecs
    from datapump_spark.operators.gif import encode_gif
    from datapump_spark.operators.jpeg import encode_jpeg
    from datapump_spark.operators.vp8 import encode_webp_vp8
    from datapump_spark.operators.webp import encode_webp_vp8l

    total = 0
    sr = 8000
    t = np.arange(sr) / sr
    for i in range(n):
        rng = np.random.default_rng(i)
        kind = i % 7
        if kind == 0:
            img = rng.integers(0, 256, (64, 64, 3)).astype(np.uint8)
            b, name = codecs.encode_png(img), f"{i:06d}.png"
        elif kind == 1:
            img = rng.integers(0, 256, (64, 64, 3)).astype(np.uint8)
            b, name = encode_jpeg(img, quality=85), f"{i:06d}.jpg"
        elif kind == 2:
            img = rng.integers(0, 256, (32, 32, 3)).astype(np.uint8)
            b, name = encode_webp_vp8l(img), f"{i:06d}.webp"
        elif kind == 3:
            img = rng.integers(0, 256, (64, 64, 3)).astype(np.uint8)
            b, name = encode_webp_vp8(img, qi=40), f"{i:06d}.webp"
        elif kind == 4:
            sig = 0.5 * np.sin(2 * np.pi * (100 + i % 50 * 20) * t)
            b, name = codecs.encode_wav(sig, sr), f"{i:06d}.wav"
        elif kind == 5:
            sig = 0.5 * np.sin(2 * np.pi * (100 + i % 50 * 20) * t)
            b, name = codecs.encode_wav_adpcm(sig, sr), f"{i:06d}.wav"
        else:
            img = (rng.integers(0, 8, (48, 48, 1)) * 32).astype(np.uint8)
            b, name = encode_gif(np.repeat(img, 3, 2)), f"{i:06d}.gif"
        (drop / name).write_bytes(b)
        total += len(b)
    return total


def main() -> None:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    per_trigger = int(sys.argv[2]) if len(sys.argv) > 2 else 250

    from datapump_spark.session import get_session
    from datapump_spark.streaming.media import StreamingMediaIngest

    spark = get_session("media-stream-throughput")
    spark.sparkContext.setLogLevel("ERROR")

    work = Path(tempfile.mkdtemp(prefix="media_tp_"))
    drop = work / "drop"
    drop.mkdir()
    t0 = time.perf_counter()
    total_bytes = _build_files(drop, n_files)
    build_s = time.perf_counter() - t0

    ing = StreamingMediaIngest(
        spark, str(drop), str(work / "out"),
        max_files_per_trigger=per_trigger)
    t0 = time.perf_counter()
    ing.drain(work / "cp", timeout=3600)
    drain_s = time.perf_counter() - t0

    n_feat = spark.read.parquet(ing.features_dir).count()
    try:
        n_quar = spark.read.parquet(ing.quarantine_dir).count()
    except Exception:
        n_quar = 0
    print(json.dumps({
        "n_files": n_files,
        "files_per_trigger": per_trigger,
        "n_batches": -(-n_files // per_trigger),
        "total_mb": round(total_bytes / 1e6, 2),
        "build_s": round(build_s, 2),
        "drain_s": round(drain_s, 2),
        "files_per_s": round(n_files / drain_s, 1),
        "mb_per_s": round(total_bytes / 1e6 / drain_s, 2),
        "n_features": n_feat,
        "n_quarantined": n_quar,
    }))
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
