"""Media-decode throughput: the distributed Arrow kernel vs a
single-thread loop over the SAME payloads with the SAME stdlib codec.

The multimodal claim is architectural — decode is per-item CPU inside
Arrow-batched kernels, so throughput scales with cores and the Spark
contract is unchanged when PIL/ffmpeg replace the stdlib
implementations. This measures that: N real PNGs (mixed sizes) decoded
to feature rows by operators.multimodal.extract_features(fake=False) on
local[$SPARK_GRAFT_CPUS], against the identical _real_features loop on
one thread. Prints one JSON line per measurement.

Usage: python scripts/media_yardstick.py [n_images] [min_edge_px] [fmt]
``fmt``: png (default), jpeg, jpeg_prog, or webp — jpeg exercises the pure-Python baseline
Huffman+IDCT decoder (operators/jpeg.py), whose per-image cost is ~50×
PNG's, i.e. the regime where the distributed kernel's headroom is real.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    base = int(sys.argv[2]) if len(sys.argv) > 2 else 16   # min edge px
    fmt = sys.argv[3] if len(sys.argv) > 3 else "png"

    import numpy as np

    from datapump_spark.operators import codecs
    from datapump_spark.operators.multimodal import (
        _real_features,
        extract_features,
    )
    from datapump_spark.session import get_session

    # deterministic mixed-size gradient images, pre-encoded ONCE so both
    # sides pay decode only
    def _payload(i: int) -> bytes:
        # gradient content: realistic zlib ratios (random pixels are
        # incompressible worst-case and make the generator, not the
        # decoder, the bottleneck)
        h, w = base + i % 17, base + (i * 3) % 23
        yy, xx = np.mgrid[0:h, 0:w]
        img = np.stack([(yy * 3 + i) % 256, (xx * 5) % 256,
                        (yy + xx + i) % 256], axis=2).astype(np.uint8)
        if fmt == "jpeg":
            from datapump_spark.operators.jpeg import encode_jpeg

            return encode_jpeg(img, quality=85, subsampling="420")
        if fmt == "jpeg_prog":
            from datapump_spark.operators.jpeg import encode_jpeg_progressive

            return encode_jpeg_progressive(img, quality=85,
                                           subsampling="420")
        if fmt == "webp":
            from datapump_spark.operators.webp import encode_webp_vp8l

            return encode_webp_vp8l(img, subtract_green=True)
        return codecs.encode_png(img)

    payloads = [_payload(i) for i in range(n)]
    total_mb = sum(len(p) for p in payloads) / 1e6

    t0 = time.perf_counter()
    acc = 0.0
    for p in payloads:
        acc += _real_features(p)[3]
    single = time.perf_counter() - t0
    print(json.dumps({"measure": "decode_single_thread", "fmt": fmt, "n": n,
                      "mb": round(total_mb, 1), "sec": round(single, 2),
                      "img_per_sec": round(n / single)}))

    spark = get_session("media-yardstick")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop") \
        .mode("overwrite").save()

    # build payloads ON THE EXECUTORS from ids (same deterministic
    # generator) — shipping hundreds of MB through the driver would
    # measure py4j, not the decoder
    def gen(batches):
        import pandas as pd
        for pdf in batches:
            out = [_payload(int(i)) for i in pdf["id"]]
            yield pd.DataFrame({"media_id": pdf["id"], "payload": out})

    df = (spark.range(n).repartition(64)
          .mapInPandas(gen, "media_id long, payload binary").persist())
    df.count()
    for run in range(2):
        t0 = time.perf_counter()
        extract_features(df, fake=False).write.format("noop") \
            .mode("overwrite").save()
        dist = time.perf_counter() - t0
        print(json.dumps({
            "measure": "decode_distributed", "run": run, "n": n,
            "sec": round(dist, 2), "img_per_sec": round(n / dist),
            "speedup_vs_single": round(single / dist, 1)}))


if __name__ == "__main__":
    main()
