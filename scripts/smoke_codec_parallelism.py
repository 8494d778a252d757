"""Native-codec parallelism smoke (round-10 verdict item 7).

avif_image_stats runs up to 32 concurrent libheif (aom/dav1d) codecs per
executor host via mapInPandas. The per-core ceilings in PERFORMANCE.md
were measured on idle cores; this smoke verifies the AGGREGATE throughput
actually scales with workers — i.e. no hidden global lock or shared-
resource bottleneck (tempfile writes on the encode path, memory
bandwidth) collapses the parallel speedup. Spark's python workers are
separate PROCESSES, so an in-library mutex cannot serialize them — what
this measures is the real contention surface: CPU, page cache, /tmp.

Method: N deterministic 128x128 gradient frames (real transform-coding
work, not solid-frame shortcuts), each AV1 encode+decode round-tripped
inside mapInPandas — the same shape as the bench row — executed twice:
repartition(1) (one worker) and repartition(32) (full local[32]).
Reports aggregate Mpx/s for both and the speedup.

Run it alone (wall-clock measurement — the bench.py rule applies):

    python scripts/smoke_codec_parallelism.py [n_frames]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

W, H = 128, 128
QUALITY = 90


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 512

    from pyspark.sql import functions as F

    from etl_online_retail_spark.multimodal import heif
    from etl_online_retail_spark.session import get_spark

    if not heif.avif_available():
        print("libheif/AV1 not in this environment - nothing to smoke")
        return

    spark = get_spark("codec-parallelism-smoke")

    def roundtrip(batches):
        import numpy as np
        import pandas as pd

        from etl_online_retail_spark.multimodal import heif as h

        for pdf in batches:
            px_out = []
            for i in pdf["id"]:
                seed = int(i)
                x = (np.arange(W, dtype=np.int64) * 3 + seed) % 256
                y = (np.arange(H, dtype=np.int64) * 5 + seed) % 256
                arr = np.stack([np.tile(x, (H, 1)),
                                np.tile(y[:, None], (1, W)),
                                np.full((H, W), seed % 256)],
                               axis=-1).astype(np.uint8)
                img = h.decode_heif(
                    h.avif_encode_rgb(arr.tobytes(), W, H, QUALITY))
                px_out.append(img.width * img.height)
            yield pd.DataFrame({"px": px_out})

    # warm-up: spin up all 32 python workers and initialize libheif/aom
    # in each BEFORE any timed leg, so one-time costs (worker startup,
    # codec init, page cache) land in neither measurement. A tiny 32-way
    # pass touches every worker at negligible cost.
    (spark.range(32).repartition(32)
     .mapInPandas(roundtrip, "px long")
     .write.format("noop").mode("overwrite").save())

    results = {}
    for workers in (1, 32):
        df = (spark.range(n).repartition(workers)
              .mapInPandas(roundtrip, "px long"))
        t0 = time.perf_counter()
        total_px = df.agg(F.sum("px")).collect()[0][0]
        dt = time.perf_counter() - t0
        assert total_px == n * W * H
        results[workers] = n * W * H / 1e6 / dt
        print(f"workers={workers:>2}  {dt:7.2f} s  "
              f"{results[workers]:8.2f} Mpx/s aggregate "
              f"(encode+decode, {n} x {W}x{H} q{QUALITY})")
    print(f"speedup 1->32: {results[32] / results[1]:.1f}x")


if __name__ == "__main__":
    main()
