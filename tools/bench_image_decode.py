"""Image-decode throughput: round-1 per-row kernel vs round-2 batched kernel.

VERDICT r1 "Next round" #7 asks for measured evidence: image_stats on 64x64
raw at >=10x the old rows/s with identical output. This probe materializes a
64x64 raw image table to parquet once (generation untimed), then times the
OLD per-row mapInPandas kernel (inlined below, verbatim shape from git
bbf3f86~1) against the CURRENT mapInArrow batched kernel in the SAME Spark
session with interleaved reps (old/new alternating, median-of-N) — the
noisy-host protocol from BENCH/BASELINE.md. Writes BENCH/IMAGE.md.

Usage: python tools/bench_image_decode.py [n_rows] [reps] [fmt]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time
from typing import Iterator

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osmgraft.operators.multimodal import STATS_SCHEMA, image_stats
from osmgraft.session import get_spark


def old_image_stats(images: DataFrame) -> DataFrame:
    """Round-1 per-row kernel (git bbf3f86~1), kept ONLY as the measurement
    baseline for BENCH/IMAGE.md — not part of the engine surface."""
    from osmgraft.functions.codec import decode_image, phash64

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                px = decode_image(bytes(r.bytes), int(r.w), int(r.h), r.fmt)
                s = px.reshape(-1, 3).sum(axis=0, dtype=np.int64)
                out.append(
                    (r.image_id, int(s[0]), int(s[1]), int(s[2]), int(phash64(px)))
                )
            yield pd.DataFrame(out, columns=[f.name for f in STATS_SCHEMA.fields])

    return images.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(
        kernel, schema=STATS_SCHEMA
    )


def materialize(spark, n: int, cpus: int, fmt: str = "raw") -> str:
    """n 64x64 images (raw or qdct), Philox-per-chunk deterministic, written
    to parquet (vectorized generation; untimed)."""
    out = tempfile.mkdtemp(prefix="osmgraft_imgbench_")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from osmgraft.functions.codec import encode_qdct_batch

        for pdf in batches:
            idx = pdf["id"].to_numpy()
            rng = np.random.Generator(np.random.Philox(key=int(idx[0])))
            px = rng.integers(0, 256, (len(idx), 64 * 64 * 3), dtype=np.uint8)
            if fmt == "qdct":
                flat, m = encode_qdct_batch(px.reshape(-1, 64, 64, 3), q=4)
                payload = [flat[i * m : (i + 1) * m].tobytes() for i in range(len(idx))]
            else:
                payload = [row.tobytes() for row in px]
            yield pd.DataFrame(
                {
                    "image_id": [f"img{i:012d}" for i in idx],
                    "bytes": payload,
                    "w": np.full(len(idx), 64, dtype=np.int32),
                    "h": np.full(len(idx), 64, dtype=np.int32),
                    "fmt": fmt,
                }
            )

    (
        spark.range(0, n, 1, cpus)
        .mapInPandas(gen, schema="image_id string, bytes binary, w int, h int, fmt string")
        .write.mode("overwrite")
        .parquet(out)
    )
    return out


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    fmt = sys.argv[3] if len(sys.argv) > 3 else "raw"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("imgdecode-bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    path = materialize(spark, n, cpus, fmt)
    imgs = spark.read.parquet(path)
    # warm python workers + page cache
    imgs.count()
    image_stats(imgs.limit(256)).count()
    old_image_stats(imgs.limit(256)).count()

    # identical output check (full table, once)
    chk = lambda df: df.agg(  # noqa: E731
        F.count("*"), F.sum("sum_r"), F.sum("sum_g"), F.sum("sum_b"),
        F.sum(F.pmod(F.col("phash"), F.lit(1_000_003))),
    ).collect()[0]
    a, b = chk(image_stats(imgs)), chk(old_image_stats(imgs))
    assert tuple(a) == tuple(b), f"output mismatch: {a} vs {b}"

    walls: dict[str, list[float]] = {"old_per_row": [], "new_batched": []}
    for _ in range(reps):
        for name, fn in (("old_per_row", old_image_stats), ("new_batched", image_stats)):
            t0 = time.perf_counter()
            fn(imgs).agg(F.count("*")).collect()
            walls[name].append(time.perf_counter() - t0)

    med = {k: statistics.median(v) for k, v in walls.items()}
    result = {
        "n_rows": n,
        "fmt": fmt,
        "cpus": cpus,
        "reps": reps,
        "median_wall_s": {k: round(v, 3) for k, v in med.items()},
        "rows_per_sec": {k: round(n / v) for k, v in med.items()},
        "speedup": round(med["old_per_row"] / med["new_batched"], 2),
        "all_walls_s": {k: [round(x, 3) for x in v] for k, v in walls.items()},
    }
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
