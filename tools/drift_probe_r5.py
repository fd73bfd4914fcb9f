"""DRIFT protocol probe for the three BENCH_r04-vs-r03 regressions
(VERDICT r4 'What's wrong' #2): video_block_motion 0.77→1.56 s,
embedding_ivf_ann 0.78→1.06 s, image_geo_tiles 1.15→1.40 s.

Runs the three queries INTERLEAVED (one rep of each per cycle, 7 cycles)
at the driver's bench config (sf0.1, local[32], same warm-up as bench.py)
and prints per-rep walls + min — interleaving exposes machine-load drift
that per-query back-to-back reps hide. Results go in BENCH/DRIFT.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NAMES = ["video_block_motion", "embedding_ivf_ann", "image_geo_tiles"]
REPS = 7


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from osmgraft.queries import REGISTRY
    from osmgraft.session import get_spark

    spark = get_spark("drift-probe", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    spark.range(1000).repartition(cpus).mapInPandas(
        lambda it: it, schema="id long"
    ).count()

    walls: dict[str, list[float]] = {n: [] for n in NAMES}
    for rep in range(REPS):
        for n in NAMES:
            fn = REGISTRY[n][0]
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            walls[n].append(round(time.perf_counter() - t0, 3))
    out = {
        n: {"reps": walls[n], "min": min(walls[n]), "median": sorted(walls[n])[REPS // 2]}
        for n in NAMES
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
