"""Scaling-efficiency benchmark (north_rule: efficiency >= 0.8 from N to 4N).

No real cluster exists in this sandbox, so per the driver instruction the
two cluster sizes are proxied by two local parallelism levels — the same job
on the same deterministic input at ``local[8]`` and ``local[32]``. Each level
runs in its OWN subprocess/JVM (a SparkSession master can't change in-process)
and reports best-of-N wall + rows/sec; efficiency = (rps_4N / rps_N) / 4.

The measured job is the flagship spatial-join + tile-assignment pipeline:
deterministic synthetic points (same generator as the oracle-gated queries,
seeded from a row id — no external data) → broadcast-STRtree ray-cast PIP
join → slippy z13 tile assign → per-(boundary, tile) count. Input size is
chosen so per-core work dominates fixed scheduling overhead (the quantity
that actually determines scaling on a 1000-executor cluster); row count
scales with --rows.

Usage: python tools/bench_scaling.py [--rows 2000000] [--levels 8,32] [--reps 3]
Writes BENCH/BASELINE.md and prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_CHILD = """
import json, os, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from osmgraft.session import get_spark
from osmgraft.functions import tiles
from osmgraft.operators.pip import pip_join
from osmgraft.synth import ADMIN_BOUNDARIES, points_projection

cpus = {cpus}
rows = {rows}
reps = {reps}
spark = get_spark("osmgraft-scaling-%d" % cpus, cpus=cpus)
spark.sparkContext.setLogLevel("ERROR")

def flagship():
    orders = spark.range(1, rows + 1, 1, cpus).select(
        F.col("id").alias("o_orderkey")
    )
    pts = points_projection(orders)
    joined = pip_join(pts, ADMIN_BOUNDARIES, how="inner")
    return (
        joined.select(
            "boundary_id",
            tiles.tile_x(F.col("lon7"), 13).alias("tx"),
            tiles.tile_y(F.col("lat7"), 13).alias("ty"),
        )
        .groupBy("boundary_id", "tx", "ty")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )

# warm: JVM, Arrow python workers, broadcast
flagship().count()

best = float("inf")
out_rows = 0
for _ in range(reps):
    t0 = time.perf_counter()
    out_rows = flagship().count()
    best = min(best, time.perf_counter() - t0)
print(json.dumps({{"cpus": cpus, "wall_sec": best, "rows": rows,
                   "rows_per_sec": rows / best, "output_rows": out_rows}}))
"""


def run_level(cpus: int, rows: int, reps: int) -> dict:
    code = _CHILD.format(repo=REPO, cpus=cpus, rows=rows, reps=reps)
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=3600
    )
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-4000:])
        raise RuntimeError(f"level local[{cpus}] failed")
    line = proc.stdout.strip().splitlines()[-1]
    res = json.loads(line)
    res["total_sec"] = round(time.time() - t0, 1)
    return res


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2_000_000)
    ap.add_argument("--levels", default="8,32")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    levels = [int(x) for x in args.levels.split(",")]
    assert len(levels) == 2 and levels[1] > levels[0]

    results = [run_level(c, args.rows, args.reps) for c in levels]
    lo, hi = results
    assert lo["output_rows"] == hi["output_rows"], "output must be parallelism-invariant"
    ratio = hi["rows_per_sec"] / lo["rows_per_sec"]
    factor = levels[1] / levels[0]
    eff = ratio / factor

    summary = {
        "metric": "flagship spatial-join+tile-assign scaling efficiency",
        "rows": args.rows,
        "levels": {
            f"local[{levels[0]}]": {
                "wall_sec": round(lo["wall_sec"], 3),
                "rows_per_sec": round(lo["rows_per_sec"], 1),
            },
            f"local[{levels[1]}]": {
                "wall_sec": round(hi["wall_sec"], 3),
                "rows_per_sec": round(hi["rows_per_sec"], 1),
            },
        },
        "speedup": round(ratio, 3),
        "parallelism_factor": factor,
        "efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    print(json.dumps(summary))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    md = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(md, "w") as fh:
        fh.write(
            f"""# BENCH/BASELINE.md — measured numbers

## Scaling efficiency (north_rule criterion, sandbox proxy for N vs 4N executors)

Job: deterministic synthetic points ({args.rows:,} rows, same generator as the
oracle-gated queries) -> broadcast-STRtree ray-cast point-in-polygon join ->
slippy z13 tile assignment -> per-(boundary, tile) count. Same input, two
parallelism levels, separate JVMs, best of {args.reps} reps after a warm-up run.
Output row count identical at both levels ({lo['output_rows']:,} rows —
parallelism-invariant).

| level | wall (s) | rows/sec |
|---|---|---|
| local[{levels[0]}] | {lo['wall_sec']:.3f} | {lo['rows_per_sec']:,.0f} |
| local[{levels[1]}] | {hi['wall_sec']:.3f} | {hi['rows_per_sec']:,.0f} |

- speedup {levels[0]}->{levels[1]} cores: **{ratio:.2f}x** (ideal {factor:.0f}x)
- **scaling efficiency: {eff:.3f}** (target >= 0.8: {"PASS" if eff >= 0.8 else "FAIL"})

Reproduce: `python tools/bench_scaling.py --rows {args.rows} --levels {levels[0]},{levels[1]} --reps {args.reps}`

## Headline wall-clock (driver contract)

`python bench.py` prints the per-round JSON line (flagship + per-query
timings at $SPARK_GRAFT_SF_DIR, default sf0.1, local[$SPARK_GRAFT_CPUS]);
the driver records it as BENCH_r{{N}}.json.
"""
        )
    sys.stderr.write(f"wrote {md}\n")


if __name__ == "__main__":
    main()
