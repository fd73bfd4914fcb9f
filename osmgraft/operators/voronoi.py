"""Discrete Voronoi labeling — assign every observed grid cell to its
nearest seed site (facility / catchment partitioning), the raster dual of
the kNN join (operators/knn.py) at k=1 with a FIXED, broadcastable site set.

Reference parity: osmio has no spatial partitioning op; this generalizes its
node->cell assignment discipline (node_id_pos.rs fast scan -> cell key) to
"which of K facilities owns this cell", the classic discrete-Voronoi /
nearest-site raster query (Aurenhammer 1991 survey; the label grid is what
cartographic catchment maps rasterize).

Semantics
---------
* metric: squared Euclidean in integer tile coordinates at zoom ``z``,
  wrap-aware in x (dx = min(|cx-sx|, 2^z - |cx-sx|)) — the antimeridian
  does not split catchments. All int64, no floats anywhere.
* tie-break: equal d2 -> MIN seed_id (total order => partitioning- and
  scan-order-independent output, the repo-wide determinism discipline).

Scale shape (100 TB)
--------------------
Points pre-aggregate to observed cells FIRST (the tile_counts shape: one
map-side-combined shuffle, output bounded by 4^z not by row count). The
seed set is a facility list — thousands at most — so the cell x seed score
is a broadcast nested-loop join (map-side, no shuffle), and the per-cell
argmin is a min(struct) aggregate with map-side partial combine keyed by
the SAME (cx, cy) the cells already carry. Net: one O(cells) shuffle, K
never shuffles. A million-seed variant would swap the broadcast for the
cell-join ring expansion in knn.py; flagged, not needed for facility-scale K.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _wrap_dx(cx: Column, sx: Column, z: int) -> Column:
    n = 1 << z
    raw = F.abs(cx - sx)
    return F.least(raw, F.lit(n) - raw)


def voronoi_assign(cells: DataFrame, seeds: DataFrame, z: int) -> DataFrame:
    """Label each cell row (cx, cy, cnt) with its nearest seed (seed_id, sx,
    sy). Returns (cx, cy, cnt, seed_id, d2). ``seeds`` must be small enough
    to broadcast (facility lists are)."""
    dx = _wrap_dx(F.col("cx"), F.col("sx"), z)
    dy = F.col("cy") - F.col("sy")
    scored = (
        cells.join(F.broadcast(seeds))
        .withColumn("d2", dx * dx + dy * dy)
        .select("cx", "cy", "cnt", F.struct("d2", "seed_id").alias("cand"))
    )
    best = scored.groupBy("cx", "cy").agg(
        F.first("cnt").alias("cnt"), F.min("cand").alias("best")
    )
    return best.select(
        "cx", "cy", "cnt", F.col("best.seed_id").alias("seed_id"),
        F.col("best.d2").alias("d2"),
    )


def voronoi_catchment(assigned: DataFrame) -> DataFrame:
    """Roll the label grid up to per-seed catchment totals (cells owned,
    points served) — the facility-load aggregate. Input = voronoi_assign
    output; one more map-side-combined shuffle keyed by seed_id (K rows)."""
    return assigned.groupBy("seed_id").agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.sum("cnt").cast("long").alias("n_points"),
    )


def sql_voronoi_assign(cells_cte: str, seeds_cte: str, z: int) -> str:
    """DuckDB twin: same wrap-aware integer metric, same MIN-(d2, seed_id)
    tie-break via ordered row_number."""
    n = 1 << z
    return f"""WITH cells AS ({cells_cte}), seeds AS ({seeds_cte}),
scored AS (
  SELECT cx, cy, cnt, seed_id,
         least(abs(cx - sx), {n} - abs(cx - sx)) * least(abs(cx - sx), {n} - abs(cx - sx))
           + (cy - sy) * (cy - sy) AS d2
  FROM cells CROSS JOIN seeds),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY cx, cy ORDER BY d2, seed_id) AS rk
  FROM scored)
SELECT cx, cy, cnt, seed_id, d2 FROM ranked WHERE rk = 1"""


def sql_voronoi_catchment(assign_sql: str) -> str:
    return f"""WITH assigned AS ({assign_sql})
SELECT seed_id, count(*) AS n_cells, CAST(sum(cnt) AS BIGINT) AS n_points
FROM assigned GROUP BY seed_id"""
