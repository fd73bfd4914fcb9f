"""kNN join via cell-neighbor ring expansion (north rule; SURVEY.md §2.3).

Queries (the small side — like osmio's nodestore lookup side,
nodestore.rs:55-64) are collected to the driver; points (the huge side) get an
integer grid cell `(lat7 // G, lon7 // G)` and stay distributed. Per round we
explode the still-unsatisfied queries into the ANNULUS of grid cells with
chebyshev cell-distance in (r_prev, r], broadcast-join it against the point
cells, and keep each query's best k by the exact fixed-point planar metric

    dist2 = (Δlat7)² + (Δlon7)²            (int64 — bitwise deterministic)

with (dist2, neighbor_id) ordering. Δlon is WRAP-AWARE:
``dlon_w = min(|Δlon7|, 3.6e9 − |Δlon7|) ≤ 1.8e9`` — longitude cells wrap
modulo the 360° span (cell_size must divide 3_600_000_000), so antimeridian
neighbors are found, and every square fits int64 for all valid coordinates
(≤ 2·(1.8e9)² = 6.5e18 < 2^63). Exactness: a point outside the wrapped
disk(r) is separated by > r·G along some axis, so once the kth-best dist2 ≤
(r·G)², no farther cell can improve the answer — that query retires. Radius
doubles each round; queries that out-run ``max_radius_cells`` fall back to a
brute-force pass (only relevant when k approaches the table size).

Per-round Window top-k shuffles only the candidate annulus rows keyed by
query_id; at cluster scale replace with mapInPandas partial top-k + merge if
query fan-out grows.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_CELL = 50_000_000  # 5° in fixed-point units
LON_SPAN = 3_600_000_000


def _dist2(qlat, qlon, plat, plon):
    dlat = qlat.cast("long") - plat.cast("long")
    dlon_abs = F.abs(qlon.cast("long") - plon.cast("long"))
    dlon = F.least(dlon_abs, F.lit(LON_SPAN) - dlon_abs)
    return dlat * dlat + dlon * dlon


def py_dist2(qlat: int, qlon: int, plat: int, plon: int) -> int:
    """Reference implementation of the wrap-aware exact metric."""
    dlat = qlat - plat
    dlon = abs(qlon - plon)
    dlon = min(dlon, LON_SPAN - dlon)
    return dlat * dlat + dlon * dlon


def knn_join(
    points: DataFrame,
    queries: DataFrame,
    k: int,
    cell_size: int = DEFAULT_CELL,
    max_radius_cells: int = 64,
) -> DataFrame:
    """points: (point_id, lat7, lon7); queries: (query_id, lat7, lon7) — small.

    Returns (query_id, neighbor_id, dist2, rank) with exactly min(k, |points|)
    rows per query, rank 1..k ordered by (dist2, neighbor_id).
    """
    spark = points.sparkSession
    from osmgraft.operators.util import ensure_min_parallelism

    if LON_SPAN % cell_size != 0:
        raise ValueError(f"cell_size must divide {LON_SPAN} for wrapped lon cells")
    ncl = LON_SPAN // cell_size  # lon cell count (wraps modulo this)

    def floordiv(col, g):  # exact integer floor division (matches Python //)
        return ((col.cast("long") - F.pmod(col.cast("long"), F.lit(g))) / F.lit(g)).cast("long")

    pts = ensure_min_parallelism(points).select(
        F.col("point_id"),
        F.col("lat7"),
        F.col("lon7"),
        floordiv(F.col("lat7"), cell_size).alias("clat"),
        F.pmod(floordiv(F.col("lon7"), cell_size), F.lit(ncl)).alias("clon"),
    )
    pts = pts.persist()
    try:
        qrows = queries.select("query_id", "lat7", "lon7").collect()
        # python // is floor division — matches the pmod-based floordiv above
        active = {
            r.query_id: (int(r.lat7), int(r.lon7), r.lat7 // cell_size, (r.lon7 // cell_size) % ncl)
            for r in qrows
        }
        best: dict = {}  # query_id -> pd.DataFrame of current top-k
        r_prev, r = -1, 1
        while active and r <= max_radius_cells:
            cell_rows = []
            for qid, (qlat, qlon, cl, cn) in active.items():
                seen = set()
                for di in range(-r, r + 1):
                    for dj in range(-r, r + 1):
                        if max(abs(di), abs(dj)) > r_prev:
                            cell = (cl + di, (cn + dj) % ncl)
                            if cell not in seen:  # wrap can alias cells
                                seen.add(cell)
                                cell_rows.append((qid, qlat, qlon, cell[0], cell[1]))
            cells = spark.createDataFrame(
                cell_rows, "query_id long, qlat7 int, qlon7 int, clat long, clon long"
            )
            cand = pts.join(F.broadcast(cells), ["clat", "clon"]).select(
                "query_id",
                F.col("point_id").alias("neighbor_id"),
                _dist2(F.col("qlat7"), F.col("qlon7"), F.col("lat7"), F.col("lon7")).alias(
                    "dist2"
                ),
            )
            w = Window.partitionBy("query_id").orderBy("dist2", "neighbor_id")
            topk = (
                cand.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= k)
                .collect()
            )
            new = pd.DataFrame(
                [(t.query_id, t.neighbor_id, t.dist2) for t in topk],
                columns=["query_id", "neighbor_id", "dist2"],
            )
            for qid in list(active):
                prev = best.get(qid)
                cur = new[new.query_id == qid]
                merged = pd.concat([prev, cur]) if prev is not None else cur
                merged = (
                    merged.drop_duplicates("neighbor_id")  # wrap aliasing can rescan a cell
                    .sort_values(["dist2", "neighbor_id"])
                    .head(k)
                    .reset_index(drop=True)
                )
                best[qid] = merged
                bound = (r * cell_size) ** 2
                if len(merged) >= k and int(merged.dist2.iloc[k - 1]) <= bound:
                    del active[qid]
            r_prev, r = r, min(r * 2, max_radius_cells) if r < max_radius_cells else r + 1
        if active:  # brute-force stragglers (k ~ |points| or empty regions)
            qdf = spark.createDataFrame(
                [(qid, v[0], v[1]) for qid, v in active.items()],
                "query_id long, qlat7 int, qlon7 int",
            )
            cand = pts.crossJoin(F.broadcast(qdf)).select(
                "query_id",
                F.col("point_id").alias("neighbor_id"),
                _dist2(F.col("qlat7"), F.col("qlon7"), F.col("lat7"), F.col("lon7")).alias(
                    "dist2"
                ),
            )
            w = Window.partitionBy("query_id").orderBy("dist2", "neighbor_id")
            topk = (
                cand.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k).collect()
            )
            new = pd.DataFrame(
                [(t.query_id, t.neighbor_id, t.dist2) for t in topk],
                columns=["query_id", "neighbor_id", "dist2"],
            )
            for qid in list(active):
                best[qid] = (
                    new[new.query_id == qid]
                    .sort_values(["dist2", "neighbor_id"])
                    .head(k)
                    .reset_index(drop=True)
                )
        out = pd.concat(best.values()) if best else pd.DataFrame(
            columns=["query_id", "neighbor_id", "dist2"]
        )
        out = out.sort_values(["query_id", "dist2", "neighbor_id"]).reset_index(drop=True)
        out["rank"] = out.groupby("query_id").cumcount() + 1
        return spark.createDataFrame(
            out, "query_id long, neighbor_id long, dist2 long, rank int"
        )
    finally:
        pts.unpersist()


def knn_within_radius(
    points: DataFrame,
    queries: DataFrame,
    k: int,
    radius_cells: int = 2,
    cell_size: int = DEFAULT_CELL,
) -> DataFrame:
    """Fully-distributed kNN for a bounded search radius — the cluster-scale
    path when the query side is itself a big DataFrame (no driver collect,
    no iteration).

    Each query row is exploded into its (2r+1)² wrapped grid-cell disk
    JVM-side (sequence × sequence), shuffled-joined against the cell-indexed
    point table, and ranked per query by the exact wrap-aware metric
    (dist2, neighbor_id). Results are exact for neighbors within
    ``radius_cells·cell_size`` along both axes; queries whose k-th neighbor
    lies farther return fewer/farther rows — callers choose the radius from
    data density (same contract as every bounded-radius spatial index scan).

    Scale: one explode (fan-out (2r+1)², JVM), one shuffle on (clat, clon) —
    salt-compatible with operators/celljoin if cells are hot — and one
    window top-k shuffled on query_id.
    """
    spark = points.sparkSession
    from osmgraft.operators.util import ensure_min_parallelism

    if LON_SPAN % cell_size != 0:
        raise ValueError(f"cell_size must divide {LON_SPAN} for wrapped lon cells")
    ncl = LON_SPAN // cell_size

    def floordiv(col, g):
        return ((col.cast("long") - F.pmod(col.cast("long"), F.lit(g))) / F.lit(g)).cast("long")

    pts = ensure_min_parallelism(points).select(
        F.col("point_id"),
        F.col("lat7"),
        F.col("lon7"),
        floordiv(F.col("lat7"), cell_size).alias("clat"),
        F.pmod(floordiv(F.col("lon7"), cell_size), F.lit(ncl)).alias("clon"),
    )
    r = radius_cells
    q = queries.select(
        "query_id",
        F.col("lat7").alias("qlat7"),
        F.col("lon7").alias("qlon7"),
        floordiv(F.col("lat7"), cell_size).alias("qclat"),
        F.pmod(floordiv(F.col("lon7"), cell_size), F.lit(ncl)).alias("qclon"),
    )
    disk = (
        q.select(
            "query_id",
            "qlat7",
            "qlon7",
            F.explode(F.sequence(F.col("qclat") - r, F.col("qclat") + r)).alias("clat"),
            "qclon",
        )
        .select(
            "query_id",
            "qlat7",
            "qlon7",
            "clat",
            F.explode(
                F.sequence(F.col("qclon") - r, F.col("qclon") + r)
            ).alias("_clon_raw"),
        )
        .select(
            "query_id",
            "qlat7",
            "qlon7",
            "clat",
            F.pmod(F.col("_clon_raw"), F.lit(ncl)).alias("clon"),
        )
        .dropDuplicates(["query_id", "clat", "clon"])  # lon wrap can alias cells
    )
    cand = disk.join(pts, ["clat", "clon"]).select(
        "query_id",
        F.col("point_id").alias("neighbor_id"),
        _dist2(F.col("qlat7"), F.col("qlon7"), F.col("lat7"), F.col("lon7")).alias("dist2"),
    )
    w = Window.partitionBy("query_id").orderBy("dist2", "neighbor_id")
    return cand.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
