"""Iso-contour extraction from sparse count rasters — marching squares.

The raster→vector closer of the tile family: tile/cell counts (the output of
`tile_counts_z13`-style aggregations, the rasters `render_tile_pngs` draws)
become DIRECTED contour segments separating cells with count >= threshold
("inside") from the rest, the classical marching-squares cases (public
knowledge: Lorensen & Cline's marching cubes 2-D specialization, any graphics
textbook) with two deterministic conventions:

* **midpoint vertices**: crossing points sit at cell-edge midpoints, in
  DOUBLED integer grid coordinates (2·cx+1 etc.) — no interpolation, no
  floats, exact cross-engine hashes;
* **inside-on-the-left orientation**: every segment is directed so the
  inside region lies left of travel — contours of a finite raster form
  closed CCW loops around inside regions (CW around holes), and the
  loop-closure property (every head meets exactly one tail) is testable;
* **saddle rule**: ambiguous cases 6/9 (two diagonal inside corners)
  resolve as center-OUTSIDE — two separate segments, diagonal regions stay
  disconnected. Fixed, documented, pinned by a golden test.

Scale shape (100 TB): inside cells filter map-side, explode onto their <=4
incident 2x2 squares (generate-only), ONE groupBy-sum shuffle builds each
square's 4-bit corner mask (missing neighbors are implicitly outside — no
joins, no dense-raster materialization), then the 16-case table emits 0-2
segments per square in whole-stage codegen. Sparse throughout: cost is
O(inside cells), never O(raster area).

The case table is generated ONCE as engine-neutral SQL (`contour_case_sql`)
and consumed verbatim by Spark and the DuckDB oracle — the shared-formula
discipline of overlap.py/clip.py.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# midpoints of the four edges of square (sqx, sqy), doubled coordinates:
#   B = (2x+1, 2y)   bottom    L = (2x, 2y+1)   left
#   R = (2x+2, 2y+1) right     T = (2x+1, 2y+2) top
# corner bits: 1 = (x, y), 2 = (x+1, y), 4 = (x, y+1), 8 = (x+1, y+1)
_MID = {
    "B": ("2 * sqx + 1", "2 * sqy"),
    "L": ("2 * sqx", "2 * sqy + 1"),
    "R": ("2 * sqx + 2", "2 * sqy + 1"),
    "T": ("2 * sqx + 1", "2 * sqy + 2"),
}

# mask -> directed segments (from-midpoint, to-midpoint), inside on the left;
# masks 6 and 9 carry the second (saddle) segment in slot 1
_CASES: dict[int, list[tuple[str, str]]] = {
    1: [("B", "L")],
    2: [("R", "B")],
    3: [("R", "L")],
    4: [("L", "T")],
    5: [("B", "T")],
    6: [("R", "B"), ("L", "T")],
    7: [("R", "T")],
    8: [("T", "R")],
    9: [("B", "L"), ("T", "R")],
    10: [("T", "B")],
    11: [("T", "L")],
    12: [("L", "R")],
    13: [("B", "R")],
    14: [("L", "B")],
}


def contour_case_sql(slot: int) -> list[tuple[str, str]]:
    """(name, SQL) pairs for segment endpoint columns x0,y0,x1,y1 of segment
    ``slot`` (0 or 1) given integer columns sqx, sqy, mask — one CASE
    expression per coordinate, engine-neutral, NULL when the case emits no
    segment in that slot."""
    out = []
    for coord in range(4):
        branches = []
        for mask, segs in sorted(_CASES.items()):
            if slot >= len(segs):
                continue
            frm, to = segs[slot]
            exprs = _MID[frm] + _MID[to]  # (x0, y0, x1, y1)
            branches.append(f"WHEN {mask} THEN {exprs[coord]}")
        name = ("x0", "y0", "x1", "y1")[coord]
        out.append((name, "CASE mask " + " ".join(branches) + " END"))
    return out


def square_mask_exploded(inside_expr_rows: str) -> str:
    """Engine-neutral SQL body: from ``ins`` (cx, cy of inside cells) to
    (sqx, sqy, mask) via the 4-way corner explode + one grouped bit-sum.
    ``inside_expr_rows`` is a CTE body selecting cx, cy."""
    return f"""ins AS ({inside_expr_rows}),
corners AS (
  SELECT cx AS sqx, cy AS sqy, 1 AS bit FROM ins
  UNION ALL SELECT cx - 1, cy, 2 FROM ins
  UNION ALL SELECT cx, cy - 1, 4 FROM ins
  UNION ALL SELECT cx - 1, cy - 1, 8 FROM ins),
squares AS (
  SELECT sqx, sqy, SUM(bit) AS mask FROM corners GROUP BY sqx, sqy)"""


def contour_oracle_sql(inside_cte: str) -> str:
    """The full DuckDB twin over an inside-cells CTE body (selects cx, cy):
    identical explode/bit-sum/case-table texts, UNION ALL over the two
    segment slots."""
    parts = []
    for slot in (0, 1):
        cols = ", ".join(f"{e} AS {n}" for n, e in contour_case_sql(slot))
        parts.append(
            f"SELECT {cols} FROM squares WHERE mask IN "
            f"({', '.join(str(m) for m, s in sorted(_CASES.items()) if slot < len(s))})"
        )
    body = " UNION ALL ".join(parts)
    return (
        f"WITH {square_mask_exploded(inside_cte)}\n"
        f"SELECT x0, y0, x1, y1 FROM ({body}) s"
    )


def contour_segments(
    cells: DataFrame, threshold: int, cx: str = "cx", cy: str = "cy",
    cnt: str = "cnt",
) -> DataFrame:
    """(cx, cy, cnt) sparse raster → directed contour segments (x0, y0, x1,
    y1) in doubled grid coordinates at iso-level ``threshold`` (inside =
    cnt >= threshold). Cells absent from the input are outside."""
    ins = cells.filter(F.col(cnt) >= threshold).select(
        F.col(cx).alias("cx"), F.col(cy).alias("cy")
    )
    corners = ins.selectExpr(
        "stack(4, cx, cy, 1, cx - 1, cy, 2, cx, cy - 1, 4, cx - 1, cy - 1, 8)"
        " AS (sqx, sqy, bit)"
    )  # one generate-only pass (the oracle's UNION ALL twin re-reads its CTE)
    squares = corners.groupBy("sqx", "sqy").agg(F.sum("bit").alias("mask"))
    slots = []
    for slot in (0, 1):
        masks = [str(m) for m, s in sorted(_CASES.items()) if slot < len(s)]
        cols = [f"{e} AS {n}" for n, e in contour_case_sql(slot)]
        slots.append(
            squares.filter(F.expr(f"mask IN ({', '.join(masks)})")).selectExpr(*cols)
        )
    return slots[0].unionAll(slots[1])


# --- ring assembly: directed segments → closed loops with exact areas ----------
#
# The loop-closure property (every head meets exactly one tail — tested in
# test_contour.py) makes the segment set a FUNCTIONAL graph of disjoint
# cycles: start vertices are unique, so "the segment starting where I end"
# is a total successor function, and a cycle IS its connected component in
# the successor graph.  Labeling delegates to graph.cc_two_level (banded
# union-find + size-gated residual merge) — flat ~2-pass plan where both
# pointer doubling and min-label propagation would chain log-or-diameter
# rounds on the long coastline-style rings real rasters produce.

_VKEY = 4294967296  # 2^32: doubled grid coords are nonnegative and < 2^32


def ring_labels(segs: DataFrame, max_cycle: int | None = None) -> DataFrame:
    """Per-segment cycle labels: (x0, y0, x1, y1, k, cross, ring_id) where
    k = x0·2^32 + y0 (the unique start-vertex key), cross = the segment's
    shoelace term x0·y1 − x1·y0, and ring_id = the minimum k on the
    segment's cycle.

    A cycle IS its connected component in the (k → nxt) successor graph,
    so labeling delegates to graph.cc_two_level: band-local union-find on
    y-stripes (rings are spatially local, so almost every successor edge
    is intra-stripe) + a size-gated residual merge — ~2 passes where the
    previous pointer-doubling loop chained ceil(log2(n)) full joins.
    ``max_cycle`` is kept for API compatibility (the component algorithm
    needs no cycle-length bound)."""
    del max_cycle  # no longer needed: components don't bound cycle length
    from osmgraft.operators.graph import cc_two_level

    s = segs.select(
        F.col("x0").cast("long").alias("x0"),
        F.col("y0").cast("long").alias("y0"),
        F.col("x1").cast("long").alias("x1"),
        F.col("y1").cast("long").alias("y1"),
        (F.col("x0").cast("long") * _VKEY + F.col("y0")).alias("k"),
        (F.col("x1").cast("long") * _VKEY + F.col("y1")).alias("nxt"),
        (
            F.col("x0").cast("long") * F.col("y1")
            - F.col("x1").cast("long") * F.col("y0")
        ).alias("cross"),
    ).localCheckpoint(eager=True)
    edges = s.select(F.col("k").alias("u"), F.col("nxt").alias("v"))
    band = lambda c: F.shiftright(c.bitwiseAND(F.lit(_VKEY - 1)), 3)
    labels = cc_two_level(edges, band)
    return s.join(labels, s["k"] == labels["id"], "left").select(
        "x0", "y0", "x1", "y1", "k", "cross",
        F.coalesce(F.col("comp"), F.col("k")).alias("ring_id"),
    )


def assemble_rings(segs: DataFrame, max_cycle: int | None = None) -> DataFrame:
    """Directed contour segments (x0, y0, x1, y1) → one row per closed ring:
    ring_id (minimum start-vertex key on the cycle, key = x*2^32 + y),
    n_seg, and area2 = the exact integer shoelace sum Σ(x0·y1 − x1·y0) —
    positive for the inside-on-the-left outer loops, negative for holes
    (twice the enclosed area in doubled-grid units).

    ``max_cycle`` bounds the longest cycle (defaults to count(segs), one
    scalar job); rounds = ceil(log2(bound)).  Per-term cross products stay
    within int64 for doubled coords < 2^31 (zoom ≤ 30); translate to a
    local origin first if ring areas could exceed 2^63."""
    return (
        ring_labels(segs, max_cycle)
        .groupBy("ring_id")
        .agg(F.count(F.lit(1)).alias("n_seg"), F.sum("cross").alias("area2"))
    )


def rings_oracle_sql(inside_cte: str) -> str:
    """DuckDB twin over the same inside-cells CTE: the contour oracle's
    segments, successor closure as a recursive CTE (UNION dedup terminates
    on cycles), min reachable key per start vertex, then the identical
    shoelace aggregate."""
    return f"""WITH RECURSIVE segs AS (
  SELECT x0, y0, x1, y1,
         x0 * {_VKEY} + y0 AS k, x1 * {_VKEY} + y1 AS nk,
         x0 * y1 - x1 * y0 AS crs
  FROM ({contour_oracle_sql(inside_cte)}) c),
reach(k, cur) AS (
  SELECT k, k FROM segs
  UNION
  SELECT r.k, s.nk FROM reach r JOIN segs s ON s.k = r.cur),
labels AS (SELECT k, min(cur) AS ring_id FROM reach GROUP BY k)
SELECT ring_id, count(*) AS n_seg, CAST(sum(crs) AS BIGINT) AS area2
FROM segs JOIN labels USING (k) GROUP BY ring_id"""


def ring_centroids(segs: DataFrame) -> DataFrame:
    """Per-ring EXACT polygon centroid terms alongside the area: ring_id,
    n_seg, area2 = Σ cross, cxn3 = Σ (x0+x1)·cross, cyn3 = Σ (y0+y1)·cross —
    the standard shoelace centroid with the division NEVER taken (centroid =
    (cxn3, cyn3) / (3·area2)), so the surface is exact integers and the
    cross-engine hash cannot flake.  Bounds: per-term |(x0+x1)·cross| <
    2·2^z·EXTENT·|cross|; at tile zooms ≤ 20 with doubled-grid contour
    coords this sits far inside int64 (document per use)."""
    return (
        ring_labels(segs)
        .groupBy("ring_id")
        .agg(
            F.count(F.lit(1)).alias("n_seg"),
            F.sum("cross").alias("area2"),
            F.sum((F.col("x0") + F.col("x1")) * F.col("cross")).alias("cxn3"),
            F.sum((F.col("y0") + F.col("y1")) * F.col("cross")).alias("cyn3"),
        )
    )


def ring_centroids_oracle_sql(inside_cte: str) -> str:
    """DuckDB twin of ring_centroids (recursive closure + the same sums)."""
    return f"""WITH RECURSIVE segs AS (
  SELECT x0, y0, x1, y1,
         x0 * {_VKEY} + y0 AS k, x1 * {_VKEY} + y1 AS nk,
         x0 * y1 - x1 * y0 AS crs
  FROM ({contour_oracle_sql(inside_cte)}) c),
reach(k, cur) AS (
  SELECT k, k FROM segs
  UNION
  SELECT r.k, s.nk FROM reach r JOIN segs s ON s.k = r.cur),
labels AS (SELECT k, min(cur) AS ring_id FROM reach GROUP BY k)
SELECT ring_id, count(*) AS n_seg, CAST(sum(crs) AS BIGINT) AS area2,
       CAST(sum((x0 + x1) * crs) AS BIGINT) AS cxn3,
       CAST(sum((y0 + y1) * crs) AS BIGINT) AS cyn3
FROM segs JOIN labels USING (k) GROUP BY ring_id"""
