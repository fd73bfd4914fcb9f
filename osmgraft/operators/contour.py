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
