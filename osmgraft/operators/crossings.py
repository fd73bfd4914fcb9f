"""Segment×segment crossing join — the line-intersection member of the
spatial-join family (point×point = knn, point×segment = snap, point×polygon
= pip, polygon×polygon = overlap; this completes the pairwise grid).

Semantics: STRICT proper crossings — the interiors of the two segments
intersect at exactly one point.  Four exact int64 orientation tests (the
classical CCW predicate, any computational-geometry text):

    d1 = (B−A)×(C−A),  d2 = (B−A)×(D−A),
    d3 = (D−C)×(A−C),  d4 = (D−C)×(B−C)
    crossing ⇔ d1,d2 strictly opposite signs AND d3,d4 strictly opposite

Endpoint touches and collinear overlaps are deliberately excluded: in a
road network, segments sharing a node touch EVERYWHERE — the interesting
output is crossings WITHOUT a shared node (unmarked intersections, missing
bridge/tunnel tags).  No floats anywhere, so the predicate can never flip
near-degenerate pairs differently across engines; the formula is generated
once (`crossing_formula_sql`) and consumed verbatim by Spark and the DuckDB
twin — the shared-formula discipline of overlap.py/clip.py/snap.py.

Scale shape: each segment explodes onto the grid cells covering its bbox at
pitch ≥ the per-axis length bound (≤ 4 cells each — provably complete: a
crossing point lies in both bboxes, hence both cover its cell), ONE
equi-join on cell id with seg_a < seg_b, pair dedup, then the whole-stage-
codegen refine.  Uniform synthetic keys need no salting; real road data
would reuse the celljoin salting.  int64 bound: all coordinate deltas among
cell-sharing candidates are < pitch + length, so cross terms stay < 2^62
for pitch + length < 2^31.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def crossing_formula_sql(
    ax: str, ay: str, bx: str, by: str, cx: str, cy: str, dx: str, dy: str
) -> str:
    """Engine-neutral boolean SQL: segments AB and CD properly cross.
    Pure integer comparisons — no sign()/signum() (their return types
    differ across engines), no division, no floats."""
    d1 = f"(({bx})-({ax}))*(({cy})-({ay})) - (({by})-({ay}))*(({cx})-({ax}))"
    d2 = f"(({bx})-({ax}))*(({dy})-({ay})) - (({by})-({ay}))*(({dx})-({ax}))"
    d3 = f"(({dx})-({cx}))*(({ay})-({cy})) - (({dy})-({cy}))*(({ax})-({cx}))"
    d4 = f"(({dx})-({cx}))*(({by})-({cy})) - (({dy})-({cy}))*(({bx})-({cx}))"
    opp = "((({u}) > 0 AND ({v}) < 0) OR (({u}) < 0 AND ({v}) > 0))"
    return (
        opp.format(u=d1, v=d2) + " AND " + opp.format(u=d3, v=d4)
    )


def segment_crossings(segments: DataFrame, pitch: int) -> DataFrame:
    """Self-join of (seg_id, ax, ay, bx, by) → one row (seg_a, seg_b) per
    strictly-crossing unordered pair (seg_a < seg_b).  ``pitch`` must be
    ≥ the per-axis segment-length bound so each bbox covers ≤ 2 cells per
    axis."""
    g = pitch

    def fdiv(col):  # exact integer floor division (snap.py discipline)
        return ((col - F.pmod(col, F.lit(g))) / F.lit(g)).cast("long")

    cells = (
        segments.select(
            "seg_id", "ax", "ay", "bx", "by",
            F.explode(
                F.sequence(fdiv(F.least("ax", "bx")), fdiv(F.greatest("ax", "bx")))
            ).alias("cx"),
        )
        .select(
            "*",
            F.explode(
                F.sequence(fdiv(F.least("ay", "by")), fdiv(F.greatest("ay", "by")))
            ).alias("cy"),
        )
    )
    left = cells.select(
        F.col("cx"), F.col("cy"), F.col("seg_id").alias("seg_a"),
        F.col("ax").alias("l_ax"), F.col("ay").alias("l_ay"),
        F.col("bx").alias("l_bx"), F.col("by").alias("l_by"),
    )
    right = cells.select(
        F.col("cx"), F.col("cy"), F.col("seg_id").alias("seg_b"),
        F.col("ax").alias("r_ax"), F.col("ay").alias("r_ay"),
        F.col("bx").alias("r_bx"), F.col("by").alias("r_by"),
    )
    cand = (
        left.join(right, ["cx", "cy"])
        .filter(F.col("seg_a") < F.col("seg_b"))
        .drop("cx", "cy")
        .distinct()  # a pair can share up to 4 cells
    )
    cross = F.expr(
        crossing_formula_sql(
            "l_ax", "l_ay", "l_bx", "l_by", "r_ax", "r_ay", "r_bx", "r_by"
        )
    )
    return cand.filter(cross).select("seg_a", "seg_b")
