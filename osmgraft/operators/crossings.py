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


def ring_self_crossings(
    vertices: DataFrame,
    key_col: str = "ring_id",
    seq_col: str = "seq",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """OGC simple-feature VALIDITY check: per ring (vertices in ``seq_col``
    order, implicitly closed last→first), count properly-crossing edge
    pairs — a simple (valid) ring has none.  Shares the exact int64
    orientation predicate with :func:`segment_crossings` (the
    crossing_formula_sql text, evaluated verbatim by both engines), so the
    verdict can never flip near-degenerate geometry differently across
    engines.  Strictness caveats are the family's: edge pairs touching at
    a point or overlapping collinearly are NOT counted (adjacent edges
    always share a vertex and are therefore never "properly crossing" —
    no adjacency exclusion needed).

    Callers must bound coordinates so cross terms fit int64: |Δ| < 2^31
    per axis (global E7 rings overflow — quantize to E5 first; the verdict
    is then exact FOR THE QUANTIZED ring, identically in both engines).

    Scale shape: one window per ring for edge construction, one per-key
    equi-join whose fan-out is edges², bounded by the caller's per-ring
    vertex cap — never data volume; one hash agg."""
    from pyspark.sql import Window as W

    w = W.partitionBy(key_col).orderBy(seq_col)
    wall = W.partitionBy(key_col).orderBy(seq_col).rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    edges = vertices.select(
        F.col(key_col).alias("k"),
        F.row_number().over(w).alias("eseq"),
        F.col(x_col).cast("long").alias("ax"),
        F.col(y_col).cast("long").alias("ay"),
        F.coalesce(F.lead(x_col).over(w), F.first(x_col).over(wall))
        .cast("long")
        .alias("bx"),
        F.coalesce(F.lead(y_col).over(w), F.first(y_col).over(wall))
        .cast("long")
        .alias("by"),
        F.count(F.lit(1)).over(wall).alias("n_edges"),
    ).filter(F.col("n_edges") >= 3)
    a = edges.select("k", "n_edges", F.col("eseq").alias("sa"),
                     F.col("ax").alias("p_ax"), F.col("ay").alias("p_ay"),
                     F.col("bx").alias("p_bx"), F.col("by").alias("p_by"))
    b = edges.select("k", F.col("eseq").alias("sb"),
                     F.col("ax").alias("q_ax"), F.col("ay").alias("q_ay"),
                     F.col("bx").alias("q_bx"), F.col("by").alias("q_by"))
    cross = F.expr(
        crossing_formula_sql(
            "p_ax", "p_ay", "p_bx", "p_by", "q_ax", "q_ay", "q_bx", "q_by"
        )
    )
    pairs = a.join(b, "k").filter(F.col("sa") < F.col("sb"))
    return (
        pairs.groupBy("k", "n_edges")
        .agg(F.sum(F.when(cross, 1).otherwise(0)).cast("long").alias("n_crossings"))
        .select(
            F.col("k").alias(key_col),
            F.col("n_edges").cast("long").alias("n_edges"),
            "n_crossings",
            (F.col("n_crossings") == 0).alias("is_simple"),
        )
    )


def sql_ring_self_crossings(vertices_cte: str, key_col: str = "ring_id") -> str:
    """DuckDB twin of :func:`ring_self_crossings` over a (key, seq, x, y)
    CTE body — same edge wrap, same verbatim crossing formula."""
    cross = crossing_formula_sql(
        "a.ax", "a.ay", "a.bx", "a.by", "b.ax", "b.ay", "b.bx", "b.by"
    )
    return f"""verts AS ({vertices_cte}),
edges AS (
  SELECT {key_col} AS k,
         row_number() OVER (PARTITION BY {key_col} ORDER BY seq) AS eseq,
         CAST(x AS BIGINT) AS ax, CAST(y AS BIGINT) AS ay,
         CAST(coalesce(lead(x) OVER (PARTITION BY {key_col} ORDER BY seq),
                       first_value(x) OVER (PARTITION BY {key_col} ORDER BY seq
                         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
              AS BIGINT) AS bx,
         CAST(coalesce(lead(y) OVER (PARTITION BY {key_col} ORDER BY seq),
                       first_value(y) OVER (PARTITION BY {key_col} ORDER BY seq
                         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
              AS BIGINT) AS by,
         count(*) OVER (PARTITION BY {key_col}) AS n_edges
  FROM verts),
ok AS (SELECT * FROM edges WHERE n_edges >= 3),
hits AS (
  SELECT a.k, a.n_edges,
         CAST(sum(CASE WHEN {cross} THEN 1 ELSE 0 END) AS BIGINT) AS n_crossings
  FROM ok a JOIN ok b ON a.k = b.k AND a.eseq < b.eseq
  GROUP BY a.k, a.n_edges)
SELECT k AS {key_col}, CAST(n_edges AS BIGINT) AS n_edges, n_crossings,
       (n_crossings = 0) AS is_simple
FROM hits"""
