"""2-D skyline (Pareto front / maximal-vector) query — minimize both axes.

Börzsönyi/Kossmann/Stocker 2001 ("The Skyline Operator", ICDE) — the classic
multi-criteria dominance filter ("closest AND cheapest"): keep every row no
other row (in its group) dominates, where q dominates p iff q.x <= p.x AND
q.y <= p.y AND (q.x < p.x OR q.y < p.y). Ties on both axes keep ALL tied
rows (neither dominates the other) — duplicate-safe, scan-order-free.

Engine plan (the 2-D reduction, not the quadratic definition)
-------------------------------------------------------------
1. ``groupBy(group, x).min(y)`` — within one x, only the min-y rows can
   survive (any same-x larger-y row is dominated strictly in y). Map-side
   combined; collapses the data to DISTINCT-(group, x) size.
2. Running ``min(y) over (partition by group order by x rows unbounded
   preceding .. -1)`` on that collapsed frame: x survives iff its min-y is
   STRICTLY below every smaller x's min-y (an equal min-y at smaller x
   dominates strictly in x). The window runs per group over distinct-x
   rows only — domain-bounded for integer metrics (distances, cents),
   orders of magnitude below row count; with no groups it is one task over
   the collapsed frame (callers with unbounded ungrouped x domains bucket
   x first — the union of per-bucket skylines is a global superset).
3. Broadcast left-semi join of the surviving (group, x, min_y) tuples back
   to the full table — returns original rows (all ties), no row-sized
   shuffle (the skyline side is O(front), tiny by construction).

Oracle twin: the DIRECT NOT EXISTS dominator definition (quadratic,
independent implementation) — the gate proves the reduction, not the code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def skyline_2d(
    df: DataFrame, x_col: str, y_col: str, group_cols: list[str] | None = None
) -> DataFrame:
    """All rows of ``df`` not dominated on (x_col, y_col) within their
    ``group_cols`` group (both axes minimized). Returns original rows; ties
    on both axes are all kept."""
    g = list(group_cols or [])
    mins = df.groupBy(*g, x_col).agg(F.min(y_col).alias("_my"))
    w = (
        Window.partitionBy(*g)
        .orderBy(x_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    sky = (
        mins.withColumn("_pm", F.min("_my").over(w))
        .filter(F.col("_pm").isNull() | (F.col("_my") < F.col("_pm")))
        .drop("_pm")
    )
    sky = sky.select(
        *[F.col(c).alias(f"_g_{c}") for c in g],
        F.col(x_col).alias("_sx"),
        F.col("_my"),
    )
    cond = (F.col(x_col) == F.col("_sx")) & (F.col(y_col) == F.col("_my"))
    for c in g:
        cond = cond & (F.col(c) == F.col(f"_g_{c}"))
    return df.join(F.broadcast(sky), cond, "left_semi")


def sql_skyline_2d(
    rows_cte: str, x: str, y: str, cols: str, group_cols: list[str] | None = None
) -> str:
    """DuckDB twin: the direct quadratic NOT EXISTS dominator definition."""
    same_group = " AND ".join(f"q.{c} = p.{c}" for c in (group_cols or []))
    gpred = f"{same_group} AND " if same_group else ""
    return f"""WITH rows_in AS ({rows_cte})
SELECT {cols} FROM rows_in p
WHERE NOT EXISTS (
  SELECT 1 FROM rows_in q
  WHERE {gpred}q.{x} <= p.{x} AND q.{y} <= p.{y}
    AND (q.{x} < p.{x} OR q.{y} < p.{y}))"""
