"""Hilbert-curve keys — the locality-preserving sibling of Z-order.

Morton (cluster.zorder_key) is cheap but has long diagonal jumps: consecutive
keys can sit a half-grid apart, so file min/max boxes stay wider than they
need to be.  The Hilbert curve's consecutive keys are always GRID NEIGHBORS
(L1 distance 1 — pinned by test), giving row groups the tightest possible
spatial footprint for stats-based pruning at 100 TB.

Algorithm: the classical top-down bit-interleave with per-level rotation
(public knowledge — Hilbert 1891; the standard xy2d formulation in Warren,
"Hacker's Delight" §16 and countless references).  One level consumes one
bit of x and y:

    rx = bit s of x; ry = bit s of y
    d += s*s * ((3*rx) XOR ry)
    if ry == 0: (flip x,y to s-1-· when rx == 1), then swap x,y

Implementation discipline: each level is ONE engine-neutral SQL text
(`hilbert_sql_steps`) consumed verbatim by Spark (chained select) and the
DuckDB oracle (chained CTEs).  The XOR is spelled arithmetically
(3*rx + ry - 2*rx*ry — identical truth table on bits) so no engine-specific
bitwise-XOR spelling enters the shared text; bit tests use `&`, which both
engines share.  All integer math: exact, hashable, no IEEE anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hilbert_sql_steps(z: int, x: str = "hx", y: str = "hy", d: str = "hd"):
    """Per-level (d_expr, x_expr, y_expr) texts for a 2^z × 2^z grid, highest
    bit first.  Each step reads columns {x}, {y}, {d} and yields their next
    values; after all z steps {d} is the Hilbert index in [0, 4^z)."""
    if not 1 <= z <= 31:
        raise ValueError(f"z {z} out of range (4^z must fit int64)")
    steps = []
    for i in range(z - 1, -1, -1):
        s = 1 << i
        rx = f"(CASE WHEN ({x} & {s}) > 0 THEN 1 ELSE 0 END)"
        ry = f"(CASE WHEN ({y} & {s}) > 0 THEN 1 ELSE 0 END)"
        # (3*rx) XOR ry over bits, spelled arithmetically (engine-neutral)
        d_expr = f"{d} + {s * s} * (3 * {rx} + {ry} - 2 * {rx} * {ry})"
        x_expr = (
            f"CASE WHEN ({y} & {s}) > 0 THEN {x} "
            f"WHEN ({x} & {s}) > 0 THEN {s - 1} - {y} ELSE {y} END"
        )
        y_expr = (
            f"CASE WHEN ({y} & {s}) > 0 THEN {y} "
            f"WHEN ({x} & {s}) > 0 THEN {s - 1} - {x} ELSE {x} END"
        )
        steps.append((d_expr, x_expr, y_expr))
    return steps


def with_hilbert_key(
    df: DataFrame, x: Column, y: Column, z: int, out: str = "hkey"
) -> DataFrame:
    """Append the Hilbert index of (x, y) on the 2^z grid as column ``out``.

    z chained narrow projections, all whole-stage codegen — Catalyst
    collapses them into one stage; no shuffle, no Python.  Inputs must lie
    in [0, 2^z) (tile_x/tile_y guarantee it)."""
    work = df.select(
        "*",
        x.cast("long").alias("hx"),
        y.cast("long").alias("hy"),
        F.lit(0).cast("long").alias("hd"),
    )
    keep = [c for c in work.columns if c not in ("hx", "hy", "hd")]
    for d_expr, x_expr, y_expr in hilbert_sql_steps(z):
        work = work.select(
            *keep,
            F.expr(d_expr).alias("hd"),
            F.expr(x_expr).alias("hx"),
            F.expr(y_expr).alias("hy"),
        )
    return work.select(*keep, F.col("hd").alias(out))


def sql_hilbert_cte_chain(z: int, base_cte: str, id_cols: str = "point_id") -> str:
    """DuckDB twin: chained CTE bodies applying the SAME step texts.

    ``base_cte`` must select {id_cols}, hx, hy (grid coords) and
    ``CAST(0 AS BIGINT) AS hd``; the returned text is a full WITH query
    yielding ({id_cols}, hkey)."""
    parts = [f"h0 AS ({base_cte})"]
    prev = "h0"
    for i, (d_expr, x_expr, y_expr) in enumerate(hilbert_sql_steps(z), 1):
        parts.append(
            f"h{i} AS (SELECT {id_cols}, {d_expr} AS hd, "
            f"{x_expr} AS hx, {y_expr} AS hy FROM {prev})"
        )
        prev = f"h{i}"
    return (
        "WITH " + ",\n".join(parts) + f"\nSELECT {id_cols}, hd AS hkey FROM {prev}"
    )
