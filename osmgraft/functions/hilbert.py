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


def hilbert_key_py(z: int, x: int, y: int) -> int:
    """Pure-Python twin of :func:`hilbert_sql_steps` — IDENTICAL case
    structure and arithmetic (Python ints are infinite two's complement, so
    ``&`` agrees with BIGINT for these magnitudes).  Driver-side only: used
    to place range ENDPOINTS during bbox decomposition (O(perimeter) calls),
    never per data row — rows always go through the codegen'd SQL steps."""
    d = 0
    for i in range(z - 1, -1, -1):
        s = 1 << i
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * (3 * rx + ry - 2 * rx * ry)
        if ry > 0:
            pass
        elif rx > 0:
            x, y = s - 1 - y, s - 1 - x
        else:
            x, y = y, x
    return d


def hilbert_bbox_ranges(
    z: int, x0: int, x1: int, y0: int, y1: int, max_ranges: int | None = None
) -> list[tuple[int, int]]:
    """Decompose an inclusive grid bbox into contiguous Hilbert-key ranges.

    Quadrant recursion: an aligned 2^k subsquare maps to ONE contiguous key
    range of length 4^k (each curve level adds < the remaining capacity), so
    full-covered quadrants emit a single range and only the bbox BOUNDARY is
    subdivided — range count is O(perimeter) and independent of z (pinned by
    test: the same bbox yields identical range counts at z=10/14/16).

    The range base is ``hilbert_key_py(corner) // 4^k * 4^k`` — no curve
    orientation tables to get wrong; correctness depends only on the aligned-
    subsquare contiguity property, which the tests verify exhaustively.

    ``max_ranges`` coalesces the SMALLEST key gaps first until the list fits,
    trading exactness for a bounded OR-chain: the result becomes a superset
    of the bbox, so callers add a residual exact predicate after the range
    scan (classic two-phase index scan — ranges prune IO, the residual
    refines).  This is the 100 TB shape: a handful of BETWEENs push into
    parquet row-group stats on a Hilbert-clustered table, and the refine
    runs only on the ~perimeter false-positive cells."""
    n = 1 << z
    if not (0 <= x0 <= x1 < n and 0 <= y0 <= y1 < n):
        raise ValueError(f"bbox ({x0},{y0})-({x1},{y1}) outside 2^{z} grid")
    out: list[list[int]] = []

    def rec(gx: int, gy: int, size: int) -> None:
        cx0, cx1 = max(x0, gx), min(x1, gx + size - 1)
        cy0, cy1 = max(y0, gy), min(y1, gy + size - 1)
        if cx0 > cx1 or cy0 > cy1:
            return
        if (cx0, cy0, cx1, cy1) == (gx, gy, gx + size - 1, gy + size - 1):
            area = size * size
            base = hilbert_key_py(z, gx, gy) // area * area
            out.append([base, base + area - 1])
            return
        h = size // 2
        rec(gx, gy, h)
        rec(gx + h, gy, h)
        rec(gx, gy + h, h)
        rec(gx + h, gy + h, h)

    rec(0, 0, n)
    out.sort()
    merged: list[list[int]] = []
    for lo, hi in out:
        if merged and merged[-1][1] + 1 == lo:
            merged[-1][1] = hi
        else:
            merged.append([lo, hi])
    ranges = [(lo, hi) for lo, hi in merged]
    if max_ranges is not None and len(ranges) > max_ranges:
        order = sorted(
            range(1, len(ranges)),
            key=lambda i: (ranges[i][0] - ranges[i - 1][1], i),
        )
        kill = set(order[: len(ranges) - max_ranges])
        coalesced: list[tuple[int, int]] = []
        for i, (lo, hi) in enumerate(ranges):
            if i in kill:
                coalesced[-1] = (coalesced[-1][0], hi)
            else:
                coalesced.append((lo, hi))
        ranges = coalesced
    return ranges


def hilbert_range_filter(key: Column, ranges: list[tuple[int, int]]) -> Column:
    """OR-of-BETWEENs over ``ranges`` — plain comparisons on one long column,
    so Catalyst pushes the disjunction into the parquet scan (row-group
    min/max stats skip non-intersecting groups on a Hilbert-sorted table)."""
    if not ranges:
        return F.lit(False)
    cond = key.between(ranges[0][0], ranges[0][1])
    for lo, hi in ranges[1:]:
        cond = cond | key.between(lo, hi)
    return cond


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
