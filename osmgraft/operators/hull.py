"""Convex hull — per-group and distributed-global, exact integer geometry.

The missing classic of the vector toolkit (alongside pip/overlap/simplify):
hulls of per-region point sets feed coverage footprints, label placement and
outlier fences.  Public-knowledge algorithms throughout: Andrew's monotone
chain (the standard O(n log n) hull) with an Akl–Toussaint throwaway
pre-filter.

Exactness discipline: the chain's orientation tests run on PYTHON INTS
(arbitrary precision — a cross product of 1e7-scale fixed-point deltas
reaches 1.3e19 and would wrap int64).  The sequential stack scan is
inherently per-point, so the numpy-vectorized Akl–Toussaint prune runs
first: points strictly inside the quadrilateral of the four extreme points
are discarded by a CONSERVATIVE float64 test (margin far above the float
error bound; borderline points are simply kept for the exact pass), which
cuts the python loop to the thin boundary shell on real clustered data.

Distribution (100 TB):
* per-group hull — ``applyInPandas`` after one hash exchange on the group
  key; each group's scan is local.
* global hull — NO global sort/shuffle of the data: each partition computes
  its local hull (``mapInArrow``), and because hull(A ∪ B) =
  hull(hull(A) ∪ hull(B)), the union of the tiny per-partition hulls —
  O(parts × hull-size) rows — reduces to one exact final chain.  The raw
  table is scanned once, map-side only.

Canonical output: strict hull vertices (collinear interior points dropped),
counter-clockwise (y-up), starting at the lexicographically smallest (x, y),
with a ``seq`` position — deterministic for any input order/partitioning.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# conservative inside-test margin: |cross| below this is treated as "maybe
# on the boundary" and kept for the exact pass.  float64 relative error on
# a±b and a*b is ~1e-16 per op; coordinates are < 2^31, so cross terms are
# < 2^62 ≈ 4.6e18 and the accumulated error < ~1e4.  1e9 is 10^5 times that.
_PRUNE_MARGIN = 1e9


def _cross(o, a, b) -> int:
    """Exact orientation: >0 = left turn (CCW), 0 = collinear (python ints)."""
    return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])


def monotone_chain(xs, ys) -> list[tuple[int, int]]:
    """Strict convex hull, CCW from the lexicographic minimum.  Duplicate
    and collinear points are dropped (cross <= 0 popping).  Degenerate
    inputs: 1 point -> itself; all-collinear -> the two endpoints."""
    pts = sorted(set(zip((int(v) for v in xs), (int(v) for v in ys))))
    if len(pts) <= 2:
        return pts
    lower: list[tuple[int, int]] = []
    for p in pts:
        while len(lower) >= 2 and _cross(lower[-2], lower[-1], p) <= 0:
            lower.pop()
        lower.append(p)
    upper: list[tuple[int, int]] = []
    for p in reversed(pts):
        while len(upper) >= 2 and _cross(upper[-2], upper[-1], p) <= 0:
            upper.pop()
        upper.append(p)
    return lower[:-1] + upper[:-1]


def akl_toussaint_mask(xs: np.ndarray, ys: np.ndarray) -> np.ndarray:
    """Boolean keep-mask: False only for points PROVABLY strictly inside the
    quadrilateral of the 4 extreme points (min/max x, min/max y) — a
    conservative float64 prune (margin >> error bound), so hull(kept) ==
    hull(all) exactly; only the python-exact pass shrinks further."""
    n = len(xs)
    if n < 8:
        return np.ones(n, dtype=bool)
    x = xs.astype(np.float64)
    y = ys.astype(np.float64)
    # W -> S -> E -> N is counter-clockwise for y-up coordinates
    corners_idx = [np.argmin(x), np.argmin(y), np.argmax(x), np.argmax(y)]
    keep = np.zeros(n, dtype=bool)
    inside = np.ones(n, dtype=bool)
    for i in range(4):
        ox, oy = x[corners_idx[i]], y[corners_idx[i]]
        bx, by = x[corners_idx[(i + 1) % 4]], y[corners_idx[(i + 1) % 4]]
        cr = (bx - ox) * (y - oy) - (by - oy) * (x - ox)
        # strictly-left-of-every-CCW-edge by a safe margin = provably inside
        inside &= cr > _PRUNE_MARGIN
    keep[~inside] = True
    for i in corners_idx:
        keep[i] = True
    return keep


def _hull_batch(xs, ys) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    m = akl_toussaint_mask(np.asarray(xs), np.asarray(ys))
    hull = monotone_chain(np.asarray(xs)[m], np.asarray(ys)[m])
    seq = np.arange(len(hull), dtype=np.int64)
    hx = np.array([p[0] for p in hull], dtype=np.int64)
    hy = np.array([p[1] for p in hull], dtype=np.int64)
    return seq, hx, hy


def convex_hull_per_group(
    df: DataFrame, group_cols: list[str], x_col: str = "x", y_col: str = "y"
) -> DataFrame:
    """Per-group strict hull: (group cols..., seq, x, y), CCW from the
    lexicographic minimum.  One hash exchange on the group key."""
    import pandas as pd

    out_schema = ", ".join(
        [f"{c} long" for c in group_cols] + ["seq long", "x long", "y long"]
    )

    def fn(key, pdf):
        seq, hx, hy = _hull_batch(pdf[x_col].to_numpy(), pdf[y_col].to_numpy())
        out = {c: np.full(len(seq), k, dtype=np.int64) for c, k in zip(group_cols, key)}
        out.update({"seq": seq, "x": hx, "y": hy})
        return pd.DataFrame(out)

    return df.groupBy(*group_cols).applyInPandas(fn, schema=out_schema)


def convex_hull_global(
    df: DataFrame, x_col: str = "x", y_col: str = "y"
) -> DataFrame:
    """Global strict hull with NO shuffle of the raw table: per-partition
    local hulls (map-side, bounded output), then one exact chain over their
    union (hull-of-hulls identity)."""
    spark = df.sparkSession
    cols = df.columns
    xi, yi = cols.index(x_col), cols.index(y_col)
    schema = pa.schema([pa.field("x", pa.int64()), pa.field("y", pa.int64())])

    def local(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        ax: list[np.ndarray] = []
        ay: list[np.ndarray] = []
        for rb in batches:
            if rb.num_rows:
                ax.append(rb.column(xi).to_numpy(zero_copy_only=False))
                ay.append(rb.column(yi).to_numpy(zero_copy_only=False))
        if not ax:
            return
        _, hx, hy = _hull_batch(np.concatenate(ax), np.concatenate(ay))
        yield pa.RecordBatch.from_arrays(
            [pa.array(hx, type=pa.int64()), pa.array(hy, type=pa.int64())],
            schema=schema,
        )

    partials = df.mapInArrow(local, schema="x long, y long")
    final = convex_hull_per_group(
        partials.withColumn("_g", F.lit(0)), ["_g"], "x", "y"
    )
    return final.select("seq", "x", "y")


def hull_diameter_per_group(
    df: DataFrame, group_cols: list[str], x_col: str = "x", y_col: str = "y"
) -> DataFrame:
    """Per-group DIAMETER (farthest point pair): (group cols..., n_hull,
    ax, ay, bx, by) — the endpoints, lexicographically normalized (a <= b)
    and tie-broken to the smallest (ax, ay, bx, by), so the answer is
    deterministic under any partitioning.

    diameter(points) == diameter(hull vertices), so the heavy lifting is the
    prune + chain; the pair search then runs over the tiny hull vertex set
    (all-pairs on h vertices — rotating calipers' O(h) saves nothing once
    h is post-hull small, and all-pairs keeps the exact python-int compare
    trivially correct).  Endpoints, not d2, are returned: a squared
    fixed-point diameter reaches 2.6e19 and would overflow int64; the
    endpoints always fit."""
    import pandas as pd

    out_schema = ", ".join(
        [f"{c} long" for c in group_cols]
        + ["n_hull long", "ax long", "ay long", "bx long", "by long"]
    )

    def fn(key, pdf):
        _, hx, hy = _hull_batch(pdf[x_col].to_numpy(), pdf[y_col].to_numpy())
        verts = list(zip((int(v) for v in hx), (int(v) for v in hy)))
        best = None
        if len(verts) == 1:
            best = (0, verts[0], verts[0])
        else:
            for i in range(len(verts)):
                for j in range(i + 1, len(verts)):
                    a, b = sorted((verts[i], verts[j]))
                    d2 = (a[0] - b[0]) ** 2 + (a[1] - b[1]) ** 2  # python ints
                    cand = (d2, a, b)
                    if best is None or (cand[0], ) > (best[0], ) or (
                        cand[0] == best[0] and (cand[1], cand[2]) < (best[1], best[2])
                    ):
                        best = cand
        row = {c: [int(k)] for c, k in zip(group_cols, key)}
        row.update(
            {
                "n_hull": [len(verts)],
                "ax": [best[1][0]],
                "ay": [best[1][1]],
                "bx": [best[2][0]],
                "by": [best[2][1]],
            }
        )
        return pd.DataFrame(row)

    return df.groupBy(*group_cols).applyInPandas(fn, schema=out_schema)


def min_bounding_rect_per_group(
    df: DataFrame, group_cols: list[str], x_col: str = "x", y_col: str = "y"
) -> DataFrame:
    """Per-group MINIMUM-AREA bounding rectangle (rotating-calipers
    semantics): the optimum rectangle has a side collinear with a hull edge
    (classic result — Freeman & Shapira 1975), so each hull edge e proposes
    area(e) = W_e·H_e / |e|² with W_e the extent along e and H_e the extent
    across it, both integer numerators over the common denominator |e|².

    The argmin compares the rational areas EXACTLY — w·h·e2' vs w'·h'·e2 on
    python ints (these products reach ~1e38 at fixed-point scale; no float
    could order them) — tie-broken to the lexicographically smallest edge.
    Output per group: n_hull, the chosen edge (ax, ay, bx, by) and the
    integer terms (e2, w_num, h_num); area = w_num·h_num/e2 for any
    consumer.  Emitted terms are range-checked: past int64 (possible for
    globe-spanning groups) the operator raises with translate-to-local-
    origin advice rather than wrapping.  Groups with a degenerate hull
    (< 3 vertices) emit nothing."""
    import pandas as pd

    out_schema = ", ".join(
        [f"{c} long" for c in group_cols]
        + ["n_hull long", "ax long", "ay long", "bx long", "by long",
           "e2 long", "w_num long", "h_num long"]
    )

    def fn(key, pdf):
        _, hx, hy = _hull_batch(pdf[x_col].to_numpy(), pdf[y_col].to_numpy())
        verts = list(zip((int(v) for v in hx), (int(v) for v in hy)))
        h = len(verts)
        cols = group_cols + ["n_hull", "ax", "ay", "bx", "by", "e2", "w_num", "h_num"]
        if h < 3:
            return pd.DataFrame({c: [] for c in cols}).astype("int64")
        best = None  # (w*h, e2, edge key, row)
        for i in range(h):
            (ax, ay), (bx, by) = verts[i], verts[(i + 1) % h]
            ex, ey = bx - ax, by - ay
            e2 = ex * ex + ey * ey
            dots = [ex * (x - ax) + ey * (y - ay) for x, y in verts]
            crosses = [ex * (y - ay) - ey * (x - ax) for x, y in verts]
            w_num = max(dots) - min(dots)
            h_num = max(crosses)  # CCW hull: all points left of the edge
            cand = (w_num * h_num, e2, (ax, ay, bx, by),
                    (w_num, h_num))
            if best is None:
                best = cand
            else:
                # exact rational compare: cand < best  <=>  a1*d2 < a2*d1
                l, r = cand[0] * best[1], best[0] * cand[1]
                if l < r or (l == r and cand[2] < best[2]):
                    best = cand
        vals = [*best[2], best[1], *best[3]]
        if any(abs(v) > (1 << 63) - 1 for v in vals):
            raise ValueError(
                "min_bounding_rect terms overflow int64 — translate the group "
                "to a local origin first (the rectangle is translation-invariant)"
            )
        row = {c: [int(k)] for c, k in zip(group_cols, key)}
        row.update(
            {
                "n_hull": [h],
                "ax": [vals[0]], "ay": [vals[1]], "bx": [vals[2]], "by": [vals[3]],
                "e2": [vals[4]], "w_num": [vals[5]], "h_num": [vals[6]],
            }
        )
        return pd.DataFrame(row)

    return df.groupBy(*group_cols).applyInPandas(fn, schema=out_schema)
