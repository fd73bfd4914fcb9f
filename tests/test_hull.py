"""Convex hull: exact chain vs brute force, prune safety, global-vs-grouped
equality, degenerate inputs, and big-coordinate exactness."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from osmgraft.operators.hull import (
    akl_toussaint_mask,
    convex_hull_global,
    convex_hull_per_group,
    monotone_chain,
)


def _cross(o, a, b):
    return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])


def _in_hull_of(p, others):
    """Carathéodory: p ∈ conv(others) iff p lies in some triangle (or on
    some segment) of points of ``others`` — O(n^3) exact ints, fully
    independent of the chain algorithm."""
    from itertools import combinations

    for a, b in combinations(others, 2):
        if _cross(a, b, p) == 0 and min(a[0], b[0]) <= p[0] <= max(a[0], b[0]) \
                and min(a[1], b[1]) <= p[1] <= max(a[1], b[1]):
            return True
    for a, b, c in combinations(others, 3):
        c1, c2, c3 = _cross(a, b, p), _cross(b, c, p), _cross(c, a, p)
        if (c1 >= 0 and c2 >= 0 and c3 >= 0) or (c1 <= 0 and c2 <= 0 and c3 <= 0):
            if not (c1 == c2 == c3 == 0):  # degenerate triangles: segment case above
                return True
    return False


def _brute_hull_vertices(pts):
    """Strict hull vertices: p is one iff p ∉ conv(pts \\ {p})."""
    pts = sorted(set(pts))
    if len(pts) <= 2:
        return set(pts)
    return {
        p for p in pts if not _in_hull_of(p, [q for q in pts if q != p])
    }


def test_chain_matches_brute_force_random():
    rng = np.random.RandomState(7)
    for trial in range(20):
        n = rng.randint(3, 16)
        pts = [(int(a), int(b)) for a, b in rng.randint(-50, 50, size=(n, 2))]
        hull = monotone_chain([p[0] for p in pts], [p[1] for p in pts])
        assert set(hull) == _brute_hull_vertices(pts), (trial, pts)
        # canonical start + CCW: shoelace strictly positive for >= 3 verts
        assert hull[0] == min(hull)
        if len(hull) >= 3:
            area2 = sum(
                hull[i][0] * hull[(i + 1) % len(hull)][1]
                - hull[(i + 1) % len(hull)][0] * hull[i][1]
                for i in range(len(hull))
            )
            assert area2 > 0


def test_chain_degenerate():
    assert monotone_chain([5], [7]) == [(5, 7)]
    assert monotone_chain([5, 5, 5], [7, 7, 7]) == [(5, 7)]
    # all collinear -> two endpoints
    assert monotone_chain([0, 1, 2, 3], [0, 2, 4, 6]) == [(0, 0), (3, 6)]


def test_chain_exact_at_fixed_point_scale():
    """Deltas of 3.6e9 would wrap int64 cross products; python ints must not.
    Three nearly-collinear points at globe scale: the middle one is 1 unit
    off the line and must be kept/dropped exactly."""
    big = 1_800_000_000
    # (x, y): middle point 1 LOW -> strictly convex lower chain keeps it
    hull = monotone_chain([-big, 0, big], [big, -1, big])
    assert (0, -1) in hull
    hull2 = monotone_chain([-big, 0, big], [-big, 0, big])  # exactly collinear
    assert hull2 == [(-big, -big), (big, big)]


def test_prune_mask_is_safe():
    rng = np.random.RandomState(11)
    xs = rng.randint(-2_000_000_000, 2_000_000_000, size=5000).astype(np.int64)
    ys = rng.randint(-2_000_000_000, 2_000_000_000, size=5000).astype(np.int64)
    m = akl_toussaint_mask(xs, ys)
    full = monotone_chain(xs, ys)
    pruned = monotone_chain(xs[m], ys[m])
    assert full == pruned
    assert m.sum() < len(xs)  # it actually prunes something


def test_global_hull_matches_grouped(spark):
    df = spark.range(4000).select(
        ((F.col("id") * 48271) % 1000 - 500).alias("x"),
        ((F.col("id") * 69621) % 1000 - 500).alias("y"),
    ).repartition(8)
    g = convex_hull_global(df).collect()
    one = (
        convex_hull_per_group(df.withColumn("g", F.lit(0)), ["g"], "x", "y")
        .select("seq", "x", "y")
        .collect()
    )
    assert sorted((r.seq, r.x, r.y) for r in g) == sorted(
        (r.seq, r.x, r.y) for r in one
    )
    # the partition-local reduction is real: partials << input rows
    assert len(g) < 100


def test_diameter_matches_brute(spark):
    from osmgraft.operators.hull import hull_diameter_per_group

    rng = np.random.RandomState(3)
    rows = [
        (int(g), int(x), int(y))
        for g in range(3)
        for x, y in rng.randint(-1000, 1000, size=(60, 2))
    ]
    df = spark.createDataFrame(rows, "g long, x long, y long")
    got = {r["g"]: r for r in hull_diameter_per_group(df, ["g"]).collect()}
    by_g = {}
    for g, x, y in rows:
        by_g.setdefault(g, []).append((x, y))
    for g, pts in by_g.items():
        best = max(
            (
                ((a[0] - b[0]) ** 2 + (a[1] - b[1]) ** 2, *sorted((a, b)))
                for i, a in enumerate(pts)
                for b in pts[i + 1 :]
                if a != b
            ),
            key=lambda t: (t[0], tuple(-v for v in (*t[1], *t[2]))),
        )
        r = got[g]
        assert ((r.ax, r.ay), (r.bx, r.by)) == (best[1], best[2]), g


def test_min_bounding_rect_square_and_rotation(spark):
    from osmgraft.operators.hull import min_bounding_rect_per_group

    # axis-aligned 10x4 rectangle of points: min rect area = 40, e2*area =
    # w_num*h_num with a side on the long edge (or short — equal area; the
    # lexicographic tie-break pins one edge deterministically)
    rows = [(0, x, y) for x in (0, 10) for y in (0, 4)] + [(0, 5, 2), (0, 3, 1)]
    # group 1: same rectangle rotated 90° (x<->y swap) — area invariant
    rows += [(1, y, x) for _, x, y in rows if _ == 0]
    df = spark.createDataFrame(rows, "g long, x long, y long")
    got = {r["g"]: r for r in min_bounding_rect_per_group(df, ["g"]).collect()}
    for g in (0, 1):
        r = got[g]
        assert r.n_hull == 4
        # exact area: w_num*h_num/e2 == 40
        assert r.w_num * r.h_num == 40 * r.e2
    # diamond (rotated square, diagonal 10): min rect is the 45° square of
    # side 5*sqrt(2) -> area 50, proposed by a diamond edge (e2 = 50)
    d = spark.createDataFrame(
        [(0, 5, 0), (0, 10, 5), (0, 5, 10), (0, 0, 5), (0, 5, 5)],
        "g long, x long, y long",
    )
    r = min_bounding_rect_per_group(d, ["g"]).collect()[0]
    assert r.w_num * r.h_num == 50 * r.e2
    # degenerate group emits nothing
    seg = spark.createDataFrame([(9, 0, 0), (9, 5, 5)], "g long, x long, y long")
    assert min_bounding_rect_per_group(seg, ["g"]).count() == 0
