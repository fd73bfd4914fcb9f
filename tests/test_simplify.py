"""Douglas-Peucker simplification (operators/simplify.py): exact-integer
properties, deviation bound, eps monotonicity, and fixture closed form."""

import numpy as np
import pytest

from osmgraft.operators.simplify import (
    BUMP,
    DP_EPS,
    dp_fixture_way,
    dp_keep_indices,
    simplify_ways,
)


def _max_dev(pts, keep):
    """Float check: max perpendicular deviation of dropped points from the
    simplified chain (independent of the integer decision math)."""
    worst = 0.0
    for a, b in zip(keep, keep[1:]):
        ay, ax = pts[a]
        by, bx = pts[b]
        dy, dx = by - ay, bx - ax
        den = float(dy * dy + dx * dx) or 1.0
        for i in range(a + 1, b):
            py, px = pts[i]
            cross = dy * (px - ax) - dx * (py - ay)
            worst = max(worst, abs(cross) / den ** 0.5)
    return worst


def test_dp_properties_random_walks():
    rng = np.random.default_rng(8)
    for _ in range(25):
        n = int(rng.integers(3, 120))
        pts = list(
            map(tuple, rng.integers(-1_000_000, 1_000_000, (n, 2)).astype(object))
        )
        for eps in (0, 1000, 50_000, 500_000):
            keep = dp_keep_indices(pts, eps)
            assert keep[0] == 0 and keep[-1] == n - 1
            assert keep == sorted(set(keep))
            assert _max_dev(pts, keep) <= eps + 1e-6
        k_small = len(dp_keep_indices(pts, 1000))
        k_big = len(dp_keep_indices(pts, 500_000))
        assert k_big <= k_small  # eps monotonicity


def test_dp_degenerate_and_closed():
    assert dp_keep_indices([(0, 0)], 10) == [0]
    assert dp_keep_indices([(0, 0), (5, 5)], 10) == [0, 1]
    # closed loop (first == last): point-distance fallback drives the split
    loop = [(0, 0), (0, 100), (100, 100), (100, 0), (0, 0)]
    keep = dp_keep_indices(loop, 10)
    assert keep[0] == 0 and keep[-1] == 4 and len(keep) >= 4


def test_fixture_closed_form_locally():
    for b in (0, 1, 2, 3, 5, 7, 11, 50, 96):
        wid, pts = dp_fixture_way(b)
        keep = dp_keep_indices(pts, DP_EPS)
        k = b % 3 + 2
        nb = b % 3 + 1
        want = sorted({0, k, 2 * k, 3 * k} | {e * k + 1 for e in range(nb)})
        assert keep == want, b
        # at eps above the bump size no COLLINEAR vertex can survive;
        # corners always do (a bump may persist when the recursion picks it
        # as a split endpoint — endpoint status keeps it regardless of eps)
        keep2 = dp_keep_indices(pts, BUMP + 1000)
        assert set(keep2) <= set(want), b
        assert {0, k, 2 * k, 3 * k} <= set(keep2), b


def test_simplify_ways_operator(spark):
    rows = []
    for b in (0, 1, 2):
        wid, pts = dp_fixture_way(b)
        rows.append((wid, [{"lat7": la, "lon7": lo} for la, lo in pts]))
    df = spark.createDataFrame(
        rows, "way_id long, nodes array<struct<lat7: long, lon7: long>>"
    )
    out = simplify_ways(df, eps7=DP_EPS).collect()
    got = {}
    for r in out:
        got.setdefault(r.way_id, []).append(r.pos)
    for b in (0, 1, 2):
        wid, pts = dp_fixture_way(b)
        assert sorted(got[wid]) == dp_keep_indices(pts, DP_EPS)
