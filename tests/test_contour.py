"""contour_segments: marching-squares isolines over sparse integer rasters.

Independent of the DuckDB twin: a pure-python reference re-derives the
case-table output per 2x2 square from first principles (edge-crossing +
inside-on-the-left orientation, center-outside saddles); the loop-closure
property (every directed head meets exactly one tail) is checked on random
rasters — it holds iff the orientation convention is globally consistent,
so it catches any wrong case-table entry; goldens pin the two saddle cases.
"""

import numpy as np
import pytest

from osmgraft.operators.contour import _CASES, _MID, contour_segments


def _mid_xy(tag, sqx, sqy):
    return {
        "B": (2 * sqx + 1, 2 * sqy),
        "L": (2 * sqx, 2 * sqy + 1),
        "R": (2 * sqx + 2, 2 * sqy + 1),
        "T": (2 * sqx + 1, 2 * sqy + 2),
    }[tag]


def _ref_segments(inside: set[tuple[int, int]]):
    """First-principles reference: enumerate all squares with >=1 inside
    corner, classify, emit directed midpoint segments."""
    sqs = set()
    for cx, cy in inside:
        sqs |= {(cx, cy), (cx - 1, cy), (cx, cy - 1), (cx - 1, cy - 1)}
    out = []
    for sqx, sqy in sqs:
        mask = (
            ((sqx, sqy) in inside) * 1
            + ((sqx + 1, sqy) in inside) * 2
            + ((sqx, sqy + 1) in inside) * 4
            + ((sqx + 1, sqy + 1) in inside) * 8
        )
        for frm, to in _CASES.get(mask, []):
            out.append(_mid_xy(frm, sqx, sqy) + _mid_xy(to, sqx, sqy))
    return sorted(out)


def _run(spark, cells, threshold=1):
    df = spark.createDataFrame(cells, "cx long, cy long, cnt long")
    return sorted(
        (r.x0, r.y0, r.x1, r.y1) for r in contour_segments(df, threshold).collect()
    )


def test_case_table_consistency():
    """Every case's segments cross exactly the edges with mixed corners and
    keep inside on the left — derived independently of the table itself."""
    corner_of = {"B": ((0, 0), (1, 0)), "L": ((0, 0), (0, 1)),
                 "R": ((1, 0), (1, 1)), "T": ((0, 1), (1, 1))}
    bit = {(0, 0): 1, (1, 0): 2, (0, 1): 4, (1, 1): 8}
    corner_xy = {(0, 0): (0, 0), (1, 0): (2, 0), (0, 1): (0, 2), (1, 1): (2, 2)}
    for mask in range(1, 15):
        segs = _CASES.get(mask, [])
        crossed = {
            t for t, (ca, cb) in corner_of.items()
            if bool(mask & bit[ca]) != bool(mask & bit[cb])
        }
        used = {t for s in segs for t in s}
        assert used == crossed, f"case {mask}: edges {used} != crossed {crossed}"
        saddle = mask in (6, 9)
        for frm, to in segs:
            fx, fy = _mid_xy(frm, 0, 0)
            tx, ty = _mid_xy(to, 0, 0)
            dx, dy = tx - fx, ty - fy
            # corners adjacent to this segment's crossed edges; in a saddle
            # each segment wraps only ITS shared inside corner — the other
            # inside corner belongs to the sibling segment and is exempt
            wrapped = set(corner_of[frm]) & set(corner_of[to])
            for c, b in bit.items():
                px, py = corner_xy[c]
                cross = dx * (py - fy) - dy * (px - fx)
                if mask & b:
                    if not saddle or c in wrapped:
                        assert cross >= 0, f"case {mask}: inside corner {c} on the right"
                else:
                    assert cross <= 0, f"case {mask}: outside corner {c} on the left"


def test_single_cell_diamond(spark):
    got = _run(spark, [(5, 7, 3)])
    assert got == _ref_segments({(5, 7)})
    assert len(got) == 4
    heads = sorted((x1, y1) for _, _, x1, y1 in got)
    tails = sorted((x0, y0) for x0, y0, _, _ in got)
    assert heads == tails  # one closed loop


def test_saddles_center_outside(spark):
    # diagonal pair (0,0)+(1,1): square (0,0) has mask 9 -> TWO segments
    got = _run(spark, [(0, 0, 1), (1, 1, 1)])
    assert got == _ref_segments({(0, 0), (1, 1)})
    # center-outside: the two diamonds stay disjoint => 8 segments, and
    # the mask-9 square contributes both (B->L) and (T->R)
    assert len(got) == 8
    assert (1, 0, 0, 1) in got  # B->L of square (0,0)
    assert (1, 2, 2, 1) in got  # T->R of square (0,0)
    # anti-diagonal pair gives the mask-6 saddle
    got6 = _run(spark, [(1, 0, 1), (0, 1, 1)])
    assert got6 == _ref_segments({(1, 0), (0, 1)})
    assert len(got6) == 8


def test_threshold_and_missing_cells(spark):
    got = _run(spark, [(0, 0, 5), (1, 0, 1), (9, 9, 2)], threshold=2)
    assert got == _ref_segments({(0, 0), (9, 9)})


def test_random_rasters_match_reference_and_close(spark):
    rng = np.random.default_rng(13)
    for trial in range(3):
        pts = {
            (int(x), int(y))
            for x, y in zip(rng.integers(0, 14, 120), rng.integers(0, 14, 120))
        }
        cells = [(x, y, 1) for x, y in pts]
        got = _run(spark, cells)
        assert got == _ref_segments(pts)
        heads = sorted((x1, y1) for _, _, x1, y1 in got)
        tails = sorted((x0, y0) for x0, y0, _, _ in got)
        assert heads == tails  # global loop closure


def test_no_python_in_plan(spark):
    df = spark.createDataFrame([(0, 0, 1)], "cx long, cy long, cnt long")
    plan = contour_segments(df, 1)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "BatchEval" not in plan


# --- ring assembly ---------------------------------------------------------------

def _ref_rings(inside: set[tuple[int, int]]):
    """First-principles reference: walk the successor function of the
    reference segments with a plain dict, one cycle at a time."""
    segs = _ref_segments(inside)
    by_start = {(x0, y0): (x1, y1) for x0, y0, x1, y1 in segs}
    assert len(by_start) == len(segs)  # unique starts (functional graph)
    seen, rings = set(), []
    for start in sorted(by_start):
        if start in seen:
            continue
        loop, cur = [], start
        while cur not in seen:
            seen.add(cur)
            loop.append(cur)
            cur = by_start[cur]
        assert cur == start  # pure cycle
        area2 = sum(
            a[0] * b[1] - b[0] * a[1]
            for a, b in zip(loop, loop[1:] + loop[:1])
        )
        rid = min(x * 4294967296 + y for x, y in loop)
        rings.append((rid, len(loop), area2))
    return sorted(rings)


def _run_rings(spark, inside):
    from osmgraft.operators.contour import assemble_rings

    cells = [(x, y, 1) for x, y in inside]
    df = spark.createDataFrame(cells, "cx long, cy long, cnt long")
    out = assemble_rings(contour_segments(df, 1)).collect()
    return sorted((r.ring_id, r.n_seg, r.area2) for r in out)


def test_single_cell_ring(spark):
    got = _run_rings(spark, {(5, 7)})
    # one diamond: 4 segments, shoelace sum 4 (2x the diamond area 2), CCW>0
    assert len(got) == 1
    rid, n_seg, area2 = got[0]
    assert (n_seg, area2) == (4, 4)
    assert rid == 9 * 4294967296 + 14  # min vertex (2*5-1, 2*7)


def test_saddle_two_rings(spark):
    got = _run_rings(spark, {(0, 0), (1, 1)})
    assert got == _ref_rings({(0, 0), (1, 1)})
    assert [g[1:] for g in got] == [(4, 4), (4, 4)]  # two disjoint diamonds


def test_block_and_hole_orientation(spark):
    # 3x3 block minus center: outer CCW ring (positive) + inner hole (negative)
    inside = {(x, y) for x in range(3) for y in range(3)} - {(1, 1)}
    got = _run_rings(spark, inside)
    assert got == _ref_rings(inside)
    areas = sorted(a for _, _, a in got)
    assert areas[0] < 0 < areas[1]  # hole CW, outer CCW


def test_random_rings_match_reference(spark):
    rng = np.random.default_rng(29)
    for trial in range(3):
        pts = {
            (int(x), int(y))
            for x, y in zip(rng.integers(0, 12, 90), rng.integers(0, 12, 90))
        }
        assert _run_rings(spark, pts) == _ref_rings(pts)


def test_rings_empty(spark):
    df = spark.createDataFrame([(0, 0, 1)], "cx long, cy long, cnt long")
    from osmgraft.operators.contour import assemble_rings

    assert assemble_rings(contour_segments(df, 99)).count() == 0


def test_ring_centroids_unit_square(spark):
    """A single inside cell yields one CCW diamond ring whose exact centroid
    terms put the centroid at the cell center (doubled coords)."""
    from osmgraft.operators.contour import contour_segments, ring_centroids

    cells = spark.createDataFrame([(5, 7, 9)], "cx long, cy long, cnt long")
    r = ring_centroids(contour_segments(cells, threshold=2)).collect()
    assert len(r) == 1
    row = r[0]
    assert row.n_seg == 4
    assert row.area2 > 0  # CCW outer ring
    # The ring is the diamond through the 4 edge midpoints around the cell
    # point (5, 7); its centroid is the doubled cell point (10, 14).
    # centroid = (cxn3/(3*area2), cyn3/(3*area2))
    assert row.cxn3 == 3 * row.area2 * 10
    assert row.cyn3 == 3 * row.area2 * 14
