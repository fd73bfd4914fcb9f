"""segment_crossings: strict proper-crossing join.

Golden cases pin the predicate semantics (touch/collinear excluded); the
random test checks the CELL candidate generator is complete by comparing
against an all-pairs brute force that shares only the predicate.
"""

import numpy as np

from osmgraft.operators.crossings import segment_crossings


def _ccw(a, b, c):
    return (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])


def _crosses(p, q):
    a, b = (p[0], p[1]), (p[2], p[3])
    c, d = (q[0], q[1]), (q[2], q[3])
    d1, d2 = _ccw(a, b, c), _ccw(a, b, d)
    d3, d4 = _ccw(c, d, a), _ccw(c, d, b)
    return ((d1 > 0 > d2) or (d1 < 0 < d2)) and ((d3 > 0 > d4) or (d3 < 0 < d4))


def _run(spark, segs, pitch=64):
    df = spark.createDataFrame(
        [(i, *s) for i, s in enumerate(segs)],
        "seg_id long, ax long, ay long, bx long, by long",
    )
    return sorted((r.seg_a, r.seg_b) for r in segment_crossings(df, pitch).collect())


def test_golden_cases(spark):
    segs = [
        (0, 0, 10, 10),    # 0: diagonal
        (0, 10, 10, 0),    # 1: crosses 0 at (5,5)
        (10, 10, 20, 10),  # 2: touches 0 at its endpoint -> excluded
        (2, 2, 6, 6),      # 3: collinear overlap with 0 -> excluded
        (0, 20, 10, 20),   # 4: segment 5's endpoint (5,20) lies ON it: T-touch
        (5, 0, 5, 20),     # 5: crosses 0, 1, 3 at (5,5); T-touches 4
    ]
    got = _run(spark, segs)
    assert got == [(0, 1), (0, 5), (1, 3), (1, 5), (3, 5)]
    assert (0, 2) not in got  # shared endpoint excluded
    assert (0, 3) not in got  # collinear overlap excluded
    assert (4, 5) not in got  # endpoint-on-interior T-touch excluded
    for a, b in got:
        assert _crosses(segs[a], segs[b])


def test_random_matches_all_pairs_brute_force(spark):
    rng = np.random.default_rng(11)
    segs = []
    for _ in range(120):
        x, y = rng.integers(-500, 500, 2)
        dx, dy = rng.integers(-60, 61, 2)
        segs.append((int(x), int(y), int(x + dx), int(y + dy)))
    got = _run(spark, segs, pitch=64)
    want = sorted(
        (i, j)
        for i in range(len(segs))
        for j in range(i + 1, len(segs))
        if _crosses(segs[i], segs[j])
    )
    assert got == want and len(want) > 5


def test_no_python_in_plan(spark):
    df = spark.createDataFrame([(0, 0, 0, 5, 5)], "seg_id long, ax long, ay long, bx long, by long")
    plan = segment_crossings(df, 64)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "CartesianProduct" not in plan
