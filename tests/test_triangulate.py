"""Ear-clipping triangulation: pure-python reference replay, partition
invariants (count, area, orientation), simplicity gate, stall rule."""

import numpy as np


def _py_earclip(ring):
    """Independent per-ring reference of the shared rule."""
    two_a = sum(
        ring[i][0] * ring[(i + 1) % len(ring)][1]
        - ring[(i + 1) % len(ring)][0] * ring[i][1]
        for i in range(len(ring))
    )
    if two_a == 0:
        return []
    rem = list(reversed(ring)) if two_a < 0 else list(ring)

    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    tris = []
    while len(rem) >= 3:
        m = len(rem)
        found = None
        for j in range(m):
            p, c, n = rem[(j - 1) % m], rem[j], rem[(j + 1) % m]
            if cross(p, c, n) <= 0:
                continue
            blocked = False
            for q in range(m):
                if q in ((j - 1) % m, j, (j + 1) % m):
                    continue
                v = rem[q]
                if cross(p, c, v) >= 0 and cross(c, n, v) >= 0 and cross(n, p, v) >= 0:
                    blocked = True
                    break
            if not blocked:
                found = j
                break
        if found is None:
            break
        m = len(rem)
        p, c, n = rem[(found - 1) % m], rem[found], rem[(found + 1) % m]
        tris.append((p, c, n))
        rem.pop(found)
    return tris


def _spark_rings(spark, rings):
    rows = [
        (rid, i + 1, x, y)
        for rid, ring in rings.items()
        for i, (x, y) in enumerate(ring)
    ]
    return spark.createDataFrame(rows, "ring_id long, seq long, x long, y long")


def test_matches_python_reference_and_invariants(spark):
    from osmgraft.operators.triangulate import triangulate_rings

    rings = {
        1: [(0, 0), (4, 0), (4, 4), (0, 4)],                       # square CCW
        2: [(0, 0), (0, 6), (6, 6), (6, 0)],                       # square CW
        3: [(0, 0), (10, 0), (10, 10), (5, 3), (0, 10)],           # concave (arrowhead)
        4: [(0, 0), (8, 1), (6, 4), (9, 7), (1, 8), (3, 4)],       # zigzag hexagon
        5: [(0, 0), (5, 1), (9, 9)],                               # bare triangle
    }
    got = {}
    for r in triangulate_rings(_spark_rings(spark, rings)).collect():
        got.setdefault(r["ring_id"], []).append(
            (r["tri"], ((r["ax"], r["ay"]), (r["bx"], r["by"]), (r["cx"], r["cy"])))
        )
    for rid, ring in rings.items():
        want = _py_earclip(ring)
        tris = [t for _, t in sorted(got.get(rid, []))]
        assert tris == want, rid
        assert len(tris) == len(ring) - 2
        # orientation + area partition
        def cr(o, a, b):
            return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

        assert all(cr(*t) > 0 for t in tris)
        two_a = abs(
            sum(
                ring[i][0] * ring[(i + 1) % len(ring)][1]
                - ring[(i + 1) % len(ring)][0] * ring[i][1]
                for i in range(len(ring))
            )
        )
        assert sum(cr(*t) for t in tris) == two_a


def test_nonsimple_and_zero_area_excluded(spark):
    from osmgraft.operators.triangulate import triangulate_rings

    rings = {
        7: [(0, 0), (4, 4), (4, 0), (0, 4)],   # bowtie -> crossing gate drops it
        8: [(0, 0), (3, 3), (6, 6)],           # collinear -> zero area
        9: [(0, 0), (2, 0), (2, 2)],           # control: valid triangle
    }
    got = {r["ring_id"] for r in triangulate_rings(_spark_rings(spark, rings)).collect()}
    assert got == {9}


def test_two_chain_construction_simple(spark):
    """Random point clouds -> two-chain rings are simple (crossing-gate
    never drops them) and triangulate to n-2."""
    from osmgraft.operators.triangulate import triangulate_rings, two_chain_ring

    rng = np.random.RandomState(3)
    rows = []
    for rid in range(20):
        n = 4 + rid % 7
        pts = set()
        while len(pts) < n:
            pts.add((int(rng.randint(0, 50)), int(rng.randint(0, 50))))
        rows += [(rid, x, y) for x, y in pts]
    pts_df = spark.createDataFrame(rows, "ring_id long, x long, y long")
    out = triangulate_rings(two_chain_ring(pts_df)).collect()
    per = {}
    for r in out:
        per[r["ring_id"]] = max(per.get(r["ring_id"], 0), r["tri"])
    sizes = {rid: 0 for rid, *_ in rows}
    for rid, *_ in rows:
        sizes[rid] += 1
    for rid, n in sizes.items():
        # collinear clouds (zero area) may vanish; others must fully clip
        if rid in per:
            assert per[rid] == n - 2
    assert len(per) >= 18  # general position: at most a couple degenerate
