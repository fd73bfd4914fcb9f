"""STR bulk-load: python replay of the textbook algorithm, leaf-capacity
and bbox invariants, bucket-offset rank correctness across buckets."""

import math


def _py_str(pts, b):
    n = len(pts)
    p = (n + b - 1) // b
    s = math.isqrt(p)
    if s * s < p:
        s += 1
    xs = sorted(pts, key=lambda t: (t[1], t[2], t[0]))
    leaves = {}
    for rx, pt in enumerate(xs):
        sl = rx // (s * b)
        leaves.setdefault(sl, []).append(pt)
    out = {}
    for sl, grp in leaves.items():
        grp.sort(key=lambda t: (t[2], t[1], t[0]))
        for ry, pt in enumerate(grp):
            lf = ry // b
            key = (sl, lf)
            e = out.setdefault(key, [0, None, None, None, None])
            e[0] += 1
            e[1] = pt[1] if e[1] is None else min(e[1], pt[1])
            e[2] = pt[1] if e[2] is None else max(e[2], pt[1])
            e[3] = pt[2] if e[3] is None else min(e[3], pt[2])
            e[4] = pt[2] if e[4] is None else max(e[4], pt[2])
    return {k: tuple(v) for k, v in out.items()}


def test_matches_python_replay_and_invariants(spark):
    from osmgraft.operators.packing import str_pack_leaves

    pts = [
        (i, ((i * 2654435761) % 997) * 4194304, ((i * 40503) % 991) * 4194304)
        for i in range(530)
    ]
    # spread across many x-buckets at shift 22 (coords are multiples of 2^22)
    df = spark.createDataFrame(pts, "point_id long, x long, y long")
    got = {
        (r["slice"], r["leaf"]): (r["n_pts"], r["min_x"], r["max_x"], r["min_y"], r["max_y"])
        for r in str_pack_leaves(df, capacity=32).collect()
    }
    assert got == _py_str(pts, 32)
    assert all(v[0] <= 32 for v in got.values())
    assert sum(v[0] for v in got.values()) == 530


def test_small_and_duplicate_coords(spark):
    from osmgraft.operators.packing import str_pack_leaves

    pts = [(i, 5, 5) for i in range(10)]  # all duplicates -> id tiebreak
    df = spark.createDataFrame(pts, "point_id long, x long, y long")
    got = str_pack_leaves(df, capacity=4).collect()
    assert sorted((r["slice"], r["leaf"], r["n_pts"]) for r in got) == _py_list(got, pts)


def _py_list(got, pts):
    ref = _py_str(pts, 4)
    return sorted((k[0], k[1], v[0]) for k, v in ref.items())


def test_plan_no_single_partition_sort(spark):
    """The engine must not contain a global (non-partitioned) Sort feeding
    a Window over all rows: every Window partitions by bkt or slice."""
    from osmgraft.operators.packing import str_pack_leaves

    df = spark.createDataFrame([(1, 2, 3)], "point_id long, x long, y long")
    plan = str_pack_leaves(df)._jdf.queryExecution().optimizedPlan().toString()
    import re

    for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
        spec = m.group(1)
        assert ("bkt" in spec) or ("slice" in spec) or ("bkt#" in spec), spec


def test_prune_stats_hand(spark):
    """Hand leaf directory + boxes: intersect counts, zero-hit query kept,
    totals constant."""
    from osmgraft.operators.packing import str_prune_stats

    leaves = spark.createDataFrame(
        [
            (0, 0, 10, 0, 4, 0, 4),
            (0, 1, 20, 5, 9, 0, 4),
            (1, 0, 30, 0, 4, 5, 9),
        ],
        "slice long, leaf long, n_pts long, min_x long, max_x long, min_y long, max_y long",
    )
    boxes = spark.createDataFrame(
        [
            (1, 0, 2, 0, 2),      # hits leaf (0,0) only
            (2, 4, 5, 4, 5),      # corner-touches all three (closed bboxes)
            (3, 100, 200, 100, 200),  # hits nothing
        ],
        "query_id long, qx0 long, qx1 long, qy0 long, qy1 long",
    )
    got = {
        r["query_id"]: (r["n_leaves_hit"], r["n_pts_bound"], r["n_leaves_total"], r["n_pts_total"])
        for r in str_prune_stats(leaves, boxes).collect()
    }
    assert got == {1: (1, 10, 3, 60), 2: (3, 60, 3, 60), 3: (0, 0, 3, 60)}
