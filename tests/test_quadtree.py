"""Adaptive quadtree partitioner: decomposition laws + assignment identity."""

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"
CAP, DEPTH = 64, 10


def _pts(spark):
    from osmgraft.synth import points_from_orders

    return points_from_orders(spark, SF)


def test_quadtree_laws(spark):
    """Every leaf at depth < max obeys the cap; every leaf deeper than 1 has
    an overflowing parent; leaves are prefix-free (no leaf is an ancestor of
    another) and complete (counts sum to the point total)."""
    from osmgraft.operators.quadtree import quadtree_leaves

    pts = _pts(spark)
    total = pts.count()
    leaves = quadtree_leaves(pts, CAP, DEPTH).collect()
    assert sum(r.n_points for r in leaves) == total
    keys = [r.leaf for r in leaves]
    assert len(set(keys)) == len(keys)
    ks = set(keys)
    for k in keys:
        assert all(k[:d] not in ks for d in range(1, len(k)))  # prefix-free
    for r in leaves:
        if r.depth < DEPTH:
            assert r.n_points <= CAP, r


def test_quadtree_assign_is_a_partition(spark):
    """quadtree_assign maps every input row to exactly one leaf, and the
    per-leaf sizes equal the summary's n_points."""
    from osmgraft.operators.quadtree import quadtree_assign, quadtree_leaves

    pts = _pts(spark)
    total = pts.count()
    a = quadtree_assign(pts, CAP, DEPTH)
    assert a.count() == total  # one leaf per point: no loss, no duplication
    sizes = {
        r.leaf: r.n
        for r in a.groupBy("leaf").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    want = {r.leaf: r.n_points for r in quadtree_leaves(pts, CAP, DEPTH).collect()}
    assert sizes == want


def test_quadtree_hand_case(spark):
    """4 points in one quad with cap 2 split once; singles stay at depth 1."""
    from osmgraft.operators.quadtree import quadtree_assign

    # lon/lat 1e-7 deg units; (0,0)-ish cluster + one antipodal-ish loner
    rows = [
        (1, 10, 10), (2, 20, 20), (3, 30, 30), (4, 40, 40),  # same deep quad
        (5, -1_200_000_000, -500_000_000),
    ]
    df = spark.createDataFrame(rows, "point_id long, lon7 long, lat7 long")
    got = {r.point_id: (r.leaf, r.depth) for r in
           quadtree_assign(df, cap=2, max_depth=3).collect()}
    assert got[5][1] == 1  # loner: depth-1 leaf
    # the cluster overflows every level down to max_depth
    assert all(got[i][1] == 3 for i in (1, 2, 3, 4))
    assert len({got[i][0] for i in (1, 2, 3, 4)}) == 1
