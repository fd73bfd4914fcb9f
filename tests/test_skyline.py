"""skyline_2d vs the quadratic dominance definition, ties and groups."""

import numpy as np

from osmgraft.operators.skyline import skyline_2d


def _brute(rows):
    def dominated(p):
        return any(
            q[1] <= p[1] and q[2] <= p[2] and (q[1] < p[1] or q[2] < p[2])
            for q in rows
        )

    return sorted(r[0] for r in rows if not dominated(r))


def _df(spark, rows, grp=False):
    if grp:
        return spark.createDataFrame(rows, "pid long, x long, y long, g long")
    return spark.createDataFrame(rows, "pid long, x long, y long")


def test_skyline_matches_brute_force(spark):
    rng = np.random.default_rng(5)
    rows = [
        (i, int(x), int(y))
        for i, (x, y) in enumerate(zip(rng.integers(0, 40, 120), rng.integers(0, 40, 120)))
    ]
    got = sorted(r.pid for r in skyline_2d(_df(spark, rows), "x", "y").collect())
    assert got == _brute(rows)


def test_skyline_keeps_all_exact_ties(spark):
    # two identical best points: neither dominates the other -> both kept;
    # (2,2) is dominated by them, (0,5)/(5,0) are incomparable -> kept.
    rows = [(1, 1, 1), (2, 1, 1), (3, 2, 2), (4, 0, 5), (5, 5, 0)]
    got = sorted(r.pid for r in skyline_2d(_df(spark, rows), "x", "y").collect())
    assert got == [1, 2, 4, 5]


def test_skyline_same_x_and_same_y_strictness(spark):
    # (3,7) dominates (3,9) (tie x, strict y) and (5,7) (strict x, tie y)
    rows = [(1, 3, 7), (2, 3, 9), (3, 5, 7), (4, 2, 8)]
    got = sorted(r.pid for r in skyline_2d(_df(spark, rows), "x", "y").collect())
    assert got == [1, 4]


def test_skyline_groups_are_independent(spark):
    rows = [(1, 1, 1, 0), (2, 2, 2, 0), (3, 2, 2, 1), (4, 9, 9, 2)]
    got = sorted(
        r.pid
        for r in skyline_2d(_df(spark, rows, grp=True), "x", "y", ["g"]).collect()
    )
    assert got == [1, 3, 4]  # (2,2) dominated only inside group 0


def test_skyline_plan_broadcasts_front(spark):
    rows = [(i, i, 100 - i) for i in range(50)]
    plan = (
        skyline_2d(_df(spark, rows), "x", "y")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "SortMergeJoin" not in plan
