"""voronoi_assign / voronoi_catchment vs a brute-force numpy reference."""

import numpy as np

from osmgraft.operators.voronoi import voronoi_assign, voronoi_catchment


def _dfs(spark, cells, seeds):
    c = spark.createDataFrame(
        [(int(x), int(y), int(n)) for x, y, n in cells], "cx long, cy long, cnt long"
    )
    s = spark.createDataFrame(
        [(int(i), int(x), int(y)) for i, x, y in seeds],
        "seed_id long, sx long, sy long",
    )
    return c, s


def _brute(cells, seeds, z):
    n = 1 << z
    out = {}
    for cx, cy, cnt in cells:
        best = None
        for sid, sx, sy in seeds:
            dx = min(abs(cx - sx), n - abs(cx - sx))
            d2 = dx * dx + (cy - sy) ** 2
            if best is None or (d2, sid) < best[0]:
                best = ((d2, sid), cnt)
        out[(cx, cy)] = (best[0][1], best[0][0], best[1])
    return out


def test_voronoi_matches_brute_force(spark):
    rng = np.random.default_rng(11)
    z = 6
    cells = [
        (int(x), int(y), int(n))
        for x, y, n in zip(
            rng.integers(0, 64, 80), rng.integers(0, 64, 80), rng.integers(1, 9, 80)
        )
    ]
    cells = list({(x, y): (x, y, n) for x, y, n in cells}.values())
    seeds = [(i, int(x), int(y)) for i, (x, y) in enumerate(
        zip(rng.integers(0, 64, 7), rng.integers(0, 64, 7)))]
    c, s = _dfs(spark, cells, seeds)
    got = {
        (r.cx, r.cy): (r.seed_id, r.d2, r.cnt)
        for r in voronoi_assign(c, s, z=z).collect()
    }
    assert got == _brute(cells, seeds, z)


def test_voronoi_wraps_antimeridian(spark):
    # z=4 -> 16 columns: cell at x=15 is distance 1 from seed at x=0,
    # distance 13 from the seed at x=2... nearest must be the wrapped one.
    c, s = _dfs(spark, [(15, 5, 3)], [(0, 0, 5), (1, 12, 5)])
    row = voronoi_assign(c, s, z=4).collect()[0]
    assert (row.seed_id, row.d2) == (0, 1)  # wrap dx=1, not 15


def test_voronoi_tie_breaks_to_min_seed_id(spark):
    # both seeds exactly 2 away; the winner must be the smaller id.
    c, s = _dfs(spark, [(8, 8, 1)], [(7, 8, 6), (3, 8, 10)])
    row = voronoi_assign(c, s, z=5).collect()[0]
    assert row.seed_id == 3 and row.d2 == 4


def test_voronoi_catchment_totals(spark):
    cells = [(0, 0, 2), (1, 0, 3), (30, 0, 5)]
    c, s = _dfs(spark, cells, [(0, 0, 0), (1, 30, 0)])
    got = {r.seed_id: (r.n_cells, r.n_points)
           for r in voronoi_catchment(voronoi_assign(c, s, z=5)).collect()}
    assert got == {0: (2, 5), 1: (1, 5)}


def test_voronoi_plan_broadcasts_seeds(spark):
    c, s = _dfs(spark, [(1, 1, 1)], [(0, 0, 0)])
    plan = voronoi_assign(c, s, z=5)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan
    assert "partial_min" in plan or "partial" in plan.lower()
