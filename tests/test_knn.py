"""kNN ring-expansion exactness vs brute force, determinism, edge cases."""

import numpy as np
import pytest

from osmgraft.operators.knn import knn_join


@pytest.fixture(scope="module")
def small_world(spark):
    rng = np.random.default_rng(42)
    n = 3000
    pts = spark.createDataFrame(
        list(
            zip(
                range(n),
                rng.integers(-600_000_000, 600_000_000, n).tolist(),
                rng.integers(-1_790_000_000, 1_790_000_000, n).tolist(),
            )
        ),
        "point_id long, lat7 int, lon7 int",
    )
    qs = spark.createDataFrame(
        list(
            zip(
                range(7),
                rng.integers(-600_000_000, 600_000_000, 7).tolist(),
                rng.integers(-1_790_000_000, 1_790_000_000, 7).tolist(),
            )
        ),
        "query_id long, lat7 int, lon7 int",
    )
    return pts, qs


def _brute(pts_rows, q_rows, k):
    from osmgraft.operators.knn import py_dist2

    out = {}
    for q in q_rows:
        d = sorted(
            ((py_dist2(q.lat7, q.lon7, p.lat7, p.lon7), p.point_id) for p in pts_rows)
        )[:k]
        out[q.query_id] = [(pid, dist) for dist, pid in d]
    return out

def test_knn_exact_vs_brute(spark, small_world):
    pts, qs = small_world
    got = knn_join(pts, qs, k=5).collect()
    want = _brute(pts.collect(), qs.collect(), 5)
    for r in got:
        pid, dist = want[r.query_id][r.rank - 1]
        assert (r.neighbor_id, r.dist2) == (pid, dist), r


def test_knn_small_cell_forces_expansion(spark, small_world):
    pts, qs = small_world
    got = knn_join(pts, qs, k=3, cell_size=1_000_000)  # tiny cells → many rings + fallback
    want = _brute(pts.collect(), qs.collect(), 3)
    for r in got.collect():
        pid, dist = want[r.query_id][r.rank - 1]
        assert (r.neighbor_id, r.dist2) == (pid, dist)


def test_knn_antimeridian_wrap(spark):
    """Nearest neighbor across the ±180° line must be found via wrapped cells."""
    pts = spark.createDataFrame(
        [(1, 0, -1_789_000_000), (2, 0, 1_000_000_000)],
        "point_id long, lat7 int, lon7 int",
    )
    qs = spark.createDataFrame(
        [(9, 0, 1_789_000_000)], "query_id long, lat7 int, lon7 int"
    )
    got = knn_join(pts, qs, k=1).collect()
    assert len(got) == 1 and got[0].neighbor_id == 1
    assert got[0].dist2 == 22_000_000**2  # wrapped, not (3.578e9)^2


def test_knn_k_exceeds_points(spark):
    pts = spark.createDataFrame(
        [(1, 0, 0), (2, 10, 10)], "point_id long, lat7 int, lon7 int"
    )
    qs = spark.createDataFrame([(9, 5, 5)], "query_id long, lat7 int, lon7 int")
    got = knn_join(pts, qs, k=5).collect()
    assert len(got) == 2
    assert [r.rank for r in sorted(got, key=lambda r: r.rank)] == [1, 2]


def test_knn_within_radius_matches_iterative(spark):
    """The distributed bounded-radius plan must agree with the exact iterative
    kNN for every query whose kth neighbor is inside the radius bound."""
    from pyspark.sql import functions as F

    from osmgraft.operators.knn import DEFAULT_CELL, knn_join, knn_within_radius
    from osmgraft.synth import points_projection

    orders = spark.range(1, 20_001, 1, 4).select(F.col("id").alias("o_orderkey"))
    pts = points_projection(orders).withColumnRenamed("point_id", "point_id")
    queries = (
        points_projection(
            spark.range(1, 8, 1, 2).select((F.col("id") * 977).alias("o_orderkey"))
        )
        .withColumnRenamed("point_id", "query_id")
    )
    k = 5
    exact = {
        (r.query_id, r.rank): (r.neighbor_id, r.dist2)
        for r in knn_join(pts, queries, k).collect()
    }
    radius = 2
    bound = (radius * DEFAULT_CELL) ** 2
    fast = knn_within_radius(pts, queries, k, radius_cells=radius).collect()
    by_q = {}
    for r in fast:
        by_q.setdefault(r.query_id, []).append(r)
    checked = 0
    for qid, rows in by_q.items():
        rows.sort(key=lambda r: r.rank)
        if len(rows) == k and rows[-1].dist2 <= bound:
            for r in rows:
                assert exact[(qid, r.rank)] == (r.neighbor_id, r.dist2)
            checked += 1
    assert checked >= 1  # at least one query fully resolved within the radius


def test_h3_pitch_lower_bound_holds():
    """The disk-sizing constant must sit BELOW the true minimum adjacent
    center pitch globally (it sizes the covering disk: smaller = safer)."""
    import numpy as np

    from osmgraft.functions import h3real as h3
    from osmgraft.operators.knn import _H3_PITCH_MIN_7

    rng = np.random.default_rng(17)
    for res in (4, 6):
        lat7 = rng.integers(-890_000_000, 890_000_001, 4000)
        lon7 = rng.integers(-1_800_000_000, 1_800_000_000, 4000)
        cells = np.unique(h3.latlng_to_cell(lat7, lon7, res))
        la, lo = h3.cell_to_latlng(cells)
        idx = {int(c): i for i, c in enumerate(cells)}
        worst = np.inf
        for c, disk in zip(cells, h3.grid_disk(cells, 1)):
            i = idx[int(c)]
            for nb in disk:
                j = idx.get(int(nb))
                if j is None or j == i:
                    continue
                dla = (la[i] - la[j]) * 1e7
                dlo = abs(lo[i] - lo[j]) * 1e7
                dlo = min(dlo, 3.6e9 - dlo) * np.cos(np.radians((la[i] + la[j]) / 2))
                worst = min(worst, np.hypot(dla, dlo))
        assert worst > _H3_PITCH_MIN_7[res], (res, worst, _H3_PITCH_MIN_7[res])


def test_knn_h3_ball_matches_bruteforce(spark):
    """H3-disk candidate pruning is exact: results equal brute-force ranked
    ball membership over all points (sf0.001)."""
    from pyspark.sql import functions as F

    from osmgraft.operators.knn import _dist2, _topk, knn_h3_ball
    from osmgraft.queries import _knn_queries_df
    from osmgraft.synth import points_from_orders

    pts = points_from_orders(spark, "/root/testdata/sf0.001")
    q = _knn_queries_df(spark, "/root/testdata/sf0.001")
    r7 = 25_000_000
    got = sorted(map(tuple, knn_h3_ball(pts, q, k=5, radius7=r7, res=4)
                     .select("query_id", "neighbor_id", "dist2", "rank").collect()))
    brute_cand = (
        pts.crossJoin(q.select("query_id", F.col("lat7").alias("qlat7"),
                               F.col("lon7").alias("qlon7")))
        .select("query_id", F.col("point_id").alias("neighbor_id"),
                _dist2(F.col("qlat7"), F.col("qlon7"), F.col("lat7"), F.col("lon7")).alias("dist2"))
        .where(F.col("dist2") <= r7 * r7)
    )
    want = sorted(map(tuple, _topk(brute_cand, 5)
                      .select("query_id", "neighbor_id", "dist2", "rank").collect()))
    assert got == want and len(got) > 0
