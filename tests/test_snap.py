"""snap_points_to_segments: map matching to the nearest road segment.

Independent of the DuckDB twin: a numpy float brute force re-derives the
winner per point, the quantized integer distance is checked against the true
float distance within the proven |AB|/(2Q) projection-grid bound, and the
candidate generation (radius-pitch cell join) is proven complete by
comparison with an all-pairs run of the same formula.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from osmgraft.operators.snap import (
    Q_BITS,
    _check_bounds,
    snap_formula_sql,
    snap_points_to_segments,
)

Q = 1 << Q_BITS
R, L = 8192, 8192


def _fixture(n_pts=200, n_segs=400, seed=3):
    rng = np.random.default_rng(seed)
    px = rng.integers(-200_000, 200_000, n_pts)
    py = rng.integers(-200_000, 200_000, n_pts)
    ax = rng.integers(-200_000, 200_000, n_segs)
    ay = rng.integers(-200_000, 200_000, n_segs)
    bx = ax + rng.integers(-L, L, n_segs)
    by = ay + rng.integers(-L, L, n_segs)
    return px, py, ax, ay, bx, by


def _true_d2(px, py, ax, ay, bx, by):
    """Float point-to-segment squared distance (unquantized reference)."""
    abx, aby = bx - ax, by - ay
    apx, apy = px - ax, py - ay
    den = abx * abx + aby * aby
    t = np.clip(np.divide(apx * abx + apy * aby, np.where(den == 0, 1, den)), 0, 1)
    t = np.where(den == 0, 0.0, t)
    dx, dy = apx - abx * t, apy - aby * t
    return dx * dx + dy * dy


def _quant_d2q(px, py, ax, ay, bx, by):
    """The exact integer formula, recomputed scalar-side in python ints."""
    out = np.empty(len(ax), dtype=object)
    for i in range(len(ax)):
        abx, aby = int(bx[i] - ax[i]), int(by[i] - ay[i])
        apx, apy = int(px - ax[i]), int(py - ay[i])
        den = abx * abx + aby * aby
        num = apx * abx + apy * aby
        if den == 0 or num <= 0:
            tq = 0
        elif num >= den:
            tq = Q
        else:
            tq = (2 * num * Q + den) // (2 * den)
        dxq, dyq = apx * Q - abx * tq, apy * Q - aby * tq
        out[i] = dxq * dxq + dyq * dyq
    return out


def _spark_df(spark, px, py, ax, ay, bx, by):
    pts = spark.createDataFrame(
        [(i, int(px[i]), int(py[i])) for i in range(len(px))],
        "point_id long, x long, y long",
    )
    segs = spark.createDataFrame(
        [
            (j, int(ax[j]), int(ay[j]), int(bx[j]), int(by[j]))
            for j in range(len(ax))
        ],
        "seg_id long, ax long, ay long, bx long, by long",
    )
    return pts, segs


def test_snap_matches_scalar_brute_force(spark):
    px, py, ax, ay, bx, by = _fixture()
    pts, segs = _spark_df(spark, px, py, ax, ay, bx, by)
    got = {
        r["point_id"]: (r["seg_id"], r["d2q"])
        for r in snap_points_to_segments(pts, segs, radius=R, seg_len_max=L).collect()
    }
    n_matched = 0
    for i in range(len(px)):
        d2q = _quant_d2q(px[i], py[i], ax, ay, bx, by)
        ok = np.array([d <= R * R * Q * Q for d in d2q])
        if not ok.any():
            assert i not in got
            continue
        n_matched += 1
        best = min((d2q[j], j) for j in np.flatnonzero(ok))
        assert got[i] == (best[1], best[0]), f"point {i}"
    assert n_matched == len(got) > 20  # the fixture genuinely exercises matches


def test_quantized_distance_within_grid_bound(spark):
    """d2q/Q^2 is within the |AB|/(2Q) projection-grid bound of the true
    float distance^2: sqrt(d2q)/Q - sqrt(true_d2) in [0, |AB|/(2Q) + 1e-9]
    (quantized projection can only be farther than the optimum)."""
    px, py, ax, ay, bx, by = _fixture(n_pts=50, n_segs=300, seed=11)
    for i in range(len(px)):
        d2q = _quant_d2q(px[i], py[i], ax, ay, bx, by)
        true = _true_d2(
            float(px[i]), float(py[i]),
            ax.astype(float), ay.astype(float), bx.astype(float), by.astype(float),
        )
        ab = np.hypot(bx - ax, by - ay)
        gap = np.array([float(d) ** 0.5 / Q for d in d2q]) - np.sqrt(true)
        assert (gap >= -1e-6).all()
        assert (gap <= ab / (2 * Q) + 1e-6).all()


def test_degenerate_and_edge_segments(spark):
    # two zero-length segments (A == B): distance is exact point distance;
    # point (0,3) picks the origin segment (d2=9) over (4,0) (d2=25)
    pts, segs = _spark_df(
        spark,
        np.array([0, 100_000]),
        np.array([3, 0]),
        np.array([4, 0]),
        np.array([0, 0]),
        np.array([4, 0]),
        np.array([0, 0]),
    )
    rows = {
        r["point_id"]: r
        for r in snap_points_to_segments(pts, segs, radius=R, seg_len_max=L).collect()
    }
    assert (rows[0]["seg_id"], rows[0]["d2q"]) == (1, 9 * Q * Q)
    # point1 at (100000, 0) is far (> R) from both degenerate segments: no row
    assert 1 not in rows


def test_bounds_checker_rejects_overflow_params():
    with pytest.raises(ValueError, match="guard"):
        _check_bounds(radius=100, guard=50, seg_len_max=100)
    with pytest.raises(ValueError, match="overflows"):
        _check_bounds(radius=1 << 40, guard=1 << 41, seg_len_max=1 << 40)


def test_formula_sql_engine_parity():
    """The two div spellings are textually the only difference between the
    engines' formulas — everything else is one shared expression."""
    a = snap_formula_sql("x", "y", "ax", "ay", "bx", "by", div="div", guard=16384)
    b = snap_formula_sql("x", "y", "ax", "ay", "bx", "by", div="//", guard=16384)
    assert a.replace(" div ", " // ") == b


def test_nearest_vertex_argmin_and_radius(spark):
    """Argmin with (d2, boundary_id, vidx) tie-break; out-of-guard points
    drop; clamped far vertices never beat an in-radius candidate."""
    from osmgraft.operators.snap import nearest_vertex

    pts = spark.createDataFrame(
        [(1, 10, 10), (2, 0, 5_000), (3, 2_000_000_000, 2_000_000_000)],
        "point_id long, lat7 long, lon7 long",
    )
    # vertex 0 of boundary 5 and vertex 1 of boundary 9 are equidistant from
    # point 1 -> boundary 5 wins the tie; a far vertex exists for clamping
    verts = [
        (5, 0, 10, 0),
        (9, 1, 10, 20),
        (2, 3, -1_800_000_000, -1_800_000_000),
    ]
    rows = {
        r["point_id"]: r
        for r in nearest_vertex(pts, verts, guard=1_000).collect()
    }
    assert (rows[1]["boundary_id"], rows[1]["vidx"], rows[1]["d2"]) == (5, 0, 100)
    # point 2 is 4980 east of (10,20): d2 > guard^2=1e6 -> dropped
    assert 2 not in rows
    # point 3: nearest true vertex far beyond guard; clamped d2 >= guard^2 -> dropped
    assert 3 not in rows


def test_nearest_vertex_zero_shuffle_plan(spark):
    """The constant-vertex argmin is a flat projection: no Exchange at all."""
    from osmgraft.operators.snap import nearest_vertex

    pts = spark.range(100).select(
        F.col("id").alias("point_id"),
        (F.col("id") % 100).alias("lat7"),
        (F.col("id") % 50).alias("lon7"),
    )
    plan = nearest_vertex(
        pts, [(1, 0, 0, 0), (2, 1, 50, 50)], guard=1_000
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# --- Viterbi map matching ----------------------------------------------------


def _brute_viterbi(points, nodes, n_cand=4, lam=1, shift=10):
    """Exhaustive argmin over ALL candidate combinations (tie-break: the
    DP's deterministic choice — compare (cost, path-of-candidate-ranks)
    lexicographically, which matches lowest-index backtracking)."""
    from itertools import product

    q = 1 << shift
    rx = lambda lon: (lon + 1_800_000_000) // q  # noqa: E731
    ry = lambda lat: (lat + 900_000_000) // q  # noqa: E731
    nd = [(nid, rx(lon), ry(lat)) for nid, lat, lon in nodes]
    cands = []
    for lat, lon in points:
        px, py = rx(lon), ry(lat)
        em = sorted(
            ((px - cx) ** 2 + (py - cy) ** 2, nid, cx, cy) for nid, cx, cy in nd
        )[:n_cand]
        cands.append(em)
    best = None
    for combo in product(*(range(len(c)) for c in cands)):
        cost = sum(cands[t][j][0] for t, j in enumerate(combo))
        for t in range(1, len(combo)):
            _, _, ax, ay = cands[t - 1][combo[t - 1]]
            _, _, bx, by = cands[t][combo[t]]
            cost += lam * ((ax - bx) ** 2 + (ay - by) ** 2)
        key = (cost, combo)
        if best is None or key < best[0]:
            best = (key, [cands[t][j][1] for t, j in enumerate(combo)])
    return best[0][0], best[1]


def test_viterbi_continuity_beats_pointwise(spark):
    """The reason the operator exists: a noisy middle point sits nearer a
    parallel road's node, but the joint optimum keeps the track on one
    road. Two parallel node lines, track along line A with the middle
    point nudged toward line B."""
    from osmgraft.operators.snap import viterbi_match

    q = 1 << 10
    # line A nodes at y=0, parallel line B at y=12*q; x spaced 6*q
    nodes = [(i + 1, 0, i * 6 * q) for i in range(3)] + [
        (i + 101, 12 * q, i * 6 * q) for i in range(3)
    ]
    # track rides line A; the middle point is nudged to y=7*q — pointwise
    # nearest is b2 (d=5 units) not a2 (d=7), but each 12-unit line switch
    # costs 144 extra transition vs the 24-unit emission saving, so the
    # joint optimum stays (a1, a2, a3); the last point sits 1 unit past a3
    # so advancing strictly beats parking on a2 (no stay/advance tie)
    track = [(0, 0), (7 * q, 6 * q), (0, 13 * q)]
    ndf = spark.createDataFrame(nodes, "node_id long, lat7 long, lon7 long")
    pdf = spark.createDataFrame(
        [(1, s + 1, la, lo) for s, (la, lo) in enumerate(track)],
        "track_id long, seq long, lat7 long, lon7 long",
    )
    got = sorted(
        (r["seq"], r["node_id"])
        for r in viterbi_match(pdf, ndf, n_cand=4).collect()
    )
    # pointwise nearest for the middle point is node 102 (line B, d=16q)
    # vs node 2 (line A, d=24q) — Viterbi must still pick node 2
    assert got == [(1, 1), (2, 2), (3, 3)]


def test_viterbi_matches_exhaustive(spark):
    """Path AND cost equal the exhaustive argmin on pseudorandom tracks."""
    from osmgraft.operators.snap import viterbi_match

    rnd_nodes = [
        (k, (k * 48271 * 7) % 2_000_000 - 1_000_000, (k * 69621 * 11) % 4_000_000 - 2_000_000)
        for k in range(1, 13)
    ]
    rows, want = [], {}
    for tid in range(1, 9):
        n_pts = 2 + tid % 5
        pts = [
            (
                ((tid * 31 + s * 17) * 1103515245) % 2_000_000 - 1_000_000,
                ((tid * 37 + s * 19) * 2654435761) % 4_000_000 - 2_000_000,
            )
            for s in range(n_pts)
        ]
        want[tid] = _brute_viterbi(pts, rnd_nodes)
        rows += [(tid, s + 1, la, lo) for s, (la, lo) in enumerate(pts)]
    pdf = spark.createDataFrame(rows, "track_id long, seq long, lat7 long, lon7 long")
    ndf = spark.createDataFrame(rnd_nodes, "node_id long, lat7 long, lon7 long")
    got = {}
    for r in viterbi_match(pdf, ndf, n_cand=4).collect():
        got.setdefault(r["track_id"], {})[r["seq"]] = (r["node_id"], r["total_cost"])
    for tid, (cost, path) in want.items():
        g = got[tid]
        assert [g[s + 1][0] for s in range(len(path))] == path, tid
        assert g[1][1] == cost, tid


# --- geofence scrub ----------------------------------------------------------


def test_geofence_scrub_semantics(spark):
    """Inside dropped, exactly-on-radius KEPT (boundary-exclusive),
    far-away clamped candidates never falsely scrub."""
    from osmgraft.operators.snap import geofence_scrub

    site = (100, 200)  # (lat7, lon7)
    r = 50
    rows = [
        (1, 100, 200),        # at the site → dropped
        (2, 100, 200 + 49),   # d2 = 2401 < 2500 → dropped
        (3, 100, 200 + 50),   # d2 = 2500 == r² → KEPT (exclusive)
        (4, 100 + 30, 200 + 40),  # d2 = 2500 exactly → KEPT
        (5, 100, 200 + 51),   # outside → kept
        (6, 2_000_000_000, -1_500_000_000),  # globe-far: clamp path → kept
    ]
    df = spark.createDataFrame(rows, "point_id long, lat7 long, lon7 long")
    kept = sorted(r_["point_id"] for r_ in geofence_scrub(df, [site], r).collect())
    assert kept == [3, 4, 5, 6]


def test_geofence_scrub_zero_exchange_plan(spark):
    from osmgraft.operators.snap import geofence_scrub

    df = spark.createDataFrame(
        [(1, 10, 10)], "point_id long, lat7 long, lon7 long"
    )
    plan = (
        geofence_scrub(df, [(0, 0), (100, 100)], 5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "Join" not in plan


def test_geofence_scrub_validation(spark):
    import pytest as _pt

    from osmgraft.operators.snap import geofence_scrub

    df = spark.createDataFrame([(1, 0, 0)], "point_id long, lat7 long, lon7 long")
    with _pt.raises(ValueError):
        geofence_scrub(df, [], 10)
    with _pt.raises(ValueError):
        geofence_scrub(df, [(0, 0)], 0)


def test_ring_self_crossings_hand_shapes(spark):
    """Bowtie (1 proper crossing, invalid) vs square (simple); a shared-
    vertex figure-eight is NOT counted (proper-crossing strictness, the
    crossings-family contract); sub-3-vertex rings drop out."""
    from osmgraft.operators.crossings import ring_self_crossings

    rows = (
        # bowtie: (0,0)->(10,10)->(10,0)->(0,10) closes to (0,0): edges 0-1 and 2-3 cross
        [("bow", i, x, y) for i, (x, y) in enumerate([(0, 0), (10, 10), (10, 0), (0, 10)])]
        # convex square: simple
        + [("sq", i, x, y) for i, (x, y) in enumerate([(0, 0), (10, 0), (10, 10), (0, 10)])]
        # figure-eight THROUGH a shared vertex: touch, not proper crossing
        + [("fig8", i, x, y) for i, (x, y) in enumerate(
            [(0, 0), (10, 10), (20, 0), (10, 10) , (5, 15), (0, 10)])]
        # degenerate 2-vertex "ring": filtered out
        + [("deg", i, x, y) for i, (x, y) in enumerate([(0, 0), (5, 5)])]
    )
    df = spark.createDataFrame(rows, "ring_id string, seq long, x long, y long")
    out = {r["ring_id"]: r for r in ring_self_crossings(df).collect()}
    assert out["bow"]["n_crossings"] == 1 and not out["bow"]["is_simple"]
    assert out["sq"]["n_crossings"] == 0 and out["sq"]["is_simple"]
    assert out["fig8"]["n_crossings"] == 0  # vertex touch excluded by strictness
    assert "deg" not in out
