"""rhombus_overlap_pairs: convex polygon-overlap join via the 4-axis SAT.

Independent of the DuckDB twin: a shapely-free float brute force re-derives
overlap per pair from the rhombus vertex geometry (point-in-rhombus of each
vertex + edge-pair intersection), golden hand-built cases pin the closed-region
semantics (touching counts, containment has no separating axis), and the grid
candidate generator is proven complete against an all-pairs run of the same
SAT predicate.
"""

import numpy as np
import pytest

from osmgraft.operators.overlap import rhombus_overlap_pairs, sat_formula_sql


def _sat_py(dx, dy, pa, qa, pb, qb):
    """The exact SAT predicate in python ints (mirrors sat_formula_sql)."""
    ra = pa * qa + max(qa * pb, pa * qb)
    rb = pb * qb + max(qb * pa, pb * qa)
    return (
        abs(dx * qa + dy * pa) <= ra
        and abs(dx * qa - dy * pa) <= ra
        and abs(dx * qb + dy * pb) <= rb
        and abs(dx * qb - dy * pb) <= rb
    )


def _overlap_float(ax, ay, pa, qa, bx, by, pb, qb):
    """Brute-force closed-overlap of two rhombi |x-cx|/p + |y-cy|/q <= 1 by
    L1-ellipse membership: they intersect iff min over the boundary/interior
    of A of the B-norm is <= 1.  Sample A's boundary densely plus both
    centers — exact enough at the integer scales used here (min separation
    in the fixtures is >= 1 unit, sampling error << 1)."""
    t = np.linspace(0.0, 2 * np.pi, 4096)
    # rhombus boundary: (p*cos in L1 sense) — parametrize by walking edges
    s = np.linspace(0.0, 1.0, 1025)
    vx = np.array([ax + pa, ax, ax - pa, ax, ax + pa], dtype=float)
    vy = np.array([ay, ay + qa, ay, ay - qa, ay], dtype=float)
    ex = np.concatenate([vx[i] + (vx[i + 1] - vx[i]) * s for i in range(4)])
    ey = np.concatenate([vy[i] + (vy[i + 1] - vy[i]) * s for i in range(4)])
    ex = np.append(ex, ax)  # include A's center (covers B-contains-A ... no,
    ey = np.append(ey, ay)  # A-center-in-B; B-in-A handled symmetrically)
    in_b = (np.abs(ex - bx) / pb + np.abs(ey - by) / qb).min() <= 1.0 + 1e-9
    in_a = abs(bx - ax) / pa + abs(by - ay) / qa <= 1.0 + 1e-9
    return bool(in_b or in_a)


GOLDEN = [
    # (dx, dy, pa, qa, pb, qb, expect) — A at origin, B at (dx, dy)
    (0, 0, 10, 10, 3, 3, True),  # containment: no separating axis
    (13, 0, 10, 10, 3, 3, True),  # vertex-touching on the x axis (closed)
    (14, 0, 10, 10, 3, 3, False),  # 1 unit past touching
    (0, 13, 10, 10, 3, 3, True),  # vertex-touching on the y axis
    (0, 14, 10, 10, 3, 3, False),
    (7, 7, 10, 10, 4, 4, True),  # edge-to-edge diagonal contact region
    (20, 20, 10, 10, 4, 4, False),
    (6, 4, 8, 4, 8, 4, True),  # anisotropic pair (Minkowski 6/16+4/8 < 1)
    (8, 4, 8, 4, 8, 4, True),  # anisotropic boundary (8/16+4/8 == 1)
    (6, 6, 8, 4, 8, 4, False),  # anisotropic disjoint (6/16+6/8 > 1)
    (0, 9, 8, 4, 8, 4, False),  # separated vertically (4+4=8 < 9)
    (0, 8, 8, 4, 8, 4, True),  # exactly touching vertically
]


@pytest.mark.parametrize("dx,dy,pa,qa,pb,qb,expect", GOLDEN)
def test_sat_golden(dx, dy, pa, qa, pb, qb, expect):
    assert _sat_py(dx, dy, pa, qa, pb, qb) is expect


def test_sat_matches_float_brute_force():
    rng = np.random.default_rng(7)
    n = 400
    cx = rng.integers(-300, 300, n)
    cy = rng.integers(-300, 300, n)
    p = rng.integers(5, 120, n)
    q = rng.integers(5, 120, n)
    mism = 0
    for i in range(0, n, 2):
        a, b = i, i + 1
        got = _sat_py(
            int(cx[b] - cx[a]), int(cy[b] - cy[a]),
            int(p[a]), int(q[a]), int(p[b]), int(q[b]),
        )
        want = _overlap_float(
            cx[a], cy[a], p[a], q[a], cx[b], cy[b], p[b], q[b]
        )
        # sampling can only disagree within ~1e-3 of the boundary; the
        # integer grid makes exact ties explicit, so demand equality
        mism += got != want
    assert mism == 0


def test_sat_formula_sql_text_matches_python():
    import duckdb

    rng = np.random.default_rng(11)
    rows = [
        (
            int(rng.integers(-500, 500)),
            int(rng.integers(-500, 500)),
            int(rng.integers(1, 200)),
            int(rng.integers(1, 200)),
            int(rng.integers(1, 200)),
            int(rng.integers(1, 200)),
        )
        for _ in range(500)
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE t(dx BIGINT, dy BIGINT, pa BIGINT, qa BIGINT, pb BIGINT, qb BIGINT)")
    con.executemany("INSERT INTO t VALUES (?,?,?,?,?,?)", rows)
    sql = sat_formula_sql("dx", "dy", "pa", "qa", "pb", "qb")
    got = [r[0] for r in con.execute(f"SELECT {sql} FROM t").fetchall()]
    want = [_sat_py(*r) for r in rows]
    assert got == want


def test_grid_candidates_complete(spark):
    """The cell join loses no pair: compare against all-pairs SAT."""
    rng = np.random.default_rng(23)
    n = 300
    rmax = 512
    rows = [
        (
            i,
            int(rng.integers(-20_000, 20_000)),
            int(rng.integers(-20_000, 20_000)),
            int(rng.integers(1, rmax + 1)),
            int(rng.integers(1, rmax + 1)),
        )
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "poly_id long, cx long, cy long, p long, q long")
    got = {
        (r.a_id, r.b_id)
        for r in rhombus_overlap_pairs(df, rmax=rmax).collect()
    }
    want = set()
    for i in range(n):
        for j in range(i + 1, n):
            _, cxa, cya, pa, qa = rows[i]
            _, cxb, cyb, pb, qb = rows[j]
            if _sat_py(cxb - cxa, cyb - cya, pa, qa, pb, qb):
                want.add((i, j))
    assert got == want
    assert len(want) > 20  # fixture density sanity


def test_no_python_in_plan(spark):
    df = spark.createDataFrame(
        [(1, 0, 0, 5, 5), (2, 4, 0, 5, 5)],
        "poly_id long, cx long, cy long, p long, q long",
    )
    plan = rhombus_overlap_pairs(df, rmax=8)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "BatchEval" not in plan
