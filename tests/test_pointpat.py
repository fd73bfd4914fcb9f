"""pointpat operators: Ripley K / Knox brute-force references and the
dispersion-ellipse eigen reference."""

import itertools

import numpy as np

Q = 1 << 16  # dispersion_ellipse default quantization unit


def test_ripley_k_matches_brute_force(spark):
    from osmgraft.operators.pointpat import ripley_k

    rng = np.random.default_rng(5)
    pts = [(i, int(x), int(y)) for i, (x, y) in enumerate(
        zip(rng.integers(-500, 500, 60), rng.integers(-500, 500, 60)))]
    df = spark.createDataFrame(pts, "pid long, x long, y long")
    radii = [50, 200, 800]
    got = {r["r"]: (r["n_pts"], r["pair_cnt"])
           for r in ripley_k(df, radii, shift=10).collect()}
    for r in radii:
        cnt = sum(
            1 for (_, xa, ya), (_, xb, yb) in itertools.combinations(pts, 2)
            if (xa - xb) ** 2 + (ya - yb) ** 2 <= r * r
        )
        assert got[r] == (60, cnt), r


def test_knox_matches_brute_force(spark):
    from osmgraft.operators.pointpat import knox

    rng = np.random.default_rng(9)
    pts = [(i, int(x), int(y), int(t)) for i, (x, y, t) in enumerate(
        zip(rng.integers(-300, 300, 50), rng.integers(-300, 300, 50),
            rng.integers(0, 20, 50)))]
    df = spark.createDataFrame(pts, "pid long, x long, y long, t long")
    out = knox(df, delta=100, tau=3, shift=9).collect()[0]
    ns = nt = nx = 0
    for (_, xa, ya, ta), (_, xb, yb, tb) in itertools.combinations(pts, 2):
        s = (xa - xb) ** 2 + (ya - yb) ** 2 <= 100 * 100
        t = abs(ta - tb) <= 3
        ns += s
        nt += t
        nx += s and t
    assert (out["n_pts"], out["n_space"], out["n_time"], out["x_knox"]) == (
        50, ns, nt, nx)


def _ellipse_ref(qpts):
    """Float eigen reference: orientation octant of the doubled angle and
    the (l1-l2)/(l1+l2) >= 1/2 class, from numpy's eigendecomposition."""
    import math

    a = np.array(qpts, dtype=float)
    n = len(a)
    c = a - a.mean(axis=0)
    sxx, syy = (c[:, 0] ** 2).sum(), (c[:, 1] ** 2).sum()
    sxy = (c[:, 0] * c[:, 1]).sum()
    tr = sxx + syy
    if n < 2 or tr == 0:
        return None, "degenerate"
    l1 = (tr + math.hypot(sxx - syy, 2 * sxy)) / 2
    l2 = tr - l1
    cls = "elongated" if (l1 - l2) / (l1 + l2) >= 0.5 else "compact"
    gx, gy = sxx - syy, 2 * sxy
    if gx == 0 and gy == 0:
        return -1, cls
    ang = math.atan2(gy, gx) % (2 * math.pi)
    return int(ang // (math.pi / 4)) % 8, cls


def test_dispersion_matches_eigen_reference(spark):
    from osmgraft.operators.pointpat import _OFF, dispersion_ellipse

    rng = np.random.default_rng(3)
    rows, refs = [], {}
    for g in range(6):
        th = g * 0.5
        m = rng.standard_normal((40, 2)) * [8, 2]  # elongated, rotated
        rot = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
        q = np.floor(m @ rot.T).astype(int) + 100
        rows += [(g, int(x) * Q - _OFF, int(y) * Q - _OFF) for x, y in q]
        refs[g] = _ellipse_ref(q)
    df = spark.createDataFrame(rows, "g long, x long, y long")
    got = {r["g"]: (r["orient2_octant"], r["shape_class"])
           for r in dispersion_ellipse(df, ["g"]).collect()}
    for g, want in refs.items():
        assert got[g] == want, (g, got[g], want)


def test_dispersion_hand_shapes(spark):
    from osmgraft.operators.pointpat import _OFF, dispersion_ellipse

    def mk(g, qpts):
        return [(g, x * Q - _OFF, y * Q - _OFF) for x, y in qpts]

    rows = (
        mk(1, [(i, 5) for i in range(10)])            # horizontal line
        + mk(2, [(5, i) for i in range(10)])          # vertical line
        + mk(3, [(0, 0), (0, 9), (9, 0), (9, 9)])     # isotropic square
        + mk(4, [(3, 3)])                              # single point
    )
    df = spark.createDataFrame(rows, "g long, x long, y long")
    got = {r["g"]: r for r in dispersion_ellipse(df, ["g"]).collect()}
    # line along x: c02=c11=0 -> doubled-angle vector (+,0) -> octant 0
    assert (got[1]["orient2_octant"], got[1]["shape_class"]) == (0, "elongated")
    # line along y: vector (-,0) -> octant 4
    assert (got[2]["orient2_octant"], got[2]["shape_class"]) == (4, "elongated")
    assert (got[3]["orient2_octant"], got[3]["shape_class"]) == (-1, "compact")
    assert got[4]["shape_class"] == "degenerate"
    assert got[1]["c02"] == 0 and got[1]["c11"] == 0 and got[1]["c20"] > 0


def test_g_function_matches_brute_force(spark):
    from osmgraft.operators.pointpat import nn_g_function

    rng = np.random.default_rng(89)
    pts = [(i, int(x), int(y)) for i, (x, y) in enumerate(
        zip(rng.integers(-400, 400, 50), rng.integers(-400, 400, 50)))]
    df = spark.createDataFrame(pts, "pid long, x long, y long")
    radii = [60, 150, 700]
    got = {r["r"]: (r["n_pts"], r["n_within"])
           for r in nn_g_function(df, radii, shift=10).collect()}
    for r in radii:
        nw = 0
        for i, xa, ya in pts:
            best = min(
                (xa - xb) ** 2 + (ya - yb) ** 2
                for j, xb, yb in pts if j != i
            )
            nw += best <= r * r
        assert got[r] == (50, nw), r


def test_g_vs_k_laws(spark):
    """G counts each point once (n_within <= n_pts always) while K's pair
    count can exceed n; an isolated far point never enters n_within."""
    from osmgraft.operators.pointpat import nn_g_function, ripley_k

    pts = [(1, 0, 0), (2, 3, 0), (3, 0, 4), (4, 100000, 100000)]
    df = spark.createDataFrame(pts, "pid long, x long, y long")
    g = {r["r"]: r["n_within"] for r in nn_g_function(df, [5, 30], 6).collect()}
    k = {r["r"]: r["pair_cnt"] for r in ripley_k(df, [5, 30], 6).collect()}
    assert g[5] == 3          # the cluster of three; the far point out
    assert g[30] == 3
    assert k[5] == 3 and k[30] == 3  # three close pairs among the cluster
