"""density_smooth + morans_i_terms vs first-principles numpy references."""

import numpy as np

from osmgraft.operators.density import density_smooth, morans_i_terms


def _cells_df(spark, arr):
    rows = [
        (int(x), int(y), int(arr[y, x]))
        for y in range(arr.shape[0])
        for x in range(arr.shape[1])
        if arr[y, x]
    ]
    return spark.createDataFrame(rows, "cx long, cy long, cnt long")


def test_density_smooth_matches_dense_convolution(spark):
    rng = np.random.default_rng(7)
    arr = rng.integers(0, 4, (12, 14)) * (rng.random((12, 14)) < 0.3)
    r = 2
    got = {
        (row.cx, row.cy): row.dens
        for row in density_smooth(_cells_df(spark, arr), radius=r).collect()
    }
    # dense reference: full box sum at every coordinate (incl. negative halo)
    for cx in range(-r, arr.shape[1] + r):
        for cy in range(-r, arr.shape[0] + r):
            want = int(
                arr[
                    max(0, cy - r) : cy + r + 1, max(0, cx - r) : cx + r + 1
                ].sum()
            )
            if want == 0:
                assert (cx, cy) not in got  # sparse: zero cells never emitted
            else:
                assert got[(cx, cy)] == want, (cx, cy)


def test_density_smooth_radius_zero_is_identity(spark):
    df = spark.createDataFrame(
        [(3, 4, 7), (9, 9, 1)], "cx long, cy long, cnt long"
    )
    got = sorted((r.cx, r.cy, r.dens) for r in density_smooth(df, 0).collect())
    assert got == [(3, 4, 7), (9, 9, 1)]


def _ref_morans(cells):
    """Float Moran's I from the textbook formula, for cross-checking the
    integer terms."""
    xs = np.array([v for _, _, v in cells], dtype=float)
    xbar = xs.mean()
    idx = {(x, y): i for i, (x, y, _) in enumerate(cells)}
    num = w = 0.0
    for (x, y), i in idx.items():
        for nb in ((x + 1, y), (x - 1, y), (x, y + 1), (x, y - 1)):
            j = idx.get(nb)
            if j is not None:
                num += (xs[i] - xbar) * (xs[j] - xbar)
                w += 1
    den = ((xs - xbar) ** 2).sum()
    return len(xs) / w * num / den


def test_morans_i_terms_match_float_reference(spark):
    rng = np.random.default_rng(17)
    cells = [
        (int(x), int(y), int(v))
        for x, y, v in zip(
            rng.integers(0, 8, 40), rng.integers(0, 8, 40), rng.integers(1, 9, 40)
        )
    ]
    cells = list({(x, y): (x, y, v) for x, y, v in cells}.values())
    df = spark.createDataFrame(cells, "cx long, cy long, cnt long")
    (row,) = morans_i_terms(df).collect()
    assert row.n_cells == len(cells)
    # integer terms: d_i = n*x_i - s scales num/den by n^2, which cancels
    got_i = row.n_cells / row.w_pairs * row.num / row.den
    assert abs(got_i - _ref_morans(cells)) < 1e-12
    # checkerboard: perfect negative autocorrelation -> num < 0
    board = [(x, y, 1 + (x + y) % 2) for x in range(6) for y in range(6)]
    (neg,) = morans_i_terms(
        spark.createDataFrame(board, "cx long, cy long, cnt long")
    ).collect()
    assert neg.num < 0


def test_morans_plan_has_no_cartesian(spark):
    df = spark.createDataFrame([(0, 0, 1), (1, 0, 2)], "cx long, cy long, cnt long")
    plan = morans_i_terms(df)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # adjacency compiles to real equi-joins on the shifted keys...
    assert "SortMergeJoin" in plan or "BroadcastHashJoin" in plan
    # ...and every nested-loop join is a broadcast of a 1-row aggregate
    import re

    for m in re.finditer(r"BroadcastNestedLoopJoin (\w+), (\w+)", plan):
        assert m.group(2) == "Cross"


def test_grid_regions_matches_bfs_flood_fill(spark):
    from collections import deque

    from osmgraft.operators.density import grid_regions

    rng = np.random.default_rng(23)
    pts = {
        (int(x), int(y)): int(v)
        for x, y, v in zip(
            rng.integers(0, 10, 70), rng.integers(0, 10, 70), rng.integers(1, 5, 70)
        )
    }
    df = spark.createDataFrame(
        [(x, y, v) for (x, y), v in pts.items()], "cx long, cy long, cnt long"
    )
    got = sorted(
        (r.region_id, r.n_cells, r.sum_cnt, r.min_cx, r.min_cy, r.max_cx, r.max_cy)
        for r in grid_regions(df).collect()
    )
    # BFS reference
    seen, want = set(), []
    for start in sorted(pts):
        if start in seen:
            continue
        comp, q = [], deque([start])
        seen.add(start)
        while q:
            x, y = q.popleft()
            comp.append((x, y))
            for nb in ((x + 1, y), (x - 1, y), (x, y + 1), (x, y - 1)):
                if nb in pts and nb not in seen:
                    seen.add(nb)
                    q.append(nb)
        want.append((
            min(x * 4294967296 + y for x, y in comp),
            len(comp),
            sum(pts[c] for c in comp),
            min(x for x, _ in comp), min(y for _, y in comp),
            max(x for x, _ in comp), max(y for _, y in comp),
        ))
    assert got == sorted(want)


def test_raster_upsample_bilinear_exact(spark):
    from osmgraft.operators.density import raster_upsample

    rng = np.random.default_rng(31)
    arr = rng.integers(0, 5, (9, 11)) * (rng.random((9, 11)) < 0.4)
    got = {
        (r.cx, r.cy): r.dens16
        for r in raster_upsample(_cells_df(spark, arr)).collect()
    }
    # reference: gather per child from the 4 nearest parents, weights 3/1
    def parent_w(c):
        near = c // 2
        far = near - 1 if c % 2 == 0 else near + 1
        return [(near, 3), (far, 1)]

    H, W = arr.shape
    for ccx in range(-1, 2 * W + 1):
        for ccy in range(-1, 2 * H + 1):
            want = 0
            for px, wx in parent_w(ccx):
                for py, wy in parent_w(ccy):
                    if 0 <= px < W and 0 <= py < H:
                        want += wx * wy * int(arr[py, px])
            if want == 0:
                assert (ccx, ccy) not in got
            else:
                assert got[(ccx, ccy)] == want, (ccx, ccy)
    # conservation: each parent scatters onto 4 children x weight-16 each
    assert sum(got.values()) == 64 * int(arr.sum())


def test_slope_terms_hand_raster(spark):
    """Sobel gradient on a hand 3x3 ramp + an isolated cell: exact masks,
    zero-fill for the loner, sparse neighbors treated as 0."""
    import numpy as np

    from osmgraft.operators.density import slope_terms

    # x-ramp: cnt = cx over a full 3x3 block at (10..12, 20..22)
    rows = [(cx, cy, cx) for cx in (10, 11, 12) for cy in (20, 21, 22)]
    rows.append((100, 100, 7))  # isolated
    df = spark.createDataFrame(rows, "cx long, cy long, cnt long")
    got = {(r.cx, r.cy): (r.gx, r.gy, r.g2) for r in slope_terms(df).collect()}
    assert len(got) == 10
    # center of the block: full window; gx = sum(mask_x * cnt) with cnt=cx
    grid = {(cx, cy): cx for cx in (10, 11, 12) for cy in (20, 21, 22)}
    for (cx, cy), _ in list(grid.items()):
        gx = sum(dx * (2 - abs(dy)) * grid.get((cx + dx, cy + dy), 0)
                 for dx in (-1, 0, 1) for dy in (-1, 0, 1))
        gy = sum(dy * (2 - abs(dx)) * grid.get((cx + dx, cy + dy), 0)
                 for dx in (-1, 0, 1) for dy in (-1, 0, 1))
        assert got[(cx, cy)] == (gx, gy, gx * gx + gy * gy), (cx, cy)
    assert got[(100, 100)] == (0, 0, 0)
    assert got[(11, 21)][0] == 8  # full window x-ramp: (1+2+1) * (right-left)


def test_idw_terms_reference(spark):
    """Python reference over a hand scatter incl. antimeridian wrap, exact-hit
    max weight, and radius cutoff."""
    from osmgraft.operators.density import IDW_K, idw_terms

    LON_SPAN = 3_600_000_000
    pitch, r = 100_000, 2
    pts = [
        (1, 50_000, 50_000, 7),          # exactly ON the center of cell (0,0)
        (2, 120_000, 40_000, 3),         # cell (1,0)
        (3, -20_000, -30_000, 11),       # negative coords
        (4, 0, LON_SPAN // 2 - 10, 5),   # hugging +180
        (5, 0, -LON_SPAN // 2 + 10, 9),  # hugging -180 (wraps to near pt 4)
        (6, 5_000_000, 5_000_000, 1),    # far away: isolated cell
    ]
    df = spark.createDataFrame(pts, "point_id long, lat7 long, lon7 long, v long")
    got = {
        (row["cy"], row["cx"]): (row["n_samples"], row["idw_num"], row["idw_den"])
        for row in idw_terms(df, pitch=pitch, radius_cells=r).collect()
    }

    ncl = LON_SPAN // pitch
    cells = {(la // pitch, (lo // pitch) % ncl) for _, la, lo, _ in pts}
    ref = {}
    for cy, cx in cells:
        clat, clon = cy * pitch + pitch // 2, cx * pitch + pitch // 2
        n = num = den = 0
        for _, la, lo, v in pts:
            dlat = la - clat
            adlon = abs(lo % LON_SPAN - clon)
            dlon = min(adlon, LON_SPAN - adlon)
            d2 = dlat * dlat + dlon * dlon
            if d2 <= (r * pitch) ** 2:
                w = IDW_K // max(d2, 1)
                n, num, den = n + 1, num + w * v, den + w
        ref[(cy, cx)] = (n, num, den)
    assert got == ref
    # the exact-hit sample dominates its own cell with weight IDW_K
    cy0 = (0, 0)
    assert ref[cy0][2] >= IDW_K
    # the two antimeridian huggers see each other across the wrap
    east = (0, (LON_SPAN // 2 - 10) // pitch % ncl)
    assert got[east][0] >= 2


def test_equalize_reference(spark):
    """Exact remap vs numpy CDF reference; degenerate single-value raster."""
    import numpy as np

    from osmgraft.operators.density import equalize

    rng = [(i % 7, i // 7, (i * i) % 13 + 1) for i in range(60)]
    df = spark.createDataFrame(rng, "cx long, cy long, cnt long")
    got = {(r["cy"], r["cx"]): r["eq"] for r in equalize(df).collect()}
    cnts = np.array([c for _, _, c in rng])
    n = len(cnts)
    cdf_min = int((cnts <= cnts.min()).sum())
    for cx, cy, c in rng:
        cdf = int((cnts <= c).sum())
        assert got[(cy, cx)] == (cdf - cdf_min) * 255 // (n - cdf_min)
    # equalized histogram spans the full range
    assert min(got.values()) == 0 and max(got.values()) == 255
    # degenerate: all cells equal -> everything maps to 255
    flat = spark.createDataFrame([(0, 0, 5), (1, 0, 5)], "cx long, cy long, cnt long")
    assert {r["eq"] for r in equalize(flat).collect()} == {255}


def test_median_filter_vs_reference(spark):
    """Scatter-form median == a dense numpy reference (zero padding), on a
    random sparse raster; speck removal and block preservation hold."""
    import random

    from osmgraft.operators.density import median_filter

    rng = random.Random(11)
    cells = {}
    for _ in range(120):
        cells[(rng.randint(0, 14), rng.randint(0, 14))] = rng.randint(1, 9)
    cells[(30, 30)] = 99          # isolated speck -> median 0
    for dx in range(3):           # solid 3x3 block of 7s -> center stays 7
        for dy in range(3):
            cells[(40 + dx, 40 + dy)] = 7
    df = spark.createDataFrame(
        [(x, y, v) for (x, y), v in cells.items()], "cx long, cy long, cnt long"
    )
    got = {(r["cx"], r["cy"]): r["median"] for r in median_filter(df).collect()}
    assert set(got) == set(cells)
    for (x, y) in cells:
        window = [cells.get((x + dx, y + dy), 0) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
        # exact rule: median of the 9-multiset = 5th smallest
        assert got[(x, y)] == sorted(window)[4], (x, y)
    assert got[(30, 30)] == 0
    assert got[(41, 41)] == 7


def _gi_star_float_ref(cells, z0=2.0):
    """Textbook float Gi* (Ord & Getis 1995) — independent of both engines'
    exact-integer formulation."""
    import math

    n = len(cells)
    t1 = sum(cells.values())
    t2 = sum(v * v for v in cells.values())
    xbar = t1 / n
    s = math.sqrt(t2 / n - xbar * xbar)
    out = {}
    for (x, y) in cells:
        nbrs = [
            cells[(x + dx, y + dy)]
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
            if (x + dx, y + dy) in cells
        ]
        w = len(nbrs)
        l = sum(nbrs)
        num = l - xbar * w
        den = s * math.sqrt((n * w - w * w) / (n - 1)) if n > 1 else 0.0
        if den == 0 or num == 0:
            out[(x, y)] = 0
            continue
        z = num / den
        out[(x, y)] = 1 if z >= z0 else (-1 if z <= -z0 else 0)
    return out


def test_gi_star_matches_float_reference(spark):
    """Planted hot block + cold strip on a noisy grid: exact-integer
    classification == textbook float z-scores (no boundary ties planted)."""
    from osmgraft.operators.density import getis_ord_gi_star

    cells = {}
    for x in range(8):
        for y in range(6):
            cells[(x, y)] = 50 + ((x * 7 + y * 13) % 5)
    for x, y in [(2, 2), (2, 3), (3, 2), (3, 3)]:
        cells[(x, y)] = 85  # hot block
    for y in range(6):
        cells[(7, y)] = 20  # cold strip
    df = spark.createDataFrame(
        [(x, y, v) for (x, y), v in cells.items()], "cx long, cy long, cnt long"
    )
    got = {(r["cx"], r["cy"]): r["cls"] for r in getis_ord_gi_star(df).collect()}
    want = _gi_star_float_ref(cells)
    assert got == want
    assert 1 in got.values() and -1 in got.values() and 0 in got.values()


def test_gi_star_degenerate_universes(spark):
    """n = 1 and all-equal universes classify 0 everywhere (A = 0 path)."""
    from osmgraft.operators.density import getis_ord_gi_star

    one = spark.createDataFrame([(5, 5, 9)], "cx long, cy long, cnt long")
    assert [(r["cls"], r["gi_num"]) for r in getis_ord_gi_star(one).collect()] == [(0, 0)]
    flat = spark.createDataFrame(
        [(x, 0, 7) for x in range(4)], "cx long, cy long, cnt long"
    )
    assert {r["cls"] for r in getis_ord_gi_star(flat).collect()} == {0}


def test_gi_star_gi_num_and_w(spark):
    """gi_num = n·L − W·T1 and w_obs checked by hand on a 3-cell line."""
    from osmgraft.operators.density import getis_ord_gi_star

    df = spark.createDataFrame(
        [(0, 0, 1), (1, 0, 2), (2, 0, 4)], "cx long, cy long, cnt long"
    )
    got = {(r["cx"], r["cy"]): (r["gi_num"], r["w_obs"]) for r in getis_ord_gi_star(df).collect()}
    # n=3, T1=7: cell0 L=3 W=2 -> 9-14=-5; cell1 L=7 W=3 -> 21-21=0; cell2 L=6 W=2 -> 18-14=4
    assert got == {(0, 0): (-5, 2), (1, 0): (0, 3), (2, 0): (4, 2)}


def test_decayed_tile_counts_hand(spark):
    """Exact shifted weights and deterministic top-k order: a 1-event
    fresh tile outranks a 3-event stale tile once 2^span > 3."""
    from osmgraft.operators.density import decayed_tile_counts

    rows = (
        [(1, 1, 0)] * 3      # stale: weight 3 * 2^0 = 3
        + [(2, 2, 2)]        # fresh: 2^2 = 4
        + [(3, 3, 1), (3, 3, 1)]  # middle: 2 * 2^1 = 4, ties fresh -> (tx,ty) order
    )
    df = spark.createDataFrame(rows, "cx long, cy long, day long")
    got = [
        (r["rank"], r["tx"], r["ty"], r["decayed_num"], r["n_events"])
        for r in decayed_tile_counts(df, k=10).collect()
    ]
    assert sorted(got) == [
        (1, 2, 2, 4, 1),
        (2, 3, 3, 4, 2),
        (3, 1, 1, 3, 3),
    ]


def test_decayed_counts_k_limits(spark):
    from osmgraft.operators.density import decayed_tile_counts

    rows = [(i, i, i % 3) for i in range(50)]
    df = spark.createDataFrame(rows, "cx long, cy long, day long")
    out = decayed_tile_counts(df, k=7).collect()
    assert len(out) == 7
    assert sorted(r["rank"] for r in out) == list(range(1, 8))


def test_variogram_hand_grid(spark):
    """2x2 grid with known values: every unordered pair counted exactly
    once in its d2 class."""
    from osmgraft.operators.density import empirical_variogram

    cells = {(0, 0): 1, (1, 0): 4, (0, 1): 9, (1, 1): 16}
    df = spark.createDataFrame(
        [(x, y, v) for (x, y), v in cells.items()], "cx long, cy long, cnt long"
    )
    got = {r["d2"]: (r["n_pairs"], r["sum_sqdiff"]) for r in empirical_variogram(df).collect()}
    # d2=1: (0,0)-(1,0) 9, (0,1)-(1,1) 49, (0,0)-(0,1) 64, (1,0)-(1,1) 144 -> 266
    # d2=2: diagonals (0,0)-(1,1) 225, (1,0)-(0,1) 25 -> 250
    assert got == {1: (4, 266), 2: (2, 250)}


def test_variogram_pair_count_law(spark):
    """Total pairs across classes == all unordered pairs within radius."""
    from osmgraft.operators.density import empirical_variogram

    import itertools
    cells = {(x, y): 1 + (x * 3 + y) % 5 for x in range(6) for y in range(5)}
    df = spark.createDataFrame(
        [(x, y, v) for (x, y), v in cells.items()], "cx long, cy long, cnt long"
    )
    got = {r["d2"]: (r["n_pairs"], r["sum_sqdiff"]) for r in empirical_variogram(df, max_r=2).collect()}
    want = {}
    for a, b in itertools.combinations(sorted(cells), 2):
        dx, dy = abs(a[0] - b[0]), abs(a[1] - b[1])
        if max(dx, dy) > 2:
            continue
        d2 = dx * dx + dy * dy
        n, s = want.get(d2, (0, 0))
        want[d2] = (n + 1, s + (cells[a] - cells[b]) ** 2)
    assert got == want


# --- Geary's C ----------------------------------------------------------------
def test_geary_c_matches_float_reference_and_classes(spark):
    """Exact terms == textbook float C; a smooth gradient classes
    clustered, a checkerboard disperses."""
    from osmgraft.operators.density import geary_c_terms

    def run(cells):
        df = spark.createDataFrame(cells, "cx long, cy long, cnt long")
        return geary_c_terms(df).collect()[0]

    def ref_c(cells):
        vals = {(x, y): v for x, y, v in cells}
        n = len(vals)
        xbar = sum(vals.values()) / n
        w = num = 0
        for (x, y), v in vals.items():
            for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                if (x + dx, y + dy) in vals:
                    w += 1
                    num += (v - vals[(x + dx, y + dy)]) ** 2
        den = sum((v - xbar) ** 2 for v in vals.values())
        return (n - 1) * num / (2 * w * den)

    grad = [(x, y, 10 * x + y) for x in range(5) for y in range(5)]
    board = [(x, y, 100 if (x + y) % 2 else 1) for x in range(5) for y in range(5)]
    for cells, want_cls in ((grad, "clustered"), (board, "dispersed")):
        r = run(cells)
        c_float = (r["n_cells"] - 1) * r["n_cells"] * r["ssq_w"] / (
            2 * r["w_pairs"] * int(r["den_raw"])
        )
        assert abs(c_float - ref_c(cells)) < 1e-12
        assert r["spatial_class"] == want_cls
    flat = [(x, y, 7) for x in range(3) for y in range(3)]
    assert run(flat)["spatial_class"] == "degenerate"


def _ref_lisa(cells):
    """Plain-python LISA quadrants (rook lag over observed cells)."""
    n = len(cells)
    s = sum(v for _, _, v in cells)
    dmap = {(x, y): n * v - s for x, y, v in cells}
    out = {}
    for (x, y), d in dmap.items():
        nbrs = [dmap[p] for p in ((x+1,y),(x-1,y),(x,y+1),(x,y-1)) if p in dmap]
        lag = sum(nbrs)
        g = len(nbrs)
        if g == 0 or d == 0 or lag == 0:
            q = "none"
        elif d > 0 and lag > 0:
            q = "HH"
        elif d < 0 and lag < 0:
            q = "LL"
        elif d > 0 and lag < 0:
            q = "HL"
        else:
            q = "LH"
        out[(x, y)] = (d, lag, g, d * lag, q)
    return out


def test_local_moran_matches_reference(spark):
    import numpy as np

    from osmgraft.operators.density import local_moran_quadrants

    rng = np.random.default_rng(51)
    seen = {}
    for _ in range(60):
        seen[(int(rng.integers(0, 8)), int(rng.integers(0, 8)))] = int(
            rng.integers(1, 50)
        )
    cells = [(x, y, v) for (x, y), v in seen.items()]
    df = spark.createDataFrame(cells, "cx long, cy long, cnt long")
    got = {
        (r.cx, r.cy): (r.d, r.lag_sum, r.n_nbrs, r.ii_num, r.quadrant)
        for r in local_moran_quadrants(df).collect()
    }
    assert got == _ref_lisa(cells)


def test_local_moran_hotspot_is_hh(spark):
    from osmgraft.operators.density import local_moran_quadrants

    # a plateau of hot cells surrounded by cold ones: the interior hot cell
    # must be HH, the far-away cold cells LL
    cells = [(x, y, 100) for x in range(3) for y in range(3)]
    cells += [(x + 10, y + 10, 1) for x in range(3) for y in range(3)]
    df = spark.createDataFrame(cells, "cx long, cy long, cnt long")
    got = {(r.cx, r.cy): r.quadrant for r in local_moran_quadrants(df).collect()}
    assert got[(1, 1)] == "HH" and got[(11, 11)] == "LL"


def test_bivariate_moran_matches_reference(spark):
    import numpy as np

    from osmgraft.operators.density import bivariate_moran_quadrants

    rng = np.random.default_rng(52)
    ca, cb = {}, {}
    for _ in range(40):
        ca[(int(rng.integers(0, 6)), int(rng.integers(0, 6)))] = int(rng.integers(1, 30))
    for _ in range(40):
        cb[(int(rng.integers(0, 6)), int(rng.integers(0, 6)))] = int(rng.integers(1, 30))
    dfa = spark.createDataFrame([(x, y, v) for (x, y), v in ca.items()],
                                "cx long, cy long, cnt long")
    dfb = spark.createDataFrame([(x, y, v) for (x, y), v in cb.items()],
                                "cx long, cy long, cnt long")
    union = set(ca) | set(cb)
    n = len(union)
    sa = sum(ca.get(p, 0) for p in union)
    sb = sum(cb.get(p, 0) for p in union)
    exp = {}
    for (x, y) in union:
        da = n * ca.get((x, y), 0) - sa
        nbrs = [p for p in ((x+1,y),(x-1,y),(x,y+1),(x,y-1)) if p in union]
        lag = sum(n * cb.get(p, 0) - sb for p in nbrs)
        g = len(nbrs)
        if g == 0 or da == 0 or lag == 0:
            q = "none"
        elif da > 0 and lag > 0:
            q = "HH"
        elif da < 0 and lag < 0:
            q = "LL"
        elif da > 0 and lag < 0:
            q = "HL"
        else:
            q = "LH"
        exp[(x, y)] = (da, lag, g, da * lag, q)
    got = {
        (r.cx, r.cy): (r.da, r.lag_b, r.n_nbrs, r.ii_num, r.quadrant)
        for r in bivariate_moran_quadrants(dfa, dfb).collect()
    }
    assert got == exp
