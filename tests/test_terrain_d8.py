"""terrain_d8_flow: scalar reference on crafted DEMs, cone/ridge laws."""

import numpy as np


def _tiles_df(spark, grids):
    from osmgraft.functions.codec import png_encode

    rows = []
    for i, g in enumerate(grids):
        v = (g.astype(np.int64) + 10_000) * 10
        rgb = np.stack([(v >> 16) & 255, (v >> 8) & 255, v & 255], axis=-1).astype(
            np.uint8
        )
        rows.append((7, i, 0, bytearray(png_encode(rgb))))
    return spark.createDataFrame(rows, "z long, tx long, ty long, png binary")


def _ref_d8(elev):
    from osmgraft.operators.raster import _D8_DIRS

    h, w = elev.shape
    out = {}
    for y in range(h):
        for x in range(w):
            best = (0, -1)
            for d, (dy, dx, dist2) in enumerate(_D8_DIRS):
                ny, nx = y + dy, x + dx
                if not (0 <= ny < h and 0 <= nx < w):
                    continue
                drop = elev[y, x] - elev[ny, nx]
                if drop > 0:
                    key = drop * drop * (3 - dist2)
                    if key > best[0]:
                        best = (key, d)
            out[(y, x)] = best[1]
    return out


def test_d8_matches_reference_random(spark):
    from osmgraft.operators.raster import terrain_d8_flow

    rng = np.random.default_rng(61)
    grids = [rng.integers(0, 500, (8, 8)) for _ in range(4)]
    rows = terrain_d8_flow(_tiles_df(spark, grids)).collect()
    got = {}
    for r in rows:
        got.setdefault(r.tx, {})[r.dir] = (r.n_cells, r.chk)
    for i, g in enumerate(grids):
        ref = _ref_d8(g.astype(np.int64))
        wgt = lambda y, x: y * 131 + x * 137 + 1
        for d in range(-1, 8):
            cells = [(y, x) for (y, x), rd in ref.items() if rd == d]
            if cells:
                assert got[i][d] == (len(cells), sum(wgt(y, x) for y, x in cells)), (i, d)
            else:
                assert d not in got.get(i, {}), (i, d)


def test_d8_tilted_plane_flows_east_flat_is_sink(spark):
    from osmgraft.operators.raster import terrain_d8_flow

    # east-tilted plane: every cell except the east edge flows E (straight
    # beats the equal-drop diagonal by the dist² factor); a flat tile is
    # all sinks
    tilt = np.zeros((8, 8), np.int64)
    for x in range(8):
        tilt[:, x] = 2 * (7 - x)
    flat = np.full((8, 8), 7, np.int64)
    rows = terrain_d8_flow(_tiles_df(spark, [tilt, flat])).collect()
    by_tile = {}
    for r in rows:
        by_tile.setdefault(r.tx, {})[r.dir] = r.n_cells
    assert by_tile[1] == {-1: 64}  # flat: every cell a sink
    assert by_tile[0] == {0: 56, -1: 8}  # east edge column has no in-tile drop


def _ref_watershed(elev):
    from osmgraft.operators.raster import _D8_DIRS

    h, w = elev.shape
    d8 = _ref_d8(elev)
    out = {}
    for y in range(h):
        for x in range(w):
            cy, cx = y, x
            for _ in range(h * w):
                d = d8[(cy, cx)]
                if d == -1:
                    break
                dy, dx, _d2 = _D8_DIRS[d]
                cy, cx = cy + dy, cx + dx
            out.setdefault((cy, cx), []).append((y, x))
    return out


def test_watershed_matches_reference_and_tilt_law(spark):
    from osmgraft.operators.raster import terrain_watershed

    rng = np.random.default_rng(81)
    tilt = np.zeros((8, 8), np.int64)
    for x in range(8):
        tilt[:, x] = 2 * (7 - x)
    grids = [tilt, rng.integers(0, 500, (8, 8)), rng.integers(0, 60, (8, 8))]
    rows = terrain_watershed(_tiles_df(spark, grids)).collect()
    got = {}
    for r in rows:
        got.setdefault(r.tx, {})[(r.sink_y, r.sink_x)] = (r.basin_size, r.chk)
    for i, g in enumerate(grids):
        ref = _ref_watershed(g.astype(np.int64))
        exp = {
            s: (len(m), sum(y * 131 + x * 137 + 1 for y, x in m))
            for s, m in ref.items()
        }
        assert got[i] == exp, i
    # tilt law: exactly 8 basins, one per row, rooted at the east edge
    assert got[0] == {
        (y, 7): (8, sum(y * 131 + x * 137 + 1 for x in range(8))) for y in range(8)
    }


def test_flow_accumulation_reference_and_mass_law(spark):
    from osmgraft.operators.raster import terrain_flow_accumulation

    rng = np.random.default_rng(91)
    tilt = np.zeros((8, 8), np.int64)
    for x in range(8):
        tilt[:, x] = 2 * (7 - x)
    grids = [tilt, rng.integers(0, 500, (8, 8))]
    rows = {r.tx: r for r in
            terrain_flow_accumulation(_tiles_df(spark, grids)).collect()}
    # tilt: row-wise chains — acc along a row is 1,2,...,8; outlet acc 8,
    # tie to the smallest (y, x) -> (0, 7); sum_acc = 8 * (1+..+8) = 288
    t = rows[0]
    assert (t.out_y, t.out_x, t.max_acc, t.sum_acc) == (0, 7, 8, 288)
    # random grid: mass law against the scalar chase reference
    g = grids[1].astype(np.int64)
    ref = _ref_watershed(g)  # basin members; acc of sink >= basin size? no:
    # exact per-cell acc by counting chases passing through each cell
    from osmgraft.operators.raster import _D8_DIRS

    d8 = _ref_d8(g)
    acc = {(y, x): 0 for y in range(8) for x in range(8)}
    for y in range(8):
        for x in range(8):
            cy, cx = y, x
            acc[(cy, cx)] += 1
            while d8[(cy, cx)] != -1:
                dy, dx, _ = _D8_DIRS[d8[(cy, cx)]]
                cy, cx = cy + dy, cx + dx
                acc[(cy, cx)] += 1
    r = rows[1]
    assert r.sum_acc == sum(acc.values())
    assert r.max_acc == max(acc.values())
    best = min((yx for yx, a in acc.items() if a == r.max_acc))
    assert (r.out_y, r.out_x) == best
    assert r.chk == sum(a * (y * 131 + x * 137 + 1) for (y, x), a in acc.items())
