"""Slippy-tile golden vectors (closed-form formula, OSM wiki) + Spark/numpy parity."""

import numpy as np
from pyspark.sql import functions as F

from osmgraft.functions import tiles


def test_golden_vectors():
    # (lat, lon, z) -> (x, y): hand-checked classics
    cases = [
        (0.0, 0.0, 1, 1, 1),          # origin falls in the +x,+y quadrant tile
        (0.0, 0.0, 13, 4096, 4096),
        (51.5, -0.1, 13, 4093, 2724),  # London (cross-checked vs math.asinh form)
        (85.0511287, -179.9999999, 2, 0, 0),   # top-left corner
        (-85.0511287, 179.9999999, 2, 3, 3),   # bottom-right corner
    ]
    for lat, lon, z, ex, ey in cases:
        x, y = tiles.np_tile_xy(
            np.array([lon * 1e7], dtype=np.int64), np.array([lat * 1e7], dtype=np.int64), z
        )
        assert (x[0], y[0]) == (ex, ey), (lat, lon, z, x[0], y[0])


def test_zoom_hierarchy():
    # tile at z is the parent of tile at z+1 (x//2, y//2)
    rng = np.random.default_rng(7)
    lon7 = rng.integers(-1_790_000_000, 1_790_000_000, 500)
    lat7 = rng.integers(-850_000_000, 850_000_000, 500)
    x13, y13 = tiles.np_tile_xy(lon7, lat7, 13)
    x12, y12 = tiles.np_tile_xy(lon7, lat7, 12)
    assert (x13 // 2 == x12).all() and (y13 // 2 == y12).all()


def test_spark_matches_numpy(spark):
    rng = np.random.default_rng(11)
    lon7 = rng.integers(-1_790_000_000, 1_790_000_000, 300).tolist()
    lat7 = rng.integers(-850_000_000, 850_000_000, 300).tolist()
    df = spark.createDataFrame(list(zip(lat7, lon7)), "lat7 long, lon7 long")
    got = df.select(
        tiles.tile_x(F.col("lon7"), 13).alias("x"), tiles.tile_y(F.col("lat7"), 13).alias("y")
    ).collect()
    ex, ey = tiles.np_tile_xy(np.array(lon7), np.array(lat7), 13)
    assert [r.x for r in got] == ex.tolist()
    assert [r.y for r in got] == ey.tolist()


def test_tile_polygon_contains_its_points(spark):
    """raster→vector roundtrip: every point's z8 tile, converted back to a
    fixed-point ring, must ray-cast-contain the point (and the adjacent tile
    must not)."""
    import numpy as np

    from osmgraft.functions.tiles import np_tile_polygon, np_tile_xy
    from osmgraft.geom import pnpoly, polygon_edges

    rng = np.random.default_rng(7)
    lat7 = rng.integers(-800_000_000, 800_000_000, 200)
    lon7 = rng.integers(-1_799_999_999, 1_799_999_999, 200)
    x, y = np_tile_xy(lon7, lat7, 8)
    for i in range(len(lat7)):
        ring = np_tile_polygon(int(x[i]), int(y[i]), 8)
        edges = polygon_edges({"ring": ring, "holes": []})
        assert pnpoly(np.array([lat7[i]]), np.array([lon7[i]]), edges)[0]
        far = np_tile_polygon(int((x[i] + 5) % 256), int(y[i]), 8)
        far_edges = polygon_edges({"ring": far, "holes": []})
        assert not pnpoly(np.array([lat7[i]]), np.array([lon7[i]]), far_edges)[0]


def test_tile_lat_bounds_roundtrip():
    import numpy as np

    from osmgraft.functions.tiles import np_tile_lat_bounds, np_tile_xy

    z = 10
    ys = np.arange(1, 2**z - 1)
    south, north = np_tile_lat_bounds(ys, z)
    # a hair inside each edge must map back to the same row
    eps = 1e-6
    _, y_n = np_tile_xy(np.zeros_like(ys), ((north - eps) * 1e7).astype(np.int64), z)
    _, y_s = np_tile_xy(np.zeros_like(ys), ((south + eps) * 1e7).astype(np.int64), z)
    assert (y_n == ys).all()
    assert (y_s == ys).all()


def test_tile_pyramid_rollup_identity(spark):
    """Aggregate-reuse rollup equals per-level recomputation from raw points
    (quadtree floor-nesting), and each level's total preserves the row count."""
    from osmgraft.functions import tiles as T
    from osmgraft.operators.raster import tile_pyramid
    from osmgraft.synth import points_from_orders
    from pyspark.sql import functions as F

    pts = points_from_orders(spark, "/root/testdata/sf0.001").cache()
    n = pts.count()
    got = tile_pyramid(pts, z_max=10, z_min=6).collect()
    by_level = {}
    for r in got:
        by_level.setdefault(r.z, {})[(r.tx, r.ty)] = r.cnt
    for z in range(6, 11):
        direct = {
            (r.tx, r.ty): r.cnt
            for r in pts.select(
                T.tile_x(F.col("lon7"), z).alias("tx"),
                T.tile_y(F.col("lat7"), z).alias("ty"),
            )
            .groupBy("tx", "ty")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        }
        assert by_level[z] == direct, z
        assert sum(by_level[z].values()) == n


def test_boundary_tile_cover_antimeridian(spark):
    """A Fiji-like wrapped bbox covers tx near both edges and NOTHING in the
    gap between lon_east and lon_west (the old sequence() failure mode was
    emitting the complement range)."""
    from osmgraft.operators.raster import boundary_tile_cover, cover_bboxes

    z = 10
    poly = {
        "boundary_id": 99,
        "ring": [(-210_000_000, 1_770_000_000), (-210_000_000, -1_780_000_000),
                 (-150_000_000, -1_780_000_000), (-150_000_000, 1_770_000_000),
                 (-210_000_000, 1_770_000_000)],
        "holes": [],
    }
    rows = boundary_tile_cover(spark, [poly], z).collect()
    txs = sorted({r.tx for r in rows})
    n = 2**z
    # west part: tx(177.0°)=1015..1023; east part: tx(-178.0°)=0..5
    assert txs[0] == 0 and txs[-1] == n - 1
    assert all(tx <= 5 or tx >= 1015 for tx in txs), txs
    # no duplicate (boundary, tx, ty) rows from the two-range split
    assert len(rows) == len({(r.boundary_id, r.tx, r.ty) for r in rows})
    # the split is tile-aware: if the gap closes at z=0 a single full row
    assert cover_bboxes([poly], 0)[0][2] == -1_800_000_000


def test_cover_bboxes_unwrapped_passthrough():
    from osmgraft.geom import polygon_bbox
    from osmgraft.operators.raster import cover_bboxes
    from osmgraft.synth import ADMIN_BOUNDARIES

    rows = cover_bboxes(ADMIN_BOUNDARIES, 10)
    assert len(rows) == len(ADMIN_BOUNDARIES)
    for p, row in zip(ADMIN_BOUNDARIES, rows):
        la0, lo0, la1, lo1 = map(int, polygon_bbox(p))
        assert row == (p["boundary_id"], la0, lo0, la1, lo1)


def test_render_tile_pngs_roundtrip_and_pin(spark):
    """Tile-server rendering: every emitted PNG decodes back to the exact
    integer raster a local reconstruction produces, and a sha256 over the
    sorted DECODED rasters is pinned (container bytes excluded: zlib may
    legally change compression)."""
    import hashlib

    import numpy as np
    from pyspark.sql import functions as F

    from osmgraft.functions import tiles as T
    from osmgraft.functions.codec import png_decode
    from osmgraft.operators.raster import render_tile_pngs
    from osmgraft.synth import points_from_orders

    pts = points_from_orders(spark, "/root/testdata/sf0.001")
    counts = (
        pts.select(
            T.tile_x(F.col("lon7"), 13).alias("tx"),
            T.tile_y(F.col("lat7"), 13).alias("ty"),
        )
        .groupBy("tx", "ty")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    out = render_tile_pngs(counts, z=13, parent_z=10, size=64).collect()
    assert len(out) > 0
    # local reconstruction from the same counts
    local = {}
    for r in counts.collect():
        p = (r.tx >> 3, r.ty >> 3)
        local.setdefault(p, {})[(r.tx & 7, r.ty & 7)] = r.cnt
    h = hashlib.sha256()
    total_pts = 0
    for r in sorted(out, key=lambda r: (r.tx, r.ty)):
        px = png_decode(bytes(r.png))
        assert px.shape == (64, 64, 3)
        cells = local[(r.tx, r.ty)]
        ras = np.zeros((8, 8), dtype=np.int64)
        for (sx, sy), c in cells.items():
            ras[sy, sx] = c
        want = ((ras * 255) // max(int(ras.max()), 1)).astype(np.uint8)
        want_up = np.repeat(np.repeat(want, 8, axis=0), 8, axis=1)
        assert np.array_equal(px[:, :, 0], want_up), (r.tx, r.ty)
        assert np.array_equal(px[:, :, 0], px[:, :, 1])
        total_pts += r.n_points
        h.update(px.tobytes())
    assert total_pts == pts.count()
    assert h.hexdigest() == PIN_RENDER_SHA  # set below on first run


PIN_RENDER_SHA = "8c3b65a5e55a9e9ffc2f9441a481429d32791406228196cbf5547296c7de55d3"


def test_quadkey_published_vector_and_inverse(spark):
    """Bing docs example: tile (x=3, y=5) at z=3 has quadkey '213'; the
    engine column agrees, and the inverse recovers (z, tx, ty) for a sweep."""
    from pyspark.sql import functions as F

    from osmgraft.functions.tiles import quadkey, quadkey_to_tile, tile_x, tile_y

    # find a lon/lat that lands on tile (3, 5) at z=3: tx=3 -> lon in
    # [-45, 0); ty=5 -> southern band. Use integer tile math to verify.
    lon7, lat7 = int(-22.5e7), int(-50.0e7)
    df = spark.range(1).select(
        quadkey(F.lit(lon7), F.lit(lat7), 3).alias("qk"),
        tile_x(F.lit(lon7), 3).alias("tx"),
        tile_y(F.lit(lat7), 3).alias("ty"),
    )
    r = df.collect()[0]
    assert (r.tx, r.ty) == (3, 5)
    assert r.qk == "213"
    assert quadkey_to_tile("213") == (3, 3, 5)
    # inverse roundtrip over a z=6 sweep of the forward definition
    import itertools

    for tx, ty in itertools.product(range(8), range(8)):
        z = 6
        digits = []
        for i in range(z - 1, -1, -1):
            d = (((ty >> i) & 1) << 1) | ((tx >> i) & 1)
            digits.append(str(d))
        qk = "".join(digits)
        assert quadkey_to_tile(qk) == (z, tx, ty)


def test_mvt_wire_format_literal():
    """Hand-computed spec bytes for a minimal one-point tile: layer 'a',
    extent 4096, one feature id=0 with {'cnt': 3} at (25, 17)."""
    from osmgraft.functions.mvt import decode_point_layers, encode_point_layer

    data = encode_point_layer("a", [(25, 17, {"cnt": 3})])
    # Tile: field 3 len-delim -> layer
    assert data[0] == 0x1A  # (3<<3)|2
    # layer body: name field (1<<3)|2, len 1, 'a'
    body = data[2:]
    assert body[:3] == bytes([0x0A, 0x01, ord("a")])
    # geometry: MoveTo count=1 -> (1<<3)|1 = 9; zigzag(25)=50, zigzag(17)=34
    assert bytes([9, 50, 34]) in data
    # version field: (15<<3)|0 = 0x78, value 2
    assert data[-2:] == bytes([0x78, 0x02])
    layers = decode_point_layers(data)
    assert layers == {"a": (4096, [(25, 17, {"cnt": 3})])}


def test_mvt_roundtrip_many():
    from osmgraft.functions.mvt import decode_point_layers, encode_point_layer

    pts = [(x * 37 % 4096, (x * 91 + 5) % 4096, {"cnt": x % 7, "k": 1}) for x in range(200)]
    layers = decode_point_layers(encode_point_layer("grid", pts))
    assert layers["grid"][0] == 4096
    assert layers["grid"][1] == pts


def test_mvt_rejects_bad_input():
    import pytest as _pytest

    from osmgraft.functions.mvt import decode_point_layers, encode_point_layer

    with _pytest.raises(ValueError):
        encode_point_layer("a", [(5000, 0, {})])  # outside extent
    with _pytest.raises((ValueError, IndexError)):
        decode_point_layers(encode_point_layer("a", [(1, 1, {})])[:-3])


def test_tile_render_mvt_pinned(spark):
    """Every z10 MVT decodes back to exactly its input counts, and a sha256
    over the ordered tile bytes is pinned (no compressor variance in MVT)."""
    import hashlib

    from osmgraft.functions.mvt import decode_point_layers
    from osmgraft.operators.raster import render_tile_mvt
    from osmgraft.functions import tiles as T_
    from osmgraft.synth import points_from_orders
    from pyspark.sql import functions as F

    pts = points_from_orders(spark, "/root/testdata/sf0.001")
    counts = (
        pts.select(
            T_.tile_x(F.col("lon7"), 13).alias("tx"),
            T_.tile_y(F.col("lat7"), 13).alias("ty"),
        )
        .groupBy("tx", "ty")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    cdict = {(r.tx, r.ty): r.cnt for r in counts.collect()}
    rows = render_tile_mvt(counts, z=13, parent_z=10).orderBy("tx", "ty").collect()
    h = hashlib.sha256()
    n_feat = 0
    for r in rows:
        data = bytes(r.mvt)
        h.update(data)
        (extent, feats) = decode_point_layers(data)["counts"]
        assert extent == 4096
        cell = 4096 // 8  # z13 under z10: 8x8 subcells
        for x, y, attrs in feats:
            sx, sy = x // cell, y // cell
            tx, ty = (r.tx << 3) | sx, (r.ty << 3) | sy
            assert cdict[(tx, ty)] == attrs["cnt"], (tx, ty)
            n_feat += 1
    assert n_feat == len(cdict)  # every z13 cell appears exactly once
    assert h.hexdigest() == PIN_MVT_SHA


PIN_MVT_SHA = "3e8fd754706dd9c2d85d1bd49485517b31ef11c9b044720b837da88f7e414382"


def test_mvt_features_roundtrip_distributed(spark):
    """render_tile_mvt → mvt_features recovers every (tx, ty, cnt) of the
    input z13 counts — both directions distributed, no driver decode."""
    from pyspark.sql import functions as F

    from osmgraft.functions import tiles as T_
    from osmgraft.operators.raster import mvt_features, render_tile_mvt
    from osmgraft.synth import points_from_orders

    pts = points_from_orders(spark, "/root/testdata/sf0.001")
    counts = (
        pts.select(
            T_.tile_x(F.col("lon7"), 13).alias("tx"),
            T_.tile_y(F.col("lat7"), 13).alias("ty"),
        )
        .groupBy("tx", "ty")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    tiles_df = render_tile_mvt(counts, z=13, parent_z=10)
    feats = mvt_features(tiles_df)
    # feature (x, y) in extent coords → z13 subcell → original tile coords
    cell = 4096 // 8
    back = feats.select(
        (F.shiftleft(F.col("tx"), 3) + (F.col("x") / cell).cast("int")).alias("tx13"),
        (F.shiftleft(F.col("ty"), 3) + (F.col("y") / cell).cast("int")).alias("ty13"),
        "cnt",
    )
    a = {(r.tx13, r.ty13): r.cnt for r in back.collect()}
    b = {(r.tx, r.ty): r.cnt for r in counts.collect()}
    assert a == b


def test_zonal_stats_broadcast_and_values(spark):
    """Zonal rollup over a hand-built raster + cover; plan broadcasts the
    cover side (no shuffle of the raster beyond its own aggregation)."""
    from osmgraft.operators.raster import zonal_stats

    cells = spark.createDataFrame(
        [(0, 0, 5), (0, 1, 7), (9, 9, 100)], "tx long, ty long, cnt long"
    )
    cover = spark.createDataFrame(
        [(1, 0, 0), (1, 0, 1), (2, 0, 1), (2, 3, 3)],
        "boundary_id long, tx long, ty long",
    )
    rows = {r["boundary_id"]: r for r in zonal_stats(cells, cover).collect()}
    assert (rows[1]["tiles_hit"], rows[1]["total"], rows[1]["max_cnt"]) == (2, 12, 7)
    # boundary 2: one covered tile occupied, the (3,3) cover tile is empty
    assert (rows[2]["tiles_hit"], rows[2]["total"], rows[2]["max_cnt"]) == (1, 7, 7)
    plan = zonal_stats(cells, cover)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_terrain_rgb_pack_unpack_negative_and_zero(spark):
    """Terrain-RGB convention pinned on hand values: elevation -10000 →
    v=0 → RGB(0,0,0); 0 → RGB(1,134,160) (the published sea-level bytes);
    unpack inverts exactly through a real PNG deflate/inflate, negatives
    included."""
    from pyspark.sql import functions as F

    from osmgraft.operators.raster import terrain_rgb_stats, terrain_rgb_tiles

    rows = [(0, 0, -10_000), (1, 0, 0), (0, 1, 250), (1, 1, 8_848)]
    df = spark.createDataFrame(rows, "tx long, ty long, cnt long")
    tiles_df = terrain_rgb_tiles(df, z=1, parent_z=0)
    png = bytes(tiles_df.collect()[0]["png"])
    from osmgraft.functions.codec import png_decode

    px = png_decode(png)
    assert tuple(px[0, 1]) == (1, 134, 160)  # elev 0 at grid (sy=0, sx=1)
    assert tuple(px[0, 0]) == (0, 0, 0)      # elev -10000
    out = terrain_rgb_stats(tiles_df).collect()[0]
    # sum includes the -10000; n_cells counts non-sea-level cells only
    assert out["sum_elev"] == -10_000 + 0 + 250 + 8_848
    assert out["n_cells"] == 3


# --- terrain viewshed --------------------------------------------------------
def _viewshed_ref(elev):
    """Quadratic Fraction reference for the west-edge row viewshed."""
    from fractions import Fraction

    h, w = elev.shape
    vis = set()
    for y in range(h):
        z0 = elev[y][0]
        best = None
        for x in range(1, w):
            ang = Fraction(int(elev[y][x]) - int(z0), x)
            if best is None or ang > best:
                vis.add((y, x))
            best = ang if best is None else max(best, ang)
    return vis


def test_viewshed_matches_fraction_reference(spark):
    import numpy as np

    from osmgraft.operators.raster import terrain_rgb_tiles, terrain_viewshed

    rng = np.random.default_rng(31)
    rows = [
        (int(tx) * 8 + int(sx), int(ty) * 8 + int(sy), int(e))
        for tx, ty in [(0, 0), (3, 5)]
        for sx, sy, e in zip(
            rng.integers(0, 8, 40), rng.integers(0, 8, 40), rng.integers(0, 900, 40)
        )
    ]
    # dedupe (sx, sy) collisions keeping the last like the raster assign
    seen = {}
    for tx, ty, e in rows:
        seen[(tx, ty)] = e
    rows = [(tx, ty, e) for (tx, ty), e in seen.items()]
    df = spark.createDataFrame(rows, "tx long, ty long, cnt long")
    out = {
        (r["tx"], r["ty"]): (r["n_visible"], r["chk_visible"])
        for r in terrain_viewshed(terrain_rgb_tiles(df, z=10, parent_z=7)).collect()
    }
    import collections

    grids = collections.defaultdict(lambda: np.zeros((8, 8), np.int64))
    for tx, ty, e in rows:
        grids[(tx >> 3, ty >> 3)][ty % 8, tx % 8] = e
    for key, g in grids.items():
        vis = _viewshed_ref(g)
        want = (len(vis), sum(y * 131 + x * 137 + 1 for y, x in vis))
        assert out[key] == want, key


def test_viewshed_monotone_ridge_blocks(spark):
    """A single tall ridge at x=2 hides everything behind it that is not
    taller; a monotone upward slope is fully visible."""
    import numpy as np

    from osmgraft.operators.raster import terrain_rgb_tiles, terrain_viewshed

    g = np.zeros((8, 8), np.int64)
    g[0, :] = [x * x for x in range(8)]       # convex ramp: all 7 visible
    g[1, :] = [0, 0, 500, 0, 0, 0, 0, 0]      # ridge at x=2 hides x>2
    rows = [(x, y, int(g[y, x])) for y in range(8) for x in range(8)]
    df = spark.createDataFrame(rows, "tx long, ty long, cnt long")
    (r,) = terrain_viewshed(terrain_rgb_tiles(df, z=10, parent_z=7)).collect()
    vis = _viewshed_ref(g)
    row0 = {(y, x) for y, x in vis if y == 0}
    row1 = {(y, x) for y, x in vis if y == 1}
    # ang(x) = x²/x = x strictly increases -> every cell visible
    assert row0 == {(0, x) for x in range(1, 8)}
    # x=1 vacuously visible, the ridge at x=2 visible, everything after
    # sits below the ridge angle
    assert row1 == {(1, 1), (1, 2)}
    # flat rows (all zeros): only x=1 (vacuous); angles tie at 0 after
    assert r["n_visible"] == len(vis) == 7 + 2 + 6 * 1
