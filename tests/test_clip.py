"""clip_segments_to_tiles: exact-integer Liang–Barsky segment→tile clipping.

Independent of the DuckDB twin: an exact-rational reference (fractions.
Fraction, no floats) re-derives the clip interval and the half-up-quantized
clip points per (segment, tile); golden cases pin the closed-window border
semantics (a border-riding segment lands in BOTH adjacent tiles), direction
preservation, and degenerate vertical/horizontal/point segments; candidate
completeness is proven against every tile in the world.
"""

from fractions import Fraction

import numpy as np
import pytest

from osmgraft.operators.clip import EXTENT, clip_segments_to_tiles

Z = 3  # 8x8-tile test world
WORLD = (1 << Z) * EXTENT


def _clip_ref(x0, y0, x1, y1, tx, ty):
    """Exact rational Liang–Barsky vs the CLOSED window of tile (tx, ty);
    returns quantized (px0, py0, px1, py1) tile-local or None."""
    wx0, wx1 = tx * EXTENT, (tx + 1) * EXTENT
    wy0, wy1 = ty * EXTENT, (ty + 1) * EXTENT
    dx, dy = x1 - x0, y1 - y0
    t_enter, t_leave = Fraction(0), Fraction(1)
    for p, q_lo, q_hi in ((dx, wx0 - x0, wx1 - x0), (dy, wy0 - y0, wy1 - y0)):
        if p == 0:
            if not (q_lo <= 0 <= q_hi):
                return None
            continue
        ta, tb = Fraction(q_lo, p), Fraction(q_hi, p)
        if ta > tb:
            ta, tb = tb, ta
        t_enter, t_leave = max(t_enter, ta), min(t_leave, tb)
    if t_enter > t_leave:
        return None

    def rnd_half_up_signed(v: Fraction, sign: int) -> int:
        # the operator rounds half-up in SIGN-NORMALIZED space: for a
        # reflected axis that is round-half-down in world space
        if sign >= 0:
            return (v + Fraction(1, 2)).__floor__()
        return -((-v + Fraction(1, 2)).__floor__())

    sx = -1 if dx < 0 else 1
    sy = -1 if dy < 0 else 1
    ex = rnd_half_up_signed(x0 + t_enter * dx, sx) - tx * EXTENT
    ey = rnd_half_up_signed(y0 + t_enter * dy, sy) - ty * EXTENT
    lx = rnd_half_up_signed(x0 + t_leave * dx, sx) - tx * EXTENT
    ly = rnd_half_up_signed(y0 + t_leave * dy, sy) - ty * EXTENT
    return ex, ey, lx, ly


def _all_tiles_ref(rows):
    want = {}
    for wid, sid, x0, y0, x1, y1 in rows:
        for tx in range(1 << Z):
            for ty in range(1 << Z):
                r = _clip_ref(x0, y0, x1, y1, tx, ty)
                if r is not None:
                    want[(wid, sid, tx, ty)] = r
    return want


def _run(spark, rows):
    df = spark.createDataFrame(
        rows, "way_id long, seg_idx long, x0 long, y0 long, x1 long, y1 long"
    )
    got = {
        (r.way_id, r.seg_idx, r.tx, r.ty): (r.px0, r.py0, r.px1, r.py1)
        for r in clip_segments_to_tiles(df, z=Z).collect()
    }
    return got


def test_matches_exact_rational_reference(spark):
    rng = np.random.default_rng(31)
    n = 250
    rows = []
    for i in range(n):
        x0 = int(rng.integers(0, WORLD + 1))
        y0 = int(rng.integers(0, WORLD + 1))
        x1 = min(max(x0 + int(rng.integers(-9000, 9001)), 0), WORLD)
        y1 = min(max(y0 + int(rng.integers(-9000, 9001)), 0), WORLD)
        rows.append((i, i % 5, x0, y0, x1, y1))
    got = _run(spark, rows)
    want = _all_tiles_ref(rows)
    assert got == want
    assert len(want) > n  # multi-tile coverage sanity


GOLDEN_ROWS = [
    # border-riding vertical segment on the tile-1/tile-2 x border
    (1, 0, 2 * EXTENT, 100, 2 * EXTENT, 900),
    # zero-length segment exactly on a 4-corner point
    (2, 0, EXTENT, EXTENT, EXTENT, EXTENT),
    # horizontal right-to-left crossing two tiles (direction preserved)
    (3, 0, EXTENT + 100, 50, EXTENT - 100, 50),
    # diagonal exactly through a tile corner
    (4, 0, EXTENT - 64, EXTENT - 64, EXTENT + 64, EXTENT + 64),
]


def test_goldens(spark):
    got = _run(spark, GOLDEN_ROWS)
    # border rider appears in BOTH tile columns 1 and 2
    assert (1, 0, 1, 0) in got and (1, 0, 2, 0) in got
    assert got[(1, 0, 1, 0)] == (EXTENT, 100, EXTENT, 900)
    assert got[(1, 0, 2, 0)] == (0, 100, 0, 900)
    # 4-corner point appears in all four incident tiles
    for tx, ty in ((0, 0), (0, 1), (1, 0), (1, 1)):
        assert (2, 0, tx, ty) in got
    assert got[(2, 0, 0, 0)] == (EXTENT, EXTENT, EXTENT, EXTENT)
    assert got[(2, 0, 1, 1)] == (0, 0, 0, 0)
    # right-to-left: (px0, py0) is the clip of the ORIGINAL start
    assert got[(3, 0, 1, 0)] == (100, 50, 0, 50)
    assert got[(3, 0, 0, 0)] == (EXTENT, 50, EXTENT - 100, 50)
    # corner-crossing diagonal shows up in both diagonal tiles (and the
    # touching anti-diagonal ones, by closed-window corner contact)
    assert (4, 0, 0, 0) in got and (4, 0, 1, 1) in got
    assert got[(4, 0, 0, 0)] == (EXTENT - 64, EXTENT - 64, EXTENT, EXTENT)
    assert got[(4, 0, 1, 1)] == (0, 0, 64, 64)
    # and the reference agrees on the full golden map
    assert got == _all_tiles_ref(GOLDEN_ROWS)


def test_outputs_inside_window(spark):
    rng = np.random.default_rng(77)
    rows = []
    for i in range(150):
        x0 = int(rng.integers(0, WORLD + 1))
        y0 = int(rng.integers(0, WORLD + 1))
        x1 = min(max(x0 + int(rng.integers(-20000, 20001)), 0), WORLD)
        y1 = min(max(y0 + int(rng.integers(-20000, 20001)), 0), WORLD)
        rows.append((i, 0, x0, y0, x1, y1))
    got = _run(spark, rows)
    assert got
    for px0, py0, px1, py1 in got.values():
        for v in (px0, py0, px1, py1):
            assert 0 <= v <= EXTENT


def test_no_python_in_plan(spark):
    df = spark.createDataFrame(
        [(1, 0, 10, 10, 5000, 5000)],
        "way_id long, seg_idx long, x0 long, y0 long, x1 long, y1 long",
    )
    plan = (
        clip_segments_to_tiles(df, z=Z)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan and "BatchEval" not in plan


# --- MVT LINESTRING layer codec (functions/mvt.py) ---------------------------


def test_mvt_line_layer_roundtrip_unit():
    from osmgraft.functions.mvt import decode_line_layers, encode_line_layer

    lines = [
        ([(0, 0), (100, 50), (4096, 4096)], {"way_id": 7, "seg_idx": 0}),
        ([(4096, 0), (0, 4096)], {"way_id": 9, "seg_idx": 3}),
        ([(5, 5), (5, 6)], {"way_id": 7, "seg_idx": 1}),  # shares key table
    ]
    data = encode_line_layer("ways", lines)
    out = decode_line_layers(data)
    assert set(out) == {"ways"}
    extent, feats = out["ways"]
    assert extent == 4096
    assert feats == lines


def test_mvt_line_layer_rejects_degenerate():
    import pytest as _pytest

    from osmgraft.functions.mvt import encode_line_layer

    with _pytest.raises(ValueError, match="zero-length"):
        encode_line_layer("ways", [([(1, 1), (1, 1)], {})])
    with _pytest.raises(ValueError, match="< 2 points"):
        encode_line_layer("ways", [([(1, 1)], {})])


def test_mvt_line_decoder_rejects_point_layer():
    import pytest as _pytest

    from osmgraft.functions.mvt import decode_line_layers, encode_point_layer

    data = encode_point_layer("counts", [(1, 2, {"cnt": 3})])
    with _pytest.raises(ValueError, match="not a LINESTRING"):
        decode_line_layers(data)


def test_render_tile_mvt_lines_distributed(spark):
    import hashlib

    from osmgraft.operators.raster import mvt_line_features, render_tile_mvt_lines

    rows = [
        (1, 0, 100, 100, 9000, 5000),   # crosses tiles
        (2, 0, 200, 200, 200, 200),     # degenerate -> dropped
        (3, 1, 4096, 0, 4096, 4096),    # border rider -> two tiles
    ]
    df = spark.createDataFrame(
        rows, "way_id long, seg_idx long, x0 long, y0 long, x1 long, y1 long"
    )
    clipped = clip_segments_to_tiles(df, z=Z)
    tiles_df = render_tile_mvt_lines(clipped, z=Z)
    trows = {(r.tx, r.ty): r for r in tiles_df.collect()}
    assert all(r.z == Z for r in trows.values())
    # way 2 contributes nothing; way 3 appears in tile columns 0 and 1
    assert (0, 0) in trows and (1, 0) in trows
    # decode-side equality with the clip output minus degenerates
    feats = {
        (r.way_id, r.seg_idx, r.tx, r.ty, r.px0, r.py0, r.px1, r.py1)
        for r in mvt_line_features(tiles_df).collect()
    }
    want = {
        (r.way_id, r.seg_idx, r.tx, r.ty, r.px0, r.py0, r.px1, r.py1)
        for r in clipped.collect()
        if (r.px0, r.py0) != (r.px1, r.py1)
    }
    assert feats == want and 2 not in {f[0] for f in feats}
    # byte determinism: tile (0,0) bytes are stable across runs/partitionings
    b1 = trows[(0, 0)].mvt
    b2 = {(r.tx, r.ty): r.mvt for r in
          render_tile_mvt_lines(clipped.repartition(7), z=Z).collect()}[(0, 0)]
    assert hashlib.sha256(b1).hexdigest() == hashlib.sha256(b2).hexdigest()


def test_fast_encoder_bit_identical():
    rng = np.random.default_rng(41)
    n = 500
    w = rng.integers(0, 10_000_000, n)
    s = rng.integers(0, 7, n)
    x0 = rng.integers(0, 4097, n)
    y0 = rng.integers(0, 4097, n)
    x1 = (x0 + rng.integers(1, 50, n)) % 4097  # never equal to (x0,y0)? fix below
    y1 = y0
    # guarantee no degenerate pair
    x1 = np.where((x1 == x0) & (y1 == y0), (x0 + 1) % 4097, x1)

    from osmgraft.functions.mvt import encode_line_layer, encode_line_layer_fast

    lines = [
        (
            [(int(x0[i]), int(y0[i])), (int(x1[i]), int(y1[i]))],
            {"way_id": int(w[i]), "seg_idx": int(s[i])},
        )
        for i in range(n)
    ]
    assert encode_line_layer_fast("ways", w, s, x0, y0, x1, y1) == encode_line_layer(
        "ways", lines
    )
    assert encode_line_layer_fast(
        "ways", w[:0], s[:0], x0[:0], y0[:0], x1[:0], y1[:0]
    ) == encode_line_layer("ways", [])
