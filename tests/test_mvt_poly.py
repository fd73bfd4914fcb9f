"""MVT POLYGON layer codec + contour tile sink/source symmetry.

The codec tests are independent of Spark (pure wire-format); the
roundtrip tests drive the distributed sink/source against the
first-principles contour reference from test_contour.py.
"""

import numpy as np
import pytest

from osmgraft.functions.mvt import (
    decode_polygon_layers,
    encode_polygon_layer,
)
from tests.test_contour import _ref_rings, _ref_segments

SQUARE = [(0, 0), (10, 0), (10, 10), (0, 10)]  # positive surveyor sum (y down)


def test_polygon_codec_roundtrip():
    hole = [(2, 2), (2, 5), (5, 5), (5, 2)]  # negative sum: interior ring
    tile = encode_polygon_layer(
        "adm", [([SQUARE, hole], {"id": 7}), ([SQUARE], {"id": 9})], extent=256
    )
    layers = decode_polygon_layers(tile)
    extent, feats = layers["adm"]
    assert extent == 256
    assert feats == [([SQUARE, hole], {"id": 7}), ([SQUARE], {"id": 9})]


def test_polygon_codec_cursor_persists_across_rings():
    # two rings far apart: the second MoveTo is a DELTA from ring 1's end
    far = [(1000, 1000), (1010, 1000), (1010, 1010), (1000, 1010)]
    tile = encode_polygon_layer("l", [([SQUARE, far], {})])
    (extent, feats), = decode_polygon_layers(tile).values()
    assert feats[0][0] == [SQUARE, far]


def test_polygon_codec_rejects_bad_geometry():
    with pytest.raises(ValueError, match="exterior"):
        encode_polygon_layer("l", [([list(reversed(SQUARE))], {})])
    with pytest.raises(ValueError, match="< 3 points"):
        encode_polygon_layer("l", [([[(0, 0), (1, 0)]], {})])
    with pytest.raises(ValueError, match="zero-length"):
        encode_polygon_layer("l", [([[(0, 0), (5, 0), (5, 0), (0, 5)]], {})])


def test_polygon_decoder_rejects_line_features():
    from osmgraft.functions.mvt import encode_line_layer

    tile = encode_line_layer("l", [([(0, 0), (5, 5)], {})])
    with pytest.raises(ValueError, match="not a POLYGON"):
        decode_polygon_layers(tile)


def _segments_df(spark, inside):
    from osmgraft.operators.contour import contour_segments

    cells = [(x, y, 1) for x, y in inside]
    df = spark.createDataFrame(cells, "cx long, cy long, cnt long")
    return contour_segments(df, 1)


def _roundtrip(spark, inside, grid_z=8, tile_z=2):
    from osmgraft.operators.raster import (
        mvt_polygon_segments,
        render_contour_mvt_polys,
    )

    tiles_df = render_contour_mvt_polys(
        _segments_df(spark, inside), grid_z=grid_z, tile_z=tile_z
    )
    out = mvt_polygon_segments(tiles_df, grid_z=grid_z)
    return tiles_df, sorted((r.x0, r.y0, r.x1, r.y1) for r in out.collect())


def test_contour_tile_roundtrip_identity(spark):
    rng = np.random.default_rng(41)
    pts = {
        (int(x), int(y))
        for x, y in zip(rng.integers(0, 250, 200), rng.integers(0, 250, 200))
    }
    tiles_df, got = _roundtrip(spark, pts)
    assert got == _ref_segments(pts)
    rows = tiles_df.collect()
    assert len(rows) > 1  # genuinely multi-tile
    assert sum(r.n_features for r in rows) == len(_ref_rings(pts))


def test_contour_tile_roundtrip_hole_direction(spark):
    # block with a hole: the hole ring is encoded reversed (spec exterior)
    # and must come back in its ORIGINAL direction via the hole attr
    inside = {(x, y) for x in range(4) for y in range(4)} - {(1, 1), (2, 2), (1, 2), (2, 1)}
    tiles_df, got = _roundtrip(spark, inside)
    assert got == _ref_segments(inside)
    from osmgraft.functions.mvt import decode_polygon_layers

    (row,) = tiles_df.collect()
    extent, feats = decode_polygon_layers(row.mvt)["contours"]
    holes = [a["hole"] for _, a in feats]
    assert sorted(holes) == [0, 1]
    for rings, attrs in feats:
        area2 = sum(
            p[0] * q[1] - q[0] * p[1]
            for p, q in zip(rings[0], rings[0][1:] + rings[0][:1])
        )
        assert area2 > 0  # every encoded ring is spec-exterior


def test_contour_tile_straddling_ring_buffer_geometry(spark):
    # a ring spanning two z2 tiles is assigned to its min-vertex tile and
    # carries out-of-extent (buffer) coordinates — spec-permitted
    inside = {(x, 5) for x in range(60, 70)}  # crosses cell x=64 (tile edge)
    tiles_df, got = _roundtrip(spark, inside)
    assert got == _ref_segments(inside)
    assert tiles_df.count() == 1
