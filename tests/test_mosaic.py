"""mosaic_tiles: local reconstruction equality + determinism + pruning."""

import zlib

import numpy as np

from osmgraft.functions.codec import encode_image, png_decode, resize_area
from osmgraft.operators.raster import mosaic_tiles


def _mk_images(spark, n, lat7=450000000, lon7=90000000, seed=0):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        w, h = 16, 12
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        rows.append(
            (f"m{i:04d}", bytearray(encode_image(px, "raw")), w, h, "raw",
             lat7 + i, lon7 + i)
        )
    return rows, spark.createDataFrame(
        rows,
        "image_id string, bytes binary, w int, h int, fmt string, "
        "lat7 long, lon7 long",
    )


def _local_canvas(rows, grid=2, thumb=8):
    side = grid * thumb
    canvas = np.zeros((side, side, 3), dtype=np.uint8)
    for i, (_, data, w, h, fmt, _, _) in enumerate(
        sorted(rows)[: grid * grid]
    ):
        px = np.frombuffer(bytes(data), np.uint8).reshape(h, w, 3)
        t = np.stack(
            [resize_area(px[..., c].astype(np.int64), thumb, thumb)
             for c in range(3)], axis=-1).astype(np.uint8)
        gy, gx = divmod(i, grid)
        canvas[gy * thumb:(gy + 1) * thumb, gx * thumb:(gx + 1) * thumb] = t
    return canvas


def test_mosaic_matches_local_reconstruction(spark):
    rows, df = _mk_images(spark, 3)
    out = mosaic_tiles(df, z=5, grid=2, thumb=8).collect()
    assert len(out) == 1
    r = out[0]
    want = _local_canvas(rows, grid=2, thumb=8)
    assert r.n_images == 3
    assert r.mosaic_crc == np.int64(zlib.crc32(want.tobytes()))
    assert np.array_equal(png_decode(bytes(r.png)), want)


def test_mosaic_prunes_to_grid_squared(spark):
    rows, df = _mk_images(spark, 9)
    out = mosaic_tiles(df, z=5, grid=2, thumb=4).collect()
    assert len(out) == 1 and out[0].n_images == 4  # only the 4 lowest ids


def test_mosaic_partitioning_invariant(spark):
    _, df = _mk_images(spark, 6, seed=3)
    a = {(r.tx, r.ty, r.mosaic_crc)
         for r in mosaic_tiles(df.repartition(1), z=5, grid=2).collect()}
    b = {(r.tx, r.ty, r.mosaic_crc)
         for r in mosaic_tiles(df.repartition(7), z=5, grid=2).collect()}
    assert a == b


def test_mosaic_plan_prunes_before_python(spark):
    _, df = _mk_images(spark, 4)
    plan = mosaic_tiles(df, z=5)._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
