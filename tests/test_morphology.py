"""raster erode/dilate/opening vs first-principles set references."""

import numpy as np

from osmgraft.operators.density import raster_dilate, raster_erode, raster_opening


def _df(spark, pts):
    return spark.createDataFrame(
        [(int(x), int(y), 1) for x, y in pts], "cx long, cy long, cnt long"
    )


def _ref_dilate(pts, r):
    return {(x + dx, y + dy) for x, y in pts
            for dx in range(-r, r + 1) for dy in range(-r, r + 1)}


def _ref_erode(pts, r):
    s = set(pts)
    return {(x, y) for x, y in s
            if all((x + dx, y + dy) in s
                   for dx in range(-r, r + 1) for dy in range(-r, r + 1))}


def _run(df):
    return {(r.cx, r.cy) for r in df.collect()}


def test_morphology_matches_set_reference(spark):
    rng = np.random.default_rng(21)
    pts = {(int(x), int(y)) for x, y in zip(rng.integers(0, 15, 120),
                                            rng.integers(0, 15, 120))}
    df = _df(spark, pts)
    assert _run(raster_dilate(df, 1)) == _ref_dilate(pts, 1)
    assert _run(raster_erode(df, 1)) == _ref_erode(pts, 1)
    want_open = _ref_dilate(_ref_erode(pts, 1), 1)
    assert _run(raster_opening(df, 1)) == want_open


def test_opening_removes_specks_keeps_blobs(spark):
    blob = {(x, y) for x in range(5) for y in range(5)}
    speck = {(20, 20)}
    filament = {(30, y) for y in range(8)}  # 1 cell wide: opening kills it
    df = _df(spark, blob | speck | filament)
    got = _run(raster_opening(df, 1))
    assert got == blob  # specks and the thin filament vanish, the blob is exact


def test_opening_is_idempotent(spark):
    blob = {(x, y) for x in range(4) for y in range(6)} | {(10, 10)}
    once = _run(raster_opening(_df(spark, blob), 1))
    twice = _run(raster_opening(_df(spark, once), 1))
    assert once == twice
