"""image_box_filter (SAT) vs direct window sums; error and edge paths."""

import numpy as np

from osmgraft.functions.codec import encode_image
from osmgraft.operators.multimodal import image_box_filter


def _img_df(spark, arrays, fmts=None):
    rows = []
    for i, px in enumerate(arrays):
        h, w = px.shape[:2]
        fmt = (fmts or ["raw"] * len(arrays))[i]
        rows.append((f"t{i}", bytearray(encode_image(px, fmt)), w, h, fmt))
    return spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string"
    )


def _direct(px, box, stride):
    luma = (
        299 * px[..., 0].astype(np.int64)
        + 587 * px[..., 1].astype(np.int64)
        + 114 * px[..., 2].astype(np.int64)
    ) // 1000
    h, w = luma.shape
    out = {}
    for wy in range(0, h - box + 1, stride):
        for wx in range(0, w - box + 1, stride):
            out[(wy, wx)] = int(luma[wy : wy + box, wx : wx + box].sum())
    return out


def test_box_filter_matches_direct_sums(spark):
    rng = np.random.default_rng(3)
    arrays = [rng.integers(0, 256, (11, 13, 3), dtype=np.uint8),
              rng.integers(0, 256, (8, 21, 3), dtype=np.uint8)]
    got = {}
    for r in image_box_filter(_img_df(spark, arrays, ["raw", "ppm"]), 4, 2).collect():
        got.setdefault(r.image_id, {})[(r.wy, r.wx)] = r.box_sum
    for i, px in enumerate(arrays):
        assert got[f"t{i}"] == _direct(px, 4, 2), i


def test_box_filter_box1_stride1_is_luma(spark):
    px = np.arange(5 * 6 * 3, dtype=np.uint8).reshape(5, 6, 3)
    got = {(r.wy, r.wx): r.box_sum
           for r in image_box_filter(_img_df(spark, [px]), 1, 1).collect()}
    assert got == _direct(px, 1, 1)


def test_box_filter_too_small_image_emits_nothing(spark):
    px = np.zeros((3, 3, 3), dtype=np.uint8)
    assert image_box_filter(_img_df(spark, [px]), box=5).count() == 0


def test_box_filter_corrupt_row_nulls_not_fails(spark):
    px = np.full((6, 6, 3), 7, dtype=np.uint8)
    good = (b"g", bytearray(encode_image(px, "raw")), 6, 6, "raw")
    bad = (b"b", bytearray(b"\x00\x01"), 6, 6, "raw")
    df = spark.createDataFrame(
        [("g",) + good[1:], ("b",) + bad[1:]],
        "image_id string, bytes binary, w int, h int, fmt string",
    )
    rows = {r.image_id: r for r in image_box_filter(df, 5, 3, on_error="null").collect()}
    assert rows["b"].box_sum is None and rows["b"].wy == -1
    assert rows["g"].box_sum == 25 * 7  # luma of (7,7,7) = 7
