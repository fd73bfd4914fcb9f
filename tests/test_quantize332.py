"""image_quantize_rgb332 vs a per-pixel python reference; dither semantics."""

import numpy as np

from osmgraft.functions.codec import encode_image
from osmgraft.operators.multimodal import _BAYER4, image_quantize_rgb332


def _img_df(spark, arrays):
    rows = []
    for i, px in enumerate(arrays):
        h, w = px.shape[:2]
        rows.append((f"t{i}", bytearray(encode_image(px, "raw")), w, h, "raw"))
    return spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string"
    )


def _ref_hist(px, dither=True):
    h, w = px.shape[:2]
    hist = {}
    for y in range(h):
        for x in range(w):
            t = int(_BAYER4[y % 4, x % 4])
            out = []
            for c, levels in ((0, 8), (1, 8), (2, 4)):
                v = int(px[y, x, c])
                if dither:
                    q = min((v * (levels - 1) * 32 + 255 * (2 * t + 1)) // 8160,
                            levels - 1)
                else:
                    q = v >> (8 - levels.bit_length() + 1)
                out.append(q)
            pal = (out[0] << 5) | (out[1] << 2) | out[2]
            hist[pal] = hist.get(pal, 0) + 1
    return hist


def test_quantize_matches_per_pixel_reference(spark):
    rng = np.random.default_rng(9)
    px = rng.integers(0, 256, (10, 14, 3), dtype=np.uint8)
    got = {r.pal: r.cnt
           for r in image_quantize_rgb332(_img_df(spark, [px])).collect()}
    assert got == _ref_hist(px)


def test_quantize_histogram_covers_every_pixel(spark):
    rng = np.random.default_rng(1)
    px = rng.integers(0, 256, (9, 11, 3), dtype=np.uint8)
    rows = image_quantize_rgb332(_img_df(spark, [px])).collect()
    assert sum(r.cnt for r in rows) == 9 * 11


def test_dither_splits_a_flat_midtone(spark):
    # a flat plane between two palette levels must dither into BOTH
    # neighbors (the whole point of ordered dithering); truncation gives one
    px = np.full((8, 8, 3), 130, dtype=np.uint8)
    dithered = image_quantize_rgb332(_img_df(spark, [px]), dither=True).collect()
    flat = image_quantize_rgb332(_img_df(spark, [px]), dither=False).collect()
    # expected palette set straight from the formula over all 16 thresholds
    want = set()
    for t in range(16):
        q = [min((130 * (lv - 1) * 32 + 255 * (2 * t + 1)) // 8160, lv - 1)
             for lv in (8, 8, 4)]
        want.add((q[0] << 5) | (q[1] << 2) | q[2])
    assert {r.pal for r in dithered} == want and len(want) > 1
    assert len(flat) == 1  # truncation collapses the plane to one cell


def test_extremes_are_stable_under_dither(spark):
    # 0 and 255 must map to the bottom/top palette cell at EVERY position
    for v, want in ((0, 0), (255, (7 << 5) | (7 << 2) | 3)):
        px = np.full((6, 7, 3), v, dtype=np.uint8)
        rows = image_quantize_rgb332(_img_df(spark, [px])).collect()
        assert len(rows) == 1 and rows[0].pal == want and rows[0].cnt == 42
