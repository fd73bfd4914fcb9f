"""image_bilinear_up2x: brute-force per-pixel reference, degenerate sizes,
corrupt payloads, plan shape."""

import numpy as np


def _raw_rows(spark, imgs):
    from osmgraft.functions.codec import encode_image

    rows = [
        (f"t{i}", bytearray(encode_image(px.astype(np.uint8), "raw")),
         px.shape[1], px.shape[0], "raw")
        for i, px in enumerate(imgs)
    ]
    return spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string"
    )


def _brute_up2x(p):
    """Per-output-pixel double loop — independent of the strided-slice
    implementation."""
    p = p.astype(np.int64)
    h, w, _ = p.shape
    oh, ow = 2 * h - 1, 2 * w - 1
    up = np.zeros((oh, ow, 3), dtype=np.int64)
    for Y in range(oh):
        for X in range(ow):
            y0, x0 = Y // 2, X // 2
            if Y % 2 == 0 and X % 2 == 0:
                up[Y, X] = 4 * p[y0, x0]
            elif Y % 2 == 0:
                up[Y, X] = 2 * (p[y0, X // 2] + p[y0, X // 2 + 1])
            elif X % 2 == 0:
                up[Y, X] = 2 * (p[Y // 2, x0] + p[Y // 2 + 1, x0])
            else:
                up[Y, X] = (
                    p[Y // 2, X // 2] + p[Y // 2, X // 2 + 1]
                    + p[Y // 2 + 1, X // 2] + p[Y // 2 + 1, X // 2 + 1]
                )
    return up


def _moments(up):
    oh, ow, _ = up.shape
    wgt = (
        np.arange(oh)[:, None, None] * 131
        + np.arange(ow)[None, :, None] * 137
        + np.arange(3)[None, None, :] * 139
        + 1
    )
    return (
        oh, ow, int(up.sum()), int((up * up).sum()), int((up * wgt).sum())
    )


def test_matches_brute_force(spark):
    from osmgraft.operators.multimodal import image_bilinear_up2x

    rng = np.random.RandomState(7)
    imgs = [rng.randint(0, 256, (h, w, 3)) for h, w in [(5, 4), (2, 2), (3, 7)]]
    got = {
        r["image_id"]: (r["out_h"], r["out_w"], r["sum4"], r["ssq4"], r["wsum4"])
        for r in image_bilinear_up2x(_raw_rows(spark, imgs)).collect()
    }
    for i, px in enumerate(imgs):
        assert got[f"t{i}"] == _moments(_brute_up2x(px)), i


def test_corners_exact_and_constant_image(spark):
    """A constant image upsamples to the same constant (×4 units)."""
    from osmgraft.operators.multimodal import image_bilinear_up2x

    px = np.full((3, 3, 3), 17)
    r = image_bilinear_up2x(_raw_rows(spark, [px])).collect()[0]
    oh, ow = 5, 5
    assert (r["out_h"], r["out_w"]) == (oh, ow)
    assert r["sum4"] == 4 * 17 * oh * ow * 3
    assert r["ssq4"] == (4 * 17) ** 2 * oh * ow * 3


def test_degenerate_and_corrupt(spark):
    from osmgraft.operators.multimodal import image_bilinear_up2x

    thin = np.arange(9).reshape(3, 1, 3) % 256  # w=1 -> degenerate
    df = _raw_rows(spark, [thin])
    assert image_bilinear_up2x(df).collect()[0]["sum4"] is None

    bad = spark.createDataFrame(
        [("c0", bytearray(b"xx"), 4, 4, "raw")],
        "image_id string, bytes binary, w int, h int, fmt string",
    )
    out = image_bilinear_up2x(bad, on_error="null").collect()[0]
    assert out["sum4"] is None and out["out_h"] is None
    import pytest

    with pytest.raises(Exception):
        image_bilinear_up2x(bad, on_error="fail").collect()


def test_plan_map_only(spark):
    from osmgraft.operators.multimodal import image_bilinear_up2x

    df = _raw_rows(spark, [np.zeros((2, 2, 3))])
    plan = image_bilinear_up2x(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
