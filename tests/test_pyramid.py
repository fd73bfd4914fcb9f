"""image_pyramid_energies: double-loop reference, flat-image laws."""

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


def _ref(p):
    """Scalar double-loop reference: horizontal then vertical binomial,
    clamp-to-edge, //16 per pass, 2x subsample, nearest-up residual."""
    p = p.astype(np.int64)
    h, w = p.shape[0], p.shape[1]
    luma = (299 * p[..., 0] + 587 * p[..., 1] + 114 * p[..., 2]) // 1000
    k = [1, 4, 6, 4, 1]
    t = np.zeros((h, w), np.int64)
    for y in range(h):
        for x in range(w):
            s = 0
            for j in range(5):
                s += k[j] * luma[y, min(max(x + j - 2, 0), w - 1)]
            t[y, x] = s // 16
    h1, w1 = h // 2, w // 2
    l1 = np.zeros((h1, w1), np.int64)
    for y1 in range(h1):
        for x1 in range(w1):
            s = 0
            for j in range(5):
                s += k[j] * t[min(max(2 * y1 + j - 2, 0), h - 1), 2 * x1]
            l1[y1, x1] = s // 16
    up = np.repeat(np.repeat(l1, 2, axis=0), 2, axis=1)
    res = luma - up
    wgt = (np.arange(h1)[:, None] * 131 + np.arange(w1)[None, :] * 137 + 1)
    return (
        h1 * w1,
        int(l1.sum()),
        int((l1 * l1).sum()),
        int((l1 * wgt).sum()),
        int(res.sum()),
        int((res * res).sum()),
    )


def test_pyramid_matches_reference(spark):
    from osmgraft.operators.multimodal import image_pyramid_energies

    rng = np.random.default_rng(31)
    imgs = [
        rng.integers(0, 256, (12, 16, 3)),
        rng.integers(0, 256, (18, 24, 3)),
        rng.integers(0, 256, (12, 32, 3)),
    ]
    got = {
        r.image_id: (r.n_px1, r.sum_l1, r.ssq_l1, r.wsum_l1, r.sum_res, r.ssq_res)
        for r in image_pyramid_energies(_raw_rows(spark, imgs)).collect()
    }
    for i, px in enumerate(imgs):
        assert got[f"t{i}"] == _ref(px), i


def test_pyramid_flat_image_zero_residual(spark):
    from osmgraft.operators.multimodal import image_pyramid_energies

    px = np.full((12, 16, 3), 77)
    r = image_pyramid_energies(_raw_rows(spark, [px])).collect()[0]
    # constant plane: both binomial passes are exact (16c//16 = c), so the
    # level-1 plane is the same constant and the Laplacian residual vanishes
    luma = (299 * 77 + 587 * 77 + 114 * 77) // 1000
    assert r.sum_res == 0 and r.ssq_res == 0
    assert r.sum_l1 == luma * r.n_px1 and r.ssq_l1 == luma * luma * r.n_px1
