"""image_central_moments: double-loop reference, translation covariance law,
symmetry zeros, corrupt rows."""

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
    p = p.astype(np.int64)
    h, w, _ = p.shape
    luma = (299 * p[..., 0] + 587 * p[..., 1] + 114 * p[..., 2]) // 1000
    m = {a + b: 0 for a in "012" for b in "012"}
    M = {}
    for (pq, f) in [("00", lambda x, y: 1), ("10", lambda x, y: x),
                    ("01", lambda x, y: y), ("20", lambda x, y: x * x),
                    ("02", lambda x, y: y * y), ("11", lambda x, y: x * y)]:
        M[pq] = sum(int(luma[y, x]) * f(x, y) for y in range(h) for x in range(w))
    return (M["00"], M["10"], M["01"],
            M["00"] * M["20"] - M["10"] ** 2,
            M["00"] * M["02"] - M["01"] ** 2,
            M["00"] * M["11"] - M["10"] * M["01"])


def test_matches_reference_and_translation_law(spark):
    from osmgraft.operators.multimodal import image_central_moments

    rng = np.random.RandomState(5)
    base = rng.randint(0, 256, (6, 7, 3))
    # translated copy: same content, zero padding shifts the centroid but
    # must leave the CENTRAL moments unchanged (translation invariance of
    # mu_pq; our c_pq = mu_pq * M00 with identical M00)
    shifted = np.zeros((9, 11, 3), dtype=np.int64)
    shifted[2:8, 3:10] = base
    imgs = [base, shifted, rng.randint(0, 256, (12, 5, 3))]
    got = {
        r["image_id"]: (r["m00"], r["m10"], r["m01"], r["c20"], r["c02"], r["c11"])
        for r in image_central_moments(_raw_rows(spark, imgs)).collect()
    }
    for i, px in enumerate(imgs):
        assert got[f"t{i}"] == _ref(px), i
    assert got["t0"][3:] == got["t1"][3:]          # central moments invariant
    assert got["t0"][0] == got["t1"][0]            # same mass
    assert got["t0"][1:3] != got["t1"][1:3]        # raw first moments move


def test_symmetric_image_c11_zero(spark):
    """A 4-fold symmetric blob has zero product moment."""
    from osmgraft.operators.multimodal import image_central_moments

    px = np.zeros((7, 7, 3), dtype=np.int64)
    px[3, 3] = 200
    px[2, 3] = px[4, 3] = px[3, 2] = px[3, 4] = 100
    r = image_central_moments(_raw_rows(spark, [px])).collect()[0]
    assert r["c11"] == 0 and r["c20"] == r["c02"] and r["c20"] > 0


def test_corrupt_null(spark):
    from osmgraft.operators.multimodal import image_central_moments

    bad = spark.createDataFrame(
        [("c0", bytearray(b"zz"), 4, 4, "raw")],
        "image_id string, bytes binary, w int, h int, fmt string",
    )
    r = image_central_moments(bad, on_error="null").collect()[0]
    assert r["m00"] is None and r["c11"] is None
