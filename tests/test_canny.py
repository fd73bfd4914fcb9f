"""image_canny_nms: brute-force per-pixel reference, known geometry,
degenerate/corrupt rows, map-only plan."""

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


def _brute_canny(p, t2):
    p = p.astype(np.int64)
    h, w, _ = p.shape
    luma = (299 * p[..., 0] + 587 * p[..., 1] + 114 * p[..., 2]) // 1000

    def mag2(y, x):
        gx = luma[y, x + 1] - luma[y, x - 1]
        gy = luma[y + 1, x] - luma[y - 1, x]
        return gx * gx + gy * gy, gx, gy

    def octant(gx, gy):
        ax, ay = abs(gx), abs(gy)
        if gx > 0 and gy >= 0:
            return 0 if ay < ax else 1
        if gx <= 0 and gy > 0:
            return 2 if ax < ay else 3
        if gx < 0 and gy <= 0:
            return 4 if ay < ax else 5
        return 6 if ax < ay else 7

    offs = {0: (0, 1), 1: (1, 1), 2: (1, 0), 3: (1, -1)}
    n = chk = 0
    for y in range(2, h - 2):
        for x in range(2, w - 2):
            m0, gx, gy = mag2(y, x)
            if m0 <= t2:
                continue
            dy, dx = offs[octant(gx, gy) % 4]
            if m0 >= mag2(y + dy, x + dx)[0] and m0 >= mag2(y - dy, x - dx)[0]:
                n += 1
                chk += y * 131 + x * 137 + 1
    return n, chk


def test_matches_brute_force(spark):
    from osmgraft.operators.multimodal import image_canny_nms

    rng = np.random.RandomState(11)
    imgs = [rng.randint(0, 256, (h, w, 3)) for h, w in [(8, 9), (6, 6), (12, 5)]]
    # plus a crisp vertical step edge (deterministic geometry)
    step = np.zeros((10, 10, 3), dtype=np.int64)
    step[:, 5:, :] = 200
    imgs.append(step)
    got = {
        r["image_id"]: (r["edge_n"], r["edge_chk"])
        for r in image_canny_nms(_raw_rows(spark, imgs), t2=900).collect()
    }
    for i, px in enumerate(imgs):
        assert got[f"t{i}"] == _brute_canny(px, 900), i


def test_step_edge_is_single_column(spark):
    """A vertical step must survive NMS as a THIN line (one column per side
    of the central-diff plateau is suppressed to the max column(s))."""
    from osmgraft.operators.multimodal import image_canny_nms

    step = np.zeros((10, 12, 3), dtype=np.int64)
    step[:, 6:, :] = 200
    r = image_canny_nms(_raw_rows(spark, [step]), t2=900).collect()[0]
    n, chk = _brute_canny(step, 900)
    assert (r["edge_n"], r["edge_chk"]) == (n, chk)
    # gradient is nonzero at x in {5, 6} (central diff spans the step); NMS
    # with >= keeps the plateau pair, nothing else: 2 columns x 6 rows
    assert r["edge_n"] == 12


def test_flat_image_no_edges_and_degenerate(spark):
    from osmgraft.operators.multimodal import image_canny_nms

    flat = np.full((8, 8, 3), 55)
    tiny = np.full((4, 4, 3), 9)  # below the 5x5 NMS domain -> zeros
    out = {
        r["image_id"]: (r["edge_n"], r["edge_chk"])
        for r in image_canny_nms(_raw_rows(spark, [flat, tiny])).collect()
    }
    assert out == {"t0": (0, 0), "t1": (0, 0)}


def test_corrupt_null_and_plan(spark):
    from osmgraft.operators.multimodal import image_canny_nms

    bad = spark.createDataFrame(
        [("c0", bytearray(b"zz"), 8, 8, "raw")],
        "image_id string, bytes binary, w int, h int, fmt string",
    )
    r = image_canny_nms(bad, on_error="null").collect()[0]
    assert r["edge_n"] is None and r["edge_chk"] is None
    df = _raw_rows(spark, [np.zeros((6, 6, 3))])
    plan = image_canny_nms(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
