"""image_lbp_uniform: double-loop reference, constant-image law, uniform
pooling, corrupt-row tolerance."""

import numpy as np

OFFS = [(-1, -1), (-1, 0), (-1, 1), (0, 1), (1, 1), (1, 0), (1, -1), (0, -1)]


def _raw_rows(spark, imgs, ids=None):
    from osmgraft.functions.codec import encode_image

    rows = [
        (ids[i] if ids else f"t{i}",
         bytearray(encode_image(px.astype(np.uint8), "raw")),
         px.shape[1], px.shape[0], "raw")
        for i, px in enumerate(imgs)
    ]
    return spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string"
    )


def _brute(p):
    p = p.astype(np.int64)
    h, w, _ = p.shape
    luma = (299 * p[..., 0] + 587 * p[..., 1] + 114 * p[..., 2]) // 1000
    hist = {}
    for y in range(1, h - 1):
        for x in range(1, w - 1):
            code = 0
            for k, (dy, dx) in enumerate(OFFS):
                if luma[y + dy, x + dx] >= luma[y, x]:
                    code |= 1 << k
            rot = ((code << 1) | (code >> 7)) & 0xFF
            pat = code if bin(code ^ rot).count("1") <= 2 else -1
            hist[pat] = hist.get(pat, 0) + 1
    return hist


def test_lbp_matches_double_loop(spark):
    from osmgraft.operators.multimodal import image_lbp_uniform

    rng = np.random.default_rng(7)
    imgs = [rng.integers(0, 256, (9, 11, 3)), rng.integers(0, 256, (6, 6, 3))]
    out = image_lbp_uniform(_raw_rows(spark, imgs)).collect()
    got = {}
    for r in out:
        got.setdefault(r["image_id"], {})[r["pattern"]] = r["n_px"]
    for i, px in enumerate(imgs):
        assert got[f"t{i}"] == _brute(px), i


def test_lbp_constant_image_and_gradient(spark):
    """Constant image: every neighbor >= center -> code 255 (uniform, 0
    transitions) for ALL interior pixels.  A horizontal ramp yields only
    uniform patterns too (left neighbors below, right above — one
    contiguous arc)."""
    from osmgraft.operators.multimodal import image_lbp_uniform

    const = np.full((5, 7, 3), 90, np.uint8)
    ramp = np.tile((np.arange(8) * 30).astype(np.uint8), (5, 1))[..., None].repeat(3, -1)
    out = image_lbp_uniform(_raw_rows(spark, [const, ramp])).collect()
    by = {}
    for r in out:
        by.setdefault(r["image_id"], {})[r["pattern"]] = r["n_px"]
    assert by["t0"] == {255: 3 * 5}
    assert -1 not in by["t1"] and sum(by["t1"].values()) == 3 * 6


def test_lbp_small_and_corrupt(spark):
    from osmgraft.operators.multimodal import image_lbp_uniform

    ok = np.full((4, 4, 3), 10, np.uint8)
    df = _raw_rows(spark, [ok])
    tiny = _raw_rows(spark, [np.full((2, 9, 3), 5, np.uint8)])
    out = {r["pattern"]: r["n_px"] for r in image_lbp_uniform(tiny).collect()}
    assert out == {-1: 0}
    bad = spark.createDataFrame(
        [("x", bytearray(b"\x01\x02"), 4, 4, "raw")],
        "image_id string, bytes binary, w int, h int, fmt string",
    )
    rows = image_lbp_uniform(df.unionByName(bad), on_error="null").collect()
    got = {r["image_id"]: r for r in rows if r["image_id"] == "x"}
    assert got["x"]["pattern"] == -1 and got["x"]["n_px"] is None
