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


# --- Bayer ordered dithering -------------------------------------------------
def test_dither_matches_double_loop(spark):
    from osmgraft.operators.multimodal import _BAYER4, image_dither_bayer

    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, (7, 9, 3))
    out = image_dither_bayer(_raw_rows(spark, [px])).collect()[0]
    p = px.astype(np.int64)
    luma = (299 * p[..., 0] + 587 * p[..., 1] + 114 * p[..., 2]) // 1000
    n_on = chk = 0
    for y in range(7):
        for x in range(9):
            if luma[y, x] >= 16 * (_BAYER4[y % 4, x % 4] + 1) - 8:
                n_on += 1
                chk += y * 131 + x * 137 + 1
    assert (out["n_px"], out["n_on"], out["chk_on"]) == (63, n_on, chk)


def test_dither_extremes_and_mean_level(spark):
    """Black -> all off; white -> all on; a flat mid gray turns on a
    fraction equal to the number of matrix cells at or below its level —
    the defining property of ordered dithering."""
    from osmgraft.operators.multimodal import image_dither_bayer

    black = np.zeros((8, 8, 3), np.uint8)
    white = np.full((8, 8, 3), 255, np.uint8)
    gray = np.full((8, 8, 3), 120, np.uint8)  # thresholds 8..248 step 16
    out = {r["image_id"]: r for r in image_dither_bayer(
        _raw_rows(spark, [black, white, gray])).collect()}
    assert out["t0"]["n_on"] == 0
    assert out["t1"]["n_on"] == 64
    # luma 120 >= T for T in {8,24,...,120} -> 8 of 16 cells on
    assert out["t2"]["n_on"] == 64 * 8 // 16


# --- GLCM texture features ---------------------------------------------------
def test_glcm_matches_double_loop(spark):
    from osmgraft.operators.multimodal import image_glcm_features

    rng = np.random.default_rng(19)
    px = rng.integers(0, 256, (6, 9, 3))
    out = image_glcm_features(_raw_rows(spark, [px])).collect()[0]
    p = px.astype(np.int64)
    luma = (299 * p[..., 0] + 587 * p[..., 1] + 114 * p[..., 2]) // 1000
    q = luma >> 4
    hist = {}
    contrast = 0
    for y in range(6):
        for x in range(8):
            a, b = int(q[y, x]), int(q[y, x + 1])
            contrast += (a - b) ** 2
            hist[(a, b)] = hist.get((a, b), 0) + 1
    assert out["n_pairs"] == 6 * 8
    assert out["contrast"] == contrast
    assert out["energy_num"] == sum(c * c for c in hist.values())


def test_glcm_flat_vs_noise(spark):
    """A flat image maximizes energy (all pairs identical) with zero
    contrast; uniform noise minimizes energy and has positive contrast."""
    from osmgraft.operators.multimodal import image_glcm_features

    flat = np.full((8, 8, 3), 100, np.uint8)
    rng = np.random.default_rng(29)
    noise = rng.integers(0, 256, (8, 8, 3)).astype(np.uint8)
    out = {r["image_id"]: r for r in image_glcm_features(
        _raw_rows(spark, [flat, noise])).collect()}
    np_pairs = 8 * 7
    assert out["t0"]["contrast"] == 0
    assert out["t0"]["energy_num"] == np_pairs * np_pairs
    assert out["t1"]["contrast"] > 0
    assert out["t1"]["energy_num"] < out["t0"]["energy_num"]


# --- histogram equalization --------------------------------------------------
def test_histeq_matches_double_loop(spark):
    from osmgraft.operators.multimodal import image_hist_equalize

    rng = np.random.default_rng(37)
    px = rng.integers(0, 256, (7, 10, 3))
    out = image_hist_equalize(_raw_rows(spark, [px])).collect()[0]
    p = px.astype(np.int64)
    luma = (299 * p[..., 0] + 587 * p[..., 1] + 114 * p[..., 2]) // 1000
    n = luma.size
    import collections

    hist = collections.Counter(luma.reshape(-1).tolist())
    levels = sorted(hist)
    cdf, acc = {}, 0
    for v in levels:
        acc += hist[v]
        cdf[v] = acc
    cdf_min = cdf[levels[0]]
    s = ss = ws = 0
    for y in range(7):
        for x in range(10):
            ev = (cdf[int(luma[y, x])] - cdf_min) * 255 // max(n - cdf_min, 1)
            s += ev
            ss += ev * ev
            ws += ev * (y * 131 + x * 137 + 1)
    assert (out["n_px"], out["sum_eq"], out["ssq_eq"], out["wsum_eq"]) == (n, s, ss, ws)


def test_histeq_stretches_and_degenerates(spark):
    """A two-level image stretches to {0, 255}; a constant image maps to
    all zeros (degenerate guard)."""
    from osmgraft.operators.multimodal import image_hist_equalize

    two = np.zeros((4, 8, 3), np.uint8)
    two[:, 4:] = 200
    const = np.full((4, 8, 3), 77, np.uint8)
    out = {r["image_id"]: r for r in image_hist_equalize(
        _raw_rows(spark, [two, const])).collect()}
    # 16 px at level0 -> (16-16)*255//16 = 0; 16 at level1 -> (32-16)*255//16 = 255
    assert out["t0"]["sum_eq"] == 16 * 255
    assert out["t0"]["ssq_eq"] == 16 * 255 * 255
    assert out["t1"]["sum_eq"] == 0 and out["t1"]["ssq_eq"] == 0
