"""brief_descriptors / brief_match_pairs: numpy reference, planted-match
recovery, set semantics."""

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


def _ref_desc_set(p, t=20):
    from osmgraft.operators.multimodal import _BRIEF_PAIRS, _FAST_OFFS

    p = p.astype(np.int64)
    h, w = p.shape[0], p.shape[1]
    luma = (299 * p[..., 0] + 587 * p[..., 1] + 114 * p[..., 2]) // 1000
    out = set()
    for y in range(3, h - 3):
        for x in range(3, w - 3):
            c = luma[y, x]
            bright = dark = 0
            for i, (dy, dx) in enumerate(_FAST_OFFS):
                q = luma[y + dy, x + dx]
                bright |= (q > c + t) << i
                dark |= (q < c - t) << i

            def run9(b):
                acc = b
                for r in range(1, 9):
                    acc &= ((b << r) | (b >> (16 - r))) & 0xFFFF
                return acc != 0

            if not (run9(bright) or run9(dark)):
                continue
            d = 0
            for i, ((uy, ux), (vy, vx)) in enumerate(_BRIEF_PAIRS):
                d |= (luma[y + uy, x + ux] > luma[y + vy, x + vx]) << i
            out.add(d)
    return out


def test_brief_descriptors_match_reference(spark):
    from osmgraft.operators.multimodal import brief_descriptors

    rng = np.random.default_rng(41)
    imgs = [rng.integers(0, 256, (14, 20, 3)) for _ in range(3)]
    rows = brief_descriptors(_raw_rows(spark, imgs)).collect()
    got = {}
    for r in rows:
        got.setdefault(r.image_id, set()).add(r.des)
    for i, px in enumerate(imgs):
        ref = _ref_desc_set(px)
        assert got.get(f"t{i}", set()) == ref, i


def test_brief_match_recovers_planted_duplicate(spark):
    from osmgraft.operators.multimodal import brief_match_pairs

    rng = np.random.default_rng(42)
    a = rng.integers(0, 256, (16, 24, 3))
    dup = a.copy()  # identical content -> identical descriptor set
    other = rng.integers(0, 256, (16, 24, 3))
    rows = brief_match_pairs(
        _raw_rows(spark, [a, dup, other]), min_shared=3
    ).collect()
    pairs = {(r.image_a, r.image_b): r.n_shared for r in rows}
    assert ("t0", "t1") in pairs
    ref = _ref_desc_set(a)
    assert pairs[("t0", "t1")] == len(ref) and len(ref) >= 3
