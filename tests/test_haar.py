"""image_haar_energies: double-loop reference, Parseval-style mass law,
flat-image zeros, odd-dim cropping."""

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
    luma = (299 * p[..., 0] + 587 * p[..., 1] + 114 * p[..., 2]) // 1000

    def level(a):
        h2, w2 = (a.shape[0] // 2) * 2, (a.shape[1] // 2) * 2
        ll = np.zeros((h2 // 2, w2 // 2), np.int64)
        lh, hl, hh = ll.copy(), ll.copy(), ll.copy()
        for by in range(h2 // 2):
            for bx in range(w2 // 2):
                s00, s01 = a[2 * by, 2 * bx], a[2 * by, 2 * bx + 1]
                s10, s11 = a[2 * by + 1, 2 * bx], a[2 * by + 1, 2 * bx + 1]
                ll[by, bx] = s00 + s01 + s10 + s11
                lh[by, bx] = (s00 + s01) - (s10 + s11)
                hl[by, bx] = (s00 - s01) + (s10 - s11)
                hh[by, bx] = (s00 - s01) - (s10 - s11)
        return ll, lh, hl, hh

    ll1, lh1, hl1, hh1 = level(luma)
    ll2, lh2, hl2, hh2 = level(ll1)
    e = lambda c: int((c.astype(object) ** 2).sum())  # noqa: E731
    return (e(lh1), e(hl1), e(hh1), e(lh2), e(hl2), e(hh2), int(ll2.sum()))


def test_matches_reference(spark):
    from osmgraft.operators.multimodal import image_haar_energies

    rng = np.random.RandomState(23)
    imgs = [rng.randint(0, 256, (h, w, 3)) for h, w in [(8, 8), (9, 13), (12, 6)]]
    got = {
        r["image_id"]: tuple(r[c] for c in
                             ("e_lh1", "e_hl1", "e_hh1", "e_lh2", "e_hl2", "e_hh2", "ll2_sum"))
        for r in image_haar_energies(_raw_rows(spark, imgs)).collect()
    }
    for i, px in enumerate(imgs):
        assert got[f"t{i}"] == _ref(px), i


def test_flat_image_zero_details_and_mass(spark):
    from osmgraft.operators.multimodal import image_haar_energies

    px = np.full((8, 8, 3), 33)
    r = image_haar_energies(_raw_rows(spark, [px])).collect()[0]
    assert (r["e_lh1"], r["e_hl1"], r["e_hh1"], r["e_lh2"], r["e_hl2"], r["e_hh2"]) == (0,) * 6
    assert r["ll2_sum"] == 33 * 8 * 8  # LL2 preserves total mass exactly


def test_tiny_image_null(spark):
    from osmgraft.operators.multimodal import image_haar_energies

    px = np.full((3, 3, 3), 5)
    r = image_haar_energies(_raw_rows(spark, [px])).collect()[0]
    assert r["ll2_sum"] is None
