"""image_colorfulness / audio_clipping_stats: crafted-content classes and
moment references."""

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


def _wav_rows(spark, clips):
    from osmgraft.operators.multimodal import encode_wav_pcm16

    rows = [
        (f"a{i}", bytearray(encode_wav_pcm16(c.astype(np.int16), 16000)))
        for i, c in enumerate(clips)
    ]
    return spark.createDataFrame(rows, "media_id string, bytes binary")


def test_colorfulness_classes_and_moments(spark):
    from osmgraft.operators.multimodal import image_colorfulness

    gray = np.full((12, 16, 3), 120)
    # alternating pure red / pure green columns: maximal rg variance
    loud = np.zeros((12, 16, 3), np.int64)
    loud[:, ::2, 0] = 255
    loud[:, 1::2, 1] = 255
    rows = {r.image_id: r for r in
            image_colorfulness(_raw_rows(spark, [gray, loud])).collect()}
    g, c = rows["t0"], rows["t1"]
    assert g.color_class == "drab" and g.ssq_rg - g.sum_rg**2 // g.n_px == 0
    assert c.color_class == "colorful"
    # moment reference for the loud plane
    rg = loud[..., 0].astype(np.int64) - loud[..., 1]
    yb2 = loud[..., 0] + loud[..., 1] - 2 * loud[..., 2].astype(np.int64)
    assert (c.sum_rg, c.ssq_rg) == (int(rg.sum()), int((rg * rg).sum()))
    assert (c.sum_yb2, c.ssq_yb2) == (int(yb2.sum()), int((yb2 * yb2).sum()))


def test_clipping_classes(spark):
    from osmgraft.operators.multimodal import audio_clipping_stats

    quiet = np.zeros(1024, np.int64) + 50
    hot = np.zeros(1024, np.int64)
    hot[::7] = 32100  # loud peaks but not at the rails
    clipped = np.where(np.arange(1024) % 3 == 0, 32767, 1000)  # 1/3 at rails
    rows = {r.media_id: r for r in audio_clipping_stats(
        _wav_rows(spark, [quiet, hot, clipped])).collect()}
    assert rows["a0"].clip_class == "ok" and rows["a0"].peak == 50
    assert rows["a1"].clip_class == "hot" and rows["a1"].n_clip == 0
    r2 = rows["a2"]
    assert r2.clip_class == "clipped"
    assert r2.n_clip == sum(1 for t in range(1024) if t % 3 == 0)
    assert r2.peak == 32767
    assert r2.dc_sum == int(clipped.sum())
    assert r2.energy == int((clipped.astype(np.int64) ** 2).sum())


def test_blur_metric_classes_and_moments(spark):
    from osmgraft.operators.multimodal import image_blur_metric

    rng = np.random.default_rng(71)
    # smooth gradient -> tiny Laplacian variance; noise -> huge
    smooth = np.zeros((12, 16, 3), np.int64)
    for x in range(16):
        smooth[:, x, :] = 5 + 2 * x
    noisy = rng.integers(0, 256, (12, 16, 3))
    rows = {r.image_id: r for r in
            image_blur_metric(_raw_rows(spark, [smooth, noisy])).collect()}
    b, s = rows["t0"], rows["t1"]
    assert b.blur_class == "blurry"
    # a linear ramp has EXACTLY zero Laplacian response in the interior
    assert b.sum_lap == 0 and b.ssq_lap == 0
    assert s.blur_class == "sharp"
    luma = (299 * noisy[..., 0] + 587 * noisy[..., 1] + 114 * noisy[..., 2]) // 1000
    c = luma[1:-1, 1:-1]
    r = 4 * c - luma[:-2, 1:-1] - luma[2:, 1:-1] - luma[1:-1, :-2] - luma[1:-1, 2:]
    assert (s.sum_lap, s.ssq_lap) == (int(r.sum()), int((r * r).sum()))
