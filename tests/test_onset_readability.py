"""audio_onset_flux (operators/multimodal.py) and doc_readability counters
(functions/text.py): numpy/Fraction references, planted-onset recovery,
published-style readability bands."""

import numpy as np


def _wav_rows(spark, clips):
    from osmgraft.operators.multimodal import encode_wav_pcm16

    rows = [
        (f"a{i}", bytearray(encode_wav_pcm16(c.astype(np.int16), 16000)))
        for i, c in enumerate(clips)
    ]
    return spark.createDataFrame(rows, "media_id string, bytes binary")


def _ref_flux(pcm, bins=(3, 5, 9), window=256, qscale=64):
    karr = np.array(bins, dtype=np.int64)
    tt = np.arange(window, dtype=np.float64)
    ang = 2.0 * np.pi * karr[:, None] * tt[None, :] / float(window)
    cq = np.rint(np.cos(ang) * qscale).astype(np.int64)
    sq = np.rint(np.sin(ang) * qscale).astype(np.int64)
    x = pcm.astype(np.int64).reshape(-1, window)
    re = x @ cq.T
    im = x @ sq.T
    p = re * re + im * im
    flux = [int(p[0].sum())]
    for t in range(1, len(p)):
        flux.append(int(np.maximum(p[t] - p[t - 1], 0).sum()))
    onset = [False] + [
        2 * flux[t] >= 3 * flux[t - 1] and flux[t] > 0 for t in range(1, len(flux))
    ]
    return flux, onset


def test_onset_flux_matches_reference_on_noise(spark):
    from osmgraft.operators.multimodal import audio_onset_flux

    rng = np.random.default_rng(7)
    clips = [rng.integers(-3000, 3000, 1024) for _ in range(5)]
    got = {
        (r.media_id, r.window_idx): (r.flux, r.is_onset)
        for r in audio_onset_flux(_wav_rows(spark, clips)).collect()
    }
    for i, c in enumerate(clips):
        flux, onset = _ref_flux(c)
        for w in range(4):
            assert got[(f"a{i}", w)] == (flux[w], onset[w])


def test_onset_flux_detects_planted_tone_entry(spark):
    from osmgraft.operators.multimodal import audio_onset_flux

    # silence for 2 windows, then a loud bin-5 tone: window 2 must be an onset
    t = np.arange(1024)
    tone = (20000 * np.cos(2 * np.pi * 5 * (t % 256) / 256.0)).astype(np.int64)
    clip = np.where(t < 512, 0, tone)
    rows = audio_onset_flux(_wav_rows(spark, [clip])).collect()
    by_w = {r.window_idx: r for r in rows}
    assert by_w[2].is_onset and by_w[2].flux > 0
    assert not by_w[0].is_onset and by_w[0].flux == 0
    assert not by_w[3].is_onset  # sustained tone: no rectified rise


def test_readability_counters_and_bands(spark):
    from fractions import Fraction

    from pyspark.sql import functions as F

    from osmgraft.functions import text as T

    cases = [
        # (text, words, sentences, syllables)
        ("The cat sat. The dog ran!", 6, 2, 6),
        ("Incomprehensibility notwithstanding, proceed.", 3, 1, 14),
        ("", 0, 1, 0),
        ("Hey you. Go now. Do it!", 6, 3, 6),
    ]
    df = spark.createDataFrame([(c[0],) for c in cases], "text string")
    rows = df.select(
        T.word_count(F.col("text")).alias("w"),
        T.sentence_count(F.col("text")).alias("s"),
        T.syllable_count(F.col("text")).alias("y"),
    ).collect()
    for (txt, w, s, y), r in zip(cases, rows):
        assert (r.w, r.s, r.y) == (w, s, y), txt
        if w:
            fre = (
                Fraction(206835, 1000)
                - Fraction(1015, 1000) * Fraction(w, s)
                - Fraction(84600, 1000) * Fraction(y, w)
            )
            num = 206835 * s * w - 1015 * w * w - 84600 * y * s
            den = 1000 * s * w
            assert Fraction(num, den) == fre
    # short mono-syllabic sentences score "very easy" (FRE > 90)
    w, s, y = 6, 3, 6
    assert 206835 * s * w - 1015 * w * w - 84600 * y * s >= 90 * 1000 * s * w
