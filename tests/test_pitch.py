"""audio_pitch_lags: brute-force reference, planted-periodicity recovery,
tie rule on constant signals."""

import numpy as np


def _wav_rows(spark, clips):
    from osmgraft.operators.multimodal import encode_wav_pcm16

    rows = [(f"a{i}", bytearray(encode_wav_pcm16(c.astype(np.int16), 16000)))
            for i, c in enumerate(clips)]
    return spark.createDataFrame(rows, "media_id string, bytes binary")


def _brute(pcm, window=256, lag_min=20, lag_max=100):
    pcm = pcm.astype(np.int64)
    k = len(pcm) // window
    m = window - lag_max
    out = {}
    for wi in range(k):
        seg = pcm[wi * window:(wi + 1) * window]
        best = None
        for lag in range(lag_min, lag_max + 1):
            r = int((seg[:m] * seg[lag:lag + m]).sum())
            cand = (r, -lag)
            if best is None or cand > best:
                best = cand
        out[wi] = (-best[1], best[0])
    return out


def test_matches_brute_force(spark):
    from osmgraft.operators.multimodal import audio_pitch_lags

    rng = np.random.RandomState(41)
    clips = [rng.randint(-32768, 32768, 1024), rng.randint(-200, 200, 512)]
    got = {}
    for r in audio_pitch_lags(_wav_rows(spark, clips)).collect():
        got.setdefault(r["media_id"], {})[r["window_idx"]] = (r["best_lag"], r["r_best"])
    for i, c in enumerate(clips):
        assert got[f"a{i}"] == _brute(c), i


def test_planted_period_recovered(spark):
    """A clean period-40 sawtooth must report lag 40 (or its multiple 80 —
    equal r; the tie rule picks the SMALLEST, i.e. 40)."""
    from osmgraft.operators.multimodal import audio_pitch_lags

    t = np.arange(1024)
    saw = ((t % 40) * 800 - 16000)
    got = audio_pitch_lags(_wav_rows(spark, [saw])).collect()
    assert all(r["best_lag"] == 40 for r in got)


def test_constant_signal_smallest_lag(spark):
    """Constant PCM: every lag ties -> lag_min wins."""
    from osmgraft.operators.multimodal import audio_pitch_lags

    const = np.full(512, 1000)
    got = audio_pitch_lags(_wav_rows(spark, [const])).collect()
    assert all(r["best_lag"] == 20 for r in got)
    assert all(r["r_best"] == 1000 * 1000 * 156 for r in got)


# --- audio_zcr_windows -------------------------------------------------------
def test_zcr_matches_brute_force(spark):
    from osmgraft.operators.multimodal import audio_zcr_windows

    rng = np.random.default_rng(17)
    clips = [rng.integers(-32768, 32767, 600), rng.integers(-200, 200, 256)]
    got = {}
    for r in audio_zcr_windows(_wav_rows(spark, clips), window=256).collect():
        got[(r["media_id"], r["window_idx"])] = (r["zcr"], r["abs_sum"])
    for i, c in enumerate(clips):
        pcm = c.astype(np.int64)
        k = len(pcm) // 256
        for wi in range(k):
            seg = pcm[wi * 256:(wi + 1) * 256]
            sgn = seg >= 0
            want = (int((sgn[1:] != sgn[:-1]).sum()), int(np.abs(seg).sum()))
            assert got[(f"a{i}", wi)] == want, (i, wi)


def test_zcr_extremes(spark):
    """A pure alternating signal crosses every sample; a constant positive
    signal never crosses; zero counts as positive (sign convention)."""
    from osmgraft.operators.multimodal import audio_zcr_windows

    alt = np.tile([1000, -1000], 128)          # 255 crossings
    const = np.full(256, 42)                   # 0 crossings
    zero_edge = np.array([0, -1] * 128)        # 0 is positive -> 255 crossings
    out = {r["media_id"]: (r["zcr"], r["abs_sum"]) for r in audio_zcr_windows(
        _wav_rows(spark, [alt, const, zero_edge]), window=256).collect()}
    assert out["a0"] == (255, 256000)
    assert out["a1"] == (0, 42 * 256)
    assert out["a2"] == (255, 128)
