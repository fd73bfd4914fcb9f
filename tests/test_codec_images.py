"""Image codec roundtrip (raw/ppm lossless ⇒ exact), pHash determinism, PSNR,
and the synthesized image table (input_hint schema + caption geo-tag parse-back)."""

import numpy as np
import pytest

from osmgraft.functions.codec import (
    decode_image,
    encode_image,
    hamming64,
    phash64,
    psnr,
    to_gray,
)


def _img(seed, h=16, w=24):
    return np.random.Generator(np.random.Philox(key=seed)).integers(
        0, 256, (h, w, 3), dtype=np.uint8
    )


def test_raw_roundtrip():
    px = _img(1)
    assert (decode_image(encode_image(px, "raw"), 24, 16, "raw") == px).all()


def test_ppm_roundtrip():
    px = _img(2)
    data = encode_image(px, "ppm")
    assert data.startswith(b"P6\n24 16\n255\n")
    assert (decode_image(data, 24, 16, "ppm") == px).all()


def test_png_unsupported_variants_raise():
    """The reader is scoped to 8-bit truecolor: other color types /
    depths raise loudly instead of mis-decoding."""
    import struct
    import zlib

    from osmgraft.functions.codec import _PNG_SIG, _png_chunk, png_decode

    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 6, 0, 0, 0)  # RGBA
    data = (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(b"\x00" * (4 * (1 + 16))))
            + _png_chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="8-bit truecolor"):
        png_decode(data)


def test_psnr():
    px = _img(4)
    assert psnr(px, px) == float("inf")
    noisy = px.astype(np.int64).copy()
    noisy[0, 0, 0] = (noisy[0, 0, 0] + 4) % 256
    assert psnr(px, noisy.astype(np.uint8)) > 40.0


def test_phash_properties():
    px = _img(5, 64, 64)
    h1 = phash64(px)
    assert h1 == phash64(px.copy())  # deterministic
    # small perturbation → small hamming distance
    noisy = np.clip(px.astype(np.int16) + 2, 0, 255).astype(np.uint8)
    assert hamming64(h1, phash64(noisy)) <= 8
    # different image → large distance
    other = _img(999, 64, 64)
    assert hamming64(h1, phash64(other)) >= 16
    assert to_gray(px).shape == (64, 64)


def test_synth_images_table(spark):
    from osmgraft.synth import synth_images

    df = synth_images(spark, 30).cache()
    rows = df.collect()
    assert len(rows) == 30
    from osmgraft.functions.codec import psnr
    from osmgraft.synth import _pixels_for

    lossy_seen = 0
    for i, r in enumerate(rows):
        px = decode_image(bytes(r.bytes), r.w, r.h, r.fmt)
        assert px.shape == (r.h, r.w, 3)
        # per-row invariant (input_hint): caption geo-tag parses back exactly
        latlon = r.caption.split(" at ")[1].split(" of ")[0]
        lat_s, lon_s = latlon.split(",")
        assert round(float(lat_s) * 1e7) == r.lat7
        assert round(float(lon_s) * 1e7) == r.lon7
        assert r.phash == int(phash64(px))
        if r.fmt in ("qdct", "jpeg"):  # lossy: decoded within PSNR>=40 of source
            lossy_seen += 1
            src_px = _pixels_for(i, r.w, r.h)
            assert psnr(src_px, px) >= 40.0
        else:  # lossless: exact
            import numpy as np

            assert np.array_equal(px, _pixels_for(i, r.w, r.h))
    assert lossy_seen > 0
    df.unpersist()


def test_synth_images_partitioning_independent(spark):
    """Same rows regardless of parallelism (pure function of row index)."""
    from osmgraft.synth import synth_images

    a = {(r.image_id, r.phash) for r in synth_images(spark, 20).coalesce(1).collect()}
    b = {(r.image_id, r.phash) for r in synth_images(spark, 20).repartition(8).collect()}
    assert a == b


def test_qdct_lossy_psnr_over_40():
    """input_hint: decoded-pixel PSNR >= 40 dB for lossy fmt — qdct is a real
    lossy transform (quantized blockwise DCT), not a lossless degenerate."""
    import numpy as np

    from osmgraft.functions.codec import decode_image, encode_image, psnr

    rng = np.random.default_rng(11)
    for h, w in [(16, 16), (33, 47), (64, 64)]:
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        data = encode_image(px, "qdct")
        back = decode_image(data, w, h, "qdct")
        assert back.shape == px.shape
        p = psnr(px, back)
        assert 40.0 <= p < float("inf"), p  # lossy but above the bar
        assert not np.array_equal(px, back)  # genuinely lossy on noise


def test_qdct_phash_stable():
    """Perceptual hash survives qdct quantization (near-dup detection works
    across the lossy roundtrip)."""
    import numpy as np

    from osmgraft.functions.codec import decode_image, encode_image, hamming64, phash64

    rng = np.random.default_rng(12)
    px = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    back = decode_image(encode_image(px, "qdct"), 32, 32, "qdct")
    assert hamming64(int(phash64(px)), int(phash64(back))) <= 6


def test_encode_qdct_batch_bit_identical_to_scalar():
    from osmgraft.functions.codec import encode_qdct, encode_qdct_batch

    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, (7, 16, 24, 3), dtype=np.uint8)
    flat, m = encode_qdct_batch(px, q=4)
    for i in range(len(px)):
        assert flat[i * m : (i + 1) * m].tobytes() == encode_qdct(px[i], q=4)


def test_psnr_batch_matches_scalar():
    from osmgraft.functions.codec import psnr, psnr_batch

    rng = np.random.default_rng(12)
    a = rng.integers(0, 256, (4, 8, 8, 3), dtype=np.uint8)
    b = a.copy()
    b[2] = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    b[3, 0, 0, 0] ^= 2
    got = psnr_batch(a, b)
    assert got[0] == np.inf and got[1] == np.inf
    for i in (2, 3):
        assert abs(got[i] - psnr(a[i], b[i])) < 1e-12


def test_roundtrip_fidelity_operator(spark):
    """North-rule per-row invariant: parquet leg exact, qdct transcode leg
    lossy-but-over-40dB, caption equality — and a corrupted row FAILS."""
    import pyspark.sql.functions as F

    from osmgraft.operators.multimodal import roundtrip_fidelity, transcode_qdct
    from osmgraft.synth import synth_images

    imgs = synth_images(spark, 60).cache()
    # identity: everything exact, psnr sentinel, captions equal
    rows = roundtrip_fidelity(imgs, imgs).collect()
    assert len(rows) == 60
    assert all(r.pixels_exact and r.caption_ok and r.psnr_ok for r in rows)
    assert all(r.psnr_cdb == 1_000_000 for r in rows)
    # lossy transcode: nothing exact, everything >= 40 dB (4000 centi-dB)
    src = imgs.filter(F.col("fmt") != "qdct")
    rows = roundtrip_fidelity(src, transcode_qdct(src, q=4)).collect()
    assert len(rows) == src.count() > 0
    assert all(
        (not r.pixels_exact) and r.caption_ok and r.psnr_ok and 4000 <= r.psnr_cdb < 1_000_000
        for r in rows
    )
    # corruption is detected per row: flip one payload byte + alter a caption
    # (row 2 is qdct under the 4-fmt rotation: the flipped tail byte is a real
    # DCT coefficient; a png row's tail byte is only the IEND CRC)
    pdf = imgs.limit(10).toPandas()
    pdf.loc[2, "bytes"] = bytes(pdf.loc[2, "bytes"][:-1]) + bytes(
        [pdf.loc[2, "bytes"][-1] ^ 0xFF]
    )
    pdf.loc[4, "caption"] = pdf.loc[4, "caption"] + "!"
    corrupted = spark.createDataFrame(pdf[["image_id", "bytes", "w", "h", "fmt", "caption"]])
    out = {
        r.image_id: r
        for r in roundtrip_fidelity(imgs.limit(10), corrupted).collect()
    }
    assert len(out) == 10
    bad_px = out[pdf.loc[2, "image_id"]]
    assert not bad_px.pixels_exact and bad_px.psnr_cdb < 1_000_000
    bad_cap = out[pdf.loc[4, "image_id"]]
    assert not bad_cap.caption_ok
    # everything else still clean
    clean = [r for k, r in out.items() if k not in (pdf.loc[2, "image_id"], pdf.loc[4, "image_id"])]
    assert all(r.pixels_exact and r.caption_ok for r in clean)


def test_roundtrip_fidelity_dim_mismatch(spark):
    """Rows whose (w, h) metadata disagree across sides fail without decode."""
    import pyspark.sql.functions as F

    from osmgraft.operators.multimodal import roundtrip_fidelity
    from osmgraft.synth import synth_images

    imgs = synth_images(spark, 6).cache()
    shrunk = imgs.withColumn("w", (F.col("w") / 2).cast("int"))
    rows = roundtrip_fidelity(imgs, shrunk).collect()
    assert len(rows) == 6
    assert all((not r.pixels_exact) and (not r.psnr_ok) and r.caption_ok for r in rows)


def test_image_ops_on_error_null(spark):
    """Corrupt / truncated / null payloads: on_error='null' emits null outputs
    per row instead of failing the job; default stays strict."""
    import pandas as pd
    import pytest

    from osmgraft.operators.multimodal import image_stats, transcode_qdct
    from osmgraft.synth import synth_images

    pdf = synth_images(spark, 9).toPandas()[["image_id", "bytes", "w", "h", "fmt", "caption"]]
    pdf.loc[2, "bytes"] = pdf.loc[2, "bytes"][:-5]          # truncated
    pdf.loc[4, "bytes"] = None                              # null payload
    head = bytearray(pdf.loc[5, "bytes"]); head[0] ^= 0xFF  # broken magic/body
    pdf.loc[5, "bytes"] = bytes(head)
    df = spark.createDataFrame(pdf)

    out = {r.image_id: r for r in image_stats(df, on_error="null").collect()}
    assert len(out) == 9
    bad = {pdf.loc[i, "image_id"] for i in (2, 4)}
    if pdf.loc[5, "fmt"] != "raw":  # raw has no magic; a flipped byte still decodes
        bad.add(pdf.loc[5, "image_id"])
    for iid, r in out.items():
        if iid in bad:
            assert r.sum_r is None and r.phash is None, iid
        else:
            assert r.sum_r is not None and r.phash is not None, iid

    # strict default raises somewhere in the job
    with pytest.raises(Exception):
        image_stats(df).collect()

    # transcode routes corrupt rows to null payloads, preserving ids/captions
    t = {r.image_id: r for r in transcode_qdct(df, on_error="null").collect()}
    assert len(t) == 9
    for iid, r in t.items():
        if iid in bad:
            assert r.bytes is None and r.fmt is None, iid
        else:
            assert r.fmt == "qdct" and r.bytes is not None, iid
    assert all(t[i].caption == pdf.loc[j, "caption"] for j, i in enumerate(pdf.image_id))


def test_roundtrip_fidelity_corrupt_payload(spark):
    """Structurally corrupt or null payloads FAIL fidelity per row — the
    verification operator never crashes on the rows it exists to flag."""
    import pandas as pd

    from osmgraft.operators.multimodal import roundtrip_fidelity
    from osmgraft.synth import synth_images

    imgs = synth_images(spark, 8).cache()
    pdf = imgs.toPandas()[["image_id", "bytes", "w", "h", "fmt", "caption"]]
    pdf.loc[1, "bytes"] = pdf.loc[1, "bytes"][:-7]   # truncated right side
    pdf.loc[3, "bytes"] = None                       # null right side
    right = spark.createDataFrame(pdf)
    out = {r.image_id: r for r in roundtrip_fidelity(imgs, right).collect()}
    assert len(out) == 8
    for j in (1, 3):
        r = out[pdf.loc[j, "image_id"]]
        assert not r.pixels_exact and not r.psnr_ok
    clean = [out[i] for j, i in enumerate(pdf.image_id) if j not in (1, 3)]
    assert all(r.pixels_exact and r.psnr_ok and r.caption_ok for r in clean)


def test_validate_batch_tiny_buffer_and_zero_dims():
    """Review findings: an all-corrupt batch whose flat buffer is shorter than
    a header must mask cleanly (no IndexError), and degenerate w/h metadata is
    invalid (guards downstream chunk-size division)."""
    import numpy as np

    from osmgraft.functions.codec import validate_batch

    buf = np.frombuffer(b"xx", dtype=np.uint8)
    for fmt in ("raw", "ppm", "qdct"):
        m = validate_batch(buf, np.array([0, 2]), np.array([2, 2]), 16, 16, fmt)
        assert not m.any(), fmt
    # zero-dim metadata never validates, even with a matching empty payload
    m = validate_batch(buf, np.array([0]), np.array([0]), 0, 0, "raw")
    assert not m.any()


def test_image_stats_on_error_null_zero_dims(spark):
    """w=0/h=0 metadata rows null out instead of dividing the chunk step by
    zero (on_error='null')."""
    from osmgraft.operators.multimodal import image_stats

    df = spark.createDataFrame(
        [("a", b"", 0, 0, "raw"), ("b", b"\x01\x02\x03", 1, 1, "raw")],
        "image_id string, bytes binary, w int, h int, fmt string",
    )
    out = {r.image_id: r for r in image_stats(df, on_error="null").collect()}
    assert out["a"].sum_r is None
    assert (out["b"].sum_r, out["b"].sum_g, out["b"].sum_b) == (1, 2, 3)


# --- png (round 3: real pure-python codec, RFC 2083) ---------------------------
def test_png_roundtrip_exact():
    import numpy as np

    from osmgraft.functions.codec import decode_image, encode_image

    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
    data = encode_image(px, "png")
    assert data.startswith(b"\x89PNG\r\n\x1a\n")
    assert (decode_image(data, 64, 48, "png") == px).all()


def test_png_decodes_all_five_filters():
    """Reader must reconstruct spec filters 0-4, not just the writer's 0 —
    verified against a naive per-pixel reference filterer."""
    import struct
    import zlib

    import numpy as np

    from osmgraft.functions.codec import _PNG_SIG, _png_chunk, png_decode

    rng = np.random.default_rng(11)
    h, w = 13, 17
    px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa <= pb and pa <= pc:
            return a
        return b if pb <= pc else c

    raw = bytearray()
    prev = np.zeros((w, 3), dtype=np.int32)
    for y in range(h):
        f = y % 5
        raw.append(f)
        cur = px[y].astype(np.int32)
        line = np.zeros((w, 3), dtype=np.int32)
        for x in range(w):
            left = cur[x - 1] if x else np.zeros(3, np.int32)
            up = prev[x]
            ul = prev[x - 1] if x else np.zeros(3, np.int32)
            if f == 0:
                pred = np.zeros(3, np.int32)
            elif f == 1:
                pred = left
            elif f == 2:
                pred = up
            elif f == 3:
                pred = (left + up) // 2
            else:
                pred = np.array([paeth(int(left[c]), int(up[c]), int(ul[c]))
                                 for c in range(3)])
            line[x] = (cur[x] - pred) & 0xFF
        raw.extend(line.astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    data = (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _png_chunk(b"IEND", b""))
    assert (png_decode(data) == px).all()


def test_png_batch_and_corruption_routing(spark):
    """decode_batch png path + on_error='null': signature-valid but
    zlib-truncated payloads route to null instead of killing the job."""
    import numpy as np

    from osmgraft.functions.codec import encode_image
    from osmgraft.operators.multimodal import image_stats

    rng = np.random.default_rng(5)
    rows = []
    pix = {}
    for i in range(6):
        px = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
        data = encode_image(px, "png")
        if i == 3:
            data = data[: len(data) // 2]  # truncated mid-IDAT
        if i == 5:
            data = b"\x89PNG\r\n\x1a\n" + b"garbage"
        rows.append((f"p{i}", bytearray(data), 16, 16, "png", "c", 0, 0, 0))
        pix[f"p{i}"] = px
    df = spark.createDataFrame(
        rows,
        "image_id string, bytes binary, w int, h int, fmt string, "
        "caption string, phash long, lat7 int, lon7 int",
    )
    out = {r.image_id: r for r in image_stats(df, on_error="null").collect()}
    assert out["p3"].sum_r is None and out["p5"].sum_r is None
    for i in (0, 1, 2, 4):
        r = out[f"p{i}"]
        px = pix[f"p{i}"]
        assert r.sum_r == int(px[:, :, 0].sum())
    import pytest

    with pytest.raises(Exception):
        image_stats(df, on_error="fail").collect()


def test_fmt_rotation_decoupled_from_fixture_cycles(spark):
    """The 25-row phase shift keeps the format rotation independent of the
    hot-spot cycle (idx % 5 == 0) and the near-dup cycle (idx % 50 == 49):
    both row classes must span every format (a plain idx % 5 rotation made
    every hot row 'raw' and every near-dup pair jpeg-vs-png, so the pHash
    near-dup path never saw a lossless duplicate pair)."""
    from osmgraft.synth import synth_images

    rows = synth_images(spark, 500, with_pixels=False).collect()
    all_fmts = {"raw", "ppm", "qdct", "png", "jpeg"}
    dup_fmts = {r.fmt for r in rows if int(r.image_id[3:]) % 50 == 49}
    hot_fmts = {r.fmt for r in rows if int(r.image_id[3:]) % 5 == 0}
    assert dup_fmts == all_fmts
    assert hot_fmts == all_fmts


def test_header_scan_valid_and_corrupt(spark):
    """header_scan: every well-formed fixture row validates; each corruption
    class flips exactly the right flag (JVM-only parse, no decoder run)."""
    import numpy as np

    from osmgraft.functions.codec import encode_image
    from osmgraft.operators.multimodal import header_scan

    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, (32, 16, 3), dtype=np.uint8)
    rows = []
    for fmt in ("raw", "ppm", "png", "qdct", "jpeg"):
        rows.append((f"ok_{fmt}", bytearray(encode_image(px, fmt)), 16, 32, fmt))
    # corruptions
    bad_magic = bytearray(encode_image(px, "png"))
    bad_magic[0] ^= 0xFF
    rows.append(("bad_magic_png", bad_magic, 16, 32, "png"))
    truncated = bytearray(encode_image(px, "raw"))[:-5]
    rows.append(("short_raw", truncated, 16, 32, "raw"))
    wrong_meta = bytearray(encode_image(px, "qdct"))
    rows.append(("meta_qdct", wrong_meta, 8, 32, "qdct"))  # declared w lies
    no_eoi = bytearray(encode_image(px, "jpeg"))[:-2]
    rows.append(("no_eoi_jpeg", no_eoi, 16, 32, "jpeg"))
    df = spark.createDataFrame(
        [(i, bytes(b), w, h, f) for i, b, w, h, f in rows],
        "image_id string, bytes binary, w int, h int, fmt string",
    )
    got = {r["image_id"]: r for r in header_scan(df).collect()}
    for fmt in ("raw", "ppm", "png", "qdct", "jpeg"):
        r = got[f"ok_{fmt}"]
        assert r["magic_ok"] and r["len_ok"] and r["dims_ok"], r
        if fmt == "raw":
            assert r["hdr_w"] is None and r["hdr_h"] is None
        else:
            assert (r["hdr_w"], r["hdr_h"]) == (16, 32), r
    assert not got["bad_magic_png"]["magic_ok"]
    assert got["bad_magic_png"]["dims_ok"]  # IHDR intact, dims still parse
    assert not got["short_raw"]["len_ok"]
    assert not got["meta_qdct"]["dims_ok"]  # header says 16, metadata says 8
    assert not got["meta_qdct"]["len_ok"]
    assert not got["no_eoi_jpeg"]["magic_ok"]
    assert got["no_eoi_jpeg"]["dims_ok"]  # SOF still present


def test_image_patches_grid_and_remainders(spark):
    """35x22 image at patch 16: 3x2 grid with 3px/6px remainders; bytes of
    every patch equal the numpy slice; reassembly is bit-identical."""
    import numpy as np

    from osmgraft.functions.codec import encode_image
    from osmgraft.operators.multimodal import image_patches, unpatchify

    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, (22, 35, 3), dtype=np.uint8)
    df = spark.createDataFrame(
        [("a", encode_image(px, "ppm"), 35, 22, "ppm", "cap")],
        "image_id string, bytes binary, w int, h int, fmt string, caption string",
    )
    rows = image_patches(df, patch=16).collect()
    assert len(rows) == 6
    dims = sorted((r.x0, r.y0, r.pw, r.ph) for r in rows)
    assert dims == [(0, 0, 16, 16), (0, 16, 16, 6), (16, 0, 16, 16),
                    (16, 16, 16, 6), (32, 0, 3, 16), (32, 16, 3, 6)]
    for r in rows:
        want = px[r.y0 : r.y0 + r.ph, r.x0 : r.x0 + r.pw]
        assert bytes(r.bytes) == want.tobytes()
        assert (r.orig_w, r.orig_h, r.fmt, r.caption) == (35, 22, "raw", "cap")
    (back,) = unpatchify(image_patches(df, patch=16)).collect()
    assert bytes(back.bytes) == px.tobytes()
    assert (back.w, back.h, back.fmt, back.caption) == (35, 22, "raw", "cap")


def test_image_patches_corrupt_null_path(spark):
    """on_error='null': corrupt payloads yield a null patch row which
    unpatchify propagates as a null image; missing coverage fails loudly."""
    import numpy as np
    import pytest

    from osmgraft.functions.codec import encode_image
    from osmgraft.operators.multimodal import image_patches, unpatchify

    px = np.zeros((8, 8, 3), np.uint8)
    df = spark.createDataFrame(
        [("ok", encode_image(px, "raw"), 8, 8, "raw", "c"),
         ("bad", b"\x00\x01", 8, 8, "raw", "c")],
        "image_id string, bytes binary, w int, h int, fmt string, caption string",
    )
    pr = image_patches(df, patch=8, on_error="null")
    rows = {r.image_id: r for r in pr.collect()}
    assert rows["bad"].bytes is None and rows["bad"].x0 == -1
    back = {r.image_id: r for r in unpatchify(pr).collect()}
    assert back["bad"].bytes is None
    assert bytes(back["ok"].bytes) == px.tobytes()
    with pytest.raises(Exception, match="cover"):
        unpatchify(
            image_patches(df.filter("image_id = 'ok'"), patch=8).filter("x0 != 0 or y0 = 0")
            .limit(0)
            .unionByName(image_patches(df.filter("image_id = 'ok'"), patch=5).filter("x0 = 0"))
        ).collect()


# --- RLE codec -----------------------------------------------------------------


def test_image_rle_roundtrip_and_laws(spark):
    """Conservation (Σ run_len == h·w), adjacency (consecutive runs differ),
    and exact roundtrip (expanding the runs reproduces the luma plane)."""
    import numpy as np

    from osmgraft.operators.multimodal import image_rle
    from osmgraft.synth import synth_formula_images

    imgs = synth_formula_images(spark, 12)
    runs = {}
    for r in image_rle(imgs).collect():
        runs.setdefault(r["image_id"], []).append(
            (r["run_idx"], r["val"], r["run_len"])
        )
    assert len(runs) == 12
    for i in range(12):
        iid = f"fimg{i:09d}"
        w, h = 16 + (i % 3) * 8, 12 + (i % 2) * 6
        rs = sorted(runs[iid])
        assert [ri for ri, _, _ in rs] == list(range(len(rs)))
        assert sum(rl for _, _, rl in rs) == w * h
        vals = [v for _, v, _ in rs]
        assert all(a != b for a, b in zip(vals, vals[1:]))
        # roundtrip vs the formula luma
        y = np.arange(h)[:, None]
        x = np.arange(w)[None, :]
        base = (i * 37 + y * 11 + x * 7) % 256
        luma = (
            299 * base + 587 * ((i * 37 + y * 11 + x * 7 + 29) % 256)
            + 114 * ((i * 37 + y * 11 + x * 7 + 58) % 256)
        ) // 1000
        expanded = np.concatenate([np.full(rl, v) for _, v, rl in rs])
        assert np.array_equal(expanded, luma.reshape(-1))


def test_image_rle_corrupt_null_row(spark):
    from osmgraft.operators.multimodal import image_rle

    df = spark.createDataFrame(
        [("bad", bytearray(b"\x00\x01"), 4, 4, "ppm")],
        "image_id string, bytes binary, w int, h int, fmt string",
    )
    rows = image_rle(df, on_error="null").collect()
    assert len(rows) == 1 and rows[0]["run_idx"] == -1 and rows[0]["val"] is None


# --- Otsu threshold ---------------------------------------------------------------


def _formula_luma(i):
    import numpy as np

    w, h = 16 + (i % 3) * 8, 12 + (i % 2) * 6
    y = np.arange(h)[:, None]
    x = np.arange(w)[None, :]
    base = i * 37 + y * 11 + x * 7
    return (
        299 * (base % 256) + 587 * ((base + 29) % 256) + 114 * ((base + 58) % 256)
    ) // 1000


def test_image_otsu_vs_naive(spark):
    """Engine Otsu == a from-scratch per-image Python loop over all 255
    candidate thresholds with exact big-int arithmetic (independent of the
    kernel's vectorized cumsum formulation)."""
    from osmgraft.operators.multimodal import image_otsu
    from osmgraft.synth import synth_formula_images

    got = {
        r["image_id"]: (r["otsu_t"], r["score"], r["fg_cnt"])
        for r in image_otsu(synth_formula_images(spark, 10)).collect()
    }
    assert len(got) == 10
    for i in range(10):
        luma = _formula_luma(i).reshape(-1).tolist()
        n, S = len(luma), sum(luma)
        best_t, best_score = -1, -1
        for t in range(255):
            w0 = sum(1 for v in luma if v <= t)
            s0 = sum(v for v in luma if v <= t)
            den = w0 * (n - w0)
            if den == 0:
                continue
            num = s0 * n - S * w0
            score = num * num // den
            if score > best_score:
                best_t, best_score = t, score
        fg = sum(1 for v in luma if v > best_t)
        assert got[f"fimg{i:09d}"] == (best_t, best_score, fg)


def test_image_otsu_constant_and_corrupt(spark):
    """Degenerate constant image -> otsu_t=-1 with null score/fg; corrupt
    payload under on_error='null' -> same marker row shape."""
    from osmgraft.functions.codec import encode_image
    import numpy as np

    from osmgraft.operators.multimodal import image_otsu

    const = encode_image(np.full((4, 4, 3), 77, np.uint8), "ppm")
    df = spark.createDataFrame(
        [
            ("const", bytearray(const), 4, 4, "ppm"),
            ("bad", bytearray(b"\x00"), 4, 4, "ppm"),
        ],
        "image_id string, bytes binary, w int, h int, fmt string",
    )
    rows = {r["image_id"]: r for r in image_otsu(df, on_error="null").collect()}
    assert rows["const"]["otsu_t"] == -1 and rows["const"]["score"] is None
    assert rows["bad"]["otsu_t"] == -1 and rows["bad"]["fg_cnt"] is None


# --- connected components ----------------------------------------------------------


def test_image_cc_vs_bfs(spark):
    """Engine labeling == an independent per-image BFS flood fill; checks
    the exact (comp=min flat index, size) rows including empty-mask
    markers."""
    from collections import deque

    from osmgraft.operators.multimodal import image_cc
    from osmgraft.synth import synth_formula_images

    got = {}
    for r in image_cc(synth_formula_images(spark, 10)).collect():
        got.setdefault(r["image_id"], set()).add((r["comp"], r["size"]))
    assert len(got) == 10
    for i in range(10):
        luma = _formula_luma(i)
        h, w = luma.shape
        mask = luma >= 200
        seen = [[False] * w for _ in range(h)]
        want = set()
        for sy in range(h):
            for sx in range(w):
                if not mask[sy][sx] or seen[sy][sx]:
                    continue
                q, members = deque([(sy, sx)]), []
                seen[sy][sx] = True
                while q:
                    y, x = q.popleft()
                    members.append(y * w + x)
                    for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                        ny, nx = y + dy, x + dx
                        if 0 <= ny < h and 0 <= nx < w and mask[ny][nx] and not seen[ny][nx]:
                            seen[ny][nx] = True
                            q.append((ny, nx))
                want.add((min(members), len(members)))
        if not want:
            want = {(-1, 0)}
        assert got[f"fimg{i:09d}"] == want


def test_image_cc_corrupt_null_row(spark):
    from osmgraft.operators.multimodal import image_cc

    df = spark.createDataFrame(
        [("bad", bytearray(b"\x00\x01"), 4, 4, "ppm")],
        "image_id string, bytes binary, w int, h int, fmt string",
    )
    rows = image_cc(df, on_error="null").collect()
    assert len(rows) == 1 and rows[0]["comp"] == -1 and rows[0]["size"] is None


def test_image_blob_props_vs_bfs(spark):
    """Engine regionprops == an independent BFS flood fill computing size,
    bbox, coordinate sums and 4-neighborhood perimeter per blob."""
    from collections import deque

    from osmgraft.operators.multimodal import image_blob_props
    from osmgraft.synth import synth_formula_images

    got = {}
    for r in image_blob_props(synth_formula_images(spark, 10)).collect():
        got.setdefault(r["image_id"], set()).add(
            (r["comp"], r["size"], r["x0"], r["y0"], r["x1"], r["y1"],
             r["sx"], r["sy"], r["perim"])
        )
    for i in range(10):
        luma = _formula_luma(i)
        h, w = luma.shape
        mask = luma >= 200
        seen = [[False] * w for _ in range(h)]
        want = set()
        for sy_ in range(h):
            for sx_ in range(w):
                if not mask[sy_][sx_] or seen[sy_][sx_]:
                    continue
                q, mem = deque([(sy_, sx_)]), []
                seen[sy_][sx_] = True
                while q:
                    y, x = q.popleft()
                    mem.append((y, x))
                    for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                        ny, nx = y + dy, x + dx
                        if 0 <= ny < h and 0 <= nx < w and mask[ny][nx] and not seen[ny][nx]:
                            seen[ny][nx] = True
                            q.append((ny, nx))
                perim = sum(
                    4 - sum(
                        1
                        for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1))
                        if 0 <= y + dy < h and 0 <= x + dx < w and mask[y + dy][x + dx]
                    )
                    for y, x in mem
                )
                want.add((
                    min(y * w + x for y, x in mem), len(mem),
                    min(x for _, x in mem), min(y for y, _ in mem),
                    max(x for _, x in mem), max(y for y, _ in mem),
                    sum(x for _, x in mem), sum(y for y, _ in mem), perim,
                ))
        if not want:
            want = {(-1, 0, None, None, None, None, None, None, None)}
        assert got[f"fimg{i:09d}"] == want


def test_image_blob_props_corrupt_and_empty(spark):
    from osmgraft.functions.codec import encode_image
    import numpy as np

    from osmgraft.operators.multimodal import image_blob_props

    dark = encode_image(np.zeros((4, 4, 3), np.uint8), "ppm")
    df = spark.createDataFrame(
        [
            ("dark", bytearray(dark), 4, 4, "ppm"),
            ("bad", bytearray(b"\x00"), 4, 4, "ppm"),
        ],
        "image_id string, bytes binary, w int, h int, fmt string",
    )
    rows = {r["image_id"]: r for r in image_blob_props(df, on_error="null").collect()}
    assert rows["dark"]["comp"] == -1 and rows["dark"]["size"] == 0
    assert rows["dark"]["perim"] is None
    assert rows["bad"]["comp"] == -1 and rows["bad"]["size"] is None


# --- template matching ---------------------------------------------------------------


def test_template_match_planted_exact(spark):
    """Plant the template verbatim inside a flat image: SSD must be 0 at
    exactly the planted offset; a second identical plant later in scan
    order must lose the tie."""
    import numpy as np

    from osmgraft.functions.codec import encode_image
    from osmgraft.operators.multimodal import TM_IDX, image_template_match

    t_y = np.arange(5)[:, None]
    t_x = np.arange(5)[None, :]
    base = TM_IDX * 37 + t_y * 11 + t_x * 7
    # per-channel template pixels (the kernel only uses luma, but planting
    # the exact RGB patch forces luma equality too)
    rgb = np.stack([(base + c * 29) % 256 for c in (0, 1, 2)], axis=-1).astype(np.uint8)
    img = np.full((12, 16, 3), 200, np.uint8)
    img[3:8, 4:9] = rgb
    img[6:11, 10:15] = rgb  # second plant, later in scan order
    df = spark.createDataFrame(
        [("p", bytearray(encode_image(img, "ppm")), 16, 12, "ppm")],
        "image_id string, bytes binary, w int, h int, fmt string",
    )
    r = image_template_match(df).collect()[0]
    assert (r["y0"], r["x0"], r["ssd"]) == (3, 4, 0)


def test_template_match_vs_naive(spark):
    """Engine argmin == brute-force python double loop on formula images."""
    import numpy as np

    from osmgraft.operators.multimodal import TM_IDX, image_template_match
    from osmgraft.synth import synth_formula_images

    t_y = np.arange(5)[:, None]
    t_x = np.arange(5)[None, :]
    base = TM_IDX * 37 + t_y * 11 + t_x * 7
    T = (299 * (base % 256) + 587 * ((base + 29) % 256) + 114 * ((base + 58) % 256)) // 1000
    got = {r["image_id"]: (r["y0"], r["x0"], r["ssd"])
           for r in image_template_match(synth_formula_images(spark, 8)).collect()}
    for i in range(8):
        luma = _formula_luma(i)
        h, w = luma.shape
        best = None
        for y0 in range(h - 4):
            for x0 in range(w - 4):
                ssd = int(((luma[y0:y0 + 5, x0:x0 + 5] - T) ** 2).sum())
                key = (ssd, y0 * w + x0)
                if best is None or key < best[0]:
                    best = (key, (y0, x0, ssd))
        assert got[f"fimg{i:09d}"] == best[1]


def test_template_match_too_small_and_corrupt(spark):
    import numpy as np

    from osmgraft.functions.codec import encode_image
    from osmgraft.operators.multimodal import image_template_match

    tiny = encode_image(np.zeros((3, 3, 3), np.uint8), "ppm")
    df = spark.createDataFrame(
        [
            ("tiny", bytearray(tiny), 3, 3, "ppm"),
            ("bad", bytearray(b"\x01"), 8, 8, "ppm"),
        ],
        "image_id string, bytes binary, w int, h int, fmt string",
    )
    rows = {r["image_id"]: r for r in image_template_match(df, on_error="null").collect()}
    assert rows["tiny"]["y0"] == -1 and rows["tiny"]["ssd"] is None
    assert rows["bad"]["y0"] == -1 and rows["bad"]["ssd"] is None


# --- L1 distance transform -----------------------------------------------------------


def test_image_distance_transform_vs_definition(spark):
    """Two-pass separable relaxation == the raw definition (min |dx|+|dy|
    over all foreground pixels), per pixel, on the formula fixtures."""
    from collections import Counter

    from osmgraft.operators.multimodal import image_distance_transform
    from osmgraft.synth import synth_formula_images

    got = {}
    for r in image_distance_transform(synth_formula_images(spark, 8)).collect():
        got.setdefault(r["image_id"], {})[r["d"]] = r["n_px"]
    assert len(got) == 8
    for i in range(8):
        luma = _formula_luma(i)
        h, w = luma.shape
        fg = [(y, x) for y in range(h) for x in range(w) if luma[y][x] >= 200]
        want = Counter(
            min(abs(y - fy) + abs(x - fx) for fy, fx in fg)
            for y in range(h)
            for x in range(w)
        ) if fg else {-1: 0}
        assert got[f"fimg{i:09d}"] == dict(want)


def test_image_distance_transform_markers(spark):
    """All-background image -> (-1, 0) marker; corrupt payload -> (-1, null)
    under on_error='null'; single foreground pixel -> exact L1 cones."""
    import numpy as np

    from osmgraft.functions.codec import encode_image
    from osmgraft.operators.multimodal import image_distance_transform

    black = np.zeros((4, 6, 3), np.uint8)
    one = np.zeros((3, 5, 3), np.uint8)
    one[1, 2] = 255
    df = spark.createDataFrame(
        [
            ("black", bytearray(encode_image(black, "ppm")), 6, 4, "ppm"),
            ("one", bytearray(encode_image(one, "ppm")), 5, 3, "ppm"),
            ("bad", bytearray(b"\x00\x01"), 4, 4, "ppm"),
        ],
        "image_id string, bytes binary, w int, h int, fmt string",
    )
    rows = {}
    for r in image_distance_transform(df, on_error="null").collect():
        rows.setdefault(r["image_id"], {})[r["d"]] = r["n_px"]
    assert rows["black"] == {-1: 0}
    assert rows["bad"] == {-1: None}
    # cone around (1,2) in a 3x5 grid: d -> count
    assert rows["one"] == {0: 1, 1: 4, 2: 6, 3: 4}


# --- gradient orientation rose -------------------------------------------------------


def test_image_gradient_rose_vs_atan2(spark):
    """Integer sector rule == floor(atan2/45°) on every interior gradient;
    per-bin counts and mag² sums match a double-loop reference."""
    import math
    from collections import defaultdict

    from osmgraft.operators.multimodal import image_gradient_rose
    from osmgraft.synth import synth_formula_images

    got = {}
    for r in image_gradient_rose(synth_formula_images(spark, 8)).collect():
        got.setdefault(r["image_id"], {})[r["octant"]] = (r["n_px"], r["mag2_sum"])
    assert len(got) == 8
    for i in range(8):
        luma = _formula_luma(i)
        h, w = luma.shape
        want = defaultdict(lambda: [0, 0])
        for y in range(1, h - 1):
            for x in range(1, w - 1):
                gx = int(luma[y][x + 1]) - int(luma[y][x - 1])
                gy = int(luma[y + 1][x]) - int(luma[y - 1][x])
                if gx == 0 and gy == 0:
                    o = -1
                else:
                    o = int((math.degrees(math.atan2(gy, gx)) % 360.0) // 45)
                want[o][0] += 1
                want[o][1] += gx * gx + gy * gy
        assert got[f"fimg{i:09d}"] == {o: tuple(v) for o, v in want.items()}


def test_image_gradient_rose_planted_and_markers(spark):
    """A pure x-ramp image puts every interior pixel in octant 0; tiny
    images emit the no-interior marker; corrupt payloads null out."""
    import numpy as np

    from osmgraft.functions.codec import encode_image
    from osmgraft.operators.multimodal import image_gradient_rose

    ramp = np.zeros((5, 8, 3), np.uint8)
    ramp[:] = (np.arange(8, dtype=np.uint8) * 10)[None, :, None]
    tiny = np.zeros((2, 2, 3), np.uint8)
    df = spark.createDataFrame(
        [
            ("ramp", bytearray(encode_image(ramp, "ppm")), 8, 5, "ppm"),
            ("tiny", bytearray(encode_image(tiny, "ppm")), 2, 2, "ppm"),
            ("bad", bytearray(b"\x00"), 4, 4, "ppm"),
        ],
        "image_id string, bytes binary, w int, h int, fmt string",
    )
    rows = {}
    for r in image_gradient_rose(df, on_error="null").collect():
        rows.setdefault(r["image_id"], {})[r["octant"]] = (r["n_px"], r["mag2_sum"])
    assert rows["ramp"] == {0: (18, 18 * 400)}  # gx=20, gy=0 at all 3x6 interiors
    assert rows["tiny"] == {-1: (0, 0)}
    assert rows["bad"] == {-1: (None, None)}


# --- integer Hough dominant line -----------------------------------------------------


def test_image_hough_vs_reference(spark):
    """Kernel argmax == a double-loop vote + shared tie rule on the formula
    fixtures."""
    from collections import Counter

    from osmgraft.operators.multimodal import HOUGH_DIRS, image_hough_argmax
    from osmgraft.synth import synth_formula_images

    got = {
        r["image_id"]: (r["dir"], r["rho"], r["votes"])
        for r in image_hough_argmax(synth_formula_images(spark, 8)).collect()
    }
    assert len(got) == 8
    for i in range(8):
        luma = _formula_luma(i)
        h, w = luma.shape
        votes = Counter()
        for y in range(h):
            for x in range(w):
                if luma[y][x] >= 200:
                    for d, (a, b) in enumerate(HOUGH_DIRS):
                        votes[(d, a * x + b * y)] += 1
        if votes:
            want = min(votes.items(), key=lambda kv: (-kv[1], kv[0]))
            assert got[f"fimg{i:09d}"] == (*want[0], want[1])
        else:
            assert got[f"fimg{i:09d}"] == (-1, 0, 0)


def test_image_hough_planted_line_and_markers(spark):
    """A planted y=x diagonal of bright pixels wins with direction (-1, 1)
    and rho 0; black image -> no-fg marker; corrupt -> nulls."""
    import numpy as np

    from osmgraft.functions.codec import encode_image
    from osmgraft.operators.multimodal import HOUGH_DIRS, image_hough_argmax

    img = np.zeros((10, 10, 3), np.uint8)
    for t in range(10):
        img[t, t] = 255
    black = np.zeros((4, 4, 3), np.uint8)
    df = spark.createDataFrame(
        [
            ("diag", bytearray(encode_image(img, "ppm")), 10, 10, "ppm"),
            ("black", bytearray(encode_image(black, "ppm")), 4, 4, "ppm"),
            ("bad", bytearray(b"\x00"), 4, 4, "ppm"),
        ],
        "image_id string, bytes binary, w int, h int, fmt string",
    )
    rows = {
        r["image_id"]: (r["dir"], r["rho"], r["votes"])
        for r in image_hough_argmax(df, on_error="null").collect()
    }
    assert rows["diag"] == (HOUGH_DIRS.index((-1, 1)), 0, 10)
    assert rows["black"] == (-1, 0, 0)
    assert rows["bad"] == (-1, None, None)


# --- Harris corners ------------------------------------------------------------------


def test_image_harris_vs_naive(spark):
    """Engine Harris == a from-scratch per-pixel Python triple loop (pure
    int arithmetic, independent of the vectorized shifted-window sums)."""
    from osmgraft.operators.multimodal import image_harris
    from osmgraft.synth import synth_formula_images

    got = {
        r["image_id"]: (r["cy"], r["cx"], r["r20"], r["n_pos"])
        for r in image_harris(synth_formula_images(spark, 8)).collect()
    }
    assert len(got) == 8
    for i in range(8):
        luma = _formula_luma(i)
        h, w = luma.shape
        gx = [[int(luma[y][x + 1]) - int(luma[y][x - 1]) for x in range(1, w - 1)]
              for y in range(1, h - 1)]
        gy = [[int(luma[y + 1][x]) - int(luma[y - 1][x]) for x in range(1, w - 1)]
              for y in range(1, h - 1)]
        gh, gw = h - 2, w - 2
        best = None
        n_pos = 0
        for yy in range(1, gh - 1):
            for xx in range(1, gw - 1):
                sxx = syy = sxy = 0
                for dy in (-1, 0, 1):
                    for dx in (-1, 0, 1):
                        a, b = gx[yy + dy][xx + dx], gy[yy + dy][xx + dx]
                        sxx += a * a
                        syy += b * b
                        sxy += a * b
                r20 = 20 * (sxx * syy - sxy * sxy) - (sxx + syy) * (sxx + syy)
                if r20 > 0:
                    n_pos += 1
                # gradient index g maps to original pixel y = g + 1
                key = (r20, -(yy + 1), -(xx + 1))
                if best is None or key > best[0]:
                    best = (key, yy + 1, xx + 1, r20)
        assert got[f"fimg{i:09d}"] == (best[1], best[2], best[3], n_pos)


def test_image_harris_small_and_corrupt(spark):
    from osmgraft.functions.codec import encode_image
    import numpy as np

    from osmgraft.operators.multimodal import image_harris

    tiny = encode_image(np.zeros((4, 4, 3), np.uint8), "ppm")
    df = spark.createDataFrame(
        [
            ("tiny", bytearray(tiny), 4, 4, "ppm"),
            ("bad", bytearray(b"\x00"), 4, 4, "ppm"),
        ],
        "image_id string, bytes binary, w int, h int, fmt string",
    )
    rows = {r["image_id"]: r for r in image_harris(df, on_error="null").collect()}
    assert (rows["tiny"]["cy"], rows["tiny"]["cx"], rows["tiny"]["r20"],
            rows["tiny"]["n_pos"]) == (-1, -1, 0, 0)
    assert rows["bad"]["r20"] is None and rows["bad"]["cy"] is None


def test_image_ssim_identity_and_bounds(spark):
    """SSIM(x, x) == 1 exactly (num1·num2 == den1·den2); distinct images
    land strictly inside (-1, 1); factor algebra matches a naive float
    SSIM to 1e-9."""
    import numpy as np

    from osmgraft.functions.codec import encode_image
    from osmgraft.operators.multimodal import image_ssim_global

    rng = np.random.default_rng(3)
    im1 = rng.integers(0, 256, (8, 8, 3)).astype(np.uint8)
    im2 = rng.integers(0, 256, (8, 8, 3)).astype(np.uint8)
    rows = [
        (1, bytearray(encode_image(im1, "ppm")), bytearray(encode_image(im1, "ppm")), 8, 8, "ppm"),
        (2, bytearray(encode_image(im1, "ppm")), bytearray(encode_image(im2, "ppm")), 8, 8, "ppm"),
    ]
    df = spark.createDataFrame(
        rows, "pair_id long, a_bytes binary, b_bytes binary, w int, h int, fmt string"
    )
    out = {r["pair_id"]: r for r in image_ssim_global(df).collect()}
    r1 = out[1]
    assert r1["num1"] * r1["num2"] == r1["den1"] * r1["den2"]
    r2 = out[2]
    got = (r2["num1"] * r2["num2"]) / (r2["den1"] * r2["den2"])
    assert -1.0 < got < 1.0

    def luma(im):
        p = im.astype(np.int64)
        return (299 * p[..., 0] + 587 * p[..., 1] + 114 * p[..., 2]) // 1000

    la, lb = luma(im1).astype(float), luma(im2).astype(float)
    c1, c2 = 6.5025, 58.5225
    mx, my = la.mean(), lb.mean()
    vx, vy = la.var(), lb.var()
    cov = ((la - mx) * (lb - my)).mean()
    ref = ((2 * mx * my + c1) * (2 * cov + c2)) / ((mx * mx + my * my + c1) * (vx + vy + c2))
    assert abs(got - ref) < 1e-9
