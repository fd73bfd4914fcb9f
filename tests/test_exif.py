"""EXIF GPS codec + extraction operator (functions/exif.py, multimodal.exif_gps).

The parser must honor the real TIFF wire format — both byte orders, offset
indirection, decoy segments — and degrade to NULL on anything malformed.
Roundtrip exactness mirrors the reference's fixed-point codec discipline
(osmio lib.rs:159-164: every representable 1e-7-degree value survives)."""

import struct

import pytest

from osmgraft.functions.exif import (
    com_segment,
    gps_app1,
    gps_tiff,
    jpeg_with_gps,
    parse_gps,
    parse_gps_tiff,
    xmp_app1,
)

TEN7 = 10**7


@pytest.mark.parametrize("endian", ["MM", "II"])
@pytest.mark.parametrize(
    "lat7,lon7",
    [
        (0, 0),
        (90 * TEN7, 180 * TEN7),
        (-90 * TEN7, -180 * TEN7),
        (1, -1),
        (9_999_999, -9_999_999),  # just under 1 degree: pure min/sec payload
        (404_052_891, -739_797_031),  # NYC-ish, arbitrary decimals
        (-1, 179_999_9999),
    ],
)
def test_roundtrip_exact(endian, lat7, lon7):
    assert parse_gps(jpeg_with_gps(lat7, lon7, endian)) == (lat7, lon7)


def test_roundtrip_sweep_both_endians():
    # LCG sweep across the full valid range, exact for every value
    for i in range(5000):
        lat7 = (i * 48271 + 11) % (180 * TEN7 + 1) - 90 * TEN7
        lon7 = (i * 69621 + 7) % (360 * TEN7 + 1) - 180 * TEN7
        e = "MM" if i % 2 == 0 else "II"
        assert parse_gps(jpeg_with_gps(lat7, lon7, e)) == (lat7, lon7)


def test_decoy_segments_are_skipped():
    pre = com_segment(b"a comment") + xmp_app1() + com_segment(b"another")
    data = jpeg_with_gps(123, 456, "II", pre)
    assert parse_gps(data) == (123, 456)


def test_memoryview_input():
    mv = memoryview(jpeg_with_gps(5, -5, "MM", xmp_app1()))
    assert parse_gps(mv) == (5, -5)


def test_foreign_rational_shapes_round_half_away():
    # a writer that uses (deg*100, 100) + fractional-minute rationals:
    # 12.3456789 deg as d=(1234,100) m=(56789*60, 10**5 * 60)? keep simpler —
    # decimal-degrees-in-deg-slot: (123456789, 10**7), min=sec=(0,1)
    e = ">"
    u16 = lambda v: struct.pack(e + "H", v)  # noqa: E731
    u32 = lambda v: struct.pack(e + "I", v)  # noqa: E731

    def entry(tag, typ, cnt, val):
        return u16(tag) + u16(typ) + u32(cnt) + val.ljust(4, b"\x00")

    gps_off, lat_off = 8 + 30, 8 + 30 + 66
    lon_off = lat_off + 24
    hdr = b"MM" + u16(42) + u32(8)
    ifd0 = u16(2) + entry(0x0112, 3, 1, u16(1)) + entry(0x8825, 4, 1, u32(gps_off)) + u32(0)
    gps = (
        u16(5)
        + entry(0x0000, 1, 4, bytes([2, 3, 0, 0]))
        + entry(0x0001, 2, 2, b"S\x00")
        + entry(0x0002, 5, 3, u32(lat_off))
        + entry(0x0003, 2, 2, b"W\x00")
        + entry(0x0004, 5, 3, u32(lon_off))
        + u32(0)
    )
    # lat: 12.3456789 deg entirely in the degree rational; sec denominator 3
    # exercises non-terminating thirds (1/3 sec = 0.0000926 deg -> rounds)
    lat_rat = u32(123456789) + u32(TEN7) + u32(0) + u32(1) + u32(0) + u32(1)
    lon_rat = u32(45) + u32(1) + u32(30) + u32(1) + u32(1) + u32(3)
    tiff = hdr + ifd0 + gps + lat_rat + lon_rat
    lat7, lon7 = parse_gps_tiff(tiff)
    assert lat7 == -123456789
    # 45 + 30/60 + (1/3)/3600 deg = 45.500092592... -> half-away -> 455000926
    assert lon7 == -455000926


def test_malformed_inputs_yield_none():
    good = jpeg_with_gps(7, 7)
    cases = [
        None,
        b"",
        b"junk",
        b"\xff\xd8\xff\xd9",  # no APP1
        good[:7],  # truncated mid-segment
        good[:2] + b"\x00" + good[3:],  # broken marker alignment
        b"\xff\xd8" + xmp_app1() + b"\xff\xd9",  # only a non-Exif APP1
    ]
    for c in cases:
        assert parse_gps(c) is None
    # TIFF-level corruption
    t = gps_tiff(1, 2)
    assert parse_gps_tiff(b"XX" + t[2:]) is None  # bad byte order
    assert parse_gps_tiff(t[:20]) is None  # truncated IFD
    bad_magic = t[:2] + struct.pack(">H", 41) + t[4:]
    assert parse_gps_tiff(bad_magic) is None
    # rational with zero denominator
    z = bytearray(t)
    z[-4:] = struct.pack(">I", 0)  # last lon rational denominator
    assert parse_gps_tiff(bytes(z)) is None
    # out-of-range coordinate (91 degrees)
    assert parse_gps_tiff(gps_tiff(91 * TEN7, 0)) is None


def test_metadata_stops_at_sos():
    # GPS APP1 placed after an SOS marker must NOT be found (real extractors
    # never scan entropy-coded data)
    sos = b"\xff\xda" + struct.pack(">H", 4) + b"\x00\x00"
    data = b"\xff\xd8" + sos + gps_app1(1, 2) + b"\xff\xd9"
    assert parse_gps(data) is None


def test_operator_and_fixture(spark):
    from osmgraft.operators.multimodal import exif_gps
    from osmgraft.synth import synth_exif_images

    n = 300
    imgs = synth_exif_images(spark, n)
    out = exif_gps(imgs, passthrough=("lat7", "lon7")).collect()
    assert len(out) == n
    for r in sorted(out, key=lambda r: r["image_id"]):
        idx = int(r["image_id"][3:])
        if idx % 97 == 0:
            assert r["plat7"] is None and r["plon7"] is None
        else:
            assert (r["plat7"], r["plon7"]) == (r["lat7"], r["lon7"]), idx


def test_orientation_roundtrip():
    from osmgraft.functions.exif import jpeg_with_gps, parse_orientation

    for o in range(1, 9):
        for e in ("MM", "II"):
            assert parse_orientation(jpeg_with_gps(1, 2, e, orientation=o)) == o
    assert parse_orientation(b"\xff\xd8\xff\xd9") is None
    import pytest

    with pytest.raises(ValueError):
        jpeg_with_gps(1, 2, orientation=0)


def test_autoorient_normalizes_all_orientations(spark):
    """distort(o) then exif_autoorient == the original pixels, bitwise, for
    every Exif orientation — distortions are the spec-mandated inverses of
    the corrections in _ORIENT_FIX."""
    import numpy as np

    from osmgraft.functions.codec import encode_image
    from osmgraft.functions.exif import jpeg_with_gps
    from osmgraft.operators.multimodal import exif_autoorient

    rng = np.random.Generator(np.random.Philox(key=77))
    base = rng.integers(0, 256, size=(12, 8, 3), dtype=np.uint8)  # h=12, w=8

    def distort(px, o):
        return {
            1: lambda p: p,
            2: lambda p: p[:, ::-1],                      # undone by hflip
            3: lambda p: p[::-1, ::-1],                   # undone by rot180
            4: lambda p: p[::-1, :],                      # undone by vflip
            5: lambda p: np.transpose(p, (1, 0, 2)),      # undone by transpose
            6: lambda p: np.rot90(p, 1),                  # CCW; undone by rot270
            7: lambda p: np.transpose(p, (1, 0, 2))[::-1, ::-1],  # transverse
            8: lambda p: np.rot90(p, 3),                  # CW; undone by rot90
        }[o](px)

    rows = []
    for o in range(1, 9):
        px = np.ascontiguousarray(distort(base, o))
        h, w = px.shape[:2]
        rows.append(
            (
                f"img{o:012d}",
                encode_image(px, "raw"),
                w,
                h,
                "raw",
                f"orientation {o}",
                jpeg_with_gps(5, 5, "MM" if o % 2 else "II", orientation=o),
            )
        )
    # plus a row with no EXIF at all -> identity branch
    rows.append(("img000000000099", encode_image(base, "raw"), 8, 12, "raw", "none", None))
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string, "
        "caption string, exif binary"
    )
    out = {r["image_id"]: r for r in exif_autoorient(df).collect()}
    assert len(out) == 9
    want = base.tobytes()
    for img_id, r in out.items():
        assert (r["w"], r["h"]) == (8, 12), img_id
        assert bytes(r["bytes"]) == want, f"{img_id} pixels differ"
        assert r["fmt"] == "raw"


def test_transverse_is_involution(spark):
    import numpy as np

    from osmgraft.functions.codec import encode_image
    from osmgraft.operators.multimodal import image_augment

    rng = np.random.Generator(np.random.Philox(key=5))
    px = rng.integers(0, 256, size=(6, 10, 3), dtype=np.uint8)
    df = spark.createDataFrame(
        [("a", encode_image(px, "raw"), 10, 6, "raw", "c")],
        "image_id string, bytes binary, w int, h int, fmt string, caption string",
    )
    once = image_augment(df, op="transverse")
    twice = image_augment(once, op="transverse")
    (r,) = twice.collect()
    assert bytes(r["bytes"]) == px.tobytes()
    (r1,) = once.collect()
    assert (r1["w"], r1["h"]) == (6, 10)  # dims swap on the anti-diagonal flip
