"""Encoded Polyline codec (functions/polyline.py): published vector,
roundtrip, and engine-text equivalence via a Python reference encoder."""

from osmgraft.functions.polyline import decode_polyline


def py_encode(points5: list[tuple[int, int]]) -> str:
    """Reference encoder (textbook form of the published algorithm)."""
    out = []
    prev = (0, 0)
    for p in points5:
        for d in (p[0] - prev[0], p[1] - prev[1]):
            zz = (-2 * d - 1) if d < 0 else 2 * d
            while zz >= 0x20:
                out.append(chr((0x20 | (zz & 0x1F)) + 63))
                zz >>= 5
            out.append(chr(zz + 63))
        prev = p
    return "".join(out)


GOOGLE_POINTS = [(3850000, -12020000), (4070000, -12095000), (4325200, -12645300)]
GOOGLE_ENC = "_p~iF~ps|U_ulLnnqC_mqNvxq`@"  # published example vector


def test_published_google_vector():
    assert py_encode(GOOGLE_POINTS) == GOOGLE_ENC
    assert decode_polyline(GOOGLE_ENC) == GOOGLE_POINTS


def test_roundtrip_sweep():
    pts = [(0, 0)]
    for i in range(500):
        pts.append(
            (
                (i * 48271) % 18_000_001 - 9_000_000,
                (i * 69621) % 36_000_001 - 18_000_000,
            )
        )
    enc = py_encode(pts)
    assert decode_polyline(enc) == pts


def test_sql_texts_match_reference(spark):
    """The engine-neutral chunk/zigzag/round texts (run through Spark's SQL
    engine) must reproduce the reference encoder byte-for-byte, including the
    half-away 1e-7 -> 1e-5 rounding."""
    from pyspark.sql import functions as F

    from osmgraft.functions.polyline import sql_chunks, sql_round_e5, sql_zigzag

    rows = []
    for i in range(400):
        rows.append(
            (
                i,
                (i * 48271 + 17) % 1_800_000_001 - 900_000_000,
                (i * 69621 + 3) % 3_600_000_001 - 1_800_000_000,
            )
        )
    rows += [(1000, 49, -49), (1001, 50, -50), (1002, 151, -151), (1003, 0, 0)]
    df = spark.createDataFrame(rows, "i long, lat7 long, lon7 long")
    out = (
        df.select(
            "i",
            "lat7",
            "lon7",
            F.expr(sql_round_e5("lat7")).alias("lat5"),
            F.expr(sql_round_e5("lon7")).alias("lon5"),
        )
        .withColumn("zlat", F.expr(sql_zigzag("lat5")))
        .withColumn("zlon", F.expr(sql_zigzag("lon5")))
        .withColumn("s", F.expr(f"({sql_chunks('zlat')}) || ({sql_chunks('zlon')})"))
        .collect()
    )
    for r in out:
        # rounding: half away from zero
        def rnd(v):
            return (abs(v) + 50) // 100 * (1 if v >= 0 else -1)

        assert r["lat5"] == rnd(r["lat7"])
        assert r["lon5"] == rnd(r["lon7"])
        # single-point encode (delta from origin) == reference encoder
        assert r["s"] == py_encode([(r["lat5"], r["lon5"])])
