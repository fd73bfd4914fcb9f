"""Open Location Code (functions/olc.py): published vector, Fraction-exact
from-spec reference, three-way engine parity, decode roundtrip, edges."""

import numpy as np
import pytest


def test_olc_published_vector():
    from osmgraft.functions import olc

    got = olc.olc_encode(
        np.array([int(47.365590 * 1e7)]), np.array([int(8.524997 * 1e7)])
    )[0]
    assert got == "8FVC9G8F+6X"


def _ref_encode_exact(lat7: int, lon7: int) -> str:
    """From-spec reference in exact rational arithmetic (Fraction), so cell
    boundaries bin correctly (a float reference mis-bins exact multiples
    of 0.000125 deg)."""
    from fractions import Fraction as Fr

    from osmgraft.functions.olc import ALPHABET

    lat = min(max(Fr(lat7, 10**7), Fr(-90)), Fr(90))
    if lat == 90:
        lat -= Fr(125, 10**6) / 2
    lon = (Fr(lon7, 10**7) + 180) % 360 - 180
    latv, lonv = lat + 90, lon + 180
    code, res = "", Fr(20)
    for k in range(5):
        dlat, dlon = int(latv // res), int(lonv // res)
        code += ALPHABET[dlat] + ALPHABET[dlon]
        latv -= dlat * res
        lonv -= dlon * res
        res /= 20
        if k == 3:
            code += "+"
    return code


def test_olc_matches_exact_reference():
    from osmgraft.functions import olc

    rng = np.random.default_rng(42)
    lat7 = rng.integers(-900_000_000, 900_000_001, 4000)
    lon7 = rng.integers(-1_800_000_000, 1_800_000_001, 4000)
    # force exact-boundary cases into the sample
    lat7[:50] = (lat7[:50] // 1250) * 1250
    lon7[:50] = (lon7[:50] // 1250) * 1250
    got = olc.olc_encode(lat7, lon7)
    for a, b, g in zip(lat7.tolist(), lon7.tolist(), got):
        assert g == _ref_encode_exact(a, b), (a, b)


def test_olc_edges_and_roundtrip():
    from osmgraft.functions import olc

    lat7 = np.array([900_000_000, -900_000_000, 0, 899_999_999])
    lon7 = np.array([1_800_000_000, -1_800_000_000, 0, -1])
    codes = olc.olc_encode(lat7, lon7)
    assert codes[0] == "C2X2X2X2+X2"  # pole clamps into top row
    assert codes[1] == "22222222+22"
    assert codes[0][0] != "X"  # first lat digit must stay < 9
    la, lo = olc.olc_decode_sw(codes)
    # SW corner is <= point < corner + STEP (after clamp/wrap)
    assert (olc.olc_encode(la, lo) == codes).all()
    lat_c = np.minimum(lat7, 900_000_000 - 1)  # pole row clamp
    assert ((lat_c - la) >= 0).all() and ((lat_c - la) < olc.STEP).all()


def test_olc_three_way_parity(spark):
    import duckdb
    import pandas as pd
    from pyspark.sql import functions as F

    from osmgraft.functions import olc

    rng = np.random.default_rng(7)
    lat7 = rng.integers(-900_000_000, 900_000_001, 5000)
    lon7 = rng.integers(-1_800_000_000, 1_800_000_001, 5000)
    want = list(olc.olc_encode(lat7, lon7))
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in zip(lat7, lon7)], "lat7 long, lon7 long"
    )
    got = [
        r[0]
        for r in df.select(olc.olc_col(F.col("lat7"), F.col("lon7"))).collect()
    ]
    assert got == want
    con = duckdb.connect()
    con.register("p", pd.DataFrame({"lat7": lat7, "lon7": lon7}))
    duck = [
        r[0]
        for r in con.execute(
            "SELECT " + olc.sql_olc("lat7", "lon7") + " FROM p"
        ).fetchall()
    ]
    assert duck == want
    # parser twins agree with the numpy decoder
    la, lo = olc.olc_decode_sw(want[:500])
    sw_lat, sw_lon = olc.olc_parse_sw_exprs("olc")
    pdf = (
        spark.createDataFrame([(c,) for c in want[:500]], "olc string")
        .select(sw_lat.alias("a"), sw_lon.alias("b"))
        .toPandas()
    )
    assert (pdf["a"].to_numpy() == la).all() and (pdf["b"].to_numpy() == lo).all()
    dsw = olc.sql_olc_parse_sw("olc")
    con.register("c", pd.DataFrame({"olc": want[:500]}))
    drows = con.execute(
        f"SELECT {dsw[0]}, {dsw[1]} FROM c"
    ).fetchnumpy()
    vals = list(drows.values())
    assert (vals[0] == la).all() and (vals[1] == lo).all()


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.001"])
def test_olc_codes_query_oracle(spark, sf):
    import duckdb

    from osmgraft.queries import REGISTRY
    from tools.verify_oracle import TABLES, table_fingerprint

    fn, sql = REGISTRY["olc_codes"]
    sdf = fn(spark, sf)
    rows = [tuple(r) for r in sdf.collect()]
    con = duckdb.connect()
    import os

    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    orc = con.execute(sql)
    ocols = [d[0] for d in orc.description]
    orows = orc.fetchall()
    assert table_fingerprint(sdf.columns, rows) == table_fingerprint(ocols, orows)
