"""latlon_of_key overflow safety (r5): the synthetic geo projection must be
valid to k ≥ 10^12 — the north-rule row scale — and bit-compatible with the
pre-r5 direct form everywhere that form was defined.

The pre-r5 form computed k·2654435761 directly, which overflows int64 at
k ≈ 3.47e9 (ANSI ARITHMETIC_OVERFLOW — surfaced by the round-5 4-billion-row
flagship scale run). The r5 form uses exact modular identities, so for every
k below the old overflow bound the values are IDENTICAL, and beyond it they
are the mathematical continuation (k·A mod B in unbounded integers).
"""

from __future__ import annotations

import duckdb

from osmgraft.synth import (
    _A_LAT,
    _A_LON,
    _B_LAT,
    _B_LON,
    _C_LAT,
    _HOT_SPOTS,
    _JIT,
    latlon_of_key,
    sql_latlon_of_key,
)

# ks below the old overflow bound (3.47e9) AND far beyond it (north-rule 1e12)
SMALL_KS = [1, 2, 5, 97, 12_345, 1_000_000, 2_000_000_000, 3_400_000_000]
HUGE_KS = [4_000_000_000, 10_000_000_000, 999_999_999_937, 10**12, 10**12 + 7]


def py_latlon(k: int) -> tuple[int, int]:
    """Unbounded-integer reference = the pre-r5 formula's mathematical value."""
    if k % 5 == 0:
        spot = _HOT_SPOTS[k % 3]
        lat = spot[0] + ((k * 48271) % _JIT - _JIT // 2)
        lon = spot[1] + ((k * 69621) % _JIT - _JIT // 2)
        return lat, lon
    lat = (k * _A_LAT + _C_LAT) % _B_LAT - _B_LAT // 2
    lon = (k * _A_LON) % _B_LON - _B_LON // 2
    return lat, lon


def test_spark_matches_unbounded_reference_at_all_scales(spark):
    from pyspark.sql import functions as F

    ks = SMALL_KS + HUGE_KS
    df = spark.createDataFrame([(k,) for k in ks], "k long")
    lat, lon = latlon_of_key(F.col("k"))
    got = {
        r["k"]: (r["lat7"], r["lon7"])
        for r in df.select("k", lat.alias("lat7"), lon.alias("lon7")).collect()
    }
    for k in ks:
        assert got[k] == py_latlon(k), k
        la, lo = got[k]
        assert -900_000_000 < la < 900_000_000
        assert -1_800_000_000 <= lo < 1_800_000_000


def test_duckdb_twin_matches_unbounded_reference_at_all_scales():
    con = duckdb.connect()
    lat, lon = sql_latlon_of_key("k")
    ks = SMALL_KS + HUGE_KS
    vals = ", ".join(f"({k})" for k in ks)
    rows = con.execute(
        f"SELECT k, {lat} AS lat7, {lon} AS lon7 FROM (VALUES {vals}) t(k)"
    ).fetchall()
    for k, la, lo in rows:
        assert (la, lo) == py_latlon(k), k
