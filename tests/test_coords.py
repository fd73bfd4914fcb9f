"""Fixed-point codec tests mirroring the reference's doctests
(osmio lib.rs:93-99,106-110,143-154: 1.23 ↔ 12300000; out-of-range errors)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from osmgraft.functions import coords


def test_np_codec_golden():
    assert coords.np_deg_to_fixed(np.array([1.23]))[0] == 12_300_000
    assert coords.np_deg_to_fixed(np.array([-1.23]))[0] == -12_300_000
    assert coords.np_fixed_to_deg(np.array([12_300_000]))[0] == pytest.approx(1.23)
    # osmio golden node 197801 (opl/test.rs:22-38)
    assert coords.np_deg_to_fixed(np.array([36.0292900]))[0] == 360_292_900
    assert coords.np_deg_to_fixed(np.array([14.2741628]))[0] == 142_741_628


def test_np_codec_half_away_from_zero():
    # Rust f64::round rounds half away from zero (lib.rs:159-164)
    assert coords.np_deg_to_fixed(np.array([0.00000005]))[0] == 1
    assert coords.np_deg_to_fixed(np.array([-0.00000005]))[0] == -1
    assert coords.np_deg_to_fixed(np.array([0.00000015]))[0] == 2


def test_np_roundtrip_exhaustive_sample():
    f = np.arange(-900_000_000, 900_000_001, 77_777_777)
    deg = coords.np_fixed_to_deg(f)
    assert (coords.np_deg_to_fixed(deg) == f).all()


def test_spark_codec_matches_numpy(spark):
    vals = [1.23, -1.23, 0.00000005, -0.00000005, 89.9999999, -89.9999999, 0.0]
    df = spark.createDataFrame([(v,) for v in vals], "deg double").select(
        coords.deg_to_fixed(F.col("deg")).alias("fx")
    )
    got = [r.fx for r in df.collect()]
    want = coords.np_deg_to_fixed(np.array(vals)).tolist()
    assert got == want


def test_spark_range_validation(spark):
    # osmio rejects lat 600.0 (lib.rs:143-154)
    df = spark.createDataFrame([(600.0,), (90.0,), (-91.0,)], "deg double")
    ok = df.select(coords.valid_lat7(coords.deg_to_fixed(F.col("deg"))).alias("v")).collect()
    assert [r.v for r in ok] == [False, True, False]
