"""Rendezvous hashing (operators/sharding.py): minimal-movement law,
uniformity, engine parity."""

import numpy as np


def test_hrw_minimal_movement_law(spark):
    """Growing B -> B+1 moves a key ONLY to the new bucket, never sideways."""
    from pyspark.sql import functions as F

    from osmgraft.operators.sharding import hrw_bucket

    df = spark.range(20_000).select(
        hrw_bucket(F.col("id"), 12).alias("b12"),
        hrw_bucket(F.col("id"), 13).alias("b13"),
    )
    pdf = df.toPandas()
    moved = pdf[pdf.b12 != pdf.b13]
    assert (moved.b13 == 12).all(), "sideways move breaks the HRW law"
    # expected move fraction 1/13 ~ 7.7%; allow generous band
    frac = len(moved) / len(pdf)
    assert 0.05 < frac < 0.11, frac
    # uniformity at B=13: each bucket within 3x sqrt-band of the mean
    counts = pdf.b13.value_counts()
    assert len(counts) == 13
    mean = len(pdf) / 13
    assert (np.abs(counts.to_numpy() - mean) < 4 * np.sqrt(mean)).all()


def test_hrw_engine_parity(spark):
    import duckdb
    import pandas as pd
    from pyspark.sql import functions as F

    from osmgraft.operators.sharding import hrw_bucket, sql_hrw_bucket

    keys = list(range(0, 5000, 7))
    got = (
        spark.createDataFrame([(k,) for k in keys], "k long")
        .select(hrw_bucket(F.col("k"), 9).alias("b"))
        .toPandas()["b"]
        .to_numpy()
    )
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"k": keys}))
    duck = np.array(
        [r[0] for r in con.execute(
            f"SELECT {sql_hrw_bucket('k', 9)} FROM t"
        ).fetchall()]
    )
    assert (got == duck).all()


def test_hrw_bounds():
    import pytest
    from pyspark.sql import functions as F

    from osmgraft.operators.sharding import hrw_bucket, sql_hrw_bucket

    with pytest.raises(ValueError):
        hrw_bucket(F.lit(1), 65)
    with pytest.raises(ValueError):
        sql_hrw_bucket("k", 0)
