"""Hilbert-curve key: pinned vectors, bijection + neighbor property, plan
shape, and the measured file-footprint claim vs Z-order."""

import pytest
from pyspark.sql import functions as F

from osmgraft.functions.hilbert import (
    hilbert_sql_steps,
    sql_hilbert_cte_chain,
    with_hilbert_key,
)


def _grid_keys(spark, z):
    n = 1 << z
    df = spark.range(n * n).select(
        (F.col("id") % n).alias("x"), (F.col("id") / n).cast("long").alias("y")
    )
    rows = with_hilbert_key(df, F.col("x"), F.col("y"), z).collect()
    return {(r["x"], r["y"]): r["hkey"] for r in rows}


def test_pinned_vectors_z1_z2(spark):
    """The canonical U-shapes (any published Hilbert reference)."""
    k1 = _grid_keys(spark, 1)
    assert [k1[c] for c in [(0, 0), (0, 1), (1, 1), (1, 0)]] == [0, 1, 2, 3]
    k2 = _grid_keys(spark, 2)
    order = sorted(k2, key=k2.get)
    assert order[:8] == [
        (0, 0), (1, 0), (1, 1), (0, 1), (0, 2), (0, 3), (1, 3), (1, 2),
    ]
    assert order[-1] == (3, 0)


def test_bijection_and_l1_neighbors_z4(spark):
    """All 256 cells get distinct keys 0..255, and consecutive keys are grid
    NEIGHBORS (L1 distance exactly 1) — the locality property Morton lacks."""
    keys = _grid_keys(spark, 4)
    assert sorted(keys.values()) == list(range(256))
    by_d = {d: c for c, d in keys.items()}
    for d in range(255):
        (x0, y0), (x1, y1) = by_d[d], by_d[d + 1]
        assert abs(x0 - x1) + abs(y0 - y1) == 1


def test_single_codegen_stage_no_shuffle(spark):
    df = spark.range(100).select(
        (F.col("id") % 16).alias("x"), (F.col("id") % 16).alias("y")
    )
    plan = (
        with_hilbert_key(df, F.col("x"), F.col("y"), 12)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    # every Project carries codegen id *(1): one fused whole-stage span
    assert "*(1) Project" in plan and "*(2)" not in plan


def test_sql_chain_matches_spark(spark):
    """The DuckDB CTE chain consumes the identical step texts."""
    import duckdb

    duck = duckdb.connect()
    base = (
        "SELECT x * 16 + y AS point_id, x AS hx, y AS hy, CAST(0 AS BIGINT) AS hd "
        "FROM (SELECT r1.i AS x, r2.i AS y FROM range(0,16) r1(i), range(0,16) r2(i))"
    )
    duck_rows = duck.sql(sql_hilbert_cte_chain(4, base)).fetchall()
    keys = _grid_keys(spark, 4)
    for pid, hkey in duck_rows:
        assert keys[(pid // 16, pid % 16)] == hkey


def test_z_bounds():
    with pytest.raises(ValueError):
        hilbert_sql_steps(0)
    with pytest.raises(ValueError):
        hilbert_sql_steps(32)


def test_hilbert_footprint_not_worse_than_zorder(spark, tmp_path):
    """MEASURED layout claim: a small box predicate prunes at least as large
    a fraction of row groups under Hilbert as under a hash-random layout,
    and Hilbert is in the same league as Z-order."""
    from osmgraft.operators.cluster import (
        hilbert_write,
        pruned_fraction,
        rowgroup_spans,
        zorder_write,
    )

    n = 1 << 8
    df = spark.range(n * n).select(
        (F.col("id") % n).alias("x"), (F.col("id") / n).cast("long").alias("y")
    )
    hp, zp, rp = str(tmp_path / "h"), str(tmp_path / "z"), str(tmp_path / "r")
    hilbert_write(df, hp, "x", "y", 8, n_files=16)
    zorder_write(df, zp, "x", "y", n_files=16)
    df.repartition(16).write.mode("overwrite").parquet(rp)
    box = (10, 25, 10, 25)
    ph = pruned_fraction(rowgroup_spans(hp, "x", "y"), *box)
    pz = pruned_fraction(rowgroup_spans(zp, "x", "y"), *box)
    pr = pruned_fraction(rowgroup_spans(rp, "x", "y"), *box)
    assert ph > pr  # beats random layout
    assert ph >= pz - 1e-9  # never worse than Morton on a uniform grid
