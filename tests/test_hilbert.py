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


# --- bbox → key-range decomposition (two-phase SFC index scan) ---------------


def test_key_py_matches_sql_twin(spark):
    """hilbert_key_py is the driver-side twin of the SQL steps — identical
    output on every cell of the z4 grid."""
    from osmgraft.functions.hilbert import hilbert_key_py

    keys = _grid_keys(spark, 4)
    for (x, y), d in keys.items():
        assert hilbert_key_py(4, x, y) == d


def test_bbox_ranges_exact_cover():
    """Exhaustive at z=5: the decomposed ranges cover EXACTLY the bbox cells'
    keys — no drops, no extras — for aligned, unaligned, degenerate (single
    row/column/cell) and full-grid boxes."""
    from osmgraft.functions.hilbert import hilbert_bbox_ranges, hilbert_key_py

    z, n = 5, 32
    boxes = [
        (0, 31, 0, 31),      # full grid → one range
        (0, 15, 0, 15),      # aligned quadrant → one range
        (3, 17, 5, 29),      # unaligned
        (7, 7, 0, 31),       # single column
        (0, 31, 13, 13),     # single row
        (19, 19, 23, 23),    # single cell
        (1, 30, 1, 30),      # near-full with 1-cell border
    ]
    for x0, x1, y0, y1 in boxes:
        ranges = hilbert_bbox_ranges(z, x0, x1, y0, y1)
        covered = set()
        for lo, hi in ranges:
            covered.update(range(lo, hi + 1))
        want = {
            hilbert_key_py(z, x, y)
            for x in range(x0, x1 + 1)
            for y in range(y0, y1 + 1)
        }
        assert covered == want, (x0, x1, y0, y1)
        # ranges are sorted, disjoint, non-adjacent (maximally merged)
        for (a_lo, a_hi), (b_lo, b_hi) in zip(ranges, ranges[1:]):
            assert a_hi + 1 < b_lo
    assert hilbert_bbox_ranges(z, 0, 31, 0, 31) == [(0, 1023)]


def test_bbox_ranges_count_resolution_independent():
    """The same geographic box decomposes into the SAME number of ranges at
    z=10/14/16 — range count is O(perimeter of the box in its own units),
    not O(grid resolution): deeper zoom only scales the aligned subsquares."""
    from osmgraft.functions.hilbert import hilbert_bbox_ranges

    counts = []
    for z in (10, 14, 16):
        s = 1 << (z - 6)  # the same box in each grid's units
        counts.append(
            len(hilbert_bbox_ranges(z, 3 * s, 17 * s - 1, 5 * s, 29 * s - 1))
        )
    assert counts[0] == counts[1] == counts[2]


def test_bbox_ranges_max_ranges_superset():
    """Coalescing to max_ranges keeps a SUPERSET of the exact cover (the
    residual predicate handles the rest) and respects the cap."""
    from osmgraft.functions.hilbert import hilbert_bbox_ranges

    exact = hilbert_bbox_ranges(6, 3, 41, 5, 52)
    assert len(exact) > 8
    capped = hilbert_bbox_ranges(6, 3, 41, 5, 52, max_ranges=8)
    assert len(capped) == 8
    exact_keys = set()
    for lo, hi in exact:
        exact_keys.update(range(lo, hi + 1))
    capped_keys = set()
    for lo, hi in capped:
        capped_keys.update(range(lo, hi + 1))
    assert exact_keys <= capped_keys


def test_range_scan_matches_plain_bbox_and_prunes(spark, tmp_path):
    """End-to-end two-phase scan over a written Hilbert-clustered table:
    result rows equal the plain bbox filter, the BETWEEN chain reaches the
    parquet scan (PushedFilters on the persisted key), and the row-group
    stats on the 1-D sort key prune most groups — MEASURED from footers."""
    from osmgraft.functions.hilbert import hilbert_bbox_ranges
    from osmgraft.operators.cluster import hilbert_range_scan, hilbert_write

    n = 1 << 7
    df = spark.range(n * n).select(
        F.col("id").alias("point_id"),
        (F.col("id") % n).alias("x"),
        (F.col("id") / n).cast("long").alias("y"),
    )
    path = str(tmp_path / "hk")
    hilbert_write(df, path, "x", "y", 7, n_files=8, keep_key="hkey")
    table = spark.read.parquet(path)
    bbox = (9, 24, 33, 50)
    got = hilbert_range_scan(table, "hkey", "x", "y", 7, bbox, max_ranges=8)
    want = table.filter(
        F.col("x").between(bbox[0], bbox[1]) & F.col("y").between(bbox[2], bbox[3])
    )
    assert sorted(r["point_id"] for r in got.collect()) == sorted(
        r["point_id"] for r in want.collect()
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters:" in plan and "hkey" in plan.split("PushedFilters:")[1]

    # measured row-group pruning on the persisted sort key
    import glob
    import os

    import pyarrow.parquet as pq

    ranges = hilbert_bbox_ranges(7, *bbox, max_ranges=8)
    total = touched = 0
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        names = [md.schema.column(i).name for i in range(md.num_columns)]
        ki = names.index("hkey")
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ki).statistics
            total += 1
            if any(not (st.max < lo or st.min > hi) for lo, hi in ranges):
                touched += 1
    assert total >= 8
    # bbox is ~1.6% of the grid area; sorted-key stats must skip >60% of
    # groups even with the coalesced (superset) ranges
    assert 1.0 - touched / total > 0.6
