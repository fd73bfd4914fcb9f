"""Z-order clustered writes (operators/cluster.py): measured pruning — a
tile-box predicate must skip most row groups under Z-order and almost none
under a spatially random layout; plus key correctness and read-back equality."""

from pyspark.sql import functions as F

from osmgraft.operators.cluster import (
    pruned_fraction,
    rowgroup_spans,
    zorder_key,
    zorder_write,
)


def test_zorder_key_bit_interleave(spark):
    rows = spark.range(1).select(
        zorder_key(F.lit(0b101), F.lit(0b011)).alias("z"),
        zorder_key(F.lit(0), F.lit(0)).alias("z0"),
        zorder_key(F.lit(1023), F.lit(0)).alias("zx"),
    ).collect()[0]
    # exact check vs a python bit interleave (x even positions, y odd)
    def spread(v):
        out = 0
        for i in range(32):
            out |= ((v >> i) & 1) << (2 * i)
        return out
    assert rows.z == spread(0b101) | (spread(0b011) << 1)
    assert rows.z0 == 0
    assert rows.zx == spread(1023)


def test_zorder_pruning_measured(spark, tmp_path):
    """64x64 tile grid, 40k points: a 6x6 query box must skip >=70% of row
    groups under Z-order while the hash layout skips almost nothing."""
    pts = (
        spark.range(40_000)
        .select(
            (F.hash("id") % 64).alias("hx"),
            (F.hash("id", "id") % 64).alias("hy"),
            F.col("id"),
        )
        .select(
            F.abs("hx").alias("tx"), F.abs("hy").alias("ty"), "id"
        )
    )
    zpath = str(tmp_path / "zorder")
    rpath = str(tmp_path / "random")
    zorder_write(pts, zpath, "tx", "ty", n_files=16)
    pts.repartition(16).write.mode("overwrite").parquet(rpath)

    zs = rowgroup_spans(zpath, "tx", "ty")
    rs = rowgroup_spans(rpath, "tx", "ty")
    assert len(zs) >= 16 and len(rs) >= 16
    boxes = [(0, 5, 0, 5), (30, 35, 30, 35), (58, 63, 10, 15)]
    z_prune = sum(pruned_fraction(zs, *b) for b in boxes) / len(boxes)
    r_prune = sum(pruned_fraction(rs, *b) for b in boxes) / len(boxes)
    assert z_prune >= 0.7, z_prune   # Z-order: most row groups skippable
    assert r_prune <= 0.2, r_prune   # random layout: almost nothing prunes
    # and the clustered copy is the same data
    a = spark.read.parquet(zpath).orderBy("id").collect()
    b = spark.read.parquet(rpath).orderBy("id").collect()
    assert a == b


def test_bucketed_join_eliminates_exchange(spark, tmp_path):
    """Two tables bucketed on the same key/count join with ZERO Exchange
    (the co-located join the 100 TB brief calls for); the same join over
    plain parquet shuffles both sides. Results are identical."""
    from osmgraft.operators.cluster import bucketed_write

    a = spark.range(0, 5000).select(
        F.col("id"), (F.col("id") % 97).alias("va")
    )
    b = spark.range(0, 5000, 2).select(
        F.col("id"), (F.col("id") % 31).alias("vb")
    )
    bucketed_write(a, "og_bkt_a", ["id"], 8, path=str(tmp_path / "a"))
    bucketed_write(b, "og_bkt_b", ["id"], 8, path=str(tmp_path / "b"))
    try:
        # force the merge path (tiny test tables would broadcast otherwise;
        # at the sizes bucketing targets, SMJ is what the planner picks)
        joined = spark.table("og_bkt_a").join(spark.table("og_bkt_b").hint("merge"), "id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan

        a.write.mode("overwrite").parquet(str(tmp_path / "pa"))
        b.write.mode("overwrite").parquet(str(tmp_path / "pb"))
        pa_df = spark.read.parquet(str(tmp_path / "pa"))
        pb_df = spark.read.parquet(str(tmp_path / "pb"))
        plain = pa_df.join(
            pb_df.hint("merge"), "id"
        )
        plain_plan = plain._jdf.queryExecution().executedPlan().toString()
        assert plain_plan.count("Exchange") >= 2

        assert sorted(map(tuple, joined.collect())) == sorted(
            map(tuple, plain.collect())
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS og_bkt_a")
        spark.sql("DROP TABLE IF EXISTS og_bkt_b")
