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
