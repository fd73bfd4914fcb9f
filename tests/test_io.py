"""TableIO seam tests: parquet-backed behavior in this sandbox; the iceberg
branch activates only when a runtime jar + catalog conf are present (probed,
not assumed)."""

from __future__ import annotations

from pyspark.sql import functions as F

from osmgraft.io import TableIO, has_iceberg
from osmgraft.synth import points_from_orders

SF_DIR = "/root/testdata/sf0.001"


def test_format_resolution_without_iceberg(spark):
    assert has_iceberg(spark) is False
    assert TableIO(spark).fmt == "parquet"


def test_write_read_roundtrip_sorted(spark, tmp_path):
    io = TableIO(spark)
    pts = points_from_orders(spark, SF_DIR)
    out = str(tmp_path / "pts")
    io.write(pts, out, sort_within=["point_id"])
    back = io.read(out)
    assert back.schema == pts.schema
    a = sorted(map(tuple, pts.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b


def test_snapshots_lists_lineage_batches(spark, tmp_path):
    from osmgraft.checkpoint import Checkpointer

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .repartition(4, "o_orderkey")
        .write.parquet(in_dir)
    )
    ck = Checkpointer(out_dir, files_per_batch=2)
    ck.run(spark, in_dir, lambda df: df.select("o_orderkey"))

    snaps = TableIO(spark).snapshots(out_dir).collect()
    assert len(snaps) == 2
    assert sum(r["output_rows"] for r in snaps) == spark.read.parquet(in_dir).count()
