"""TableIO seam proof (VERDICT r4 ask #5): the parquet+manifest story
provably swaps to Iceberg when a runtime is present.

No Iceberg jar ships in this sandbox, so the Iceberg side is exercised
against a MOCK session that records the exact reader/writer calls the seam
would make — snapshot-id options, incremental boundaries, saveAsTable —
while the parquet side runs against the real session and real lineage
manifests. Together they pin the adapter contract: a real cluster needs
only the jar + ``spark.sql.catalog.<name>`` conf (README 'Iceberg on a
real cluster') and zero operator changes.
"""

from __future__ import annotations

import json
import os
from unittest import mock

import pytest

from osmgraft.io import TableIO, has_iceberg


def _iceberg_spark():
    """Mock SparkSession whose conf says an Iceberg catalog is present and
    whose JVM 'finds' the SparkCatalog class."""
    spark = mock.MagicMock()
    spark.sparkContext.getConf().getAll.return_value = [
        ("spark.sql.catalog.ice", "org.apache.iceberg.spark.SparkCatalog"),
    ]
    spark.sql.return_value.collect.return_value = []
    spark._jvm.java.lang.Class.forName.return_value = object()
    return spark


def _plain_spark():
    spark = mock.MagicMock()
    spark.sparkContext.getConf().getAll.return_value = [("spark.app.name", "x")]
    spark.sql.return_value.collect.return_value = []
    return spark


def test_fmt_resolution():
    assert TableIO(_iceberg_spark(), catalog="ice").fmt == "iceberg"
    assert TableIO(_plain_spark()).fmt == "parquet"
    # catalog key present but jar missing → parquet (the class probe gates)
    nojar = _iceberg_spark()
    nojar._jvm.java.lang.Class.forName.side_effect = Exception("no jar")
    assert TableIO(nojar, catalog="ice").fmt == "parquet"


def test_has_iceberg_sees_runtime_conf():
    """A catalog registered AFTER session start (spark.conf.set) must be
    visible — has_iceberg probes SQL `SET`, not just the context conf."""
    spark = _plain_spark()
    row = {"key": "spark.sql.catalog.ice", "value": "..."}
    spark.sql.return_value.collect.return_value = [row]
    spark._jvm.java.lang.Class.forName.return_value = object()
    assert has_iceberg(spark, "ice")


def test_iceberg_snapshot_read_sets_option():
    spark = _iceberg_spark()
    io = TableIO(spark, catalog="ice")
    io.read("ice.db.images", snapshot_id=7712)
    r = spark.read.format
    r.assert_called_once_with("iceberg")
    r.return_value.option.assert_called_once_with("snapshot-id", "7712")
    r.return_value.option.return_value.load.assert_called_once_with("ice.db.images")


def test_iceberg_incremental_read_boundary():
    spark = _iceberg_spark()
    TableIO(spark, catalog="ice").read_increment("ice.db.images", after_snapshot_id=41)
    r = spark.read.format
    r.assert_called_once_with("iceberg")
    r.return_value.option.assert_called_once_with("start-snapshot-id", "41")
    r.return_value.option.return_value.load.assert_called_once_with("ice.db.images")


def test_iceberg_write_saves_table_with_layout():
    spark = _iceberg_spark()
    df = mock.MagicMock()
    TableIO(spark, catalog="ice").write(
        df, "ice.db.tiles", partition_by=["tx"], sort_within=["ty"]
    )
    df.sortWithinPartitions.assert_called_once_with("ty")
    w = df.sortWithinPartitions.return_value.write.mode
    w.assert_called_once_with("overwrite")
    w.return_value.partitionBy.assert_called_once_with("tx")
    fmt = w.return_value.partitionBy.return_value.format
    fmt.assert_called_once_with("iceberg")
    fmt.return_value.saveAsTable.assert_called_once_with("ice.db.tiles")


def test_parquet_snapshot_read_refuses_and_points_at_checkpoint():
    with pytest.raises(ValueError, match="checkpoint"):
        TableIO(_plain_spark()).read("/tmp/x", snapshot_id=1)
    with pytest.raises(ValueError, match="run_incremental"):
        TableIO(_plain_spark()).read_increment("/tmp/x", after_snapshot_id=1)


def test_parquet_seam_snapshots_reads_lineage_manifests(spark, tmp_path):
    """The parquet half of the snapshot contract, on the REAL session: the
    snapshots() metadata table is fed by checkpoint lineage manifests."""
    d = tmp_path / "tbl"
    (d / "_lineage").mkdir(parents=True)
    for i, rows in enumerate([100, 250]):
        (d / "_lineage" / f"b{i}.json").write_text(
            json.dumps(
                {
                    "batch_id": f"b{i}",
                    "input_rows": rows,
                    "output_rows": rows - 1,
                    "wall_sec": 0.5 + i,
                }
            )
        )
    out = TableIO(spark).snapshots(str(d)).orderBy("batch_id").collect()
    assert [(r.batch_id, r.input_rows, r.output_rows) for r in out] == [
        ("b0", 100, 99),
        ("b1", 250, 249),
    ]
