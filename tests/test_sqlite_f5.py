"""S20 sqlite sink + F5 cross-format timestamp comparison tests."""

from __future__ import annotations

import json
import sqlite3

import pytest
from pyspark.sql import functions as F

from osmgraft.functions.timestamps import ts_compare, ts_equal, ts_to_epoch
from osmgraft.sources.sqlite_sink import (
    changeset_tags_to_sqlite,
    read_sqlite,
    write_sqlite,
    write_sqlite_sharded,
)


# --- S20 ---------------------------------------------------------------------
def test_write_sqlite_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", 1.5, b"\x00\x01", True), (2, "b", -2.0, b"\xff", False)],
        "id long, name string, score double, blob binary, flag boolean",
    )
    p = str(tmp_path / "out.sqlite")
    n = write_sqlite(df, p, table="t", primary_key="id")
    assert n == 2
    conn = sqlite3.connect(p)
    rows = sorted(conn.execute("SELECT id, name, score, blob, flag FROM t"))
    conn.close()
    assert rows == [(1, "a", 1.5, b"\x00\x01", 1), (2, "b", -2.0, b"\xff", 0)]
    # refuses to clobber, exactly like the reference binary's ensure!
    with pytest.raises(FileExistsError):
        write_sqlite(df, p, table="t")
    # read-back helper parity
    back = read_sqlite(spark, p, "t")
    assert back.count() == 2


def test_changeset_tags_to_sqlite_matches_reference_contract(spark, tmp_path):
    """Table name/columns mirror osmio-changeset-tags-to-sqlite.rs:39-47; the
    JSON tag map is deterministic (sorted keys)."""
    from osmgraft.sources.xml_files import read_changesets
    from osmgraft.synth import changesets_fixture_path

    cs = read_changesets(
        spark, changesets_fixture_path(spark, "/root/testdata/sf0.001")
    ).limit(200)
    expected = {r.id: dict(r.tags) for r in cs.select("id", "tags").collect()}
    p = str(tmp_path / "cs.sqlite")
    n = changeset_tags_to_sqlite(cs, p)
    assert n == len(expected) > 0
    conn = sqlite3.connect(p)
    schema = conn.execute(
        "SELECT sql FROM sqlite_master WHERE name='changeset_tags'"
    ).fetchone()[0]
    assert '"id" INTEGER PRIMARY KEY' in schema and '"other_tags" TEXT' in schema
    got = {i: json.loads(t) for i, t in conn.execute("SELECT * FROM changeset_tags")}
    conn.close()
    assert got == expected


def test_write_sqlite_sharded(spark, tmp_path):
    df = spark.range(1000).select(
        F.col("id"), (F.col("id") * 2).alias("v")
    ).repartition(4)
    d = str(tmp_path / "shards")
    res = write_sqlite_sharded(df, d, table="t").collect()
    assert len(res) == 4 and sum(r.rows for r in res) == 1000
    seen = set()
    for r in res:
        conn = sqlite3.connect(r.shard)
        seen.update(i for (i,) in conn.execute("SELECT id FROM t"))
        conn.close()
    assert seen == set(range(1000))


def test_write_sqlite_rejects_unmappable_types(spark, tmp_path):
    df = spark.createDataFrame([(1, [1, 2])], "id long, xs array<bigint>")
    with pytest.raises(ValueError, match="no sqlite mapping"):
        write_sqlite(df, str(tmp_path / "x.sqlite"))


# --- F5 ----------------------------------------------------------------------
def test_ts_compare_cross_format(spark):
    """Mixed-format pairs compare through epoch seconds; same-format pairs
    natively — osmio lib.rs:296-313 (incl. the None propagation)."""
    df = spark.createDataFrame(
        [
            # iso_a, epoch_b, expected sign of compare(iso, epoch)
            ("2017-07-01T12:30:25Z", 1498912225, 0),
            ("2017-07-01T12:30:26Z", 1498912225, 1),
            ("2017-07-01T12:30:24Z", 1498912225, -1),
            (None, 1498912225, None),
        ],
        "iso string, ep long, want int",
    )
    got = df.select(
        "want",
        ts_compare(F.col("iso"), "iso", F.col("ep"), "epoch").alias("cmp"),
        ts_equal(F.col("iso"), "iso", F.col("ep"), "epoch").alias("eq"),
    ).collect()
    for r in got:
        assert r.cmp == r.want
        assert r.eq == (None if r.want is None else r.want == 0)


def test_ts_compare_same_format_lexical(spark):
    """Same-format ISO pairs compare as strings (the reference's first arm) —
    equivalent to chronological for RFC3339 'Z' strings."""
    df = spark.createDataFrame(
        [("2019-01-01T00:00:00Z", "2019-01-01T00:00:01Z")], "a string, b string"
    )
    r = df.select(
        ts_compare(F.col("a"), "iso", F.col("b"), "iso").alias("c"),
        ts_compare(F.col("b"), "iso", F.col("a"), "iso").alias("d"),
        ts_compare(F.col("a"), "iso", F.col("a"), "iso").alias("e"),
    ).collect()[0]
    assert (r.c, r.d, r.e) == (-1, 1, 0)


def test_ts_to_epoch_roundtrip_vs_engine_iso(spark):
    """ts_to_epoch(iso) inverts the engine's own F4 ISO formatting."""
    df = spark.range(50).select(
        (F.lit(1_500_000_000) + F.col("id") * 86_400).alias("ep")
    )
    iso = df.select(
        "ep",
        F.date_format(F.timestamp_seconds("ep"), "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("iso"),
    )
    bad = iso.filter(ts_to_epoch(F.col("iso"), "iso") != F.col("ep")).count()
    assert bad == 0


def test_ts_compare_is_codegen(spark):
    """F5 must stay a JVM expression (no Python UDF in the plan)."""
    df = spark.createDataFrame([("2020-01-01T00:00:00Z", 0)], "iso string, ep long")
    plan = df.select(
        ts_compare(F.col("iso"), "iso", F.col("ep"), "epoch").alias("c")
    )._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_identifier_quoting(spark, tmp_path):
    """Spark-legal but SQL-hostile names (spaces, keywords, quotes) survive."""
    import sqlite3

    from osmgraft.sources.sqlite_sink import write_sqlite

    df = spark.createDataFrame([(1, "x")], ["order", 'has "quote" col'])
    p = str(tmp_path / "q.sqlite")
    assert write_sqlite(df, p, table='odd "table"') == 1
    conn = sqlite3.connect(p)
    rows = conn.execute('SELECT "order", "has ""quote"" col" FROM "odd ""table"""').fetchall()
    conn.close()
    assert rows == [(1, "x")]
