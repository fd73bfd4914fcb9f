"""Streaming parity tests (SURVEY.md §2.10): the streaming plans must agree
with their batch equivalents on a drained (availableNow) source — the
stream/batch-parity discipline replaces osmio's read→write roundtrip equality
for the incremental path."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from osmgraft.streaming import (
    EVENTS_SCHEMA,
    read_stream,
    run_available_now,
    sessionize,
    stream_tile_counts,
    windowed_event_counts,
)
from osmgraft.synth import points_from_orders

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("events_src"))
    spark.read.parquet(f"{SF_DIR}/events.parquet").coalesce(2).write.mode(
        "overwrite"
    ).parquet(d)
    return d


def test_stream_tile_counts_matches_batch(spark, tmp_path, events_dir):
    pts_dir = str(tmp_path / "pts")
    points_from_orders(spark, SF_DIR).write.parquet(pts_dir)

    stream = read_stream(spark, pts_dir, "point_id long, lat7 int, lon7 int")
    got = run_available_now(
        stream_tile_counts(stream, z=9), str(tmp_path / "ck"), output_mode="complete"
    )

    from osmgraft.functions import tiles

    want = (
        spark.read.parquet(pts_dir)
        .select(
            tiles.tile_x(F.col("lon7"), 9).alias("tx"),
            tiles.tile_y(F.col("lat7"), 9).alias("ty"),
        )
        .groupBy("tx", "ty")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    assert len(got) > 1


def test_windowed_event_counts_matches_batch(spark, tmp_path, events_dir):
    stream = read_stream(spark, events_dir, EVENTS_SCHEMA)
    got = run_available_now(
        windowed_event_counts(stream, window="1 hour", watermark="30 minutes"),
        str(tmp_path / "ck"),
        output_mode="complete",
    )
    want = (
        spark.read.parquet(events_dir)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("w.start").alias("window_start"), "event_type", "cnt")
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    assert len(got) > 1


def test_sessionize_emits_on_timeout(spark, tmp_path, events_dir):
    """ProcessingTimeTimeout sessions: batch 1 loads state; a later batch
    (after the gap has elapsed) fires the timeouts and emits one session row
    per user covering that user's full event span."""
    ck = str(tmp_path / "ck")
    src_dir = str(tmp_path / "src")
    events = spark.read.parquet(events_dir).limit(200).cache()
    events.coalesce(1).write.mode("overwrite").parquet(src_dir)

    out_dir = str(tmp_path / "out")

    def run_once():
        stream = read_stream(spark, src_dir, EVENTS_SCHEMA)
        q = (
            sessionize(stream, gap_minutes=0.01)  # 600 ms gap
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        # an availableNow stateful query with pending processing-time timers
        # does not self-terminate; stop it once it has gone idle
        deadline = time.time() + 120
        while time.time() < deadline and q.isActive:
            if q.recentProgress and q.status["isDataAvailable"] is False:
                break
            time.sleep(0.5)
        time.sleep(1.5)  # allow a final timeout batch to fire
        q.stop()
        q.awaitTermination(60)

    # run 1 ingests events and registers state; timeouts fire in whichever
    # later micro-batch first runs after the gap has elapsed (possibly a
    # trailing batch of run 1), so collect across both runs.
    run_once()
    time.sleep(1.0)  # let the processing-time gap elapse
    # append an empty file so run 2 schedules a new micro-batch
    spark.createDataFrame([], EVENTS_SCHEMA).write.mode("append").parquet(src_dir)
    run_once()

    got = spark.read.parquet(out_dir).collect()
    by_user = {r["user_id"]: r for r in got}
    want = (
        events.groupBy("user_id")
        .agg(
            F.min("ts").alias("lo"),
            F.max("ts").alias("hi"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    assert len(by_user) == len(want)
    for r in want:
        s = by_user[r["user_id"]]
        assert s["session_start"] == r["lo"]
        assert s["session_end"] == r["hi"]
        assert s["n_events"] == r["n"]


def test_stream_image_stats_matches_batch(spark, tmp_path):
    """The graft payload under Structured Streaming: image_stats (mapInArrow
    batched decode) over a file stream, availableNow drain, row-for-row equal
    to the batch plan — the operator is execution-mode-agnostic."""
    from osmgraft.operators.multimodal import image_stats
    from osmgraft.streaming.incremental import read_stream, run_available_now
    from osmgraft.synth import synth_images

    src = str(tmp_path / "imgs")
    imgs = synth_images(spark, 120)
    imgs.write.mode("overwrite").parquet(src)
    static = spark.read.parquet(src)
    batch = {
        (r.image_id, r.sum_r, r.sum_g, r.sum_b, r.phash)
        for r in image_stats(static).collect()
    }
    stream = read_stream(spark, src, static.schema)
    rows = run_available_now(
        image_stats(stream), str(tmp_path / "ckpt"), output_mode="append"
    )
    got = {(r.image_id, r.sum_r, r.sum_g, r.sum_b, r.phash) for r in rows}
    assert got == batch and len(got) == 120


def test_sessionize_batch_gaps_and_islands(spark):
    """Crafted sessions: user 1 has two sessions split by a 31-min gap
    (inclusive-boundary check: exactly 30 min does NOT split); user 2 one
    single-event session."""
    from datetime import datetime, timedelta

    from osmgraft.streaming.incremental import sessionize_batch

    t0 = datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, 1, t0),
        (2, 1, t0 + timedelta(minutes=30)),      # exactly gap: same session
        (3, 1, t0 + timedelta(minutes=61)),      # 31 min after prev: new
        (4, 1, t0 + timedelta(minutes=62)),
        (5, 2, t0 + timedelta(minutes=5)),
    ]
    df = spark.createDataFrame(
        [(eid, uid, ts) for eid, uid, ts in rows],
        "event_id long, user_id long, ts timestamp_ntz",
    )
    got = {
        (r.user_id, r.session_start_us, r.session_end_us, r.n_events)
        for r in sessionize_batch(df, gap_minutes=30).collect()
    }
    import calendar

    us = lambda dt: calendar.timegm(dt.timetuple()) * 1_000_000  # noqa: E731
    want = {
        (1, us(t0), us(t0 + timedelta(minutes=30)), 2),
        (1, us(t0 + timedelta(minutes=61)), us(t0 + timedelta(minutes=62)), 2),
        (2, us(t0 + timedelta(minutes=5)), us(t0 + timedelta(minutes=5)), 1),
    }
    assert got == want


def test_stream_dedup_bounded_state_semantics(spark, tmp_path):
    """Duplicates collapse to exactly one row per key across micro-batch
    boundaries (bounded-state dropDuplicatesWithinWatermark)."""
    from osmgraft.streaming import read_stream, stream_dedup

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ck")
    rows = [
        (1, "2024-01-01 00:00:00", "a"),
        (2, "2024-01-01 00:00:01", "b"),
        (1, "2024-01-01 00:00:02", "dup"),
        (3, "2024-01-01 00:00:03", "c"),
        (2, "2024-01-01 00:00:04", "dup"),
        (1, "2024-01-01 00:00:05", "dup"),
    ]

    def df(batch):
        return spark.createDataFrame(
            batch, "event_id long, ts_s string, tag string"
        ).selectExpr("event_id", "CAST(ts_s AS TIMESTAMP) AS ts", "tag")

    df(rows[:3]).write.mode("overwrite").parquet(src)
    df(rows[3:]).write.mode("append").parquet(src)
    stream = read_stream(spark, src, "event_id long, ts timestamp, tag string")
    out = (
        stream_dedup(stream, ["event_id"])
        .writeStream.format("memory")
        .queryName("t_sdd")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    out.awaitTermination(120)
    rows_out = spark.sql("SELECT * FROM t_sdd").collect()
    # exactly one survivor per key; WHICH copy survives inside a single
    # micro-batch is unspecified (no intra-batch ordering guarantee), so
    # assert the dedup contract, not an arrival order
    assert sorted(r.event_id for r in rows_out) == [1, 2, 3]


def test_stream_interval_join_matches_batch(spark):
    """Stream-stream interval join == the same join run in batch."""
    from pyspark.sql import functions as F

    from osmgraft.streaming import stream_interval_join

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    batch = (
        ev.alias("a")
        .join(
            ev.alias("b"),
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.ts") > F.col("b.ts"))
            & (F.col("a.ts") <= F.col("b.ts") + F.expr("INTERVAL 60 SECONDS")),
        )
        .select(
            F.col("a.user_id").alias("k"),
            F.col("a.event_id").alias("a_id"),
            F.col("b.event_id").alias("b_id"),
        )
    )
    import __spark_entry__ as e

    stream_rows = sorted(
        map(tuple, e.queries()["stream_interval_join_events"](
            spark, "/root/testdata/sf0.001").collect())
    )
    assert stream_rows == sorted(map(tuple, batch.collect()))


def test_stream_cusum_matches_batch(spark, tmp_path):
    """File-per-microbatch replay of the stateful streaming CUSUM ==
    the batch closed form (same drift), including gap decay across
    microbatch boundaries."""
    from osmgraft.operators.stats import cusum_bursts
    from osmgraft.streaming.incremental import stream_cusum

    rows = [("a", t, (t * 13) % 7) for t in range(50, 80) if t % 3 != 0]
    rows += [("a", 90, 25), ("b", 50, 30), ("b", 70, 33)]
    df = spark.createDataFrame(rows, "key string, t long, x long")
    batch = {}
    for k in ("a", "b"):
        sub = [r for r in rows if r[0] == k]
        tot = sum(x for _, _, x in sub)
        span = max(t for _, t, _ in sub) - min(t for _, t, _ in sub) + 1
        batch[k] = -(-tot // span)
    assert batch["a"] == batch["b"]  # shared drift so one stream covers both
    d = batch["a"]
    want = {
        (r["key"], r["t"]): (r["cusum"], r["burst"])
        for r in cusum_bursts(df, "key", "t", "x").collect()
    }

    src = str(tmp_path / "src")
    # three files -> maxFilesPerTrigger=1 forces three stateful microbatches
    for i, chunk in enumerate([rows[:10], rows[10:20], rows[20:]]):
        spark.createDataFrame(
            [(k, t, x, d) for k, t, x in chunk], "key string, t long, x long, d long"
        ).coalesce(1).write.parquet(f"{src}/f{i}")
    stream = (
        spark.readStream.schema("key string, t long, x long, d long")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/f*")
    )
    q = (
        stream_cusum(stream, h_mult=4)
        .writeStream.format("memory")
        .queryName("cusum_mem")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r["key"], r["t"]): (r["cusum"], r["burst"])
        for r in spark.sql("SELECT * FROM cusum_mem").collect()
    }
    assert got == want
    assert any(b for _, b in got.values())  # the planted (90, 25) burst fires


def test_sessionize_window_boundary_semantics(spark, tmp_path):
    """session_window merges INCLUSIVELY (diff == gap still merges) and
    splits only on diff > gap; the crafted fixture puts one user exactly ON
    the 30-min boundary, one just inside, and one 1 us past it, plus a
    sentinel to flush the watermark."""
    import datetime

    from osmgraft.streaming import sessionize_window

    t0 = datetime.datetime(2024, 3, 1, 12, 0, 0)
    gap = datetime.timedelta(minutes=30)
    rows = [
        # user 1: second event exactly gap later -> ONE session (inclusive)
        (10, t0, 1), (11, t0 + gap, 1),
        # user 2: second event 1 us inside the gap -> ONE session
        (20, t0, 2), (21, t0 + gap - datetime.timedelta(microseconds=1), 2),
        # user 3: second event 1 us PAST the gap -> TWO sessions
        (30, t0, 3), (31, t0 + gap + datetime.timedelta(microseconds=1), 3),
    ]
    src = str(tmp_path / "src")
    ck = str(tmp_path / "ck")
    spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long") \
        .write.parquet(os.path.join(src, "b0"))
    for i in range(2):
        spark.createDataFrame(
            [(int(-1 - i), t0 + datetime.timedelta(hours=3, minutes=i), -1)],
            "event_id long, ts timestamp, user_id long",
        ).write.parquet(os.path.join(src, f"b{i + 1}"))
    stream = (
        spark.readStream.schema("event_id long, ts timestamp, user_id long")
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*")
    )
    q = (
        sessionize_window(stream, gap_minutes=30)
        .writeStream.format("memory").queryName("swb").outputMode("append")
        .option("checkpointLocation", ck).trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    out = {r["user_id"]: [] for r in spark.table("swb").collect()}
    for r in spark.table("swb").collect():
        out[r["user_id"]].append((r["session_start_us"], r["session_end_us"], r["n_events"]))
    us0 = int(t0.replace(tzinfo=datetime.timezone.utc).timestamp() * 1_000_000)
    gap_us = 30 * 60 * 1_000_000
    assert out[1] == [(us0, us0 + 2 * gap_us, 2)]
    assert out[2] == [(us0, us0 + gap_us - 1 + gap_us, 2)]
    assert sorted(out[3]) == [
        (us0, us0 + gap_us, 1),
        (us0 + gap_us + 1, us0 + 2 * gap_us + 1, 1),
    ]


def test_incremental_tile_counts_laws(spark):
    """Algebra laws on a crafted feed: create adds, delete removes (tile
    vanishes at zero), modify moves one unit between tiles; empty feed is
    the identity."""
    from osmgraft.streaming import incremental_tile_counts

    base = spark.createDataFrame(
        [(10, 10, 2), (11, 10, 1)], "tx long, ty long, cnt long"
    )
    # tile math: pick lon/lat that land in known z9 tiles via the real kernels
    from osmgraft.functions import tiles as T
    import pyspark.sql.functions as F

    probe = spark.createDataFrame([(0, 0)], "lat7 long, lon7 long").select(
        T.tile_x(F.col("lon7"), 9).alias("tx"), T.tile_y(F.col("lat7"), 9).alias("ty")
    ).first()
    zx, zy = probe["tx"], probe["ty"]  # tile containing (0,0)
    changes = spark.createDataFrame(
        [
            ("create", None, None, 0, 0),           # +1 at (zx, zy)
            ("delete", 0, 0, None, None),           # -1 at (zx, zy) -> net 0
            ("create", None, None, 0, 0),           # +1 at (zx, zy)
        ],
        "op string, old_lat7 int, old_lon7 int, new_lat7 int, new_lon7 int",
    )
    out = {(r["tx"], r["ty"]): r["cnt"]
           for r in incremental_tile_counts(base, changes, z=9).collect()}
    assert out[(10, 10)] == 2 and out[(11, 10)] == 1
    assert out[(zx, zy)] == 1
    empty = spark.createDataFrame(
        [], "op string, old_lat7 int, old_lon7 int, new_lat7 int, new_lon7 int"
    )
    out2 = {(r["tx"], r["ty"]): r["cnt"]
            for r in incremental_tile_counts(base, empty, z=9).collect()}
    assert out2 == {(10, 10): 2, (11, 10): 1}


def test_ivm_join_counts_matches_full_recompute(spark):
    import numpy as np

    from pyspark.sql import functions as F

    from osmgraft.streaming.incremental import ivm_join_counts

    rng = np.random.default_rng(61)
    a = [(int(k), int(g)) for k, g in rng.integers(0, 20, (200, 2))]
    b = [(int(k),) for k in rng.integers(0, 20, 150)]
    a_old = spark.createDataFrame(a[:120], "k long, grp long")
    a_new = spark.createDataFrame(a[120:], "k long, grp long")
    b_old = spark.createDataFrame(b[:90], "k long")
    b_new = spark.createDataFrame(b[90:], "k long")
    inc = {
        r.grp: r.cnt
        for r in ivm_join_counts(a_old, a_new, b_old, b_new, "k", "grp").collect()
    }
    full = {
        r.grp: r.cnt
        for r in a_old.unionByName(a_new)
        .join(spark.createDataFrame(b, "k long"), "k")
        .groupBy("grp")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .collect()
    }
    assert inc == {g: c for g, c in full.items() if c != 0}
