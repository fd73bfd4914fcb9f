"""Streaming operators: incremental tile maintenance, watermarked windows,
custom stateful sessionization.

Design notes for 100 TB / 1000 executors:

* Source = a directory (or Iceberg table) receiving appended files; the
  ``availableNow`` trigger drains everything present and stops — the
  idiomatic "process this snapshot increment as a batch job" mode, matching
  the reference's OSC apply-diff batch semantics (osmio osc/mod.rs:31-91).
* All hot-path expressions are JVM-side (tile math is closed-form integer
  arithmetic — osmgraft.functions.tiles); no per-row Python on streams.
* State sizing: a windowed tile-count query keeps one row of state per
  (window, tile) — bounded by the watermark horizon, not by input size.
  Sessionization state is per user id, dropped on timeout.
"""

from __future__ import annotations

import os
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from osmgraft.functions import tiles
from osmgraft.functions.timestamps import ntz_micros

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_stream(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """File-source stream over a directory of parquet files. With an Iceberg
    runtime this becomes ``spark.readStream.format("iceberg")`` — same plan."""
    return spark.readStream.schema(schema).parquet(path)


def stream_tile_counts(points_stream: DataFrame, z: int = 13) -> DataFrame:
    """Incremental per-tile point counts over a stream of (lat7, lon7) rows.

    Pure JVM expressions → streaming hash aggregation; state = one row per
    tile seen. Complete/update-mode sink decides materialization.
    """
    return (
        points_stream.select(
            tiles.tile_x(F.col("lon7"), z).alias("tx"),
            tiles.tile_y(F.col("lat7"), z).alias("ty"),
        )
        .groupBy("tx", "ty")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def windowed_event_counts(
    events_stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Event-time tumbling-window counts per event_type with late-data bound.

    The watermark caps state: windows older than (max event time − watermark)
    are finalized and dropped, so state is O(active windows), input-size-free.
    """
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "cnt",
        )
    )


_SESSION_OUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
    ]
)
_SESSION_STATE = StructType(
    [
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("n", LongType()),
    ]
)


def sessionize(
    events_stream: DataFrame, gap_minutes: float = 30
) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): per-user session
    windows closed after ``gap_minutes`` of inactivity.

    This is the §2.9 "custom operator Spark lacks" escape hatch: state is one
    (start, end, count) triple per active user, emitted when the processing-
    time timeout fires. Batch analogues can't express the timeout semantics.
    """
    gap_ms = int(gap_minutes * 60 * 1000)

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            (start_us, end_us, n) = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(end_us, unit="us")],
                    "n_events": [n],
                }
            )
            return
        lo, hi, n = None, None, 0
        for pdf in pdfs:
            ts = pd.to_datetime(pdf["ts"]).astype("int64") // 1000  # ns → µs
            lo = int(ts.min()) if lo is None else min(lo, int(ts.min()))
            hi = int(ts.max()) if hi is None else max(hi, int(ts.max()))
            n += len(pdf)
        if state.exists:
            (start_us, end_us, n0) = state.get
            lo, hi, n = min(lo, start_us), max(hi, end_us), n + n0
        state.update((lo, hi, n))
        state.setTimeoutDuration(gap_ms)
        return
        yield  # pragma: no cover — makes fn a generator on the emit-less path

    return events_stream.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=_SESSION_OUT,
        stateStructType=_SESSION_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def sessionize_batch(
    events: DataFrame, gap_minutes: float = 30
) -> DataFrame:
    """Batch event-time sessionization (gaps-and-islands): sessions close
    after ``gap_minutes`` of event-time inactivity — the deterministic batch
    analogue of :func:`sessionize` (which keys sessions on processing-time
    timeouts and therefore has no batch twin). Pure JVM window functions:
    lag-diff → new-session flag → running sum → group. One shuffle on
    user_id; integer-microsecond outputs so cross-engine hashes are exact."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    gap_us = int(gap_minutes * 60 * 1_000_000)
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    e = events.select(
        "user_id",
        "event_id",
        # naive micros, session-tz-FREE: the former unix_micros(cast) form
        # assumed a UTC session (true for session.py, NOT for an arbitrary
        # driver harness session — r5 tz probe flipped this gate under
        # America/New_York); ntz_micros equals it bit-for-bit under UTC
        ntz_micros(F.col("ts")).alias("us"),
    )
    prev = F.lag("us").over(w)
    flag = F.when(prev.isNull() | (F.col("us") - prev > gap_us), 1).otherwise(0)
    flagged = e.select("user_id", "event_id", "us", flag.alias("nf"))
    sid = F.sum("nf").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        flagged.select("user_id", "us", sid.alias("sid"))
        .groupBy("user_id", "sid")
        .agg(
            F.min("us").alias("session_start_us"),
            F.max("us").alias("session_end_us"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select("user_id", "session_start_us", "session_end_us", "n_events")
    )


def sql_sessionize_batch(gap_minutes: float = 30, table: str = "events") -> str:
    gap_us = int(gap_minutes * 60 * 1_000_000)
    return f"""
WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM {table}),
f AS (SELECT user_id, event_id, us,
  CASE WHEN lag(us) OVER w IS NULL
         OR us - lag(us) OVER w > {gap_us} THEN 1 ELSE 0 END AS nf
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
s AS (SELECT user_id, us,
  sum(nf) OVER (PARTITION BY user_id ORDER BY us, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM f)
SELECT user_id, min(us) AS session_start_us, max(us) AS session_end_us,
       count(*)::BIGINT AS n_events
FROM s GROUP BY user_id, sid
""".strip()


def run_available_now(
    result: DataFrame,
    checkpoint_dir: str,
    output_mode: str = "complete",
    timeout_sec: float = 300.0,
) -> list:
    """Drain the stream with the availableNow trigger into an in-memory sink
    and return the collected rows — the deterministic 'process the current
    snapshot' execution mode used by tests and the incremental pipeline."""
    name = f"og_mem_{abs(hash(checkpoint_dir)) % 10_000_000}"
    q = (
        result.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", os.path.join(checkpoint_dir, name))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    spark = result.sparkSession
    rows = spark.sql(f"SELECT * FROM {name}").collect()
    return rows


def stream_dedup(events_stream: DataFrame, keys: list[str], watermark: str = "1 hour") -> DataFrame:
    """Streaming deduplication: dropDuplicatesWithinWatermark — state holds
    one entry per key only until the watermark passes it, so state size is
    bounded by the watermark horizon x key arrival rate (the unbounded-state
    trap of plain dropDuplicates on streams is the reason this variant
    exists).  At 10^12-event scale the state store shards by key hash across
    executors like any streaming agg."""
    return events_stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)


def stream_interval_join(
    a: DataFrame,
    b: DataFrame,
    key: str = "user_id",
    interval_seconds: int = 60,
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream inner equi-join with an event-time interval predicate:
    a.ts in (b.ts, b.ts + interval].  Both sides carry watermarks so Spark
    can age out join state (docs: stream-stream joins REQUIRE the time bound
    to bound state; without it the join buffers forever).  Returns
    (key, a_event_id, b_event_id) pairs."""
    from pyspark.sql import functions as F

    aw = a.withWatermark("ts", watermark).select(
        F.col(key).alias("k"), F.col("event_id").alias("a_id"), F.col("ts").alias("a_ts")
    )
    bw = b.withWatermark("ts", watermark).select(
        F.col(key).alias("bk"), F.col("event_id").alias("b_id"), F.col("ts").alias("b_ts")
    )
    return aw.join(
        bw,
        (F.col("k") == F.col("bk"))
        & (F.col("a_ts") > F.col("b_ts"))
        & (F.col("a_ts") <= F.col("b_ts") + F.expr(f"INTERVAL {interval_seconds} SECONDS")),
        "inner",
    ).select("k", "a_id", "b_id")


_CUSUM_OUT = StructType(
    [
        StructField("key", StringType()),
        StructField("t", LongType()),
        StructField("x", LongType()),
        StructField("cusum", LongType()),
        StructField("burst", BooleanType()),
    ]
)
_CUSUM_STATE = StructType(
    [StructField("last_t", LongType()), StructField("c", LongType())]
)


def stream_cusum(counts_stream: DataFrame, h_mult: int = 4) -> DataFrame:
    """Streaming one-sided CUSUM (Page 1954) — the stateful twin of
    operators/stats.cusum_bursts: per key, fold each arriving (t, x) step
    into C = max(0, C_gap + x - d), where the gap first decays the
    statistic by max(0, C - d*gap) (the dense recurrence collapses in
    closed form over missing steps, same algebra the batch operator
    gates).  Input rows carry their key's calibrated integer drift as a
    ``d`` column (a stream can't see total/span ahead of time — real
    deployments join a calibration table on; the hash-gated query derives
    it from the batch pre-pass).  State per key is TWO int64s (last_t, C)
    — bounded by key cardinality, not history; rows at or before last_t
    are late (behind the fold frontier) and are dropped, mirroring
    watermark discard.  Threshold h = h_mult * d.

    Batch/stream agreement is pinned in pytest (file-per-microbatch
    replay == batch closed form) AND in the hash gate (the streaming
    query shares the batch recursive-CTE oracle)."""

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values("t")
        last_t, c = state.get if state.exists else (None, 0)
        out_t, out_x, out_c, out_b = [], [], [], []
        for t, x, d in zip(
            rows["t"].astype("int64"),
            rows["x"].astype("int64"),
            rows["d"].astype("int64"),
        ):
            t, x, d = int(t), int(x), int(d)
            if last_t is not None and t <= last_t:
                continue  # late arrival behind the fold frontier
            gap = 0 if last_t is None else t - last_t - 1
            c = max(0, c - d * gap)
            c = max(0, c + x - d)
            last_t = t
            out_t.append(t); out_x.append(x); out_c.append(c)
            out_b.append(c > h_mult * d)
        if last_t is not None:
            state.update((last_t, c))
        if out_t:
            yield pd.DataFrame(
                {
                    "key": key[0],
                    "t": out_t,
                    "x": out_x,
                    "cusum": out_c,
                    "burst": out_b,
                }
            )

    return counts_stream.groupBy("key").applyInPandasWithState(
        fn,
        outputStructType=_CUSUM_OUT,
        stateStructType=_CUSUM_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def sessionize_window(
    events_stream: DataFrame, gap_minutes: int = 30, watermark_delay: str = "1 hour"
) -> DataFrame:
    """EVENT-TIME streaming sessionization via the built-in session_window
    aggregation (append mode): sessions merge while consecutive events are
    <= gap apart (INCLUSIVE — pinned by test: events exactly gap apart
    merge); window end = last event + gap; a session emits once the
    watermark passes its end.  Unlike :func:`sessionize` (processing-time
    timeouts — inherently wall-clock), this is deterministic and therefore
    batch-twinnable: the gaps-and-islands analogue with a ``> gap``
    new-session rule produces the identical session set.

    State is one (user, open-session) row, aged out by the watermark —
    bounded by active users per gap horizon, the right shape at 100 TB.
    """
    from pyspark.sql import functions as F

    return (
        events_stream.withWatermark("ts", watermark_delay)
        .groupBy("user_id", F.session_window("ts", f"{int(gap_minutes)} minutes"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("session_window.start")).alias("session_start_us"),
            F.unix_micros(F.col("session_window.end")).alias("session_end_us"),
            "n_events",
        )
    )


def sql_sessionize_window(gap_minutes: int = 30, table: str = "events") -> str:
    """DuckDB twin of :func:`sessionize_window`: gaps-and-islands with the
    INCLUSIVE merge rule (new session iff diff > gap) and window end =
    last event + gap — session_window's exact semantics, pinned by
    test_sessionize_window_boundary_semantics."""
    gap_us = int(gap_minutes) * 60 * 1_000_000
    return f"""
WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM {table}),
f AS (SELECT user_id, event_id, us,
  CASE WHEN lag(us) OVER w IS NULL
         OR us - lag(us) OVER w > {gap_us} THEN 1 ELSE 0 END AS nf
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
s AS (SELECT user_id, us,
  sum(nf) OVER (PARTITION BY user_id ORDER BY us, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM f)
SELECT user_id, min(us) AS session_start_us, max(us) + {gap_us} AS session_end_us,
       count(*)::BIGINT AS n_events
FROM s GROUP BY user_id, sid
""".strip()


def incremental_tile_counts(
    base_counts: DataFrame, changes: DataFrame, z: int
) -> DataFrame:
    """Incremental MATERIALIZED-VIEW maintenance for per-tile point counts:
    apply a change feed (op ∈ create/modify/delete with old/new positions —
    the OSC shape, osmio osc/mod.rs) to an existing counts table WITHOUT
    recomputing the base.  delta(tile) = Σ(+1 new-side, −1 old-side);
    merged = base ⟗ delta with zero-count rows dropped — the algebra every
    incremental rollup (Iceberg MERGE, streaming update sink) reduces to.

    Plan: one map-side-combined aggregation over the (small) feed + one
    outer join keyed on the tile — at lake scale the delta is orders of
    magnitude under the base, so Catalyst/AQE broadcast it; the base is
    never rescanned beyond the join."""
    from pyspark.sql import functions as F

    from osmgraft.functions import tiles

    op = F.col("op")
    old_side = changes.filter(op.isin("delete", "modify")).select(
        tiles.tile_x(F.col("old_lon7"), z).alias("tx"),
        tiles.tile_y(F.col("old_lat7"), z).alias("ty"),
        F.lit(-1).alias("d"),
    )
    new_side = changes.filter(op.isin("create", "modify")).select(
        tiles.tile_x(F.col("new_lon7"), z).alias("tx"),
        tiles.tile_y(F.col("new_lat7"), z).alias("ty"),
        F.lit(1).alias("d"),
    )
    delta = old_side.unionAll(new_side).groupBy("tx", "ty").agg(
        F.sum("d").alias("delta")
    )
    merged = base_counts.join(delta, ["tx", "ty"], "full_outer").select(
        "tx",
        "ty",
        (F.coalesce(F.col("cnt"), F.lit(0)) + F.coalesce(F.col("delta"), F.lit(0))).alias("cnt"),
    )
    return merged.filter(F.col("cnt") != 0)


def ivm_join_counts(
    a_old: DataFrame,
    a_delta: DataFrame,
    b_old: DataFrame,
    b_delta: DataFrame,
    key: str,
    group: str,
) -> DataFrame:
    """Incremental view maintenance for an AGGREGATED JOIN with
    INSERT deltas on BOTH sides (the classical delta identity, Blakeley
    et al. SIGMOD 1986 / Koch's ring of databases — the maintenance
    algebra a lakehouse's MERGE-refresh materialized views rely on):

        Δ(A ⋈ B) = ΔA ⋈ B_old  ∪  A_old ⋈ ΔB  ∪  ΔA ⋈ ΔB

    The maintained view is the per-``group`` pair count of A ⋈ B on
    ``key``; the result is built STRICTLY incrementally — the base view
    plus the three delta terms, merged with a full-outer sum — and the
    oracle recomputes the post-update join from scratch: the hash
    equality IS the delta identity.  All counts exact int64.

    100 TB: each delta term is an equi-join whose delta side is small
    (broadcast-able); the merge touches only groups the deltas touch —
    never a full recompute, which is the entire point of IVM."""
    def agg(a: DataFrame, b: DataFrame) -> DataFrame:
        return (
            a.join(b, key)
            .groupBy(group)
            .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        )

    base = agg(a_old, b_old)
    deltas = (
        agg(a_delta, b_old)
        .unionByName(agg(a_old, b_delta))
        .unionByName(agg(a_delta, b_delta))
        .groupBy(group)
        .agg(F.sum("cnt").cast("long").alias("dcnt"))
    )
    merged = base.join(deltas, group, "full_outer").select(
        group,
        (
            F.coalesce(F.col("cnt"), F.lit(0)) + F.coalesce(F.col("dcnt"), F.lit(0))
        )
        .cast("long")
        .alias("cnt"),
    )
    return merged.filter(F.col("cnt") != 0)
