"""Trajectory analytics: trip segmentation (spatial gaps-and-islands).

A track is (ent, seq, x, y) — an entity's position samples in seq order
(integer chart coordinates, the snap.py/crossings.py plane).  A TRIP is a
maximal run of consecutive samples where each step's Chebyshev distance is
≤ ``jump``; a larger step starts a new trip (signal loss, teleport between
recording sessions — the standard GPS-track preprocessing cut).

Shape: ONE shuffle on entity; lag + running-sum share a single window sort
(Spark plans one Window node over both), then a grouped aggregate with
map-side combine.  All integer comparisons — the trip ids and stats are
exact cross-engine, so the DuckDB twin (same two windows, `sql_trip_
segments`) hash-gates it.  Per-entity data must fit a task (windows are
per-partition-key) — trajectories are bounded per device in practice;
shard seq ranges first if one entity's history exceeds executor memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def trip_segments(track: DataFrame, jump: int) -> DataFrame:
    """(ent, seq, x, y) → one row per trip: (ent, trip, n_pts, seq_start,
    seq_end, min_x, max_x, min_y, max_y); trip = 1-based index of the
    trip within the entity in seq order."""
    w = Window.partitionBy("ent").orderBy("seq")
    step = F.greatest(
        F.abs(F.col("x") - F.lag("x").over(w)),
        F.abs(F.col("y") - F.lag("y").over(w)),
    )
    new_trip = F.when(step.isNull() | (step > jump), 1).otherwise(0)
    run = Window.partitionBy("ent").orderBy("seq").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    g = track.select(
        "ent", "seq", "x", "y", F.sum(new_trip).over(run).alias("trip")
    )
    return g.groupBy("ent", "trip").agg(
        F.count(F.lit(1)).alias("n_pts"),
        F.min("seq").alias("seq_start"),
        F.max("seq").alias("seq_end"),
        F.min("x").alias("min_x"),
        F.max("x").alias("max_x"),
        F.min("y").alias("min_y"),
        F.max("y").alias("max_y"),
    )


def sql_trip_segments(track_cte: str, jump: int) -> str:
    """DuckDB twin over a track CTE body (selects ent, seq, x, y)."""
    return f"""WITH track AS ({track_cte}),
f AS (
  SELECT ent, seq, x, y,
         CASE WHEN lag(x) OVER w IS NULL
                OR greatest(abs(x - lag(x) OVER w), abs(y - lag(y) OVER w))
                   > {jump}
              THEN 1 ELSE 0 END AS nt
  FROM track
  WINDOW w AS (PARTITION BY ent ORDER BY seq)),
g AS (
  SELECT ent, seq, x, y,
         sum(nt) OVER (PARTITION BY ent ORDER BY seq) AS trip
  FROM f)
SELECT ent, trip, count(*) AS n_pts,
       min(seq) AS seq_start, max(seq) AS seq_end,
       min(x) AS min_x, max(x) AS max_x,
       min(y) AS min_y, max(y) AS max_y
FROM g GROUP BY ent, trip"""


def od_matrix(track: DataFrame, jump: int, pitch: int) -> DataFrame:
    """Origin-destination flow matrix — the per-trip composition of
    trip_segments: each trip contributes one flow from the grid cell of its
    FIRST sample to the cell of its LAST sample (cells = floor-div ``pitch``
    over the chart coordinates), aggregated to (o_cx, o_cy, d_cx, d_cy,
    flows) — the standard mobility-analysis rollup.

    Shape: the SAME single ent-shuffle as trip_segments (lag + running sum
    share one window sort), endpoints via min_by/max_by in the trip
    aggregation (no second window), then a map-side-combined flow count.
    All integer."""
    w = Window.partitionBy("ent").orderBy("seq")
    step = F.greatest(
        F.abs(F.col("x") - F.lag("x").over(w)),
        F.abs(F.col("y") - F.lag("y").over(w)),
    )
    new_trip = F.when(step.isNull() | (step > jump), 1).otherwise(0)
    run = Window.partitionBy("ent").orderBy("seq").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    g = track.select(
        "ent", "seq", "x", "y", F.sum(new_trip).over(run).alias("trip")
    )

    def cell(c):
        return ((c - F.pmod(c, F.lit(pitch))) / F.lit(pitch)).cast("long")

    trips = g.groupBy("ent", "trip").agg(
        cell(F.min_by("x", "seq")).alias("o_cx"),
        cell(F.min_by("y", "seq")).alias("o_cy"),
        cell(F.max_by("x", "seq")).alias("d_cx"),
        cell(F.max_by("y", "seq")).alias("d_cy"),
    )
    return trips.groupBy("o_cx", "o_cy", "d_cx", "d_cy").agg(
        F.count(F.lit(1)).alias("flows")
    )


def sql_od_matrix(track_cte: str, jump: int, pitch: int) -> str:
    """DuckDB twin (arg_min/arg_max endpoints, identical floor-div text)."""

    def cell(e: str) -> str:
        return (
            f"CAST((({e}) - ((({e}) % {pitch} + {pitch}) % {pitch})) / {pitch} AS BIGINT)"
        )

    return f"""WITH track AS ({track_cte}),
f AS (
  SELECT ent, seq, x, y,
         CASE WHEN lag(x) OVER w IS NULL
                OR greatest(abs(x - lag(x) OVER w), abs(y - lag(y) OVER w))
                   > {jump}
              THEN 1 ELSE 0 END AS nt
  FROM track
  WINDOW w AS (PARTITION BY ent ORDER BY seq)),
g AS (
  SELECT ent, seq, x, y,
         sum(nt) OVER (PARTITION BY ent ORDER BY seq) AS trip
  FROM f),
trips AS (
  SELECT ent, trip,
         {cell('arg_min(x, seq)')} AS o_cx, {cell('arg_min(y, seq)')} AS o_cy,
         {cell('arg_max(x, seq)')} AS d_cx, {cell('arg_max(y, seq)')} AS d_cy
  FROM g GROUP BY ent, trip)
SELECT o_cx, o_cy, d_cx, d_cy, count(*) AS flows
FROM trips GROUP BY o_cx, o_cy, d_cx, d_cy"""


def stay_points(track: DataFrame, radius: int, min_samples: int) -> DataFrame:
    """Stay-point detection — the dual reading of trip segmentation (Li et
    al. 2008's GPS stay extraction, windowable variant): a STAY is a maximal
    run of consecutive samples whose steps all remain within Chebyshev
    ``radius`` (i.e., exactly a trip under jump = radius) that lasts at
    least ``min_samples`` samples. Output one row per stay with its span
    and the integer bbox center — the canonical 'places visited' extraction
    feeding POI inference.

    Shape: identical single ent-shuffle as trip_segments (this IS
    trip_segments' aggregate with a HAVING and a center projection — the
    composition is deliberate and documented, not hidden)."""
    trips = trip_segments(track, jump=radius)
    return trips.where(F.col("n_pts") >= min_samples).select(
        "ent",
        F.col("trip").alias("stay"),
        "n_pts",
        "seq_start",
        "seq_end",
        F.expr("(min_x + max_x) div 2").alias("center_x"),
        F.expr("(min_y + max_y) div 2").alias("center_y"),
    )


def sql_stay_points(track_cte: str, radius: int, min_samples: int) -> str:
    """DuckDB twin: the trip twin + HAVING + center projection."""
    trips = sql_trip_segments(track_cte, jump=radius)
    return f"""WITH trips AS ({trips})
SELECT ent, trip AS stay, n_pts, seq_start, seq_end,
       CAST(trunc((min_x + max_x) / 2.0) AS BIGINT) AS center_x,
       CAST(trunc((min_y + max_y) / 2.0) AS BIGINT) AS center_y
FROM trips WHERE n_pts >= {min_samples}"""
