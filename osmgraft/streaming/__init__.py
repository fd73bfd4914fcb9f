"""Structured Streaming surface (SURVEY.md §2.10).

The reference's incremental story is batch-encoded OSC diff files
(osmio osc/mod.rs:31-91, :117-239) — there is no true streaming runtime in
it. The Spark-native generalization is Structured Streaming: a change feed
is a file/Iceberg stream, OSC "apply" is a streaming upsert, and the
engine's spatial kernels run unchanged on streaming DataFrames (tile
assignment is pure JVM expressions; PIP joins run inside foreachBatch where
the full batch operator suite is available).
"""

from osmgraft.streaming.incremental import (
    EVENTS_SCHEMA,
    incremental_tile_counts,
    read_stream,
    run_available_now,
    sessionize,
    sessionize_window,
    stream_dedup,
    stream_interval_join,
    stream_tile_counts,
    windowed_event_counts,
)

__all__ = [
    "EVENTS_SCHEMA",
    "incremental_tile_counts",
    "read_stream",
    "run_available_now",
    "sessionize",
    "sessionize_window",
    "stream_dedup",
    "stream_interval_join",
    "stream_tile_counts",
    "windowed_event_counts",
]
