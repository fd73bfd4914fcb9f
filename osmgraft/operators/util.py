"""Operator-level plumbing helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_parallelism(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Repartition ONLY when the plan has fewer partitions than the cluster has
    cores (single-file local inputs). On a real multi-TB table the scan already
    yields ≥thousands of splits and this is a no-op — we never blind-shuffle a
    big input; round-robin repartition here exists to keep CPU-heavy Arrow
    kernels parallel on tiny test inputs and for the sandbox scaling proxy."""
    spark = df.sparkSession
    if min_parts is None:
        min_parts = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < min_parts:
        return df.repartition(min_parts)
    return df
