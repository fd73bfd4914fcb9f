"""SparkSession factory with scale-appropriate defaults.

Tuned for a multi-executor cluster (AQE on, skew-join on, modest shuffle
partitions for local testing — override ``spark.sql.shuffle.partitions``
upward on a real cluster). Arrow is enabled for all pandas-UDF kernels.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app: str = "osmgraft", cpus: int | None = None, **extra: str) -> SparkSession:
    """Build (or reuse) a SparkSession.

    cpus: local parallelism (``local[cpus]``); defaults to $SPARK_GRAFT_CPUS or 32.
    On a real cluster pass master via spark-submit instead and these local
    settings are ignored.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    b = (
        SparkSession.builder.appName(app)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # With maxBytesPerBatch short-circuited below, the rows-per-batch cap
        # is the only JVM-side Arrow batch bound. 65536 is right for narrow
        # rows (the PIP/cell kernels want big batches); for binary-heavy
        # tables (image bytes, 12-50KB/row) 65536 rows is a 0.8-3GB batch per
        # concurrent task, so image-heavy deployments should lower this knob
        # (ADVICE r1). In practice parquet scan splits (~128MB) bound the
        # partition — and therefore the batch — long before this cap; the
        # blow-up case is wide in-memory DataFrames feeding mapInArrow.
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            os.environ.get("SPARK_GRAFT_ARROW_MAX_RECORDS", "65536"),
        )
        # Spark 4.1 defaults maxBytesPerBatch to 64MB, which makes the JVM call
        # ArrowWriter.sizeInBytes() per appended row inside the Arrow feed loop
        # (BatchedPythonArrowInput.underBatchSizeLimit) — profiled at >50% of
        # executor CPU on Arrow-kernel stages. Int.MaxValue short-circuits the
        # check; batch memory stays bounded by maxRecordsPerBatch (65536 rows).
        .config("spark.sql.execution.arrow.maxBytesPerBatch", "2147483647")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in extra.items():
        b = b.config(k, v)
    return b.getOrCreate()
