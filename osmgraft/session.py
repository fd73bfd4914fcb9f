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
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
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
