"""Run one registry query as a spark-submit job (multi-executor deployment
proof for the oracle-gated surface):

    spark-submit --master <cluster> --py-files dist/osmgraft.zip \
        tools/jobs/oracle_probe_job.py --name pip_inner \
        --sf-dir /root/testdata/sf0.01 --output /tmp/probe_out

Writes the query result as parquet; the caller (tests/test_submit.py or
tools/verify_oracle.py --from-parquet) fingerprints it against the DuckDB
twin, proving the executor-shipped zip computes the same answer a local[n]
session does. No repo imports beyond the shipped package.
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--name", required=True)
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--output", required=True)
    args = ap.parse_args()

    from osmgraft.queries import REGISTRY

    spark = SparkSession.builder.appName(f"osmgraft-probe-{args.name}").getOrCreate()
    df = REGISTRY[args.name][0](spark, args.sf_dir)
    df.write.mode("overwrite").parquet(args.output)
    n = spark.read.parquet(args.output).count()
    print(f"osmgraft-probe: wrote {n} rows of {args.name} to {args.output}")
    spark.stop()


if __name__ == "__main__":
    main()
