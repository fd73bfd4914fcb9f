"""osmgraft — a PySpark-native spatial-join + tiling engine.

A from-scratch Spark-first engine with the query/data-processing capabilities
of the reference (`amandasaurus/osmio`, read-only at /root/reference),
generalized per BASELINE.json's north rule: Iceberg/Parquet tables of
image+caption rows carrying fixed-point lon/lat, with

  * the osmio coordinate-precision model (i32 at 1e-7 deg — lib.rs:66-71),
  * H3-style res-7/-9 and S2 level-13 cell indexing (vectorized numpy kernels),
  * ray-casting point-in-polygon against broadcast admin polygons (STR-tree),
  * kNN via cell-ring expansion,
  * z/x/y slippy-tile assignment,
  * explicit salting/skew handling on cell joins,
  * checkpoint/resume with per-partition lineage + metrics.

Everything is pyspark.sql DataFrames + Arrow-vectorized kernels; no RDDs,
no per-row Python UDFs in hot paths (BASELINE.json input_hint).
"""

__version__ = "0.1.0"

COORD_SCALE = 10_000_000  # 1e7: degrees → fixed-point int32 (osmio lib.rs:71)
COORD_PRECISION_NANOS = 100  # osmio lib.rs:66

from osmgraft.session import get_spark  # noqa: E402,F401
