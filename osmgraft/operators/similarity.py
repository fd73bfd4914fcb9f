"""Similarity search over embedding columns (brief §similarity-search):
brute-force cosine top-k as the exact baseline, and a random-hyperplane
LSH-bucketed variant as the scale path.

Cross-engine determinism: dot products are computed with a SEQUENTIAL
left-to-right fold over double-cast elements (F.aggregate in Spark,
list_dot_product over DOUBLE[] in DuckDB) — both sides produce bit-identical
IEEE doubles, so even rank ordering matches. Output columns are integers only.

Scale shape (10^12 rows): brute force is a broadcast of the (small) query set
against a full scan — embarrassingly parallel, no shuffle until the final
per-query top-k (TakeOrdered-like Window over candidates). The LSH variant
turns the scan into a bucket equi-join: probes touch only matching buckets.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    """Sequential left-to-right double fold — matches DuckDB list_dot_product."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine_topk(
    items: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: queries (small) broadcast-cross-joined to items.
    Returns (query_id, neighbor_id, rank) ordered by (cosine DESC, neighbor)."""
    from osmgraft.operators.util import ensure_min_parallelism

    items = ensure_min_parallelism(items)
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    joined = items.crossJoin(F.broadcast(q)).select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        (
            _dot(F.col("qvec"), F.col(vec_col))
            / (F.sqrt(_dot(F.col("qvec"), F.col("qvec"))) * F.sqrt(_dot(F.col(vec_col), F.col(vec_col))))
        ).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), "neighbor_id")
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def sql_cosine_topk(k: int = 10, query_pred: str = "vec_id < 5", table: str = "embeddings") -> str:
    dot = "list_dot_product(q.qv, e.embedding::DOUBLE[])"
    nq = "sqrt(list_dot_product(q.qv, q.qv))"
    ne = "sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))"
    return f"""
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM {table} WHERE {query_pred})
SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank FROM (
  SELECT q.query_id, e.vec_id AS neighbor_id,
    row_number() OVER (PARTITION BY q.query_id
                       ORDER BY {dot} / ({nq} * {ne}) DESC, e.vec_id) AS rank
  FROM q CROSS JOIN {table} e) t
WHERE rank <= {k}
""".strip()


# --- random-hyperplane LSH (approximate, scale path) ---------------------------
def _hyperplanes(dim: int, n_planes: int, table: int) -> np.ndarray:
    """Deterministic planes: Philox keyed by table index (no wall-clock)."""
    rng = np.random.Generator(np.random.Philox(key=7_777 + table))
    return rng.standard_normal((n_planes, dim))


def lsh_bucket_udf(dim: int, n_planes: int = 12, table: int = 0):
    planes = _hyperplanes(dim, n_planes, table)

    @F.pandas_udf("long")
    def _udf(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy())  # (batch, dim)
        sig = (m @ planes.T) > 0  # (batch, n_planes)
        out = np.zeros(len(m), dtype=np.int64)
        for j in range(n_planes):
            out = (out << 1) | sig[:, j].astype(np.int64)
        return pd.Series(out)

    return _udf


def lsh_ann_topk(
    items: DataFrame,
    queries: DataFrame,
    k: int = 10,
    dim: int = 64,
    n_planes: int = 10,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via MULTI-TABLE hyperplane LSH (L independent plane
    sets — union of bucket matches, then exact cosine re-rank). Standard
    recall/selectivity trade: more tables → higher recall, more candidates.
    Recall vs brute force measured in tests."""
    cand = None
    for t in range(n_tables):
        udf = lsh_bucket_udf(dim, n_planes, table=t)
        it = items.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("ivec"),
            udf(F.col(vec_col)).alias("_bucket"),
        )
        q = queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qvec"),
            udf(F.col(vec_col)).alias("_bucket"),
        )
        j = it.join(F.broadcast(q), "_bucket").drop("_bucket")
        cand = j if cand is None else cand.unionByName(j)
    cand = cand.dropDuplicates(["query_id", "neighbor_id"])
    joined = cand.select(
        "query_id",
        "neighbor_id",
        (
            _dot(F.col("qvec"), F.col("ivec"))
            / (F.sqrt(_dot(F.col("qvec"), F.col("qvec"))) * F.sqrt(_dot(F.col("ivec"), F.col("ivec"))))
        ).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), "neighbor_id")
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )
