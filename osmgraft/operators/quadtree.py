"""Adaptive quadtree decomposition — the skew-splitting partitioner as a
first-class operator.

The north rule demands "partitioning / shuffle / skew handled explicitly":
dense urban cells overflow any fixed-zoom grid, so production spatial
pipelines partition by an ADAPTIVE quadtree — split every quad whose point
count exceeds ``cap``, down to ``max_depth``.  The classical formulation is
recursive; here it is CLOSED FORM, which is what makes it one relational
plan instead of a depth-many driver loop:

    leaf(point) = its quadkey prefix at depth  min{ d : count(prefix_d) <= cap },
                  capped at max_depth

(counts shrink monotonically along the root-to-point path, so the min depth
is exactly where the recursion would have stopped; the root is treated as
always-split, i.e. depths start at 1).

Plan shape: one explode of max_depth prefixes per point -> ONE map-side-
combined groupBy(prefix) count -> a self-join of the (tiny, <= one row per
occupied quad) counts table with its parent prefixes to mark leaves -> the
per-point assignment is a single equi-join of the exploded prefixes against
the leaf set (each point matches exactly one ancestor leaf — disjointness +
completeness pinned in tests).  At 100 TB the counts table is ~n_points/cap
rows — the only full-data shuffles are the prefix count and the final
assignment join, both on uniformly-sized keys BY CONSTRUCTION (every leaf
holds <= cap points, except depth-max_depth residues, which is the point of
the operator).

Used standalone for balanced partitioned writes and as the candidate grid
for skewed spatial joins (celljoin's salting solves the same problem
reactively; the quadtree solves it structurally).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osmgraft.functions import tiles


def _prefixes(pts: DataFrame, cap: int, max_depth: int,
              lon: str, lat: str) -> DataFrame:
    q = pts.select(
        "*", tiles.quadkey(F.col(lon), F.col(lat), max_depth).alias("_qk")
    )
    return q.select(
        "*",
        F.explode(
            F.expr(
                f"transform(sequence(1, {max_depth}),"
                " d -> substring(_qk, 1, d))"
            )
        ).alias("p"),
    ).drop("_qk")


def quadtree_leaves(
    pts: DataFrame, cap: int, max_depth: int,
    lon: str = "lon7", lat: str = "lat7",
) -> DataFrame:
    """(leaf, depth, n_points) — the adaptive decomposition summary.  A quad
    is a leaf iff its count <= cap (or it is at max_depth) AND its parent
    overflowed (or it is at depth 1)."""
    pref = _prefixes(pts, cap, max_depth, lon, lat).select("p")
    counts = pref.groupBy("p").agg(F.count(F.lit(1)).alias("n_points"))
    par = counts.select(F.col("p").alias("pp"), F.col("n_points").alias("pc"))
    d = F.length("p")
    return (
        counts.join(
            par, F.expr("substring(p, 1, length(p) - 1)") == F.col("pp"), "left"
        )
        .where(
            ((F.col("n_points") <= cap) | (d == max_depth))
            & ((d == 1) | (F.col("pc") > cap))
        )
        .select(F.col("p").alias("leaf"), d.alias("depth"), "n_points")
    )


def quadtree_assign(
    pts: DataFrame, cap: int, max_depth: int,
    lon: str = "lon7", lat: str = "lat7",
) -> DataFrame:
    """Input rows + (leaf, depth): each point joined to its unique ancestor
    leaf — the column a balanced writer repartitions by."""
    leaves = quadtree_leaves(pts, cap, max_depth, lon, lat).select(
        F.col("leaf").alias("p"), "depth"
    )
    pref = _prefixes(pts, cap, max_depth, lon, lat)
    return pref.join(leaves, "p").withColumnRenamed("p", "leaf")


def sql_quadtree_leaves(pts_cte: str, cap: int, max_depth: int,
                        lon: str = "lon7", lat: str = "lat7") -> str:
    """DuckDB twin of quadtree_leaves over a CTE body selecting lon/lat."""
    qk = tiles.sql_quadkey(lon, lat, max_depth)
    return f"""WITH qpts AS ({pts_cte}),
qk AS (SELECT {qk} AS q FROM qpts),
pref AS (SELECT substr(q, 1, CAST(d AS INTEGER)) AS p
         FROM qk, range(1, {max_depth + 1}) r(d)),
cnts AS (SELECT p, count(*) AS n_points FROM pref GROUP BY p)
SELECT c.p AS leaf, CAST(length(c.p) AS INTEGER) AS depth, c.n_points
FROM cnts c LEFT JOIN cnts par ON par.p = substr(c.p, 1, length(c.p) - 1)
WHERE (c.n_points <= {cap} OR length(c.p) = {max_depth})
  AND (length(c.p) = 1 OR par.n_points > {cap})"""
