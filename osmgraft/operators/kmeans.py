"""EXACT distributed k-means (Lloyd's algorithm, Lloyd 1957/1982) — the
clustering classic with ZERO floating point anywhere.

The trick: a centroid after any assignment round is the RATIONAL
(Sx/N, Sy/N); the squared distance from point (x, y) to centroid j is

    dist²_j = A_j / N_j²,   A_j = (N_j·x − Sx_j)² + (N_j·y − Sy_j)²

so the argmin over clusters never needs the division: j beats i iff
A_j·N_i² < A_i·N_j² (ties to the smaller cluster id), evaluated in
DECIMAL(38) on the Spark side and HUGEINT in the DuckDB twin — with
E5-quantized coordinates (|x| ≤ 1.8e7) and N ≤ 2²¹ points the largest
product is < 2.4e36, inside both types.  Every round is therefore a pure
function of the input set: bitwise identical at any parallelism, any
partitioning, any engine — the property float k-means fundamentally lacks
(FP addend order changes centroids, which changes assignments).

Shape per round: ONE map-only assignment pass (the k·(k−1) comparator is
whole-stage-codegen'd expression algebra against a broadcast 1-row wide
centroid aggregate) + ONE map-side-combinable aggregate producing the next
k centroids.  ``rounds`` unrolls lazily into a single plan — at 10^12 rows
each round is one scan + one tiny shuffle, no driver loop, no collect.
Empty clusters keep their previous centroid (the standard convention).

The DuckDB twin unrolls the SAME rounds as chained CTEs with the same
comparator text — two engines, one exact fixpoint trajectory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# fixed deterministic seeds (E5-quantized synth projection of keys
# j*101+7, j = 0..5 — literals so both engines start identically)
DEFAULT_SEEDS = [
    (-11089497, -753810),
    (-15109379, -2203412),
    (16670740, -3653015),
    (-8175, 5149640),
    (8630977, 5447780),
    (4611096, 3998177),
]

_D19 = "decimal(19,0)"
_D38 = "decimal(38,0)"


def _assign_expr(k: int):
    """Argmin-cluster Column from wide centroid columns n{j}/sx{j}/sy{j}
    and point columns x/y — the k·(k−1) cross-multiplied comparator."""
    def a(j):
        dx = (F.col(f"n{j}") * F.col("x") - F.col(f"sx{j}")).cast(_D19)
        dy = (F.col(f"n{j}") * F.col("y") - F.col(f"sy{j}")).cast(_D19)
        return (dx * dx + dy * dy).cast(_D38)

    def n2(j):
        return (F.col(f"n{j}") * F.col(f"n{j}")).cast(_D19)

    A = [a(j) for j in range(k)]
    N2 = [n2(j) for j in range(k)]

    def beats(j, i):
        lhs, rhs = A[j] * N2[i], A[i] * N2[j]
        return (lhs < rhs) | ((lhs == rhs) & F.lit(j < i))

    cl = None
    for j in range(k):
        cond = None
        for i in range(k):
            if i == j:
                continue
            b = beats(j, i)
            cond = b if cond is None else (cond & b)
        cl = F.when(cond, j) if cl is None else cl.when(cond, j)
    return cl.cast("long")


def kmeans_exact(
    pts: DataFrame,
    seeds: list[tuple[int, int]] | None = None,
    rounds: int = 3,
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """(x, y) integer points → per cluster (cluster, n, sx, sy) after
    ``rounds`` exact Lloyd rounds from ``seeds`` (centroid = sx/n, sy/n —
    the division is the consumer's).  See module docstring."""
    seeds = DEFAULT_SEEDS if seeds is None else seeds
    k = len(seeds)
    p = pts.select(F.col(x).cast("long").alias("x"), F.col(y).cast("long").alias("y"))

    wide = None  # 1-row DataFrame of n{j}/sx{j}/sy{j}
    seed_cols = []
    for j, (sx, sy) in enumerate(seeds):
        seed_cols += [
            F.lit(1).cast("long").alias(f"n{j}"),
            F.lit(sx).cast("long").alias(f"sx{j}"),
            F.lit(sy).cast("long").alias(f"sy{j}"),
        ]
    wide = p.sparkSession.range(1).select(*seed_cols)

    for _ in range(rounds):
        assigned = p.crossJoin(F.broadcast(wide)).withColumn("cl", _assign_expr(k))
        aggs = []
        for j in range(k):
            hit = F.col("cl") == j
            aggs += [
                F.sum(hit.cast("long")).alias(f"cn{j}"),
                F.sum(F.when(hit, F.col("x"))).alias(f"csx{j}"),
                F.sum(F.when(hit, F.col("y"))).alias(f"csy{j}"),
                F.max(F.col(f"n{j}")).alias(f"pn{j}"),
                F.max(F.col(f"sx{j}")).alias(f"psx{j}"),
                F.max(F.col(f"sy{j}")).alias(f"psy{j}"),
            ]
        nxt = assigned.agg(*aggs)
        outc = []
        for j in range(k):
            empty = F.coalesce(F.col(f"cn{j}"), F.lit(0)) == 0
            outc += [
                F.when(empty, F.col(f"pn{j}")).otherwise(F.col(f"cn{j}")).cast("long").alias(f"n{j}"),
                F.when(empty, F.col(f"psx{j}")).otherwise(F.col(f"csx{j}")).cast("long").alias(f"sx{j}"),
                F.when(empty, F.col(f"psy{j}")).otherwise(F.col(f"csy{j}")).cast("long").alias(f"sy{j}"),
            ]
        # pin the 1-row centroid state per round: un-pinned, round r's
        # broadcast lineage nests every earlier round's full aggregation, so
        # the point scan re-executed O(rounds^2)/2 times (r4; the data-scale
        # side stays un-materialized — re-scanning the input per round is
        # the correct 100 TB trade, re-running prior rounds is not)
        wide = nxt.select(*outc).localCheckpoint()

    stack = ", ".join(f"{j}, n{j}, sx{j}, sy{j}" for j in range(k))
    return wide.selectExpr(
        f"stack({k}, {stack}) AS (cluster, n, sx, sy)"
    ).selectExpr(
        "CAST(cluster AS BIGINT) AS cluster", "n", "sx", "sy"
    )


def sql_kmeans_exact(
    pts_cte: str,
    seeds: list[tuple[int, int]] | None = None,
    rounds: int = 3,
) -> str:
    """DuckDB twin over a (x, y) CTE body — the same unrolled rounds as
    chained CTEs, the same comparator in HUGEINT."""
    seeds = DEFAULT_SEEDS if seeds is None else seeds
    k = len(seeds)

    def a(j, src):
        dx = f"(CAST({src}.n{j} AS HUGEINT) * p.x - {src}.sx{j})"
        dy = f"(CAST({src}.n{j} AS HUGEINT) * p.y - {src}.sy{j})"
        return f"({dx} * {dx} + {dy} * {dy})"

    def n2(j, src):
        return f"(CAST({src}.n{j} AS HUGEINT) * {src}.n{j})"

    def cl_case(src):
        arms = []
        for j in range(k):
            conds = []
            for i in range(k):
                if i == j:
                    continue
                lhs = f"{a(j, src)} * {n2(i, src)}"
                rhs = f"{a(i, src)} * {n2(j, src)}"
                tie = f"({lhs} = {rhs} AND {str(j < i).upper()})"
                conds.append(f"(({lhs} < {rhs}) OR {tie})")
            arms.append(f"WHEN {' AND '.join(conds)} THEN {j}")
        return "CASE " + " ".join(arms) + " END"

    seeds_row = ", ".join(
        f"CAST(1 AS BIGINT) AS n{j}, CAST({sx} AS BIGINT) AS sx{j}, "
        f"CAST({sy} AS BIGINT) AS sy{j}"
        for j, (sx, sy) in enumerate(seeds)
    )
    ctes = [f"kpts AS ({pts_cte})", f"c0 AS (SELECT {seeds_row})"]
    for r in range(rounds):
        src, dst = f"c{r}", f"c{r + 1}"
        agg_cols = ", ".join(
            f"sum(CASE WHEN cl = {j} THEN 1 ELSE 0 END) AS cn{j}, "
            f"sum(CASE WHEN cl = {j} THEN x END) AS csx{j}, "
            f"sum(CASE WHEN cl = {j} THEN y END) AS csy{j}, "
            f"max(n{j}) AS pn{j}, max(sx{j}) AS psx{j}, max(sy{j}) AS psy{j}"
            for j in range(k)
        )
        fix = ", ".join(
            f"CAST(CASE WHEN coalesce(cn{j}, 0) = 0 THEN pn{j} ELSE cn{j} END AS BIGINT) AS n{j}, "
            f"CAST(CASE WHEN coalesce(cn{j}, 0) = 0 THEN psx{j} ELSE csx{j} END AS BIGINT) AS sx{j}, "
            f"CAST(CASE WHEN coalesce(cn{j}, 0) = 0 THEN psy{j} ELSE csy{j} END AS BIGINT) AS sy{j}"
            for j in range(k)
        )
        ctes.append(
            f"{dst} AS (SELECT {fix} FROM (\n"
            f"  SELECT {agg_cols} FROM (\n"
            f"    SELECT p.x, p.y, {cl_case(src)} AS cl\n"
            f"    FROM kpts p, {src}) , {src}))"
        )
    unions = "\nUNION ALL\n".join(
        f"SELECT CAST({j} AS BIGINT) AS cluster, n{j} AS n, sx{j} AS sx, sy{j} AS sy FROM c{rounds}"
        for j in range(k)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + unions
