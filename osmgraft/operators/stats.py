"""Exact distributed order statistics over integer-valued columns.

Approximate-percentile sketches (KLL/t-digest) differ between engines by
construction, so they can never hash-gate. Over INTEGER domains (cents,
micros, counts — what a metrics pipeline actually stores) the exact discrete
quantile is cheaply distributable: aggregate a (key, value) → count histogram
(map-side combine collapses the data to distinct-value size), one cumulative
window per key, then for each requested quantile take the first value whose
cumulative count reaches the rank.

Rank convention — smallest k-th order statistic with k = max(1, ceil(q·n)) —
matches DuckDB's native ``quantile_disc`` (probed across size/quantile
boundary cases), so the oracle twin runs a genuinely different
implementation (DuckDB's in-memory sort-based aggregate). Quantiles are
passed as PER-MILLE INTEGERS and the rank is computed with integer rational
arithmetic (ceil(a/b) = -((-a) div b)) — zero floating point, no ulp
boundary to disagree on.

Scale shape: one exchange to build the histogram (map-side partial), one
window sort over DISTINCT values per key (domain-sized, not row-sized), one
final min-agg. No collect, no sort of raw rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def exact_percentiles(
    df: DataFrame, keys: list[str], col: str, quantiles_pm: list[int]
) -> DataFrame:
    """Exact discrete quantiles of integer column ``col`` per ``keys`` group.

    quantiles_pm: per-mille integers (500 = median, 990 = p99). Returns one
    row per (keys…, q_pm) with the exact k-th order statistic in ``val_q``.

    NULL values of ``col`` are EXCLUDED (the convention quantile_disc and
    every SQL ordered-set aggregate follow) — without the filter they would
    land in their own histogram bucket, sort first, and shift every rank.
    """
    hist = (
        df.filter(F.col(col).isNotNull())
        .groupBy(*keys, col)
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    w_cum = (
        Window.partitionBy(*keys)
        .orderBy(F.col(col).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy(*keys)
    h = hist.select(
        *keys,
        F.col(col),
        F.sum("_c").over(w_cum).alias("_cum"),
        F.sum("_c").over(w_all).alias("_n"),
    )
    qs = F.explode(F.array(*[F.lit(int(q)) for q in quantiles_pm])).alias("q_pm")
    cand = h.select(*keys, col, "_cum", "_n", qs).withColumn(
        # rank k = max(1, ceil(q_pm*n/1000)) in pure integer math. Spark's
        # div TRUNCATES toward zero, so ceil(a/b) for positive a, b is
        # (a + b - 1) div b — the -((-a) div b) trick needs floor division.
        "_k",
        F.greatest(F.lit(1).cast("long"), F.expr("(q_pm * _n + 999) div 1000")),
    )
    return (
        cand.filter(F.col("_cum") >= F.col("_k"))
        .groupBy(*keys, "q_pm")
        .agg(F.min(col).alias("val_q"))
    )


def sql_exact_percentiles_native(
    table_sql: str, keys: list[str], col: str, quantiles_pm: list[int]
) -> str:
    """DuckDB twin via NATIVE quantile_disc (independent implementation)."""
    ks = ", ".join(keys)
    aggs = ", ".join(
        f"quantile_disc({col}, {q / 1000}) AS p{q}" for q in quantiles_pm
    )
    arms = " UNION ALL ".join(
        f"SELECT {ks}, {q} AS q_pm, p{q} AS val_q FROM a" for q in quantiles_pm
    )
    return f"WITH a AS (SELECT {ks}, {aggs} FROM ({table_sql}) GROUP BY {ks}) {arms}"
