"""Distributed as-of join — the temporal join Spark's DataFrame API lacks.

Semantics: for every left row, attach the right row with the same key and the
greatest right timestamp ≤ the left timestamp (backward inclusive; LEFT-join
semantics — unmatched left rows keep nulls). The classic uses: price
snapshots to trades, sensor state to events, config versions to log lines.

Implementation is the union-window technique, not a join: tag both inputs,
union them, and run ONE window per key ordered by (ts, is_ref DESC, ref
order) taking last(ref column, ignorenulls) over the unbounded-preceding
frame. Every ref column rides the same frame, so all carried columns come
from the SAME matched row. Cost: a single hash exchange on the key plus a
sort — no join node, no range explosion, no per-key driver work; skewed keys
are one AQE split away. This is the shape a 100 TB as-of needs (a naive
range join is O(n·m) per key; Spark has no native ASOF).

The DuckDB oracle twin uses the engine's NATIVE ``ASOF LEFT JOIN`` — a
genuinely different algorithm (DuckDB sorts and binary-searches the build
side) — so the hash gate cross-checks two independent implementations of the
same published semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts: str,
    right_cols: list[str],
    suffix: str = "_ref",
) -> DataFrame:
    """Backward-inclusive as-of LEFT join.

    ``right`` must be unique per (*on, ts) — with duplicates there is no
    well-defined "the" row at a timestamp and engines legitimately disagree;
    pre-aggregate first. Returns every ``left`` column plus each
    ``right_cols`` column as ``<name><suffix>`` (null when no right row at or
    before the left timestamp)."""
    carried = [f"{c}{suffix}" for c in right_cols]
    # ALL carried columns ride in one struct, so one last(ignorenulls) picks
    # one whole row — per-column lasts would mix rows whenever a matched ref
    # row holds a null in one carried column but not another
    ref = right.select(
        *on,
        ts,
        F.struct(*[F.col(c).alias(a) for c, a in zip(right_cols, carried)]).alias(
            "_ref"
        ),
    ).withColumn("_is_ref", F.lit(1))
    probe = left.withColumn("_is_ref", F.lit(0))
    u = probe.unionByName(ref, allowMissingColumns=True)
    # refs sort before probes at equal ts (inclusive match); the frame is
    # everything up to the current row, so last(...) is the latest ref ≤ ts
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(ts).asc(), F.col("_is_ref").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    u = u.withColumn("_ref", F.last("_ref", ignorenulls=True).over(w))
    u = u.select(
        *[c for c in u.columns if c not in ("_ref", "_is_ref")],
        *[F.col(f"_ref.{a}").alias(a) for a in carried],
        F.col("_is_ref"),
    )
    return u.filter(F.col("_is_ref") == 0).drop("_is_ref")


def sql_asof_join(
    left_sql: str,
    right_sql: str,
    on: list[str],
    ts: str,
    right_cols: list[str],
    out_cols: str,
    suffix: str = "_ref",
) -> str:
    """DuckDB twin using the native ASOF LEFT JOIN (independent algorithm)."""
    keys = " AND ".join(f"l.{k} = r.{k}" for k in on)
    refs = ", ".join(f"r.{c} AS {c}{suffix}" for c in right_cols)
    return f"""
SELECT {out_cols}, {refs}
FROM ({left_sql}) l
ASOF LEFT JOIN ({right_sql}) r
  ON {keys} AND l.{ts} >= r.{ts}"""
