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

from osmgraft.functions.timestamps import ntz_micros


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


def scd2_build(
    events: DataFrame,
    key_cols: list[str],
    state_col: str,
    ts_col: str = "ts",
    order_tiebreak: list[str] | None = None,
) -> DataFrame:
    """Type-2 slowly-changing-dimension build — the inverse of asof_join:
    collapse an event stream into per-key validity INTERVALS (key, state,
    vf_us, vt_us; microsecond epochs, vt_us NULL for the open interval).
    Consecutive events with an unchanged state merge into one interval;
    a change closes the previous interval at the new event's timestamp.
    asof_join against the result reproduces the original state timeline.

    ONE hash exchange: both windows (change detection, then lead over the
    surviving change rows) partition on the key with compatible sort
    order, so Catalyst reuses the first exchange+sort for the second
    window — no second shuffle, no groupBy (change rows ARE the interval
    starts).  Ties at equal timestamps break on ``order_tiebreak``
    (default: no extra columns — pass the event id for full determinism)."""
    order = [F.col(ts_col)] + [F.col(c) for c in (order_tiebreak or [])]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    prev = F.lag(state_col).over(w)
    chg = prev.isNull() | ~F.col(state_col).eqNullSafe(prev)
    starts = events.withColumn("_chg", chg).where(F.col("_chg"))
    w2 = Window.partitionBy(*key_cols).orderBy(*order)
    # naive micros, session-tz-free (r5 tz probe; timestamps.ntz_micros)
    vf = ntz_micros(F.col(ts_col))
    return starts.select(
        *key_cols,
        F.col(state_col),
        vf.alias("vf_us"),
        F.lead(vf).over(w2).alias("vt_us"),
    )


def sql_scd2_build(
    events_sql: str, key_cols: list[str], state_col: str, ts_col: str = "ts",
    order_tiebreak: list[str] | None = None,
) -> str:
    """DuckDB twin: identical two-window form (epoch_us is exact int64)."""
    keys = ", ".join(key_cols)
    order = ", ".join([ts_col] + (order_tiebreak or []))
    return f"""WITH ev AS ({events_sql}),
chg AS (
  SELECT *,
    lag({state_col}) OVER (PARTITION BY {keys} ORDER BY {order}) AS _prev
  FROM ev),
starts AS (
  SELECT * FROM chg
  WHERE _prev IS NULL OR {state_col} IS DISTINCT FROM _prev)
SELECT {keys}, {state_col},
  epoch_us({ts_col}) AS vf_us,
  lead(epoch_us({ts_col})) OVER (PARTITION BY {keys} ORDER BY {order}) AS vt_us
FROM starts"""


# --- Allen interval algebra --------------------------------------------------
# The 13 relations (Allen CACM 1983), from A's perspective, as mutually
# exclusive exact comparisons on closed integer intervals [s, e], s <= e.
_ALLEN = [
    ("precedes", "ea < sb"),
    ("meets", "ea = sb AND sa < sb"),
    ("overlaps", "sa < sb AND sb < ea AND ea < eb"),
    ("finished_by", "sa < sb AND ea = eb"),
    ("contains", "sa < sb AND eb < ea"),
    ("starts", "sa = sb AND ea < eb"),
    ("equals", "sa = sb AND ea = eb"),
    ("started_by", "sa = sb AND eb < ea"),
    ("during", "sb < sa AND ea < eb"),
    ("finishes", "sb < sa AND ea = eb"),
    ("overlapped_by", "sb < sa AND sa < eb AND eb < ea"),
    ("met_by", "eb = sa AND sb < sa"),
    ("preceded_by", "eb < sa"),
]


def allen_relations(
    intervals: DataFrame,
    keys: list[str],
    id_col: str,
    s_col: str,
    e_col: str,
) -> DataFrame:
    """Allen interval-algebra classification (Allen CACM 1983 — the 13
    qualitative temporal relations every temporal-reasoning system builds
    on) between every unordered pair of intervals sharing ``keys``: emits
    (keys…, id_a, id_b, relation) with relation ∈ {precedes, meets,
    overlaps, finished_by, contains, starts, equals, started_by, during,
    finishes, overlapped_by, met_by, preceded_by} from id_a's perspective
    (id_a < id_b).  The 13 conditions partition every configuration of two
    closed integer intervals — mutually exclusive and exhaustive by
    construction — so the class is exact, no epsilon, no floats.  One rule
    text, both engines.

    For PROPER intervals (s < e) the 13 conditions partition every
    configuration — mutually exclusive and exhaustive.  Degenerate (point)
    intervals can satisfy two conditions (a point at another interval's
    endpoint is both 'finishes' and 'met_by'); the FIRST match in the
    fixed order above is the pinned tie rule — one rule text, both
    engines, so the class stays deterministic there too.

    100 TB: within-key self-join — pair cost bounded by intervals per key,
    never global n²; the classification is a codegen CASE cascade."""
    a = intervals.select(
        *keys,
        F.col(id_col).alias("id_a"),
        F.col(s_col).alias("sa"),
        F.col(e_col).alias("ea"),
    )
    b = intervals.select(
        *keys,
        F.col(id_col).alias("id_b"),
        F.col(s_col).alias("sb"),
        F.col(e_col).alias("eb"),
    )
    pairs = a.join(b, keys).filter(F.col("id_a") < F.col("id_b"))
    rel = F.expr(
        "CASE "
        + " ".join(f"WHEN {cond} THEN '{name}'" for name, cond in _ALLEN)
        + " END"
    )
    return pairs.select(*keys, "id_a", "id_b", rel.alias("relation"))


def sql_allen_relations(
    intervals_cte: str, keys: list[str], id_col: str, s_col: str, e_col: str
) -> str:
    """DuckDB twin of :func:`allen_relations` — the identical CASE text."""
    ks = ", ".join(f"a.{k}" for k in keys)
    on = " AND ".join(f"a.{k} = b.{k}" for k in keys)
    case = "CASE " + " ".join(
        f"WHEN {cond} THEN '{name}'" for name, cond in _ALLEN
    ) + " END"
    return f"""WITH al_iv AS ({intervals_cte}),
al_pairs AS (
  SELECT {ks}, a.{id_col} AS id_a, b.{id_col} AS id_b,
         a.{s_col} AS sa, a.{e_col} AS ea, b.{s_col} AS sb, b.{e_col} AS eb
  FROM al_iv a JOIN al_iv b ON {on} AND a.{id_col} < b.{id_col})
SELECT {", ".join(keys)}, id_a, id_b, {case} AS relation
FROM al_pairs"""
