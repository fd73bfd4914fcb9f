"""Sequence packing for LLM training: concat-and-chunk document→token-window
assignment (the "pack documents into fixed-length training sequences" step a
pretraining pipeline runs after curation).

Semantics: documents are laid out in ONE deterministic global order (portable
md5 of doc_id, tie-broken by doc_id — the same engine-independent ordering
discipline as doc_split_assign), token counts cumulate, and the concatenated
token stream is cut every ``seq_len`` tokens.  Each document reports the first
and last training sequence it lands in plus its offset inside the first
(documents straddle cut points — chunking semantics, the standard layout for
causal-LM pretraining).  Zero-token documents occupy no stream space and are
dropped (mirrored in the oracle).

Scale shape — the global exclusive prefix sum is the textbook TWO-PASS
distributed scan, not a single-partition window:

  1. ``repartitionByRange`` on (order_key, doc_id) → rows land in ascending
     key ranges; ``spark_partition_id()`` is materialized immediately and the
     frame is localCheckpoint'ed so both downstream uses see one frozen
     partitioning (RangePartitioner samples, so pids must not be recomputed).
  2. A window cumsum PARTITIONED BY pid (never unpartitioned — no stage holds
     more than rows/partitions).
  3. Per-partition token totals — ONE row per partition, bounded metadata ≤
     #partitions — collect to the driver, exclusive-cumsum there (range
     partition i precedes i+1 by construction), and broadcast-join back as
     per-partition base offsets.

At 10^12 rows this is two scans + one range shuffle; the only driver-side
data is the #partitions-row offset table (same bounded-aggregate license as
celljoin's hot-cell sketch).  The result is a pure function of the global
order, independent of the partition count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osmgraft.functions import text as T


def pack_sequences(docs: DataFrame, seq_len: int = 128, num_parts: int | None = None) -> DataFrame:
    """(doc_id, text) → (doc_id, n_tok, first_seq, last_seq, seq_offset).

    first_seq/last_seq index the fixed-``seq_len`` training windows the
    document's tokens fall into; seq_offset is the token offset inside
    first_seq where the document starts.
    """
    from pyspark.sql import Window as W

    spark = docs.sparkSession
    if num_parts is None:
        num_parts = spark.sparkContext.defaultParallelism

    d = docs.select(
        "doc_id",
        T.md5_long(F.col("doc_id").cast("string")).alias("okey"),
        T.token_count(F.col("text")).cast("long").alias("n_tok"),
    ).filter(F.col("n_tok") > 0)

    # pass 1: range-partition on the global order; freeze pids (sampling-based
    # partitioner — recomputation could re-draw boundaries)
    d = (
        d.repartitionByRange(num_parts, "okey", "doc_id")
        .withColumn("pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )

    # per-partition exclusive cumsum (partitioned window — no global sort node)
    w = (
        W.partitionBy("pid")
        .orderBy("okey", "doc_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    local = d.withColumn("local_excl", F.coalesce(F.sum("n_tok").over(w), F.lit(0)))

    # pass 2: bounded per-partition totals → driver exclusive cumsum → broadcast
    totals = {
        r["pid"]: r["tot"]
        for r in d.groupBy("pid").agg(F.sum("n_tok").alias("tot")).collect()
    }
    base, offsets = 0, []
    for pid in sorted(totals):  # range partition i precedes i+1
        offsets.append((pid, base))
        base += totals[pid]
    off_df = spark.createDataFrame(offsets, "pid int, base long")

    out = local.join(F.broadcast(off_df), "pid").withColumn(
        "cum", F.col("base") + F.col("local_excl")
    )
    return out.select(
        "doc_id",
        "n_tok",
        F.expr(f"cum div {seq_len}").alias("first_seq"),
        F.expr(f"(cum + n_tok - 1) div {seq_len}").alias("last_seq"),
        (F.col("cum") % seq_len).alias("seq_offset"),
    )


def sql_pack_sequences(seq_len: int = 128) -> str:
    """DuckDB twin: the same layout stated as ONE ordered window cumsum —
    a genuinely different algorithm (global sort) than the engine's two-pass
    distributed scan, hashing identically."""
    okey = T.sql_md5_long("CAST(doc_id AS VARCHAR)")
    return f"""WITH d AS (
  SELECT doc_id, {okey} AS okey, {T.sql_token_count('text')} AS n_tok FROM documents),
c AS (
  SELECT doc_id, n_tok,
         COALESCE(SUM(n_tok) OVER (ORDER BY okey, doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
  FROM d WHERE n_tok > 0)
SELECT doc_id, n_tok,
       CAST(cum // {seq_len} AS BIGINT) AS first_seq,
       CAST((cum + n_tok - 1) // {seq_len} AS BIGINT) AS last_seq,
       CAST(cum % {seq_len} AS BIGINT) AS seq_offset
FROM c"""


def mixture_sample(
    docs: DataFrame,
    group_col: str,
    budget: "F.Column",
    tok: "F.Column",
    order_key: "F.Column",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic mixture sampling to a per-group token budget — the
    data-mixing step that turns source weights into an actual training
    subset (Pile/Dolma-style): within each group, documents are taken in
    hash order (``order_key`` — reshuffle- and engine-independent) until
    the group's running token total would exceed its ``budget``; the doc
    that still fits is kept (greedy fill, cum <= budget semantics).

    ONE hash exchange on the group: the running sum and the rank ride the
    same window sort.  Deterministic by construction — same inputs give
    the same sample at any partitioning, which is what makes a mixture
    reproducible across reruns and engines."""
    from pyspark.sql import Window as W

    w = (
        W.partitionBy(group_col)
        .orderBy(order_key, id_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = F.sum(tok).over(w)
    return (
        docs.select(
            id_col, group_col,
            tok.alias("n_tok"),
            cum.alias("cum_tok"),
            budget.alias("_budget"),
        )
        .where(F.col("cum_tok") <= F.col("_budget"))
        .drop("_budget")
    )


def proportional_quotas(
    counts: DataFrame, budget: int, *, n_col: str = "n"
) -> DataFrame:
    """Hamilton largest-remainder apportionment: split an integer ``budget``
    across groups proportionally to their counts, EXACTLY — Σ quota ==
    budget, |quota_i − budget·n_i/N| < 1, all int64 (no IEEE anywhere, so
    the allocation is engine- and partitioning-independent).

    quota_i = ⌊budget·n_i/N⌋, then the budget − Σ⌊·⌋ leftover seats go to
    the largest fractional parts (budget·n_i mod N, ties to the smaller
    group key).  Input is a per-group aggregate (one row per group — cells,
    sources, langs), so the windows here run over the SMALL side; never
    call this on raw rows.  Overflow bound: budget·max(n_i) must stay
    < 2^63 — at extreme scale pre-divide counts by a common factor (the
    allocation only depends on the n_i ratios)."""
    keys = [c for c in counts.columns if c != n_col]
    from pyspark.sql import Window as W

    everything = W.partitionBy()  # counts is group-cardinality small
    n = F.col(n_col).cast("long")
    total = F.sum(n).over(everything)
    # int64 `div` throughout — `/` on longs is DOUBLE division in Spark and
    # silently loses exactness past 2^53
    scored = counts.select(
        *keys,
        n.alias(n_col),
        (F.lit(budget) * n).alias("_bn"),
        total.alias("_total"),
    ).selectExpr(
        *keys,
        n_col,
        "_bn div _total AS _base",
        "_bn % _total AS _frac",
    )
    leftover = F.lit(budget) - F.sum("_base").over(everything)
    ranked = scored.select(
        "*",
        F.row_number()
        .over(everything.orderBy(F.desc("_frac"), *keys))
        .alias("_rk"),
        leftover.alias("_left"),
    )
    return ranked.select(
        *keys,
        n_col,
        (F.col("_base") + (F.col("_rk") <= F.col("_left")).cast("long")).alias(
            "quota"
        ),
    )


def sql_proportional_quotas(counts_cte: str, budget: int, keys: str, n: str = "n") -> str:
    """DuckDB twin of proportional_quotas over a counts CTE body."""
    return f"""WITH counts AS ({counts_cte}),
scored AS (
  -- operands are nonnegative, so // (floor) == Spark's div (truncate)
  SELECT {keys}, {n},
         ({budget} * {n}) // sum({n}) OVER () AS base,
         ({budget} * {n}) % sum({n}) OVER () AS frac
  FROM counts),
ranked AS (
  SELECT {keys}, {n}, base,
         row_number() OVER (ORDER BY frac DESC, {keys}) AS rk,
         {budget} - sum(base) OVER () AS leftover
  FROM scored)
SELECT {keys}, {n}, CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT) AS quota
FROM ranked"""


def compaction_plan(
    files: DataFrame,
    target_bytes: int,
    part_cols: list[str],
    file_col: str = "file_id",
    bytes_col: str = "bytes",
) -> DataFrame:
    """Plan small-file compaction: within each table partition, assign files
    to merge bins of ~``target_bytes`` (the Iceberg `binPack` rewrite /
    Delta OPTIMIZE planning step).

    Deterministic next-fit-decreasing by cumulative sum: files order by
    (bytes DESC, file_id) — large files seed bins first, the classic FFD
    quality heuristic — and bin = exclusive-prefix-sum(bytes) div target.
    A file straddling a boundary overflows its bin by < one file (bins are
    never split mid-file), and a file larger than target gets a bin of its
    own.  Output: one row per bin (part..., bin, n_files, bin_bytes).

    Scale shape: manifests are file-count-sized, not data-sized, and the
    window is PARTITIONED BY the table partition — per-partition file lists
    are the bounded unit a metadata compactor actually holds (compare
    pack_sequences for the two-pass trick when a single global order is
    unavoidable).  One exchange on part_cols, everything else map-side."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*part_cols)
        .orderBy(F.col(bytes_col).desc(), F.col(file_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(bytes_col).over(w), F.lit(0))
    # int64 `div`, not float `/`: exact at any manifest size (FP division
    # loses integer precision past 2^53; DuckDB's `//` is exact int div)
    planned = files.withColumn("_cb", cum_before.cast("long")).withColumn(
        "bin", F.expr(f"_cb div {int(target_bytes)}")
    )
    return planned.groupBy(*part_cols, "bin").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum(bytes_col).cast("long").alias("bin_bytes"),
    )


def sql_compaction_plan(
    files_cte: str,
    target_bytes: int,
    part_cols: str,
    file_col: str = "file_id",
    bytes_col: str = "bytes",
) -> str:
    """DuckDB twin: identical exclusive-prefix-sum bucketing via a window."""
    return f"""WITH files AS ({files_cte}),
planned AS (
  SELECT {part_cols}, {bytes_col},
         COALESCE(SUM({bytes_col}) OVER (
           PARTITION BY {part_cols}
           ORDER BY {bytes_col} DESC, {file_col}
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           // {target_bytes} AS bin
  FROM files)
SELECT {part_cols}, CAST(bin AS BIGINT) AS bin, count(*) AS n_files,
       CAST(sum({bytes_col}) AS BIGINT) AS bin_bytes
FROM planned GROUP BY {part_cols}, bin"""


# --- span corruption masks (T5-style denoising spans) -------------------------------
def span_corruption(
    docs: DataFrame,
    noise_pct: int = 15,
    span_len: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Deterministic span-corruption masks — the T5/UL2 denoising-objective
    prep step (Raffel et al. 2020, public): per document, choose
    ``n_spans = n_tokens·noise_pct div (100·span_len)`` anchor positions by
    portable-md5 rank (reproducible across engines, partitionings and
    reshuffles — the doc_split_assign discipline), expand each anchor to a
    ``span_len``-token span clamped at the document end, and merge
    OVERLAPPING spans (gaps-and-islands over the running max end; adjacency
    does not merge).  Emits one row per merged mask span:
    (doc_id, span_start, span_end, n_masked) on 0-based token positions.

    Scale shape: one explode bounded by total token count (the same cost
    as any tokenize pass), two windows PARTITIONed by doc (state bounded
    by doc length, never corpus size), one aggregate.  No randomness at
    runtime — the mask is a pure function of (doc_id, position)."""
    from pyspark.sql import Window as W

    base = docs.select(
        F.col(id_col).alias("doc_id"),
        T.token_count(F.col(text_col)).alias("n"),
    ).filter(F.col("n") * noise_pct >= 100 * span_len)
    pos = base.select(
        "doc_id",
        "n",
        F.expr(f"(n * {noise_pct}) div (100 * {span_len})").alias("n_spans"),
        F.explode(F.expr("sequence(0, n - 1)")).alias("pos"),
    )
    h = T.md5_long(F.concat_ws(":", F.col("doc_id"), F.col("pos")))
    ranked = pos.select(
        "doc_id", "n", "n_spans", "pos", h.alias("h")
    ).withColumn(
        "rn", F.row_number().over(W.partitionBy("doc_id").orderBy("h", "pos"))
    )
    spans = ranked.filter(F.col("rn") <= F.col("n_spans")).select(
        "doc_id",
        F.col("pos").alias("s"),
        F.least(F.col("pos") + span_len - 1, F.col("n") - 1).alias("e"),
    )
    w_prev = W.partitionBy("doc_id").orderBy("s").rowsBetween(W.unboundedPreceding, -1)
    w_run = W.partitionBy("doc_id").orderBy("s").rowsBetween(W.unboundedPreceding, 0)
    flagged = spans.withColumn("prev_e", F.max("e").over(w_prev)).withColumn(
        "new_island",
        (F.col("prev_e").isNull() | (F.col("s") > F.col("prev_e"))).cast("int"),
    )
    islands = flagged.withColumn("island", F.sum("new_island").over(w_run))
    return (
        islands.groupBy("doc_id", "island")
        .agg(F.min("s").alias("span_start"), F.max("e").alias("span_end"))
        .select(
            "doc_id",
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias("n_masked"),
        )
    )


def sql_span_corruption(
    table: str = "documents", noise_pct: int = 15, span_len: int = 3
) -> str:
    """DuckDB twin — same anchor-hash / clamp / island semantics, expressed
    over DuckDB's lateral range and window engine."""
    return f"""WITH base AS (
  SELECT doc_id, len({T.sql_tokens('text')}) AS n FROM {table}),
eligible AS (SELECT doc_id, n, (n * {noise_pct}) // (100 * {span_len}) AS n_spans
             FROM base WHERE n * {noise_pct} >= 100 * {span_len}),
pos AS (
  -- this DuckDB build's range() takes no lateral column args: cross a
  -- fixed 4096 ceiling and filter (docs are far shorter; engine explodes
  -- sequence(0, n-1) directly)
  SELECT e.doc_id, e.n, e.n_spans, p.range AS pos,
         {T.sql_md5_long("concat_ws(':', e.doc_id, p.range)")} AS h
  FROM eligible e CROSS JOIN range(0, 4096) p WHERE p.range < e.n),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY h, pos) AS rn FROM pos),
spans AS (
  SELECT doc_id, pos AS s, least(pos + {span_len} - 1, n - 1) AS e
  FROM ranked WHERE rn <= n_spans),
flagged AS (
  SELECT doc_id, s, e,
         max(e) OVER (PARTITION BY doc_id ORDER BY s
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_e
  FROM spans),
islands AS (
  SELECT doc_id, s, e,
         sum(CASE WHEN prev_e IS NULL OR s > prev_e THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY s
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM flagged)
SELECT doc_id, CAST(min(s) AS BIGINT) AS span_start, CAST(max(e) AS BIGINT) AS span_end,
       CAST(max(e) - min(s) + 1 AS BIGINT) AS n_masked
FROM islands GROUP BY doc_id, island"""


def _isqrt_expr(p):
    """Exact integer ceil-sqrt of a positive BIGINT column via fp sqrt +
    two integer corrections (fp error is ±1 ulp; the corrections clamp it
    exactly) — the same expression text both engines evaluate."""
    s0 = F.floor(F.sqrt(p.cast("double"))).cast("long")
    s1 = s0 - (s0 * s0 > p).cast("long")
    return s1 + (s1 * s1 < p).cast("long")


def str_pack_leaves(
    pts: DataFrame,
    id_col: str = "point_id",
    x: str = "x",
    y: str = "y",
    capacity: int = 256,
    bucket_shift: int = 22,
) -> DataFrame:
    """Sort-Tile-Recursive R-tree bulk-load layout (Leutenegger, Lopez &
    Edgington, ICDE 1997): n points → P = ceil(n/B) leaves arranged in
    S = ceil(sqrt(P)) x-slices of S·B points each, each slice cut into
    y-runs of B — THE standard way a spatial store lays out a static
    index.  Emits the per-leaf directory (slice, leaf, n_pts, exact bbox)
    — the level-0 index a reader prunes on.

    Exactness: the layout is a pure function of the total order
    (x, y, id) — unique, so ranks (and therefore every leaf assignment)
    are engine-independent.  ceil-sqrt is fp-sqrt plus two integer
    corrections (exact for any BIGINT).

    100 TB shape — the point of this operator: a naive global
    row_number() OVER (ORDER BY x) is a SINGLE-PARTITION sort, the classic
    scale-killer.  Here the global x-rank is TWO-PASS: coarse x-bucket
    (x >> ``bucket_shift``) counts roll up to a bounded aggregate, a
    running-sum window over THAT aggregate yields per-bucket offsets
    (broadcast back), and the within-bucket rank is a window PARTITIONED
    BY bucket — every stage parallel, no single-reducer sort.  The
    within-slice y-rank partitions by slice (S·B rows each) for free.
    The DuckDB twin uses plain global windows — deliberately a different
    plan proving the same function."""
    from pyspark.sql import Window as W

    p = pts.select(
        F.col(id_col).alias("pid"),
        F.col(x).cast("long").alias("px"),
        F.col(y).cast("long").alias("py"),
    )
    # exact P = ceil(n / B) without fp: (n + B - 1) div B
    n_s = p.agg(F.count(F.lit(1)).alias("n")).select(
        "n", _isqrt_expr(F.expr(f"(n + {capacity - 1}) div {capacity}")).alias("s_slices")
    )
    b = p.withColumn("bkt", F.shiftright("px", bucket_shift))
    offs = (
        b.groupBy("bkt")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn(
            "off",
            F.coalesce(
                F.sum("c").over(
                    W.orderBy("bkt").rowsBetween(W.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("bkt", "off")
    )
    wb = W.partitionBy("bkt").orderBy("px", "py", "pid")
    ranked = (
        b.join(F.broadcast(offs), "bkt")
        .withColumn("rx", F.col("off") + F.row_number().over(wb))
        .crossJoin(F.broadcast(n_s))
        .withColumn(
            "slice", F.expr(f"(rx - 1) div (s_slices * {capacity})").cast("long")
        )
    )
    ws = W.partitionBy("slice").orderBy("py", "px", "pid")
    leaves = ranked.withColumn(
        "leaf",
        ((F.row_number().over(ws) - 1) / capacity).cast("long"),
    )
    return (
        leaves.groupBy("slice", "leaf")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pts"),
            F.min("px").alias("min_x"),
            F.max("px").alias("max_x"),
            F.min("py").alias("min_y"),
            F.max("py").alias("max_y"),
        )
    )


def sql_str_pack_leaves(pts_cte: str, capacity: int = 256) -> str:
    """DuckDB twin over a (point_id, x, y) CTE body — plain global windows
    (single total order), same (x, y, id) tie-break, same ceil-sqrt
    corrections, same leaf directory."""
    b = capacity
    return f"""spts AS ({pts_cte}),
sn AS (
  SELECT count(*) AS n FROM spts),
ss AS (
  SELECT n,
         (CASE WHEN s1 * s1 < p THEN s1 + 1 ELSE s1 END) AS s_slices
  FROM (
    SELECT n, p, (CASE WHEN s0 * s0 > p THEN s0 - 1 ELSE s0 END) AS s1
    FROM (
      SELECT n, (n + {b - 1}) // {b} AS p,
             CAST(floor(sqrt(CAST((n + {b - 1}) // {b} AS DOUBLE))) AS BIGINT) AS s0
      FROM sn))),
srank AS (
  SELECT point_id AS pid, CAST(x AS BIGINT) AS px, CAST(y AS BIGINT) AS py,
         row_number() OVER (ORDER BY x, y, point_id) AS rx
  FROM spts),
ssl AS (
  SELECT pid, px, py, (rx - 1) // (ss.s_slices * {b}) AS slice
  FROM srank, ss),
sleaf AS (
  SELECT slice, px, py,
         (row_number() OVER (PARTITION BY slice ORDER BY py, px, pid) - 1) // {b} AS leaf
  FROM ssl)
SELECT CAST(slice AS BIGINT) AS slice, CAST(leaf AS BIGINT) AS leaf,
       CAST(count(*) AS BIGINT) AS n_pts,
       min(px) AS min_x, max(px) AS max_x, min(py) AS min_y, max(py) AS max_y
FROM sleaf GROUP BY slice, leaf"""


def str_prune_stats(
    leaves: DataFrame,
    queries: DataFrame,
) -> DataFrame:
    """Index-USE evidence for the STR directory: for each query box, how
    many leaves intersect (must be scanned) and the total points inside
    them (the scan upper bound a reader pays), vs the table totals — the
    partition-pruning arithmetic an Iceberg/Parquet reader does against
    min/max stats.  Inputs: ``leaves`` = str_pack_leaves output;
    ``queries`` = (query_id, qx0, qx1, qy0, qy1).  Emits per query
    (n_leaves_hit, n_pts_bound, n_leaves_total, n_pts_total).

    Join shape: queries are a bounded set → broadcast against the leaf
    directory (itself aggregate-sized: n/capacity rows); totals are one
    1-row agg cross-joined.  At 10^12 rows the directory is ~4M rows and
    this never touches the data files — that IS the point."""
    tot = leaves.agg(
        F.count(F.lit(1)).cast("long").alias("n_leaves_total"),
        F.sum("n_pts").cast("long").alias("n_pts_total"),
    )
    hit = (
        leaves.crossJoin(F.broadcast(queries))
        .filter(
            (F.col("min_x") <= F.col("qx1"))
            & (F.col("max_x") >= F.col("qx0"))
            & (F.col("min_y") <= F.col("qy1"))
            & (F.col("max_y") >= F.col("qy0"))
        )
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_leaves_hit"),
            F.sum("n_pts").cast("long").alias("n_pts_bound"),
        )
    )
    return (
        queries.select("query_id")
        .join(hit, "query_id", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "query_id",
            F.coalesce("n_leaves_hit", F.lit(0).cast("long")).alias("n_leaves_hit"),
            F.coalesce("n_pts_bound", F.lit(0).cast("long")).alias("n_pts_bound"),
            "n_leaves_total",
            "n_pts_total",
        )
    )


def sql_str_prune_stats(leaves_cte_tail: str, queries_cte: str) -> str:
    """DuckDB twin: ``leaves_cte_tail`` is sql_str_pack_leaves output used
    as a subquery; ``queries_cte`` yields (query_id, qx0, qx1, qy0, qy1)."""
    return f"""qrs AS ({queries_cte}),
ldir AS ({leaves_cte_tail}),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_leaves_total,
               CAST(sum(n_pts) AS BIGINT) AS n_pts_total FROM ldir),
hit AS (
  SELECT query_id, CAST(count(*) AS BIGINT) AS n_leaves_hit,
         CAST(sum(n_pts) AS BIGINT) AS n_pts_bound
  FROM ldir JOIN qrs
    ON min_x <= qx1 AND max_x >= qx0 AND min_y <= qy1 AND max_y >= qy0
  GROUP BY query_id)
SELECT q.query_id, coalesce(hit.n_leaves_hit, 0) AS n_leaves_hit,
       coalesce(hit.n_pts_bound, 0) AS n_pts_bound,
       tot.n_leaves_total, tot.n_pts_total
FROM qrs q LEFT JOIN hit ON hit.query_id = q.query_id, tot"""
