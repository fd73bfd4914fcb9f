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


# --------------------------------------------------------------------------
# KMV distinct-count sketch
# --------------------------------------------------------------------------

KMV_BITS = 48  # hash width: (k-1) << 48 stays far inside int64 for k <= 2^15


def kmv_distinct(
    df: DataFrame, group_cols: list[str], key_col: str, k: int = 32
) -> DataFrame:
    """Approximate distinct count per group via the K-Minimum-Values sketch
    (Bar-Yossef et al. 2002 — public method): hash every key to a uniform
    48-bit integer, keep each group's k smallest DISTINCT hashes, estimate
        est = (k-1) * 2^48 div h_k      (h_k = k-th smallest hash)
    and exact n when a group holds fewer than k distinct keys.

    Unlike HLL/KLL library sketches (engine-internal, never hash-gateable),
    this sketch is DETERMINISTIC and engine-neutral: the hash is the md5
    prefix both engines share (text.md5_long discipline), so Spark and
    DuckDB produce bit-identical estimates — an approximate algorithm with
    an EXACT cross-engine gate. Mergeability (sketch of a union = k smallest
    of the sketch union) is test-pinned; it is what makes the sketch a
    partial aggregate at 100 TB.

    Output: group cols + (n_kept, kth_hash, est_distinct) — integers only.

    Shape: distinct (group, hash) — map-side combined — then a rank-filtered
    window Spark rewrites to WindowGroupLimit (per-partition partial top-k
    BEFORE the shuffle: only k rows per group per partition move), then one
    grouped aggregate."""
    if not 2 <= k <= (1 << 15):
        raise ValueError("k must be in [2, 32768]")
    from pyspark.sql import Window

    # text.md5_long's portable-hash discipline, at 12 hex chars (48 bits)
    # for the (k-1) << 48 estimate headroom
    h = F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 12), 16, 10).cast(
        "long"
    )
    dh = df.select(*group_cols, h.alias("h")).distinct()
    w = Window.partitionBy(*group_cols).orderBy("h")
    topk = dh.select(*group_cols, "h", F.row_number().over(w).alias("rn")).where(
        F.col("rn") <= k
    )
    est = F.when(
        F.col("n_kept") < k, F.col("n_kept")
    ).otherwise(F.expr(f"({k - 1} * {1 << KMV_BITS}L) div kth_hash"))
    return (
        topk.groupBy(*group_cols)
        .agg(F.count(F.lit(1)).alias("n_kept"), F.max("h").alias("kth_hash"))
        .select(*group_cols, "n_kept", "kth_hash", est.alias("est_distinct"))
    )


def sql_kmv_distinct(
    rows_cte: str, group_cols: list[str], key_expr: str, k: int = 32
) -> str:
    """DuckDB twin — identical hash/rank/estimate text."""
    g = ", ".join(group_cols)
    return f"""WITH rows_in AS ({rows_cte}),
dh AS (
  SELECT DISTINCT {g},
         ('0x' || substr(md5(CAST({key_expr} AS VARCHAR)), 1, 12))::BIGINT AS h
  FROM rows_in
),
rk AS (
  SELECT {g}, h, row_number() OVER (PARTITION BY {g} ORDER BY h) AS rn FROM dh
),
agg AS (
  SELECT {g}, count(*) AS n_kept, max(h) AS kth_hash FROM rk WHERE rn <= {k}
  GROUP BY {g}
)
SELECT {g}, n_kept, kth_hash,
       CASE WHEN n_kept < {k} THEN n_kept
            ELSE ({k - 1} * {1 << KMV_BITS}) // kth_hash END AS est_distinct
FROM agg"""


def kmv_intersect(
    df: DataFrame, group_col: str, key_col: str, k: int = 32
) -> DataFrame:
    """Pairwise distinct-INTERSECTION estimates between groups from their
    KMV sketches (the theta-sketch intersection rule, public method): with
    theta = min(h_k^A, h_k^B), the hashes each sketch kept below theta are a
    uniform sample of its distinct keys, so
        |A ∩ B| ≈ |{common kept hashes < theta}| * 2^48 div theta.
    Same deterministic portable hash as kmv_distinct — bit-identical
    cross-engine, exact gate for an approximate algorithm.

    Output: (ga, gb, common_kept, theta, est_common) for every unordered
    group pair that shares at least one kept hash below theta.

    Shape: sketches are k rows per group (WindowGroupLimit); the pair stage
    is an equi-join ON THE HASH (common keys collide exactly), then one
    grouped count joined with the two k-th-hash scalars — everything
    sketch-sized, the raw table is touched once."""
    if not 2 <= k <= (1 << 15):
        raise ValueError("k must be in [2, 32768]")
    from pyspark.sql import Window

    h = F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 12), 16, 10).cast(
        "long"
    )
    dh = df.select(F.col(group_col).alias("g"), h.alias("h")).distinct()
    w = Window.partitionBy("g").orderBy("h")
    kept = dh.select("g", "h", F.row_number().over(w).alias("rn")).where(
        F.col("rn") <= k
    )
    kth = kept.groupBy("g").agg(F.max("h").alias("kth"))
    a = kept.select(F.col("g").alias("ga"), "h")
    b = kept.select(F.col("g").alias("gb"), F.col("h").alias("hb"))
    common = (
        a.join(b, (F.col("h") == F.col("hb")) & (F.col("ga") < F.col("gb")))
        .join(kth.select(F.col("g").alias("ga"), F.col("kth").alias("kth_a")), "ga")
        .join(kth.select(F.col("g").alias("gb"), F.col("kth").alias("kth_b")), "gb")
        .withColumn("theta", F.least("kth_a", "kth_b"))
        .where(F.col("h") <= F.col("theta"))
        .groupBy("ga", "gb", "theta")
        .agg(F.count(F.lit(1)).alias("common_kept"))
    )
    return common.select(
        "ga",
        "gb",
        "common_kept",
        "theta",
        F.expr(f"(common_kept * {1 << KMV_BITS}L) div theta").alias("est_common"),
    )


def sql_kmv_intersect(rows_cte: str, group_expr: str, key_expr: str, k: int = 32) -> str:
    """DuckDB twin — identical hash/theta/estimate text."""
    return f"""WITH rows_in AS ({rows_cte}),
dh AS (
  SELECT DISTINCT {group_expr} AS g,
         ('0x' || substr(md5(CAST({key_expr} AS VARCHAR)), 1, 12))::BIGINT AS h
  FROM rows_in
),
kept AS (
  SELECT g, h FROM (
    SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn FROM dh
  ) WHERE rn <= {k}
),
kth AS (SELECT g, max(h) AS kth FROM kept GROUP BY g),
common AS (
  SELECT a.g AS ga, b.g AS gb, least(ka.kth, kb.kth) AS theta, a.h
  FROM kept a JOIN kept b ON a.h = b.h AND a.g < b.g
  JOIN kth ka ON ka.g = a.g JOIN kth kb ON kb.g = b.g
)
SELECT ga, gb, count(*) AS common_kept, theta,
       (count(*) * {1 << KMV_BITS}) // theta AS est_common
FROM common WHERE h <= theta
GROUP BY ga, gb, theta"""


# --------------------------------------------------------------------------
# HyperLogLog distinct-count sketch — exact-integer emission
# --------------------------------------------------------------------------

HLL_P = 6  # 2^6 = 64 registers
HLL_M = 1 << HLL_P
HLL_W = 32 - HLL_P  # rho bits (classic 32-bit HLL)
HLL_RMAX = HLL_W + 1  # rho ∈ [1, 27]; empty register = 0
# alpha_64 = 0.709 (published constant, Flajolet et al. 2007 §4 for m=64),
# carried as the exact rational 709/1000 so the estimate stays integer
_HLL_EST_NUM = 709 * HLL_M * HLL_M * (1 << HLL_RMAX)  # 1000·E·S, ~3.9e14
_HLL_LC_MILLI = 1000 * 5 * HLL_M // 2  # small-range threshold 5m/2, in milli
_HLL_LARGE_MILLI = 1000 * (1 << 32) // 30  # large-range threshold 2^32/30


def hll_distinct(df: DataFrame, group_cols: list[str], key_col: str) -> DataFrame:
    """Approximate distinct count per group via HyperLogLog (Flajolet,
    Fusy, Gandouet & Meunier 2007 — public method), in the repo's
    portable-sketch discipline: the hash is the md5 prefix both engines
    share, registers and the raw estimate are EXACT INTEGERS, so the
    approximate sketch gets an exact cross-engine hash gate (a library HLL
    never can — its hash and float path are engine-internal).

    Classic 32-bit form, p=6: x = top 32 bits of the 48-bit md5 prefix,
    register index j = x >> 26, remainder w = x & (2^26−1),
    rho(w) = 27 − bitlength(w) (w = 0 → 27; bitlength via the engines'
    shared binary-string length — no float log2).  Register r_j = max rho.
    The indicator sum Z = Σ 2^(−r_j) is carried as the exact integer
    S = Σ 2^(27 − r_j) (absent registers contribute 2^27), so the raw
    estimate E = α₆₄ m² / Z is the exact integer division
        est_milli = 1000·E = (709·m²·2^27) div S        (α₆₄ = 709/1000).
    The published small/large-range corrections are transcendental
    (m·ln(m/V), −2^32·ln(1−E/2^32)) — the sketch emits est_kind
    ('raw' | 'linear' | 'large') decided by EXACT integer comparisons and
    emits est_milli = -1 outside the raw branch (a sentinel, not NULL —
    nullable ints floatify under pandas-path fetches), leaving the exact
    ingredients
    (n_zero, sum_sh) for the consumer's float step.  Output per group:
    (n_zero, sum_sh, est_kind, est_milli).

    Shape: distinct (group, j, rho) is skipped — ONE grouped max per
    (group, j) (map-side combined; 64 rows per group max), then one grouped
    sum: two narrow aggregates, mergeable at any parallelism — the textbook
    100 TB partial aggregate (register-wise max is associative)."""
    x = F.shiftright(
        F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 12), 16, 10).cast(
            "long"
        ),
        16,
    )  # top 32 of 48 bits
    j = F.shiftright(x, HLL_W)
    w = x.bitwiseAND(F.lit((1 << HLL_W) - 1))
    rho = F.when(w == 0, F.lit(HLL_RMAX)).otherwise(
        F.lit(HLL_RMAX) - F.length(F.conv(w, 10, 2))
    )
    regs = (
        df.select(*group_cols, j.alias("j"), rho.alias("rho"))
        .groupBy(*group_cols, "j")
        .agg(F.max("rho").alias("r"))
    )
    agg = regs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_present"),
        F.sum(F.expr(f"shiftleft(1L, {HLL_RMAX} - r)")).alias("s_present"),
    )
    base = agg.select(
        *group_cols,
        (F.lit(HLL_M) - F.col("n_present")).alias("n_zero"),
        (
            F.col("s_present")
            + (F.lit(HLL_M) - F.col("n_present")) * F.lit(1 << HLL_RMAX)
        ).alias("sum_sh"),
    )
    raw_milli = F.expr(f"{_HLL_EST_NUM}L div sum_sh")
    kind = (
        F.when((raw_milli <= _HLL_LC_MILLI) & (F.col("n_zero") > 0), F.lit("linear"))
        .when(raw_milli > _HLL_LARGE_MILLI, F.lit("large"))
        .otherwise(F.lit("raw"))
    )
    return base.select(
        *group_cols,
        "n_zero",
        "sum_sh",
        kind.alias("est_kind"),
        # non-raw branches report -1, never NULL: a nullable int output
        # column floatifies under pandas-path oracle fetches (r5 rule)
        F.when(kind == F.lit("raw"), raw_milli).otherwise(F.lit(-1)).alias("est_milli"),
    )


def sql_hll_distinct(rows_cte: str, group_cols: list[str], key_expr: str) -> str:
    """DuckDB twin — identical hash/register/estimate integer text
    (bitlength via format('{:b}', w) string length)."""
    g = ", ".join(group_cols)
    return f"""WITH rows_in AS ({rows_cte}),
hx AS (
  SELECT {g},
         (('0x' || substr(md5(CAST({key_expr} AS VARCHAR)), 1, 12))::BIGINT >> 16)
           AS x
  FROM rows_in
),
regs AS (
  SELECT {g}, x >> {HLL_W} AS j,
         max(CASE WHEN (x & {(1 << HLL_W) - 1}) = 0 THEN {HLL_RMAX}
                  ELSE {HLL_RMAX} - length(format('{{:b}}', x & {(1 << HLL_W) - 1}))
             END) AS r
  FROM hx GROUP BY {g}, j
),
agg AS (
  SELECT {g}, {HLL_M} - count(*) AS n_zero,
         CAST(sum(1::BIGINT << ({HLL_RMAX} - r)) AS BIGINT)
           + ({HLL_M} - count(*)) * {1 << HLL_RMAX} AS sum_sh
  FROM regs GROUP BY {g}
)
SELECT {g}, n_zero, sum_sh,
       CASE WHEN ({_HLL_EST_NUM} // sum_sh) <= {_HLL_LC_MILLI} AND n_zero > 0
              THEN 'linear'
            WHEN ({_HLL_EST_NUM} // sum_sh) > {_HLL_LARGE_MILLI} THEN 'large'
            ELSE 'raw' END AS est_kind,
       CAST(CASE WHEN ({_HLL_EST_NUM} // sum_sh) <= {_HLL_LC_MILLI} AND n_zero > 0
              THEN -1
            WHEN ({_HLL_EST_NUM} // sum_sh) > {_HLL_LARGE_MILLI} THEN -1
            ELSE {_HLL_EST_NUM} // sum_sh END AS BIGINT) AS est_milli
FROM agg"""


# --- Count-Min sketch (Cormode & Muthukrishnan 2005 — public method) -----------
def _cm_bucket(j: int, key_col: str, w: int) -> F.Column:
    """Portable row-j bucket: md5 prefix of 'j:key' mod w (same text both
    engines; nonnegative 48-bit value so % is engine-agnostic)."""
    s = F.concat(F.lit(f"{j}:"), F.col(key_col).cast("string"))
    return (F.conv(F.substring(F.md5(s), 1, 12), 16, 10).cast("long") % w)


def cm_sketch(df: DataFrame, key_col: str, d: int = 4, w: int = 128) -> DataFrame:
    """Build the d x w Count-Min counter table for ``key_col`` frequencies:
    one (j, bucket, cnt) row per non-empty counter. DETERMINISTIC and
    engine-neutral (md5-prefix hash discipline, same as kmv_distinct) so an
    approximate structure gates EXACTLY cross-engine.

    Shape: one exploded d-fan (d is 3-5) then a map-side-combined groupBy
    whose output is bounded by d*w — the counter table IS a partial
    aggregate (elementwise sum merges shards; merge law test-pinned), the
    property that makes it the standard 100 TB heavy-hitter pre-pass."""
    if not (1 <= d <= 16 and 2 <= w <= (1 << 20)):
        raise ValueError("d in [1,16], w in [2, 2^20]")
    rows = df.select(
        F.explode(
            F.array(*[
                F.struct(F.lit(j).alias("j"), _cm_bucket(j, key_col, w).alias("bucket"))
                for j in range(d)
            ])
        ).alias("jb")
    )
    return (
        rows.select("jb.j", "jb.bucket")
        .groupBy("j", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cm_heavy_hitters(
    df: DataFrame, key_col: str, threshold: int, d: int = 4, w: int = 128
) -> DataFrame:
    """Keys whose Count-Min frequency ESTIMATE (min over d row counters —
    always >= the true count, so the output is a guaranteed superset of the
    true heavy hitters) reaches ``threshold``. Output (key, est).

    The probe set here is the stream's own distinct keys (what an offline
    audit queries); a monitoring deployment probes its watchlist instead —
    either way the counter table is tiny and BROADCAST back, so the only
    data-sized shuffles are the sketch build and one distinct."""
    sk = cm_sketch(df, key_col, d=d, w=w)
    keys = df.select(F.col(key_col).alias("key")).distinct()
    probes = keys.select(
        "key",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(j).alias("j"),
                    _cm_bucket(j, "key", w).alias("bucket"),
                )
                for j in range(d)
            ])
        ).alias("jb"),
    ).select("key", "jb.j", "jb.bucket")
    est = (
        probes.join(F.broadcast(sk), ["j", "bucket"])
        .groupBy("key")
        .agg(F.min("cnt").alias("est"))
    )
    return est.filter(F.col("est") >= threshold).select("key", "est")


def _sql_cm_bucket(j: int, key_expr: str, w: int) -> str:
    return (
        f"(('0x' || substr(md5('{j}:' || CAST({key_expr} AS VARCHAR)), 1, 12))"
        f"::BIGINT % {w})"
    )


def sql_cm_heavy_hitters(
    rows_cte: str, key_expr: str, threshold: int, d: int = 4, w: int = 128
) -> str:
    """DuckDB twin — identical hash/bucket/min-estimate text."""
    bucket_rows = " UNION ALL ".join(
        f"SELECT {j} AS j, {_sql_cm_bucket(j, key_expr, w)} AS bucket FROM rows_in"
        for j in range(d)
    )
    probe_rows = " UNION ALL ".join(
        f"SELECT key, {j} AS j, {_sql_cm_bucket(j, 'key', w)} AS bucket FROM keys"
        for j in range(d)
    )
    return f"""WITH rows_in AS ({rows_cte}),
sk AS (SELECT j, bucket, count(*) AS cnt FROM ({bucket_rows}) GROUP BY j, bucket),
keys AS (SELECT DISTINCT {key_expr} AS key FROM rows_in),
probes AS ({probe_rows}),
est AS (
  SELECT p.key, min(sk.cnt) AS est
  FROM probes p JOIN sk ON p.j = sk.j AND p.bucket = sk.bucket
  GROUP BY p.key)
SELECT key, est FROM est WHERE est >= {threshold}"""


# --- column profiling (data-quality pass of a training-data pipeline) ----------


def profile_columns(df: DataFrame, cols: list[str], exact: bool = True) -> DataFrame:
    """One-pass Deequ-style column profile: per column
    (col, n, n_null, n_distinct, min_s, max_s).

    All per-column aggregates run in a SINGLE agg (the multi-countDistinct
    plan is one scan + one Expand of factor |cols|, all map-side partial
    before the shuffle), then the 1×(5·|cols|) row pivots to |cols| rows via
    explode of literal structs — no second pass, no per-column job.  min/max
    are taken in NATIVE type then cast to string (string-ordering "10"<"9"
    traps avoided; int→string renders identically in Spark and DuckDB, which
    is why the profile sticks to int/string columns — float→string spelling
    differs between engines).

    ``exact=False`` swaps count(DISTINCT) for approx_count_distinct (HLL++):
    the 100 TB shape — one ordinary agg, no Expand — but engine-specific, so
    the hash gate pins the exact path and the approx path is tested by
    relative-error bound in pytest."""
    aggs = []
    for c in cols:
        col = F.col(c)
        nd = (
            F.countDistinct(col)
            if exact
            else F.approx_count_distinct(col)
        )
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            F.count(col).alias(f"{c}__nn"),
            nd.alias(f"{c}__d"),
            F.min(col).cast("string").alias(f"{c}__mn"),
            F.max(col).cast("string").alias(f"{c}__mx"),
        ]
    one = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(c).alias("col"),
            F.col(f"{c}__n").alias("n"),
            (F.col(f"{c}__n") - F.col(f"{c}__nn")).alias("n_null"),
            F.col(f"{c}__d").cast("long").alias("n_distinct"),
            F.col(f"{c}__mn").alias("min_s"),
            F.col(f"{c}__mx").alias("max_s"),
        )
        for c in cols
    ]
    return one.select(F.explode(F.array(*structs)).alias("p")).select("p.*")


def sql_profile_columns(cols: list[str], table: str) -> str:
    """DuckDB twin: UNION ALL of per-column profile selects."""
    parts = [
        f"""SELECT '{c}' AS col, count(*) AS n,
  count(*) - count({c}) AS n_null,
  count(DISTINCT {c}) AS n_distinct,
  CAST(min({c}) AS VARCHAR) AS min_s, CAST(max({c}) AS VARCHAR) AS max_s
FROM {table}"""
        for c in cols
    ]
    return "\nUNION ALL\n".join(parts)


def mad_exact(df: DataFrame, keys: list[str], col: str) -> DataFrame:
    """Exact median absolute deviation per group over an integer column —
    the robust spread statistic an outlier filter actually wants (one wild
    row moves stddev arbitrarily; it moves MAD not at all).

    Two-phase exact: (1) per-group discrete median (exact_percentiles
    rank convention — the smallest k-th order statistic, matching
    quantile_disc), broadcast back as a join, (2) median of
    |x − median| by the same machinery.  Both phases aggregate to
    distinct-value-sized histograms before any window, so the raw table is
    scanned twice but never re-shuffled row-wise beyond the two hash aggs.
    Output: (keys…, med, mad) — all int64."""
    med = exact_percentiles(df, keys, col, [500]).select(
        *keys, F.col("val_q").alias("med")
    )
    dev = (
        df.filter(F.col(col).isNotNull())
        .join(F.broadcast(med), keys)
        .select(*keys, "med", F.abs(F.col(col) - F.col("med")).alias("_adev"))
    )
    mad = exact_percentiles(dev, keys, "_adev", [500]).select(
        *keys, F.col("val_q").alias("mad")
    )
    return med.join(mad, keys).select(*keys, "med", "mad")


def sql_mad_exact(table_sql: str, keys: list[str], col: str) -> str:
    """DuckDB twin via native median-of-deviations (quantile_disc twice)."""
    ks = ", ".join(keys)
    return f"""WITH base AS ({table_sql}),
m AS (SELECT {ks}, quantile_disc({col}, 0.5) AS med FROM base
      WHERE {col} IS NOT NULL GROUP BY {ks}),
d AS (SELECT b.*, m.med, abs(b.{col} - m.med) AS adev
      FROM base b JOIN m USING ({ks}) WHERE b.{col} IS NOT NULL)
SELECT {ks}, CAST(med AS BIGINT) AS med,
       CAST(quantile_disc(adev, 0.5) AS BIGINT) AS mad
FROM d GROUP BY {ks}, med"""


def cusum_bursts(
    df: DataFrame,
    key: str,
    t_col: str,
    x_col: str,
    h_mult: int = 4,
) -> DataFrame:
    """One-sided CUSUM change detection (Page 1954) over a sparse
    per-(key, t) count series — the sequential burst detector under alert
    feeds and rate-anomaly monitors.  The textbook recurrence is
    C_t = max(0, C_{t-1} + x_t - d) over DENSE time steps; this operator
    computes it WITHOUT densifying the sparse aggregate, via the closed
    form C_t = P_t - min_{0<=j<=t} P_j with P_t = sum(x) - d*(t - t0 + 1):
    inside a gap P declines linearly (x=0), so its minimum sits one step
    before the next observed row — pre_i = P_i - x_i + d — and the dense
    running min is least(0, running_min(least(P_i, pre_i))).  The drift d
    is the data-derived integer rate ceil(total/span) per key; threshold
    h = h_mult*d.  All arithmetic is int64 — no IEEE flake.

    Emits every observed step: (key, t, x, cusum, burst).  Scale shape:
    one hash agg upstream of this (caller), then ONE key-shuffle for the
    shared window sort over the AGGREGATE (t-domain-sized, not row-sized);
    unbounded per-key stats ride the same window.  No collect, no
    densify-explode (a sequence() densify at hour grain over years of keys
    would dwarf the data)."""
    wk = Window.partitionBy(key)
    wo = wk.orderBy(t_col)
    run = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d = F.col("_d")
    stats = (
        df.withColumn("_t0", F.min(t_col).over(wk))
        .withColumn("_span", F.max(t_col).over(wk) - F.col("_t0") + 1)
        .withColumn("_tot", F.sum(x_col).over(wk))
        # ceil(tot/span) in pure int64: (tot + span - 1) div span
        .withColumn("_d", (F.col("_tot") + F.col("_span") - 1) / F.col("_span"))
        .withColumn("_d", F.floor("_d").cast("long"))
    )
    p = F.sum(x_col).over(run) - d * (F.col(t_col) - F.col("_t0") + 1)
    out = (
        stats.withColumn("_p", p)
        .withColumn("_pre", F.col("_p") - F.col(x_col) + d)
        .withColumn(
            "_m", F.least(F.lit(0), F.min(F.least("_p", "_pre")).over(run))
        )
        .withColumn("cusum", F.col("_p") - F.col("_m"))
        .withColumn("burst", F.col("cusum") > F.lit(h_mult) * d)
    )
    return out.select(key, t_col, F.col(x_col).cast("long").alias(x_col), "cusum", "burst")


def sql_cusum_bursts(counts_cte: str, key: str, t_col: str, x_col: str, h_mult: int = 4) -> str:
    """DuckDB twin: the TEXTBOOK dense recurrence, literally — a recursive
    CTE walks every dense step from t0-1 (C=0) to t1, one hour at a time,
    applying greatest(0, C + x - d) with x = 0 on missing steps.  A
    genuinely different algorithm from the engine's sparse closed form;
    agreement proves the gap algebra, not just the arithmetic."""
    return f"""WITH RECURSIVE c AS ({counts_cte}),
b AS (SELECT {key}, min({t_col}) AS h0, max({t_col}) AS h1, sum({x_col}) AS tot
      FROM c GROUP BY {key}),
p AS (SELECT {key}, h0, h1,
             (tot + (h1 - h0 + 1) - 1) // (h1 - h0 + 1) AS d
      FROM b),
walk({key}, t, cum) AS (
  SELECT {key}, h0 - 1, CAST(0 AS BIGINT) FROM p
  UNION ALL
  SELECT w.{key}, w.t + 1,
         greatest(CAST(0 AS BIGINT), w.cum + coalesce(c.{x_col}, 0) - p.d)
  FROM walk w
  JOIN p ON p.{key} = w.{key}
  LEFT JOIN c ON c.{key} = w.{key} AND c.{t_col} = w.t + 1
  WHERE w.t < p.h1)
SELECT w.{key}, w.t AS {t_col}, CAST(c.{x_col} AS BIGINT) AS {x_col},
       w.cum AS cusum, (w.cum > {h_mult} * p.d) AS burst
FROM walk w
JOIN c ON c.{key} = w.{key} AND c.{t_col} = w.t
JOIN p ON p.{key} = w.{key}"""


# --- lag-k autocorrelation (seasonality detection) -----------------------------------
def autocorr_terms(
    counts: DataFrame, key: str, t_col: str, x_col: str, lag: int
) -> DataFrame:
    """Exact integer lag-``lag`` autocorrelation terms per key over a sparse
    integer time series — the seasonality detector (is traffic 24h-periodic?)
    with the Moran's-I discipline: n-scaled deviations d_t = n·x_t − S so
    the Pearson numerator/denominator are exact int64 and the division is
    never taken (autocorr = num/den downstream).

    The DENSE-series definition (missing steps count as x=0) collapses to a
    SPARSE closed form — with T = [lo, hi], n = hi−lo+1, S = Σx, Q = Σx²,
    A = Σ x_t for t ≤ hi−lag, B = Σ x_t for t ≥ lo+lag, and
    P = Σ x_t·x_{t+lag} over pairs BOTH observed:

        num = n²·P − n·S·(A + B) + (n − lag)·S²
        den = n²·Q − n·S²

    so nothing is ever densified: one aggregate for the stats, one
    equi-self-join on (key, t+lag) for P (shuffle bounded by OBSERVED
    rows), one broadcast join back.  Keys with n <= lag are dropped (no
    pairs).  Emits (key, n_steps, num, den)."""
    c = counts.select(
        F.col(key).alias("k"), F.col(t_col).alias("t"), F.col(x_col).cast("long").alias("x")
    )
    stats = c.groupBy("k").agg(
        F.min("t").alias("lo"),
        F.max("t").alias("hi"),
        F.sum("x").alias("s"),
        F.sum(F.col("x") * F.col("x")).alias("q"),
    )
    enriched = c.join(F.broadcast(stats), "k")
    ab = enriched.groupBy("k").agg(
        F.sum(F.when(F.col("t") <= F.col("hi") - lag, F.col("x")).otherwise(0)).alias("a"),
        F.sum(F.when(F.col("t") >= F.col("lo") + lag, F.col("x")).otherwise(0)).alias("b"),
    )
    p = (
        c.alias("l")
        .join(
            c.select(F.col("k"), (F.col("t") - lag).alias("t"), F.col("x").alias("x2")).alias("r"),
            ["k", "t"],
        )
        .groupBy("k")
        .agg(F.sum(F.col("x") * F.col("x2")).alias("p"))
    )
    n = F.col("hi") - F.col("lo") + 1
    return (
        stats.join(ab, "k")
        .join(p, "k", "left")
        .withColumn("p", F.coalesce("p", F.lit(0)))
        .filter(n > lag)
        .select(
            F.col("k").alias(key),
            n.alias("n_steps"),
            (
                n * n * F.col("p")
                - n * F.col("s") * (F.col("a") + F.col("b"))
                + (n - lag) * F.col("s") * F.col("s")
            ).alias("num"),
            (n * n * F.col("q") - n * F.col("s") * F.col("s")).alias("den"),
        )
    )


def sql_autocorr_terms(counts_cte: str, key: str, t_col: str, x_col: str, lag: int,
                       max_span: int = 20000) -> str:
    """DuckDB twin: DENSIFY the series (fixed-ceiling range + left join,
    missing steps x=0), form d_t = n·x_t − S directly, and take the
    definition sums — a genuinely different evaluation than the sparse
    closed form; the collapse algebra itself is on the hash."""
    return f"""WITH counts AS ({counts_cte}),
stats AS (SELECT {key} AS k, min({t_col}) AS lo, max({t_col}) AS hi
          FROM counts GROUP BY 1),
dense AS (
  SELECT s.k, s.lo + r.range AS t, coalesce(c.{x_col}, 0) AS x,
         s.hi - s.lo + 1 AS n
  FROM stats s CROSS JOIN range(0, {max_span}) r
  LEFT JOIN counts c ON c.{key} = s.k AND c.{t_col} = s.lo + r.range
  WHERE s.lo + r.range <= s.hi),
tot AS (SELECT k, sum(x) AS s FROM dense GROUP BY k),
d AS (SELECT dense.k, t, n, n * x - s AS dv FROM dense JOIN tot USING (k)),
num AS (
  SELECT a.k, sum(a.dv * b.dv) AS num
  FROM d a JOIN d b ON b.k = a.k AND b.t = a.t + {lag}
  GROUP BY a.k),
den AS (SELECT k, max(n) AS n_steps, sum(dv * dv) AS den FROM d GROUP BY k)
SELECT den.k AS {key}, CAST(n_steps AS BIGINT) AS n_steps,
       CAST(num AS BIGINT) AS num, CAST(den.den AS BIGINT) AS den
FROM den JOIN num USING (k) WHERE n_steps > {lag}"""


def groupwise_ols(
    df: DataFrame,
    keys: list[str],
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-group simple linear regression as EXACT integer rationals (the
    closed-form OLS normal equations over integer (x, y) — no float, no
    iteration): slope = slope_num/den, intercept = icept_num/den with

      slope_num = n·Σxy − Σx·Σy
      den       = n·Σx² − (Σx)²
      icept_num = Σy·Σx² − Σx·Σxy

    all exact int64 products of decimal-safe sums; degenerate groups
    (single x value → den = 0) emit their zero denominator for the caller
    to handle.  One hash aggregation — map-side partial sums, single
    shuffle on the group keys, fully whole-stage codegen: the regression
    over a trillion rows is five sums.
    """
    x = F.col(x_col).cast("long")
    y = F.col(y_col).cast("long")
    # rows with null x or y are excluded ENTIRELY so n matches the summed
    # population (count(lit(1)) with null-skipping sums would corrupt the
    # normal equations)
    df = df.filter(x.isNotNull() & y.isNotNull())
    agg = df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(x * y).alias("sxy"),
    )
    return agg.select(
        *keys,
        F.col("n"),
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).alias("slope_num"),
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).alias("den"),
        (F.col("sy") * F.col("sxx") - F.col("sx") * F.col("sxy")).alias("icept_num"),
    )


def interval_union(
    df: DataFrame,
    keys: list[str],
    start_col: str = "s",
    end_col: str = "e",
) -> DataFrame:
    """Per-key interval-set union (the sweep-line "total covered length"
    primitive behind uptime, active-time and coverage metrics): overlapping
    or touching [s, e) intervals merge; emits per key the merged-interval
    count and the total covered length.  Handles containment — the island
    break tests the RUNNING MAX of all previous ends, not just the last —
    so unsorted, nested, duplicate intervals are all correct.

    Plan: one (keys, s) sort window for the running max + island id, one
    hash agg for the per-island extents, one for the per-key rollup —
    a single Exchange on the keys."""
    from pyspark.sql import Window as W

    w = W.partitionBy(*keys).orderBy(start_col, end_col)
    prev_max_end = F.max(end_col).over(w.rowsBetween(W.unboundedPreceding, -1))
    brk = F.when(prev_max_end.isNull() | (F.col(start_col) > prev_max_end), 1).otherwise(0)
    isl = df.withColumn("_brk", brk).withColumn(
        "_gid", F.sum("_brk").over(w.rowsBetween(W.unboundedPreceding, 0))
    )
    per_island = isl.groupBy(*keys, "_gid").agg(
        F.min(start_col).alias("_s"), F.max(end_col).alias("_e")
    )
    return per_island.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.sum(F.col("_e") - F.col("_s")).alias("covered"),
    )


def mann_kendall(
    df: DataFrame,
    keys: list[str],
    order_col: str = "day",
    val_col: str = "cnt",
    z2_num: int = 4,
) -> DataFrame:
    """Mann–Kendall monotonic-trend test per key group (Mann 1945 / Kendall
    1975 — the emerging-hotspot primitive ArcGIS-style space-time analysis
    builds on): S = Σ_{i<j} sign(v_j − v_i) over the group's observations
    ordered by ``order_col``; Var(S) = n(n−1)(2n+5)/18 (no-ties form — ties
    only shrink the true variance, so this classification is conservative,
    never inflated); class 'rising' iff S > 0 and 18·S² > z²·n(n−1)(2n+5)
    with z² = ``z2_num`` (z ≈ 2 default), 'falling' symmetric, else 'flat'.

    Exact integers end to end: the sign fold, S, and the cross-multiplied
    significance inequality are all int64, so the class cannot flake at a
    threshold boundary and every sum is associative (partition-order
    invariant — the north-rule bitwise requirement).

    Plan / 100 TB shape: the i<j pair explosion runs on the per-(key, tick)
    AGGREGATE, never on raw rows — bounded by ticks-per-key² (30 days →
    ≤435 pairs per key), one equi-join on the keys + one hash agg; key skew
    is capped by the tick count, not data volume."""
    obs = df.select(*keys, F.col(order_col).alias("_t"), F.col(val_col).alias("_v"))
    left = obs
    right = obs.select(
        *keys, F.col("_t").alias("_t2"), F.col("_v").alias("_v2")
    )
    sgn = (
        F.when(F.col("_v2") > F.col("_v"), 1)
        .when(F.col("_v2") < F.col("_v"), -1)
        .otherwise(0)
    )
    s = (
        left.join(right, keys)
        .filter(F.col("_t") < F.col("_t2"))
        .groupBy(*keys)
        .agg(F.sum(sgn).cast("long").alias("s_stat"))
    )
    n = obs.groupBy(*keys).agg(F.count(F.lit(1)).cast("long").alias("n_days"))
    j = n.join(s, keys, "left").withColumn(
        "s_stat", F.coalesce(F.col("s_stat"), F.lit(0).cast("long"))
    )
    nn = F.col("n_days")
    var18 = nn * (nn - 1) * (2 * nn + 5)  # 18·Var(S), exact int64
    sig = 18 * F.col("s_stat") * F.col("s_stat") > F.lit(int(z2_num)) * var18
    trend = (
        F.when(sig & (F.col("s_stat") > 0), "rising")
        .when(sig & (F.col("s_stat") < 0), "falling")
        .otherwise("flat")
    )
    return j.select(*keys, "n_days", "s_stat", trend.alias("trend"))


def sql_mann_kendall(
    counts_cte: str, keys: list[str], order_col: str = "day",
    val_col: str = "cnt", z2_num: int = 4,
) -> str:
    """DuckDB twin of :func:`mann_kendall` over a counts CTE body — same
    integer sign fold, S, and cross-multiplied class."""
    ks = ", ".join(keys)
    on = " AND ".join(f"a.{k} = b.{k}" for k in keys)
    aks = ", ".join(f"a.{k}" for k in keys)
    nks = ", ".join(f"n.{k}" for k in keys)
    return f"""counts AS ({counts_cte}),
mk_s AS (
  SELECT {aks}, CAST(sum(CASE WHEN b.{val_col} > a.{val_col} THEN 1
                              WHEN b.{val_col} < a.{val_col} THEN -1
                              ELSE 0 END) AS BIGINT) AS s_stat
  FROM counts a JOIN counts b ON {on} AND a.{order_col} < b.{order_col}
  GROUP BY {aks}),
mk_n AS (SELECT {ks}, CAST(count(*) AS BIGINT) AS n_days FROM counts GROUP BY {ks}),
mk AS (
  SELECT {nks}, n.n_days, COALESCE(s.s_stat, 0) AS s_stat,
         CASE WHEN 18 * COALESCE(s.s_stat, 0) * COALESCE(s.s_stat, 0)
                   > {int(z2_num)} * n.n_days * (n.n_days - 1) * (2 * n.n_days + 5)
              THEN (CASE WHEN COALESCE(s.s_stat, 0) > 0 THEN 'rising'
                         WHEN COALESCE(s.s_stat, 0) < 0 THEN 'falling'
                         ELSE 'flat' END)
              ELSE 'flat' END AS trend
  FROM mk_n n LEFT JOIN mk_s s ON {" AND ".join(f"n.{k} = s.{k}" for k in keys)})"""


# lcm(1..30): every pair of time ticks <= 30 apart yields an EXACT integer
# slope key dy * (LCM // dx) — the scaled-rational trick that makes slopes
# sortable without IEEE division
_LCM_1_30 = 2329089562800


def theil_sen(
    df: DataFrame,
    keys: list[str],
    order_col: str = "day",
    val_col: str = "cnt",
    max_dx: int = 30,
) -> DataFrame:
    """Theil–Sen robust slope per key group (Theil 1950; Sen 1968) — the
    MEDIAN of all pairwise slopes (v_j − v_i)/(t_j − t_i), the
    breakdown-point-0.29 companion to the OLS fit (trend_events_daily) and
    the Mann–Kendall direction test (tile_trend_mk_z5): MK says *whether*
    a tile trends, Theil–Sen says *how fast*, immune to a burst day.

    Exactness: slopes are rationals with denominators ≤ ``max_dx``; each
    is scaled to the EXACT int64 key dy · (lcm(1..30) // dx), so ordering,
    the median pick and the emitted value never touch IEEE — bitwise at
    any parallelism.  Ties in the key are true slope ties (equal output).
    Emits (keys…, n_days, n_pairs, slope_num, slope_den) where the Theil–
    Sen slope = slope_num / slope_den (slope_den = lcm constant) and
    slope_num is the LOWER median (position (P+1)//2 of P pairs ascending).
    Groups with < 2 observations have no slope and are omitted; a tick gap
    beyond ``max_dx`` raises (the lcm would no longer divide evenly).

    100 TB shape: the i<j pair join runs on the per-(key, tick) AGGREGATE
    (≤ 435 pairs per key at 30 ticks); one keys-shuffle for the window
    median; zero IEEE anywhere."""
    if max_dx > 30:
        raise ValueError("max_dx beyond 30 needs a larger lcm constant")
    obs = df.select(*keys, F.col(order_col).alias("_t"), F.col(val_col).alias("_v"))
    right = obs.select(*keys, F.col("_t").alias("_t2"), F.col("_v").alias("_v2"))
    pairs = (
        obs.join(right, keys)
        .filter(F.col("_t") < F.col("_t2"))
        .select(
            *keys,
            (F.col("_v2") - F.col("_v")).alias("_dy"),
            (F.col("_t2") - F.col("_t")).alias("_dx"),
        )
        .withColumn(
            "_key",
            F.col("_dy")
            * F.when(F.col("_dx") <= max_dx, F.expr(f"{_LCM_1_30} div _dx")).otherwise(
                # inside the CASE so Catalyst cannot constant-fold it away;
                # fires only when a tick gap exceeds the lcm range
                F.raise_error(f"theil_sen: tick gap > {max_dx}").cast("long")
            ),
        )
    )
    w = Window.partitionBy(*keys).orderBy("_key")
    ranked = pairs.select(
        *keys,
        "_key",
        F.row_number().over(w).alias("_rn"),
        F.count(F.lit(1)).over(Window.partitionBy(*keys)).alias("n_pairs"),
    )
    med = ranked.filter(F.col("_rn") == F.expr("(n_pairs + 1) div 2")).select(
        *keys,
        F.col("n_pairs").cast("long").alias("n_pairs"),
        F.col("_key").cast("long").alias("slope_num"),
        F.lit(_LCM_1_30).cast("long").alias("slope_den"),
    )
    n = df.groupBy(*keys).agg(F.count(F.lit(1)).cast("long").alias("n_days"))
    return n.join(med, keys).select(
        *keys, "n_days", "n_pairs", "slope_num", "slope_den"
    )


def sql_theil_sen(
    counts_cte: str,
    keys: list[str],
    order_col: str = "day",
    val_col: str = "cnt",
    max_dx: int = 30,
) -> str:
    """DuckDB twin of :func:`theil_sen` — same pair join, same exact lcm
    slope key, same lower-median window pick."""
    ks = ", ".join(keys)
    on = " AND ".join(f"a.{k} = b.{k}" for k in keys)
    ka = ", ".join(f"a.{k} AS {k}" for k in keys)
    return f"""counts AS ({counts_cte}),
tpairs AS (
  SELECT {ka},
         b.{val_col} - a.{val_col} AS dy,
         b.{order_col} - a.{order_col} AS dx
  FROM counts a JOIN counts b ON {on} AND a.{order_col} < b.{order_col}),
tkeys AS (
  SELECT {ks},
         dy * (CASE WHEN dx > {max_dx}
                    THEN CAST(error('theil_sen: tick gap > {max_dx}') AS BIGINT)
                    ELSE {_LCM_1_30} // dx END) AS key
  FROM tpairs),
tranked AS (
  SELECT {ks}, key,
         row_number() OVER (PARTITION BY {ks} ORDER BY key) AS rn,
         count(*) OVER (PARTITION BY {ks}) AS n_pairs
  FROM tkeys),
tn AS (SELECT {ks}, CAST(count(*) AS BIGINT) AS n_days FROM counts GROUP BY {ks}),
ts AS (
  SELECT {ks}, CAST(n_pairs AS BIGINT) AS n_pairs, CAST(key AS BIGINT) AS slope_num,
         CAST({_LCM_1_30} AS BIGINT) AS slope_den
  FROM tranked WHERE rn = (n_pairs + 1) // 2)
SELECT tn.*, ts.n_pairs, ts.slope_num, ts.slope_den
FROM tn JOIN ts USING ({ks})"""


def kendall_tau(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    x_col: str,
    y_col: str,
    strong_num: int = 1,
    strong_den: int = 4,
) -> DataFrame:
    """Kendall τ-b rank correlation per key group (Kendall 1938; τ-b tie
    form Kendall 1945) between TWO observed measures — the bivariate
    member of the trend family (Mann–Kendall IS Kendall τ of value vs
    time; this correlates value vs value, e.g. volume vs user diversity).

    Per group over observations (x_i, y_i) ordered by ``order_col``, every
    unordered pair is classified exactly: concordant (dx·dy > 0),
    discordant (dx·dy < 0), tied in x only, tied in y only, tied in both.
    τ-b = (C−D)/√((n0−n1)(n0−n2)) with n0 = n(n−1)/2, n1 = pairs tied in
    x, n2 = pairs tied in y — the √ never evaluated: the strength class
    |τb|² ≥ strong_num/strong_den is decided by the cross-multiplied
    integer inequality strong_den·(C−D)² ≥ strong_num·(n0−n1)(n0−n2)
    (default θ² = 1/4, i.e. |τb| ≥ 0.5).  Classes: 'concordant' /
    'discordant' when strong, 'weak' otherwise, 'degenerate' when either
    marginal is constant (denominator zero — τ-b undefined).

    Exact int64 end to end — the pair classification, the five counts and
    the class inequality are all integers, so nothing flakes at a
    threshold boundary and every sum is associative (parallelism-
    invariant).

    100 TB shape: identical to mann_kendall — the i<j pair explosion runs
    on the per-(key, tick) AGGREGATE (≤435 pairs per key at 30 ticks),
    one equi-join + one hash agg; skew capped by tick count."""
    obs = df.select(
        *keys,
        F.col(order_col).alias("_t"),
        F.col(x_col).alias("_x"),
        F.col(y_col).alias("_y"),
    )
    right = obs.select(
        *keys,
        F.col("_t").alias("_t2"),
        F.col("_x").alias("_x2"),
        F.col("_y").alias("_y2"),
    )
    dx = F.col("_x2") - F.col("_x")
    dy = F.col("_y2") - F.col("_y")
    cnt = lambda c: F.sum(c.cast("long")).alias  # noqa: E731
    agg = (
        obs.join(right, keys)
        .filter(F.col("_t") < F.col("_t2"))
        .groupBy(*keys)
        .agg(
            cnt((dx * dy) > 0)("concordant"),
            cnt((dx * dy) < 0)("discordant"),
            cnt((dx == 0) & (dy != 0))("tied_x"),
            cnt((dx != 0) & (dy == 0))("tied_y"),
            cnt((dx == 0) & (dy == 0))("tied_both"),
        )
    )
    n = obs.groupBy(*keys).agg(F.count(F.lit(1)).cast("long").alias("n_obs"))
    j = n.join(agg, keys)
    # n(n-1) is always even, so div is exact integer arithmetic
    n0 = F.expr("n_obs * (n_obs - 1) div 2")
    n1 = F.col("tied_x") + F.col("tied_both")
    n2 = F.col("tied_y") + F.col("tied_both")
    den = (n0 - n1) * (n0 - n2)
    s = F.col("concordant") - F.col("discordant")
    strong = F.lit(strong_den) * s * s >= F.lit(strong_num) * den
    cls = (
        F.when(den == 0, "degenerate")
        .when(strong & (s > 0), "concordant")
        .when(strong & (s < 0), "discordant")
        .otherwise("weak")
    )
    return j.select(
        *keys,
        "n_obs",
        "concordant",
        "discordant",
        "tied_x",
        "tied_y",
        "tied_both",
        cls.alias("tau_class"),
    )


def sql_kendall_tau(
    obs_cte: str,
    keys: list[str],
    order_col: str,
    x_col: str,
    y_col: str,
    strong_num: int = 1,
    strong_den: int = 4,
) -> str:
    """DuckDB twin of :func:`kendall_tau` over an observations CTE body —
    same exact pair classification and cross-multiplied class."""
    ks = ", ".join(keys)
    on = " AND ".join(f"a.{k} = b.{k}" for k in keys)
    aks = ", ".join(f"a.{k}" for k in keys)
    dx = f"(b.{x_col} - a.{x_col})"
    dy = f"(b.{y_col} - a.{y_col})"
    return f"""obs AS ({obs_cte}),
kt_p AS (
  SELECT {aks},
         CAST(sum(CASE WHEN {dx} * {dy} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS concordant,
         CAST(sum(CASE WHEN {dx} * {dy} < 0 THEN 1 ELSE 0 END) AS BIGINT) AS discordant,
         CAST(sum(CASE WHEN {dx} = 0 AND {dy} <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS tied_x,
         CAST(sum(CASE WHEN {dx} <> 0 AND {dy} = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tied_y,
         CAST(sum(CASE WHEN {dx} = 0 AND {dy} = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tied_both
  FROM obs a JOIN obs b ON {on} AND a.{order_col} < b.{order_col}
  GROUP BY {aks}),
kt_n AS (SELECT {ks}, CAST(count(*) AS BIGINT) AS n_obs FROM obs GROUP BY {ks}),
kt AS (
  SELECT n.*, p.concordant, p.discordant, p.tied_x, p.tied_y, p.tied_both,
         CASE WHEN (n.n_obs * (n.n_obs - 1) // 2 - p.tied_x - p.tied_both)
                 * (n.n_obs * (n.n_obs - 1) // 2 - p.tied_y - p.tied_both) = 0
              THEN 'degenerate'
              WHEN {strong_den} * (p.concordant - p.discordant)
                              * (p.concordant - p.discordant)
                >= {strong_num}
                 * (n.n_obs * (n.n_obs - 1) // 2 - p.tied_x - p.tied_both)
                 * (n.n_obs * (n.n_obs - 1) // 2 - p.tied_y - p.tied_both)
              THEN (CASE WHEN p.concordant > p.discordant THEN 'concordant'
                         WHEN p.concordant < p.discordant THEN 'discordant'
                         ELSE 'weak' END)
              ELSE 'weak' END AS tau_class
  FROM kt_n n JOIN kt_p p USING ({ks}))"""


def ams_f2(
    df: DataFrame, group_cols: list[str], key_col: str, k: int = 16, g: int = 4
) -> DataFrame:
    """AMS "tug-of-war" second-frequency-moment sketch per group (Alon,
    Matias & Szegedy STOC 1996 — public method), in the portable-sketch
    discipline beside KMV/HLL/CM/Bloom: every ingredient is an exact
    integer, so the approximate sketch hash-gates cross-engine.

    Estimator i ∈ [0, k): sign_i(key) = 1 − 2·(bit 0 of the salted md5
    prefix of "i:key") ∈ {−1, +1}; s_i = Σ_rows sign_i(key) (each
    occurrence contributes, so E[s_i²] = F2 = Σ_v f_v²).  The classic
    variance-then-tail reduction is median-of-means: the k estimators
    split into ``g`` groups of k/g, G_j = Σ s_i² over group j, and the
    estimate is median(G_j)/(k/g).  The division is never taken — the
    output carries est_num = the LOWER median of the sorted group sums
    (position (g+1)//2) with est_den = k/g.  The EXACT F2 rides along
    (one extra narrow agg over per-key counts) so the estimate's quality
    is auditable row by row — and pinned within tolerance in pytest.

    Shape at 100 TB: the k sign-sums are ONE map-side-combinable hash agg
    (k conditional sums, no explode — sketch width is columnar, not
    row-multiplying); exact F2 is a per-(group, key) count then Σcnt² —
    both aggregates mergeable at any parallelism, zero joins beyond the
    final 1:1 group join."""
    if k % g:
        raise ValueError("k must divide into g equal groups")
    key_s = F.col(key_col).cast("string")
    sums = [
        F.sum(
            1
            - 2
            * F.conv(F.substring(F.md5(F.concat(F.lit(f"{i}:"), key_s)), 1, 12), 16, 10)
            .cast("long")
            .bitwiseAND(F.lit(1))
        )
        .cast("long")
        .alias(f"s{i}")
        for i in range(k)
    ]
    est = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"), *sums
    )
    m = k // g
    gsums = [
        sum(F.col(f"s{j}") * F.col(f"s{j}") for j in range(a * m, (a + 1) * m)).alias(
            f"g{a}"
        )
        for a in range(g)
    ]
    est = est.select(*group_cols, "n_rows", *gsums).select(
        *group_cols,
        "n_rows",
        F.array_sort(F.array(*[F.col(f"g{a}") for a in range(g)]))[
            (g + 1) // 2 - 1
        ].alias("est_num"),
        F.lit(m).cast("long").alias("est_den"),
    )
    exact = (
        df.groupBy(*group_cols, key_col)
        .agg(F.count(F.lit(1)).cast("long").alias("_f"))
        .groupBy(*group_cols)
        .agg(F.sum(F.col("_f") * F.col("_f")).cast("long").alias("exact_f2"))
    )
    return est.join(exact, group_cols).select(
        *group_cols, "n_rows", "exact_f2", "est_num", "est_den"
    )


def sql_ams_f2(
    rows_cte: str, group_cols: list[str], key_expr: str, k: int = 16, g: int = 4
) -> str:
    """DuckDB twin of :func:`ams_f2` — identical salted-md5 sign algebra,
    group sums and lower-median pick."""
    gc = ", ".join(group_cols)
    m = k // g
    sign = (
        lambda i: f"(1 - 2 * (('0x' || substr(md5('{i}:' || CAST({key_expr} AS VARCHAR)), 1, 12))::BIGINT & 1))"
    )
    ssums = ",\n         ".join(
        f"CAST(sum({sign(i)}) AS BIGINT) AS s{i}" for i in range(k)
    )
    gsums = ", ".join(
        "(" + " + ".join(f"s{j} * s{j}" for j in range(a * m, (a + 1) * m)) + f") AS g{a}"
        for a in range(g)
    )
    glist = ", ".join(f"g{a}" for a in range(g))
    return f"""WITH rows_in AS ({rows_cte}),
amss AS (
  SELECT {gc}, CAST(count(*) AS BIGINT) AS n_rows,
         {ssums}
  FROM rows_in GROUP BY {gc}),
amsg AS (SELECT {gc}, n_rows, {gsums} FROM amss),
amse AS (
  SELECT {gc}, n_rows,
         list_sort([{glist}])[{(g + 1) // 2}] AS est_num,
         CAST({m} AS BIGINT) AS est_den
  FROM amsg),
amsx AS (
  SELECT {gc}, CAST(sum(f * f) AS BIGINT) AS exact_f2 FROM (
    SELECT {gc}, CAST(count(*) AS BIGINT) AS f
    FROM rows_in GROUP BY {gc}, {key_expr}) GROUP BY {gc})
SELECT e.*, x.exact_f2
FROM amse e JOIN amsx x USING ({gc})"""


def contingency_assoc(
    df: DataFrame, row_col: str, col_col: str, z2: int = 4
) -> DataFrame:
    """Chi-square-family association cells of a two-way contingency table
    (Pearson 1900 lineage; Haberman 1973 adjusted residuals — public
    methods): for every (row, col) category pair the observed count O, the
    marginals R, C, N, and an EXACT enriched/depleted/none class — the
    cell-level reading of "which language × source combinations occur more
    than independence predicts".

    The adjusted residual d = (O − RC/N) / √(RC/N · (1−R/N)(1−C/N))
    crosses |d| ≥ z exactly when

        N · (N·O − R·C)² ≥ z² · R · C · (N−R) · (N−C)

    — the √ and the three divisions never evaluated; both sides are
    carried in DECIMAL(38) (HUGEINT twin), the Getis-Ord discipline.
    Sign of N·O − R·C picks enriched vs depleted.  Bounds: exact through
    N ≈ 10⁷ (N⁵ < 10³⁸); beyond that, pre-aggregate counts to a coarser
    unit (the class is scale-free) — documented, not silent.

    Shape at 100 TB: three map-side-combinable hash aggs (cells, row
    marginal, col marginal) — all of category-domain size, never row
    count — two broadcastable dimension joins, one 1-row broadcast."""
    o = df.groupBy(row_col, col_col).agg(F.count(F.lit(1)).cast("long").alias("o"))
    r = df.groupBy(row_col).agg(F.count(F.lit(1)).cast("long").alias("r_tot"))
    c = df.groupBy(col_col).agg(F.count(F.lit(1)).cast("long").alias("c_tot"))
    n = df.agg(F.count(F.lit(1)).cast("long").alias("n_tot"))
    d19 = "decimal(19,0)"
    j = (
        o.join(F.broadcast(r), row_col)
        .join(F.broadcast(c), col_col)
        .crossJoin(F.broadcast(n))
    )
    a = (
        F.col("n_tot").cast(d19) * F.col("o").cast(d19)
        - F.col("r_tot").cast(d19) * F.col("c_tot").cast(d19)
    )
    lhs = F.col("n_tot").cast(d19) * a * a
    rhs = (
        F.lit(z2).cast(d19)
        * (F.col("r_tot").cast(d19) * F.col("c_tot").cast(d19))
        * (
            (F.col("n_tot") - F.col("r_tot")).cast(d19)
            * (F.col("n_tot") - F.col("c_tot")).cast(d19)
        )
    )
    cls = (
        F.when((a > 0) & (lhs >= rhs), "enriched")
        .when((a < 0) & (lhs >= rhs), "depleted")
        .otherwise("none")
    )
    return j.select(
        row_col, col_col, "o", "r_tot", "c_tot", "n_tot", cls.alias("assoc")
    )


def sql_contingency_assoc(rows_cte: str, row_col: str, col_col: str, z2: int = 4) -> str:
    """DuckDB twin of :func:`contingency_assoc` — identical exact
    inequality in HUGEINT."""
    return f"""WITH rows_in AS ({rows_cte}),
ct_o AS (SELECT {row_col}, {col_col}, CAST(count(*) AS BIGINT) AS o
         FROM rows_in GROUP BY 1, 2),
ct_r AS (SELECT {row_col}, CAST(count(*) AS BIGINT) AS r_tot FROM rows_in GROUP BY 1),
ct_c AS (SELECT {col_col}, CAST(count(*) AS BIGINT) AS c_tot FROM rows_in GROUP BY 1),
ct_n AS (SELECT CAST(count(*) AS BIGINT) AS n_tot FROM rows_in),
ct AS (
  SELECT o.{row_col}, o.{col_col}, o.o, r.r_tot, c.c_tot, n.n_tot,
         CAST(n.n_tot AS HUGEINT) * o.o
           - CAST(r.r_tot AS HUGEINT) * c.c_tot AS a
  FROM ct_o o JOIN ct_r r USING ({row_col}) JOIN ct_c c USING ({col_col}), ct_n n)
SELECT {row_col}, {col_col}, o, r_tot, c_tot, n_tot,
       CASE WHEN a > 0 AND CAST(n_tot AS HUGEINT) * a * a
                 >= {z2} * (CAST(r_tot AS HUGEINT) * c_tot)
                         * (CAST(n_tot - r_tot AS HUGEINT) * (n_tot - c_tot))
              THEN 'enriched'
            WHEN a < 0 AND CAST(n_tot AS HUGEINT) * a * a
                 >= {z2} * (CAST(r_tot AS HUGEINT) * c_tot)
                         * (CAST(n_tot - r_tot AS HUGEINT) * (n_tot - c_tot))
              THEN 'depleted'
            ELSE 'none' END AS assoc
FROM ct"""


# Benford first-digit probabilities log10(1 + 1/d) in EXACT parts-per-million
# (published constants, Newcomb 1881 / Benford 1938; they sum to exactly 1e6)
BENFORD_PPM = (301030, 176091, 124939, 96910, 79181, 66947, 57992, 51153, 45757)


def benford_deviation(df: DataFrame, col: str, z2: int = 4) -> DataFrame:
    """Benford's-law first-digit audit of a positive integer column
    (Newcomb 1881; Benford 1938; Nigrini's forensic-accounting usage —
    public methods): per leading digit d ∈ 1..9 the observed count O, the
    total N, the published expectation in ppm, and an exact
    over/under/ok class — the fabricated-data / unit-mixing screen a
    curation pipeline runs on numeric columns.

    The binomial z-test |O − Np| ≥ z·√(Np(1−p)) crosses exactly when

        (10⁶·O − N·ppm)² ≥ z² · N · ppm · (10⁶ − ppm)

    — carried in DECIMAL(38)/HUGEINT, no float p, no √.  The leading
    digit is extracted without logs: first char of the integer's decimal
    string (identical text in both engines).  Rows with col ≤ 0 are
    excluded (leading digit undefined).

    Shape at 100 TB: one 9-bucket map-side-combinable hash agg + a 1-row
    broadcast — never more state than nine counters per partition."""
    pos = df.filter(F.col(col) > 0)
    d = F.substring(F.col(col).cast("string"), 1, 1).cast("int")
    o = pos.groupBy(d.alias("digit")).agg(F.count(F.lit(1)).cast("long").alias("o"))
    n = pos.agg(F.count(F.lit(1)).cast("long").alias("n_tot"))
    ppm = F.element_at(
        F.array(*[F.lit(p).cast("long") for p in BENFORD_PPM]), F.col("digit")
    )
    d19 = "decimal(19,0)"
    j = o.crossJoin(F.broadcast(n)).withColumn("exp_ppm", ppm)
    a = (
        F.lit(1_000_000).cast(d19) * F.col("o").cast(d19)
        - F.col("n_tot").cast(d19) * F.col("exp_ppm").cast(d19)
    )
    lhs = a * a
    rhs = (
        F.lit(z2).cast(d19)
        * (F.col("n_tot").cast(d19) * F.col("exp_ppm").cast(d19))
        * (F.lit(1_000_000) - F.col("exp_ppm")).cast(d19)
    )
    cls = (
        F.when((a > 0) & (lhs >= rhs), "over")
        .when((a < 0) & (lhs >= rhs), "under")
        .otherwise("ok")
    )
    return j.select("digit", "o", "n_tot", "exp_ppm", cls.alias("conformity"))


def sql_benford_deviation(rows_cte: str, col: str, z2: int = 4) -> str:
    """DuckDB twin of :func:`benford_deviation` — identical digit
    extraction and HUGEINT inequality."""
    ppm_arr = ", ".join(str(p) for p in BENFORD_PPM)
    return f"""WITH bf_rows AS ({rows_cte}),
bf_pos AS (SELECT {col} AS v FROM bf_rows WHERE {col} > 0),
bf_o AS (
  SELECT CAST(substr(CAST(v AS VARCHAR), 1, 1) AS INTEGER) AS digit,
         CAST(count(*) AS BIGINT) AS o
  FROM bf_pos GROUP BY 1),
bf_n AS (SELECT CAST(count(*) AS BIGINT) AS n_tot FROM bf_pos),
bf AS (
  SELECT o.digit, o.o, n.n_tot,
         ([{ppm_arr}])[o.digit] AS exp_ppm,
         CAST(1000000 AS HUGEINT) * o.o
           - CAST(n.n_tot AS HUGEINT) * ([{ppm_arr}])[o.digit] AS a
  FROM bf_o o, bf_n n)
SELECT digit, o, n_tot, CAST(exp_ppm AS BIGINT) AS exp_ppm,
       CASE WHEN a > 0 AND a * a >= {z2} * (CAST(n_tot AS HUGEINT) * exp_ppm)
                                         * (1000000 - exp_ppm) THEN 'over'
            WHEN a < 0 AND a * a >= {z2} * (CAST(n_tot AS HUGEINT) * exp_ppm)
                                         * (1000000 - exp_ppm) THEN 'under'
            ELSE 'ok' END AS conformity
FROM bf"""


# ln(40) = ln(2/0.05), the Pettitt p<=0.05 threshold constant, pinned as an
# exact rational approximation (published transcendental, fixed here so the
# significance class is pure integer arithmetic)
_PETTITT_LN40_PPM = 3_688_879


def pettitt(
    df: DataFrame,
    keys: list[str],
    order_col: str = "day",
    val_col: str = "cnt",
) -> DataFrame:
    """Pettitt change-point test per key group (Pettitt 1979 — the
    rank-based single change-point locator): over the group's observations
    ordered by ``order_col``, U_r = Σ_{i≤r<j} sign(v_j − v_i) for every
    split after rank r; K = max_r |U_r| locates the most probable change
    point, and the published approximation p ≈ 2·exp(−6K²/(n³+n²)) crosses
    0.05 exactly when 6·10⁶·K² ≥ ln(40)·10⁶·(n³+n²) with ln(40) pinned as
    the exact rational 3688879/10⁶ — all integer arithmetic, no exp.

    Completes the trend family: Mann–Kendall answers WHETHER the series
    trends, Theil–Sen HOW FAST, CUSUM flags bursts, Pettitt locates WHEN
    the level shifted.  Emits (keys…, n_obs, k_stat, u_signed, t_star,
    change_class): t_star = the ``order_col`` value of the LAST
    observation before the split (smallest rank on ties), class
    'change'/'stable', groups with < 2 observations omitted.

    100 TB shape: the pair explosion runs on the per-(key, tick) AGGREGATE
    (≤435 pairs/key at 30 ticks), each pair exploding to its ≤29 covered
    splits — O(ticks³) per key worst case, bounded by the tick count,
    never data volume; one keys-shuffle, zero IEEE."""
    w = Window.partitionBy(*keys).orderBy("_t")
    obs = df.select(
        *keys, F.col(order_col).alias("_t"), F.col(val_col).alias("_v")
    ).withColumn("_r", F.row_number().over(w))
    right = obs.select(
        *keys,
        F.col("_r").alias("_r2"),
        F.col("_v").alias("_v2"),
    )
    sgn = (
        F.when(F.col("_v2") > F.col("_v"), 1)
        .when(F.col("_v2") < F.col("_v"), -1)
        .otherwise(0)
    )
    contrib = (
        obs.join(right, keys)
        .filter(F.col("_r") < F.col("_r2"))
        .select(
            *keys,
            F.explode(F.sequence(F.col("_r"), F.col("_r2") - 1)).alias("_split"),
            sgn.alias("_s"),
        )
    )
    u = contrib.groupBy(*keys, "_split").agg(F.sum("_s").cast("long").alias("_u"))
    # packed argmax: largest |U| first, smallest split rank on ties
    key = F.abs(F.col("_u")) * F.lit(1 << 32) + (F.lit(1 << 31) - F.col("_split"))
    best = u.groupBy(*keys).agg(F.max(key).alias("_k"))
    picked = (
        best.select(
            *keys,
            (F.lit(1 << 31) - F.col("_k") % F.lit(1 << 32)).alias("_split"),
            F.expr(f"_k div {1 << 32}").alias("k_stat"),
        )
        .join(u, [*keys, "_split"])
        .join(obs.select(*keys, F.col("_r").alias("_split"), "_t"), [*keys, "_split"])
    )
    n = obs.groupBy(*keys).agg(F.count(F.lit(1)).cast("long").alias("n_obs"))
    j = n.join(picked, keys)
    sig = (
        F.lit(6_000_000) * F.col("k_stat") * F.col("k_stat")
        >= F.lit(_PETTITT_LN40_PPM)
        * (
            F.col("n_obs") * F.col("n_obs") * F.col("n_obs")
            + F.col("n_obs") * F.col("n_obs")
        )
    )
    return j.select(
        *keys,
        "n_obs",
        "k_stat",
        F.col("_u").alias("u_signed"),
        F.col("_t").alias("t_star"),
        F.when(sig, "change").otherwise("stable").alias("change_class"),
    )


def sql_pettitt(
    counts_cte: str,
    keys: list[str],
    order_col: str = "day",
    val_col: str = "cnt",
) -> str:
    """DuckDB twin of :func:`pettitt` — same ranks, split explosion,
    packed argmax and pinned-rational significance."""
    ks = ", ".join(keys)
    on = " AND ".join(f"a.{k} = b.{k}" for k in keys)
    aks = ", ".join(f"a.{k}" for k in keys)
    return f"""counts AS ({counts_cte}),
pt_obs AS (
  SELECT {ks}, {order_col} AS t, {val_col} AS v,
         row_number() OVER (PARTITION BY {ks} ORDER BY {order_col}) AS r
  FROM counts),
pt_contrib AS (
  SELECT {aks}, s.split,
         CASE WHEN b.v > a.v THEN 1 WHEN b.v < a.v THEN -1 ELSE 0 END AS sg
  FROM pt_obs a JOIN pt_obs b ON {on} AND a.r < b.r
  CROSS JOIN LATERAL (SELECT unnest(range(a.r, b.r)) AS split) s),
pt_u AS (
  SELECT {ks}, split, CAST(sum(sg) AS BIGINT) AS u
  FROM pt_contrib GROUP BY {ks}, split),
pt_best AS (
  SELECT {ks}, max(abs(u) * {1 << 32} + ({1 << 31} - split)) AS k
  FROM pt_u GROUP BY {ks}),
pt_pick AS (
  SELECT {ks}, {1 << 31} - k % {1 << 32} AS split, k // {1 << 32} AS k_stat
  FROM pt_best),
pt_n AS (SELECT {ks}, CAST(count(*) AS BIGINT) AS n_obs FROM pt_obs GROUP BY {ks}),
pt AS (
  SELECT n.*, p.k_stat, u.u AS u_signed, o.t AS t_star,
         CASE WHEN 6000000 * p.k_stat * p.k_stat
                   >= {_PETTITT_LN40_PPM}
                      * (n.n_obs * n.n_obs * n.n_obs + n.n_obs * n.n_obs)
              THEN 'change' ELSE 'stable' END AS change_class
  FROM pt_n n
  JOIN pt_pick p USING ({ks})
  JOIN pt_u u ON {" AND ".join(f"u.{k} = n.{k}" for k in keys)} AND u.split = p.split
  JOIN pt_obs o ON {" AND ".join(f"o.{k} = n.{k}" for k in keys)} AND o.r = p.split)"""


def weekday_seasonality(
    df: DataFrame, keys: list[str], dow_col: str = "dow", z2: int = 4
) -> DataFrame:
    """Day-of-week seasonality screen per key group: per (group, weekday)
    the observed count O against the uniform-week null E = N/7, classed
    over/under/flat by the EXACT binomial z-test — multiplying
    (O − N/7)² ≥ z²·N·(1/7)(6/7) through by 49 gives

        (7·O − N)² ≥ 6·z²·N

    — pure int64, no rational constants needed at all (1/7 clears
    perfectly).  The weekly-rhythm member of the temporal family:
    trend_events_daily fits level, tile_trend_mk_z5 detects drift, CUSUM
    flags bursts, this one reads the WEEKLY PROFILE (commuter tile vs
    nightlife tile vs uniform bot traffic).

    Emits (keys…, dow, o, n_tot, seasonality) — weekdays with zero events
    are absent (their O = 0 row can be derived; the class there is
    'under' whenever 36·z²·... trivially, documented).

    100 TB: one 7-bucket map-side-combinable agg per group + a group
    total — counter-sized state, no joins beyond the 1:1."""
    o = df.groupBy(*keys, dow_col).agg(F.count(F.lit(1)).cast("long").alias("o"))
    n = df.groupBy(*keys).agg(F.count(F.lit(1)).cast("long").alias("n_tot"))
    j = o.join(n, keys)
    a = F.lit(7) * F.col("o") - F.col("n_tot")
    sig = a * a >= F.lit(6 * z2) * F.col("n_tot")
    cls = (
        F.when((a > 0) & sig, "over")
        .when((a < 0) & sig, "under")
        .otherwise("flat")
    )
    return j.select(*keys, dow_col, "o", "n_tot", cls.alias("seasonality"))


def sql_weekday_seasonality(
    rows_cte: str, keys: list[str], dow_col: str = "dow", z2: int = 4
) -> str:
    """DuckDB twin of :func:`weekday_seasonality` — identical cleared
    inequality."""
    ks = ", ".join(keys)
    return f"""WITH ws_rows AS ({rows_cte}),
ws_o AS (SELECT {ks}, {dow_col}, CAST(count(*) AS BIGINT) AS o
         FROM ws_rows GROUP BY {ks}, {dow_col}),
ws_n AS (SELECT {ks}, CAST(count(*) AS BIGINT) AS n_tot FROM ws_rows GROUP BY {ks})
SELECT o.{", o.".join(keys)}, o.{dow_col}, o.o, n.n_tot,
       CASE WHEN 7 * o.o - n.n_tot > 0
                 AND (7 * o.o - n.n_tot) * (7 * o.o - n.n_tot) >= {6 * z2} * n.n_tot
              THEN 'over'
            WHEN 7 * o.o - n.n_tot < 0
                 AND (7 * o.o - n.n_tot) * (7 * o.o - n.n_tot) >= {6 * z2} * n.n_tot
              THEN 'under'
            ELSE 'flat' END AS seasonality
FROM ws_o o JOIN ws_n n USING ({ks})"""


def markov_transitions(
    df: DataFrame,
    seq_keys: list[str],
    state_col: str,
    order_cols: list[str],
) -> DataFrame:
    """First-order Markov transition matrix over per-entity state
    sequences (the maximum-likelihood chain estimate — Anderson &
    Goodman 1957): consecutive state bigrams within each ``seq_keys``
    entity (ordered by ``order_cols`` — include a unique tiebreaker so
    the sequence is total), pooled into global transition counts.  Emits
    one row per observed (from_state, to_state): (from_state, to_state,
    cnt, row_total, is_mode) — the MLE P(to|from) is the exact rational
    cnt/row_total (division never taken), and is_mode marks the argmax
    next state with ties to the lexicographically smallest (pinned).

    The sequential companion to collocations_pmi (which tests bigram
    ASSOCIATION): this estimates the DYNAMICS a sessionization or
    next-event model consumes.

    100 TB: one entity-keyed window (lag) + two map-side-combinable hash
    aggs on the state-domain-sized matrix; no floats."""
    w = Window.partitionBy(*seq_keys).orderBy(*order_cols)
    steps = (
        df.select(*seq_keys, F.col(state_col).alias("_s"), *order_cols)
        .withColumn("_prev", F.lag("_s").over(w))
        .filter(F.col("_prev").isNotNull())
    )
    cnt = steps.groupBy(
        F.col("_prev").alias("from_state"), F.col("_s").alias("to_state")
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    tot = cnt.groupBy("from_state").agg(
        F.sum("cnt").cast("long").alias("row_total")
    )
    wm = Window.partitionBy("from_state").orderBy(
        F.col("cnt").desc(), F.col("to_state").asc()
    )
    return (
        cnt.join(tot, "from_state")
        .withColumn("_rn", F.row_number().over(wm))
        .select(
            "from_state",
            "to_state",
            "cnt",
            "row_total",
            (F.col("_rn") == 1).alias("is_mode"),
        )
    )


def sql_markov_transitions(
    rows_cte: str, seq_keys: list[str], state_col: str, order_cols: list[str]
) -> str:
    """DuckDB twin of :func:`markov_transitions` — identical lag window,
    counts and pinned mode pick."""
    sk = ", ".join(seq_keys)
    oc = ", ".join(order_cols)
    return f"""WITH mk_rows AS ({rows_cte}),
mk_steps AS (
  SELECT lag({state_col}) OVER (PARTITION BY {sk} ORDER BY {oc}) AS from_state,
         {state_col} AS to_state
  FROM mk_rows),
mk_cnt AS (
  SELECT from_state, to_state, CAST(count(*) AS BIGINT) AS cnt
  FROM mk_steps WHERE from_state IS NOT NULL GROUP BY 1, 2),
mk_tot AS (SELECT from_state, CAST(sum(cnt) AS BIGINT) AS row_total
           FROM mk_cnt GROUP BY 1)
SELECT c.from_state, c.to_state, c.cnt, t.row_total,
       row_number() OVER (PARTITION BY c.from_state
                          ORDER BY c.cnt DESC, c.to_state ASC) = 1 AS is_mode
FROM mk_cnt c JOIN mk_tot t USING (from_state)"""


def isotonic_fit(
    df: DataFrame,
    keys: list[str],
    order_col: str = "day",
    val_col: str = "cnt",
    max_n: int = 30,
) -> DataFrame:
    """EXACT isotonic regression per key group (least-squares monotone
    fit; Barlow, Bartholomew, Bremner & Brunk 1972) — computed NOT by the
    sequential pool-adjacent-violators scan but by the closed MINIMAX
    identity

        fit(t) = max_{i ≤ t} min_{j ≥ t} mean(x_i .. x_j)

    which is pure relational algebra: explode every (i, j, t) with
    i ≤ t ≤ j on the per-(key, tick) AGGREGATE, then one grouped min and
    one grouped max.  Rational means never divide: mean = S/L is carried
    as the exact integer S·(lcm(1..30)//L) in DECIMAL(38) (HUGEINT twin),
    a canonical representation because the scale is a CONSTANT — min/max
    of the scaled keys equal min/max of the rationals.  Emits (keys…, t,
    n_obs, fit_num, fit_den) with fit = fit_num/fit_den, fit_den = lcm —
    exact int64 output for values up to ~4·10⁶ (num < 2⁶³/lcm); groups
    longer than ``max_n`` ticks raise (the lcm constant covers 30).

    Pool-adjacent-violators is an inherently sequential scan; the minimax
    form trades O(n) sequential for O(n³) parallel rows per group — at
    tick-rollup sizes (≤30) that is ≤27 000 rows per key, each a codegen
    arithmetic row.  The fitted sequence is nondecreasing, equals the
    input when already monotone, and pools violators to their mean —
    all law-tested against a Fraction PAVA reference."""
    w = Window.partitionBy(*keys).orderBy("_t")
    obs = (
        df.select(*keys, F.col(order_col).alias("_t"), F.col(val_col).alias("_v"))
        .withColumn("_r", F.row_number().over(w))
        .withColumn("_p", F.sum("_v").over(w).cast("long"))  # prefix sum
        .withColumn("_n", F.count(F.lit(1)).over(Window.partitionBy(*keys)))
    )
    guard = F.when(
        F.col("_n") <= max_n, F.col("_r")
    ).otherwise(F.raise_error(f"isotonic_fit: group exceeds {max_n} ticks").cast("int"))
    obs = obs.withColumn("_r", guard)
    left = obs.select(
        *keys, F.col("_r").alias("_i"), (F.col("_p") - F.col("_v")).alias("_pi")
    )
    right = obs.select(*keys, F.col("_r").alias("_j"), F.col("_p").alias("_pj"))
    d38 = "decimal(38,0)"
    pairs = (
        left.join(right, keys)
        .filter(F.col("_i") <= F.col("_j"))
        .select(
            *keys,
            "_i",
            "_j",
            (
                (F.col("_pj") - F.col("_pi")).cast(d38)
                * F.expr(f"CAST({_LCM_1_30} div (_j - _i + 1) AS {d38})")
            ).alias("_key"),
        )
    )
    spans = pairs.select(
        *keys,
        "_i",
        F.explode(F.sequence(F.col("_i"), F.col("_j"))).alias("_tt"),
        "_key",
    )
    inner = spans.groupBy(*keys, "_tt", "_i").agg(F.min("_key").alias("_mn"))
    outer = inner.groupBy(*keys, "_tt").agg(F.max("_mn").alias("_fit"))
    return (
        outer.join(obs.select(*keys, F.col("_r").alias("_tt"), "_t", "_n"), [*keys, "_tt"])
        .select(
            *keys,
            F.col("_t").alias(order_col),
            F.col("_n").cast("long").alias("n_obs"),
            F.col("_fit").cast("long").alias("fit_num"),
            F.lit(_LCM_1_30).cast("long").alias("fit_den"),
        )
    )


def sql_isotonic_fit(
    counts_cte: str,
    keys: list[str],
    order_col: str = "day",
    val_col: str = "cnt",
    max_n: int = 30,
) -> str:
    """DuckDB twin of :func:`isotonic_fit` — same minimax explode in
    HUGEINT."""
    ks = ", ".join(keys)
    on = " AND ".join(f"a.{k} = b.{k}" for k in keys)
    aks = ", ".join(f"a.{k}" for k in keys)
    return f"""counts AS ({counts_cte}),
iso_obs AS (
  SELECT {ks}, {order_col} AS t, {val_col} AS v,
         row_number() OVER (PARTITION BY {ks} ORDER BY {order_col}) AS r,
         sum({val_col}) OVER (PARTITION BY {ks} ORDER BY {order_col}) AS p,
         count(*) OVER (PARTITION BY {ks}) AS n
  FROM counts),
iso_g AS (
  SELECT *, CASE WHEN n <= {max_n} THEN r
                 ELSE CAST(error('isotonic_fit: group exceeds {max_n} ticks') AS BIGINT)
            END AS rg
  FROM iso_obs),
iso_pairs AS (
  SELECT {aks}, a.rg AS i, b.rg AS j,
         CAST(b.p - (a.p - a.v) AS HUGEINT)
           * ({_LCM_1_30} // (b.rg - a.rg + 1)) AS key
  FROM iso_g a JOIN iso_g b ON {on} AND a.rg <= b.rg),
iso_spans AS (
  SELECT {ks}, i, s.tt, key
  FROM iso_pairs
  CROSS JOIN LATERAL (SELECT unnest(range(i, j + 1)) AS tt) s),
iso_inner AS (
  SELECT {ks}, tt, i, min(key) AS mn FROM iso_spans GROUP BY {ks}, tt, i),
iso_outer AS (
  SELECT {ks}, tt, max(mn) AS fit FROM iso_inner GROUP BY {ks}, tt),
iso AS (
  SELECT o.{", o.".join(keys)}, g.t AS {order_col},
         CAST(g.n AS BIGINT) AS n_obs,
         CAST(o.fit AS BIGINT) AS fit_num,
         CAST({_LCM_1_30} AS BIGINT) AS fit_den
  FROM iso_outer o
  JOIN iso_g g ON {" AND ".join(f"g.{k} = o.{k}" for k in keys)} AND g.rg = o.tt)"""


# KS two-sample critical coefficient c(alpha=0.05)^2 = 1.358^2, pinned as the
# exact rational 1844/1000 (published constant, fixed so the drift class is
# pure integer arithmetic)
_KS_C2_MILLI = 1844


def ks_two_sample(
    df: DataFrame, group_col: str, val_col: str, c2_milli: int = _KS_C2_MILLI
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov distribution-drift test between every
    pair of groups (Kolmogorov 1933; Smirnov 1939; the standard
    distribution-shift screen a curation pipeline runs between shards /
    sources / snapshots): D = max_v |F̂_a(v) − F̂_b(v)| over the pooled
    value domain, carried EXACTLY as

        d_num = max_v |n_b·C_a(v) − n_a·C_b(v)|,   D = d_num/(n_a·n_b)

    and the α = 0.05 rejection D > c·√((n_a+n_b)/(n_a·n_b)) cleared of
    the root: 1000·d_num² ≥ c²₁₀₀₀·(n_a+n_b)·n_a·n_b with c² pinned as
    1844/1000 — DECIMAL(38)/HUGEINT, no IEEE anywhere.  Emits one row per
    unordered group pair: (ga, gb, n_a, n_b, d_num, d_den, drift) with
    drift ∈ {'shifted','same'}.

    Shape at 100 TB: histograms are map-side-combined to value-domain
    size; each pair's CDF walk is ONE window over its pooled distinct
    values (pairs × |V| rows — domain-bounded, not data-bounded)."""
    h = df.groupBy(group_col, val_col).agg(
        F.count(F.lit(1)).cast("long").alias("_c")
    )
    n = df.groupBy(group_col).agg(F.count(F.lit(1)).cast("long").alias("_n"))
    ga = n.select(F.col(group_col).alias("ga"), F.col("_n").alias("n_a"))
    gb = n.select(F.col(group_col).alias("gb"), F.col("_n").alias("n_b"))
    pairs = ga.crossJoin(gb).filter(F.col("ga") < F.col("gb"))
    rows = (
        pairs.join(
            h.withColumnRenamed(group_col, "_g"),
            (F.col("_g") == F.col("ga")) | (F.col("_g") == F.col("gb")),
        )
        .groupBy("ga", "gb", "n_a", "n_b", val_col)
        .agg(
            F.sum(F.when(F.col("_g") == F.col("ga"), F.col("_c")).otherwise(0)).alias("_ca"),
            F.sum(F.when(F.col("_g") == F.col("gb"), F.col("_c")).otherwise(0)).alias("_cb"),
        )
    )
    w = (
        Window.partitionBy("ga", "gb")
        .orderBy(val_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    d38 = "decimal(38,0)"
    cum = rows.select(
        "ga",
        "gb",
        "n_a",
        "n_b",
        F.abs(
            F.col("n_b").cast(d38) * F.sum("_ca").over(w).cast(d38)
            - F.col("n_a").cast(d38) * F.sum("_cb").over(w).cast(d38)
        ).alias("_d"),
    )
    agg = cum.groupBy("ga", "gb", "n_a", "n_b").agg(F.max("_d").alias("_dmax"))
    sig = F.lit(1000).cast(d38) * F.col("_dmax") * F.col("_dmax") >= (
        F.lit(c2_milli).cast(d38)
        * (F.col("n_a") + F.col("n_b")).cast(d38)
        * F.col("n_a").cast(d38)
        * F.col("n_b").cast(d38)
    )
    return agg.select(
        "ga",
        "gb",
        "n_a",
        "n_b",
        F.col("_dmax").cast("long").alias("d_num"),
        (F.col("n_a") * F.col("n_b")).cast("long").alias("d_den"),
        F.when(sig, "shifted").otherwise("same").alias("drift"),
    )


def sql_ks_two_sample(
    rows_cte: str, group_col: str, val_col: str, c2_milli: int = _KS_C2_MILLI
) -> str:
    """DuckDB twin of :func:`ks_two_sample` — identical pooled-CDF walk
    and cleared inequality in HUGEINT."""
    return f"""WITH ks_rows AS ({rows_cte}),
ks_h AS (SELECT {group_col} AS g, {val_col} AS v, CAST(count(*) AS BIGINT) AS c
         FROM ks_rows GROUP BY 1, 2),
ks_n AS (SELECT {group_col} AS g, CAST(count(*) AS BIGINT) AS n
         FROM ks_rows GROUP BY 1),
ks_p AS (SELECT a.g AS ga, b.g AS gb, a.n AS n_a, b.n AS n_b
         FROM ks_n a JOIN ks_n b ON a.g < b.g),
ks_m AS (
  SELECT p.ga, p.gb, p.n_a, p.n_b, h.v,
         CAST(sum(CASE WHEN h.g = p.ga THEN h.c ELSE 0 END) AS BIGINT) AS ca,
         CAST(sum(CASE WHEN h.g = p.gb THEN h.c ELSE 0 END) AS BIGINT) AS cb
  FROM ks_p p JOIN ks_h h ON h.g = p.ga OR h.g = p.gb
  GROUP BY 1, 2, 3, 4, 5),
ks_c AS (
  SELECT ga, gb, n_a, n_b,
         abs(CAST(n_b AS HUGEINT)
               * sum(ca) OVER (PARTITION BY ga, gb ORDER BY v
                               ROWS UNBOUNDED PRECEDING)
             - CAST(n_a AS HUGEINT)
               * sum(cb) OVER (PARTITION BY ga, gb ORDER BY v
                               ROWS UNBOUNDED PRECEDING)) AS d
  FROM ks_m),
ks AS (SELECT ga, gb, n_a, n_b, max(d) AS dmax
       FROM ks_c GROUP BY 1, 2, 3, 4)
SELECT ga, gb, n_a, n_b, CAST(dmax AS BIGINT) AS d_num,
       CAST(n_a * n_b AS BIGINT) AS d_den,
       CASE WHEN 1000 * dmax * dmax
                 >= {c2_milli} * CAST(n_a + n_b AS HUGEINT) * n_a * n_b
            THEN 'shifted' ELSE 'same' END AS drift
FROM ks"""


def mann_whitney_u(df: DataFrame, group_col: str, val_col: str, z2: int = 4) -> DataFrame:
    """Mann–Whitney U rank-sum test between every pair of groups (Mann &
    Whitney 1947; Wilcoxon 1945) — the LOCATION-shift cousin of
    ks_two_sample (KS sees any shape change; U sees stochastic
    dominance): U = #{(a, b) : x_a > x_b} + ½·ties, carried exactly as
    u2 = 2·wins + ties (the ½ never divides), computed from the pooled
    VALUE HISTOGRAMS — wins = Σ_v c_a(v)·C_b(v⁻) — so no pair explosion
    ever touches row space.  The normal-approximation rejection
    |U − n_a n_b/2| ≥ z·√(n_a n_b(n_a+n_b+1)/12) clears to

        3·(u2 − n_a·n_b)² ≥ z²·n_a·n_b·(n_a + n_b + 1)

    in DECIMAL(38)/HUGEINT (no-ties variance — ties only shrink it, so
    the class is conservative, the mann_kendall convention).  Emits
    (ga, gb, n_a, n_b, u2, shift ∈ {'greater','less','same'}) — 'greater'
    means group a stochastically dominates.

    100 TB: histograms map-side-combine to value-domain size; each pair
    is one window walk over pooled distinct values — domain-bounded."""
    h = df.groupBy(group_col, val_col).agg(
        F.count(F.lit(1)).cast("long").alias("_c")
    )
    n = df.groupBy(group_col).agg(F.count(F.lit(1)).cast("long").alias("_n"))
    ga = n.select(F.col(group_col).alias("ga"), F.col("_n").alias("n_a"))
    gb = n.select(F.col(group_col).alias("gb"), F.col("_n").alias("n_b"))
    pairs = ga.crossJoin(gb).filter(F.col("ga") < F.col("gb"))
    rows = (
        pairs.join(
            h.withColumnRenamed(group_col, "_g"),
            (F.col("_g") == F.col("ga")) | (F.col("_g") == F.col("gb")),
        )
        .groupBy("ga", "gb", "n_a", "n_b", val_col)
        .agg(
            F.sum(F.when(F.col("_g") == F.col("ga"), F.col("_c")).otherwise(0)).alias("_ca"),
            F.sum(F.when(F.col("_g") == F.col("gb"), F.col("_c")).otherwise(0)).alias("_cb"),
        )
    )
    w = (
        Window.partitionBy("ga", "gb")
        .orderBy(val_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    terms = rows.select(
        "ga",
        "gb",
        "n_a",
        "n_b",
        (F.col("_ca") * F.coalesce(F.sum("_cb").over(w), F.lit(0))).alias("_win"),
        (F.col("_ca") * F.col("_cb")).alias("_tie"),
    )
    agg = terms.groupBy("ga", "gb", "n_a", "n_b").agg(
        (F.lit(2) * F.sum("_win") + F.sum("_tie")).cast("long").alias("u2")
    )
    d38 = "decimal(38,0)"
    a = F.col("u2").cast(d38) - F.col("n_a").cast(d38) * F.col("n_b").cast(d38)
    sig = F.lit(3).cast(d38) * a * a >= (
        F.lit(z2).cast(d38)
        * F.col("n_a").cast(d38)
        * F.col("n_b").cast(d38)
        * (F.col("n_a") + F.col("n_b") + 1).cast(d38)
    )
    cls = (
        F.when(sig & (a > 0), "greater")
        .when(sig & (a < 0), "less")
        .otherwise("same")
    )
    return agg.select("ga", "gb", "n_a", "n_b", "u2", cls.alias("shift"))


def sql_mann_whitney_u(
    rows_cte: str, group_col: str, val_col: str, z2: int = 4
) -> str:
    """DuckDB twin of :func:`mann_whitney_u`."""
    return f"""WITH mw_rows AS ({rows_cte}),
mw_h AS (SELECT {group_col} AS g, {val_col} AS v, CAST(count(*) AS BIGINT) AS c
         FROM mw_rows GROUP BY 1, 2),
mw_n AS (SELECT {group_col} AS g, CAST(count(*) AS BIGINT) AS n
         FROM mw_rows GROUP BY 1),
mw_p AS (SELECT a.g AS ga, b.g AS gb, a.n AS n_a, b.n AS n_b
         FROM mw_n a JOIN mw_n b ON a.g < b.g),
mw_m AS (
  SELECT p.ga, p.gb, p.n_a, p.n_b, h.v,
         CAST(sum(CASE WHEN h.g = p.ga THEN h.c ELSE 0 END) AS BIGINT) AS ca,
         CAST(sum(CASE WHEN h.g = p.gb THEN h.c ELSE 0 END) AS BIGINT) AS cb
  FROM mw_p p JOIN mw_h h ON h.g = p.ga OR h.g = p.gb
  GROUP BY 1, 2, 3, 4, 5),
mw_t AS (
  SELECT ga, gb, n_a, n_b,
         ca * COALESCE(sum(cb) OVER (PARTITION BY ga, gb ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS win,
         ca * cb AS tie
  FROM mw_m),
mw AS (SELECT ga, gb, n_a, n_b,
              CAST(2 * sum(win) + sum(tie) AS BIGINT) AS u2
       FROM mw_t GROUP BY 1, 2, 3, 4)
SELECT ga, gb, n_a, n_b, u2,
       CASE WHEN 3 * (CAST(u2 AS HUGEINT) - CAST(n_a AS HUGEINT) * n_b)
                  * (CAST(u2 AS HUGEINT) - CAST(n_a AS HUGEINT) * n_b)
                 >= {z2} * CAST(n_a AS HUGEINT) * n_b * (n_a + n_b + 1)
            THEN (CASE WHEN u2 > CAST(n_a AS HUGEINT) * n_b THEN 'greater'
                       WHEN u2 < CAST(n_a AS HUGEINT) * n_b THEN 'less'
                       ELSE 'same' END)
            ELSE 'same' END AS shift
FROM mw"""


def siegel_slope(
    df: DataFrame,
    keys: list[str],
    order_col: str = "day",
    val_col: str = "cnt",
    max_dx: int = 30,
) -> DataFrame:
    """Siegel repeated-median slope per key group (Siegel Biometrika
    1982) — the 50 %-BREAKDOWN member completing the robust-trend ladder
    (OLS breaks at 0 %, Theil–Sen at 29 %, the repeated median holds to
    half the data being corrupt): per observation i the MEDIAN over j≠i
    of slope(i, j), then the MEDIAN over i of those medians.

    Exactness is the theil_sen discipline: every slope is the exact
    int64 key dy'·(lcm(1..30) // |dx|) with dy' sign-folded so the key
    equals slope·lcm regardless of pair order; both median layers are
    lower medians (position (P+1)//2) over exact keys — no IEEE
    anywhere, bitwise at any parallelism.  Emits (keys…, n_obs,
    slope_num, slope_den = lcm); groups with < 2 observations are
    omitted; tick gaps beyond ``max_dx`` raise in BOTH engines.

    100 TB: the i×j explosion runs on the per-(key, tick) AGGREGATE
    (≤ 30·29 ordered pairs per key), two window medians."""
    if max_dx > 30:
        raise ValueError("max_dx beyond 30 needs a larger lcm constant")
    obs = df.select(*keys, F.col(order_col).alias("_t"), F.col(val_col).alias("_v"))
    right = obs.select(*keys, F.col("_t").alias("_t2"), F.col("_v").alias("_v2"))
    dx = F.col("_t2") - F.col("_t")
    dy = F.col("_v2") - F.col("_v")
    dys = F.when(dx < 0, -dy).otherwise(dy)
    dxa = F.abs(dx)
    key = dys * F.when(
        dxa <= max_dx, F.expr(f"{_LCM_1_30} div abs(_t2 - _t)")
    ).otherwise(F.raise_error(f"siegel_slope: tick gap > {max_dx}").cast("long"))
    pairs = (
        obs.join(right, keys)
        .filter(F.col("_t") != F.col("_t2"))
        .select(*keys, "_t", key.alias("_key"))
    )
    wi = Window.partitionBy(*keys, "_t").orderBy("_key")
    med_i = (
        pairs.select(
            *keys,
            "_t",
            "_key",
            F.row_number().over(wi).alias("_rn"),
            F.count(F.lit(1)).over(Window.partitionBy(*keys, "_t")).alias("_np"),
        )
        .filter(F.col("_rn") == F.expr("(_np + 1) div 2"))
        .select(*keys, F.col("_key").alias("_med"))
    )
    wk = Window.partitionBy(*keys).orderBy("_med")
    final = (
        med_i.select(
            *keys,
            "_med",
            F.row_number().over(wk).alias("_rn"),
            F.count(F.lit(1)).over(Window.partitionBy(*keys)).alias("_nm"),
        )
        .filter(F.col("_rn") == F.expr("(_nm + 1) div 2"))
        .select(
            *keys,
            F.col("_nm").cast("long").alias("n_obs"),
            F.col("_med").cast("long").alias("slope_num"),
            F.lit(_LCM_1_30).cast("long").alias("slope_den"),
        )
    )
    return final


def sql_siegel_slope(
    counts_cte: str,
    keys: list[str],
    order_col: str = "day",
    val_col: str = "cnt",
    max_dx: int = 30,
) -> str:
    """DuckDB twin of :func:`siegel_slope` — same sign-folded keys and
    two lower-median layers."""
    ks = ", ".join(keys)
    on = " AND ".join(f"a.{k} = b.{k}" for k in keys)
    aks = ", ".join(f"a.{k}" for k in keys)
    return f"""counts AS ({counts_cte}),
sg_pairs AS (
  SELECT {aks}, a.{order_col} AS t,
         (CASE WHEN b.{order_col} < a.{order_col}
               THEN a.{val_col} - b.{val_col}
               ELSE b.{val_col} - a.{val_col} END)
           * (CASE WHEN abs(b.{order_col} - a.{order_col}) > {max_dx}
                   THEN CAST(error('siegel_slope: tick gap > {max_dx}') AS BIGINT)
                   ELSE {_LCM_1_30} // abs(b.{order_col} - a.{order_col}) END)
           AS key
  FROM counts a JOIN counts b ON {on} AND a.{order_col} <> b.{order_col}),
sg_medi AS (
  SELECT {ks}, key AS med FROM (
    SELECT {ks}, t, key,
           row_number() OVER (PARTITION BY {ks}, t ORDER BY key) AS rn,
           count(*) OVER (PARTITION BY {ks}, t) AS np
    FROM sg_pairs)
  WHERE rn = (np + 1) // 2),
sg AS (
  SELECT {ks}, CAST(nm AS BIGINT) AS n_obs, CAST(med AS BIGINT) AS slope_num,
         CAST({_LCM_1_30} AS BIGINT) AS slope_den
  FROM (
    SELECT {ks}, med,
           row_number() OVER (PARTITION BY {ks} ORDER BY med) AS rn,
           count(*) OVER (PARTITION BY {ks}) AS nm
    FROM sg_medi)
  WHERE rn = (nm + 1) // 2)"""


def runs_test(
    df: DataFrame,
    keys: list[str],
    order_col: str = "day",
    val_col: str = "cnt",
    z2: int = 4,
) -> DataFrame:
    """Wald–Wolfowitz runs test per key group (Wald & Wolfowitz 1940) —
    the RANDOMNESS screen of the temporal family: dichotomize the series
    at its own exact lower median (values strictly above → '+', at or
    below → '−'), count the runs R, and test against the number expected
    from an exchangeable sequence.  Too FEW runs = trending/sticky; too
    MANY = oscillating/overdispersed; in between = consistent with
    random order.

    With n₁ pluses, n₂ minuses, n = n₁+n₂: E[R] = 1 + 2n₁n₂/n and
    Var[R] = 2n₁n₂(2n₁n₂−n) / (n²(n−1)); |R−E| ≥ z·σ clears to

        ((R−1)·n − 2n₁n₂)² · (n−1) ≥ 2z²·n₁n₂·(2n₁n₂−n)

    — exact int64 at tick-rollup sizes.  Emits (keys…, n_obs, n_plus,
    n_runs, run_class ∈ {'sticky','oscillating','random','degenerate'})
    (degenerate when either side is empty — Var undefined).

    100 TB: one window median + one lag scan per key on the AGGREGATE."""
    w = Window.partitionBy(*keys).orderBy("_v")
    obs = df.select(*keys, F.col(order_col).alias("_t"), F.col(val_col).alias("_v"))
    ranked = obs.withColumn("_rn", F.row_number().over(w)).withColumn(
        "_n", F.count(F.lit(1)).over(Window.partitionBy(*keys))
    )
    med = ranked.filter(F.col("_rn") == F.expr("(_n + 1) div 2")).select(
        *keys, F.col("_v").alias("_med")
    )
    signed = obs.join(med, keys).select(
        *keys, "_t", (F.col("_v") > F.col("_med")).cast("int").alias("_s")
    )
    wt = Window.partitionBy(*keys).orderBy("_t")
    runs = signed.withColumn("_prev", F.lag("_s").over(wt)).groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n_obs"),
        F.sum("_s").cast("long").alias("n_plus"),
        (
            F.sum(
                (F.col("_prev").isNull() | (F.col("_s") != F.col("_prev"))).cast("long")
            )
        ).cast("long").alias("n_runs"),
    )
    n1 = F.col("n_plus")
    n2 = F.col("n_obs") - F.col("n_plus")
    n = F.col("n_obs")
    a = (F.col("n_runs") - 1) * n - 2 * n1 * n2
    sig = a * a * (n - 1) >= F.lit(2 * z2) * n1 * n2 * (2 * n1 * n2 - n)
    cls = (
        F.when((n1 == 0) | (n2 == 0), "degenerate")
        .when(sig & (a < 0), "sticky")
        .when(sig & (a > 0), "oscillating")
        .otherwise("random")
    )
    return runs.select(*keys, "n_obs", "n_plus", "n_runs", cls.alias("run_class"))


def sql_runs_test(
    counts_cte: str,
    keys: list[str],
    order_col: str = "day",
    val_col: str = "cnt",
    z2: int = 4,
) -> str:
    """DuckDB twin of :func:`runs_test` — same median split, lag scan and
    cleared inequality."""
    ks = ", ".join(keys)
    return f"""counts AS ({counts_cte}),
rt_med AS (
  SELECT {ks}, v AS med FROM (
    SELECT {ks}, {val_col} AS v,
           row_number() OVER (PARTITION BY {ks} ORDER BY {val_col}) AS rn,
           count(*) OVER (PARTITION BY {ks}) AS n
    FROM counts)
  WHERE rn = (n + 1) // 2),
rt_signed AS (
  SELECT {ks}, c.{order_col} AS t,
         CASE WHEN c.{val_col} > m.med THEN 1 ELSE 0 END AS s
  FROM counts c JOIN rt_med m USING ({ks})),
rt_runs AS (
  SELECT {ks}, CAST(count(*) AS BIGINT) AS n_obs,
         CAST(sum(s) AS BIGINT) AS n_plus,
         CAST(sum(CASE WHEN prev IS NULL OR s <> prev THEN 1 ELSE 0 END)
              AS BIGINT) AS n_runs
  FROM (SELECT {ks}, s,
               lag(s) OVER (PARTITION BY {ks} ORDER BY t) AS prev
        FROM rt_signed)
  GROUP BY {ks}),
rt AS (
  SELECT {ks}, n_obs, n_plus, n_runs,
         CASE WHEN n_plus = 0 OR n_obs - n_plus = 0 THEN 'degenerate'
              WHEN ((n_runs - 1) * n_obs - 2 * n_plus * (n_obs - n_plus))
                   * ((n_runs - 1) * n_obs - 2 * n_plus * (n_obs - n_plus))
                   * (n_obs - 1)
                   >= {2 * z2} * n_plus * (n_obs - n_plus)
                      * (2 * n_plus * (n_obs - n_plus) - n_obs)
              THEN (CASE WHEN (n_runs - 1) * n_obs
                              < 2 * n_plus * (n_obs - n_plus)
                         THEN 'sticky' ELSE 'oscillating' END)
              ELSE 'random' END AS run_class
  FROM rt_runs)"""


def tukey_outliers(
    df: DataFrame,
    keys: list[str],
    val_col: str = "cnt",
) -> DataFrame:
    """Tukey-fence outlier screen per key group (Tukey, Exploratory Data
    Analysis 1977 — the boxplot rule): quartiles by the repo's exact
    discrete-quantile convention (k = max(1, ceil(q·n)), the
    quantile_disc rank), and the 1.5·IQR fences cleared of their halves:

        low  outlier ⟺ 2·v < 5·q1 − 3·q3
        high outlier ⟺ 2·v > 5·q3 − 3·q1

    — exact int64, no 1.5 ever floats.  Emits (keys…, n_obs, q1, q3,
    n_low, n_high): the burst-day/dead-day counter that complements
    cusum_bursts (sequential detector) with a distributional screen.

    100 TB: one window rank per key on the AGGREGATE + one conditional
    re-aggregate; zero IEEE."""
    w = Window.partitionBy(*keys).orderBy("_v")
    obs = (
        df.select(*keys, F.col(val_col).alias("_v"))
        .withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(Window.partitionBy(*keys)))
    )
    q1 = obs.filter(F.col("_rn") == F.expr("greatest(1L, (250 * _n + 999) div 1000)")).select(
        *keys, F.col("_v").alias("q1")
    )
    q3 = obs.filter(F.col("_rn") == F.expr("greatest(1L, (750 * _n + 999) div 1000)")).select(
        *keys, F.col("_v").alias("q3")
    )
    j = obs.join(q1, keys).join(q3, keys)
    low = 2 * F.col("_v") < 5 * F.col("q1") - 3 * F.col("q3")
    high = 2 * F.col("_v") > 5 * F.col("q3") - 3 * F.col("q1")
    return j.groupBy(*keys, "q1", "q3").agg(
        F.count(F.lit(1)).cast("long").alias("n_obs"),
        F.sum(low.cast("long")).cast("long").alias("n_low"),
        F.sum(high.cast("long")).cast("long").alias("n_high"),
    ).select(*keys, "n_obs", "q1", "q3", "n_low", "n_high")


def sql_tukey_outliers(counts_cte: str, keys: list[str], val_col: str = "cnt") -> str:
    """DuckDB twin of :func:`tukey_outliers` — same rank convention and
    cleared fences."""
    ks = ", ".join(keys)
    return f"""counts AS ({counts_cte}),
tk_r AS (
  SELECT {ks}, {val_col} AS v,
         row_number() OVER (PARTITION BY {ks} ORDER BY {val_col}) AS rn,
         count(*) OVER (PARTITION BY {ks}) AS n
  FROM counts),
tk_q1 AS (SELECT {ks}, v AS q1 FROM tk_r
          WHERE rn = greatest(1, (250 * n + 999) // 1000)),
tk_q3 AS (SELECT {ks}, v AS q3 FROM tk_r
          WHERE rn = greatest(1, (750 * n + 999) // 1000)),
tk AS (
  SELECT {ks}, CAST(count(*) AS BIGINT) AS n_obs,
         CAST(any_value(q1) AS BIGINT) AS q1, CAST(any_value(q3) AS BIGINT) AS q3,
         CAST(sum(CASE WHEN 2 * v < 5 * q1 - 3 * q3 THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
         CAST(sum(CASE WHEN 2 * v > 5 * q3 - 3 * q1 THEN 1 ELSE 0 END) AS BIGINT) AS n_high
  FROM tk_r JOIN tk_q1 USING ({ks}) JOIN tk_q3 USING ({ks})
  GROUP BY {ks})"""


def emd_1d(df: DataFrame, group_col: str, val_col: str) -> DataFrame:
    """Exact 1-D Earth Mover's (Wasserstein-1) distance between every
    pair of groups (Monge 1781 lineage; the closed form W₁ = ∫|F_a − F_b|
    over the line) — the L1 companion to ks_two_sample's L∞ on the SAME
    pooled-CDF walk: KS asks "where do the CDFs differ MOST", EMD asks
    "how much mass must move, times how far".  Carried exactly:

        w1_num = Σ_k (v_{k+1} − v_k) · |n_b·C_a(v_k) − n_a·C_b(v_k)|,
        W₁ = w1_num / (n_a·n_b)

    over the pooled distinct values — integers end to end (DECIMAL(38)
    internally for the products).  Emits (ga, gb, n_a, n_b, w1_num,
    w1_den).

    100 TB: identical shape to ks_two_sample — domain-bounded histograms,
    one window walk per pair (cum sums + lead)."""
    h = df.groupBy(group_col, val_col).agg(
        F.count(F.lit(1)).cast("long").alias("_c")
    )
    n = df.groupBy(group_col).agg(F.count(F.lit(1)).cast("long").alias("_n"))
    ga = n.select(F.col(group_col).alias("ga"), F.col("_n").alias("n_a"))
    gb = n.select(F.col(group_col).alias("gb"), F.col("_n").alias("n_b"))
    pairs = ga.crossJoin(gb).filter(F.col("ga") < F.col("gb"))
    rows = (
        pairs.join(
            h.withColumnRenamed(group_col, "_g"),
            (F.col("_g") == F.col("ga")) | (F.col("_g") == F.col("gb")),
        )
        .groupBy("ga", "gb", "n_a", "n_b", val_col)
        .agg(
            F.sum(F.when(F.col("_g") == F.col("ga"), F.col("_c")).otherwise(0)).alias("_ca"),
            F.sum(F.when(F.col("_g") == F.col("gb"), F.col("_c")).otherwise(0)).alias("_cb"),
        )
    )
    wp = Window.partitionBy("ga", "gb").orderBy(val_col)
    wc = wp.rowsBetween(Window.unboundedPreceding, 0)
    d38 = "decimal(38,0)"
    terms = rows.select(
        "ga",
        "gb",
        "n_a",
        "n_b",
        (
            (F.lead(val_col).over(wp) - F.col(val_col)).cast(d38)
            * F.abs(
                F.col("n_b").cast(d38) * F.sum("_ca").over(wc).cast(d38)
                - F.col("n_a").cast(d38) * F.sum("_cb").over(wc).cast(d38)
            )
        ).alias("_t"),
    )
    return (
        terms.groupBy("ga", "gb", "n_a", "n_b")
        .agg(F.sum("_t").cast("long").alias("w1_num"))
        .select(
            "ga",
            "gb",
            "n_a",
            "n_b",
            F.coalesce(F.col("w1_num"), F.lit(0)).alias("w1_num"),
            (F.col("n_a") * F.col("n_b")).cast("long").alias("w1_den"),
        )
    )


def sql_emd_1d(rows_cte: str, group_col: str, val_col: str) -> str:
    """DuckDB twin of :func:`emd_1d`."""
    return f"""WITH em_rows AS ({rows_cte}),
em_h AS (SELECT {group_col} AS g, {val_col} AS v, CAST(count(*) AS BIGINT) AS c
         FROM em_rows GROUP BY 1, 2),
em_n AS (SELECT {group_col} AS g, CAST(count(*) AS BIGINT) AS n
         FROM em_rows GROUP BY 1),
em_p AS (SELECT a.g AS ga, b.g AS gb, a.n AS n_a, b.n AS n_b
         FROM em_n a JOIN em_n b ON a.g < b.g),
em_m AS (
  SELECT p.ga, p.gb, p.n_a, p.n_b, h.v,
         CAST(sum(CASE WHEN h.g = p.ga THEN h.c ELSE 0 END) AS BIGINT) AS ca,
         CAST(sum(CASE WHEN h.g = p.gb THEN h.c ELSE 0 END) AS BIGINT) AS cb
  FROM em_p p JOIN em_h h ON h.g = p.ga OR h.g = p.gb
  GROUP BY 1, 2, 3, 4, 5),
em_t AS (
  SELECT ga, gb, n_a, n_b,
         (lead(v) OVER (PARTITION BY ga, gb ORDER BY v) - v)
           * abs(CAST(n_b AS HUGEINT)
                   * sum(ca) OVER (PARTITION BY ga, gb ORDER BY v
                                   ROWS UNBOUNDED PRECEDING)
                 - CAST(n_a AS HUGEINT)
                   * sum(cb) OVER (PARTITION BY ga, gb ORDER BY v
                                   ROWS UNBOUNDED PRECEDING)) AS t
  FROM em_m)
SELECT ga, gb, n_a, n_b,
       CAST(COALESCE(sum(t), 0) AS BIGINT) AS w1_num,
       CAST(n_a * n_b AS BIGINT) AS w1_den
FROM em_t GROUP BY 1, 2, 3, 4"""


def tv_distance(df: DataFrame, group_col: str, cat_col: str) -> DataFrame:
    """Exact total-variation distance between every pair of groups over a
    CATEGORICAL column: TV = ½·Σ_c |p_a(c) − p_b(c)|, carried as

        tv_num = Σ_c |n_b·c_a(c) − n_a·c_b(c)|,   TV = tv_num/(2·n_a·n_b)

    — the categorical member of the drift family (EMD prices ordered
    values, KS localizes CDF gaps, TV reads unordered category mixes;
    it equals half the L1 and bounds every event-probability change).
    Emits (ga, gb, n_a, n_b, tv_num, tv_den) — exact integers, HUGEINT
    products internally.

    100 TB: category-domain-bounded counts (map-side combined) + one
    grouped sum per pair; no windows, no ordering needed."""
    h = df.groupBy(group_col, cat_col).agg(
        F.count(F.lit(1)).cast("long").alias("_c")
    )
    n = df.groupBy(group_col).agg(F.count(F.lit(1)).cast("long").alias("_n"))
    ga = n.select(F.col(group_col).alias("ga"), F.col("_n").alias("n_a"))
    gb = n.select(F.col(group_col).alias("gb"), F.col("_n").alias("n_b"))
    pairs = ga.crossJoin(gb).filter(F.col("ga") < F.col("gb"))
    d38 = "decimal(38,0)"
    rows = (
        pairs.join(
            h.withColumnRenamed(group_col, "_g"),
            (F.col("_g") == F.col("ga")) | (F.col("_g") == F.col("gb")),
        )
        .groupBy("ga", "gb", "n_a", "n_b", cat_col)
        .agg(
            F.sum(F.when(F.col("_g") == F.col("ga"), F.col("_c")).otherwise(0)).alias("_ca"),
            F.sum(F.when(F.col("_g") == F.col("gb"), F.col("_c")).otherwise(0)).alias("_cb"),
        )
    )
    return (
        rows.groupBy("ga", "gb", "n_a", "n_b")
        .agg(
            F.sum(
                F.abs(
                    F.col("n_b").cast(d38) * F.col("_ca").cast(d38)
                    - F.col("n_a").cast(d38) * F.col("_cb").cast(d38)
                )
            ).cast("long").alias("tv_num")
        )
        .select(
            "ga",
            "gb",
            "n_a",
            "n_b",
            "tv_num",
            (F.lit(2) * F.col("n_a") * F.col("n_b")).cast("long").alias("tv_den"),
        )
    )


def sql_tv_distance(rows_cte: str, group_col: str, cat_col: str) -> str:
    """DuckDB twin of :func:`tv_distance`."""
    return f"""WITH tv_rows AS ({rows_cte}),
tv_h AS (SELECT {group_col} AS g, {cat_col} AS c, CAST(count(*) AS BIGINT) AS n
         FROM tv_rows GROUP BY 1, 2),
tv_n AS (SELECT {group_col} AS g, CAST(count(*) AS BIGINT) AS n
         FROM tv_rows GROUP BY 1),
tv_p AS (SELECT a.g AS ga, b.g AS gb, a.n AS n_a, b.n AS n_b
         FROM tv_n a JOIN tv_n b ON a.g < b.g),
tv_m AS (
  SELECT p.ga, p.gb, p.n_a, p.n_b, h.c,
         CAST(sum(CASE WHEN h.g = p.ga THEN h.n ELSE 0 END) AS BIGINT) AS ca,
         CAST(sum(CASE WHEN h.g = p.gb THEN h.n ELSE 0 END) AS BIGINT) AS cb
  FROM tv_p p JOIN tv_h h ON h.g = p.ga OR h.g = p.gb
  GROUP BY 1, 2, 3, 4, 5)
SELECT ga, gb, n_a, n_b,
       CAST(sum(abs(CAST(n_b AS HUGEINT) * ca - CAST(n_a AS HUGEINT) * cb))
            AS BIGINT) AS tv_num,
       CAST(2 * n_a * n_b AS BIGINT) AS tv_den
FROM tv_m GROUP BY 1, 2, 3, 4"""


def simpsons_paradox(
    df: DataFrame, group_col: str, stratum_col: str, flag_col: str
) -> DataFrame:
    """Simpson's-paradox screen between every pair of groups (Simpson
    1951; Yule 1903): compare the groups' rates of a boolean flag both
    POOLED and within every stratum, all by exact cross-multiplied
    integer comparisons (a₁/n₁ > a₂/n₂ ⟺ a₁·n₂ > a₂·n₁ — no division),
    and raise the paradox flag when the pooled direction is strictly
    CONTRADICTED by the strata (pooled says A > B, yet no stratum says
    A > B and at least one says A < B, or symmetrically) — the
    aggregation-bias trap every metrics pipeline should test for before
    reporting a pooled rate.

    Emits (ga, gb, dir_pooled ∈ {1,0,−1}, strata_gt, strata_lt,
    strata_eq, paradox boolean); strata counted only where BOTH groups
    have observations.

    100 TB: category-domain aggregates + one pair join — never row-scale
    state."""
    per = df.groupBy(group_col, stratum_col).agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.sum(F.col(flag_col).cast("long")).cast("long").alias("_k"),
    )
    tot = per.groupBy(group_col).agg(
        F.sum("_n").alias("_n"), F.sum("_k").alias("_k")
    )
    ta = tot.select(
        F.col(group_col).alias("ga"), F.col("_n").alias("na"), F.col("_k").alias("ka")
    )
    tb = tot.select(
        F.col(group_col).alias("gb"), F.col("_n").alias("nb"), F.col("_k").alias("kb")
    )
    pooled = ta.crossJoin(tb).filter(F.col("ga") < F.col("gb"))
    dp = F.col("ka") * F.col("nb") - F.col("kb") * F.col("na")
    pooled = pooled.select(
        "ga",
        "gb",
        F.when(dp > 0, 1).when(dp < 0, -1).otherwise(0).cast("long").alias("dir_pooled"),
    )
    sa = per.select(
        F.col(group_col).alias("ga"),
        F.col(stratum_col).alias("_s"),
        F.col("_n").alias("sna"),
        F.col("_k").alias("ska"),
    )
    sb = per.select(
        F.col(group_col).alias("gb"),
        F.col(stratum_col).alias("_s"),
        F.col("_n").alias("snb"),
        F.col("_k").alias("skb"),
    )
    ds = F.col("ska") * F.col("snb") - F.col("skb") * F.col("sna")
    strata = (
        sa.join(sb, "_s")
        .filter(F.col("ga") < F.col("gb"))
        .groupBy("ga", "gb")
        .agg(
            F.sum((ds > 0).cast("long")).cast("long").alias("strata_gt"),
            F.sum((ds < 0).cast("long")).cast("long").alias("strata_lt"),
            F.sum((ds == 0).cast("long")).cast("long").alias("strata_eq"),
        )
    )
    j = pooled.join(strata, ["ga", "gb"], "left").na.fill(
        {"strata_gt": 0, "strata_lt": 0, "strata_eq": 0}
    )
    paradox = (
        (F.col("dir_pooled") == 1)
        & (F.col("strata_gt") == 0)
        & (F.col("strata_lt") > 0)
    ) | (
        (F.col("dir_pooled") == -1)
        & (F.col("strata_lt") == 0)
        & (F.col("strata_gt") > 0)
    )
    return j.select(
        "ga", "gb", "dir_pooled", "strata_gt", "strata_lt", "strata_eq",
        paradox.alias("paradox"),
    )


def sql_simpsons_paradox(
    rows_cte: str, group_col: str, stratum_col: str, flag_col: str
) -> str:
    """DuckDB twin of :func:`simpsons_paradox`."""
    return f"""WITH sx_rows AS ({rows_cte}),
sx_per AS (
  SELECT {group_col} AS g, {stratum_col} AS s,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN {flag_col} THEN 1 ELSE 0 END) AS BIGINT) AS k
  FROM sx_rows GROUP BY 1, 2),
sx_tot AS (SELECT g, CAST(sum(n) AS BIGINT) AS n, CAST(sum(k) AS BIGINT) AS k
           FROM sx_per GROUP BY 1),
sx_pool AS (
  SELECT a.g AS ga, b.g AS gb,
         CAST(CASE WHEN a.k * b.n > b.k * a.n THEN 1
                   WHEN a.k * b.n < b.k * a.n THEN -1 ELSE 0 END AS BIGINT)
           AS dir_pooled
  FROM sx_tot a JOIN sx_tot b ON a.g < b.g),
sx_str AS (
  SELECT a.g AS ga, b.g AS gb,
         CAST(sum(CASE WHEN a.k * b.n > b.k * a.n THEN 1 ELSE 0 END) AS BIGINT) AS strata_gt,
         CAST(sum(CASE WHEN a.k * b.n < b.k * a.n THEN 1 ELSE 0 END) AS BIGINT) AS strata_lt,
         CAST(sum(CASE WHEN a.k * b.n = b.k * a.n THEN 1 ELSE 0 END) AS BIGINT) AS strata_eq
  FROM sx_per a JOIN sx_per b ON a.s = b.s AND a.g < b.g
  GROUP BY 1, 2)
SELECT p.ga, p.gb, p.dir_pooled,
       COALESCE(s.strata_gt, 0) AS strata_gt,
       COALESCE(s.strata_lt, 0) AS strata_lt,
       COALESCE(s.strata_eq, 0) AS strata_eq,
       (p.dir_pooled = 1 AND COALESCE(s.strata_gt, 0) = 0
          AND COALESCE(s.strata_lt, 0) > 0)
       OR (p.dir_pooled = -1 AND COALESCE(s.strata_lt, 0) = 0
          AND COALESCE(s.strata_gt, 0) > 0) AS paradox
FROM sx_pool p LEFT JOIN sx_str s ON s.ga = p.ga AND s.gb = p.gb"""


def rater_agreement(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Cohen's kappa between two categorical labelings (Cohen 1960, with
    the Landis & Koch 1977 strength bands) — the chance-corrected
    agreement every labeling/eval pipeline reports, exact: with N rows,
    ``agree`` exact matches, and P = Σ_c n_a(c)·n_b(c) the chance-
    agreement numerator,

        κ = (N·agree − P) / (N² − P)

    — an exact integer rational (division never taken).  The strength
    class pins two published band edges as rationals: 'substantial' at
    κ ≥ 3/5, 'moderate' at κ ≥ 2/5, else 'low'; 'degenerate' when
    N² = P (a constant marginal — κ undefined).  Emits one row
    (n, agree, kappa_num, kappa_den, strength).

    100 TB: three category-domain aggs + a 1-row join — counter-sized."""
    per_a = df.groupBy(col_a).agg(F.count(F.lit(1)).cast("long").alias("_na"))
    per_b = df.groupBy(col_b).agg(F.count(F.lit(1)).cast("long").alias("_nb"))
    p = (
        per_a.join(per_b, per_a[col_a] == per_b[col_b])
        .agg(F.sum(F.col("_na") * F.col("_nb")).cast("long").alias("_p"))
        .withColumn("_k", F.lit(1))
    )
    base = df.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum((F.col(col_a) == F.col(col_b)).cast("long")).cast("long").alias("agree"),
    ).withColumn("_k", F.lit(1))
    j = base.join(F.broadcast(p), "_k")
    num = F.col("n") * F.col("agree") - F.coalesce(F.col("_p"), F.lit(0))
    den = F.col("n") * F.col("n") - F.coalesce(F.col("_p"), F.lit(0))
    cls = (
        F.when(den == 0, "degenerate")
        .when(F.lit(5) * num >= F.lit(3) * den, "substantial")
        .when(F.lit(5) * num >= F.lit(2) * den, "moderate")
        .otherwise("low")
    )
    return j.select(
        "n",
        "agree",
        num.cast("long").alias("kappa_num"),
        den.cast("long").alias("kappa_den"),
        cls.alias("strength"),
    )


def sql_rater_agreement(rows_cte: str, col_a: str, col_b: str) -> str:
    """DuckDB twin of :func:`rater_agreement`."""
    return f"""WITH ka_rows AS ({rows_cte}),
ka_a AS (SELECT {col_a} AS c, CAST(count(*) AS BIGINT) AS na FROM ka_rows GROUP BY 1),
ka_b AS (SELECT {col_b} AS c, CAST(count(*) AS BIGINT) AS nb FROM ka_rows GROUP BY 1),
ka_p AS (SELECT CAST(COALESCE(sum(na * nb), 0) AS BIGINT) AS p
         FROM ka_a JOIN ka_b USING (c)),
ka_n AS (SELECT CAST(count(*) AS BIGINT) AS n,
                CAST(sum(CASE WHEN {col_a} = {col_b} THEN 1 ELSE 0 END) AS BIGINT)
                  AS agree
         FROM ka_rows)
SELECT n, agree,
       CAST(n * agree - p AS BIGINT) AS kappa_num,
       CAST(n * n - p AS BIGINT) AS kappa_den,
       CASE WHEN n * n - p = 0 THEN 'degenerate'
            WHEN 5 * (n * agree - p) >= 3 * (n * n - p) THEN 'substantial'
            WHEN 5 * (n * agree - p) >= 2 * (n * n - p) THEN 'moderate'
            ELSE 'low' END AS strength
FROM ka_n, ka_p"""


def mcnemar(
    df: DataFrame, truth_col: str, pred_a: str, pred_b: str, z2: int = 4
) -> DataFrame:
    """McNemar's paired-classifier test (McNemar 1947): on the SAME rows,
    count the discordant pairs b = #(A right, B wrong) and
    c = #(A wrong, B right); under the null the discordants split evenly,
    and (b − c)²/(b + c) ≥ z² — cleared to (b−c)² ≥ z²·(b+c) — rejects
    it.  THE honest way to compare two classifiers on one eval set
    (pooled accuracies ignore pairing).  Emits one row (n, b_only,
    c_only, verdict ∈ {'a_better','b_better','same'}).

    100 TB: one map-side-combinable agg — four counters."""
    a_ok = F.col(pred_a) == F.col(truth_col)
    b_ok = F.col(pred_b) == F.col(truth_col)
    agg = df.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum((a_ok & ~b_ok).cast("long")).cast("long").alias("b_only"),
        F.sum((~a_ok & b_ok).cast("long")).cast("long").alias("c_only"),
    )
    d = F.col("b_only") - F.col("c_only")
    sig = d * d >= F.lit(z2) * (F.col("b_only") + F.col("c_only"))
    verdict = (
        F.when(sig & (d > 0), "a_better")
        .when(sig & (d < 0), "b_better")
        .otherwise("same")
    )
    return agg.select("n", "b_only", "c_only", verdict.alias("verdict"))


def sql_mcnemar(
    rows_cte: str, truth_col: str, pred_a: str, pred_b: str, z2: int = 4
) -> str:
    """DuckDB twin of :func:`mcnemar`."""
    return f"""WITH mc_rows AS ({rows_cte}),
mc AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN {pred_a} = {truth_col} AND {pred_b} <> {truth_col}
                       THEN 1 ELSE 0 END) AS BIGINT) AS b_only,
         CAST(sum(CASE WHEN {pred_a} <> {truth_col} AND {pred_b} = {truth_col}
                       THEN 1 ELSE 0 END) AS BIGINT) AS c_only
  FROM mc_rows)
SELECT n, b_only, c_only,
       CASE WHEN (b_only - c_only) * (b_only - c_only) >= {z2} * (b_only + c_only)
            THEN (CASE WHEN b_only > c_only THEN 'a_better'
                       WHEN b_only < c_only THEN 'b_better' ELSE 'same' END)
            ELSE 'same' END AS verdict
FROM mc"""


def classifier_report(df: DataFrame, truth_col: str, pred_col: str) -> DataFrame:
    """Per-class precision / recall / F1 as EXACT RATIONALS from the
    confusion matrix (the standard eval report, division-free): per truth
    class c with tp = #(truth=c ∧ pred=c), pred_n = #(pred=c),
    truth_n = #(truth=c):

        precision = tp/pred_n,  recall = tp/truth_n,
        F1 = 2·tp / (pred_n + truth_n)     (the harmonic-mean identity)

    — all three emitted as integer numerator/denominator pairs, so the
    report is hash-exact and threshold checks downstream can cross-
    multiply.  Classes appearing only in predictions get truth_n = 0
    rows and vice versa (full outer over the class set).  Emits
    (cls, truth_n, pred_n, tp, f1_num, f1_den).

    100 TB: three category-domain hash aggs + outer join — never
    row-scale state."""
    tp = (
        df.filter(F.col(truth_col) == F.col(pred_col))
        .groupBy(F.col(truth_col).alias("cls"))
        .agg(F.count(F.lit(1)).cast("long").alias("tp"))
    )
    tn = df.groupBy(F.col(truth_col).alias("cls")).agg(
        F.count(F.lit(1)).cast("long").alias("truth_n")
    )
    pn = df.groupBy(F.col(pred_col).alias("cls")).agg(
        F.count(F.lit(1)).cast("long").alias("pred_n")
    )
    j = (
        tn.join(pn, "cls", "full_outer")
        .join(tp, "cls", "left")
        .na.fill({"truth_n": 0, "pred_n": 0, "tp": 0})
    )
    return j.select(
        "cls",
        "truth_n",
        "pred_n",
        "tp",
        (F.lit(2) * F.col("tp")).cast("long").alias("f1_num"),
        (F.col("truth_n") + F.col("pred_n")).cast("long").alias("f1_den"),
    )


def sql_classifier_report(rows_cte: str, truth_col: str, pred_col: str) -> str:
    """DuckDB twin of :func:`classifier_report`."""
    return f"""WITH cr_rows AS ({rows_cte}),
cr_tp AS (SELECT {truth_col} AS cls, CAST(count(*) AS BIGINT) AS tp
          FROM cr_rows WHERE {truth_col} = {pred_col} GROUP BY 1),
cr_tn AS (SELECT {truth_col} AS cls, CAST(count(*) AS BIGINT) AS truth_n
          FROM cr_rows GROUP BY 1),
cr_pn AS (SELECT {pred_col} AS cls, CAST(count(*) AS BIGINT) AS pred_n
          FROM cr_rows GROUP BY 1)
SELECT cls, COALESCE(t.truth_n, 0) AS truth_n, COALESCE(p.pred_n, 0) AS pred_n,
       COALESCE(x.tp, 0) AS tp,
       CAST(2 * COALESCE(x.tp, 0) AS BIGINT) AS f1_num,
       CAST(COALESCE(t.truth_n, 0) + COALESCE(p.pred_n, 0) AS BIGINT) AS f1_den
FROM cr_tn t FULL OUTER JOIN cr_pn p USING (cls)
LEFT JOIN cr_tp x USING (cls)"""


def burstiness(df: DataFrame, keys: list[str], gap_col: str) -> DataFrame:
    """Goh–Barabási burstiness class per key group (Goh & Barabási EPL
    2008) over inter-event gaps: B = (σ−μ)/(σ+μ) is positive exactly
    when σ > μ — i.e. when the gap process is MORE variable than the
    memoryless exponential (σ = μ, B = 0, the Poisson-process line) —
    and that sign is decided exactly:

        σ² > μ²  ⟺  n·Σx² − S² > S²      (S = Σx, population variance)

    Emits (keys…, n_gaps, gap_sum, disp_num = n·Σx² − 2S² — positive ⟺
    bursty, zero ⟺ exponential-like, negative ⟺ regular/pacemaker — and
    burst_class accordingly).  The behavioral-rhythm member of the
    temporal family: sessionize cuts on a gap threshold, this READS the
    gap distribution's character.  Dispersion carried in DECIMAL(38)/
    HUGEINT (n·Σx² exceeds int64 for very active keys).

    100 TB: one map-side-combinable agg on the per-key gap rollup."""
    agg = df.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.sum(gap_col).cast("long").alias("gap_sum"),
        F.sum(F.col(gap_col) * F.col(gap_col)).cast("long").alias("_ssq"),
    )
    # n·Σx² overflows int64 for very active keys (n ~ 10⁴ gaps of ~10⁶ s);
    # DECIMAL(38) here, HUGEINT in the twin — emitted WITHOUT a bigint cast
    # (decimal/hugeint stringify identically on the hash)
    d38 = "decimal(38,0)"
    disp = (
        F.col("n_gaps").cast(d38) * F.col("_ssq").cast(d38)
        - F.lit(2).cast(d38) * F.col("gap_sum").cast(d38) * F.col("gap_sum").cast(d38)
    )
    cls = (
        F.when(disp > 0, "bursty")
        .when(disp < 0, "regular")
        .otherwise("poisson_like")
    )
    return agg.select(
        *keys,
        "n_gaps",
        "gap_sum",
        disp.alias("disp_num"),
        cls.alias("burst_class"),
    )


def sql_burstiness(rows_cte: str, keys: list[str], gap_col: str) -> str:
    """DuckDB twin of :func:`burstiness`."""
    ks = ", ".join(keys)
    return f"""WITH bs_rows AS ({rows_cte}),
bs AS (
  SELECT {ks}, CAST(count(*) AS BIGINT) AS n_gaps,
         CAST(sum({gap_col}) AS BIGINT) AS gap_sum,
         CAST(CAST(count(*) AS HUGEINT)
             * sum(CAST({gap_col} AS HUGEINT) * {gap_col})
           - 2 * sum(CAST({gap_col} AS HUGEINT))
               * sum(CAST({gap_col} AS HUGEINT)) AS BIGINT) AS disp_num
  FROM bs_rows GROUP BY {ks})
SELECT {ks}, n_gaps, gap_sum, disp_num,
       CASE WHEN disp_num > 0 THEN 'bursty'
            WHEN disp_num < 0 THEN 'regular'
            ELSE 'poisson_like' END AS burst_class
FROM bs"""


def spearman_rho(
    df: DataFrame,
    keys: list[str],
    x_col: str,
    y_col: str,
    strong_num: int = 1,
    strong_den: int = 4,
) -> DataFrame:
    """Spearman rank correlation per key group (Spearman 1904), tie-exact:
    ranks are AVERAGE ranks carried as integers by the ×2 trick —
    rank2(v) = min_rank + max_rank over v's tie group (= 2·average rank,
    always integral) — and ρ is Pearson on the rank2 values, never
    evaluated: the emitted exact integers are

        num  = n·Σxy − Σx·Σy,   den_x = n·Σx² − (Σx)²,  den_y likewise

    (ρ = num/√(den_x·den_y)) and the strength class |ρ| ≥ ½ is decided by
    the cross-multiplied strong_den²... precisely:
    strong_den·num² ≥ strong_num·den_x·den_y, sign from num — the
    kendall_tau discipline, completing the rank-correlation pair
    (Kendall counts pair inversions; Spearman measures rank displacement).
    'degenerate' when either margin is constant.

    100 TB: two windows over the per-(key, tick) AGGREGATE + one
    map-side-combinable agg; all int64 at tick-rollup sizes."""
    obs = df.select(*keys, F.col(x_col).alias("_x"), F.col(y_col).alias("_y"))

    def rank2(col, out):
        wv = Window.partitionBy(*keys).orderBy(col)
        wt = Window.partitionBy(*keys, col)
        return (
            (F.min(F.row_number().over(wv)).over(wt)
             + F.max(F.row_number().over(wv)).over(wt)).alias(out)
        )

    # two passes (one per variable) to keep each window's ordering simple
    r1 = obs.select(*keys, "_x", "_y", rank2(F.col("_x"), "_rx"))
    r2 = r1.select(*keys, "_y", "_rx", rank2(F.col("_y"), "_ry"))
    agg = r2.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n_obs"),
        F.sum("_rx").cast("long").alias("_sx"),
        F.sum("_ry").cast("long").alias("_sy"),
        F.sum(F.col("_rx") * F.col("_rx")).cast("long").alias("_sxx"),
        F.sum(F.col("_ry") * F.col("_ry")).cast("long").alias("_syy"),
        F.sum(F.col("_rx") * F.col("_ry")).cast("long").alias("_sxy"),
    )
    num = F.col("n_obs") * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    dx = F.col("n_obs") * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    dy = F.col("n_obs") * F.col("_syy") - F.col("_sy") * F.col("_sy")
    strong = F.lit(strong_den) * num * num >= F.lit(strong_num) * dx * dy
    cls = (
        F.when((dx == 0) | (dy == 0), "degenerate")
        .when(strong & (num > 0), "positive")
        .when(strong & (num < 0), "negative")
        .otherwise("weak")
    )
    return agg.select(
        *keys,
        "n_obs",
        num.cast("long").alias("rho_num"),
        dx.cast("long").alias("den_x"),
        dy.cast("long").alias("den_y"),
        cls.alias("rho_class"),
    )


def sql_spearman_rho(
    counts_cte: str,
    keys: list[str],
    x_col: str,
    y_col: str,
    strong_num: int = 1,
    strong_den: int = 4,
) -> str:
    """DuckDB twin of :func:`spearman_rho` — same ×2 average ranks and
    cross-multiplied class."""
    ks = ", ".join(keys)
    return f"""counts AS ({counts_cte}),
sp_r AS (
  SELECT {ks},
         min(rnx) OVER (PARTITION BY {ks}, {x_col})
           + max(rnx) OVER (PARTITION BY {ks}, {x_col}) AS rx,
         min(rny) OVER (PARTITION BY {ks}, {y_col})
           + max(rny) OVER (PARTITION BY {ks}, {y_col}) AS ry
  FROM (
    SELECT {ks}, {x_col}, {y_col},
           row_number() OVER (PARTITION BY {ks} ORDER BY {x_col}) AS rnx,
           row_number() OVER (PARTITION BY {ks} ORDER BY {y_col}) AS rny
    FROM counts)),
sp AS (
  SELECT {ks}, CAST(count(*) AS BIGINT) AS n_obs,
         CAST(count(*) * sum(rx * ry) - sum(rx) * sum(ry) AS BIGINT) AS rho_num,
         CAST(count(*) * sum(rx * rx) - sum(rx) * sum(rx) AS BIGINT) AS den_x,
         CAST(count(*) * sum(ry * ry) - sum(ry) * sum(ry) AS BIGINT) AS den_y
  FROM sp_r GROUP BY {ks}),
sp_out AS (
  SELECT {ks}, n_obs, rho_num, den_x, den_y,
         CASE WHEN den_x = 0 OR den_y = 0 THEN 'degenerate'
              WHEN {strong_den} * rho_num * rho_num >= {strong_num} * den_x * den_y
              THEN (CASE WHEN rho_num > 0 THEN 'positive'
                         WHEN rho_num < 0 THEN 'negative' ELSE 'weak' END)
              ELSE 'weak' END AS rho_class
  FROM sp)"""


def winsorized_stats(
    df: DataFrame,
    keys: list[str],
    val_col: str,
    lo_pm: int = 50,
    hi_pm: int = 950,
) -> DataFrame:
    """Winsorized summary per key group (Winsor via Tukey & McLaughlin
    1963; the standard robust-mean ingredient): values clamped to the
    group's exact [p_lo, p_hi] discrete quantiles (the quantile_disc rank
    convention k = max(1, ceil(q·n)) the percentile family pins), then
    summed — the robust location estimate whose breakdown the trim
    chooses, with NO value ever dropped (clamping keeps n).

    Emits (keys…, n_obs, p_lo, p_hi, wins_sum, n_clamped_lo,
    n_clamped_hi) — all exact integers; the winsorized mean is the
    consumer's wins_sum/n_obs.

    100 TB: one window rank per key on the AGGREGATE + one conditional
    re-aggregate (the tukey_outliers shape)."""
    w = Window.partitionBy(*keys).orderBy("_v")
    obs = (
        df.select(*keys, F.col(val_col).alias("_v"))
        .withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(Window.partitionBy(*keys)))
    )
    pick = lambda pm, out: obs.filter(  # noqa: E731
        F.col("_rn") == F.expr(f"greatest(1L, ({pm} * _n + 999) div 1000)")
    ).select(*keys, F.col("_v").alias(out))
    j = obs.join(pick(lo_pm, "p_lo"), keys).join(pick(hi_pm, "p_hi"), keys)
    clamped = F.greatest(F.col("p_lo"), F.least(F.col("p_hi"), F.col("_v")))
    return (
        j.groupBy(*keys, "p_lo", "p_hi")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_obs"),
            F.sum(clamped).cast("long").alias("wins_sum"),
            F.sum((F.col("_v") < F.col("p_lo")).cast("long")).cast("long").alias("n_clamped_lo"),
            F.sum((F.col("_v") > F.col("p_hi")).cast("long")).cast("long").alias("n_clamped_hi"),
        )
        .select(*keys, "n_obs", "p_lo", "p_hi", "wins_sum", "n_clamped_lo", "n_clamped_hi")
    )


def sql_winsorized_stats(
    rows_cte: str, keys: list[str], val_col: str, lo_pm: int = 50, hi_pm: int = 950
) -> str:
    """DuckDB twin of :func:`winsorized_stats`."""
    ks = ", ".join(keys)
    return f"""WITH wz_rows AS ({rows_cte}),
wz_r AS (
  SELECT {ks}, {val_col} AS v,
         row_number() OVER (PARTITION BY {ks} ORDER BY {val_col}) AS rn,
         count(*) OVER (PARTITION BY {ks}) AS n
  FROM wz_rows),
wz_lo AS (SELECT {ks}, v AS p_lo FROM wz_r
          WHERE rn = greatest(1, ({lo_pm} * n + 999) // 1000)),
wz_hi AS (SELECT {ks}, v AS p_hi FROM wz_r
          WHERE rn = greatest(1, ({hi_pm} * n + 999) // 1000))
SELECT {ks}, CAST(count(*) AS BIGINT) AS n_obs,
       CAST(any_value(p_lo) AS BIGINT) AS p_lo,
       CAST(any_value(p_hi) AS BIGINT) AS p_hi,
       CAST(sum(greatest(p_lo, least(p_hi, v))) AS BIGINT) AS wins_sum,
       CAST(sum(CASE WHEN v < p_lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped_lo,
       CAST(sum(CASE WHEN v > p_hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped_hi
FROM wz_r JOIN wz_lo USING ({ks}) JOIN wz_hi USING ({ks})
GROUP BY {ks}"""
