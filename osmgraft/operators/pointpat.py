"""Point-pattern statistics: Ripley's K pair counts and the Knox
space-time interaction statistic — the POINT-level members of the spatial
statistics family (the cell-raster members live in operators/density.py:
Moran's I, Getis-Ord Gi*, local join counts, semivariogram).

Both operators follow the repo's exact-integer discipline: squared
fixed-point distances, integer day gaps, pair COUNTS — no area
normalization or floats, so Spark and DuckDB hash-match bitwise.  Both
bound their candidate pairs with the celljoin ring discipline
(operators/celljoin.py): a coarse grid bucket whose pitch is >= the
largest radius makes the 3x3 neighbor ring PROVABLY complete (two points
within r <= pitch differ by < pitch per axis, so their bucket coords
differ by at most 1) — the self-join never goes quadratic in n, only in
local density, exactly the property that survives 100 TB.

Reference semantics (public methods): Ripley 1976/1977 K-function pair
counts; Knox 1964 space-time interaction count with the marginal
space-close and time-close pair counts a Monte-Carlo or Poisson test
consumes.  The normalizations (K(r) = A * 2*pairs / (n(n-1)); Knox
expectation n_s*n_t/N_pairs) are constant rationals the consumer applies
— the engine emits the exact integer ingredients.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# lat7 >= -6e8, lon7 >= -1.79e9: adding 2^31 makes both axes nonnegative, so
# `>>` bucketing is floor division in BOTH engines (no negative-shift UB)
_OFF = 1 << 31


def _ring_pairs(pts: DataFrame, shift: int, extra: list[str]) -> DataFrame:
    """Unordered candidate pairs (pid_a < pid_b) whose grid buckets at
    ``shift`` differ by at most 1 per axis — scatter form: side B explodes
    to its 9 neighbor buckets, side A keeps its own, one equi-join.  Each
    pair surfaces exactly once (the 9 scatter targets are distinct)."""
    a = pts.select(
        F.col("pid").alias("pid_a"),
        F.col("x").alias("xa"),
        F.col("y").alias("ya"),
        *[F.col(c).alias(f"{c}_a") for c in extra],
        F.shiftright(F.col("x") + _OFF, shift).alias("cx"),
        F.shiftright(F.col("y") + _OFF, shift).alias("cy"),
    )
    offs = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    b = pts.select(
        F.col("pid").alias("pid_b"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        *[F.col(c).alias(f"{c}_b") for c in extra],
        F.explode(offs).alias("o"),
        F.shiftright(F.col("x") + _OFF, shift).alias("bx"),
        F.shiftright(F.col("y") + _OFF, shift).alias("by"),
    ).select(
        "pid_b",
        "xb",
        "yb",
        *[f"{c}_b" for c in extra],
        (F.col("bx") + F.col("o.dx")).alias("cx"),
        (F.col("by") + F.col("o.dy")).alias("cy"),
    )
    return a.join(b, ["cx", "cy"]).filter(F.col("pid_a") < F.col("pid_b"))


def _sql_ring_pairs(pts_cte: str, shift: int, extra: list[str]) -> str:
    """DuckDB twin of the ring pair generator — GATHER form (side A joins
    the 3x3 offset range directly), a different evaluation order over the
    same pair population."""
    ea = "".join(f", a.{c} AS {c}_a" for c in extra)
    eb = "".join(f", b.{c} AS {c}_b" for c in extra)
    return f"""p AS (
  SELECT pid, x, y{"".join(", " + c for c in extra)},
         (x + {_OFF}) >> {shift} AS cx, (y + {_OFF}) >> {shift} AS cy
  FROM ({pts_cte})),
pairs AS (
  SELECT a.pid AS pid_a, a.x AS xa, a.y AS ya{ea},
         b.pid AS pid_b, b.x AS xb, b.y AS yb{eb}
  FROM p a
  CROSS JOIN range(-1, 2) dx(i) CROSS JOIN range(-1, 2) dy(i)
  JOIN p b ON b.cx = a.cx + dx.i AND b.cy = a.cy + dy.i AND a.pid < b.pid)"""


def _d2_long():
    """Squared pair distance with LONG intermediates — ring-bounded diffs
    reach 2^18, whose square overflows int32; the sum never exceeds 2^37."""
    dx = (F.col("xa") - F.col("xb")).cast("long")
    dy = (F.col("ya") - F.col("yb")).cast("long")
    return dx * dx + dy * dy


def ripley_k(pts: DataFrame, radii: list[int], shift: int) -> DataFrame:
    """Ripley's K pair counts: one row per radius r in ``radii`` (ascending
    fixed-point units) with (r, n_pts, pair_cnt) — pair_cnt the EXACT number
    of unordered point pairs at squared distance <= r².  Requires
    max(radii) <= 2^shift (ring completeness; raises otherwise).

    Plan: ONE ring self-join evaluates all radii (conditional sums over the
    shared d² column), then a 1-row broadcast join attaches n_pts and a
    stack() explodes to per-radius rows — no per-radius rescan."""
    if max(radii) > (1 << shift):
        raise ValueError(f"max radius {max(radii)} exceeds pitch {1 << shift}")
    pr = _ring_pairs(pts, shift, [])
    d2 = _d2_long()
    aggs = [
        F.sum(F.when(d2 <= r * r, 1).otherwise(0)).cast("long").alias(f"c{i}")
        for i, r in enumerate(radii)
    ]
    counts = pr.agg(*aggs).withColumn("k", F.lit(1))
    n = pts.agg(F.count(F.lit(1)).alias("n_pts")).withColumn("k", F.lit(1))
    stack = ", ".join(f"{r}L, c{i}" for i, r in enumerate(radii))
    return (
        counts.join(F.broadcast(n), "k")
        .selectExpr("n_pts", f"stack({len(radii)}, {stack}) AS (r, pair_cnt)")
        .select("r", "n_pts", "pair_cnt")
    )


# DuckDB may reorder the ring equi-join into an inequality join and evaluate
# the distance predicate on NON-ring candidate pairs, where int32 (and even
# int64 for antipodal lon) products overflow — HUGEINT makes it total.
_SQL_D2 = (
    "(CAST(xa AS HUGEINT)-xb)*(CAST(xa AS HUGEINT)-xb)"
    " + (CAST(ya AS HUGEINT)-yb)*(CAST(ya AS HUGEINT)-yb)"
)


def sql_ripley_k(pts_cte: str, radii: list[int], shift: int) -> str:
    """DuckDB twin — gather-form ring join, per-radius conditional counts
    unpivoted through UNION ALL."""
    sels = "\nUNION ALL\n".join(
        f"SELECT {r} AS r, (SELECT count(*) FROM ({pts_cte})) AS n_pts, "
        f"(SELECT count(*) FROM pairs WHERE {_SQL_D2}"
        f" <= {r * r}) AS pair_cnt"
        for r in radii
    )
    return f"WITH {_sql_ring_pairs(pts_cte, shift, [])}\n{sels}"


def knox(pts: DataFrame, delta: int, tau: int, shift: int) -> DataFrame:
    """Knox space-time interaction statistic over points (pid, x, y, t)
    with t in integer days: ONE row
        (n_pts, n_space, n_time, x_knox)
    where n_space = #unordered pairs with d² <= delta², n_time = #unordered
    pairs with |Δt| <= tau, x_knox = #pairs close in BOTH.  All exact
    integers — the ingredients of the Knox test (expectation
    n_space*n_time / C(n,2)).

    Plan: space pairs (and the joint count) from one ring self-join;
    the time marginal NEVER touches pairs — it folds the daily histogram
    against its tau-window (explode of 2*tau+1 offsets + equi-join on day,
    Σ cnt_d·cnt_{d+k} = ordered close pairs + n, halved exactly), so the
    O(n²) time-close population costs O(days·tau)."""
    if delta > (1 << shift):
        raise ValueError(f"delta {delta} exceeds pitch {1 << shift}")
    pr = _ring_pairs(pts, shift, ["t"])
    d2 = _d2_long()
    close_t = F.abs(F.col("t_a") - F.col("t_b")) <= tau
    sp = pr.filter(d2 <= delta * delta).agg(
        F.count(F.lit(1)).alias("n_space"),
        F.sum(close_t.cast("long")).alias("x_knox"),
    )
    daily = pts.groupBy("t").agg(F.count(F.lit(1)).alias("cnt"))
    scat = daily.select(
        F.explode(F.sequence(F.lit(-tau), F.lit(tau))).alias("k"), "t", "cnt"
    ).select((F.col("t") + F.col("k")).alias("t"), F.col("cnt").alias("cnt_o"))
    s_and_n = (
        daily.join(scat, "t")
        .agg(F.sum(F.col("cnt") * F.col("cnt_o")).alias("s"))
        .withColumn("k", F.lit(1))
        .join(
            F.broadcast(
                pts.agg(F.count(F.lit(1)).alias("n_pts")).withColumn("k", F.lit(1))
            ),
            "k",
        )
        .select("n_pts", F.expr("(s - n_pts) div 2").alias("n_time"))
    )
    return (
        sp.withColumn("k", F.lit(1))
        .join(F.broadcast(s_and_n.withColumn("k", F.lit(1))), "k")
        .select("n_pts", "n_space", "n_time", "x_knox")
    )


def sql_knox(pts_cte: str, delta: int, tau: int, shift: int) -> str:
    """DuckDB twin — gather ring join for the space/joint counts, histogram
    fold for the time marginal."""
    return f"""WITH {_sql_ring_pairs(pts_cte, shift, ["t"])},
sp AS (
  SELECT count(*) AS n_space,
         CAST(sum(CASE WHEN abs(t_a - t_b) <= {tau} THEN 1 ELSE 0 END)
              AS BIGINT) AS x_knox
  FROM pairs
  WHERE {_SQL_D2} <= {delta * delta}),
daily AS (SELECT t, count(*) AS cnt FROM ({pts_cte}) GROUP BY t),
tm AS (
  SELECT CAST(sum(a.cnt * b.cnt) AS BIGINT) AS s
  FROM daily a
  CROSS JOIN range({-tau}, {tau + 1}) k(i)
  JOIN daily b ON b.t = a.t + k.i),
n AS (SELECT count(*) AS n_pts FROM ({pts_cte}))
SELECT n.n_pts, sp.n_space, (tm.s - n.n_pts) // 2 AS n_time, sp.x_knox
FROM sp, tm, n"""


def dispersion_ellipse(
    pts: DataFrame, group_cols: list[str], q_shift: int = 16
) -> DataFrame:
    """Standard-deviational-ellipse dispersion classifier per group (the
    Lefever 1926 / ArcGIS "directional distribution" summary — public
    method) in exact integers: per group the central second moments of the
    point cloud and two classifications — the orientation OCTANT of the
    ellipse's major axis and a compact/elongated shape class — with the
    usual atan2/sqrt/eigen float pipeline replaced by exact algebra.

    Coordinates are quantized to ``2^q_shift`` fixed-point units (default
    ≈ 0.0066° — dispersion at tile scale, not survey scale).  Central
    moments via the translation-invariant M00-scaled form (the
    image_central_moments discipline): c20 = n·Σx² − (Σx)², c02, c11 — the
    centroid division never taken.  The eigen structure of [[c20,c11],
    [c11,c02]] enters only through the doubled-angle vector
    (c20−c02, 2c11): its OCTANT (shared movement-rose sector rule —
    operators/trajectory._octant_expr, one rule text, three domains) is
    the major-axis direction class, and eccentricity
    (λ1−λ2)/(λ1+λ2) ≥ 1/2 is decided by the cross-multiplied inequality
    4·((c20−c02)² + 4c11²) ≥ (c20+c02)², carried in DECIMAL(38)/HUGEINT.
    Exact through n ≈ 10⁶ points per group at the default quantization
    (n²·span² < 2³⁸ digits); beyond that pre-aggregate to distinct
    quantized cells first — documented, not silent.

    Emits (group…, n_pts, qx_sum, qy_sum, c20, c02, c11, orient2_octant,
    shape_class): octant −1 and class 'degenerate' when the moment matrix
    is isotropic-zero or n < 2.

    100 TB: ONE map-side-combinable hash agg (5 sums + count); no joins,
    no window, no floats."""
    from osmgraft.operators.trajectory import _octant_expr

    qx = F.shiftright(F.col("x") + _OFF, q_shift).cast("long")
    qy = F.shiftright(F.col("y") + _OFF, q_shift).cast("long")
    agg = (
        pts.select(*group_cols, qx.alias("_qx"), qy.alias("_qy"))
        .groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pts"),
            F.sum("_qx").cast("long").alias("qx_sum"),
            F.sum("_qy").cast("long").alias("qy_sum"),
            F.sum(F.col("_qx") * F.col("_qx")).cast("long").alias("_sxx"),
            F.sum(F.col("_qy") * F.col("_qy")).cast("long").alias("_syy"),
            F.sum(F.col("_qx") * F.col("_qy")).cast("long").alias("_sxy"),
        )
    )
    d38 = "decimal(38,0)"
    n = F.col("n_pts").cast(d38)
    c20 = (n * F.col("_sxx").cast(d38) - F.col("qx_sum").cast(d38) * F.col("qx_sum").cast(d38)).alias("_c20")
    c02 = (n * F.col("_syy").cast(d38) - F.col("qy_sum").cast(d38) * F.col("qy_sum").cast(d38)).alias("_c02")
    c11 = (n * F.col("_sxy").cast(d38) - F.col("qx_sum").cast(d38) * F.col("qy_sum").cast(d38)).alias("_c11")
    m = agg.select(*group_cols, "n_pts", "qx_sum", "qy_sum", c20, c02, c11)
    a = F.col("_c20") - F.col("_c02")
    b = F.lit(2).cast(d38) * F.col("_c11")
    tr = F.col("_c20") + F.col("_c02")
    octant = F.when((a == 0) & (b == 0), F.lit(-1)).otherwise(_octant_expr(a, b))
    elong = F.lit(4).cast(d38) * (a * a + b * b) >= tr * tr
    cls = (
        F.when((F.col("n_pts") < 2) | (tr == 0), "degenerate")
        .when(elong, "elongated")
        .otherwise("compact")
    )
    return m.select(
        *group_cols,
        "n_pts",
        "qx_sum",
        "qy_sum",
        F.col("_c20").cast("long").alias("c20"),
        F.col("_c02").cast("long").alias("c02"),
        F.col("_c11").cast("long").alias("c11"),
        octant.cast("long").alias("orient2_octant"),
        cls.alias("shape_class"),
    )


def sql_dispersion_ellipse(
    pts_cte: str, group_cols: list[str], q_shift: int = 16
) -> str:
    """DuckDB twin of :func:`dispersion_ellipse` — identical quantization,
    HUGEINT moments, octant rule text and cross-multiplied shape class."""
    g = ", ".join(group_cols)
    return f"""WITH de_pts AS ({pts_cte}),
de_q AS (
  SELECT {g}, (x + {_OFF}) >> {q_shift} AS qx, (y + {_OFF}) >> {q_shift} AS qy
  FROM de_pts),
de_agg AS (
  SELECT {g}, CAST(count(*) AS BIGINT) AS n_pts,
         CAST(sum(qx) AS BIGINT) AS qx_sum, CAST(sum(qy) AS BIGINT) AS qy_sum,
         CAST(sum(qx * qx) AS BIGINT) AS sxx,
         CAST(sum(qy * qy) AS BIGINT) AS syy,
         CAST(sum(qx * qy) AS BIGINT) AS sxy
  FROM de_q GROUP BY {g}),
de_m AS (
  SELECT {g}, n_pts, qx_sum, qy_sum,
         CAST(n_pts AS HUGEINT) * sxx - CAST(qx_sum AS HUGEINT) * qx_sum AS c20,
         CAST(n_pts AS HUGEINT) * syy - CAST(qy_sum AS HUGEINT) * qy_sum AS c02,
         CAST(n_pts AS HUGEINT) * sxy - CAST(qx_sum AS HUGEINT) * qy_sum AS c11
  FROM de_agg)
SELECT {g}, n_pts, qx_sum, qy_sum,
       CAST(c20 AS BIGINT) AS c20, CAST(c02 AS BIGINT) AS c02,
       CAST(c11 AS BIGINT) AS c11,
       CAST(CASE WHEN c20 - c02 = 0 AND c11 = 0 THEN -1
            WHEN (c20 - c02) > 0 AND (2 * c11) >= 0
              THEN (CASE WHEN abs(2 * c11) < abs(c20 - c02) THEN 0 ELSE 1 END)
            WHEN (c20 - c02) <= 0 AND (2 * c11) > 0
              THEN (CASE WHEN abs(c20 - c02) < abs(2 * c11) THEN 2 ELSE 3 END)
            WHEN (c20 - c02) < 0 AND (2 * c11) <= 0
              THEN (CASE WHEN abs(2 * c11) < abs(c20 - c02) THEN 4 ELSE 5 END)
            ELSE (CASE WHEN abs(c20 - c02) < abs(2 * c11) THEN 6 ELSE 7 END)
       END AS BIGINT) AS orient2_octant,
       CASE WHEN n_pts < 2 OR c20 + c02 = 0 THEN 'degenerate'
            WHEN 4 * ((c20 - c02) * (c20 - c02) + (2 * c11) * (2 * c11))
                 >= (c20 + c02) * (c20 + c02) THEN 'elongated'
            ELSE 'compact' END AS shape_class
FROM de_m"""


def nn_g_function(pts: DataFrame, radii: list[int], shift: int) -> DataFrame:
    """Nearest-neighbour distance distribution (the G "event-to-event"
    function of spatial statistics, Diggle 1983 lineage) — Ripley's K's
    nearest-only companion: K counts ALL pairs within r, G asks what
    fraction of points have their NEAREST neighbour within r.  Emits one
    row per radius (r, n_pts, n_within) with n_within = #points whose
    min pair distance² ≤ r² — exact integers; G(r) = n_within/n_pts is
    the consumer's division.

    Candidates come from the same provably-complete 3×3 grid ring as
    ripley_k (pitch ≥ max radius): a point's nearest neighbour within
    max(radii) is necessarily inside the ring, and points with NO ring
    neighbour simply have nn > max(radii) — counted in n_pts, never in
    n_within.  Plan: ring pairs → BOTH orientations → grouped min d² per
    point → conditional sums, one stack explode.

    100 TB: local-density-bounded candidates, two map-side-combinable
    aggs, no window."""
    if max(radii) > (1 << shift):
        raise ValueError(f"max radius {max(radii)} exceeds pitch {1 << shift}")
    pr = _ring_pairs(pts, shift, [])
    d2 = _d2_long().alias("_d2")
    both = pr.select(F.col("pid_a").alias("pid"), d2).unionByName(
        pr.select(F.col("pid_b").alias("pid"), d2)
    )
    nn = both.groupBy("pid").agg(F.min("_d2").alias("_nn"))
    aggs = [
        F.sum(F.when(F.col("_nn") <= r * r, 1).otherwise(0))
        .cast("long")
        .alias(f"c{i}")
        for i, r in enumerate(radii)
    ]
    counts = nn.agg(*aggs).withColumn("k", F.lit(1))
    n = pts.agg(F.count(F.lit(1)).alias("n_pts")).withColumn("k", F.lit(1))
    stack = ", ".join(f"{r}L, c{i}" for i, r in enumerate(radii))
    return (
        counts.join(F.broadcast(n), "k")
        .selectExpr("n_pts", f"stack({len(radii)}, {stack}) AS (r, n_within)")
        .select("r", "n_pts", "n_within")
    )


def sql_nn_g_function(pts_cte: str, radii: list[int], shift: int) -> str:
    """DuckDB twin — gather-form ring, min-d² per point, per-radius
    conditional counts."""
    sels = "\nUNION ALL\n".join(
        f"SELECT {r} AS r, (SELECT count(*) FROM ({pts_cte})) AS n_pts, "
        f"(SELECT count(*) FROM nn WHERE mind2 <= {r * r}) AS n_within"
        for r in radii
    )
    return f"""WITH {_sql_ring_pairs(pts_cte, shift, [])},
nn AS (
  SELECT pid, min(d2) AS mind2 FROM (
    SELECT pid_a AS pid, {_SQL_D2} AS d2 FROM pairs
    UNION ALL
    SELECT pid_b AS pid, {_SQL_D2} AS d2 FROM pairs)
  GROUP BY pid)
{sels}"""
