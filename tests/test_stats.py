"""Exact distributed percentiles (operators/stats.py): rank convention vs a
plain-python order statistic, duplicate-heavy domains, tiny groups, q=1.0."""

import math

import numpy as np
from pyspark.sql import functions as F

from osmgraft.operators.stats import exact_percentiles


def _ref(vals, q_pm):
    s = sorted(vals)
    k = max(1, math.ceil(q_pm * len(s) / 1000))
    return s[k - 1]


def test_exact_percentiles_reference(spark):
    rng = np.random.default_rng(8)
    rows = [
        (f"g{int(i % 4)}", int(v))
        for i, v in enumerate(rng.integers(0, 50, 5000))  # heavy duplicates
    ]
    df = spark.createDataFrame(rows, "k string, v long")
    got = {
        (r.k, r.q_pm): r.val_q
        for r in exact_percentiles(df, ["k"], "v", [1, 250, 500, 900, 990, 1000]).collect()
    }
    by_key = {}
    for k, v in rows:
        by_key.setdefault(k, []).append(v)
    for k, vals in by_key.items():
        for q in (1, 250, 500, 900, 990, 1000):
            assert got[(k, q)] == _ref(vals, q), (k, q)


def test_exact_percentiles_tiny_groups(spark):
    df = spark.createDataFrame(
        [("a", 7), ("b", 1), ("b", 2), ("c", 5), ("c", 5), ("c", 9)],
        "k string, v long",
    )
    got = {
        (r.k, r.q_pm): r.val_q
        for r in exact_percentiles(df, ["k"], "v", [500, 1000]).collect()
    }
    assert got[("a", 500)] == 7 and got[("a", 1000)] == 7
    assert got[("b", 500)] == 1 and got[("b", 1000)] == 2
    assert got[("c", 500)] == 5 and got[("c", 1000)] == 9


def test_exact_percentiles_plan(spark):
    """Histogram agg has map-side partials; the window runs over distinct
    values, and no raw-row global sort appears."""
    df = spark.range(0, 10000).select(
        F.col("id").alias("v"), F.lit("k").alias("k")
    )
    plan = (
        exact_percentiles(df, ["k"], "v", [500])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("HashAggregate") >= 2
    assert "Window" in plan


def test_funnel_sequence_ordering(spark, tmp_path):
    """Order matters: a user who clicks BEFORE their first view does not
    advance; re-views after the click don't resurrect the sequence."""
    import datetime

    rows = [
        # u1: proper view -> click -> purchase
        (1, datetime.datetime(2024, 1, 1, 0, 0, 1), 10, "view", 1.0, "{}"),
        (2, datetime.datetime(2024, 1, 1, 0, 0, 2), 10, "click", 1.0, "{}"),
        (3, datetime.datetime(2024, 1, 1, 0, 0, 3), 10, "purchase", 1.0, "{}"),
        # u2: click precedes the only view -> stuck at step 1
        (4, datetime.datetime(2024, 1, 1, 0, 0, 1), 20, "click", 1.0, "{}"),
        (5, datetime.datetime(2024, 1, 1, 0, 0, 2), 20, "view", 1.0, "{}"),
        # u3: view then purchase but never clicks -> stuck at step 1
        (6, datetime.datetime(2024, 1, 1, 0, 0, 1), 30, "view", 1.0, "{}"),
        (7, datetime.datetime(2024, 1, 1, 0, 0, 2), 30, "purchase", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    d = str(tmp_path / "seq")
    df.write.parquet(f"{d}/events.parquet")
    from osmgraft.queries import REGISTRY

    got = {r.step: r.n_users for r in REGISTRY["funnel_sequence"][0](spark, d).collect()}
    assert got == {1: 3, 2: 1, 3: 1}


def test_exact_percentiles_ignore_nulls(spark):
    """NULLs are excluded like quantile_disc — ranks computed over non-null
    values only, and a group of only NULLs yields no rows."""
    import duckdb

    rows = [("a", 5), ("a", None), ("a", 1), ("a", None), ("a", 9), ("b", None)]
    df = spark.createDataFrame(rows, "k string, v long")
    got = {
        (r.k, r.q_pm): r.val_q
        for r in exact_percentiles(df, ["k"], "v", [500, 1000]).collect()
    }
    assert got == {("a", 500): 5, ("a", 1000): 9}
    ref = duckdb.execute(
        "SELECT quantile_disc(v, 0.5), quantile_disc(v, 1.0) FROM "
        "(VALUES (5),(NULL),(1),(NULL),(9)) t(v)"
    ).fetchone()
    assert (got[("a", 500)], got[("a", 1000)]) == ref


def test_kmv_accuracy_and_exact_small_groups(spark):
    from pyspark.sql import functions as F

    from osmgraft.operators.stats import kmv_distinct

    # group "big": 5000 distinct keys; group "small": 7 distinct (repeated)
    rows = [("big", i) for i in range(5000)]
    rows += [("small", i % 7) for i in range(100)]
    df = spark.createDataFrame(rows, "g string, key long")
    out = {r["g"]: r for r in kmv_distinct(df, ["g"], "key", k=64).collect()}
    assert out["small"]["n_kept"] == 7
    assert out["small"]["est_distinct"] == 7  # below k -> exact
    est = out["big"]["est_distinct"]
    # KMV relative error ~ 1/sqrt(k-1) ~ 13% at k=64; allow 3 sigma
    assert abs(est - 5000) < 5000 * 0.40, est
    assert out["big"]["n_kept"] == 64


def test_kmv_merge_law(spark):
    """sketch(A ∪ B) == merge(sketch(A), sketch(B)) — the k smallest of the
    union of the two kept sets. This is what makes KMV a partial aggregate."""
    from osmgraft.operators.stats import kmv_distinct

    a = [("g", i) for i in range(800)]
    b = [("g", i) for i in range(400, 1300)]  # overlapping
    k = 32
    df_a = spark.createDataFrame(a, "g string, key long")
    df_b = spark.createDataFrame(b, "g string, key long")
    df_u = spark.createDataFrame(a + b, "g string, key long")

    def kept(df):
        # recompute the kept hash set through the operator's own window path
        from pyspark.sql import Window, functions as F

        h = F.conv(
            F.substring(F.md5(F.col("key").cast("string")), 1, 12), 16, 10
        ).cast("long")
        dh = df.select("g", h.alias("h")).distinct()
        w = Window.partitionBy("g").orderBy("h")
        return sorted(
            r["h"]
            for r in dh.select("g", "h", F.row_number().over(w).alias("rn"))
            .where(F.col("rn") <= k)
            .collect()
        )

    merged = sorted(set(kept(df_a)) | set(kept(df_b)))[:k]
    assert kept(df_u) == merged
    # and the union estimate derived from the merged sketch matches the op
    (row,) = kmv_distinct(df_u, ["g"], "key", k=k).collect()
    assert row["kth_hash"] == merged[-1]


def test_kmv_intersect_accuracy(spark):
    """Known overlap: groups A (0..999) and B (500..1499) share 500 keys.
    The theta estimate must land within KMV error bounds, and the same rows
    pushed through exact set logic agree with the estimator's sample."""
    from osmgraft.operators.stats import kmv_intersect

    rows = [("A", i) for i in range(1000)] + [("B", i) for i in range(500, 1500)]
    df = spark.createDataFrame(rows, "g string, key long")
    out = kmv_intersect(df, "g", "key", k=128).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["ga"], r["gb"]) == ("A", "B")
    # true overlap 500; k=128 -> rel error ~ 1/sqrt(127) ~ 9%; allow 3 sigma
    assert abs(r["est_common"] - 500) < 500 * 0.30, r["est_common"]
    # disjoint groups produce no pair row
    rows2 = [("A", i) for i in range(200)] + [("B", i + 10_000) for i in range(200)]
    df2 = spark.createDataFrame(rows2, "g string, key long")
    pairs = kmv_intersect(df2, "g", "key", k=32).collect()
    for p in pairs:
        assert p["common_kept"] <= 1  # chance hash collisions only (48-bit: none)


# --- column profiler ------------------------------------------------------------


def test_profile_columns_nulls_and_minmax(spark):
    from osmgraft.operators.stats import profile_columns

    df = spark.createDataFrame(
        [(1, "b"), (2, None), (9, "a"), (10, "a"), (None, "c")],
        "k int, s string",
    )
    prof = {r["col"]: r for r in profile_columns(df, ["k", "s"]).collect()}
    k, s = prof["k"], prof["s"]
    assert (k["n"], k["n_null"], k["n_distinct"]) == (5, 1, 4)
    # min/max taken in NATIVE type then cast: 10 > 9 numerically even though
    # "10" < "9" lexically — the string-ordering trap the operator avoids
    assert (k["min_s"], k["max_s"]) == ("1", "10")
    assert (s["n"], s["n_null"], s["n_distinct"]) == (5, 1, 3)
    assert (s["min_s"], s["max_s"]) == ("a", "c")


def test_profile_columns_approx_bounded(spark):
    """The 100 TB path (HLL++): relative error within the sketch's
    documented bound on a 10k-distinct column."""
    from osmgraft.operators.stats import profile_columns

    df = spark.range(10_000).selectExpr("id AS k")
    got = profile_columns(df, ["k"], exact=False).collect()[0]
    assert abs(got["n_distinct"] - 10_000) / 10_000 < 0.05
    assert got["n_null"] == 0


def test_profile_single_job_plan(spark):
    """One scan, one Expand (the multi-countDistinct rewrite), no
    per-column union of jobs."""
    from osmgraft.operators.stats import profile_columns

    df = spark.createDataFrame([(1, "a", 2.0)], "a int, b string, c double")
    plan = (
        profile_columns(df, ["a", "b"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Expand") >= 1
    assert "Union" not in plan


# --- MAD ---------------------------------------------------------------------


def test_mad_exact_hand_case_and_robustness(spark):
    from osmgraft.operators.stats import mad_exact

    # g: values 1..7 → med 4, |dev| {3,2,1,0,1,2,3} → mad 2
    # h: same but one wild outlier replaces 7 → med stays 4, mad stays 2
    rows = [("g", v) for v in range(1, 8)] + [
        ("h", v) for v in [1, 2, 3, 4, 5, 6, 10_000_000]
    ]
    df = spark.createDataFrame(rows, "grp string, v int")
    got = {r["grp"]: (r["med"], r["mad"]) for r in mad_exact(df, ["grp"], "v").collect()}
    assert got["g"] == (4, 2)
    assert got["h"] == (4, 2)  # the outlier moved NOTHING — the point of MAD


def test_mad_even_count_and_nulls(spark):
    """Even n uses the smallest-kth (quantile_disc) convention; NULLs are
    excluded, not ranked."""
    from osmgraft.operators.stats import mad_exact

    df = spark.createDataFrame(
        [("e", 1), ("e", 3), ("e", 5), ("e", 7), ("e", None)],
        "grp string, v int",
    )
    got = mad_exact(df, ["grp"], "v").collect()[0]
    # n=4 → k=2 → med 3; devs |1-3|,|3-3|,|5-3|,|7-3| = {2,0,2,4} sorted
    # {0,2,2,4} → k=2 → mad 2
    assert (got["med"], got["mad"]) == (3, 2)


# --- CUSUM ---------------------------------------------------------------------


def _cusum_ref(seq, d):
    """Dense textbook recurrence C_t = max(0, C + x - d) from t0 to t1."""
    cnts = dict(seq)
    h0, h1 = min(cnts), max(cnts)
    out, c = {}, 0
    for t in range(h0, h1 + 1):
        c = max(0, c + cnts.get(t, 0) - d)
        if t in cnts:
            out[t] = c
    return out


def test_cusum_matches_dense_recurrence(spark):
    """Sparse closed form == the dense textbook recurrence, on a fixture
    with long gaps (gap drain), a planted burst, and a reset-to-zero."""
    from osmgraft.operators.stats import cusum_bursts

    seq = [(10, 5), (11, 1), (12, 4), (20, 9), (21, 8), (22, 1), (40, 2)]
    tot, span = sum(x for _, x in seq), 40 - 10 + 1
    d = -(-tot // span)  # ceil
    df = spark.createDataFrame(
        [("a", t, x) for t, x in seq], "k string, t long, x long"
    )
    got = {r["t"]: (r["cnt" if False else "x"], r["cusum"], r["burst"])
           for r in cusum_bursts(df, "k", "t", "x").collect()}
    ref = _cusum_ref(seq, d)
    assert set(got) == set(ref)
    for t in ref:
        assert got[t][1] == ref[t], (t, got[t], ref[t])
        assert got[t][2] == (ref[t] > 4 * d)
    # the planted burst fires and the long gap drains back to zero
    assert any(b for _, _, b in got.values())
    assert got[40][1] == max(0, 2 - d)


def test_cusum_multi_key_independence(spark):
    """Keys are independent: duplicating a key's rows under another key
    leaves both series identical."""
    from osmgraft.operators.stats import cusum_bursts

    rows = [("a", t, (t * 7) % 5 + 1) for t in range(100, 130)]
    df = spark.createDataFrame(
        rows + [("b", t, x) for _, t, x in rows], "k string, t long, x long"
    )
    out = cusum_bursts(df, "k", "t", "x").collect()
    a = sorted((r["t"], r["cusum"]) for r in out if r["k"] == "a")
    b = sorted((r["t"], r["cusum"]) for r in out if r["k"] == "b")
    assert a == b and len(a) == 30


def test_autocorr_terms_reference_and_laws(spark):
    """Sparse closed form == a dense python reference; a perfectly periodic
    series gives num == den (autocorr 1); keys with span <= lag drop."""
    from osmgraft.operators.stats import autocorr_terms

    rows = []
    # perfectly periodic (period 3, span 30) with MISSING zero steps kept
    # implicit: x = [5, 0, 0, 5, 0, 0, ...] -> only t%3==0 observed
    rows += [("per", t, 5) for t in range(0, 30, 3)]
    # aperiodic sparse series
    rows += [("ap", t, (t * 7) % 11 + 1) for t in (0, 1, 4, 9, 16, 25, 33)]
    # span shorter than the lag -> dropped
    rows += [("short", 0, 3), ("short", 2, 4)]
    df = spark.createDataFrame(rows, "k string, t long, x long")
    got = {r["k"]: (r["n_steps"], r["num"], r["den"])
           for r in autocorr_terms(df, "k", "t", "x", lag=3).collect()}
    assert set(got) == {"per", "ap"}

    for k in ("per", "ap"):
        obs = {t: x for kk, t, x in rows if kk == k}
        lo, hi = min(obs), max(obs)
        n = hi - lo + 1
        xs = [obs.get(t, 0) for t in range(lo, hi + 1)]
        s = sum(xs)
        d = [n * x - s for x in xs]
        num = sum(d[i] * d[i + 3] for i in range(n - 3))
        den = sum(v * v for v in d)
        assert got[k] == (n, num, den), k
    # period-3 series at lag 3: strong positive correlation (d_{t+3} == d_t
    # for every full period, so num is den minus the 3 truncated boundary
    # terms -> strictly positive and close to den)
    n_per, num_per, den_per = got["per"]
    assert 0 < num_per <= den_per
    assert 10 * num_per > 8 * den_per


def test_groupwise_ols_golden(spark):
    """Known line y = 3x + 7 -> slope_num/den == 3 exactly, icept_num/den
    == 7; constant-x group -> den == 0."""
    from osmgraft.operators.stats import groupwise_ols

    rows = [("a", x, 3 * x + 7) for x in range(10)]
    rows += [("b", 5, y) for y in (1, 2, 3)]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    out = {r["g"]: r for r in groupwise_ols(df, ["g"], "x", "y").collect()}
    a = out["a"]
    assert a["den"] > 0 and a["slope_num"] == 3 * a["den"]
    assert a["icept_num"] == 7 * a["den"]
    assert out["b"]["den"] == 0 and out["b"]["n"] == 3


def test_interval_union_nesting_and_touching(spark):
    """Containment, touching and disjoint intervals: [0,10) ∪ [2,3) ∪
    [10,12) merge to one island of length 12; [20,21) is separate."""
    from osmgraft.operators.stats import interval_union

    rows = [("u", 0, 10), ("u", 2, 3), ("u", 10, 12), ("u", 20, 21),
            ("v", 5, 6)]
    df = spark.createDataFrame(rows, "k string, s long, e long")
    out = {r["k"]: (r["n_intervals"], r["covered"])
           for r in interval_union(df, ["k"], "s", "e").collect()}
    assert out["u"] == (2, 13)
    assert out["v"] == (1, 1)


def test_tile_gini_bounds(spark):
    """Gini sanity on the real fixture: 0 < G < 1 and the rational is in
    canonical integer form; hot-spot skew makes it clearly nonzero."""
    from osmgraft.queries import tile_skew_gini_z9

    r = tile_skew_gini_z9(spark, "/root/testdata/sf0.001").collect()[0]
    g = r["gini_num"] / r["gini_den"]
    assert 0.05 < g < 1.0
    assert r["n_tiles"] > 100 and r["total"] == 1500


def test_groupwise_ols_null_rows_excluded(spark):
    from osmgraft.operators.stats import groupwise_ols

    rows = [("a", 1, 3), ("a", None, 5), ("a", 2, None), ("a", 2, 6)]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    r = groupwise_ols(df, ["g"], "x", "y").collect()[0]
    # only the two complete rows participate: y = 3x exactly
    assert r["n"] == 2 and r["slope_num"] == 3 * r["den"] and r["den"] > 0


def test_mann_kendall_hand_cases(spark):
    """Hand-computed S / n / class on tiny series (Mann 1945 definition):
    strictly increasing n=5 → S=10 rising (18·100 > 4·300); strictly
    decreasing → falling; constant → S=0 flat; n=2 single step → S=±1 but
    insignificant (18 < 72) → flat; singleton key (no pairs) → S=0 flat."""
    from osmgraft.operators.stats import mann_kendall

    rows = []
    for t, v in enumerate([1, 2, 3, 4, 5]):
        rows.append(("up", t, v))
    for t, v in enumerate([9, 7, 5, 3, 1]):
        rows.append(("down", t, v))
    for t in range(5):
        rows.append(("const", t, 4))
    rows += [("short", 0, 1), ("short", 1, 2), ("single", 0, 7)]
    df = spark.createDataFrame(rows, "k string, day long, cnt long")
    out = {r["k"]: r for r in mann_kendall(df, ["k"]).collect()}
    assert out["up"]["s_stat"] == 10 and out["up"]["trend"] == "rising"
    assert out["down"]["s_stat"] == -10 and out["down"]["trend"] == "falling"
    assert out["const"]["s_stat"] == 0 and out["const"]["trend"] == "flat"
    assert out["short"]["s_stat"] == 1 and out["short"]["trend"] == "flat"
    assert out["single"]["s_stat"] == 0 and out["single"]["n_days"] == 1
    assert out["single"]["trend"] == "flat"


def test_local_join_counts_hand_grid(spark):
    """Hand grid: two adjacent hot cells get jc=1 toward each other; an
    isolated hot cell gets jc=0; cold cells report observed neighbor counts;
    a neighbor-less cell keeps k_obs=0 via the left join."""
    from osmgraft.operators.density import local_join_counts

    # values: mean = 30/5 = 6 -> hot iff v > 6
    rows = [
        (0, 0, 10), (1, 0, 10),   # adjacent hot pair
        (0, 1, 1), (1, 1, 1),     # cold cells under them
        (9, 9, 8),                # isolated hot (no neighbors at all)
    ]
    df = spark.createDataFrame(rows, "cx long, cy long, cnt long")
    out = {(r["cx"], r["cy"]): r for r in local_join_counts(df).collect()}
    assert out[(0, 0)]["hot"] == 1 and out[(0, 0)]["jc"] == 1 and out[(0, 0)]["k_obs"] == 2
    assert out[(1, 0)]["jc"] == 1
    assert out[(9, 9)]["hot"] == 1 and out[(9, 9)]["jc"] == 0 and out[(9, 9)]["k_obs"] == 0
    assert out[(0, 1)]["hot"] == 0 and out[(0, 1)]["k_obs"] == 2 and out[(0, 1)]["jc"] == 0


def _ts_ref(series, lcm=2329089562800):
    """Independent median-of-pairwise-slopes reference (python fractions)."""
    from fractions import Fraction

    pts = sorted(series)
    slopes = []
    for i in range(len(pts)):
        for j in range(i + 1, len(pts)):
            dx = pts[j][0] - pts[i][0]
            slopes.append(Fraction(pts[j][1] - pts[i][1], dx))
    slopes.sort()
    med = slopes[(len(slopes) + 1) // 2 - 1]
    return len(pts), len(slopes), int(med * lcm)


def test_theil_sen_matches_fraction_reference(spark):
    from osmgraft.operators.stats import theil_sen

    groups = {
        1: [(0, 5), (1, 7), (2, 9), (3, 11)],              # exact slope 2
        2: [(0, 10), (3, 10), (7, 300), (9, 10), (12, 10)],  # burst day: robust 0
        3: [(0, 9), (2, 3), (5, 1), (6, 0)],                # falling, fractional
        4: [(10, 4), (11, 9)],                              # single pair
    }
    rows = [(g, t, v) for g, s in groups.items() for t, v in s]
    df = spark.createDataFrame(rows, "g long, day long, cnt long")
    got = {
        r["g"]: (r["n_days"], r["n_pairs"], r["slope_num"])
        for r in theil_sen(df, ["g"]).collect()
    }
    for g, series in groups.items():
        assert got[g] == _ts_ref(series), g
    # robustness: group 2's burst does NOT drag the median off zero
    assert got[2][2] == 0
    # singletons carry no slope
    one = spark.createDataFrame([(9, 0, 5)], "g long, day long, cnt long")
    assert theil_sen(one, ["g"]).count() == 0


def test_theil_sen_gap_guard(spark):
    import pytest
    from osmgraft.operators.stats import theil_sen

    df = spark.createDataFrame([(1, 0, 1), (1, 40, 5)], "g long, day long, cnt long")
    with pytest.raises(Exception):
        theil_sen(df, ["g"]).collect()


def _py_hll(keys):
    """Independent python replay of the portable HLL (registers + exact
    integer emission)."""
    import hashlib

    from osmgraft.operators.stats import (
        HLL_M, HLL_RMAX, HLL_W, _HLL_EST_NUM, _HLL_LARGE_MILLI, _HLL_LC_MILLI,
    )

    regs = [0] * HLL_M
    for k in keys:
        x = int(hashlib.md5(str(k).encode()).hexdigest()[:12], 16) >> 16
        j, w = x >> HLL_W, x & ((1 << HLL_W) - 1)
        rho = HLL_RMAX if w == 0 else HLL_RMAX - w.bit_length()
        regs[j] = max(regs[j], rho)
    n_zero = sum(1 for r in regs if r == 0)
    sum_sh = sum(1 << (HLL_RMAX - r) for r in regs)
    raw = _HLL_EST_NUM // sum_sh
    # -1 sentinel outside the raw branch (r5 fetch-invariance rule)
    if raw <= _HLL_LC_MILLI and n_zero > 0:
        return n_zero, sum_sh, "linear", -1
    if raw > _HLL_LARGE_MILLI:
        return n_zero, sum_sh, "large", -1
    return n_zero, sum_sh, "raw", raw


def test_hll_matches_python_reference_and_accuracy(spark):
    from osmgraft.operators.stats import hll_distinct

    rows = [("big", i * 7919) for i in range(6000)] + [
        ("small", i % 9) for i in range(100)
    ]
    df = spark.createDataFrame(rows, "g string, key long")
    out = {r["g"]: r for r in hll_distinct(df, ["g"], "key").collect()}

    for g, keys in (
        ("big", [i * 7919 for i in range(6000)]),
        ("small", [i % 9 for i in range(100)]),
    ):
        nz, sh, kind, est = _py_hll(keys)
        r = out[g]
        assert (r["n_zero"], r["sum_sh"], r["est_kind"], r["est_milli"]) == (
            nz, sh, kind, est
        ), g

    # small group: 9 distinct -> linear-counting branch (est = -1 sentinel,
    # exact ingredients emitted)
    assert out["small"]["est_kind"] == "linear"
    assert out["small"]["est_milli"] == -1
    # big group: raw branch; HLL sigma ~ 1.04/sqrt(64) = 13% — allow 3 sigma
    assert out["big"]["est_kind"] == "raw"
    est = out["big"]["est_milli"] / 1000.0
    assert abs(est - 6000) < 6000 * 0.40, est


def test_hll_merge_law(spark):
    """Register-wise max of two sketches == sketch of the union — what
    makes HLL a partial aggregate at 100 TB. Verified through the exact
    emitted (n_zero, sum_sh): recompute per-half registers in python, merge
    by max, compare to the operator's union-run output."""
    from osmgraft.operators.stats import hll_distinct

    a = [i * 31 for i in range(3000)]
    b = [i * 31 for i in range(1500, 4500)]
    df_u = spark.createDataFrame(
        [("g", k) for k in a + b], "g string, key long"
    )
    got = hll_distinct(df_u, ["g"], "key").collect()[0]

    import hashlib

    from osmgraft.operators.stats import HLL_M, HLL_RMAX, HLL_W

    def regs_of(keys):
        regs = [0] * HLL_M
        for k in keys:
            x = int(hashlib.md5(str(k).encode()).hexdigest()[:12], 16) >> 16
            j, w = x >> HLL_W, x & ((1 << HLL_W) - 1)
            rho = HLL_RMAX if w == 0 else HLL_RMAX - w.bit_length()
            regs[j] = max(regs[j], rho)
        return regs

    merged = [max(x, y) for x, y in zip(regs_of(a), regs_of(b))]
    assert got["n_zero"] == sum(1 for r in merged if r == 0)
    assert got["sum_sh"] == sum(1 << (HLL_RMAX - r) for r in merged)


def test_hll_kmv_cross_check(spark):
    """The two portable estimators agree with each other (and truth) on one
    population — the cross-query invariant pinning hll_distinct_users_z6
    beside kmv_distinct_users_z6."""
    from osmgraft.operators.stats import hll_distinct, kmv_distinct

    keys = [(i * 104729) % 1000003 for i in range(4000)]
    df = spark.createDataFrame([("g", k) for k in keys], "g string, key long")
    truth = len(set(keys))
    h = hll_distinct(df, ["g"], "key").collect()[0]["est_milli"] / 1000.0
    k = kmv_distinct(df, ["g"], "key", k=64).collect()[0]["est_distinct"]
    assert abs(h - truth) < truth * 0.40
    assert abs(k - truth) < truth * 0.40
    assert abs(h - k) < truth * 0.60


def test_hll_plan_two_aggregates_no_python(spark):
    from osmgraft.operators.stats import hll_distinct

    df = spark.createDataFrame([("g", 1)], "g string, key long")
    plan = (
        hll_distinct(df, ["g"], "key")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan and "Cartesian" not in plan


def _kendall_ref(obs, strong_num=1, strong_den=4):
    """Brute-force τ-b classification (independent of both engines)."""
    import itertools

    c = d = tx = ty = tb = 0
    for (x1, y1), (x2, y2) in itertools.combinations(obs, 2):
        dx, dy = x2 - x1, y2 - y1
        if dx * dy > 0:
            c += 1
        elif dx * dy < 0:
            d += 1
        elif dx == 0 and dy == 0:
            tb += 1
        elif dx == 0:
            tx += 1
        else:
            ty += 1
    n = len(obs)
    n0 = n * (n - 1) // 2
    den = (n0 - tx - tb) * (n0 - ty - tb)
    s = c - d
    if den == 0:
        cls = "degenerate"
    elif strong_den * s * s >= strong_num * den:
        cls = "concordant" if s > 0 else ("discordant" if s < 0 else "weak")
    else:
        cls = "weak"
    return (n, c, d, tx, ty, tb, cls)


def test_kendall_tau_matches_brute_force(spark):
    from osmgraft.operators.stats import kendall_tau

    rows = [
        (g, t, ((g * 31 + t * 17) * 97) % 23, ((g * 13 + t * 7) * 89) % 19)
        for g in range(1, 8)
        for t in range(1, 1 + 4 + (g % 5))
    ]
    df = spark.createDataFrame(rows, "g long, t long, x long, y long")
    got = {
        r["g"]: (
            r["n_obs"], r["concordant"], r["discordant"],
            r["tied_x"], r["tied_y"], r["tied_both"], r["tau_class"],
        )
        for r in kendall_tau(df, ["g"], "t", "x", "y").collect()
    }
    series = {}
    for g, t, x, y in rows:
        series.setdefault(g, []).append((t, x, y))
    for g, obs in series.items():
        ref = _kendall_ref([(x, y) for _, x, y in sorted(obs)])
        assert got[g] == ref, g


def test_kendall_tau_classes(spark):
    """Perfect agreement -> concordant; perfect reversal -> discordant;
    constant marginal -> degenerate; a dwell pair is a tie, not noise."""
    from osmgraft.operators.stats import kendall_tau

    rows = (
        [(1, t, t, t * 2) for t in range(5)]            # tau = +1
        + [(2, t, t, 100 - t) for t in range(5)]        # tau = -1
        + [(3, t, 7, t) for t in range(5)]              # x constant
        + [(4, 0, 1, 1), (4, 1, 1, 1), (4, 2, 5, 9)]    # tied_both pair
    )
    df = spark.createDataFrame(rows, "g long, t long, x long, y long")
    got = {r["g"]: r.asDict() for r in kendall_tau(df, ["g"], "t", "x", "y").collect()}
    assert got[1]["tau_class"] == "concordant" and got[1]["discordant"] == 0
    assert got[2]["tau_class"] == "discordant" and got[2]["concordant"] == 0
    assert got[3]["tau_class"] == "degenerate"
    assert got[4]["tied_both"] == 1 and got[4]["concordant"] == 2


def test_kendall_tau_plan_no_python(spark):
    from osmgraft.operators.stats import kendall_tau

    df = spark.createDataFrame(
        [(1, 0, 1, 2), (1, 1, 2, 3)], "g long, t long, x long, y long"
    )
    plan = (
        kendall_tau(df, ["g"], "t", "x", "y")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan and "Cartesian" not in plan


def _md5_sign(i, key):
    import hashlib

    h = int(hashlib.md5(f"{i}:{key}".encode()).hexdigest()[:12], 16)
    return 1 - 2 * (h & 1)


def test_ams_f2_matches_reference_and_bounds(spark):
    """Sign sums replicate the salted-md5 reference exactly; the exact_f2
    column is the true second moment; the median-of-means estimate lands
    within 4/sqrt(groups) relative error on a skewed fixture (well inside
    the AMS variance bound for this seed — pinned, deterministic)."""
    from osmgraft.operators.stats import ams_f2

    rows = [(1, u) for u in range(40) for _ in range(1 + (u % 7 == 0) * 9)]
    df = spark.createDataFrame(rows, "g long, u long")
    out = ams_f2(df, ["g"], "u").collect()[0]
    f2_true = sum((1 + (u % 7 == 0) * 9) ** 2 for u in range(40))
    assert out["exact_f2"] == f2_true
    assert out["n_rows"] == len(rows)
    # replicate estimator 0..15 sign sums -> group sums -> lower median
    s = [
        sum(_md5_sign(i, u) * (1 + (u % 7 == 0) * 9) for u in range(40))
        for i in range(16)
    ]
    gsum = [sum(x * x for x in s[a * 4 : (a + 1) * 4]) for a in range(4)]
    assert out["est_num"] == sorted(gsum)[1] and out["est_den"] == 4
    est = out["est_num"] / out["est_den"]
    assert abs(est - f2_true) / f2_true < 2.0  # deterministic seed, sane scale


def test_ams_f2_uniform_vs_concentrated(spark):
    """F2 separates what F0 cannot: same n_rows and same distinct count
    ordering flips — a single hot key dominates Σf² while the uniform
    group stays near n²/d."""
    from osmgraft.operators.stats import ams_f2

    rows = [(1, u) for u in range(100)] + [(2, 0)] * 91 + [(2, u) for u in range(1, 10)]
    df = spark.createDataFrame(rows, "g long, u long")
    got = {r["g"]: r for r in ams_f2(df, ["g"], "u").collect()}
    assert got[1]["n_rows"] == got[2]["n_rows"] == 100
    assert got[1]["exact_f2"] == 100
    assert got[2]["exact_f2"] == 91 * 91 + 9
    # estimator must separate the two by an order of magnitude too
    assert got[2]["est_num"] * got[1]["est_den"] > 10 * got[1]["est_num"] * got[2]["est_den"]


def test_ams_f2_plan_no_python_no_explode(spark):
    from osmgraft.operators.stats import ams_f2

    df = spark.createDataFrame([(1, 2), (1, 3)], "g long, u long")
    plan = ams_f2(df, ["g"], "u")._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Generate" not in plan


def test_contingency_assoc_matches_float_reference(spark):
    """Exact integer class == the float adjusted-residual formula on a
    deterministic skewed table (and the fixture actually exercises all
    three classes)."""
    import math

    from osmgraft.operators.stats import contingency_assoc

    # hand-built counts spanning all three classes: diagonal surplus,
    # starved off-diagonals, and near-independent cells
    counts = {
        ("r0", "c0"): 80, ("r0", "c1"): 20, ("r0", "c2"): 50,
        ("r1", "c0"): 20, ("r1", "c1"): 80, ("r1", "c2"): 50,
        ("r2", "c0"): 50, ("r2", "c1"): 50, ("r2", "c2"): 50,
    }
    rows = [(r, c) for (r, c), k in counts.items() for _ in range(k)]
    df = spark.createDataFrame(rows, "lang string, source string")
    got = {(x["lang"], x["source"]): x for x in contingency_assoc(df, "lang", "source").collect()}
    from collections import Counter

    o = Counter(rows)
    rt = Counter(r for r, _ in rows)
    ct = Counter(c for _, c in rows)
    n = len(rows)
    classes = set()
    for (r, c), row in got.items():
        e = rt[r] * ct[c] / n
        d = (o[(r, c)] - e) / math.sqrt(e * (1 - rt[r] / n) * (1 - ct[c] / n))
        want = "enriched" if d >= 2 else ("depleted" if d <= -2 else "none")
        assert row["assoc"] == want, ((r, c), d, row["assoc"])
        assert row["o"] == o[(r, c)] and row["n_tot"] == n
        classes.add(want)
    assert classes == {"enriched", "depleted", "none"}


def test_contingency_assoc_independent_table(spark):
    """A perfectly independent product table has every cell 'none' and
    N*O == R*C exactly."""
    from osmgraft.operators.stats import contingency_assoc

    rows = [(f"r{i}", f"c{j}") for i in range(3) for j in range(4) for _ in range(5)]
    df = spark.createDataFrame(rows, "lang string, source string")
    out = contingency_assoc(df, "lang", "source").collect()
    assert len(out) == 12 and all(x["assoc"] == "none" for x in out)
    for x in out:
        assert x["n_tot"] * x["o"] == x["r_tot"] * x["c_tot"]


def test_benford_matches_float_reference(spark):
    """Exact ppm class == the float binomial z-test on a log-uniform-ish
    fixture (2^k values are Benford-perfect in the limit; a planted spike
    of 9xxx values flips digit 9 to 'over')."""
    import math

    from osmgraft.operators.stats import BENFORD_PPM, benford_deviation

    vals = [2**k for k in range(1, 63)] * 3 + [9000 + i for i in range(120)]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = {r["digit"]: r for r in benford_deviation(df, "v").collect()}
    from collections import Counter

    obs = Counter(int(str(v)[0]) for v in vals)
    n = len(vals)
    for d in range(1, 10):
        p = BENFORD_PPM[d - 1] / 1e6
        z = (obs[d] - n * p) / math.sqrt(n * p * (1 - p))
        want = "over" if z >= 2 else ("under" if z <= -2 else "ok")
        assert got[d]["conformity"] == want, (d, z)
        assert got[d]["o"] == obs[d] and got[d]["exp_ppm"] == BENFORD_PPM[d - 1]
    assert got[9]["conformity"] == "over"


def test_benford_excludes_nonpositive_and_sums(spark):
    from osmgraft.operators.stats import benford_deviation

    df = spark.createDataFrame(
        [(v,) for v in [-5, 0, 123, 456, 789, 12, 1]], "v long"
    )
    out = benford_deviation(df, "v").collect()
    assert sum(r["o"] for r in out) == 5
    assert all(r["n_tot"] == 5 for r in out)


def _pettitt_ref(series):
    """Textbook Pettitt: U_r over ordered values, max |U|, smallest split."""
    vals = [v for _, v in sorted(series)]
    ts = [t for t, _ in sorted(series)]
    n = len(vals)
    best = None
    for r in range(1, n):
        u = sum(
            (vals[j] > vals[i]) - (vals[j] < vals[i])
            for i in range(r)
            for j in range(r, n)
        )
        cand = (abs(u), -r)
        if best is None or cand > best:
            best, bu = cand, u
    k, r = best[0], -best[1]
    sig = 6_000_000 * k * k >= 3_688_879 * (n**3 + n**2)
    return (n, k, bu, ts[r - 1], "change" if sig else "stable")


def test_pettitt_matches_reference(spark):
    from osmgraft.operators.stats import pettitt

    import numpy as np

    rng = np.random.default_rng(23)
    rows, refs = [], {}
    for g in range(1, 7):
        n = 8 + g * 3
        shift_at = n // 2
        series = [
            (t, int(rng.integers(0, 10)) + (40 if g % 2 and t >= shift_at else 0))
            for t in range(n)
        ]
        rows += [(g, t, v) for t, v in series]
        refs[g] = _pettitt_ref(series)
    df = spark.createDataFrame(rows, "g long, day long, cnt long")
    got = {
        r["g"]: (r["n_obs"], r["k_stat"], r["u_signed"], r["t_star"], r["change_class"])
        for r in pettitt(df, ["g"]).collect()
    }
    for g, want in refs.items():
        assert got[g] == want, (g, got[g], want)
    # odd groups carry a planted level shift -> must be flagged
    assert all(got[g][4] == "change" for g in (1, 3, 5))
    assert all(got[g][4] == "stable" for g in (2, 4, 6))


def test_pettitt_locates_the_shift(spark):
    """A clean level shift puts t_star exactly at the last low day."""
    from osmgraft.operators.stats import pettitt

    rows = [(1, t, 5) for t in range(10)] + [(1, t, 50) for t in range(10, 20)]
    df = spark.createDataFrame(rows, "g long, day long, cnt long")
    (r,) = pettitt(df, ["g"]).collect()
    assert r["t_star"] == 9 and r["k_stat"] == 100 and r["change_class"] == "change"


def test_weekday_seasonality_reference_and_epoch_dow(spark):
    """Cleared inequality == the float z-test; the integer dow convention
    puts 1970-01-01 (a Thursday) at 4 with Monday = 0."""
    import math

    from osmgraft.operators.stats import weekday_seasonality

    assert (0 + 4) % 7 == 4  # 1970-01-01 -> Thursday
    # group 1: uniform-ish; group 2: strong Saturday spike
    rows = [(1, d % 7) for d in range(700)]
    rows += [(2, 5)] * 200 + [(2, d % 7) for d in range(350)]
    df = spark.createDataFrame(rows, "g long, dow long")
    got = {(r["g"], r["dow"]): r for r in weekday_seasonality(df, ["g"]).collect()}
    from collections import Counter

    obs = {g: Counter() for g in (1, 2)}
    for g, d in rows:
        obs[g][d] += 1
    for g in (1, 2):
        n = sum(obs[g].values())
        for d in range(7):
            o = obs[g][d]
            z = (o - n / 7) / math.sqrt(n * (1 / 7) * (6 / 7))
            want = "over" if z >= 2 else ("under" if z <= -2 else "flat")
            assert got[(g, d)]["seasonality"] == want, (g, d, z)
    assert got[(2, 5)]["seasonality"] == "over"
    assert all(got[(1, d)]["seasonality"] == "flat" for d in range(7))


def test_markov_transitions_hand_chain(spark):
    """Two users' chains pool into the global matrix; the mode is pinned
    lexicographically on count ties; cross-user boundaries never create
    transitions."""
    from osmgraft.operators.stats import markov_transitions

    rows = [
        (1, 0, "a"), (1, 1, "b"), (1, 2, "a"), (1, 3, "c"),
        (2, 0, "a"), (2, 1, "b"), (2, 2, "b"),
    ]
    df = spark.createDataFrame(rows, "u long, t long, s string")
    got = {
        (r["from_state"], r["to_state"]): (r["cnt"], r["row_total"], r["is_mode"])
        for r in markov_transitions(df, ["u"], "s", ["t"]).collect()
    }
    assert got == {
        ("a", "b"): (2, 3, True),
        ("a", "c"): (1, 3, False),
        ("b", "a"): (1, 2, True),   # tie 1-1 with (b,b): 'a' wins lexicographically
        ("b", "b"): (1, 2, False),
    }
    assert sum(c for c, _, _ in got.values()) == 5  # 3 + 2 steps, no cross-user


def _pava_ref(vals):
    """Textbook sequential pool-adjacent-violators, exact Fractions."""
    from fractions import Fraction

    blocks = [[Fraction(v), 1] for v in vals]  # [sum, len]
    out = []
    for b in blocks:
        out.append(b)
        while len(out) >= 2 and out[-2][0] * out[-1][1] >= out[-1][0] * out[-2][1]:
            s, l = out.pop()
            out[-1][0] += s
            out[-1][1] += l
    fit = []
    for s, l in out:
        fit += [Fraction(s, l)] * l
    return fit


def test_isotonic_matches_pava_reference(spark):
    from fractions import Fraction

    from osmgraft.operators.stats import isotonic_fit

    import numpy as np

    rng = np.random.default_rng(41)
    rows, refs = [], {}
    for g in range(1, 6):
        vals = [int(v) for v in rng.integers(0, 50, 6 + g * 4)]
        rows += [(g, t, v) for t, v in enumerate(vals)]
        refs[g] = _pava_ref(vals)
    df = spark.createDataFrame(rows, "g long, day long, cnt long")
    got = {}
    for r in isotonic_fit(df, ["g"]).collect():
        got.setdefault(r["g"], {})[r["day"]] = Fraction(r["fit_num"], r["fit_den"])
    for g, ref in refs.items():
        for t, want in enumerate(ref):
            assert got[g][t] == want, (g, t, got[g][t], want)


def test_isotonic_laws(spark):
    """Monotone input is a fixed point; a violator pair pools to its
    mean; output is always nondecreasing."""
    from fractions import Fraction

    from osmgraft.operators.stats import isotonic_fit

    rows = (
        [(1, t, v) for t, v in enumerate([1, 3, 7, 9])]       # already monotone
        + [(2, t, v) for t, v in enumerate([5, 1])]            # pools to 3
        + [(3, t, v) for t, v in enumerate([9, 1, 5, 3, 7])]
    )
    df = spark.createDataFrame(rows, "g long, day long, cnt long")
    got = {}
    for r in isotonic_fit(df, ["g"]).collect():
        got.setdefault(r["g"], {})[r["day"]] = Fraction(r["fit_num"], r["fit_den"])
    assert [got[1][t] for t in range(4)] == [1, 3, 7, 9]
    assert got[2][0] == got[2][1] == 3
    seq = [got[3][t] for t in range(5)]
    assert all(a <= b for a, b in zip(seq, seq[1:]))
    assert seq == _pava_ref([9, 1, 5, 3, 7])


def test_ks_two_sample_matches_scipy_free_reference(spark):
    """Exact D and class vs a float reference on planted same/shifted
    distributions."""
    import math

    from osmgraft.operators.stats import ks_two_sample

    import numpy as np

    rng = np.random.default_rng(47)
    base = rng.integers(0, 100, 400)
    rows = (
        [("a", int(v)) for v in base]
        + [("b", int(v)) for v in rng.integers(0, 100, 300)]   # same law
        + [("c", int(v) + 40) for v in base[:350]]              # shifted
    )
    df = spark.createDataFrame(rows, "g string, v long")
    got = {(r["ga"], r["gb"]): r for r in ks_two_sample(df, "g", "v").collect()}
    series = {}
    for g, v in rows:
        series.setdefault(g, []).append(v)
    import itertools

    for a, b in itertools.combinations(sorted(series), 2):
        xa, xb = sorted(series[a]), sorted(series[b])
        na, nb = len(xa), len(xb)
        vs = sorted(set(xa) | set(xb))
        dmax = max(
            abs(nb * sum(1 for x in xa if x <= v) - na * sum(1 for x in xb if x <= v))
            for v in vs
        )
        r = got[(a, b)]
        assert (r["n_a"], r["n_b"], r["d_num"], r["d_den"]) == (na, nb, dmax, na * nb)
        d = dmax / (na * nb)
        thr = 1.358 * math.sqrt((na + nb) / (na * nb))
        want = "shifted" if d * d * 1000 >= 1844 * (na + nb) * na * nb / (na * nb) ** 2 else "same"
        assert r["drift"] == want
        # sanity vs the float threshold too (identical here)
        assert want == ("shifted" if d >= thr - 1e-12 else "same")
    assert got[("a", "b")]["drift"] == "same"
    assert got[("a", "c")]["drift"] == "shifted"


def test_mann_whitney_matches_brute_force(spark):
    """Histogram-walk U == the quadratic pair count, and the class matches
    the float z-test, on planted same/greater fixtures."""
    import math

    from osmgraft.operators.stats import mann_whitney_u

    import numpy as np

    rng = np.random.default_rng(53)
    rows = (
        [("a", int(v)) for v in rng.integers(0, 40, 250)]
        + [("b", int(v)) for v in rng.integers(0, 40, 200)]     # same law
        + [("c", int(v) + 15) for v in rng.integers(0, 40, 220)]  # shifted up
    )
    df = spark.createDataFrame(rows, "g string, v long")
    got = {(r["ga"], r["gb"]): r for r in mann_whitney_u(df, "g", "v").collect()}
    series = {}
    for g, v in rows:
        series.setdefault(g, []).append(v)
    import itertools

    for a, b in itertools.combinations(sorted(series), 2):
        xa, xb = series[a], series[b]
        na, nb = len(xa), len(xb)
        wins = sum(1 for x in xa for y in xb if x > y)
        ties = sum(1 for x in xa for y in xb if x == y)
        u2 = 2 * wins + ties
        r = got[(a, b)]
        assert (r["n_a"], r["n_b"], r["u2"]) == (na, nb, u2), (a, b)
        u = u2 / 2
        z = (u - na * nb / 2) / math.sqrt(na * nb * (na + nb + 1) / 12)
        want = "greater" if z >= 2 else ("less" if z <= -2 else "same")
        assert r["shift"] == want, (a, b, z)
    assert got[("a", "b")]["shift"] == "same"
    assert got[("a", "c")]["shift"] == "less"   # c runs higher -> a < c
    assert got[("b", "c")]["shift"] == "less"


def _siegel_ref(series, lcm=2329089562800):
    """Fraction repeated-median reference with the lower-median pick."""
    from fractions import Fraction

    def lower_median(xs):
        xs = sorted(xs)
        return xs[(len(xs) + 1) // 2 - 1]

    meds = []
    for t1, v1 in series:
        slopes = [
            Fraction(v2 - v1, t2 - t1) for t2, v2 in series if t2 != t1
        ]
        meds.append(lower_median(slopes))
    return lower_median(meds) * lcm


def test_siegel_matches_fraction_reference(spark):
    from osmgraft.operators.stats import siegel_slope

    import numpy as np

    rng = np.random.default_rng(59)
    rows, refs = [], {}
    for g in range(1, 6):
        series = [(t, int(rng.integers(0, 60))) for t in range(5 + g * 3)]
        rows += [(g, t, v) for t, v in series]
        refs[g] = _siegel_ref(series)
    df = spark.createDataFrame(rows, "g long, day long, cnt long")
    got = {r["g"]: r for r in siegel_slope(df, ["g"]).collect()}
    for g, want in refs.items():
        assert got[g]["slope_num"] == want, g
        assert got[g]["slope_den"] == 2329089562800


def test_siegel_survives_half_corruption(spark):
    """A clean slope-2 line with just under half the points replaced by
    wild outliers still recovers slope 2 — the 50% breakdown property
    Theil–Sen lacks (TS needs a majority of clean PAIRS, not points)."""
    from osmgraft.operators.stats import siegel_slope

    clean = [(t, 2 * t + 5) for t in range(11)]
    wild = [(t, 10_000 + 137 * t) for t in range(11, 16)]  # 5 of 16 corrupt
    rows = [(1, t, v) for t, v in clean + wild]
    df = spark.createDataFrame(rows, "g long, day long, cnt long")
    (r,) = siegel_slope(df, ["g"]).collect()
    assert r["slope_num"] == 2 * r["slope_den"]


def test_runs_test_reference_and_classes(spark):
    """Exact class == the float z-test; a monotone ramp is maximally
    sticky (2 runs), a perfect alternation maximally oscillating."""
    import math

    from osmgraft.operators.stats import runs_test

    import numpy as np

    rng = np.random.default_rng(61)
    fixtures = {
        1: [int(v) for v in rng.integers(0, 100, 24)],        # random-ish
        2: list(range(24)),                                    # ramp: 2 runs
        3: [5 if t % 2 else 95 for t in range(24)],            # alternation
        4: [7] * 10,                                           # constant
    }
    rows = [(g, t, v) for g, vals in fixtures.items() for t, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "g long, day long, cnt long")
    got = {r["g"]: r for r in runs_test(df, ["g"]).collect()}
    for g, vals in fixtures.items():
        med = sorted(vals)[(len(vals) + 1) // 2 - 1]
        s = [1 if v > med else 0 for v in vals]
        n1 = sum(s)
        n2 = len(s) - n1
        runs = 1 + sum(1 for a, b in zip(s, s[1:]) if a != b)
        r = got[g]
        assert (r["n_obs"], r["n_plus"], r["n_runs"]) == (len(s), n1, runs), g
        if n1 == 0 or n2 == 0:
            assert r["run_class"] == "degenerate"
            continue
        n = len(s)
        e = 1 + 2 * n1 * n2 / n
        var = 2 * n1 * n2 * (2 * n1 * n2 - n) / (n * n * (n - 1))
        z = (runs - e) / math.sqrt(var)
        want = "sticky" if z <= -2 else ("oscillating" if z >= 2 else "random")
        assert r["run_class"] == want, (g, z)
    assert got[2]["run_class"] == "sticky" and got[2]["n_runs"] == 2
    assert got[3]["run_class"] == "oscillating"
    assert got[4]["run_class"] == "degenerate"


def test_tukey_outliers_reference(spark):
    """Cleared fences == the float 1.5*IQR rule under the shared rank
    convention; a planted burst day is counted high, a dead day low."""
    from osmgraft.operators.stats import tukey_outliers

    import math

    import numpy as np

    rng = np.random.default_rng(67)
    base = [int(v) for v in rng.integers(40, 60, 26)]
    vals = base + [500, 480, 0]  # two bursts, one dead day
    rows = [(1, v) for v in vals]
    df = spark.createDataFrame(rows, "g long, cnt long")
    (r,) = tukey_outliers(df, ["g"]).collect()
    s = sorted(vals)
    n = len(s)
    q1 = s[max(1, math.ceil(250 * n / 1000)) - 1]
    q3 = s[max(1, math.ceil(750 * n / 1000)) - 1]
    lo, hi = q1 - 1.5 * (q3 - q1), q3 + 1.5 * (q3 - q1)
    assert (r["q1"], r["q3"]) == (q1, q3)
    assert r["n_low"] == sum(1 for v in vals if v < lo)
    assert r["n_high"] == sum(1 for v in vals if v > hi)
    assert r["n_high"] == 2 and r["n_low"] == 1


def test_emd_1d_matches_scipy_free_reference(spark):
    """w1_num/w1_den equals the textbook sorted-sample W1 (computable as
    mean |sorted quantile difference| for equal n, and by the CDF
    integral generally)."""
    from fractions import Fraction

    from osmgraft.operators.stats import emd_1d

    import numpy as np

    rng = np.random.default_rng(71)
    rows = (
        [("a", int(v)) for v in rng.integers(0, 50, 120)]
        + [("b", int(v) + 7) for v in rng.integers(0, 50, 90)]
        + [("c", int(v)) for v in rng.integers(0, 50, 120)]
    )
    df = spark.createDataFrame(rows, "g string, v long")
    got = {(r["ga"], r["gb"]): r for r in emd_1d(df, "g", "v").collect()}
    series = {}
    for g, v in rows:
        series.setdefault(g, []).append(v)
    import itertools

    for a, b in itertools.combinations(sorted(series), 2):
        xa, xb = series[a], series[b]
        na, nb = len(xa), len(xb)
        vs = sorted(set(xa) | set(xb))
        w1 = Fraction(0)
        for v, v2 in zip(vs, vs[1:]):
            fa = Fraction(sum(1 for x in xa if x <= v), na)
            fb = Fraction(sum(1 for x in xb if x <= v), nb)
            w1 += (v2 - v) * abs(fa - fb)
        r = got[(a, b)]
        assert Fraction(r["w1_num"], r["w1_den"]) == w1, (a, b)
    # the shifted pair is strictly farther than the iid pair
    rab = got[("a", "b")]
    rac = got[("a", "c")]
    assert rab["w1_num"] * rac["w1_den"] > rac["w1_num"] * rab["w1_den"]


def test_emd_identical_groups_zero(spark):
    from osmgraft.operators.stats import emd_1d

    rows = [("a", v) for v in (1, 5, 9)] + [("b", v) for v in (1, 5, 9)]
    df = spark.createDataFrame(rows, "g string, v long")
    (r,) = emd_1d(df, "g", "v").collect()
    assert r["w1_num"] == 0


def test_tv_distance_matches_fraction_reference(spark):
    from fractions import Fraction

    from osmgraft.operators.stats import tv_distance

    rows = (
        [("a", c) for c in "xxxyyz"]
        + [("b", c) for c in "xyzzzz"]
        + [("c", c) for c in "xxxyyz"]  # same mix as a
    )
    df = spark.createDataFrame(rows, "g string, c string")
    got = {(r["ga"], r["gb"]): r for r in tv_distance(df, "g", "c").collect()}
    import collections
    import itertools

    series = collections.defaultdict(collections.Counter)
    for g, c in rows:
        series[g][c] += 1
    for a, b in itertools.combinations(sorted(series), 2):
        na, nb = sum(series[a].values()), sum(series[b].values())
        tv = sum(
            abs(Fraction(series[a][c], na) - Fraction(series[b][c], nb))
            for c in set(series[a]) | set(series[b])
        ) / 2
        r = got[(a, b)]
        assert Fraction(r["tv_num"], r["tv_den"]) == tv, (a, b)
    assert got[("a", "c")]["tv_num"] == 0


def test_simpsons_paradox_textbook_fixture(spark):
    """The classic reversal: A beats B pooled, loses in BOTH strata
    (weights do the lying); plus a consistent pair with no paradox."""
    from osmgraft.operators.stats import simpsons_paradox

    rows = []
    # stratum s1: A 50/100 vs B 60/100 (B better); s2: A 5/100 vs B 90/900?
    # classic construction: A = 80/100 in easy + 20/100 in hard pooled 100/200
    #                       B = 90/100 easy-heavy...
    def add(g, s, k, n):
        rows.extend([(g, s, True)] * k + [(g, s, False)] * (n - k))

    # A: easy 93/100, hard 73/100  -> pooled 166/200
    # B: easy 95/10 scaled: 950/1000? make ints small:
    # B: easy 19/20, hard 370/500 -> pooled 389/520
    add("A", "easy", 93, 100)
    add("A", "hard", 73, 100)
    add("B", "easy", 19, 20)       # 0.95 > 0.93
    add("B", "hard", 375, 500)     # 0.75 > 0.73
    # pooled: A 166/200 = 0.83 ; B 394/520 = 0.7577 -> A pooled-better, paradox
    add("C", "easy", 10, 100)
    add("C", "hard", 10, 100)      # C worse everywhere: no paradox vs A
    df = spark.createDataFrame(rows, "g string, s string, f boolean")
    got = {(r["ga"], r["gb"]): r for r in simpsons_paradox(df, "g", "s", "f").collect()}
    ab = got[("A", "B")]
    assert ab["dir_pooled"] == 1 and ab["strata_gt"] == 0 and ab["strata_lt"] == 2
    assert ab["paradox"] is True
    ac = got[("A", "C")]
    assert ac["dir_pooled"] == 1 and ac["strata_gt"] == 2 and ac["paradox"] is False


def test_kappa_reference_and_bands(spark):
    """Exact rational == float Cohen kappa; perfect agreement = 1;
    skew-only agreement is discounted to ~0."""
    from fractions import Fraction

    from osmgraft.operators.stats import rater_agreement

    def run(pairs):
        df = spark.createDataFrame(pairs, "a string, b string")
        (r,) = rater_agreement(df, "a", "b").collect()
        return r

    # mixed: some agreement beyond chance
    pairs = [("x", "x")] * 40 + [("y", "y")] * 30 + [("x", "y")] * 10 + [("y", "x")] * 20
    r = run(pairs)
    n = 100
    agree = 70
    na = {"x": 50, "y": 50}
    nb = {"x": 60, "y": 40}
    p = sum(na[c] * nb[c] for c in na)
    assert (r["kappa_num"], r["kappa_den"]) == (n * agree - p, n * n - p)
    k = Fraction(r["kappa_num"], r["kappa_den"])
    po, pe = Fraction(70, 100), Fraction(p, n * n)
    assert k == (po - pe) / (1 - pe)
    # perfect
    assert run([("a", "a")] * 5 + [("b", "b")] * 5)["strength"] == "substantial"
    # rater B constant: agreement is pure chance -> kappa 0 -> low
    r0 = run([("x", "x")] * 9 + [("y", "x")] * 1)
    assert r0["kappa_num"] == 0 and r0["strength"] == "low"


def test_mcnemar_hand_cases(spark):
    from osmgraft.operators.stats import mcnemar

    rows = (
        [("t", "t", "f")] * 12   # A right, B wrong
        + [("t", "f", "t")] * 2  # B right, A wrong
        + [("t", "t", "t")] * 50
        + [("t", "f", "f")] * 6
    )
    df = spark.createDataFrame(rows, "y string, a string, b string")
    (r,) = mcnemar(df, "y", "a", "b").collect()
    assert (r["b_only"], r["c_only"]) == (12, 2)
    assert r["verdict"] == "a_better"  # (12-2)^2 = 100 >= 4*14
    even = spark.createDataFrame(
        [("t", "t", "f")] * 3 + [("t", "f", "t")] * 3, "y string, a string, b string"
    )
    assert mcnemar(even, "y", "a", "b").collect()[0]["verdict"] == "same"


def test_classifier_report_reference(spark):
    """Marginals and the F1 rational == sklearn-style formulas, including
    a prediction-only class and a never-predicted class."""
    from fractions import Fraction

    from osmgraft.operators.stats import classifier_report

    rows = (
        [("a", "a")] * 8 + [("a", "b")] * 2
        + [("b", "b")] * 5 + [("b", "a")] * 1
        + [("c", "a")] * 3           # c never predicted
        + [("b", "d")] * 1           # d only predicted
    )
    df = spark.createDataFrame(rows, "y string, p string")
    got = {r["cls"]: r for r in classifier_report(df, "y", "p").collect()}
    import collections

    tn = collections.Counter(y for y, _ in rows)
    pn = collections.Counter(p for _, p in rows)
    tp = collections.Counter(y for y, p in rows if y == p)
    for c in set(tn) | set(pn):
        r = got[c]
        assert (r["truth_n"], r["pred_n"], r["tp"]) == (tn[c], pn[c], tp[c]), c
        prec = Fraction(tp[c], pn[c]) if pn[c] else None
        rec = Fraction(tp[c], tn[c]) if tn[c] else None
        if prec and rec and (prec + rec) > 0:
            f1 = 2 * prec * rec / (prec + rec)
            assert Fraction(r["f1_num"], r["f1_den"]) == f1, c
    assert got["c"]["pred_n"] == 0 and got["d"]["truth_n"] == 0


def test_burstiness_classes(spark):
    """A metronome is regular (sigma 0 < mu), a heavy-tailed on/off
    pattern is bursty, and the boundary sigma == mu lands poisson_like."""
    from osmgraft.operators.stats import burstiness

    rows = (
        [(1, 10)] * 20                           # perfect metronome
        + [(2, 1)] * 19 + [(2, 1000)]            # one huge gap: bursty
        + [(3, 0), (3, 2)]                       # mu=1, sigma=1 -> boundary
    )
    df = spark.createDataFrame(rows, "u long, gap long")
    got = {r["u"]: r for r in burstiness(df, ["u"], "gap").collect()}
    assert got[1]["burst_class"] == "regular" and got[1]["disp_num"] < 0
    assert got[2]["burst_class"] == "bursty"
    assert got[3]["burst_class"] == "poisson_like" and got[3]["disp_num"] == 0
    # exact dispersion identity on the bursty fixture
    import numpy as np

    x = np.array([1] * 19 + [1000], dtype=np.int64)
    n, s, ssq = len(x), int(x.sum()), int((x * x).sum())
    assert got[2]["disp_num"] == n * ssq - 2 * s * s


def test_spearman_matches_scipy_free_reference(spark):
    """Exact rho parts == Pearson-on-average-ranks with ties, and the
    class matches the float |rho| >= 0.5 rule."""
    from fractions import Fraction

    from osmgraft.operators.stats import spearman_rho

    import numpy as np

    rng = np.random.default_rng(79)
    rows, refs = [], {}
    for g in range(1, 6):
        n = 10 + g * 3
        xs = [int(v) for v in rng.integers(0, 8, n)]   # heavy ties
        ys = [x + int(v) for x, v in zip(xs, rng.integers(0, 6, n))]
        rows += [(g, x, y) for x, y in zip(xs, ys)]
        refs[g] = (xs, ys)
    df = spark.createDataFrame(rows, "g long, cnt long, users long")
    got = {r["g"]: r for r in spearman_rho(df, ["g"], "cnt", "users").collect()}

    def avg_rank2(vals):
        order = sorted(range(len(vals)), key=lambda i: vals[i])
        r2 = [0] * len(vals)
        i = 0
        while i < len(order):
            j = i
            while j < len(order) and vals[order[j]] == vals[order[i]]:
                j += 1
            for k in range(i, j):
                r2[order[k]] = (i + 1) + j  # min_rank + max_rank
            i = j
        return r2

    for g, (xs, ys) in refs.items():
        rx, ry = avg_rank2(xs), avg_rank2(ys)
        n = len(xs)
        num = n * sum(a * b for a, b in zip(rx, ry)) - sum(rx) * sum(ry)
        dx = n * sum(a * a for a in rx) - sum(rx) ** 2
        dy = n * sum(b * b for b in ry) - sum(ry) ** 2
        r = got[g]
        assert (r["rho_num"], r["den_x"], r["den_y"]) == (num, dx, dy), g
        import math

        rho = num / math.sqrt(dx * dy)
        want = (
            "positive" if rho >= 0.5 else ("negative" if rho <= -0.5 else "weak")
        )
        assert r["rho_class"] == want, (g, rho)


def test_spearman_perfect_and_degenerate(spark):
    from osmgraft.operators.stats import spearman_rho

    rows = (
        [(1, t, t * 2) for t in range(8)]       # rho = +1
        + [(2, t, 100 - t) for t in range(8)]   # rho = -1
        + [(3, 5, t) for t in range(8)]         # x constant
    )
    df = spark.createDataFrame(rows, "g long, cnt long, users long")
    got = {r["g"]: r for r in spearman_rho(df, ["g"], "cnt", "users").collect()}
    assert got[1]["rho_class"] == "positive"
    assert got[1]["rho_num"] == got[1]["den_x"]  # rho exactly 1
    assert got[2]["rho_class"] == "negative" and got[2]["rho_num"] == -got[2]["den_x"]
    assert got[3]["rho_class"] == "degenerate"


def test_winsorized_stats_reference(spark):
    """Clamp bounds follow the shared rank convention; sums and clamp
    counts match a plain-python reference with planted outliers."""
    import math

    from osmgraft.operators.stats import winsorized_stats

    import numpy as np

    rng = np.random.default_rng(83)
    vals = [int(v) for v in rng.integers(100, 200, 60)] + [5, 3, 9000, 8000, 7000]
    df = spark.createDataFrame([(1, v) for v in vals], "g long, v long")
    (r,) = winsorized_stats(df, ["g"], "v").collect()
    s = sorted(vals)
    n = len(s)
    p_lo = s[max(1, math.ceil(50 * n / 1000)) - 1]
    p_hi = s[max(1, math.ceil(950 * n / 1000)) - 1]
    assert (r["p_lo"], r["p_hi"]) == (p_lo, p_hi)
    assert r["wins_sum"] == sum(min(max(v, p_lo), p_hi) for v in vals)
    assert r["n_clamped_lo"] == sum(1 for v in vals if v < p_lo)
    assert r["n_clamped_hi"] == sum(1 for v in vals if v > p_hi)
    # the winsorized mean sits in the clean range despite the wild tail
    assert 100 <= r["wins_sum"] / r["n_obs"] <= 500
