"""trip_segments: spatial gaps-and-islands over ordered tracks."""

from osmgraft.operators.trajectory import trip_segments


def _run(spark, rows, jump=10):
    df = spark.createDataFrame(rows, "ent long, seq long, x long, y long")
    return sorted(
        (r.ent, r.trip, r.n_pts, r.seq_start, r.seq_end,
         r.min_x, r.max_x, r.min_y, r.max_y)
        for r in trip_segments(df, jump).collect()
    )


def test_hand_fixture_semantics(spark):
    rows = [
        # entity 1: 3 points close, jump, 2 points close
        (1, 10, 0, 0), (1, 20, 5, 5), (1, 30, 9, 1),
        (1, 40, 500, 500), (1, 50, 505, 495),
        # entity 2: single point = single trip
        (2, 1, 7, 7),
        # entity 1 again, out-of-order input rows (window must sort)
        (1, 5, -3, 2),
    ]
    got = _run(spark, rows, jump=10)
    assert got == [
        (1, 1, 4, 5, 30, -3, 9, 0, 5),     # seq 5,10,20,30 chain (all steps <= 10)
        (1, 2, 2, 40, 50, 500, 505, 495, 500),
        (2, 1, 1, 1, 1, 7, 7, 7, 7),
    ]


def test_boundary_exactly_jump_stays(spark):
    rows = [(1, 1, 0, 0), (1, 2, 10, 10), (1, 3, 21, 10)]
    got = _run(spark, rows, jump=10)
    # step1 = 10 (stays), step2 = 11 (breaks)
    assert [(g[1], g[2]) for g in got] == [(1, 2), (2, 1)]


def test_single_window_sort_in_plan(spark):
    df = spark.createDataFrame([(1, 1, 0, 0)], "ent long, seq long, x long, y long")
    plan = trip_segments(df, 5)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Window") <= 2 and "Python" not in plan


def test_od_matrix_hand_fixture(spark):
    """Two entities, known trips: flows count trip endpoints, not samples."""
    from osmgraft.operators.trajectory import od_matrix

    rows = [
        # ent 1: trip A seq 1-3 (cells 0->1), jump, trip B seq 4-5 (cell 4->4)
        (1, 1, 100, 100), (1, 2, 300, 120), (1, 3, 600, 140),
        (1, 4, 2300, 2300), (1, 5, 2400, 2350),
        # ent 2: one single-sample trip at cell (9, 9) -> self flow
        (2, 1, 4700, 4600),
    ]
    df = spark.createDataFrame(rows, "ent long, seq long, x long, y long")
    got = {
        (r["o_cx"], r["o_cy"], r["d_cx"], r["d_cy"]): r["flows"]
        for r in od_matrix(df, jump=1000, pitch=500).collect()
    }
    assert got == {
        (0, 0, 1, 0): 1,   # trip A: (100,100)->(600,140)
        (4, 4, 4, 4): 1,   # trip B stays in cell 4,4
        (9, 9, 9, 9): 1,   # singleton trip: origin == destination
    }


# --- Hausdorff similarity join ------------------------------------------------


def test_hausdorff_matches_brute_force(spark):
    from osmgraft.operators.trajectory import hausdorff_pairs

    rows = [
        (e, s, ((e * 31 + s * 17) * 97) % 128, ((e * 29 + s * 13) * 89) % 128)
        for e in range(1, 7)
        for s in range(1, 1 + (e % 4) + 2)
    ]
    df = spark.createDataFrame(rows, "ent long, seq long, x long, y long")
    # shift 7 on a 128-wide chart → ONE cell: all pairs candidate
    got = {
        (r["ent_a"], r["ent_b"]): r["haus_d2"]
        for r in hausdorff_pairs(df, bucket_z_shift=7).collect()
    }
    tracks = {}
    for e, s, x, y in rows:
        tracks.setdefault(e, []).append((s, x, y))
    import itertools

    for a, b in itertools.combinations(sorted(tracks), 2):
        pa = [(x, y) for _, x, y in sorted(tracks[a])]
        pb = [(x, y) for _, x, y in sorted(tracks[b])]
        d2 = lambda p, q: (p[0] - q[0]) ** 2 + (p[1] - q[1]) ** 2  # noqa: E731
        h = max(
            max(min(d2(p, q) for q in pb) for p in pa),
            max(min(d2(p, q) for q in pa) for p in pb),
        )
        assert got[(a, b)] == h, (a, b)


def test_hausdorff_bucket_restricts_and_caps(spark):
    """Tracks whose heads land in different cells never pair; points past
    max_pts are ignored on BOTH the capped track and its partner."""
    from osmgraft.operators.trajectory import hausdorff_pairs

    rows = (
        [(1, s, 10, 10) for s in range(1, 12)]  # 11 points, all identical
        + [(2, 1, 12, 12)]
        + [(3, 1, 1000, 1000)]  # far cell at shift 5
    )
    df = spark.createDataFrame(rows, "ent long, seq long, x long, y long")
    got = {
        (r["ent_a"], r["ent_b"]): r["haus_d2"]
        for r in hausdorff_pairs(df, bucket_z_shift=5, max_pts=8).collect()
    }
    assert got == {(1, 2): 8}  # (12-10)²+(12-10)²; track 3 unpaired


def test_tile_path_collapse(spark):
    """Dwell (repeated tile) collapses; revisits re-enter; single Exchange."""
    from osmgraft.operators.trajectory import tile_path

    rows = [
        (1, 1, 5, 5), (1, 2, 5, 5), (1, 3, 6, 5), (1, 4, 6, 5), (1, 5, 5, 5),
        (2, 1, 9, 9),
    ]
    df = spark.createDataFrame(rows, "ent long, seq long, tx long, ty long")
    out = tile_path(df)
    got = sorted((r["track_id"], r["step"], r["tx"], r["ty"]) for r in out.collect())
    assert got == [(1, 1, 5, 5), (1, 2, 6, 5), (1, 3, 5, 5), (2, 1, 9, 9)]
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]  # AQE prints the plan twice
    assert final.count("Exchange") == 1


def _brute_frechet(pa, pb):
    """Reference Eiter-Mannila memoized recursion (independent of both
    engines' formulations)."""
    import functools

    d2 = lambda p, q: (p[0] - q[0]) ** 2 + (p[1] - q[1]) ** 2  # noqa: E731

    @functools.lru_cache(maxsize=None)
    def ca(i, j):
        d = d2(pa[i], pb[j])
        if i == 0 and j == 0:
            return d
        if i == 0:
            return max(d, ca(0, j - 1))
        if j == 0:
            return max(d, ca(i - 1, 0))
        return max(d, min(ca(i - 1, j), ca(i - 1, j - 1), ca(i, j - 1)))

    return ca(len(pa) - 1, len(pb) - 1)


def test_frechet_matches_brute_force(spark):
    from osmgraft.operators.trajectory import frechet_pairs

    rows = [
        (e, s, ((e * 31 + s * 17) * 97) % 128, ((e * 29 + s * 13) * 89) % 128)
        for e in range(1, 7)
        for s in range(1, 1 + (e % 4) + 3)
    ]
    df = spark.createDataFrame(rows, "ent long, seq long, x long, y long")
    got = {
        (r["ent_a"], r["ent_b"]): r["frechet_d2"]
        for r in frechet_pairs(df, bucket_z_shift=7).collect()
    }
    tracks = {}
    for e, s, x, y in rows:
        tracks.setdefault(e, []).append((s, x, y))
    import itertools

    for a, b in itertools.combinations(sorted(tracks), 2):
        pa = tuple((x, y) for _, x, y in sorted(tracks[a]))
        pb = tuple((x, y) for _, x, y in sorted(tracks[b]))
        assert got[(a, b)] == _brute_frechet(pa, pb), (a, b)


def test_frechet_at_least_hausdorff_and_order_aware(spark):
    """Fréchet >= Hausdorff always; a reversed track shows the gap (the
    coupling cannot walk backwards)."""
    from osmgraft.operators.trajectory import frechet_pairs, hausdorff_pairs

    # ent 1 walks 0..5 east; ent 2 walks the SAME points west
    rows = [(1, s, s * 10, 0) for s in range(6)] + [
        (2, s, (5 - s) * 10, 1) for s in range(6)
    ]
    df = spark.createDataFrame(rows, "ent long, seq long, x long, y long")
    h = hausdorff_pairs(df, bucket_z_shift=7).collect()[0]["haus_d2"]
    f = frechet_pairs(df, bucket_z_shift=7).collect()[0]["frechet_d2"]
    assert h == 1  # same point set, 1 apart in y
    assert f == 50 * 50 + 1  # coupling must stretch across the whole sweep
    assert f >= h


def test_frechet_caps_and_buckets(spark):
    from osmgraft.operators.trajectory import frechet_pairs

    rows = (
        [(1, s, 10 + (s % 2), 10) for s in range(1, 12)]
        + [(2, 1, 12, 12)]
        + [(3, 1, 1000, 1000)]  # far cell at shift 5 -> never pairs
    )
    df = spark.createDataFrame(rows, "ent long, seq long, x long, y long")
    got = {
        (r["ent_a"], r["ent_b"]): r["frechet_d2"]
        for r in frechet_pairs(df, bucket_z_shift=5, max_pts=8).collect()
    }
    # single-point partner: frechet == max over capped track of d2 to it
    pts = [(10 + (s % 2), 10) for s in range(1, 9)]
    want = max((x - 12) ** 2 + (y - 12) ** 2 for x, y in pts)
    assert got == {(1, 2): want}


def test_frechet_plan_no_python(spark):
    from osmgraft.operators.trajectory import frechet_pairs

    df = spark.createDataFrame([(1, 1, 0, 0)], "ent long, seq long, x long, y long")
    plan = (
        frechet_pairs(df, bucket_z_shift=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan and "Cartesian" not in plan


def _brute_dtw(pa, pb):
    """Reference DTW memoized recursion (independent of both engines'
    formulations)."""
    import functools

    d2 = lambda p, q: (p[0] - q[0]) ** 2 + (p[1] - q[1]) ** 2  # noqa: E731

    @functools.lru_cache(maxsize=None)
    def ca(i, j):
        d = d2(pa[i], pb[j])
        if i == 0 and j == 0:
            return d
        if i == 0:
            return d + ca(0, j - 1)
        if j == 0:
            return d + ca(i - 1, 0)
        return d + min(ca(i - 1, j), ca(i - 1, j - 1), ca(i, j - 1))

    return ca(len(pa) - 1, len(pb) - 1)


def test_dtw_matches_brute_force(spark):
    from osmgraft.operators.trajectory import dtw_pairs

    rows = [
        (e, s, ((e * 31 + s * 17) * 97) % 128, ((e * 29 + s * 13) * 89) % 128)
        for e in range(1, 7)
        for s in range(1, 1 + (e % 4) + 3)
    ]
    df = spark.createDataFrame(rows, "ent long, seq long, x long, y long")
    got = {
        (r["ent_a"], r["ent_b"]): r["dtw_cost"]
        for r in dtw_pairs(df, bucket_z_shift=7).collect()
    }
    tracks = {}
    for e, s, x, y in rows:
        tracks.setdefault(e, []).append((s, x, y))
    import itertools

    for a, b in itertools.combinations(sorted(tracks), 2):
        pa = tuple((x, y) for _, x, y in sorted(tracks[a]))
        pb = tuple((x, y) for _, x, y in sorted(tracks[b]))
        assert got[(a, b)] == _brute_dtw(pa, pb), (a, b)


def test_dtw_dominates_frechet_and_pays_for_dwell(spark):
    """DTW >= Fréchet always (sum of nonneg step costs >= their max); a
    repeated dwell point is FREE under Fréchet's max-coupling but PAID
    under DTW's sum — the separating fixture."""
    from osmgraft.operators.trajectory import dtw_pairs, frechet_pairs

    # ent 1: 3 steps east; ent 2: same path but dwells 3x at a point 1 off
    rows = (
        [(1, s, s * 10, 0) for s in range(4)]
        + [(2, 0, 0, 1), (2, 1, 10, 1), (2, 2, 10, 1), (2, 3, 10, 1),
           (2, 4, 20, 1), (2, 5, 30, 1)]
    )
    df = spark.createDataFrame(rows, "ent long, seq long, x long, y long")
    f = frechet_pairs(df, bucket_z_shift=7).collect()[0]["frechet_d2"]
    d = dtw_pairs(df, bucket_z_shift=7).collect()[0]["dtw_cost"]
    assert f == 1  # every aligned pair is exactly 1 apart in y
    assert d == 6  # 6 alignment steps, each costing 1: dwell is charged
    assert d >= f


def test_dtw_caps_buckets_and_plan(spark):
    from osmgraft.operators.trajectory import dtw_pairs

    rows = (
        [(1, s, 10 + (s % 2), 10) for s in range(1, 12)]
        + [(2, 1, 12, 12)]
        + [(3, 1, 1000, 1000)]  # far cell at shift 5 -> never pairs
    )
    df = spark.createDataFrame(rows, "ent long, seq long, x long, y long")
    got = {
        (r["ent_a"], r["ent_b"]): r["dtw_cost"]
        for r in dtw_pairs(df, bucket_z_shift=5, max_pts=8).collect()
    }
    # single-point partner: dtw == SUM over capped track of d2 to it
    pts = [(10 + (s % 2), 10) for s in range(1, 9)]
    want = sum((x - 12) ** 2 + (y - 12) ** 2 for x, y in pts)
    assert got == {(1, 2): want}
    plan = (
        dtw_pairs(df, bucket_z_shift=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan and "Cartesian" not in plan


def test_sinuosity_classes_crafted(spark):
    """EWMA-free sanity for track_sinuosity's class rule on crafted tracks
    via the registered query machinery: straight east line vs zig-zag."""
    from fractions import Fraction

    # pure-arithmetic check of the pinned cross-multiplied class cuts
    cases = [
        (100, 100, "straight"),      # ratio 1.0  <= 1.2
        (120, 100, "straight"),      # ratio 1.2 boundary inclusive
        (121, 100, "curved"),
        (199, 100, "curved"),
        (200, 100, "winding"),       # ratio 2.0 boundary inclusive
        (350, 100, "winding"),
    ]
    for path, direct, want in cases:
        if 5 * path <= 6 * direct:
            got = "straight"
        elif path >= 2 * direct:
            got = "winding"
        else:
            got = "curved"
        assert got == want, (path, direct)
        # the class is a function of the exact rational path/direct
        r = Fraction(path, direct)
        assert (r <= Fraction(6, 5)) == (got == "straight")


def test_ewma_fold_reference(spark):
    """tile_ewma_z5's pinned alpha=1/4 integer recursion vs a python fold."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import aggregate as Fagg

    vals = [7, 1, 9, 9, 9, 2, 0, 30]
    df = spark.createDataFrame([(vals,)], "l array<long>")
    level = Fagg(
        F.slice(F.col("l"), 2, F.greatest(F.size("l") - 1, F.lit(0))),
        F.element_at(F.col("l"), 1).cast("long"),
        lambda acc, x: F.shiftright(x + 3 * acc, 2),
    )
    got = df.select(level.alias("lv")).collect()[0].lv
    ref = vals[0]
    for x in vals[1:]:
        ref = (x + 3 * ref) // 4
    assert got == ref
