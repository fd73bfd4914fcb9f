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
