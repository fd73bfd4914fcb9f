"""point_along vs hand-computed linear-referencing cases."""

import pytest

from osmgraft.operators.trajectory import point_along


def _df(spark, rows):
    return spark.createDataFrame(rows, "ent long, seq long, x long, y long")


def _one(spark, rows, num, den):
    out = point_along(_df(spark, rows), num=num, den=den).collect()
    assert len(out) == 1
    return out[0]


def test_midpoint_inside_a_segment(spark):
    # lengths 4 then 10 -> L=14, T=7: 3 into the second segment (4,0)->(14,0)
    r = _one(spark, [(1, 0, 0, 0), (1, 1, 4, 0), (1, 2, 14, 0)], 1, 2)
    assert (r.total_len, r.seg_seq, r.f_den) == (14, 1, 10)
    assert (r.fx_num / r.f_den, r.fy_num / r.f_den) == (7.0, 0.0)


def test_milepost_on_a_vertex_picks_next_segment(spark):
    # L=8, T=4 lands exactly on the shared vertex: carrying segment is the
    # one whose span ENDS past T (cum+len > T), i.e. the second, at t=0.
    r = _one(spark, [(1, 0, 0, 0), (1, 1, 4, 0), (1, 2, 8, 0)], 1, 2)
    assert (r.seg_seq, r.fx_num, r.f_den) == (1, 4 * 4, 4)


def test_fraction_zero_and_full(spark):
    rows = [(1, 0, 2, 3), (1, 1, 6, 3)]
    r0 = _one(spark, rows, 0, 5)
    assert (r0.fx_num / r0.f_den, r0.fy_num / r0.f_den) == (2.0, 3.0)
    r1 = _one(spark, rows, 5, 5)
    assert (r1.fx_num / r1.f_den, r1.fy_num / r1.f_den) == (6.0, 3.0)


def test_zero_length_track_excluded(spark):
    assert point_along(_df(spark, [(1, 0, 5, 5), (1, 1, 5, 5)]), 1, 2).count() == 0


def test_rejects_bad_fraction(spark):
    with pytest.raises(ValueError):
        point_along(_df(spark, [(1, 0, 0, 0)]), 3, 2)


def test_single_window_sort_one_shuffle(spark):
    df = _df(spark, [(1, 0, 0, 0), (1, 1, 4, 0)])
    plan = point_along(df, 1, 2)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning(ent") <= 2  # window + final agg
