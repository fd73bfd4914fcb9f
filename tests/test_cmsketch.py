"""Count-Min sketch properties: merge law, no-underestimate, HH superset."""

from collections import Counter

from pyspark.sql import functions as F

from osmgraft.operators.stats import cm_heavy_hitters, cm_sketch

KEYS = [f"k{i % 17}" for i in range(400)] + ["hot"] * 60 + ["warm"] * 30


def _df(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], "key string")


def test_cm_never_underestimates_and_is_exact_when_sparse(spark):
    df = _df(spark, KEYS)
    est = {
        r.key: r.est
        for r in cm_heavy_hitters(df, "key", threshold=0, d=4, w=512).collect()
    }
    true = Counter(KEYS)
    assert set(est) == set(true)
    for k, t in true.items():
        assert est[k] >= t, k
    # w=512 >> 19 distinct keys: overwhelmingly collision-free, so the hot
    # key (the one a heavy-hitter user cares about) must be exact
    assert est["hot"] == 60


def test_cm_merge_law_elementwise_sum(spark):
    a, b = KEYS[:200], KEYS[200:]
    whole = {
        (r.j, r.bucket): r.cnt
        for r in cm_sketch(_df(spark, KEYS), "key", d=3, w=32).collect()
    }
    part = Counter()
    for half in (a, b):
        for r in cm_sketch(_df(spark, half), "key", d=3, w=32).collect():
            part[(r.j, r.bucket)] += r.cnt
    assert whole == dict(part)


def test_cm_heavy_hitters_superset_of_true(spark):
    df = _df(spark, KEYS)
    got = {r.key for r in cm_heavy_hitters(df, "key", threshold=30, d=4, w=16).collect()}
    true_hh = {k for k, c in Counter(KEYS).items() if c >= 30}
    assert true_hh <= got  # CM may add false positives, never false negatives


def test_cm_sketch_bounded_by_d_times_w(spark):
    sk = cm_sketch(_df(spark, KEYS), "key", d=4, w=8)
    rows = sk.collect()
    assert len(rows) <= 32
    assert sum(r.cnt for r in rows) == 4 * len(KEYS)  # each row feeds d counters


def test_cm_plan_broadcasts_counters(spark):
    df = _df(spark, KEYS)
    plan = (
        cm_heavy_hitters(df, "key", threshold=1, d=2, w=16)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
