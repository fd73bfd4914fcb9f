"""As-of join (operators/asof.py): crafted semantics — inclusive ties,
unmatched nulls, same-row consistency of carried columns — and the
single-exchange no-join plan shape."""

import re

from pyspark.sql import functions as F

from osmgraft.operators.asof import asof_join


def _tables(spark):
    left = spark.createDataFrame(
        [
            (1, "a", 10),
            (2, "a", 5),   # before any ref for key a
            (3, "a", 7),   # exactly at ref ts: inclusive
            (4, "b", 100),
            (5, "c", 50),  # key with no refs at all
        ],
        "event_id long, k string, t long",
    )
    right = spark.createDataFrame(
        [
            ("a", 7, 700, "r1"),
            ("a", 9, 900, "r2"),
            ("b", 1, 100, "r3"),
            ("b", 99, 9900, "r4"),
        ],
        "k string, t long, v long, tag string",
    )
    return left, right


def test_asof_semantics(spark):
    left, right = _tables(spark)
    got = {
        r.event_id: (r.v_ref, r.tag_ref)
        for r in asof_join(left, right, on=["k"], ts="t", right_cols=["v", "tag"]).collect()
    }
    assert len(got) == 5  # LEFT semantics: every probe row survives
    assert got[1] == (900, "r2")   # latest ref <= 10 is t=9
    assert got[2] == (None, None)  # t=5 precedes the first ref
    assert got[3] == (700, "r1")   # inclusive: ref at exactly t=7 matches
    assert got[4] == (9900, "r4")
    assert got[5] == (None, None)  # key never seen on the right
    # carried columns must come from the SAME matched row (v, tag pairs)
    assert all(
        (v is None) == (tag is None) and (v is None or f"r{v // 100 if v < 1000 else 4}")
        for v, tag in got.values()
    )


def test_asof_matches_duckdb_native(spark):
    """The union-window engine equals DuckDB's native ASOF LEFT JOIN on a
    randomized fixture (200 probes, 60 refs, 5 keys)."""
    import duckdb
    import numpy as np

    rng = np.random.default_rng(33)
    lrows = [
        (int(i), f"k{int(rng.integers(0, 5))}", int(rng.integers(0, 1000)))
        for i in range(200)
    ]
    # unique (k, t) on the right, per the operator's contract
    seen, rrows = set(), []
    for j in range(200):
        k, t = f"k{int(rng.integers(0, 5))}", int(rng.integers(0, 1000))
        if (k, t) not in seen:
            seen.add((k, t))
            rrows.append((k, t, int(rng.integers(0, 10_000))))
        if len(rrows) == 60:
            break
    left = spark.createDataFrame(lrows, "event_id long, k string, t long")
    right = spark.createDataFrame(rrows, "k string, t long, v long")
    got = {
        r.event_id: r.v_ref
        for r in asof_join(left, right, on=["k"], ts="t", right_cols=["v"]).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE l(event_id BIGINT, k VARCHAR, t BIGINT)")
    con.execute("CREATE TABLE r(k VARCHAR, t BIGINT, v BIGINT)")
    con.executemany("INSERT INTO l VALUES (?,?,?)", lrows)
    con.executemany("INSERT INTO r VALUES (?,?,?)", rrows)
    ref = dict(
        con.execute(
            "SELECT l.event_id, r.v FROM l ASOF LEFT JOIN r ON l.k = r.k AND l.t >= r.t"
        ).fetchall()
    )
    assert got == ref


def test_asof_plan_single_exchange_no_join(spark):
    left, right = _tables(spark)
    plan = (
        asof_join(left, right, on=["k"], ts="t", right_cols=["v"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan.replace("unionByName", "")  # no join node at all
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1  # one key shuffle
    assert "Window" in plan


def test_asof_null_in_carried_column_same_row(spark):
    """A matched ref row with a NULL in one carried column must contribute
    its null — not the previous ref's value for that column (the struct
    carry guarantees whole-row semantics)."""
    left = spark.createDataFrame([(1, "a", 10)], "event_id long, k string, t long")
    right = spark.createDataFrame(
        [("a", 1, 100, "early"), ("a", 9, None, "late")],
        "k string, t long, v long, tag string",
    )
    r = asof_join(left, right, on=["k"], ts="t", right_cols=["v", "tag"]).collect()[0]
    assert (r.v_ref, r.tag_ref) == (None, "late")  # both from the t=9 row


def test_scd2_build_intervals_and_roundtrip(spark):
    """scd2_build merges same-state runs, closes intervals at the change ts,
    and asof_join against the intervals reproduces the state timeline."""
    from pyspark.sql import functions as F

    from osmgraft.operators.asof import asof_join, scd2_build

    rows = [
        (1, "a", 100, 1), (1, "a", 200, 2), (1, "b", 300, 3), (1, "a", 400, 4),
        (2, "x", 150, 5),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, state string, ts_us long, event_id long"
    ).select("user_id", "state", F.timestamp_micros("ts_us").alias("ts"), "event_id")
    iv = scd2_build(ev, ["user_id"], "state", order_tiebreak=["event_id"])
    got = sorted((r.user_id, r.state, r.vf_us, r.vt_us) for r in iv.collect())
    assert got == [
        (1, "a", 100, 300), (1, "a", 400, None), (1, "b", 300, 400),
        (2, "x", 150, None),
    ]
    # roundtrip: as-of join probes at event times return the event's state
    probes = ev.select("user_id", "ts", F.col("state").alias("want"))
    ref = iv.select(
        "user_id", F.timestamp_micros("vf_us").alias("ts"), "state"
    )
    j = asof_join(probes, ref, on=["user_id"], ts="ts", right_cols=["state"])
    bad = j.filter(F.col("state_ref") != F.col("want")).count()
    assert bad == 0


def test_scd2_single_exchange(spark):
    """Both SCD2 windows share one hash exchange (the second window's
    required distribution is satisfied by the first's)."""
    from osmgraft.queries import REGISTRY

    df = REGISTRY["scd2_user_state"][0](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan


# --- Allen interval relations ------------------------------------------------
def test_allen_all_13_relations(spark):
    """One hand fixture per relation, from A's (lexicographically smaller
    id's) perspective."""
    from osmgraft.operators.asof import allen_relations

    cases = {
        "precedes": ((0, 2), (5, 9)),
        "meets": ((0, 5), (5, 9)),
        "overlaps": ((0, 6), (5, 9)),
        "finished_by": ((0, 9), (5, 9)),
        "contains": ((0, 10), (5, 9)),
        "starts": ((5, 7), (5, 9)),
        "equals": ((5, 9), (5, 9)),
        "started_by": ((5, 12), (5, 9)),
        "during": ((6, 8), (5, 9)),
        "finishes": ((7, 9), (5, 9)),
        "overlapped_by": ((7, 12), (5, 9)),
        "met_by": ((9, 12), (5, 9)),
        "preceded_by": ((11, 12), (5, 9)),
    }
    rows = []
    for g, (rel, ((sa, ea), (sb, eb))) in enumerate(cases.items()):
        rows += [(g, "a", sa, ea), (g, "b", sb, eb)]
    df = spark.createDataFrame(rows, "g long, iid string, s long, e long")
    got = {r["g"]: r["relation"]
           for r in allen_relations(df, ["g"], "iid", "s", "e").collect()}
    for g, rel in enumerate(cases):
        assert got[g] == rel, (g, rel, got[g])


def test_allen_inverse_symmetry_and_points(spark):
    """Swapping ids maps each relation to its inverse; the degenerate
    point-at-endpoint case resolves by the pinned first-match order."""
    from osmgraft.operators.asof import allen_relations

    inv = {"precedes": "preceded_by", "meets": "met_by",
           "overlaps": "overlapped_by", "finished_by": "finishes",
           "contains": "during", "starts": "started_by", "equals": "equals"}
    rows = []
    for g, (sa, ea, sb, eb) in enumerate(
        [(0, 2, 5, 9), (0, 5, 5, 9), (0, 6, 5, 9), (0, 9, 5, 9),
         (0, 10, 5, 9), (5, 7, 5, 9), (5, 9, 5, 9)]
    ):
        rows += [(g, "a", sa, ea), (g, "b", sb, eb)]
        rows += [(g + 100, "a", sb, eb), (g + 100, "b", sa, ea)]
    df = spark.createDataFrame(rows, "g long, iid string, s long, e long")
    got = {r["g"]: r["relation"]
           for r in allen_relations(df, ["g"], "iid", "s", "e").collect()}
    for g, rel in enumerate(inv):
        assert got[g] == rel and got[g + 100] == inv[rel], (g, rel)
    # point at B's end: 'finishes' wins over 'met_by' by fixed order
    pt = spark.createDataFrame(
        [(1, "a", 5, 5), (1, "b", 2, 5)], "g long, iid string, s long, e long"
    )
    assert allen_relations(pt, ["g"], "iid", "s", "e").collect()[0]["relation"] == "finishes"
