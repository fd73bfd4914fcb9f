"""bloom_build/probe: zero-false-negative law, false-positive measurement,
word-level python replay, merge associativity."""

import hashlib


def _py_h(key, salt, m=16 * 63):
    return int(hashlib.md5(f"{key}:{salt}".encode()).hexdigest()[:15], 16) % m


def _py_words(keys):
    w = [0] * 16
    for k in keys:
        for s in (0, 1):
            h = _py_h(k, s)
            w[h // 63] |= 1 << (h % 63)
    return w


def test_words_match_python_and_laws(spark):
    from osmgraft.operators.bloom import bloom_build, bloom_probe_stats

    members = spark.createDataFrame([(i,) for i in range(0, 200, 2)], "k long")
    probes = spark.createDataFrame([(i,) for i in range(200)], "k long")
    row = bloom_build(members, "k").collect()[0]
    assert [row[f"w{i}"] for i in range(16)] == _py_words(range(0, 200, 2))

    st = bloom_probe_stats(members, probes, "k").collect()[0]
    assert st["n_members"] == 100 and st["n_probes"] == 200
    # zero false negatives: every member passes
    assert st["n_pass"] - st["n_false"] == 100
    # with n=100 keys in m=1008 bits, k=2: some false positives expected,
    # but far from all non-members
    assert 0 < st["n_false"] < 100


def test_merge_associativity(spark):
    """bit_or of two half-filters == filter of the union (the property
    that makes per-partition builds correct)."""
    from osmgraft.operators.bloom import bloom_build

    a = spark.createDataFrame([(i,) for i in range(50)], "k long")
    b = spark.createDataFrame([(i,) for i in range(50, 90)], "k long")
    u = a.union(b)
    wa = bloom_build(a, "k").collect()[0]
    wb = bloom_build(b, "k").collect()[0]
    wu = bloom_build(u, "k").collect()[0]
    for i in range(16):
        assert wa[f"w{i}"] | wb[f"w{i}"] == wu[f"w{i}"]


def test_empty_members(spark):
    from osmgraft.operators.bloom import bloom_probe_stats

    members = spark.createDataFrame([], "k long")
    probes = spark.createDataFrame([(1,), (2,)], "k long")
    st = bloom_probe_stats(members, probes, "k").collect()[0]
    assert (st["n_members"], st["n_pass"], st["n_false"]) == (0, 0, 0)
    assert all(st[f"w{i}"] == 0 for i in range(16))
