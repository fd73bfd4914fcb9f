"""cc_star (large-star/small-star connected components) vs union-find."""

import numpy as np


def _uf_components(n_edges):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in n_edges:
        parent[find(u)] = find(v)
    return {x: find(x) for x in parent}


def _run(spark, edges, max_rounds=30):
    from osmgraft.operators.graph import cc_star

    df = spark.createDataFrame(edges, "u long, v long")
    return {r.id: r.comp for r in cc_star(df, max_rounds=max_rounds).collect()}


def test_cc_star_random_graphs(spark):
    rng = np.random.default_rng(5)
    for trial in range(3):
        edges = [
            (int(a), int(b))
            for a, b in zip(rng.integers(0, 60, 50), rng.integers(0, 60, 50))
            if a != b
        ]
        got = _run(spark, edges)
        ref = _uf_components(edges)
        # canonical label = component min
        comp_min = {}
        for x, r in ref.items():
            comp_min.setdefault(r, x)
            comp_min[r] = min(comp_min[r], x)
        want = {x: comp_min[r] for x, r in ref.items()}
        assert got == want


def test_cc_star_long_path_log_rounds(spark):
    # a 400-node path has diameter 399: per-hop propagation needs ~200
    # rounds; the star alternation must finish in O(log n)
    edges = [(i, i + 1) for i in range(400)]
    got = _run(spark, edges, max_rounds=12)
    assert set(got.values()) == {0}
    assert len(got) == 401


def test_cc_star_two_components_and_dup_edges(spark):
    edges = [(5, 3), (3, 5), (3, 9), (20, 21), (21, 20), (7, 7)]
    got = _run(spark, edges)
    assert got == {3: 3, 5: 3, 9: 3, 20: 20, 21: 20}


def test_cc_two_level_matches_cc_star_both_merge_paths(spark):
    """cc_two_level (band-local UF + gated residual merge) labels exactly as
    cc_star, on a random graph whose components span bands — via BOTH the
    driver-merge path (gate large) and the cc_star-residual path (gate 0)."""
    from pyspark.sql import functions as F

    from osmgraft.operators.graph import cc_two_level

    rng = np.random.default_rng(11)
    edges = [
        (int(a), int(b))
        for a, b in rng.integers(0, 400, size=(300, 2))
        if a != b
    ]
    want = {}
    uf = _uf_components(edges)
    mins = {}
    for x, r in uf.items():
        mins[r] = min(mins.get(r, x), x)
    want = {x: mins[r] for x, r in uf.items()}
    df = spark.createDataFrame(edges, "u long, v long")
    band = lambda c: F.shiftright(c, 5)  # 32-id stripes -> ~13 bands
    for gate in (1 << 20, 0):
        got = {
            r.id: r.comp
            for r in cc_two_level(df, band, driver_merge_max=gate).collect()
        }
        assert got == want, f"gate={gate}"
