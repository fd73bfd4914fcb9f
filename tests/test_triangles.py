"""triangle_counts vs itertools brute force; orientation edge cases."""

from itertools import combinations

import numpy as np

from osmgraft.operators.graph import triangle_counts


def _df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


def _brute(pairs):
    und = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
    nodes = {n for e in und for n in e}
    cnt = {}
    for a, b, c in combinations(sorted(nodes), 3):
        if {(a, b), (a, c), (b, c)} <= und:
            for n in (a, b, c):
                cnt[n] = cnt.get(n, 0) + 1
    return cnt


def test_triangles_match_brute_force(spark):
    rng = np.random.default_rng(17)
    pairs = list(zip(rng.integers(0, 20, 120), rng.integers(0, 20, 120)))
    got = {r.node_id: r.n_tri for r in triangle_counts(_df(spark, pairs)).collect()}
    assert got == _brute(pairs)


def test_duplicate_reverse_and_self_edges_ignored(spark):
    pairs = [(1, 2), (2, 1), (1, 2), (2, 3), (1, 3), (3, 3)]
    got = {r.node_id: r.n_tri for r in triangle_counts(_df(spark, pairs)).collect()}
    assert got == {1: 1, 2: 1, 3: 1}


def test_star_plus_triangle_skew(spark):
    # hub 0 connected to 1..40 (star: no triangles) + one triangle 0-1-2
    pairs = [(0, i) for i in range(1, 41)] + [(1, 2)]
    got = {r.node_id: r.n_tri for r in triangle_counts(_df(spark, pairs)).collect()}
    assert got == {0: 1, 1: 1, 2: 1}


def test_k4_counts(spark):
    pairs = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    got = {r.node_id: r.n_tri for r in triangle_counts(_df(spark, pairs)).collect()}
    assert got == {n: 3 for n in range(4)}  # each K4 vertex sits in 3 triangles
