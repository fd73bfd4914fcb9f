"""kmeans_exact: exact-rational python reference, planted-cluster recovery,
empty-cluster carry, parallelism invariance."""

import numpy as np
from pyspark.sql import functions as F


def _pyref(pl, seeds, rounds=3):
    cents = [(1, sx, sy) for sx, sy in seeds]
    for _ in range(rounds):
        agg = [[0, 0, 0] for _ in cents]
        for x, y in pl:
            best = 0
            ba = (cents[0][0] * x - cents[0][1]) ** 2 + (cents[0][0] * y - cents[0][2]) ** 2
            for j in range(1, len(cents)):
                n, sx, sy = cents[j]
                aj = (n * x - sx) ** 2 + (n * y - sy) ** 2
                if aj * cents[best][0] ** 2 < ba * n ** 2:
                    best, ba = j, aj
            agg[best][0] += 1
            agg[best][1] += x
            agg[best][2] += y
        cents = [tuple(a) if a[0] > 0 else cents[j] for j, a in enumerate(agg)]
    return {j: c for j, c in enumerate(cents)}


def test_matches_exact_reference(spark):
    from osmgraft.operators.kmeans import kmeans_exact

    seeds = [(-100, -100), (0, 0), (900, 900)]
    pl = [((i * 37) % 1000 - 500, (i * 91) % 800 - 400) for i in range(400)]
    df = spark.createDataFrame(pl, "x long, y long")
    got = {r["cluster"]: (r["n"], r["sx"], r["sy"]) for r in kmeans_exact(df, seeds).collect()}
    assert got == _pyref(pl, seeds)


def test_planted_clusters_recovered(spark):
    from osmgraft.operators.kmeans import kmeans_exact

    rng = np.random.RandomState(2)
    blobs = [(0, 0), (10000, 0), (0, 10000)]
    pl = [
        (int(cx + rng.randint(-300, 300)), int(cy + rng.randint(-300, 300)))
        for cx, cy in blobs
        for _ in range(100)
    ]
    seeds = [(-2000, -2000), (12000, 1000), (500, 12000)]
    df = spark.createDataFrame(pl, "x long, y long")
    got = {r["cluster"]: (r["n"], r["sx"], r["sy"]) for r in kmeans_exact(df, seeds).collect()}
    assert got == _pyref(pl, seeds)
    assert sorted(v[0] for v in got.values()) == [100, 100, 100]


def test_empty_cluster_keeps_seed(spark):
    from osmgraft.operators.kmeans import kmeans_exact

    pl = [(0, 0), (1, 1)]
    seeds = [(0, 0), (1000000, 1000000)]
    df = spark.createDataFrame(pl, "x long, y long")
    got = {r["cluster"]: (r["n"], r["sx"], r["sy"]) for r in kmeans_exact(df, seeds).collect()}
    assert got[0] == (2, 1, 1)
    assert got[1] == (1, 1000000, 1000000)  # untouched seed rational


def test_parallelism_invariance(spark):
    from osmgraft.operators.kmeans import kmeans_exact

    pl = [((i * 37) % 1000 - 500, (i * 91) % 800 - 400) for i in range(500)]
    a = sorted(map(tuple, kmeans_exact(
        spark.createDataFrame(pl, "x long, y long").repartition(1)).collect()))
    b = sorted(map(tuple, kmeans_exact(
        spark.createDataFrame(pl, "x long, y long").repartition(32)).collect()))
    assert a == b
