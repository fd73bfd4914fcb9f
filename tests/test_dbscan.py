"""DBSCAN (operators/dbscan.py): roles, deterministic labels, wrap metric.

Reference: textbook DBSCAN (Ester et al., KDD'96) with the deterministic
border rule (min reachable cluster label) recomputed here in plain Python
over the exact integer metric."""

import pytest

from osmgraft.operators.dbscan import dbscan

LON_SPAN = 3_600_000_000


def ref_dbscan(pts, eps, min_pts):
    """point list [(id, lat, lon)] -> {id: (role, label|None)}; exact ints."""
    eps2 = eps * eps

    def d2(a, b):
        dlat = a[1] - b[1]
        adlon = abs(a[2] - b[2])
        dlon = min(adlon, LON_SPAN - adlon)
        return dlat * dlat + dlon * dlon

    nbrs = {
        p[0]: [q[0] for q in pts if q[0] != p[0] and d2(p, q) <= eps2] for p in pts
    }
    cores = {i for i, ns in nbrs.items() if len(ns) + 1 >= min_pts}
    # components over core-core edges (union-find)
    parent = {i: i for i in cores}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i in cores:
        for j in nbrs[i]:
            if j in cores:
                a, b = find(i), find(j)
                if a != b:
                    parent[max(a, b)] = min(a, b)
    label = {}
    for i in cores:
        comp = [j for j in cores if find(j) == find(i)]
        label[i] = min(comp)
    out = {}
    for i, ns in nbrs.items():
        if i in cores:
            out[i] = ("core", label[i])
        else:
            core_ns = [label[j] for j in ns if j in cores]
            # noise labels as sentinel -1 (nullable-int outputs floatify
            # under pandas-path oracle fetches — r5 fetch-invariance rule)
            out[i] = ("border", min(core_ns)) if core_ns else ("noise", -1)
    return out


def run_engine(spark, pts, eps, min_pts):
    df = spark.createDataFrame(pts, "point_id long, lat7 long, lon7 long")
    rows = dbscan(df, eps=eps, min_pts=min_pts).collect()
    return {r["point_id"]: (r["role"], r["label"]) for r in rows}


def test_two_blobs_and_noise(spark):
    # blob A: 5 points within eps of each other; blob B: 4 points; 2 isolated
    eps = 1000
    a = [(i, 100 * i, 0) for i in range(5)]  # chain, spacing 100 << eps
    b = [(10 + i, 5_000_000 + 300 * i, 500) for i in range(4)]
    noise = [(100, 9_000_000, 9_000_000), (101, -9_000_000, -9_000_000)]
    pts = a + b + noise
    got = run_engine(spark, pts, eps, min_pts=3)
    assert got == ref_dbscan(pts, eps, 3)
    assert got[0] == ("core", 0)
    assert got[100] == ("noise", -1)


def test_border_attaches_to_min_cluster(spark):
    # two 4-core clusters; the bridge has exactly one core neighbor on each
    # side (2 + itself = 3 < min_pts=4) -> border, label = min cluster label,
    # and the clusters must NOT merge through it (density-reachability, not
    # mere adjacency — the textbook chaining rule)
    eps = 1000
    left = [(1, 0, 0), (2, 0, 100), (3, 0, 200), (4, 0, 300)]
    right = [(11, 0, 2300), (12, 0, 2400), (13, 0, 2500), (14, 0, 2600)]
    bridge = [(50, 0, 1300)]  # neighbors: id4 (dist 1000) and id11 (dist 1000) only
    pts = left + right + bridge
    got = run_engine(spark, pts, eps, min_pts=4)
    assert got == ref_dbscan(pts, eps, 4)
    assert got[50] == ("border", 1)  # min(1, 11)
    assert got[11] == ("core", 11)  # bridge is non-core: clusters stay apart


def test_antimeridian_cluster_merges(spark):
    # points hugging +/-180 deg: planar metric would split them, the wrapped
    # metric must form ONE cluster
    eps = 1000
    west = [(i, 0, -LON_SPAN // 2 + 100 * i) for i in range(3)]
    east = [(10 + i, 0, LON_SPAN // 2 - 100 - 100 * i) for i in range(3)]
    pts = west + east
    got = run_engine(spark, pts, eps, min_pts=3)
    assert got == ref_dbscan(pts, eps, 3)
    labels = {lab for _, lab in got.values()}
    assert labels == {0}, got  # single cluster labeled by min id


def test_random_agreement(spark):
    # LCG scatter with a planted dense blob; engine == python reference
    pts = []
    for i in range(120):
        pts.append((i, (i * 48271) % 2_000_000 - 1_000_000, (i * 69621) % 2_000_000))
    pts += [(200 + i, 500_000 + (i * 37) % 400, 500_000 + (i * 61) % 400) for i in range(12)]
    eps, mp = 30_000, 4
    assert run_engine(spark, pts, eps, mp) == ref_dbscan(pts, eps, mp)


def test_param_validation(spark):
    df = spark.createDataFrame([(1, 0, 0)], "point_id long, lat7 long, lon7 long")
    with pytest.raises(ValueError):
        dbscan(df, eps=1000, min_pts=1)
    with pytest.raises(ValueError):
        dbscan(df, eps=7, min_pts=3)  # 7 does not divide LON_SPAN
