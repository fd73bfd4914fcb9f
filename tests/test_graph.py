"""PageRank (operators/graph.py): recurrence vs a plain-python reference on
crafted graphs, sink/isolated behavior, rank ordering on a known topology."""

from osmgraft.operators.graph import SCALE, pagerank


def _ref_pagerank(edges, iters):
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    r = {n: SCALE for n in nodes}
    base = 15 * SCALE // 100
    for _ in range(iters):
        in_sum = {n: 0 for n in nodes}
        for s, d in edges:
            in_sum[d] += r[s] // deg[s]
        r = {n: base + (85 * in_sum[n]) // 100 for n in nodes}
    return r


def test_pagerank_matches_reference(spark):
    import numpy as np

    rng = np.random.default_rng(14)
    edges = list({(int(a), int(b)) for a, b in rng.integers(0, 40, (300, 2)) if a != b})
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node_id: r.rank_fx for r in pagerank(df, iters=4).collect()}
    assert got == _ref_pagerank(edges, 4)


def test_pagerank_hub_outranks_leaves(spark):
    # star graph: every leaf points at the hub (and back, so no dangling mass)
    edges = [(i, 0) for i in range(1, 11)] + [(0, i) for i in range(1, 11)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node_id: r.rank_fx for r in pagerank(df, iters=6).collect()}
    # hub/leaf ratio is 4.82 after 6 iterations (converges toward ~8.7)
    assert got[0] > max(got[i] for i in range(1, 11)) * 4
    leaf_ranks = {got[i] for i in range(1, 11)}
    assert len(leaf_ranks) == 1  # symmetry preserved exactly


def test_pagerank_no_incoming_gets_base_only(spark):
    edges = [(1, 2), (2, 3), (3, 2)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node_id: r.rank_fx for r in pagerank(df, iters=3).collect()}
    assert got[1] == 15 * SCALE // 100  # node 1: no in-edges after iter 1
    assert got[2] > got[1] and got[3] > got[1]


def test_shortest_paths_matches_reference(spark):
    """6-round Bellman-Ford equals a python reference (bounded-hop Dijkstra
    twin) on a random weighted graph, including unreachable nodes absent."""
    import numpy as np

    from osmgraft.operators.graph import shortest_paths

    rng = np.random.default_rng(11)
    edges = [
        (int(a), int(b), int(w))
        for a, b, w in zip(
            rng.integers(0, 30, 150), rng.integers(0, 30, 150), rng.integers(1, 100, 150)
        )
        if a != b
    ]
    df = spark.createDataFrame(edges, "src long, dst long, w_m long")
    sources = [0, 5]
    rounds = 6
    got = {r.node_id: r.dist_m for r in shortest_paths(df, sources, rounds).collect()}

    # reference: K relaxation rounds
    dist = {s: 0 for s in sources}
    for _ in range(rounds):
        nxt = dict(dist)
        for a, b, w in edges:
            if a in dist and dist[a] + w < nxt.get(b, 1 << 60):
                nxt[b] = dist[a] + w
        dist = nxt
    assert got == dist


def test_shortest_paths_hop_bound(spark):
    """A line graph 0-1-2-3-4 with unit weights: round k reaches node k."""
    from osmgraft.operators.graph import shortest_paths

    edges = [(i, i + 1, 10) for i in range(5)]
    df = spark.createDataFrame(edges, "src long, dst long, w_m long")
    for rounds in (1, 3, 5):
        got = {
            r.node_id: r.dist_m for r in shortest_paths(df, [0], rounds).collect()
        }
        assert got == {i: 10 * i for i in range(rounds + 1)}


# --- k-core --------------------------------------------------------------------


def _undirected(spark, pairs):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(pairs, "src long, dst long")
    return df.unionByName(df.selectExpr("dst AS src", "src AS dst")).distinct()


def test_kcore_recovers_planted_clique_and_cascades(spark):
    """A K6 clique survives k=5; an attached chain (each chain node degree
    ≤ 2) cascades away even though the FIRST peel only removes the tail."""
    from osmgraft.operators.graph import kcore

    clique = [(a, b) for a in range(6) for b in range(6) if a != b and a < b]
    chain = [(5, 10), (10, 11), (11, 12)]
    edges = _undirected(spark, clique + chain)
    got = sorted(
        (r["node_id"], r["degree"]) for r in kcore(edges, k=5, rounds=6).collect()
    )
    assert got == [(n, 5) for n in range(6)]


def test_kcore_converged_round_count(spark):
    """The gated fixture's round count is converged: rounds=8 == rounds=12
    on the same planted-clique graph shape (small twin of the query)."""
    from osmgraft.operators.graph import kcore

    noise = [(i % 53, (i * 7) % 53) for i in range(120) if i % 53 != (i * 7) % 53]
    clique = [(100 + a, 100 + b) for a in range(8) for b in range(8) if a < b]
    edges = _undirected(spark, noise + clique)
    r8 = sorted(map(tuple, kcore(edges, k=7, rounds=8).collect()))
    r12 = sorted(map(tuple, kcore(edges, k=7, rounds=12).collect()))
    assert r8 == r12
    assert [n for n, _ in r8] == [100 + a for a in range(8)]


def test_kcore_whole_graph_below_k_empty(spark):
    from osmgraft.operators.graph import kcore

    edges = _undirected(spark, [(1, 2), (2, 3), (3, 1)])  # triangle, deg 2
    assert kcore(edges, k=3, rounds=4).count() == 0


# --- HITS hubs & authorities -------------------------------------------------
def _hits_ref(edges, rounds=2):
    nodes = {u for u, _ in edges} | {v for _, v in edges}
    es = set(edges)
    h = {n: 1 for n in nodes}
    a = {}
    for _ in range(rounds):
        a = {n: 0 for n in nodes}
        for u, v in es:
            a[v] += h.get(u, 0)
        h = {n: 0 for n in nodes}
        for u, v in es:
            h[u] += a[v]
    return {n: (h.get(n, 0), a.get(n, 0)) for n in nodes}


def test_hits_matches_reference(spark):
    from osmgraft.operators.graph import hits

    edges = [
        ("u1", "p1"), ("u1", "p2"), ("u1", "p3"),
        ("u2", "p1"), ("u2", "p2"),
        ("u3", "p3"), ("u3", "u1"),       # non-bipartite edge
        ("p1", "p2"),                      # page linking a page
        ("u1", "p1"),                      # duplicate must not double-count
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node_id"]: (r["hub_score"], r["auth_score"])
           for r in hits(df).collect()}
    assert got == _hits_ref(edges)


def test_hits_star_graph_ranking(spark):
    """A star u* -> {p1..p5} plus singles: the star center is the top hub,
    every pi beats q (pointed at by a weaker hub)."""
    from osmgraft.operators.graph import hits

    edges = [("star", f"p{i}") for i in range(5)] + [("w", "q"), ("w", "p0")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node_id"]: r for r in hits(df).collect()}
    assert got["star"]["hub_score"] > got["w"]["hub_score"]
    assert got["p0"]["auth_score"] > got["q"]["auth_score"]
    assert got["q"]["hub_score"] == 0  # sink: no out-edges


# --- degree assortativity ----------------------------------------------------
def test_assortativity_reference_and_classes(spark):
    """Exact parts == the float Newman r on hand graphs: a star is maximally
    disassortative, two linked cliques assortative-ish, a cycle degenerate."""
    from osmgraft.operators.graph import assortativity

    import itertools
    import math

    def run(edges):
        df = spark.createDataFrame(edges, "src string, dst string")
        return assortativity(df).collect()[0]

    def ref_r(edges):
        und = set()
        for u, v in edges:
            und.add((u, v))
            und.add((v, u))
        deg = {}
        for u, _ in und:
            deg[u] = deg.get(u, 0) + 1
        xs = [(deg[u], deg[v]) for u, v in und]
        m2 = len(xs)
        sx = sum(a for a, _ in xs)
        sxx = sum(a * a for a, _ in xs)
        sxy = sum(a * b for a, b in xs)
        num, den = m2 * sxy - sx * sx, m2 * sxx - sx * sx
        return num, den

    star = [("c", f"l{i}") for i in range(6)]
    r = run(star)
    num, den = ref_r(star)
    assert (r["r_num"], r["r_den"]) == (num, den)
    assert r["mix_class"] == "disassortative" and num < 0
    cliques = (
        list(itertools.combinations(["a1", "a2", "a3", "a4"], 2))
        + list(itertools.combinations(["b1", "b2", "b3", "b4"], 2))
        + [("a1", "b1")]
    )
    rc = run(cliques)
    numc, denc = ref_r(cliques)
    assert (rc["r_num"], rc["r_den"]) == (numc, denc)
    cyc = [(f"n{i}", f"n{(i + 1) % 5}") for i in range(5)]
    assert run(cyc)["mix_class"] == "degenerate"  # 2-regular: den = 0


def test_transitivity_hand_graphs(spark):
    """Complete K4: C = 1; a path: C = 0 (sparse); a triangle with a
    pendant: C = 3*1 / (wedges) matches the hand count."""
    from osmgraft.operators.graph import transitivity

    import itertools

    def run(edges):
        df = spark.createDataFrame(edges, "src string, dst string")
        return transitivity(df).collect()[0]

    k4 = list(itertools.combinations(["a", "b", "c", "d"], 2))
    r = run(k4)
    assert r["n_tri_total"] == 4 and r["c_num"] == r["c_den"]
    assert r["cluster_class"] == "clustered"
    path = [("a", "b"), ("b", "c"), ("c", "d")]
    rp = run(path)
    assert rp["n_tri_total"] == 0 and rp["cluster_class"] == "sparse"
    tri_pendant = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "x")]
    rt = run(tri_pendant)
    # degrees: a=3, b=2, c=2, x=1 -> wedges2 = 6+2+2+0 = 10; 6T = 6
    assert (rt["c_num"], rt["c_den"]) == (6, 10)
    assert rt["cluster_class"] == "clustered"  # 3/5 >= 1/3


def _ref_link_prediction(edges, top_k=100):
    """Plain-python reference: neighborhoods via dict-of-sets, exact
    Jaccard ordering by Fraction (checks the floor-scaled key preserves
    the true rational ranking up to its pinned 1e-9 granularity)."""
    from collections import defaultdict

    nbr = defaultdict(set)
    for s, d in edges:
        if s != d:
            nbr[s].add(d)
            nbr[d].add(s)
    und = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    cand = {}
    for hub, ns in nbr.items():
        ns = sorted(ns)
        for i in range(len(ns)):
            for j in range(i + 1, len(ns)):
                p = (ns[i], ns[j])
                if p not in und:
                    cand[p] = cand.get(p, 0) + 1
    rows = []
    for (u, v), cn in cand.items():
        du, dv = len(nbr[u]), len(nbr[v])
        rows.append(
            (cn * 10**9 // (du + dv - cn), cn, u, v, du, dv, du * dv)
        )
    rows.sort(key=lambda r: (-r[0], -r[1], r[2], r[3]))
    return [
        (u, v, cn, du, dv, j, pa, i + 1)
        for i, (j, cn, u, v, du, dv, pa) in enumerate(rows[:top_k])
    ]


def test_link_prediction_matches_reference(spark):
    import numpy as np

    from osmgraft.operators.graph import link_prediction

    rng = np.random.default_rng(15)
    edges = list({(int(a), int(b)) for a, b in rng.integers(0, 30, (120, 2)) if a != b})
    df = spark.createDataFrame(edges, "src long, dst long")
    got = [
        (r.u, r.v, r.cn, r.du, r.dv, r.jacc_e9, r.pa, r.rnk)
        for r in link_prediction(df, top_k=50)
        .orderBy("rnk")
        .collect()
    ]
    assert got == _ref_link_prediction(edges, 50)


def test_link_prediction_excludes_existing_edges_and_ranks_jaccard(spark):
    from osmgraft.operators.graph import link_prediction

    # path a-b-c-d plus triangle closure candidate: (a,c), (b,d) are the only
    # wedge pairs; (a,d) shares no neighbor.
    df = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "src long, dst long"
    )
    rows = link_prediction(df, top_k=10).orderBy("rnk").collect()
    pairs = [(r.u, r.v) for r in rows]
    assert pairs == [(1, 3), (2, 4)]
    for r in rows:
        assert r.cn == 1 and r.jacc_e9 == 10**9 // 2  # |Γu ∪ Γv| = 2


def _kruskal_ref(edges):
    """Union-find Kruskal over (a, b, wkey) with distinct wkeys."""
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    out = []
    for a, b, dcnt, wkey in sorted(edges, key=lambda e: e[3]):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            out.append((a, b, dcnt, wkey))
    return sorted(out)


def test_boruvka_msf_matches_kruskal_random(spark):
    import numpy as np

    from osmgraft.operators.graph import boruvka_msf

    rng = np.random.default_rng(21)
    pairs = {(int(a), int(b)) for a, b in rng.integers(0, 60, (400, 2)) if a < b}
    edges = [
        (a, b, int(w), int(w) * 16777216 + a * 4096 + b)
        for (a, b), w in zip(sorted(pairs), rng.integers(0, 50, len(pairs)))
    ]
    df = spark.createDataFrame(edges, "a long, b long, dcnt long, wkey long")
    got = sorted(
        (r.a, r.b, r.dcnt, r.wkey) for r in boruvka_msf(df).collect()
    )
    assert got == _kruskal_ref(edges)


def test_boruvka_msf_forest_invariants(spark):
    import numpy as np

    from osmgraft.operators.graph import boruvka_msf

    # two disjoint cliques -> forest with (n1-1) + (n2-1) edges
    rng = np.random.default_rng(22)
    edges = []
    for base, n in ((0, 7), (100, 5)):
        for i in range(n):
            for j in range(i + 1, n):
                a, b = base + i, base + j
                edges.append((a, b, int(rng.integers(0, 9)), 0))
    edges = [
        (a, b, d, d * 16777216 + a * 4096 + b) for a, b, d, _ in edges
    ]
    df = spark.createDataFrame(edges, "a long, b long, dcnt long, wkey long")
    rows = boruvka_msf(df).collect()
    assert len(rows) == (7 - 1) + (5 - 1)
    assert sorted((r.a, r.b, r.dcnt, r.wkey) for r in rows) == _kruskal_ref(edges)


def test_boruvka_msf_path_graph_chain_contraction(spark):
    from osmgraft.operators.graph import boruvka_msf

    # a pure path with increasing weights exercises the chain-merge case
    # (every comp points left; contraction must flatten the whole chain)
    edges = [
        (i, i + 1, i, i * 16777216 + i * 4096 + (i + 1)) for i in range(20)
    ]
    df = spark.createDataFrame(edges, "a long, b long, dcnt long, wkey long")
    rows = boruvka_msf(df).collect()
    assert len(rows) == 20  # every path edge is in the MST


def _ref_ktruss(edges, k):
    """Plain-python support peel to fixed point."""
    cur = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    while True:
        sup = {}
        es = cur
        adj = {}
        for a, b in es:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        for a, b in es:
            sup[(a, b)] = len(adj[a] & adj[b])
        nxt = {e for e in es if sup[e] >= k - 2}
        if nxt == cur:
            return sorted((a, b, sup[(a, b)]) for a, b in nxt)
        cur = nxt


def test_ktruss_matches_reference_and_converges(spark):
    import numpy as np

    from osmgraft.operators.graph import ktruss

    rng = np.random.default_rng(33)
    edges = list({(int(a), int(b)) for a, b in rng.integers(0, 25, (160, 2)) if a != b})
    df = spark.createDataFrame(edges, "src long, dst long")
    got = sorted((r.a, r.b, r.support) for r in ktruss(df, k=4, max_rounds=10).collect())
    assert got == _ref_ktruss(edges, 4)


def test_ktruss_clique_survives_tree_dies(spark):
    from osmgraft.operators.graph import ktruss

    clique = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    tree = [(100 + i, 100 + i + 1) for i in range(6)]
    df = spark.createDataFrame(clique + tree, "src long, dst long")
    rows = ktruss(df, k=4).collect()
    # K5: every edge in 3 triangles -> survives with support 3; the path has none
    assert sorted((r.a, r.b) for r in rows) == sorted(clique)
    assert all(r.support == 3 for r in rows)


def test_ktruss_fixture_converges_within_pinned_rounds(spark, sf_smoke):
    """The driver-gate fixture must reach its fixed point inside the 6
    rounds the DuckDB twin unrolls."""
    from osmgraft.operators.graph import ktruss
    from osmgraft.queries import covisit_ktruss_4

    o = spark.read.parquet(f"{sf_smoke}/orders.parquet")
    edges = o.selectExpr(
        "o_orderkey % 211 AS src", "(o_orderkey div 211) % 211 AS dst"
    )
    r6 = {(r.a, r.b, r.support) for r in ktruss(edges, k=4, max_rounds=6).collect()}
    r8 = {(r.a, r.b, r.support) for r in ktruss(edges, k=4, max_rounds=8).collect()}
    assert r6 == r8 and len(r6) > 0


def test_personalized_pagerank_reference_and_locality(spark):
    import numpy as np

    from osmgraft.operators.graph import SCALE, personalized_pagerank

    def ref_ppr(edges, seeds, iters):
        nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
        deg = {}
        for s, _ in edges:
            deg[s] = deg.get(s, 0) + 1
        base = 15 * SCALE // 100
        r = {n: (SCALE if n in seeds else 0) for n in nodes}
        for _ in range(iters):
            in_sum = {n: 0 for n in nodes}
            for s, d in edges:
                in_sum[d] += r[s] // deg[s]
            r = {
                n: (base if n in seeds else 0) + (85 * in_sum[n]) // 100
                for n in nodes
            }
        return r

    rng = np.random.default_rng(23)
    edges = list({(int(a), int(b)) for a, b in rng.integers(0, 40, (300, 2)) if a != b})
    seeds = {1, 2, 3}
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r.node_id: r.rank_fx
        for r in personalized_pagerank(df, sorted(seeds), iters=4).collect()
    }
    assert got == ref_ppr(edges, seeds, 4)
    # locality: two disjoint cliques, seeds in one — the other must score 0
    cl1 = [(i, j) for i in range(5) for j in range(5) if i != j]
    cl2 = [(100 + i, 100 + j) for i in range(5) for j in range(5) if i != j]
    df2 = spark.createDataFrame(cl1 + cl2, "src long, dst long")
    got2 = {
        r.node_id: r.rank_fx
        for r in personalized_pagerank(df2, [0, 1], iters=4).collect()
    }
    assert all(got2[100 + i] == 0 for i in range(5))
    assert all(got2[i] > 0 for i in range(5))


def test_harmonic_centrality_matches_bfs_reference(spark):
    import numpy as np
    from collections import deque

    from osmgraft.operators.graph import harmonic_centrality

    rng = np.random.default_rng(24)
    edges = list({(int(a), int(b)) for a, b in rng.integers(0, 30, (120, 2)) if a != b})
    adj = {}
    for s, d in edges:
        adj.setdefault(s, []).append(d)
    sources = [0, 1, 2]
    exp = {}
    for s in sources:
        dist = {s: 0}
        q = deque([s])
        while q:
            u = q.popleft()
            if dist[u] >= 6:
                continue
            for v in adj.get(u, []):
                if v not in dist:
                    dist[v] = dist[u] + 1
                    q.append(v)
        reach = {v: d for v, d in dist.items() if 0 < d <= 6}
        if reach:
            exp[s] = (len(reach), sum(60 // d for d in reach.values()))
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r.source: (r.n_reached, r.h60)
        for r in harmonic_centrality(df, sources, rounds=6).collect()
    }
    assert got == exp


def test_boruvka_msf_fused_matches_distributed(spark):
    """The r4 fused (driver-contracted) path and the legacy all-distributed
    path must emit the identical MSF edge set (unique under distinct wkey)."""
    import numpy as np

    from osmgraft.operators.graph import boruvka_msf

    rng = np.random.default_rng(33)
    pairs = {(int(a), int(b)) for a, b in rng.integers(0, 80, (500, 2)) if a < b}
    edges = [
        (a, b, int(w), int(w) * 16777216 + a * 4096 + b)
        for (a, b), w in zip(sorted(pairs), rng.integers(0, 60, len(pairs)))
    ]
    df = spark.createDataFrame(edges, "a long, b long, dcnt long, wkey long")
    fused = sorted((r.a, r.b, r.dcnt, r.wkey) for r in boruvka_msf(df).collect())
    spark.conf.set("spark.osmgraft.msf.forceDistributed", "1")
    try:
        legacy = sorted(
            (r.a, r.b, r.dcnt, r.wkey) for r in boruvka_msf(df).collect()
        )
    finally:
        spark.conf.set("spark.osmgraft.msf.forceDistributed", "0")
    assert fused == legacy == _kruskal_ref(edges)
