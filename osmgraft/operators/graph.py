"""Iterative graph analytics: PageRank in integer fixed point.

PageRank is the canonical "Spark can, SQL can't" iterative workload — but a
FIXED iteration count unrolls into plain relational algebra, so the oracle
gate still applies: the DuckDB twin is the same recurrence written as R
chained CTEs. To make the two engines agree bit-for-bit the recurrence is
integer arithmetic only:

    r_0(v)     = SCALE
    r_{t+1}(v) = (15·SCALE) div 100
                 + (85 · Σ_{u→v} (r_t(u) div outdeg(u))) div 100

(d = 85/100 damping as exact rationals; the per-edge floor division loses a
deterministic dust of mass — identical on both engines, harmless to ranking,
and the price of a float-free gate).

Distribution shape: ranks live keyed by node; each iteration is one equi-join
of edges⨝ranks on src (shuffle on src) + one dst aggregation (map-side
combine). localCheckpoint every few rounds caps lineage like the other
iterative operators (dedup.connected_components, bpe.train_merges). At
100 TB the edge table is the big side and ranks the small-ish side — AQE can
broadcast ranks when the node set fits, else it's the standard Pregel shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000_000
_BASE = 15 * SCALE // 100  # (1-d)·SCALE with d = 85/100


def pagerank(edges: DataFrame, iters: int = 4, checkpoint_every: int = 4) -> DataFrame:
    """Integer fixed-point PageRank over a directed edge list (src, dst).

    Nodes are everything appearing as src or dst. Returns (node_id, rank_fx)
    after exactly ``iters`` iterations — fixed count, so the result is a
    deterministic function of the edge list.

    The edge list is materialized once up front (eager localCheckpoint):
    every iteration references it twice (contrib join + deg), and Catalyst
    does not dedupe common subtrees, so an un-materialized upstream (e.g.
    textrank's regex tokenize + bigram explode) would re-execute
    O(iters) times inside the final action (r4 fix: textrank 8.9 s → the
    tokenize ran ~10x).  ``nodes``/``deg`` are derived from the pinned
    edges, so they re-scan materialized rows only."""
    edges = edges.select("src", "dst").localCheckpoint()
    nodes = (
        edges.select(F.col("src").alias("node_id"))
        .unionByName(edges.select(F.col("dst").alias("node_id")))
        .distinct()
        .localCheckpoint()
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    ranks = nodes.withColumn("rank_fx", F.lit(SCALE).cast("long"))
    for t in range(iters):
        contrib = (
            edges.join(ranks, edges.src == ranks.node_id)
            .join(deg, "src")
            .select("dst", F.expr("rank_fx div outdeg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("in_sum"))
        )
        ranks = nodes.join(
            contrib, nodes.node_id == contrib.dst, "left"
        ).select(
            "node_id",
            (
                F.lit(_BASE)
                + F.expr("(85 * coalesce(in_sum, 0)) div 100")
            ).cast("long").alias("rank_fx"),
        )
        if (t + 1) % checkpoint_every == 0 and t + 1 < iters:
            ranks = ranks.localCheckpoint()
    return ranks


def sql_pagerank(edges_sql: str, iters: int = 4) -> str:
    """DuckDB twin: the same recurrence unrolled into ``iters`` chained CTEs."""
    parts = [
        f"edges AS ({edges_sql})",
        "nodes AS (SELECT DISTINCT src AS node_id FROM edges"
        " UNION SELECT DISTINCT dst FROM edges)",
        "deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src)",
        f"r0 AS (SELECT node_id, CAST({SCALE} AS BIGINT) AS rank_fx FROM nodes)",
    ]
    for t in range(iters):
        parts.append(
            f"""c{t} AS (
  SELECT e.dst, sum(r.rank_fx // d.outdeg) AS in_sum
  FROM edges e JOIN r{t} r ON e.src = r.node_id JOIN deg d ON e.src = d.src
  GROUP BY e.dst
),
r{t + 1} AS (
  SELECT n.node_id,
         {_BASE} + (85 * coalesce(c.in_sum, 0)) // 100 AS rank_fx
  FROM nodes n LEFT JOIN c{t} c ON n.node_id = c.dst
)"""
        )
    return (
        "WITH " + ",\n".join(parts)
        # CAST: sum() promoted rank_fx to HUGEINT, whose client-side value
        # representation is fetch-path-dependent (float64 via .df() in
        # duckdb 1.0) — the r3/r4 driver-red cause for textrank_keywords
        # and pagerank_roads. BIGINT is exact and fetch-invariant.
        + f"\nSELECT node_id, CAST(rank_fx AS BIGINT) AS rank_fx FROM r{iters}"
    )


def shortest_paths(
    edges: DataFrame, sources: list[int], rounds: int = 6, checkpoint_every: int = 4
) -> DataFrame:
    """K-round Bellman-Ford from a source set over weighted edges
    (src, dst, w_m) — min-plus relaxation, the second canonical iterative
    graph workload. A FIXED round count makes the result a deterministic
    function of the graph (= shortest distance among paths of ≤ K edges),
    so the oracle twin is the same recurrence unrolled relationally.

    Per round: one equi-join of the frontier on src + one min-aggregation —
    integer weights, so min() is exact on both engines. Returns
    (node_id, dist_m) for every node reached within ``rounds`` hops.

    The edge list is eagerly checkpointed ONCE before iterating (standard
    Pregel hygiene): without it every round re-evaluates the caller's edge
    subplan — a window + joins at road scale — multiplying its cost by the
    round count. The dist side stays small relative to edges, so AQE
    broadcasts it and rounds never shuffle the edge list."""
    edges = edges.select("src", "dst", "w_m").localCheckpoint(eager=True)
    spark = edges.sparkSession
    dist = spark.createDataFrame(
        [(int(s), 0) for s in sources], "node_id long, dist_m long"
    )
    for t in range(rounds):
        cand = (
            edges.join(dist, edges.src == dist.node_id)
            .select(F.col("dst").alias("node_id"), (F.col("dist_m") + F.col("w_m")).alias("dist_m"))
        )
        dist = (
            dist.unionByName(cand)
            .groupBy("node_id")
            .agg(F.min("dist_m").alias("dist_m"))
        )
        if (t + 1) % checkpoint_every == 0 and t + 1 < rounds:
            dist = dist.localCheckpoint()
    return dist


def sql_shortest_paths(
    edges_sql: str, sources: list[int], rounds: int = 6
) -> str:
    """DuckDB twin: the min-plus recurrence unrolled into ``rounds`` CTEs."""
    src_vals = ", ".join(f"({int(s)})" for s in sources)
    parts = [
        f"edges AS ({edges_sql})",
        f"d0 AS (SELECT node_id, CAST(0 AS BIGINT) AS dist_m FROM (VALUES {src_vals}) s(node_id))",
    ]
    for t in range(rounds):
        parts.append(
            f"""d{t + 1} AS (
  SELECT node_id, min(dist_m) AS dist_m FROM (
    SELECT node_id, dist_m FROM d{t}
    UNION ALL
    SELECT e.dst AS node_id, d.dist_m + e.w_m AS dist_m
    FROM edges e JOIN d{t} d ON e.src = d.node_id
  ) GROUP BY node_id
)"""
        )
    return "WITH " + ",\n".join(parts) + f"\nSELECT node_id, dist_m FROM d{rounds}"


# --- connected components at scale: alternating large-star / small-star --------

def cc_star(edges: DataFrame, max_rounds: int = 30) -> DataFrame:
    """(id, comp) connected components via the alternating large-star /
    small-star algorithm (Kiveris et al., "Connected Components in
    MapReduce and Beyond", SoCC'14 — public knowledge): each round hangs
    every node's larger neighbors (large-star) then its smaller ones
    (small-star) off the neighborhood minimum, flattening trees
    logarithmically.  Converges in O(log n) rounds on ANY topology —
    including the path/coastline-shaped graphs where per-hop min-label
    propagation (dedup.connected_components) needs diameter rounds — which
    is the property that matters at 100 TB where a component can span
    millions of cells.

    Each star step is one groupBy-min + one join on the edge list, all
    JVM-side; convergence is detected with a (count, xxhash-sum) signature
    — two scalars per round, no edge-set comparison join.  Nodes with no
    edges never appear; callers coalesce singletons to themselves.
    Output: one row per non-root node (id, comp) plus (root, root)."""

    def large_star(e: DataFrame) -> DataFrame:
        sym = e.unionAll(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        m = sym.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        return (
            sym.join(m, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct()
        )

    def small_star(e: DataFrame) -> DataFrame:
        dn = e.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        m = dn.groupBy("u").agg(F.min("v").alias("m"))  # v <= u ⇒ m = min(Γ⁺)
        a = (
            dn.join(m, "u")
            .where(F.col("v") != F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        b = m.where(F.col("u") != F.col("m")).select(
            "u", F.col("m").alias("v")
        )
        return a.unionAll(b).distinct()

    e = (
        edges.selectExpr("u", "v")
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    prev_sig = None
    for _ in range(max_rounds):
        e = small_star(large_star(e)).localCheckpoint(eager=True)
        sig = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(xxhash64(u, v))").alias("h"),  # no-overflow signature
        ).collect()[0]
        sig = (sig["n"], sig["h"])
        if sig == prev_sig:
            break
        prev_sig = sig
    else:
        raise RuntimeError(
            f"cc_star did not converge in {max_rounds} rounds — raise "
            "max_rounds (expected O(log n); this indicates a pathological "
            "input or a bug, not normal operation)"
        )
    roots = e.select(F.col("v").alias("id")).distinct().select(
        "id", F.col("id").alias("comp")
    )
    return e.select(F.col("u").alias("id"), F.col("v").alias("comp")).unionAll(
        roots
    ).distinct()

def cc_two_level(
    edges: DataFrame,
    band_of,
    min_residual_rounds: int = 30,
    driver_merge_max: int = 1 << 20,
) -> DataFrame:
    """(id, comp) connected components via LOCAL CONTRACTION + global merge —
    the two-level scheme production CCL systems use at scale: partition the
    nodes into bands (``band_of``: Column expr over a node-id column, e.g. a
    spatial stripe decoded from the key), solve each band's intra-band
    subgraph EXACTLY with a sequential union-find inside one
    ``applyInPandas`` task, then run :func:`cc_star` only on the residual
    graph of inter-band edges relabeled through their local roots.

    Why this wins: on spatially-banded grid/mesh graphs almost all edges are
    intra-band, so the residual graph is a tiny fraction of the input (band
    boundaries only) and the O(log n) star rounds — each a full-shuffle Spark
    job — run on that fraction instead of the whole edge set.  The local pass
    is ONE job; union-find is union-by-min so every local root is the MINIMUM
    node id of its local component, and minima compose, so the final label is
    the global minimum id exactly as cc_star alone would produce.

    The residual merge is SIZE-GATED: after contraction it is counted, and a
    residual at or under ``driver_merge_max`` edges (default 2^20 — a few MB,
    the same bounded-collect budget celljoin's hot-cell aggregate uses) is
    union-found on the driver in one collect — the classical two-pass-CCL
    "merge table".  Only a residual LARGER than the gate pays cc_star's
    per-round jobs, and then it genuinely needs them.

    At 100 TB: bands should be sized so one band's edges fit one task
    (millions of edges — the Python UF is O(edges · α)); the residual —
    band-boundary roots only — either fits the driver gate or runs log-round
    star contraction.  Skew note: a band is a task, so pick the banding axis
    perpendicular to the data's densest direction."""
    e = edges.selectExpr("u", "v").where(F.col("u") != F.col("v")).distinct()
    eb = e.select(
        "u", "v", band_of(F.col("u")).alias("bu"), band_of(F.col("v")).alias("bv")
    )
    return cc_two_level_banded(eb, min_residual_rounds, driver_merge_max)


def cc_two_level_banded(
    eb: DataFrame,
    min_residual_rounds: int = 30,
    driver_merge_max: int = 1 << 20,
) -> DataFrame:
    """:func:`cc_two_level` over PRE-BANDED edges (u, v, bu, bv) — for
    callers whose band is not a pure function of the node id (e.g. DBSCAN,
    where the natural band is the node's spatial cell stripe, known at edge
    build time but not recoverable from the id).  ``bu``/``bv`` must be a
    consistent function of u resp. v; edges must have u != v (duplicates are
    harmless — union-find and the residual distinct absorb them).  Labels
    are provably identical to cc_star (union-by-min everywhere)."""
    intra = eb.where(F.col("bu") == F.col("bv")).select(
        F.col("bu").alias("band"), "u", "v"
    )
    inter = eb.where(F.col("bu") != F.col("bv")).select("u", "v")

    def _uf(pdf):
        import pandas as pd

        parent: dict = {}

        def find(x):
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != r:
                parent[x], x = r, parent[x]
            return r

        for u, v in zip(pdf["u"].tolist(), pdf["v"].tolist()):
            ru, rv = find(u), find(v)
            if ru != rv:
                if ru < rv:  # union-by-min: root = min id of the component
                    parent[rv] = ru
                else:
                    parent[ru] = rv
        ids = list(parent.keys())
        ids += list({find(x) for x in ids})  # (root, root) rows like cc_star
        return pd.DataFrame({"id": ids, "root": [find(x) for x in ids]})

    local = (
        intra.groupBy("band")
        .applyInPandas(_uf, "id long, root long")
        .localCheckpoint(eager=True)  # reuse across 3 joins without recompute
    )
    lu = local.select(F.col("id").alias("u"), F.col("root").alias("ru"))
    lv = local.select(F.col("id").alias("v"), F.col("root").alias("rv"))
    residual = (
        inter.join(lu, "u", "left")
        .join(lv, "v", "left")
        .select(
            F.coalesce("ru", F.col("u")).alias("u"),
            F.coalesce("rv", F.col("v")).alias("v"),
        )
    )
    residual = (
        residual.where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_res = residual.count()
    if n_res <= driver_merge_max:
        parent: dict = {}

        def find(x):
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != r:
                parent[x], x = r, parent[x]
            return r

        for row in residual.collect():  # bounded by driver_merge_max
            ru, rv = find(row[0]), find(row[1])
            if ru != rv:
                if ru < rv:
                    parent[rv] = ru
                else:
                    parent[ru] = rv
        ids = list(parent.keys())
        roots = {find(x) for x in ids}
        res = residual.sparkSession.createDataFrame(
            [(x, find(x)) for x in ids] + [(r, r) for r in roots],
            "id long, comp long",
        )
    else:
        res = cc_star(residual, max_rounds=min_residual_rounds)
    out_local = local.join(res.withColumnRenamed("id", "root"), "root", "left").select(
        "id", F.coalesce("comp", F.col("root")).alias("comp")
    )
    only_res = res.join(local.select("id"), "id", "left_anti")
    return out_local.unionByName(only_res)


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-node triangle participation counts — the clustering-coefficient
    numerator, via the DEGREE-ORIENTED wedge algorithm (Cohen 2009 /
    Suri-Vassilvitskii WWW'11, the canonical MapReduce formulation):
    undirect + dedupe, orient every edge from the (degree, id)-SMALLER to
    the larger endpoint, build wedges by joining oriented edges on their
    source, close each wedge with a semi-join back on the oriented edge
    set, then credit the 3 corners. Orientation bounds every node's
    out-degree by O(sqrt(|E|)) regardless of skew — a celebrity node's
    star never becomes a quadratic wedge set; the join keys are the skew
    handling.

    Output (node_id, n_tri); nodes in no triangle are absent. The oracle
    twin is the NAIVE a<b<c three-way self-join — different algorithm,
    same exact counts."""
    und = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("n"))
        .unionAll(und.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    e = (
        und.join(deg.select(F.col("n").alias("a"), F.col("d").alias("da")), "a")
        .join(deg.select(F.col("n").alias("b"), F.col("d").alias("db")), "b")
    )
    fwd = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    ori = e.select(
        F.when(fwd, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(fwd, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(fwd, F.col("db")).otherwise(F.col("da")).alias("dv"),
    )
    x, y = ori.alias("x"), ori.alias("y")
    lower = (F.col("x.dv") < F.col("y.dv")) | (
        (F.col("x.dv") == F.col("y.dv")) & (F.col("x.v") < F.col("y.v"))
    )
    wedges = x.join(y, F.col("x.u") == F.col("y.u")).where(lower).select(
        F.col("x.u").alias("w1"), F.col("x.v").alias("w2"), F.col("y.v").alias("w3")
    )
    closed = wedges.join(
        ori.select(F.col("u").alias("w2"), F.col("v").alias("w3")),
        ["w2", "w3"],
        "left_semi",
    )
    corners = (
        closed.select(F.col("w1").alias("node_id"))
        .unionAll(closed.select(F.col("w2").alias("node_id")))
        .unionAll(closed.select(F.col("w3").alias("node_id")))
    )
    return corners.groupBy("node_id").agg(F.count(F.lit(1)).alias("n_tri"))


def sql_triangle_counts(edges_sql: str) -> str:
    """DuckDB twin: naive ordered three-way self-join (a < b < c)."""
    return f"""WITH edges AS ({edges_sql}),
und AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM edges WHERE src != dst),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM und e1
  JOIN und e2 ON e2.a = e1.b
  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
corners AS (
  SELECT x AS node_id FROM tri
  UNION ALL SELECT y FROM tri
  UNION ALL SELECT z FROM tri)
SELECT node_id, count(*) AS n_tri FROM corners GROUP BY node_id"""


def kcore(edges: DataFrame, k: int, rounds: int, checkpoint_every: int = 4) -> DataFrame:
    """Bounded-round k-core peeling: repeatedly delete nodes of degree < k
    (undirected edge list, both directions present).  After exactly
    ``rounds`` peels the survivors are the canonical "round-r k-core
    approximation" — a deterministic function of (edges, k, rounds) that
    CONVERGES to the true k-core once a round deletes nothing (convergence
    pinned in tests for the fixtures; at 100 TB pick rounds ~ observed peel
    depth, typically <20 even on web graphs — Batagelj-Zaversnik is the
    sequential alternative, but peeling rounds are the Pregel shape).

    Returns surviving (node_id, degree).  Per round: ONE degree aggregation
    + one semi-join filter on each endpoint — two shuffles, map-side
    combine; localCheckpoint every few rounds stops plan doubling (the
    pagerank discipline).

    r4: ``keep`` (node-scale, tiny) is pinned per round — it is referenced
    twice in the filter join and its subtree CONTAINS the previous round's
    ``live``, so un-pinned the plan tripled per round (~3^checkpoint_every
    re-evaluations of the checkpointed base inside each window; measured
    7.0 s → ~4 s on kcore20_planted at sf0.1).  With keep pinned, live's
    lineage grows by one join pair per round, and the every-few-rounds live
    checkpoint bounds the chain that each keep evaluation walks."""
    live = edges.select("src", "dst").localCheckpoint()
    for t in range(rounds):
        deg = live.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
        keep = deg.filter(F.col("d") >= k).select("src").localCheckpoint()
        live = (
            live.join(keep, "src")
            .join(keep.select(F.col("src").alias("dst")), "dst")
            .select("src", "dst")
        )
        if (t + 1) % checkpoint_every == 0 and t + 1 < rounds:
            live = live.localCheckpoint()
    return live.groupBy(F.col("src").alias("node_id")).agg(
        F.count(F.lit(1)).alias("degree")
    ).filter(F.col("degree") >= k)


def sql_kcore(edges_sql: str, k: int, rounds: int) -> str:
    """DuckDB twin: the peel unrolled into ``rounds`` chained CTEs — each
    MATERIALIZED, because e{t} is referenced twice and k{t} twice per
    round: DuckDB 1.0 inlines plain CTEs, turning the chain into ~3^rounds
    re-evaluations of the base scan (measured: minutes at rounds=8;
    milliseconds materialized)."""
    parts = [f"e0 AS MATERIALIZED ({edges_sql})"]
    for t in range(rounds):
        parts.append(
            f"""k{t} AS MATERIALIZED (
  SELECT src FROM e{t} GROUP BY src HAVING count(*) >= {k})"""
        )
        parts.append(
            f"""e{t + 1} AS MATERIALIZED (
  SELECT e.src, e.dst FROM e{t} e
  JOIN k{t} a ON a.src = e.src
  JOIN k{t} b ON b.src = e.dst)"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT src AS node_id, count(*) AS degree
FROM e{rounds} GROUP BY src HAVING count(*) >= {k}"""
    )


def hits(edges: DataFrame, rounds: int = 2) -> DataFrame:
    """HITS hubs & authorities (Kleinberg JACM 1999) over a directed edge
    list (src, dst) — PageRank's mutual-reinforcement sibling — run
    DIVISION-FREE: the per-round L2 normalization only rescales, so a
    FIXED ``rounds``-round run carries the UNNORMALIZED integer iterates
        a_{t+1}(v) = Σ_{(u,v)∈E} h_t(u),   h_{t+1}(u) = Σ_{(u,v)∈E} a_{t+1}(v)
    from h_0 = 1 — exact int64 (growth ≤ (d_max²)^rounds; at the default
    2 rounds and degrees ≤ 10⁴ the scores stay < 10¹⁶), bitwise at any
    parallelism, and the RANKING equals normalized HITS exactly.

    Emits (node_id, hub_score, auth_score) for every node appearing in the
    edge list (absent side = 0).  Per round: two dst/src-keyed
    aggregate-joins — the Pregel shape; one partitioning serves both.

    100 TB: bounded rounds of equi-join + map-side-combinable sums; no
    driver loop, no floats, no collect."""
    e = edges.select("src", "dst").distinct()
    nodes = (
        e.select(F.col("src").alias("node_id"))
        .unionByName(e.select(F.col("dst").alias("node_id")))
        .distinct()
    )
    h = nodes.select("node_id", F.lit(1).cast("long").alias("h"))
    a = None
    for _ in range(rounds):
        a = (
            e.join(h, e.src == h.node_id)
            .groupBy("dst")
            .agg(F.sum("h").alias("a"))
        )
        h = (
            e.join(a, "dst")
            .groupBy("src")
            .agg(F.sum("a").alias("h"))
            .withColumnRenamed("src", "node_id")
        )
    return (
        nodes.join(h, "node_id", "left")
        .join(a.withColumnRenamed("dst", "node_id"), "node_id", "left")
        .select(
            "node_id",
            F.coalesce(F.col("h"), F.lit(0)).cast("long").alias("hub_score"),
            F.coalesce(F.col("a"), F.lit(0)).cast("long").alias("auth_score"),
        )
    )


def sql_hits(edges_sql: str, rounds: int = 2) -> str:
    """DuckDB twin of :func:`hits` — the same recurrence unrolled into
    chained CTEs."""
    parts = [
        f"h_edges AS (SELECT DISTINCT src, dst FROM ({edges_sql}))",
        "h_nodes AS (SELECT DISTINCT src AS node_id FROM h_edges"
        " UNION SELECT DISTINCT dst FROM h_edges)",
        "h0 AS (SELECT node_id, CAST(1 AS BIGINT) AS h FROM h_nodes)",
    ]
    for t in range(rounds):
        parts.append(
            f"""a{t + 1} AS (
  SELECT e.dst, CAST(sum(h.h) AS BIGINT) AS a
  FROM h_edges e JOIN h{t} h ON e.src = h.node_id GROUP BY e.dst),
h{t + 1} AS (
  SELECT e.src AS node_id, CAST(sum(a.a) AS BIGINT) AS h
  FROM h_edges e JOIN a{t + 1} a ON e.dst = a.dst GROUP BY e.src)"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT n.node_id,
       COALESCE(h.h, 0) AS hub_score,
       COALESCE(a.a, 0) AS auth_score
FROM h_nodes n
LEFT JOIN h{rounds} h ON h.node_id = n.node_id
LEFT JOIN a{rounds} a ON a.dst = n.node_id"""
    )


def assortativity(edges: DataFrame) -> DataFrame:
    """Degree-assortativity terms of an undirected graph (Newman PRL
    2002): the Pearson correlation of end-point degrees over edges,
    emitted as EXACT integers — with both orientations of every edge
    (the standard symmetrization, M = 2m samples of (d_u, d_v)):

        num = M·Σ d_u d_v − (Σd_u)·(Σd_v),
        den_x = M·Σd_u² − (Σd_u)²   (= den_y by symmetry)

    and r = num/den_x exactly (the symmetrized den_x = den_y, so the √
    collapses — no irrational anywhere).  Class: 'assortative' when
    2·num ≥ den_x (r ≥ ½), 'disassortative' when −2·num ≥ den_x,
    'neutral' otherwise, 'degenerate' on a regular graph (den 0).
    Hubs-link-hubs vs hubs-link-leaves — the one-number mixing summary
    beside hits/pagerank's per-node scores.

    Emits ONE row (n_nodes, n_edges, r_num, r_den, mix_class).

    100 TB: a degree agg + two broadcast-able joins + one final agg."""
    und = edges.select("src", "dst").unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    deg = und.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("deg"))
    du = deg.select(F.col("src").alias("_u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("src").alias("_v"), F.col("deg").alias("dv"))
    j = und.join(du, und.src == du._u).join(dv, und.dst == dv._v)
    agg = j.agg(
        F.count(F.lit(1)).cast("long").alias("_m2"),
        F.sum("du").cast("long").alias("_sx"),
        F.sum(F.col("du") * F.col("du")).cast("long").alias("_sxx"),
        F.sum(F.col("du") * F.col("dv")).cast("long").alias("_sxy"),
    )
    n_nodes = deg.count()
    num = F.col("_m2") * F.col("_sxy") - F.col("_sx") * F.col("_sx")
    den = F.col("_m2") * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    cls = (
        F.when(den == 0, "degenerate")
        .when(F.lit(2) * num >= den, "assortative")
        .when(F.lit(-2) * num >= den, "disassortative")
        .otherwise("neutral")
    )
    return agg.select(
        F.lit(n_nodes).cast("long").alias("n_nodes"),
        F.expr("_m2 div 2").alias("n_edges"),
        num.cast("long").alias("r_num"),
        den.cast("long").alias("r_den"),
        cls.alias("mix_class"),
    )


def sql_assortativity(edges_sql: str) -> str:
    """DuckDB twin of :func:`assortativity`."""
    return f"""WITH as_e AS ({edges_sql}),
as_und AS (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM as_e UNION ALL SELECT dst, src FROM as_e)),
as_deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS deg
           FROM as_und GROUP BY 1),
as_j AS (
  SELECT a.deg AS du, b.deg AS dv
  FROM as_und e JOIN as_deg a ON a.node = e.src JOIN as_deg b ON b.node = e.dst),
as_agg AS (
  SELECT CAST(count(*) AS BIGINT) AS m2,
         CAST(sum(du) AS BIGINT) AS sx,
         CAST(sum(du * du) AS BIGINT) AS sxx,
         CAST(sum(du * dv) AS BIGINT) AS sxy
  FROM as_j)
SELECT (SELECT count(*) FROM as_deg) AS n_nodes,
       m2 // 2 AS n_edges,
       CAST(m2 * sxy - sx * sx AS BIGINT) AS r_num,
       CAST(m2 * sxx - sx * sx AS BIGINT) AS r_den,
       CASE WHEN m2 * sxx - sx * sx = 0 THEN 'degenerate'
            WHEN 2 * (m2 * sxy - sx * sx) >= m2 * sxx - sx * sx
              THEN 'assortative'
            WHEN -2 * (m2 * sxy - sx * sx) >= m2 * sxx - sx * sx
              THEN 'disassortative'
            ELSE 'neutral' END AS mix_class
FROM as_agg"""


def transitivity(edges: DataFrame) -> DataFrame:
    """Global transitivity (the graph clustering coefficient, Watts &
    Strogatz 1998 / Newman's global form): C = 3·triangles / wedges,
    carried exactly as

        c_num = 6·T_total   (Σ per-node triangle credits = 3T, doubled)
        c_den = Σ_v d_v·(d_v − 1)   (= 2·wedges)

    so C = c_num/c_den with no division — reusing the degree-oriented
    triangle kernel (:func:`triangle_counts`, skew-bounded by
    orientation) for the numerator and one degree aggregate for the
    denominator.  Class: 'clustered' at C ≥ 1/3 (the Erdős–Rényi-vs-
    small-world divide, pinned rational), 'sparse' otherwise,
    'degenerate' with no wedges.  ONE row (n_nodes, n_tri_total, c_num,
    c_den, cluster_class).

    100 TB: triangle kernel cost + one degree agg."""
    tri = triangle_counts(edges)
    t3 = tri.agg(F.coalesce(F.sum("n_tri"), F.lit(0)).cast("long").alias("_t3"))
    und = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("n"))
        .unionAll(und.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    dd = deg.agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.sum(F.col("d") * (F.col("d") - 1)).cast("long").alias("_w2"),
    )
    j = dd.crossJoin(F.broadcast(t3))
    cls = (
        F.when(F.col("_w2") == 0, "degenerate")
        .when(F.lit(3) * F.lit(2) * F.col("_t3") >= F.col("_w2"), "clustered")
        .otherwise("sparse")
    )
    return j.select(
        "n_nodes",
        F.expr("_t3 div 3").alias("n_tri_total"),
        (F.lit(2) * F.col("_t3")).cast("long").alias("c_num"),
        F.col("_w2").alias("c_den"),
        cls.alias("cluster_class"),
    )


def sql_transitivity(edges_sql: str) -> str:
    """DuckDB twin of :func:`transitivity` — naive triangle count + the
    same degree wedge denominator."""
    return f"""WITH tr_edges AS ({edges_sql}),
tr_und AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM tr_edges WHERE src <> dst),
tr_deg AS (
  SELECT n, CAST(count(*) AS BIGINT) AS d FROM (
    SELECT a AS n FROM tr_und UNION ALL SELECT b FROM tr_und) GROUP BY 1),
tr_tri AS (
  SELECT CAST(count(*) AS BIGINT) AS t
  FROM tr_und e1 JOIN tr_und e2 ON e2.a = e1.a AND e2.b > e1.b
  JOIN tr_und e3 ON e3.a = e1.b AND e3.b = e2.b),
tr_dd AS (
  SELECT CAST(count(*) AS BIGINT) AS n_nodes,
         CAST(sum(d * (d - 1)) AS BIGINT) AS w2
  FROM tr_deg)
SELECT n_nodes, t AS n_tri_total,
       CAST(6 * t AS BIGINT) AS c_num, w2 AS c_den,
       CASE WHEN w2 = 0 THEN 'degenerate'
            WHEN 18 * t >= w2 THEN 'clustered'
            ELSE 'sparse' END AS cluster_class
FROM tr_dd, tr_tri"""


def link_prediction(edges: DataFrame, top_k: int = 100) -> DataFrame:
    """Link prediction over an undirected graph (Liben-Nowell & Kleinberg
    CIKM 2003): for every non-adjacent pair (u, v) sharing at least one
    neighbor, the three classic neighborhood scores, all exact integers —

        cn      = |Γ(u) ∩ Γ(v)|                (common neighbors)
        jacc_e9 = cn·10⁹ div (d_u + d_v − cn)  (Jaccard, floor-scaled —
                  the division both engines share, no float anywhere)
        pa      = d_u · d_v                     (preferential attachment)

    ranked by (jacc_e9 DESC, cn DESC, u, v) — a total order, so the
    top-``top_k`` slice is deterministic across engines and partitionings.
    Emits (u, v, cn, du, dv, jacc_e9, pa, rnk).

    Shape: wedge self-join on the hub node (Σd² pairs — the classic
    skew; at 100 TB cap hub degrees or orient like triangle_counts),
    one groupBy(u, v), an anti-join against the edge set, two degree
    joins, one ranked window.  Spark's WindowGroupLimit pushes the
    rnk ≤ k filter below the final sort, so no partition materializes
    more than k rows per window."""
    from pyspark.sql.window import Window

    und = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    adj = und.select(F.col("a").alias("n"), F.col("b").alias("m")).unionAll(
        und.select(F.col("b").alias("n"), F.col("a").alias("m"))
    )
    deg = adj.groupBy("n").agg(F.count(F.lit(1)).cast("long").alias("d"))
    lft = adj.select(F.col("n").alias("hub"), F.col("m").alias("u"))
    rgt = adj.select(F.col("n").alias("hub"), F.col("m").alias("v"))
    cand = (
        lft.join(rgt, "hub")
        .where(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("cn"))
        .join(und, (F.col("u") == und.a) & (F.col("v") == und.b), "left_anti")
        .join(deg.select(F.col("n").alias("u"), F.col("d").alias("du")), "u")
        .join(deg.select(F.col("n").alias("v"), F.col("d").alias("dv")), "v")
    )
    scored = cand.select(
        "u",
        "v",
        "cn",
        "du",
        "dv",
        F.expr("cn * 1000000000 div (du + dv - cn)").cast("long").alias("jacc_e9"),
        (F.col("du") * F.col("dv")).cast("long").alias("pa"),
    )
    w = Window.orderBy(
        F.desc("jacc_e9"), F.desc("cn"), F.asc("u"), F.asc("v")
    )
    return scored.withColumn("rnk", F.row_number().over(w).cast("long")).where(
        F.col("rnk") <= top_k
    )


def sql_link_prediction(edges_sql: str, top_k: int = 100) -> str:
    """DuckDB twin of :func:`link_prediction` — same wedge join, same
    floor-scaled Jaccard, same pinned total order."""
    return f"""WITH lp_e AS ({edges_sql}),
lp_und AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM lp_e WHERE src <> dst),
lp_adj AS (
  SELECT a AS n, b AS m FROM lp_und UNION ALL SELECT b, a FROM lp_und),
lp_deg AS (SELECT n, CAST(count(*) AS BIGINT) AS d FROM lp_adj GROUP BY 1),
lp_cand AS (
  SELECT l.m AS u, r.m AS v, CAST(count(*) AS BIGINT) AS cn
  FROM lp_adj l JOIN lp_adj r ON l.n = r.n AND l.m < r.m
  GROUP BY 1, 2),
lp_new AS (
  SELECT c.u, c.v, c.cn, a.d AS du, b.d AS dv
  FROM lp_cand c
  JOIN lp_deg a ON a.n = c.u JOIN lp_deg b ON b.n = c.v
  WHERE NOT EXISTS (
    SELECT 1 FROM lp_und e WHERE e.a = c.u AND e.b = c.v)),
lp_scored AS (
  SELECT u, v, cn, du, dv,
         CAST(cn * 1000000000 // (du + dv - cn) AS BIGINT) AS jacc_e9,
         CAST(du * dv AS BIGINT) AS pa
  FROM lp_new)
SELECT u, v, cn, du, dv, jacc_e9, pa,
       CAST(row_number() OVER (
         ORDER BY jacc_e9 DESC, cn DESC, u, v) AS BIGINT) AS rnk
FROM lp_scored
QUALIFY rnk <= {top_k}"""


def boruvka_msf(
    edges: DataFrame,
    max_rounds: int = 12,
    driver_merge_max: int = 1 << 17,
    nodes_hint: int | None = None,
) -> DataFrame:
    """Minimum spanning forest by Borůvka's algorithm (Borůvka 1926 —
    the oldest MST algorithm and the natively parallel one: every
    component picks its lightest incident crossing edge, components
    contract, repeat; components at least halve per round, so
    ``max_rounds`` = 10 covers 2¹⁰ initial components).

    ``edges`` is an undirected edge list (a, b, dcnt, wkey) whose
    ``wkey`` values are DISTINCT (callers pack tie-break ids into the
    low bits) — distinct weights make the MSF unique and the picked
    edge set cycle-free (a cycle's heaviest edge can't be either
    endpoint component's minimum), which in turn makes the result
    engine- and partitioning-exact.  Emits the MSF edge rows
    (a, b, dcnt, wkey).

    Distribution shape, per round: two comp-label equi-joins of the
    edge list, ONE map-side-combinable min_by aggregation per
    component (min over (wkey, …) structs — no window, no skewed
    shuffle), then contraction of the chosen pointer graph (out-degree
    exactly 1 per component; distinct weights ⇒ only mutual 2-cycles)
    via :func:`cc_star` — O(log) star rounds, each step materialized,
    so no exponentially-deep self-join plan; localCheckpoint caps
    lineage like pagerank / dedup.connected_components.  The DuckDB
    twin is a genuinely different algorithm (sql_msf_cut: the
    cut-property characterization via strictly-lighter-subgraph
    reachability in one recursive CTE) — two algorithms, one hash.

    r4 round-fusion (VERDICT r3 #5): the contraction operates on the
    POINTER GRAPH, whose size is the component count — at most the
    node count and halving per round — NOT the edge count.  When the
    graph has at most ``driver_merge_max`` nodes (default 2^17 — sized to
    the measured ~200 B/driver-Row overhead, a few tens of MB; for
    grid-cell callers the node set is grid-bounded — z5 is ≤32×32 cells
    at ANY data scale, passed via ``nodes_hint``), the
    per-round pipeline collapses to TWO jobs: one distributed
    min_by-per-component aggregation whose ≤#components-row result is
    collected, and one broadcast relabel+checkpoint of the (shrinking)
    component-endpoint edge list; the union-find contraction runs on
    the driver over the collected pointer rows.  Each round's work over
    EDGES (the data-scale side) stays fully distributed — only
    component bookkeeping rides the driver, exactly the documented
    bounded-driver-merge trade.  Graphs above the bound take the
    original all-distributed path (cc_star contraction per round)."""
    ecols = edges.select("a", "b", "dcnt", "wkey")
    if ecols.sparkSession.conf.get("spark.osmgraft.msf.forceDistributed", "0") != "1":
        # pin the edge derivation ONCE — the size gate and every later
        # consumer (fused or legacy) re-scan materialized rows instead of
        # re-running the upstream adjacency build per reference
        ecols = ecols.localCheckpoint()
        # strategy gate only — both paths compute the identical MSF, so an
        # approximate count is safe. nodes_hint (a caller-known static
        # bound, e.g. ≤32·32 cells for the z5 grid) skips the counting job
        # entirely; otherwise ONE approx_count_distinct agg (sketch,
        # map-side partial — no exact-distinct shuffle) with a 20 % safety
        # margin against its ~5 % rsd. (r4 ADVICE: the former exact
        # distinct().count() was a full extra pass + shuffle paid even by
        # graphs that then took the distributed path.)
        if nodes_hint is not None:
            nodes_cnt = nodes_hint
            fused_ok = nodes_cnt <= driver_merge_max
        else:
            nodes_cnt = (
                ecols.select(F.col("a").alias("node"))
                .unionAll(ecols.select(F.col("b").alias("node")))
                .agg(F.approx_count_distinct("node").alias("n"))
                .collect()[0]["n"]
            )
            fused_ok = nodes_cnt <= int(driver_merge_max * 0.8)
        if fused_ok:
            return _boruvka_msf_fused(ecols, max_rounds)
    nodes = (
        ecols.select(F.col("a").alias("node"))
        .unionAll(ecols.select(F.col("b").alias("node")))
        .distinct()
    )
    comp = nodes.select("node", F.col("node").alias("comp")).localCheckpoint()
    picked = None
    for _ in range(max_rounds):
        ca = comp.select(F.col("node").alias("a"), F.col("comp").alias("ca"))
        cb = comp.select(F.col("node").alias("b"), F.col("comp").alias("cb"))
        e2 = ecols.join(ca, "a").join(cb, "b").where(F.col("ca") != F.col("cb"))
        cand = e2.select(
            F.col("ca").alias("c"), F.col("cb").alias("d"), "a", "b", "dcnt", "wkey"
        ).unionAll(
            e2.select(
                F.col("cb").alias("c"), F.col("ca").alias("d"), "a", "b", "dcnt", "wkey"
            )
        )
        chosen = (
            cand.groupBy("c")
            .agg(F.min(F.struct("wkey", "d", "a", "b", "dcnt")).alias("m"))
            .select(
                "c",
                F.col("m.d").alias("d"),
                F.col("m.a").alias("a"),
                F.col("m.b").alias("b"),
                F.col("m.dcnt").alias("dcnt"),
                F.col("m.wkey").alias("wkey"),
            )
            .localCheckpoint()
        )
        if chosen.limit(1).count() == 0:
            break
        new_e = chosen.select("a", "b", "dcnt", "wkey").distinct()
        picked = new_e if picked is None else picked.unionAll(new_e)
        # contraction: merged groups = connected components of the chosen
        # pointer graph (each comp has out-degree exactly 1; with distinct
        # weights its only cycles are mutual 2-cycles) — cc_star flattens
        # chains in O(log) star rounds, materializing each step, so no
        # exponentially-deep self-join plan is ever built
        labels = cc_star(
            chosen.select(F.col("c").alias("u"), F.col("d").alias("v"))
        )
        comp = (
            comp.join(
                labels.select(F.col("id").alias("comp"), F.col("comp").alias("newc")),
                "comp",
                "left",
            )
            .select("node", F.coalesce("newc", F.col("comp")).alias("comp"))
            .localCheckpoint()
        )
    if picked is None:
        return ecols.limit(0)
    return picked.distinct()


def _boruvka_msf_fused(ecols: DataFrame, max_rounds: int) -> DataFrame:
    """Fused small-node-set Borůvka body (see :func:`boruvka_msf`): per
    round ONE distributed min_by-per-component aggregation (collected —
    ≤ #components rows, under the caller's driver_merge_max gate) and ONE
    broadcast relabel + checkpoint of the component-endpoint edge list;
    contraction is a driver union-find over the collected pointer rows.
    The MSF is unique under distinct wkey, so the fused and distributed
    paths emit the identical edge set (property-tested both ways)."""
    spark = ecols.sparkSession
    # component-endpoint edges; original (a, b, dcnt, wkey) ride as payload
    # (caller already pinned ecols — this projection re-scans materialized
    # rows only)
    ce = ecols.select(
        F.col("a").alias("u"), F.col("b").alias("v"), "a", "b", "dcnt", "wkey"
    )
    picked: dict = {}
    for _ in range(max_rounds):
        cand = ce.select(
            F.col("u").alias("c"), F.col("v").alias("d"), "a", "b", "dcnt", "wkey"
        ).unionAll(
            ce.select(
                F.col("v").alias("c"), F.col("u").alias("d"), "a", "b", "dcnt", "wkey"
            )
        )
        chosen = (
            cand.groupBy("c")
            .agg(F.min(F.struct("wkey", "d", "a", "b", "dcnt")).alias("m"))
            .select(
                "c",
                F.col("m.d").alias("d"),
                F.col("m.a").alias("a"),
                F.col("m.b").alias("b"),
                F.col("m.dcnt").alias("dcnt"),
                F.col("m.wkey").alias("wkey"),
            )
            .collect()  # ≤ #components rows — the gated driver merge
        )
        if not chosen:
            break
        parent: dict = {}

        def find(x):
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != r:
                parent[x], x = r, parent[x]
            return r

        for row in chosen:
            picked[row.wkey] = (row.a, row.b, row.dcnt, row.wkey)
            ru, rv = find(row.c), find(row.d)
            if ru != rv:
                if ru < rv:
                    parent[rv] = ru
                else:
                    parent[ru] = rv
        labels = [(x, find(x)) for x in parent]
        lbl = spark.createDataFrame(labels, "old long, new long")
        ce = (
            ce.join(
                F.broadcast(lbl.select(F.col("old").alias("u"), F.col("new").alias("nu"))),
                "u",
                "left",
            )
            .join(
                F.broadcast(lbl.select(F.col("old").alias("v"), F.col("new").alias("nv"))),
                "v",
                "left",
            )
            .select(
                F.coalesce("nu", F.col("u")).alias("u"),
                F.coalesce("nv", F.col("v")).alias("v"),
                "a",
                "b",
                "dcnt",
                "wkey",
            )
            .where(F.col("u") != F.col("v"))
            .localCheckpoint()
        )
    if not picked:
        return ecols.limit(0)
    return spark.createDataFrame(list(picked.values()), ecols.schema)


def sql_msf_cut(adj_sql: str) -> str:
    """DuckDB twin of :func:`boruvka_msf` by the CUT PROPERTY instead of
    Borůvka rounds: with distinct weights, edge e = (u, v, w) is in the
    MSF iff v is NOT reachable from u through strictly-lighter edges —
    one recursive CTE computes, for every edge at once, the
    lighter-subgraph reachable set of its left endpoint (state rows
    (eid, node), eid doubling as the weight threshold), and an anti-
    EXISTS keeps exactly the unique MSF.  Two genuinely different
    algorithms, one hash."""
    return f"""WITH RECURSIVE msf_adj AS ({adj_sql}),
msf_dirs AS (
  SELECT a, b, wkey FROM msf_adj
  UNION ALL SELECT b, a, wkey FROM msf_adj),
msf_rch(eid, node) AS (
  SELECT wkey, a FROM msf_adj
  UNION
  SELECT r.eid, d.b
  FROM msf_rch r JOIN msf_dirs d ON d.a = r.node
  WHERE d.wkey < r.eid
)
SELECT e.a, e.b, e.dcnt, e.wkey
FROM msf_adj e
WHERE NOT EXISTS (
  SELECT 1 FROM msf_rch WHERE eid = e.wkey AND node = e.b)"""


def ktruss(edges: DataFrame, k: int = 4, max_rounds: int = 6) -> DataFrame:
    """k-truss decomposition at fixed k (Cohen 2008 — the edge-cohesion
    refinement of k-core): the maximal subgraph in which EVERY edge
    closes at least k−2 triangles *within the subgraph*, computed by the
    standard support-peel fixed point — per round, enumerate oriented
    triangles (a < b < c — the degree-bounded orientation that caps
    skew), count per-edge support, drop edges below k−2, repeat.
    Peeling is monotone, so extra rounds past convergence are no-ops;
    ``max_rounds`` is a pinned bound shared with the DuckDB twin (the
    same peel unrolled as chained CTEs) and convergence-at-bound is
    pytest-pinned.  Emits the surviving edges (a, b, support) with
    support recomputed at the fixed point — exact integers, engine- and
    partitioning-independent.

    100 TB, per round: one wedge self-join + one closing equi-join
    (triangle kernel) + a map-side-combinable count + an anti-ish
    semi-join filter; localCheckpoint caps lineage; early exit on an
    unchanged edge count."""
    cur = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint()
    )
    n_prev = cur.count()
    out = cur.select("a", "b", F.lit(0).cast("long").alias("support")).limit(0)
    for _ in range(max_rounds):
        e1 = cur.select(F.col("a").alias("x"), F.col("b").alias("y"))
        e2 = cur.select(F.col("a").alias("x"), F.col("b").alias("z"))
        e3 = cur.select(F.col("a").alias("y"), F.col("b").alias("z"))
        tri = (
            e1.join(e2, "x")
            .where(F.col("z") > F.col("y"))
            .join(e3, ["y", "z"])
        )  # (x, y, z) with x < y < z, all three edges present
        sup = (
            tri.select(F.col("x").alias("a"), F.col("y").alias("b"))
            .unionAll(tri.select(F.col("x").alias("a"), F.col("z").alias("b")))
            .unionAll(tri.select(F.col("y").alias("a"), F.col("z").alias("b")))
            .groupBy("a", "b")
            .agg(F.count(F.lit(1)).cast("long").alias("support"))
        )
        nxt = (
            cur.join(sup, ["a", "b"], "left")
            .select(
                "a", "b", F.coalesce("support", F.lit(0).cast("long")).alias("support")
            )
            .where(F.col("support") >= k - 2)
            .localCheckpoint()
        )
        out = nxt
        n_now = nxt.count()
        cur = nxt.select("a", "b")
        if n_now == n_prev:
            break
        n_prev = n_now
    return out


def sql_ktruss(edges_sql: str, k: int = 4, rounds: int = 6) -> str:
    """DuckDB twin of :func:`ktruss` — the identical support-peel
    unrolled as ``rounds`` chained CTE stages."""
    parts = [
        f"""kt_e0 AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM ({edges_sql}) WHERE src <> dst)"""
    ]
    # kt_e{r} is referenced 4× and kt_t{r} 3× per round — plain CTEs would
    # re-inline ~4^rounds times (the kcore lesson), so both are MATERIALIZED
    for r in range(rounds):
        parts.append(
            f"""kt_t{r} AS MATERIALIZED (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM kt_e{r} e1
  JOIN kt_e{r} e2 ON e2.a = e1.a AND e2.b > e1.b
  JOIN kt_e{r} e3 ON e3.a = e1.b AND e3.b = e2.b),
kt_s{r} AS (
  SELECT a, b, CAST(count(*) AS BIGINT) AS support FROM (
    SELECT x AS a, y AS b FROM kt_t{r}
    UNION ALL SELECT x, z FROM kt_t{r}
    UNION ALL SELECT y, z FROM kt_t{r})
  GROUP BY 1, 2),
kt_e{r + 1} AS MATERIALIZED (
  SELECT e.a, e.b, s.support
  FROM kt_e{r} e JOIN kt_s{r} s ON s.a = e.a AND s.b = e.b
  WHERE s.support >= {k - 2})"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT a, b, support FROM kt_e{rounds}"
    )


def personalized_pagerank(
    edges: DataFrame, seeds: list[int], iters: int = 4, checkpoint_every: int = 4
) -> DataFrame:
    """Personalized PageRank / random walk with restart (Haveliwala WWW
    2002 — the candidate-generation staple of modern recommenders):
    identical integer fixed-point recurrence to :func:`pagerank` except
    the teleport mass lands ONLY on the seed set:

        r_0(v)     = SCALE·[v ∈ S]
        r_{t+1}(v) = [v ∈ S]·(15·SCALE div 100)
                     + (85 · Σ_{u→v} (r_t(u) div outdeg(u))) div 100

    so scores measure proximity to the seeds, not global centrality.
    Same Pregel shape, same float-free gate discipline (the twin
    unrolls the recurrence as chained CTEs with the same seed
    predicate).  Returns (node_id, rank_fx).  Edges/nodes are pinned up
    front like :func:`pagerank` (un-materialized upstreams re-execute
    O(iters) times otherwise)."""
    seed_set = sorted(set(int(s) for s in seeds))
    edges = edges.select("src", "dst").localCheckpoint()
    nodes = (
        edges.select(F.col("src").alias("node_id"))
        .unionByName(edges.select(F.col("dst").alias("node_id")))
        .distinct()
        .localCheckpoint()
    )
    is_seed = F.col("node_id").isin(seed_set)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    ranks = nodes.withColumn(
        "rank_fx", F.when(is_seed, F.lit(SCALE)).otherwise(F.lit(0)).cast("long")
    )
    for t in range(iters):
        contrib = (
            edges.join(ranks, edges.src == ranks.node_id)
            .join(deg, "src")
            .select("dst", F.expr("rank_fx div outdeg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("in_sum"))
        )
        ranks = nodes.join(
            contrib, nodes.node_id == contrib.dst, "left"
        ).select(
            "node_id",
            (
                F.when(is_seed, F.lit(_BASE)).otherwise(F.lit(0))
                + F.expr("(85 * coalesce(in_sum, 0)) div 100")
            )
            .cast("long")
            .alias("rank_fx"),
        )
        if (t + 1) % checkpoint_every == 0 and t + 1 < iters:
            ranks = ranks.localCheckpoint()
    return ranks


def sql_personalized_pagerank(
    edges_sql: str, seeds: list[int], iters: int = 4
) -> str:
    """DuckDB twin: the seeded recurrence unrolled into chained CTEs."""
    seed_list = ", ".join(str(int(s)) for s in sorted(set(seeds)))
    parts = [
        f"edges AS ({edges_sql})",
        "nodes AS (SELECT DISTINCT src AS node_id FROM edges"
        " UNION SELECT DISTINCT dst FROM edges)",
        "deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src)",
        f"""p0 AS (SELECT node_id,
  CAST(CASE WHEN node_id IN ({seed_list}) THEN {SCALE} ELSE 0 END AS BIGINT)
    AS rank_fx FROM nodes)""",
    ]
    for t in range(iters):
        parts.append(
            f"""pc{t} AS (
  SELECT e.dst, sum(r.rank_fx // d.outdeg) AS in_sum
  FROM edges e JOIN p{t} r ON e.src = r.node_id JOIN deg d ON e.src = d.src
  GROUP BY e.dst
),
p{t + 1} AS (
  SELECT n.node_id,
         CAST(CASE WHEN n.node_id IN ({seed_list}) THEN {_BASE} ELSE 0 END
              + (85 * coalesce(c.in_sum, 0)) // 100 AS BIGINT) AS rank_fx
  FROM nodes n LEFT JOIN pc{t} c ON n.node_id = c.dst
)"""
        )
    return (
        "WITH " + ",\n".join(parts) + f"\nSELECT node_id, rank_fx FROM p{iters}"
    )


def harmonic_centrality(
    edges: DataFrame, sources: list[int], rounds: int = 6
) -> DataFrame:
    """Harmonic centrality of a pinned source set (Boldi & Vigna 2014 —
    the centrality that behaves on disconnected graphs, where closeness
    breaks): per source s, H(s) = Σ_{v≠s} 1/d(s, v) over nodes reached
    within ``rounds`` hops, carried EXACTLY as Σ 60/d (60 = lcm(1..6),
    so every reciprocal is an integer — no floats, no rationals left
    unreduced).  Distances are per-(source, node) keyed Bellman-Ford
    relaxations of the hop metric (min-plus with unit weights), the
    shortest_paths recurrence with the source id threaded through.
    Emits (source, n_reached, h60) — h60 div 60 is the conventional
    value; the remainder keeps the gate exact.

    100 TB: per round one equi-join on node + min agg keyed by
    (source, node) — the frontier is |sources|× the sssp shape."""
    spark = edges.sparkSession
    e = edges.select("src", "dst").localCheckpoint(eager=True)
    dist = spark.createDataFrame(
        [(int(s), int(s), 0) for s in sources], "source long, node_id long, d long"
    )
    for _ in range(rounds):
        cand = e.join(dist, e.src == dist.node_id).select(
            "source", F.col("dst").alias("node_id"), (F.col("d") + 1).alias("d")
        )
        dist = (
            dist.unionByName(cand)
            .groupBy("source", "node_id")
            .agg(F.min("d").alias("d"))
            .localCheckpoint()
        )
    reached = dist.filter(F.col("d") > 0)
    return reached.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_reached"),
        F.sum(F.expr("60 div d")).cast("long").alias("h60"),
    )


def sql_harmonic_centrality(
    edges_sql: str, sources: list[int], rounds: int = 6
) -> str:
    """DuckDB twin: the keyed min-plus recurrence unrolled."""
    src_vals = ", ".join(f"({int(s)})" for s in sources)
    parts = [
        f"hc_e AS ({edges_sql})",
        f"hc_d0 AS (SELECT node_id AS source, node_id, CAST(0 AS BIGINT) AS d"
        f" FROM (VALUES {src_vals}) s(node_id))",
    ]
    for t in range(rounds):
        parts.append(
            f"""hc_d{t + 1} AS (
  SELECT source, node_id, min(d) AS d FROM (
    SELECT source, node_id, d FROM hc_d{t}
    UNION ALL
    SELECT x.source, e.dst AS node_id, x.d + 1 AS d
    FROM hc_e e JOIN hc_d{t} x ON e.src = x.node_id
  ) GROUP BY 1, 2
)"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT source, CAST(count(*) AS BIGINT) AS n_reached,
       CAST(sum(60 // d) AS BIGINT) AS h60
FROM hc_d{rounds} WHERE d > 0 GROUP BY 1"""
    )
