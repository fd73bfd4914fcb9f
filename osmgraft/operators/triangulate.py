"""Polygon tessellation: ear-clipping triangulation of simple rings.

The fill-rendering / mesh-export primitive the tile suite still lacked
(MVT polygon fills, terrain meshes, area analytics all consume triangle
fans): every simple ring with nonzero area is cut into exactly n−2
triangles by the classic TWO-EARS algorithm (Meisters 1975; the textbook
O(n³) formulation — rings here are bounded, ≤ a dozen vertices, so the
cubic constant is irrelevant and EXACTNESS is everything).

Shared rule (both engines, verbatim):
  * normalize: reverse the vertex list when the shoelace doubled area is
    negative; skip zero-area rings.
  * scan current ring positions 1..m in order; position j is an EAR iff
    cross(prev, cur, next) > 0 (strictly convex, int64) AND no OTHER
    remaining vertex (by POSITION, so duplicate coordinates block) lies in
    the CLOSED triangle (three ≥ 0 sign tests against the CCW corner).
  * clip the FIRST ear, emit (prev, cur, next), repeat.  If no ear exists
    (non-simple leftovers slipping past the gate) the ring STOPS — both
    engines stall identically, the hash still pins behavior.

Spark runs the loop VECTORIZED ACROSS RINGS (mapInArrow: padded (k, n)
int64 coordinate matrices, one masked numpy sweep per clip step — no
per-ring Python); the DuckDB twin is a recursive CTE whose state is the
remaining ring as a LIST, the ear search a list_transform + list_position
over the same predicates.  Simplicity is pre-gated by the SAME exact
predicate both engines already share (operators/crossings
.ring_self_crossings; the reference's area/ring machinery is the
semantic ancestor — osmio osm_obj.rs Way::is_closed + area conventions).

Scale shape: the simplicity gate is one bounded pair join per ring, the
collapse one hash agg; the clip kernel is map-only over one row per ring.
Ring size is capped by construction — at 10^12 rows everything is
embarrassingly parallel with no shuffle after the collapse.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def two_chain_ring(
    points: DataFrame, ring: str = "ring_id", x: str = "x", y: str = "y"
) -> DataFrame:
    """Order an unordered point set into a SIMPLE polygon ring (ring_id,
    seq, x, y) by the two-chain construction: anchor = lexicographic min,
    far = lexicographic max, points on-or-below the anchor→far line walk
    left→right, points strictly above walk right→left.  Weakly-monotone
    chains cannot properly self-cross and each chain stays in its closed
    half-plane, so the ring is simple whenever the points are not all
    collinear — an exact-integer "polygonization" both engines spell
    identically (no angles, no trig)."""
    p = points.select(
        F.col(ring).alias("ring_id"),
        F.col(x).cast("long").alias("x"),
        F.col(y).cast("long").alias("y"),
    ).distinct()
    wa = (
        Window.partitionBy("ring_id")
        .orderBy(F.asc("x"), F.asc("y"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    wd = (
        Window.partitionBy("ring_id")
        .orderBy(F.desc("x"), F.desc("y"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    p = p.select(
        "ring_id",
        "x",
        "y",
        F.first("x").over(wa).alias("ax0"),
        F.first("y").over(wa).alias("ay0"),
        F.first("x").over(wd).alias("fx0"),
        F.first("y").over(wd).alias("fy0"),
    )
    side = (F.col("fx0") - F.col("ax0")) * (F.col("y") - F.col("ay0")) - (
        F.col("fy0") - F.col("ay0")
    ) * (F.col("x") - F.col("ax0"))
    chain = (
        F.when((F.col("x") == F.col("ax0")) & (F.col("y") == F.col("ay0")), 0)
        .when((F.col("x") == F.col("fx0")) & (F.col("y") == F.col("fy0")), 2)
        .when(side <= 0, 1)
        .otherwise(3)
    )
    p = p.select("ring_id", "x", "y", chain.alias("chain"))
    kx = F.when(F.col("chain") == 3, -F.col("x")).otherwise(F.col("x"))
    ky = F.when(F.col("chain") == 3, -F.col("y")).otherwise(F.col("y"))
    seq = F.row_number().over(
        Window.partitionBy("ring_id").orderBy("chain", kx.alias("kx"), ky.alias("ky"))
    )
    return p.select("ring_id", seq.alias("seq"), "x", "y")


def _padded(col: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Arrow list<int64> -> (padded (k, n_max) int64 matrix, lengths) with
    vectorized offset arithmetic (pad = repeated last element, masked by
    callers)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.values.to_numpy(zero_copy_only=False).astype(np.int64)
    off = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    lens = np.diff(off)
    nm = int(lens.max()) if len(lens) else 0
    idx = off[:-1, None] + np.minimum(
        np.arange(max(nm, 1))[None, :], np.maximum(lens[:, None] - 1, 0)
    )
    return flat[idx], lens


def _cross(ox, oy, ax, ay, bx, by):
    return (ax - ox) * (by - oy) - (ay - oy) * (bx - ox)


def _earclip_np(ids, X, Y, m):
    """One masked numpy sweep per clip step, all rings advanced together."""
    k, nm = X.shape
    pos = np.broadcast_to(np.arange(nm)[None, :], (k, nm))
    mm = np.maximum(m, 1)[:, None]
    valid = pos < m[:, None]
    nxt = (pos + 1) % mm
    xn = np.take_along_axis(X, nxt, 1)
    yn = np.take_along_axis(Y, nxt, 1)
    two_a = ((X * yn - xn * Y) * valid).sum(1)
    rev = two_a < 0
    if rev.any():
        src = np.where(valid, np.maximum(m[:, None] - 1 - pos, 0), pos)
        X = np.where(rev[:, None], np.take_along_axis(X, src, 1), X)
        Y = np.where(rev[:, None], np.take_along_axis(Y, src, 1), Y)
    m = np.where(two_a == 0, 0, m).astype(np.int64)
    cnt = np.zeros(k, np.int64)
    cols = {c: [] for c in ("rid", "tri", "ax", "ay", "bx", "by", "cx", "cy")}
    while True:
        act = m >= 3
        if not act.any():
            break
        mm = np.maximum(m, 1)[:, None]
        vj = (pos < m[:, None]) & act[:, None]
        pj = (pos - 1) % mm
        nj = (pos + 1) % mm
        px = np.take_along_axis(X, pj, 1)
        py = np.take_along_axis(Y, pj, 1)
        nx = np.take_along_axis(X, nj, 1)
        ny = np.take_along_axis(Y, nj, 1)
        convex = _cross(px, py, X, Y, nx, ny) > 0
        ll = np.arange(nm)[None, None, :]
        qx, qy = X[:, None, :], Y[:, None, :]
        vl = (
            (ll < m[:, None, None])
            & (ll != pos[:, :, None])
            & (ll != pj[:, :, None])
            & (ll != nj[:, :, None])
        )
        p3x, p3y = px[:, :, None], py[:, :, None]
        c3x, c3y = X[:, :, None], Y[:, :, None]
        n3x, n3y = nx[:, :, None], ny[:, :, None]
        inside = (
            (_cross(p3x, p3y, c3x, c3y, qx, qy) >= 0)
            & (_cross(c3x, c3y, n3x, n3y, qx, qy) >= 0)
            & (_cross(n3x, n3y, p3x, p3y, qx, qy) >= 0)
            & vl
        )
        ear = convex & ~inside.any(2) & vj
        has = ear.any(1)
        jstar = ear.argmax(1)
        emit = act & has
        if emit.any():
            e = np.nonzero(emit)[0]
            js = jstar[e]
            cnt[e] += 1
            cols["rid"].append(ids[e])
            cols["tri"].append(cnt[e].copy())
            cols["ax"].append(px[e, js])
            cols["ay"].append(py[e, js])
            cols["bx"].append(X[e, js])
            cols["by"].append(Y[e, js])
            cols["cx"].append(nx[e, js])
            cols["cy"].append(ny[e, js])
            shift = (pos >= jstar[:, None]).astype(np.int64)
            src = np.minimum(pos + shift, nm - 1)
            X = np.where(emit[:, None], np.take_along_axis(X, src, 1), X)
            Y = np.where(emit[:, None], np.take_along_axis(Y, src, 1), Y)
            m = m - emit.astype(np.int64)
        m = np.where(act & ~has, 0, m)
    if not cols["rid"]:
        return [np.array([], dtype=np.int64)] * 8
    return [np.concatenate(cols[c]).astype(np.int64) for c in cols]


def triangulate_rings(verts: DataFrame) -> DataFrame:
    """(ring_id, seq, x, y) ordered rings -> (ring_id, tri, ax..cy) CCW
    triangles, simplicity-gated by the shared exact crossing predicate.
    See module docstring for the rule; the unit-tested invariants are
    n−2 triangles per simple ring, doubled triangle areas all positive
    and summing to |shoelace| of the ring."""
    from osmgraft.operators.crossings import ring_self_crossings

    simple = (
        ring_self_crossings(verts, "ring_id", "seq", "x", "y")
        .filter(F.col("is_simple"))
        .select("ring_id")
    )
    arr = (
        verts.join(simple, "ring_id", "left_semi")
        .groupBy("ring_id")
        .agg(F.sort_array(F.collect_list(F.struct("seq", "x", "y"))).alias("p"))
        .select(
            "ring_id",
            F.transform("p", lambda q: q["x"].cast("long")).alias("xs"),
            F.transform("p", lambda q: q["y"].cast("long")).alias("ys"),
        )
    )

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        names = ["ring_id", "tri", "ax", "ay", "bx", "by", "cx", "cy"]
        for rb in batches:
            if rb.num_rows == 0:
                continue
            ids = rb.column("ring_id").to_numpy(zero_copy_only=False).astype(np.int64)
            X, lx = _padded(rb.column("xs"))
            Y, _ = _padded(rb.column("ys"))
            out = _earclip_np(ids, X, Y, lx.astype(np.int64))
            yield pa.RecordBatch.from_arrays([pa.array(c) for c in out], names)

    return arr.mapInArrow(
        kernel,
        "ring_id long, tri long, ax long, ay long, bx long, by long, cx long, cy long",
    )


def sql_two_chain_ring(points_cte: str) -> str:
    """DuckDB twin of two_chain_ring over a (ring_id, x, y) CTE body —
    returns a CTE CHAIN string ending with a ``ring`` relation
    (ring_id, seq, x, y)."""
    return f"""tpts0 AS ({points_cte}),
tpts AS (SELECT DISTINCT ring_id, CAST(x AS BIGINT) AS x, CAST(y AS BIGINT) AS y FROM tpts0),
tanch AS (
  SELECT ring_id, x, y,
         first_value(x) OVER wasc AS ax0, first_value(y) OVER wasc AS ay0,
         first_value(x) OVER wdesc AS fx0, first_value(y) OVER wdesc AS fy0
  FROM tpts
  WINDOW wasc AS (PARTITION BY ring_id ORDER BY x, y
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),
         wdesc AS (PARTITION BY ring_id ORDER BY x DESC, y DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)),
tch AS (
  SELECT ring_id, x, y,
         CASE WHEN x = ax0 AND y = ay0 THEN 0
              WHEN x = fx0 AND y = fy0 THEN 2
              WHEN (fx0 - ax0) * (y - ay0) - (fy0 - ay0) * (x - ax0) <= 0 THEN 1
              ELSE 3 END AS chain
  FROM tanch),
ring AS (
  SELECT ring_id, x, y,
         row_number() OVER (PARTITION BY ring_id
           ORDER BY chain, CASE WHEN chain = 3 THEN -x ELSE x END,
                    CASE WHEN chain = 3 THEN -y ELSE y END) AS seq
  FROM tch)"""


def sql_triangulate_rings(points_cte: str) -> str:
    """DuckDB twin: two-chain ring + simplicity gate + recursive-CTE ear
    clipping with the ring carried as a LIST — same normalization, same
    first-ear scan, same closed-triangle blocking, same stall rule."""
    from osmgraft.operators.crossings import sql_ring_self_crossings

    def pt(i: str) -> str:
        return f"rem[CAST({i} AS INTEGER)]"

    p_i = "1 + ((j + len(rem) - 2) % len(rem))"
    n_i = "1 + (j % len(rem))"
    P, C, N, Q = pt(p_i), pt("j"), pt(n_i), pt("q")
    convex = f"(({C}.x - {P}.x) * ({N}.y - {C}.y) - ({C}.y - {P}.y) * ({N}.x - {C}.x)) > 0"
    s1 = f"(({C}.x - {P}.x) * ({Q}.y - {P}.y) - ({C}.y - {P}.y) * ({Q}.x - {P}.x)) >= 0"
    s2 = f"(({N}.x - {C}.x) * ({Q}.y - {C}.y) - ({N}.y - {C}.y) * ({Q}.x - {C}.x)) >= 0"
    s3 = f"(({P}.x - {N}.x) * ({Q}.y - {N}.y) - ({P}.y - {N}.y) * ({Q}.x - {N}.x)) >= 0"
    blocked = (
        f"list_aggregate(list_transform(range(1, len(rem) + 1), q -> "
        f"CASE WHEN q = j OR q = {p_i} OR q = {n_i} THEN 0 "
        f"WHEN {s1} AND {s2} AND {s3} THEN 1 ELSE 0 END), 'max') = 1"
    )
    shoelace = (
        "list_aggregate(list_transform(range(1, len(l) + 1), i -> "
        "l[CAST(i AS INTEGER)].x * l[CAST(1 + (i % len(l)) AS INTEGER)].y "
        "- l[CAST(1 + (i % len(l)) AS INTEGER)].x * l[CAST(i AS INTEGER)].y), 'sum')"
    )
    return f"""WITH RECURSIVE {sql_two_chain_ring(points_cte)},
tsimple AS (
  SELECT ring_id FROM (
    WITH {sql_ring_self_crossings("SELECT ring_id, seq, x, y FROM ring", "ring_id")}
  ) s WHERE is_simple),
tlists AS (
  SELECT ring_id, list(struct_pack(x := x, y := y) ORDER BY seq) AS l
  FROM ring WHERE ring_id IN (SELECT ring_id FROM tsimple)
  GROUP BY ring_id),
tnorm AS (
  SELECT ring_id, CASE WHEN twoa < 0 THEN list_reverse(l) ELSE l END AS rem
  FROM (SELECT ring_id, l, {shoelace} AS twoa FROM tlists)
  WHERE twoa != 0 AND len(l) >= 3),
tdp AS (
  SELECT ring_id, 0 AS tri, rem,
         CAST(NULL AS BIGINT) AS ax, CAST(NULL AS BIGINT) AS ay,
         CAST(NULL AS BIGINT) AS bx, CAST(NULL AS BIGINT) AS by,
         CAST(NULL AS BIGINT) AS cx, CAST(NULL AS BIGINT) AS cy
  FROM tnorm
  UNION ALL
  SELECT ring_id, tri + 1,
         list_concat(rem[1:e - 1], rem[e + 1:m]),
         rem[pi].x, rem[pi].y, rem[e].x, rem[e].y, rem[ni].x, rem[ni].y
  FROM (
    SELECT ring_id, tri, rem, m, e,
           CAST(1 + ((e + m - 2) % m) AS INTEGER) AS pi,
           CAST(1 + (e % m) AS INTEGER) AS ni
    FROM (
      SELECT ring_id, tri, rem, len(rem) AS m,
             CAST(list_position(list_transform(range(1, len(rem) + 1), j ->
               CASE WHEN ({convex}) AND NOT ({blocked}) THEN 1 ELSE 0 END),
               1) AS INTEGER) AS e
      FROM tdp WHERE len(rem) >= 3))
  WHERE e IS NOT NULL)
SELECT ring_id, CAST(tri AS BIGINT) AS tri, ax, ay, bx, by, cx, cy
FROM tdp WHERE tri >= 1"""
