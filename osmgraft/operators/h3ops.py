"""H3 hierarchy operators: compact / uncompact over Uber-compatible ids.

``compact_cells`` implements H3's public compactCells semantics (h3geo.org
API: replace every complete set of children with their parent, recursively)
and ``uncompact_cells`` its inverse (expand every cell to its descendants at
a target resolution). Pentagons have SIX children (the K-axis digit 1 is
deleted), hexagons seven — both the promotion threshold and the expansion
honor that, so pentagon regions compact/uncompact exactly.

Scale shape: one groupBy-count shuffle per resolution level for compact
(log-depth, level count <= 15, each level strictly smaller than the last);
uncompact is a generate-only explode (no shuffle). All cell math is pure
JVM Column bit arithmetic — no UDFs, whole-stage codegen end to end.

Id layout (h3real.py): mode bits 59+, res nibble bits 52-55, base cell bits
45-51, digit rl at bits 3*(15-rl); unused digits are 7.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osmgraft.functions.h3real import _PENT_CELLS

_RES_CLEAR = ~(0xF << 52)


def _res_of(cell):
    return F.shiftright(cell, 52).bitwiseAND(F.lit(0xF))


def _digit_shift(res: int) -> int:
    return 3 * (15 - res)


def _parent_expr(cell, res: int):
    """cellToParent(cell, res-1) for a cell of known resolution ``res``."""
    sh = _digit_shift(res)
    clear = _RES_CLEAR & ~(0x7 << sh)
    setb = ((res - 1) << 52) | (0x7 << sh)
    return cell.bitwiseAND(F.lit(clear)).bitwiseOR(F.lit(setb))


def _is_pentagon_expr(cell, res: int):
    """True iff a cell of known resolution ``res`` is a pentagon: pentagon
    base cell and all digits 1..res == 0 (digit mask below the res nibble)."""
    base = F.shiftright(cell, 45).bitwiseAND(F.lit(0x7F))
    mask = ((1 << (3 * res)) - 1) << _digit_shift(res) if res else 0
    zero = cell.bitwiseAND(F.lit(mask)) == F.lit(0)
    return base.isin([int(b) for b in _PENT_CELLS]) & zero


def compact_cells(
    df: DataFrame, res: int, min_res: int = 0, cell_col: str = "cell"
) -> DataFrame:
    """Compact a set of res-``res`` cells to mixed resolutions >= ``min_res``
    (H3 compactCells): every parent whose children are ALL present (7, or 6
    for pentagons) is promoted, cascading upward level by level.

    Input rows are deduplicated. Output schema: (cell long, res int) with
    mixed resolutions covering exactly the same area as the input."""
    if not 0 <= min_res <= res <= 15:
        raise ValueError("need 0 <= min_res <= res <= 15")
    cur = df.select(F.col(cell_col).alias("cell")).distinct()
    kept: list[DataFrame] = []
    for r in range(res, min_res, -1):
        # each level feeds TWO consumers (the full-parent aggregate and the
        # anti-join) and the next level builds on it — persist so the
        # upstream lineage (often an expensive encode/explode) runs once
        # per level instead of once per downstream branch
        with_par = cur.select(
            "cell", _parent_expr(F.col("cell"), r).alias("par")
        ).persist()
        expected = F.when(
            _is_pentagon_expr(F.col("par"), r - 1), F.lit(6)
        ).otherwise(F.lit(7))
        full = (
            with_par.groupBy("par")
            .agg(F.count(F.lit(1)).alias("n_children"))
            .where(F.col("n_children") == expected)
            .select("par")
        )
        kept.append(
            with_par.join(full, "par", "left_anti")
            .select("cell", F.lit(r).alias("res"))
        )
        cur = full.select(F.col("par").alias("cell"))
        # each level's survivors shrink by >=7x; Catalyst reuses the shuffle
        # output of with_par for both branches (same child plan)
    kept.append(cur.select("cell", F.lit(min_res).alias("res")))
    out = kept[0]
    for k in kept[1:]:
        out = out.unionByName(k)
    return out


def uncompact_cells(
    df: DataFrame, target_res: int, cell_col: str = "cell", min_res: int = 0
) -> DataFrame:
    """Expand every (possibly mixed-resolution) cell to ALL its descendants
    at ``target_res`` (H3 uncompactCells). Pentagon cells skip the deleted
    K-axis digit 1 at every level, so pentagon subtrees have 6-way fanout.

    Pure generate (explode of a 7-digit literal array + filter) per level —
    no shuffle; rows already at target_res pass through unchanged.
    ``min_res`` is a plan-size hint: levels below it are skipped (pass the
    coarsest resolution present in ``df`` when known)."""
    if not 0 <= min_res <= target_res <= 15:
        raise ValueError("need 0 <= min_res <= target_res <= 15")
    cur = df.select(F.col(cell_col).alias("cell"))
    for r in range(min_res, target_res):
        # BRANCH-FREE level step (round-3 perf fix): rows at res r explode
        # into their 7 (6 for pentagons) children, every other row emits a
        # single pass-through marker — one conditional explode instead of
        # an at_r/rest filter pair whose union re-evaluated the (often
        # UDF-expensive) upstream lineage once PER BRANCH PER LEVEL.
        sh = _digit_shift(r + 1)
        clear = _RES_CLEAR & ~(0x7 << sh)
        setb = (r + 1) << 52
        at_r = _res_of(F.col("cell")) == r
        digs = F.when(at_r, F.array([F.lit(d) for d in range(7)])).otherwise(
            F.array(F.lit(-1))
        )
        child = (
            F.col("cell")
            .bitwiseAND(F.lit(clear))
            .bitwiseOR(F.lit(setb))
            # cast BEFORE the shift: Java int shifts wrap mod 32, so an
            # IntegerType digit at sh >= 32 (child res <= 4) would land at
            # bit sh%32 and corrupt the id (review fix, repro in tests)
            .bitwiseOR(F.shiftleft(F.col("d").cast("long"), sh))
        )
        cur = (
            cur.select("cell", F.explode(digs).alias("d"))
            .where(
                (F.col("d") < 0)
                | ~(_is_pentagon_expr(F.col("cell"), r) & (F.col("d") == 1))
            )
            .select(
                F.when(F.col("d") < 0, F.col("cell")).otherwise(child).alias("cell")
            )
        )
    return cur


def h3_polyfill(boundaries: DataFrame, res: int) -> DataFrame:
    """polygonToCells over a boundary table: (boundary_id, cell) rows — every
    H3 cell at ``res`` whose center lies inside the boundary polygon
    (functions/h3real.polygon_to_cells, exact center-containment semantics).

    Scale shape: one applyInPandas group per polygon — fills are independent
    and embarrassingly parallel across boundaries; no shuffle beyond the
    boundary-id grouping of the (tiny) polygon table.  A continent-sized
    polygon at fine res is bounded by its own fill size, not by other
    polygons; split such a polygon's bbox into sub-rectangles upstream if a
    single fill exceeds task memory (the cells of a bbox-split union exactly
    to the full fill because membership is per-cell-center)."""
    import pandas as pd

    def fill(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        from osmgraft.functions.h3real import polygon_to_cells

        out_b, out_c = [], []
        for _, row in pdf.iterrows():  # one row per boundary (tiny table)
            ring = [(p["lat7"], p["lon7"]) for p in row["ring"]]
            holes = [[(p["lat7"], p["lon7"]) for p in hh] for hh in row["holes"]]
            cells = polygon_to_cells(ring, holes, res)
            out_b.append(np.full(len(cells), row["boundary_id"], dtype=np.int64))
            out_c.append(cells)
        if not out_b:
            return pd.DataFrame({"boundary_id": [], "cell": []}).astype("int64")
        return pd.DataFrame({
            "boundary_id": np.concatenate(out_b),
            "cell": np.concatenate(out_c),
        })

    return boundaries.groupBy("boundary_id").applyInPandas(
        fill, schema="boundary_id long, cell long"
    )


def h3_disk_smooth(cell_counts: DataFrame, k: int = 1) -> DataFrame:
    """Neighborhood aggregation over the H3 grid: for each occupied cell,
    the sum of counts over its gridDisk(k) (self included).  The spatial
    smoothing primitive (density surfaces, hot-spot detection) on real H3
    ids.

    Scale shape: the neighbor expansion runs on the DISTINCT cell table
    (orders of magnitude below row count), one vectorized pandas UDF emits
    each cell's disk as an array, explode + equi-join on cell id brings the
    counts, one groupBy re-aggregates.  No driver collect, no cartesian —
    shuffle volume is O(occupied_cells x disk_size)."""
    from pyspark.sql.functions import pandas_udf

    from osmgraft.functions.h3real import grid_disk

    @pandas_udf("array<long>")
    def _nbrs(cells: pd.Series) -> pd.Series:
        if len(cells) == 0:
            return pd.Series([], dtype="object")
        return pd.Series([
            [int(x) for x in d] for d in grid_disk(cells.to_numpy(), k)
        ])

    edges = cell_counts.select(
        "cell", F.explode(_nbrs(F.col("cell"))).alias("nb")
    )
    summed = (
        edges.join(
            cell_counts.select(F.col("cell").alias("nb"), F.col("cnt").alias("nb_cnt")),
            "nb",
        )
        .groupBy("cell")
        .agg(F.sum("nb_cnt").alias("disk_cnt"))
    )
    return cell_counts.join(summed, "cell")


def h3_boundaries(cells: DataFrame, cell_col: str = "cell") -> DataFrame:
    """Adds each HEXAGON cell's boundary as array<struct<lat7,lon7>>
    (fixed-point, 6 vertices + Class III icosahedron-edge distortion
    points) — the H3 raster↔vector bridge (cell sets become polygons that
    the tile-cover / PIP machinery consumes).  Pentagon rows raise, as
    functions/h3real.cell_to_boundary documents.  Scale: one vectorized-
    per-row pandas UDF over the distinct cell table (boundaries are cell
    metadata, not row data — compute once per cell, join back)."""
    from pyspark.sql.functions import pandas_udf

    from osmgraft.functions.h3real import cell_to_boundary

    @pandas_udf("array<struct<lat7: long, lon7: long>>")
    def _bnd(cs: pd.Series) -> pd.Series:
        out = []
        for c in cs:
            b = cell_to_boundary(int(c))
            out.append([
                {"lat7": int(round(la * 1e7)), "lon7": int(round(lo * 1e7))}
                for la, lo in b
            ])
        return pd.Series(out)

    return cells.withColumn("boundary", _bnd(F.col(cell_col)))


def h3_dissolve(cells: DataFrame, group_col: str = "boundary_id", cell_col: str = "cell") -> DataFrame:
    """Raster→vector DISSOLVE: per group, merge a set of H3 cells into the
    outer boundary polygon(s) of their union.  Shared edges between
    neighboring cells cancel EXACTLY — adjacent cells compute bitwise-equal
    vertex doubles (pinned in tests), so edge keys need no tolerance — and
    the surviving exterior edges stitch into closed rings with the
    multipolygon ring-walker.  Output: (group, ring_idx, n_verts,
    area2_fp — twice-shoelace on 1e-9-deg integer vertices, outer rings
    positive count toward holes by parity downstream if needed).

    Scale: one applyInPandas group per cell set (fills/regions are
    independent); inside a group the work is O(cells x 6) edge ops."""
    import pandas as pd

    def dissolve(pdf: pd.DataFrame) -> pd.DataFrame:
        from osmgraft.functions.h3real import cell_to_boundary
        from osmgraft.operators.multipolygon import _shoelace2, assemble_rings

        gid = pdf[group_col].iloc[0]
        edge_count: dict = {}
        edge_dir: dict = {}
        for c in pdf[cell_col]:
            b = cell_to_boundary(int(c))
            iv = [(int(round(la * 1e7)), int(round(lo * 1e7))) for la, lo in b]
            n = len(iv)
            for i in range(n):
                a, z = iv[i], iv[(i + 1) % n]
                key = (a, z) if a <= z else (z, a)
                edge_count[key] = edge_count.get(key, 0) + 1
                edge_dir[key] = (a, z)
        exterior = [edge_dir[k] for k, cnt in edge_count.items() if cnt == 1]
        rings = assemble_rings([(i, [a, z]) for i, (a, z) in enumerate(exterior)])
        rows = []
        for i, ring in enumerate(sorted(rings, key=lambda r: -abs(_shoelace2(r)))):
            rows.append((gid, i, len(ring), abs(_shoelace2(ring))))
        return pd.DataFrame(rows, columns=[group_col, "ring_idx", "n_verts", "area2_fp"])

    return cells.groupBy(group_col).applyInPandas(
        dissolve,
        schema=f"{group_col} long, ring_idx int, n_verts int, area2_fp long",
    )
