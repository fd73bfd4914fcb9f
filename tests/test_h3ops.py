"""H3 compact/uncompact operator semantics (H3 public compactCells /
uncompactCells behavior — pentagon-aware), against independent numpy-set
references constructed from the id bit layout."""

from __future__ import annotations

import numpy as np
import pytest

from osmgraft.functions import h3real as h
from osmgraft.operators.h3ops import compact_cells, uncompact_cells

pytestmark = pytest.mark.usefixtures("spark")


def _np_children(cell: int, child_res: int) -> list[int]:
    """Independent reference: all children of `cell` at child_res (one level
    down), pentagon K-digit skipped."""
    sh = 3 * (15 - child_res)
    stem = (cell & ~(0xF << 52) & ~(0x7 << sh)) | (child_res << 52)
    base = (cell >> 45) & 0x7F
    res = (cell >> 52) & 0xF
    digs_above = all(
        ((cell >> (3 * (15 - rl))) & 7) == 0 for rl in range(1, res + 1)
    )
    is_pent = base in h._PENT_CELLS and digs_above
    digits = (0, 2, 3, 4, 5, 6) if is_pent else (0, 1, 2, 3, 4, 5, 6)
    return [stem | (d << sh) for d in digits]


def _mk_df(spark, cells):
    return spark.createDataFrame([(int(c),) for c in cells], "cell long")


def test_compact_promotes_full_hex_parent(spark):
    lat = np.array([377752702]), np.array([-1224183072])
    parent = int(h.latlng_to_cell(*lat, 7)[0])
    kids = _np_children(parent, 8)
    assert len(kids) == 7
    got = compact_cells(_mk_df(spark, kids), res=8, min_res=7).collect()
    assert {(r.cell, r.res) for r in got} == {(parent, 7)}


def test_compact_partial_set_is_untouched(spark):
    parent = int(h.latlng_to_cell(np.array([488566000]), np.array([23522000]), 7)[0])
    kids = _np_children(parent, 8)[:-1]  # one child missing
    got = compact_cells(_mk_df(spark, kids), res=8, min_res=7).collect()
    assert {(r.cell, r.res) for r in got} == {(c, 8) for c in kids}


def test_compact_pentagon_six_children(spark):
    pent7 = (1 << 59) | (7 << 52) | (4 << 45) | int("7" * 8, 8)  # base 4, digits 0
    kids = _np_children(pent7, 8)
    assert len(kids) == 6
    got = compact_cells(_mk_df(spark, kids), res=8, min_res=7).collect()
    assert {(r.cell, r.res) for r in got} == {(pent7, 7)}
    # seven arbitrary hex children must NOT promote to a pentagon threshold:
    # six children of a HEX parent stay put
    hexp = int(h.latlng_to_cell(np.array([0]), np.array([0]), 7)[0])
    hkids = _np_children(hexp, 8)[:6]
    got2 = compact_cells(_mk_df(spark, hkids), res=8, min_res=7).collect()
    assert all(r.res == 8 for r in got2) and len(got2) == 6


def test_compact_cascades_two_levels(spark):
    parent = int(h.latlng_to_cell(np.array([-300000000]), np.array([900000000]), 5)[0])
    grandkids = [g for k in _np_children(parent, 6) for g in _np_children(k, 7)]
    got = compact_cells(_mk_df(spark, grandkids), res=7, min_res=5).collect()
    assert {(r.cell, r.res) for r in got} == {(parent, 5)}


def test_uncompact_matches_reference_and_roundtrips(spark):
    rng = np.random.default_rng(9)
    lat7 = rng.integers(-800_000_000, 800_000_001, 40, dtype=np.int64)
    lon7 = rng.integers(-1_800_000_000, 1_800_000_000, 40, dtype=np.int64)
    c5 = sorted({int(c) for c in h.latlng_to_cell(lat7, lon7, 5)})
    # include a pentagon subtree
    pent5 = (1 << 59) | (5 << 52) | (38 << 45) | int("7" * 10, 8)
    cells = c5 + [pent5]
    want = set(cells)
    for _ in range(2):  # expand 5 -> 7 with the reference
        want = {g for c in want for g in _np_children(c, ((c >> 52) & 0xF) + 1)}
    got = uncompact_cells(_mk_df(spark, cells), target_res=7).collect()
    got_set = {r.cell for r in got}
    assert got_set == want and len(got) == len(got_set)  # no dupes
    # roundtrip: compact(uncompact(S)) == S
    back = compact_cells(
        uncompact_cells(_mk_df(spark, cells), target_res=7), res=7, min_res=5
    ).collect()
    assert {r.cell for r in back} == set(cells)
    assert all(r.res == 5 for r in back)


def test_uncompact_mixed_resolution_input(spark):
    a7 = int(h.latlng_to_cell(np.array([100000000]), np.array([100000000]), 7)[0])
    b6 = int(h.latlng_to_cell(np.array([-100000000]), np.array([-100000000]), 6)[0])
    want = {a7}
    for c in _np_children(b6, 7):
        want.add(c)
    got = uncompact_cells(_mk_df(spark, [a7, b6]), target_res=7).collect()
    assert {r.cell for r in got} == want


def test_h3_polyfill_operator_matches_kernel(spark):
    """The applyInPandas operator emits exactly the per-polygon kernel fill."""
    import numpy as np

    from osmgraft.functions.h3real import polygon_to_cells
    from osmgraft.operators.h3ops import h3_polyfill
    from osmgraft.schema import ADMIN_BOUNDARY_SCHEMA
    from osmgraft.synth import COVER_BOUNDARIES

    rows = [
        (b["boundary_id"], b["name"],
         [{"lat7": p[0], "lon7": p[1]} for p in b["ring"]],
         [[{"lat7": p[0], "lon7": p[1]} for p in hh] for hh in b["holes"]],
         b["tags"])
        for b in COVER_BOUNDARIES
    ]
    got = {}
    for r in h3_polyfill(
        spark.createDataFrame(rows, ADMIN_BOUNDARY_SCHEMA), 4
    ).collect():
        got.setdefault(r.boundary_id, set()).add(r.cell)
    for b in COVER_BOUNDARIES:
        want = set(map(int, polygon_to_cells(b["ring"], b["holes"], 4)))
        assert got.get(b["boundary_id"], set()) == want, b["name"]


def test_h3_disk_smooth_matches_bruteforce(spark):
    """Distributed disk smoothing == a local dict-based twin over the same
    occupied-cell set."""
    import numpy as np
    from pyspark.sql import functions as F

    from osmgraft.functions.h3real import grid_disk, latlng_to_cell
    from osmgraft.operators.h3ops import h3_disk_smooth

    rng = np.random.default_rng(9)
    lat7 = (np.degrees(np.arcsin(rng.uniform(-1, 1, 4000))) * 1e7).astype(np.int64)
    lon7 = rng.integers(-1_800_000_000, 1_800_000_000, 4000)
    cells, cnts = np.unique(latlng_to_cell(lat7, lon7, 5), return_counts=True)
    df = spark.createDataFrame(
        [(int(c), int(n)) for c, n in zip(cells, cnts)], "cell long, cnt long"
    )
    got = {r.cell: r.disk_cnt for r in h3_disk_smooth(df, k=1).collect()}
    counts = dict(zip(map(int, cells), map(int, cnts)))
    want = {
        int(c): sum(counts.get(int(nb), 0) for nb in d)
        for c, d in zip(cells, grid_disk(cells, 1))
    }
    assert got == want


def test_h3_boundaries_operator(spark):
    import numpy as np

    from osmgraft.functions.h3real import cell_to_boundary, latlng_to_cell
    from osmgraft.operators.h3ops import h3_boundaries

    rng = np.random.default_rng(31)
    lat7 = rng.integers(-800_000_000, 800_000_001, 200)
    lon7 = rng.integers(-1_800_000_000, 1_800_000_000, 200)
    cells = np.unique(latlng_to_cell(lat7, lon7, 7))[:50]
    df = spark.createDataFrame([(int(c),) for c in cells], "cell long")
    got = {r.cell: r.boundary for r in h3_boundaries(df).collect()}
    for c in cells:
        want = cell_to_boundary(int(c))
        assert len(got[int(c)]) == len(want)
        for p, (la, lo) in zip(got[int(c)], want):
            assert p["lat7"] == int(round(la * 1e7))
            assert p["lon7"] == int(round(lo * 1e7))


def test_uncompact_coarse_levels_distinct_children(spark):
    """Review regression: Java int shifts wrap mod 32, so an un-cast digit
    column corrupted child ids whenever child res <= 4 (7 duplicate rows
    instead of 7 distinct children)."""
    import numpy as np

    from osmgraft.functions.h3real import get_resolution, latlng_to_cell, to_parent
    from osmgraft.operators.h3ops import compact_cells, uncompact_cells

    base = int(latlng_to_cell(np.array([100000000]), np.array([200000000]), 0)[0])
    df = spark.createDataFrame([(base,)], "cell long")
    kids = [r.cell for r in uncompact_cells(df, target_res=1).collect()]
    assert len(kids) == len(set(kids)) == 7
    assert all(int(get_resolution(np.array([k]))[0]) == 1 for k in kids)
    assert all(int(to_parent(np.array([k]), 0)[0]) == base for k in kids)
    # full coarse cascade roundtrip: res 0 -> 3 -> compact back to one cell
    expanded = uncompact_cells(df, target_res=3)
    back = compact_cells(expanded, res=3, min_res=0).collect()
    assert len(back) == 1 and back[0].cell == base and back[0].res == 0


def test_h3_dissolve_flower_donut_and_region(spark):
    """Raster->vector dissolve: (a) 7-cell flower -> one 18-vertex ring
    whose exact integer area equals the sum of the cell areas (shared-edge
    cancellation is bitwise); (b) ring-without-center -> outer + hole;
    (c) a polyfill region dissolves with exact area additivity via the
    Spark operator."""
    import numpy as np

    from osmgraft.functions.h3real import cell_to_boundary, grid_disk, latlng_to_cell
    from osmgraft.operators.h3ops import h3_dissolve
    from osmgraft.operators.multipolygon import _shoelace2

    def cell_area2(c):
        b = cell_to_boundary(int(c))
        return abs(_shoelace2([(int(round(la * 1e7)), int(round(lo * 1e7)))
                               for la, lo in b]))

    c0 = int(latlng_to_cell(np.array([300000000]), np.array([400000000]), 5)[0])
    flower = grid_disk(np.array([c0]), 1)[0]
    df = spark.createDataFrame([(1, int(c)) for c in flower],
                               "boundary_id long, cell long")
    out = h3_dissolve(df).collect()
    assert len(out) == 1 and out[0].n_verts == 18
    assert out[0].area2_fp == sum(cell_area2(c) for c in flower)

    ring_only = [int(c) for c in flower if int(c) != c0]
    df2 = spark.createDataFrame([(2, c) for c in ring_only],
                                "boundary_id long, cell long")
    out2 = sorted(h3_dissolve(df2).collect(), key=lambda r: r.ring_idx)
    assert len(out2) == 2  # outer ring + the hole where the center was
    assert out2[0].n_verts == 18 and out2[1].n_verts == 6
    assert (out2[0].area2_fp - out2[1].area2_fp
            == sum(cell_area2(c) for c in ring_only))

    from osmgraft.functions.h3real import polygon_to_cells

    rect = [(100000000, 200000000), (100000000, 260000000),
            (160000000, 260000000), (160000000, 200000000),
            (100000000, 200000000)]
    region = polygon_to_cells(rect, [], 4)
    df3 = spark.createDataFrame([(3, int(c)) for c in region],
                                "boundary_id long, cell long")
    out3 = h3_dissolve(df3).collect()
    assert sum(r.area2_fp * (1 if r.ring_idx == 0 else -1) for r in out3) \
        <= sum(cell_area2(c) for c in region)
    assert max(r.area2_fp for r in out3) == \
        sorted((r.area2_fp for r in out3), reverse=True)[0]
    # exact additivity when the region is simply connected (single ring)
    if len(out3) == 1:
        assert out3[0].area2_fp == sum(cell_area2(c) for c in region)
