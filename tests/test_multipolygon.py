"""Multipolygon assembly (operators/multipolygon.py): ring stitching with
reversal/splits, containment-parity nesting (island-in-lake), exact integer
areas, shuffle invariance, and the dangling-endpoint error path."""

import numpy as np
import pytest

from osmgraft.operators.multipolygon import (
    _point_in_ring,
    _shoelace2,
    assemble_multipolygons,
    assemble_rings,
    mp_fixture_ways,
)


def _rect(la0, lo0, la1, lo1):
    return [(la0, lo0), (la0, lo1), (la1, lo1), (la1, lo0)]


def test_shoelace_and_containment():
    r = _rect(0, 0, 1000, 2000)
    assert abs(_shoelace2(r)) == 2 * 1000 * 2000
    assert _point_in_ring(500, 1000, r)
    assert not _point_in_ring(1500, 1000, r)
    # ring-local origin keeps huge coordinates exact
    big = _rect(890_000_000, 1_790_000_000, 890_001_000, 1_790_002_000)
    assert abs(_shoelace2(big)) == 2 * 1000 * 2000


def test_assemble_reversed_and_split_ways():
    # square split into 3 ways, middle one reversed
    w1 = [(0, 0), (0, 10)]
    w2 = [(10, 10), (0, 10)]  # reversed orientation
    w3 = [(10, 10), (10, 0), (0, 0)]
    rings = assemble_rings([(3, w3), (1, w1), (2, w2)])
    assert len(rings) == 1 and len(rings[0]) == 4
    assert abs(_shoelace2(rings[0])) == 2 * 10 * 10


def test_assemble_multiple_rings_and_closed_way():
    closed = [(100, 100), (100, 120), (110, 120), (110, 100), (100, 100)]
    w1 = [(0, 0), (0, 10)]
    w2 = [(0, 10), (10, 10), (10, 0), (0, 0)]
    rings = assemble_rings([(5, closed), (1, w1), (2, w2)])
    assert sorted(len(r) for r in rings) == [4, 4]


def test_dangling_raises():
    with pytest.raises(ValueError, match="unclosable"):
        assemble_rings([(1, [(0, 0), (0, 10)]), (2, [(0, 10), (5, 5)])])


def test_island_in_lake_parity(spark):
    """Depth-2 nesting: outer land, lake hole, island in the lake — the
    island counts as OUTER again (containment parity), so net area =
    land - lake + island."""
    land = _rect(0, 0, 1000, 1000)
    lake = _rect(100, 100, 900, 900)
    island = _rect(400, 400, 600, 600)
    rows = [
        (1, 10, [{"lat7": a, "lon7": b} for a, b in land + [land[0]]]),
        (1, 11, [{"lat7": a, "lon7": b} for a, b in lake + [lake[0]]]),
        (1, 12, [{"lat7": a, "lon7": b} for a, b in island + [island[0]]]),
    ]
    df = spark.createDataFrame(
        rows, "rel_id long, way_id long, nodes array<struct<lat7: long, lon7: long>>"
    )
    out = assemble_multipolygons(df).collect()[0]
    assert (out.n_rings, out.n_outer, out.n_inner) == (3, 2, 1)
    a_land = 2 * 1000 * 1000
    a_lake = 2 * 800 * 800
    a_isl = 2 * 200 * 200
    assert out.area2_outer == a_land + a_isl
    assert out.area2_inner == a_lake
    assert out.area2_net == a_land + a_isl - a_lake


def test_fixture_matches_closed_form():
    """mp_fixture_ways assembles (locally) to exactly the closed-form values
    the DuckDB oracle states, for every bucket shape class."""
    for b in (0, 1, 2, 3, 5, 6, 7, 11, 22, 33, 45, 96):
        rid, ways = mp_fixture_ways(b)
        rings = assemble_rings(ways)
        w = (b % 7 + 2) * 1_000_000
        h = (b % 5 + 2) * 1_000_000
        want_rings = 2 + (1 if b % 11 == 0 else 0)
        assert len(rings) == want_rings, b
        areas = sorted(abs(_shoelace2(r)) for r in rings)
        want = sorted(
            [2 * w * h, 2 * (w // 2) * (h // 2)]
            + ([2 * w * (h // 2)] if b % 11 == 0 else [])
        )
        assert areas == want, b


def test_assembly_partitioning_invariance(spark):
    from osmgraft.operators.multipolygon import mp_fixture_df

    df = mp_fixture_df(spark, "/root/testdata/sf0.001")

    def run(d):
        return sorted(map(tuple, assemble_multipolygons(d).collect()))

    assert run(df.repartition(1)) == run(df.repartition(17, "rel_id"))


def test_point_on_edge_orientation_independent():
    """Review fix: an on-edge point must classify identically whether the
    crossing edge ascends or descends (strict test both directions)."""
    square_ccw = [(0, 0), (0, 10), (10, 10), (10, 0)]
    square_cw = square_ccw[::-1]
    for pt in [(5, 0), (5, 10), (0, 5), (10, 5)]:  # on each edge
        a = _point_in_ring(pt[0], pt[1], square_ccw)
        b = _point_in_ring(pt[0], pt[1], square_cw)
        assert a == b, pt
    assert _point_in_ring(5, 5, square_ccw) and _point_in_ring(5, 5, square_cw)
    assert not _point_in_ring(5, 11, square_ccw)


def test_chain_route_ways_hand_routes(spark):
    """Chaining by connectivity only: a 3-way shuffled chain orders
    correctly; a branching route and a closed loop (no unique start) are
    flagged incomplete as single (-1, -1, False) rows."""
    from osmgraft.operators.multipolygon import chain_route_ways

    rows = [
        # route 1: C->D, A->B, B->C presented shuffled; chain = w20, w21, w22
        (1, 22, 30, 0, 40, 0), (1, 20, 10, 0, 20, 0), (1, 21, 20, 0, 30, 0),
        # route 2: branch at head 10,0
        (2, 30, 10, 0, 20, 0), (2, 31, 10, 0, 30, 0),
        # route 3: closed triangle loop (every head is also a tail)
        (3, 40, 0, 0, 1, 0), (3, 41, 1, 0, 2, 0), (3, 42, 2, 0, 0, 0),
    ]
    df = spark.createDataFrame(
        rows, "route_id long, way_id long, ax long, ay long, bx long, by long"
    )
    out = chain_route_ways(df).collect()
    r1 = sorted(
        [(r["pos"], r["way_id"]) for r in out if r["route_id"] == 1]
    )
    assert r1 == [(0, 20), (1, 21), (2, 22)]
    for rid in (2, 3):
        rows_r = [r for r in out if r["route_id"] == rid]
        assert len(rows_r) == 1 and not rows_r[0]["complete"]
        assert rows_r[0]["pos"] == -1 and rows_r[0]["way_id"] == -1
