"""movement_rose octant rule vs an atan2 reference; histogram semantics."""

import math

import numpy as np

from osmgraft.operators.trajectory import movement_rose


def _rose(spark, steps):
    # build a track whose consecutive deltas are exactly `steps`
    x = y = 0
    rows = [(1, 0, 0, 0)]
    for i, (dx, dy) in enumerate(steps, 1):
        x, y = x + dx, y + dy
        rows.append((1, i, x, y))
    df = spark.createDataFrame(rows, "ent long, seq long, x long, y long")
    return {r.octant: r.steps for r in movement_rose(df).collect()}


def _ref_octant(dx, dy):
    ang = math.atan2(dy, dx) % (2 * math.pi)
    return int(ang // (math.pi / 4)) % 8


def test_octants_match_atan2_on_random_steps(spark):
    rng = np.random.default_rng(13)
    steps = [(int(a), int(b)) for a, b in zip(rng.integers(-9, 10, 200),
                                              rng.integers(-9, 10, 200))
             if (a, b) != (0, 0)]
    got = _rose(spark, steps)
    want = {}
    for dx, dy in steps:
        k = _ref_octant(dx, dy)
        want[k] = want.get(k, 0) + 1
    assert got == want


def test_boundary_angles_belong_to_upper_sector(spark):
    # axes and diagonals: 0°->0, 45°->1, 90°->2, 135°->3, 180°->4,
    # 225°->5, 270°->6, 315°->7 (half-open [45k, 45k+45) sectors)
    cases = {(1, 0): 0, (1, 1): 1, (0, 1): 2, (-1, 1): 3,
             (-1, 0): 4, (-1, -1): 5, (0, -1): 6, (1, -1): 7}
    for step, want in cases.items():
        assert _rose(spark, [step]) == {want: 1}, step


def test_zero_steps_excluded(spark):
    assert _rose(spark, [(0, 0), (2, 1), (0, 0)]) == {0: 1}
