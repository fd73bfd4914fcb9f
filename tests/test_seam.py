"""Seam carving DP (operators/multimodal.image_seam_energy): brute-force
seam enumeration oracle, tie rule, degenerate sizes, corrupt payloads."""

import itertools

import numpy as np


def _encode_rows(spark, rows):
    from pyspark.sql import functions as F  # noqa: F401

    return spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string"
    )


def _raw_img(px: np.ndarray) -> bytearray:
    from osmgraft.functions.codec import encode_image

    return bytearray(encode_image(px.astype(np.uint8), "raw"))


def _brute_force_seam(px: np.ndarray) -> tuple[int, int]:
    """Enumerate every monotone-connected vertical seam over the interior
    energy grid; return (min cost, end x) with smallest-end-x ties —
    smallest lexicographic path among equal costs is not required, only
    the END column tie rule the operator defines."""
    p = px.astype(np.int64)
    luma = (299 * p[..., 0] + 587 * p[..., 1] + 114 * p[..., 2]) // 1000
    gx = luma[1:-1, 2:] - luma[1:-1, :-2]
    gy = luma[2:, 1:-1] - luma[:-2, 1:-1]
    e = np.abs(gx) + np.abs(gy)
    hh, ww = e.shape
    best = None
    for start in range(ww):
        paths = [(e[0, start], start)]
        for r in range(1, hh):
            nxt = []
            for cost, x in paths:
                for dx in (-1, 0, 1):
                    nx = x + dx
                    if 0 <= nx < ww:
                        nxt.append((cost + e[r, nx], nx))
            # prune: keep best cost per column (DP invariant)
            byx = {}
            for c, x in nxt:
                if x not in byx or c < byx[x]:
                    byx[x] = c
            paths = [(c, x) for x, c in byx.items()]
        for c, x in paths:
            key = (c, x)
            if best is None or key < best:
                best = key
    return best[0], best[1] + 1


def test_seam_matches_brute_force(spark):
    from osmgraft.operators.multimodal import image_seam_energy

    rng = np.random.default_rng(9)
    rows = []
    want = {}
    for i in range(6):
        w, h = 7, 6
        px = rng.integers(0, 256, (h, w, 3), dtype=np.int64)
        rows.append((f"bf{i}", _raw_img(px), w, h, "raw"))
        want[f"bf{i}"] = _brute_force_seam(px)
    got = image_seam_energy(_encode_rows(spark, rows)).toPandas()
    for _, r in got.iterrows():
        assert (r.seam_cost, r.end_x) == want[r.image_id], r.image_id


def test_seam_tie_rule_and_uniform(spark):
    """A constant image has zero energy everywhere: cost 0, end_x = 1."""
    from osmgraft.operators.multimodal import image_seam_energy

    px = np.full((8, 10, 3), 77, dtype=np.int64)
    got = image_seam_energy(
        _encode_rows(spark, [("u", _raw_img(px), 10, 8, "raw")])
    ).collect()[0]
    assert got.seam_cost == 0 and got.end_x == 1


def test_seam_degenerate_and_corrupt(spark):
    from osmgraft.operators.multimodal import image_seam_energy

    tiny = np.full((2, 2, 3), 5, dtype=np.int64)
    rows = [
        ("tiny", _raw_img(tiny), 2, 2, "raw"),
        ("bad", bytearray(b"\x00\x01"), 4, 4, "raw"),
    ]
    got = {
        r.image_id: r
        for r in image_seam_energy(
            _encode_rows(spark, rows), on_error="null"
        ).collect()
    }
    assert got["tiny"].seam_cost is None and got["tiny"].end_x is None
    assert got["bad"].seam_cost is None


def test_seam_vertical_edge_avoided(spark):
    """An image with one expensive vertical stripe: the seam must end away
    from the stripe column."""
    from osmgraft.operators.multimodal import image_seam_energy

    px = np.zeros((10, 12, 3), dtype=np.int64)
    px[:, 6, :] = 255  # high-contrast stripe -> high energy at x 5..7
    got = image_seam_energy(
        _encode_rows(spark, [("s", _raw_img(px), 12, 10, "raw")])
    ).collect()[0]
    assert got.seam_cost == 0
    assert not (4 <= got.end_x <= 7), got.end_x
