"""Pin the h3_dissolve_disks fixture: (gid, center_cell, k) triples whose
dissolved gridDisk boundary has a CLOSED-FORM shape stated by public H3
geometry — a k-disk of hexagons dissolves to exactly ONE ring with
6*(2k+1) vertices, and the ring's shoelace area equals the sum of the
member cell areas (shared edges cancel bitwise).

Screening criteria (geometric, not output-matching):
  * even resolution (Class II) — H3 adds icosahedron-edge distortion
    vertices only at Class III resolutions, so the vertex-count formula
    is exact;
  * no pentagon inside gridDisk(center, k+1) — pentagons have 5 edges and
    break both the formula and cell_to_boundary's hexagon-only contract.

The formula itself is external truth (H3 docs: ring r has 6r cells, the
disk boundary is the outer hull of ring k → 6(k+1) outer cells each
contributing their 2 or 3 exterior edge... equivalently 6(2k+1) vertices);
the tool only SELECTS cells where the preconditions hold, then asserts the
machinery agrees as a sanity check before pinning.
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from osmgraft.functions.h3real import grid_disk, is_pentagon, latlng_to_cell


def main() -> None:
    lats = [-60, -35, -10, 15, 40, 65]
    lons = [-150, -95, -40, 15, 70, 125]
    combos = [(4, 1), (4, 2), (6, 3), (6, 1), (4, 3), (6, 2)]
    out = []
    i = 0
    for lat in lats:
        for lon in lons:
            res, k = combos[i % len(combos)]
            i += 1
            c = int(latlng_to_cell(np.array([lat * 10**7]), np.array([lon * 10**7]), res)[0])
            guard = grid_disk(np.array([c], dtype=np.uint64), k + 1)[0]
            if bool(is_pentagon(np.asarray(guard)).any()):
                continue
            out.append((len(out), c, k))

    # sanity: the real machinery must agree with the closed form
    from osmgraft.functions.h3real import cell_to_boundary
    from osmgraft.operators.multipolygon import _shoelace2, assemble_rings

    for gid, c, k in out:
        cells = grid_disk(np.array([c], dtype=np.uint64), k)[0]
        edge_count, edge_dir, area_sum = {}, {}, 0
        for cc in cells:
            b = cell_to_boundary(int(cc))
            iv = [(int(round(la * 1e7)), int(round(lo * 1e7))) for la, lo in b]
            area_sum += abs(_shoelace2(iv))
            n = len(iv)
            for j in range(n):
                a, z = iv[j], iv[(j + 1) % n]
                key = (a, z) if a <= z else (z, a)
                edge_count[key] = edge_count.get(key, 0) + 1
                edge_dir[key] = (a, z)
        ext = [edge_dir[kk] for kk, cnt in edge_count.items() if cnt == 1]
        rings = assemble_rings([(j, [a, z]) for j, (a, z) in enumerate(ext)])
        assert len(rings) == 1, (gid, c, k, len(rings))
        assert len(rings[0]) == 6 * (2 * k + 1), (gid, c, k, len(rings[0]))
        assert abs(_shoelace2(rings[0])) == area_sum, (gid, c, k)

    print("_DISSOLVE_FIXTURE = [  # (gid, center_cell, k) — tools/h3_dissolve_fixture.py")
    for row in out:
        print(f"    {row},")
    print("]")
    print(f"# {len(out)} fixtures, all sanity-checked")


if __name__ == "__main__":
    main()
