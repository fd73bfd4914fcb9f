"""Generate QUERIES.md — the driver-contract query catalog.

One row per queries() entry: oracle status + the first docstring line, so a
reviewer can see at a glance what each correctness-gated query proves.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    from osmgraft.queries import REGISTRY

    lines = [
        "# QUERIES — driver-contract catalog (`__spark_entry__.queries()`)\n",
        f"{len(REGISTRY)} queries; those marked `oracle` are hash-gated against "
        "DuckDB at sf0.01 by the driver (CORRECTNESS_r{N}.json), the rest are "
        "rows-only (non-SQL-expressible kernels, noted why).\n",
        "| query | gate | what it proves |",
        "|---|---|---|",
    ]
    for name, (fn, oracle) in REGISTRY.items():
        doc = (fn.__doc__ or "").strip().splitlines()
        first = doc[0].strip() if doc else ""
        gate = "oracle" if oracle else "rows-only"
        lines.append(f"| `{name}` | {gate} | {first} |")
    with open(os.path.join(REPO, "QUERIES.md"), "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print("wrote QUERIES.md")


if __name__ == "__main__":
    main()
