"""Build dist/osmgraft.zip for ``spark-submit --py-files`` deployment.

The north rule requires cluster launch via ``spark-submit --py-files`` — the
zip must be importable by executors' Python workers with no repo checkout.
Only the package sources go in (no tests, no tools, no caches).

Usage: python tools/make_dist.py   → dist/osmgraft.zip
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(REPO, "dist", "osmgraft.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    pkg = os.path.join(REPO, "osmgraft")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, dirs, files in os.walk(pkg):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                zf.write(full, os.path.relpath(full, REPO))
    return out_path


if __name__ == "__main__":
    print(build())
