"""Deployment-contract test: the engine must launch via
``spark-submit --py-files dist/osmgraft.zip`` (north rule) — executors import
the package from the shipped zip, no repo checkout."""

from __future__ import annotations

import os
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dist_zip_contains_only_package_sources(tmp_path):
    sys.path.insert(0, REPO)
    from tools.make_dist import build

    out = build(str(tmp_path / "osmgraft.zip"))
    names = zipfile.ZipFile(out).namelist()
    assert all(n.startswith("osmgraft/") and n.endswith(".py") for n in names)
    assert "osmgraft/operators/pip.py" in names
    assert "osmgraft/streaming/incremental.py" in names


def test_spark_submit_py_files_flagship(tmp_path):
    sys.path.insert(0, REPO)
    from tools.make_dist import build

    zip_path = build(str(tmp_path / "osmgraft.zip"))
    out_dir = str(tmp_path / "out")
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the only source of the package
    proc = subprocess.run(
        [
            "spark-submit",
            "--master",
            "local[4]",
            "--conf",
            "spark.ui.enabled=false",
            "--conf",
            "spark.sql.execution.arrow.maxBytesPerBatch=2147483647",
            "--py-files",
            zip_path,
            os.path.join(REPO, "tools", "jobs", "flagship_job.py"),
            "--rows",
            "100000",
            "--output",
            out_dir,
        ],
        cwd=str(tmp_path),  # not the repo: imports must resolve via the zip
        capture_output=True,
        text=True,
        timeout=280,
        env=env,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "wrote" in proc.stdout


def test_spark_submit_py_files_curation(tmp_path):
    """The curation pipeline deploys the same way: zip-only imports, smoke
    corpus, packed windows written, funnel counts printed as JSON."""
    import json
    import re

    sys.path.insert(0, REPO)
    from tools.make_dist import build

    zip_path = build(str(tmp_path / "osmgraft.zip"))
    out_dir = str(tmp_path / "out")
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    proc = subprocess.run(
        [
            "spark-submit",
            "--master",
            "local[4]",
            "--conf",
            "spark.ui.enabled=false",
            "--py-files",
            zip_path,
            os.path.join(REPO, "tools", "jobs", "curation_job.py"),
            "--rows",
            "4000",
            "--output",
            out_dir,
        ],
        cwd=str(tmp_path),
        capture_output=True,
        text=True,
        timeout=280,
        env=env,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    m = re.search(r"osmgraft-curation: (\{.*\})", proc.stdout)
    assert m, proc.stdout
    counts = json.loads(m.group(1))
    assert counts["all"] == 4000
    assert 0 < counts["dedup_canonical"] <= counts["lang_en"] <= 4000
    assert counts["packed_windows"] > 0


def test_spark_submit_local_cluster_flagship(tmp_path):
    """Multi-executor deployment proof (north rule): standalone local-cluster
    mode spawns a real Master + separate Worker JVMs with their own executor
    Python workers, so driver-only imports/paths that local[n] masks fail
    here. Flagship must run from the shipped zip alone (BENCH/SUBMIT.md)."""
    sys.path.insert(0, REPO)
    from tools.make_dist import build

    zip_path = build(str(tmp_path / "osmgraft.zip"))
    out_dir = str(tmp_path / "out")
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    proc = subprocess.run(
        [
            "spark-submit",
            "--master",
            "local-cluster[2,4,4096]",
            "--conf",
            "spark.ui.enabled=false",
            "--conf",
            "spark.sql.shuffle.partitions=8",
            "--py-files",
            zip_path,
            os.path.join(REPO, "tools", "jobs", "flagship_job.py"),
            "--rows",
            "50000",
            "--output",
            out_dir,
        ],
        cwd=str(tmp_path),
        capture_output=True,
        text=True,
        timeout=280,
        env=env,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "wrote" in proc.stdout
