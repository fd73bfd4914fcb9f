"""Parallelism-invariance (north rule: join output rows and tile assignments
must match bitwise across cluster sizes).

The same flagship pipeline runs in two subprocesses at local[2] and local[8]
(a session's master can't change in-process); each prints an order-insensitive
content hash of the full output. Equality means partitioning, salting, Arrow
batch boundaries, and AQE decisions leave no imprint on the result — the
fixed-point integer kernels (functions/coords.py, tiles.py, geom.pnpoly) are
what make this bitwise rather than approximately true."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = """
import hashlib, json, os, sys
sys.path.insert(0, {repo!r})
cpus = int(sys.argv[1])
from pyspark.sql import functions as F
from osmgraft.session import get_spark
from osmgraft.functions import tiles
from osmgraft.operators.celljoin import cell_pip_join
from osmgraft.operators.pip import pip_join
from osmgraft.synth import ADMIN_BOUNDARIES, points_projection

spark = get_spark("invariance-%d" % cpus, cpus=cpus)
spark.sparkContext.setLogLevel("ERROR")
orders = spark.range(1, 120_001, 1, max(cpus, 2)).select(F.col("id").alias("o_orderkey"))
pts = points_projection(orders)

def content_hash(df):
    rows = sorted(map(tuple, df.collect()))
    h = hashlib.sha256()
    for r in rows:
        h.update(repr(r).encode())
    return h.hexdigest()

out = {{}}
joined = pip_join(pts, ADMIN_BOUNDARIES, how="inner").select(
    "point_id", "boundary_id",
    tiles.tile_x(F.col("lon7"), 13).alias("tx"),
    tiles.tile_y(F.col("lat7"), 13).alias("ty"),
)
out["pip_tiles"] = content_hash(joined)
salted = cell_pip_join(pts, ADMIN_BOUNDARIES, skew_threshold=2000, salt_target=1000)
out["salted_cell_join"] = content_hash(salted.select("point_id", "boundary_id"))

# round-3 operators: H3 hierarchy cascade, inverted-index Jaccard, Y4M video
from osmgraft.functions.cells import h3_cell_udf
from osmgraft.operators.h3ops import compact_cells, uncompact_cells
from osmgraft.operators.dedup import jaccard_ngram_pairs
from osmgraft.operators.multimodal import video_frame_sample
from osmgraft.synth import synth_videos

cells5 = pts.limit(20_000).select(
    h3_cell_udf(5)(F.col("lat7"), F.col("lon7")).alias("cell")).distinct()
out["h3_compact"] = content_hash(
    compact_cells(uncompact_cells(cells5, 7, min_res=5), res=7, min_res=5))
docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
out["jaccard"] = content_hash(
    jaccard_ngram_pairs(docs.repartition(max(cpus, 2))))
out["video"] = content_hash(
    video_frame_sample(synth_videos(spark, 120).repartition(max(cpus, 2))))

# round-3 session-2 operators: multipolygon assembly, Douglas-Peucker,
# IVF ANN, geodesic way lengths (integer-segment sums)
from osmgraft.operators.multipolygon import assemble_multipolygons, mp_fixture_df
from osmgraft.operators.simplify import DP_EPS, dp_fixture_df, simplify_ways
from osmgraft.operators.similarity import ivf_anchors, ivf_topk
from osmgraft.queries import REGISTRY

out["multipolygon"] = content_hash(assemble_multipolygons(
    mp_fixture_df(spark, "/root/testdata/sf0.001")))
out["dp_simplify"] = content_hash(simplify_ways(
    dp_fixture_df(spark, "/root/testdata/sf0.001"), eps7=DP_EPS))
emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
out["ivf"] = content_hash(ivf_topk(
    emb.repartition(max(cpus, 2)), emb.where(F.col("vec_id") < 8),
    anchors=ivf_anchors(64, 16), nprobe=4, k=10))
out["way_lengths"] = content_hash(
    REGISTRY["way_lengths_geodesic"][0](spark, "/root/testdata/sf0.001"))
print(json.dumps(out))
"""


def _run(cpus: int) -> dict:
    code = _CHILD.format(repo=REPO)
    proc = subprocess.run(
        [sys.executable, "-c", code, str(cpus)],
        capture_output=True,
        text=True,
        timeout=500,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    return json.loads(proc.stdout.strip().splitlines()[-1])


def test_flagship_bitwise_invariant_across_parallelism():
    a = _run(2)
    b = _run(8)
    assert a == b
    assert set(a) == {"pip_tiles", "salted_cell_join", "h3_compact",
                      "jaccard", "video", "multipolygon", "dp_simplify",
                      "ivf", "way_lengths"}
