"""IVF ANN (operators/similarity.py IVF section): coarse-quantizer
determinism, assignment-boundary margin (the documented cross-engine tie
risk), recall vs the exact brute-force contract, and the distributed Lloyd
trainer's objective monotonicity."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from osmgraft.operators.similarity import (
    cosine_topk_np,
    ivf_anchors,
    ivf_assign,
    ivf_topk,
    quantization_error,
    train_anchors,
)


@pytest.fixture(scope="module")
def emb(spark):
    sf_dir = "/root/testdata/sf0.01"
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


def test_anchors_deterministic_unit_norm():
    a1, a2 = ivf_anchors(64, 16), ivf_anchors(64, 16)
    assert np.array_equal(a1, a2)
    assert np.allclose(np.linalg.norm(a1, axis=1), 1.0, atol=1e-12)
    assert not np.array_equal(a1, ivf_anchors(64, 16, seed=7))


def test_assignment_margin_not_sub_ulp(emb):
    """The hash gate's documented risk is an item sub-ulp from an anchor
    decision boundary (numpy pairwise vs DuckDB sequential summation).  Pin
    the actual margin: min over items of (best - second-best anchor cosine)
    must be far above double noise."""
    anchors = ivf_anchors(64, 16)
    m = np.stack([np.asarray(r[0], dtype=np.float64) for r in emb.select("embedding").collect()])
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    sims = np.sort(m @ anchors.T, axis=1)
    margin = (sims[:, -1] - sims[:, -2]).min()
    assert margin > 1e-6, margin


def test_ivf_assign_matches_local_argmax(emb):
    anchors = ivf_anchors(64, 16)
    got = {
        r["vec_id"]: r["aid"]
        for r in ivf_assign(emb, anchors).select("vec_id", "aid").collect()
    }
    rows = emb.select("vec_id", "embedding").collect()
    m = np.stack([np.asarray(r[1], dtype=np.float64) for r in rows])
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    want = np.argmax(m @ anchors.T, axis=1)
    assert got == {r[0]: int(a) for r, a in zip(rows, want)}


def test_ivf_recall_vs_exact(emb):
    """nprobe=4/16 must recover most of the exact top-10 (pinned floor, not
    a tuned claim): the probed buckets hold ~1/4 of the table."""
    q = emb.filter(F.col("vec_id") < 8)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk_np(emb, q, k=10).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk(emb, q, anchors=ivf_anchors(64, 16), nprobe=4, k=10).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.45, recall
    # full probe == exact: nprobe = n_anchors degenerates to brute force
    full = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk(emb, q, anchors=ivf_anchors(64, 16), nprobe=16, k=10).collect()
    }
    assert full == exact


def test_trainer_reduces_quantization_error(emb):
    seed_anchors = ivf_anchors(64, 16)
    e0 = quantization_error(emb, seed_anchors)
    trained = train_anchors(emb, n_anchors=16, iters=3)
    e3 = quantization_error(emb, trained)
    assert e3 < e0, (e0, e3)
    # trained quantizer should also lift recall at the same probe budget
    q = emb.filter(F.col("vec_id") < 8)
    exact = {
        (r.query_id, r.neighbor_id) for r in cosine_topk_np(emb, q, k=10).collect()
    }
    seeded = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk(emb, q, anchors=seed_anchors, nprobe=4, k=10).collect()
    }
    tuned = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk(emb, q, anchors=trained, nprobe=4, k=10).collect()
    }
    assert len(exact & tuned) >= len(exact & seeded)


def test_ivf_partitioning_invariance(emb):
    """Same result at 1 and 13 input partitions (map-only assignment +
    broadcast probe join leave no partitioning imprint)."""
    anchors = ivf_anchors(64, 16)
    q = emb.filter(F.col("vec_id") < 8)

    def run(df):
        return sorted(
            map(tuple, ivf_topk(df, q, anchors=anchors, nprobe=4, k=10).collect())
        )

    assert run(emb.repartition(1)) == run(emb.repartition(13))


def test_quantize_int8_zero_vector_guard(spark):
    """A zero embedding quantizes to zeros/scale 0 identically in Spark and
    DuckDB (unguarded: NaN/Inf vs NULL divergence — review fix)."""
    import duckdb

    from osmgraft.operators.similarity import quantize_int8, sql_quantize_int8

    df = spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0]), (2, [1.0, -2.0, 0.5])],
        "vec_id long, embedding array<float>",
    )
    got = {r.vec_id: (r.q8, r.scale_micro) for r in quantize_int8(df).collect()}
    assert got[1] == ([0, 0, 0], 0)
    assert got[2][0] == [64, -127, 32]  # floor(x*127/2 + 0.5)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE embeddings AS SELECT 1::BIGINT vec_id, [0.0,0.0,0.0]::FLOAT[] embedding "
        "UNION ALL SELECT 2, [1.0,-2.0,0.5]::FLOAT[]"
    )
    want = {r[0]: (r[1], r[2]) for r in con.execute(sql_quantize_int8()).fetchall()}
    assert got == want


def test_rademacher_project_jl_property(spark):
    """Unscaled Rademacher projection: E[||Px||²] = out_dim·||x||² — check
    the distance-preservation ratio lands within a loose JL band for
    random pairs, and determinism across two invocations."""
    import numpy as np

    from osmgraft.operators.similarity import _rademacher_signs, rademacher_project

    rng = np.random.default_rng(5)
    rows = [(int(i), rng.standard_normal(64).tolist()) for i in range(80)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = rademacher_project(df, dim=64, out_dim=16, seed=9).collect()
    got = {r["vec_id"]: np.array([r[f"p{j}"] for j in range(16)]) for r in out}
    signs = _rademacher_signs(64, 16, seed=9)
    vecs = {i: np.array(v) for i, v in rows}
    # exact parity with the literal matrix (fold order aside: allclose)
    for i in (0, 7, 79):
        assert np.allclose(got[i], signs @ vecs[i], rtol=0, atol=1e-9)
    # JL band on pairwise distances (16 dims, loose 3-sigma band)
    ratios = []
    for a in range(0, 40, 5):
        for b in range(40, 80, 5):
            d_full = np.sum((vecs[a] - vecs[b]) ** 2)
            d_proj = np.sum((got[a] - got[b]) ** 2) / 16.0
            ratios.append(d_proj / d_full)
    assert 0.4 < min(ratios) and max(ratios) < 2.5
    out2 = rademacher_project(df, dim=64, out_dim=16, seed=9).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))
