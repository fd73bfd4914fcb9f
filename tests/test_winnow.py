"""Winnowing fingerprints (operators/dedup.py): the SIGMOD-2003 guarantee,
density bound, pair join recall, engine parity."""

import numpy as np


def _mk_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_winnow_substring_guarantee(spark):
    """Docs sharing a substring of length >= w+k-1 share >= 1 fingerprint."""
    from osmgraft.operators.dedup import winnow_fingerprint_sets

    rng = np.random.default_rng(11)
    alpha = "abcdefghij"
    shared = "".join(rng.choice(list(alpha), 24))  # 24 >> w+k-1 = 9
    rows = []
    for i in range(40):
        pre = "".join(rng.choice(list(alpha), 30))
        suf = "".join(rng.choice(list(alpha), 30))
        rows.append((i, pre + shared + suf))
    # plus unrelated docs
    for i in range(40, 60):
        rows.append((i, "".join(rng.choice(list("qrstuvwxyz"), 80))))
    post = winnow_fingerprint_sets(_mk_docs(spark, rows), k=6, w=4).toPandas()
    by_doc = post.groupby("doc_id")["fp"].apply(set)
    base = by_doc[0]
    for i in range(1, 40):
        assert by_doc[i] & base, f"doc {i} shares no fingerprint with doc 0"


def test_winnow_density(spark):
    """Expected selected fraction ~ 2/(w+1) of k-grams (distinct-ness and
    boundary effects push it around; assert a sane band)."""
    from osmgraft.operators.dedup import winnow_fingerprints

    rng = np.random.default_rng(5)
    rows = [
        (i, "".join(rng.choice(list("abcdefghijklmnop"), 400))) for i in range(30)
    ]
    out = winnow_fingerprints(_mk_docs(spark, rows), k=6, w=4).toPandas()
    n_kgrams = 400 - 6 + 1
    frac = out["n_fp"].to_numpy() / n_kgrams
    assert (frac > 0.2).all() and (frac < 0.6).all(), frac.mean()


def test_winnow_shared_pairs_recall(spark):
    from osmgraft.operators.dedup import winnow_shared_pairs

    rng = np.random.default_rng(3)
    alpha = list("abcdefghijklmnopqrstuvwxyz ")
    rows = []
    for i in range(20):
        body = "".join(rng.choice(alpha, 120))
        rows.append((2 * i, body))
        # near-dup: same body with a small prefix edit
        rows.append((2 * i + 1, "zq" + body[2:]))
    pairs = winnow_shared_pairs(_mk_docs(spark, rows), min_shared=2).toPandas()
    got = set(zip(pairs.doc_a, pairs.doc_b))
    for i in range(20):
        assert (2 * i, 2 * i + 1) in got, i


def test_winnow_engine_parity_and_short_docs(spark):
    import duckdb
    import pandas as pd

    from osmgraft.operators.dedup import sql_winnow_fingerprints, winnow_fingerprints

    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "THE  Quick   brown FOX"),  # normalization on the hash
        (2, "tiny"),  # shorter than k -> 0 fingerprints
        (3, "exactly9!"),  # length 9 = w+k-1 -> 1 window
        (4, "aaaaaaaaaaaaaaaaaaaa"),  # self-repeating: value-distinct set
    ]
    got = (
        winnow_fingerprints(_mk_docs(spark, rows), k=6, w=4)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame(rows, columns=["doc_id", "text"])
    )
    duck = (
        con.execute(sql_winnow_fingerprints(k=6, w=4))
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert (got["n_fp"].to_numpy() == duck["n_fp"].to_numpy()).all()
    assert (got["fp_digest"].to_numpy() == duck["fp_digest"].to_numpy()).all()
    assert got.loc[2, "n_fp"] == 0
    assert got.loc[3, "n_fp"] == 1
    assert got.loc[4, "n_fp"] == 1  # one distinct 6-gram value
