"""Lexical ranking (operators/ranking.py): tf-idf and BM25 semantics on
crafted corpora (the integer fixed-point score must rank exactly like a
straightforward float BM25 with the same quantized idf), plus the
scale-critical plan shapes."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from osmgraft.operators.ranking import (
    bm25_scores,
    doc_postings,
    tfidf_top_terms,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "apple banana apple cherry"),
        (2, "banana banana banana date"),
        (3, "Apple  APPLE date  "),           # case/whitespace normalization
        (4, "cherry"),
        (5, ""),                               # empty doc: never in postings
        (6, "elderberry fig grape apple banana cherry date elderberry"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_doc_postings(spark, corpus):
    rows = {(r.doc_id, r.term): r.tf for r in doc_postings(corpus).collect()}
    assert rows[(1, "apple")] == 2 and rows[(1, "banana")] == 1
    assert rows[(3, "apple")] == 2  # lowercased
    assert rows[(2, "banana")] == 3
    assert not any(d == 5 for d, _ in rows)  # empty doc absent


def test_tfidf_ranks_rare_terms_up(spark, corpus):
    got = {
        (r.doc_id, r.rnk): (r.term, r.tf, r.df, r.score)
        for r in tfidf_top_terms(corpus, k=2).collect()
    }
    # N = 5 docs with tokens. doc 2: banana tf=3 df=3 idf=len(bin(5//3))=1
    # -> 3; date tf=1 df=3 idf=1 -> 1. banana first.
    assert got[(2, 1)][0] == "banana" and got[(2, 1)][3] == 3
    assert got[(2, 2)] == ("date", 1, 3, 1)
    # doc 6: elderberry tf=2 df=1 idf=len(bin(5))=3 -> 6 beats everything else
    assert got[(6, 1)] == ("elderberry", 2, 1, 6)
    # deterministic tie-break: doc 1 apple(2·idf1=2) > banana/cherry(1);
    # banana before cherry alphabetically at equal score
    assert got[(1, 1)][0] == "apple" and got[(1, 2)][0] == "banana"
    assert (5, 1) not in got  # empty doc yields no rows


def _bm25_float_reference(docs_tokens, queries, k1=1.2, b=0.75):
    """Float BM25 with the SAME integer-quantized idf and millitoken avgdl
    floor the engine specifies — validates the cross-multiplied int64 form."""
    postings = {}
    for d, toks in docs_tokens.items():
        for t in toks:
            postings.setdefault(d, {}).setdefault(t, 0)
            postings[d][t] += 1
    n_docs = len(postings)
    tot = sum(sum(v.values()) for v in postings.values())
    avgdl = ((1000 * tot) // n_docs) / 1000.0
    df = {}
    for v in postings.values():
        for t in v:
            df[t] = df.get(t, 0) + 1
    out = {}
    for q, terms in queries.items():
        for d, tfs in postings.items():
            s = 0.0
            for t in terms:
                if t not in tfs:
                    continue
                idf = len(bin(n_docs // df[t])) - 2  # == length(bin(x))
                tf = tfs[t]
                dl = sum(tfs.values())
                s += idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dl / avgdl))
            if s > 0:
                out.setdefault(q, []).append((d, s))
        out.get(q, []).sort(key=lambda p: (-p[1], p[0]))
    return out


def test_bm25_matches_float_reference_ordering(spark):
    rng = np.random.default_rng(17)
    vocab = [f"w{i}" for i in range(30)]
    docs_tokens = {
        d: [vocab[i] for i in rng.integers(0, 30, rng.integers(3, 40))]
        for d in range(1, 26)
    }
    docs = spark.createDataFrame(
        [(d, " ".join(toks)) for d, toks in docs_tokens.items()],
        "doc_id long, text string",
    )
    queries = {"qa": ["w0", "w1", "w2"], "qb": ["w5"], "qc": ["w7", "w29"]}
    qdf = spark.createDataFrame(
        [(q, t) for q, ts in queries.items() for t in ts],
        "query_id string, term string",
    )
    got = {}
    for r in bm25_scores(docs, qdf, k=8).collect():
        got.setdefault(r.query_id, []).append((r.rnk, r.doc_id, r.score))
    ref = _bm25_float_reference(docs_tokens, queries)
    for q, ranked in ref.items():
        eng = sorted(got[q])
        assert len(eng) == min(8, len(ranked))
        for (rnk, doc_id, score), (ref_doc, ref_s) in zip(eng, ranked):
            assert doc_id == ref_doc, (q, rnk, doc_id, ref_doc)
            # fixed-point micro-units track the float value to rounding
            assert abs(score / 1e6 - ref_s) < 1e-3, (q, doc_id)


def test_bm25_ignores_unmatched_queries(spark, corpus):
    qdf = spark.createDataFrame(
        [("hit", "apple"), ("miss", "zzz")], "query_id string, term string"
    )
    got = bm25_scores(corpus, qdf, k=5).collect()
    assert {r.query_id for r in got} == {"hit"}
    assert all(r.score > 0 for r in got)


def test_ranking_plan_shapes(spark):
    """Corpus stats broadcast (1 row), query table broadcast, top-k window
    rewritten to WindowGroupLimit, map-side partial aggregation."""
    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    plan = tfidf_top_terms(docs, k=3)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "WindowGroupLimit" in plan
    assert plan.count("HashAggregate") >= 4  # partial+final for tf and df aggs

    qdf = spark.createDataFrame([("q0", "spark")], "query_id string, term string")
    plan2 = bm25_scores(docs, qdf, k=5)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan2  # query side never shuffles the postings
    assert "WindowGroupLimit" in plan2


def test_bm25_no_int64_overflow_on_long_docs(spark):
    """A long-document corpus that overflows the naive A*SCALE product
    (idf*44*tf*avgdl_milli*1e6 > 2^63): the long-division form must stay
    finite, positive, and track the float reference."""
    long_doc = " ".join(["common"] * 50_000 + ["needle"] * 3)
    docs = spark.createDataFrame(
        [(1, long_doc), (2, "needle in a short haystack " * 3)],
        "doc_id long, text string",
    )
    qdf = spark.createDataFrame(
        [("q", "needle"), ("q", "common")], "query_id string, term string"
    )
    got = {r.doc_id: r.score for r in bm25_scores(docs, qdf, k=5).collect()}
    assert len(got) == 2 and all(s > 0 for s in got.values())
    # float reference with the same quantized idf / floored avgdl
    docs_tokens = {
        1: long_doc.split(),
        2: ("needle in a short haystack " * 3).split(),
    }
    ref = _bm25_float_reference(docs_tokens, {"q": ["needle", "common"]})
    by_doc = dict(ref["q"])
    for d, s in got.items():
        assert abs(s / 1e6 - by_doc[d]) < 1e-3, d


def test_lm_surprisal_hand_computed(spark):
    from osmgraft.operators.ranking import lm_surprisal

    # corpus: "a b" x3 docs, one "a z" doc, one bigram-free "solo" doc.
    # vocab {a,b,z,solo} -> V=4. bigram counts: (a,b)=3, (a,z)=1; c_prev(a)=4.
    # bits(a,b) = ilog2(4+4) - ilog2(3+1) = 3 - 2 = 1
    # bits(a,z) = ilog2(8) - ilog2(2)     = 3 - 1 = 2
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a b"), (4, "a z"), (5, "solo")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["surprisal_bits"], r["n_bigrams"])
           for r in lm_surprisal(docs).collect()}
    assert got == {1: (1, 1), 2: (1, 1), 3: (1, 1), 4: (2, 1)}  # no bigram -> absent


def test_lm_surprisal_flags_gibberish(spark):
    from osmgraft.operators.ranking import lm_surprisal

    fluent = "the cat sat on the mat and the dog sat on the rug"
    rows = [(i, fluent) for i in range(20)]
    rows.append((99, "zqx vbn qwe rty uio zqx plm okn ijb uhv ygc tfx"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["surprisal_bits"] / r["n_bigrams"]
           for r in lm_surprisal(docs).collect()}
    fluent_mean = sum(v for k, v in out.items() if k != 99) / 20
    assert out[99] > 2 * fluent_mean  # gibberish is decisively more surprising


# --- exact AUC ---------------------------------------------------------------


def test_auc_exact_against_sklearn_free_reference(spark):
    """Hand-computable case + a brute-force pair-counting reference
    (AUC = [#(pos>neg) + 0.5·#(pos==neg)] / (P·N))."""
    from osmgraft.operators.ranking import auc_exact

    rows = [
        ("g", 1, 10), ("g", 1, 8), ("g", 0, 9), ("g", 0, 8), ("g", 0, 1),
        ("h", 1, 5), ("h", 0, 5),  # all tied → AUC 1/2
    ]
    df = spark.createDataFrame(rows, "grp string, label int, score int")
    got = {r["grp"]: r for r in auc_exact(df, ["grp"]).collect()}

    def brute(rows):
        pos = [s for _, l, s in rows if l == 1]
        neg = [s for _, l, s in rows if l == 0]
        num2 = sum(2 for p in pos for n in neg if p > n) + sum(
            1 for p in pos for n in neg if p == n
        )
        return num2, 2 * len(pos) * len(neg)

    for grp in ("g", "h"):
        sub = [r for r in rows if r[0] == grp]
        num2, den2 = brute(sub)
        r = got[grp]
        assert r["auc_num"] * den2 == num2 * r["auc_den"], grp
        assert r["auc_den"] == den2
    assert got["h"]["auc_num"] * 2 == got["h"]["auc_den"]  # tied → 1/2


def test_auc_degenerate_groups(spark):
    """P=0 or N=0 → auc_den = 0 (undefined), never a crash or a division."""
    from osmgraft.operators.ranking import auc_exact

    df = spark.createDataFrame(
        [("p", 1, 3), ("p", 1, 4), ("q", 0, 1)],
        "grp string, label int, score int",
    )
    got = {r["grp"]: r for r in auc_exact(df, ["grp"]).collect()}
    assert got["p"]["auc_den"] == 0 and got["q"]["auc_den"] == 0
    assert (got["p"]["p"], got["p"]["n"]) == (2, 0)


def test_auc_perfect_and_inverted(spark):
    from osmgraft.operators.ranking import auc_exact

    perfect = [("x", 1, s) for s in (9, 8)] + [("x", 0, s) for s in (2, 1)]
    inverted = [("y", 0, s) for s in (9, 8)] + [("y", 1, s) for s in (2, 1)]
    df = spark.createDataFrame(
        perfect + inverted, "grp string, label int, score int"
    )
    got = {r["grp"]: r for r in auc_exact(df, ["grp"]).collect()}
    assert got["x"]["auc_num"] == got["x"]["auc_den"]  # AUC 1
    assert got["y"]["auc_num"] == 0  # AUC 0


# --- rank aggregation (Borda + Condorcet) ------------------------------------
def test_rank_agg_textbook_condorcet_paradox(spark):
    """The canonical 3-ballot cycle A>B>C, B>C>A, C>A>B: no Condorcet
    winner; Borda ties all three -> lexicographic 'A' wins."""
    from osmgraft.operators.ranking import rank_aggregation

    rows = []
    for day, order in enumerate([["A", "B", "C"], ["B", "C", "A"], ["C", "A", "B"]]):
        for pos, cand in enumerate(order):
            rows.append((1, day, cand, 30 - pos * 10))
    df = spark.createDataFrame(rows, "g long, day long, cand string, cnt long")
    (r,) = rank_aggregation(df, ["g"], "day", "cand", "cnt").collect()
    assert r["condorcet_winner"] is None
    assert r["borda_winner"] == "A" and r["borda_score"] == 3
    assert r["n_ballots"] == 3


def test_rank_agg_majority_and_burst_robustness(spark):
    """B wins 2 of 3 days head-to-head (Condorcet + Borda) even though A's
    single burst day dominates raw volume — the robustness Borda buys
    over plain top_event_types."""
    from osmgraft.operators.ranking import rank_aggregation

    rows = [
        (1, 0, "A", 1000), (1, 0, "B", 5),          # A's burst day
        (1, 1, "A", 3), (1, 1, "B", 7),
        (1, 2, "A", 2), (1, 2, "B", 9), (1, 2, "C", 1),
    ]
    df = spark.createDataFrame(rows, "g long, day long, cand string, cnt long")
    (r,) = rank_aggregation(df, ["g"], "day", "cand", "cnt").collect()
    assert r["condorcet_winner"] == "B" and r["borda_winner"] == "B"
    # Borda: B = 0 + 1 + 2 = 3; A = 1 + 0 + 1 = 2; C = 0
    assert r["borda_score"] == 3


def test_rank_agg_tie_rule_pinned(spark):
    """Equal counts in a ballot rank lexicographically — deterministic at
    any parallelism."""
    from osmgraft.operators.ranking import rank_aggregation

    rows = [(1, 0, "Z", 5), (1, 0, "M", 5), (1, 1, "Z", 5), (1, 1, "M", 5)]
    df = spark.createDataFrame(rows, "g long, day long, cand string, cnt long")
    (r,) = rank_aggregation(df, ["g"], "day", "cand", "cnt").collect()
    assert r["borda_winner"] == "M" and r["condorcet_winner"] == "M"
