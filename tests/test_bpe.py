"""BPE trainer + encoder (operators/bpe.py): distributed trainer equals a
plain-python reference, greedy-overlap semantics, whole-doc == per-pretoken
equivalence, and the literal merge table in queries.py regenerates exactly."""

import re

import pytest
from pyspark.sql import functions as F

from osmgraft.operators.bpe import (
    USEP,
    apply_merges_col,
    doc_seq_col,
    encode_tokens,
    train_merges,
)

# python twin of text.BPE_SPLIT_RE (\p{L}/\p{N} -> ascii classes are enough
# for these fixtures; the regex module with unicode classes isn't installed)
_SPLIT = re.compile(
    r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+"
)


def _ref_train(texts, n_merges):
    """Reference BPE: dict-of-tuples vocab, overlap-counted pairs, greedy
    left-to-right merge, ties by (count desc, a asc, b asc)."""
    vocab = {}
    for t in texts:
        for tok in _SPLIT.findall(t):
            key = tuple(tok)
            vocab[key] = vocab.get(key, 0) + 1
    merges = []
    for _ in range(n_merges):
        counts = {}
        for seq, c in vocab.items():
            for a, b in zip(seq, seq[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + c
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if best[1] < 2:
            break
        (a, b) = best[0]
        merges.append((a, b))
        new_vocab = {}
        for seq, c in vocab.items():
            out, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            k = tuple(out)
            new_vocab[k] = new_vocab.get(k, 0) + c
        vocab = new_vocab
    return merges


def _ref_encode_counts(text, merges):
    toks = _SPLIT.findall(text)
    n_bpe = 0
    for tok in toks:
        seq = list(tok)
        for a, b in merges:
            out, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            seq = out
        n_bpe += len(seq)
    return len(toks), n_bpe


TEXTS = [
    "low lower lowest low low",
    "new newer newest new",
    "low new lowest newest",
    "aaa aaaa aa",  # overlap semantics: greedy left-to-right within a round
    "12 123 1234 ,,, !!",
]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )


def test_trainer_matches_python_reference(spark, corpus):
    got = train_merges(corpus, 12, checkpoint_every=4)
    assert got == _ref_train(TEXTS, 12)


def test_encode_matches_python_reference(spark, corpus):
    merges = _ref_train(TEXTS, 12)
    rows = {r.doc_id: r for r in encode_tokens(corpus, merges).collect()}
    for i, t in enumerate(TEXTS):
        n_pt, n_bpe = _ref_encode_counts(t, merges)
        assert (rows[i].n_pretokens, rows[i].n_bpe_tokens) == (n_pt, n_bpe), t
        assert rows[i].n_bpe_tokens <= len(t)  # merging never grows


def test_greedy_overlap_semantics(spark):
    """'aaaa' with merge (a,a): greedy left-to-right gives [aa, aa]; 'aaa'
    gives [aa, a] — the replace-chain must reproduce exactly that."""
    df = spark.createDataFrame([(1, "aaa aaaa")], "doc_id long, text string")
    # pretokens: 'aaa' and ' aaaa' (the space is a symbol of the second)
    r = encode_tokens(df, [("a", "a")]).collect()[0]
    assert r.n_pretokens == 2 and r.n_bpe_tokens == 2 + 3  # [aa,a] + [' ',aa,aa]
    r2 = encode_tokens(df, [("a", "a"), ("aa", "aa")]).collect()[0]
    assert r2.n_bpe_tokens == 2 + 2  # second round merges the two 'aa' in 'aaaa'


def test_wholedoc_equals_per_pretoken(spark, corpus):
    """doc_seq_col's double-separator boundary claim, checked directly: the
    replace chain on the whole-doc sequence equals applying it per pretoken."""
    merges = _ref_train(TEXTS, 8)
    whole = {
        r.doc_id: r.m
        for r in corpus.select(
            "doc_id", apply_merges_col(doc_seq_col(F.col("text")), merges).alias("m")
        ).collect()
    }
    from osmgraft.operators.bpe import CSEP, GSEP

    for i, t in enumerate(TEXTS):
        parts = []
        for tok in _SPLIT.findall(t):
            seq = "".join(f"{USEP}{c}{CSEP}" for c in tok)
            for a, b in merges:
                seq = seq.replace(
                    f"{USEP}{a}{CSEP}{USEP}{b}{CSEP}", f"{USEP}{a}{b}{CSEP}"
                )
            parts.append(seq)
        assert whole[i] == GSEP.join(parts), i


def test_merge_boundary_never_crosses_pretokens(spark):
    """' a' and 'a' pretokens side by side: a merge ('a', 'a') must not fuse
    symbols across the pretoken boundary."""
    df = spark.createDataFrame([(1, "a a")], "doc_id long, text string")
    # pretokens: ['a', ' a'] — chars 'a' / ' ','a'. Merge (a,a) finds nothing.
    r = encode_tokens(df, [("a", "a")]).collect()[0]
    assert (r.n_pretokens, r.n_bpe_tokens) == (2, 3)


def test_registry_literal_regenerates(spark):
    """The _BPE_MERGES literal in queries.py IS the trainer's output on the
    sf0.01 corpus — trainer determinism pinned end to end."""
    from osmgraft.queries import _BPE_MERGES

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    assert train_merges(docs, 24) == _BPE_MERGES
