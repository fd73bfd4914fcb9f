"""Byte-pair-encoding merge training + application, Spark-first.

The classic BPE construction (Sennrich et al. 2016, public): start from the
distinct pre-token table with corpus frequencies, repeatedly (1) count
adjacent symbol pairs weighted by pre-token frequency, (2) merge the most
frequent pair everywhere. Training is inherently sequential in the NUMBER OF
MERGES (each round depends on the previous merge), but each round is fully
distributed: one map-side-combined pair-count aggregation over the distinct
pre-token table + one JVM ``replace`` to apply the winner. The only driver
traffic per round is the single argmax row — the same bounded-scalar pattern
as knn's stats row. ``localCheckpoint`` every few rounds stops lineage
doubling (same discipline as dedup.connected_components).

Representation: every symbol is wrapped in an OPEN/CLOSE separator pair,
USEP+sym+CSEP (U+001F / U+001E, never in text), so a merge pair (a, b) is the
substring USEP+a+CSEP+USEP+b+CSEP and its replacement USEP+ab+CSEP. Because
adjacent matches share NO characters under this wrapping, one non-overlapping
leftmost ``replace`` merges every occurrence greedily left-to-right — exactly
standard BPE ('aaaa' + merge(a,a) → [aa][aa]; a naive single-delimiter
scheme consumes the shared boundary and silently skips every other pair in a
run, which is why the open/close pair exists). ``replace`` has identical
semantics in Spark and DuckDB, so APPLYING a fixed merge list is plain SQL on
both engines: the trainer is Spark-only (iterative argmax is not SQL), but
the encode path is oracle-gateable — see queries.bpe_encode, whose literal
merge table a pytest regenerates through this trainer and asserts equal.

Scale: the distinct pre-token table is vocabulary-sized (millions of rows at
100 TB, not trillions) and the per-round aggregation map-side combines, so
rounds are cheap; n_merges bounds the job count, not the data size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from osmgraft.functions.text import bpe_pretokens

USEP = "\x1f"  # opens every symbol
CSEP = "\x1e"  # closes every symbol
GSEP = "\x1d"  # pre-token boundary inside a whole-doc sequence


def pretoken_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """documents → (pretoken, cnt) over the GPT-2-style split (one shuffle)."""
    return (
        docs.select(F.explode(bpe_pretokens(F.col(text_col))).alias("pretoken"))
        .groupBy("pretoken")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _to_seq(col):
    """pretoken → wrapped symbol sequence: USEP+char+CSEP per character."""
    chars = F.filter(F.split(col, ""), lambda x: x != "")  # split('') pads an
    wrapped = F.transform(chars, lambda c: F.concat(F.lit(USEP), c, F.lit(CSEP)))
    return F.array_join(wrapped, "")                       # empty tail element


def _pairs(seq_col):
    """Wrapped sequence → array of adjacent (a, b) pairs, overlaps included
    (classic BPE pair counting). Symbols never contain the separators, so a
    split on either separator recovers them."""
    syms = F.expr(f"filter(split({seq_col}, '[{USEP}{CSEP}]'), x -> x <> '')")
    n = F.size(syms)
    return F.when(n < 2, F.array().cast("array<struct<a:string,b:string>>")).otherwise(
        F.zip_with(
            F.slice(syms, 1, n - 1),
            F.slice(syms, 2, n - 1),
            lambda a, b: F.struct(a.alias("a"), b.alias("b")),
        )
    )


def train_merges(
    docs: DataFrame, n_merges: int, text_col: str = "text", checkpoint_every: int = 8
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus; returns them in order.

    Deterministic: ties on pair count break by (a asc, b asc). Stops early if
    no pair occurs twice (merging singletons is vocabulary noise)."""
    vocab = pretoken_counts(docs, text_col).withColumn(
        "seq", _to_seq(F.col("pretoken"))
    )
    vocab = vocab.select("cnt", "seq").localCheckpoint()
    merges: list[tuple[str, str]] = []
    for r in range(n_merges):
        top = (
            vocab.select("cnt", F.explode(_pairs("seq")).alias("p"))
            .groupBy("p.a", "p.b")
            .agg(F.sum("cnt").alias("n"))
            .orderBy(F.desc("n"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["n"] < 2:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        pat = F.lit(f"{USEP}{a}{CSEP}{USEP}{b}{CSEP}")
        rep = F.lit(f"{USEP}{a}{b}{CSEP}")
        vocab = vocab.select("cnt", F.replace("seq", pat, rep).alias("seq"))
        if (r + 1) % checkpoint_every == 0:
            vocab = vocab.localCheckpoint()
    return merges


def apply_merges_col(seq_col, merges: list[tuple[str, str]]):
    """Column expr: apply a fixed merge list (in order) to a USEP sequence."""
    out = seq_col
    for a, b in merges:
        out = F.replace(
            out,
            F.lit(f"{USEP}{a}{CSEP}{USEP}{b}{CSEP}"),
            F.lit(f"{USEP}{a}{b}{CSEP}"),
        )
    return out


def sql_apply_merges(seq_expr: str, merges: list[tuple[str, str]]) -> str:
    """DuckDB spelling of apply_merges_col (same non-overlapping replace)."""
    out = seq_expr

    def q(s: str) -> str:
        return s.replace("'", "''")

    for a, b in merges:
        out = (
            f"replace({out}, chr(31)||'{q(a)}'||chr(30)||chr(31)||'{q(b)}'||chr(30), "
            f"chr(31)||'{q(a)}{q(b)}'||chr(30))"
        )
    return out


def doc_seq_col(text_col):
    """Whole document as ONE wrapped sequence: per-pretoken symbol runs
    joined by GSEP. A merge pattern (USEP+a+CSEP+USEP+b+CSEP) cannot span the
    boundary — the GSEP sits between b's CSEP and the next USEP — so applying
    the replace chain to the whole-doc string is exactly per-pretoken BPE,
    with no explode and no re-aggregation."""
    per_tok = F.transform(
        bpe_pretokens(text_col),
        lambda t: F.array_join(
            F.transform(
                F.filter(F.split(t, ""), lambda x: x != ""),
                lambda c: F.concat(F.lit(USEP), c, F.lit(CSEP)),
            ),
            "",
        ),
    )
    return F.array_join(per_tok, GSEP)


def encode_tokens(
    docs: DataFrame, merges: list[tuple[str, str]], text_col: str = "text"
) -> DataFrame:
    """Apply a fixed merge list to every document: (doc_id, n_pretokens,
    n_bpe_tokens, stream_hash). stream_hash is a 60-bit hash of the full
    merged sequence, so the gate pins every merge application, not just the
    counts. Entirely JVM string expressions per row — zero shuffles."""
    from osmgraft.functions.text import md5_long

    merged = apply_merges_col(doc_seq_col(F.col(text_col)), merges)
    return docs.select(
        "doc_id",
        F.size(bpe_pretokens(F.col(text_col))).cast("long").alias("n_pretokens"),
        merged.alias("_m"),
    ).select(
        "doc_id",
        "n_pretokens",
        F.expr(f"size(filter(split(_m, '{USEP}'), x -> x <> ''))")
        .cast("long")
        .alias("n_bpe_tokens"),
        md5_long(F.col("_m")).alias("stream_hash"),
    )
