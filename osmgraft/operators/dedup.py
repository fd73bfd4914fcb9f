"""Deduplication operators for the training-data pipeline (brief §dedup):
exact (hash groupBy), MinHash+LSH banding, SimHash, n-gram Jaccard verify.

Spark-first: every kernel is a JVM Column expression (md5/conv/array lambdas),
so the whole pipeline stays inside whole-stage codegen — no Python workers.
All hash values are 60-bit ints (15 hex chars of md5) reproducible in DuckDB,
making even the LSH banding oracle-checkable.

Scale notes (100 TB): the LSH path is shuffle-bounded by the band join —
``groupBy(band_id, band_val)`` keys are uniformly-distributed hashes, so no
skew; candidate pairs are verified with exact Jaccard BEFORE leaving the
reducer (semi-join shape). Exact dedup is a single hash aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osmgraft.functions.text import (
    md5_long,
    normalize_text,
    shingles,
    sql_normalize_text,
    sql_shingles,
    sql_tokens,
)


# --- exact dedup --------------------------------------------------------------
def dedup_exact_groups(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Groups of byte-identical (normalized) documents: one row per content
    hash with >1 member."""
    h = F.md5(normalize_text(F.col(text_col))).alias("content_hash")
    return (
        docs.select(h, F.col(id_col))
        .groupBy("content_hash")
        .agg(F.count(F.lit(1)).alias("n_dups"), F.min(id_col).alias("canonical_id"))
        .filter(F.col("n_dups") > 1)
    )


def sql_dedup_exact_groups(table: str = "documents") -> str:
    return f"""
SELECT content_hash, count(*) AS n_dups, min(doc_id) AS canonical_id
FROM (SELECT md5({sql_normalize_text('text')}) AS content_hash, doc_id FROM {table}) t
GROUP BY content_hash HAVING count(*) > 1
""".strip()


# --- MinHash + LSH -------------------------------------------------------------
def minhash_col(sh, seed: int):
    """min over shingles of md5_long(seed || '|' || shingle); LONG_MAX for
    empty shingle sets (so empty docs never collide into one band)."""
    hashed = F.transform(sh, lambda s: md5_long(F.concat(F.lit(f"{seed}|"), s)))
    return F.coalesce(F.array_min(hashed), F.lit(2**62))


def sql_minhash(sh_expr: str, seed: int) -> str:
    return (
        f"coalesce(list_min(list_transform({sh_expr}, "
        f"s -> ('0x' || substr(md5('{seed}|' || s), 1, 15))::BIGINT)), 4611686018427387904)"
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    n_hashes: int = 8,
    bands: int = 4,
    jaccard_threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 3,
) -> DataFrame:
    """Candidate near-dup pairs by banded minhash, verified with exact Jaccard
    over distinct shingle sets. Returns (doc_a, doc_b, inter_cnt, union_cnt)
    with doc_a < doc_b and inter/union ≥ threshold (integer columns so the
    oracle hash is float-free)."""
    rows_per_band = n_hashes // bands
    sh = shingles(F.col(text_col), ngram).alias("sh")
    base = docs.select(F.col(id_col).alias("doc_id"), sh).filter(F.size("sh") > 0)
    mh = base.select(
        "doc_id",
        "sh",
        *[minhash_col(F.col("sh"), s).alias(f"mh{s}") for s in range(n_hashes)],
    )
    band_cols = []
    for b in range(bands):
        parts = [F.col(f"mh{b * rows_per_band + r}").cast("string") for r in range(rows_per_band)]
        band_cols.append(F.md5(F.concat_ws(",", *parts)).alias(f"band{b}"))
    mh = mh.select("doc_id", "sh", *band_cols)

    pairs = None
    for b in range(bands):
        a = mh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"), F.col(f"band{b}").alias("bv"))
        c = mh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"), F.col(f"band{b}").alias("bv"))
        p = a.join(c, "bv").filter(F.col("doc_a") < F.col("doc_b")).drop("bv")
        pairs = p if pairs is None else pairs.unionByName(p)
    cand = pairs.dropDuplicates(["doc_a", "doc_b"])
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        cand.select(
            "doc_a",
            "doc_b",
            inter.alias("inter_cnt"),
            union.alias("union_cnt"),
        )
        # integer cross-multiply: inter/union >= t  ⇔  inter*DEN >= t*DEN*union
        .filter(
            F.col("inter_cnt") * F.lit(1000) >= F.lit(int(jaccard_threshold * 1000)) * F.col("union_cnt")
        )
    )


def sql_minhash_lsh_pairs(
    n_hashes: int = 8,
    bands: int = 4,
    jaccard_threshold: float = 0.5,
    table: str = "documents",
    ngram: int = 3,
) -> str:
    rows_per_band = n_hashes // bands
    sh = sql_shingles("text", ngram)
    mh_cols = ",\n    ".join(f"{sql_minhash('sh', s)} AS mh{s}" for s in range(n_hashes))
    band_cols = ",\n    ".join(
        "md5("
        + " || ',' || ".join(
            f"CAST(mh{b * rows_per_band + r} AS VARCHAR)" for r in range(rows_per_band)
        )
        + f") AS band{b}"
        for b in range(bands)
    )
    band_union = "\nUNION ALL\n".join(
        f"SELECT a.doc_id AS doc_a, a.sh AS sh_a, b.doc_id AS doc_b, b.sh AS sh_b "
        f"FROM banded a JOIN banded b ON a.band{b} = b.band{b} AND a.doc_id < b.doc_id"
        for b in range(bands)
    )
    thr = int(jaccard_threshold * 1000)
    return f"""
WITH sh_t AS (SELECT doc_id, {sh} AS sh FROM {table}),
base AS (SELECT doc_id, sh FROM sh_t WHERE len(sh) > 0),
mh_t AS (SELECT doc_id, sh, {mh_cols} FROM base),
banded AS (SELECT doc_id, sh, {band_cols} FROM mh_t),
cand AS (SELECT DISTINCT doc_a, doc_b, sh_a, sh_b FROM ({band_union}) u)
SELECT doc_a, doc_b,
  len(list_intersect(sh_a, sh_b)) AS inter_cnt,
  len(list_distinct(list_concat(sh_a, sh_b))) AS union_cnt
FROM cand
WHERE len(list_intersect(sh_a, sh_b)) * 1000 >= {thr} * len(list_distinct(list_concat(sh_a, sh_b)))
""".strip()


# --- SimHash --------------------------------------------------------------------
SIMHASH_BITS = 60  # md5_long is 60 bits


def _simhash_from_hashes(hs, bits: int):
    """Sum of 60 bit-majority terms; j is a Python int so shiftright gets a
    literal (Spark's shiftright numBits is not Column-typed)."""
    def bit_filter(j):
        # NB: must stay a ONE-arg lambda — pyspark treats two-arg lambdas as
        # (element, index), so a `j=j` default would receive the index Column
        return lambda h: F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1

    terms = [
        F.when(
            F.size(F.filter(hs, bit_filter(j))) * 2 > F.size(hs),
            F.lit(1 << j).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
        for j in range(bits)
    ]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def simhash_col(text, bits: int = SIMHASH_BITS):
    """60-bit SimHash over distinct lowercase tokens: bit j set iff more than
    half the token hashes have bit j set (strict majority — deterministic)."""
    from osmgraft.functions.text import tokens

    toks = F.array_distinct(tokens(normalize_text(text)))
    hs = F.transform(toks, lambda t: md5_long(t))
    return _simhash_from_hashes(hs, bits)


def sql_simhash(expr: str, bits: int = SIMHASH_BITS) -> str:
    toks = f"list_distinct({sql_tokens(sql_normalize_text(expr))})"
    hs = f"list_transform({toks}, t -> ('0x' || substr(md5(t), 1, 15))::BIGINT)"
    return (
        f"list_sum(list_transform(range(0, {bits}), j -> "
        f"CASE WHEN len(list_filter({hs}, h -> (h >> j) & 1 = 1)) * 2 > len({hs}) "
        f"THEN (1::BIGINT << j) ELSE 0::BIGINT END))"
    )


def simhash_table(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Two-step plan: materialize the token-hash array once, then the 60
    majority terms reference that column (avoids 60× re-tokenization)."""
    from osmgraft.functions.text import tokens

    toks = F.array_distinct(tokens(normalize_text(F.col(text_col))))
    staged = docs.select(
        F.col(id_col).alias("doc_id"), F.transform(toks, lambda t: md5_long(t)).alias("_hs")
    )
    return staged.select("doc_id", _simhash_from_hashes(F.col("_hs"), SIMHASH_BITS).alias("simhash"))
