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
# Each shingle is hashed ONCE (md5_long); the n permutations are derived by
# modular affine mixing g_k(h) = ((h % P) * A_k + B_k) % P with P = 2^31 - 1.
# All intermediates stay < 2^62, so the arithmetic is overflow-safe (and thus
# bit-identical) in both Spark and DuckDB — 8x fewer md5 calls than hashing
# per (seed, shingle).
_MH_P = 2_147_483_647  # 2^31 - 1 (prime)
_MH_SENTINEL = 4_611_686_018_427_387_904  # 2^62: empty docs never share a band


def _mh_coef(k: int) -> tuple[int, int]:
    return (48271 + 12345 * k) % _MH_P, (11213 * k + 1) % _MH_P


def minhash_col(hs, seed: int):
    """min over pre-hashed shingles of the seed's affine permutation."""
    a, b = _mh_coef(seed)
    mixed = F.transform(hs, lambda h: ((h % _MH_P) * a + b) % _MH_P)
    return F.coalesce(F.array_min(mixed), F.lit(_MH_SENTINEL))


def sql_minhash(hs_expr: str, seed: int) -> str:
    a, b = _mh_coef(seed)
    return (
        f"coalesce(list_min(list_transform({hs_expr}, "
        f"h -> ((h % {_MH_P}) * {a} + {b}) % {_MH_P})), {_MH_SENTINEL})"
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
    oracle hash is float-free).

    Physical plan (100 TB shape): shingle+hash once → persist the narrow
    (doc_id, band_id, band_hash) table → ONE self-equi-join on
    (band_id, band_hash) produces candidates (keys are uniform hashes, so no
    salting needed) → candidate id-pairs (small) broadcast-join back to the
    shingle table for exact Jaccard verification. Shingle arrays are never
    shuffled through the candidate join."""
    rows_per_band = n_hashes // bands
    sh = shingles(F.col(text_col), ngram).alias("sh")
    base = docs.select(F.col(id_col).alias("doc_id"), sh).filter(F.size("sh") > 0)
    base = base.persist()  # reused: minhash pass + two verification sides
    hs = base.select("doc_id", F.transform(F.col("sh"), md5_long).alias("hs"))
    mh = hs.select(
        "doc_id",
        *[minhash_col(F.col("hs"), s).alias(f"mh{s}") for s in range(n_hashes)],
    )
    band_structs = []
    for b in range(bands):
        parts = [F.col(f"mh{b * rows_per_band + r}").cast("string") for r in range(rows_per_band)]
        band_structs.append(
            F.struct(F.lit(b).alias("band_id"), F.md5(F.concat_ws(",", *parts)).alias("bv"))
        )
    banded = (
        mh.select("doc_id", F.explode(F.array(*band_structs)).alias("bd"))
        .select("doc_id", F.col("bd.band_id").alias("band_id"), F.col("bd.bv").alias("bv"))
        .persist()
    )
    a = banded.select(F.col("doc_id").alias("doc_a"), "band_id", "bv")
    c = banded.select(F.col("doc_id").alias("doc_b"), "band_id", "bv")
    cand = (
        a.join(c, ["band_id", "bv"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    sha = base.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    shb = base.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    # Pin the promised plan: the (small, banding-pruned) candidate side is
    # broadcast into BOTH verify joins so the shingle table never shuffles —
    # without the hint Catalyst may stats-estimate its way into shuffling sha.
    ver = F.broadcast(cand).join(sha, "doc_a")
    ver = F.broadcast(ver.select("doc_a", "doc_b", "sh_a")).join(shb, "doc_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        ver.select(
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
    hs = "list_transform(sh, s -> ('0x' || substr(md5(s), 1, 15))::BIGINT)"
    mh_cols = ",\n    ".join(f"{sql_minhash('hs', s)} AS mh{s}" for s in range(n_hashes))
    band_rows = "\nUNION ALL\n".join(
        f"SELECT doc_id, {b} AS band_id, md5("
        + " || ',' || ".join(
            f"CAST(mh{b * rows_per_band + r} AS VARCHAR)" for r in range(rows_per_band)
        )
        + ") AS bv FROM mh_t"
        for b in range(bands)
    )
    thr = int(jaccard_threshold * 1000)
    return f"""
WITH sh_t AS (SELECT doc_id, {sh} AS sh FROM {table}),
base AS (SELECT doc_id, sh FROM sh_t WHERE len(sh) > 0),
hs_t AS (SELECT doc_id, {hs} AS hs FROM base),
mh_t AS (SELECT doc_id, {mh_cols} FROM hs_t),
banded AS ({band_rows}),
cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         FROM banded a JOIN banded b
           ON a.band_id = b.band_id AND a.bv = b.bv AND a.doc_id < b.doc_id)
SELECT doc_a, doc_b,
  len(list_intersect(sa.sh, sb.sh)) AS inter_cnt,
  len(list_distinct(list_concat(sa.sh, sb.sh))) AS union_cnt
FROM cand
JOIN base sa ON sa.doc_id = doc_a
JOIN base sb ON sb.doc_id = doc_b
WHERE len(list_intersect(sa.sh, sb.sh)) * 1000 >= {thr} * len(list_distinct(list_concat(sa.sh, sb.sh)))
""".strip()


# --- exact n-gram Jaccard (inverted shingle index — no LSH approximation) --------
def jaccard_ngram_pairs(
    docs: DataFrame,
    jaccard_threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 3,
    max_df: int | None = None,
) -> DataFrame:
    """EXACT n-gram Jaccard near-dup pairs via an inverted shingle index —
    the non-probabilistic sibling of minhash_lsh_pairs (same output shape:
    doc_a < doc_b, integer inter/union counts, threshold by integer
    cross-multiply). Exact recall at ANY threshold: every pair sharing at
    least one shingle is scored.

    Physical plan (100 TB shape): explode to a narrow (shingle, doc_id)
    posting table → self-equi-join on the shingle → pair counts are the
    intersections (one shuffle on uniformly-hashed shingle strings, one on
    id pairs) → per-doc sizes broadcast back (doc-count-sized). Cost is
    sum(df^2) over shingle document frequencies — inherently skew-exposed
    on stop-shingles, unlike LSH. ``max_df`` caps posting lengths (standard
    df-pruning): pairs whose overlap lives only in ultra-common shingles
    are then missed, a documented exactness trade; default None = exact."""
    sh = shingles(F.col(text_col), ngram).alias("sh")
    base = docs.select(F.col(id_col).alias("doc_id"), sh).filter(F.size("sh") > 0)
    sizes = base.select("doc_id", F.size("sh").alias("n_sh"))
    post = base.select("doc_id", F.explode("sh").alias("s"))
    if max_df is not None:
        keep = post.groupBy("s").agg(F.count(F.lit(1)).alias("df")).where(
            F.col("df") <= max_df
        )
        post = post.join(keep.select("s"), "s")
    a = post.select(F.col("doc_id").alias("doc_a"), "s")
    b = post.select(F.col("doc_id").alias("doc_b"), "s")
    inter = (
        a.join(b, "s")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter_cnt"))
    )
    thr = int(jaccard_threshold * 1000)
    return (
        inter.join(F.broadcast(sizes.select(F.col("doc_id").alias("doc_a"),
                                            F.col("n_sh").alias("na"))), "doc_a")
        .join(F.broadcast(sizes.select(F.col("doc_id").alias("doc_b"),
                                       F.col("n_sh").alias("nb"))), "doc_b")
        .select(
            "doc_a", "doc_b", "inter_cnt",
            (F.col("na") + F.col("nb") - F.col("inter_cnt")).alias("union_cnt"),
        )
        .filter(F.col("inter_cnt") * F.lit(1000) >= F.lit(thr) * F.col("union_cnt"))
    )


def sql_jaccard_ngram_pairs(
    jaccard_threshold: float = 0.5, table: str = "documents", ngram: int = 3
) -> str:
    sh = sql_shingles("text", ngram)
    thr = int(jaccard_threshold * 1000)
    return f"""
WITH base AS (SELECT doc_id, {sh} AS sh FROM {table}),
ne AS (SELECT doc_id, sh, len(sh) AS n_sh FROM base WHERE len(sh) > 0),
post AS (SELECT doc_id, unnest(sh) AS s FROM ne),
inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter_cnt
          FROM post a JOIN post b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
SELECT doc_a, doc_b, inter_cnt,
       (sa.n_sh + sb.n_sh - inter_cnt) AS union_cnt
FROM inter
JOIN ne sa ON sa.doc_id = doc_a
JOIN ne sb ON sb.doc_id = doc_b
WHERE inter_cnt * 1000 >= {thr} * (sa.n_sh + sb.n_sh - inter_cnt)
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
    # CAST: DuckDB's list_sum returns HUGEINT, which value-hashes differently
    # than Spark's BIGINT in the cross-engine gate (VERDICT r1 #2).
    return (
        f"CAST(list_sum(list_transform(range(0, {bits}), j -> "
        f"CASE WHEN len(list_filter({hs}, h -> (h >> j) & 1 = 1)) * 2 > len({hs}) "
        f"THEN (1::BIGINT << j) ELSE 0::BIGINT END)) AS BIGINT)"
    )


def simhash_table(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Explode + bit-count aggregation: higher-order-function lambdas are
    interpreted per element (120 passes/row for 60 bits), so instead the token
    hashes are exploded and each bit counted with a codegen'd ``sum`` —
    everything stays in whole-stage codegen. Tokens of one doc are co-located
    after explode, so map-side partial aggregation collapses the groupBy to
    ~one row per doc before any shuffle (scale-safe). ``explode_outer`` keeps
    token-less docs: all counts 0 → strict majority fails → simhash 0."""
    from osmgraft.functions.text import tokens

    toks = F.array_distinct(tokens(normalize_text(F.col(text_col))))
    staged = docs.select(
        F.col(id_col).alias("doc_id"), F.transform(toks, lambda t: md5_long(t)).alias("_hs")
    )
    ex = staged.select("doc_id", F.explode_outer("_hs").alias("h"))
    cnt = ex.groupBy("doc_id").agg(
        F.count("h").alias("n"),
        *[
            F.sum(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1))).alias(f"c{j}")
            for j in range(SIMHASH_BITS)
        ],
    )
    bit_terms = [
        F.when(F.col(f"c{j}") * 2 > F.col("n"), F.lit(1 << j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        for j in range(SIMHASH_BITS)
    ]
    sim = bit_terms[0]
    for t in bit_terms[1:]:
        sim = sim + t
    return cnt.select("doc_id", sim.alias("simhash"))


# --- dedup group assembly: connected components over near-dup pairs ----------

def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iters: int = 25,
) -> DataFrame:
    """(id, comp) for every id appearing in the pair table, comp = the
    minimum id reachable through the near-dup graph — the group-assembly
    step every dedup pipeline runs after pair detection (keep one canonical
    doc per component).

    Distributed iterative min-label propagation: each round joins the
    current labels across the symmetrized edge list and takes the per-node
    min; terminates when a round changes nothing (checked with one count
    job) or at max_iters.  localCheckpoint per round cuts the lineage so
    plans don't double (same discipline as operators/knn.py).

    Scale shape: rounds = graph diameter; near-dup components are tiny
    (dozens of docs), so a handful of shuffles on the edge list.  For
    adversarial long-chain graphs the O(log n) large-star/small-star
    variant would replace the inner step; the join/agg skeleton is the
    same."""
    sym = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .unionByName(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iters):
        prop = (
            sym.join(labels.withColumnRenamed("id", "src"), "src")
            .select(F.col("dst").alias("id"), "comp")
        )
        new_labels = (
            labels.unionByName(prop)
            .groupBy("id")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .where(F.col("n.comp") != F.col("o.comp"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds "
            f"({changed} labels still changing) — the graph diameter exceeds "
            "max_iters; raise it (or switch to a large-star/small-star step). "
            "Returning partial labels silently would split components."
        )
    return labels


def sql_connected_components(
    jaccard_threshold: float = 0.5, table: str = "documents", ngram: int = 3
) -> str:
    """Recursive-CTE twin: transitive closure over the exact-Jaccard pair
    set, then per-node min reachable id."""
    pairs = sql_jaccard_ngram_pairs(jaccard_threshold, table, ngram)
    return f"""WITH RECURSIVE pairs AS ({pairs}),
sym AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION SELECT doc_b, doc_a FROM pairs),
reach(src, dst) AS (
  SELECT src, dst FROM sym
  UNION
  SELECT r.src, e.dst FROM reach r JOIN sym e ON e.src = r.dst
)
SELECT src AS id, least(src, min(dst)) AS comp FROM reach GROUP BY src"""


# --- content-defined chunking (CDC) --------------------------------------------
#
# Partial-duplicate detection: split every document at content-defined
# boundaries, hash the chunks, and find chunks shared across documents —
# the storage-dedup technique (LBFS/Rabin, FastCDC) applied to corpus
# curation, where it catches documents that share paragraphs without being
# near-duplicates overall (boilerplate, quoted blocks, template text).
#
# Boundary rule: position i ends a chunk when the 60-bit hash of the
# W-character window ENDING at i satisfies hash % MASK == 0 (expected chunk
# ≈ MASK chars). Using a windowed hash (each position judged independently
# from its own W chars) instead of a stateful Rabin scan keeps the whole
# operator a per-row array expression — no sequential state, no Python, no
# UDF — and boundaries still self-synchronize after edits exactly like
# classic CDC: an insertion only disturbs the W-1 windows that overlap it.
# No min/max chunk bounds for the same reason (they reintroduce the
# sequential dependency); MASK controls the expected size instead.

CDC_W = 16      # boundary-window chars
CDC_MASK = 64   # expected chunk size (chars)


def _cdc_cuts(text, w: int, mask: int):
    """Array of cut positions [0, b1, b2, …, L] for ``text`` (JVM expr)."""
    L = F.length(text)
    pos = F.when(L >= w, F.sequence(F.lit(w), L)).otherwise(
        F.array().cast("array<int>")
    )
    bnds = F.filter(
        F.transform(
            pos,
            lambda i: F.when(
                md5_long(F.substring(text, i - (w - 1), w)) % mask == 0, i
            ),
        ),
        lambda x: x.isNotNull(),
    )
    return F.concat(
        F.array(F.lit(0)),
        F.filter(bnds, lambda b: b < L),
        F.array(L),
    )


def cdc_chunks(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    w: int = CDC_W,
    mask: int = CDC_MASK,
) -> DataFrame:
    """documents → one row per chunk: (doc_id, chunk_idx, chunk_hash,
    chunk_len).

    Pure JVM array expressions per row (substring windows + md5 in codegen),
    then one explode — embarrassingly parallel, no shuffle at all until a
    consumer aggregates. The cuts array is materialized with withColumn so
    the chunk-extraction lambda references a bound attribute, not the
    boundary pipeline (see text.shingles on HOF recapture cost)."""
    t = F.col(text_col)
    d = docs.withColumn("_cuts", _cdc_cuts(t, w, mask))
    chunk = F.transform(
        F.sequence(F.lit(0), F.size("_cuts") - 2),
        lambda j: F.substring(
            t,
            F.element_at("_cuts", j + 1) + 1,
            F.element_at("_cuts", j + 2) - F.element_at("_cuts", j + 1),
        ),
    )
    return (
        d.select(id_col, F.posexplode(chunk).alias("chunk_idx", "_chunk"))
        .filter(F.length("_chunk") > 0)
        .select(
            id_col,
            "chunk_idx",
            md5_long(F.col("_chunk")).alias("chunk_hash"),
            F.length("_chunk").alias("chunk_len"),
        )
    )


def sql_cdc_chunks(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    w: int = CDC_W,
    mask: int = CDC_MASK,
) -> str:
    """DuckDB twin of cdc_chunks (same windowed-hash boundary spec)."""
    md5w = (
        f"('0x' || substr(md5(substring({text_col}, i - {w - 1}, {w})), 1, 15))::BIGINT"
    )
    return f"""
WITH cut AS (
  SELECT {id_col}, {text_col},
         [0] ||
         list_filter(
           list_filter(
             list_transform(range({w}, length({text_col}) + 1),
                            i -> CASE WHEN {md5w} % {mask} = 0 THEN i END),
             x -> x IS NOT NULL),
           b -> b < length({text_col})) ||
         [length({text_col})] AS cuts
  FROM {table}
),
ch AS (
  SELECT {id_col},
         unnest(list_transform(range(0, len(cuts) - 1),
                j -> {{'chunk_idx': j,
                       'chunk': substring({text_col}, cuts[j + 1] + 1,
                                          cuts[j + 2] - cuts[j + 1])}})) AS c
  FROM cut
)
SELECT {id_col}, c.chunk_idx AS chunk_idx,
       ('0x' || substr(md5(c.chunk), 1, 15))::BIGINT AS chunk_hash,
       length(c.chunk) AS chunk_len
FROM ch WHERE length(c.chunk) > 0"""


def cdc_shared_chunks(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    w: int = CDC_W,
    mask: int = CDC_MASK,
    min_docs: int = 2,
) -> DataFrame:
    """Chunks appearing in ≥ min_docs distinct documents:
    (chunk_hash, chunk_len, n_docs, n_occurrences) — the cross-document
    boilerplate report. One hash aggregation with map-side combine over the
    shuffle-free chunk stream; at 100 TB the groupBy key is a uniform 60-bit
    hash, so no skew handling is needed."""
    return (
        cdc_chunks(docs, id_col, text_col, w, mask)
        .groupBy("chunk_hash", "chunk_len")
        .agg(
            F.countDistinct(id_col).alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
        )
        .filter(F.col("n_docs") >= min_docs)
    )


def sql_cdc_shared_chunks(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    w: int = CDC_W,
    mask: int = CDC_MASK,
    min_docs: int = 2,
) -> str:
    return f"""
WITH chunks AS ({sql_cdc_chunks(table, id_col, text_col, w, mask)})
SELECT chunk_hash, chunk_len,
       count(DISTINCT {id_col}) AS n_docs, count(*) AS n_occurrences
FROM chunks GROUP BY chunk_hash, chunk_len
HAVING count(DISTINCT {id_col}) >= {min_docs}"""


def dedup_clusters(docs: DataFrame, **minhash_kwargs) -> DataFrame:
    """Near-duplicate CLUSTERS — what a curation pipeline actually drops by:
    the verified minhash pairs (minhash_lsh_pairs) form an edge set and
    connected components (graph.cc_two_level: banded union-find + size-gated
    residual merge) label each group; per clustered doc we emit
    (cluster_id = min doc_id of the group, doc_id, is_survivor) where the
    canonical minimum survives and the rest are the dedup kill list.
    Docs in no verified pair are trivially their own survivors and are NOT
    listed (callers anti-join the kill list — the output stays
    near-dup-sized, not corpus-sized, which is what you want at 100 TB).

    Pairwise thresholds are not transitive, so a cluster may span docs whose
    direct Jaccard is below threshold — the standard, documented semantics
    of dedup-by-components (same choice as BigQuery/SlimPajama pipelines)."""
    from osmgraft.operators.graph import cc_two_level

    pairs = minhash_lsh_pairs(docs, **minhash_kwargs).select(
        F.col("doc_a").alias("u"), F.col("doc_b").alias("v")
    )
    labels = cc_two_level(pairs, lambda c: F.shiftright(c, 10))
    return labels.select(
        F.col("comp").alias("cluster_id"),
        F.col("id").alias("doc_id"),
        (F.col("id") == F.col("comp")).alias("is_survivor"),
    )


def sql_dedup_clusters(**minhash_kwargs) -> str:
    """DuckDB twin: recursive-CTE transitive closure over the same verified
    pairs — a genuinely different algorithm than the star/union-find path."""
    pairs_sql = sql_minhash_lsh_pairs(**minhash_kwargs)
    return f"""WITH RECURSIVE prs AS (SELECT doc_a, doc_b FROM ({pairs_sql})),
sym AS (SELECT doc_a AS u, doc_b AS v FROM prs UNION SELECT doc_b, doc_a FROM prs),
nodes AS (SELECT DISTINCT u AS id FROM sym),
reach(id, cur) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT r.id, s.v FROM reach r JOIN sym s ON s.u = r.cur),
lab AS (SELECT id, min(cur) AS cluster_id FROM reach GROUP BY id)
SELECT cluster_id, id AS doc_id, (id = cluster_id) AS is_survivor FROM lab"""


# --- edit-distance near-dup join (pigeonhole segment candidates) ------------------
def levenshtein_neardup_pairs(
    docs: DataFrame,
    k: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """All pairs within Levenshtein distance <= ``k`` — the fuzzy-dedup
    primitive for captions/titles (typo variants survive MinHash only when
    the shingle overlap stays high; edit distance is the metric the curation
    briefs actually state).

    Candidate scheme (PassJoin pigeonhole — Li/Deng/Feng, ICDE'11, public
    algorithm): split each string of length ``la >= k+1`` into ``k+1``
    disjoint segments (boundaries ``(i*la) div (k+1)``).  An optimal
    alignment of a pair with ``ed <= k`` has at most ``k`` edits, so at
    least ONE segment of the shorter string survives verbatim in the longer
    one, shifted by at most ``k`` positions (each indel shifts by one).
    The probe side therefore enumerates, for every candidate shorter length
    ``la in [len-k, len]`` and segment ``i``, every substring of itself with
    the segment's exact length within the +-k start window — a provably
    complete candidate set: (k+1)^2 * (2k+1) probe keys per row (45 at k=2),
    3 index keys per row, everything JVM ``transform``/``substring``
    expressions inside whole-stage codegen.  Strings shorter than ``k+1``
    can't pigeonhole (some segment is empty); any partner is then <= 2k
    chars, so the tiny stratum (len <= 2k) self-joins all-pairs — a
    vanishing, length-bounded subset of a caption lake.

    Verification is EXACT (``F.levenshtein``) on the distinct candidate
    id-pairs, so the pigeonhole scheme affects cost only, never recall.

    100 TB shape: one exchange on the (la, i, segment) key — uniformly
    hash-partitioned unless the corpus repeats boilerplate segments (same
    caveat as jaccard_ngram_pairs; pre-dedup exact duplicates first).  The
    verify join ships only candidate ids + the two texts; no driver
    collection anywhere.

    Returns (doc_a, doc_b, dist) with doc_a < doc_b, one row per unordered
    pair.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    kp1 = k + 1
    base = (
        docs.select(
            F.col(id_col).alias("id"),
            F.col(text_col).alias("txt"),
            F.length(text_col).alias("len"),
        )
        .filter(F.col("txt").isNotNull())
    )

    # Index side: the k+1 disjoint segments of every string with len >= k+1
    # (each segment is non-empty there: floor boundaries differ by >= 1).
    idx = (
        base.filter(F.col("len") >= kp1)
        .select(
            F.col("id").alias("id_a"),
            F.col("len").alias("len_a"),
            F.explode(
                F.expr(
                    f"""transform(sequence(0, {k}), i -> struct(
                          i AS i,
                          substring(txt, (i * len) div {kp1} + 1,
                                    ((i + 1) * len) div {kp1} - (i * len) div {kp1}) AS seg))"""
                )
            ).alias("kv"),
        )
        .select("id_a", "len_a", F.col("kv.i").alias("ii"), F.col("kv.seg").alias("seg"))
    )

    # Probe side: for every candidate shorter length la (>= k+1, within k of
    # our own), every segment index, every start inside the +-k shift window
    # (the window is never empty: p <= len - seg_len and p <= p + k).
    probe = base.select(
        F.col("id").alias("id_b"),
        F.col("len").alias("len_b"),
        F.explode(
            F.expr(
                f"""flatten(transform(
                      IF(len >= {kp1}, sequence(greatest({kp1}, len - {k}), len),
                         CAST(array() AS array<int>)),
                      la -> flatten(transform(sequence(0, {k}), i ->
                        transform(
                          sequence(greatest(0, (i * la) div {kp1} - {k}),
                                   least(len - (((i + 1) * la) div {kp1} - (i * la) div {kp1}),
                                         (i * la) div {kp1} + {k})),
                          s -> struct(
                            la AS la, i AS pi,
                            substring(txt, s + 1,
                                      ((i + 1) * la) div {kp1} - (i * la) div {kp1}) AS pseg))))))"""
            )
        ).alias("kv"),
    ).select(
        "id_b", "len_b", F.col("kv.la").alias("la"),
        F.col("kv.pi").alias("pi"), F.col("kv.pseg").alias("pseg"),
    )

    order_ab = (F.col("len_a") < F.col("len_b")) | (
        (F.col("len_a") == F.col("len_b")) & (F.col("id_a") < F.col("id_b"))
    )
    cand_main = (
        idx.join(
            probe,
            (idx.len_a == probe.la) & (idx.ii == probe.pi) & (idx.seg == probe.pseg),
        )
        .filter(order_ab)
        .select("id_a", "id_b")
    )

    # Tiny stratum: both partners of any pair involving len < k+1 are <= 2k
    # chars; all-pairs there (bounded by the tiny-string count, broadcast).
    tiny = base.filter(F.col("len") <= 2 * k).select(
        F.col("id").alias("tid"), F.col("len").alias("tlen")
    )
    cand_tiny = (
        tiny.select(F.col("tid").alias("id_a"), F.col("tlen").alias("len_a"))
        .join(
            F.broadcast(
                tiny.select(F.col("tid").alias("id_b"), F.col("tlen").alias("len_b"))
            ),
            (F.abs(F.col("len_a") - F.col("len_b")) <= k) & order_ab,
        )
        .select("id_a", "id_b")
    )

    cands = cand_main.unionByName(cand_tiny).distinct()
    ta = base.select(F.col("id").alias("id_a"), F.col("txt").alias("txt_a"))
    tb = base.select(F.col("id").alias("id_b"), F.col("txt").alias("txt_b"))
    return (
        cands.join(ta, "id_a")
        .join(tb, "id_b")
        .withColumn("dist", F.levenshtein("txt_a", "txt_b"))
        .filter(F.col("dist") <= k)
        .select(
            F.least("id_a", "id_b").alias("doc_a"),
            F.greatest("id_a", "id_b").alias("doc_b"),
            F.col("dist").cast("int").alias("dist"),
        )
    )


# --- prefix-filtered exact Jaccard (PPJoin discipline) ----------------------------
def jaccard_prefix_pairs(
    docs: DataFrame,
    jaccard_threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 3,
) -> DataFrame:
    """EXACT n-gram Jaccard pairs with PREFIX FILTERING (Chaudhuri et al.
    SSJoin / Xiao et al. PPJoin, WWW'08 — public algorithms): identical
    output to ``jaccard_ngram_pairs``, sub-quadratic candidate volume.

    Prefix-filter lemma: order every doc's shingles by one GLOBAL total
    order (df ascending, then shingle text — rarest-first minimizes
    candidates; any fixed order preserves correctness).  With n = |doc| and
    p = n − ⌈τ·n⌉ + 1, two docs with J ≥ τ share ≥ ⌈τ·max(n_a, n_b)⌉
    shingles, and the globally SMALLEST shared shingle must sit inside both
    length-p prefixes (were it outside either, that doc's ≤ ⌈τ·n⌉ − 1
    suffix slots could not hold the whole overlap).  Candidates are
    therefore the prefix-posting self-join; each candidate pair is verified
    with the exact ``array_intersect`` of the two FULL shingle arrays.

    100 TB shape: posting volume drops from Σ df² over ALL shingles (the
    inverted-index op's stop-shingle quadratic exposure) to Σ df² over
    PREFIX occurrences only — prefixes hold each doc's rarest shingles, so
    hot shingles fall out of the join entirely without ``max_df``'s recall
    trade.  Costs one extra exchange (the df table) and a per-doc window
    bounded by doc length."""
    thr = int(jaccard_threshold * 1000)
    sh = shingles(F.col(text_col), ngram).alias("sh")
    base = docs.select(F.col(id_col).alias("doc_id"), sh).filter(F.size("sh") > 0)
    post = base.select(
        "doc_id", F.size("sh").alias("n_sh"), F.explode("sh").alias("s")
    )
    df_tab = post.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    from pyspark.sql import Window as W

    ranked = post.join(df_tab, "s").withColumn(
        "rk", F.row_number().over(W.partitionBy("doc_id").orderBy("df", "s"))
    )
    # p = n − ⌈thr·n/1000⌉ + 1, integer ceil
    prefix = ranked.filter(
        F.col("rk") <= F.expr(f"n_sh - (({thr} * n_sh + 999) div 1000) + 1")
    ).select("doc_id", "s")
    cand = (
        prefix.select(F.col("doc_id").alias("doc_a"), "s")
        .join(prefix.select(F.col("doc_id").alias("doc_b"), "s"), "s")
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    arr_a = base.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sha"))
    arr_b = base.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("shb"))
    return (
        cand.join(arr_a, "doc_a")
        .join(arr_b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("sha", "shb")).cast("long").alias("inter_cnt"),
            (F.size("sha") + F.size("shb")
             - F.size(F.array_intersect("sha", "shb"))).cast("long").alias("union_cnt"),
        )
        .filter(F.col("inter_cnt") * F.lit(1000) >= F.lit(thr) * F.col("union_cnt"))
    )


def duplicate_substring_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    gram_len: int = 24,
    min_docs: int = 2,
) -> DataFrame:
    """EXACT cross-document duplicate-substring spans (the substring-level
    dedup of Lee et al., "Deduplicating Training Data Makes Language Models
    Better", ACL'22 — published algorithm; their single-node tool is a
    suffix array, re-expressed here as the distributed L-gram equivalent):
    a character position is *duplicated* iff the length-``gram_len`` gram
    starting there occurs in ≥ ``min_docs`` distinct documents; maximal
    runs of duplicated positions merge into spans ``[span_start,
    span_end)``.  Every substring of length ≥ gram_len shared by two
    documents is covered by such a span, and no span contains a position
    whose gram is unique — the exact pigeonhole semantics of the paper's
    "all repeated substrings of length ≥ L" with L = gram_len.

    Plan: one generate (sequence+explode, whole-stage codegen — no Python),
    one hash aggregation on the gram (map-side partial), one shuffle join
    back to positions, one per-doc window for the gaps-and-islands merge.

    100 TB shape: the gram aggregation is the inherent cost (it IS the
    suffix-array build, distributed); at scale shuffle ``xxhash64(gram)``
    (8 bytes) instead of the raw gram text — a 2⁻⁶⁴ collision risk traded
    for ~3x less shuffle I/O.  The oracle-gated query keeps raw grams so
    the DuckDB twin is string-identical; the hashed variant is
    ``gram_key=F.xxhash64`` one-liner at the groupBy.  The join back is a
    plain shuffle equi-join (the duplicated-gram side is NOT guaranteed
    small — web corpora have heavy boilerplate); the final window is
    per-doc, bounded by doc length.
    """
    from pyspark.sql import Window as W

    L = int(gram_len)
    pos = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.sequence(F.lit(0), F.length(text_col) - L)).alias("p"),
        F.col(text_col).alias("_t"),
    ).select(
        "doc_id", "p", F.substring(F.col("_t"), F.col("p") + 1, F.lit(L)).alias("g")
    )
    dup = (
        pos.groupBy("g")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("g")
    )
    hits = pos.join(dup, "g").select("doc_id", "p")
    w = W.partitionBy("doc_id").orderBy("p")
    isl = hits.withColumn(
        "brk",
        F.when(F.lag("p").over(w).isNull() | (F.col("p") > F.lag("p").over(w) + L), 1)
        .otherwise(0),
    ).withColumn("gid", F.sum("brk").over(w.rowsBetween(W.unboundedPreceding, 0)))
    return isl.groupBy("doc_id", "gid").agg(
        F.min("p").alias("span_start"),
        (F.max("p") + L).alias("span_end"),
        (F.max("p") + L - F.min("p")).alias("span_len"),
    ).select("doc_id", "span_start", "span_end", "span_len")


def sql_duplicate_substring_spans(
    table: str = "documents", gram_len: int = 24, min_docs: int = 2
) -> str:
    """DuckDB definition twin of ``duplicate_substring_spans`` (identical
    gram/merge semantics, unnest(range) instead of sequence+explode)."""
    L = int(gram_len)
    return f"""WITH ppos AS (
  SELECT doc_id, text, unnest(range(0, length(text) - {L} + 1)) AS p FROM {table}),
pos AS (
  SELECT doc_id, p, substr(text, CAST(p + 1 AS INTEGER), {L}) AS g FROM ppos),
dup AS (SELECT g FROM pos GROUP BY g HAVING count(DISTINCT doc_id) >= {min_docs}),
hits AS (SELECT pos.doc_id, pos.p FROM pos JOIN dup USING (g)),
isl AS (SELECT doc_id, p,
        CASE WHEN lag(p) OVER w IS NULL OR p > lag(p) OVER w + {L} THEN 1 ELSE 0 END AS brk
        FROM hits WINDOW w AS (PARTITION BY doc_id ORDER BY p)),
grp AS (SELECT doc_id, p,
        sum(brk) OVER (PARTITION BY doc_id ORDER BY p) AS gid FROM isl)
SELECT doc_id, min(p) AS span_start, max(p) + {L} AS span_end,
       max(p) + {L} - min(p) AS span_len
FROM grp GROUP BY doc_id, gid"""


def containment_pairs(
    docs: DataFrame,
    containment_threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 3,
) -> DataFrame:
    """EXACT asymmetric set-CONTAINMENT pairs (the excerpt/superset
    detector symmetric Jaccard misses — a short quote inside a long page
    scores near-zero Jaccard but containment 1.0; standard in SSJoin
    literature as the overlap/containment predicate): DIRECTED pairs
    (doc_a, doc_b) with |A∩B| ≥ t·|A|, A = doc_a's shingle set.

    Same inverted-index candidates as jaccard_ngram_pairs (every pair
    sharing a shingle is scored — exact recall), threshold by integer
    cross-multiply (inter·1000 ≥ t1000·|A|), both directions emitted
    independently.  One shuffle on shingles, one on id pairs, sizes
    broadcast back."""
    sh = shingles(F.col(text_col), ngram).alias("sh")
    base = docs.select(F.col(id_col).alias("doc_id"), sh).filter(F.size("sh") > 0)
    sizes = base.select("doc_id", F.size("sh").alias("n_sh"))
    post = base.select("doc_id", F.explode("sh").alias("s"))
    a = post.select(F.col("doc_id").alias("doc_a"), "s")
    b = post.select(F.col("doc_id").alias("doc_b"), "s")
    inter = (
        a.join(b, "s")
        .where(F.col("doc_a") != F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter_cnt"))
    )
    thr = int(containment_threshold * 1000)
    return (
        inter.join(
            F.broadcast(
                sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
            ),
            "doc_a",
        )
        .filter(F.col("inter_cnt") * F.lit(1000) >= F.lit(thr) * F.col("na"))
        .select("doc_a", "doc_b", "inter_cnt", F.col("na").alias("a_size"))
    )


def sql_containment_pairs(
    containment_threshold: float = 0.8, table: str = "documents", ngram: int = 3
) -> str:
    sh = sql_shingles("text", ngram)
    thr = int(containment_threshold * 1000)
    return f"""
WITH base AS (SELECT doc_id, {sh} AS sh FROM {table}),
ne AS (SELECT doc_id, sh, len(sh) AS n_sh FROM base WHERE len(sh) > 0),
post AS (SELECT doc_id, unnest(sh) AS s FROM ne),
inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter_cnt
          FROM post a JOIN post b ON a.s = b.s AND a.doc_id != b.doc_id
          GROUP BY 1, 2)
SELECT doc_a, doc_b, inter_cnt, sa.n_sh AS a_size
FROM inter JOIN ne sa ON sa.doc_id = doc_a
WHERE inter_cnt * 1000 >= {thr} * sa.n_sh
""".strip()


# --- winnowing fingerprints (Schleimer, Wilkerson & Aiken 2003, SIGMOD) --------
def winnow_fingerprints(
    docs: DataFrame, k: int = 6, w: int = 4, text_col: str = "text"
) -> DataFrame:
    """Winnowing document fingerprints — the MOSS local fingerprinting
    algorithm: hash every character k-gram of the normalized text, then in
    every window of ``w`` consecutive k-gram hashes select the minimum; the
    DISTINCT selected values are the fingerprint set.  Guarantee (Thm 1 of
    the paper): any substring match of length >= w + k - 1 between two
    documents shares at least one fingerprint, while only ~2/(w+1) of all
    k-grams are kept — the density/guarantee trade the rolling-hash
    ``doc_fingerprint`` (one global hash) cannot make.

    Selecting by VALUE makes the output independent of the paper's
    rightmost-position tie rule: the window minimum value is unique per
    window regardless of which position carries it, so the distinct-value
    set is deterministic even for self-repeating text.

    Implemented entirely in higher-order array functions (transform /
    slice / array_min / array_distinct) — whole-stage codegen, no UDF, no
    explode: per row the plan builds the k-gram hash array once and the
    window scan reads slices of it.  100 TB shape: map-only, no shuffle.

    Returns (doc_id, n_fp, fp_digest) where fp_digest is the md5-long of
    the sorted fingerprint list (the per-doc sketch a near-dup index
    stores).  Also see winnow_shared_pairs for the pair join.
    """
    t = normalize_text(F.col(text_col))
    d = docs.select("doc_id", t.alias("_t"), F.length(t).alias("_n"))
    m = F.col("_n") - k + 1  # number of k-grams
    kgrams = F.when(
        m >= 1,
        F.transform(
            F.sequence(F.lit(0), m - 1),
            lambda i: md5_long(F.substr(F.col("_t"), i + 1, F.lit(k))),
        ),
    ).otherwise(F.array().cast("array<long>"))
    d = d.withColumn("_h", kgrams)
    nw = F.size(F.col("_h")) - w + 1
    wins = F.when(
        nw >= 1,
        F.transform(
            F.sequence(F.lit(0), nw - 1),
            lambda j: F.array_min(F.slice(F.col("_h"), j + 1, w)),
        ),
    ).otherwise(F.array().cast("array<long>"))
    d = d.withColumn("_fps", F.array_sort(F.array_distinct(wins)))
    return d.select(
        "doc_id",
        F.size("_fps").cast("long").alias("n_fp"),
        md5_long(
            F.array_join(F.transform("_fps", lambda x: x.cast("string")), ",")
        ).alias("fp_digest"),
    )


def winnow_fingerprint_sets(
    docs: DataFrame, k: int = 6, w: int = 4, text_col: str = "text"
) -> DataFrame:
    """(doc_id, fp) exploded fingerprint postings — input to the pair join."""
    t = normalize_text(F.col(text_col))
    d = docs.select("doc_id", t.alias("_t"), F.length(t).alias("_n"))
    m = F.col("_n") - k + 1
    kgrams = F.when(
        m >= 1,
        F.transform(
            F.sequence(F.lit(0), m - 1),
            lambda i: md5_long(F.substr(F.col("_t"), i + 1, F.lit(k))),
        ),
    ).otherwise(F.array().cast("array<long>"))
    d = d.withColumn("_h", kgrams)
    nw = F.size(F.col("_h")) - w + 1
    wins = F.when(
        nw >= 1,
        F.transform(
            F.sequence(F.lit(0), nw - 1),
            lambda j: F.array_min(F.slice(F.col("_h"), j + 1, w)),
        ),
    ).otherwise(F.array().cast("array<long>"))
    return d.select(
        "doc_id", F.explode(F.array_distinct(wins)).alias("fp")
    )


def winnow_shared_pairs(
    docs: DataFrame, min_shared: int = 2, k: int = 6, w: int = 4
) -> DataFrame:
    """Near-dup candidate pairs by shared winnowing fingerprints: postings
    self-join on fp (bucketed equi-join on uniform hash values — the same
    scale shape as the MinHash band join), count shared, threshold."""
    post = winnow_fingerprint_sets(docs, k=k, w=w)
    a = post.select(F.col("doc_id").alias("doc_a"), "fp")
    b = post.select(F.col("doc_id").alias("doc_b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def sql_winnow_fingerprints(k: int = 6, w: int = 4, table: str = "documents") -> str:
    """DuckDB twin of winnow_fingerprints — identical hash text, list
    comprehension forms; range(0, negative) is [] so short docs need no
    guard."""
    norm = sql_normalize_text("text")
    h = f"('0x' || substr(md5(substr(txt, CAST(i + 1 AS INTEGER), {k})), 1, 15))::BIGINT"
    return f"""
WITH t AS (SELECT doc_id, {norm} AS txt FROM {table}),
g AS (SELECT doc_id,
        list_transform(range(0, length(txt) - {k} + 1), i -> {h}) AS h
      FROM t),
wm AS (SELECT doc_id,
         list_sort(list_distinct(list_transform(
           range(0, len(h) - {w} + 1),
           j -> list_aggregate(list_slice(h, CAST(j + 1 AS INTEGER),
                                          CAST(j + {w} AS INTEGER)), 'min')
         ))) AS fps
       FROM g)
SELECT doc_id, CAST(len(fps) AS BIGINT) AS n_fp,
  ('0x' || substr(md5(coalesce(list_aggregate(
      list_transform(fps, x -> CAST(x AS VARCHAR)), 'string_agg', ','), '')),
   1, 15))::BIGINT AS fp_digest
FROM wm
""".strip()


# --- longest common subsequence pair join ------------------------------------
def lcs_pairs(
    df: DataFrame,
    bucket_cols: list[str],
    id_col: str = "doc_id",
    text_col: str = "t",
    min_lcs: int = 1,
) -> DataFrame:
    """Longest-common-subsequence length between document pairs sharing a
    bucket (Wagner & Fischer 1974 DP; Hirschberg 1975 lineage) — the
    ORDER-PRESERVING member of the string-similarity family: levenshtein
    charges every edit, containment demands contiguity, LCS counts the
    longest shared subsequence (robust to scattered insertions — the
    plagiarism/excerpt signal).  Emits (doc_a, doc_b, lcs_len) for
    unordered within-bucket pairs with lcs_len >= ``min_lcs``.

    DP entirely in JVM aggregate() folds (the dtw_pairs discipline): the
    outer fold walks chars of A carrying B's dp row as array<int>; the
    row advance uses the monotone-row identity
        dp(i,j) = max(dp(i,j-1), c_j),
        c_j = max(dp(i-1,j), a_i=b_j ? dp(i-1,j-1)+1 : 0)
    — a running max, so each row is one sequential fold.  The DuckDB twin
    (sql_lcs_pairs) advances each row in CLOSED FORM inside a recursive
    CTE: dp(i,j) = max_{k<=j} c_k (max distributed over the scan).  Two
    algorithms, one exact integer hash.

    Strings must be pre-capped by the caller (cost is |A|·|B| fold steps
    per pair); empty strings are excluded (both engines split '' into
    ['']).  100 TB: bucketed equi-join — pair cost bounded by bucket
    size², never global n²."""
    base = df.filter(F.length(text_col) >= 1).select(
        *bucket_cols,
        F.col(id_col).alias("_id"),
        F.split(F.col(text_col), "").alias("_ch"),
    )
    a = base.select(
        *bucket_cols, F.col("_id").alias("doc_a"), F.col("_ch").alias("ca")
    )
    b = base.select(
        *bucket_cols, F.col("_id").alias("doc_b"), F.col("_ch").alias("cb")
    )
    pairs = a.join(b, bucket_cols).filter(F.col("doc_a") < F.col("doc_b"))

    ca, cb = F.col("ca"), F.col("cb")
    empty = F.array().cast("array<int>")

    def next_row(u, ach):
        # u: dp row for the previous char of A (dp(i-1, 1..m)); this fold
        # computes dp(i, 1..m) left to right as a running max
        def cell(acc, j):
            diag = F.when(j == F.lit(1), F.lit(0)).otherwise(
                F.element_at(u, j - F.lit(1))
            )
            c = F.greatest(
                F.element_at(u, j),
                F.when(F.element_at(cb, j) == ach, diag + 1).otherwise(F.lit(0)),
            )
            return F.greatest(
                c, F.coalesce(F.get(acc, F.size(acc) - 1), F.lit(0))
            )

        return F.aggregate(
            F.sequence(F.lit(1), F.size(cb)),
            empty,
            lambda acc, j: F.concat(acc, F.array(cell(acc, j).cast("int"))),
        )

    zeros = F.transform(cb, lambda _: F.lit(0).cast("int"))
    dp = F.aggregate(ca, zeros, next_row)
    out = pairs.select(
        "doc_a", "doc_b", F.element_at(dp, F.size(cb)).cast("int").alias("lcs_len")
    )
    return out.filter(F.col("lcs_len") >= min_lcs)


def sql_lcs_pairs(
    rows_cte: str,
    bucket_cols: list[str],
    id_col: str = "doc_id",
    text_col: str = "t",
    min_lcs: int = 1,
) -> str:
    """DuckDB twin of :func:`lcs_pairs` — recursive CTE over chars of A,
    each dp row advanced in closed form (dp(i,j) = max_{k<=j} c_k)."""
    on = " AND ".join(f"a.{k} = b.{k}" for k in bucket_cols)
    cell = (
        "greatest(costs[CAST(k AS INTEGER)], "
        "CASE WHEN cb[CAST(k AS INTEGER)] = ca[CAST(i + 1 AS INTEGER)] "
        "THEN (CASE WHEN k = 1 THEN 0 ELSE costs[CAST(k - 1 AS INTEGER)] END) + 1 "
        "ELSE 0 END)"
    )
    return f"""WITH RECURSIVE lcs_src AS ({rows_cte}),
lcs_rows AS (
  SELECT *, string_split({text_col}, '') AS ch
  FROM lcs_src WHERE length({text_col}) >= 1),
lcs_pair AS (
  SELECT a.{id_col} AS doc_a, b.{id_col} AS doc_b, a.ch AS ca, b.ch AS cb
  FROM lcs_rows a JOIN lcs_rows b ON {on} AND a.{id_col} < b.{id_col}),
lcs_dp AS (
  SELECT doc_a, doc_b, ca, cb, 0 AS i,
         list_transform(range(1, len(cb) + 1), j -> 0) AS costs
  FROM lcs_pair
  UNION ALL
  SELECT doc_a, doc_b, ca, cb, i + 1,
         list_transform(range(1, len(cb) + 1), j ->
           list_aggregate(list_transform(range(1, j + 1), k -> {cell}), 'max'))
  FROM lcs_dp WHERE i < len(ca))
SELECT doc_a, doc_b, CAST(costs[CAST(len(cb) AS INTEGER)] AS INTEGER) AS lcs_len
FROM lcs_dp WHERE i = len(ca) AND costs[CAST(len(cb) AS INTEGER)] >= {min_lcs}"""


# --- Soundex phonetic blocking -----------------------------------------------
# American Soundex letter->symbol map (NARA standard, public): digits 1-6 are
# the codes, '0' marks vowels+Y (run breakers, never emitted), '9' marks H/W
# (TRANSPARENT: same-code letters separated by H/W collapse to one).
_SOUNDEX_FROM = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_SOUNDEX_TO = "01230129022455012623019202"


def _soundex_steps(expr: str, fns: dict) -> str:
    """Build the engine-neutral soundex expression from ONE rule list —
    ``fns`` supplies the engine's function-name spellings.  RE2-safe: no
    backreferences (per-digit patterns are enumerated), so the identical
    text runs under Java regex AND DuckDB's RE2."""
    up = f"upper({expr})"
    clean = f"{fns['re']}({up}, '[^A-Z]', '', 'g')" if fns["g"] else (
        f"{fns['re']}({up}, '[^A-Z]', '')"
    )
    s = f"translate({clean}, '{_SOUNDEX_FROM}', '{_SOUNDEX_TO}')"
    # H/W transparency: d 9+ d  ->  d d   (two passes close 9-chains)
    for _ in range(2):
        for d in "0123456":
            pat, rep = f"'{d}9+{d}'", f"'{d}{d}'"
            s = (
                f"{fns['re']}({s}, {pat}, {rep}, 'g')"
                if fns["g"]
                else f"{fns['re']}({s}, {pat}, {rep})"
            )
    # stray H/W markers delete; then collapse runs per digit
    s = f"{fns['re']}({s}, '9', '', 'g')" if fns["g"] else f"{fns['re']}({s}, '9', '')"
    for d in "0123456":
        pat, rep = f"'{d}{d}+'", f"'{d}'"
        s = (
            f"{fns['re']}({s}, {pat}, {rep}, 'g')"
            if fns["g"]
            else f"{fns['re']}({s}, {pat}, {rep})"
        )
    # drop the first letter's own code (it merged with any same-code run),
    # unless the first letter is H/W (its 9 was deleted -> nothing to drop)
    first = f"substring({clean}, 1, 1)"
    fcode = f"translate({first}, '{_SOUNDEX_FROM}', '{_SOUNDEX_TO}')"
    digits = f"CASE WHEN {fcode} = '9' THEN {s} ELSE substring({s}, 2) END"
    nz = (
        f"{fns['re']}({digits}, '0', '', 'g')"
        if fns["g"]
        else f"{fns['re']}({digits}, '0', '')"
    )
    return (
        f"CASE WHEN {clean} = '' THEN NULL ELSE "
        f"{first} || substring({nz} || '000', 1, 3) END"
    )


def soundex_expr(col: str) -> F.Column:
    """American Soundex of a Spark string column — the full NARA rule set
    (first-letter retention, H/W transparency, vowel run-breaking, 0-pad
    to letter+3) as ONE chained JVM expression (upper → strip → translate
    → enumerated regexp passes).  Built from the same rule list as
    :func:`sql_soundex_expr`, so both engines run the identical text."""
    return F.expr(_soundex_steps(col, {"re": "regexp_replace", "g": False}))


def sql_soundex_expr(col: str) -> str:
    """DuckDB twin text of :func:`soundex_expr` (RE2-safe, 'g' flags)."""
    return _soundex_steps(col, {"re": "regexp_replace", "g": True})


def soundex_pairs(
    names: DataFrame, id_col: str = "name_id", name_col: str = "name"
) -> DataFrame:
    """Phonetic blocking join (Russell & Odell 1918 soundex; the classic
    entity-resolution blocking key): names bucketed by their soundex code,
    distinct spelling pairs surfaced per bucket — the candidate generator
    a fuzzy-dedup pipeline verifies with edit distance.  Emits
    (code, name_a, name_b) for every unordered pair of DISTINCT spellings
    sharing a code.

    100 TB: one distinct + equi-join on the 26·7³ code space — bucketed,
    never global n²; the code itself is pure codegen string algebra."""
    coded = (
        names.select(soundex_expr(name_col).alias("code"), F.col(name_col).alias("n"))
        .filter(F.col("code").isNotNull())
        .distinct()
    )
    a = coded.select("code", F.col("n").alias("name_a"))
    b = coded.select("code", F.col("n").alias("name_b"))
    return a.join(b, "code").filter(F.col("name_a") < F.col("name_b"))


def sql_soundex_pairs(names_cte: str, name_col: str = "name") -> str:
    """DuckDB twin of :func:`soundex_pairs`."""
    code = sql_soundex_expr(name_col)
    return f"""WITH sx_names AS ({names_cte}),
sx_coded AS (
  SELECT DISTINCT {code} AS code, {name_col} AS n FROM sx_names
  WHERE {code} IS NOT NULL)
SELECT a.code, a.n AS name_a, b.n AS name_b
FROM sx_coded a JOIN sx_coded b ON a.code = b.code AND a.n < b.n"""
