"""Lexical ranking over the documents table: TF-IDF term extraction and BM25
retrieval — the curation/search workloads a training-data lake runs constantly
(near-dup triage, topical filtering, eval-set retrieval).

Everything is declarative DataFrame ops (explode → two partial-aggregated
shuffles → one broadcast of a 1-row corpus-stats table → window top-k), so
Catalyst keeps the whole plan in codegen and AQE handles skewed terms. No
Python workers, no driver-side collect of data rows.

Cross-engine exactness: classic idf = ln(N/df) is float and engines disagree
in the last ulp, so both scores quantize the idf to the INTEGER
``1 + floor(log2(N div df))`` computed as ``length(bin(N div df))`` — Spark and
DuckDB both expose ``bin()`` (minimal binary string of a bigint), making the
value hash bit-exact with zero floating point anywhere. BM25's rational length
normalization is cleared of division the same way: every per-term score is one
integer floor-division of cross-multiplied int64 terms (derivation in
``bm25_scores``).

Scale shape (100 TB): postings tf-agg has map-side combine; df-agg likewise;
the tf⨝df equi-join shuffles on term (uniform-ish after stopword-heavy terms
are damped by the idf, AQE splits stragglers); corpus stats are a broadcast of
ONE row; the final top-k is a rank-filtered window that Spark rewrites to
WindowGroupLimit (partial per-partition top-k before the shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from osmgraft.functions import text as T

# BM25 shape constants as exact rationals: k1 = 6/5 (=1.2), b = 3/4 (=0.75).
# They only appear pre-multiplied into the integer score derivation below.
_SCORE_SCALE = 1_000_000  # fixed-point micro-units for the summed score


def doc_postings(docs: DataFrame) -> DataFrame:
    """documents(doc_id, text) → postings(doc_id, term, tf): whitespace
    tokens lowercased, one row per distinct (doc, term). One shuffle with
    map-side partial counts (explode feeds a hash aggregate)."""
    return (
        docs.select("doc_id", F.explode(T.tokens(F.lower(F.col("text")))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def _with_corpus_stats(postings: DataFrame) -> DataFrame:
    """postings + df(term) + broadcast 1-row (n_docs, tot_tokens).

    n_docs counts documents with ≥1 token (empty docs never enter postings on
    either engine); tot_tokens is the corpus token count, for BM25's avgdl.
    """
    df_tab = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = postings.agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.sum("tf").alias("tot_tokens"),
    )
    return postings.join(df_tab, "term").join(F.broadcast(stats))


def tfidf_top_terms(
    docs: DataFrame, k: int = 3, postings: DataFrame | None = None
) -> DataFrame:
    """Top-k characteristic terms per document by integer tf-idf.

    score = tf · (1 + floor(log2(N div df))); ties broken by term ascending
    so row_number is deterministic. Returns
    (doc_id, term, tf, df, score, rnk).

    ``postings`` lets a caller pass a materialized (doc_id, term, tf) table
    — the standard inverted-index asset a 100 TB corpus keeps persisted —
    so the corpus is tokenized once for every ranking op that consumes it
    (plan-level exchange reuse does not fire across the df/stats branches:
    lambda-bound tokenize subtrees don't canonicalize equal)."""
    p = _with_corpus_stats(postings if postings is not None else doc_postings(docs))
    scored = p.select(
        "doc_id",
        "term",
        "tf",
        "df",
        (F.col("tf") * F.length(F.bin(F.expr("n_docs div df")))).alias("score"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("doc_id", "term", "tf", "df", "score", "rnk")
    )


def sql_tfidf_top_terms(k: int = 3) -> str:
    """DuckDB twin of tfidf_top_terms (identical integer spec)."""
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({T.sql_tokens('lower(text)')}) AS term FROM documents
),
postings AS (
  SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term
),
dfs AS (SELECT term, count(*) AS df FROM postings GROUP BY term),
stats AS (SELECT count(DISTINCT doc_id) AS n_docs FROM postings),
scored AS (
  SELECT p.doc_id, p.term, p.tf, d.df,
         p.tf * length(bin(s.n_docs // d.df)) AS score,
         row_number() OVER (PARTITION BY p.doc_id
                            ORDER BY p.tf * length(bin(s.n_docs // d.df)) DESC,
                                     p.term ASC) AS rnk
  FROM postings p JOIN dfs d USING (term) CROSS JOIN stats s
)
SELECT doc_id, term, tf, df, score, rnk FROM scored WHERE rnk <= {k}"""


def bm25_scores(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 5,
    postings: DataFrame | None = None,
) -> DataFrame:
    """BM25 top-k documents per query — integer-exact fixed point.

    ``queries`` is a small (query_id, term) table, broadcast to the postings.

    Derivation (why the expression below IS BM25, k1=6/5, b=3/4): with
    dl = doc length and avgdl = T/N (corpus tokens over docs),

        tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
      = 44·tf·avgdl / (20·tf·avgdl + 6·avgdl + 18·dl)          (×20·avgdl/1)

    avgdl is materialized once as the integer avgdl_milli = (1000·T) div N
    (the millitoken floor is part of this spec, identically computed on both
    engines), so each matched term contributes the int64 expression

        idf · 44 · tf · avgdl_milli · SCALE
          div (20·tf·avgdl_milli + 6·avgdl_milli + 18·dl·1000)

    with idf = 1 + floor(log2(N div df)) as in tfidf. Magnitudes: A =
    idf·44·tf·avgdl_milli stays < 2⁶³ even at extreme bounds (avgdl_milli ≤
    ~10⁸ for book-length corpora, tf ≤ dl ≤ 10⁶, idf ≤ ~40 ⇒ A ≤ ~2·10¹⁷),
    but A·SCALE does NOT — so the fixed-point quotient is computed as
    base-1000 long division (q0·10⁶ + q1·10³ + q2 with remainders carried),
    which equals (A·SCALE) div B exactly while every intermediate stays
    < 2.5·10¹⁸. Scores then sum per (query, doc).
    Returns (query_id, doc_id, score, rnk), rnk ≤ k, ties → doc_id asc.
    ``postings`` as in tfidf_top_terms: pass the persisted inverted index at
    scale so the corpus is tokenized once, not once per aggregate branch."""
    if postings is None:
        postings = doc_postings(docs)
    p = _with_corpus_stats(postings)
    dl = postings.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    # the df/stats/dl aggregations all hang off the ONE postings subtree, so
    # Spark's exchange reuse serves the postings shuffle to every consumer
    # instead of re-scanning and re-exploding the corpus per aggregate
    p = p.join(dl, "doc_id")
    p = p.withColumn("avgdl_milli", F.expr("(1000 * tot_tokens) div n_docs"))
    matched = p.join(F.broadcast(queries), "term")
    # base-1000 long division: (A*1e6) div B without the A*1e6 overflow
    num = "(length(bin(n_docs div df)) * 44 * tf * avgdl_milli)"
    den = "(20 * tf * avgdl_milli + 6 * avgdl_milli + 18 * dl * 1000)"
    scored = (
        matched.withColumn("_a", F.expr(num))
        .withColumn("_b", F.expr(den))
        .withColumn("_q0", F.expr("_a div _b"))
        .withColumn("_r0", F.expr("(_a - _q0 * _b) * 1000"))
        .withColumn("_q1", F.expr("_r0 div _b"))
        .withColumn("_r1", F.expr("(_r0 - _q1 * _b) * 1000"))
        .withColumn("s", F.expr("_q0 * 1000000 + _q1 * 1000 + _r1 div _b"))
    )
    agg = (
        scored.select("query_id", "doc_id", "s")
        .groupBy("query_id", "doc_id")
        .agg(F.sum("s").alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        agg.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "doc_id", "score", "rnk")
    )


def sql_bm25_scores(queries_values: str, k: int = 5) -> str:
    """DuckDB twin of bm25_scores. ``queries_values`` is a SQL VALUES body
    like ``('q0','spark'),('q0','join')`` naming (query_id, term)."""
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({T.sql_tokens('lower(text)')}) AS term FROM documents
),
postings AS (
  SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term
),
dfs AS (SELECT term, count(*) AS df FROM postings GROUP BY term),
dls AS (SELECT doc_id, sum(tf) AS dl FROM postings GROUP BY doc_id),
stats AS (
  SELECT count(DISTINCT doc_id) AS n_docs,
         (1000 * sum(tf)) // count(DISTINCT doc_id) AS avgdl_milli
  FROM postings
),
qs(query_id, term) AS (VALUES {queries_values}),
ab AS (
  SELECT q.query_id, p.doc_id,
         (length(bin(s.n_docs // d.df)) * 44 * p.tf * s.avgdl_milli) AS a,
         (20 * p.tf * s.avgdl_milli + 6 * s.avgdl_milli + 18 * l.dl * 1000) AS b
  FROM postings p
  JOIN dfs d USING (term)
  JOIN dls l USING (doc_id)
  JOIN qs q USING (term)
  CROSS JOIN stats s
),
term_scores AS (
  -- base-1000 long division == (a*1e6)//b with every intermediate in int64
  SELECT query_id, doc_id,
         (a // b) * 1000000
         + (((a - (a // b) * b) * 1000) // b) * 1000
         + ((((a - (a // b) * b) * 1000) - (((a - (a // b) * b) * 1000) // b) * b) * 1000) // b AS ts
  FROM ab
),
agg AS (
  SELECT query_id, doc_id, sum(ts) AS score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY sum(ts) DESC, doc_id ASC) AS rnk
  FROM term_scores GROUP BY query_id, doc_id
)
SELECT query_id, doc_id, CAST(score AS BIGINT) AS score, rnk
FROM agg WHERE rnk <= {k}"""


# --------------------------------------------------------------------------
# bigram language-model surprisal (perplexity-style quality filter)
# --------------------------------------------------------------------------

def lm_surprisal(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document surprisal under a self-trained corpus bigram LM — the
    classic perplexity quality filter (KenLM-style scoring, public method):
    fluent text repeats the corpus's common word transitions (low surprisal);
    gibberish, boilerplate-free spam, and wrong-language text hit rare
    transitions (high surprisal). Complements the static-table heuristics
    (bigram_quality, repetition, stopword ratios) with corpus-adaptive
    statistics.

    Model: add-one-smoothed conditional P(cur|prev) = (c_bi + 1)/(c_prev + V)
    over lowercased whitespace tokens, with c_prev the corpus count of
    ``prev`` as a bigram left side and V the distinct-token vocabulary size.
    Scoring uses the engine's integer-log2 discipline (tfidf/bm25 above):
    per-occurrence bits = ilog2(c_prev + V) - ilog2(c_bi + 1) with
    ilog2(x) = length(bin(x)) - 1 = floor(log2 x) — exact in both engines,
    no floating point, provably >= 0 (c_bi <= c_prev, 1 <= V). The division
    mean-bits = surprisal_bits / n_bigrams is never taken.

    Output: (doc_id, surprisal_bits, n_bigrams) for every document with at
    least one bigram.

    Scale shape: per-doc bigrams are pre-aggregated to (doc, prev, cur, k)
    — one map-side-combined shuffle — before joining the two count tables
    (equi-joins on term keys; AQE splits the stopword-head skew), then one
    final doc aggregation. Corpus V is a 1-row broadcast. No Python, no
    windows, no driver data."""
    from osmgraft.functions.text import tokens

    toks = tokens(F.lower(F.col(text_col)))
    n = F.greatest(F.size(toks) - 1, F.lit(0))
    pairs = F.zip_with(
        F.slice(toks, 1, n),
        F.slice(toks, 2, n),
        lambda a, b: F.struct(a.alias("prev"), b.alias("cur")),
    )
    occ = (
        docs.select(F.col(id_col), F.explode(pairs).alias("pr"))
        .select(id_col, F.col("pr.prev").alias("prev"), F.col("pr.cur").alias("cur"))
        .groupBy(id_col, "prev", "cur")
        .agg(F.count(F.lit(1)).alias("k"))
    )
    cbi = occ.groupBy("prev", "cur").agg(F.sum("k").alias("c_bi"))
    cprev = cbi.groupBy("prev").agg(F.sum("c_bi").alias("c_prev"))
    vocab = docs.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("t")).agg(
        F.countDistinct("t").alias("v")
    )
    ilog2 = lambda c: F.length(F.bin(c)) - 1  # noqa: E731  floor(log2 x), x>=1
    bits = ilog2(F.col("c_prev") + F.col("v")) - ilog2(F.col("c_bi") + F.lit(1))
    return (
        occ.join(cbi, ["prev", "cur"])
        .join(cprev, "prev")
        .crossJoin(F.broadcast(vocab))
        .groupBy(id_col)
        .agg(
            F.sum(F.col("k") * bits).alias("surprisal_bits"),
            F.sum("k").alias("n_bigrams"),
        )
    )


def sql_lm_surprisal(table: str = "documents") -> str:
    """DuckDB twin: identical counts and integer-log2 text."""
    from osmgraft.functions.text import sql_tokens, sql_word_bigrams

    t = sql_tokens("lower(text)")
    bg = sql_word_bigrams("toks")
    return f"""WITH d AS (SELECT doc_id, {t} AS toks FROM {table}),
occ AS (
  SELECT doc_id, split_part(bg, ' ', 1) AS prev, split_part(bg, ' ', 2) AS cur,
         count(*) AS k
  FROM (SELECT doc_id, unnest({bg}) AS bg FROM d)
  GROUP BY 1, 2, 3
),
cbi AS (SELECT prev, cur, sum(k) AS c_bi FROM occ GROUP BY prev, cur),
cprev AS (SELECT prev, sum(c_bi) AS c_prev FROM cbi GROUP BY prev),
vocab AS (SELECT count(DISTINCT t) AS v FROM (SELECT unnest(toks) AS t FROM d))
SELECT occ.doc_id,
       CAST(sum(k * ((length(bin(c_prev + v)) - 1) - (length(bin(c_bi + 1)) - 1))) AS BIGINT) AS surprisal_bits,
       CAST(sum(k) AS BIGINT) AS n_bigrams
FROM occ JOIN cbi USING (prev, cur) JOIN cprev USING (prev) CROSS JOIN vocab
GROUP BY occ.doc_id"""


def auc_exact(
    df: DataFrame,
    group_cols: list[str],
    label_col: str = "label",
    score_col: str = "score",
) -> DataFrame:
    """Exact ROC-AUC per group (classifier evaluation — the quality-filter
    calibration step of a curation pipeline) as an INTEGER RATIONAL:
    (auc_num, auc_den) with AUC = auc_num / auc_den, tie-corrected
    Mann-Whitney (average ranks — ties contribute 1/2, the trapezoidal ROC
    convention).

    Derivation: with per-score histogram counts c_s (rows) and p_s
    (positives), a positive at score s has 2·avg_rank = 2·cnt_lt_s + c_s + 1,
    so  auc_num = Σ_s p_s (2 cnt_lt_s + c_s + 1) − P(P+1),  auc_den = 2PN —
    pure int64 (no IEEE division until the caller wants a float).

    Scale shape: one hash agg collapses the data to DISTINCT (group, score)
    size (map-side combine), the cumulative window runs over that aggregate
    — never the raw rows — and the final rollup is group-sized.  Degenerate
    groups (P=0 or N=0) report auc_den=0 (AUC undefined) instead of
    dividing by zero."""
    from pyspark.sql import Window

    hist = df.groupBy(*group_cols, score_col).agg(
        F.count(F.lit(1)).alias("c"),
        F.sum(F.col(label_col).cast("long")).alias("p"),
    )
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(score_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = hist.withColumn("cnt_lt", F.coalesce(F.sum("c").over(w), F.lit(0)))
    per = cum.groupBy(*group_cols).agg(
        F.sum("p").alias("p_tot"),
        (F.sum("c") - F.sum("p")).alias("n_tot"),
        F.sum(
            F.col("p") * (2 * F.col("cnt_lt") + F.col("c") + 1)
        ).alias("rank_term"),
    )
    return per.select(
        *group_cols,
        F.col("p_tot").alias("p"),
        F.col("n_tot").alias("n"),
        (F.col("rank_term") - F.col("p_tot") * (F.col("p_tot") + 1)).alias(
            "auc_num"
        ),
        (2 * F.col("p_tot") * F.col("n_tot")).alias("auc_den"),
    )


def sql_auc_exact(
    rows_cte: str, group_cols: str, label: str = "label", score: str = "score"
) -> str:
    """DuckDB twin — identical histogram/window/rollup formulation."""
    return f"""WITH rows_in AS ({rows_cte}),
hist AS (
  SELECT {group_cols}, {score} AS s, count(*) AS c,
         CAST(sum({label}) AS BIGINT) AS p
  FROM rows_in GROUP BY {group_cols}, {score}),
cum AS (
  SELECT *, COALESCE(SUM(c) OVER (PARTITION BY {group_cols} ORDER BY s
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cnt_lt
  FROM hist),
per AS (
  SELECT {group_cols}, sum(p) AS p_tot, sum(c) - sum(p) AS n_tot,
         sum(p * (2 * cnt_lt + c + 1)) AS rank_term
  FROM cum GROUP BY {group_cols})
SELECT {group_cols}, CAST(p_tot AS BIGINT) AS p, CAST(n_tot AS BIGINT) AS n,
       CAST(rank_term - p_tot * (p_tot + 1) AS BIGINT) AS auc_num,
       CAST(2 * p_tot * n_tot AS BIGINT) AS auc_den
FROM per"""


# --- rank aggregation (Borda + Condorcet) ------------------------------------
def rank_aggregation(
    counts: DataFrame,
    keys: list[str],
    ballot_col: str,
    cand_col: str,
    score_col: str,
) -> DataFrame:
    """Rank aggregation per key group (Borda 1781; Condorcet 1785; the
    metasearch/rank-fusion framing of Dwork, Kumar, Naor & Sivakumar WWW
    2001 — public methods): each ``ballot_col`` value is one BALLOT
    ranking the candidates it contains by (score desc, candidate asc —
    the pinned total order, no ties survive), and the group aggregates
    ballots two classic ways:

      * Borda: candidate earns (ballot size − rank) per ballot; winner =
        max total, ties to the lexicographically smallest candidate.
      * Condorcet: A beats B if A wins the strict majority of the ballots
        where BOTH appear; the Condorcet winner (if any) beats every
        other candidate the group ever ranked — NULL when the paradox
        cycle leaves none.

    Emits (keys…, n_ballots, borda_winner, borda_score,
    condorcet_winner).  Partial ballots (a candidate absent that day)
    score only where present — the standard truncated-ballot reading,
    identical in both engines.  All counts/scores exact int64.

    100 TB shape: ranks via one ballot-keyed window over the per-(ballot,
    candidate) AGGREGATE; the pairwise stage self-joins within ballots
    (≤ C(candidates,2) rows per ballot — candidate domain, not data,
    bounds it); winners via group windows.  No floats, no driver loop."""
    w = Window.partitionBy(*keys, ballot_col).orderBy(
        F.col(score_col).desc(), F.col(cand_col).asc()
    )
    ranked = counts.select(
        *keys, ballot_col, cand_col, score_col
    ).withColumn("_rank", F.row_number().over(w)).withColumn(
        "_m", F.count(F.lit(1)).over(Window.partitionBy(*keys, ballot_col))
    )
    borda = (
        ranked.groupBy(*keys, cand_col)
        .agg(F.sum(F.col("_m") - F.col("_rank")).cast("long").alias("_score"))
    )
    wb = Window.partitionBy(*keys).orderBy(
        F.col("_score").desc(), F.col(cand_col).asc()
    )
    borda_win = (
        borda.withColumn("_rn", F.row_number().over(wb))
        .filter(F.col("_rn") == 1)
        .select(
            *keys,
            F.col(cand_col).alias("borda_winner"),
            F.col("_score").alias("borda_score"),
        )
    )
    a = ranked.select(*keys, ballot_col, F.col(cand_col).alias("ca"), F.col("_rank").alias("ra"))
    b = ranked.select(*keys, ballot_col, F.col(cand_col).alias("cb"), F.col("_rank").alias("rb"))
    pair = (
        a.join(b, [*keys, ballot_col])
        .filter(F.col("ca") != F.col("cb"))
        .groupBy(*keys, "ca", "cb")
        .agg(
            F.count(F.lit(1)).cast("long").alias("_both"),
            F.sum((F.col("ra") < F.col("rb")).cast("long")).alias("_wins"),
        )
    )
    beats = pair.withColumn(
        "_beat", (F.lit(2) * F.col("_wins") > F.col("_both")).cast("long")
    )
    n_cand = counts.select(*keys, cand_col).distinct().groupBy(*keys).agg(
        F.count(F.lit(1)).alias("_nc")
    )
    cond = (
        beats.groupBy(*keys, "ca")
        .agg(F.sum("_beat").alias("_nbeat"))
        .join(n_cand, keys)
        .filter(F.col("_nbeat") == F.col("_nc") - 1)
        .select(*keys, F.col("ca").alias("condorcet_winner"))
    )
    n_ballots = counts.select(*keys, ballot_col).distinct().groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n_ballots")
    )
    return (
        n_ballots.join(borda_win, keys)
        .join(cond, keys, "left")
        .select(*keys, "n_ballots", "borda_winner", "borda_score", "condorcet_winner")
    )


def sql_rank_aggregation(
    counts_cte: str, keys: list[str], ballot_col: str, cand_col: str, score_col: str
) -> str:
    """DuckDB twin of :func:`rank_aggregation` — identical rank order,
    Borda totals, majority rule and beats-all test."""
    ks = ", ".join(keys)
    on = " AND ".join(f"a.{k} = b.{k}" for k in keys)
    aks = ", ".join(f"a.{k}" for k in keys)
    return f"""WITH ra_counts AS ({counts_cte}),
ra_ranked AS (
  SELECT {ks}, {ballot_col}, {cand_col},
         row_number() OVER (PARTITION BY {ks}, {ballot_col}
                            ORDER BY {score_col} DESC, {cand_col} ASC) AS rnk,
         count(*) OVER (PARTITION BY {ks}, {ballot_col}) AS m
  FROM ra_counts),
ra_borda AS (
  SELECT {ks}, {cand_col}, CAST(sum(m - rnk) AS BIGINT) AS score
  FROM ra_ranked GROUP BY {ks}, {cand_col}),
ra_bwin AS (
  SELECT {ks}, {cand_col} AS borda_winner, score AS borda_score
  FROM (SELECT *, row_number() OVER (PARTITION BY {ks}
                  ORDER BY score DESC, {cand_col} ASC) AS rn FROM ra_borda)
  WHERE rn = 1),
ra_pair AS (
  SELECT {aks}, a.{cand_col} AS ca, b.{cand_col} AS cb,
         count(*) AS both_n,
         sum(CASE WHEN a.rnk < b.rnk THEN 1 ELSE 0 END) AS wins
  FROM ra_ranked a JOIN ra_ranked b
    ON {on} AND a.{ballot_col} = b.{ballot_col}
   AND a.{cand_col} <> b.{cand_col}
  GROUP BY {aks}, ca, cb),
ra_nc AS (SELECT {ks}, count(DISTINCT {cand_col}) AS nc FROM ra_counts GROUP BY {ks}),
ra_cond AS (
  SELECT {ks}, ca AS condorcet_winner
  FROM (SELECT {ks}, ca,
               sum(CASE WHEN 2 * wins > both_n THEN 1 ELSE 0 END) AS nbeat
        FROM ra_pair GROUP BY {ks}, ca) p
  JOIN ra_nc USING ({ks})
  WHERE p.nbeat = ra_nc.nc - 1),
ra_nb AS (SELECT {ks}, CAST(count(DISTINCT {ballot_col}) AS BIGINT) AS n_ballots
          FROM ra_counts GROUP BY {ks})
SELECT n.*, w.borda_winner, w.borda_score, c.condorcet_winner
FROM ra_nb n
JOIN ra_bwin w USING ({ks})
LEFT JOIN ra_cond c USING ({ks})"""
