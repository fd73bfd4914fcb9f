"""Portable Bloom filter (Bloom 1970) as exact cross-engine bit algebra.

The join-pruning sketch every lakehouse reader carries (Spark's own runtime
Bloom pruning is plan-level; this is the DATA-level twin a writer persists
next to a partition): k = 2 salted hashes of the portable 60-bit md5
integer (functions/text.md5_long — identical text in DuckDB), 16 words ×
63 bits (bit 63 never set, so every word stays positive int64 and << is
overflow-safe in BOTH engines), build = one bit_or aggregate, probe = two
AND-mask tests against the broadcast 1-row filter.

Everything is exact integer bit algebra: the filter words themselves go on
the cross-engine hash, so hash portability, the bit layout AND the
classic laws (zero false negatives; FPR ≈ (1−e^{−kn/m})^k) are all pinned.

Scale shape: build is a map-side-combinable bit_or aggregate (any data
volume → 16 longs); probe is a broadcast map-only pass.  At 10^12 rows
per-partition filters would simply bit_or-merge — associativity is the
whole point of the representation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from osmgraft.functions import text as T

WORDS = 16
BITS = 63  # bits per word; positions 0..62 keep every word nonnegative
M = WORDS * BITS


def _hashes(key: Column) -> tuple[Column, Column]:
    h0 = T.md5_long(F.concat(key.cast("string"), F.lit(":0"))) % M
    h1 = T.md5_long(F.concat(key.cast("string"), F.lit(":1"))) % M
    return h0, h1


def _sql_hashes(key: str) -> tuple[str, str]:
    h0 = f"({T.sql_md5_long(f'CAST({key} AS VARCHAR) || ' + chr(39) + ':0' + chr(39))} % {M})"
    h1 = f"({T.sql_md5_long(f'CAST({key} AS VARCHAR) || ' + chr(39) + ':1' + chr(39))} % {M})"
    return h0, h1


def bloom_build(keys: DataFrame, key: str) -> DataFrame:
    """Distinct keys → ONE row (w0..w{WORDS-1}) — the persisted filter."""
    h0, h1 = _hashes(F.col(key))
    d = keys.select(h0.alias("h0"), h1.alias("h1"))
    bit0 = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(h0 % 63 AS INT))")
    bit1 = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(h1 % 63 AS INT))")
    aggs = []
    for i in range(WORDS):
        contrib = (
            F.when(F.expr("h0 div 63") == i, bit0)
            .otherwise(F.lit(0).cast("long"))
            .bitwiseOR(
                F.when(F.expr("h1 div 63") == i, bit1).otherwise(
                    F.lit(0).cast("long")
                )
            )
        )
        aggs.append(F.coalesce(F.bit_or(contrib), F.lit(0).cast("long")).alias(f"w{i}"))
    return d.agg(*aggs)


def bloom_probe_stats(
    members: DataFrame, probes: DataFrame, key: str
) -> DataFrame:
    """Build the filter over ``members[key]``, probe every ``probes[key]``
    row, and emit the single summary row
    (n_members, n_probes, n_pass, n_false, w0..w15): n_false = passes that
    are NOT members (the measured false positives — exact, so the FPR is a
    pinned rational n_false / (n_probes − n_members)); zero false
    negatives is a LAW (n_pass − n_false == n_members for distinct keys).
    Probe = broadcast map-only pass; membership check for the false-split
    is one broadcast semi-join when members is aggregate-sized, else a
    hash join — here the exact flag rides along from the caller's tables."""
    filt = bloom_build(members.select(key).distinct(), key)
    mem = members.select(F.col(key).alias("k")).distinct().withColumn(
        "is_member", F.lit(1)
    )
    p = (
        probes.select(F.col(key).alias("k"))
        .distinct()
        .join(mem, "k", "left")
        .withColumn("is_member", F.coalesce("is_member", F.lit(0)))
    )
    h0, h1 = _hashes(F.col("k"))
    p = p.withColumn("h0", h0).withColumn("h1", h1).crossJoin(F.broadcast(filt))

    def test(h: str) -> Column:
        word = None
        for i in range(WORDS):
            cond = F.expr(f"{h} div 63") == i
            word = F.when(cond, F.col(f"w{i}")) if word is None else word.when(
                cond, F.col(f"w{i}")
            )
        mask = F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({h} % 63 AS INT))")
        return (word.bitwiseAND(mask)) != 0

    p = p.withColumn("pass", (test("h0") & test("h1")).cast("long"))
    out = p.agg(
        F.sum("is_member").cast("long").alias("n_members"),
        F.count(F.lit(1)).cast("long").alias("n_probes"),
        F.sum("pass").cast("long").alias("n_pass"),
        F.sum(F.col("pass") * (1 - F.col("is_member"))).cast("long").alias("n_false"),
    )
    return out.crossJoin(F.broadcast(filt))


def sql_bloom_probe_stats(members_cte: str, probes_cte: str) -> str:
    """DuckDB twin: members_cte/probes_cte each yield a single column k."""
    h0m, h1m = _sql_hashes("k")
    words = ", ".join(
        f"coalesce(bit_or(CASE WHEN {h0m} // 63 = {i} THEN (1::BIGINT << CAST({h0m} % 63 AS INTEGER)) ELSE 0 END"
        f" | CASE WHEN {h1m} // 63 = {i} THEN (1::BIGINT << CAST({h1m} % 63 AS INTEGER)) ELSE 0 END), 0) AS w{i}"
        for i in range(WORDS)
    )

    def test(h: str) -> str:
        pick = " ".join(
            f"WHEN {h} // 63 = {i} THEN w{i}" for i in range(WORDS)
        )
        return f"((CASE {pick} END) & (1::BIGINT << CAST({h} % 63 AS INTEGER))) != 0"

    return f"""WITH bmem AS (SELECT DISTINCT k FROM ({members_cte})),
bfilt AS (SELECT {words} FROM bmem),
bprob AS (
  SELECT p.k, CASE WHEN m.k IS NULL THEN 0 ELSE 1 END AS is_member,
         {h0m.replace('k', 'p.k')} AS h0, {h1m.replace('k', 'p.k')} AS h1
  FROM (SELECT DISTINCT k FROM ({probes_cte})) p LEFT JOIN bmem m ON m.k = p.k),
pp AS (
  SELECT is_member,
         CASE WHEN ({test('h0')}) AND ({test('h1')}) THEN 1 ELSE 0 END AS pass
  FROM bprob, bfilt)
SELECT CAST(sum(is_member) AS BIGINT) AS n_members,
       CAST(count(*) AS BIGINT) AS n_probes,
       CAST(sum(pass) AS BIGINT) AS n_pass,
       CAST(sum(pass * (1 - is_member)) AS BIGINT) AS n_false,
       (SELECT w0 FROM bfilt) AS w0, (SELECT w1 FROM bfilt) AS w1,
       (SELECT w2 FROM bfilt) AS w2, (SELECT w3 FROM bfilt) AS w3,
       (SELECT w4 FROM bfilt) AS w4, (SELECT w5 FROM bfilt) AS w5,
       (SELECT w6 FROM bfilt) AS w6, (SELECT w7 FROM bfilt) AS w7,
       (SELECT w8 FROM bfilt) AS w8, (SELECT w9 FROM bfilt) AS w9,
       (SELECT w10 FROM bfilt) AS w10, (SELECT w11 FROM bfilt) AS w11,
       (SELECT w12 FROM bfilt) AS w12, (SELECT w13 FROM bfilt) AS w13,
       (SELECT w14 FROM bfilt) AS w14, (SELECT w15 FROM bfilt) AS w15
FROM pp"""
