"""Training-data curation pipeline as a spark-submit job.

    spark-submit --master <cluster> --py-files dist/osmgraft.zip \
        tools/jobs/curation_job.py --input <documents_path> --output <out_path>

The standard pretraining filter chain as one deployable job: language ID →
bigram-fluency floor → repetition cap → length band → exact-dedup
canonicalization → fixed-length sequence packing, writing packed training
windows as parquet. With --rows N a deterministic synthetic corpus is
generated instead of reading a table (sandbox / smoke mode). The per-stage
survivor counts are printed as one JSON line, so the job's run log IS the
curation funnel report.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def synth_docs(spark: SparkSession, n: int) -> DataFrame:
    """Deterministic word-salad corpus (same character as the test fixture):
    doc i draws 10-120 words from a fixed vocabulary by integer hashing."""
    vocab = (
        "the spark join hash table scan filter row value data key agg part "
        "window order batch line small fast slow customer supplier region "
        "nation price ship mode clerk comment status flag tax due segment"
    ).split()
    arr = "array(" + ", ".join(f"'{w}'" for w in vocab) + ")"
    n_words = "(pmod(hash(id, 7), 111) + 10)"
    word_i = "pmod(hash(id, j), %d) + 1" % len(vocab)
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.expr(
            f"array_join(transform(sequence(1, {n_words}), "
            f"j -> element_at({arr}, {word_i})), ' ')"
        ).alias("text"),
    )


def curate(docs: DataFrame, seq_len: int) -> tuple[DataFrame, dict[str, int]]:
    from osmgraft.functions import text as T
    from osmgraft.operators.packing import pack_sequences
    from pyspark.sql.window import Window

    counts: dict[str, int] = {"all": docs.count()}
    sig = docs.select(
        "doc_id",
        "text",
        T.lang_id(F.col("text")).alias("lang"),
        T.bigram_quality(F.col("text")).alias("bq"),
        T.token_count(F.col("text")).alias("ntok"),
        T.fingerprint(F.col("text")).alias("fp"),
    )
    kept = sig.filter(F.col("lang") == "en")
    counts["lang_en"] = kept.count()
    kept = kept.filter(F.col("bq") >= 250)
    counts["fluent"] = kept.count()
    # repetition cap (Gopher-style top-token share, same spec as the gated
    # curation_funnel query): toks materialized so the HOF lambda doesn't
    # recapture the tokenize pipeline
    kept = kept.withColumn("toks", T.tokens(F.col("text")))
    top_ptm = F.when(F.size("toks") == 0, F.lit(0)).otherwise(
        F.expr(
            "(1000 * coalesce(array_max(transform(array_distinct(toks),"
            " d -> size(filter(toks, t -> t = d)))), 0)) div size(toks)"
        )
    )
    kept = kept.filter(top_ptm < 140).drop("toks")
    counts["low_repetition"] = kept.count()
    kept = kept.filter(F.col("ntok").between(10, 10_000))
    counts["length_band"] = kept.count()
    w = Window.partitionBy("fp").orderBy("doc_id")
    kept = kept.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1)
    counts["dedup_canonical"] = kept.count()
    packed = pack_sequences(kept.select("doc_id", "text"), seq_len=seq_len)
    return packed, counts


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="documents parquet path (omit with --rows)")
    ap.add_argument("--output", required=True)
    ap.add_argument("--rows", type=int, help="synthetic doc count (smoke mode)")
    ap.add_argument("--seq-len", type=int, default=128)
    args = ap.parse_args()

    spark = SparkSession.builder.appName("osmgraft-curation").getOrCreate()
    docs = (
        synth_docs(spark, args.rows)
        if args.rows
        else spark.read.parquet(args.input).select("doc_id", "text")
    )
    packed, counts = curate(docs, args.seq_len)
    packed.write.mode("overwrite").parquet(args.output)
    counts["packed_windows"] = spark.read.parquet(args.output).count()
    print("osmgraft-curation: " + json.dumps(counts))
    spark.stop()


if __name__ == "__main__":
    main()
