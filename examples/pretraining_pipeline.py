"""End-to-end pre-training data pipeline on baloo_spark.

Chains the full operator surface the way a production corpus build
would: ingest -> text cleanup + PII redaction + quality/repetition
filtering ->
LM-perplexity gate (r3) -> exact + near dedup -> benchmark
decontamination -> chunking -> context-window packing ->
deterministic train/val/test split -> partitioned parquet.

Run:  python examples/pretraining_pipeline.py [sf_dir] [out_dir]
(defaults: /root/testdata/sf0.001, a temp dir). Prints one JSON
summary line; every stage is lazy until the final writes.

Scale notes are inline per stage — the same script is the 100 TB
shape: narrow projections until the dedup hash-agg, candidate
near-dup joins are LSH-bucketed, the benchmark set is broadcast, the
only wide shuffles are keyed by content hash / doc_id / pack bucket.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F


def build_corpus(spark, sf_dir: str, out_dir: str,
                 min_quality: float = 0.68,
                 chunk_tokens: int = 128, overlap: int = 16,
                 budget_tokens: int = 512) -> dict:
    from baloo_spark.operators.chunking import chunk_documents, pack_chunks
    from baloo_spark.operators.dedup import (exact_duplicates,
                                             minhash_lsh_pairs)
    from baloo_spark.operators.lm import perplexity, train_bigram_lm
    from baloo_spark.operators.sampling import train_test_split
    from baloo_spark.operators.text import contamination_check
    from baloo_spark.streaming.docs import quality_pipeline

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_raw = docs.count()

    # 1. redact -> profile redacted text -> quality/repetition filter
    #    (single-scan projection chain, no shuffle)
    clean = quality_pipeline(docs, min_quality=min_quality)

    # 1b. LM-perplexity quality gate (CCNet-style): train a smoothed
    #    bigram LM on the surviving docs, drop the worst 10% by
    #    perplexity (two count aggs to train; an explode + two
    #    count-table joins to score — the quantile threshold is one
    #    tiny scalar job). Tokenize ONCE and feed both passes via the
    #    tokens_col fast path (r5): train and score would otherwise
    #    each re-split the cleaned text
    tkl = F.transform(
        F.filter(F.split(F.trim(F.col("text")), "\\s+"),
                 lambda x: x != F.lit("")), F.lower)
    tokd = clean.withColumn("__tkl__", tkl)
    lm = train_bigram_lm(tokd, tokens_col="__tkl__")
    scores = perplexity(tokd, lm, alpha=0.5, tokens_col="__tkl__")
    cutoff = scores.where(F.col("ppl").isNotNull()) \
        .approxQuantile("ppl", [0.9], 0.001)[0]
    keep = scores.where(F.col("ppl").isNull()
                        | (F.col("ppl") <= F.lit(cutoff))) \
        .select("doc_id")
    clean = clean.join(keep, "doc_id")

    # 2. exact dedup on normalized content (one hash-agg shuffle);
    #    keep the surviving doc ids
    survivors = exact_duplicates(clean, "text", "doc_id") \
        .select(F.col("keep_id").alias("doc_id"))
    clean = clean.join(survivors, "doc_id")

    # 3. near-dup pass: MinHash banding proposes candidates (band
    #    equi-join, never all-pairs); drop the higher id of each
    #    verified pair
    pairs = minhash_lsh_pairs(clean, text_col="text", id_col="doc_id",
                              threshold=0.8, k=64, bands=16)
    losers = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    clean = clean.join(losers, "doc_id", "left_anti")

    # 4. decontamination vs the held-out benchmark (every 20th doc
    #    stands in); benchmark grams broadcast, corpus side narrow
    bench = docs.where(F.col("doc_id") % 20 == 0)
    flags = contamination_check(clean, bench, n=5, threshold=0.5) \
        .where(~F.col("is_contaminated")) \
        .select("doc_id")
    clean = clean.join(flags, "doc_id")

    # 5. chunk to token windows (stateless posexplode) and pack into
    #    context windows (one bucket-keyed shuffle into parallel
    #    greedy packers)
    chunks = chunk_documents(clean, chunk_tokens=chunk_tokens,
                             overlap=overlap)
    packed = pack_chunks(chunks, budget_tokens=budget_tokens,
                         n_buckets=32)

    # 6. leakage-safe split: all chunks of a document stay together
    split = train_test_split(packed, key="doc_id",
                             weights={"train": 0.9, "val": 0.05,
                                      "test": 0.05}, seed=13)

    # 7. partitioned sink: one directory per split, ready for the
    #    training loader; writer-side partitioning prunes reads
    split.write.mode("overwrite").partitionBy("split") \
        .parquet(f"{out_dir}/corpus")

    stats = {r["split"]: (r["n_chunks"], r["n_tokens"]) for r in
             spark.read.parquet(f"{out_dir}/corpus")
             .groupBy("split")
             .agg(F.count("*").alias("n_chunks"),
                  F.sum("chunk_n_tokens").alias("n_tokens")).collect()}
    return {
        "docs_in": n_raw,
        "ppl_cutoff": round(cutoff, 2),
        "docs_out": clean.count(),
        "chunks": packed.count(),
        "bins": packed.select("bucket", "bin_seq").distinct().count(),
        "splits": {k: {"chunks": int(v[0]), "tokens": int(v[1])}
                   for k, v in sorted(stats.items())},
    }


def main():
    from baloo_spark.session import get_session
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp()
    spark = get_session("pretraining_pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    print(json.dumps(build_corpus(spark, sf, out)))


if __name__ == "__main__":
    main()
