"""Streaming incremental dedup: the daily-crawl pattern, end to end.

`incremental_dedup` (operators/dedup.py) is documented as the
append-only-corpus operator: each new crawl drop is anti-joined
against the historical fingerprint store, deduped within itself, and
the store grows by the batch's novel fingerprints. This example runs
that loop under Structured Streaming with ``foreachBatch`` — the
production wiring:

    crawl drops (parquet files appearing in a directory)
      -> readStream (maxFilesPerTrigger=1 => one drop per micro-batch)
      -> foreachBatch:
           seen   = read fingerprint store (parquet dir; None first time)
           survivors, _ = incremental_dedup(batch, seen)
           survivors -> append to the corpus sink
           novel fingerprints -> APPEND to the store

The store is append-only parquet — each batch writes only its novel
fingerprints, so there is no read-then-overwrite race on the store
path and the store stays (32-byte md5 x distinct contents), a normal
join side at 100 TB corpus scale, exactly as the operator docstring
prescribes. foreachBatch gives exactly-once-per-batch semantics via
the stream checkpoint: a replayed batch re-reads the store as of its
original write set.

Run:  python examples/incremental_crawl_dedup.py [sf_dir]
(default /root/testdata/sf0.001). Prints one JSON line with per-batch
survivor counts from the STREAM loop and from a pure-batch replay of
the same two drops — the two must match (the stream is the same
operator, fed incrementally). Batch 1 = even doc_ids, batch 2 = odd,
matching the dedup_exact driver slot's b1/b2 legs.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F


def run_incremental_stream(spark, sf_dir: str, work_dir: str) -> dict:
    from baloo_spark.operators.dedup import incremental_dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text")
    src = os.path.join(work_dir, "drops")
    store = os.path.join(work_dir, "seen_store")
    corpus = os.path.join(work_dir, "corpus")
    ckpt = os.path.join(work_dir, "ckpt")

    # stage two crawl drops; distinct mtimes pin the pickup order.
    # drop 2 = the odd docs PLUS re-crawls of every 10th even doc
    # under fresh doc_ids (crawlers re-fetch pages) — the testdata's
    # contents are distinct, so the re-crawls are what exercises the
    # cross-batch anti-join
    drop1 = docs.where(F.col("doc_id") % 2 == 0)
    recrawl = drop1.where(F.col("doc_id") % 10 == 0) \
        .select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
    drop2 = docs.where(F.col("doc_id") % 2 == 1).unionByName(recrawl)
    drop1.coalesce(1).write.mode("overwrite") \
        .parquet(os.path.join(src, "drop1"))
    time.sleep(1.1)
    drop2.coalesce(1).write.mode("overwrite") \
        .parquet(os.path.join(src, "drop2"))

    batch_counts: dict[int, int] = {}

    def dedup_batch(batch_df, batch_id: int):
        seen = (spark.read.parquet(store)
                if os.path.isdir(store) and os.listdir(store) else None)
        survivors, _ = incremental_dedup(batch_df, seen)
        # one materialization feeds both sinks and the count
        survivors = survivors.localCheckpoint()
        survivors.withColumn("batch_id", F.lit(batch_id)) \
            .write.mode("append").parquet(corpus)
        survivors.select("fingerprint").write.mode("append").parquet(store)
        batch_counts[int(batch_id)] = survivors.count()

    stream = (spark.readStream.schema(docs.schema)
              .option("maxFilesPerTrigger", 1)
              .option("recursiveFileLookup", "true")
              .parquet(src))
    q = (stream.writeStream.foreachBatch(dedup_batch)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination()

    # pure-batch replay of the same two drops: must agree
    b1, seen1 = incremental_dedup(drop1, None)
    seen1 = seen1.localCheckpoint()
    b2, _ = incremental_dedup(drop2, seen1)
    replay = {0: b1.count(), 1: b2.count()}

    return {
        "stream_batches": {str(k): v for k, v in
                           sorted(batch_counts.items())},
        "batch_replay": {str(k): v for k, v in replay.items()},
        "match": batch_counts == replay,
        "batch2_rows_in": drop2.count(),
        "batch2_dropped_as_seen": drop2.count() - replay[1],
        "store_fingerprints": spark.read.parquet(store).distinct().count(),
        "corpus_rows": spark.read.parquet(corpus).count(),
    }


def main():
    import tempfile

    from baloo_spark.session import get_session

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_session()
    with tempfile.TemporaryDirectory() as work:
        out = run_incremental_stream(spark, sf_dir, work)
    print(json.dumps(out))
    if not out["match"]:
        raise SystemExit("stream/batch survivor counts diverged")


if __name__ == "__main__":
    main()
