"""Semantic (embedding-space) dedup + retrieval pipeline on baloo_spark.

The embedding-side companion of examples/pretraining_pipeline.py:
normalize -> int8-quantize for footprint -> k-means bucketing ->
within-bucket near-duplicate pairs -> connected-components clustering
-> survivor selection -> exact ANN spot-check of the survivors.

Run:  python examples/semantic_dedup.py [sf_dir]
(default /root/testdata/sf0.001). Prints one JSON summary line.

Scale notes inline — the same script is the 100 TB shape: the corpus
is scanned once per stage, every pair-generating step is bucketed
(hyperplane LSH or k-means cells), centroids/queries are the only
driver-side state (k x dim and n_queries x dim), and the quantized
corpus is 4x lighter in cache and shuffle.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F


def run(spark, sf_dir: str) -> dict:
    from baloo_spark.operators.cluster import kmeans
    from baloo_spark.operators.dedup import (drop_near_duplicates,
                                             embedding_near_pairs)
    from baloo_spark.operators.similarity import (brute_force_topk,
                                                  normalize_embeddings,
                                                  quantize_int8)

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n_in = emb.count()

    # 1. L2-normalize once: downstream cosine becomes a dot product
    vecs = normalize_embeddings(emb)

    # 2. int8 quantization: 4x lighter corpus for cache/shuffle; the
    #    original column is dropped, scores use dequantized values
    packed = quantize_int8(vecs)
    q_bytes = packed.select(
        F.sum(F.expr("size(q_vec)") + F.lit(4)).alias("b")).first()["b"]

    # 3. k-means bucketing over the FULL corpus (broadcast-centroid
    #    argmin per iteration; driver sees k x dim numbers per round)
    tagged, cents, iters = kmeans(vecs, n_clusters=8, max_iters=8)
    cluster_sizes = {r["cluster"]: r["n"] for r in
                     tagged.groupBy("cluster")
                     .agg(F.count(F.lit(1)).alias("n")).collect()}

    # 4. near-duplicate pairs: hyperplane-LSH-bucketed cosine — the
    #    quadratic pair space never materializes. This synthetic
    #    corpus is near-random (no pairs above cosine 0.5), so the
    #    demo threshold sits at 0.3 with a shallow 4-plane blocking;
    #    REAL near-dup corpora use threshold >=0.95, where collision
    #    probability (1 - theta/pi)^planes is high and deeper
    #    blocking keeps buckets tiny
    #    seeds=[0, 1]: union candidates from two independent plane
    #    families (r5) — the recall amplifier for production runs,
    #    where a single family's unlucky split silently drops dups
    pairs = embedding_near_pairs(vecs, threshold=0.3, block=True,
                                 planes=4, seeds=[0, 1])

    # 5. transitive closure -> one survivor (min id) per duplicate
    #    cluster; drop the rest (loser anti-join, broadcast-small)
    survivors = drop_near_duplicates(vecs, pairs, id_col="vec_id")
    n_out = survivors.count()

    # 6. retrieval spot-check over the survivors: exact cosine top-3
    #    for 5 probe vectors (broadcast queries, two-phase top-k)
    probes = survivors.orderBy("vec_id").limit(5)
    hits = brute_force_topk(probes, survivors, k=3)

    return {
        "vectors_in": n_in,
        "quantized_mb": round(q_bytes / 1e6, 2),
        "kmeans_iters": iters,
        "cluster_sizes": {int(k): int(v)
                          for k, v in sorted(cluster_sizes.items())},
        "near_dup_pairs": pairs.count(),
        "survivors": n_out,
        "topk_rows": hits.count(),
    }


def main():
    from baloo_spark.session import get_session
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_session("semantic_dedup")
    spark.sparkContext.setLogLevel("ERROR")
    print(json.dumps(run(spark, sf)))


if __name__ == "__main__":
    main()
