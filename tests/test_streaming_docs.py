"""Streaming faces of the document pipeline (streaming/docs.py):
batch face is the oracle for the stream face."""

import pandas as pd
import pytest

from baloo_spark.streaming.docs import (chunk_stream, contamination_flags,
                                        quality_pipeline, read_docs_stream)
from baloo_spark.streaming.events import run_stream_to_memory

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def docs_dir(spark, tmp_path):
    """Documents split over several files so the stream sees multiple
    inputs."""
    out = str(tmp_path / "docs_in")
    (spark.read.parquet(f"{SF}/documents.parquet")
     .repartition(3).write.parquet(out))
    return out


def _sorted(df, keys):
    return df.toPandas().sort_values(keys).reset_index(drop=True)


def test_quality_pipeline_stream_matches_batch(spark, docs_dir, request):
    # testdata scores span 0.65-0.88, so 0.70 actually splits the set
    batch = quality_pipeline(spark.read.parquet(docs_dir),
                             min_quality=0.70)
    stream = quality_pipeline(read_docs_stream(spark, docs_dir),
                              min_quality=0.70)
    assert stream.isStreaming
    got = run_stream_to_memory(spark, stream, name="qp_out")
    request.addfinalizer(
        lambda: spark.catalog.dropTempView("qp_out"))
    a = _sorted(batch, ["doc_id"])
    b = _sorted(got, ["doc_id"])
    pd.testing.assert_frame_equal(a, b)
    # the filter actually dropped something and kept something
    total = spark.read.parquet(docs_dir).count()
    assert 0 < len(a) < total


def test_chunk_stream_matches_batch(spark, docs_dir, request):
    from baloo_spark.operators.chunking import chunk_documents
    batch = chunk_documents(spark.read.parquet(docs_dir),
                            chunk_tokens=40, overlap=8)
    stream = chunk_stream(read_docs_stream(spark, docs_dir),
                          chunk_tokens=40, overlap=8)
    assert stream.isStreaming
    got = run_stream_to_memory(spark, stream, name="cs_out")
    request.addfinalizer(
        lambda: spark.catalog.dropTempView("cs_out"))
    pd.testing.assert_frame_equal(
        _sorted(batch, ["doc_id", "chunk_seq"]),
        _sorted(got, ["doc_id", "chunk_seq"]))


def test_contamination_flags_stream_matches_batch_operator(
        spark, docs_dir, request):
    """The per-row streaming variant must agree exactly with the
    aggregate-based batch operator (contamination_check) on the same
    benchmark set."""
    from pyspark.sql import functions as F

    from baloo_spark.operators.text import (_word_grams,
                                            contamination_check)
    docs = spark.read.parquet(docs_dir)
    bench_df = docs.where(F.col("doc_id") % 20 == 0)
    # collect the benchmark gram set once (bounded: it's an eval set)
    norm = F.lower(F.regexp_replace(F.trim(F.col("text")), "\\s+", " "))
    toks = F.filter(F.split(norm, " "), lambda x: x != F.lit(""))
    grams = [r["g"] for r in bench_df
             .withColumn("__t__", toks)
             .select(F.explode(F.array_distinct(_word_grams("__t__", 5)))
                     .alias("g"))
             .distinct().collect()]
    batch_want = contamination_check(docs, bench_df, n=5, threshold=0.2)
    stream = contamination_flags(read_docs_stream(spark, docs_dir),
                                 grams, n=5, threshold=0.2)
    assert stream.isStreaming
    got = run_stream_to_memory(spark, stream, name="cf_out")
    request.addfinalizer(
        lambda: spark.catalog.dropTempView("cf_out"))
    pd.testing.assert_frame_equal(
        _sorted(batch_want, ["doc_id"]), _sorted(got, ["doc_id"]))
    # sanity: benchmark docs flag themselves
    flagged = {r["doc_id"] for r in got.where("is_contaminated").collect()}
    bench_ids = {r["doc_id"] for r in bench_df.select("doc_id").collect()}
    long_bench = {r["doc_id"] for r in bench_df
                  .where(F.size(F.split(F.trim("text"), "\\s+")) >= 5)
                  .collect()}
    assert long_bench <= flagged or not long_bench
    assert bench_ids or True


def test_quality_pipeline_plan_is_stateless_linear(spark, docs_dir):
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        quality_pipeline(spark.read.parquet(docs_dir)).explain("formatted")
    plan = buf.getvalue()
    # join-free narrow chain: safe on an unbounded stream (no state;
    # on the actual stream spread() no-ops so even the round-robin
    # balancing exchange below is batch-face-only)
    assert "Join" not in plan
    # spread() (plans/layout.py) may prepend ONE RoundRobinPartitioning
    # exchange to balance a single-row-group scan; the invariant that
    # matters is NO KEYED exchange (hash/range) — the operator's own
    # logic moves no data by key.
    assert "hashpartitioning" not in plan
    assert "rangepartitioning" not in plan


def test_bpe_token_counts_works_on_stream(spark, docs_dir, request):
    # stateless apply: the batch-trained merges broadcast into the
    # streaming face unchanged
    from baloo_spark.operators.tokenize import bpe_token_counts, train_bpe
    batch = spark.read.parquet(docs_dir)
    merges = train_bpe(batch, n_merges=20)
    want = {r["doc_id"]: r["n_bpe_tokens"]
            for r in bpe_token_counts(batch, merges).collect()}
    stream = bpe_token_counts(read_docs_stream(spark, docs_dir), merges)
    assert stream.isStreaming
    got_df = run_stream_to_memory(spark, stream, name="bpe_out")
    request.addfinalizer(lambda: spark.catalog.dropTempView("bpe_out"))
    got = {r["doc_id"]: r["n_bpe_tokens"] for r in got_df.collect()}
    assert got == want


def test_perplexity_broadcast_works_on_stream(spark, docs_dir, request):
    # the model-as-artifact face is a stateless projection, so the
    # streaming face IS the batch function on readStream — batch
    # result is the oracle
    from baloo_spark.operators.lm import (perplexity_broadcast,
                                          train_bigram_lm)
    batch = spark.read.parquet(docs_dir)
    lm = train_bigram_lm(batch)
    want = {r["doc_id"]: (r["n_bigrams"], r["avg_neg_logp"], r["ppl"])
            for r in perplexity_broadcast(batch, lm).collect()}
    stream = perplexity_broadcast(read_docs_stream(spark, docs_dir), lm)
    assert stream.isStreaming
    got_df = run_stream_to_memory(spark, stream, name="ppl_out")
    request.addfinalizer(lambda: spark.catalog.dropTempView("ppl_out"))
    got = {r["doc_id"]: (r["n_bigrams"], r["avg_neg_logp"], r["ppl"])
           for r in got_df.collect()}
    assert got == want


def test_assign_clusters_works_on_stream(spark, tmp_path, request):
    # pure argmin projection: stream face == batch face
    from baloo_spark.operators.cluster import assign_clusters
    rows = [(i, [float(i % 2) * 10.0] * 4) for i in range(20)]
    batch = spark.createDataFrame(rows,
                                  "vec_id LONG, embedding ARRAY<DOUBLE>")
    path = str(tmp_path / "vecs")
    batch.write.mode("overwrite").parquet(path)
    cents = [[0.0] * 4, [10.0] * 4]
    want = {r["vec_id"]: r["cluster"]
            for r in assign_clusters(batch, cents).collect()}
    stream = assign_clusters(
        spark.readStream.schema("vec_id LONG, embedding ARRAY<DOUBLE>")
        .parquet(path), cents)
    assert stream.isStreaming
    got_df = run_stream_to_memory(spark, stream, name="clus_out")
    request.addfinalizer(lambda: spark.catalog.dropTempView("clus_out"))
    got = {r["vec_id"]: r["cluster"] for r in got_df.collect()}
    assert got == want


def test_simhash_expr_matches_batch_signatures(spark, docs_dir):
    from pyspark.sql import functions as F

    from baloo_spark.operators.dedup import (simhash_expr,
                                             simhash_signatures)
    docs = spark.read.parquet(docs_dir)
    want = {r["doc_id"]: r["simhash"]
            for r in simhash_signatures(docs).collect()}
    got = {r["doc_id"]: r["s"]
           for r in docs.select("doc_id",
                                simhash_expr("text").alias("s")).collect()}
    assert got == want


def test_near_dedup_stream_drops_signature_dups(spark, docs_dir, request):
    from pyspark.sql import functions as F

    from baloo_spark.operators.dedup import simhash_expr
    from baloo_spark.streaming.docs import near_dedup_stream
    batch = spark.read.parquet(docs_dir)
    # batch twin: one survivor per distinct signature
    want = (batch.withColumn("__sig__", simhash_expr("text"))
            .select("__sig__").distinct().count())
    stream = near_dedup_stream(read_docs_stream(spark, docs_dir))
    assert stream.isStreaming
    out = run_stream_to_memory(spark, stream, name="neardedup_out")
    request.addfinalizer(
        lambda: spark.catalog.dropTempView("neardedup_out"))
    kept = out.withColumn("__sig__", simhash_expr("text"))
    assert kept.count() == want                      # one per signature
    assert kept.select("__sig__").distinct().count() == want
    assert set(out.columns) == set(batch.columns)    # helper cols gone
