"""Bigram LM training + perplexity scoring (operators/lm.py).

Engine extension (the reference has no LM surface): the CCNet-style
quality gate. Checks: exact parity with a local pure-Python LM,
probability normalization under add-alpha smoothing, ordering sanity
(in-distribution text scores lower than scrambled text), and the
short-document guard.
"""

import math

import pytest

from baloo_spark.operators.lm import perplexity, train_bigram_lm

DOCS = [
    (1, "the cat sat on the mat"),
    (2, "the dog sat on the log"),
    (3, "the cat ate the fish"),
    (4, "a dog and a cat"),
    (5, "zq xv qpr zq"),          # out-of-distribution junk
    (6, "single"),                # < 2 tokens -> NULL scores
    (7, ""),                      # empty -> NULL scores
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id LONG, text STRING")


@pytest.fixture(scope="module")
def lm(docs):
    return train_bigram_lm(docs)


def _local_lm():
    bi, uni, vocab = {}, {}, set()
    for _, text in DOCS:
        toks = [t.lower() for t in text.split()]
        vocab.update(toks)
        for a, b in zip(toks, toks[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
            uni[a] = uni.get(a, 0) + 1
    return bi, uni, len(vocab)


def test_counts_match_local(lm):
    bi, uni, v = _local_lm()
    got_bi = {(r["w1"], r["w2"]): r["c12"] for r in lm.bigrams.collect()}
    got_uni = {r["w1"]: r["c1"] for r in lm.unigrams.collect()}
    assert got_bi == bi
    assert got_uni == uni
    assert lm.vocab_size == v


def test_probabilities_normalize(lm):
    """sum_w2 P(w2|w1) == 1: observed pairs contribute
    (c12+a)/(c1+aV), the (V - observed) unseen pairs a/(c1+aV)."""
    bi, uni, v = _local_lm()
    a = 1.0
    for w1, c1 in uni.items():
        seen = [(c12 + a) / (c1 + a * v)
                for (x, _), c12 in bi.items() if x == w1]
        n_seen = len(seen)
        total = sum(seen) + (v - n_seen) * a / (c1 + a * v)
        assert abs(total - 1.0) < 1e-12


def test_perplexity_matches_local(docs, lm):
    bi, uni, v = _local_lm()
    a = 1.0
    got = {r["doc_id"]: r for r in perplexity(docs, lm).collect()}
    for doc_id, text in DOCS:
        toks = [t.lower() for t in text.split()]
        row = got[doc_id]
        if len(toks) < 2:
            assert row["n_bigrams"] == 0
            assert row["avg_neg_logp"] is None and row["ppl"] is None
            continue
        lps = [math.log((bi.get((x, y), 0) + a)
                        / (uni.get(x, 0) + a * v))
               for x, y in zip(toks, toks[1:])]
        avg = -sum(lps) / len(lps)
        assert row["n_bigrams"] == len(lps)
        assert row["avg_neg_logp"] == pytest.approx(round(avg, 6), abs=1e-6)
        assert row["ppl"] == pytest.approx(round(math.exp(avg), 4),
                                           abs=1e-4)


def test_junk_scores_higher(spark, docs):
    # the production setup: train on a REFERENCE corpus, score
    # candidates — a junk doc inside the training set would get
    # near-deterministic probabilities from its own rare contexts
    ref = docs.where("doc_id <= 4")
    lm_ref = train_bigram_lm(ref)
    # light alpha keeps the count signal dominant over smoothing
    # mass on this tiny vocabulary
    got = {r["doc_id"]: r["ppl"]
           for r in perplexity(docs, lm_ref, alpha=0.1).collect()}
    in_dist = [got[1], got[2], got[3]]
    assert all(got[5] > p for p in in_dist)


def test_scoring_is_layout_independent(docs, lm):
    base = sorted(map(tuple, perplexity(docs, lm).collect()))
    shuffled = sorted(map(tuple,
                          perplexity(docs.repartition(7), lm).collect()))
    assert base == shuffled


def test_perplexity_broadcast_matches_join_face(docs, lm):
    from baloo_spark.operators.lm import perplexity_broadcast
    a = sorted(map(tuple, perplexity(docs, lm).collect()))
    b = sorted(map(tuple, perplexity_broadcast(docs, lm).collect()))
    assert a == b


def test_perplexity_broadcast_guards_model_size(docs, lm):
    from baloo_spark.operators.lm import perplexity_broadcast
    with pytest.raises(ValueError, match="max_model_rows"):
        perplexity_broadcast(docs, lm, max_model_rows=2)


def test_tokens_col_fast_path_parity(spark):
    """tokens_col (pre-tokenized reuse) must match the tokenize-
    internally path bit-for-bit across corpus_ngrams,
    vocabulary_stats, and the LM train/score pair."""
    from pyspark.sql import functions as F

    from baloo_spark.operators.lm import perplexity, train_bigram_lm
    from baloo_spark.operators.text import corpus_ngrams, vocabulary_stats
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").select("doc_id", "text")
    tkl = F.transform(
        F.filter(F.split(F.trim(F.col("text")), "\\s+"),
                 lambda x: x != F.lit("")), F.lower)
    tok = docs.withColumn("tkl", tkl)

    a = corpus_ngrams(docs, n=2, top_k=15).collect()
    b = corpus_ngrams(tok, n=2, top_k=15, tokens_col="tkl").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    va = vocabulary_stats(docs).first()
    vb = vocabulary_stats(tok, tokens_col="tkl").first()
    assert tuple(va) == tuple(vb)

    lm_a = train_bigram_lm(docs)
    lm_b = train_bigram_lm(tok, tokens_col="tkl")
    assert lm_a.vocab_size == lm_b.vocab_size
    pa = {r["doc_id"]: (r["n_bigrams"], r["ppl"])
          for r in perplexity(docs, lm_a, alpha=0.5).collect()}
    pb = {r["doc_id"]: (r["n_bigrams"], r["ppl"])
          for r in perplexity(tok, lm_b, alpha=0.5,
                              tokens_col="tkl").collect()}
    assert pa == pb
