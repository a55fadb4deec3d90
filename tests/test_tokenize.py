"""BPE tokenizer (operators/tokenize.py): distributed word counts,
merge learning, and the Arrow-batched encoder."""

import pandas as pd
import pytest

from baloo_spark.operators.tokenize import (bpe_encode_word,
                                            bpe_token_counts, train_bpe,
                                            word_counts)


@pytest.fixture()
def corpus(spark):
    return spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["low low low low low lower lower newest newest",
                 "newest newest newest widest widest",
                 "low widest newest lower"]}))


def test_word_counts(spark, corpus):
    got = {r["word"]: r["count"] for r in word_counts(corpus).collect()}
    assert got["low"] == 6 and got["newest"] == 6
    assert got["lower"] == 3 and got["widest"] == 3


def test_train_bpe_learns_frequent_pairs(spark, corpus):
    merges = train_bpe(corpus, n_merges=12)
    assert len(merges) == 12
    # deterministic across runs
    assert merges == train_bpe(corpus, n_merges=12)
    # the most frequent pairs of this corpus surface early: 'lo' and
    # 'es' families ('low' x10-ish, '*est' x9)
    first = {a + b for a, b in merges[:6]}
    assert any("lo" in m for m in first)
    assert any("es" in m or "st" in m for m in first)


def test_bpe_encode_word_merging():
    # ranks: merge 'l'+'o' first, then 'lo'+'w', then 'w'+'</w>'
    ranks = {("l", "o"): 0, ("lo", "w"): 1, ("w", "</w>"): 2}
    assert bpe_encode_word("low", ranks) == ["low", "</w>"]
    # unknown word falls back to characters + end marker
    assert bpe_encode_word("xyz", ranks) == ["x", "y", "z", "</w>"]


def test_bpe_token_counts_matches_local_encoder(spark, corpus):
    merges = train_bpe(corpus, n_merges=10)
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    got = {r["doc_id"]: (r["n_bpe_tokens"], r["n_words"])
           for r in bpe_token_counts(corpus, merges).collect()}
    pdf = corpus.toPandas()
    import re
    rex = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")
    for _, row in pdf.iterrows():
        words = rex.findall(row["text"])
        want = sum(len(bpe_encode_word(w, ranks)) for w in words)
        assert got[row["doc_id"]] == (want, len(words))
    # trained merges compress: fewer tokens than chars+end-markers
    base = {r["doc_id"]: sum(len(w) + 1 for w in rex.findall(t))
            for r, t in zip(corpus.collect(), pdf["text"])}
    for d, (n_bpe, _) in got.items():
        assert n_bpe < base[d]


def test_train_bpe_max_words_guard(spark, corpus):
    with pytest.raises(ValueError, match="frequency floor"):
        train_bpe(corpus, n_merges=2, max_words=3)
