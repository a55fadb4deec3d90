"""Byte-pair-encoding tokenization: distributed training-corpus
statistics + a real BPE merge learner and encoder.

Division of labor (the same split every production BPE trainer uses —
the corpus-sized work is distributed, the vocab-sized work is not):

- :func:`word_counts` — the heavy pass: corpus -> (word, count),
  one map-side-combined hash aggregation over the pre-tokenized
  stream. At 100 TB this is the only stage that touches every byte.
- :func:`train_bpe` — greedy merge learning over the distinct-word
  table. The table is vocabulary-sized (millions of rows, not
  corpus-sized), so it is collected and trained in memory like
  HuggingFace/SentencePiece do; ``max_words`` guards the collect and
  the error message names the distributed alternative (frequency
  floor) if it trips.
- :func:`bpe_token_counts` — distributed apply: merges broadcast in
  the UDF closure, Arrow-batched, with a per-batch word memo (Zipf
  makes the hit rate high).

Pre-tokenization (letter runs / digit runs / single punctuation,
operators/text._TOKEN_REGEX) runs JVM-side in both passes so the
Python boundary only ever sees words.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import _TOKEN_REGEX

__all__ = ["word_counts", "train_bpe", "bpe_token_counts",
           "bpe_encode_word"]

_END = "</w>"  # end-of-word marker, standard BPE


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, count) over the corpus: JVM regex pre-tokenize ->
    explode -> one hash aggregation."""
    toks = F.regexp_extract_all(F.col(text_col), F.lit(_TOKEN_REGEX),
                                F.lit(0))
    return (df.select(F.explode(toks).alias("word"))
            .groupBy("word")
            .agg(F.count(F.lit(1)).cast("long").alias("count")))


def _pair_stats(vocab: dict) -> dict:
    pairs: dict = {}
    for syms, cnt in vocab.values():
        for a, b in zip(syms, syms[1:]):
            pairs[(a, b)] = pairs.get((a, b), 0) + cnt
    return pairs


def train_bpe(df: DataFrame, n_merges: int = 100,
              text_col: str = "text",
              max_words: int = 1_000_000) -> list:
    """Learn ``n_merges`` BPE merges from the corpus. Deterministic:
    ties on pair frequency break lexicographically. Returns the merge
    list (pairs of symbol strings) in learned order — feed it to
    :func:`bpe_token_counts`.

    The collect is bounded by ``max_words`` DISTINCT words (counted
    first; a clear error suggests a frequency floor — e.g. filter
    ``count >= 5``, which drops hapaxes and shrinks the table ~2x on
    natural text — rather than silently training on a truncation).
    """
    wc = word_counts(df, text_col)
    n_distinct = wc.count()
    if n_distinct > max_words:
        raise ValueError(
            f"{n_distinct} distinct words exceeds max_words="
            f"{max_words}; apply a frequency floor first "
            f"(word_counts(df).where('count >= 5')) or raise the cap")
    rows = wc.collect()
    vocab = {r["word"]: (tuple(r["word"]) + (_END,), r["count"])
             for r in rows}
    merges = []
    for _ in range(n_merges):
        pairs = _pair_stats(vocab)
        if not pairs:
            break
        best = max(pairs.items(), key=lambda kv: (kv[1], kv[0]))
        if best[1] < 2:
            break  # nothing left worth merging
        a, b = best[0]
        merges.append((a, b))
        merged = a + b
        for w, (syms, cnt) in vocab.items():
            if a not in syms:
                continue
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = (tuple(out), cnt)
    return merges


def bpe_encode_word(word: str, ranks: dict) -> list:
    """Encode ONE word with the given merge ranks (classic greedy
    lowest-rank-first merging). Exposed for tests/tools."""
    syms = list(word) + [_END]
    while len(syms) > 1:
        best, best_rank = None, None
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best, best_rank = i, r
        if best is None:
            break
        syms[best:best + 2] = [syms[best] + syms[best + 1]]
    return syms


def bpe_token_counts(df: DataFrame, merges: list,
                     text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Per-document BPE token count (the tokenizer-faithful upgrade of
    text.token_counts' regex approximation): pre-tokenize JVM-side,
    then an Arrow-batched pandas UDF sums per-word BPE lengths with a
    closure memo over words. Output: (id_col, n_bpe_tokens, n_words).
    """
    from pyspark.sql.types import LongType

    from ..functions._udf import scalar_pandas_udf

    ranks = {tuple(m): i for i, m in enumerate(merges)}
    memo: dict = {}

    def _count(words_col):
        def one(words):
            if words is None:
                return 0
            total = 0
            for w in words:
                n = memo.get(w)
                if n is None:
                    n = len(bpe_encode_word(w, ranks))
                    memo[w] = n
                total += n
            return total
        return words_col.map(one)

    udf = scalar_pandas_udf(_count, LongType())
    toks = F.regexp_extract_all(F.col(text_col), F.lit(_TOKEN_REGEX),
                                F.lit(0))
    return (df.select(F.col(id_col), toks.alias("__w__"))
            .select(F.col(id_col),
                    udf(F.col("__w__")).alias("n_bpe_tokens"),
                    F.size("__w__").cast("long").alias("n_words")))
