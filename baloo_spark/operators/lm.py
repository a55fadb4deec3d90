"""Distributed n-gram language-model training and perplexity scoring.

The CCNet / RedPajama-style quality gate: train a smoothed bigram LM
on (a sample of) the corpus, score every document's perplexity under
it, and filter/bucket on the score — documents that look nothing like
the reference distribution (boilerplate, garbled encodings, keyword
stuffing) score high. Real pipelines use a KenLM 5-gram; the bigram
form here keeps the exact same pipeline shape (count tables, add-alpha
smoothing, per-token log-prob join) while staying fully expressible as
DataFrame ops — no native library, no UDFs.

Scale design:

- **Training** is two hash aggregations over exploded token pairs —
  map-side combined word-count shape; the model is (distinct-bigram +
  distinct-unigram) rows, NOT vocab^2 (unseen pairs are handled by the
  smoothing arithmetic at score time).
- **Scoring** is one explode + two equi-joins against the count
  tables + one per-doc aggregation. The unigram table is broadcast
  (vocab-sized); the bigram join shuffles on the pair key only when
  the model outgrows the broadcast threshold — Catalyst/AQE decides.
- Everything is exact integer counts + deterministic float math, so a
  SQL engine can replay scores bit-stably (the DuckDB oracle does).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.layout import spread

__all__ = ["BigramLM", "train_bigram_lm", "perplexity",
           "perplexity_broadcast"]


def _toks(text_col: str):
    return F.transform(
        F.filter(F.split(F.trim(F.col(text_col)), "\\s+"),
                 lambda x: x != F.lit("")),
        F.lower)


def _pairs(toks_col: str):
    """(w1, w2) structs for consecutive token pairs. The <2-token
    case MUST be its own branch: Spark's sequence(1, 0) produces a
    DESCENDING [1, 0], not an empty array, which would emit junk
    pairs against index -1."""
    return F.expr(
        f"CASE WHEN size({toks_col}) < 2 THEN "
        f"array() ELSE "
        f"transform(sequence(1, size({toks_col}) - 1), "
        f"i -> struct({toks_col}[i - 1] AS w1, {toks_col}[i] AS w2)) END")


@dataclass
class BigramLM:
    """Trained model: count tables + vocabulary size.

    ``bigrams``: (w1, w2, c12) — distinct observed pairs only.
    ``unigrams``: (w1, c1) — context counts (all positions but the
    last of each doc, so sum(c12 | w1) == c1 exactly).
    ``vocab``: LAZY 1-row (__v__ BIGINT) distinct-token count — r11:
    the count used to run as an eager full-corpus job at train time;
    keeping it lazy lets :func:`perplexity` fold the pass into the
    scoring query (broadcast cross-join), where it overlaps the other
    stages instead of blocking plan construction (guide §2.6).
    ``vocab_size`` still reads as an int (cached on first access) for
    callers that need the scalar.
    """
    bigrams: DataFrame
    unigrams: DataFrame
    vocab: DataFrame
    _vocab_size: int | None = None

    @property
    def vocab_size(self) -> int:
        if self._vocab_size is None:
            self._vocab_size = int(self.vocab.first()["__v__"])
        return self._vocab_size


def train_bigram_lm(df: DataFrame, text_col: str = "text",
                    tokens_col: str | None = None) -> BigramLM:
    """Count-table training: two map-side-combined aggregations.

    The context (unigram) counts are derived FROM the bigram pairs
    (w1 positions), not from raw tokens, so the conditional
    probabilities normalize exactly: sum_w2 P(w2|w1) = 1 under
    add-alpha smoothing.

    ``tokens_col``: reuse a pre-tokenized lowercase token array
    instead of tokenizing ``text_col`` — the shared-scan
    optimization for pipelines that run several token-level
    operators over one cached corpus projection (tokenize once,
    reuse everywhere)."""
    tk = (F.col(tokens_col) if tokens_col is not None
          else _toks(text_col))
    pre = spread(df).select(tk.alias("__t__"))
    pairs = pre.select(F.explode(_pairs("__t__")).alias("p")) \
        .select("p.w1", "p.w2")
    bigrams = pairs.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("c12"))
    # c1 = sum_w2 c12 by definition, so the context counts roll up
    # from the bigram TABLE (vocabulary^-ish sized) instead of
    # re-exploding and re-shuffling the corpus-sized pair stream —
    # exact integers either way (r5)
    unigrams = bigrams.groupBy("w1").agg(
        F.sum("c12").cast("long").alias("c1"))
    vocab = pre.select(F.explode("__t__").alias("w")) \
        .agg(F.count_distinct("w").alias("__v__"))
    return BigramLM(bigrams=bigrams, unigrams=unigrams, vocab=vocab)


def perplexity(df: DataFrame, lm: BigramLM, text_col: str = "text",
               id_col: str = "doc_id", alpha: float = 1.0,
               tokens_col: str | None = None) -> DataFrame:
    """Per-document perplexity under ``lm`` with add-alpha smoothing:

        P(w2|w1) = (c12 + alpha) / (c1 + alpha * V)

    (c12 = 0 for unseen pairs, c1 = 0 for unseen contexts — both fall
    out of the same formula, so out-of-vocabulary text degrades
    smoothly instead of hitting zeros.)

    Returns one row per document:
    (id_col, n_bigrams, avg_neg_logp, ppl = exp(avg_neg_logp));
    documents with fewer than 2 tokens keep a row with NULL scores.

    Scale shape: explode -> LEFT join bigram counts on (w1, w2) ->
    LEFT join context counts on w1 (broadcast: vocab-sized) -> one
    groupBy(id_col). No correlated work, no Python.
    """
    tk = (F.col(tokens_col) if tokens_col is not None
          else _toks(text_col))
    pre = spread(df).select(F.col(id_col), tk.alias("__t__"))
    rows = pre.select(id_col, F.explode_outer(_pairs("__t__")).alias("p")) \
        .select(id_col, "p.w1", "p.w2")
    # the vocab scalar rides as a broadcast 1-row cross join (r11) so
    # the distinct-token pass is part of THIS query — overlapped with
    # the explode/join stages — instead of an eager train-time job
    scored = (rows
              .join(lm.bigrams, ["w1", "w2"], "left")
              .join(F.broadcast(lm.unigrams), ["w1"], "left")
              .crossJoin(F.broadcast(lm.vocab)))
    logp = F.log((F.coalesce(F.col("c12"), F.lit(0)) + F.lit(alpha))
                 / (F.coalesce(F.col("c1"), F.lit(0))
                    + F.lit(alpha) * F.col("__v__")))
    per_doc = (scored
               .withColumn("__lp__",
                           F.when(F.col("w1").isNull(), None)
                           .otherwise(logp))
               .groupBy(id_col)
               .agg(F.count("__lp__").cast("long").alias("n_bigrams"),
                    F.sum("__lp__").alias("__s__")))
    avg = -F.col("__s__") / F.col("n_bigrams")
    return per_doc.select(
        id_col, "n_bigrams",
        F.when(F.col("n_bigrams") > 0, F.round(avg, 6))
        .alias("avg_neg_logp"),
        F.when(F.col("n_bigrams") > 0, F.round(F.exp(avg), 4))
        .alias("ppl"))


def perplexity_broadcast(df: DataFrame, lm: BigramLM,
                         text_col: str = "text",
                         id_col: str = "doc_id", alpha: float = 1.0,
                         max_model_rows: int = 2_000_000) -> DataFrame:
    """Stateless face of :func:`perplexity`: the count tables are
    collected once and shipped in an Arrow-batched pandas-UDF closure
    — the "model as artifact" pattern (a production KenLM binary is
    exactly this: a trained file broadcast to every worker). Because
    no join or aggregation touches the stream, this face is safe in
    APPEND mode on an unbounded readStream with zero state, where the
    join-based face would need an unbounded per-doc aggregation.

    Guard: refuses models over ``max_model_rows`` (collecting an
    unbounded table to the driver is the classic scale trap) — for
    models past the broadcast budget, use the join-based
    :func:`perplexity` as a periodic batch job instead.

    Identical scores to :func:`perplexity` (same smoothing formula;
    pinned by tests/test_lm.py).
    """
    import math

    n_model = lm.bigrams.count()
    if n_model > max_model_rows:
        raise ValueError(
            f"model has {n_model} bigrams > max_model_rows="
            f"{max_model_rows}; use the join-based perplexity() for "
            f"models past the broadcast budget")
    bi = {(r["w1"], r["w2"]): r["c12"] for r in lm.bigrams.collect()}
    uni = {r["w1"]: r["c1"] for r in lm.unigrams.collect()}
    v = int(lm.vocab_size)

    from ..functions._udf import struct_pandas_udf

    def score(texts):
        import pandas as pd
        n_out, avg_out, ppl_out = [], [], []
        for t in texts:
            toks = [w.lower() for w in (t or "").split()]
            if len(toks) < 2:
                n_out.append(0)
                avg_out.append(None)
                ppl_out.append(None)
                continue
            s = 0.0
            for a, b in zip(toks, toks[1:]):
                s += math.log((bi.get((a, b), 0) + alpha)
                              / (uni.get(a, 0) + alpha * v))
            n = len(toks) - 1
            avg = -s / n
            n_out.append(n)
            avg_out.append(round(avg, 6))
            ppl_out.append(round(math.exp(avg), 4))
        return pd.DataFrame({"n_bigrams": n_out,
                             "avg_neg_logp": avg_out, "ppl": ppl_out})

    udf = struct_pandas_udf(
        score, "n_bigrams LONG, avg_neg_logp DOUBLE, ppl DOUBLE")
    out = df.select(F.col(id_col), udf(F.col(text_col)).alias("__s__"))
    return out.select(id_col, "__s__.n_bigrams", "__s__.avg_neg_logp",
                      "__s__.ppl")
