"""Text-analysis operators for large-scale training-data pipelines.

Beyond the reference surface (SURVEY.md §7 step 9): language ID,
quality scoring, token counting, document fingerprinting — each a
pure JVM-side Column pipeline (no Python UDFs in the hot path), so at
100 TB these run inside whole-stage codegen right after the parquet
scan with full predicate pushdown upstream.

Every function takes/returns plain Spark DataFrames so they compose
with both the baloo_spark wrapper (via ``to_spark``/``from_spark``)
and raw Spark pipelines. Formulas are deliberately expressible in
ANSI SQL so the DuckDB oracle can replay them exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Small, fixed stopword lists: enough signal for n-gram-free heuristic
# language ID and stopword-ratio quality scoring. Deterministic.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"],
    "fr": ["le", "la", "les", "et", "est", "pas", "une", "pour", "dans", "que"],
    "es": ["el", "la", "los", "que", "de", "es", "una", "por", "con", "para"],
}

PUNCT_CHARS = ".,!?;:"

_TOKEN_REGEX = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

from ..plans.layout import spread  # noqa: E402 - after pattern tables


def _tokens(col):
    """Whitespace tokens, empties removed."""
    return F.filter(F.split(F.trim(col), "\\s+"), lambda x: x != F.lit(""))


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + BPE-ish subword count (letter runs,
    digit runs, single punctuation — a regex approximation of a BPE
    pre-tokenizer)."""
    c = F.col(text_col)
    return df.select(
        "doc_id",
        F.size(_tokens(c)).cast("long").alias("n_tokens"),
        F.size(F.regexp_extract_all(c, F.lit(_TOKEN_REGEX), F.lit(0)))
        .cast("long").alias("n_subtokens"),
        F.length(c).cast("long").alias("n_chars_measured"),
    )


def quality_scores(df: DataFrame, text_col: str = "text",
                   lang: str = "en") -> DataFrame:
    """Heuristic document quality: length, mean token length,
    punctuation density, stopword ratio, uppercase ratio, and a
    composite score in [0, 1]. All ratios NULL-safe for empty docs."""
    c = F.col(text_col)
    toks = _tokens(c)
    n_tok = F.size(toks)
    n_chars = F.length(c)
    sw = STOPWORDS[lang]
    lowered = F.transform(toks, F.lower)
    n_stop = F.size(F.filter(lowered, lambda x: x.isin(*sw)))
    n_punct = n_chars - F.length(F.translate(c, PUNCT_CHARS, ""))
    n_upper = n_chars - F.length(
        F.translate(c, "ABCDEFGHIJKLMNOPQRSTUVWXYZ", ""))

    avg_tok_len = F.when(n_tok > 0,
                         (n_chars - (n_tok - 1)) / n_tok).otherwise(0.0)
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(0.0)
    stop_ratio = F.when(n_tok > 0, n_stop / n_tok).otherwise(0.0)
    upper_ratio = F.when(n_chars > 0, n_upper / n_chars).otherwise(0.0)

    # composite: reward stopword presence + moderate token length,
    # penalize punctuation soup and shouting. Clamped to [0,1].
    score = (
        F.lit(0.35) * F.least(stop_ratio * 3, F.lit(1.0))
        + F.lit(0.25) * F.when((avg_tok_len >= 3) & (avg_tok_len <= 10), 1.0).otherwise(0.0)
        + F.lit(0.2) * F.when(punct_ratio < 0.1, 1.0).otherwise(0.0)
        + F.lit(0.2) * F.when(upper_ratio < 0.3, 1.0).otherwise(0.0)
    )
    return df.select(
        "doc_id",
        n_tok.cast("long").alias("n_tokens"),
        F.round(avg_tok_len, 4).alias("avg_token_len"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(upper_ratio, 4).alias("upper_ratio"),
        F.round(score, 4).alias("quality_score"),
    )


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: stopword-hit counts per language,
    argmax with deterministic tie-break on language code. A proper
    n-gram model would be a broadcast lookup table + the same argmax —
    this keeps the plumbing identical and the answer deterministic."""
    c = F.col(text_col)
    lowered = F.transform(_tokens(c), F.lower)
    hit_cols = []
    out = df

    def _in(words):
        return lambda x: x.isin(*words)

    for lang, words in sorted(STOPWORDS.items()):
        out = out.withColumn(
            f"__hits_{lang}", F.size(F.filter(lowered, _in(words))))
        hit_cols.append(f"__hits_{lang}")
    best = F.greatest(*[F.col(h) for h in hit_cols])
    pred = F.lit("und")
    # reverse order so earlier language wins ties (deterministic)
    for lang in sorted(STOPWORDS, reverse=True):
        pred = F.when((F.col(f"__hits_{lang}") == best) & (best > 0),
                      lang).otherwise(pred)
    return out.select(
        "doc_id",
        pred.alias("lang_pred"),
        best.cast("long").alias("lang_hits"),
    )


def text_profile(df: DataFrame, text_col: str = "text",
                 lang: str = "en",
                 include_repetition: bool = False,
                 rep_ngram: int = 5,
                 keep_cols: tuple = ()) -> DataFrame:
    """All four text-analysis families — quality scoring, language ID,
    token counts, fingerprint — in ONE projection; with
    ``include_repetition=True`` the :func:`repetition_metrics` columns
    are fused into the SAME single-scan projection (the token array is
    already bound here, so repetition adds zero extra scans or
    shuffles). ``keep_cols`` passes input columns (e.g. the text
    itself) through to the output, so downstream stages can filter on
    profile columns and still see the document — keeping pipelines a
    single linear projection chain instead of a profile⋈text join
    (which on a stream would be stateful).

    Joining the per-family outputs on doc_id costs 3 joins and 4 scans
    of the text column; every metric here is a per-row expression, so
    the fused form is a single scan with zero shuffles — at 100 TB
    that is the difference between one pass over the corpus and four
    passes plus three doc_id-keyed shuffles.

    The token arrays are materialized in their OWN projection first:
    lambda subtrees (transform/filter) defeat Catalyst subexpression
    elimination, so inlining them would re-tokenize the text once per
    metric; a separate select computes each array once per row, and
    CollapseProject keeps the boundary because the expressions are
    non-cheap and multi-referenced (same pattern as the MinHash
    two-step in operators/dedup.py)."""
    def _in(words):
        return lambda x: x.isin(*words)

    # stage 1: tokenize once; stage 2: lowercase once; stage 3: ONE
    # array pass per language materialized as a plain int column.
    # Downstream, hits[lg] is referenced many times (argmax, the
    # tie-break when-chain, stop_ratio twice via the score) — as
    # lambda subtrees those references would each re-run the filter
    # interpreted per row, so they must be bound to columns here.
    rep_pre = []
    if include_repetition:
        rep_pre = [
            F.filter(F.transform(F.split(F.col(text_col), "\n"), F.trim),
                     lambda x: x != F.lit("")).alias("__lines__")]
    rep_bound = []
    if include_repetition:
        rep_bound = [
            F.col("__lines__"),
            _word_grams("__toks__", rep_ngram).alias("__gr__"),
            _top_run(F.array_sort(_word_grams("__toks__", 2)))
            .alias("__top__")]
    carry = [c for c in keep_cols if c not in ("doc_id", text_col)]
    df = spread(df)  # single-row-group files arrive as 1 partition
    pre = df.select(
        "doc_id", F.col(text_col), *carry,
        _tokens(F.col(text_col)).alias("__toks__"),
        *rep_pre,
    ).select(
        "doc_id", F.col(text_col), *carry, F.col("__toks__"),
        F.transform(F.col("__toks__"), F.lower).alias("__low__"),
        *rep_bound,
    ).select(
        "doc_id", F.col(text_col), *carry, F.col("__toks__"),
        *([F.col("__lines__"), F.col("__gr__"), F.col("__top__")]
          if include_repetition else []),
        *[F.size(F.filter(F.col("__low__"), _in(words)))
          .alias(f"__h_{lg}")
          for lg, words in sorted(STOPWORDS.items())],
    )
    c = F.col(text_col)
    toks = F.col("__toks__")
    n_tok = F.size(toks)
    n_chars = F.length(c)

    # quality's stopword count REUSES the scoring language's hit
    # column instead of a fifth array pass (also keeps the codegen
    # unit smaller — compile time is superlinear)
    hits = {lg: F.col(f"__h_{lg}") for lg in sorted(STOPWORDS)}
    n_stop = hits[lang]
    n_punct = n_chars - F.length(F.translate(c, PUNCT_CHARS, ""))
    n_upper = n_chars - F.length(
        F.translate(c, "ABCDEFGHIJKLMNOPQRSTUVWXYZ", ""))
    avg_tok_len = F.when(n_tok > 0,
                         (n_chars - (n_tok - 1)) / n_tok).otherwise(0.0)
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(0.0)
    stop_ratio = F.when(n_tok > 0, n_stop / n_tok).otherwise(0.0)
    upper_ratio = F.when(n_chars > 0, n_upper / n_chars).otherwise(0.0)
    score = (
        F.lit(0.35) * F.least(stop_ratio * 3, F.lit(1.0))
        + F.lit(0.25) * F.when((avg_tok_len >= 3) & (avg_tok_len <= 10), 1.0).otherwise(0.0)
        + F.lit(0.2) * F.when(punct_ratio < 0.1, 1.0).otherwise(0.0)
        + F.lit(0.2) * F.when(upper_ratio < 0.3, 1.0).otherwise(0.0)
    )
    best = F.greatest(*hits.values())
    pred = F.lit("und")
    for lg in sorted(STOPWORDS, reverse=True):
        pred = F.when((hits[lg] == best) & (best > 0), lg).otherwise(pred)

    rep_cols = []
    if include_repetition:
        lines = F.col("__lines__")
        dlines = F.array_distinct(lines)
        n_lines = F.size(lines)
        lc, dlc = _sum_len(lines), _sum_len(dlines)
        gr = F.col("__gr__")
        gc, dgc = _sum_len(gr), _sum_len(F.array_distinct(gr))
        top = F.col("__top__")
        top_chars = top["best"] * F.length(top["bestg"])
        rep_cols = [
            n_lines.cast("long").alias("n_lines"),
            F.round(F.when(n_lines > 0,
                           (n_lines - F.size(dlines)) / n_lines)
                    .otherwise(0.0), 4).alias("dup_line_frac"),
            F.round(F.when(lc > 0, (lc - dlc) / lc)
                    .otherwise(0.0), 4).alias("dup_line_char_frac"),
            F.round(F.when(gc > 0, (gc - dgc) / gc)
                    .otherwise(0.0), 4)
            .alias(f"dup_{rep_ngram}gram_char_frac"),
            F.round(F.when(n_chars > 0, top_chars / n_chars)
                    .otherwise(0.0), 4).alias("top_2gram_char_frac"),
        ]
    norm = F.lower(F.regexp_replace(F.trim(c), "\\s+", " "))
    return pre.select(
        "doc_id",
        n_tok.cast("long").alias("n_tokens"),
        F.round(avg_tok_len, 4).alias("avg_token_len"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(upper_ratio, 4).alias("upper_ratio"),
        F.round(score, 4).alias("quality_score"),
        pred.alias("lang_pred"),
        best.cast("long").alias("lang_hits"),
        F.size(F.regexp_extract_all(c, F.lit(_TOKEN_REGEX), F.lit(0)))
        .cast("long").alias("n_subtokens"),
        n_chars.cast("long").alias("n_chars_measured"),
        F.md5(norm).alias("fingerprint"),
        F.length(norm).cast("long").alias("norm_len"),
        *rep_cols,
        *[F.col(c) for c in keep_cols if c != "doc_id"],
    )


def fingerprints(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5 over whitespace-normalized lowercase
    text — the canonical exact-dedup key. md5 is identical across
    Spark and DuckDB, so the oracle replays it bit-for-bit."""
    c = F.col(text_col)
    norm = F.lower(F.regexp_replace(F.trim(c), "\\s+", " "))
    return df.select(
        "doc_id",
        F.md5(norm).alias("fingerprint"),
        F.length(norm).cast("long").alias("norm_len"),
    )


def _word_grams(toks_col, n: int):
    """Word n-gram array (with repeats — repetition analysis needs the
    multiset) over a BOUND token-array column. Binding matters: an
    inline tokenizer inside the per-gram lambda would re-tokenize the
    text once per gram index (O(words²) per doc)."""
    # explicit guard: sequence(1, 0) is DESCENDING [1, 0] in Spark, so
    # the usual greatest(..)-trick silently yields bogus grams for
    # docs shorter than n words — emit an empty array instead
    return F.expr(
        f"CASE WHEN size({toks_col}) < {n} THEN array() "
        f"ELSE transform(sequence(1, size({toks_col}) - {n - 1}), "
        f"i -> concat_ws(' ', slice({toks_col}, i, {n}))) END")


def _sum_len(arr):
    """Total characters across an array of strings (JVM fold)."""
    return F.aggregate(arr, F.lit(0),
                       lambda acc, x: acc + F.length(x))


def _top_run(sorted_arr):
    """(count, value) of the most frequent element of a SORTED array,
    via a single O(n) fold over adjacent runs — no per-element
    re-scan, no explode/shuffle. Ties break to the lexicographically
    smallest value (strict > keeps the first max run)."""
    zero = F.struct(F.lit("").alias("prev"), F.lit(0).alias("run"),
                    F.lit(0).alias("best"), F.lit("").alias("bestg"))

    def step(acc, g):
        run = F.when(g == acc.prev, acc.run + 1).otherwise(F.lit(1))
        better = run > acc.best
        return F.struct(
            g.alias("prev"), run.alias("run"),
            F.when(better, run).otherwise(acc.best).alias("best"),
            F.when(better, g).otherwise(acc.bestg).alias("bestg"))

    return F.aggregate(sorted_arr, zero, step)


def repetition_metrics(df: DataFrame, text_col: str = "text",
                       ngram: int = 5) -> DataFrame:
    """Within-document repetition signals (Gopher §A1.1-style quality
    filters for training corpora): repeated lines, repeated word
    n-grams, and the share of text taken by the single most frequent
    word bigram.

    Definitions (documented because variants exist in the literature;
    the DuckDB oracle replays these exactly):

    - ``dup_line_frac``      = line occurrences beyond the first /
      total non-empty lines (lines compared after trim).
    - ``dup_line_char_frac`` = characters in those repeated
      occurrences / characters across all lines ("beyond first"
      weighting, as in RefinedWeb).
    - ``dup_{n}gram_char_frac`` = same, over word ``ngram``-grams.
    - ``top_2gram_char_frac`` = occurrences × length of the most
      frequent word bigram / total text chars (all occurrences, as in
      Gopher's top-n-gram fraction).

    Scale shape: every metric is a per-row array expression — dedup
    via ``array_distinct`` (O(L)), the top-bigram via array_sort + one
    O(G) adjacent-run fold (:func:`_top_run`) — so the whole operator
    is a single scan with zero shuffles and nothing driver-side; at
    100 TB it pipelines behind the parquet scan like
    :func:`text_profile`."""
    # the top-bigram fold is bound to a struct column in its OWN
    # projection — referencing it per field would re-run the whole
    # O(G) fold once per extraction (lambda subtrees defeat CSE)
    df = spread(df)
    pre = df.select(
        "doc_id", F.length(F.col(text_col)).alias("__nc__"),
        F.filter(F.transform(F.split(F.col(text_col), "\n"), F.trim),
                 lambda x: x != F.lit("")).alias("__lines__"),
        _tokens(F.col(text_col)).alias("__toks__"),
    ).select(
        "doc_id", "__nc__", "__lines__",
        _word_grams("__toks__", ngram).alias("__gr__"),
        _top_run(F.array_sort(_word_grams("__toks__", 2)))
        .alias("__top__"),
    )
    lines = F.col("__lines__")
    dlines = F.array_distinct(lines)
    n_lines = F.size(lines)
    lc, dlc = _sum_len(lines), _sum_len(dlines)
    gr = F.col("__gr__")
    gc, dgc = _sum_len(gr), _sum_len(F.array_distinct(gr))
    top = F.col("__top__")
    top_chars = top["best"] * F.length(top["bestg"])
    nc = F.col("__nc__")
    return pre.select(
        "doc_id",
        n_lines.cast("long").alias("n_lines"),
        F.round(F.when(n_lines > 0,
                       (n_lines - F.size(dlines)) / n_lines)
                .otherwise(0.0), 4).alias("dup_line_frac"),
        F.round(F.when(lc > 0, (lc - dlc) / lc)
                .otherwise(0.0), 4).alias("dup_line_char_frac"),
        F.round(F.when(gc > 0, (gc - dgc) / gc)
                .otherwise(0.0), 4).alias(f"dup_{ngram}gram_char_frac"),
        F.round(F.when(nc > 0, top_chars / nc)
                .otherwise(0.0), 4).alias("top_2gram_char_frac"),
    )


def contamination_check(df: DataFrame, benchmark: DataFrame,
                        text_col: str = "text", n: int = 5,
                        threshold: float = 0.2) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing word
    ``n``-grams with an evaluation/benchmark set — the standard
    pre-training hygiene pass (e.g. the 13-gram overlap screens used
    for GPT-3/Gopher eval decontamination, here parameterized).

    Returns one row per input doc: distinct n-gram count, how many of
    those appear anywhere in the benchmark, the overlap fraction, and
    ``is_contaminated`` (fraction >= ``threshold``).

    Scale shape: the benchmark set is small by definition — its
    distinct n-grams are broadcast, so the probe side (the 100 TB
    corpus) never shuffles for the join; the only wide exchange is the
    per-doc count aggregation on ``doc_id``, which AQE coalesces.
    Normalization (lowercase, whitespace-collapse) is applied to both
    sides so cosmetic edits don't hide contamination."""
    def grams_of(frame):
        norm = F.lower(F.regexp_replace(F.trim(F.col(text_col)),
                                        "\\s+", " "))
        toks = F.filter(F.split(norm, " "), lambda x: x != F.lit(""))
        ids = ["doc_id"] if "doc_id" in frame.columns else []
        return (frame.select(*ids, toks.alias("__t__"))
                .select(*ids,
                        F.array_distinct(_word_grams("__t__", n))
                        .alias("grams")))

    bench_grams = (grams_of(spread(benchmark))
                   .select(F.explode("grams").alias("gram"))
                   .distinct())
    doc_grams = (grams_of(spread(df))
                 .select("doc_id", F.explode_outer("grams").alias("gram")))
    hits = (doc_grams
            .join(F.broadcast(bench_grams.withColumn("__hit__", F.lit(1))),
                  "gram", "left")
            .groupBy("doc_id")
            .agg(F.count("gram").cast("long").alias("n_grams"),
                 F.count("__hit__").cast("long").alias("n_overlap")))
    frac = F.when(F.col("n_grams") > 0,
                  F.col("n_overlap") / F.col("n_grams")).otherwise(0.0)
    return hits.select(
        "doc_id", "n_grams", "n_overlap",
        F.round(frac, 4).alias("overlap_frac"),
        (frac >= threshold).alias("is_contaminated"))


# PII patterns: deliberately simple, deterministic regexes (the
# production knob is swapping in stricter patterns — the Spark-side
# plumbing is identical). Order matters: longer/more-specific first so
# e.g. an email is not half-eaten by the phone pattern.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
    "card": r"\b\d{4}[ -]?\d{4}[ -]?\d{4}[ -]?\d{4}\b",
    "phone": r"(\+?\d{1,2}[ -.])?\(?\d{3}\)?[ -.]?\d{3}[ -.]\d{4}\b",
}


def pii_redact(df: DataFrame, text_col: str = "text",
               patterns: dict | None = None) -> DataFrame:
    """Scrub personally-identifiable substrings, replacing each match
    with a ``<TYPE>`` tag, and report per-type match counts — the
    standard redaction pass before a corpus becomes training data.

    Output: all input columns with ``text_col`` redacted, plus one
    ``n_<type>`` count column per pattern and ``n_pii_total``.

    Scale shape: a chain of ``regexp_replace``/``regexp_count``
    expressions — per-row, JVM-side, single scan, no shuffle; at
    100 TB this fuses into the same whole-stage-codegen pass as any
    adjacent filter. Counts are computed BEFORE redaction so
    overlapping patterns report what each one saw in the original
    text (replacements apply in dict order)."""
    patterns = patterns or PII_PATTERNS
    df = spread(df)
    c = F.col(text_col)
    counts = [F.regexp_count(c, F.lit(rx)).cast("long").alias(f"n_{name}")
              for name, rx in patterns.items()]
    red = c
    for name, rx in patterns.items():
        red = F.regexp_replace(red, rx, f"<{name.upper()}>")
    others = [col for col in df.columns if col != text_col]
    out = df.select(*others, red.alias(text_col), *counts)
    total = None
    for name in patterns:
        col = F.col(f"n_{name}")
        total = col if total is None else total + col
    return out.withColumn("n_pii_total", total.cast("long"))


def ngram_counts(df: DataFrame, text_col: str = "text", n: int = 1,
                 tokens_col: str | None = None) -> DataFrame:
    """Full corpus n-gram frequency table: (ngram, term_count,
    doc_count) for EVERY distinct n-gram — the shared substrate of
    :func:`corpus_ngrams` (top-k view) and :func:`vocabulary_stats`
    (one-row rollup). Pipelines that need both compute this once
    (optionally checkpoint it — it is vocabulary-sized, not
    corpus-sized) and pass it via their ``counts`` parameter.

    Scale shape: explode -> ONE hash aggregation (map-side combined;
    doc_count is a two-phase distinct). Output rows = distinct
    n-grams: bounded by vocabulary, not corpus size.
    """
    toks = (F.col(tokens_col) if tokens_col is not None
            else F.transform(_tokens(F.col(text_col)), F.lower))
    # guard like _word_grams: sequence(1, 0) is DESCENDING [1, 0] in
    # Spark, and slice(.., 0, n) then errors — docs shorter than n
    # words must yield an empty gram array, not a runtime failure
    grams = F.expr(
        f"CASE WHEN size(__toks__) < {n} THEN array() "
        f"ELSE transform(sequence(1, size(__toks__) - {n - 1}), "
        f"i -> concat_ws(' ', slice(__toks__, i, {n}))) END")
    pre = spread(df).select(F.monotonically_increasing_id().alias("__doc__"),
                    toks.alias("__toks__"))
    rows = pre.select("__doc__", F.explode(
        grams if n > 1 else F.col("__toks__")).alias("ngram"))
    return (rows.groupBy("ngram")
            .agg(F.count(F.lit(1)).cast("long").alias("term_count"),
                 F.countDistinct("__doc__").cast("long").alias("doc_count")))


def corpus_ngrams(df: DataFrame, text_col: str = "text", n: int = 1,
                  top_k: int = 100, min_count: int = 1,
                  tokens_col: str | None = None,
                  counts: DataFrame | None = None) -> DataFrame:
    """Corpus-level n-gram frequency table: the top_k most frequent
    word n-grams with document frequency — the vocabulary/corpus-stats
    pass of a training-data pipeline (dedup diagnostics, stopword
    discovery, contamination screens).

    Scale shape: explode -> ONE hash aggregation (map-side combined)
    -> TakeOrderedAndProject for the top-k. No window over the corpus,
    no driver-side vocabulary; at 100 TB this is exactly a word-count
    with a bounded output. Ties broken by ngram text for determinism.
    ``counts``: a precomputed :func:`ngram_counts` table to rank
    instead of re-scanning the corpus (share one table between this
    and :func:`vocabulary_stats`).
    """
    agg = (counts if counts is not None
           else ngram_counts(df, text_col, n, tokens_col))
    agg = agg.where(F.col("term_count") >= min_count)
    return (agg.orderBy(F.col("term_count").desc(), F.col("ngram").asc())
            .limit(top_k))


def vocabulary_stats(df: DataFrame, text_col: str = "text",
                     tokens_col: str | None = None,
                     counts: DataFrame | None = None) -> DataFrame:
    """One-row corpus vocabulary summary: total tokens, distinct
    tokens (exact), type-token ratio, and hapax count (tokens seen
    exactly once) — the standard corpus-size diagnostics.

    Two hash aggregations, both map-side combined; nothing brought to
    the driver but the single output row. ``counts``: roll up a
    precomputed :func:`ngram_counts` (n=1) table instead of
    re-scanning the corpus.
    """
    if counts is not None:
        per_tok = counts.select(F.col("term_count").alias("cnt"))
    else:
        toks = (F.col(tokens_col) if tokens_col is not None
                else F.transform(_tokens(F.col(text_col)), F.lower))
        rows = spread(df).select(F.explode(toks).alias("tok"))
        per_tok = rows.groupBy("tok").agg(
            F.count(F.lit(1)).alias("cnt"))
    return per_tok.agg(
        F.sum("cnt").cast("long").alias("total_tokens"),
        F.count(F.lit(1)).cast("long").alias("distinct_tokens"),
        F.round(F.count(F.lit(1)) / F.sum("cnt"), 6).alias("type_token_ratio"),
        F.sum(F.when(F.col("cnt") == 1, 1).otherwise(0))
        .cast("long").alias("hapax_count"))


def boilerplate_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """jusText/trafilatura-flavored boilerplate heuristics per doc —
    the structural complement of :func:`quality_scores` (which looks
    at token statistics): navigation/chrome text has short lines, few
    sentence-final stops, high link-ish token density, and low line-
    length variance. One per-row projection over the bound line/token
    arrays; no shuffle, stream-safe.

    Output columns (all rounded, higher = more boilerplate-like
    except avg_line_len):

    - ``n_lines``, ``avg_line_len`` — structure basics;
    - ``short_line_frac`` — lines under 40 chars;
    - ``stop_end_frac`` — lines NOT ending in sentence punctuation;
    - ``caps_start_frac`` — lines starting with a capital (menus and
      headings trend high together with short_line_frac);
    - ``boilerplate_score`` — the three fractions averaged.
    """
    df = spread(df)
    lines = F.filter(F.transform(F.split(F.col(text_col), "\n"), F.trim),
                     lambda x: x != F.lit(""))
    pre = df.select("*", lines.alias("__ln__"))
    n = F.size("__ln__")
    short = F.size(F.filter(F.col("__ln__"),
                            lambda x: F.length(x) < F.lit(40)))
    noend = F.size(F.filter(
        F.col("__ln__"),
        lambda x: ~x.rlike("[.!?][\"')\\]]*$")))
    caps = F.size(F.filter(F.col("__ln__"),
                           lambda x: x.rlike("^[A-Z]")))
    avg_len = F.expr(
        "aggregate(__ln__, 0L, (acc, x) -> acc + length(x))") \
        / F.greatest(n, F.lit(1))
    safe = lambda c: F.when(n > 0, c / n).otherwise(None)
    out = (pre
           .withColumn("n_lines", n.cast("long"))
           .withColumn("avg_line_len", F.round(avg_len, 4))
           .withColumn("short_line_frac", F.round(safe(short), 6))
           .withColumn("stop_end_frac", F.round(safe(noend), 6))
           .withColumn("caps_start_frac", F.round(safe(caps), 6)))
    score = (F.col("short_line_frac") + F.col("stop_end_frac")
             + F.col("caps_start_frac")) / 3.0
    return (out.withColumn("boilerplate_score", F.round(score, 6))
            .drop("__ln__"))


# control characters other than \n and \t: mojibake, terminal escapes,
# and NUL bytes that crash downstream tokenizers
_CONTROL_RX = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]"


def clean_text(df: DataFrame, text_col: str = "text",
               unicode_form: str | None = None,
               strip_control: bool = True,
               collapse_spaces: bool = True) -> DataFrame:
    """Text normalization pass — the first stage of every training-
    data pipeline: strip control characters (keeping ``\\n``/``\\t``),
    collapse space runs, trim, and optionally Unicode-normalize
    (``unicode_form`` in {'NFC','NFKC','NFD','NFKD'}).

    Output: ``text_col`` cleaned in place plus ``n_chars_raw`` /
    ``n_chars_clean`` (character counts before/after — the cheap
    signal for "how dirty was this shard").

    Scale shape: the regex steps are JVM ``regexp_replace``
    expressions (single scan, no shuffle, stream-safe). Unicode
    normalization has no Spark builtin, so that step — and only that
    step — runs as an Arrow-batched pandas UDF over
    ``unicodedata.normalize`` (both it and DuckDB's utf8proc
    implement the Unicode standard, so results replay exactly
    cross-engine); leave ``unicode_form=None`` to stay entirely
    JVM-side.
    """
    if unicode_form not in (None, "NFC", "NFKC", "NFD", "NFKD"):
        raise ValueError(f"unsupported unicode_form: {unicode_form!r}")
    df = spread(df)
    c = F.col(text_col)
    pre = df.withColumn("n_chars_raw",
                        F.length(F.coalesce(c, F.lit(""))).cast("long"))
    cleaned = F.coalesce(F.col(text_col), F.lit(""))
    if strip_control:
        cleaned = F.regexp_replace(cleaned, _CONTROL_RX, "")
    if collapse_spaces:
        cleaned = F.trim(F.regexp_replace(cleaned, " {2,}", " "))
    if unicode_form:
        import unicodedata

        from ..functions._udf import scalar_pandas_udf
        form = unicode_form

        def _norm(s):
            return s.map(lambda x: None if x is None
                         else unicodedata.normalize(form, x))

        out = pre.withColumn("__c__", cleaned)
        udf = scalar_pandas_udf(_norm, "string")
        out = out.withColumn(text_col, udf(F.col("__c__"))) \
            .drop("__c__")
    else:
        out = pre.withColumn(text_col, cleaned)
    return out.withColumn("n_chars_clean",
                          F.length(text_col).cast("long"))
