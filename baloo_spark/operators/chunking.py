"""Document chunking and context-window packing for LLM training
pipelines.

The reference has no chunking surface (its unit of work is the row);
these are scale extensions in the spirit of operators/text.py: turn a
corpus of variable-length documents into model-ready token windows.

Scale design:

- :func:`chunk_documents` is a per-row array expression + one
  ``posexplode`` — no shuffle, no state; output size is bounded by
  ``tokens_in * (1 + overlap/stride)``. At 100 TB it pipelines
  directly behind the parquet scan.
- :func:`pack_chunks` (bin packing into a token budget) is inherently
  sequential, so it runs greedy first-fit **inside hash buckets**: a
  deterministic ``doc_id``-hash spreads chunks over ``n_buckets``
  independent packers (Arrow-batched ``applyInPandas``), each seeing
  a bounded slice. Packing quality loses only the cross-bucket
  boundary bins (≤ one underfull bin per bucket); parallelism is
  ``n_buckets`` regardless of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["chunk_documents", "pack_chunks", "bins_to_sequences"]


def chunk_documents(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", chunk_tokens: int = 200,
                    overlap: int = 0) -> DataFrame:
    """Split each document into whitespace-token windows of
    ``chunk_tokens`` tokens, consecutive windows sharing ``overlap``
    tokens. Returns one row per chunk:
    ``(id_col, chunk_seq, chunk_text, chunk_n_tokens)``.

    Boundary contract (pinned by tests and the DuckDB parity oracle):

    - a document with ``n <= chunk_tokens`` tokens yields exactly one
      chunk (its full text, whitespace-normalized);
    - the last window may be shorter than ``chunk_tokens`` but always
      starts at ``1 + k*stride`` — windows never double-back, so a
      token appears in at most ``ceil(chunk_tokens/stride)`` chunks;
    - documents with zero tokens yield zero chunks (``posexplode`` of
      an empty array drops the row — filter upstream to keep them).
    """
    if chunk_tokens <= 0:
        raise ValueError(f"chunk_tokens must be positive, got {chunk_tokens}")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"overlap must be in [0, chunk_tokens), got {overlap}")
    stride = chunk_tokens - overlap
    toks = F.filter(F.split(F.trim(F.col(text_col)), "\\s+"),
                    lambda x: x != F.lit(""))
    from ..plans.layout import spread
    pre = spread(df).select(F.col(id_col), toks.alias("__toks__"))
    # number of windows: 1 + ceil(max(n - chunk_tokens, 0) / stride);
    # integer ceil spelled floor((a + stride - 1) / stride) so the
    # whole expression stays in long arithmetic (exact in DuckDB too)
    n = "size(__toks__)"
    extra = (f"CAST(floor((greatest({n} - {chunk_tokens}, 0) "
             f"+ {stride} - 1) / {stride}) AS INT)")
    windows = F.expr(
        f"CASE WHEN {n} = 0 THEN array() ELSE "
        f"transform(sequence(0, {extra}), "
        f"k -> concat_ws(' ', slice(__toks__, 1 + k * {stride}, "
        f"{chunk_tokens}))) END")
    exploded = pre.select(
        F.col(id_col),
        F.posexplode(windows).alias("chunk_seq", "chunk_text"))
    return exploded.select(
        F.col(id_col), F.col("chunk_seq").cast("long"),
        "chunk_text",
        F.size(F.filter(F.split(F.col("chunk_text"), " "),
                        lambda x: x != F.lit("")))
        .cast("long").alias("chunk_n_tokens"))


def pack_chunks(chunks: DataFrame, budget_tokens: int = 2048,
                id_col: str = "doc_id", tokens_col: str = "chunk_n_tokens",
                n_buckets: int = 256) -> DataFrame:
    """Pack chunks into context windows of at most ``budget_tokens``
    tokens (greedy first-fit in deterministic order), assigning each
    chunk a ``(bucket, bin_seq)`` bin id plus its offset inside the
    bin. Chunks longer than the budget get a bin of their own.

    Determinism + scale: chunks are spread over ``n_buckets``
    independent packers by hash of ``id_col`` (same md5 scheme as
    operators/sampling.py, layout-independent), and each packer sees
    its chunks in ``(id_col, chunk_seq)`` order — so the packing is
    bit-identical on every run and every partitioning. The per-bucket
    greedy loop is Arrow-batched Python (``applyInPandas``); the only
    shuffle is the groupBy on the bucket key. Cross-bucket waste is at
    most one underfull bin per bucket.
    """
    import pandas as pd

    from baloo_spark.operators.sampling import hash_bucket

    if budget_tokens <= 0:
        raise ValueError(f"budget_tokens must be positive, got "
                         f"{budget_tokens}")
    from pyspark.sql import types as T

    with_bucket = chunks.withColumn(
        "__bucket__", hash_bucket(F.col(id_col), n_buckets, seed=0))
    out_schema = T.StructType(
        list(chunks.schema.fields)
        + [T.StructField("bucket", T.LongType()),
           T.StructField("bin_seq", T.LongType()),
           T.StructField("bin_offset", T.LongType())])

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([id_col, "chunk_seq"],
                              kind="mergesort").reset_index(drop=True)
        bins: list[int] = []  # remaining capacity per bin
        bin_seq, bin_off = [], []
        for t in pdf[tokens_col]:
            t = int(t)
            placed = False
            for i in range(len(bins)):
                if bins[i] >= t:
                    bin_seq.append(i)
                    bin_off.append(budget_tokens - bins[i])
                    bins[i] -= t
                    placed = True
                    break
            if not placed:
                bin_seq.append(len(bins))
                bin_off.append(0)
                bins.append(max(budget_tokens - t, 0))
        out = pdf.drop(columns=["__bucket__"])
        out["bucket"] = pdf["__bucket__"].astype("int64")
        out["bin_seq"] = pd.Series(bin_seq, dtype="int64")
        out["bin_offset"] = pd.Series(bin_off, dtype="int64")
        return out

    return (with_bucket.groupBy("__bucket__")
            .applyInPandas(pack, out_schema))


def bins_to_sequences(packed: DataFrame, sep: str = "<|doc|>",
                      text_col: str = "chunk_text") -> DataFrame:
    """Materialize packed bins into model-ready training sequences:
    one row per (bucket, bin_seq) with the member chunks joined in
    their in-bin fill order, separator between chunks.

    Order is reconstructed from ``bin_offset`` (already the token
    offset the packer assigned), so the output is deterministic
    without any window function: collect_list -> array_sort on
    (offset, text) structs -> join. One hash aggregation keyed by the
    bin id; each group is <= budget_tokens by construction, so the
    collected arrays are bounded."""
    member = F.struct(F.col("bin_offset").alias("o"),
                      F.col(text_col).alias("t"),
                      F.col("chunk_n_tokens").alias("n"))
    agg = (packed.groupBy("bucket", "bin_seq")
           .agg(F.array_sort(F.collect_list(member)).alias("__m__"),
                F.count(F.lit(1)).cast("long").alias("n_chunks"),
                F.sum("chunk_n_tokens").cast("long").alias("n_tokens")))
    seq = F.expr(
        f"array_join(transform(__m__, m -> m.t), '{sep}')")
    return agg.select(
        "bucket", "bin_seq",
        seq.alias("sequence"), "n_chunks", "n_tokens")
