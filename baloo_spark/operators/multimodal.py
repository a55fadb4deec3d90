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


def _resize_kernel_stub(payload: bytes, width: int, height: int) -> bytes:
    """=== STUB: image resize kernel goes here ===

    Real implementation: ``PIL.Image.open(io.BytesIO(payload))
    .resize((width, height)).tobytes()`` — no image library in this
    container. The fake emits exactly width*height*3 deterministic
    bytes derived from the payload hash, so the row-shape contract
    (RGB byte count) and downstream schema are exercised for real.
    """
    h = hashlib.sha256(payload).digest()
    need = width * height * 3
    return (h * (need // len(h) + 1))[:need]


def resize_images(media: DataFrame, width: int, height: int,
                  batch_target: int = 256) -> DataFrame:
    """Resize every image payload to (width, height) via mapInPandas.

    Output keeps the media table shape: (media_id, payload, meta) with
    meta.width/height rewritten and n_bytes recomputed — a resized
    media table composes with every other operator here. Only the
    kernel (``_resize_kernel_stub``) is fake; batching, schema, and
    the wide-row repartition are the production plumbing.
    """
    def _resize(batches):
        import pandas as pd
        for pdf in batches:
            out = [_resize_kernel_stub(p, width, height)
                   for p in pdf["payload"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "payload": out,
                "format": pdf["format"],
                "width": width, "height": height,
                "n_bytes": [len(b) for b in out],
            })

    flat_schema = ("media_id long, payload binary, format string, "
                   "width int, height int, n_bytes long")
    narrow = media.select("media_id", "payload", F.col("meta.format")
                          .alias("format"))
    flat = narrow.mapInPandas(_resize, flat_schema)
    return flat.select(
        "media_id", "payload",
        F.struct("format", "width", "height", "n_bytes").alias("meta"))


def sample_frames(media: DataFrame, every_n: int = 10,
                  frame_bytes: int = 256) -> DataFrame:
    """Sample every ``every_n``-th frame from video payloads.

    Output: (media_id, frame_idx, frame binary) — a 1-to-N mapInPandas
    (each input row yields multiple frame rows), which is the batch
    shape a real demuxer needs. === STUB: the demux kernel fakes
    frames as fixed-size payload slices; real impl feeds ffmpeg the
    payload and yields decoded frames — everything else stays. ===
    """
    def _sample(batches):
        import pandas as pd
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                n_frames = max(len(p) // frame_bytes, 1)
                for fi in range(0, n_frames, every_n):
                    ids.append(mid)
                    idxs.append(fi)
                    frames.append(bytes(p[fi * frame_bytes:
                                          (fi + 1) * frame_bytes]))
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs,
                                "frame": frames})

    return media.select("media_id", "payload").mapInPandas(
        _sample, "media_id long, frame_idx int, frame binary")


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
