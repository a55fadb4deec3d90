"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, with Arrow-batched decode/feature plumbing.

Codec surface, two tiers:

- **REAL decode** (pure numpy, no external library): binary PPM (P6)
  and uncompressed 24-bit BMP — magic-sniffed by
  :func:`decode_image`, producing pixel arrays, interpretable image
  features (dims/channel stats/brightness/contrast), and a real
  nearest-neighbor resize kernel that re-encodes to PPM.
- **STUB** for compressed formats (JPEG/PNG/video): the container has
  no PIL/ffmpeg, so those fall back to a clearly-marked deterministic
  fake (``_decode_stub``) — the Spark-side plumbing (schema contract,
  mapInPandas batch shape, wide-row partitioning, 1-to-N frame
  explode) is identical either way, so swapping the stub for a real
  library changes nothing outside it.

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
    """=== STUB: compressed-media codec goes here ===

    Real implementation would be e.g. ``PIL.Image.open(io.BytesIO(
    payload))`` for JPEG/PNG or ffmpeg for video; not available in
    this container. The stub derives a deterministic pseudo-decode
    from the payload hash so pipelines have stable, testable outputs.

    Uncompressed raster formats don't need any library — see
    :func:`decode_image`, which REALLY decodes PPM (P6) and 24-bit BMP
    with numpy and only falls back here for payloads it can't parse.
    """
    if payload is None:
        raise NotImplementedError("decode of NULL payload")
    h = hashlib.sha256(payload).digest()
    return {
        "ok": True,
        "feature": [int.from_bytes(h[i:i + 2], "big") / 65535.0
                    for i in range(0, FEATURE_DIM * 2, 2)],
    }


# --------------------------------------------------------------------
# REAL codecs: uncompressed raster formats, pure numpy (no image lib)
# --------------------------------------------------------------------

def encode_ppm(arr) -> bytes:
    """Encode an (h, w, 3) uint8 array as binary PPM (P6)."""
    import numpy as np
    a = np.asarray(arr, dtype=np.uint8)
    h, w, c = a.shape
    if c != 3:
        raise ValueError(f"expected 3 channels, got {c}")
    return b"P6\n%d %d\n255\n" % (w, h) + a.tobytes()


def _decode_ppm(payload: bytes):
    """Parse binary PPM (P6): ASCII header (width height maxval, ``#``
    comments allowed) followed by raw RGB rows. Returns (h, w, 3)
    uint8."""
    import numpy as np
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":  # comment to end of line
            pos = payload.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"only maxval=255 supported, got {maxval}")
    data = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3,
                         offset=pos)
    return data.reshape(h, w, 3)


def _decode_bmp(payload: bytes):
    """Parse uncompressed 24-bit BMP (BITMAPINFOHEADER, bottom-up or
    top-down, BGR with 4-byte row padding). Returns (h, w, 3) uint8
    RGB."""
    import struct

    import numpy as np
    if not payload.startswith(b"BM"):
        raise ValueError("not a BMP")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", payload, 14)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if hdr_size < 40 or bpp != 24 or compression != 0:
        raise ValueError(
            f"only uncompressed 24-bit BMP supported "
            f"(header={hdr_size}, bpp={bpp}, compression={compression})")
    top_down = h < 0
    h = abs(h)
    row_bytes = (w * 3 + 3) & ~3
    rows = np.frombuffer(payload, dtype=np.uint8, count=row_bytes * h,
                         offset=data_off).reshape(h, row_bytes)
    img = rows[:, :w * 3].reshape(h, w, 3)[..., ::-1]  # BGR -> RGB
    return img if top_down else img[::-1]


def decode_image(payload: bytes) -> dict:
    """Decode a media payload: REAL numpy decode for PPM/BMP (magic
    sniffed), deterministic stub for everything else. Returns
    ``{"ok", "decoded", "pixels" (or None), "feature"}`` where
    ``feature`` for real decodes is interpretable image stats
    (dims/aspect + per-channel mean/std + brightness/contrast/
    colorfulness, all normalized) rather than hash noise."""
    import numpy as np
    if payload is None:
        raise NotImplementedError("decode of NULL payload")
    arr = None
    if payload.startswith(b"P6"):
        arr = _decode_ppm(payload)
    elif payload.startswith(b"BM"):
        arr = _decode_bmp(payload)
    if arr is None:
        out = _decode_stub(payload)
        out["decoded"] = False
        out["pixels"] = None
        return out
    f = arr.astype(np.float64) / 255.0
    h, w = arr.shape[:2]
    means = f.mean(axis=(0, 1))
    stds = f.std(axis=(0, 1))
    gray = f.mean(axis=2)
    rg = abs(means[0] - means[1])
    yb = abs(0.5 * (means[0] + means[1]) - means[2])
    feature = [
        float(w), float(h), round(w / h, 6),
        *(round(float(x), 6) for x in means),
        *(round(float(x), 6) for x in stds),
        round(float(gray.mean()), 6),           # brightness
        round(float(gray.std()), 6),            # contrast
        round(float(rg + yb), 6),               # colorfulness proxy
        round(float(f.min()), 6), round(float(f.max()), 6),
        round(float(np.median(gray)), 6),
        0.0,
    ]
    return {"ok": True, "decoded": True, "pixels": arr,
            "feature": feature[:FEATURE_DIM]}


def encode_wav(samples, rate: int = 16000) -> bytes:
    """Encode int16 PCM samples — shape (n,) mono or (n, ch) — as a
    RIFF/WAVE file (pure struct/numpy)."""
    import struct

    import numpy as np
    a = np.asarray(samples, dtype=np.int16)
    if a.ndim == 1:
        a = a[:, None]
    n, ch = a.shape
    body = a.tobytes()  # interleaved frames (row-major)
    byte_rate = rate * ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, rate, byte_rate, ch * 2, 16)
    return (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(body))
            + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(body)) + body)


def decode_audio(payload: bytes) -> dict:
    """REAL decode of RIFF/WAVE 16-bit PCM (pure struct/numpy; walks
    the chunk list, so extra chunks like LIST/INFO are skipped).
    Returns ``{"ok", "decoded", "rate", "samples" ((n, ch) int16),
    "feature"}`` with interpretable audio stats: duration, rate,
    channels, RMS/peak level (normalized), zero-crossing rate. Falls
    back to the deterministic stub for unparseable payloads."""
    import struct

    import numpy as np
    if payload is None:
        raise NotImplementedError("decode of NULL payload")
    if not (payload.startswith(b"RIFF") and payload[8:12] == b"WAVE"):
        out = _decode_stub(payload)
        out["decoded"] = False
        out["samples"] = None
        out["rate"] = None
        return out
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        sz = struct.unpack_from("<I", payload, pos + 4)[0]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", payload, pos + 8)
        elif cid == b"data":
            data = payload[pos + 8:pos + 8 + sz]
        pos += 8 + sz + (sz & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, ch, rate, _, _, bits = fmt
    if audio_fmt != 1 or bits != 16:
        raise ValueError(
            f"only 16-bit PCM supported (fmt={audio_fmt}, bits={bits})")
    a = np.frombuffer(data, dtype=np.int16)
    a = a[:(len(a) // ch) * ch].reshape(-1, ch)
    f = a.astype(np.float64) / 32768.0
    mono = f.mean(axis=1)
    # zero samples count as positive so an exact zero on the way down
    # still registers one crossing (np.sign(0)=0 would swallow it)
    nonneg = mono >= 0
    zc = (nonneg[1:] != nonneg[:-1]).mean() if len(mono) > 1 else 0.0
    feature = [
        round(len(a) / rate, 6), float(rate), float(ch),
        round(float(np.sqrt((f ** 2).mean())), 6),   # RMS level
        round(float(np.abs(f).max(initial=0.0)), 6),  # peak
        round(float(zc), 6),                          # zero-cross rate
        round(float(mono.mean()), 6),                 # DC offset
        *([0.0] * (FEATURE_DIM - 7)),
    ]
    return {"ok": True, "decoded": True, "rate": rate, "samples": a,
            "feature": feature[:FEATURE_DIM]}


def audio_features(media: DataFrame) -> DataFrame:
    """Arrow-batched audio feature extraction (mapInPandas): real WAV
    decode where possible, stub features otherwise. Output:
    (media_id, duration_sec, sample_rate, n_channels, rms, peak, zcr).
    Payload dropped before any shuffle, as in extract_features."""
    out_schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("duration_sec", T.DoubleType()),
        T.StructField("sample_rate", T.DoubleType()),
        T.StructField("n_channels", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("peak", T.DoubleType()),
        T.StructField("zcr", T.DoubleType()),
    ])

    def _extract(batches):
        import pandas as pd
        for pdf in batches:
            rows = [decode_audio(p)["feature"][:6] for p in pdf["payload"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "duration_sec": [r[0] for r in rows],
                "sample_rate": [r[1] for r in rows],
                "n_channels": [r[2] for r in rows],
                "rms": [r[3] for r in rows],
                "peak": [r[4] for r in rows],
                "zcr": [r[5] for r in rows],
            })

    return media.select("media_id", "payload").mapInPandas(_extract,
                                                           out_schema)


def sample_clips(media: DataFrame, clip_sec: float = 1.0,
                 every_sec: float = 10.0) -> DataFrame:
    """Sample a ``clip_sec`` audio clip every ``every_sec`` seconds
    from each WAV payload — REAL time-based slicing (re-encoded as
    WAV), the audio analogue of :func:`sample_frames`'s 1-to-N batch
    shape. Non-WAV payloads are skipped (a real pipeline quarantines
    them)."""
    def _sample(batches):
        import pandas as pd
        for pdf in batches:
            ids, idxs, clips = [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                d = decode_audio(p)
                if not d["decoded"]:
                    continue
                rate, a = d["rate"], d["samples"]
                step, width = int(rate * every_sec), int(rate * clip_sec)
                for ci, start in enumerate(range(0, len(a), step)):
                    ids.append(mid)
                    idxs.append(ci)
                    clips.append(encode_wav(a[start:start + width], rate))
            yield pd.DataFrame({"media_id": ids, "clip_idx": idxs,
                                "clip": clips})

    return media.select("media_id", "payload").mapInPandas(
        _sample, "media_id long, clip_idx int, clip binary")


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
            feats = [decode_image(p)["feature"] for p in pdf["payload"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "feature": feats,
                "n_bytes": [len(p) for p in pdf["payload"]],
            })

    narrow = media.select("media_id", "payload")
    return narrow.mapInPandas(_extract, out_schema)


def _resize_kernel_stub(payload: bytes, width: int, height: int) -> bytes:
    """=== STUB: compressed-image resize goes here ===

    For payloads :func:`decode_image` can't parse (would need
    PIL/ffmpeg). The fake emits exactly width*height*3 deterministic
    bytes derived from the payload hash, so the row-shape contract
    (RGB byte count) and downstream schema are exercised for real.
    """
    h = hashlib.sha256(payload).digest()
    need = width * height * 3
    return (h * (need // len(h) + 1))[:need]


def _resize_kernel(payload: bytes, width: int, height: int) -> bytes:
    """Resize kernel: REAL nearest-neighbor resample (numpy index
    gather) for decodable payloads, re-encoded as PPM; stub for the
    rest."""
    import numpy as np
    d = decode_image(payload)
    if not d["decoded"]:
        return _resize_kernel_stub(payload, width, height)
    arr = d["pixels"]
    src_h, src_w = arr.shape[:2]
    ys = (np.arange(height) * src_h // height).clip(0, src_h - 1)
    xs = (np.arange(width) * src_w // width).clip(0, src_w - 1)
    return encode_ppm(arr[ys][:, xs])


def resize_images(media: DataFrame, width: int, height: int,
                  batch_target: int = 256) -> DataFrame:
    """Resize every image payload to (width, height) via mapInPandas.

    Output keeps the media table shape: (media_id, payload, meta) with
    meta.width/height rewritten and n_bytes recomputed — a resized
    media table composes with every other operator here. PPM/BMP
    payloads get a REAL nearest-neighbor resample (re-encoded as PPM,
    format rewritten to image/ppm); only unparseable payloads hit the
    stub kernel.
    """
    def _resize(batches):
        import pandas as pd
        for pdf in batches:
            out, fmts = [], []
            for p, fmt in zip(pdf["payload"], pdf["format"]):
                decodable = p is not None and (p.startswith(b"P6")
                                               or p.startswith(b"BM"))
                out.append(_resize_kernel(p, width, height))
                fmts.append("image/ppm" if decodable else fmt)
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "payload": out,
                "format": fmts,
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
