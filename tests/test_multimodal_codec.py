"""Real-codec tier of operators/multimodal.py: pure-numpy PPM/BMP
decode, image features, nearest-neighbor resize — end-to-end through
the Spark mapInPandas pipeline."""

import struct

import numpy as np
import pandas as pd
import pytest

from baloo_spark.operators.multimodal import (decode_image, encode_ppm,
                                              extract_features,
                                              resize_images,
                                              to_media_table)


def _img(h, w, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def _bmp_bytes(arr, top_down=False):
    """Minimal uncompressed 24-bit BMP writer (test fixture)."""
    h, w = arr.shape[:2]
    row = (w * 3 + 3) & ~3
    pad = row - w * 3
    body = b""
    rows = arr if top_down else arr[::-1]
    for r in rows:
        body += r[:, ::-1].tobytes() + b"\x00" * pad  # RGB -> BGR
    data_off = 14 + 40
    hdr = (b"BM" + struct.pack("<IHHI", data_off + len(body), 0, 0,
                               data_off)
           + struct.pack("<Iii", 40, w, -h if top_down else h)
           + struct.pack("<HH", 1, 24)
           + struct.pack("<IIiiII", 0, len(body), 2835, 2835, 0, 0))
    return hdr + body


def test_ppm_roundtrip_exact():
    arr = _img(5, 7)
    out = decode_image(encode_ppm(arr))
    assert out["decoded"] and out["ok"]
    np.testing.assert_array_equal(out["pixels"], arr)


def test_ppm_header_with_comments():
    arr = _img(2, 3)
    raw = b"P6\n# a comment\n3 2\n# another\n255\n" + arr.tobytes()
    np.testing.assert_array_equal(decode_image(raw)["pixels"], arr)


def test_bmp_decode_bottom_up_and_top_down():
    arr = _img(4, 5, seed=1)  # w=5 -> row padding exercised
    np.testing.assert_array_equal(decode_image(_bmp_bytes(arr))["pixels"],
                                  arr)
    np.testing.assert_array_equal(
        decode_image(_bmp_bytes(arr, top_down=True))["pixels"], arr)


def test_decode_image_features_are_real_stats():
    arr = np.zeros((4, 8, 3), dtype=np.uint8)
    arr[..., 0] = 255  # pure red
    f = decode_image(encode_ppm(arr))["feature"]
    assert f[0] == 8.0 and f[1] == 4.0 and f[2] == 2.0  # w, h, aspect
    assert f[3] == 1.0 and f[4] == 0.0 and f[5] == 0.0  # mean RGB
    assert abs(f[9] - 1 / 3) < 1e-6                     # brightness


def test_unparseable_payload_falls_back_to_stub():
    out = decode_image(b"\xff\xd8\xff not actually jpeg")
    assert out["ok"] and not out["decoded"]
    assert len(out["feature"]) == 16
    with pytest.raises(NotImplementedError):
        decode_image(None)


def test_extract_features_spark_pipeline_real_images(spark):
    imgs = {i: _img(6, 4, seed=i) for i in range(8)}
    media = spark.createDataFrame(pd.DataFrame({
        "media_id": list(imgs),
        "payload": [encode_ppm(a) for a in imgs.values()]}))
    got = {r["media_id"]: r["feature"]
           for r in extract_features(media).collect()}
    assert len(got) == 8
    for i, arr in imgs.items():
        want = decode_image(encode_ppm(arr))["feature"]
        assert got[i] == pytest.approx(want)
        # feature[3:6] is the actual mean RGB of the pixels
        assert got[i][3] == pytest.approx(arr[..., 0].mean() / 255, abs=1e-6)


def test_resize_images_real_nearest_neighbor(spark):
    arr = _img(8, 8, seed=3)
    media = to_media_table(
        spark.createDataFrame(pd.DataFrame({"doc_id": [1],
                                            "text": ["x"]})))
    # swap in a real PPM payload keeping the media-table shape
    real = spark.createDataFrame(pd.DataFrame({
        "media_id": [1], "payload": [encode_ppm(arr)]})) \
        .join(media.select("media_id", "meta"), "media_id")
    out = resize_images(real, 4, 4).collect()[0]
    assert out["meta"]["format"] == "image/ppm"
    assert out["meta"]["width"] == 4 and out["meta"]["height"] == 4
    got = decode_image(bytes(out["payload"]))["pixels"]
    ys = (np.arange(4) * 8 // 4)
    np.testing.assert_array_equal(got, arr[ys][:, ys])


def test_resize_then_extract_composes(spark):
    media = spark.createDataFrame(pd.DataFrame({
        "media_id": [1, 2],
        "payload": [encode_ppm(_img(10, 10, seed=s)) for s in (1, 2)]}))
    with_meta = media.join(
        to_media_table(spark.createDataFrame(pd.DataFrame(
            {"doc_id": [1, 2], "text": ["a", "b"]})))
        .select("media_id", "meta"), "media_id")
    small = resize_images(with_meta, 5, 5)
    feats = extract_features(small).collect()
    assert all(r["feature"][0] == 5.0 and r["feature"][1] == 5.0
               for r in feats)


# ----------------------------------------------------------------- audio

def _sine(freq, rate=8000, sec=1.0, amp=0.5):
    t = np.arange(int(rate * sec)) / rate
    return (amp * 32767 * np.sin(2 * np.pi * freq * t)).astype(np.int16)


def test_wav_roundtrip_and_features():
    from baloo_spark.operators.multimodal import decode_audio, encode_wav
    s = _sine(440, rate=8000, sec=0.5)
    out = decode_audio(encode_wav(s, 8000))
    assert out["decoded"] and out["rate"] == 8000
    np.testing.assert_array_equal(out["samples"][:, 0], s)
    dur, rate, ch, rms, peak, zcr = out["feature"][:6]
    assert dur == 0.5 and rate == 8000.0 and ch == 1.0
    # sine RMS = amp/sqrt(2); zcr = 2f/rate
    assert abs(rms - 0.5 / np.sqrt(2)) < 0.01
    assert abs(zcr - 2 * 440 / 8000) < 0.005
    assert abs(peak - 0.5) < 0.01


def test_wav_stereo_and_extra_chunks():
    from baloo_spark.operators.multimodal import decode_audio, encode_wav
    import struct
    st = np.stack([_sine(200), _sine(300)], axis=1)
    raw = encode_wav(st, 8000)
    # splice a LIST chunk between fmt and data: the walker must skip it
    fmt_end = raw.index(b"data")
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    spliced = raw[:fmt_end] + extra + raw[fmt_end:]
    out = decode_audio(spliced)
    assert out["decoded"]
    np.testing.assert_array_equal(out["samples"], st)
    assert out["feature"][2] == 2.0  # channels


def test_non_wav_falls_back_to_stub():
    from baloo_spark.operators.multimodal import decode_audio
    out = decode_audio(b"\x00\x01not audio")
    assert out["ok"] and not out["decoded"]


def test_audio_features_spark_pipeline(spark):
    from baloo_spark.operators.multimodal import audio_features, encode_wav
    media = spark.createDataFrame(pd.DataFrame({
        "media_id": [1, 2],
        "payload": [encode_wav(_sine(440, sec=2.0), 8000),
                    encode_wav(_sine(100, sec=0.25), 8000)]}))
    got = {r["media_id"]: r for r in audio_features(media).collect()}
    assert got[1]["duration_sec"] == 2.0
    assert got[2]["duration_sec"] == 0.25
    assert abs(got[1]["zcr"] - 2 * 440 / 8000) < 0.005


def test_sample_clips_one_to_many(spark):
    from baloo_spark.operators.multimodal import (decode_audio, encode_wav,
                                                  sample_clips)
    media = spark.createDataFrame(pd.DataFrame({
        "media_id": [7],
        "payload": [encode_wav(_sine(50, rate=1000, sec=10.0), 1000)]}))
    rows = sample_clips(media, clip_sec=1.0, every_sec=3.0).collect()
    # 10s / 3s step -> clips at 0,3,6,9s
    assert [r["clip_idx"] for r in sorted(rows, key=lambda r: r["clip_idx"])] \
        == [0, 1, 2, 3]
    first = decode_audio(bytes(rows[0]["clip"]))
    assert first["decoded"] and len(first["samples"]) == 1000
