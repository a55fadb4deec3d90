"""Empty-frame edge cases (reference tests/core/test_empty.py)."""

import numpy as np
import pytest


@pytest.fixture
def empty(bl):
    df = bl.DataFrame({"a": np.array([1.0, 2.0]),
                       "b": np.array([1, 2], dtype=np.int64)})
    return df[df["a"] > 100]


def test_empty_len_and_pandas(empty):
    assert len(empty) == 0
    assert empty.to_pandas().shape[0] == 0


def test_empty_aggs_identity(empty):
    # sum/prod -> merger identity; count -> 0; min/max/mean -> NULL
    assert empty["a"].sum() == 0.0
    assert empty["a"].prod() == 1.0
    assert empty["a"].count() == 0
    assert empty["a"].min() is None
    assert empty["a"].mean() is None


def test_empty_filter_sort_head(empty):
    out = empty[empty["b"] > 0].sort_values("a").head(5)
    assert len(out) == 0


def test_empty_groupby(empty):
    assert len(empty.groupby("b").sum()) == 0


def test_empty_merge(bl, empty):
    other = bl.DataFrame({"b": np.array([1, 2], dtype=np.int64),
                          "c": np.array([10.0, 20.0])})
    assert len(empty.merge(other, on="b", how="inner")) == 0
    assert len(other.merge(empty[["b"]], on="b", how="left")) == 2


def test_setitem_ndarray(bl):
    df = bl.DataFrame({"a": np.array([1.0, 2.0, 3.0])})
    df["z"] = np.array([10, 20, 30], dtype=np.int64)
    got = df.to_pandas().sort_values("a")
    assert got["z"].tolist() == [10, 20, 30]


def test_new_ops_on_empty_frames(spark):
    import baloo_spark as bl
    from baloo_spark.operators.lm import perplexity, train_bigram_lm
    empty_docs = spark.createDataFrame([], "doc_id LONG, text STRING")
    lm_src = spark.createDataFrame([(1, "a b a c")],
                                   "doc_id LONG, text STRING")
    lm = train_bigram_lm(lm_src)
    assert perplexity(empty_docs, lm).count() == 0
    # cumulative / rank / duplicated on an empty engine frame
    df = bl.DataFrame.from_spark(
        spark.createDataFrame([], "k LONG, x DOUBLE")).sort_values("k")
    assert df["x"].cumsum().to_pandas().tolist() == []
    assert df["x"].rank().to_spark().count() == 0
    assert df.duplicated(subset="x").to_spark().count() == 0
    assert df["x"].nunique() == 0


def test_r4_ops_on_empty_frames(spark):
    import baloo_spark as bl
    from baloo_spark.operators.dedup import (drop_near_duplicates,
                                             embedding_near_pairs,
                                             incremental_dedup)
    from baloo_spark.operators.joins import asof_join
    from baloo_spark.operators.text import clean_text

    empty_docs = spark.createDataFrame([], "doc_id LONG, text STRING")
    surv, seen = incremental_dedup(empty_docs, None)
    assert surv.count() == 0 and seen.count() == 0
    assert clean_text(empty_docs, unicode_form="NFC").count() == 0

    empty_vecs = spark.createDataFrame(
        [], "vec_id LONG, embedding ARRAY<FLOAT>")
    assert embedding_near_pairs(empty_vecs, block=True).count() == 0

    pairs = spark.createDataFrame([], "id_a LONG, id_b LONG")
    docs = spark.createDataFrame([(1,), (2,)], "doc_id LONG")
    assert drop_near_duplicates(docs, pairs).count() == 2

    empty_ts = spark.createDataFrame([], "id LONG, ts TIMESTAMP")
    right = spark.createDataFrame([], "ts TIMESTAMP, px DOUBLE")
    for d in ("backward", "forward", "nearest"):
        assert asof_join(empty_ts, right, on="ts",
                         direction=d).count() == 0

    df = bl.DataFrame.from_spark(
        spark.createDataFrame([], "k LONG, x DOUBLE")).sort_values("k")
    assert df["x"].rank(method="average").to_spark().count() == 0
    assert df["x"].rank(pct=True).to_spark().count() == 0
    src = spark.createDataFrame([], "k LONG, vs ARRAY<LONG>")
    assert bl.DataFrame.from_spark(src).explode("vs") \
        .to_spark().count() == 0
