"""Property-based tests (hypothesis) with pandas as the oracle.

The reference has NO property-based testing (SURVEY.md §5.7) — this
is an engine upgrade: random tiny frames, engine result must equal
pandas semantics. Example counts are kept small because every example
runs Spark jobs.
"""

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = dict(max_examples=8, deadline=None,
                suppress_health_check=[HealthCheck.function_scoped_fixture,
                                       HealthCheck.too_slow])

vals = st.lists(st.integers(min_value=-50, max_value=50),
                min_size=1, max_size=12)
keys = st.lists(st.integers(min_value=0, max_value=3),
                min_size=1, max_size=12)


def _frame(bl, k, v):
    n = min(len(k), len(v))
    pdf = pd.DataFrame({"k": np.array(k[:n], dtype=np.int64),
                        "v": np.array(v[:n], dtype=np.float64)})
    return bl.DataFrame({"k": pdf["k"].to_numpy(),
                         "v": pdf["v"].to_numpy()}), pdf


@given(k=keys, v=vals)
@settings(**SETTINGS)
def test_groupby_sum_matches_pandas(bl, k, v):
    df, pdf = _frame(bl, k, v)
    got = {r["k"]: r["v"] for r in
           df.groupby("k").sum().to_pandas().reset_index().to_dict("records")}
    want = pdf.groupby("k")["v"].sum().to_dict()
    assert got.keys() == want.keys()
    for key in want:
        assert got[key] == pytest.approx(want[key])


@given(k=keys, v=vals)
@settings(**SETTINGS)
def test_filter_arith_matches_pandas(bl, k, v):
    df, pdf = _frame(bl, k, v)
    got = df[(df["v"] > 0) & (df["k"] < 3)]
    got_vals = sorted((got["v"] * 2 + 1).to_pandas().tolist())
    want = sorted((pdf[(pdf["v"] > 0) & (pdf["k"] < 3)]["v"] * 2 + 1).tolist())
    assert got_vals == pytest.approx(want)


@given(k=keys, v=vals)
@settings(**SETTINGS)
def test_sort_values_matches_pandas(bl, k, v):
    df, pdf = _frame(bl, k, v)
    got = df.sort_values(["v", "k"], ascending=[False, True]) \
        .to_pandas()[["k", "v"]].to_records(index=False).tolist()
    want = pdf.sort_values(["v", "k"], ascending=[False, True]) \
        [["k", "v"]].to_records(index=False).tolist()
    assert got == want


@given(k=keys, v=vals, k2=keys)
@settings(**SETTINGS)
def test_merge_inner_matches_pandas(bl, k, v, k2):
    df, pdf = _frame(bl, k, v)
    n2 = len(k2)
    pdf2 = pd.DataFrame({"k": np.array(k2, dtype=np.int64),
                         "w": np.arange(n2, dtype=np.float64)}) \
        .drop_duplicates("k")  # reference requires unique keys
    df2 = bl.DataFrame({"k": pdf2["k"].to_numpy(), "w": pdf2["w"].to_numpy()})
    got = sorted(df.merge(df2, on="k", how="inner").to_pandas()
                 .reset_index()[["k", "v", "w"]]
                 .to_records(index=False).tolist())
    want = sorted(pdf.merge(pdf2, on="k", how="inner")
                  [["k", "v", "w"]].to_records(index=False).tolist())
    assert got == want


@given(k=keys, v=vals)
@settings(**SETTINGS)
def test_drop_duplicates_min_matches_pandas(bl, k, v):
    df, pdf = _frame(bl, k, v)
    got = sorted(df.drop_duplicates(subset=["k"], keep="min")
                 .to_pandas().to_dict("records"),
                 key=lambda r: r["k"])
    want = pdf.groupby("k", as_index=False)["v"].min() \
        .sort_values("k").to_dict("records")
    assert [(r["k"], r["v"]) for r in got] == \
        [(r["k"], r["v"]) for r in want]


@given(k=keys, v=vals)
@settings(**SETTINGS)
def test_value_counts_matches_pandas(bl, k, v):
    df, pdf = _frame(bl, k, v)
    got = dict(zip(*[iter_ for iter_ in (
        df["k"].value_counts().to_pandas().index.tolist(),
        df["k"].value_counts().to_pandas().tolist())]))
    want = pdf["k"].value_counts().to_dict()
    assert got == want


@given(s=st.lists(st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126),
    min_size=0, max_size=12), min_size=1, max_size=8))
@settings(**SETTINGS)
def test_str_ops_match_pandas(bl, s):
    sr = bl.Series(np.array(s, dtype=object), name="s")
    got_lower = sr.str.lower().to_pandas().tolist()
    assert got_lower == pd.Series(s).str.lower().tolist()
    got_find = sr.str.find("a").to_pandas().tolist()
    assert got_find == [x.find("a") for x in s]
    got_strip = sr.str.strip().to_pandas().tolist()
    assert got_strip == [x.strip(" ") for x in s]


@given(v=vals, m=st.lists(st.booleans(), min_size=1, max_size=12))
@settings(**SETTINGS)
def test_cross_frame_mask_matches_pandas(bl, v, m):
    # Mask built from a DIFFERENT frame filters positionally
    # (reference positional semantics, weld_ops.py:97-133).
    n = min(len(v), len(m))
    vv, mm = v[:n], m[:n]
    df = bl.DataFrame({"v": np.array(vv, dtype=np.int64)})
    other = bl.DataFrame({"flag": np.array(mm, dtype=np.int64)})
    mask = other["flag"] == 1
    got = sorted(df[mask]["v"].to_pandas().tolist())
    want = sorted(np.array(vv)[np.array(mm)].tolist())
    assert got == want
    got_sr = sorted(df["v"][mask].to_pandas().tolist())
    assert got_sr == want


@given(v=vals)
@settings(**SETTINGS)
def test_shift_diff_match_pandas(bl, v):
    ps = pd.Series(np.array(v, dtype=np.float64))
    sr = bl.Series(ps.to_numpy())
    got_shift = sr.shift(1).to_pandas()
    got_diff = sr.diff(1).to_pandas()
    pd.testing.assert_series_equal(
        got_shift.reset_index(drop=True), ps.shift(1),
        check_names=False)
    pd.testing.assert_series_equal(
        got_diff.reset_index(drop=True), ps.diff(1),
        check_names=False)


@given(v=vals)
@settings(**SETTINGS)
def test_idxmax_idxmin_match_pandas(bl, v):
    ps = pd.Series(np.array(v, dtype=np.float64))
    sr = bl.Series(ps.to_numpy())
    assert sr.idxmax() == ps.idxmax()
    assert sr.idxmin() == ps.idxmin()


@given(k=keys, v=vals)
@settings(**SETTINGS)
def test_merge_two_keys_matches_pandas(bl, k, v):
    # 2-key merge: result indexed by both keys (MultiIndex face)
    df, pdf = _frame(bl, k, v)
    other_p = pdf.drop_duplicates(["k", "v"]).assign(w=1.0)
    other = bl.DataFrame({"k": other_p["k"].to_numpy(),
                          "v": other_p["v"].to_numpy(),
                          "w": other_p["w"].to_numpy()})
    got = df.merge(other, on=["k", "v"]).to_pandas().reset_index()
    want = pdf.merge(other_p, on=["k", "v"])
    assert len(got) == len(want)
    assert sorted(got["w"].tolist()) == sorted(want["w"].tolist())
    assert sorted(zip(got["k"], got["v"])) == sorted(zip(want["k"], want["v"]))


@given(v=vals)
@settings(**SETTINGS)
def test_index_ops_match_pandas(bl, v):
    # lazy Index pipeline (compare -> filter -> arithmetic) vs the
    # same ops on a pandas Index
    from baloo_spark.core.indexes import Index
    arr = np.array(v, dtype=np.int64)
    ix, pix = Index(arr), pd.Index(arr)
    got = ((ix[ix > 0] * 2).values.tolist())
    want = (pix[pix > 0] * 2).tolist()
    assert sorted(got) == sorted(want)
    assert ix.min() == pix.min() if len(pix) else True


@given(v=vals)
@settings(**SETTINGS)
def test_index_slice_head_match_pandas(bl, v):
    from baloo_spark.core.indexes import Index
    arr = np.array(v, dtype=np.int64)
    ix, pix = Index(arr), pd.Index(arr)
    assert ix[1:4].values.tolist() == pix[1:4].tolist()
    assert ix.head(2).values.tolist() == pix[:2].tolist()
    assert ix.tail(2).values.tolist() == pix[-2:].tolist()


words = st.lists(
    st.text(alphabet="abc", min_size=1, max_size=3),
    min_size=0, max_size=30).map(" ".join)


@given(texts=st.lists(words, min_size=1, max_size=6),
       ct=st.integers(min_value=2, max_value=8))
@settings(**SETTINGS)
def test_chunking_reconstruction_property(spark, texts, ct):
    # overlap=0 chunks concatenate back to the exact token stream, and
    # every chunk except possibly the last is full
    from baloo_spark.operators.chunking import chunk_documents
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts}))
    got = (chunk_documents(docs, chunk_tokens=ct, overlap=0).toPandas()
           .sort_values(["doc_id", "chunk_seq"]))
    for i, t in enumerate(texts):
        mine = got[got["doc_id"] == i]
        toks = t.split()
        assert " ".join(mine["chunk_text"]).split() == toks
        if len(toks) == 0:
            assert len(mine) == 0
        else:
            sizes = mine["chunk_n_tokens"].tolist()
            assert all(s == ct for s in sizes[:-1])
            assert 1 <= sizes[-1] <= ct if sizes else True


@given(v=vals, w1=st.floats(min_value=0, max_value=0.5),
       w2=st.floats(min_value=0.5, max_value=1.0))
@settings(**SETTINGS)
def test_weighted_sample_monotone_property(spark, v, w1, w2):
    # same key+seed: a higher keep-probability is a SUPERSET of a
    # lower one (threshold semantics, not independent draws)
    from pyspark.sql import functions as F

    from baloo_spark.operators.sampling import weighted_sample
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(v)), "x": v}))
    low = weighted_sample(df.withColumn("w", F.lit(float(w1))),
                          "w", "doc_id", seed=2)
    high = weighted_sample(df.withColumn("w", F.lit(float(w2))),
                           "w", "doc_id", seed=2)
    ids_low = {r["doc_id"] for r in low.collect()}
    ids_high = {r["doc_id"] for r in high.collect()}
    assert ids_low <= ids_high


@given(v=vals)
@settings(**SETTINGS)
def test_cut_bins_partition_the_range_property(bl, v):
    # every in-range value lands in exactly the pandas bin
    arr = np.array(v, dtype=np.float64)
    df = bl.DataFrame({"v": arr})
    bins = [-51, -10, 0, 10, 51]
    got = df["v"].cut(bins).to_pandas()
    want = pd.cut(pd.Series(arr), bins).astype(str).tolist()
    for g, w in zip(got, want):
        if g is None:
            assert w == "nan"
        else:
            lo, hi = g.strip("(]").split(", ")
            assert w == f"({float(lo):g}.0, {float(hi):g}.0]" \
                or w == f"({float(lo):g}, {float(hi):g}]"


@given(v=vals)
@settings(**SETTINGS)
def test_cumulative_ops_match_pandas(bl, v):
    pdf = pd.DataFrame({"k": np.arange(len(v), dtype=np.int64),
                        "v": np.array(v, dtype=np.float64)})
    df = bl.DataFrame({"k": pdf["k"].to_numpy(),
                       "v": pdf["v"].to_numpy()}).sort_values("k")
    for op in ("cumsum", "cummin", "cummax"):
        got = getattr(df["v"], op)().to_pandas().tolist()
        want = getattr(pdf["v"], op)().tolist()
        assert got == pytest.approx(want), op


@given(v=vals)
@settings(**SETTINGS)
def test_rank_min_dense_match_pandas(bl, v):
    pdf = pd.DataFrame({"k": np.arange(len(v), dtype=np.int64),
                        "v": np.array(v, dtype=np.float64)})
    df = bl.DataFrame({"k": pdf["k"].to_numpy(),
                       "v": pdf["v"].to_numpy()}) \
        .sort_values("k").set_index("k")
    for method in ("min", "dense"):
        rs = df["v"].rank(method=method).to_spark()
        got = {r["k"]: float(r["v"]) for r in rs.collect()}
        want = pdf.set_index("k")["v"].rank(method=method).to_dict()
        assert got == {k: float(x) for k, x in want.items()}, method


@given(v=vals, m=st.lists(st.sampled_from(["a", "b", "c"]),
                          min_size=1, max_size=12))
@settings(**SETTINGS)
def test_series_map_matches_pandas(bl, v, m):
    n = min(len(v), len(m))
    pdf = pd.DataFrame({"s": m[:n], "v": np.array(v[:n], np.float64)})
    df = bl.DataFrame({"s": np.array(m[:n], dtype=object),
                       "v": pdf["v"].to_numpy()})
    got = sorted(df["s"].map({"a": 1.0, "b": 2.0}, default=0.0)
                 .to_pandas().tolist())
    want = sorted(pdf["s"].map({"a": 1.0, "b": 2.0}).fillna(0.0).tolist())
    assert got == pytest.approx(want)
