"""Index parity with the reference, built lazily.

Shaped after the reference's ``tests/core/indexes/test_base.py``
(comparison, filter, slice, head/tail, arithmetic vs array and
scalar, isna/dropna/fillna) plus laziness assertions: an operation on
an Index must NOT materialize anything — values appear only at
``.values`` / ``evaluate()`` time, exactly like Series.
"""

import numpy as np
import pytest

import baloo_spark as bl
from baloo_spark.core.indexes import Index, RangeIndex


@pytest.fixture()
def index_i64():
    return Index(np.arange(5), np.dtype(np.int64))


def assert_index_equal(actual, expected):
    # mirrors the reference's helper: evaluate both, compare values,
    # dtype kind, length, name (test_base.py:7-22)
    actual = actual.evaluate()
    expected = expected.evaluate()
    np.testing.assert_array_equal(actual.values, expected.values)
    assert actual.dtype.kind == expected.dtype.kind
    assert len(actual) == len(expected)
    assert actual.name == expected.name


def test_init_list():
    assert_index_equal(Index([1, 2, 3]), Index(np.array([1, 2, 3])))


def test_comparison_is_lazy(index_i64):
    out = index_i64 < 3
    assert out._values is None  # no evaluation happened
    assert_index_equal(out, Index(np.array([True, True, True, False,
                                            False])))


def test_filter(index_i64):
    mask = Index(np.array([False, True, True, False, False]))
    out = index_i64[mask]
    assert out._values is None
    assert_index_equal(out, Index(np.array([1, 2], dtype=np.int64)))


def test_filter_by_own_comparison(index_i64):
    # the composed pipeline (compare -> filter) stays one lazy plan
    out = index_i64[index_i64 < 2]
    assert out._values is None
    assert_index_equal(out, Index(np.array([0, 1], dtype=np.int64)))


def test_slice(index_i64):
    assert_index_equal(index_i64[1:3],
                       Index(np.array([1, 2], dtype=np.int64)))


def test_head_tail(index_i64):
    assert_index_equal(index_i64.head(2),
                       Index(np.array([0, 1], dtype=np.int64)))
    assert_index_equal(index_i64.tail(2),
                       Index(np.array([3, 4], dtype=np.int64)))


@pytest.mark.parametrize("operation, expected", [
    ("+", np.arange(3, 8, dtype=np.float32)),
    ("-", np.arange(-1, 4, dtype=np.float32)),
    ("*", np.arange(2, 11, 2, dtype=np.float32)),
    ("/", np.array([0.5, 1, 1.5, 2, 2.5], dtype=np.float32)),
    ("**", np.array([1, 4, 9, 16, 25], dtype=np.float32)),
])
def test_op_array(operation, expected):
    data = Index(np.arange(1, 6, dtype=np.float32))
    other = bl.Series(np.full(5, 2, dtype=np.float32))
    actual = eval(f"data {operation} other")
    assert isinstance(actual, Index)
    assert actual._values is None
    assert_index_equal(actual, Index(expected))


@pytest.mark.parametrize("operation, expected", [
    ("+", np.arange(3, 8, dtype=np.float32)),
    ("-", np.arange(-1, 4, dtype=np.float32)),
    ("*", np.arange(2, 11, 2, dtype=np.float32)),
    ("/", np.array([0.5, 1, 1.5, 2, 2.5], dtype=np.float32)),
    ("**", np.array([1, 4, 9, 16, 25], dtype=np.float32)),
])
def test_op_scalar(operation, expected):
    ind = Index(np.arange(1, 6, dtype=np.float32))
    actual = eval(f"ind {operation} 2")
    assert isinstance(actual, Index)
    assert_index_equal(actual, Index(expected))


def test_isna_dropna_fillna():
    ind = Index(np.array([3.0, 2.0, np.nan, 4.0, np.nan]))
    np.testing.assert_array_equal(
        ind.isna().values, np.array([False, False, True, False, True]))
    np.testing.assert_array_equal(
        ind.dropna().values, np.array([3.0, 2.0, 4.0]))
    np.testing.assert_array_equal(
        ind.fillna(0.0).values, np.array([3.0, 2.0, 0.0, 4.0, 0.0]))


def test_astype(index_i64):
    out = index_i64.astype("float64")
    assert out._values is None
    assert out.values.dtype == np.float64


def test_frame_index_ops_do_not_collect(spark):
    """An Index attached to a live frame operates over the frame's
    own plan — comparisons/filters build lazily with no driver
    collect (VERDICT r2 missing-4)."""
    df = bl.DataFrame({"a": np.arange(10, 20), "b": np.arange(10)})
    df = df.set_index("a")
    ix = df.index
    out = ix[ix < 15]
    assert out._values is None  # nothing materialized yet
    np.testing.assert_array_equal(out.values,
                                  np.array([10, 11, 12, 13, 14]))


def test_series_index_lazy(spark):
    sr = bl.Series(np.array([1.0, 2.0, 3.0]),
                   index=np.array([10, 20, 30]))
    ix = sr.index
    assert (ix + 1)._values is None
    np.testing.assert_array_equal((ix + 1).values, np.array([11, 21, 31]))


def test_range_index_backing(spark):
    sr = bl.Series(np.array([5.0, 6.0, 7.0]))
    ri = sr.index
    assert isinstance(ri, RangeIndex)
    out = ri * 2
    np.testing.assert_array_equal(out.values, np.array([0, 2, 4]))


class TestRangeIndex:
    """Shaped after the reference's tests/core/indexes/test_range.py."""

    def test_init_single_arg(self):
        ri = RangeIndex(5)
        assert (ri.start, ri.stop, ri.step) == (0, 5, 1)
        np.testing.assert_array_equal(ri.values, np.arange(5))

    def test_init_negative_step(self):
        with pytest.raises(ValueError):
            RangeIndex(5, 0, -1)

    def test_evaluate(self):
        assert_index_equal(RangeIndex(5).evaluate(), Index(np.arange(5)))

    def test_len_raw(self):
        assert len(RangeIndex(5)) == 5
        assert len(RangeIndex(1, 7, 2)) == 3

    def test_comparison(self):
        assert_index_equal(RangeIndex(5) < 3,
                           Index(np.array([True, True, True, False,
                                           False])))

    def test_filter(self):
        out = RangeIndex(5)[Index(np.array([False, True, True, False,
                                            False]))]
        assert_index_equal(out, Index(np.array([1, 2], dtype=np.int64)))

    def test_slice_head(self):
        assert_index_equal(RangeIndex(5)[1:3],
                           Index(np.array([1, 2], dtype=np.int64)))
        assert_index_equal(RangeIndex(5).head(2),
                           Index(np.array([0, 1], dtype=np.int64)))


def test_read_frame_implicit_range_index(spark):
    """A file-backed frame carries no index column (by design, for
    scale); its .index presents as a RangeIndex realized through the
    dense-ordinal plan on demand — not an empty MultiIndex."""
    import baloo_spark as bl
    df = bl.read_parquet("/root/testdata/sf0.001/nation.parquet")
    ix = df.index
    assert isinstance(ix, RangeIndex)
    np.testing.assert_array_equal(ix.head(3).values, np.arange(3))


def test_min_max(index_i64):
    # reference LazyArrayResult.min/max (lazy_result.py:116-137)
    assert index_i64.min() == 0
    assert index_i64.max() == 4


def test_dtype_is_schema_only(index_i64):
    out = index_i64.astype("int32")
    assert out.dtype == np.int32   # read from the plan's schema
    assert out._values is None     # ...without evaluating


def test_loc_at_index_isin(bl):
    """r5 probe batch: label-based selection (loc/at, engine
    extensions) and Index.isin masks."""
    import numpy as np
    import pandas as pd
    df = bl.DataFrame({"k": np.array([2, 1, 3]),
                       "v": np.array([1., 2., 3.]),
                       "w": np.array([9., 8., 7.])}).set_index("k")
    pdf = pd.DataFrame({"k": [2, 1, 3], "v": [1., 2., 3.],
                        "w": [9., 8., 7.]}).set_index("k")
    assert df.loc[1].to_pandas()["v"].tolist() == [pdf.loc[1, "v"]]
    got = df.loc[[1, 3]].to_pandas().sort_index()
    assert got["v"].tolist() == pdf.loc[[1, 3]].sort_index()["v"].tolist()
    assert df.loc[df.index.isin([1, 3])].to_pandas() \
        .sort_index()["v"].tolist() == [2.0, 3.0]
    two_d = df.loc[[1, 3], "v"].to_pandas()
    assert sorted(two_d.tolist()) == [2.0, 3.0]
    assert df.at[3, "w"] == pdf.at[3, "w"] == 7.0
    import pytest
    with pytest.raises(TypeError, match="label slices"):
        df.loc[1:3]
    dup = bl.DataFrame({"k": np.array([1, 1]),
                        "v": np.array([5., 6.])}).set_index("k")
    with pytest.raises(KeyError, match="matched 2"):
        dup.at[1, "v"]


def test_index_delegations_and_set_ops(bl):
    """Series-backed Index delegations + distinct set algebra
    (documented distinct flavor vs pandas max-multiplicity union)."""
    import numpy as np
    import pandas as pd
    pi = pd.Index([3, 1, 2, 3, 1], name="k")
    bi = bl.Index(np.array([3, 1, 2, 3, 1]), name="k")
    assert sorted(bi.unique().values.tolist()) == \
        sorted(pi.unique().tolist())
    assert bi.nunique() == pi.nunique()
    assert bi.sort_values().values.tolist() == pi.sort_values().tolist()
    assert bi.is_unique == pi.is_unique
    assert bi.is_monotonic_increasing == pi.is_monotonic_increasing
    assert bi.argmax() == pi.argmax()
    pj, bj = pd.Index([2, 3, 9]), bl.Index(np.array([2, 3, 9]))
    assert bi.union(bj).values.tolist() == [1, 2, 3, 9]  # distinct
    assert bi.intersection(bj).values.tolist() == \
        sorted(pi.intersection(pj).tolist())
    assert bi.difference(bj).values.tolist() == \
        sorted(pi.difference(pj).tolist())
    assert sorted(bi.tolist()) == [1, 1, 2, 3, 3]
    # NaN sorts LAST in set-op results (pandas + core/ordering.py
    # convention; Spark's bare asc() is nulls-first)
    pn = pd.Index([3.0, 1.0, np.nan, 2.0])
    bn = bl.Index(np.array([3.0, 1.0, np.nan, 2.0]))
    pm, bm = pd.Index([2.0, np.nan]), bl.Index(np.array([2.0, np.nan]))
    u_ours = bn.union(bm).values.tolist()
    u_pd = pn.union(pm).tolist()
    assert u_ours[:3] == u_pd[:3] == [1.0, 2.0, 3.0]
    assert np.isnan(u_ours[3]) and np.isnan(u_pd[3])
    assert bn.difference(bm).values.tolist() == \
        pn.difference(pm).tolist() == [1.0, 3.0]
    i_ours = bn.intersection(bm).values.tolist()
    assert i_ours[0] == 2.0 and np.isnan(i_ours[1])  # sorted, NaN last


def test_loc_boolean_series_label_aligns_r10(bl):
    """r10: pandas .loc LABEL-ALIGNS a boolean Series (mask
    reindexed to the frame's index) where plain df[mask] stays
    pinned POSITIONAL (reference weld_ops.py:97-133). Foreign masks
    join on the index; result keeps the frame's row order. Gates:
    superset masks fine, missing label -> pandas IndexingError,
    duplicate mask labels -> ValueError (pandas' own duplicate
    behavior is alignment soup — probed r10), NULL mask values
    align False (nullable-boolean flavor)."""
    import numpy as np
    import pandas as pd
    import pytest
    pdf = pd.DataFrame({"a": [1.0, 2, 3]}, index=[10, 20, 30])
    pdf.index.name = "i"
    d = bl.DataFrame({"i": [10, 20, 30], "a": [1.0, 2, 3]}) \
        .set_index("i")
    # shuffled-index mask: labels {20, 10} survive, frame order kept
    m = bl.DataFrame({"i": [30, 20, 10],
                      "m": [False, True, True]}).set_index("i")["m"]
    pm = pd.Series([False, True, True], index=[30, 20, 10])
    got = d.loc[m].to_pandas()
    pd.testing.assert_frame_equal(got, pdf.loc[pm])
    assert got.index.tolist() == [10, 20]
    # series face
    got_s = d["a"].loc[m].to_pandas()
    pd.testing.assert_series_equal(got_s, pdf["a"].loc[pm])
    # superset mask: extra labels ignored
    sup = bl.DataFrame({"i": [10, 20, 30, 40],
                        "m": [True, True, False, True]}) \
        .set_index("i")["m"]
    assert d.loc[sup].to_pandas().index.tolist() == [10, 20]
    # missing label -> IndexingError (pandas' wording)
    miss = bl.DataFrame({"i": [10, 20], "m": [True, True]}) \
        .set_index("i")["m"]
    with pytest.raises(pd.errors.IndexingError,
                       match="Unalignable"):
        d.loc[miss]
    with pytest.raises(pd.errors.IndexingError,
                       match="Unalignable"):
        d["a"].loc[miss]
    # duplicate mask labels -> ValueError gate
    dup = bl.DataFrame({"i": [10, 20, 30, 10],
                        "m": [True, True, False, True]}) \
        .set_index("i")["m"]
    with pytest.raises(ValueError, match="duplicate labels"):
        d.loc[dup]
    # NULL mask values align False (pandas nullable-boolean
    # flavor); NaN is the engine's NULL sentinel, so x > 0 yields a
    # null boolean on the middle row
    nulf = bl.DataFrame({"i": [10, 20, 30],
                         "x": [1.0, np.nan, 2.0]}).set_index("i")
    nul = nulf["x"] > 0
    assert d.loc[nul].to_pandas().index.tolist() == [10, 30]
    # duplicate FRAME labels with a unique mask: each row looks up
    # its label (pandas-exact)
    ddup = bl.DataFrame({"i": [10, 10, 20], "a": [1.0, 2, 3]}) \
        .set_index("i")
    m8 = bl.DataFrame({"i": [10, 20], "m": [True, False]}) \
        .set_index("i")["m"]
    assert ddup.loc[m8].to_pandas()["a"].tolist() == [1.0, 2.0]
    # same-frame mask keeps the cheap filter path (values equal
    # either way — identical index)
    got = d.loc[d["a"] > 1].to_pandas()
    pd.testing.assert_frame_equal(got, pdf.loc[pdf["a"] > 1])
    # plain [] stays PINNED positional for cross-frame masks
    # (reference semantics): same shuffled mask, positions 1,2 kept
    assert d[m].to_pandas()["a"].tolist() == [2.0, 3.0]


def test_loc_label_series_distributed_r10(bl):
    """r10: .loc with a NON-boolean Series/Index reads its VALUES
    as requested labels (pandas semantics: requested order,
    duplicate requests repeated, KeyError on a miss) — but unlike
    the driver-sized label-LIST path, the gather stays DISTRIBUTED:
    a position-tagged lookup join plus one left-anti gate job, no
    label collect."""
    import pandas as pd
    import pytest
    pdf = pd.DataFrame({"a": [1.0, 2, 3]},
                       index=pd.Index([10, 20, 30], name="i"))
    d = bl.DataFrame({"i": [10, 20, 30], "a": [1.0, 2, 3]}) \
        .set_index("i")
    lab = bl.DataFrame({"x": [30, 10, 30]})["x"]
    plab = pd.Series([30, 10, 30])
    pd.testing.assert_frame_equal(d.loc[lab].to_pandas(),
                                  pdf.loc[plab])
    pd.testing.assert_series_equal(d["a"].loc[lab].to_pandas(),
                                   pdf["a"].loc[plab])
    # an Index key is a label request too
    other = bl.DataFrame({"i": [30, 10], "b": [9.0, 8]}) \
        .set_index("i")
    assert d.loc[other.index].to_pandas().index.tolist() == [30, 10]
    # duplicate frame labels: every match, in request order
    dd = bl.DataFrame({"i": [10, 10, 20], "a": [1.0, 2, 3]}) \
        .set_index("i")
    got = dd.loc[bl.DataFrame({"x": [10, 20]})["x"]].to_pandas()
    assert got["a"].tolist() == [1.0, 2.0, 3.0]
    with pytest.raises(KeyError, match="not all in index"):
        d.loc[bl.DataFrame({"x": [10, 99]})["x"]]


def test_loc_assignment_r10(bl):
    """r10: the pandas conditional-assignment face
    ``df.loc[rows, col] = value``. The value stages through the
    standard __setitem__ alignment machinery into a temp column,
    the row condition stages into another (it may reference columns
    the write overwrites), then each target column is one
    when().otherwise() projection — no collect. Enlargement
    (loc-set at a missing label appends a row in pandas) is refused
    with concat named."""
    import numpy as np
    import pandas as pd
    import pytest

    def mk():
        pdf = pd.DataFrame(
            {"a": [1.0, 2, 3, 4], "b": [10.0, 20, 30, 40]},
            index=pd.Index([10, 20, 30, 40], name="i"))
        d = bl.DataFrame({"i": [10, 20, 30, 40],
                          "a": [1.0, 2, 3, 4],
                          "b": [10.0, 20, 30, 40]}).set_index("i")
        return pdf, d

    # same-frame mask + scalar / Series-expression values
    pdf, d = mk()
    pdf.loc[pdf["a"] > 2, "b"] = -1.0
    d.loc[d["a"] > 2, "b"] = -1.0
    pdf.loc[pdf["a"] > 2, "a"] = pdf["b"] * 100
    d.loc[d["a"] > 2, "a"] = d["b"] * 100
    pd.testing.assert_frame_equal(d.to_pandas(), pdf)
    # new column: NULL outside the selection
    pdf, d = mk()
    pdf.loc[pdf["a"] > 2, "c"] = 7.0
    d.loc[d["a"] > 2, "c"] = 7.0
    pd.testing.assert_frame_equal(d.to_pandas(), pdf)
    # label list, scalar label, boolean list (positional)
    pdf, d = mk()
    pdf.loc[[10, 30], "a"] = 0.0
    d.loc[[10, 30], "a"] = 0.0
    pdf.loc[20, "a"] = 5.0
    d.loc[20, "a"] = 5.0
    pdf.loc[[True, False, True, False], "b"] = 9.0
    d.loc[[True, False, True, False], "b"] = 9.0
    pd.testing.assert_frame_equal(d.to_pandas(), pdf)
    # every data column (no column key): cond staged BEFORE writes
    pdf, d = mk()
    pdf.loc[pdf["a"] > 3] = 0.0
    d.loc[d["a"] > 3] = 0.0
    pd.testing.assert_frame_equal(d.to_pandas(), pdf)
    # foreign boolean mask label-aligns; foreign Series value
    # aligns by index
    pdf, d = mk()
    fm = bl.DataFrame({"i": [40, 30, 20, 10],
                       "m": [True, False, False, True]}) \
        .set_index("i")["m"]
    pfm = pd.Series([True, False, False, True],
                    index=[40, 30, 20, 10])
    pdf.loc[pfm, "a"] = -5.0
    d.loc[fm, "a"] = -5.0
    fv = bl.DataFrame({"i": [30, 10], "v": [333.0, 111.0]}) \
        .set_index("i")["v"]
    pfv = pd.Series([333.0, 111.0], index=[30, 10])
    pdf.loc[pfm != pfm.min(), "b"] = pfv  # noqa: simple reuse
    pdf, d = mk()
    pdf.loc[pdf["a"] > 0, "a"] = pfv
    d.loc[d["a"] > 0, "a"] = fv
    pd.testing.assert_frame_equal(d.to_pandas(), pdf)
    # non-boolean label Series (distributed mark)
    pdf, d = mk()
    pdf.loc[pd.Series([20, 40]), "b"] = 1.5
    d.loc[bl.DataFrame({"x": [20, 40]})["x"], "b"] = 1.5
    pd.testing.assert_frame_equal(d.to_pandas(), pdf)
    # enlargement refused, boolean-list length checked
    pdf, d = mk()
    with pytest.raises(NotImplementedError, match="concat"):
        d.loc[99, "a"] = 1.0
    with pytest.raises(NotImplementedError, match="concat"):
        d.loc[[10, 99], "a"] = 1.0
    with pytest.raises(IndexError, match="wrong length"):
        d.loc[[True, False], "a"] = 1.0
    # mutation composes with later ops
    pdf, d = mk()
    d.loc[d["a"] > 1, "b"] = 2.0
    d["c"] = d["a"] + d["b"]
    pdf.loc[pdf["a"] > 1, "b"] = 2.0
    pdf["c"] = pdf["a"] + pdf["b"]
    pd.testing.assert_frame_equal(d.to_pandas(), pdf)


def test_at_assignment_r10(bl):
    """r10: df.at[label, col] = value — the scalar face of loc
    assignment (same enlargement refusal)."""
    import pandas as pd
    import pytest
    pdf = pd.DataFrame({"a": [1.0, 2, 3]},
                       index=pd.Index([10, 20, 30], name="i"))
    d = bl.DataFrame({"i": [10, 20, 30], "a": [1.0, 2, 3]}) \
        .set_index("i")
    pdf.at[20, "a"] = 9.5
    d.at[20, "a"] = 9.5
    pd.testing.assert_frame_equal(d.to_pandas(), pdf)
    assert d.at[20, "a"] == 9.5
    with pytest.raises(NotImplementedError, match="concat"):
        d.at[99, "a"] = 1.0
    with pytest.raises(TypeError):
        d.at[20] = 1.0


def test_loc_null_label_gates_r11(bl):
    """r11: the loc miss/enlargement gates are null-SAFE, agreeing
    with the eqNullSafe gather/mark joins — a None label PRESENT in
    the index is a hit (gather returns the row, assignment writes
    it), not a KeyError/enlargement refusal; an empty list selector
    is a no-op write (pandas parity)."""
    import numpy as np
    import pandas as pd
    import pytest

    idx = np.array(["a", "b", None, "d"], dtype=object)

    def mk():
        pdf = pd.DataFrame({"v": [1.0, 2, 3, 4]},
                           index=["a", "b", None, "d"])
        d = bl.DataFrame({"i": idx,
                          "v": np.array([1.0, 2, 3, 4])}) \
            .set_index("i")
        return pdf, d

    # label-Series gather with a null label present in the index
    pdf, d = mk()
    lab = bl.Series(np.array(["d", None, "a"], dtype=object))
    got = d.loc[lab]["v"].to_pandas().tolist()
    assert got == pdf.loc[pd.Series(["d", None, "a"])]["v"].tolist()
    with pytest.raises(KeyError):
        d.loc[bl.Series(np.array(["zz"], dtype=object))]

    # scalar-None and list-with-None assignment hit the null row
    pdf, d = mk()
    d.loc[None, "v"] = 9.0
    pdf.loc[[None], "v"] = 9.0
    assert d["v"].to_pandas().tolist() == pdf["v"].tolist()
    pdf, d = mk()
    d.loc[[None, "a"], "v"] = 7.0
    pdf.loc[[None, "a"], "v"] = 7.0
    assert d["v"].to_pandas().tolist() == pdf["v"].tolist()

    # empty-list selector: a no-op write, not a schema error
    pdf, d = mk()
    d.loc[[], "v"] = 99.0
    pdf.loc[[], "v"] = 99.0
    assert d["v"].to_pandas().tolist() == pdf["v"].tolist()

    # missing labels still refuse enlargement
    pdf, d = mk()
    with pytest.raises(NotImplementedError, match="concat"):
        d.loc[["zz"], "v"] = 1.0


def test_iloc_iat_assignment_r11(bl):
    """r11: the positional write faces — df.iloc[rows, cols] = v
    and df.iat[i, j] = v — compose over the loc-set projection via
    ordinal conditions (POS == i / isin / slice arithmetic, all JVM
    expressions, no collect). Rows: int/list/slice/boolean mask;
    cols: positional ints/slices (out-of-bounds IndexError, never
    enlargement). Same-frame Series values are a documented
    extension (row-for-row; pandas raises a shape mismatch);
    foreign Series and list values are refused with the loc
    spelling named."""
    import numpy as np
    import pandas as pd
    import pytest

    def mk():
        p = pd.DataFrame({"a": [1.0, 2, 3, 4, 5],
                          "b": [10.0, 20, 30, 40, 50]},
                         index=pd.Index(list("vwxyz"), name="i"))
        d = bl.DataFrame({"i": list("vwxyz"),
                          "a": [1.0, 2, 3, 4, 5],
                          "b": [10.0, 20, 30, 40, 50]}) \
            .set_index("i")
        return p, d

    cases = [
        ("int", lambda d: d.iloc.__setitem__((1, 0), 9.0)),
        ("neg", lambda d: d.iloc.__setitem__((-1, 1), 0.5)),
        ("iat", lambda d: d.iat.__setitem__((2, 1), -7.0)),
        ("list", lambda d: d.iloc.__setitem__(([0, 2], 1), 6.0)),
        ("slice", lambda d: d.iloc.__setitem__((slice(1, 3), 0),
                                               2.5)),
        ("step", lambda d: d.iloc.__setitem__(
            (slice(None, None, 2), 0), 3.5)),
        ("negstep", lambda d: d.iloc.__setitem__(
            (slice(None, None, -2), 1), 4.5)),
        ("mask", lambda d: d.iloc.__setitem__(
            ([True, False, True, False, True], 0), 8.0)),
        ("row", lambda d: d.iloc.__setitem__(2, 0.0)),
        ("empty", lambda d: d.iloc.__setitem__(([], 0), 77.0)),
    ]
    for tag, fn in cases:
        p, d = mk()
        fn(p); fn(d)
        pd.testing.assert_frame_equal(d.to_pandas(), p,
                                      obj=f"iloc set {tag}")

    # extension: same-frame Series value writes row-for-row
    _, d = mk()
    d.iloc[[0, 3], 0] = d["b"]
    assert d["a"].to_pandas().tolist() == [10.0, 2, 3, 40, 5]

    _, d = mk()
    with pytest.raises(IndexError):
        d.iloc[9, 0] = 1.0
    with pytest.raises(IndexError):
        d.iloc[0, 9] = 1.0
    with pytest.raises(NotImplementedError, match="loc"):
        d.iloc[[0, 1], 0] = [1.0, 2.0]
    with pytest.raises(NotImplementedError, match="loc"):
        d.iloc[[0, 1], 0] = bl.Series(np.array([1.0, 2.0]))
    with pytest.raises(TypeError):
        d.iloc[0, "a"] = 1.0
