"""MultiIndex parity with the reference.

Mirrors /root/reference/tests/core/indexes/test_multi.py (construction,
filter, slice, dropna, to_pandas) and the df2-joins-on-MultiIndex
fixture (/root/reference/tests/conftest.py:98-103 used throughout
tests/core/test_join.py): a frame indexed by a 2-level MultiIndex with
a string level participates in merges — joined levels become the
result's index, non-joined levels demote to data columns.
"""

import numpy as np
import pandas as pd
import pytest

from baloo_spark.core.indexes import Index, MultiIndex


@pytest.fixture(scope="module")
def mi():
    return MultiIndex([np.arange(1, 6, dtype=np.float32),
                       Index(np.arange(5), np.dtype(np.int64))],
                      names=["i1", "i2"])


# ------------------------------------------------------- driver-side API


def test_construction(mi):
    assert mi.names == ["i1", "i2"]
    assert len(mi) == 5
    assert mi.dtypes == [np.dtype(np.float32), np.dtype(np.int64)]
    assert not mi.empty


def test_mismatched_names_raises():
    with pytest.raises(ValueError):
        MultiIndex([[1, 2], [3, 4]], names=["only_one"])


def test_mismatched_lengths_raises():
    with pytest.raises(ValueError):
        MultiIndex([[1, 2, 3], [4, 5]])


def test_filter(mi):
    out = mi[np.array([False, True, True, False, False])]
    assert out.values[0].values.tolist() == [2.0, 3.0]
    assert out.values[1].values.tolist() == [1, 2]
    assert out.names == ["i1", "i2"]


def test_slice(mi):
    out = mi[1:3]
    assert out.values[0].values.tolist() == [2.0, 3.0]
    assert out.values[1].values.tolist() == [1, 2]


def test_dropna():
    # reference test_multi.py:52-58 (−999 sentinel there, real NaN here)
    m = MultiIndex([[0.0, np.nan, 2.0, np.nan],
                    Index(np.array([1.0, np.nan, np.nan, 3.0]))])
    out = m.dropna()
    assert len(out) == 1
    assert out.values[0].values.tolist() == [0.0]
    assert out.values[1].values.tolist() == [1.0]


def test_pandas_round_trip(mi):
    pmi = mi.to_pandas()
    assert isinstance(pmi, pd.MultiIndex)
    assert list(pmi.names) == ["i1", "i2"]
    back = MultiIndex.from_pandas(pmi)
    assert back.names == ["i1", "i2"]
    assert back.values[0].values.tolist() == mi.values[0].values.tolist()


def test_unnamed_levels_get_level_names():
    m = MultiIndex([[1, 2], [3, 4]])
    assert m._level_names() == ["level_0", "level_1"]


# ----------------------------------------------------- wired into frames


@pytest.fixture(scope="module")
def df2(bl):
    # conftest.py:98-103 (bytes level -> str here: Spark's native string
    # type is what a parquet/UTF-8 pipeline produces)
    return bl.DataFrame(
        {"b": np.arange(3, 6, dtype=np.float32), "c": np.arange(4, 7)},
        index=MultiIndex([np.array([1, 3, 5]),
                          Index(np.array(["abc", "def", "efgh"]))],
                         ["a", "d"]))


@pytest.fixture(scope="module")
def df1(bl):
    # conftest.py:94-95: data cols a,b over an anonymous index
    return bl.DataFrame({"a": np.arange(5),
                         "b": np.arange(1, 6, dtype=np.float32)},
                        index=np.arange(2, 7))


def test_frame_constructed_with_multiindex(df2):
    assert df2.index_names == ["a", "d"]
    pdf = df2.to_pandas()
    assert isinstance(pdf.index, pd.MultiIndex)
    assert list(pdf.index.names) == ["a", "d"]
    assert sorted(pdf.index.tolist()) == [(1, "abc"), (3, "def"),
                                          (5, "efgh")]


def test_frame_index_property(bl, df2):
    ix = df2.index
    assert isinstance(ix, MultiIndex)
    assert ix.names == ["a", "d"]
    # lazy fetch happens here
    assert sorted(ix.values[0].values.tolist()) == [1, 3, 5]


def test_set_index_list_gives_multiindex(bl):
    df = bl.DataFrame({"x": [1, 2, 3], "y": ["a", "b", "c"],
                       "v": [10.0, 20.0, 30.0]})
    out = df.set_index(["x", "y"])
    assert isinstance(out.index, MultiIndex)
    pdf = out.to_pandas()
    assert isinstance(pdf.index, pd.MultiIndex)
    assert pdf.loc[(2, "b"), "v"] == 20.0


def test_merge_on_one_level_demotes_other(df1, df2):
    # reference test_join.py:12-20: merge on 'a' -> index becomes
    # Index('a'); df2's other level 'd' survives as a DATA column and
    # df1's anonymous index surfaces as the 'index' column
    out = df1.merge(df2, on="a")
    assert out.index_names == ["a"]
    pdf = out.to_pandas().sort_index()
    assert "d" in pdf.columns and "index" in pdf.columns
    assert pdf.index.tolist() == [1, 3]
    assert pdf["d"].tolist() == ["abc", "def"]
    assert pdf["index"].tolist() == [3, 5]
    assert pdf["b_x"].tolist() == [2.0, 4.0]
    assert pdf["b_y"].tolist() == [3.0, 4.0]
    assert pdf["c"].tolist() == [4, 5]


def test_merge_on_two_keys_gives_multiindex(df1, df2):
    # reference test_join.py:22-29: merge on ['a','b'] -> MultiIndex
    out = df1.merge(df2, on=["a", "b"], is_on_sorted=True)
    assert out.index_names == ["a", "b"]
    assert isinstance(out.index, MultiIndex)
    pdf = out.to_pandas()
    assert isinstance(pdf.index, pd.MultiIndex)
    assert pdf.index.tolist() == [(3, 4.0)]
    assert pdf["d"].tolist() == ["def"]
    assert pdf["c"].tolist() == [5]


def test_merge_left_on_multiindex_level(df1, df2):
    # reference test_join.py:31-40 shape (nulls instead of −999)
    out = df1.merge(df2, on="a", how="left")
    pdf = out.to_pandas().sort_index()
    assert pdf.index.tolist() == [0, 1, 2, 3, 4]
    assert pdf["d"].fillna("None").tolist() == \
        ["None", "abc", "None", "def", "None"]


def test_from_pandas_multiindex_frame(bl):
    pdf = pd.DataFrame({"v": [1.0, 2.0, 3.0]},
                       index=pd.MultiIndex.from_arrays(
                           [[1, 2, 3], ["x", "y", "z"]],
                           names=["k1", "k2"]))
    df = bl.DataFrame(pdf)
    assert df.index_names == ["k1", "k2"]
    back = df.to_pandas().sort_index()
    assert isinstance(back.index, pd.MultiIndex)
    assert back.loc[(2, "y"), "v"] == 2.0


def test_swaplevel_droplevel(bl):
    """MultiIndex level reorder/removal — pure metadata, no job."""
    import numpy as np
    import pandas as pd
    import pytest
    p = pd.DataFrame({"a": ["x", "y"], "b": [1, 2],
                      "v": [10., 20.]}).set_index(["a", "b"])
    d = bl.DataFrame({"a": np.array(["x", "y"], dtype=object),
                      "b": np.array([1, 2]),
                      "v": np.array([10., 20.])}).set_index(["a", "b"])
    assert d.swaplevel().to_pandas().index.names == \
        list(p.swaplevel().index.names)
    assert d.droplevel(0).to_pandas().index.name == "b"
    assert d.droplevel("b").to_pandas().index.name == "a"
    with pytest.raises(KeyError):
        d.droplevel("zz")
    with pytest.raises(ValueError, match="only index level"):
        d.droplevel(0).droplevel(0)


def test_xs_level_matches_pandas(bl):
    """r10: xs(key, level=) is a DISTRIBUTED filter on that index
    level with the level dropped — pandas shape (always a frame,
    duplicate labels included), KeyError on a miss, TypeError on a
    non-MultiIndex, drop_level=False keeps the level."""
    import numpy as np
    import pandas as pd
    import pytest
    mi = pd.MultiIndex.from_tuples(
        [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (2, "a")],
        names=["x", "y"])
    pdf = pd.DataFrame({"v": [10.0, 20, 30, 40, 50],
                        "w": [1.0, 2, 3, 4, 5]}, index=mi)
    d = bl.DataFrame({"x": [1, 1, 2, 2, 2], "y": list("ababa"),
                      "v": [10.0, 20, 30, 40, 50],
                      "w": [1.0, 2, 3, 4, 5]}).set_index(["x", "y"])
    for lvl in ("y", 1, -1):
        got = d.xs("a", level=lvl).to_pandas()
        want = pdf.xs("a", level=lvl)
        pd.testing.assert_frame_equal(got, want)
    got = d.xs(1, level="x").to_pandas()
    pd.testing.assert_frame_equal(got, pdf.xs(1, level="x"))
    got = d.xs("b", level="y", drop_level=False).to_pandas()
    pd.testing.assert_frame_equal(
        got, pdf.xs("b", level="y", drop_level=False))
    # series face: always a Series, duplicates included
    got = d["v"].xs("a", level="y").to_pandas()
    pd.testing.assert_series_equal(got, pdf["v"].xs("a", level="y"))
    with pytest.raises(KeyError):
        d.xs("zzz", level="y")
    with pytest.raises(KeyError, match="not found"):
        d.xs("a", level="nope")
    with pytest.raises(IndexError):
        d.xs("a", level=5)
    single = bl.DataFrame({"i": [1, 2], "v": [1.0, 2.0]}) \
        .set_index("i")
    with pytest.raises(TypeError, match="MultiIndex"):
        single.xs(1, level="i")
    with pytest.raises(TypeError, match="MultiIndex"):
        single["v"].xs(1, level=0)


def test_xs_level_list_matches_pandas(bl):
    """r10: xs with a LIST of levels filters on all of them and
    drops them — unless every level would be consumed, where pandas
    keeps the full index (quirk, pinned by parity)."""
    import pandas as pd
    import pytest
    mi = pd.MultiIndex.from_tuples(
        [(1, "a", "p"), (1, "b", "q"), (2, "a", "p"),
         (2, "a", "r")], names=["x", "y", "z"])
    pdf = pd.DataFrame({"v": [1.0, 2, 3, 4]}, index=mi)
    d = bl.DataFrame({"x": [1, 1, 2, 2], "y": list("abaa"),
                      "z": list("pqpr"), "v": [1.0, 2, 3, 4]}) \
        .set_index(["x", "y", "z"])
    pd.testing.assert_frame_equal(
        d.xs(("a", 1), level=["y", "x"]).to_pandas(),
        pdf.xs(("a", 1), level=["y", "x"]))
    pd.testing.assert_frame_equal(
        d.xs((1, "a"), level=[0, 1]).to_pandas(),
        pdf.xs((1, "a"), level=[0, 1]))
    # every level consumed -> full index kept (pandas quirk)
    got = d.xs((1, "a", "p"), level=["x", "y", "z"]).to_pandas()
    pd.testing.assert_frame_equal(
        got, pdf.xs((1, "a", "p"), level=["x", "y", "z"]))
    with pytest.raises(ValueError, match="same length"):
        d.xs(("a",), level=["y", "x"])
    with pytest.raises(KeyError):
        d.xs(("zz", 1), level=["y", "x"])


def test_xs_no_level_multiindex_r11(bl):
    """r11: xs WITHOUT level= on a MultiIndex consumes the first
    len(key) levels (scalar key = level 0) through the distributed
    level path — drop_level honored, full-consumption keeps the
    whole index, KeyError on a miss; on a FLAT index drop_level is
    a pandas no-op (probed) and the row-fetch shape stands."""
    import pandas as pd
    import pytest
    mi = pd.MultiIndex.from_tuples(
        [("a", 1), ("a", 2), ("b", 2), ("b", 2)], names=["u", "w"])
    pdf = pd.DataFrame({"x": [1.0, 2, 3, 4]}, index=mi)
    d = bl.DataFrame({"u": list("aabb"), "w": [1, 2, 2, 2],
                      "x": [1.0, 2, 3, 4]}).set_index(["u", "w"])
    pd.testing.assert_frame_equal(d.xs("a").to_pandas(),
                                  pdf.xs("a"))
    pd.testing.assert_frame_equal(
        d.xs("a", drop_level=False).to_pandas(),
        pdf.xs("a", drop_level=False))
    pd.testing.assert_frame_equal(d.xs(("a", 1)).to_pandas(),
                                  pdf.xs(("a", 1)))
    pd.testing.assert_frame_equal(d.xs(("b", 2)).to_pandas(),
                                  pdf.xs(("b", 2)))
    # Series face
    pd.testing.assert_series_equal(d["x"].xs("a").to_pandas(),
                                   pdf["x"].xs("a"))
    pd.testing.assert_series_equal(
        d["x"].xs(("a", 1), drop_level=False).to_pandas(),
        pdf["x"].xs(("a", 1), drop_level=False))
    with pytest.raises(KeyError):
        d.xs("zz")
    # PINNED: full-tuple xs on a globally-UNIQUE MultiIndex keeps
    # the level-path frame shape (pandas returns a row Series
    # there, but deciding uniqueness is a global job — the frame
    # shape is pandas' own non-unique and level=-face behavior)
    du = bl.DataFrame({"u": list("abcd"), "w": [1, 2, 3, 4],
                       "x": [1.0, 2, 3, 4]}).set_index(["u", "w"])
    got = du.xs(("a", 1)).to_pandas()
    assert list(got.index.names) == ["u", "w"]   # full index kept
    assert got["x"].tolist() == [1.0]
    # flat index: drop_level is a no-op, scalar/row fetch stands
    pflat = pd.DataFrame({"x": [1.0, 2]}, index=["a", "b"])
    bflat = bl.DataFrame({"i": ["a", "b"], "x": [1.0, 2]}) \
        .set_index("i")
    assert (bflat.xs("b", drop_level=False)["x"]
            == pflat.xs("b", drop_level=False)["x"])
    assert (bflat["x"].xs("b", drop_level=False)
            == pflat["x"].xs("b", drop_level=False))
