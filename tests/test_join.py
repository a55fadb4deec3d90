"""Join tests (mirrors reference tests/core/test_join.py:11-93 —
partial key overlap exercising inner/left/right/outer null rows)."""

import numpy as np

from conftest import sorted_records


def recs(df):
    pdf = df.to_pandas().reset_index()
    return sorted(pdf.to_dict("records"),
                  key=lambda r: (r["a"] is None, str(r["a"])))


def test_merge_inner(df1, df2):
    out = recs(df1.merge(df2, how="inner", on="a"))
    assert [r["a"] for r in out] == [1, 3]
    assert [r["b_x"] for r in out] == [2.0, 4.0]
    assert [r["b_y"] for r in out] == [3.0, 4.0]
    assert [r["c"] for r in out] == [4, 5]


def test_merge_left_nulls(df1, df2):
    out = recs(df1.merge(df2, how="left", on="a"))
    assert [r["a"] for r in out] == [0, 1, 2, 3, 4]
    c = {r["a"]: r["c"] for r in out}
    assert c[1] == 4 and c[3] == 5
    assert np.isnan(c[0]) and np.isnan(c[2]) and np.isnan(c[4])


def test_merge_right(df1, df2):
    out = recs(df1.merge(df2, how="right", on="a"))
    assert [r["a"] for r in out] == [1, 3, 5]
    bx = {r["a"]: r["b_x"] for r in out}
    assert np.isnan(bx[5])


def test_merge_outer_coalesced_keys(df1, df2):
    out = recs(df1.merge(df2, how="outer", on="a"))
    assert [r["a"] for r in out] == [0, 1, 2, 3, 4, 5]


def test_merge_suffixes(df1, df2):
    out = df1.merge(df2, on="a", suffixes=("_l", "_r"))
    assert "b_l" in out.columns and "b_r" in out.columns


def test_merge_result_indexed_by_on(df1, df2):
    out = df1.merge(df2, on="a")
    assert out.index_names == ["a"]  # frame.py:904-906


def test_merge_unsorted_keys(bl, df2):
    # reference pre-sorts unsorted keys (frame.py:865-870); Catalyst
    # needs no precondition — verify same result from permuted input
    left = bl.DataFrame({"a": np.array([4, 0, 3, 1, 2], dtype=np.int64),
                         "b": np.array([5, 1, 4, 2, 3], dtype=np.float32)})
    out = recs(left.merge(df2, how="inner", on="a", is_on_sorted=False))
    assert [r["a"] for r in out] == [1, 3]
    assert [r["b_x"] for r in out] == [2.0, 4.0]


def test_join_on_index(bl):
    l = bl.DataFrame({"v": np.array([1., 2., 3.])},
                     index=np.array([0, 1, 2], dtype=np.int64))
    l = l.reset_index().rename({"index": "k"}).set_index("k")
    r = bl.DataFrame({"w": np.array([10., 20.])},
                     index=np.array([1, 2], dtype=np.int64))
    r = r.reset_index().rename({"index": "k"}).set_index("k")
    out = l.join(r, how="left").to_pandas().reset_index()
    out = sorted(out.to_dict("records"), key=lambda x: x["k"])
    assert [o["k"] for o in out] == [0, 1, 2]
    assert np.isnan(out[0]["w"]) and out[1]["w"] == 10.0


def test_broadcast_hint(df1, df2):
    # algorithm='hash' maps to a broadcast hint (SURVEY §2.3)
    out = df1.merge(df2, on="a", algorithm="hash")
    plan = out.to_spark()._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in plan


def test_merge_nan_keys_match_pandas(bl):
    """pandas matches NaN join keys to each other (hashtable
    semantics — the reference's sentinel keys behaved identically);
    a plain SQL equi-join silently drops those matches. The engine
    joins null-safe (<=>, still an equi-join for Catalyst)."""
    import numpy as np
    import pandas as pd
    lp = pd.DataFrame({"k": [1.0, np.nan, 2.0], "a": [10., 20., 30.]})
    rp = pd.DataFrame({"k": [np.nan, 2.0, 3.0], "b": [100., 200., 300.]})
    l = bl.DataFrame({"k": lp["k"].to_numpy(), "a": lp["a"].to_numpy()})
    r = bl.DataFrame({"k": rp["k"].to_numpy(), "b": rp["b"].to_numpy()})

    def nl(x):
        return None if (isinstance(x, float) and x != x) else x

    for how in ("inner", "left", "right", "outer"):
        got = sorted(((nl(x.k), nl(x.a), nl(x.b)) for x in
                      l.merge(r, on="k", how=how).to_pandas()
                      .reset_index().itertuples()), key=str)
        want = sorted(((nl(x.k), nl(x.a), nl(x.b)) for x in
                       lp.merge(rp, on="k", how=how).itertuples()),
                      key=str)
        assert got == want, how
    semi = sorted((nl(x.k) for x in l.merge(r, on="k", how="semi")
                   .to_pandas().reset_index().itertuples()), key=str)
    anti = [nl(x.k) for x in l.merge(r, on="k", how="anti")
            .to_pandas().reset_index().itertuples()]
    assert semi == [2.0, None] and anti == [1.0]


def test_merge_cross_and_series_concat(bl):
    """how='cross' (explicit cartesian, pandas both-side suffixes);
    bl.concat over Series."""
    import numpy as np
    import pandas as pd
    import pytest
    l = bl.DataFrame({"a": np.array([1, 2]), "b": np.array([9, 9])})
    r = bl.DataFrame({"b": np.array([3, 4])})
    g = l.merge(r, how="cross").to_pandas()
    w = pd.DataFrame({"a": [1, 2], "b": [9, 9]}).merge(
        pd.DataFrame({"b": [3, 4]}), how="cross")
    assert g.columns.tolist() == w.columns.tolist()
    assert sorted(map(tuple, g.values.tolist())) == \
        sorted(map(tuple, w.values.tolist()))
    with pytest.raises(ValueError, match="no join keys"):
        l.merge(r, how="cross", on="b")
    s = bl.concat([bl.Series(np.array([1., 2.])),
                   bl.Series(np.array([3.]))])
    assert sorted(s.to_pandas().tolist()) == [1.0, 2.0, 3.0]


def test_merge_index_keys(bl):
    """merge(left_index=/right_index=): materialized index columns
    become join keys through the existing key machinery; result is
    indexed by the keys like pandas."""
    import numpy as np
    import pandas as pd
    import pytest
    pl = pd.DataFrame({"k": [1, 2, 3], "v": [1., 2., 3.]}).set_index("k")
    pr = pd.DataFrame({"k": [2, 3, 4], "w": [8., 9., 7.]}).set_index("k")
    l = bl.DataFrame({"k": np.array([1, 2, 3]),
                      "v": np.array([1., 2., 3.])}).set_index("k")
    r = bl.DataFrame({"k": np.array([2, 3, 4]),
                      "w": np.array([8., 9., 7.])}).set_index("k")
    g = l.merge(r, left_index=True, right_index=True) \
        .to_pandas().sort_index()
    w = pl.merge(pr, left_index=True, right_index=True)
    assert g.values.tolist() == w.values.tolist()
    assert g.index.tolist() == w.index.tolist()
    l2 = bl.DataFrame({"a": np.array([2, 3]), "v": np.array([1., 2.])})
    g2 = l2.merge(r, left_on="a", right_index=True).to_pandas()
    assert sorted(g2["w"].tolist()) == [8.0, 9.0]
    with pytest.raises(ValueError, match="materialized"):
        l2.merge(r, left_index=True, right_index=True)
