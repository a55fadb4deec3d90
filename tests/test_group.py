"""GroupBy tests (mirrors reference tests/core/test_group.py:10-56;
order-insensitive comparison, reference output order is arbitrary)."""

import numpy as np
import pytest


def by_key(df, key="b"):
    pdf = df.to_pandas().reset_index()
    return {r[key]: r for r in pdf.to_dict("records")}


def test_groupby_sum(df_dupl):
    g = by_key(df_dupl.groupby("b").sum())
    assert g[4]["c"] == 1.0 and g[5]["c"] == 5.0 and g[6]["c"] == 9.0


def test_groupby_mean_var_std(df_dupl):
    g = by_key(df_dupl.groupby("b").mean())
    assert g[5]["c"] == 2.5 and g[6]["c"] == 4.5
    v = by_key(df_dupl.groupby("b").var())
    assert v[5]["c"] == pytest.approx(0.5)  # sample var
    s = by_key(df_dupl.groupby("b").std())
    assert s[5]["c"] == pytest.approx(np.sqrt(0.5))


def test_groupby_min_max_prod(df_dupl):
    assert by_key(df_dupl.groupby("b").min())[5]["c"] == 2.0
    assert by_key(df_dupl.groupby("b").max())[5]["c"] == 3.0
    assert by_key(df_dupl.groupby("b").prod())[6]["c"] == 20.0


def test_groupby_size(df_dupl):
    g = by_key(df_dupl.groupby("b").size())
    assert g[4]["size"] == 1 and g[5]["size"] == 2 and g[6]["size"] == 2


def test_groupby_multikey(df_dupl):
    out = df_dupl.groupby(["a", "b"]).sum().to_pandas().reset_index()
    assert len(out) == 4
    row = out[(out["a"] == 1.0) & (out["b"] == 5)].iloc[0]
    assert row["c"] == 5.0


def test_groupby_keys_become_index(df_dupl):
    out = df_dupl.groupby(["a", "b"]).sum()
    assert out.index_names == ["a", "b"]


def test_groupby_agg_dict(df_dupl):
    out = df_dupl.groupby("b").agg({"c": ["sum", "mean"]}).to_pandas().reset_index()
    row = out[out["b"] == 5].iloc[0]
    assert row["c_sum"] == 5.0 and row["c_mean"] == 2.5


def test_groupby_all_columns_raises(df_dupl, bl):
    with pytest.raises(ValueError):
        df_dupl.groupby(["a", "b", "c"])  # frame.py:1092-1093
