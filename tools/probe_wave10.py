"""Adversarial pandas-parity probe wave 10: mature surfaces the
earlier waves haven't hit from these angles — pivot_table margins +
multi-agg + fill_value, stack/unstack round-trips, transpose dtypes,
merge suffixes/indicator edges, nlargest/nsmallest keep= ties,
explode empty-vs-null, rank pct with nulls, get_dummies prefix
collisions, Series.map defaults, concat axis=1 with unequal lengths,
combine_first overlaps, qcut duplicate edges, astype round-trips,
sample determinism contract, clip with Series bounds.

Run: python tools/probe_wave10.py — grep for 'PROBE DIFF'.
"""
import os
import sys

sys.path.insert(0, ".")
os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "8")

import numpy as np
import pandas as pd

import baloo_spark as bl


def eq(a, b):
    if isinstance(a, float) and isinstance(b, float):
        return (a != a and b != b) or abs(a - b) < 1e-9
    return a == b


def check(tag, ours, theirs):
    try:
        o, oerr = ours(), None
    except Exception as e:  # noqa: BLE001
        o, oerr = None, f"{type(e).__name__}: {e}"
    try:
        t, terr = theirs(), None
    except Exception as e:  # noqa: BLE001
        t, terr = None, f"{type(e).__name__}: {e}"
    if oerr or terr:
        if bool(oerr) != bool(terr):
            print(f"PROBE DIFF [{tag}] ours={oerr or o!r} "
                  f"pandas={terr or t!r}")
        return
    if isinstance(o, list) and isinstance(t, list):
        same = len(o) == len(t) and all(eq(x, y) for x, y in zip(o, t))
    else:
        same = eq(o, t)
    if not same:
        print(f"PROBE DIFF [{tag}] ours={o!r} pandas={t!r}")


mk = lambda pdf: bl.DataFrame({k: pdf[k].to_numpy() for k in pdf})

# ------------------------------------------------------- pivot_table
_pp = pd.DataFrame({"r": ["a", "a", "b", "b", "a"],
                    "c": ["x", "y", "x", "y", "x"],
                    "v": [1., 2., 3., 4., 5.]})
_bp = mk(_pp)
check("pivot_margins_all",
      lambda: _bp.pivot_table(values="v", index="r", columns="c",
                              aggfunc="sum", margins=True)
      .to_pandas()["All"].astype(float).tolist(),
      lambda: _pp.pivot_table(values="v", index="r", columns="c",
                              aggfunc="sum", margins=True)
      ["All"].astype(float).tolist())
check("pivot_fill_value",
      lambda: mk(pd.DataFrame({"r": ["a", "b"], "c": ["x", "y"],
                               "v": [1., 2.]}))
      .pivot_table(values="v", index="r", columns="c", aggfunc="sum",
                   fill_value=0).to_pandas()["y"].astype(float).tolist(),
      lambda: pd.DataFrame({"r": ["a", "b"], "c": ["x", "y"],
                            "v": [1., 2.]})
      .pivot_table(values="v", index="r", columns="c", aggfunc="sum",
                   fill_value=0)["y"].astype(float).tolist())
check("pivot_multi_agg_cols",
      lambda: sorted(_bp.pivot_table(values="v", index="r",
                                     columns="c",
                                     aggfunc=["sum", "mean"])
                     .to_pandas().columns.tolist()),
      lambda: sorted(f"{cv}_v_{a}" for a, cv in
                     _pp.pivot_table(values="v", index="r",
                                     columns="c",
                                     aggfunc=["sum", "mean"])
                     .columns.to_flat_index()))

# ------------------------------------------------- stack / transpose
check("stack_dropna_false_count",
      lambda: len(mk(pd.DataFrame({"x": [1., np.nan],
                                   "y": [3., 4.]}))
                  .stack(dropna=False).to_pandas()),
      lambda: len(pd.DataFrame({"x": [1., np.nan], "y": [3., 4.]})
                  .stack(future_stack=True)))
check("transpose_numeric",
      lambda: mk(pd.DataFrame({"x": [1., 2.], "y": [3., 4.]}))
      .transpose().to_pandas().values.tolist(),
      lambda: pd.DataFrame({"x": [1., 2.], "y": [3., 4.]})
      .transpose().values.tolist())

# ------------------------------------------------------------- merge
_l = pd.DataFrame({"k": [1, 2], "v": [1., 2.]})
_r = pd.DataFrame({"k": [2, 3], "v": [8., 9.]})
check("merge_suffixes",
      lambda: sorted(mk(_l).merge(mk(_r), on="k",
                                  suffixes=("_l", "_r"))
                     .to_pandas().columns.tolist()),
      lambda: sorted(_l.merge(_r, on="k",
                              suffixes=("_l", "_r")).columns.tolist()))
check("merge_indicator",
      lambda: sorted(mk(_l).merge(mk(_r), on="k", how="outer",
                                  indicator=True)
                     .to_pandas()["_merge"].astype(str).tolist()),
      lambda: sorted(_l.merge(_r, on="k", how="outer",
                              indicator=True)["_merge"]
                     .astype(str).tolist()))
check("merge_on_missing_col_raises",
      lambda: mk(_l).merge(mk(_r), on="zzz"),
      lambda: _l.merge(_r, on="zzz"))

# ---------------------------------------------- nlargest / nsmallest
_sv = [3., 1., 3., 2., np.nan]
check("nlargest_keep_first_ties",
      lambda: mk(pd.DataFrame({"v": _sv}))["v"].nlargest(2)
      .to_pandas().tolist(),
      lambda: pd.Series(_sv).nlargest(2).tolist())
check("nsmallest_more_than_nonnull",
      lambda: mk(pd.DataFrame({"v": [1., np.nan]}))["v"].nsmallest(3)
      .to_pandas().fillna(-9).tolist(),
      lambda: pd.Series([1., np.nan]).nsmallest(3).fillna(-9).tolist())

# ----------------------------------------------------------- explode
check("explode_empty_vs_null",
      lambda: mk(pd.DataFrame({"s": ["a-b", "", None]}))["s"]
      .str.rsplit("-").explode().to_pandas().fillna("-").tolist(),
      lambda: pd.Series(["a-b", "", None]).str.split("-")
      .explode().fillna("-").tolist())

# -------------------------------------------------------------- rank
check("rank_pct_with_nulls",
      lambda: mk(pd.DataFrame({"v": [1., np.nan, 2., 2.]}))["v"]
      .rank(pct=True).to_pandas().fillna(-9).tolist(),
      lambda: pd.Series([1., np.nan, 2., 2.]).rank(pct=True)
      .fillna(-9).tolist())
check("rank_descending_nulls",
      lambda: mk(pd.DataFrame({"v": [1., np.nan, 3.]}))["v"]
      .rank(ascending=False).to_pandas().fillna(-9).tolist(),
      lambda: pd.Series([1., np.nan, 3.]).rank(ascending=False)
      .fillna(-9).tolist())

# ------------------------------------------------------- get_dummies
check("get_dummies_prefix",
      lambda: sorted(bl.get_dummies(
          bl.Series(np.array(["a", "b"], dtype=object)),
          prefix="p").to_pandas().columns.tolist()),
      lambda: sorted(pd.get_dummies(pd.Series(["a", "b"]),
                                    prefix="p").columns.tolist()))

# --------------------------------------------------------------- map
check("map_missing_to_nan",
      lambda: mk(pd.DataFrame({"s": ["a", "z"]}))["s"]
      .map({"a": 1.0}).to_pandas().fillna(-9).tolist(),
      lambda: pd.Series(["a", "z"]).map({"a": 1.0})
      .fillna(-9).tolist())

# ------------------------------------------------------------ concat
check("concat_axis1_equal",
      lambda: bl.concat([mk(pd.DataFrame({"x": [1., 2.]})),
                         mk(pd.DataFrame({"y": [3., 4.]}))], axis=1)
      .to_pandas().values.tolist(),
      lambda: pd.concat([pd.DataFrame({"x": [1., 2.]}),
                         pd.DataFrame({"y": [3., 4.]})],
                        axis=1).values.tolist())
check("concat_axis1_unequal",
      lambda: bl.concat([mk(pd.DataFrame({"x": [1., 2., 3.]})),
                         mk(pd.DataFrame({"y": [7.]}))], axis=1)
      .to_pandas().fillna(-9).values.tolist(),
      lambda: pd.concat([pd.DataFrame({"x": [1., 2., 3.]}),
                         pd.DataFrame({"y": [7.]})], axis=1)
      .fillna(-9).values.tolist())

# ------------------------------------------------------ combine_first
check("combine_first_dtype",
      lambda: mk(pd.DataFrame({"v": [np.nan, 2.]}))["v"]
      .combine_first(mk(pd.DataFrame({"v": [10., 20.]}))["v"])
      .to_pandas().tolist(),
      lambda: pd.Series([np.nan, 2.])
      .combine_first(pd.Series([10., 20.])).tolist())

# -------------------------------------------------------------- qcut
check("qcut_duplicates_drop_small",
      lambda: bl.qcut(mk(pd.DataFrame({"v": [1., 1., 1., 2.]}))["v"],
                      4, labels=False, duplicates="drop")
      .to_pandas().fillna(-9).tolist(),
      lambda: pd.qcut(pd.Series([1., 1., 1., 2.]), 4, labels=False,
                      duplicates="drop").fillna(-9).tolist())

# ------------------------------------------------------------ astype
check("astype_float_to_int_trunc",
      lambda: mk(pd.DataFrame({"v": [1.9, -1.9]}))["v"]
      .astype("int64").to_pandas().tolist(),
      lambda: pd.Series([1.9, -1.9]).astype("int64").tolist())
check("astype_bool_strings",
      lambda: mk(pd.DataFrame({"v": [0., 2.]}))["v"]
      .astype("bool").to_pandas().tolist(),
      lambda: pd.Series([0., 2.]).astype("bool").tolist())

# -------------------------------------------------------------- clip
check("clip_series_bounds",
      lambda: (lambda d: d["v"].clip(lower=d["lo"]).to_pandas()
               .tolist())(mk(pd.DataFrame({"v": [1., 5.],
                                           "lo": [2., 1.]}))),
      lambda: (lambda d: d["v"].clip(lower=d["lo"]).tolist())(
          pd.DataFrame({"v": [1., 5.], "lo": [2., 1.]})))

# ----------------------------------------------------------- between
check("between_inclusive_neither",
      lambda: mk(pd.DataFrame({"v": [1., 2., 3.]}))["v"]
      .between(1., 3., inclusive="neither").to_pandas().tolist(),
      lambda: pd.Series([1., 2., 3.])
      .between(1., 3., inclusive="neither").tolist())

# ------------------------------------------------------------ sample
check("sample_frac_bounds",
      lambda: 0 <= len(mk(pd.DataFrame({"v": np.arange(100.)}))
                       .sample(frac=0.2).to_pandas()) <= 45,
      lambda: True)

print("probe wave 10 done")

# TRIAGE (r6):
# - combine_first: REAL GAP, fixed — Series.combine_first added
#   (full-outer pairwise alignment + coalesce; the frame face
#   already existed). tests/test_series.py pins it.
# - merge_suffixes 'k' column: DOCUMENTED DIVERGENCE — merge results
#   are indexed by the join keys (reference frame.py:904-906 parity);
#   pandas keeps the keys as data columns over a fresh RangeIndex.
#   Same data, different index presentation.
# - pivot_multi_agg_cols: PROBE ARTIFACT — the pandas-side unpack
#   assumed a 3-level flat index; single-values multi-agg gives
#   (aggfunc, pivotval) 2-tuples (fixed in the probe).
# - everything else (margins, fill_value, stack/transpose, merge
#   indicator/suffixes values, nlargest/nsmallest tie+NaN tails,
#   explode empty-vs-null, rank pct/desc with NULLs, get_dummies
#   prefix, map default, concat axis=1 unequal, qcut duplicates,
#   astype truncation/bool, clip Series bounds, between
#   inclusive='neither', sample bounds): PARITY CONFIRMED.
