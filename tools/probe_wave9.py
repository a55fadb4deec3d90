"""Adversarial pandas-parity probe wave 9 (VERDICT r5 Next #7):
session-5 additions under edge inputs — Index delegations + set
algebra (NaN, empties, duplicates), str.join/translate/repeat,
get_dummies (empty/all-NULL/dup labels), factorize, crosstab,
date_range / resample edges (empty ranges, tz-naive boundaries,
month ends), to_numeric raise, Series.repeat(0/1), idxmax string
index, mixed-frame mode.

Run: python tools/probe_wave9.py — grep for 'PROBE DIFF'.
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
        return (a != a and b != b) or a == b
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
mks = lambda vals: bl.Series(np.array(vals, dtype=object)
                             if any(isinstance(v, str)
                                    for v in vals if v == v)
                             else np.array(vals))

# ---------------------------------------------------------- Index ops
check("index_union_empty_other",
      lambda: bl.Index(np.array([2.0, 1.0])).union(
          bl.Index(np.array([], dtype=float))).values.tolist(),
      lambda: pd.Index([2.0, 1.0]).union(
          pd.Index([], dtype=float)).tolist())
check("index_intersection_disjoint",
      lambda: bl.Index(np.array([1, 2])).intersection(
          bl.Index(np.array([3, 4]))).values.tolist(),
      lambda: pd.Index([1, 2]).intersection(pd.Index([3, 4])).tolist())
check("index_difference_self",
      lambda: bl.Index(np.array([1, 2])).difference(
          bl.Index(np.array([1, 2]))).values.tolist(),
      lambda: pd.Index([1, 2]).difference(pd.Index([1, 2])).tolist())
check("index_union_dup_labels",  # documented distinct divergence:
      # pandas keeps max multiplicity; ours is distinct — compare sets
      lambda: sorted(set(bl.Index(np.array([1, 1, 2])).union(
          bl.Index(np.array([2, 3]))).values.tolist())),
      lambda: sorted(set(pd.Index([1, 1, 2]).union(
          pd.Index([2, 3])).tolist())))
check("index_min_max_allnan",
      lambda: bl.Index(np.array([np.nan, np.nan])).max(),
      lambda: pd.Index([np.nan, np.nan]).max())
check("index_argmax_ties",
      lambda: bl.Index(np.array([3, 3, 1])).argmax(),
      lambda: int(pd.Index([3, 3, 1]).argmax()))
check("index_nunique_nan",
      lambda: bl.Index(np.array([1.0, np.nan, 1.0])).nunique(),
      lambda: pd.Index([1.0, np.nan, 1.0]).nunique())

# ----------------------------------------------- str.join / translate
check("str_join_empty_arrays",
      lambda: mks(["", "x"]).str.rsplit("-").str.join("+")
      .to_pandas().tolist(),
      lambda: pd.Series(["", "x"]).str.rsplit("-").str.join("+")
      .tolist())
check("str_translate_empty_map",
      lambda: mks(["ab"]).str.translate({}).to_pandas().tolist(),
      lambda: pd.Series(["ab"]).str.translate(
          str.maketrans({})).tolist())
check("str_translate_null_target",
      lambda: mks(["a-b", None]).str.translate({"-": None})
      .to_pandas().tolist(),
      lambda: pd.Series(["a-b", None]).str.translate(
          str.maketrans({"-": None})).tolist())
check("series_repeat_zero_empty_input",
      lambda: bl.Series(np.array([], dtype=float)).repeat(0)
      .to_pandas().tolist(),
      lambda: pd.Series([], dtype=float).repeat(0).tolist())
check("series_repeat_negative_raises",
      lambda: mks(["a"]).repeat(-1),
      lambda: pd.Series(["a"]).repeat(-1))

# ------------------------------------------------------- get_dummies
check("get_dummies_all_null",
      lambda: bl.get_dummies(mks([None, None])).to_pandas()
      .columns.tolist(),
      lambda: pd.get_dummies(pd.Series([None, None], dtype=object))
      .columns.tolist())
check("get_dummies_dummy_na_vals",
      lambda: bl.get_dummies(mks(["a", None]), dummy_na=True)
      .to_pandas().astype(int).values.tolist(),
      lambda: pd.get_dummies(pd.Series(["a", None]), dummy_na=True)
      .astype(int).values.tolist())
check("get_dummies_single_value",
      lambda: bl.get_dummies(mks(["x", "x"])).to_pandas()
      .astype(int)["x"].tolist(),
      lambda: pd.get_dummies(pd.Series(["x", "x"]))
      .astype(int)["x"].tolist())

# --------------------------------------------------------- factorize
check("factorize_all_null",
      lambda: bl.factorize(mks([None, None]))[0].to_pandas().tolist(),
      lambda: list(pd.factorize(pd.Series([None, None]),
                                sort=True)[0]))
check("factorize_single",
      lambda: (lambda c, u: (c.to_pandas().tolist(), list(u)))(
          *bl.factorize(mks(["z", "z"]))),
      lambda: (lambda c, u: (list(c), list(u)))(
          *pd.factorize(pd.Series(["z", "z"]), sort=True)))

# ---------------------------------------------------------- crosstab
check("crosstab_basic",
      lambda: bl.crosstab(mks(["a", "a", "b"]).rename("r"),
                          mks(["x", "y", "x"]).rename("c"))
      .to_pandas().values.tolist(),
      lambda: pd.crosstab(pd.Series(["a", "a", "b"], name="r"),
                          pd.Series(["x", "y", "x"], name="c"))
      .values.tolist())
check("crosstab_with_nulls",  # pandas drops NaN keys from both axes
      lambda: bl.crosstab(mks(["a", None, "b"]).rename("r"),
                          mks(["x", "y", None]).rename("c"))
      .to_pandas().values.tolist(),
      lambda: pd.crosstab(pd.Series(["a", None, "b"], name="r"),
                          pd.Series(["x", "y", None], name="c"))
      .values.tolist())

# -------------------------------------------------------- date_range
check("date_range_periods",
      lambda: [str(x)[:10] for x in bl.date_range(
          "2024-01-30", periods=3, freq="D").to_pandas().tolist()],
      lambda: [str(x)[:10] for x in pd.date_range(
          "2024-01-30", periods=3, freq="D").tolist()])
check("date_range_single_period",
      lambda: len(bl.date_range("2024-01-01", periods=1,
                                freq="D").to_pandas()),
      lambda: len(pd.date_range("2024-01-01", periods=1, freq="D")))
check("date_range_end_before_start",
      lambda: len(bl.date_range("2024-02-01", end="2024-01-01",
                                freq="D").to_pandas()),
      lambda: len(pd.date_range("2024-02-01", "2024-01-01",
                                freq="D")))
check("date_range_hourly_dst_naive",
      lambda: [str(x) for x in bl.date_range(
          "2024-03-10 00:00", periods=4, freq="H")
          .to_pandas().tolist()],
      lambda: [str(x) for x in pd.date_range(
          "2024-03-10 00:00", periods=4, freq="h").tolist()])
check("date_range_month_end",
      lambda: [str(x)[:10] for x in bl.date_range(
          "2024-01-31", periods=3, freq="M").to_pandas().tolist()],
      lambda: [str(x)[:10] for x in pd.date_range(
          "2024-01-31", periods=3, freq="ME").tolist()])

# ---------------------------------------------------------- resample
_pr = pd.DataFrame({
    "t": pd.to_datetime(["2024-01-01 00:05", "2024-01-01 00:20",
                         "2024-01-01 01:10", "2024-01-03 09:00"]),
    "v": [1.0, 2.0, 4.0, 8.0]})
_br = mk(_pr)
check("resample_hour_sum",  # both sides emit 0.0 for empty buckets
      lambda: sorted(_br.resample("1 hour", on="t").sum()
                     .to_pandas()["v"].fillna(0).tolist()),
      lambda: sorted(_pr.resample("h", on="t").sum()["v"].tolist()))
check("resample_day_mean",
      lambda: sorted(_br.resample("1 day", on="t").mean()
                     .to_pandas()["v"].dropna().tolist()),
      lambda: sorted(_pr.resample("D", on="t").mean()
                     ["v"].dropna().tolist()))

# -------------------------------------- r6 regression probes (fixed)
check("to_numeric_raise_clean",
      lambda: bl.to_numeric(mks(["1", "2"]), errors="raise")
      .to_pandas().tolist(),
      lambda: pd.to_numeric(pd.Series(["1", "2"]),
                            errors="raise").astype(float).tolist())
check("to_numeric_raise_dirty",
      lambda: bl.to_numeric(mks(["1", "x"]), errors="raise"),
      lambda: pd.to_numeric(pd.Series(["1", "x"]), errors="raise"))
check("idxmax_string_index",
      lambda: mk(pd.DataFrame({"n": ["a", "b"], "v": [1., 9.]}))
      .set_index("n").idxmax().to_pandas().tolist(),
      lambda: pd.DataFrame({"n": ["a", "b"], "v": [1., 9.]})
      .set_index("n").idxmax().tolist())
check("mode_mixed_dtypes",
      lambda: mk(pd.DataFrame({"x": [1, 1], "s": ["a", "b"]}))
      .mode().to_pandas()["x"].tolist(),
      lambda: pd.DataFrame({"x": [1, 1], "s": ["a", "b"]})
      .mode()["x"].tolist())

print("probe wave 9 done")

# TRIAGE (r6):
# - crosstab_with_nulls: REAL BUG, fixed — pandas drops observations
#   where either key is missing; Spark's stat.crosstab emitted a
#   'null' row/column (gate added in bl.crosstab).
# - date_range_month_end: REAL GAP, fixed — calendar frequencies
#   ME/M/MS/YE/Y/A/YS (+ integer multiples) now run as add_months
#   off a pandas-anchored first tick; 16-case parity pinned in
#   tests/test_datetime_ops.py.
# - resample_hour_sum: PROBE ARTIFACT — both sides emit 0.0 for
#   empty buckets; the probe filtered them asymmetrically (fixed).
# - index_union_empty_other: DOCUMENTED DIVERGENCE — pandas skips
#   sorting when either input is empty (returns self's order); the
#   engine's set algebra always sorts (indexes.py _set_op docstring).
# - index_min_max_allnan: DOCUMENTED DIVERGENCE — reference
#   semantics return NULL (None) for empty/all-null min/max/mean
#   (tests/test_empty.py pins the reference's test_empty.py); pandas
#   returns nan. Same missing value under the sentinel codec.
