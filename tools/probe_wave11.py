"""Adversarial pandas-parity probe wave 11: the r6 additions under
their own edge inputs — calendar date_range (leap anchors, Feb-29
starts, end exactly on a tick, Dec->Jan wrap, periods=0/1), calendar
resample (single month, year wrap, pre-epoch), ewm moments (constant
series, all-null, single obs, min_periods > n), ewm(adjust=False)
(single row, leading nulls only), combine_first (empty other,
all-null self), crosstab (all keys null), repeat (large factor),
to_numeric raise on already-numeric input.

Run: python tools/probe_wave11.py — grep for 'PROBE DIFF'.
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


def dr(ours_kw, pd_kw=None):
    a = [str(x) for x in bl.date_range(**ours_kw).to_pandas().tolist()]
    b = [str(x) for x in pd.date_range(**(pd_kw or ours_kw)).tolist()]
    return a, b


# ------------------------------------------------ calendar date_range
for tag, okw, pkw in [
    ("dr_feb29_ME", dict(start="2024-02-29", periods=3, freq="ME"), None),
    ("dr_feb29_MS", dict(start="2024-02-29", periods=2, freq="MS"), None),
    ("dr_leap_YE_from_feb29", dict(start="2024-02-29", periods=2,
                                   freq="YE"), None),
    ("dr_dec_to_jan_MS", dict(start="2023-12-15", periods=3,
                              freq="MS"), None),
    ("dr_end_on_tick_ME", dict(start="2024-01-01", end="2024-02-29",
                               freq="ME"), None),
    ("dr_end_between_ticks", dict(start="2024-01-01", end="2024-03-15",
                                  freq="ME"), None),
    ("dr_periods_zero_W", dict(start="2024-01-01", end="2023-12-01",
                               freq="W"), None),
    ("dr_jan31_MS_rolls", dict(start="2024-12-31", periods=2,
                               freq="MS"), None),
    ("dr_W_sun_start", dict(start="2024-01-07", periods=2,
                            freq="W"), None),
    ("dr_4M_mult", dict(start="2024-01-10", periods=3, freq="4ME"),
     dict(start="2024-01-10", periods=3, freq="4ME")),
]:
    check(tag, lambda okw=okw: dr(okw, pkw)[0],
          lambda okw=okw: dr(okw, pkw)[1])

# ---------------------------------------------------- calendar resample
_ts = pd.to_datetime(["2023-11-20", "2024-01-02"])
_pr = pd.DataFrame({"t": _ts, "v": [1.0, 2.0]})
_br = mk(_pr)
check("resample_year_wrap_ME",
      lambda: [str(x) for x in _br.resample("ME", on="t").sum()
               .to_pandas().reset_index()["t"].tolist()],
      lambda: [str(x) for x in _pr.resample("ME", on="t").sum()
               .reset_index()["t"].tolist()])
check("resample_single_month",
      lambda: mk(pd.DataFrame({"t": pd.to_datetime(["2024-03-05",
                                                    "2024-03-20"]),
                               "v": [1.0, 2.0]}))
      .resample("MS", on="t").sum().to_pandas()["v"].tolist(),
      lambda: pd.DataFrame({"t": pd.to_datetime(["2024-03-05",
                                                 "2024-03-20"]),
                            "v": [1.0, 2.0]})
      .resample("MS", on="t").sum()["v"].tolist())
check("resample_pre_epoch_ME",
      lambda: [str(x) for x in mk(pd.DataFrame(
          {"t": pd.to_datetime(["1969-11-05", "1970-01-20"]),
           "v": [1.0, 2.0]})).resample("ME", on="t").sum()
          .to_pandas().reset_index()["t"].tolist()],
      lambda: [str(x) for x in pd.DataFrame(
          {"t": pd.to_datetime(["1969-11-05", "1970-01-20"]),
           "v": [1.0, 2.0]}).resample("ME", on="t").sum()
          .reset_index()["t"].tolist()])

# -------------------------------------------------------- ewm moments
def ewm_case(tag, vals, kw, stat, skw={}):
    check(tag,
          lambda: getattr(bl.Series(np.array(vals, dtype=float))
                          .ewm(**kw), stat)(**skw)
          .to_pandas().fillna(-9).tolist(),
          lambda: getattr(pd.Series(vals).ewm(**kw), stat)(**skw)
          .fillna(-9).tolist())


ewm_case("ewm_var_constant", [5.0] * 6, dict(alpha=0.4), "var")
ewm_case("ewm_std_constant", [5.0] * 6, dict(alpha=0.4), "std")
ewm_case("ewm_var_single", [3.0], dict(alpha=0.4), "var")
ewm_case("ewm_sum_single", [3.0], dict(alpha=0.4), "sum")
ewm_case("ewm_var_allnull", [np.nan] * 4, dict(alpha=0.4), "var")
ewm_case("ewm_sum_allnull", [np.nan] * 4, dict(alpha=0.4), "sum")
ewm_case("ewm_var_mp_gt_n", [1.0, 2.0], dict(alpha=0.4,
                                             min_periods=5), "var")
ewm_case("ewm_mean_noadj_single", [3.0],
         dict(alpha=0.4, adjust=False), "mean")
ewm_case("ewm_mean_noadj_leadnull", [np.nan, np.nan, 2.0],
         dict(alpha=0.4, adjust=False), "mean")
ewm_case("ewm_mean_noadj_allnull", [np.nan] * 3,
         dict(alpha=0.4, adjust=False), "mean")
ewm_case("ewm_var_two_vals", [1.0, 2.0], dict(alpha=0.9), "var")

# ------------------------------------------------------ combine_first
check("combine_first_empty_other",
      lambda: bl.Series(np.array([1.0, np.nan])).combine_first(
          bl.Series(np.array([], dtype=float)))
      .to_pandas().fillna(-9).tolist(),
      lambda: pd.Series([1.0, np.nan]).combine_first(
          pd.Series([], dtype=float)).fillna(-9).tolist())
check("combine_first_allnull_self",
      lambda: bl.Series(np.array([np.nan, np.nan])).combine_first(
          bl.Series(np.array([7.0, 8.0]))).to_pandas().tolist(),
      lambda: pd.Series([np.nan, np.nan]).combine_first(
          pd.Series([7.0, 8.0])).tolist())

# ----------------------------------------------------------- crosstab
check("crosstab_all_null_keys",
      lambda: bl.crosstab(
          bl.Series(np.array([None, None], dtype=object)).rename("r"),
          bl.Series(np.array(["x", "y"], dtype=object)).rename("c"))
      .to_pandas().shape[0],
      lambda: pd.crosstab(pd.Series([None, None], name="r"),
                          pd.Series(["x", "y"], name="c")).shape[0])

# ------------------------------------------------------------- repeat
check("repeat_large_factor",
      lambda: bl.Series(np.array(["a"], dtype=object)).repeat(1000)
      .to_pandas().tolist() == ["a"] * 1000,
      lambda: True)

# --------------------------------------------------------- to_numeric
check("to_numeric_raise_numeric_input",
      lambda: bl.to_numeric(bl.Series(np.array([1.5, np.nan])),
                            errors="raise").to_pandas()
      .fillna(-9).tolist(),
      lambda: pd.to_numeric(pd.Series([1.5, np.nan]),
                            errors="raise").fillna(-9).tolist())

print("probe wave 11 done")

# TRIAGE (r6):
# - ewm_std_constant: REAL BUG, fixed — the sum-of-squares form left
#   ~1e-14 relative cancellation residue (-> 1e-7 std) on constant
#   windows where pandas' recurrence keeps exact 0; with_ewm_stats
#   now clamps biased variance below 1e-12 * E[x^2] to zero.
# - all other 26 probes (leap/Feb-29/year-wrap calendar anchors,
#   end-on-tick counting, pre-epoch resample, single/constant/
#   all-null/min_periods ewm edges, combine_first empties, all-null
#   crosstab keys, repeat fan-out, to_numeric raise on numeric):
#   PARITY CONFIRMED on first run.
