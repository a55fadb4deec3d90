"""Adversarial pandas-parity probe wave 6: arithmetic zero-division /
pow / mod sign edges, the r5 reshape surfaces (pivot_table, stack,
unstack, update, interpolate, explode) under nulls/duplicates/inf,
concat column mismatches, astype failure modes, bool cumulative ops.

Run: python tools/probe_wave6.py  — grep output for 'PROBE DIFF'.
Triage each DIFF as real-bug / documented-divergence / probe-artifact
before touching code (sentinel codec: NaN==NULL is intentional).
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
        o = ours()
        oerr = None
    except Exception as e:  # noqa: BLE001
        o, oerr = None, f"{type(e).__name__}: {e}"
    try:
        t = theirs()
        terr = None
    except Exception as e:  # noqa: BLE001
        t, terr = None, f"{type(e).__name__}: {e}"
    if oerr or terr:
        if bool(oerr) != bool(terr):
            print(f"PROBE DIFF [{tag}] ours={oerr or o!r} pandas={terr or t!r}")
        return
    if isinstance(o, list) and isinstance(t, list):
        same = len(o) == len(t) and all(eq(x, y) for x, y in zip(o, t))
    else:
        same = eq(o, t)
    if not same:
        print(f"PROBE DIFF [{tag}] ours={o!r} pandas={t!r}")


# ---------------------------------------------------------- arithmetic edges
num = [1.0, -1.0, 0.0, 2.0, np.nan]
den = [0.0, 0.0, 0.0, -0.0, 1.0]
ps_n, ps_d = pd.Series(num), pd.Series(den)
bs_n, bs_d = bl.Series(np.array(num)), bl.Series(np.array(den))

check("div_by_zero", lambda: (bs_n / bs_d).to_pandas().tolist(),
      lambda: (ps_n / ps_d).tolist())
check("scalar_div_zero", lambda: (bs_n / 0.0).to_pandas().tolist(),
      lambda: (ps_n / 0.0).tolist())
check("mod_by_zero", lambda: (bs_n % bs_d).to_pandas().tolist(),
      lambda: (ps_n % ps_d).tolist())
check("floordiv_zero", lambda: (bs_n // bs_d).to_pandas().tolist(),
      lambda: (ps_n // ps_d).tolist())
check("floordiv", lambda: (bl.Series(np.array([7.0, -7.0, 7.5]))
                           // 2).to_pandas().tolist(),
      lambda: (pd.Series([7.0, -7.0, 7.5]) // 2).tolist())
check("pow_edges",
      lambda: (bl.Series(np.array([0.0, -8.0, 2.0, -2.0]))
               ** 0.5).to_pandas().tolist(),
      lambda: (pd.Series([0.0, -8.0, 2.0, -2.0]) ** 0.5).tolist())
check("pow_zero_zero",
      lambda: (bl.Series(np.array([0.0, 1.0])) ** 0).to_pandas().tolist(),
      lambda: (pd.Series([0.0, 1.0]) ** 0).tolist())
check("neg_pow_int",
      lambda: (bl.Series(np.array([-2.0])) ** 3).to_pandas().tolist(),
      lambda: (pd.Series([-2.0]) ** 3).tolist())
check("int_div_int",
      lambda: (bl.Series(np.array([7, 8], dtype=np.int64))
               / bl.Series(np.array([2, 4], dtype=np.int64)))
      .to_pandas().tolist(),
      lambda: (pd.Series([7, 8]) / pd.Series([2, 4])).tolist())
check("radd", lambda: (10 + bl.Series(np.array([1.0, 2.0])))
      .to_pandas().tolist(),
      lambda: (10 + pd.Series([1.0, 2.0])).tolist())
check("rsub", lambda: (10 - bl.Series(np.array([1.0, 2.0])))
      .to_pandas().tolist(),
      lambda: (10 - pd.Series([1.0, 2.0])).tolist())
check("rdiv", lambda: (10 / bl.Series(np.array([4.0, 0.0])))
      .to_pandas().tolist(),
      lambda: (10 / pd.Series([4.0, 0.0])).tolist())
check("unary_neg", lambda: (-bl.Series(np.array([1.0, -2.0, np.nan])))
      .to_pandas().tolist(),
      lambda: (-pd.Series([1.0, -2.0, np.nan])).tolist())
check("abs_int", lambda: bl.Series(np.array([-3, 4], dtype=np.int64))
      .abs().to_pandas().tolist(),
      lambda: pd.Series([-3, 4]).abs().tolist())

# inf propagation through aggs
inf_vals = [1.0, np.inf, -np.inf, np.nan]
check("sum_inf", lambda: bl.Series(np.array(inf_vals)).sum(),
      lambda: pd.Series(inf_vals).sum())
check("max_inf", lambda: bl.Series(np.array(inf_vals)).max(),
      lambda: pd.Series(inf_vals).max())
check("mean_inf", lambda: bl.Series(np.array(inf_vals)).mean(),
      lambda: pd.Series(inf_vals).mean())

# bool cumulative
check("bool_cumsum",
      lambda: bl.Series(np.array([True, False, True], dtype=object))
      .astype(np.int64).cumsum().to_pandas().tolist(),
      lambda: pd.Series([True, False, True]).astype("int64")
      .cumsum().tolist())

# ------------------------------------------------------------ astype edges
check("astype_int_with_nan",
      lambda: bl.Series(np.array([1.0, np.nan])).astype(np.int64)
      .to_pandas().tolist(),
      lambda: pd.Series([1.0, np.nan]).astype("int64").tolist())
check("astype_str_float",
      lambda: bl.Series(np.array([1.5, 2.0])).astype(str)
      .to_pandas().tolist(),
      lambda: pd.Series([1.5, 2.0]).astype(str).tolist())
check("astype_float_from_str",
      lambda: bl.Series(np.array(["1.5", "2"], dtype=object))
      .astype(np.float64).to_pandas().tolist(),
      lambda: pd.Series(["1.5", "2"]).astype(float).tolist())
check("astype_bad_str_to_float",
      lambda: bl.Series(np.array(["x"], dtype=object))
      .astype(np.float64).to_pandas().tolist(),
      lambda: pd.Series(["x"]).astype(float).tolist())

# ---------------------------------------------------- new reshape surfaces
pt_pdf = pd.DataFrame({"k": ["a", None, "b"], "c": ["x", "x", None],
                       "v": [1.0, 2.0, 3.0]})
pt_df = bl.DataFrame({"k": np.array(["a", None, "b"], dtype=object),
                      "c": np.array(["x", "x", None], dtype=object),
                      "v": np.array([1.0, 2.0, 3.0])})
check("pivot_table_null_keys",
      lambda: pt_df.pivot_table(values="v", index="k", columns="c",
                                aggfunc="sum").to_pandas()
      .fillna(-9).to_numpy().tolist(),
      lambda: pt_pdf.pivot_table(values="v", index="k", columns="c",
                                 aggfunc="sum").fillna(-9)
      .to_numpy().tolist())

dup = pd.DataFrame({"k": ["x", "x"], "c": ["p", "p"], "v": [1.0, 2.0]})
bdup = bl.DataFrame({"k": np.array(["x", "x"], dtype=object),
                     "c": np.array(["p", "p"], dtype=object),
                     "v": np.array([1.0, 2.0])})
check("unstack_duplicates",
      lambda: bdup.set_index(["k", "c"])["v"].unstack()
      .to_pandas().to_numpy().tolist(),
      lambda: dup.set_index(["k", "c"])["v"].unstack()
      .to_numpy().tolist())

check("interpolate_inf",
      lambda: bl.Series(np.array([1.0, np.nan, np.inf]))
      .interpolate().to_pandas().tolist(),
      lambda: pd.Series([1.0, np.nan, np.inf]).interpolate().tolist())

allnull = pd.DataFrame({"a": [np.nan, np.nan]})
check("stack_all_null",
      lambda: bl.DataFrame({"a": np.array([np.nan, np.nan])})
      .stack().to_pandas().tolist(),
      lambda: allnull.stack().tolist())

# update with duplicate index labels in other
upl = pd.DataFrame({"k": [1, 2], "v": [1.0, 2.0]}).set_index("k")
upr = pd.DataFrame({"k": [2, 2], "v": [8.0, 9.0]}).set_index("k")
bupl = bl.DataFrame({"k": np.array([1, 2]),
                     "v": np.array([1.0, 2.0])}).set_index("k")
bupr = bl.DataFrame({"k": np.array([2, 2]),
                     "v": np.array([8.0, 9.0])}).set_index("k")


def pd_update():
    x = upl.copy()
    x.update(upr)
    return x.sort_index().to_numpy().tolist()


check("update_dup_other",
      lambda: bupl.update(bupr).to_pandas().sort_index()
      .to_numpy().tolist(),
      pd_update)

# Series.explode on scalars (pandas passes scalars through unchanged)
check("explode_scalars",
      lambda: bl.Series(np.array([1.0, 2.0])).explode()
      .to_pandas().tolist(),
      lambda: pd.Series([1.0, 2.0]).explode().tolist())

# ------------------------------------------------------------ concat edges
c1 = pd.DataFrame({"a": [1.0], "b": [2.0]})
c2 = pd.DataFrame({"b": [3.0], "c": [4.0]})
b1 = bl.DataFrame({"a": np.array([1.0]), "b": np.array([2.0])})
b2 = bl.DataFrame({"b": np.array([3.0]), "c": np.array([4.0])})
check("concat_mismatched_cols",
      lambda: bl.concat([b1, b2]).to_pandas().fillna(-9)
      .to_numpy().tolist(),
      lambda: pd.concat([c1, c2], ignore_index=True).fillna(-9)
      .to_numpy().tolist())
check("concat_empty",
      lambda: bl.concat([b1, bl.DataFrame({"a": np.array([], dtype=float),
                                           "b": np.array([], dtype=float)})])
      .to_pandas().to_numpy().tolist(),
      lambda: pd.concat([c1, pd.DataFrame({"a": [], "b": []})],
                        ignore_index=True).to_numpy().tolist())

# ------------------------------------------------------- nlargest tie keep
tie = [3.0, 1.0, 3.0, 2.0]
check("nlargest_ties",
      lambda: bl.Series(np.array(tie)).nlargest(2).to_pandas().tolist(),
      lambda: pd.Series(tie).nlargest(2).tolist())
check("frame_nlargest_ties",
      lambda: bl.DataFrame({"v": np.array(tie)}).nlargest(2, "v")
      .to_pandas()["v"].tolist(),
      lambda: pd.DataFrame({"v": tie}).nlargest(2, "v")["v"].tolist())

# ------------------------------------------------- rounding negative digits
check("round_negative_digits",
      lambda: bl.Series(np.array([1234.5, 155.0])).round(-2)
      .to_pandas().tolist(),
      lambda: pd.Series([1234.5, 155.0]).round(-2).tolist())

# diff on bool (pandas: object sub error in 2.x -> raises)
check("shift_string",
      lambda: bl.Series(np.array(["a", "b"], dtype=object)).shift(1)
      .to_pandas().tolist(),
      lambda: pd.Series(["a", "b"]).shift(1).tolist())

print("wave6 probe complete")
