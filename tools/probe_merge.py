"""Adversarial pandas-parity probe: merge/join edges + r5 surface.

Many-to-many keys, overlapping column suffixes, outer fill, mixed
dtype keys, combine_first overlap, nlargest tie policy, replace.
"""
import sys

sys.path.insert(0, ".")

import numpy as np
import pandas as pd

import baloo_spark as bl


def mk(d, idx=None):
    n = len(next(iter(d.values())))
    return bl.DataFrame({k: np.array(v, dtype=object)
                         if any(isinstance(x, str) for x in v if x is not None)
                         else np.array([np.nan if x is None else x for x in v], dtype="float64")
                         if any(x is None for x in v)
                         else np.array(v) for k, v in d.items()},
                        index=np.arange(n, dtype=np.int64) if idx is None else idx)


def norm_df(pdf):
    pdf = pdf.reset_index(drop=True)
    rows = []
    for _, r in pdf.iterrows():
        rows.append(tuple("<N>" if pd.isna(v) else
                          (int(v) if isinstance(v, (int, np.integer, float, np.floating))
                           and not isinstance(v, bool) and float(v) == int(v) else v)
                          for v in r))
    return sorted(rows), sorted(pdf.columns.tolist())


def run(tag, f_ours, f_pd):
    try:
        o = f_ours()
        ours = norm_df(o.to_pandas()[sorted(o.to_pandas().columns)])
    except Exception as e:
        ours = f"RAISE {type(e).__name__}: {str(e)[:110]}"
    try:
        t = f_pd()
        theirs = norm_df(t[sorted(t.columns)])
    except Exception as e:
        theirs = f"RAISE {type(e).__name__}: {str(e)[:110]}"
    if ours != theirs:
        print(f"PROBE DIFF {tag}:\n  ours   {ours}\n  pandas {theirs}")
    else:
        print(f"ok {tag}")


L = {"k": [1, 1, 2, 3], "v": [10, 11, 20, 30], "c": ["x", "y", "z", "w"]}
R = {"k": [1, 1, 2, 4], "v": [100, 101, 200, 400], "d": ["a", "b", "c", "d"]}

lf = lambda: mk(L)
rf = lambda: mk(R)
pl = lambda: pd.DataFrame(L)
pr = lambda: pd.DataFrame(R)

for how in ("inner", "left", "right", "outer"):
    run(f"merge m2m {how}",
        lambda how=how: lf().merge(rf(), on="k", how=how),
        lambda how=how: pl().merge(pr(), on="k", how=how,
                                   suffixes=("", "_right")))

# mixed dtype keys: int vs float
run("merge int-float keys",
    lambda: mk({"k": [1, 2, 3], "a": [1, 2, 3]}).merge(
        mk({"k": [1.0, 2.5, 3.0], "b": [7, 8, 9]}), on="k", how="inner"),
    lambda: pd.DataFrame({"k": [1, 2, 3], "a": [1, 2, 3]}).merge(
        pd.DataFrame({"k": [1.0, 2.5, 3.0], "b": [7, 8, 9]}), on="k"))

# multi-key merge
run("merge two keys",
    lambda: mk({"k1": [1, 1, 2], "k2": ["a", "b", "a"], "v": [1, 2, 3]}).merge(
        mk({"k1": [1, 2, 2], "k2": ["a", "a", "b"], "w": [9, 8, 7]}),
        on=["k1", "k2"], how="outer"),
    lambda: pd.DataFrame({"k1": [1, 1, 2], "k2": ["a", "b", "a"], "v": [1, 2, 3]}).merge(
        pd.DataFrame({"k1": [1, 2, 2], "k2": ["a", "a", "b"], "w": [9, 8, 7]}),
        on=["k1", "k2"], how="outer"))

# combine_first: overlap + disjoint labels
run("combine_first",
    lambda: mk({"x": [1, None, 3], "y": [None, 5, None]}).combine_first(
        mk({"x": [9, 8, 7], "z": [1, 1, 1]})),
    lambda: pd.DataFrame({"x": [1, None, 3], "y": [None, 5, None]}).combine_first(
        pd.DataFrame({"x": [9.0, 8.0, 7.0], "z": [1.0, 1.0, 1.0]})))

# nlargest/nsmallest tie behavior (keep='first' default)
NL = {"v": [5, 5, 3, 5, 1], "t": ["a", "b", "c", "d", "e"]}
run("nlargest ties",
    lambda: mk(NL).nlargest(2, "v"),
    lambda: pd.DataFrame(NL).nlargest(2, "v"))
run("nsmallest ties",
    lambda: mk({"v": [1, 1, 3, 1, 5], "t": list("abcde")}).nsmallest(2, "v"),
    lambda: pd.DataFrame({"v": [1, 1, 3, 1, 5], "t": list("abcde")}).nsmallest(2, "v"))

# replace: scalar, list, dict
RP = {"v": [1, 2, 3, 2, 1], "s": ["a", "b", "a", "c", "a"]}
run("replace scalar",
    lambda: mk(RP).replace(2, 99),
    lambda: pd.DataFrame(RP).replace(2, 99))
run("replace dict",
    lambda: mk(RP).replace({1: 10, 3: 30}),
    lambda: pd.DataFrame(RP).replace({1: 10, 3: 30}))
run("replace str",
    lambda: mk(RP).replace("a", "Z"),
    lambda: pd.DataFrame(RP).replace("a", "Z"))
print("done")
