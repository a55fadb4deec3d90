"""Adversarial pandas-parity probe: Series alignment + fillna/astype
/value_counts edges."""
import sys

sys.path.insert(0, ".")

import numpy as np
import pandas as pd

import baloo_spark as bl


def norm(v):
    if v is None or (isinstance(v, float) and pd.isna(v)):
        return "<N>"
    if isinstance(v, (np.integer, int)) and not isinstance(v, bool):
        return int(v)
    if isinstance(v, (np.floating, float)):
        return int(v) if v == int(v) else round(float(v), 9)
    return v


def run(tag, f_ours, f_pd, unordered=False):
    try:
        o = f_ours()
        op = o.to_pandas()
        ours = [(norm(k), norm(v)) for k, v in op.items()]
    except Exception as e:
        ours = f"RAISE {type(e).__name__}: {str(e)[:110]}"
    try:
        t = f_pd()
        theirs = [(norm(k), norm(v)) for k, v in t.items()]
    except Exception as e:
        theirs = f"RAISE {type(e).__name__}: {str(e)[:110]}"
    if unordered and not isinstance(ours, str) and not isinstance(theirs, str):
        ours, theirs = sorted(map(repr, ours)), sorted(map(repr, theirs))
    if ours != theirs:
        print(f"PROBE DIFF {tag}:\n  ours   {ours}\n  pandas {theirs}")
    else:
        print(f"ok {tag}")


def S(vals, index=None, name="s"):
    arr = np.array(vals, dtype="float64")
    if index is None:
        return bl.Series(arr, name=name)
    return bl.Series(arr, index=np.array(index, dtype=np.int64), name=name)


def P(vals, index=None):
    return pd.Series(vals, index=index, dtype="float64")


# --- index-aligned arithmetic: overlapping, disjoint, duplicate labels
run("add aligned-shifted",
    lambda: S([1, 2, 3], [0, 1, 2]) + S([10, 20, 30], [1, 2, 3]),
    lambda: P([1, 2, 3], [0, 1, 2]) + P([10, 20, 30], [1, 2, 3]),
    unordered=True)
run("mul disjoint",
    lambda: S([1, 2], [0, 1]) * S([5, 6], [7, 8]),
    lambda: P([1, 2], [0, 1]) * P([5, 6], [7, 8]),
    unordered=True)
run("sub same-index",
    lambda: S([5, 6, 7]) - S([1, 1, 1]),
    lambda: P([5, 6, 7]) - P([1, 1, 1]))

# --- comparisons with NaN
run("gt with NaN",
    lambda: S([1, np.nan, 3]) > 2,
    lambda: P([1, np.nan, 3]) > 2)

# --- fillna
run("fillna scalar",
    lambda: S([1, np.nan, 3]).fillna(0),
    lambda: P([1, np.nan, 3]).fillna(0))
run("fillna keeps dtype int-ish",
    lambda: S([np.nan, 2]).fillna(9.5),
    lambda: P([np.nan, 2]).fillna(9.5))

# --- astype
run("astype int from float+nan-free",
    lambda: S([1.7, -2.7, 3.2]).astype(np.int64),
    lambda: P([1.7, -2.7, 3.2]).astype(np.int64))
run("astype str",
    lambda: S([1.5, 2.0]).astype(str),
    lambda: P([1.5, 2.0]).astype(str))
run("astype bool",
    lambda: S([0.0, 1.0, 2.0]).astype(bool),
    lambda: P([0.0, 1.0, 2.0]).astype(bool))

# --- value_counts
run("value_counts",
    lambda: S([1, 1, 2, np.nan, 2, 1]).value_counts(),
    lambda: P([1, 1, 2, np.nan, 2, 1]).value_counts(),
    unordered=True)

# --- rank pct
run("rank pct",
    lambda: S([3, 1, 2, 2]).rank(pct=True)
    if "pct" in S([1]).rank.__code__.co_varnames else S([3, 1, 2, 2]).rank() / 4,
    lambda: P([3, 1, 2, 2]).rank(pct=True))

# --- abs/neg
run("abs", lambda: abs(S([-1, 2, -3])), lambda: P([-1, 2, -3]).abs())
run("neg", lambda: -S([-1, 2, -3]), lambda: -P([-1, 2, -3]))

# --- pow edge: 0**0, neg**frac
run("pow edges",
    lambda: S([0.0, -8.0, 2.0]) ** 0.5,
    lambda: P([0.0, -8.0, 2.0]) ** 0.5)
run("pow zero-zero",
    lambda: S([0.0, 2.0]) ** 0,
    lambda: P([0.0, 2.0]) ** 0)
print("done")
