"""Adversarial pandas-parity probe wave 3: cut/qcut edges, quantile
interpolation, rank pct, melt/explode, duplicated keep=, replace,
corr/cov under NaN, idx ties, diff/pct_change negative periods,
cumprod NaN carry, round digits."""
import sys

sys.path.insert(0, ".")

import numpy as np
import pandas as pd

import baloo_spark as bl


def norm(x):
    if x is None or (isinstance(x, float) and x != x) or x is pd.NA:
        return "<N>"
    if isinstance(x, (np.floating, float, np.integer, int)) \
            and not isinstance(x, bool):
        return int(x) if float(x) == int(x) else round(float(x), 9)
    return str(x)


def run(tag, f_ours, f_pd, unordered=False):
    try:
        o = f_ours()
        o = o.to_pandas() if hasattr(o, "to_pandas") else o
        if isinstance(o, pd.DataFrame):
            ours = [tuple(norm(v) for v in r)
                    for r in o.itertuples(index=False)]
        elif isinstance(o, pd.Series):
            ours = [norm(v) for v in o.tolist()]
        else:
            ours = norm(o)
    except Exception as e:
        ours = f"RAISE {type(e).__name__}: {str(e)[:90]}"
    try:
        t = f_pd()
        if isinstance(t, pd.DataFrame):
            theirs = [tuple(norm(v) for v in r)
                      for r in t.itertuples(index=False)]
        elif isinstance(t, pd.Series):
            theirs = [norm(v) for v in list(t)]
        elif isinstance(t, (list, tuple, np.ndarray)):
            theirs = [norm(v) for v in list(t)]
        else:
            theirs = norm(t)
    except Exception as e:
        theirs = f"RAISE {type(e).__name__}: {str(e)[:90]}"
    if unordered and isinstance(ours, list) and isinstance(theirs, list):
        ours, theirs = sorted(map(repr, ours)), sorted(map(repr, theirs))
    if ours != theirs:
        print(f"PROBE DIFF {tag}:\n  ours   {ours}\n  pandas {theirs}")
    else:
        print(f"ok {tag}")


V = [3., 1., np.nan, 2., 5., 2., 8., 7.]
S = lambda: bl.Series(np.array(V), name="v")
P = lambda: pd.Series(V)

# --- cut/qcut -------------------------------------------------------
run("cut labels=False", lambda: S().cut([0, 2, 4, 9], labels=False),
    lambda: pd.cut(P(), [0, 2, 4, 9], labels=False))
run("cut right=False", lambda: S().cut([1, 3, 5, 9], labels=False,
                                       right=False),
    lambda: pd.cut(P(), [1, 3, 5, 9], labels=False, right=False))
run("cut edge-on-bound", lambda: S().cut([1, 2, 5, 8], labels=False),
    lambda: pd.cut(P(), [1, 2, 5, 8], labels=False))
run("cut below-lowest", lambda: S().cut([2.5, 6], labels=False),
    lambda: pd.cut(P(), [2.5, 6], labels=False))
run("cut int bins", lambda: S().cut(3, labels=False),
    lambda: pd.cut(P(), 3, labels=False))
run("qcut q=3", lambda: S().qcut(3, labels=False),
    lambda: pd.qcut(P(), 3, labels=False))
run("qcut q=[0,.5,1]", lambda: S().qcut([0, .5, 1], labels=False),
    lambda: pd.qcut(P(), [0, .5, 1], labels=False))
dup = [1., 1., 1., 1., 2.]
run("qcut duplicate edges",
    lambda: bl.Series(np.array(dup), name="v").qcut(
        4, labels=False, duplicates="drop"),
    lambda: pd.qcut(pd.Series(dup), 4, labels=False, duplicates="drop"))

# --- quantile interpolation ----------------------------------------
for interp in ("linear", "lower", "higher", "nearest", "midpoint"):
    run(f"quantile {interp}",
        lambda i=interp: S().quantile(0.3, interpolation=i),
        lambda i=interp: P().quantile(0.3, interpolation=i))
run("quantile list", lambda: S().quantile([0.1, 0.5, 0.9]),
    lambda: P().quantile([0.1, 0.5, 0.9]))
run("median even-nan", lambda: S().median(), lambda: P().median())

# --- rank pct / methods under NaN ----------------------------------
for m in ("average", "min", "max", "first", "dense"):
    run(f"rank {m} pct", lambda m=m: S().rank(method=m, pct=True),
        lambda m=m: P().rank(method=m, pct=True))
run("rank desc", lambda: S().rank(ascending=False),
    lambda: P().rank(ascending=False))

# --- melt / explode ------------------------------------------------
d = {"k": np.array(["a", "b", "c"], dtype=object),
     "x": np.array([1., 2., 3.]), "y": np.array([4., 5., 6.])}
run("melt", lambda: bl.DataFrame(d).melt(id_vars="k",
                                         value_vars=["x", "y"]),
    lambda: pd.DataFrame(d).melt(id_vars="k", value_vars=["x", "y"]),
    unordered=True)
run("melt no id", lambda: bl.DataFrame(d).melt(value_vars=["x", "y"]),
    lambda: pd.DataFrame(d).melt(value_vars=["x", "y"]),
    unordered=True)

# --- duplicated keep= ----------------------------------------------
dd = {"a": np.array([1., 1., 2., 2., 3.]),
      "b": np.array([1., 1., 9., 9., 3.])}
for keep in ("first", "last", False):
    run(f"duplicated keep={keep}",
        lambda k=keep: bl.DataFrame(dd).duplicated(keep=k),
        lambda k=keep: pd.DataFrame(dd).duplicated(keep=k))
    run(f"duplicated subset keep={keep}",
        lambda k=keep: bl.DataFrame(dd).duplicated(subset=["a"], keep=k),
        lambda k=keep: pd.DataFrame(dd).duplicated(subset=["a"], keep=k))

# --- replace -------------------------------------------------------
run("replace scalar", lambda: S().replace(2., -1.),
    lambda: P().replace(2., -1.))
run("replace dict", lambda: S().replace({2.: -1., 5.: -5.}),
    lambda: P().replace({2.: -1., 5.: -5.}))
sstr = ["aa", "bb", None, "aa"]
run("replace str",
    lambda: bl.Series(np.array(sstr, dtype=object), name="v")
    .replace("aa", "zz"),
    lambda: pd.Series(sstr).replace("aa", "zz"))

# --- corr / cov under NaN ------------------------------------------
x = [1., 2., np.nan, 4., 5.]
y = [2., np.nan, 6., 8., 11.]
run("corr pairwise-nan",
    lambda: bl.Series(np.array(x), name="x").corr(
        bl.Series(np.array(y), name="y")),
    lambda: pd.Series(x).corr(pd.Series(y)))
run("cov pairwise-nan",
    lambda: bl.Series(np.array(x), name="x").cov(
        bl.Series(np.array(y), name="y")),
    lambda: pd.Series(x).cov(pd.Series(y)))

# --- idxmax/idxmin ties & nan --------------------------------------
t = [3., 1., 3., np.nan]
run("idxmax tie", lambda: bl.Series(np.array(t), name="v").idxmax(),
    lambda: pd.Series(t).idxmax())
run("idxmin nan", lambda: bl.Series(np.array(t), name="v").idxmin(),
    lambda: pd.Series(t).idxmin())

# --- diff / pct_change periods -------------------------------------
run("diff -1", lambda: S().diff(-1), lambda: P().diff(-1))
run("diff 2", lambda: S().diff(2), lambda: P().diff(2))
run("pct_change -1", lambda: S().pct_change(-1),
    lambda: P().pct_change(-1, fill_method=None))
run("pct_change over nan", lambda: S().pct_change(),
    lambda: P().pct_change(fill_method=None))

# --- cumulative NaN carry / shift fill -----------------------------
run("cumprod nan", lambda: S().cumprod(), lambda: P().cumprod())
run("cummax nan", lambda: S().cummax(), lambda: P().cummax())
run("shift fill_value", lambda: S().shift(2, fill_value=0.0),
    lambda: P().shift(2, fill_value=0.0))
run("shift negative", lambda: S().shift(-2), lambda: P().shift(-2))

# --- round digits --------------------------------------------------
rv = [123.456, -123.456, 2.5, 3.5, np.nan]
run("round -1",
    lambda: bl.Series(np.array(rv), name="v").round(-1),
    lambda: pd.Series(rv).round(-1))
run("round 2",
    lambda: bl.Series(np.array(rv), name="v").round(2),
    lambda: pd.Series(rv).round(2))

# --- sample contract (shape & determinism, not values) -------------
df = bl.DataFrame({"a": np.arange(100, dtype=np.float64)})
s1 = df.sample(frac=0.2, seed=7).to_pandas()
s2 = df.sample(frac=0.2, seed=7).to_pandas()
print("ok sample deterministic" if s1.equals(s2)
      else "PROBE DIFF sample: same seed differs")
n = len(df.sample(n=10).to_pandas())
print("ok sample n" if n == 10 else f"PROBE DIFF sample n: {n}")
