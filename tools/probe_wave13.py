"""Adversarial pandas-parity probe wave 13: the r7 convenience wave
under its own edge inputs — eval (chained comparison, `in` lists,
precedence, names shadowing SQL keywords), transform callables,
reindex (dup labels, dtype of introduced cells, empty target),
Series.drop duplicates-in-self, truncate inverted bounds, get on
NULL labels, asof (NaN where, duplicate index stamps, empty series),
argsort (empty, all-NaN, ties), compare equal inputs, align on
empty, groupby-by-Series with NULL keys x dropna, valid-index on
all-null frames, attribute access vs method shadowing.

Run: python tools/probe_wave13.py — grep for 'PROBE DIFF'.
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
fl = lambda s: [float(x) for x in np.asarray(s, dtype=float)]

pdf = pd.DataFrame({"a": [1., 2., 3.], "b": [4., 5., 6.]})
df = mk(pdf)

# eval edges
check("eval chained comparison",
      lambda: df.eval("1 < a <= 3").to_pandas().tolist(),
      lambda: pdf.eval("1 < a <= 3").tolist())
check("eval in-list",
      lambda: df.eval("a in [1, 3]").to_pandas().tolist(),
      lambda: pdf.eval("a in [1, 3]").tolist())
check("eval precedence not-and",
      lambda: df.eval("not a > 1 and b < 6").to_pandas().tolist(),
      lambda: pdf.eval("not a > 1 and b < 6").tolist())
check("eval arithmetic only",
      lambda: fl(df.eval("(a + b) ** 2 % 5").to_pandas()),
      lambda: fl(pdf.eval("(a + b) ** 2 % 5")))

# transform callables incl. numpy ufunc
check("transform np.sqrt",
      lambda: fl(df.transform(np.sqrt).to_pandas()["a"]),
      lambda: fl(pdf.transform(np.sqrt)["a"]))

# reindex edges
ps = pd.Series([1., 2.], index=["a", "b"])
bs = mk(pd.DataFrame({"k": np.array(["a", "b"], dtype=object),
                      "v": ps.to_numpy()})).set_index("k")["v"]
check("reindex empty target",
      lambda: bs.reindex([]).to_pandas().tolist(),
      lambda: ps.reindex([]).tolist())
check("reindex dup target labels",
      lambda: sorted(bs.reindex(["a", "a", "c"]).to_pandas()
                     .fillna(-9).tolist()),
      lambda: sorted(ps.reindex(["a", "a", "c"]).fillna(-9).tolist()))

# drop with duplicate labels IN SELF (drops every match)
pdup = pd.Series([1., 2., 3.], index=["x", "x", "y"])
bdup = mk(pd.DataFrame({"k": np.array(["x", "x", "y"], dtype=object),
                        "v": pdup.to_numpy()})).set_index("k")["v"]
check("drop dup self labels",
      lambda: bdup.drop(["x"]).to_pandas().tolist(),
      lambda: pdup.drop(["x"]).tolist())

# truncate inverted bounds
check("truncate inverted",
      lambda: bs.truncate("b", "a").to_pandas().tolist(),
      lambda: ps.truncate("b", "a").tolist())

# get on a NULL label / with NULL in index
pn = pd.Series([1., 2.], index=["a", None])
bn = mk(pd.DataFrame({"k": np.array(["a", None], dtype=object),
                      "v": pn.to_numpy()})).set_index("k")["v"]
check("get existing with null in index",
      lambda: bn.get("a"), lambda: pn.get("a"))

# asof edges
pa = pd.Series([1., 2., 4.], index=[10, 20, 20])
ba = mk(pd.DataFrame({"k": np.array([10, 20, 20], dtype=np.int64),
                      "v": pa.to_numpy()})).set_index("k")["v"]
check("asof duplicate stamps",
      lambda: float(ba.asof(25)), lambda: float(pa.asof(25)))
pe = pd.Series([], dtype=float)
check("asof empty series scalar",
      lambda: mk(pd.DataFrame({"k": np.array([], dtype=np.int64),
                               "v": np.array([], dtype=float)}))
      .set_index("k")["v"].asof(5),
      lambda: None if np.isnan(pe.asof(5)) else pe.asof(5))

# argsort edges
check("argsort empty",
      lambda: bl.Series(np.array([], dtype=float)).argsort()
      .to_pandas().tolist(),
      lambda: pd.Series([], dtype=float).argsort().tolist())
check("argsort all-nan",
      lambda: bl.Series(np.array([np.nan, np.nan])).argsort()
      .to_pandas().tolist(),
      lambda: [0, 1])  # NA-last future contract: stable positions
check("argsort ties stable",
      lambda: bl.Series(np.array([2., 1., 2., 1.])).argsort()
      .to_pandas().tolist(),
      lambda: pd.Series([2., 1., 2., 1.]).argsort().tolist())

# compare on equal inputs -> empty
s1 = pd.Series([1., 2.])
check("compare equal empty",
      lambda: len(bl.Series(s1.to_numpy()).compare(
          bl.Series(s1.to_numpy())).to_pandas()),
      lambda: len(s1.compare(s1)))

# align with one empty side
check("align empty side",
      lambda: [x.to_pandas().fillna(-9).tolist()
               for x in bl.Series(np.array([], dtype=float)).align(
                   bl.Series(np.array([1., 2.])))],
      lambda: [x.fillna(-9).tolist()
               for x in pd.Series([], dtype=float).align(
                   pd.Series([1., 2.]))])

# groupby-by-Series with NULL keys x dropna
v = pd.Series([1., 2., 3., 4.])
kk = pd.Series(["a", None, "a", None])
check("s.groupby null keys dropna=True",
      lambda: sorted(fl(np.asarray(
          bl.Series(v.to_numpy()).groupby(
              bl.Series(kk.to_numpy(dtype=object))).sum()
          .to_pandas()).ravel())),
      lambda: sorted(fl(v.groupby(kk).sum())))
check("s.groupby null keys dropna=False",
      lambda: sorted(fl(np.asarray(
          bl.Series(v.to_numpy()).groupby(
              bl.Series(kk.to_numpy(dtype=object)),
              dropna=False).sum().to_pandas()).ravel())),
      lambda: sorted(fl(v.groupby(kk, dropna=False).sum())))

# valid-index on all-null / empty frames
pz = pd.DataFrame({"a": [np.nan, np.nan]}, index=[1, 2])
dz = mk(pd.DataFrame({"k": np.array([1, 2], dtype=np.int64),
                      "a": pz["a"].to_numpy()})).set_index("k")
check("fvi all-null", lambda: dz.first_valid_index(),
      lambda: pz.first_valid_index())
check("lvi all-null", lambda: dz.last_valid_index(),
      lambda: pz.last_valid_index())

# attribute access never shadows methods
check("df.sum stays a method",
      lambda: callable(mk(pd.DataFrame({"sum": [1.]})).sum),
      lambda: callable(pd.DataFrame({"sum": [1.]}).sum))

print("probe wave 13 complete")
