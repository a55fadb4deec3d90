"""Adversarial pandas-parity probe wave 17: the r8 session-2
additions under their own edge inputs — center=True (all-NaN series,
single row, window > n, w=2 boundary-heavy splits, quantile
interpolations, apply with args), expanding skew/kurt (constant
series, two values, all-null, single obs), expanding cov/corr
(constant side, self-corr, single pair), rolling corr of identical
series (fp-clean 1.0), grouped center with groups smaller than the
window, center after sort_values lineage, rolling apply
args/kwargs passthrough.

Run: python tools/probe_wave17.py — grep for 'PROBE DIFF'.
"""
import os
import sys
import warnings

sys.path.insert(0, ".")
os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "8")
warnings.filterwarnings("ignore")

import numpy as np
import pandas as pd

import baloo_spark as bl


def eq(a, b):
    if isinstance(a, float) and isinstance(b, float):
        return (a != a and b != b) or abs(a - b) < 1e-9
    if a is None and isinstance(b, float):
        return b != b
    if b is None and isinstance(a, float):
        return a != a
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


fl = lambda s: [float(x) for x in np.asarray(s, dtype=float)]

# ---- center edges ----
allnan = np.array([np.nan] * 7)
check("center median all-nan",
      lambda: fl(bl.Series(allnan).rolling(3, min_periods=1,
                                           center=True).median()
                 .to_pandas()),
      lambda: fl(pd.Series(allnan).rolling(3, min_periods=1,
                                           center=True).median()))
one = np.array([5.0])
check("center sum single row",
      lambda: fl(bl.Series(one).rolling(4, min_periods=1,
                                        center=True).sum()
                 .to_pandas()),
      lambda: fl(pd.Series(one).rolling(4, min_periods=1,
                                        center=True).sum()))
v = np.array([3., np.nan, 1., 4., 4., np.nan, 2., 9.])
pv, sv = pd.Series(v), bl.Series(v)
check("center w=2 min",
      lambda: fl(sv.rolling(2, min_periods=1, center=True).min()
                 .to_pandas()),
      lambda: fl(pv.rolling(2, min_periods=1, center=True).min()))
check("center w>n var",
      lambda: fl(sv.rolling(100, min_periods=2, center=True).var()
                 .to_pandas()),
      lambda: fl(pv.rolling(100, min_periods=2, center=True).var()))
for itp in ("lower", "midpoint", "nearest"):
    check(f"center quantile {itp}",
          lambda i=itp: fl(sv.rolling(5, min_periods=2, center=True)
                           .quantile(0.4, interpolation=i)
                           .to_pandas()),
          lambda i=itp: fl(pv.rolling(5, min_periods=2, center=True)
                           .quantile(0.4, interpolation=i)))
check("center apply with args",
      lambda: fl(sv.rolling(3, min_periods=1, center=True)
                 .apply(lambda a, k: np.nansum(a) * k, raw=True,
                        args=(2.0,)).to_pandas()),
      lambda: fl(pv.rolling(3, min_periods=1, center=True)
                 .apply(lambda a, k: np.nansum(a) * k, raw=True,
                        args=(2.0,))))
# center after sort lineage
perm = np.array([4, 1, 6, 0, 3, 7, 2, 5])
pdf = pd.DataFrame({"t": perm, "x": v})
bd = bl.DataFrame({"t": perm, "x": v}).sort_values("t")
check("center mean after sort",
      lambda: fl(bd["x"].rolling(3, min_periods=1, center=True)
                 .mean().to_pandas()),
      lambda: fl(pdf.sort_values("t")["x"]
                 .rolling(3, min_periods=1, center=True).mean()))

# ---- expanding moment edges ----
const = np.array([4., 4., 4., 4., 4.])
check("expanding skew constant",
      lambda: fl(bl.Series(const).expanding(2).skew().to_pandas()),
      lambda: fl(pd.Series(const).expanding(2).skew()))
check("expanding kurt constant",
      lambda: fl(bl.Series(const).expanding(2).kurt().to_pandas()),
      lambda: fl(pd.Series(const).expanding(2).kurt()))
two = np.array([1., 2.])
check("expanding skew two values",
      lambda: fl(bl.Series(two).expanding(1).skew().to_pandas()),
      lambda: fl(pd.Series(two).expanding(1).skew()))
check("expanding kurt all-null",
      lambda: fl(bl.Series(allnan[:5]).expanding(1).kurt()
                 .to_pandas()),
      lambda: fl(pd.Series(allnan[:5]).expanding(1).kurt()))
check("expanding sem single obs",
      lambda: fl(bl.Series(one).expanding(1).sem().to_pandas()),
      lambda: fl(pd.Series(one).expanding(1).sem()))
# expanding pair edges
d = bl.DataFrame({"x": v, "c": const[:8] if len(const) >= 8
                  else np.array([4.] * 8)})
pc = pd.Series([4.] * 8)
check("expanding corr constant side",
      lambda: fl(d["x"].expanding(2).corr(d["c"]).to_pandas()),
      lambda: fl(pv.expanding(2).corr(pc)))
check("expanding corr self",
      lambda: fl(d["x"].expanding(2).corr(d["x"]).to_pandas()),
      lambda: fl(pv.expanding(2).corr(pv)))
check("expanding cov single pair",
      lambda: fl(bl.Series(two).expanding(1).cov(bl.Series(two))
                 .to_pandas()),
      lambda: fl(pd.Series(two).expanding(1).cov(pd.Series(two))))
check("rolling corr identical series",
      lambda: fl(d["x"].rolling(4, min_periods=2).corr(d["x"])
                 .to_pandas()),
      lambda: fl(pv.rolling(4, min_periods=2).corr(pv)))

# ---- grouped center: groups smaller than window ----
g = np.array(["a", "a", "b", "b", "b", "c", "a", "c"])
pg = pd.DataFrame({"g": g, "x": v})
bg = bl.DataFrame({"g": g, "x": v})
check("grouped center small groups sum",
      lambda: fl(bg.groupby("g")[["x"]]
                 .rolling(4, min_periods=1, center=True).sum()
                 .to_pandas()["x"]),
      lambda: fl(pg.groupby("g", sort=False)[["x"]]
                 .rolling(4, min_periods=1, center=True).sum()
                 .reset_index(level=0, drop=True).sort_index()["x"]))
check("grouped center small groups median",
      lambda: fl(bg.groupby("g")[["x"]]
                 .rolling(4, min_periods=1, center=True).median()
                 .to_pandas()["x"]),
      lambda: fl(pg.groupby("g", sort=False)[["x"]]
                 .rolling(4, min_periods=1, center=True).median()
                 .reset_index(level=0, drop=True).sort_index()["x"]))

print("wave 17 done")
