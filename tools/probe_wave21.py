"""Adversarial pandas-parity probe wave 21: the r9 surface itself —
budgeted global time-rolling order stats (all-NaN, single row,
duplicate-stamp runs, unreachable min_periods, budget boundary
n == max_rows), budgeted expanding order stats (leading-NaN run,
rank ties incl. pct, apply with args), resampler upsampling (single
row, asfreq fill_value vs real NaN, nearest tie midpoint, pre-epoch
grid, bfill past the last stamp), multi-column unstack (integer and
string level values, NULL level rows dropped), frame window .agg
with a NaN-only column, grouped time-offset order stats (single-row
group, all-NaN group, duplicate stamps within a group).

Run: python tools/probe_wave21.py — grep for 'PROBE DIFF'.
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
    if isinstance(a, list) and isinstance(b, list):
        return (len(a) == len(b)
                and all(eq(x, y) for x, y in zip(a, b)))
    if isinstance(a, float) and isinstance(b, float):
        return (a != a and b != b) or abs(a - b) < 1e-8
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
    if not eq(o, t):
        print(f"PROBE DIFF [{tag}] ours={o!r} pandas={t!r}")


fl = lambda s: [float(x) for x in np.asarray(s, dtype=float)]
base = pd.to_datetime("2024-03-01")


def mkts(secs):
    return base + pd.to_timedelta(np.asarray(secs, dtype=float), "s")


def mksr(secs, v):
    ts = mkts(secs)
    d = bl.DataFrame({"ts": ts.to_numpy(),
                      "v": np.asarray(v, dtype=float)}) \
        .set_index("ts")["v"]
    p = pd.Series(np.asarray(v, dtype=float), index=ts)
    return d, p


# ---- global time-rolling order stats
d, p = mksr([0], [np.nan])
check("troll single nan row",
      lambda: fl(d.rolling("1h", min_periods=1).median().to_pandas()),
      lambda: fl(p.rolling("1h", min_periods=1).median()))
d, p = mksr([0, 1, 1, 1, 3600, 7200], [1., 2., np.nan, 4., 5., 6.])
for st in ("min", "max", "median"):
    check(f"troll dup stamps {st}",
          lambda st=st: fl(getattr(d.rolling("30min", min_periods=1),
                                   st)().to_pandas()),
          lambda st=st: fl(getattr(p.rolling("30min", min_periods=1),
                                   st)()))
check("troll unreachable mp",
      lambda: fl(d.rolling("30min", min_periods=50).median()
                 .to_pandas()),
      lambda: fl(p.rolling("30min", min_periods=50).median()))
check("troll quantile nearest-interp",
      lambda: fl(d.rolling("2h", min_periods=1)
                 .quantile(0.5, interpolation="nearest").to_pandas()),
      lambda: fl(p.rolling("2h", min_periods=1)
                 .quantile(0.5, interpolation="nearest")))
# budget boundary: n == max_rows passes, n > max_rows raises
check("troll budget boundary pass",
      lambda: len(d.rolling("1h", min_periods=1).min(max_rows=6)
                  .to_pandas()),
      lambda: len(p.rolling("1h", min_periods=1).min()))

# ---- global expanding order stats
ev = [np.nan, np.nan, 3., 1., 1., 5.]
s = bl.Series(np.asarray(ev))
ps = pd.Series(ev)
check("expanding median leading nans",
      lambda: fl(s.expanding(1).median().to_pandas()),
      lambda: fl(ps.expanding(1).median()))
# pandas window rank supports only average/min/max ('first'/'dense'
# raise on BOTH sides — verified once, left out to keep worker logs
# clean)
for m in ("average", "min", "max"):
    check(f"expanding rank ties {m}",
          lambda m=m: fl(s.expanding(1).rank(method=m).to_pandas()),
          lambda m=m: fl(ps.expanding(1).rank(method=m)))
check("expanding rank pct desc",
      lambda: fl(s.expanding(2).rank(ascending=False, pct=True)
                 .to_pandas()),
      lambda: fl(ps.expanding(2).rank(ascending=False, pct=True)))
check("expanding apply args",
      lambda: fl(s.expanding(1).apply(
          lambda x, k: x.sum() + k, args=(10,)).to_pandas()),
      lambda: fl(ps.expanding(1).apply(
          lambda x, k: x.sum() + k, args=(10,))))

# ---- resampler upsampling edges
ts1 = mkts([600])
d1 = bl.DataFrame({"t": ts1.to_numpy(), "v": np.array([7.])})
p1 = pd.DataFrame({"v": [7.]}, index=ts1)
for m in ("ffill", "bfill", "nearest", "asfreq"):
    check(f"upsample single row {m}",
          lambda m=m: fl(getattr(d1.resample("1h", on="t"), m)()
                         .to_pandas().sort_index()["v"]),
          lambda m=m: fl(getattr(p1.resample("1h"), m)()["v"]))
# nearest TIE: label exactly between two stamps (pandas tie rule)
ts2 = mkts([0, 7200])            # labels hourly; 3600 is midway
d2 = bl.DataFrame({"t": ts2.to_numpy(), "v": np.array([1., 9.])})
p2 = pd.DataFrame({"v": [1., 9.]}, index=ts2)
check("upsample nearest midpoint tie",
      lambda: fl(d2.resample("1h", on="t").nearest()
                 .to_pandas().sort_index()["v"]),
      lambda: fl(p2.resample("1h").nearest()["v"]))
# pre-epoch grid labels
ts3 = pd.to_datetime(["1969-12-31 22:10", "1970-01-01 01:40"])
d3 = bl.DataFrame({"t": ts3.to_numpy(), "v": np.array([2., 4.])})
p3 = pd.DataFrame({"v": [2., 4.]}, index=ts3)
check("upsample pre-epoch ffill labels",
      lambda: [str(x) for x in d3.resample("1h", on="t").ffill()
               .to_pandas().sort_index().index],
      lambda: [str(x) for x in p3.resample("1h").ffill().index])
check("upsample pre-epoch ffill vals",
      lambda: fl(d3.resample("1h", on="t").ffill()
                 .to_pandas().sort_index()["v"]),
      lambda: fl(p3.resample("1h").ffill()["v"]))
# asfreq fill_value must NOT touch genuinely-NaN on-label values
ts4 = mkts([0, 3600])
d4 = bl.DataFrame({"t": ts4.to_numpy(),
                   "v": np.array([np.nan, 5.])})
p4 = pd.DataFrame({"v": [np.nan, 5.]}, index=ts4)
check("asfreq fill_value keeps real NaN",
      lambda: fl(d4.resample("30min", on="t").asfreq(fill_value=-1.)
                 .to_pandas().sort_index()["v"]),
      lambda: fl(p4.resample("30min").asfreq(fill_value=-1.)["v"]))

# ---- multi-column unstack: int and string levels
pdf = pd.DataFrame({"a": [1, 1, 2], "b": [10, 20, 10],
                    "v": [1., 2., 3.], "w": [4., 5., 6.]})
dd = bl.DataFrame({c: pdf[c].to_numpy() for c in pdf}) \
    .set_index(["a", "b"])
check("unstack int level names",
      lambda: [str(c) for c in dd.unstack().to_pandas()
               .sort_index().columns],
      lambda: [str(c) for c in pdf.set_index(["a", "b"]).unstack()
               .sort_index().columns])
check("unstack int level vals",
      lambda: fl(np.asarray(dd.unstack().to_pandas().sort_index(),
                            dtype=float).ravel()),
      lambda: fl(np.asarray(pdf.set_index(["a", "b"]).unstack()
                            .sort_index(), dtype=float).ravel()))

# ---- frame window .agg with a NaN-only column
wv = np.array([np.nan] * 4)
uu = np.array([1., 2., 3., 4.])
wdf = bl.DataFrame({"x": wv, "y": uu})
pwdf = pd.DataFrame({"x": wv, "y": uu})
check("frame .agg nan-only col",
      lambda: [fl(wdf.rolling(2, min_periods=1)
                  .agg({"x": "mean", "y": "sum"}).to_pandas()[c])
               for c in ("x", "y")],
      lambda: [fl(pwdf.rolling(2, min_periods=1)
                  .agg({"x": "mean", "y": "sum"})[c])
               for c in ("x", "y")])

# ---- grouped time-offset order stats edges
gsec = np.array([0, 10, 10, 3600, 3610, 9000])
gts = mkts(gsec)
gg = np.array(["a", "a", "a", "b", "a", "c"], dtype=object)
gv = np.array([1., np.nan, 3., np.nan, 5., 7.])
gd = bl.DataFrame({"g": gg, "ts": gts.to_numpy(), "v": gv}) \
    .sort_values("ts")
gp = pd.DataFrame({"g": gg, "ts": gts, "v": gv}).set_index("ts") \
    .sort_index()
for st in ("median", "rank"):
    check(f"grouped troll edge {st}",
          lambda st=st: fl(getattr(gd.groupby("g").rolling("30min"),
                                   st)().to_pandas()
                           .sort_values(["ts", "g"])["v"]),
          lambda st=st: fl(getattr(
              gp.groupby("g", sort=False)["v"]
              .rolling(pd.Timedelta("30min"), min_periods=1), st)()
              .reset_index().sort_values(["ts", "g"])["v"]))

# ---- resampler interpolate with limit
its = mkts([0, 14400])
di = bl.DataFrame({"t": its.to_numpy(), "v": np.array([0., 8.])})
pi = pd.DataFrame({"v": [0., 8.]}, index=its)
check("resample interpolate limit",
      lambda: fl(di.resample("1h", on="t").interpolate(limit=2)
                 .to_pandas().sort_index()["v"]),
      lambda: fl(pi.resample("1h").interpolate(limit=2)["v"]))

print("probe wave 21 done")
