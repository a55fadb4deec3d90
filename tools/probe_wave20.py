"""Adversarial pandas-parity probe wave 20: the resampler agg
family + window .agg — the only r8 surface no wave had covered
(VERDICT r8 Next #5). Cases: ohlc with all-NaN and gap buckets,
nunique with NULLs, prod identity on empty buckets, grouped
resample label alignment at DST-less UTC edges (pre-epoch stamps,
month boundaries), the .agg dict face and mixed-statistic lists on
rolling/expanding windows, sem's groupby convention vs the scalar
Series.sem face, size on all-null value buckets, first/last with
NULL-leading buckets, and calendar-multiple (2ME/3MS) gap fills.

Run: python tools/probe_wave20.py — grep for 'PROBE DIFF'.
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
    if isinstance(o, list) and isinstance(t, list):
        same = len(o) == len(t) and all(eq(x, y) for x, y in zip(o, t))
    else:
        same = eq(o, t)
    if not same:
        print(f"PROBE DIFF [{tag}] ours={o!r} pandas={t!r}")


fl = lambda s: [float(x) for x in np.asarray(s, dtype=float)]
base = pd.to_datetime("2024-03-01")


def mk(secs, v):
    ts = base + pd.to_timedelta(np.asarray(secs, dtype=float), "s")
    d = bl.DataFrame({"ts": ts.to_numpy(),
                      "v": np.asarray(v, dtype=float)})
    p = pd.DataFrame({"v": np.asarray(v, dtype=float)},
                     index=ts)
    return d, p


H = 3600.0

# ---- ohlc: all-NaN bucket, gap bucket, single-row bucket
d, p = mk([0, 10, H + 5, 3 * H + 1, 3 * H + 2],
          [1., 3., np.nan, 7., 2.])
for c in ("open", "high", "low", "close"):
    check(f"ohlc allnan+gap {c}",
          lambda c=c: fl(d.resample("1h", on="ts").ohlc()
                         .to_pandas().sort_values("ts")[c]),
          lambda c=c: fl(p["v"].resample("1h").ohlc()[c]))

# single row, value NaN -> every ohlc field NaN
d, p = mk([0], [np.nan])
for c in ("open", "close"):
    check(f"ohlc single-nan {c}",
          lambda c=c: fl(d.resample("1h", on="ts").ohlc()
                         .to_pandas()[c]),
          lambda c=c: fl(p["v"].resample("1h").ohlc()[c]))

# ---- nunique with NULLs: pandas counts distinct NON-null
d, p = mk([0, 1, 2, H, H + 1, 3 * H],
          [1., 1., np.nan, np.nan, np.nan, 5.])
check("nunique nulls",
      lambda: fl(d.resample("1h", on="ts").nunique()
                 .to_pandas().sort_values("ts")["v"]),
      lambda: fl(p["v"].resample("1h").nunique()))

# ---- prod identity on empty buckets (gap -> 1.0), NaN skipped
d, p = mk([0, 1, 3 * H, 3 * H + 1], [2., 3., np.nan, 5.])
check("prod gaps",
      lambda: fl(d.resample("1h", on="ts").prod()
                 .to_pandas().sort_values("ts")["v"]),
      lambda: fl(p["v"].resample("1h").prod()))

# ---- size on all-null buckets (counts rows, not values)
check("size allnull",
      lambda: fl(d.resample("1h", on="ts").size().to_pandas()),
      lambda: fl(p["v"].resample("1h").size()))

# ---- first/last with NULL-leading buckets
d, p = mk([0, 1, 2, H], [np.nan, 4., 6., np.nan])
check("first null-leading",
      lambda: fl(d.resample("1h", on="ts").first()
                 .to_pandas().sort_values("ts")["v"]),
      lambda: fl(p["v"].resample("1h").first()))
check("last null-trailing",
      lambda: fl(d.resample("1h", on="ts").last()
                 .to_pandas().sort_values("ts")["v"]),
      lambda: fl(p["v"].resample("1h").last()))

# ---- sem: resampler uses the GROUPBY convention std/sqrt(count)
d, p = mk([0, 1, 2, H], [1., 2., 4., 9.])
check("sem groupby convention",
      lambda: fl(d.resample("1h", on="ts").sem()
                 .to_pandas().sort_values("ts")["v"]),
      lambda: fl(p["v"].resample("1h").sem()))
# ...while the SCALAR Series.sem face is std/sqrt(n) — pinned
# engine convention (engine-conventions memory), assert both stay
s = bl.Series(np.array([1., 2., 4.]))
eng = float(s.sem())
pdv = float(pd.Series([1., 2., 4.]).sem())  # std/sqrt(n-... )
want_engine = float(np.std([1., 2., 4.], ddof=1) / np.sqrt(3))
if abs(eng - want_engine) > 1e-12:
    print(f"PROBE DIFF [scalar sem pinned] ours={eng!r} "
          f"pinned={want_engine!r} (pandas={pdv!r})")

# ---- grouped resample label alignment: pre-epoch stamps (floor
# toward -inf, not toward 0) and month boundaries, per group
gsec = np.array([-2 * H - 5, -H, 0, 5, H + 1, 2 * H])
gts = base + pd.to_timedelta(gsec, "s")
gg = np.array(["a", "b", "a", "b", "a", "b"], dtype=object)
gv = np.array([1., 2., 3., 4., 5., 6.])
gd = bl.DataFrame({"g": gg, "ts": gts.to_numpy(), "v": gv})
gp = pd.DataFrame({"g": gg, "ts": gts, "v": gv})


def _grouped(stat):
    got = getattr(gd.groupby("g").resample("1h", on="ts"), stat)() \
        .to_pandas().reset_index().sort_values(["g", "ts"])
    want = getattr(gp.set_index("ts").groupby("g").resample("1h"),
                   stat)()["v"].reset_index().sort_values(["g", "ts"])
    lbl_ok = [str(x) for x in got["ts"]] == [str(x) for x in want["ts"]]
    return [lbl_ok, fl(got["v"])]


for stat in ("sum", "mean", "ohlc" if False else "max"):
    check(f"grouped resample {stat} labels+vals",
          lambda stat=stat: list(_grouped(stat)),
          lambda stat=stat: [True, fl(
              getattr(gp.set_index("ts").groupby("g")
                      .resample("1h"), stat)()["v"].reset_index()
              .sort_values(["g", "ts"])["v"])])

# pre-epoch GLOBAL face too (epoch-negative floor)
pe = pd.to_datetime("1969-12-31 22:30:00")
pets = pe + pd.to_timedelta([0, 1800, 3600, 7200], "s")
ped = bl.DataFrame({"ts": pets.to_numpy(),
                    "v": np.array([1., 2., 3., 4.])})
pep = pd.DataFrame({"v": [1., 2., 3., 4.]}, index=pets)
check("pre-epoch hourly labels",
      lambda: [str(x) for x in ped.resample("1h", on="ts").sum()
               .to_pandas().reset_index().sort_values("ts")["ts"]],
      lambda: [str(x) for x in
               pep["v"].resample("1h").sum().index])

# ---- calendar multiples with gaps (2ME end-anchored, 3MS start)
mts = pd.to_datetime(["2024-01-15", "2024-02-20", "2024-07-04"])
md = bl.DataFrame({"ts": mts.to_numpy(),
                   "v": np.array([1., 2., 3.])})
mp_ = pd.DataFrame({"v": [1., 2., 3.]}, index=mts)
for f in ("2ME", "3MS"):
    check(f"calendar {f} gaps",
          lambda f=f: fl(md.resample(f, on="ts").sum()
                         .to_pandas().sort_values("ts")["v"]),
          lambda f=f: fl(mp_["v"].resample(f).sum()))
    check(f"calendar {f} labels",
          lambda f=f: [str(x) for x in md.resample(f, on="ts").sum()
                       .to_pandas().reset_index()
                       .sort_values("ts")["ts"]],
          lambda f=f: [str(x) for x in
                       mp_["v"].resample(f).sum().index])

# ---- window .agg faces: dict, mixed list, str
wv = np.array([1., np.nan, 3., 4., 2., 5.])
ws = bl.Series(wv)
pws = pd.Series(wv)
check(".agg str rolling",
      lambda: fl(ws.rolling(3, min_periods=1).agg("mean")
                 .to_pandas()),
      lambda: fl(pws.rolling(3, min_periods=1).agg("mean")))
check(".agg list rolling (mean,std,median)",
      lambda: [fl(ws.rolling(3, min_periods=2).agg(
          ["mean", "std", "median"]).to_pandas()[c])
          for c in ("mean", "std", "median")],
      lambda: [fl(pws.rolling(3, min_periods=2).agg(
          ["mean", "std", "median"])[c])
          for c in ("mean", "std", "median")])
check(".agg list expanding (sum,var)",
      lambda: [fl(ws.expanding(2).agg(["sum", "var"]).to_pandas()[c])
               for c in ("sum", "var")],
      lambda: [fl(pws.expanding(2).agg(["sum", "var"])[c])
               for c in ("sum", "var")])
wdf = bl.DataFrame({"x": wv, "y": wv[::-1].copy()})
pwdf = pd.DataFrame({"x": wv, "y": wv[::-1]})
check(".agg dict frame rolling",
      lambda: [fl(wdf.rolling(2, min_periods=1)
                  .agg({"x": "sum", "y": "max"}).to_pandas()[c])
               for c in ("x", "y")],
      lambda: [fl(pwdf.rolling(2, min_periods=1)
                  .agg({"x": "sum", "y": "max"})[c])
               for c in ("x", "y")])
check(".agg list frame expanding (flattened (col,stat) names)",
      lambda: [fl(wdf.expanding(1).agg(["mean", "sum"])
                  .to_pandas()[str((c, st))])
               for c in ("x", "y") for st in ("mean", "sum")],
      lambda: [fl(pwdf.expanding(1).agg(["mean", "sum"])[(c, st)])
               for c in ("x", "y") for st in ("mean", "sum")])
check(".agg str frame ewm",
      lambda: [fl(wdf.ewm(alpha=0.4).agg("mean").to_pandas()[c])
               for c in ("x", "y")],
      lambda: [fl(pwdf.ewm(alpha=0.4).agg("mean")[c])
               for c in ("x", "y")])

# ---- resampler median/quantile on a bucket whose values are all
# NaN plus the interpolation default
d, p = mk([0, 1, H, H + 1], [np.nan, np.nan, 1., 4.])
check("median all-nan bucket",
      lambda: fl(d.resample("1h", on="ts").median()
                 .to_pandas().sort_values("ts")["v"]),
      lambda: fl(p["v"].resample("1h").median()))
check("quantile .75 linear",
      lambda: fl(d.resample("1h", on="ts").quantile(0.75)
                 .to_pandas().sort_values("ts")["v"]),
      lambda: fl(p["v"].resample("1h").quantile(0.75)))

# ---- r9 fix regressions ride this wave too: the DataFrame.loc
# label-list face (requested order / duplicates / KeyError) and the
# ewm(times=) row-order pin
lpdf = pd.DataFrame({"k": [10, 20, 30, 20],
                     "v": [1., 2., 3., 4.]}).set_index("k")
ld = bl.DataFrame({"k": np.array([10, 20, 30, 20]),
                   "v": np.array([1., 2., 3., 4.])}).set_index("k")
for req in ([30, 10], [10, 10], [20, 10]):
    check(f"frame loc {req}",
          lambda req=req: [fl(ld.loc[req].to_pandas()["v"]),
                           [int(x) for x in
                            ld.loc[req].to_pandas().index]],
          lambda req=req: [fl(lpdf.loc[req]["v"]),
                           [int(x) for x in lpdf.loc[req].index]])
check("frame loc missing raises",
      lambda: ld.loc[[10, 99]].to_pandas().shape[0],
      lambda: lpdf.loc[[10, 99]].shape[0])
check("to_timedelta str",
      lambda: float(bl.to_timedelta("90min").total_seconds()),
      lambda: float(pd.to_timedelta("90min").total_seconds()))

emt = pd.to_datetime(["2024-01-01", "2024-01-03", "2024-01-02"])
emd = bl.DataFrame({"t": emt.to_numpy(),
                    "v": np.array([1., 2., 3.])})
check("ewm times row order",
      lambda: fl(emd["v"].ewm(halflife="1d", times="t").mean()
                 .to_pandas()),
      lambda: fl(pd.Series([1., 2., 3.]).ewm(
          halflife=pd.Timedelta("1d"),
          times=np.array(emt, dtype="datetime64[ns]")).mean()))
emd2 = bl.DataFrame(
    {"t": pd.to_datetime(["2024-01-01", None, "2024-01-02"])
     .to_numpy(), "v": np.array([1., 2., 3.])})
check("ewm times NaT raises",
      lambda: fl(emd2["v"].ewm(halflife="1d", times="t").mean()
                 .to_pandas()),
      lambda: fl(pd.Series([1., 2., 3.]).ewm(
          halflife=pd.Timedelta("1d"),
          times=np.array(pd.to_datetime(
              ["2024-01-01", None, "2024-01-02"]),
              dtype="datetime64[ns]")).mean()))

print("probe wave 20 done")
