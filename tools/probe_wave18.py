"""Adversarial pandas-parity probe wave 18: the time-offset rolling
windows under their own edge inputs — heavy duplicate stamps (the
positional j <= i tie rule), a window narrower than every gap
(single-row windows), a window wider than the whole span, all-NaN
values, min_periods above the reachable count, sub-second stamps,
single row, two rows at the same stamp, frame face with an int
column, grouped RANGE face at group boundaries.

Run: python tools/probe_wave18.py — grep for 'PROBE DIFF'.
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


def mk(ts, v):
    return bl.DataFrame({"ts": ts.to_numpy(), "v": np.asarray(v)}) \
        .set_index("ts")["v"]


base = pd.to_datetime("2024-03-01")

# heavy duplicates: five rows at one stamp
ts = base + pd.to_timedelta([0, 10, 10, 10, 10, 10, 40], "s")
v = [1., 2., np.nan, 4., 8., 16., 32.]
ps = pd.Series(v, index=ts)
check("dup-stamp sum",
      lambda: fl(mk(ts, v).rolling("15s").sum().to_pandas()),
      lambda: fl(ps.rolling("15s").sum()))
check("dup-stamp count",
      lambda: fl(mk(ts, v).rolling("15s").count().to_pandas()),
      lambda: fl(ps.rolling("15s").count()))
check("dup-stamp var mp=2",
      lambda: fl(mk(ts, v).rolling("1min", min_periods=2).var()
                 .to_pandas()),
      lambda: fl(ps.rolling("1min", min_periods=2).var()))

# window narrower than every gap: single-row windows
ts2 = base + pd.to_timedelta([0, 100, 200, 300], "s")
v2 = [1., np.nan, 3., 4.]
ps2 = pd.Series(v2, index=ts2)
check("gap>window mean",
      lambda: fl(mk(ts2, v2).rolling("30s").mean().to_pandas()),
      lambda: fl(ps2.rolling("30s").mean()))
# window wider than the span
check("window>span sum",
      lambda: fl(mk(ts2, v2).rolling("2h").sum().to_pandas()),
      lambda: fl(ps2.rolling("2h").sum()))
# all-NaN values
vn = [np.nan] * 4
check("all-nan count",
      lambda: fl(mk(ts2, vn).rolling("5min").count().to_pandas()),
      lambda: fl(pd.Series(vn, index=ts2).rolling("5min").count()))
check("all-nan sum mp=1",
      lambda: fl(mk(ts2, vn).rolling("5min", min_periods=1).sum()
                 .to_pandas()),
      lambda: fl(pd.Series(vn, index=ts2)
                 .rolling("5min", min_periods=1).sum()))
# min_periods unreachable
check("mp unreachable",
      lambda: fl(mk(ts2, v2).rolling("30s", min_periods=5).sum()
                 .to_pandas()),
      lambda: fl(ps2.rolling("30s", min_periods=5).sum()))
# sub-second stamps
ts3 = base + pd.to_timedelta([0, 0.4, 0.9, 1.5, 2.1], "s")
v3 = [1., 2., 3., 4., 5.]
ps3 = pd.Series(v3, index=ts3)
check("sub-second 1s window",
      lambda: fl(mk(ts3, v3).rolling("1s").sum().to_pandas()),
      lambda: fl(ps3.rolling("1s").sum()))
# single row
check("single row",
      lambda: fl(mk(base + pd.to_timedelta([5], "s"), [7.])
                 .rolling("10s").sum().to_pandas()),
      lambda: fl(pd.Series([7.], index=base + pd.to_timedelta(
          [5], "s")).rolling("10s").sum()))

# frame face with an int column
ts4 = base + pd.to_timedelta([0, 5, 11, 17, 30], "s")
pdf = pd.DataFrame({"a": [1, 2, 3, 4, 5],
                    "b": [1., np.nan, 3., 4., 5.]},
                   index=ts4)
bd = bl.DataFrame({"ts": ts4.to_numpy(),
                   "a": np.array([1, 2, 3, 4, 5]),
                   "b": pdf["b"].to_numpy()}).set_index("ts")
check("frame int col mean",
      lambda: fl(bd.rolling("10s").mean().to_pandas()["a"]),
      lambda: fl(pdf.rolling("10s").mean()["a"]))

# grouped RANGE face: boundary of each group
g = np.array(["x", "y", "x", "y", "x"])
pg = pd.DataFrame({"g": g, "v": v3}, index=ts3)
bg = bl.DataFrame({"g": g, "ts": ts3.to_numpy(),
                   "v": np.array(v3)}).sort_values("ts")
check("grouped time sum per group",
      lambda: fl(bg.groupby("g")[["v"]].rolling("1s").sum()
                 .to_pandas()["v"]),
      lambda: fl(pg.groupby("g", sort=False)[["v"]].rolling("1s")
                 .sum().reset_index(level=0)
                 .sort_index()["v"]))

print("wave 18 done")
