"""Adversarial pandas-parity probe wave 19: time-decay EWM
(ewm(halflife=..., times=...)) under its own edge inputs — duplicate
stamps (zero dt, equal weights), all-NaN series, NaN run at the
start, single row, two rows a thousand halflives apart (underflow
forward-fill), a halflife far larger than the span (≈ plain
expanding mean), sub-second stamps, min_periods gating, frame face
with per-column null patterns, grouped face with a single-row group.

Run: python tools/probe_wave19.py — grep for 'PROBE DIFF'.
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
    return (bl.DataFrame({"ts": ts.to_numpy(),
                          "v": np.asarray(v, dtype=float)})
            .set_index("ts")["v"],
            pd.Series(np.asarray(v, dtype=float)), ts)


def pewm(ps, ts, hl, **kw):
    return ps.ewm(halflife=pd.Timedelta(hl), times=ts, **kw).mean()


s, ps, ts = mk([0, 10, 10, 10, 40], [1., 2., 4., np.nan, 8.])
check("dup stamps",
      lambda: fl(s.ewm(halflife="20s").mean().to_pandas()),
      lambda: fl(pewm(ps, ts, "20s")))
s, ps, ts = mk([0, 5, 9], [np.nan, np.nan, np.nan])
check("all-nan",
      lambda: fl(s.ewm(halflife="10s").mean().to_pandas()),
      lambda: fl(pewm(ps, ts, "10s")))
s, ps, ts = mk([0, 5, 9, 14], [np.nan, np.nan, 3., 5.])
check("leading nan run",
      lambda: fl(s.ewm(halflife="10s").mean().to_pandas()),
      lambda: fl(pewm(ps, ts, "10s")))
s, ps, ts = mk([7], [4.])
check("single row",
      lambda: fl(s.ewm(halflife="10s").mean().to_pandas()),
      lambda: fl(pewm(ps, ts, "10s")))
s, ps, ts = mk([0, 10000], [2., 6.])
check("1000-halflife gap",
      lambda: fl(s.ewm(halflife="10s").mean().to_pandas()),
      lambda: fl(pewm(ps, ts, "10s")))
s, ps, ts = mk([0, 3, 8, 12], [1., 2., 3., 4.])
check("halflife >> span (expanding-ish)",
      lambda: fl(s.ewm(halflife="365d").mean().to_pandas()),
      lambda: fl(pewm(ps, ts, "365d")))
# TRIAGED pandas-side artifact: at sub-second halflives pandas'
# kernel loses ~4e-8 relative precision in its delta conversion
# (err 0.0 for the identical ratio at second scale; ours matches
# the closed form (2+2^-.5)/(1+2^-.5) exactly), so this probe pins
# OUR exact value and checks pandas only loosely.
s, ps, ts = mk([0.0, 0.25], [1., 2.])
w = 2.0 ** -0.5
check("sub-second stamps exact closed form",
      lambda: fl(s.ewm(halflife="500ms").mean().to_pandas()),
      lambda: [1.0, (2 + w) / (1 + w)])
check("sub-second stamps pandas within 1e-6",
      lambda: float(abs(s.ewm(halflife="500ms").mean()
                        .to_pandas().iloc[-1]
                        - pewm(ps, ts, "500ms").iloc[-1]) < 1e-6),
      lambda: 1.0)
s, ps, ts = mk([0, 4, 9, 15, 22], [1., np.nan, 3., np.nan, 5.])
check("min_periods=3",
      lambda: fl(s.ewm(halflife="30s", min_periods=3).mean()
                 .to_pandas()),
      lambda: fl(pewm(ps, ts, "30s", min_periods=3)))

# frame face: per-column null patterns
secs = [0, 6, 13, 21, 30]
ts = base + pd.to_timedelta(secs, "s")
pdf = pd.DataFrame({"a": [1., np.nan, 3., 4., np.nan],
                    "b": [np.nan, 2., np.nan, 4., 5.]},
                   index=ts)
d = bl.DataFrame({"ts": ts.to_numpy(), "a": pdf["a"].to_numpy(),
                  "b": pdf["b"].to_numpy()}).set_index("ts")
got = d.ewm(halflife="15s").mean().to_pandas()
want = pdf.ewm(halflife=pd.Timedelta("15s"), times=pdf.index).mean()
for c in ("a", "b"):
    check(f"frame col {c}",
          lambda c=c: fl(got[c]),
          lambda c=c: fl(want[c]))

# grouped face: single-row group + a dense group
g = np.array(["solo", "x", "x", "x", "x"])
pg = pd.DataFrame({"g": g, "ts": ts, "v": [9., 1., 2., 3., 4.]})
bg = bl.DataFrame({"g": g, "ts": ts.to_numpy(),
                   "v": np.array([9., 1., 2., 3., 4.])}) \
    .sort_values("ts")
check("grouped single-row group",
      lambda: fl(bg.groupby("g").ewm(halflife="15s", times="ts")
                 .mean().to_pandas().sort_values("ts")["v"]),
      lambda: fl(pg.groupby("g", sort=False)[["ts", "v"]]
                 .apply(lambda x: pd.Series(
                     x["v"].ewm(halflife=pd.Timedelta("15s"),
                                times=x["ts"]).mean().to_numpy(),
                     index=x.index))
                 .reset_index(level=0, drop=True).sort_index()))

print("wave 19 done")
