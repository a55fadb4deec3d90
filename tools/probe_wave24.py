"""Adversarial pandas-parity probe wave 24: the window .agg faces —
this wave FOUND TWO REAL BUGS (both fixed in-round, pinned in
test_time_rolling_agg_fused_and_mixed_r10,
test_fixed_window_agg_dup_label_index_r10,
test_frame_window_agg_dup_label_index_r10):

1. The one-column-bind-per-stat .agg shape joined each statistic's
   output by INDEX LABEL — on duplicate-label indexes (e.g. a ts
   index with repeated stamps) rows silently mis-aligned and values
   deduped. All binders now join POSITIONALLY (fresh dense
   positions per output); the time-rolling face routes any
   order-stat mix through ONE budgeted pandas pass instead.
2. Duplicate output names (.agg(['sum','sum'])) surfaced as a deep
   AnalysisException; empty requests as IndexError. Both now raise
   pandas-shaped/clear ValueErrors (engine columns are uniquely
   named — dict aliasing is the spelling for repeated stats; this
   is a PINNED divergence from pandas' duplicate-column frames).

Run: python tools/probe_wave24.py — grep for 'PROBE DIFF'.
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

rng = np.random.default_rng(24)
n = 120
lab = np.sort(rng.integers(0, 40, n))       # duplicate labels
v = rng.normal(size=n)
v[rng.random(n) < 0.1] = np.nan
d = bl.DataFrame({"i": lab, "v": v}).set_index("i")
ps = pd.Series(v, index=lab)

# fixed rolling + expanding .agg on dup-label index
for face, mk_o, mk_p in (
        ("rolling", lambda: d["v"].rolling(5, min_periods=2),
         lambda: ps.rolling(5, min_periods=2)),
        ("expanding", lambda: d["v"].expanding(2),
         lambda: ps.expanding(2))):
    got = mk_o().agg(["sum", "median"]).to_pandas()
    check(f"{face} agg sum dup-label", lambda g=got: fl(g["sum"]),
          lambda p=mk_p(): fl(p.sum()))
    check(f"{face} agg median dup-label",
          lambda g=got: fl(g["median"]),
          lambda p=mk_p(): fl(p.median()))
    check(f"{face} agg index", lambda g=got: list(g.index),
          lambda: list(lab))

# time rolling: fused moment family + mixed, dup stamps
secs = np.sort(rng.integers(0, 20000, n))
secs[30] = secs[29]
secs[31] = secs[29]
ts = pd.to_datetime("2024-01-01") + pd.to_timedelta(secs, "s")
dt = bl.DataFrame({"t": ts.to_numpy(), "v": v}).set_index("t")
pt = pd.Series(v, index=ts)
gm = dt["v"].rolling("30min", min_periods=2) \
    .agg(["sum", "var", "sem"]).to_pandas()
pm = pt.rolling("30min", min_periods=2)
for st in ("sum", "var", "sem"):
    check(f"troll fused {st}", lambda s_=st, g=gm: fl(g[s_]),
          lambda s_=st: fl(getattr(pm, s_)()))
gx = dt["v"].rolling("30min").agg({"a": "mean", "b": "rank"}) \
    .to_pandas()
check("troll mixed mean", lambda: fl(gx["a"]),
      lambda: fl(pt.rolling("30min").mean()))
check("troll mixed rank", lambda: fl(gx["b"]),
      lambda: fl(pt.rolling("30min").rank()))

# frame binder on dup-label index
x2 = rng.normal(size=n)
df = bl.DataFrame({"i": lab, "x": v, "y": x2}).set_index("i")
pf = pd.DataFrame({"x": v, "y": x2}, index=lab)
gf = df.rolling(4, min_periods=2).agg({"x": "sum", "y": "median"}) \
    .to_pandas()
check("frame agg x", lambda: fl(gf["x"]),
      lambda: fl(pf["x"].rolling(4, min_periods=2).sum()))
check("frame agg y", lambda: fl(gf["y"]),
      lambda: fl(pf["y"].rolling(4, min_periods=2).median()))

# gates: empty -> ValueError both sides; duplicate names -> PINNED
# engine ValueError (pandas returns duplicate columns)
check("empty agg raises",
      lambda: fl(d["v"].rolling(3).agg([]).to_pandas()["v"]),
      lambda: fl(ps.rolling(3).agg([])))
try:
    d["v"].rolling(3, min_periods=1).agg(["sum", "sum"])
    print("PROBE DIFF [dup names pin] ours=no error "
          "(pin expects ValueError)")
except ValueError:
    pass

print("probe wave 24 done")
