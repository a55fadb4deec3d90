"""Adversarial pandas-parity probe wave 22: the r9 budget/broadcast
seams plus the r10 directive surface — the expanding/time-rolling
max_rows budget boundary EXACTLY at the row count, the time-roll
subtrahend broadcast face at REAL sizes straddling
_TR_BROADCAST_MAX_ROWS (199,999 vs 200,001 rows: both faces must
produce identical numbers), loc boolean LISTS on a boolean-dtype
index (ambiguous: mask or labels?), reorder_levels with integer
order and with duplicate level names, groupby corr
(method='spearman') with all-tied and n=1 groups, Resampler
.interpolate(limit=) with a gap longer than the limit, and the r10
additions (loc boolean-Series alignment corners, time-rolling
rank/sem/skew/kurt/apply, xs(level=), ewm(times=Series)).

Run: python tools/probe_wave22.py — grep for 'PROBE DIFF'.
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
    return base + pd.to_timedelta(np.asarray(secs), "s")


# ---- budget boundary EXACTLY at the row count: n == max_rows must
# pass, n == max_rows is the largest allowed, max_rows = n - 1 must
# raise (both expanding and time-rolling faces)
ts = mkts([0, 60, 120, 180, 240])
v = np.array([3.0, 1.0, np.nan, 2.0, 5.0])
d5 = bl.DataFrame({"t": ts.to_numpy(), "v": v}).set_index("t")
p5 = pd.Series(v, index=ts)
check("budget n==max_rows expanding median",
      lambda: fl(d5["v"].expanding().median(max_rows=5).to_pandas()),
      lambda: fl(p5.expanding().median()))
check("budget n==max_rows time-roll rank",
      lambda: fl(d5["v"].rolling("3min").rank(max_rows=5)
                 .to_pandas()),
      lambda: fl(p5.rolling("3min").rank()))
try:
    d5["v"].rolling("3min").median(max_rows=4)
    print("PROBE DIFF [budget n-1 should raise] ours=no error")
except ValueError:
    pass

# ---- broadcast face at REAL straddling sizes: 199,999 rows rides
# the broadcast searchsorted face, 200,001 rides the union-carry
# as-of face — both must equal the same prefix-difference numbers.
# Compare a digest (nan count + nansum) of rolling sum against a
# direct pandas run at each size.
for n in (199_999, 200_001):
    rng = np.random.default_rng(n)
    secs = np.sort(rng.integers(0, 5_000_000, n))
    stamps = mkts(secs)
    vals = rng.normal(size=n)
    vals[rng.random(n) < 0.05] = np.nan
    dd = bl.DataFrame({"t": stamps.to_numpy(), "v": vals}) \
        .set_index("t")
    pp = pd.Series(vals, index=stamps)

    def ours(dd=dd):
        got = dd["v"].rolling("30min").sum().to_pandas().to_numpy()
        return [float(np.isnan(got).sum()), float(np.nansum(got))]

    def theirs(pp=pp):
        want = pp.rolling("30min").sum().to_numpy()
        return [float(np.isnan(want).sum()), float(np.nansum(want))]

    check(f"broadcast-face straddle n={n}", ours, theirs)

# ---- loc boolean LISTS on a boolean-dtype index: pandas treats a
# boolean list as a positional mask even when the index itself is
# boolean (the mask interpretation wins)
db = bl.DataFrame({"i": [True, False, True],
                   "v": [1.0, 2.0, 3.0]}).set_index("i")
pb = pd.DataFrame({"v": [1.0, 2.0, 3.0]},
                  index=pd.Index([True, False, True], name="i"))
check("loc bool list on bool index",
      lambda: fl(db.loc[[True, False, True]].to_pandas()["v"]),
      lambda: fl(pb.loc[[True, False, True]]["v"]))
check("loc bool list wrong len on bool index",
      lambda: fl(db.loc[[True, False]].to_pandas()["v"]),
      lambda: fl(pb.loc[[True, False]]["v"]))

# ---- reorder_levels: integer order, reversed ints, and duplicate
# NAMES in the order list (pandas raises on ambiguous duplicates)
mi = pd.MultiIndex.from_tuples(
    [(1, "a", 10.0), (2, "b", 20.0)], names=["x", "y", "z"])
pm = pd.DataFrame({"v": [1.0, 2.0]}, index=mi)
dm = bl.DataFrame({"x": [1, 2], "y": ["a", "b"],
                   "z": [10.0, 20.0], "v": [1.0, 2.0]}) \
    .set_index(["x", "y", "z"])
check("reorder_levels ints",
      lambda: dm.reorder_levels([2, 0, 1]).to_pandas()
      .index.names.__iter__().__reduce__()[1][0] if False else
      list(dm.reorder_levels([2, 0, 1]).to_pandas().index.names),
      lambda: list(pm.reorder_levels([2, 0, 1]).index.names))
check("reorder_levels negative? names",
      lambda: list(dm.reorder_levels(["z", "y", "x"]).to_pandas()
                   .index.names),
      lambda: list(pm.reorder_levels(["z", "y", "x"]).index.names))
# wave-22 FINDING, triaged to a PIN: pandas reorder_levels accepts
# NON-permutations (['z','z','x'] duplicates z and silently drops
# y); the engine's index levels are backed by uniquely-named
# columns, so duplicate levels are incoherent here — the ValueError
# naming the permutation requirement is the pinned divergence
# (COVERAGE.md r10)
try:
    dm.reorder_levels(["z", "z", "x"])
    print("PROBE DIFF [reorder_levels dup pin] ours=no error "
          "(pin expects ValueError)")
except ValueError:
    pass

# ---- grouped spearman: all-tied groups (zero variance in ranks)
# and n=1 groups -> pandas emits NaN
gg = np.array(["a", "a", "a", "b", "c", "c"])
u = np.array([2.0, 2.0, 2.0, 1.0, 4.0, 5.0])
w = np.array([7.0, 7.0, 7.0, 3.0, 2.0, 1.0])
dg = bl.DataFrame({"g": gg, "u": u, "w": w})
pg = pd.DataFrame({"g": gg, "u": u, "w": w})
check("grouped spearman all-tied + n=1",
      lambda: fl(dg.groupby("g")[["u", "w"]]
                 .corr(method="spearman").to_pandas()
                 .sort_index().loc[(slice(None), "u"), "w"]),
      lambda: fl(pg.groupby("g")[["u", "w"]]
                 .corr(method="spearman")
                 .sort_index().loc[(slice(None), "u"), "w"]))

# ---- Resampler.interpolate(limit=) with a gap LONGER than the
# limit: only `limit` buckets after each real stamp get filled
its = mkts([0, 6 * 3600])
di = bl.DataFrame({"t": its.to_numpy(), "v": np.array([0.0, 12.0])})
pi = pd.DataFrame({"v": [0.0, 12.0]}, index=its)
check("interpolate limit shorter than gap",
      lambda: fl(di.resample("1h", on="t").interpolate(limit=2)
                 .to_pandas().sort_index()["v"]),
      lambda: fl(pi.resample("1h").interpolate(limit=2)["v"]))
check("interpolate limit=1",
      lambda: fl(di.resample("1h", on="t").interpolate(limit=1)
                 .to_pandas().sort_index()["v"]),
      lambda: fl(pi.resample("1h").interpolate(limit=1)["v"]))

# ---- r10 loc boolean-Series alignment corners: empty-True mask,
# all-False mask, mask whose index is a superset AND shuffled
pdf = pd.DataFrame({"a": [1.0, 2.0, 3.0]},
                   index=pd.Index([10, 20, 30], name="i"))
dl = bl.DataFrame({"i": [10, 20, 30], "a": [1.0, 2.0, 3.0]}) \
    .set_index("i")
mall = bl.DataFrame({"i": [30, 10, 20, 40],
                     "m": [False, False, False, True]}) \
    .set_index("i")["m"]
pall = pd.Series([False, False, False], index=[30, 10, 20])
check("loc aligned all-False",
      lambda: fl(dl.loc[mall].to_pandas()["a"]),
      lambda: fl(pdf.loc[pall]["a"]))
msh = bl.DataFrame({"i": [20, 30, 10, 99],
                    "m": [True, False, True, True]}) \
    .set_index("i")["m"]
psh = pd.Series([True, False, True], index=[20, 30, 10])
check("loc aligned shuffled superset",
      lambda: fl(dl.loc[msh].to_pandas()["a"]),
      lambda: fl(pdf.loc[psh]["a"]))
check("loc aligned shuffled superset index",
      lambda: [int(x) for x in dl.loc[msh].to_pandas().index],
      lambda: [int(x) for x in pdf.loc[psh].index])

# ---- r10 time-rolling new stats: single row, all-NaN window,
# duplicate stamps at the boundary, apply returning nan
t1 = mkts([0])
d1 = bl.DataFrame({"t": t1.to_numpy(), "v": [4.0]}).set_index("t")
p1 = pd.Series([4.0], index=t1)
for st in ("rank", "skew", "kurt", "sem"):
    check(f"troll {st} single row",
          lambda st=st: fl(getattr(d1["v"].rolling("5min"), st)()
                           .to_pandas()),
          lambda st=st: fl(getattr(p1.rolling("5min"), st)()))
tn = mkts([0, 60, 60, 120])
vn = np.array([np.nan, np.nan, 2.0, 2.0])
dn = bl.DataFrame({"t": tn.to_numpy(), "v": vn}).set_index("t")
pn = pd.Series(vn, index=tn)
for st in ("rank", "skew", "kurt", "sem"):
    check(f"troll {st} nan+dup stamps",
          lambda st=st: fl(getattr(dn["v"].rolling("2min"), st)()
                           .to_pandas()),
          lambda st=st: fl(getattr(pn.rolling("2min"), st)()))
check("troll apply nan-return",
      lambda: fl(dn["v"].rolling("2min")
                 .apply(lambda x: float(np.nanstd(x))
                        if len(x) else np.nan, raw=True)
                 .to_pandas()),
      lambda: fl(pn.rolling("2min")
                 .apply(lambda x: float(np.nanstd(x))
                        if len(x) else np.nan, raw=True)))

# ---- r10 xs(level=) corners: value duplicated across OTHER levels,
# drop_level=False shape, KeyError parity on missing key
mi2 = pd.MultiIndex.from_tuples(
    [(1, "a"), (1, "a"), (2, "a"), (2, "b")], names=["x", "y"])
px = pd.DataFrame({"v": [1.0, 2.0, 3.0, 4.0]}, index=mi2)
dx = bl.DataFrame({"x": [1, 1, 2, 2], "y": ["a", "a", "a", "b"],
                   "v": [1.0, 2.0, 3.0, 4.0]}).set_index(["x", "y"])
check("xs level dup rows",
      lambda: fl(dx.xs("a", level="y").to_pandas()
                 .sort_values("v")["v"]),
      lambda: fl(px.xs("a", level="y").sort_values("v")["v"]))
check("xs level keeps level",
      lambda: list(dx.xs("b", level="y", drop_level=False)
                   .to_pandas().index.names),
      lambda: list(px.xs("b", level="y", drop_level=False)
                   .index.names))
check("xs level missing key raises",
      lambda: fl(dx.xs("zz", level="y").to_pandas()["v"]),
      lambda: fl(px.xs("zz", level="y")["v"]))

# ---- r10 ewm(times=Series): non-monotonic stamps through the
# Series spelling must equal the string spelling AND pandas
nm = mkts([0, 300, 100, 100, 900])
vv = np.array([1.0, 2.0, np.nan, 4.0, 0.5])
de = bl.DataFrame({"t": nm.to_numpy(), "v": vv})
check("ewm times=Series non-monotonic",
      lambda: fl(de["v"].ewm(halflife="2min", times=de["t"]).mean()
                 .to_pandas()),
      lambda: fl(pd.Series(vv).ewm(halflife=pd.Timedelta("2min"),
                                   times=nm).mean()))

print("probe wave 22 done")
