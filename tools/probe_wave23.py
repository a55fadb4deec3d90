"""Adversarial pandas-parity probe wave 23: the r10 second batch —
loc ASSIGNMENT corners (all-False mask, NaN value, string columns,
int->float upcast, duplicate frame labels via label list, duplicate
labels IN the request list, multi-column writes with mixed dtypes,
list-value refusal), the fused agg_pairs extension vs the
one-stat-per-call faces under min_periods, the distributed
label-gather .loc (null labels, single-label Series, empty Series),
and xs(level=list) with drop_level=False.

Run: python tools/probe_wave23.py — grep for 'PROBE DIFF'.
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


def mk():
    pdf = pd.DataFrame({"a": [1.0, 2, 3, 4], "b": [10.0, 20, 30, 40],
                        "s": list("wxyz")},
                       index=pd.Index([10, 20, 30, 40], name="i"))
    d = bl.DataFrame({"i": [10, 20, 30, 40], "a": [1.0, 2, 3, 4],
                      "b": [10.0, 20, 30, 40], "s": list("wxyz")}) \
        .set_index("i")
    return pdf, d


# ---- loc assignment corners
pdf, d = mk()
pdf.loc[pdf["a"] > 99, "b"] = -1.0    # all-False: no-op, no error
d.loc[d["a"] > 99, "b"] = -1.0
check("locset all-False", lambda: fl(d.to_pandas()["b"]),
      lambda: fl(pdf["b"]))

pdf, d = mk()
pdf.loc[pdf["a"] > 2, "b"] = np.nan   # NaN value (engine NULL)
d.loc[d["a"] > 2, "b"] = np.nan
check("locset NaN value", lambda: fl(d.to_pandas()["b"]),
      lambda: fl(pdf["b"]))

pdf, d = mk()
pdf.loc[pdf["a"] > 2, "s"] = "ZZ"     # string column write
d.loc[d["a"] > 2, "s"] = "ZZ"
check("locset string col", lambda: list(d.to_pandas()["s"]),
      lambda: list(pdf["s"]))

# int -> float upcast on a masked write
pi = pd.DataFrame({"k": [1, 2, 3]},
                  index=pd.Index([1, 2, 3], name="i"))
di = bl.DataFrame({"i": [1, 2, 3], "k": [1, 2, 3]}).set_index("i")
pi.loc[pi["k"] > 1, "k"] = 0.5
di.loc[di["k"] > 1, "k"] = 0.5
check("locset int->float upcast", lambda: fl(di.to_pandas()["k"]),
      lambda: fl(pi["k"]))

# duplicate FRAME labels + label-list target: every matching row set
pdd = pd.DataFrame({"a": [1.0, 2, 3]},
                   index=pd.Index([10, 10, 20], name="i"))
ddd = bl.DataFrame({"i": [10, 10, 20], "a": [1.0, 2, 3]}) \
    .set_index("i")
pdd.loc[[10], "a"] = 0.0
ddd.loc[[10], "a"] = 0.0
check("locset dup frame labels", lambda: fl(ddd.to_pandas()["a"]),
      lambda: fl(pdd["a"]))

# duplicate labels IN the request list: one write per row, same
pdf, d = mk()
pdf.loc[[10, 10, 20], "a"] = 9.0
d.loc[[10, 10, 20], "a"] = 9.0
check("locset dup request labels", lambda: fl(d.to_pandas()["a"]),
      lambda: fl(pdf["a"]))

# multi-column write, mixed dtypes
pdf, d = mk()
pdf.loc[pdf["a"] > 2, ["a", "b"]] = 0.0
d.loc[d["a"] > 2, ["a", "b"]] = 0.0
check("locset multi-col",
      lambda: fl(d.to_pandas()["a"]) + fl(d.to_pandas()["b"]),
      lambda: fl(pdf["a"]) + fl(pdf["b"]))

# list value: engine refuses (selected-rows positional in pandas);
# the refusal must be raised, not a silent wrong write
pdf, d = mk()
try:
    d.loc[d["a"] > 2, "b"] = [1.0, 2.0]
    print("PROBE DIFF [locset list value] ours=no error "
          "(must refuse)")
except NotImplementedError:
    pass

# ---- agg_pairs vs one-stat-per-call faces under min_periods
rng = np.random.default_rng(23)
n = 150
secs = np.sort(rng.integers(0, 20000, n))
ts = pd.to_datetime("2024-01-01") + pd.to_timedelta(secs, "s")
x = rng.normal(size=n)
y = rng.normal(size=n)
x[rng.random(n) < 0.15] = np.nan
dt = bl.DataFrame({"ts": ts.to_numpy(), "x": x, "y": y}) \
    .set_index("ts")
fused = dt.rolling("25min", min_periods=3).agg_pairs({
    "sx": ("sum", "x"), "mx": ("mean", "x"), "nx": ("count", "x"),
    "cxy": ("corr", "x", "y"), "vxy": ("cov", "x", "y")}).to_pandas()
check("agg_pairs sum mp=3", lambda: fl(fused["sx"]),
      lambda: fl(dt["x"].rolling("25min", min_periods=3).sum()
                 .to_pandas()))
check("agg_pairs mean mp=3", lambda: fl(fused["mx"]),
      lambda: fl(dt["x"].rolling("25min", min_periods=3).mean()
                 .to_pandas()))
check("agg_pairs count mp=3", lambda: fl(fused["nx"]),
      lambda: fl(dt["x"].rolling("25min", min_periods=3).count()
                 .to_pandas()))
check("agg_pairs corr", lambda: fl(fused["cxy"]),
      lambda: fl(dt["x"].rolling("25min", min_periods=3)
                 .corr(dt["y"]).to_pandas()))
check("agg_pairs cov", lambda: fl(fused["vxy"]),
      lambda: fl(dt["x"].rolling("25min", min_periods=3)
                 .cov(dt["y"]).to_pandas()))
# all-NaN x: pair stats all NULL, count 0
dn = bl.DataFrame({"ts": ts[:5].to_numpy(),
                   "x": [np.nan] * 5, "y": [1.0, 2, 3, 4, 5]}) \
    .set_index("ts")
fn = dn.rolling("25min", min_periods=1).agg_pairs({
    "nx": ("count", "x"), "cxy": ("corr", "x", "y")}).to_pandas()
check("agg_pairs all-NaN x",
      lambda: fl(fn["nx"]) + fl(fn["cxy"]),
      lambda: fl(pd.Series([np.nan] * 5, index=ts[:5])
                 .rolling("25min", min_periods=1).count())
      + [float("nan")] * 5)

# ---- distributed label-gather corners
pdf, d = mk()
one = bl.DataFrame({"x": [30]})["x"]
check("label-gather single",
      lambda: fl(d.loc[one].to_pandas()["a"]),
      lambda: fl(pdf.loc[pd.Series([30])]["a"]))
emp = bl.DataFrame({"x": np.array([], dtype=np.int64)})["x"]
check("label-gather empty",
      lambda: fl(d.loc[emp].to_pandas()["a"]),
      lambda: fl(pdf.loc[pd.Series([], dtype=np.int64)]["a"]))

# ---- xs(level=list, drop_level=False)
mi = pd.MultiIndex.from_tuples(
    [(1, "a", "p"), (2, "a", "q"), (2, "b", "p")],
    names=["x", "y", "z"])
px = pd.DataFrame({"v": [1.0, 2, 3]}, index=mi)
dx = bl.DataFrame({"x": [1, 2, 2], "y": list("aab"),
                   "z": list("pqp"), "v": [1.0, 2, 3]}) \
    .set_index(["x", "y", "z"])
check("xs level-list keep levels",
      lambda: list(dx.xs(("a", 2), level=["y", "x"],
                         drop_level=False).to_pandas().index.names),
      lambda: list(px.xs(("a", 2), level=["y", "x"],
                         drop_level=False).index.names))
check("xs level-list keep values",
      lambda: fl(dx.xs(("a", 2), level=["y", "x"],
                       drop_level=False).to_pandas()["v"]),
      lambda: fl(px.xs(("a", 2), level=["y", "x"],
                       drop_level=False)["v"]))

print("probe wave 23 done")
