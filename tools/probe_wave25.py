"""Adversarial pandas-parity probe wave 25 — the r11 fix surface:

1. center-rank carried tail min_periods gate (r10 verdict bug #1):
   rolling(w, center=True).rank() must NaN-gate every carried tail
   row on the TRUNCATED window [i-h2, n-1]'s valid count vs
   min_periods — default mp = window means every truncated row is
   NaN. Probed across (w, mp) incl. default mp, NaN runs crossing
   the h2 boundary, w > n, even windows, frame face.
2. sem at the n == ddof boundary (r10 verdict bug #2): pandas emits
   +inf (finite sample std / sqrt(0)) unless the window is constant
   (0/0 -> NaN). Probed ddof in {0,1,2,3} on expanding, fixed
   rolling, and time-offset rolling faces, Series and frame.
3. loc gates: null label present in the index (eqNullSafe parity),
   empty-list row selector as a no-op write, xs drop_level on the
   scalar path.
4. (appended as r11 lands them) grouped window .agg faces.

Run: python tools/probe_wave25.py — grep for 'PROBE DIFF'.
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
        if a != a and b != b:
            return True
        if np.isinf(a) or np.isinf(b):
            return a == b
        return abs(a - b) < 1e-8
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

# ---- 1. center-rank tail gate -------------------------------------
datasets = {
    "plain": [3., 1., 4., 1., 5., 9., 2.],
    "nan_tail": [3., 1., 4., np.nan, 5., 9., np.nan],
    "nan_run_h2": [3., 1., 4., 1., np.nan, np.nan, 2.],
    "all_nan_tail": [3., 1., 4., np.nan, np.nan, np.nan, np.nan],
    "short": [1., 2.],
}
faces = [(3, None), (5, None), (4, None), (6, None), (5, 2),
         (3, 1), (5, 4), (9, 3), (2, None)]
for dname, data in datasets.items():
    for w, mp in faces:
        s = bl.Series(np.array(data))
        p = pd.Series(data)
        check(f"center-rank {dname} w={w} mp={mp}",
              lambda s=s, w=w, mp=mp: fl(
                  s.rolling(w, min_periods=mp, center=True).rank()
                  .to_pandas()),
              lambda p=p, w=w, mp=mp: fl(
                  p.rolling(w, min_periods=mp, center=True).rank()))
        check(f"center-rank pct {dname} w={w} mp={mp}",
              lambda s=s, w=w, mp=mp: fl(
                  s.rolling(w, min_periods=mp, center=True)
                  .rank(method="min", pct=True).to_pandas()),
              lambda p=p, w=w, mp=mp: fl(
                  p.rolling(w, min_periods=mp, center=True)
                  .rank(method="min", pct=True)))

# frame face: two columns with DIFFERENT NaN tails -> per-col cutoffs
fx = [3., 1., 4., 1., 5., 9., 2.]
fy = [3., 1., 4., 1., np.nan, np.nan, np.nan]
for w, mp in ((3, None), (5, 2), (4, None), (5, 3)):
    bf = bl.DataFrame({"x": np.array(fx), "y": np.array(fy)})
    pf = pd.DataFrame({"x": fx, "y": fy})
    got = bf.rolling(w, min_periods=mp, center=True).rank() \
        .to_pandas()
    exp = pf.rolling(w, min_periods=mp, center=True).rank()
    for c in ("x", "y"):
        check(f"frame center-rank {c} w={w} mp={mp}",
              lambda g=got, c=c: fl(g[c]),
              lambda e=exp, c=c: fl(e[c]))

# ---- 2. sem n == ddof boundary ------------------------------------
sem_data = {
    "vary": [1., 2., 4., 8., 16.],
    "const": [5., 5., 5., 5., 5.],
    "nan_mix": [1., np.nan, 2., np.nan, 4.],
}
for dname, data in sem_data.items():
    for ddof in (0, 1, 2, 3):
        s = bl.Series(np.array(data))
        p = pd.Series(data)
        check(f"expanding sem {dname} ddof={ddof}",
              lambda s=s, d=ddof: fl(
                  s.expanding(1).sem(ddof=d).to_pandas()),
              lambda p=p, d=ddof: fl(
                  p.expanding(1).sem(ddof=d)))
        check(f"rolling sem {dname} ddof={ddof}",
              lambda s=s, d=ddof: fl(
                  s.rolling(3, min_periods=1).sem(ddof=d)
                  .to_pandas()),
              lambda p=p, d=ddof: fl(
                  p.rolling(3, min_periods=1).sem(ddof=d)))
    ts = pd.to_datetime("2024-01-01") \
        + pd.to_timedelta([0, 10, 20, 90, 100], "min")
    dt = bl.DataFrame({"t": ts.to_numpy(),
                       "v": np.array(data)}).set_index("t")
    pt = pd.Series(data, index=ts)
    for ddof in (0, 2, 3):
        check(f"troll sem {dname} ddof={ddof}",
              lambda dt=dt, d=ddof: fl(
                  dt["v"].rolling("30min").sem(ddof=d).to_pandas()),
              lambda pt=pt, d=ddof: fl(
                  pt.rolling("30min").sem(ddof=d)))

# frame faces
ff = bl.DataFrame({"a": np.array([1., 2., 4.]),
                   "b": np.array([7., 7., 7.])})
pff = pd.DataFrame({"a": [1., 2., 4.], "b": [7., 7., 7.]})
for ddof in (2, 3):
    ge = ff.expanding(1).sem(ddof=ddof).to_pandas()
    pe = pff.expanding(1).sem(ddof=ddof)
    gr = ff.rolling(2, min_periods=1).sem(ddof=ddof).to_pandas()
    pr = pff.rolling(2, min_periods=1).sem(ddof=ddof)
    for c in ("a", "b"):
        check(f"frame expanding sem {c} ddof={ddof}",
              lambda g=ge, c=c: fl(g[c]), lambda e=pe, c=c: fl(e[c]))
        check(f"frame rolling sem {c} ddof={ddof}",
              lambda g=gr, c=c: fl(g[c]), lambda e=pr, c=c: fl(e[c]))

print("wave25 part 1-2 done")

# ---- 3. loc null-label gates, empty-list write, xs MultiIndex -----
idx = np.array(["a", "b", None, "d"], dtype=object)
bd = bl.DataFrame({"i": idx, "v": np.array([1., 2., 3., 4.])}) \
    .set_index("i")
pdf = pd.DataFrame({"v": [1., 2., 3., 4.]},
                   index=["a", "b", None, "d"])

# label-Series gather with a null label PRESENT in the index
lab = bl.Series(np.array(["d", None, "a"], dtype=object))
check("loc series null label gather",
      lambda: fl(bd.loc[lab]["v"].to_pandas()),
      lambda: fl(pdf.loc[pd.Series(["d", None, "a"])]["v"]))
# a genuinely missing label still raises
check("loc series missing label",
      lambda: fl(bd.loc[bl.Series(np.array(["zz"], dtype=object))]
                 ["v"].to_pandas()),
      lambda: fl(pdf.loc[pd.Series(["zz"])]["v"]))

# scalar None loc assignment hits the null index row
def _set_none_ours():
    d2 = bl.DataFrame({"i": idx, "v": np.array([1., 2., 3., 4.])}) \
        .set_index("i")
    d2.loc[None, "v"] = 9.0
    return fl(d2["v"].to_pandas())
def _set_none_pandas():
    p2 = pdf.copy()
    p2.loc[[None], "v"] = 9.0   # pandas scalar-None spelling quirk
    return fl(p2["v"])
check("loc set scalar None label", _set_none_ours, _set_none_pandas)

# list-with-None loc assignment
def _set_list_ours():
    d2 = bl.DataFrame({"i": idx, "v": np.array([1., 2., 3., 4.])}) \
        .set_index("i")
    d2.loc[[None, "a"], "v"] = 7.0
    return fl(d2["v"].to_pandas())
def _set_list_pandas():
    p2 = pdf.copy()
    p2.loc[[None, "a"], "v"] = 7.0
    return fl(p2["v"])
check("loc set list None label", _set_list_ours, _set_list_pandas)

# empty-list selector is a no-op write
def _set_empty_ours():
    d2 = bl.DataFrame({"i": idx, "v": np.array([1., 2., 3., 4.])}) \
        .set_index("i")
    d2.loc[[], "v"] = 99.0
    return fl(d2["v"].to_pandas())
def _set_empty_pandas():
    p2 = pdf.copy()
    p2.loc[[], "v"] = 99.0
    return fl(p2["v"])
check("loc set empty list no-op", _set_empty_ours, _set_empty_pandas)

# xs on a MultiIndex without level=
mi = pd.MultiIndex.from_tuples(
    [("a", 1), ("a", 2), ("b", 2), ("b", 2)], names=["u", "w"])
pmi = pd.DataFrame({"x": [1., 2., 3., 4.]}, index=mi)
bmi = bl.DataFrame({"u": np.array(["a", "a", "b", "b"]),
                    "w": np.array([1, 2, 2, 2]),
                    "x": np.array([1., 2., 3., 4.])}) \
    .set_index(["u", "w"])
check("xs mi partial scalar",
      lambda: fl(bmi.xs("a")["x"].to_pandas()),
      lambda: fl(pmi.xs("a")["x"]))
check("xs mi partial keep",
      lambda: sorted(bmi.xs("a", drop_level=False).to_pandas()
                     .index.tolist()),
      lambda: sorted(pmi.xs("a", drop_level=False).index.tolist()))
check("xs mi full tuple",
      lambda: fl(bmi.xs(("a", 1))["x"].to_pandas()),
      lambda: fl(pmi.xs(("a", 1))["x"]))
check("xs mi full tuple dup",
      lambda: fl(bmi.xs(("b", 2))["x"].to_pandas()),
      lambda: fl(pmi.xs(("b", 2))["x"]))
check("xs mi miss",
      lambda: fl(bmi.xs("zz")["x"].to_pandas()),
      lambda: fl(pmi.xs("zz")["x"]))
check("xs mi series partial",
      lambda: fl(bmi["x"].xs("a").to_pandas()),
      lambda: fl(pmi["x"].xs("a")))
check("xs mi series full keep",
      lambda: fl(bmi["x"].xs(("a", 1), drop_level=False)
                 .to_pandas()),
      lambda: fl(pmi["x"].xs(("a", 1), drop_level=False)))
# flat index: drop_level is a pandas no-op — engine must agree
pflat = pd.DataFrame({"x": [1., 2.]}, index=["a", "b"])
bflat = bl.DataFrame({"i": np.array(["a", "b"]),
                      "x": np.array([1., 2.])}).set_index("i")
check("xs flat drop_level=False row",
      lambda: fl([bflat.xs("b", drop_level=False)["x"]]),
      lambda: fl([pflat.xs("b", drop_level=False)["x"]]))
check("xs flat series drop_level=False scalar",
      lambda: float(bflat["x"].xs("b", drop_level=False)),
      lambda: float(pflat["x"].xs("b", drop_level=False)))

print("wave25 part 3 done")

# ---- 4. grouped window .agg faces (r11) ---------------------------
rng = np.random.default_rng(25)
n = 160
g = rng.choice(["a", "b", "c"], n)
v = rng.normal(size=n)
v[rng.random(n) < 0.12] = np.nan
u = rng.normal(size=n) * 2
pg = pd.DataFrame({"g": g, "v": v, "u": u})
bg = bl.DataFrame({"g": g, "v": v, "u": u})

def psrc(res):
    return res.reset_index(level=0, drop=True).sort_index()

# JVM-fused list face, multi value cols -> str((col, stat)) col-major
got = bg.groupby("g").rolling(4, min_periods=2) \
    .agg(["sum", "mean", "var"]).to_pandas()
want = psrc(pg.groupby("g")[["v", "u"]]
            .rolling(4, min_periods=2).agg(["sum", "mean", "var"]))
for c in ("v", "u"):
    for st in ("sum", "mean", "var"):
        check(f"group roll agg jvm {c} {st}",
              lambda c=c, st=st: fl(got[str((c, st))]),
              lambda c=c, st=st: fl(want[(c, st)]))

# single value col -> flat stat names
got1 = bg.groupby("g")["v"].rolling(3, min_periods=1) \
    .agg(["sum", "max"]).to_pandas()
want1 = psrc(pg.groupby("g")["v"]
             .rolling(3, min_periods=1).agg(["sum", "max"]))
for st in ("sum", "max"):
    check(f"group roll agg single {st}",
          lambda st=st: fl(got1[st]), lambda st=st: fl(want1[st]))

# dict face replaces columns in place
gotd = bg.groupby("g").rolling(4, min_periods=2) \
    .agg({"v": "sum", "u": "median"}).to_pandas()
check("group roll agg dict v",
      lambda: fl(gotd["v"]),
      lambda: fl(psrc(pg.groupby("g")["v"]
                      .rolling(4, min_periods=2).sum())))
check("group roll agg dict u median (order path)",
      lambda: fl(gotd["u"]),
      lambda: fl(psrc(pg.groupby("g")["u"]
                      .rolling(4, min_periods=2).median())))

# mixed order+jvm via one pandas pass
gotm = bg.groupby("g")["v"].rolling(5, min_periods=2) \
    .agg(["mean", "median", "rank"]).to_pandas()
pr = pg.groupby("g")["v"].rolling(5, min_periods=2)
for st in ("mean", "median", "rank"):
    check(f"group roll agg mixed {st}",
          lambda st=st: fl(gotm[st]),
          lambda st=st: fl(psrc(getattr(pr, st)())))

# expanding face
gote = bg.groupby("g").expanding(2).agg(["sum", "skew"]).to_pandas()
pe = pg.groupby("g")[["v", "u"]].expanding(2)
for c in ("v", "u"):
    for st in ("sum", "skew"):
        check(f"group expanding agg {c} {st}",
              lambda c=c, st=st: fl(gote[str((c, st))]),
              lambda c=c, st=st: fl(psrc(getattr(pe, st)())[c]))

# time-offset face (unique stamps: JVM range == pandas)
secs = np.sort(rng.choice(np.arange(0, 90000, 7), n, replace=False))
ts = pd.to_datetime("2024-01-01") + pd.to_timedelta(secs, "s")
pt = pd.DataFrame({"g": g, "v": v, "u": u}, index=ts)
bt = bl.DataFrame({"t": ts.to_numpy(), "g": g, "v": v, "u": u}) \
    .sort_values("t")
gott = bt.groupby("g").rolling("30min").agg(["sum", "count"]) \
    .to_pandas()
ptr = pt.groupby("g")[["v", "u"]].rolling("30min")
for c in ("v", "u"):
    for st in ("sum", "count"):
        want_t = psrc(getattr(ptr, st)())[c].to_numpy()
        check(f"group time agg {c} {st}",
              lambda c=c, st=st: fl(gott[str((c, st))]),
              lambda w=want_t: fl(w))
# time-offset order stat through the pandas kernel
gott2 = bt.groupby("g")["v"].rolling("1h").agg(["median", "sem"]) \
    .to_pandas()
ptr2 = pt.groupby("g")["v"].rolling("1h")
for st in ("median", "sem"):
    check(f"group time agg order {st}",
          lambda st=st: fl(gott2[st]),
          lambda st=st: fl(psrc(getattr(ptr2, st)())))

# grouped ewm agg
gotw = bg.groupby("g").ewm(alpha=0.3).agg(["mean", "std"]) \
    .to_pandas()
pw = pg.groupby("g")[["v", "u"]].ewm(alpha=0.3)
for c in ("v", "u"):
    for st in ("mean", "std"):
        check(f"group ewm agg {c} {st}",
              lambda c=c, st=st: fl(gotw[str((c, st))]),
              lambda c=c, st=st: fl(psrc(getattr(pw, st)())[c]))

# agg_pairs grouped face vs pandas per-group windows
gp = bg.groupby("g").rolling(4, min_periods=2).agg_pairs(
    {"sv": ("sum", "v"), "cvu": ("cov", "v", "u"),
     "rvu": ("corr", "v", "u")}).to_pandas()
check("group agg_pairs sum",
      lambda: fl(gp["sv"]),
      lambda: fl(psrc(pg.groupby("g")["v"]
                      .rolling(4, min_periods=2).sum())))
check("group agg_pairs cov",
      lambda: fl(gp["cvu"]),
      lambda: fl(psrc(pg.groupby("g")[["v", "u"]]
                      .rolling(4, min_periods=2).cov()
                      .unstack()[("v", "u")])))
check("group agg_pairs corr",
      lambda: fl(gp["rvu"]),
      lambda: fl(psrc(pg.groupby("g")[["v", "u"]]
                      .rolling(4, min_periods=2).corr()
                      .unstack()[("v", "u")])))

# gates
def _expect_err(tag, fn, etype):
    try:
        fn()
        print(f"PROBE DIFF [{tag}] no error raised")
    except etype:
        pass
    except Exception as e:  # noqa: BLE001
        print(f"PROBE DIFF [{tag}] wrong error {type(e).__name__}: {e}")

_expect_err("group agg empty",
            lambda: bg.groupby("g").rolling(3).agg([]), ValueError)
_expect_err("group agg dup",
            lambda: bg.groupby("g")["v"].rolling(3)
            .agg(["sum", "sum"]), ValueError)
_expect_err("group agg unknown",
            lambda: bg.groupby("g").rolling(3).agg(["quantile"]),
            ValueError)
_expect_err("group agg bad col",
            lambda: bg.groupby("g").rolling(3).agg({"zz": "sum"}),
            KeyError)
_expect_err("group agg_pairs unknown",
            lambda: bg.groupby("g").rolling(3).agg_pairs(
                {"o": ("madness", "v")}), ValueError)

print("wave25 part 4 done")

# ---- 5. iloc/iat assignment (r11) ---------------------------------
def mk_pair():
    p = pd.DataFrame({"a": [1., 2., 3., 4., 5.],
                      "b": [10., 20., 30., 40., 50.]},
                     index=["v", "w", "x", "y", "z"])
    b = bl.DataFrame({"i": np.array(list("vwxyz")),
                      "a": np.array([1., 2., 3., 4., 5.]),
                      "b": np.array([10., 20., 30., 40., 50.])}) \
        .set_index("i")
    return p, b

def setter_case(tag, fn):
    p, b = mk_pair()
    fn(p); fn(b)
    check(f"iloc set {tag} a", lambda: fl(b["a"].to_pandas()),
          lambda: fl(p["a"]))
    check(f"iloc set {tag} b", lambda: fl(b["b"].to_pandas()),
          lambda: fl(p["b"]))

setter_case("int", lambda d: d.iloc.__setitem__((1, 0), 9.0))
setter_case("neg int", lambda d: d.iloc.__setitem__((-1, 1), 0.5))
setter_case("iat", lambda d: d.iat.__setitem__((2, 1), -7.0))
setter_case("list rows", lambda d: d.iloc.__setitem__(([0, 2], 1), 6.0))
setter_case("neg list", lambda d: d.iloc.__setitem__(([-2, 0], 0), 1.5))
setter_case("slice", lambda d: d.iloc.__setitem__((slice(1, 3), 0), 2.5))
setter_case("step slice", lambda d: d.iloc.__setitem__((slice(None, None, 2), 0), 3.5))
setter_case("neg step", lambda d: d.iloc.__setitem__((slice(None, None, -2), 1), 4.5))
setter_case("bool mask", lambda d: d.iloc.__setitem__(([True, False, True, False, True], 0), 8.0))
setter_case("whole row", lambda d: d.iloc.__setitem__(2, 0.0))
setter_case("col slice", lambda d: d.iloc.__setitem__((0, slice(None)), -1.0))
setter_case("empty list rows", lambda d: d.iloc.__setitem__(([], 0), 77.0))

# same-frame Series value: ENGINE EXTENSION (row-for-row at the
# selected rows). pandas raises a shape mismatch here (its iloc-set
# is positional over the selection), so no pandas-legal program is
# silently diverged.
p, b = mk_pair()
try:
    p.iloc[[0, 3], 0] = p["b"]
    print("PROBE DIFF [iloc series value] pandas did NOT raise")
except ValueError:
    pass
b.iloc[[0, 3], 0] = b["b"]
check("iloc set series value (extension)",
      lambda: fl(b["a"].to_pandas()),
      lambda: [10.0, 2.0, 3.0, 40.0, 5.0])

# error gates
_, b = mk_pair()
_expect_err("iloc set oob row",
            lambda: b.iloc.__setitem__((9, 0), 1.0), IndexError)
_expect_err("iloc set oob col",
            lambda: b.iloc.__setitem__((0, 9), 1.0), IndexError)
_expect_err("iloc set list value",
            lambda: b.iloc.__setitem__(([0, 1], 0), [1.0, 2.0]),
            NotImplementedError)
_expect_err("iloc set foreign series",
            lambda: b.iloc.__setitem__(
                ([0, 1], 0), bl.Series(np.array([1.0, 2.0]))),
            NotImplementedError)
_expect_err("iloc set str col",
            lambda: b.iloc.__setitem__((0, "a"), 1.0), TypeError)

print("wave25 part 5 done")

# ---- 6. verdict-listed residuals ----------------------------------
# loc-set where the mask references the column being written
def _self_ref_ours():
    d2 = bl.DataFrame({"a": np.array([1., 3., 5., 2.]),
                       "k": np.array([0, 1, 2, 3])}).set_index("k")
    d2.loc[d2["a"] > 2, "a"] = -1.0
    return fl(d2["a"].to_pandas())
def _self_ref_pandas():
    p2 = pd.DataFrame({"a": [1., 3., 5., 2.]},
                      index=pd.Index([0, 1, 2, 3], name="k"))
    p2.loc[p2["a"] > 2, "a"] = -1.0
    return fl(p2["a"])
check("loc set self-referencing mask", _self_ref_ours,
      _self_ref_pandas)

# frame agg_pairs with min_periods exceeding every window's contents
ts6 = pd.to_datetime("2024-01-01") + pd.to_timedelta(
    [0, 240, 480, 720], "min")   # 4h apart; 1h windows hold 1 row
bp = bl.DataFrame({"t": ts6.to_numpy(),
                   "x": np.array([1., 2., 3., 4.]),
                   "y": np.array([2., 1., 4., 3.])}).set_index("t")
gp6 = bp.rolling("1h", min_periods=3).agg_pairs(
    {"sx": ("sum", "x"), "cxy": ("corr", "x", "y")}).to_pandas()
check("agg_pairs mp>window contents sum",
      lambda: fl(gp6["sx"]), lambda: [float("nan")] * 4)
check("agg_pairs mp>window contents corr",
      lambda: fl(gp6["cxy"]), lambda: [float("nan")] * 4)
# grouped agg_pairs same starvation
bg7 = bl.DataFrame({"t": ts6.to_numpy(), "g": np.array(["a"] * 4),
                    "x": np.array([1., 2., 3., 4.]),
                    "y": np.array([2., 1., 4., 3.])}).sort_values("t")
gp7 = bg7.groupby("g").rolling("1h", min_periods=3).agg_pairs(
    {"sx": ("sum", "x"), "cxy": ("corr", "x", "y")}).to_pandas()
check("grouped agg_pairs starved sum",
      lambda: fl(gp7["sx"]), lambda: [float("nan")] * 4)
check("grouped agg_pairs starved corr",
      lambda: fl(gp7["cxy"]), lambda: [float("nan")] * 4)

# xs(level=) consuming all levels of a 2-level index, drop_level
mi6 = pd.MultiIndex.from_tuples([("a", 1), ("b", 2)],
                                names=["u", "w"])
pm6 = pd.DataFrame({"x": [1., 2.]}, index=mi6)
bm6 = bl.DataFrame({"u": np.array(["a", "b"]),
                    "w": np.array([1, 2]),
                    "x": np.array([1., 2.])}).set_index(["u", "w"])
check("xs level all-consumed keep",
      lambda: fl(bm6.xs(("a", 1), level=["u", "w"],
                        drop_level=False)["x"].to_pandas()),
      lambda: fl(pm6.xs(("a", 1), level=["u", "w"],
                        drop_level=False)["x"]))

# Series agg_pairs gate names the frame spelling
try:
    bt2 = bl.DataFrame({"t": ts6.to_numpy(),
                        "v": np.array([1., 2., 3., 4.])}) \
        .set_index("t")
    bt2["v"].rolling("1h").agg_pairs({"o": ("sum", "v")})
    print("PROBE DIFF [series agg_pairs gate] no error")
except NotImplementedError as e:
    if "frame face" not in str(e) and "agg_pairs" not in str(e):
        print(f"PROBE DIFF [series agg_pairs gate] message: {e}")

print("wave25 part 6 done")

# ---- 7. fixed/expanding agg_pairs faces (global + grouped) --------
rng7 = np.random.default_rng(77)
n7 = 140
x7 = rng7.normal(size=n7); x7[rng7.random(n7) < 0.1] = np.nan
y7 = rng7.normal(size=n7); y7[rng7.random(n7) < 0.1] = np.nan
bf7 = bl.DataFrame({"x": x7, "y": y7})
pf7 = pd.DataFrame({"x": x7, "y": y7})
for face, mk_b, mk_p in (
        ("fixed", lambda: bf7.rolling(6, min_periods=2),
         lambda: pf7.rolling(6, min_periods=2)),
        ("expanding", lambda: bf7.expanding(2),
         lambda: pf7.expanding(2))):
    gp = mk_b().agg_pairs({"sx": ("sum", "x"), "mx": ("mean", "x"),
                           "nx": ("count", "x"),
                           "cxy": ("cov", "x", "y"),
                           "rxy": ("corr", "x", "y")}).to_pandas()
    check(f"{face} agg_pairs sum",
          lambda g=gp: fl(g["sx"]),
          lambda p=mk_p(): fl(p["x"].sum()))
    check(f"{face} agg_pairs mean",
          lambda g=gp: fl(g["mx"]),
          lambda p=mk_p(): fl(p["x"].mean()))
    check(f"{face} agg_pairs count",
          lambda g=gp: fl(g["nx"]),
          lambda p=mk_p(): fl(p["x"].count()))
    check(f"{face} agg_pairs cov",
          lambda g=gp: fl(g["cxy"]),
          lambda p=mk_p(): fl(p.cov().unstack()[("x", "y")]))
    check(f"{face} agg_pairs corr",
          lambda g=gp: fl(g["rxy"]),
          lambda p=mk_p(): fl(p.corr().unstack()[("x", "y")]))
# grouped EXPANDING agg_pairs (the frame not probed in part 4)
g7 = rng7.choice(["a", "b"], n7)
bg7b = bl.DataFrame({"g": g7, "x": x7, "y": y7})
pg7 = pd.DataFrame({"g": g7, "x": x7, "y": y7})
gpe = bg7b.groupby("g").expanding(2).agg_pairs(
    {"rxy": ("corr", "x", "y")}).to_pandas()
check("grouped expanding agg_pairs corr",
      lambda: fl(gpe["rxy"]),
      lambda: fl(pg7.groupby("g")[["x", "y"]].expanding(2).corr()
                 .unstack()[("x", "y")]
                 .reset_index(level=0, drop=True).sort_index()))
_expect_err("agg_pairs center gate",
            lambda: bf7.rolling(4, center=True).agg_pairs(
                {"s": ("sum", "x")}), ValueError)

print("wave25 part 7 done")

# ---- 8. Series setter faces (r11) ---------------------------------
def smk():
    p = pd.Series([1., 2., 3., 4.], index=["a", "b", "c", "d"],
                  name="v")
    b_ = bl.Series(np.array([1., 2., 3., 4.]),
                   index=np.array(["a", "b", "c", "d"], dtype=object),
                   name="v")
    return p, b_

def s_case(tag, fn):
    p, b_ = smk()
    fn(p); fn(b_)
    check(f"series set {tag}", lambda: fl(b_.to_pandas()),
          lambda: fl(p))

s_case("loc scalar", lambda s: s.loc.__setitem__("b", 9.0))
s_case("at scalar", lambda s: s.at.__setitem__("c", -1.0))
s_case("loc list", lambda s: s.loc.__setitem__(["a", "d"], 5.0))
s_case("getitem label", lambda s: s.__setitem__("a", 7.5))
s_case("getitem mask list",
       lambda s: s.__setitem__([True, False, True, False], 0.0))
s_case("iloc int", lambda s: s.iloc.__setitem__(1, 4.5))
s_case("iat int", lambda s: s.iat.__setitem__(-1, 2.5))
s_case("iloc slice", lambda s: s.iloc.__setitem__(slice(1, 3), 8.0))
s_case("getitem slice", lambda s: s.__setitem__(slice(0, 2), 6.0))

# mask Series: engine same-Series mask == pandas
p, b_ = smk()
p[p > 2.0] = 0.0
b_[b_ > 2.0] = 0.0
check("series set self mask", lambda: fl(b_.to_pandas()),
      lambda: fl(p))

# default RangeIndex: integer keys are labels (== positions)
pr = pd.Series([1., 2., 3.])
br = bl.Series(np.array([1., 2., 3.]))
pr[1] = 9.0; br[1] = 9.0
check("series set rangeindex int", lambda: fl(br.to_pandas()),
      lambda: fl(pr))

# copy-on-write: the parent frame is untouched
bfr = bl.DataFrame({"a": np.array([1., 2., 3.])})
col = bfr["a"]
col.iloc[0] = 99.0
check("series set CoW parent untouched",
      lambda: fl(bfr["a"].to_pandas()), lambda: [1., 2., 3.])
check("series set CoW child written",
      lambda: fl(col.to_pandas()), lambda: [99., 2., 3.])

# gates: enlargement, multiindex tuple
p, b_ = smk()
_expect_err("series loc set enlargement",
            lambda: b_.loc.__setitem__("zz", 1.0),
            NotImplementedError)
_expect_err("series loc set tuple",
            lambda: b_.loc.__setitem__(("a", 1), 1.0),
            NotImplementedError)
_expect_err("series iloc set oob",
            lambda: b_.iloc.__setitem__(9, 1.0), IndexError)

print("wave25 part 8 done")

# ---- 9. write-face interactions + grouped center .agg -------------
# setters compose with downstream groupby/window/merge
def _compose_ours():
    d = bl.DataFrame({"g": np.array(["a", "b", "a", "b", "a"]),
                      "v": np.array([1., 2., 3., 4., 5.])})
    d.iloc[0, 1] = 10.0
    d.iloc[[2, 4], 1] = 0.0
    out = d.groupby("g").sum().to_pandas().sort_index()
    return fl(out["v"])
def _compose_pandas():
    p = pd.DataFrame({"g": ["a", "b", "a", "b", "a"],
                      "v": [1., 2., 3., 4., 5.]})
    p.iloc[0, 1] = 10.0
    p.iloc[[2, 4], 1] = 0.0
    return fl(p.groupby("g").sum().sort_index()["v"])
check("iloc-set then groupby", _compose_ours, _compose_pandas)

def _sr_window_ours():
    s = bl.Series(np.array([1., 2., 3., 4., 5., 6.]))
    s.iloc[2] = np.nan
    return fl(s.rolling(3, min_periods=2).mean().to_pandas())
def _sr_window_pandas():
    s = pd.Series([1., 2., 3., 4., 5., 6.])
    s.iloc[2] = np.nan
    return fl(s.rolling(3, min_periods=2).mean())
check("series-set then rolling", _sr_window_ours, _sr_window_pandas)

# grouped CENTER rolling: single stats and fused .agg, odd + even w
rng9 = np.random.default_rng(9)
n9 = 80
g9 = rng9.choice(["a", "b", "c"], n9)
v9 = rng9.normal(size=n9); v9[rng9.random(n9) < 0.15] = np.nan
pg9 = pd.DataFrame({"g": g9, "v": v9})
bg9 = bl.DataFrame({"g": g9, "v": v9})
for w, mp in ((3, 2), (4, 2), (5, None), (4, None), (6, 3)):
    got = bg9.groupby("g")["v"].rolling(w, min_periods=mp,
                                        center=True) \
        .agg(["sum", "mean", "count"]).to_pandas()
    pr9 = pg9.groupby("g")["v"].rolling(w, min_periods=mp,
                                        center=True)
    for st in ("sum", "mean", "count"):
        check(f"grouped center agg w={w} mp={mp} {st}",
              lambda st=st, g=got: fl(g[st]),
              lambda st=st, p=pr9: fl(
                  getattr(p, st)().reset_index(level=0, drop=True)
                  .sort_index()))
    # order stat through the pandas kernel with center
    gotr = bg9.groupby("g")["v"].rolling(w, min_periods=mp,
                                         center=True) \
        .agg(["median", "rank"]).to_pandas()
    for st in ("median", "rank"):
        check(f"grouped center order w={w} mp={mp} {st}",
              lambda st=st, g=gotr: fl(g[st]),
              lambda st=st, p=pr9: fl(
                  getattr(p, st)().reset_index(level=0, drop=True)
                  .sort_index()))

print("wave25 part 9 done")

# ---- 10. NaN literal staging (found by part 9) --------------------
def _nanset_ours():
    s = bl.Series(np.array([1., 2., 3., 4., 5., 6.]))
    s.iloc[2] = np.nan
    return fl(s.rolling(3, min_periods=2).mean().to_pandas())
def _nanset_pandas():
    s = pd.Series([1., 2., 3., 4., 5., 6.])
    s.iloc[2] = np.nan
    return fl(s.rolling(3, min_periods=2).mean())
check("nan-set then rolling mean", _nanset_ours, _nanset_pandas)

def _nanloc_ours():
    d = bl.DataFrame({"k": np.array([0, 1, 2, 3]),
                      "v": np.array([1., 2., 3., 4.])}).set_index("k")
    d.loc[d["v"] > 2.0, "v"] = np.nan
    return float(d["v"].sum())
def _nanloc_pandas():
    p = pd.DataFrame({"v": [1., 2., 3., 4.]},
                     index=pd.Index([0, 1, 2, 3], name="k"))
    p.loc[p["v"] > 2.0, "v"] = np.nan
    return float(p["v"].sum())
check("nan loc-set then sum", _nanloc_ours, _nanloc_pandas)

# where/mask with a NaN other must stay skippable
bw = bl.DataFrame({"v": np.array([1., 2., 3., 4.])})
pw_ = pd.DataFrame({"v": [1., 2., 3., 4.]})
check("where other=nan then mean",
      lambda: float(bw.where(bw["v"] > 2.0, np.nan)["v"].mean()),
      lambda: float(pw_.where(pw_["v"] > 2.0, np.nan)["v"].mean()))
check("series mask other=nan then sum",
      lambda: float(bw["v"].mask(bw["v"] > 2.0, np.nan).sum()),
      lambda: float(pw_["v"].mask(pw_["v"] > 2.0, np.nan).sum()))
check("fillna(nan) no-op",
      lambda: fl(bl.Series(np.array([1., np.nan, 3.]))
                 .fillna(np.nan).to_pandas()),
      lambda: fl(pd.Series([1., np.nan, 3.]).fillna(np.nan)
                 if True else None))
print("wave25 part 10 done")

# ---- 11. NaN through replace / map / clip -------------------------
sN = bl.Series(np.array([0., 1., 2., np.nan]))
pN = pd.Series([0., 1., 2., np.nan])
check("replace 0 -> nan then sum",
      lambda: float(sN.replace(0.0, np.nan).sum()),
      lambda: float(pN.replace(0.0, np.nan).sum()))
dN = bl.DataFrame({"a": np.array([0., 1., 2.])})
pdN = pd.DataFrame({"a": [0., 1., 2.]})
check("frame replace 0 -> nan then sum",
      lambda: float(dN.replace(0.0, np.nan)["a"].sum()),
      lambda: float(pdN.replace(0.0, np.nan)["a"].sum()))
check("map value nan then sum",
      lambda: float(sN.map({0.0: np.nan, 1.0: 10.0,
                            2.0: 2.0}).sum()),
      lambda: float(pN.map({0.0: np.nan, 1.0: 10.0,
                            2.0: 2.0}).sum()))
check("map nan key",
      lambda: fl(sN.map({np.nan: 99.0, 1.0: 10.0}).to_pandas()),
      lambda: fl(pN.map({np.nan: 99.0, 1.0: 10.0})))
# big-dict path (>64) with nan key + value
big = {float(i): float(i) * 2 for i in range(70)}
big[np.nan] = -5.0
big[1.0] = np.nan
check("map big dict nan key/value",
      lambda: fl(sN.map(big).to_pandas()),
      lambda: fl(pN.map(big)))
check("clip nan upper",
      lambda: fl(sN.clip(upper=np.nan).to_pandas()),
      lambda: fl(pN.clip(upper=np.nan)))
check("clip nan lower",
      lambda: fl(sN.clip(lower=np.nan, upper=1.5).to_pandas()),
      lambda: fl(pN.clip(lower=np.nan, upper=1.5)))
print("wave25 part 11 done")

# ---- 12. NaN scalar operands in comparisons / arithmetic ----------
sO = bl.Series(np.array([1., 2., 3.]))
pO = pd.Series([1., 2., 3.])
# filters: pandas all-False selection == engine NULL-dropped rows
check("filter s < nan", lambda: int(len(sO[sO < np.nan])),
      lambda: int((pO < np.nan).sum()))
check("filter s >= nan", lambda: int(len(sO[sO >= np.nan])),
      lambda: int((pO >= np.nan).sum()))
check("arith s + nan then sum (codec: NULL == NaN)",
      lambda: float((sO + np.nan).sum()),
      lambda: float((pO + np.nan).sum()))
check("arith s * nan count",
      lambda: int((sO * np.nan).count()),
      lambda: int((pO * np.nan).count()))
print("wave25 part 12 done")

# ---- 13. NaN scalar in frame arithmetic / between -----------------
dF = bl.DataFrame({"a": np.array([1., 2.]), "b": np.array([3., 4.])})
pF = pd.DataFrame({"a": [1., 2.], "b": [3., 4.]})
check("frame + nan then sum",
      lambda: fl((dF + np.nan).sum()["a":"b"].to_pandas()
                 if False else (dF + np.nan).sum().to_pandas()),
      lambda: fl((pF + np.nan).sum()))
check("between nan bound count",
      lambda: int(sO.between(np.nan, 2.0).to_pandas().fillna(False).sum()),
      lambda: int(pO.between(np.nan, 2.0).sum()))
print("wave25 part 13 done")

# ---- 14. astype / str / dt seams ----------------------------------
sA = bl.Series(np.array([1.5, 2.7, np.nan]))
pA = pd.Series([1.5, 2.7, np.nan])
# float -> int with NaN: PINNED divergence (astype docstring) —
# missing stays NULL instead of pandas' IntCastingNaNError
check("astype int with nan keeps NULL (pin)",
      lambda: fl(sA.astype("int64").to_pandas()),
      lambda: [1.0, 2.0, float("nan")])
# float -> int truncation parity (no NaN)
sB = bl.Series(np.array([1.9, -2.7, 3.0]))
pB = pd.Series([1.9, -2.7, 3.0])
check("astype int truncates toward zero",
      lambda: list(sB.astype("int64").to_pandas()),
      lambda: list(pB.astype("int64")))
# negative float -> bool
check("astype bool",
      lambda: list(sB.astype("bool").to_pandas()),
      lambda: list(pB.astype("bool")))
# str.contains with regex chars, na handling
sS = bl.Series(np.array(["a.b", "acb", None], dtype=object))
pS = pd.Series(["a.b", "acb", None])
def _tri(x):
    return [None if v is None or v != v else bool(v) for v in x]
check("str.contains regex default",
      lambda: _tri(sS.str.contains("a.b").to_pandas()),
      lambda: _tri(pS.str.contains("a.b")))
check("str.contains regex=False literal",
      lambda: _tri(sS.str.contains("a.b", regex=False).to_pandas()),
      lambda: _tri(pS.str.contains("a.b", regex=False)))
check("str.contains case=False",
      lambda: _tri(sS.str.contains("A.B", case=False).to_pandas()),
      lambda: _tri(pS.str.contains("A.B", case=False)))
check("str.contains na=False",
      lambda: _tri(sS.str.contains("acb", na=False).to_pandas()),
      lambda: _tri(pS.str.contains("acb", na=False)))
check("str.startswith na=True",
      lambda: _tri(sS.str.startswith("a", na=True).to_pandas()),
      lambda: _tri(pS.str.startswith("a", na=True)))
# str.replace first-occurrence semantics with regex chars
sR = bl.Series(np.array(["a.a.a", "xyx"], dtype=object))
pR = pd.Series(["a.a.a", "xyx"])
check("str.replace literal dot",
      lambda: list(sR.str.replace(".", "-").to_pandas()),
      lambda: list(pR.str.replace(".", "-", n=1, regex=False)))
# dt accessors around DST-free UTC boundaries
ts14 = pd.to_datetime(["2024-02-29 23:59:59", "2023-12-31 00:00:01"])
sD = bl.DataFrame({"t": ts14.to_numpy()})["t"]
pD = pd.Series(ts14)
for acc in ("year", "month", "day", "hour", "dayofweek",
            "dayofyear", "quarter", "is_leap_year"):
    check(f"dt.{acc}",
          lambda a=acc: list(getattr(sD.dt, a).to_pandas()),
          lambda a=acc: list(getattr(pD.dt, a)))
print("wave25 part 14 done")

# ---- 15. reshape seams: pivot_table / stack / cut / dummies -------
rng15 = np.random.default_rng(15)
n15 = 60
pR = pd.DataFrame({
    "r": rng15.choice(["x", "y", "z"], n15),
    "c": rng15.choice(["p", "q"], n15),
    "v": rng15.normal(size=n15).round(3),
})
bR = bl.DataFrame({k: pR[k].to_numpy() for k in pR})
# pivot_table mean with missing combos
try:
    gpt = bR.pivot_table(index="r", columns="c", values="v",
                         aggfunc="mean").to_pandas().sort_index()
    ppt = pR.pivot_table(index="r", columns="c", values="v",
                         aggfunc="mean").sort_index()
    for c in ("p", "q"):
        check(f"pivot_table mean {c}",
              lambda c=c: fl(gpt[c]), lambda c=c: fl(ppt[c]))
except Exception as e:  # noqa: BLE001
    print(f"PROBE DIFF [pivot_table] ours error {type(e).__name__}: {e}")

# cut: right-closed default, labels, out-of-range -> NaN
vals = np.array([0.5, 1.0, 2.5, 7.0, -1.0])
try:
    gc = bl.cut(bl.Series(vals), bins=[0, 1, 3, 5]).to_pandas()
    pc = pd.cut(pd.Series(vals), bins=[0, 1, 3, 5]) \
        .astype(str).replace("nan", None)
    check("cut interval labels",
          lambda: [None if v is None else str(v) for v in gc],
          lambda: [None if v is None or v == "None" else str(v)
                   for v in pc])
except Exception as e:  # noqa: BLE001
    print(f"PROBE DIFF [cut] ours error {type(e).__name__}: {e}")

# qcut quartile bucket counts
try:
    data15 = rng15.normal(size=200)
    gq = bl.qcut(bl.Series(data15), 4).to_pandas().value_counts()
    pq = pd.qcut(pd.Series(data15), 4).astype(str).value_counts()
    check("qcut bucket sizes", lambda: sorted(gq.tolist()),
          lambda: sorted(pq.tolist()))
except Exception as e:  # noqa: BLE001
    print(f"PROBE DIFF [qcut] ours error {type(e).__name__}: {e}")

# get_dummies column set + values
try:
    gd = bl.get_dummies(bR[["r"]]).to_pandas()
    pdm = pd.get_dummies(pR[["r"]])
    check("get_dummies cols", lambda: sorted(gd.columns),
          lambda: sorted(pdm.columns))
    check("get_dummies sums",
          lambda: sorted(int(gd[c].sum()) for c in gd.columns),
          lambda: sorted(int(pdm[c].sum()) for c in pdm.columns))
except Exception as e:  # noqa: BLE001
    print(f"PROBE DIFF [get_dummies] ours error {type(e).__name__}: {e}")

# stack/unstack round trip
try:
    pu = pR.groupby(["r", "c"])["v"].mean().unstack()
    bu = bR.groupby(["r", "c"]).mean().unstack()
    gu = bu.to_pandas().sort_index()
    pu = pu.sort_index()
    check("unstack grid",
          lambda: fl(np.nan_to_num(gu.to_numpy(), nan=-9).ravel()),
          lambda: fl(np.nan_to_num(pu.to_numpy(), nan=-9).ravel()))
except Exception as e:  # noqa: BLE001
    print(f"PROBE DIFF [unstack] ours error {type(e).__name__}: {e}")

print("wave25 part 15 done")
