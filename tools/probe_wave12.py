"""Adversarial pandas-parity probe wave 12: the r6-continuation and
r7 surfaces under their own edge inputs —

- frame-level ewm with per-column null patterns / an all-null column
  / mixed int+float dtypes, both adjust flavors;
- ewm(adjust=False).var/std/cov/corr (the r7 kernel-state carry):
  halflife/com spellings, min_periods > n, alpha extremes, single
  obs, two obs, all-null, one-side-constant corr, trailing nulls;
- resample at leap-year / year boundaries and with empty gap
  buckets (ME/MS/YE/YS values AND labels);
- anchored 2W-* date_range vs pandas origin rules (all anchors,
  on-anchor and off-anchor starts);
- combine_first with duplicate index labels (one side);
- grouped ewm halflife=/com= spellings vs pandas;
- idxmax/idxmin on date and boolean indexes (r6 advisory edge);
- read_csv list-na_values leaving mixed int/float remnants.

Run: python tools/probe_wave12.py — grep for 'PROBE DIFF'.
"""
import os
import sys

sys.path.insert(0, ".")
os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "8")

import numpy as np
import pandas as pd

import baloo_spark as bl


def eq(a, b):
    if isinstance(a, float) and isinstance(b, float):
        return (a != a and b != b) or abs(a - b) < 1e-7 \
            or (b != 0 and abs(a / b - 1) < 1e-7)
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

# ---------------------------------------------------------------- #
# 1. frame-level ewm: per-column null patterns, mixed dtypes,
#    an all-null column, both adjust flavors, var/std/mean
# ---------------------------------------------------------------- #
rng = np.random.RandomState(42)
pdf = pd.DataFrame({
    "a": rng.randn(40),
    "b": rng.randn(40) * 3,
    "i": rng.randint(0, 5, 40).astype(np.int64),
    "z": np.full(40, np.nan),
})
pdf.loc[::3, "a"] = np.nan
pdf.loc[1::4, "b"] = np.nan
df = mk(pdf)
for adj in (True, False):
    for stat in ("mean", "var", "std"):
        for ig in (False, True):
            got = getattr(df.ewm(alpha=0.35, adjust=adj,
                                 ignore_na=ig), stat)().to_pandas()
            want = getattr(pdf.ewm(alpha=0.35, adjust=adj,
                                   ignore_na=ig), stat)()
            for c in ("a", "b", "i", "z"):
                check(f"frame_ewm {stat} adj={adj} ig={ig} col={c}",
                      lambda c=c, g=got: fl(g[c]),
                      lambda c=c, w=want: fl(w[c]))

# ---------------------------------------------------------------- #
# 2. ewm(adjust=False) second moments: spellings and degeneracies
# ---------------------------------------------------------------- #
x = rng.randn(30)
x[[0, 1, 7, 29]] = np.nan
y = 0.5 * x + rng.randn(30)
y[[3, 4]] = np.nan
bx, by = bl.Series(x), bl.Series(y)
px, py = pd.Series(x), pd.Series(y)
for kw in ({"halflife": 3.0}, {"com": 1.5}, {"span": 5},
           {"alpha": 0.999}, {"alpha": 0.01},
           {"alpha": 0.5, "min_periods": 50},
           {"alpha": 0.5, "min_periods": 2}):
    for stat in ("var", "std"):
        check(f"noadj {stat} {kw}",
              lambda kw=kw, stat=stat: fl(getattr(
                  bx.ewm(adjust=False, **kw), stat)().to_pandas()),
              lambda kw=kw, stat=stat: fl(getattr(
                  px.ewm(adjust=False, **kw), stat)()))
    check(f"noadj cov {kw}",
          lambda kw=kw: fl(bx.ewm(adjust=False, **kw).cov(by)
                           .to_pandas()),
          lambda kw=kw: fl(px.ewm(adjust=False, **kw).cov(py)))
    check(f"noadj corr {kw}",
          lambda kw=kw: fl(bx.ewm(adjust=False, **kw).corr(by)
                           .to_pandas()),
          lambda kw=kw: fl(px.ewm(adjust=False, **kw).corr(py)))
# degeneracies: single obs, two obs, all-null, one-side constant
one = np.array([np.nan, 5.0, np.nan])
two = np.array([np.nan, 5.0, np.nan, 7.0])
nul = np.array([np.nan] * 4)
cst = np.array([2.5, 2.5, np.nan, 2.5])
for tag, arr in (("one", one), ("two", two), ("nul", nul)):
    check(f"noadj var {tag}-obs",
          lambda a=arr: fl(bl.Series(a).ewm(alpha=0.4, adjust=False)
                           .var().to_pandas()),
          lambda a=arr: fl(pd.Series(a).ewm(alpha=0.4, adjust=False)
                           .var()))
check("noadj corr one-side-constant",
      lambda: fl(bl.Series(two).ewm(alpha=0.4, adjust=False)
                 .corr(bl.Series(cst)).to_pandas()),
      lambda: fl(pd.Series(two).ewm(alpha=0.4, adjust=False)
                 .corr(pd.Series(cst))))
tr = np.r_[np.arange(6, dtype=float), [np.nan] * 5]
check("noadj var trailing nulls (same data)",
      lambda: fl(bl.Series(tr).ewm(alpha=0.3, adjust=False).var()
                 .to_pandas()),
      lambda: fl(pd.Series(tr).ewm(alpha=0.3, adjust=False).var()))
check("noadj std alpha=1.0",
      lambda: fl(bl.Series(tr).ewm(alpha=1.0, adjust=False).std()
                 .to_pandas()),
      lambda: fl(pd.Series(tr).ewm(alpha=1.0, adjust=False).std()))

# ---------------------------------------------------------------- #
# 3. resample at leap/year boundaries and empty buckets
# ---------------------------------------------------------------- #
def resample_case(tag, stamps, vals, freq):
    p = pd.DataFrame({"t": pd.to_datetime(stamps), "v": vals})

    def ours():
        b = mk(pd.DataFrame({"v": np.asarray(vals, dtype=float)}))
        b["t"] = bl.Series(p["t"].to_numpy())
        return b.resample(freq, on="t").sum().to_pandas()

    check(f"resample {tag} {freq} labels",
          lambda: [str(i) for i in ours().index.tolist()],
          lambda: [str(i) for i in
                   p.resample(freq, on="t").sum().index.tolist()])
    check(f"resample {tag} {freq} values",
          lambda: fl(ours()["v"]),
          lambda: fl(p.resample(freq, on="t").sum()["v"]))


resample_case("leap-feb",
              ["2024-02-27", "2024-02-29", "2024-03-01"],
              [1.0, 2.0, 4.0], "ME")
resample_case("leap-feb-starts",
              ["2024-02-27", "2024-02-29", "2024-03-01"],
              [1.0, 2.0, 4.0], "MS")
resample_case("year-wrap",
              ["2023-12-31 23:59:59", "2024-01-01 00:00:00"],
              [1.0, 2.0], "YE")
resample_case("year-wrap-starts",
              ["2023-12-31 23:59:59", "2024-01-01 00:00:00"],
              [1.0, 2.0], "YS")
resample_case("empty-gap-months",
              ["2024-01-15", "2024-05-15"], [1.0, 2.0], "ME")
resample_case("empty-gap-2month",
              ["2024-01-15", "2024-07-15"], [1.0, 2.0], "2ME")
resample_case("3-month-MS",
              ["2024-01-15", "2024-02-20", "2024-08-05"],
              [1.0, 2.0, 4.0], "3MS")
resample_case("2-year-YE",
              ["2021-06-01", "2024-06-01"], [1.0, 2.0], "2YE")
resample_case("2-year-YS",
              ["2021-06-01", "2024-06-01"], [1.0, 2.0], "2YS")
resample_case("2ME-on-edge",
              ["2024-01-31", "2024-02-01", "2024-03-31"],
              [1.0, 2.0, 4.0], "2ME")
resample_case("non-leap-feb",
              ["2023-02-27", "2023-02-28", "2023-03-01"],
              [1.0, 2.0, 4.0], "ME")

# ---------------------------------------------------------------- #
# 4. anchored 2W-* date_range vs pandas origin rules
# ---------------------------------------------------------------- #
for anchor in ("MON", "TUE", "WED", "THU", "FRI", "SAT", "SUN"):
    for start in ("2024-03-04", "2024-03-05", "2024-03-10"):
        f = f"2W-{anchor}"
        check(f"date_range {f} from {start}",
              lambda s=start, f=f: [str(x) for x in bl.date_range(
                  s, periods=4, freq=f).to_pandas().tolist()],
              lambda s=start, f=f: [str(x) for x in pd.date_range(
                  s, periods=4, freq=f).tolist()])
check("date_range 3W-SUN end=",
      lambda: [str(x) for x in bl.date_range(
          "2024-01-01", "2024-03-01", freq="3W-SUN")
          .to_pandas().tolist()],
      lambda: [str(x) for x in pd.date_range(
          "2024-01-01", "2024-03-01", freq="3W-SUN").tolist()])

# ---------------------------------------------------------------- #
# 5. combine_first duplicate labels (one side) — r7 fix
# ---------------------------------------------------------------- #
di = mk(pd.DataFrame({"k": np.array([0, 1], dtype=np.int64),
                      "v": [np.nan, 2.0]})).set_index("k")
do = mk(pd.DataFrame({"k": np.array([0, 0], dtype=np.int64),
                      "v": [10.0, 20.0]})).set_index("k")
check("combine_first other-dup",
      lambda: sorted(fl(di["v"].combine_first(do["v"]).to_pandas())),
      lambda: sorted(fl(pd.Series(
          [np.nan, 2.0], index=[0, 1]).combine_first(
          pd.Series([10.0, 20.0], index=[0, 0])))))

# ---------------------------------------------------------------- #
# 6. grouped ewm spellings
# ---------------------------------------------------------------- #
gp = pd.DataFrame({"g": ["a", "b"] * 12, "v": rng.randn(24)})
gp.loc[5::6, "v"] = np.nan
gb = mk(gp)
for kw in ({"halflife": 2.0}, {"com": 3.0},
           {"span": 4}, {"alpha": 0.6, "adjust": False}):
    for stat in ("mean", "var"):
        if stat == "var" and kw.get("adjust") is False:
            pass  # grouped var handles adjust via pandas kernel
        check(f"grouped ewm {stat} {kw}",
              lambda kw=kw, stat=stat: fl(getattr(
                  gb.groupby("g").ewm(**kw), stat)()
                  .to_pandas()["v"]),
              lambda kw=kw, stat=stat: fl(gp.groupby("g")["v"]
                  .transform(lambda t, kw=kw, stat=stat: getattr(
                      t.ewm(**kw), stat)())))

# ---------------------------------------------------------------- #
# 7. idxmax/idxmin on date and boolean indexes
# ---------------------------------------------------------------- #
dts = pd.to_datetime(["2024-01-01", "2024-06-15", "2023-12-31"])
pv = pd.Series([1.0, 9.0, 4.0], index=dts)
bf = mk(pd.DataFrame({"v": [1.0, 9.0, 4.0]}))
bf["d"] = bl.Series(dts.to_numpy())
bv = bf.set_index("d")["v"]
check("idxmax date index",
      lambda: str(pd.Timestamp(bv.idxmax())),
      lambda: str(pv.idxmax()))
check("idxmin date index",
      lambda: str(pd.Timestamp(bv.idxmin())),
      lambda: str(pv.idxmin()))
pb = pd.Series([3.0, 8.0], index=[True, False])
bb = mk(pd.DataFrame({"v": [3.0, 8.0],
                      "i": np.array([True, False])})).set_index("i")
check("idxmax bool index",
      lambda: bool(bb["v"].idxmax()),
      lambda: bool(pb.idxmax()))

# ---------------------------------------------------------------- #
# 8. read_csv list-na_values with mixed int/float remnants
# ---------------------------------------------------------------- #
import pathlib
import tempfile

tdir = pathlib.Path(tempfile.mkdtemp())
p = tdir / "mixed.csv"
p.write_text("a,b,c\n1,NA,x\n2.5,3,NA\nNA,4,z\n")
check("read_csv mixed remnants dtypes",
      lambda: [str(t) for t in
               bl.read_csv(str(p), na_values=["NA"])
               .to_pandas().dtypes],
      lambda: [str(t) for t in
               pd.read_csv(str(p), na_values=["NA"]).dtypes])
check("read_csv mixed remnants values",
      lambda: fl(bl.read_csv(str(p), na_values=["NA"])
                 .to_pandas()["a"].fillna(-9)),
      lambda: fl(pd.read_csv(str(p), na_values=["NA"])["a"]
                 .fillna(-9)))

print("probe wave 12 complete")
