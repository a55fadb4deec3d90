"""Adversarial pandas-parity probe wave 16: fresh angles on mature
surfaces — the r8 local-carry rolling stats (window=1, all-NaN,
int inputs, rank tie methods, quantile interpolations, rolling after
filter so ordinals are sparse), a result-DTYPE sweep over narrow
input dtypes (int32/int8/bool through arithmetic, aggs, groupby,
fillna, cumsum — prior waves used int64/float64 only), non-BMP
unicode through the str accessor (JVM codepoint vs pandas len/slice
semantics), and lineage interactions of the r8 conveniences
(case_when into groupby, searchsorted after sort, set_axis into
merge).

Run: python tools/probe_wave16.py — grep for 'PROBE DIFF'. Triage
each DIFF real-bug / documented-divergence / artifact before
touching code (sentinel codec: NaN==NULL is intentional).
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


fl = lambda s: [float(x) for x in np.asarray(s, dtype=float)]
nn = lambda xs: [None if (isinstance(x, float) and x != x) else x
                 for x in xs]

# ---- rolling local stats: the fresh edges ----
v = np.array([3., np.nan, 1., 4., 4., np.nan, np.nan, 2., 9., 4.])
ps, s = pd.Series(v), bl.Series(v)

check("roll w=1 median mp=0",
      lambda: fl(s.rolling(1, min_periods=0).median().to_pandas()),
      lambda: fl(ps.rolling(1, min_periods=0).median()))
check("roll min all-nan window",
      lambda: fl(s.rolling(2).min().to_pandas()),
      lambda: fl(ps.rolling(2).min()))
check("roll rank avg ties",
      lambda: fl(s.rolling(4, min_periods=1).rank().to_pandas()),
      lambda: fl(ps.rolling(4, min_periods=1).rank()))
check("roll rank max pct",
      lambda: fl(s.rolling(5, min_periods=2)
                 .rank(method="max", pct=True).to_pandas()),
      lambda: fl(ps.rolling(5, min_periods=2)
                 .rank(method="max", pct=True)))
for itp in ("linear", "lower", "higher", "nearest", "midpoint"):
    check(f"roll quantile {itp}",
          lambda i=itp: fl(s.rolling(4, min_periods=2)
                           .quantile(0.35, interpolation=i)
                           .to_pandas()),
          lambda i=itp: fl(ps.rolling(4, min_periods=2)
                           .quantile(0.35, interpolation=i)))
allnan = pd.Series([np.nan] * 6)
check("roll median all-nan series",
      lambda: fl(bl.Series(allnan.to_numpy())
                 .rolling(3, min_periods=1).median().to_pandas()),
      lambda: fl(allnan.rolling(3, min_periods=1).median()))
iv = np.array([5, 1, 7, 7, 2, 9, 3], dtype=np.int64)
check("roll max int input",
      lambda: fl(bl.Series(iv).rolling(3).max().to_pandas()),
      lambda: fl(pd.Series(iv).rolling(3).max()))
# rolling after a filter: surviving ordinals are sparse labels
pf = pd.DataFrame({"k": np.arange(12), "x": np.arange(12) % 5 * 1.0})
bf = bl.DataFrame({"k": pf["k"].to_numpy(), "x": pf["x"].to_numpy()})
check("roll median after filter",
      lambda: fl(bf[bf["x"] > 0]["x"].rolling(3, min_periods=1)
                 .median().to_pandas()),
      lambda: fl(pf[pf["x"] > 0]["x"].rolling(3, min_periods=1)
                 .median()))
check("roll skew after filter",
      lambda: fl(bf[bf["x"] != 2]["x"].rolling(4).skew().to_pandas()),
      lambda: fl(pf[pf["x"] != 2]["x"].rolling(4).skew()))
# expanding-vs-rolling(w>=n) consistency face
check("roll w>n == expanding min",
      lambda: fl(s.rolling(99, min_periods=1).min().to_pandas()),
      lambda: fl(ps.expanding(1).min()))

# ---- narrow-dtype sweep: values AND result dtypes ----
i32 = np.array([5, -3, 7, 0, 2], dtype=np.int32)
i8 = np.array([1, 2, 3, 4, 5], dtype=np.int8)
bo = np.array([True, False, True, True, False])


def both(tag, f_ours, f_pd):
    check(tag + " values", f_ours, f_pd)


check("i32 + i32 values",
      lambda: (bl.Series(i32) + bl.Series(i32)).to_pandas().tolist(),
      lambda: (pd.Series(i32) + pd.Series(i32)).tolist())
# TRIAGED documented divergence: scalar aggs return f64 even for int
# inputs (the reference casts all numeric aggs to f64,
# weld_aggs.py:3; series._agg_expr keeps that convention), so the
# probe pins the engine contract rather than pandas' int64.
check("i32 sum f64 convention",
      lambda: type(bl.Series(i32).sum()).__name__,
      lambda: "float")
check("i32 sum value",
      lambda: int(bl.Series(i32).sum()),
      lambda: int(pd.Series(i32).sum()))
check("i8 mean",
      lambda: float(bl.Series(i8).mean()),
      lambda: float(pd.Series(i8).mean()))
check("bool sum",
      lambda: int(bl.Series(bo).sum()),
      lambda: int(pd.Series(bo).sum()))
check("bool mean",
      lambda: float(bl.Series(bo).mean()),
      lambda: float(pd.Series(bo).mean()))
check("bool cumsum",
      lambda: nn(bl.Series(bo).cumsum().to_pandas().tolist()),
      lambda: nn(pd.Series(bo).cumsum().tolist()))
check("i32 / 2 dtype float",
      lambda: str(bl.Series(i32).astype("float64").to_pandas().dtype),
      lambda: "float64")
check("i32 truediv values",
      lambda: fl((bl.Series(i32) / 2).to_pandas()),
      lambda: fl(pd.Series(i32) / 2))
check("i8 * bool",
      lambda: nn((bl.Series(i8) * bl.Series(bo))
                 .to_pandas().tolist()),
      lambda: nn((pd.Series(i8) * pd.Series(bo)).tolist()))
pg = pd.DataFrame({"g": ["a", "b", "a", "b", "a"],
                   "v": i32, "w": bo})
bg = bl.DataFrame({"g": np.array(pg["g"]), "v": i32, "w": bo})
check("groupby sum i32+bool",
      lambda: sorted(map(tuple, bg.groupby("g").sum().reset_index()
                         .to_pandas()[["g", "v", "w"]]
                         .astype({"v": float, "w": float}).values
                         .tolist())),
      lambda: sorted(map(tuple, pg.groupby("g").sum().reset_index()
                         [["g", "v", "w"]]
                         .astype({"v": float, "w": float}).values
                         .tolist())))
check("i32 fillna stays numeric",
      lambda: fl(bl.Series(np.array([1., np.nan, 3.]))
                 .astype("int32").to_pandas()),
      lambda: fl(pd.Series([1., np.nan, 3.]).astype("Int32")
                 .astype("float64")))
check("i32 sort_values",
      lambda: bl.Series(i32).sort_values().to_pandas().tolist(),
      lambda: pd.Series(i32).sort_values(ignore_index=True).tolist())
check("i8 merge key",
      lambda: sorted(bl.DataFrame({"k": i8, "v": i32})
                     .merge(bl.DataFrame({"k": i8}), on="k")
                     .to_pandas()["v"].tolist()),
      lambda: sorted(pd.DataFrame({"k": i8, "v": i32})
                     .merge(pd.DataFrame({"k": i8}), on="k")
                     ["v"].tolist()))
check("bool value_counts",
      lambda: bl.Series(bo).value_counts().to_pandas().tolist(),
      lambda: pd.Series(bo).value_counts().tolist())
check("i32 diff",
      lambda: fl(bl.Series(i32).diff().to_pandas()),
      lambda: fl(pd.Series(i32).diff()))
check("bool astype int",
      lambda: bl.Series(bo).astype("int64").to_pandas().tolist(),
      lambda: pd.Series(bo).astype("int64").tolist())
check("i32 clip",
      lambda: bl.Series(i32).clip(0, 5).to_pandas().tolist(),
      lambda: pd.Series(i32).clip(0, 5).tolist())

check("bool+bool is OR",
      lambda: (bl.Series(bo) + bl.Series(bo[::-1].copy()))
      .to_pandas().tolist(),
      lambda: (pd.Series(bo) + pd.Series(bo[::-1])).tolist())
check("bool*bool is AND",
      lambda: (bl.Series(bo) * bl.Series(bo[::-1].copy()))
      .to_pandas().tolist(),
      lambda: (pd.Series(bo) * pd.Series(bo[::-1])).tolist())
check("bool-bool refused",
      lambda: (bl.Series(bo) - bl.Series(bo)),
      lambda: (pd.Series(bo) - pd.Series(bo)))
check("frame sum includes bool",
      lambda: nn(bl.DataFrame({"v": np.array([1., 2.]), "w": bo[:2]})
                 .sum().to_pandas().tolist()),
      lambda: nn([float(x) for x in
                  pd.DataFrame({"v": [1., 2.], "w": bo[:2]})
                  .sum()]))
check("frame sum axis=1 includes bool",
      lambda: fl(bl.DataFrame({"v": np.array([1., 2.]), "w": bo[:2]})
                 .sum(axis=1).to_pandas()),
      lambda: fl(pd.DataFrame({"v": [1., 2.], "w": bo[:2]})
                 .sum(axis=1)))

# ---- non-BMP unicode through .str (JVM codepoints vs pandas) ----
u = np.array(["héllo", "naïve", "🎉party", "a🎈b🎈c", "日本語テキスト", ""])
pu, su = pd.Series(u), bl.Series(u)
check("str.len non-BMP",
      lambda: nn(su.str.len().to_pandas().tolist()),
      lambda: nn([float(x) for x in pu.str.len()]))
check("str.get emoji",
      lambda: nn(su.str.get(1).to_pandas().tolist()),
      lambda: nn(pu.str.get(1).tolist()))
check("str.slice non-BMP",
      lambda: nn(su.str.slice(1, 4).to_pandas().tolist()),
      lambda: nn(pu.str.slice(1, 4).tolist()))
check("str.upper accents",
      lambda: su.str.upper().to_pandas().tolist(),
      lambda: pu.str.upper().tolist())
check("str.contains emoji",
      lambda: su.str.contains("🎈").to_pandas().tolist(),
      lambda: pu.str.contains("🎈").tolist())
# engine split is the REFERENCE flavor (strings.py:190-219): split
# at the FIRST occurrence, return the left/right PART — not pandas'
# list split. Pin the engine contract with emoji separators.
check("str.split emoji sep (reference left-part contract)",
      lambda: nn(su.str.split("🎈").to_pandas().tolist()),
      lambda: nn([s.split("🎈")[0] for s in u]))
check("str.split emoji right side",
      lambda: nn(su.str.split("🎈", side="right")
                 .to_pandas().tolist()),
      lambda: nn([s.split("🎈", 1)[1] if "🎈" in s else None
                  for s in u]))
check("str.slice step non-BMP",
      lambda: nn(su.str.slice(0, 5, 2).to_pandas().tolist()),
      lambda: nn(pu.str.slice(0, 5, 2).tolist()))

# ---- r8 conveniences under lineage ----
pc = pd.DataFrame({"v": [1., 5., 2., 8., 3.],
                   "g": ["x", "y", "x", "y", "x"]})
bc = bl.DataFrame({"v": pc["v"].to_numpy(), "g": np.array(pc["g"])})
check("case_when into groupby",
      lambda: sorted(map(tuple,
                         bc.assign(b=bc["v"].case_when(
                             [(bc["v"] > 4, 1.0)]).fillna(0.0))
                         .groupby("g").sum().reset_index()
                         .to_pandas()[["g", "b"]].values.tolist())),
      lambda: sorted(map(tuple,
                         pc.assign(b=pc["v"].case_when(
                             [(pc["v"] > 4, 1.0)]).fillna(0.0)
                             .infer_objects())
                         .groupby("g").sum().reset_index()
                         [["g", "b"]].values.tolist())))
check("searchsorted after sort lineage",
      lambda: int(bc.sort_values("v")["v"].searchsorted(4.0)),
      lambda: int(pc.sort_values("v")["v"].reset_index(drop=True)
                  .searchsorted(4.0)))
check("set_axis then merge",
      lambda: sorted(bc.set_axis(["a", "b"], axis=1)
                     .merge(bl.DataFrame(
                         {"b": np.array(["x", "y"]),
                          "z": np.array([10., 20.])}), on="b")
                     .to_pandas()["z"].tolist()),
      lambda: sorted(pc.set_axis(["a", "b"], axis=1)
                     .merge(pd.DataFrame({"b": ["x", "y"],
                                          "z": [10., 20.]}), on="b")
                     ["z"].tolist()))
check("factorize after filter",
      lambda: bl.DataFrame({"s": np.array(list("cabcab"))})
      .pipe(lambda d: d[d["s"] != "b"]["s"].factorize()[0].tolist()),
      lambda: pc.pipe(lambda _: pd.Series(list("cabcab"))
                      .pipe(lambda x: x[x != "b"].factorize()[0]
                            .tolist())))

print("wave 16 done")
