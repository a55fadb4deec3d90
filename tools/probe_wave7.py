"""Adversarial pandas-parity probe wave 7: lineage interactions of
the session-4 surfaces (filter -> interpolate -> shift chains,
pivot_table -> filter, explode -> iloc), groupby dict-agg naming,
merge suffixes, concat axis=1, rename mappers, sort_values
na_position / per-key ascending, negative iloc, round(dict), clip
with Series bounds, sample n>len.

Run: python tools/probe_wave7.py — grep for 'PROBE DIFF'; triage
before touching code (sentinel codec NaN==NULL DIFFs are intended).
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
        return (a != a and b != b) or a == b
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

# ------------------------------------------------- lineage interactions
p = pd.DataFrame({"a": [1., np.nan, 3., np.nan, 5.],
                  "b": [10., 20., 30., 40., 50.]})
d = mk(p)

check("filter_then_interpolate",
      lambda: d[d["b"] > 15]["a"].interpolate().to_pandas().tolist(),
      lambda: p[p["b"] > 15]["a"].interpolate().tolist())
check("interpolate_then_shift",
      lambda: d["a"].interpolate().shift(1).to_pandas().tolist(),
      lambda: p["a"].interpolate().shift(1).tolist())
check("interpolate_then_cumsum",
      lambda: d["a"].interpolate().cumsum().to_pandas().tolist(),
      lambda: p["a"].interpolate().cumsum().tolist())

pe = pd.DataFrame({"x": [[1, 2], [3, 4, 5]]})
de = bl.DataFrame({"x": np.array([[1, 2], [3, 4, 5]], dtype=object)})
check("explode_then_head",
      lambda: de.explode("x").head(3).to_pandas()["x"].tolist(),
      lambda: pe.explode("x").head(3)["x"].astype(float).tolist())

pt = pd.DataFrame({"k": ["a", "a", "b"], "c": ["x", "y", "x"],
                   "v": [1., 2., 3.]})
dt_ = mk(pt)
check("pivot_table_then_filter",
      lambda: (lambda f: f[f["x"] > 2].to_pandas()["x"].tolist())(
          dt_.pivot_table(values="v", index="k", columns="c",
                          aggfunc="sum")),
      lambda: (lambda f: f[f["x"] > 2]["x"].tolist())(
          pt.pivot_table(values="v", index="k", columns="c",
                         aggfunc="sum")))

# ------------------------------------------------------ groupby dict agg
pg = pd.DataFrame({"k": ["a", "a", "b"], "v": [1., 2., 3.],
                   "w": [4., 5., 6.]})
dg = mk(pg)
check("groupby_dict_agg",
      lambda: sorted(dg.groupby("k").agg({"v": ["sum", "mean"],
                                          "w": "max"})
                     .to_pandas().columns.tolist()),
      lambda: sorted("_".join(filter(None, c)) if isinstance(c, tuple)
                     else c for c in
                     pg.groupby("k").agg({"v": ["sum", "mean"],
                                          "w": "max"})
                     .columns.to_flat_index()))
check("groupby_dict_agg_values",
      lambda: dg.groupby("k").agg({"v": "sum"}).to_pandas()
      .iloc[:, 0].tolist(),
      lambda: pg.groupby("k").agg({"v": "sum"})["v"].tolist())

# ---------------------------------------------------------- merge edges
ml = pd.DataFrame({"k": [1, 2], "v": [1., 2.], "z": [7., 8.]})
mr = pd.DataFrame({"k": [1, 2], "v": [3., 4.], "y": [9., 0.]})
bml, bmr = mk(ml), mk(mr)
check("merge_suffixes_default",
      lambda: sorted(bml.merge(bmr, on="k").to_pandas()
                     .reset_index().columns.tolist()),
      lambda: sorted(ml.merge(mr, on="k").columns.tolist() + ["k"])
      if False else sorted(ml.merge(mr, on="k").columns.tolist()))
check("merge_custom_suffixes",
      lambda: sorted(bml.merge(bmr, on="k", suffixes=("_l", "_r"))
                     .to_pandas().reset_index().columns.tolist()),
      lambda: sorted(ml.merge(mr, on="k", suffixes=("_l", "_r"))
                     .columns.tolist() + ["index"])
      if False else sorted(ml.merge(mr, on="k", suffixes=("_l", "_r"))
                           .columns.tolist()))
check("merge_multi_key",
      lambda: bml.merge(bmr.rename(columns={"y": "q"}),
                        on=["k", "v"], how="inner").to_pandas()
      .shape[0],
      lambda: ml.merge(mr.rename(columns={"y": "q"}),
                       on=["k", "v"], how="inner").shape[0])

# ---------------------------------------------------------- concat axis=1
ca = pd.DataFrame({"a": [1., 2.]})
cb = pd.DataFrame({"b": [3., 4.]})
check("concat_axis1",
      lambda: bl.concat([mk(ca), mk(cb)], axis=1).to_pandas()
      .to_numpy().tolist(),
      lambda: pd.concat([ca, cb], axis=1).to_numpy().tolist())

# ------------------------------------------------------------ rename fn
check("rename_mapper_fn",
      lambda: mk(ca).rename(columns=str.upper).columns,
      lambda: ca.rename(columns=str.upper).columns.tolist())
check("rename_missing_key_ok",
      lambda: mk(ca).rename(columns={"zz": "q"}).columns,
      lambda: ca.rename(columns={"zz": "q"}).columns.tolist())

# ----------------------------------------------------------- sort edges
ps = pd.DataFrame({"a": [3., np.nan, 1.], "b": [1., 2., 3.]})
ds = mk(ps)
check("sort_na_position_first",
      lambda: ds.sort_values("a", na_position="first").to_pandas()
      ["b"].tolist(),
      lambda: ps.sort_values("a", na_position="first")["b"].tolist())
check("sort_per_key_ascending",
      lambda: ds.sort_values(["a", "b"], ascending=[False, True])
      .to_pandas()["b"].tolist(),
      lambda: ps.sort_values(["a", "b"], ascending=[False, True])
      ["b"].tolist())

# --------------------------------------------------------- iloc negative
check("iloc_negative",
      lambda: float(ds["b"].iloc[-1]),
      lambda: float(ps["b"].iloc[-1]))

# ---------------------------------------------------------- round(dict)
pr = pd.DataFrame({"a": [1.234, 5.678], "b": [1.234, 5.678]})
check("round_dict",
      lambda: mk(pr).round({"a": 1}).to_pandas().to_numpy().tolist(),
      lambda: pr.round({"a": 1}).to_numpy().tolist())

# --------------------------------------------------- clip series bounds
pc = pd.Series([1., 5., 9.])
lo = pd.Series([2., 2., 2.])
check("clip_series_bounds",
      lambda: bl.Series(pc.to_numpy())
      .clip(lower=bl.Series(lo.to_numpy())).to_pandas().tolist(),
      lambda: pc.clip(lower=lo).tolist())

# ---------------------------------------------------------- sample n>len
check("sample_n_gt_len",
      lambda: mk(ca).sample(n=10).to_pandas().shape[0],
      lambda: ca.sample(n=10).shape[0])

# ------------------------------------------------------- drop kwargs
check("drop_columns_kwarg",
      lambda: mk(pr).drop(columns=["a"]).columns,
      lambda: pr.drop(columns=["a"]).columns.tolist())

print("wave7 probe complete")
