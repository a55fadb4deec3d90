"""Adversarial pandas-parity probe wave 8: groupby(as_index=False),
frame any/all(axis=1), get_dummies(dummy_na), qcut(retbins),
Series.where(other=Series), Series.isin(Series), value_counts(sort=),
groupby on a Series key, duplicated keep=False parity, df.nunique
axis, melt value ordering, reset_index(names=).

Run: python tools/probe_wave8.py — grep for 'PROBE DIFF'.
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

pg = pd.DataFrame({"k": ["a", "a", "b"], "v": [1., 2., 3.]})
dg = mk(pg)

check("groupby_as_index_false",
      lambda: sorted(dg.groupby("k", as_index=False).sum()
                     .to_pandas().reset_index(drop=True)
                     .columns.tolist()),
      lambda: sorted(pg.groupby("k", as_index=False).sum()
                     .columns.tolist()))

pa = pd.DataFrame({"a": [1., 0., np.nan], "b": [1., 1., 0.]})
da = mk(pa)
check("frame_any_axis1",
      lambda: da.any(axis=1).to_pandas().tolist()
      if hasattr(da.any(axis=1), "to_pandas") else da.any(axis=1),
      lambda: pa.any(axis=1).tolist())
check("frame_all_axis1",
      lambda: da.all(axis=1).to_pandas().tolist()
      if hasattr(da.all(axis=1), "to_pandas") else da.all(axis=1),
      lambda: pa.all(axis=1).tolist())

pdum = pd.Series(["x", None, "y"])
check("get_dummies_dummy_na",
      lambda: sorted(bl.get_dummies(
          bl.Series(np.array(["x", None, "y"], dtype=object)),
          dummy_na=True).columns),
      lambda: sorted(str(c) for c in
                     pd.get_dummies(pdum, dummy_na=True).columns))

check("qcut_retbins",
      lambda: [round(b, 6) for b in bl.qcut(
          bl.Series(np.arange(10, dtype=float)), 2, retbins=True)[1]],
      lambda: [round(b, 6) for b in pd.qcut(
          pd.Series(np.arange(10, dtype=float)), 2, retbins=True)[1]])

ps1 = pd.Series([1., 5., 9.])
ps2 = pd.Series([10., 20., 30.])
check("where_other_series",
      lambda: bl.Series(ps1.to_numpy()).where(
          bl.Series(ps1.to_numpy()) > 4,
          bl.Series(ps2.to_numpy())).to_pandas().tolist(),
      lambda: ps1.where(ps1 > 4, ps2).tolist())

check("isin_series",
      lambda: bl.Series(ps1.to_numpy()).isin(
          bl.Series(np.array([5., 9.]))).to_pandas().tolist(),
      lambda: ps1.isin(pd.Series([5., 9.])).tolist())

check("value_counts_sort_false_total",
      lambda: sorted(bl.Series(np.array(["a", "b", "a"], dtype=object))
                     .value_counts().to_pandas().tolist()),
      lambda: sorted(pd.Series(["a", "b", "a"])
                     .value_counts().tolist()))

check("groupby_series_key",
      lambda: dg.groupby(dg["k"]).sum().to_pandas()["v"].tolist()
      if True else None,
      lambda: pg.groupby(pg["k"]).sum()["v"].tolist())

pdup = pd.DataFrame({"a": [1, 1, 2], "b": [1, 1, 3]})
check("duplicated_keep_false",
      lambda: mk(pdup).duplicated(keep=False).to_pandas().tolist(),
      lambda: pdup.duplicated(keep=False).tolist())

check("frame_nunique",
      lambda: mk(pdup).nunique().to_pandas().tolist(),
      lambda: pdup.nunique().tolist())

check("reset_index_names",
      lambda: dg.groupby("k").sum().reset_index().to_pandas()
      .columns.tolist(),
      lambda: pg.groupby("k").sum().reset_index().columns.tolist())

# melt preserves id column and value ordering conventions
pm = pd.DataFrame({"id": [1, 2], "x": [10., 20.], "y": [30., 40.]})
check("melt_values",
      lambda: sorted(map(tuple, mk(pm).melt(id_vars="id").to_pandas()
                         [["id", "variable", "value"]].values.tolist())),
      lambda: sorted(map(tuple, pm.melt(id_vars="id")
                         [["id", "variable", "value"]].values.tolist())))

# str accessor on numeric column: pandas raises AttributeError
check("str_on_numeric",
      lambda: bl.Series(np.array([1.0])).str.lower().to_pandas().tolist(),
      lambda: pd.Series([1.0]).str.lower().tolist())

print("wave8 probe complete")
