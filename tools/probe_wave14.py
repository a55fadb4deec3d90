"""Adversarial pandas-parity probe wave 14: the r7 convenience wave
plus the r8 advice fixes under their own edge inputs — DataFrame.dot
(non-aligned other, NULL cells, Series other), xs (duplicate labels,
missing key), combine (fill_value, mismatched indexes, dtype
promotion), align (join= flavors), reindex_like (duplicate labels in
the other), Series.update (NULL donors, partial overlap), asof
list-face vs scalar-face consistency (dup stamps, all-miss, string
values), eval with column names needing backticks (spaces, dots,
SQL keywords) and local_dict edges, loc list request-order/dups,
factorize both sort= flavors.

Run: python tools/probe_wave14.py — grep for 'PROBE DIFF'.
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


mk = lambda pdf: bl.DataFrame({k: pdf[k].to_numpy() for k in pdf})
fl = lambda s: [float(x) for x in np.asarray(s, dtype=float)]
mks = lambda ps, name="v": bl.Series(
    ps.to_numpy(), index=bl.Index(ps.index.to_numpy()), name=name)

# ---- DataFrame.dot ----
pdf = pd.DataFrame({"a": [1., 2., 3.], "b": [4., 5., 6.]})
df = mk(pdf)
other = pd.DataFrame({"x": [1., 0.], "y": [2., 3.]},
                     index=["a", "b"])
check("dot basic",
      lambda: df.dot(other).to_pandas().values.tolist(),
      lambda: pdf.dot(other).values.tolist())
# non-aligned: other missing a row for column 'b'
bad = pd.DataFrame({"x": [1.]}, index=["a"])
check("dot non-aligned raises",
      lambda: df.dot(bad).to_pandas().values.tolist(),
      lambda: pdf.dot(bad).values.tolist())
# extra row in other (superset index) — pandas raises too
sup = pd.DataFrame({"x": [1., 2., 3.]}, index=["a", "b", "zz"])
check("dot superset raises",
      lambda: df.dot(sup).to_pandas().values.tolist(),
      lambda: pdf.dot(sup).values.tolist())
# NULL cells propagate like pandas NaN arithmetic
pn = pd.DataFrame({"a": [1., np.nan], "b": [2., 3.]})
check("dot NaN cells",
      lambda: fl(mk(pn).dot(pd.Series([1., 1.], index=["a", "b"]))
                 .to_pandas()),
      lambda: fl(pn.dot(pd.Series([1., 1.], index=["a", "b"]))))
# Series other
check("dot series",
      lambda: fl(df.dot(pd.Series([2., -1.], index=["a", "b"]))
                 .to_pandas()),
      lambda: fl(pdf.dot(pd.Series([2., -1.], index=["a", "b"]))))

# ---- xs ----
pxs = pd.DataFrame({"a": [1., 2., 3.]}, index=["r1", "r2", "r1"])
bxs = bl.DataFrame({"k": np.array(["r1", "r2", "r1"], dtype=object),
                    "a": pxs["a"].to_numpy()}).set_index("k")
check("xs scalar hit",
      lambda: fl(bxs.xs("r2")),
      lambda: fl(pxs.xs("r2")))
check("xs dup labels",
      lambda: fl(bxs.xs("r1").to_pandas()["a"])
      if hasattr(bxs.xs("r1"), "to_pandas") else fl(bxs.xs("r1")),
      lambda: fl(pxs.xs("r1")["a"]))
check("xs missing raises",
      lambda: bxs.xs("zz"),
      lambda: pxs.xs("zz"))

# ---- combine ----
pc = pd.Series([1., np.nan, 3.], index=["a", "b", "c"])
po = pd.Series([10., 20.], index=["b", "d"])
check("series combine mismatched idx + fill",
      lambda: mks(pc).combine(mks(po), lambda x, y: x + y,
                              fill_value=0.0)
      .to_pandas().sort_index().tolist(),
      lambda: pc.combine(po, lambda x, y: x + y,
                         fill_value=0.0).sort_index().tolist())
check("series combine no fill (NaN both sides)",
      lambda: [None if v != v else v for v in
               mks(pc).combine(mks(po), lambda x, y:
                               (-99 if x != x else x)
                               + (-99 if y != y else y))
               .to_pandas().sort_index().tolist()],
      lambda: [None if v != v else v for v in
               pc.combine(po, lambda x, y:
                          (-99 if x != x else x)
                          + (-99 if y != y else y))
               .sort_index().tolist()])
pi = pd.Series([4, 9], index=["a", "b"])
check("combine int->float promotion",
      lambda: mks(pi).combine(mks(pi), lambda x, y: x / (y + 1))
      .to_pandas().sort_index().tolist(),
      lambda: pi.combine(pi, lambda x, y: x / (y + 1))
      .sort_index().tolist())

# ---- align ----
pa = pd.Series([1., 2.], index=["a", "b"])
pb = pd.Series([10., 20.], index=["b", "c"])
for flavor in ("outer", "inner", "left", "right"):
    check(f"align join={flavor}",
          lambda f=flavor: [
              [None if v != v else v for v in
               x.to_pandas().sort_index().tolist()]
              for x in mks(pa).align(mks(pb), join=f)],
          lambda f=flavor: [
              [None if v != v else v for v in
               x.sort_index().tolist()]
              for x in pa.align(pb, join=f)])

# ---- reindex_like ----
src = pd.Series([1., 2., 3.], index=["a", "b", "c"])
like_dup = pd.Series([0., 0., 0.], index=["b", "b", "a"])
check("reindex_like dup labels in other",
      lambda: mks(src).reindex_like(mks(like_dup))
      .to_pandas().sort_index().tolist(),
      lambda: src.reindex_like(like_dup).sort_index().tolist())
like_new = pd.Series([0., 0.], index=["c", "zz"])
check("reindex_like introduces NaN",
      lambda: [None if v != v else v for v in
               mks(src).reindex_like(mks(like_new))
               .to_pandas().sort_index().tolist()],
      lambda: [None if v != v else v for v in
               src.reindex_like(like_new).sort_index().tolist()])

# ---- Series.update ----
pu = pd.Series([1., 2., 3.], index=["a", "b", "c"])
donor = pd.Series([np.nan, 20.], index=["a", "b"])
check("update NULL donors skipped",
      lambda: (lambda s: s.update(mks(donor)).to_pandas()
               .sort_index().tolist())(mks(pu)),
      lambda: (lambda s: (s.update(donor), s)[1]
               .sort_index().tolist())(pu.copy()))
donor2 = pd.Series([99.], index=["zz"])
check("update non-overlapping donor is a no-op",
      lambda: mks(pu).update(mks(donor2)).to_pandas()
      .sort_index().tolist(),
      lambda: (lambda s: (s.update(donor2), s)[1]
               .sort_index().tolist())(pu.copy()))

# ---- asof list-face vs scalar-face consistency ----
pasof = pd.Series([1., 2., np.nan, 4.], index=[10, 20, 30, 40])
basof = mks(pasof)
for w in (5, 10, 25, 30, 45):
    check(f"asof scalar w={w}",
          lambda w=w: basof.asof(w),
          lambda w=w: pasof.asof(w))
check("asof list == scalars",
      lambda: [None if (isinstance(v, float) and v != v) else v
               for v in basof.asof([5, 10, 25, 30, 45])
               .to_pandas().tolist()],
      lambda: [basof.asof(w) for w in (5, 10, 25, 30, 45)])
pdup = pd.Series([1., 2., 3.], index=[10, 20, 20])
check("asof dup stamps list vs scalar",
      lambda: mks(pdup).asof([20]).to_pandas().tolist(),
      lambda: [pdup.asof(20)])
pstr = pd.Series(["x", "y"], index=[10, 20])
check("asof string all-miss",
      lambda: [v for v in mks(pstr).asof([1, 2]).to_pandas()],
      lambda: [None if v != v else v for v in pstr.asof([1, 2])])

# ---- eval backticks / odd column names ----
podd = pd.DataFrame({"col one": [1., 2.], "a.b": [3., 4.],
                     "select": [5., 6.]})
dodd = bl.DataFrame({"col one": podd["col one"].to_numpy(),
                     "a.b": podd["a.b"].to_numpy(),
                     "select": podd["select"].to_numpy()})
check("eval backtick space col",
      lambda: dodd.eval("`col one` * 2").to_pandas().tolist(),
      lambda: podd.eval("`col one` * 2").tolist())
check("eval backtick dotted col",
      lambda: dodd.eval("`a.b` + 1").to_pandas().tolist(),
      lambda: podd.eval("`a.b` + 1").tolist())
check("eval SQL keyword col",
      lambda: dodd.eval("select + 1").to_pandas().tolist(),
      lambda: podd.eval("select + 1").tolist())
check("eval local scalar",
      lambda: dodd.eval("select > t", local_dict={"t": 5})
      .to_pandas().tolist(),
      lambda: podd.eval("select > @t", local_dict={"t": 5}).tolist())

# ---- loc list order/dups; factorize flavors ----
pl = pd.Series([1., 2., 3.], index=["a", "a", "b"])
check("loc list order+dups",
      lambda: mks(pl).loc[["b", "a", "b"]].to_pandas().tolist(),
      lambda: pl.loc[["b", "a", "b"]].tolist())
pfz = pd.Series(["q", "p", "q", None, "r"])
for srt in (False, True):
    check(f"factorize sort={srt} codes",
          lambda s=srt: bl.Series(pfz.to_numpy(dtype=object))
          .factorize(sort=s)[0].to_pandas().tolist(),
          lambda s=srt: list(pd.factorize(pfz, sort=s)[0]))
    check(f"factorize sort={srt} uniques",
          lambda s=srt: list(bl.Series(pfz.to_numpy(dtype=object))
                             .factorize(sort=s)[1]),
          lambda s=srt: list(pd.factorize(pfz, sort=s)[1]))

print("wave 14 done")
