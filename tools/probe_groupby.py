"""Adversarial pandas-parity probe: groupby edge semantics.

Singleton-group var/std, all-null groups, null-skipping first/last,
idxmax ties, nunique with nulls, prod identity.
"""
import sys

sys.path.insert(0, ".")

import numpy as np
import pandas as pd

import baloo_spark as bl

KEYS = ["a", "a", "a", "b", "c", "c", "d", "d", "e"]
VALS = [1.0, None, 3.0, 7.0, None, None, 5.0, 5.0, 2.0]
#        a: [1,N,3]  b singleton  c all-null  d tie  e singleton


def frames():
    df = bl.DataFrame({
        "k": np.array(KEYS, dtype=object),
        "v": np.array([np.nan if v is None else v for v in VALS]),
    }, index=np.arange(len(KEYS), dtype=np.int64))
    pdf = pd.DataFrame({"k": KEYS, "v": [np.nan if v is None else v for v in VALS]})
    return df, pdf


def norm(d):
    out = {}
    for k, v in d.items():
        if isinstance(v, float) and pd.isna(v):
            out[k] = "<NaN>"
        elif v is None:
            out[k] = "<NaN>"
        elif isinstance(v, (float, np.floating)) and v == int(v):
            out[k] = int(v)
        else:
            out[k] = v
    return out


def run(tag, f_ours, f_pd):
    df, pdf = frames()
    try:
        o = f_ours(df)
        ours = norm(dict(zip(o.to_pandas().index.tolist(),
                             o.to_pandas()[o.to_pandas().columns[0]].tolist()))
                    if hasattr(o, "to_pandas") else o)
    except Exception as e:
        ours = f"RAISE {type(e).__name__}: {str(e)[:100]}"
    try:
        theirs = norm(dict(f_pd(pdf)))
    except Exception as e:
        theirs = f"RAISE {type(e).__name__}: {str(e)[:100]}"
    if ours != theirs:
        print(f"PROBE DIFF {tag}:\n  ours   {ours}\n  pandas {theirs}")
    else:
        print(f"ok {tag}")


g = lambda pdf: pdf.groupby("k")["v"]
run("sum", lambda d: d.groupby("k").sum(), lambda p: g(p).sum())
run("prod", lambda d: d.groupby("k").prod(), lambda p: g(p).prod())
run("mean", lambda d: d.groupby("k").mean(), lambda p: g(p).mean())
run("min", lambda d: d.groupby("k").min(), lambda p: g(p).min())
run("max", lambda d: d.groupby("k").max(), lambda p: g(p).max())
run("count", lambda d: d.groupby("k").count(), lambda p: g(p).count())
run("size", lambda d: d.groupby("k").size(), lambda p: p.groupby("k").size())
run("var", lambda d: d.groupby("k").var(), lambda p: g(p).var())
run("std", lambda d: d.groupby("k").std(), lambda p: g(p).std())
run("first", lambda d: d.groupby("k").first(), lambda p: g(p).first())
run("last", lambda d: d.groupby("k").last(), lambda p: g(p).last())
run("nunique", lambda d: d.groupby("k").nunique(), lambda p: g(p).nunique())
run("idxmax", lambda d: d.groupby("k").idxmax(), lambda p: g(p).idxmax())
run("idxmin", lambda d: d.groupby("k").idxmin(), lambda p: g(p).idxmin())
run("median", lambda d: d.groupby("k").median(), lambda p: g(p).median())
print("done")
