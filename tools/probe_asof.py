"""Adversarial pandas-parity probe: merge_asof edges.

allow_exact_matches=False, tolerance boundary inclusivity, nearest
ties, by-groups with no candidates, duplicate right timestamps.
"""
import sys

sys.path.insert(0, ".")

import numpy as np
import pandas as pd

import baloo_spark as bl


def mk(ts, key=None, val=None, vname="v"):
    d = {"ts": np.array(ts, dtype="int64")}
    if key is not None:
        d["k"] = np.array(key, dtype=object)
    if val is not None:
        d[vname] = np.array(val, dtype="float64")
    return bl.DataFrame(d, index=np.arange(len(ts), dtype=np.int64))


def pk(ts, key=None, val=None, vname="v"):
    d = {"ts": np.array(ts, dtype="int64")}
    if key is not None:
        d["k"] = key
    if val is not None:
        d[vname] = np.array(val, dtype="float64")
    return pd.DataFrame(d)


def norm(v):
    if v is None or (isinstance(v, float) and pd.isna(v)):
        return "<N>"
    if isinstance(v, (np.floating, float, np.integer, int)):
        return int(v) if float(v) == int(v) else float(v)
    return v


def run(tag, kwargs, lts, rts, rv, lkey=None, rkey=None):
    l, r = mk(lts, lkey), mk(rts, rkey, rv, "rv")
    pl_, pr_ = pk(lts, lkey), pk(rts, rkey, rv, "rv")
    kw = dict(kwargs)
    by = kw.pop("by", None)
    try:
        o = bl.merge_asof(l, r, on="ts", by=by, **kw).to_pandas()
        o = o.rename(columns={"rv_right": "rv"})
        o = o.sort_values("ts").reset_index(drop=True)
        ours = [tuple(norm(v) for v in row)
                for row in o[sorted(c for c in o.columns if c in ("ts", "k", "rv"))].itertuples(index=False)]
    except Exception as e:
        ours = f"RAISE {type(e).__name__}: {str(e)[:110]}"
    try:
        pkw = dict(kw)
        if "tolerance" in pkw and pkw["tolerance"] is not None:
            pkw["tolerance"] = int(pkw["tolerance"])
        t = pd.merge_asof(pl_.sort_values("ts"), pr_.sort_values("ts"),
                          on="ts", by=by, **{k: v for k, v in pkw.items()
                                             if k != "suffix"})
        t = t.sort_values("ts").reset_index(drop=True)
        theirs = [tuple(norm(v) for v in row)
                  for row in t[sorted(c for c in t.columns if c in ("ts", "k", "rv"))].itertuples(index=False)]
    except Exception as e:
        theirs = f"RAISE {type(e).__name__}: {str(e)[:110]}"
    if sorted(map(repr, ours)) if isinstance(ours, list) else ours != theirs:
        if isinstance(ours, list) and isinstance(theirs, list) and \
                sorted(map(repr, ours)) == sorted(map(repr, theirs)):
            print(f"ok {tag}")
            return
    if ours != theirs:
        print(f"PROBE DIFF {tag}:\n  ours   {ours}\n  pandas {theirs}")
    else:
        print(f"ok {tag}")


LTS = [5, 10, 15, 20]
RTS = [5, 10, 10, 18]
RV = [1.0, 2.0, 3.0, 4.0]

for d in ("backward", "forward", "nearest"):
    run(f"{d} exact", dict(direction=d), LTS, RTS, RV)
    run(f"{d} no-exact", dict(direction=d, allow_exact_matches=False),
        LTS, RTS, RV)
    run(f"{d} tol=3", dict(direction=d, tolerance=3), LTS, RTS, RV)
    run(f"{d} tol=0", dict(direction=d, tolerance=0), LTS, RTS, RV)

# nearest tie: left 10 equidistant from right 8 and 12 -> backward wins
run("nearest tie", dict(direction="nearest"), [10], [8, 12], [1.0, 2.0])
run("nearest tie noexact", dict(direction="nearest",
                                allow_exact_matches=False),
    [10, 11], [10, 12], [1.0, 2.0])

# by-groups: group with no right rows
run("by missing group", dict(direction="backward", by="k"),
    [5, 6], [4], [9.0], lkey=["a", "b"], rkey=["a"])
run("by nearest tol", dict(direction="nearest", by="k", tolerance=2),
    [5, 6, 20], [4, 7], [9.0, 8.0], lkey=["a", "a", "a"],
    rkey=["a", "a"])
print("done")
