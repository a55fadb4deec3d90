"""Adversarial pandas-parity probe: string accessor edges.

Ours-vs-pandas over hostile inputs (empty strings, None, unicode,
regex metachars, negative/OOR indices). Prints `PROBE DIFF` lines;
triage each as real-bug / documented-divergence / probe-artifact.
Not a pytest — a hunting tool (see COVERAGE.md r5 probe notes).
"""
import sys

sys.path.insert(0, ".")

import numpy as np
import pandas as pd

import baloo_spark as bl

VALS = ["", "a", "Abc", "  pad  ", "a.b*c", "ä–ß", "aaa", "x" * 40, None,
        "tab\tsep", "CAPS", "multi word here", "0042", "-7", "ünïcödé"]


def series():
    return bl.Series(np.array(VALS, dtype=object), name="s"), pd.Series(VALS)


def cmp(tag, ours, theirs):
    o = ["<N>" if v is None or (isinstance(v, float) and pd.isna(v)) else v
         for v in ours]
    t = ["<N>" if v is None or (isinstance(v, float) and pd.isna(v)) else v
         for v in list(theirs)]
    # pandas float results (find on None) -> normalize ints
    o = [int(v) if isinstance(v, (int, np.integer)) and not isinstance(v, bool) else v for v in o]
    t = [int(v) if isinstance(v, (float, np.floating)) and v == int(v) and not pd.isna(v) else v for v in t]
    if o != t:
        print(f"PROBE DIFF {tag}:\n  ours   {o}\n  pandas {t}")
    else:
        print(f"ok {tag}")


def run(tag, f_ours, f_pd):
    s, p = series()
    try:
        ours = f_ours(s).to_pandas().tolist()
    except Exception as e:
        ours = f"RAISE {type(e).__name__}: {e}"
    try:
        theirs = list(f_pd(p))
    except Exception as e:
        theirs = f"RAISE {type(e).__name__}: {e}"
    if isinstance(ours, str) or isinstance(theirs, str):
        if str(ours)[:30] != str(theirs)[:30]:
            print(f"PROBE DIFF {tag}:\n  ours   {ours}\n  pandas {theirs}")
        else:
            print(f"ok {tag} (both raise)")
        return
    cmp(tag, ours, theirs)


run("lower", lambda s: s.str.lower(), lambda p: p.str.lower())
run("upper", lambda s: s.str.upper(), lambda p: p.str.upper())
run("capitalize", lambda s: s.str.capitalize(), lambda p: p.str.capitalize())
run("strip", lambda s: s.str.strip(), lambda p: p.str.strip())
run("len", lambda s: s.str.len(), lambda p: p.str.len())
for i in (0, 2, -1, -50, 50):
    run(f"get({i})", lambda s, i=i: s.str.get(i), lambda p, i=i: p.str.get(i))
for a, b, st in [(1, 3, 1), (0, None, 2), (-3, None, 1), (2, -1, 1),
                 (None, None, -1), (-1, -3, -1), (5, 2, 1), (5, 2, -1),
                 (3, None, -2), (-2, None, -2), (1, -10, -1), (10, None, -1),
                 (-10, None, -1), (0, 0, -1), (2, 2, -1), (-10, 50, 2),
                 (None, -2, 1), (-4, -1, 2), (None, 3, -1)]:
    run(f"slice({a},{b},{st})",
        lambda s, a=a, b=b, st=st: s.str.slice(a, b, st),
        lambda p, a=a, b=b, st=st: p.str.slice(a, b, st))
for pat in ["a", "a.b", ".", "*", "A"]:
    run(f"contains({pat!r})", lambda s, pat=pat: s.str.contains(pat),
        lambda p, pat=pat: p.str.contains(pat, regex=False))
for pat in ["a", "A", ""]:
    run(f"startswith({pat!r})", lambda s, pat=pat: s.str.startswith(pat),
        lambda p, pat=pat: p.str.startswith(pat))
    run(f"endswith({pat!r})", lambda s, pat=pat: s.str.endswith(pat),
        lambda p, pat=pat: p.str.endswith(pat))
for sub, a, b in [("a", 0, None), ("a", 1, None), ("a", 0, 2), ("z", 0, None),
                  ("", 0, None), ("a", -3, None), ("a", 0, -1), ("a", -10, -1),
                  ("", 10, None), ("", 3, 3), ("a", 10, None), ("a", 2, 1),
                  ("a", -1, None), ("pad", -6, -2)]:
    run(f"find({sub!r},{a},{b})", lambda s, sub=sub, a=a, b=b: s.str.find(sub, a, b),
        lambda p, sub=sub, a=a, b=b: p.str.find(sub, a, b))
for pat, rep in [("a", "X"), (".", "_"), ("aa", "b"), ("", "Y")]:
    run(f"replace({pat!r},{rep!r})", lambda s, pat=pat, rep=rep: s.str.replace(pat, rep),
        lambda p, pat=pat, rep=rep: p.str.replace(pat, rep, n=1, regex=False))
for pat in ["a", " ", "."]:
    run(f"split({pat!r},left)", lambda s, pat=pat: s.str.split(pat, "left"),
        lambda p, pat=pat: p.str.split(pat, n=1, regex=False).str[0])
for pat in ["a", ".", "*", ""]:
    run(f"count({pat!r})", lambda s, pat=pat: s.str.count(pat),
        lambda p, pat=pat: p.str.count(__import__("re").escape(pat)))
for n in (0, 1, 3, -1):
    run(f"repeat({n})", lambda s, n=n: s.str.repeat(n),
        lambda p, n=n: p.str.repeat(max(n, 0)) if n >= 0 else p.str.repeat(n))
for w in (0, 3, 6, 50):
    run(f"zfill({w})", lambda s, w=w: s.str.zfill(w),
        lambda p, w=w: p.str.zfill(w))
run("cat(sep='-')", lambda s: s.str.cat(bl.Series(np.array(VALS, dtype=object)), sep="-"),
    lambda p: p.str.cat(pd.Series(VALS), sep="-", na_rep=None) if False else p.str.cat(pd.Series(VALS), sep="-"))
print("done")
