"""Adversarial pandas-parity probe: where/mask/between/mode/
value_counts/nlargest/clip/fillna-method edges."""
import sys

sys.path.insert(0, ".")

import numpy as np
import pandas as pd

import baloo_spark as bl


def norm(x):
    if x is None or (isinstance(x, float) and x != x):
        return "<N>"
    if isinstance(x, (np.floating, float, np.integer, int)) \
            and not isinstance(x, bool):
        return int(x) if float(x) == int(x) else round(float(x), 9)
    return x


def run(tag, f_ours, f_pd, unordered=False):
    try:
        ours = [norm(v) for v in f_ours().to_pandas().tolist()]
    except Exception as e:
        ours = f"RAISE {type(e).__name__}: {str(e)[:100]}"
    try:
        theirs = [norm(v) for v in list(f_pd())]
    except Exception as e:
        theirs = f"RAISE {type(e).__name__}: {str(e)[:100]}"
    if unordered and isinstance(ours, list) and isinstance(theirs, list):
        ours, theirs = sorted(map(repr, ours)), sorted(map(repr, theirs))
    if ours != theirs:
        print(f"PROBE DIFF {tag}:\n  ours   {ours}\n  pandas {theirs}")
    else:
        print(f"ok {tag}")


V = [3., 1., np.nan, 2., 5., 2.]
S = lambda: bl.Series(np.array(V), name="v")
P = lambda: pd.Series(V)

run("where cond", lambda: S().where(S() > 2),
    lambda: P().where(P() > 2))
run("where other", lambda: S().where(S() > 2, -1.0),
    lambda: P().where(P() > 2, -1.0))
run("mask cond", lambda: S().mask(S() > 2),
    lambda: P().mask(P() > 2))
run("between default", lambda: S().between(1.5, 3.0),
    lambda: P().between(1.5, 3.0))
run("between neither", lambda: S().between(1.5, 3.0, inclusive=False),
    lambda: P().between(1.5, 3.0, inclusive="neither"))
run("mode ties", lambda: bl.Series(np.array([1., 2., 2., 1., 3.]), name="v").mode(),
    lambda: pd.Series([1., 2., 2., 1., 3.]).mode())
run("mode with nan", lambda: bl.Series(np.array([1., np.nan, np.nan, 1.]), name="v").mode(),
    lambda: pd.Series([1., np.nan, np.nan, 1.]).mode())
run("nlargest series", lambda: S().nlargest(3), lambda: P().nlargest(3))
run("nsmallest series", lambda: S().nsmallest(2), lambda: P().nsmallest(2))
run("value_counts", lambda: S().value_counts(), lambda: P().value_counts(),
    unordered=True)
run("clip both", lambda: S().clip(1.5, 3.0), lambda: P().clip(1.5, 3.0))
run("clip lower-only", lambda: S().clip(2.0), lambda: P().clip(2.0))
run("diff", lambda: S().diff(), lambda: P().diff())
run("diff -1", lambda: S().diff(-1), lambda: P().diff(-1))
run("shift 2", lambda: S().shift(2), lambda: P().shift(2))
run("shift -2", lambda: S().shift(-2), lambda: P().shift(-2))
run("pct_change", lambda: S().pct_change(),
    lambda: P().pct_change(fill_method=None))
run("cummax", lambda: S().cummax(), lambda: P().cummax())
run("dropna", lambda: S().dropna(), lambda: P().dropna())
run("unique", lambda: S().unique(), lambda: pd.Series(P().unique()),
    unordered=True)
print("done")
