"""Adversarial pandas-parity probe: datetime accessor edges.

Ours-vs-pandas over pre-1970 dates, microseconds, NaT, leap days,
ISO-week boundaries, DST-less UTC.
"""
import sys

sys.path.insert(0, ".")

import numpy as np
import pandas as pd

import baloo_spark as bl

VALS = [
    "2020-02-29 23:59:59.999500",   # leap day + microseconds
    "1969-12-31 23:59:59",          # pre-epoch
    "1900-03-01 00:00:00",          # non-leap century year
    "2021-01-01 00:00:00",          # ISO week 53 of 2020
    "2024-12-30 12:34:56.789",      # ISO week 1 of 2025
    "2000-01-01 00:00:00.000001",
    None,                            # NaT
    "1970-01-01 00:00:00",
    "2038-01-19 03:14:08",          # past 32-bit epoch
    "1680-07-04 12:00:00",          # pre-epoch, inside ns range
]


def series():
    arr = np.array([np.datetime64(v) if v else np.datetime64("NaT")
                    for v in VALS], dtype="datetime64[us]")
    return bl.Series(arr, name="t"), pd.Series(arr)


def norm(v):
    if v is None or (isinstance(v, float) and pd.isna(v)) or pd.isna(v):
        return "<N>"
    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, (np.floating,)):
        return float(v) if v != int(v) else int(v)
    if isinstance(v, (pd.Timestamp, np.datetime64)):
        return pd.Timestamp(v).isoformat()
    return v


def run(tag, f_ours, f_pd):
    s, p = series()
    try:
        ours = [norm(v) for v in f_ours(s).to_pandas()]
    except Exception as e:
        ours = f"RAISE {type(e).__name__}: {str(e)[:120]}"
    try:
        theirs = [norm(v) for v in f_pd(p)]
    except Exception as e:
        theirs = f"RAISE {type(e).__name__}: {str(e)[:120]}"
    if isinstance(ours, str) or isinstance(theirs, str):
        print(("ok " if str(ours)[:20] == str(theirs)[:20] else "PROBE DIFF ")
              + f"{tag}:\n  ours   {ours}\n  pandas {theirs}"
              if isinstance(ours, str) != isinstance(theirs, str)
              or str(ours)[:20] != str(theirs)[:20] else f"ok {tag} (both raise)")
        return
    if ours != theirs:
        print(f"PROBE DIFF {tag}:\n  ours   {ours}\n  pandas {theirs}")
    else:
        print(f"ok {tag}")


for attr in ["year", "month", "day", "hour", "minute", "second",
             "dayofweek", "dayofyear", "quarter"]:
    run(attr, lambda s, a=attr: getattr(s.dt, a)(),
        lambda p, a=attr: getattr(p.dt, a))
run("week", lambda s: s.dt.week(), lambda p: p.dt.isocalendar().week.astype("float"))
run("date", lambda s: s.dt.date(), lambda p: p.dt.normalize())
for freq in ["D", "H", "h", "min", "T", "S", "15min", "2H", "30S", "ms"]:
    run(f"floor({freq})", lambda s, f=freq: s.dt.floor(f),
        lambda p, f=freq: p.dt.floor(f))
for fmt in ["%Y-%m-%d", "%Y/%m/%d %H:%M:%S", "%d %b %Y", "%H:%M",
            "%j", "%U", "%A", "%a", "%B", "%m-%d-%y", "%Y%m%d%H%M%S",
            "100%% %Y", "%I %p"]:
    run(f"strftime({fmt!r})", lambda s, f=fmt: s.dt.strftime(f),
        lambda p, f=fmt: p.dt.strftime(f))
print("done")
