"""The widened pandas surface, end to end on real testdata.

Every block is a pattern a pandas user reaches for daily, running
distributed: reshape (pivot_table/stack/melt), missing-data repair
(interpolate/ffill), time-series deltas (dt arithmetic +
total_seconds), named ops with fill_value, and the reshape guards
that turn silent wrong answers into errors (unstack/update
duplicate checks).

Run: python examples/pandas_cookbook.py [sf_dir]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "8")

import baloo_spark as bl


def main(sf_dir: str = "/root/testdata/sf0.001"):
    orders = bl.read_parquet(f"{sf_dir}/orders.parquet")
    li = bl.read_parquet(f"{sf_dir}/lineitem.parquet")

    # --- reshape: average order value by priority x status, with
    # margins (one two-phase pivot shuffle; the All column is a
    # second keyed agg, the All row a one-row global agg)
    pt = orders.pivot_table(values="o_totalprice",
                            index="o_orderpriority",
                            columns="o_orderstatus",
                            aggfunc="mean", margins=True)
    print("== pivot_table (margins)")
    print(pt.to_pandas().round(1))

    # --- wide -> long and back: stack is a zero-shuffle generator
    wide = li[["l_quantity", "l_discount"]].head(3)
    print("== stack (row-major, labels preserved)")
    print(wide.stack().to_pandas())

    # --- missing-data repair: mask a column, interpolate the gaps
    # (two boundary-carry passes, no global window)
    s = li["l_extendedprice"].where(li["l_quantity"] > 5)
    print("== interpolate: nulls",
          int(s.isna().sum()), "->", int(s.interpolate().isna().sum()))

    # --- time series: inter-event gaps in seconds
    ev = bl.read_parquet(f"{sf_dir}/events.parquet")
    ts = ev["ts"]
    gaps = (ts - ts.shift(1)).dt.total_seconds()
    print("== event gaps (s): mean", round(gaps.mean(), 3),
          "p95-ish max of head:", gaps.head(1000).max())

    # --- named ops with fill_value: disjoint sparse series combine
    a = li["l_extendedprice"].where(li["l_returnflag"] == "A")
    n = li["l_extendedprice"].where(li["l_returnflag"] == "N")
    combined = a.add(n, fill_value=0.0)
    print("== add(fill_value=0): non-null",
          int(combined.notna().sum()), "of", len(combined))


    # --- r8 conveniences: per-group analytics + label machinery
    # grouped sampling (seeded, proportional) for train/eval splits
    samp = li.groupby("l_returnflag").sample(frac=0.01,
                                             random_state=7)
    print("== groupby sample(frac=0.01):", len(samp), "rows")

    # per-group correlation matrix: k^2 pairs, ONE grouped shuffle
    corr = li[["l_returnflag", "l_quantity", "l_extendedprice",
               "l_discount"]].groupby("l_returnflag").corr()
    print("== groupby corr (stacked)")
    print(corr.to_pandas().round(3).head(6))

    # case_when compiles to one Catalyst CASE chain
    q = li["l_quantity"]
    band = q.case_when([(q < 10, 1.0), (q < 30, 2.0),
                        (q >= 30, 3.0)])
    print("== case_when bands:",
          band.value_counts().to_pandas().to_dict())

    # str.extractall: every regex match a row, JVM-side
    docs = bl.read_parquet(f"{sf_dir}/documents.parquet")
    words = docs["text"].head(200).str.extractall(r"(\bs[a-z]+)")
    print("== extractall s-words in 200 docs:", len(words))

    # --- guards: silent wrong answers become errors
    dup = bl.DataFrame({"k": ["x", "x"], "c": ["p", "p"],
                        "v": [1.0, 2.0]}).set_index(["k", "c"])
    try:
        dup["v"].unstack()
    except ValueError as e:
        print("== unstack duplicate guard:", str(e)[:60])


if __name__ == "__main__":
    main(*(sys.argv[1:2] or []))
