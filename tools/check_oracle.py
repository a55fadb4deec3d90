"""Local replica of the driver's correctness gate.

Runs every ``queries()[name]`` on Spark and the matching
``oracle_sql()[name]`` on DuckDB over the same parquet tables, then
compares row count, column names/types, and order-insensitive values
(sorted rows, NaN/None normalized, floats compared to 1e-6).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, ".")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return round(v, 6)
    return v


def norm_rows(rows):
    return sorted([tuple(norm_cell(c) for c in r) for r in rows],
                  key=lambda t: tuple((x is None, str(x)) for x in t))


def compare(name, spark_df, duck_rows, duck_cols):
    s_cols = [c.lower() for c in spark_df.columns]
    d_cols = [c.lower() for c in duck_cols]
    problems = []
    if s_cols != d_cols:
        problems.append(f"SCHEMA: spark={s_cols} duck={d_cols}")
    s_rows = norm_rows([tuple(r) for r in spark_df.collect()])
    d_rows = norm_rows(duck_rows)
    if len(s_rows) != len(d_rows):
        problems.append(f"ROWS: spark={len(s_rows)} duck={len(d_rows)}")
    elif s_rows != d_rows:
        bad = sum(1 for a, b in zip(s_rows, d_rows) if a != b)
        problems.append(f"VALUES: {bad}/{len(s_rows)} rows differ; "
                        f"first diff: "
                        f"{next((a, b) for a, b in zip(s_rows, d_rows) if a != b)}")
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import duckdb

    import __spark_entry__ as entry
    from baloo_spark.session import get_session

    spark = get_session("oracle_check")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    passed, failed, rows_only = [], [], []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            t0 = time.perf_counter()
            sdf = fn(spark, sf_dir)
            if name not in oracles:
                n = sdf.count()
                rows_only.append((name, n))
                print(f"  ROWS-ONLY {name}: {n} rows")
                continue
            t_spark = time.perf_counter()
            cur = con.execute(oracles[name])
            duck_cols = [d[0] for d in cur.description]
            duck_rows = cur.fetchall()
            t_duck = time.perf_counter()
            problems = compare(name, sdf, duck_rows, duck_cols)
            t_cmp = time.perf_counter()
            timing = (f"[duck {t_duck - t_spark:.1f}s, "
                      f"spark+cmp {t_cmp - t_duck:.1f}s]")
            if problems:
                failed.append(name)
                print(f"  FAIL {name}: " + " | ".join(problems))
            else:
                passed.append(name)
                print(f"  PASS {name} ({len(duck_rows)} rows) {timing}")
        except Exception as e:
            failed.append(name)
            msg = str(e).split(chr(10))[0][:300]
            print(f"  ERROR {name}: {msg}")
    print(f"\n{len(passed)} passed, {len(failed)} failed, "
          f"{len(rows_only)} rows-only")
    if failed:
        print("failed:", failed)
        sys.exit(1)


if __name__ == "__main__":
    main()
