"""Per-query profile: construction time (eager jobs run while the
query plan is being BUILT — checkpoints, collected scalars, resample
grids) vs noop-sink execution time, plus the Spark job count of each
phase. The job count exposes driver-scheduling-bound queries (many
small jobs) that wall-clock alone can't distinguish from data-bound
ones.

Usage: python tools/profile_bench.py [query ...]   (default: all 29
headline queries at $SPARK_GRAFT_SF_DIR, default sf0.1)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

from bench import HEADLINE  # noqa: E402


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:] or HEADLINE

    from baloo_spark.session import get_session
    import __spark_entry__ as entry

    spark = get_session("baloo_spark_profile")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    qs = entry.queries()

    for t in ["lineitem", "orders", "customer", "supplier", "nation",
              "region", "part", "documents", "embeddings"]:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()

    st = sc.statusTracker()

    def njobs():
        ids = st.getJobIdsForGroup(None) or []
        return max(ids) + 1 if ids else 0

    print(f"{'query':38s} {'build_s':>8s} {'bjobs':>6s} "
          f"{'exec_s':>8s} {'ejobs':>6s} {'build2_s':>8s} {'exec2_s':>8s}")
    rows = []
    for name in names:
        sc.setJobDescription(f"profile:{name}")
        # cold-ish pass (codegen compile) then a warm pass
        j0 = njobs(); t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        t1 = time.perf_counter(); j1 = njobs()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter(); j2 = njobs()
        # warm repeat
        t3 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        t4 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t5 = time.perf_counter()
        row = (name, t1 - t0, j1 - j0, t2 - t1, j2 - j1, t4 - t3, t5 - t4)
        rows.append(row)
        print(f"{row[0]:38s} {row[1]:8.2f} {row[2]:6d} "
              f"{row[3]:8.2f} {row[4]:6d} {row[5]:8.2f} {row[6]:8.2f}")
    tot_build = sum(r[1] for r in rows)
    tot_exec = sum(r[3] for r in rows)
    tot_b2 = sum(r[5] for r in rows)
    tot_e2 = sum(r[6] for r in rows)
    print(f"{'TOTAL':38s} {tot_build:8.2f} {'':6s} {tot_exec:8.2f} "
          f"{'':6s} {tot_b2:8.2f} {tot_e2:8.2f}")


if __name__ == "__main__":
    main()
