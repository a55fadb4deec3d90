"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "total_runtime", "value": N, "unit": "sec",
   "queries": {name: sec, ...}, "sf": 0.1}

Each query is forced through a noop sink (df.write.format('noop')) so
the FULL result is computed — a bare count() would let Catalyst prune
the computed columns away and undercount the work.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# queries that represent the engine's breadth: the reference benchmark
# pipeline shape (filter/assign/agg/groupby/join), sorts/windows, and
# the scale-path operators (dedup/similarity/text/streaming faces)
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "q6_revenue",
    "q10_returned_revenue",
    "q13_order_distribution",
    "q18_large_orders",
    "asof_join",
    "range_join",
    "grouped_zscore",
    "describe",
    "filter_assign_pipeline",
    "agg_rows",
    "groupby_stats",
    "merge_inner_left",
    "sort_nlargest",
    "window_topk",
    "unary_math",
    "str_ops",
    "dedup_exact",
    "dedup_jaccard_minhash",
    "embedding_topk",
    "text_metrics",
    "events_window",
    "events_sessions",
    # r3 additions: TPC-H completion heavies + LLM-pipeline slot
    "q2_q16_q21_supplier_shapes",
    "q7_q8_q9_nation_trade",
    "q11_q15_q17_q20_q22_thresholds",
    "doc_pipeline_stats",
]


# Quiet-window 32-thread calibration baseline (seconds) for THIS box:
# the r6 quiet snapshot read mc 0.376/0.380 while the co-tenant-
# polluted driver run read 0.436 with identical code. A run whose mc
# reading exceeds the baseline by >12% is machine-flagged "polluted"
# so trend tables label it instead of a human remembering the rule.
# Factor calibration: the r6 polluted run read 0.436 — only +15% over
# quiet — yet distorted code-unchanged slots up to 2x, so the flag
# trips at +12% (midway between the quiet band's own spread ~1% and
# the observed-distortion reading), not the naive +25%.
MC_QUIET_BASELINE = 0.38
MC_POLLUTED_FACTOR = 1.12


def _host_speed() -> float:
    """Single-core calibration loop (seconds; LOWER = faster host).

    Host CPU on shared boxes varies ~2x between runs with zero local
    load; identical code has produced 48-66s cold totals. This pure-
    Python loop (~1s on a quiet host) is timed before and after the
    query sweep so BENCH_TREND can normalize round-over-round deltas
    or auto-flag a polluted run instead of hand-adjudicating."""
    t0 = time.perf_counter()
    acc = 0
    for i in range(8_000_000):
        acc += i ^ (i >> 3)
    assert acc != 0
    return round(time.perf_counter() - t0, 3)


def _spark_speed(spark) -> float:
    """MULTICORE calibration (seconds; lower = faster): a fixed
    range->hash-agg Spark job on all threads, warm median of 3.

    The single-core loop misses the contention mode that actually
    bites: a co-tenant can leave single-core turbo untouched while
    halving 32-thread throughput (measured r6: identical code 0.30s
    -> 0.68s while the single-core loop read a FAST 0.74s). Compare
    this value ACROSS runs — the run with the lowest reading was the
    quietest window and its totals are the trustworthy snapshot."""
    from pyspark.sql import functions as F

    def once():
        t0 = time.perf_counter()
        (spark.range(200_000_000)
         .select(F.col("id"), (F.col("id") % 1000).alias("k"))
         .groupBy("k").agg(F.sum("id"))
         .write.format("noop").mode("overwrite").save())
        return time.perf_counter() - t0

    once()  # codegen warmup
    return round(sorted(once() for _ in range(3))[1], 3)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").split("sf")[-1])

    from baloo_spark.session import get_session
    import __spark_entry__ as entry

    spark = get_session("baloo_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = entry.queries()

    # warm the session once (JVM + file listing + parquet footers), so
    # per-query timings measure the queries, not cluster startup; each
    # query still pays its own codegen compile on first run
    for t in ["lineitem", "orders", "customer", "supplier", "nation",
              "region", "part", "documents", "embeddings"]:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()

    def run_once(name):
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # cold = first run (pays whole-stage-codegen compile + JIT for that
    # query's operators); warm = min of two re-runs of a freshly-built
    # plan (codegen cache hit, full recompute — noop sink caches
    # nothing; min-of-2 damps host-load noise, which swings totals by
    # ±20% on this box). Reported separately so round-over-round deltas
    # are signal, not first-run compile noise. "value"/"queries" remain
    # the cold pass, methodology-compatible with BENCH_r01.
    speed_pre = _host_speed()
    mc_pre = _spark_speed(spark)
    cold, warm = {}, {}
    for name in HEADLINE:
        cold[name] = round(run_once(name), 3)
        warm[name] = round(min(run_once(name), run_once(name)), 3)
    speed_post = _host_speed()
    mc_post = _spark_speed(spark)

    polluted = max(mc_pre, mc_post) \
        > MC_POLLUTED_FACTOR * MC_QUIET_BASELINE
    print(json.dumps({
        "metric": "total_runtime",
        "value": round(sum(cold.values()), 3),
        "unit": "sec",
        "queries": cold,
        "queries_warm": warm,
        "value_warm": round(sum(warm.values()), 3),
        # calibration (sec, lower = faster host), timed before/after
        # the sweep. mc_* is the 32-thread range hash-agg — compare
        # across runs; a high reading marks the run polluted even
        # when the single-core loop looks fast (co-tenant contention
        # hits many-core throughput first). "polluted" automates the
        # adjudication: either mc reading >12% over the stored quiet
        # baseline means per-query deltas from this run are
        # untrustworthy — compare against a quiet-window snapshot.
        # (threshold +12%: the r6 polluted run read only +15%)
        "host_speed": {"pre": speed_pre, "post": speed_post,
                       "mc_pre": mc_pre, "mc_post": mc_post,
                       "mc_quiet_baseline": MC_QUIET_BASELINE,
                       "polluted": polluted},
        "sf": sf,
    }))


if __name__ == "__main__":
    main()
