"""SparkSession bootstrap for baloo_spark.

The reference engine (radujica/baloo) runs single-process with Weld
threads (``baloo/weld/pyweld/weldobject.py:199-206``); our engine's
execution substrate is a SparkSession. Everything here is plain
public PySpark configuration.

Scale notes (local[32] test box vs 1000-executor cluster):
- AQE on: runtime coalescing of shuffle partitions, skew-join
  splitting, and dynamic join strategy switching are the main levers
  that make the same logical plans survive a 100x scale-up.
- Arrow on: every pandas boundary (toPandas / pandas_udf) is
  Arrow-batched, never row-at-a-time pickle.
- Session timezone pinned to UTC so timestamp semantics match the
  DuckDB oracle.
- Runtime Bloom-filter semi-join reduction stays at its Spark default
  (enabled): when a selective dim filter joins a large fact side
  (application-side scan > 10 GB — i.e. exactly the 100 TB case), the
  optimizer injects a bloom_filter_agg on the dim side and prunes the
  fact scan before the shuffle. Pinned by tests/test_plans.py::
  test_runtime_bloom_filter_join_pruning.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    # parquet scans: pruning + pushdown are defaults but pin them so a
    # misconfigured environment can't silently regress the plans.
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.csv.filterPushdown.enabled": "true",
    # Joins: let Catalyst broadcast aggressively; dims here are tiny
    # relative to fact tables at every SF.
    "spark.sql.autoBroadcastJoinThreshold": "64MB",
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_SHUFFLE", "32"),
    # generated-class cache (default 100 entries): a many-query
    # session (the 29-slot bench sweep, the test suite, any real
    # multi-query workload) compiles several codegen units per query
    # and evicts earlier entries before their plans re-run — warm
    # re-executions then pay Janino again. 1000 entries keeps every
    # unit of a session resident (~MBs of classes); workload-generic,
    # not a local[32] constant.
    "spark.sql.codegen.cache.maxEntries": "1000",
    # the events testdata carries TIMESTAMP(NANOS) which the vectorized
    # reader rejects; read as long and convert (streaming/events.py)
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # reference semantics: numeric ops wrap/saturate silently (NumPy /
    # Weld behavior), they don't raise — match DuckDB's non-ANSI
    # division/overflow behavior for oracle parity too
    "spark.sql.ansi.enabled": "false",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    "spark.ui.enabled": "false",
    # managed tables (bucketing) land in /tmp, never in the repo cwd
    "spark.sql.warehouse.dir": os.environ.get(
        "SPARK_GRAFT_WAREHOUSE", "/tmp/baloo_spark_warehouse"),
}


def get_session(app_name: str = "baloo_spark", master: str | None = None,
                extra_conf: dict | None = None) -> SparkSession:
    """Get or create the engine's SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default
    all cores) for the test environment; on a real cluster the caller
    passes nothing and spark-submit supplies the master.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(_DEFAULTS)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
