"""Physical-layout helpers shared by the operator modules.

Motivation: the expression-heavy pipeline operators (text profiling,
shingling, embedding math, chunking) are bottlenecked by the SCAN's
partition count, not by their own plan shape. A small parquet file
with one row group arrives as ONE partition, which serializes every
per-row expression downstream onto a single core — Spark cannot split
inside a row group, so ``spark.sql.files.maxPartitionBytes`` does not
help. At 100 TB the scan naturally has thousands of files/row groups
and :func:`spread` is a no-op; on small/mid inputs it buys the full
core count for one cheap shuffle of the narrow projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["spread"]


def spread(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Spread a narrow input over the cluster when the scan arrived
    under-partitioned; no-op for streaming frames (a per-microbatch
    shuffle would cost more than single-core compute on microbatch-
    sized slices) and for scans already backed by >= target files.

    Width probes, cheapest first: file-backed plans report the files
    behind the scan (at 100 TB that's thousands of files — no-op
    without planning anything); plans with no files (checkpointed /
    cached / parallelized relations) fall back to the JVM-side
    physical partition count (``_jdf.rdd()`` builds the RDD DAG but
    runs no job; the Python-side ``df.rdd`` would additionally wrap
    it in a pickle-converting Python RDD). The r5 fallback matters:
    operators fed a localCheckpoint of the corpus (the shared-scan
    pattern every heavy driver slot now uses) used to re-shuffle the
    ENTIRE corpus here because a checkpoint reports zero input files
    — a data-sized Exchange per operator call, for nothing; the
    checkpoint already inherited the scan's partitioning.
    """
    if df.isStreaming:
        return df
    target = min_parts or df.sparkSession.sparkContext.defaultParallelism
    try:
        n_files = len(df.inputFiles())
    except Exception:
        n_files = 0
    if n_files >= target:
        return df
    try:
        n_parts = df._jdf.rdd().getNumPartitions()
    except Exception:
        n_parts = 0
    if n_parts >= target:
        return df
    return df.repartition(target)
