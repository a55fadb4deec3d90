"""Scale-safe dense row ordinals.

The reference's arrays are positional (SURVEY.md §1.4): slicing,
head/tail, iloc and RangeIndex all need a stable 0..n-1 row position.
A naive Spark translation is ``row_number() OVER (ORDER BY ...)`` —
which shuffles the entire table into ONE partition and dies at 100 TB.

We instead use the classic two-pass partition-offset scheme:

1. (optional) range-partition + sort within partitions by the order
   keys, so partition i holds a contiguous, globally ordered slice;
2. count rows per partition (a tiny job: one long per partition);
3. ordinal = cumulative offset of the partition + row position within
   the partition.

Within-partition positions come from ``monotonically_increasing_id``
(increasing within each partition by construction) so no window
function is needed at all for the unordered case; for the ordered
case a window PARTITIONED BY partition id keeps every partition's
work local (no single-partition collapse).

The input is eagerly local-checkpointed so the partition layout is
identical in both passes (Spark gives no cross-job determinism
guarantee otherwise); checkpoint blocks free on GC, unlike persist()
entries which sit in the CacheManager until explicitly unpersisted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ORD_COL = "__ord__"
# fresh positional column for slice/iloc/tail: NEVER reuse ORD_COL
# positions after a filter — surviving rows keep their original
# (now sparse) ordinals, which are labels, not positions
POS_COL = "__pos__"


def with_dense_ordinal(sdf: DataFrame, order_by: list | None = None,
                       name: str = ORD_COL) -> DataFrame:
    """Return ``sdf`` with a dense 0..n-1 long column ``name``.

    ``order_by``: list of pyspark Columns (or column names) defining
    the global order; None = current ingest/partition order.
    """
    if order_by:
        n = max(sdf.sparkSession.sparkContext.defaultParallelism, 2)
        sdf = sdf.repartitionByRange(n, *order_by).sortWithinPartitions(*order_by)

    sdf = sdf.withColumn("__mid__", F.monotonically_increasing_id())
    sdf = sdf.withColumn("__pid__", F.spark_partition_id())
    # localCheckpoint (eager) freezes the partition layout both passes
    # must agree on, WITHOUT registering a CacheManager entry: persist()
    # here leaked one cached plan per positional op for the session's
    # lifetime (never unpersisted), while checkpoint blocks are freed by
    # the ContextCleaner when the DataFrame is garbage-collected. Not
    # fault-tolerant to executor loss — an ephemeral positional op
    # re-runs from source on failure, which is the right trade.
    sdf = sdf.localCheckpoint()

    # Pass 1: per-partition counts -> cumulative offsets (tiny driver-side list).
    rows = sdf.groupBy("__pid__").count().collect()
    counts = {r["__pid__"]: r["count"] for r in rows}
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    spark = sdf.sparkSession
    off_df = spark.createDataFrame(
        [(int(p), int(o)) for p, o in offsets.items()], "__pid__ INT, __off__ LONG"
    )

    # Pass 2: broadcast-join the offsets; position within partition via
    # a pid-local window ordered by the monotonic id (mid order == row
    # order within a partition).
    w = Window.partitionBy("__pid__").orderBy("__mid__")
    out = (
        sdf.join(F.broadcast(off_df), "__pid__")
        .withColumn(name, F.col("__off__") + F.row_number().over(w) - 1)
        .drop("__pid__", "__mid__", "__off__")
    )
    return out
