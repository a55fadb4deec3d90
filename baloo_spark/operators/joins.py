"""Temporal join operators Spark lacks as built-ins: as-of and range.

The reference has only equi sort-merge join (SURVEY.md §2.3,
weld_joins.py:76-107); these are engine extensions expressed as
compositions of existing DataFrame ops — no mapPartitions, no
custom physical operators — so Catalyst/AQE still plan them.

Scale design:

- **as-of**: the classic union + partitioned carry-forward trick.
  Tag both sides, union, and per partition-key run a
  last-non-null window ordered by time. ONE shuffle on the by-key
  (same as any grouped op); no per-row probing, no range explosion.
- **range**: bucketize both sides by floor(ts / width) and equi-join
  each left bucket against its 3 neighboring right buckets, then
  filter the exact predicate. Turns an inequality join (which Spark
  would plan as a broadcast-nested-loop) into an equi shuffle join
  with bounded fan-out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str = "ts",
              by: str | list | None = None, right_cols: list | None = None,
              suffix: str = "_right", tolerance: int | None = None) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right.on <= left.on`` (inclusive), matching ``by`` keys.

    ``tolerance``: optional max staleness in seconds — older right
    rows are treated as no-match (NULL), like pandas merge_asof.

    Scale: with ``by`` keys the carry-forward window partitions on
    them (one shuffle, state per key). With NO ``by`` keys the union
    goes through :func:`~baloo_spark.plans.ordinal.with_last_non_null`
    — range-partitioned by time, partition-local carry windows, and a
    one-row-per-partition boundary table prefix-carried on the driver
    — so a global as-of never collapses to a single partition.
    """
    by = [by] if isinstance(by, str) else list(by or [])
    right_cols = right_cols or [c for c in right.columns
                                if c != on and c not in by]

    l = left.withColumn("__src__", F.lit(1))
    r = right.select(*by, on, *right_cols).withColumn("__src__", F.lit(0))
    for c in right_cols:
        r = r.withColumnRenamed(c, c + suffix)
    unioned = l.unionByName(r, allowMissingColumns=True)

    if by:
        # right rows sort before left at equal timestamps => inclusive <=
        w = Window.partitionBy(*by) \
            .orderBy(F.col(on).asc(), F.col("__src__").asc()) \
            .rowsBetween(Window.unboundedPreceding, 0)
        carried = unioned
        for c in right_cols:
            carried = carried.withColumn(
                c + suffix, F.last(c + suffix, ignorenulls=True).over(w))
        carried = carried.withColumn(
            "__rts__", F.last(F.when(F.col("__src__") == 0, F.col(on)),
                              ignorenulls=True).over(w))
    else:
        from ..plans.ordinal import with_last_non_null
        exprs = {c + suffix: F.col(c + suffix) for c in right_cols}
        exprs["__rts__"] = F.when(F.col("__src__") == 0, F.col(on))
        carried = with_last_non_null(
            unioned, exprs, [F.col(on).asc(), F.col("__src__").asc()])
    out = carried.filter(F.col("__src__") == 1).drop("__src__")
    if tolerance is not None:
        stale = (F.unix_timestamp(F.col(on))
                 - F.unix_timestamp(F.col("__rts__"))) > tolerance
        for c in right_cols:
            out = out.withColumn(c + suffix,
                                 F.when(stale, None).otherwise(F.col(c + suffix)))
    return out.withColumnRenamed("__rts__", "matched_" + on)


def range_join(left: DataFrame, right: DataFrame, on: str = "ts",
               by: str | list | None = None, lower: int = 0,
               upper: int = 3600, right_cols: list | None = None,
               suffix: str = "_right") -> DataFrame:
    """All (left, right) pairs with ``lower <= right.on - left.on <=
    upper`` (seconds), matching ``by`` keys — bucketed equi-join, not
    a nested loop.

    Bucket width = the range span; each left row probes ceil(span/
    width)+1 = 2 buckets, so the join fans out x2, not xN.
    """
    by = [by] if isinstance(by, str) else list(by or [])
    right_cols = right_cols or [c for c in right.columns
                                if c != on and c not in by]
    width = max(upper - lower, 1)

    le = left.withColumn("__e__", F.unix_timestamp(F.col(on)))
    re_ = right.select(*by, on, *right_cols) \
        .withColumn("__re__", F.unix_timestamp(F.col(on))) \
        .withColumn("__bkt__", F.floor(F.col("__re__") / width))
    for c in right_cols + [on]:
        re_ = re_.withColumnRenamed(c, c + suffix)

    # left probes the two buckets its window [e+lower, e+upper] spans
    probes = F.array(F.floor((F.col("__e__") + lower) / width),
                     F.floor((F.col("__e__") + upper) / width))
    le = le.withColumn("__bkt__", F.explode(F.array_distinct(probes)))

    cond = [le["__bkt__"] == re_["__bkt__"]] + \
        [le[b] == re_[b] for b in by]
    joined = le.join(re_, cond).drop("__bkt__")
    delta = F.col("__re__") - F.col("__e__")
    out = (joined.filter((delta >= lower) & (delta <= upper))
           .drop("__e__", "__re__"))
    # drop duplicated by-columns from the right side
    for b in by:
        out = out.drop(re_[b])
    return out
