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


def with_boundary_shift(sdf: DataFrame, value_col, periods: int,
                        order_by: list | None = None,
                        name: str = "__shift__") -> DataFrame:
    """Partition-safe global shift (lag/lead by ``periods``): adds
    ``name`` holding the value ``periods`` rows earlier (positive) or
    later (negative) in the global order, NULL past the edge. See
    :func:`with_boundary_shifts` (this is its single-column face).
    """
    return with_boundary_shifts(sdf, {name: value_col}, periods,
                                order_by)


def with_boundary_shifts(sdf: DataFrame, cols: dict, periods: int,
                         order_by: list | None = None) -> DataFrame:
    """Partition-safe global shift of SEVERAL columns by the same
    ``periods`` in one pass: ``cols`` maps out_name -> Column/name.

    The naive plan — ``lag() OVER (ORDER BY ...)`` with no partition —
    collapses the table into one partition. Here the window is
    partitioned by physical partition id (all work stays local) and
    only the |periods| rows at each partition boundary take their
    value from a *carry list* collected on the driver: every
    partition's |periods| edge rows — n_partitions x |periods| rows by
    construction, kilobytes even at thousands of partitions — then
    broadcast back. Two jobs, no data-sized shuffle beyond the
    (optional) range layout, identical results to the global window.
    All columns share the layout, the donor collect, and the carry
    join — callers shifting N columns (e.g. the global rolling
    window's prefix pair) pay ONE pass, not N.

    ``order_by``: sort expressions defining the global order; None
    keeps the current layout order (ingest order), mirroring
    :func:`with_dense_ordinal`.
    """
    from pyspark.sql import types as T

    prepared = {o: (F.col(c) if isinstance(c, str) else c)
                for o, c in cols.items()}
    if periods == 0:
        out = sdf
        for o, c in prepared.items():
            out = out.withColumn(o, c)
        return out
    k = abs(periods)
    if order_by:
        # no explicit partition count (r11): REPARTITION_BY_COL is
        # AQE-coalescible, so a kilobyte-sized input lands in one
        # partition (one task per two-pass job instead of 32) while
        # large inputs keep spark.sql.shuffle.partitions — the
        # scale-adaptive layout; an explicit n is exempt from AQE
        # coalescing and pinned 32 tasks on every tiny window table.
        sdf = (sdf.repartitionByRange(*order_by)
               .sortWithinPartitions(*order_by))
    # eager=False (r12): the donor collect below is always the first
    # consumer, so the checkpoint materializes inside that job —
    # same frozen layout for both passes, one fewer eager job and
    # one fewer full pass per shift
    sdf = (sdf.select("*", *[c.alias(f"__sv_{o}__")
                             for o, c in prepared.items()])
           .withColumn("__mid__", F.monotonically_increasing_id())
           .withColumn("__pid__", F.spark_partition_id())
           .localCheckpoint(eager=False))

    fwd = periods > 0
    w_in = Window.partitionBy("__pid__").orderBy(F.col("__mid__").asc())
    # rows whose donor lives in another partition: the first k rows of
    # each partition for lag, the last k for lead
    edge_w = w_in if fwd else Window.partitionBy("__pid__") \
        .orderBy(F.col("__mid__").desc())
    edge_rn = F.row_number().over(edge_w)
    # donor rows: the k rows nearest the *other* boundary
    donor_w = Window.partitionBy("__pid__").orderBy(
        F.col("__mid__").desc() if fwd else F.col("__mid__").asc())
    donors = (sdf.withColumn("__drn__", F.row_number().over(donor_w))
              .where(F.col("__drn__") <= k)
              .select("__pid__", "__drn__",
                      *[f"__sv_{o}__" for o in prepared]).collect())
    by_pid: dict = {}
    for r in donors:
        by_pid.setdefault(r["__pid__"], {})[r["__drn__"]] = tuple(
            r[f"__sv_{o}__"] for o in prepared)

    # walk partitions in global order, carrying the k value-tuples
    # adjacent to each boundary; every carried tuple is within k rows
    # of its own partition's edge, so the collected donors always
    # suffice (even when partitions hold fewer than k rows)
    carry_rows = []
    run: list = []  # the k tuples just before (lag) / after (lead) the
    #                 partition being visited, nearest-boundary-LAST
    pid_iter = sorted(by_pid) if fwd else sorted(by_pid, reverse=True)
    for pid in pid_iter:
        m = len(run)
        for r in range(1, k + 1):
            i = m - (k - r + 1)  # r-th edge row needs the value
            #                      k-r+1 positions beyond the boundary
            if i >= 0:
                carry_rows.append((int(pid), r, *run[i]))
        part = by_pid[pid]
        # donor_rn=1 is the row nearest the boundary; run keeps
        # nearest-boundary-last ordering
        vals = [part[d] for d in sorted(part, reverse=True)]
        run = (run + vals)[-k:]

    carry_schema = T.StructType(
        [T.StructField("__pid__", T.IntegerType()),
         T.StructField("__ern__", T.IntegerType())]
        + [T.StructField(f"__cv_{o}__", sdf.schema[f"__sv_{o}__"].dataType)
           for o in prepared])
    carry_df = sdf.sparkSession.createDataFrame(carry_rows, carry_schema)

    out = (sdf.withColumn("__ern__", edge_rn)
           .join(F.broadcast(carry_df), ["__pid__", "__ern__"], "left"))
    for o in prepared:
        local = (F.lag(f"__sv_{o}__", periods).over(w_in) if fwd
                 else F.lead(f"__sv_{o}__", -periods).over(w_in))
        out = out.withColumn(
            o, F.when(F.col("__ern__") <= k, F.col(f"__cv_{o}__"))
            .otherwise(local))
    return out.drop("__pid__", "__mid__", "__ern__",
                    *[f"__cv_{o}__" for o in prepared],
                    *[f"__sv_{o}__" for o in prepared])


def with_dense_ordinal(sdf: DataFrame, order_by: list | None = None,
                       name: str = ORD_COL) -> DataFrame:
    """Return ``sdf`` with a dense 0..n-1 long column ``name``.

    ``order_by``: list of pyspark Columns (or column names) defining
    the global order; None = current ingest/partition order.
    """
    if order_by:
        # AQE-coalescible range layout (see with_boundary_shifts)
        sdf = sdf.repartitionByRange(*order_by).sortWithinPartitions(*order_by)

    sdf = sdf.withColumn("__mid__", F.monotonically_increasing_id())
    sdf = sdf.withColumn("__pid__", F.spark_partition_id())
    # localCheckpoint freezes the partition layout both passes must
    # agree on, WITHOUT registering a CacheManager entry: persist()
    # here leaked one cached plan per positional op for the session's
    # lifetime (never unpersisted), while checkpoint blocks are freed by
    # the ContextCleaner when the DataFrame is garbage-collected. Not
    # fault-tolerant to executor loss — an ephemeral positional op
    # re-runs from source on failure, which is the right trade.
    # eager=False (r12): pass 1's count-collect below is the first
    # consumer and materializes the blocks inside its own job — same
    # frozen layout, one fewer eager job/pass per ordinal
    sdf = sdf.localCheckpoint(eager=False)

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


def _range_layout(sdf: DataFrame, order_by: list | None) -> DataFrame:
    """Shared first pass of every two-pass scheme: (optionally)
    range-partition + sort by the order keys so partition i holds a
    contiguous globally-ordered slice, stamp row/partition ids, and
    freeze the layout with an eager localCheckpoint (both passes must
    see identical partitioning; see with_dense_ordinal's note on
    checkpoint-vs-persist)."""
    if order_by:
        # AQE-coalescible range layout (see with_boundary_shifts)
        sdf = (sdf.repartitionByRange(*order_by)
               .sortWithinPartitions(*order_by))
    # eager=False (r12): every caller's pass 1 (totals/donors/ends
    # collect) is the first consumer and materializes the blocks in
    # its own job — same frozen layout for both passes, one fewer
    # eager job/pass per scheme
    return (sdf.withColumn("__mid__", F.monotonically_increasing_id())
            .withColumn("__pid__", F.spark_partition_id())
            .localCheckpoint(eager=False))


# associative merge for driver-side prefix combining; identity is None
# (empty/all-null partitions contribute nothing)
_PREFIX_MERGE = {
    "sum": lambda a, b: a + b,
    "count": lambda a, b: a + b,
    "prod": lambda a, b: a * b,
    "min": min,
    "max": max,
}
_PREFIX_LOCAL = {
    "sum": F.sum, "count": F.count, "prod": F.product,
    "min": F.min, "max": F.max,
}
_PREFIX_COMBINE = {
    "sum": lambda loc, pre: loc + pre,
    "count": lambda loc, pre: loc + pre,
    "prod": lambda loc, pre: loc * pre,
    "min": F.least,
    "max": F.greatest,
}


def with_prefix_aggs(sdf: DataFrame, specs: dict, order_by: list | None,
                     inclusive: bool = True,
                     return_stats: bool = False):
    """Partition-safe GLOBAL running aggregates (parallel prefix scan).

    ``specs``: {out_name: (value Column/name, kind)} with kind in
    {'sum','count','prod','min','max'} — the associative aggregates;
    running mean/var/std compose from these (sum/sum² /count are all
    prefix sums). For each spec the output column holds the running
    aggregate over all rows up to (and, if ``inclusive``, including)
    the current row in the global ``order_by`` order.

    The naive plan — ``agg OVER (ORDER BY ...)`` with no partition —
    collapses to ONE partition. Here: (1) partition-local running
    aggregates via a pid-partitioned window, (2) per-partition TOTALS
    (one row per partition) collected and prefix-combined on the
    driver — n_partitions scalars, kilobytes at thousands of
    partitions — (3) broadcast back and merged into the local scans.
    Identical results, no data-sized single-partition stage.
    """
    from pyspark.sql import types as T

    prepared = {}
    for out, (col, kind) in specs.items():
        prepared[out] = (F.col(col) if isinstance(col, str) else col, kind)

    sdf = _range_layout(
        sdf.select("*", *[c.alias(f"__v_{o}__")
                          for o, (c, _) in prepared.items()]),
        order_by)

    w = (Window.partitionBy("__pid__").orderBy(F.col("__mid__").asc())
         .rowsBetween(Window.unboundedPreceding,
                      0 if inclusive else -1))
    totals = sdf.groupBy("__pid__").agg(*[
        _PREFIX_LOCAL[kind](F.col(f"__v_{o}__")).alias(f"__t_{o}__")
        for o, (_, kind) in prepared.items()])
    trows = {r["__pid__"]: r for r in totals.collect()}

    # exclusive prefix per partition, combined in global (range) order
    prefix_rows, acc = [], {o: None for o in prepared}
    for pid in sorted(trows):
        prefix_rows.append((int(pid), *[acc[o] for o in prepared]))
        for o, (_, kind) in prepared.items():
            t = trows[pid][f"__t_{o}__"]
            if t is not None:
                acc[o] = t if acc[o] is None else \
                    _PREFIX_MERGE[kind](acc[o], t)

    fields = [T.StructField("__pid__", T.IntegerType())]
    for o, (_, kind) in prepared.items():
        dt = (T.LongType() if kind == "count"
              else sdf.schema[f"__v_{o}__"].dataType)
        fields.append(T.StructField(f"__p_{o}__", dt))
    pre_df = sdf.sparkSession.createDataFrame(prefix_rows,
                                              T.StructType(fields))

    out = sdf.join(F.broadcast(pre_df), "__pid__")
    for o, (_, kind) in prepared.items():
        loc = _PREFIX_LOCAL[kind](F.col(f"__v_{o}__")).over(w)
        pre = F.col(f"__p_{o}__")
        if kind == "count":
            loc = loc.cast("long")
            merged = loc + F.coalesce(pre, F.lit(0))
        else:
            merged = F.when(pre.isNull(), loc).otherwise(
                F.when(loc.isNull(), pre)
                .otherwise(_PREFIX_COMBINE[kind](loc, pre)))
        out = out.withColumn(o, merged)
    drop = ["__pid__", "__mid__"] + [f"__v_{o}__" for o in prepared] \
        + [f"__p_{o}__" for o in prepared]
    out = out.drop(*drop)
    if return_stats:
        # after the merge loop `acc` holds each spec's GLOBAL total
        # — pass-1 already paid for it, so callers get e.g. the row
        # count (a 'count' spec's total) for free, with no extra job
        return out, dict(acc)
    return out


def with_prefix_aggs_shifted(sdf: DataFrame, specs: dict, window: int,
                             order_by: list | None) -> DataFrame:
    """Fused GLOBAL prefix aggregates PLUS their ``window``-row-ago
    twins — the building blocks of a trailing rolling window
    (rolling(i) = prefix(i) - prefix(i - window)) — from ONE range
    layout and ONE donor collect.

    ``specs`` is :func:`with_prefix_aggs`'s mapping restricted to the
    kinds a rolling difference needs ({'sum', 'count'} — min/max do
    not decompose and go through :func:`with_rolling_locals`). Each
    ``out_name`` gains a sibling ``out_name[:-2] + 'w__'`` holding
    the merged prefix ``window`` rows earlier in the global order
    (NULL before the global edge), exactly what the old composition
    ``with_boundary_shifts(with_prefix_aggs(...), window)`` produced
    while paying a SECOND repartitionByRange + sort + checkpoint of
    the whole table and a second driver collect.

    One collect serves both passes: the donor query evaluates the
    partition-LOCAL prefix windows for the last ``window`` rows of
    every partition; the drn==1 row's local prefix IS the partition
    total, so the driver derives the cross-partition offsets from the
    same rows, merges donors to GLOBAL prefixes with the identical
    null rules pass 2 uses (IEEE double adds match the JVM's), and
    walks the boundary carry exactly like with_boundary_shifts.
    """
    from pyspark.sql import types as T

    if window <= 0:
        raise ValueError(f"window must be positive, got {window}")
    prepared = {}
    for out_name, (col, kind) in specs.items():
        if kind not in ("sum", "count"):
            raise ValueError(
                f"with_prefix_aggs_shifted supports sum/count, got "
                f"{kind!r} (min/max do not decompose; use "
                f"with_rolling_locals)")
        prepared[out_name] = (F.col(col) if isinstance(col, str)
                              else col, kind)

    sdf = _range_layout(
        sdf.select("*", *[c.alias(f"__v_{o}__")
                          for o, (c, _) in prepared.items()]),
        order_by)

    w = (Window.partitionBy("__pid__").orderBy(F.col("__mid__").asc())
         .rowsBetween(Window.unboundedPreceding, 0))

    def _loc(o):
        loc = _PREFIX_LOCAL[prepared[o][1]](F.col(f"__v_{o}__")).over(w)
        return loc.cast("long") if prepared[o][1] == "count" else loc

    # ONE collect: local prefixes at each partition's last `window`
    # rows (drn==1 == the partition total)
    desc_w = Window.partitionBy("__pid__").orderBy(
        F.col("__mid__").desc())
    donors = (sdf.select("__pid__", "__mid__",
                         *[_loc(o).alias(f"__lp_{o}__")
                           for o in prepared])
              .withColumn("__drn__", F.row_number().over(desc_w))
              .where(F.col("__drn__") <= window)
              .select("__pid__", "__drn__",
                      *[f"__lp_{o}__" for o in prepared]).collect())
    tail_by_pid: dict = {}
    for r in donors:
        tail_by_pid.setdefault(r["__pid__"], {})[r["__drn__"]] = tuple(
            r[f"__lp_{o}__"] for o in prepared)

    # offsets: exclusive prefix-combine of the partition totals
    # (= each pid's drn==1 local prefix), same None-skip rule as
    # with_prefix_aggs
    offsets, acc = {}, {o: None for o in prepared}
    for pid in sorted(tail_by_pid):
        offsets[pid] = dict(acc)
        for i, (o, (_, kind)) in enumerate(prepared.items()):
            t = tail_by_pid[pid][1][i]
            if t is not None:
                acc[o] = t if acc[o] is None else \
                    _PREFIX_MERGE[kind](acc[o], t)

    def _merge_py(kind, off, lp):
        """Driver replica of pass 2's merge expression."""
        if kind == "count":
            return int(lp or 0) + int(off or 0)
        if off is None:
            return lp
        if lp is None:
            return off
        return lp + off  # IEEE double add == the JVM's

    # carry walk (with_boundary_shifts' fwd scheme, k = window):
    # donor value for the r-th edge row of pid = merged global
    # prefix window-r+1 positions before the partition start
    carry_rows = []
    run: list = []
    for pid in sorted(tail_by_pid):
        m = len(run)
        for r in range(1, window + 1):
            i = m - (window - r + 1)
            if i >= 0:
                carry_rows.append((int(pid), r, *run[i]))
        part = tail_by_pid[pid]
        off = offsets[pid]
        vals = [tuple(_merge_py(prepared[o][1], off[o], part[d][i])
                      for i, o in enumerate(prepared))
                for d in sorted(part, reverse=True)]
        run = (run + vals)[-window:]

    def _dt(o):
        return (T.LongType() if prepared[o][1] == "count"
                else sdf.schema[f"__v_{o}__"].dataType)

    off_df = sdf.sparkSession.createDataFrame(
        [(int(p), *[v[o] for o in prepared])
         for p, v in offsets.items()],
        T.StructType([T.StructField("__pid__", T.IntegerType())]
                     + [T.StructField(f"__p_{o}__", _dt(o))
                        for o in prepared]))
    carry_df = sdf.sparkSession.createDataFrame(
        carry_rows,
        T.StructType([T.StructField("__pid__", T.IntegerType()),
                      T.StructField("__ern__", T.IntegerType())]
                     + [T.StructField(f"__cv_{o}__", _dt(o))
                        for o in prepared]))

    w_asc = Window.partitionBy("__pid__").orderBy(F.col("__mid__").asc())
    out = (sdf.withColumn("__ern__", F.row_number().over(w_asc))
           .join(F.broadcast(off_df), "__pid__", "left")
           .join(F.broadcast(carry_df), ["__pid__", "__ern__"], "left"))
    # merged prefixes first (a later select may lag a plain column,
    # never a window expression)
    merged_sel = ["*"]
    for o, (_, kind) in prepared.items():
        loc = _loc(o)
        pre = F.col(f"__p_{o}__")
        if kind == "count":
            merged = loc + F.coalesce(pre, F.lit(0))
        else:
            merged = F.when(pre.isNull(), loc).otherwise(
                F.when(loc.isNull(), pre)
                .otherwise(_PREFIX_COMBINE[kind](loc, pre)))
        merged_sel.append(merged.alias(o))
    out = out.select(*merged_sel)
    for o in prepared:
        local_lag = F.lag(F.col(o), window).over(w_asc)
        out = out.withColumn(
            o[:-2] + "w__",
            F.when(F.col("__ern__") <= window, F.col(f"__cv_{o}__"))
            .otherwise(local_lag))
    drop = (["__pid__", "__mid__", "__ern__"]
            + [f"__v_{o}__" for o in prepared]
            + [f"__p_{o}__" for o in prepared]
            + [f"__cv_{o}__" for o in prepared])
    return out.drop(*drop)


def with_last_non_null(sdf: DataFrame, exprs: dict,
                       order_by: list | None) -> DataFrame:
    """Partition-safe GLOBAL carry-forward: for each {out_name: expr},
    add the most recent non-null value of ``expr`` at or before the
    current row in the global ``order_by`` order (the engine behind
    global as-of joins and un-keyed ffill).

    Scheme: partition-local ``last(..., ignorenulls)`` windows, plus a
    per-partition "last non-null in this partition" table (one row per
    partition) prefix-carried on the driver and broadcast back for
    rows whose partition holds no earlier non-null.
    """
    from pyspark.sql import types as T

    prepared = {o: (F.col(c) if isinstance(c, str) else c)
                for o, c in exprs.items()}
    sdf = _range_layout(
        sdf.select("*", *[c.alias(f"__v_{o}__")
                          for o, c in prepared.items()]),
        order_by)

    w = (Window.partitionBy("__pid__").orderBy(F.col("__mid__").asc())
         .rowsBetween(Window.unboundedPreceding, 0))

    # per partition: value at the max row id among non-null rows
    lasts = sdf.groupBy("__pid__").agg(*[
        F.max(F.when(F.col(f"__v_{o}__").isNotNull(),
                     F.struct(F.col("__mid__").alias("m"),
                              F.col(f"__v_{o}__").alias("v"))))
        .alias(f"__l_{o}__")
        for o in prepared])
    lrows = {r["__pid__"]: r for r in lasts.collect()}

    prefix_rows, acc = [], {o: None for o in prepared}
    for pid in sorted(lrows):
        prefix_rows.append((int(pid), *[acc[o] for o in prepared]))
        for o in prepared:
            s = lrows[pid][f"__l_{o}__"]
            if s is not None and s["v"] is not None:
                acc[o] = s["v"]

    fields = [T.StructField("__pid__", T.IntegerType())]
    for o in prepared:
        fields.append(T.StructField(
            f"__p_{o}__", sdf.schema[f"__v_{o}__"].dataType))
    pre_df = sdf.sparkSession.createDataFrame(prefix_rows,
                                              T.StructType(fields))

    out = sdf.join(F.broadcast(pre_df), "__pid__")
    for o in prepared:
        local = F.last(F.col(f"__v_{o}__"), ignorenulls=True).over(w)
        out = out.withColumn(o, F.coalesce(local, F.col(f"__p_{o}__")))
    drop = ["__pid__", "__mid__"] + [f"__v_{o}__" for o in prepared] \
        + [f"__p_{o}__" for o in prepared]
    return out.drop(*drop)


def with_ewm_mean(sdf: DataFrame, value_col, alpha: float,
                  order_by: list | None, min_periods: int = 0,
                  ignore_na: bool = False,
                  name: str = "__ewm__") -> DataFrame:
    """Partition-safe GLOBAL exponentially-weighted mean (pandas
    ``ewm(adjust=True).mean()`` semantics, both ``ignore_na``
    flavors).

    The recurrence num_t = x_t + r*num_{t-1} (r = 1-alpha) does not
    decompose into prefix sums — the closed form needs r^{-t}, which
    overflows within ~700 rows — so it runs as the two-pass carry
    scheme every global scan here uses: (1) freeze a range layout,
    (2) ONE mapInPandas pass computes each partition's END state
    (num, den, obs-count, row-count), with num/den recovered from
    pandas' C ewm kernel via num_t = M0_t * S_t (M0 = ewm mean of the
    zero-filled values, S_t the geometric partial sum — exact, no
    Python-loop recurrence), (3) the driver prefix-combines
    n_partitions tuples with decayed merge carry' = carry*r^len +
    end (kilobytes at thousands of partitions), (4) a second
    mapInPandas pass merges the broadcast carry:
    global_t = local_t + carry * r^(t+1).

    ``ignore_na=True`` decays per OBSERVATION instead of per row:
    the same scheme on the null-compacted subsequence (obs-count as
    the carry exponent), outputs forward-filled across null
    positions.
    """
    import pandas as pd
    from pyspark.sql import types as T

    if not (0.0 < alpha <= 1.0):
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    r = 1.0 - alpha

    col = F.col(value_col) if isinstance(value_col, str) else value_col
    sdf = _range_layout(
        sdf.select("*", col.cast("double").alias("__ev__")), order_by)

    def _batch_scan(x, state):
        """One batch's (y, cnt) arrays + updated state, where state =
        [num_end, den_end, obs_cnt, decay_steps, y_last]. y is
        num/den where den > 0; where den degenerates to 0 after an
        observation (alpha == 1, or r^k underflow across a long null
        run) pandas carries the last mean forward — replayed here
        with a seeded forward-fill, so y_last rides the carry
        alongside num/den."""
        import numpy as np
        L = len(x)
        w = np.where(np.isnan(x), 0.0, 1.0)
        n_in, d_in = state[0], state[1]

        def _geo(k):
            t1 = np.arange(1, k + 1, dtype=np.float64)
            S = (np.ones(k) if r == 0
                 else (1 - r ** t1) / (1 - r))
            return S, r ** t1

        if ignore_na:
            # decay per OBSERVATION: run the same scheme on the
            # null-compacted subsequence, forward-fill outputs, and
            # count obs (not rows) as the carry-decay steps
            idx = np.flatnonzero(w)
            k = len(idx)
            num = np.full(L, np.nan)
            den = np.full(L, np.nan)
            if k:
                M0 = pd.Series(x[idx]).ewm(
                    alpha=alpha, adjust=True,
                    min_periods=0).mean().to_numpy()
                S, e = _geo(k)
                nc = M0 * S + n_in * e
                dc = S + d_in * e
                num[idx] = nc
                den[idx] = dc
                state[0], state[1] = nc[-1], dc[-1]
            # null positions take the latest obs value; before the
            # first obs, the UNDECAYED incoming carry (ignore_na:
            # nulls neither decay nor re-weight)
            num = pd.Series(num).ffill().fillna(n_in).to_numpy()
            den = pd.Series(den).ffill().fillna(d_in).to_numpy()
            cnt = state[2] + np.cumsum(w)
            state[2] += w.sum()
            state[3] += k
            return _finish(num, den, cnt, state)

        m = np.where(np.isnan(x), 0.0, x)
        M0 = pd.Series(m).ewm(alpha=alpha, adjust=True,
                              min_periods=0).mean().to_numpy()
        W = pd.Series(w).ewm(alpha=alpha, adjust=True,
                             min_periods=0).mean().to_numpy()
        S, e = _geo(L)
        num = M0 * S + n_in * e
        den = W * S + d_in * e
        cnt = state[2] + np.cumsum(w)
        state[0], state[1] = num[-1], den[-1]
        state[2] += w.sum()
        state[3] += L
        return _finish(num, den, cnt, state)

    def _finish(num, den, cnt, state):
        import numpy as np
        with np.errstate(invalid="ignore", divide="ignore"):
            y = np.where(den > 0, num / den, np.nan)
        y = pd.concat([pd.Series([state[4]]), pd.Series(y)],
                      ignore_index=True).ffill().to_numpy()[1:]
        if len(y):
            state[4] = y[-1]
        return y, cnt

    ends_schema = T.StructType([
        T.StructField("__pid__", T.IntegerType()),
        T.StructField("__en__", T.DoubleType()),
        T.StructField("__ed__", T.DoubleType()),
        T.StructField("__ec__", T.DoubleType()),
        T.StructField("__el__", T.DoubleType()),
        T.StructField("__ey__", T.DoubleType())])

    def _ends(it):
        import numpy as np
        state, pid = [0.0, 0.0, 0.0, 0.0, np.nan], None
        for pdf_b in it:
            if len(pdf_b) == 0:
                continue
            pid = int(pdf_b["__pid__"].iloc[0])
            _batch_scan(pdf_b["__ev__"].to_numpy(dtype=np.float64),
                        state)
        if pid is not None:
            yield pd.DataFrame({"__pid__": [pid], "__en__": [state[0]],
                                "__ed__": [state[1]],
                                "__ec__": [state[2]],
                                "__el__": [state[3]],
                                "__ey__": [state[4]]})

    erows = {int(rw["__pid__"]): rw for rw in
             sdf.select("__pid__", "__ev__").mapInPandas(
                 _ends, ends_schema).collect()}
    import math as _math
    carries, acc = {}, (0.0, 0.0, 0.0, float("nan"))
    for pid in sorted(erows):
        carries[pid] = acc
        e = erows[pid]
        # decay steps: rows (default) or observations (ignore_na)
        dk = r ** e["__el__"]
        ey = e["__ey__"]
        acc = (acc[0] * dk + e["__en__"], acc[1] * dk + e["__ed__"],
               acc[2] + e["__ec__"],
               acc[3] if ey is None or _math.isnan(ey) else ey)
    out_schema = T.StructType(list(sdf.schema.fields)
                              + [T.StructField(name, T.DoubleType())])
    mp = min_periods

    def _emit(it):
        import numpy as np
        state, init = [0.0, 0.0, 0.0, 0.0, np.nan], False
        for pdf_b in it:
            if len(pdf_b) == 0:
                continue
            if not init:
                c = carries.get(int(pdf_b["__pid__"].iloc[0]),
                                (0.0, 0.0, 0.0, np.nan))
                state = [c[0], c[1], c[2], 0.0, c[3]]
                init = True
            x = pdf_b["__ev__"].to_numpy(dtype=np.float64)
            y, cnt = _batch_scan(x, state)
            o = pdf_b.copy()
            o[name] = np.where(cnt >= max(mp, 1), y, np.nan)
            yield o

    return (sdf.mapInPandas(_emit, out_schema)
            .drop("__pid__", "__mid__", "__ev__"))


def with_ewm_stats(sdf: DataFrame, value_col, alpha: float,
                   order_by: list | None, min_periods: int = 0,
                   ignore_na: bool = False, bias: bool = False,
                   stats: tuple = ("mean",)) -> DataFrame:
    """Partition-safe GLOBAL ``ewm(adjust=True)`` moments beyond the
    mean: any subset of ``('sum', 'mean', 'var', 'std')`` from ONE
    scan (columns ``__ewm_<stat>__``).

    Same two-pass decayed-carry scheme as :func:`with_ewm_mean`, but
    the carried state holds FOUR decayed sums: num = sum(w*x),
    den = sum(w), q = sum(w*x^2), d2 = sum(w^2) — every pandas ewm
    moment is a ratio of these (sum = num; mean = num/den; var
    (bias=False, pandas default) = den^2/(den^2 - d2) * (q/den -
    mean^2)). num/den/q recover from pandas' C kernel via the
    M0*S identity; d2 rides the SQUARED decay r^2 (it is the den of
    an ewm with alpha2 = 1 - r^2), so its carry merges with e2 =
    (r^2)^len. adjust=False moments are not offered (pandas itself
    refuses ewm(adjust=False).sum(); the recursive-form var needs a
    non-geometric first weight).
    """
    import pandas as pd
    from pyspark.sql import types as T

    if not (0.0 < alpha <= 1.0):
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    bad = [s for s in stats if s not in ("sum", "mean", "var", "std")]
    if bad:
        raise ValueError(f"unsupported ewm stats: {bad}")
    r = 1.0 - alpha
    r2 = r * r
    alpha2 = 1.0 - r2

    col = F.col(value_col) if isinstance(value_col, str) else value_col
    sdf = _range_layout(
        sdf.select("*", col.cast("double").alias("__ev__")), order_by)

    def _batch_scan(x, state):
        """state = [num, den, q, d2, obs_cnt, steps, y_last]; returns
        per-row (num, den, q, d2, cnt) arrays."""
        import numpy as np
        L = len(x)
        w = np.where(np.isnan(x), 0.0, 1.0)
        n_in, d_in, q_in, d2_in = state[0], state[1], state[2], state[3]

        def _geo(k, rr):
            t1 = np.arange(1, k + 1, dtype=np.float64)
            S = (np.ones(k) if rr == 0
                 else (1 - rr ** t1) / (1 - rr))
            return S, rr ** t1

        def _k(z, a):
            return pd.Series(z).ewm(alpha=a, adjust=True,
                                    min_periods=0).mean().to_numpy()

        if ignore_na:
            idx = np.flatnonzero(w)
            k = len(idx)
            num = np.full(L, np.nan)
            den = np.full(L, np.nan)
            q = np.full(L, np.nan)
            d2 = np.full(L, np.nan)
            if k:
                xs = x[idx]
                S, e = _geo(k, r)
                S2, e2 = _geo(k, r2)
                num[idx] = _k(xs, alpha) * S + n_in * e
                den[idx] = _k(np.ones(k), alpha) * S + d_in * e
                q[idx] = _k(xs * xs, alpha) * S + q_in * e
                d2[idx] = _k(np.ones(k), alpha2) * S2 + d2_in * e2
                state[0], state[1] = num[idx[-1]], den[idx[-1]]
                state[2], state[3] = q[idx[-1]], d2[idx[-1]]
            # nulls neither decay nor add terms: carry forward
            num = pd.Series(num).ffill().fillna(n_in).to_numpy()
            den = pd.Series(den).ffill().fillna(d_in).to_numpy()
            q = pd.Series(q).ffill().fillna(q_in).to_numpy()
            d2 = pd.Series(d2).ffill().fillna(d2_in).to_numpy()
            cnt = state[4] + np.cumsum(w)
            state[4] += w.sum()
            state[5] += k
            return num, den, q, d2, cnt

        m = np.where(np.isnan(x), 0.0, x)
        S, e = _geo(L, r)
        S2, e2 = _geo(L, r2)
        num = _k(m, alpha) * S + n_in * e
        den = _k(w, alpha) * S + d_in * e
        q = _k(m * m, alpha) * S + q_in * e
        d2 = _k(w, alpha2) * S2 + d2_in * e2
        cnt = state[4] + np.cumsum(w)
        state[0], state[1], state[2], state[3] = \
            num[-1], den[-1], q[-1], d2[-1]
        state[4] += w.sum()
        state[5] += L
        return num, den, q, d2, cnt

    ends_schema = T.StructType([
        T.StructField("__pid__", T.IntegerType())]
        + [T.StructField(c, T.DoubleType())
           for c in ("__en__", "__ed__", "__eq__", "__ed2__",
                     "__ec__", "__el__", "__ey__")])

    def _ends(it):
        import numpy as np
        state, pid = [0.0, 0.0, 0.0, 0.0, 0.0, 0.0, np.nan], None
        for pdf_b in it:
            if len(pdf_b) == 0:
                continue
            pid = int(pdf_b["__pid__"].iloc[0])
            num, den, q, d2, _ = _batch_scan(
                pdf_b["__ev__"].to_numpy(dtype=np.float64), state)
            with np.errstate(invalid="ignore", divide="ignore"):
                y = np.where(den > 0, num / den, np.nan)
            y = pd.Series(y).ffill().to_numpy()
            if len(y) and not np.isnan(y[-1]):
                state[6] = y[-1]
        if pid is not None:
            yield pd.DataFrame({
                "__pid__": [pid], "__en__": [state[0]],
                "__ed__": [state[1]], "__eq__": [state[2]],
                "__ed2__": [state[3]], "__ec__": [state[4]],
                "__el__": [state[5]], "__ey__": [state[6]]})

    erows = {int(rw["__pid__"]): rw for rw in
             sdf.select("__pid__", "__ev__").mapInPandas(
                 _ends, ends_schema).collect()}
    import math as _math
    carries = {}
    acc = (0.0, 0.0, 0.0, 0.0, 0.0, float("nan"))
    for pid in sorted(erows):
        carries[pid] = acc
        e = erows[pid]
        dk = r ** e["__el__"]
        dk2 = r2 ** e["__el__"]
        ey = e["__ey__"]
        acc = (acc[0] * dk + e["__en__"], acc[1] * dk + e["__ed__"],
               acc[2] * dk + e["__eq__"], acc[3] * dk2 + e["__ed2__"],
               acc[4] + e["__ec__"],
               acc[5] if ey is None or _math.isnan(ey) else ey)
    out_cols = [f"__ewm_{s}__" for s in stats]
    out_schema = T.StructType(list(sdf.schema.fields)
                              + [T.StructField(c, T.DoubleType())
                                 for c in out_cols])
    mp = min_periods

    def _emit(it):
        import numpy as np
        state, init = [0.0, 0.0, 0.0, 0.0, 0.0, 0.0, np.nan], False
        for pdf_b in it:
            if len(pdf_b) == 0:
                continue
            if not init:
                c = carries.get(int(pdf_b["__pid__"].iloc[0]),
                                (0.0, 0.0, 0.0, 0.0, 0.0, np.nan))
                state = [c[0], c[1], c[2], c[3], c[4], 0.0, c[5]]
                init = True
            x = pdf_b["__ev__"].to_numpy(dtype=np.float64)
            num, den, q, d2, cnt = _batch_scan(x, state)
            o = pdf_b.copy()
            gate = cnt >= max(mp, 1)
            with np.errstate(invalid="ignore", divide="ignore"):
                mean = np.where(den > 0, num / den, np.nan)
                mean = pd.concat(
                    [pd.Series([state[6]]), pd.Series(mean)],
                    ignore_index=True).ffill().to_numpy()[1:]
                if len(mean) and not np.isnan(mean[-1]):
                    state[6] = mean[-1]
                for s in stats:
                    if s == "sum":
                        v = np.where(gate, num, np.nan)
                    elif s == "mean":
                        v = np.where(gate, mean, np.nan)
                    else:
                        biased = np.maximum(q / den - mean * mean, 0.0)
                        # sum-of-squares cancellation leaves ~1e-14
                        # relative residue on constant windows where
                        # pandas' recurrence keeps exact 0 — clamp
                        # residue below fp noise of E[x^2] to zero
                        biased = np.where(
                            biased < 1e-12 * np.abs(q / den), 0.0,
                            biased)
                        if bias:
                            v = biased
                        else:
                            # dd is EXACTLY zero at one obs only up
                            # to fp noise of the M0*S roundtrip — a
                            # +2e-16 residue would turn pandas' NaN
                            # into a huge-factor-times-clamped-zero
                            dd = den * den - d2
                            v = np.where(dd > 1e-12 * den * den,
                                         den * den / dd * biased,
                                         np.nan)
                        v = np.where(gate & (den > 0), v, np.nan)
                        if s == "std":
                            v = np.sqrt(v)
                    o[f"__ewm_{s}__"] = v
            yield o

    return (sdf.mapInPandas(_emit, out_schema)
            .drop("__pid__", "__mid__", "__ev__"))


def with_ewm_stats_multi(sdf: DataFrame, values: dict, alpha: float,
                         order_by: list | None, min_periods: int = 0,
                         ignore_na: bool = False, bias: bool = False,
                         stats: tuple = ("mean",)) -> DataFrame:
    """:func:`with_ewm_stats` for ANY number of columns from ONE
    range layout and TWO passes (the multi-column fusion rule every
    ordinal op follows — per-column scans would pay a
    repartitionByRange + sort + checkpoint EACH). ``values`` maps
    tag -> column; outputs ``__ewm_<stat>_<tag>__``. Each column
    keeps its OWN null mask (num/den/q/d2/obs per tag — nulls in one
    column must not decay another's sums)."""
    import pandas as pd
    from pyspark.sql import types as T

    if not (0.0 < alpha <= 1.0):
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    bad = [s for s in stats if s not in ("sum", "mean", "var", "std")]
    if bad:
        raise ValueError(f"unsupported ewm stats: {bad}")
    r = 1.0 - alpha
    r2 = r * r
    alpha2 = 1.0 - r2
    tags = list(values)
    sdf = _range_layout(
        sdf.select("*", *[
            (F.col(c) if isinstance(c, str) else c)
            .cast("double").alias(f"__ev_{t}__")
            for t, c in values.items()]), order_by)

    # per tag: [num, den, q, d2, obs, y_last]; shared: steps
    W = 6

    def _batch_scan(cols, state):
        import numpy as np

        def _geo(k, rr):
            t1 = np.arange(1, k + 1, dtype=np.float64)
            S = (np.ones(k) if rr == 0
                 else (1 - rr ** t1) / (1 - rr))
            return S, rr ** t1

        def _k(z, a):
            return pd.Series(z).ewm(alpha=a, adjust=True,
                                    min_periods=0).mean().to_numpy()

        L = len(cols[0])
        outs = []
        for ti, x in enumerate(cols):
            b = ti * W
            w = np.where(np.isnan(x), 0.0, 1.0)
            if ignore_na:
                idx = np.flatnonzero(w)
                k = len(idx)
                incoming = list(state[b:b + 4])
                arrs = []
                if k:
                    S, e = _geo(k, r)
                    S2, e2 = _geo(k, r2)
                    xs = x[idx]
                    kerns = [_k(xs, alpha) * S + incoming[0] * e,
                             _k(np.ones(k), alpha) * S + incoming[1] * e,
                             _k(xs * xs, alpha) * S + incoming[2] * e,
                             _k(np.ones(k), alpha2) * S2
                             + incoming[3] * e2]
                for j in range(4):
                    arr = np.full(L, np.nan)
                    if k:
                        arr[idx] = kerns[j]
                        state[b + j] = kerns[j][-1]
                    arr = pd.Series(arr).ffill().to_numpy()
                    arr = np.where(np.isnan(arr), incoming[j], arr)
                    arrs.append(arr)
                cnt = state[b + 4] + np.cumsum(w)
                state[b + 4] += w.sum()
            else:
                S, e = _geo(L, r)
                S2, e2 = _geo(L, r2)
                m = np.where(np.isnan(x), 0.0, x)
                arrs = [_k(m, alpha) * S + state[b] * e,
                        _k(w, alpha) * S + state[b + 1] * e,
                        _k(m * m, alpha) * S + state[b + 2] * e,
                        _k(w, alpha2) * S2 + state[b + 3] * e2]
                for j in range(4):
                    state[b + j] = arrs[j][-1]
                cnt = state[b + 4] + np.cumsum(w)
                state[b + 4] += w.sum()
            outs.append((arrs, cnt))
        state[-1] += (len(np.flatnonzero(~np.isnan(cols[0])))
                      if ignore_na else L)
        return outs

    # NOTE: ignore_na decays per-COLUMN observation; the carry decay
    # exponent must therefore be per tag. Track steps per tag: reuse
    # obs count (state[b+4] counts observations) for ignore_na and
    # the shared row count otherwise.
    n_state = W * len(tags) + 1
    ends_schema = T.StructType(
        [T.StructField("__pid__", T.IntegerType())]
        + [T.StructField(f"__e{j}__", T.DoubleType())
           for j in range(n_state)])

    def _ends(it):
        import numpy as np
        state, pid = [0.0] * n_state, None
        for pdf_b in it:
            if len(pdf_b) == 0:
                continue
            pid = int(pdf_b["__pid__"].iloc[0])
            cols = [pdf_b[f"__ev_{t}__"].to_numpy(dtype=np.float64)
                    for t in tags]
            outs = _batch_scan(cols, state)
            for ti in range(len(tags)):
                arrs, _ = outs[ti]
                num, den = arrs[0], arrs[1]
                with np.errstate(invalid="ignore", divide="ignore"):
                    y = np.where(den > 0, num / den, np.nan)
                y = pd.Series(y).ffill().to_numpy()
                if len(y) and not np.isnan(y[-1]):
                    state[ti * W + 5] = y[-1]
        if pid is not None:
            row = {"__pid__": [pid]}
            row.update({f"__e{j}__": [state[j]]
                        for j in range(n_state)})
            yield pd.DataFrame(row)

    erows = {int(rw["__pid__"]): rw for rw in
             sdf.select("__pid__",
                        *[f"__ev_{t}__" for t in tags]).mapInPandas(
                 _ends, ends_schema).collect()}
    import math as _math
    carries, acc = {}, tuple([0.0] * W * len(tags))
    for pid in sorted(erows):
        carries[pid] = acc
        e = erows[pid]
        rows_l = e[f"__e{n_state - 1}__"]
        nxt = []
        for ti in range(len(tags)):
            b = ti * W
            # per-tag decay steps: rows for ignore_na=False, this
            # tag's obs count for ignore_na=True
            steps = (e[f"__e{b + 4}__"] if ignore_na else rows_l)
            dk, dk2 = r ** steps, r2 ** steps
            ey = e[f"__e{b + 5}__"]
            nxt += [acc[b] * dk + e[f"__e{b}__"],
                    acc[b + 1] * dk + e[f"__e{b + 1}__"],
                    acc[b + 2] * dk + e[f"__e{b + 2}__"],
                    acc[b + 3] * dk2 + e[f"__e{b + 3}__"],
                    acc[b + 4] + e[f"__e{b + 4}__"],
                    acc[b + 5] if ey is None or _math.isnan(ey)
                    or (e[f"__e{b + 4}__"] == 0) else ey]
        acc = tuple(nxt)
    out_cols = [f"__ewm_{s}_{t}__" for s in stats for t in tags]
    out_schema = T.StructType(list(sdf.schema.fields)
                              + [T.StructField(c, T.DoubleType())
                                 for c in out_cols])
    mp = min_periods

    def _emit(it):
        import numpy as np
        state, init = [0.0] * n_state, False
        for pdf_b in it:
            if len(pdf_b) == 0:
                continue
            if not init:
                c = carries.get(int(pdf_b["__pid__"].iloc[0]),
                                tuple([0.0] * W * len(tags)))
                state = list(c) + [0.0]
                init = True
            cols = [pdf_b[f"__ev_{t}__"].to_numpy(dtype=np.float64)
                    for t in tags]
            # snapshot BEFORE the scan mutates obs counts: the mean
            # ffill seed is the carried value only if observations
            # existed before this batch (else leading rows stay NaN)
            pre = [(state[ti * W + 4], state[ti * W + 5])
                   for ti in range(len(tags))]
            outs = _batch_scan(cols, state)
            o = pdf_b.copy()
            for ti, t in enumerate(tags):
                arrs, cnt = outs[ti]
                num, den, q, d2 = arrs
                gate = cnt >= max(mp, 1)
                with np.errstate(invalid="ignore", divide="ignore"):
                    mean = np.where(den > 0, num / den, np.nan)
                    mean = pd.concat(
                        [pd.Series([pre[ti][1] if pre[ti][0]
                                    else np.nan]),
                         pd.Series(mean)],
                        ignore_index=True).ffill().to_numpy()[1:]
                    if len(mean) and not np.isnan(mean[-1]):
                        state[ti * W + 5] = mean[-1]
                    for s in stats:
                        if s == "sum":
                            v = np.where(gate, num, np.nan)
                        elif s == "mean":
                            v = np.where(gate, mean, np.nan)
                        else:
                            biased = np.maximum(
                                q / den - mean * mean, 0.0)
                            biased = np.where(
                                biased < 1e-12 * np.abs(q / den),
                                0.0, biased)
                            if bias:
                                v = biased
                            else:
                                # relative singularity test — see
                                # with_ewm_stats
                                dd = den * den - d2
                                v = np.where(
                                    dd > 1e-12 * den * den,
                                    den * den / dd * biased,
                                    np.nan)
                            v = np.where(gate & (den > 0), v, np.nan)
                            if s == "std":
                                v = np.sqrt(v)
                        o[f"__ewm_{s}_{t}__"] = v
            yield o

    return (sdf.mapInPandas(_emit, out_schema)
            .drop("__pid__", "__mid__",
                  *[f"__ev_{t}__" for t in tags]))


def with_ewm_pair_stats(sdf: DataFrame, x_col, y_col, alpha: float,
                        order_by: list | None, min_periods: int = 0,
                        ignore_na: bool = False, bias: bool = False,
                        stat: str = "cov",
                        name: str = "__ewmp__") -> DataFrame:
    """Partition-safe GLOBAL ``ewm(adjust=True).cov/corr`` between two
    aligned columns.

    Same two-pass decayed-carry scheme as :func:`with_ewm_stats`,
    carrying SEVEN decayed sums: wx, wy, wxy, wxx, wyy (all over the
    JOINT-validity mask — pandas counts an observation only when BOTH
    sides are non-null), den = sum(w), d2 = sum(w^2). cov (bias=False)
    = den^2/(den^2 - d2) * (wxy/den - mx*my); corr is the BIASED
    moment ratio (the debias factor cancels). Local sums recover from
    pandas' C kernel via the M0*S identity; d2 rides the r^2 decay.
    """
    import pandas as pd
    from pyspark.sql import types as T

    if not (0.0 < alpha <= 1.0):
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    if stat not in ("cov", "corr"):
        raise ValueError(f"stat must be cov or corr, got {stat!r}")
    r = 1.0 - alpha
    r2 = r * r
    alpha2 = 1.0 - r2

    cx = F.col(x_col) if isinstance(x_col, str) else x_col
    cy = F.col(y_col) if isinstance(y_col, str) else y_col
    sdf = _range_layout(
        sdf.select("*", cx.cast("double").alias("__ex__"),
                   cy.cast("double").alias("__ey__")), order_by)

    NS = 7  # wx wy wxy wxx wyy den d2 (+ obs, steps appended)

    def _batch_scan(x, y, state):
        import numpy as np
        L = len(x)
        w = np.where(np.isnan(x) | np.isnan(y), 0.0, 1.0)
        xs = np.where(w > 0, x, 0.0)
        ys = np.where(w > 0, y, 0.0)
        comps = (xs, ys, xs * ys, xs * xs, ys * ys, w)

        def _geo(k, rr):
            t1 = np.arange(1, k + 1, dtype=np.float64)
            S = (np.ones(k) if rr == 0
                 else (1 - rr ** t1) / (1 - rr))
            return S, rr ** t1

        def _k(z, a):
            return pd.Series(z).ewm(alpha=a, adjust=True,
                                    min_periods=0).mean().to_numpy()

        out = []
        if ignore_na:
            # joint-null rows neither decay nor add terms: run the
            # scheme on the compacted subsequence, forward-fill, and
            # seed leading positions with the INCOMING sums
            idx = np.flatnonzero(w)
            k = len(idx)
            incoming = list(state[:NS])
            if k:
                S, e = _geo(k, r)
                S2, e2 = _geo(k, r2)
            kerns = ([_k(z[idx], alpha) * S + incoming[j] * e
                      for j, z in enumerate(comps)]
                     + [_k(np.ones(k), alpha2) * S2
                        + incoming[6] * e2]) if k else None
            for j in range(NS):
                arr = np.full(L, np.nan)
                if k:
                    arr[idx] = kerns[j]
                    state[j] = kerns[j][-1]
                arr = pd.Series(arr).ffill().to_numpy()
                arr = np.where(np.isnan(arr), incoming[j], arr)
                out.append(arr)
            cnt = state[7] + np.cumsum(w)
            state[7] += w.sum()
            state[8] += k
            return out, cnt

        S, e = _geo(L, r)
        S2, e2 = _geo(L, r2)
        for j, z in enumerate(comps):
            arr = _k(z, alpha) * S + state[j] * e
            state[j] = arr[-1]
            out.append(arr)
        arr = _k(w, alpha2) * S2 + state[6] * e2
        state[6] = arr[-1]
        out.append(arr)
        cnt = state[7] + np.cumsum(w)
        state[7] += w.sum()
        state[8] += L
        return out, cnt

    ends_schema = T.StructType(
        [T.StructField("__pid__", T.IntegerType())]
        + [T.StructField(f"__e{j}__", T.DoubleType())
           for j in range(NS + 2)])

    def _ends(it):
        import numpy as np
        state, pid = [0.0] * (NS + 2), None
        for pdf_b in it:
            if len(pdf_b) == 0:
                continue
            pid = int(pdf_b["__pid__"].iloc[0])
            _batch_scan(pdf_b["__ex__"].to_numpy(dtype=np.float64),
                        pdf_b["__ey__"].to_numpy(dtype=np.float64),
                        state)
        if pid is not None:
            row = {"__pid__": [pid]}
            row.update({f"__e{j}__": [state[j]]
                        for j in range(NS + 2)})
            yield pd.DataFrame(row)

    erows = {int(rw["__pid__"]): rw for rw in
             sdf.select("__pid__", "__ex__", "__ey__").mapInPandas(
                 _ends, ends_schema).collect()}
    carries, acc = {}, tuple([0.0] * (NS + 1))
    for pid in sorted(erows):
        carries[pid] = acc
        e = erows[pid]
        steps = e[f"__e{NS + 1}__"]
        dk, dk2 = r ** steps, r2 ** steps
        acc = tuple(
            [acc[j] * dk + e[f"__e{j}__"] for j in range(6)]
            + [acc[6] * dk2 + e["__e6__"],
               acc[7] + e["__e7__"]])
    out_schema = T.StructType(list(sdf.schema.fields)
                              + [T.StructField(name, T.DoubleType())])
    mp = min_periods

    def _emit(it):
        import numpy as np
        state, init = [0.0] * (NS + 2), False
        for pdf_b in it:
            if len(pdf_b) == 0:
                continue
            if not init:
                c = carries.get(int(pdf_b["__pid__"].iloc[0]),
                                tuple([0.0] * (NS + 1)))
                state = list(c) + [0.0]
                init = True
            comps, cnt = _batch_scan(
                pdf_b["__ex__"].to_numpy(dtype=np.float64),
                pdf_b["__ey__"].to_numpy(dtype=np.float64), state)
            wx, wy, wxy, wxx, wyy, den, d2 = comps
            o = pdf_b.copy()
            gate = (cnt >= max(mp, 1)) & (den > 0)
            with np.errstate(invalid="ignore", divide="ignore"):
                mx, my = wx / den, wy / den
                cxy = wxy / den - mx * my
                if stat == "corr":
                    cxx = np.maximum(wxx / den - mx * mx, 0.0)
                    cyy = np.maximum(wyy / den - my * my, 0.0)
                    denom = np.sqrt(cxx * cyy)
                    # zero variance on either side: pandas NaN, never
                    # +-inf from a cancellation-residue numerator
                    v = np.where(denom > 0, cxy / denom, np.nan)
                elif bias:
                    v = cxy
                else:
                    # relative singularity test — see with_ewm_stats
                    dd = den * den - d2
                    v = np.where(dd > 1e-12 * den * den,
                                 den * den / dd * cxy, np.nan)
            o[name] = np.where(gate, v, np.nan)
            yield o

    return (sdf.mapInPandas(_emit, out_schema)
            .drop("__pid__", "__mid__", "__ex__", "__ey__"))


def with_ewm_mean_noadjust(sdf: DataFrame, value_col, alpha: float,
                           order_by: list | None, min_periods: int = 0,
                           ignore_na: bool = False,
                           name: str = "__ewm__") -> DataFrame:
    """Partition-safe GLOBAL ``ewm(adjust=False).mean()`` (the
    recursive/streaming EMA form y_t = (1-a)*y_{t-1} + a*x_t, both
    ``ignore_na`` flavors).

    Same two-pass decayed-carry shape as the adjust=True scan, but
    the carried state is (y, w) — the running mean plus pandas'
    ``old_wt`` (reset to 1 at each observation, decayed by r=1-a per
    row / per observation) — instead of a num/den pair. The carry
    does NOT merge linearly: each observation applies the affine map
    y -> p*y + q with p = w/(w+a), so a partition's effect on an
    incoming carry is (first-obs Moebius merge) then (local affine
    map). Pass 1 therefore exports per partition the zero-carry end
    value y0 PLUS the map coefficients: pre-first-obs decay steps,
    the first obs value x1, and ln(prod p_i) over the observations
    after the first — the driver prefix-combines n_partitions of
    those tuples (kilobytes), and pass 2 replays each batch against
    the broadcast carry with the identical merge. Local zero-carry
    values come from pandas' C ewm kernel, never a Python row loop.
    """
    import pandas as pd
    from pyspark.sql import types as T

    if not (0.0 < alpha <= 1.0):
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    r = 1.0 - alpha

    col = F.col(value_col) if isinstance(value_col, str) else value_col
    sdf = _range_layout(
        sdf.select("*", col.cast("double").alias("__ev__")), order_by)

    def _batch_scan(x, state):
        """Advance state = [y, w, obs_cnt, lnPi, pre_steps, x1,
        has_obs, no_obs_steps] across one batch; returns (y_t, cnt)
        arrays. The summary fields (lnPi/pre_steps/x1/no_obs_steps)
        only matter for the zero-carry ends pass; the emit pass
        reads just (y, w, obs_cnt)."""
        import numpy as np
        L = len(x)
        mask = ~np.isnan(x)
        obs = np.flatnonzero(mask)
        k = len(obs)
        cnt = state[2] + np.cumsum(mask)
        if k == 0:
            out = np.full(L, state[0])
            if not ignore_na:
                state[1] *= r ** L
                if not state[6]:
                    state[4] += L
                    state[7] += L
            return out, cnt
        # per-obs decay exponents: rows since the previous obs
        # (inclusive of the obs row) for ignore_na=False, 1 per obs
        # for ignore_na=True
        if ignore_na:
            d = np.ones(k)
        else:
            d = np.empty(k)
            d[0] = obs[0] + 1.0
            d[1:] = np.diff(obs).astype(np.float64)
        # zero-carry local outputs straight from pandas' C kernel
        y0 = pd.Series(x).ewm(alpha=alpha, adjust=False,
                              ignore_na=ignore_na,
                              min_periods=0).mean().to_numpy()
        # merge the incoming carry at this batch's first obs:
        # w decays r^{d0}; the obs folds in with weight alpha
        with np.errstate(divide="ignore"):
            lp = np.log(r ** d / (r ** d + alpha))
        if np.isnan(state[0]):
            # no prior observation anywhere: zero-carry IS the answer
            y_first, delta = x[obs[0]], 0.0
            if not state[6]:
                state[4] += (obs[0] + 1.0) if not ignore_na else 1.0
                state[5] = x[obs[0]]
            first_lp = None
        else:
            A = r ** (d[0] if not ignore_na else 1.0) * state[1]
            y_first = (A * state[0] + alpha * x[obs[0]]) / (A + alpha)
            delta = y_first - x[obs[0]]
            # for the partition summary, this obs applies
            # p = A/(A+alpha) to the PARTITION-level carry chain
            first_lp = np.log(A / (A + alpha)) if A > 0 else -np.inf
        state[6] = True
        # Pi_t: product of p_i over obs after this batch's first,
        # up to row t (1 before the second obs) — carry influence
        lnp = np.zeros(L)
        lnp[obs[1:]] = lp[1:]
        Pi = np.exp(np.cumsum(lnp))
        out = y0 + Pi * delta
        out[:obs[0]] = state[0]
        state[0] = out[-1]
        trailing = L - 1 - obs[-1]
        state[1] = r ** trailing if not ignore_na else 1.0
        state[2] += k
        if first_lp is not None:
            state[3] += first_lp
        state[3] += float(np.sum(lp[1:]))
        return out, cnt

    ends_schema = T.StructType([
        T.StructField("__pid__", T.IntegerType()),
        T.StructField("__ey__", T.DoubleType()),
        T.StructField("__ew__", T.DoubleType()),
        T.StructField("__ec__", T.DoubleType()),
        T.StructField("__elp__", T.DoubleType()),
        T.StructField("__eps__", T.DoubleType()),
        T.StructField("__ex1__", T.DoubleType()),
        T.StructField("__eh__", T.BooleanType()),
        T.StructField("__ens__", T.DoubleType())])

    def _ends(it):
        import numpy as np
        state = [np.nan, 1.0, 0.0, 0.0, 0.0, np.nan, False, 0.0]
        pid = None
        for pdf_b in it:
            if len(pdf_b) == 0:
                continue
            pid = int(pdf_b["__pid__"].iloc[0])
            _batch_scan(pdf_b["__ev__"].to_numpy(dtype=np.float64),
                        state)
        if pid is not None:
            yield pd.DataFrame({
                "__pid__": [pid], "__ey__": [state[0]],
                "__ew__": [state[1]], "__ec__": [state[2]],
                "__elp__": [state[3]], "__eps__": [state[4]],
                "__ex1__": [state[5]], "__eh__": [bool(state[6])],
                "__ens__": [state[7]]})

    erows = {int(rw["__pid__"]): rw for rw in
             sdf.select("__pid__", "__ev__").mapInPandas(
                 _ends, ends_schema).collect()}
    import math as _math
    carries, acc = {}, (float("nan"), 1.0, 0.0)  # (y, w, obs)
    for pid in sorted(erows):
        carries[pid] = acc
        e = erows[pid]
        if not e["__eh__"]:
            if not ignore_na:
                acc = (acc[0], acc[1] * r ** e["__ens__"], acc[2])
            continue
        if _math.isnan(acc[0]):
            y_end = e["__ey__"]
        else:
            A = r ** e["__eps__"] * acc[1]
            x1 = e["__ex1__"]
            y_first = (A * acc[0] + alpha * x1) / (A + alpha)
            y_end = e["__ey__"] + _math.exp(e["__elp__"]) \
                * (y_first - x1)
        acc = (y_end, e["__ew__"], acc[2] + e["__ec__"])
    out_schema = T.StructType(list(sdf.schema.fields)
                              + [T.StructField(name, T.DoubleType())])
    mp = min_periods

    def _emit(it):
        import numpy as np
        state, init = [np.nan, 1.0, 0.0, 0.0, 0.0, np.nan, False, 0.0], False
        for pdf_b in it:
            if len(pdf_b) == 0:
                continue
            if not init:
                c = carries.get(int(pdf_b["__pid__"].iloc[0]),
                                (np.nan, 1.0, 0.0))
                state[0], state[1], state[2] = c[0], c[1], c[2]
                state[6] = not np.isnan(c[0])
                init = True
            x = pdf_b["__ev__"].to_numpy(dtype=np.float64)
            y, cnt = _batch_scan(x, state)
            o = pdf_b.copy()
            o[name] = np.where(cnt >= max(mp, 1), y, np.nan)
            yield o

    return (sdf.mapInPandas(_emit, out_schema)
            .drop("__pid__", "__mid__", "__ev__"))


def with_ewm_noadjust_stats(sdf: DataFrame, specs: dict, alpha: float,
                            order_by: list | None,
                            min_periods: int = 0,
                            ignore_na: bool = False,
                            bias: bool = False) -> DataFrame:
    """Partition-safe GLOBAL ``ewm(adjust=False)`` second moments —
    ``var``/``std``/``cov``/``corr`` (and ``mean``) — for ANY number
    of column pairs from ONE range layout and TWO passes.

    ``specs`` maps tag -> (x_col, y_col, stats tuple); var/std pass
    the same column twice. Outputs ``__ewmna_<stat>_<tag>__``.

    adjust=False renormalizes at every observation (pandas' ewmcov
    kernel resets old_wt to 1), so unlike adjust=True these moments
    are NOT fixed-weight decayed sums and the four/seven-sums carry
    algebra of :func:`with_ewm_stats` does not apply. Instead this
    generalizes :func:`with_ewm_mean_noadjust`'s perturbation carry
    to the kernel's full state (mean_x, mean_y, cov, sum_wt2):

    - zero-carry per-batch values come from pandas' C kernel
      (``ewm(adjust=False).cov/var(bias=True)``); the zero-carry
      debias track v = sum_wt2/sum_wt^2 comes from the bias=True /
      bias=False ratio of a synthetic strictly-increasing series
      with the same null pattern (the ratio depends only on the gap
      structure, and the kernel's recurrence form keeps it exact);
    - an incoming carry (m_x, m_y, c.., v, w) folds in at the batch's
      first observation (Moebius merge A = r^gap * w), producing
      perturbations delta_m = p*(m_in - x1), gamma (cov merge), and
      nu = v_first - 1;
    - the perturbations propagate through later observations as
      m_t = m0_t + P_t*delta, v_t = v0_t + P_t^2*nu, and
      c_t = c0_t + P_t*(gamma + dx*SY_t + dy*SX_t + dx*dy*SP_t),
      where P_t = prod(rho_i) over observations after the first
      (rho_i = r^gap/(r^gap+alpha), the same contraction the mean
      carry uses) and SX/SY/SP are bounded cumulative sums — the
      position weights cancel analytically (X_i/P_i collapses to
      (1-rho_i)*(m0_{i-1} - x_i)), so nothing overflows;
    - the merge formulas are FACTORED so a constant history yields
      exact zeros (dx = p*(m_in-x1), gamma = A*c_in/w +
      Dx*Dy*(A*s^2+alpha*p^2)/w): constant windows keep pandas'
      exact-0 variance and NaN corr with no clamp at all.

    The debias test is pandas' own ``denominator > 0`` (exact), not a
    relative threshold — pandas divides even at D ~ 1e-16 after long
    gaps. Known divergence: after a gap long enough that r^gap is
    ~1e-50, pandas' kernel variance is dominated by the cancellation
    residue of (cur - mean) (~(eps*|x|)^2, observed 4.9e-32 where the
    true moment is 1.4e-52); the factored carry here computes the
    exact tiny moment instead, so corr at such singular points can
    disagree with pandas' artifact. Reference: the reference engine
    has no ewm at all (pandas-parity extension; see
    with_ewm_mean_noadjust for the mean-only face this generalizes).
    """
    import pandas as pd
    from pyspark.sql import types as T

    if not (0.0 < alpha <= 1.0):
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    ok_stats = ("mean", "var", "std", "cov", "corr")
    for t, (_, _, sts) in specs.items():
        bad = [s for s in sts if s not in ok_stats]
        if bad:
            raise ValueError(f"unsupported ewm stats: {bad}")
    r = 1.0 - alpha
    tags = list(specs)
    sel, same_col = [], {}
    for t, (cx, cy, _) in specs.items():
        ex = F.col(cx) if isinstance(cx, str) else cx
        sel.append(ex.cast("double").alias(f"__ex_{t}__"))
        same = (isinstance(cx, str) and isinstance(cy, str)
                and cx == cy) or cx is cy
        same_col[t] = same
        if not same:
            ey = F.col(cy) if isinstance(cy, str) else cy
            sel.append(ey.cast("double").alias(f"__ey_{t}__"))
    sdf = _range_layout(sdf.select("*", *sel), order_by)

    # per-tag state layout:
    # 0 mx, 1 my, 2 cxy, 3 cxx, 4 cyy, 5 v, 6 w, 7 cnt, 8 has_obs,
    # 9 pre_steps, 10 x1, 11 y1, 12 lnPi, 13 SX, 14 SY, 15 SP,
    # 16 no_obs_steps
    W = 17

    def _fresh():
        import numpy as np
        return [np.nan, np.nan, 0.0, 0.0, 0.0, 1.0, 1.0, 0.0, 0.0,
                0.0, np.nan, np.nan, 0.0, 0.0, 0.0, 0.0, 0.0]

    def _m_merge(st, x1v, y1v, A):
        """Fold incoming (m, c, v, w) into the first observation;
        factored so constant histories give EXACT zero perturbations."""
        w_ = A + alpha
        p_, s_ = A / w_, alpha / w_
        Dx, Dy = st[0] - x1v, st[1] - y1v
        dx, dy = p_ * Dx, p_ * Dy
        coef = (A * s_ * s_ + alpha * p_ * p_) / w_
        gxy = (A * st[2]) / w_ + Dx * Dy * coef
        gxx = (A * st[3]) / w_ + Dx * Dx * coef
        gyy = (A * st[4]) / w_ + Dy * Dy * coef
        nu = (st[5] * A * A + alpha * alpha) / (w_ * w_) - 1.0
        return dx, dy, gxy, gxx, gyy, nu, p_

    def _tag_scan(x, y, st, summarize):
        """Advance one tag's state across one batch; returns per-row
        (mx, my, cxy, cxx, cyy, v, cnt)."""
        import numpy as np
        L = len(x)
        mask = ~(np.isnan(x) | np.isnan(y))
        obs = np.flatnonzero(mask)
        k = len(obs)
        cnt = st[7] + np.cumsum(mask)
        if k == 0:
            rows = [np.full(L, st[j]) for j in range(6)]
            if not ignore_na:
                st[6] *= r ** L
                if not st[8]:
                    st[9] += L
                    st[16] += L
            return (*rows, cnt)
        if ignore_na:
            d = np.ones(k)
        else:
            d = np.empty(k)
            d[0] = obs[0] + 1.0
            d[1:] = np.diff(obs).astype(np.float64)
        xm = np.where(mask, x, np.nan)
        kw = dict(alpha=alpha, adjust=False, ignore_na=ignore_na,
                  min_periods=0)
        sxm = pd.Series(xm)
        mx0 = sxm.ewm(**kw).mean().to_numpy()
        cxx0 = sxm.ewm(**kw).var(bias=True).to_numpy()
        if y is x:
            my0, cyy0, cxy0 = mx0, cxx0, cxx0.copy()
        else:
            ym = np.where(mask, y, np.nan)
            sym = pd.Series(ym)
            my0 = sym.ewm(**kw).mean().to_numpy()
            cyy0 = sym.ewm(**kw).var(bias=True).to_numpy()
            cxy0 = sxm.ewm(**kw).cov(sym, bias=True).to_numpy()
        # bias=True cov is 0.0 from the first obs (kernel cov state);
        # pandas surfaces NaN pre-min_periods — normalize to the state
        seen = np.cumsum(mask) > 0
        for c0 in ((cxy0, cxx0) if y is x else (cxy0, cxx0, cyy0)):
            c0[seen & np.isnan(c0)] = 0.0
        s_syn = np.where(mask, np.arange(L, dtype=np.float64), np.nan)
        ssy = pd.Series(s_syn)
        vb = ssy.ewm(**kw).var(bias=True).to_numpy()
        vu = ssy.ewm(**kw).var(bias=False).to_numpy()
        with np.errstate(invalid="ignore", divide="ignore"):
            v0 = 1.0 - vb / vu
        v0[obs[0]] = 1.0
        v0 = pd.Series(v0).ffill().to_numpy()
        with np.errstate(divide="ignore"):
            rho = r ** d / (r ** d + alpha)
        i0 = obs[0]
        if np.isnan(st[0]):
            if not st[8]:
                st[9] += (i0 + 1.0) if not ignore_na else 1.0
                st[10], st[11] = x[i0], y[i0]
            dx = dy = gxy = gxx = gyy = nu = 0.0
            first_lp = None
        else:
            A = (r ** (d[0] if not ignore_na else 1.0)) * st[6]
            dx, dy, gxy, gxx, gyy, nu, p_ = _m_merge(
                st, x[i0], y[i0], A)
            first_lp = np.log(p_) if p_ > 0 else -np.inf
        had_prior = bool(st[8])
        lnPi_in = st[12]
        pre_mx, pre_my = st[0], st[1]
        st[8] = 1.0
        lnp = np.zeros(L)
        with np.errstate(divide="ignore"):
            lnp[obs[1:]] = np.log(rho[1:])
        cl = np.cumsum(lnp)
        Pi = np.exp(cl)
        SX_t = np.zeros(L)
        SY_t = np.zeros(L)
        SP_t = np.zeros(L)
        if k > 1:
            o2 = obs[1:]
            omr = 1.0 - rho[1:]
            sx = np.zeros(L)
            sy = np.zeros(L)
            sp = np.zeros(L)
            sx[o2] = omr * (mx0[obs[:-1]] - x[o2])
            sy[o2] = omr * (my0[obs[:-1]] - y[o2])
            sp[o2] = np.exp(cl[obs[:-1]]) * omr
            SX_t = np.cumsum(sx)
            SY_t = np.cumsum(sy)
            SP_t = np.cumsum(sp)
        mx_t = mx0 + Pi * dx
        my_t = my0 + Pi * dy
        cxy_t = cxy0 + Pi * (gxy + dx * SY_t + dy * SX_t
                             + dx * dy * SP_t)
        cxx_t = cxx0 + Pi * (gxx + 2 * dx * SX_t + dx * dx * SP_t)
        cyy_t = cyy0 + Pi * (gyy + 2 * dy * SY_t + dy * dy * SP_t)
        v_t = v0 + Pi * Pi * nu
        for arr, j in ((mx_t, 0), (my_t, 1), (cxy_t, 2), (cxx_t, 3),
                       (cyy_t, 4), (v_t, 5)):
            arr[:i0] = st[j]
        if summarize:
            # partition-level correction sums: one term per obs after
            # the partition's first, on the zero-state trajectory this
            # _ends run computes; P_{i-1} is the PARTITION product
            if first_lp is not None and had_prior:
                rho_f = np.exp(first_lp)
                st[13] += (1.0 - rho_f) * (pre_mx - x[i0])
                st[14] += (1.0 - rho_f) * (pre_my - y[i0])
                st[15] += np.exp(lnPi_in) * (1.0 - rho_f)
                base_ln = lnPi_in + first_lp
            else:
                base_ln = lnPi_in
            if k > 1:
                o2 = obs[1:]
                omr = 1.0 - rho[1:]
                st[13] += float(np.sum(omr * (mx_t[obs[:-1]] - x[o2])))
                st[14] += float(np.sum(omr * (my_t[obs[:-1]] - y[o2])))
                st[15] += float(np.sum(
                    np.exp(base_ln + cl[obs[:-1]]) * omr))
            if first_lp is not None:
                st[12] += first_lp
            st[12] += float(np.sum(lnp[obs[1:]]))
        last = obs[-1]
        st[0], st[1] = mx_t[last], my_t[last]
        st[2], st[3], st[4] = cxy_t[last], cxx_t[last], cyy_t[last]
        st[5] = v_t[last]
        st[6] = r ** (L - 1 - last) if not ignore_na else 1.0
        st[7] += k
        return mx_t, my_t, cxy_t, cxx_t, cyy_t, v_t, cnt

    def _cols_of(pdf_b):
        import numpy as np
        out = []
        for t in tags:
            x = pdf_b[f"__ex_{t}__"].to_numpy(dtype=np.float64)
            out.append((x, x if same_col[t]
                        else pdf_b[f"__ey_{t}__"].to_numpy(
                            dtype=np.float64)))
        return out

    n_state = W * len(tags)
    ends_schema = T.StructType(
        [T.StructField("__pid__", T.IntegerType())]
        + [T.StructField(f"__e{j}__", T.DoubleType())
           for j in range(n_state)])
    ev_cols = [f"__ex_{t}__" for t in tags] + [
        f"__ey_{t}__" for t in tags if not same_col[t]]

    def _ends(it):
        states, pid = [_fresh() for _ in tags], None
        for pdf_b in it:
            if len(pdf_b) == 0:
                continue
            pid = int(pdf_b["__pid__"].iloc[0])
            for ti, (x, y) in enumerate(_cols_of(pdf_b)):
                _tag_scan(x, y, states[ti], summarize=True)
        if pid is not None:
            row = {"__pid__": [pid]}
            flat = [v for st in states for v in st]
            row.update({f"__e{j}__": [float(flat[j])]
                        for j in range(n_state)})
            yield pd.DataFrame(row)

    erows = {int(rw["__pid__"]): rw for rw in
             sdf.select("__pid__", *ev_cols).mapInPandas(
                 _ends, ends_schema).collect()}
    import math as _math

    def _combine(acc, ends):
        """Driver-side per-tag carry merge: acc = (mx, my, cxy, cxx,
        cyy, v, w, cnt); ends = the 17 exported fields."""
        if not ends[8]:
            if not ignore_na:
                return acc[:6] + (acc[6] * r ** ends[16], acc[7])
            return acc
        if _math.isnan(acc[0]):
            return tuple(ends[:8])
        st = list(acc[:7])
        A = (r ** ends[9]) * acc[6]
        dx, dy, gxy, gxx, gyy, nu, _p = _m_merge(st, ends[10],
                                                 ends[11], A)
        P = _math.exp(ends[12])
        SX, SY, SP = ends[13], ends[14], ends[15]
        return (ends[0] + P * dx,
                ends[1] + P * dy,
                ends[2] + P * (gxy + dx * SY + dy * SX
                               + dx * dy * SP),
                ends[3] + P * (gxx + 2 * dx * SX + dx * dx * SP),
                ends[4] + P * (gyy + 2 * dy * SY + dy * dy * SP),
                ends[5] + P * P * nu,
                ends[6], acc[7] + ends[7])

    carries = {}
    nan = float("nan")
    acc = [(nan, nan, 0.0, 0.0, 0.0, 1.0, 1.0, 0.0) for _ in tags]
    for pid in sorted(erows):
        carries[pid] = tuple(acc)
        e = erows[pid]
        acc = [_combine(acc[ti],
                        [e[f"__e{ti * W + j}__"] for j in range(W)])
               for ti in range(len(tags))]
    stats_by_tag = {t: tuple(sts) for t, (_, _, sts) in specs.items()}
    out_cols = [f"__ewmna_{s}_{t}__"
                for t, sts in stats_by_tag.items() for s in sts]
    out_schema = T.StructType(list(sdf.schema.fields)
                              + [T.StructField(c, T.DoubleType())
                                 for c in out_cols])
    mp = min_periods

    def _emit(it):
        import numpy as np
        states, init = None, False
        for pdf_b in it:
            if len(pdf_b) == 0:
                continue
            if not init:
                c = carries.get(int(pdf_b["__pid__"].iloc[0]),
                                tuple((nan, nan, 0.0, 0.0, 0.0, 1.0,
                                       1.0, 0.0) for _ in tags))
                states = []
                for ti in range(len(tags)):
                    st = _fresh()
                    st[:8] = list(c[ti])
                    st[8] = 0.0 if np.isnan(c[ti][0]) else 1.0
                    states.append(st)
                init = True
            o = pdf_b.copy()
            for ti, (x, y) in enumerate(_cols_of(pdf_b)):
                t = tags[ti]
                mx, my, cxy, cxx, cyy, v, cnt = _tag_scan(
                    x, y, states[ti], summarize=False)
                gate = cnt >= max(mp, 1)
                with np.errstate(invalid="ignore", divide="ignore"):
                    D = 1.0 - v
                    for s in stats_by_tag[t]:
                        if s == "mean":
                            o[f"__ewmna_{s}_{t}__"] = np.where(
                                gate, mx, np.nan)
                            continue
                        if s == "corr":
                            den = np.sqrt(np.maximum(cxx, 0.0)
                                          * np.maximum(cyy, 0.0))
                            val = np.where(den > 0, cxy / den, np.nan)
                        elif s in ("var", "std"):
                            cc = np.maximum(cxx, 0.0)
                            val = cc if bias else np.where(
                                D > 0, cc / D, np.nan)
                            if s == "std":
                                val = np.sqrt(val)
                        else:  # cov
                            val = cxy if bias else np.where(
                                D > 0, cxy / D, np.nan)
                        o[f"__ewmna_{s}_{t}__"] = np.where(
                            gate, val, np.nan)
            yield o

    return (sdf.mapInPandas(_emit, out_schema)
            .drop("__pid__", "__mid__", *ev_cols))


def with_interp_neighbors(sdf: DataFrame, value_col, order_by,
                          pos: str = "__ip__", prev: str = "__iprev__",
                          nxt: str = "__inext__") -> DataFrame:
    """Single-column face of :func:`with_interp_neighbors_multi`
    (kept for the Series surface). See the multi variant for the
    design and measurements."""
    out = with_interp_neighbors_multi(sdf, {"0": value_col},
                                      order_by, pos=pos)
    return (out.withColumnRenamed("__v_0__", "__v__")
            .withColumnRenamed("__iprev_0__", prev)
            .withColumnRenamed("__inext_0__", nxt))


def with_interp_neighbors_multi(sdf: DataFrame, values: dict,
                                order_by,
                                pos: str = "__ip__") -> DataFrame:
    """Everything linear interpolation needs from ONE range layout,
    for ANY number of columns at once: a dense global position
    ``pos`` plus per-tag ``__v_{t}__`` (the value),
    ``__iprev_{t}__`` / ``__inext_{t}__`` (nearest previous/next
    non-null (position, value) structs).

    Design (and why): the naive composition — with_dense_ordinal +
    with_last_non_null forward + backward, PER COLUMN — pays three
    range layouts (repartition+sort+checkpoint each) and three
    driver round-trips per column; measured 30s at 16x sf0.1 where
    this fused pass is one layout, one Window stage, ONE
    per-partition stats collect, and one broadcast join for every
    column together. Both carries are RUNNING frames
    (unboundedPreceding -> current): Spark streams those in O(n),
    while a (current -> unboundedFollowing) frame with first()
    re-scans the tail per row — O(n^2), measured 4.5s -> 118s at 1x.
    The backward carry therefore runs over the SAME partitioning
    with the order reversed: a second in-partition sort, no
    exchange. Driver state stays n_partitions rows regardless of
    row count or column count.
    """
    tags = list(values)
    lay = _range_layout(
        sdf.select("*", *[c.alias(f"__v_{t}__")
                          for t, c in values.items()]), order_by)
    w = Window.partitionBy("__pid__").orderBy(F.col("__mid__").asc())
    wd = (Window.partitionBy("__pid__")
          .orderBy(F.col("__mid__").desc())
          .rowsBetween(Window.unboundedPreceding, 0))
    lay = lay.withColumn("__rn__", F.row_number().over(w))

    def nn(t):
        v = F.col(f"__v_{t}__")
        return F.when(v.isNotNull(),
                      F.struct(F.col("__rn__").alias("p"),
                               v.alias("v")))

    wrun = w.rowsBetween(Window.unboundedPreceding, 0)
    for t in tags:
        lay = (lay
               .withColumn(f"__pl_{t}__",
                           F.last(nn(t), ignorenulls=True).over(wrun))
               .withColumn(f"__nl_{t}__",
                           F.last(nn(t), ignorenulls=True).over(wd)))

    # one job: per-partition row count + edge donors per column
    # (struct ordering is lexicographic; rn is unique per partition,
    # so max/min pick the last/first non-null row)
    aggs = [F.count(F.lit(1)).alias("n")]
    for t in tags:
        aggs += [F.max(nn(t)).alias(f"l_{t}"),
                 F.min(nn(t)).alias(f"f_{t}")]
    stats = lay.groupBy("__pid__").agg(*aggs).collect()
    by_pid = {r["__pid__"]: r for r in stats}
    offsets, acc = {}, 0
    for pid in sorted(by_pid):
        offsets[pid] = acc
        acc += by_pid[pid]["n"]
    pre = {t: {} for t in tags}
    suf = {t: {} for t in tags}
    for t in tags:
        carry = None
        for pid in sorted(by_pid):
            pre[t][pid] = carry
            l = by_pid[pid][f"l_{t}"]
            if l is not None and l["v"] is not None:
                carry = (offsets[pid] + l["p"] - 1, float(l["v"]))
        carry = None
        for pid in sorted(by_pid, reverse=True):
            suf[t][pid] = carry
            f = by_pid[pid][f"f_{t}"]
            if f is not None and f["v"] is not None:
                carry = (offsets[pid] + f["p"] - 1, float(f["v"]))

    spark = lay.sparkSession
    schema = ["__pid__ INT", "__off__ LONG"]
    rows = []
    for pid in sorted(by_pid):
        row = [int(pid), int(offsets[pid])]
        for t in tags:
            row += list(pre[t][pid] or (None, None))
            row += list(suf[t][pid] or (None, None))
        rows.append(tuple(row))
    for t in tags:
        schema += [f"__pp_{t}__ LONG", f"__pv_{t}__ DOUBLE",
                   f"__np_{t}__ LONG", f"__nv_{t}__ DOUBLE"]
    fill = spark.createDataFrame(rows, ", ".join(schema))
    out = lay.join(F.broadcast(fill), "__pid__")

    def glob(local, fill_p, fill_v):
        s = F.col(local)
        return F.when(
            s.isNotNull(),
            F.struct((F.col("__off__") + s["p"] - 1).alias("p"),
                     s["v"].cast("double").alias("v"))) \
            .otherwise(F.when(
                F.col(fill_p).isNotNull(),
                F.struct(F.col(fill_p).alias("p"),
                         F.col(fill_v).alias("v"))))

    out = out.withColumn(pos, F.col("__off__") + F.col("__rn__") - 1)
    drop = ["__off__", "__rn__", "__mid__", "__pid__"]
    for t in tags:
        out = (out
               .withColumn(f"__iprev_{t}__",
                           glob(f"__pl_{t}__", f"__pp_{t}__",
                                f"__pv_{t}__"))
               .withColumn(f"__inext_{t}__",
                           glob(f"__nl_{t}__", f"__np_{t}__",
                                f"__nv_{t}__")))
        drop += [f"__pl_{t}__", f"__nl_{t}__", f"__pp_{t}__",
                 f"__pv_{t}__", f"__np_{t}__", f"__nv_{t}__"]
    return out.drop(*drop)


# pandas Rolling methods servable by the local-carry pass below, and
# the kwargs each accepts (anything else is rejected loudly)
_ROLL_LOCAL_STATS = {
    "min": (), "max": (), "median": (),
    "quantile": ("q", "interpolation"),
    "skew": (), "kurt": (), "sem": ("ddof",), "rank": ("method", "pct"),
    "apply": ("func", "raw", "args", "kwargs"),
}
# prefix-decomposable stats admitted ONLY via center=True (trailing
# flavors stay on the JVM prefix scans)
_ROLL_CENTER_EXTRA = {
    "sum": (), "mean": (), "count": (),
    "var": ("ddof",), "std": ("ddof",),
}


def with_rolling_locals(sdf: DataFrame, cols: dict, window: int,
                        stat: str, order_by: list | None = None,
                        min_periods: int | None = None,
                        center: bool = False,
                        max_carry_cells: int = 20_000_000,
                        **stat_kwargs) -> DataFrame:
    """Partition-safe GLOBAL fixed-window rolling statistics that do
    NOT decompose into prefix scans — min/max/median/quantile/skew/
    kurt/sem/rank/apply (and, for ``center=True``, the prefix family
    too) — from ONE frozen range layout, one bounded donor collect,
    and one Arrow pass running pandas' C rolling kernels.

    ``cols`` maps out_name -> value Column/name (cast to double);
    every output shares the layout, the donor collect, and the single
    mapInPandas pass. Outputs are double, NULL where pandas yields
    NaN (min_periods gating included — pandas semantics throughout,
    since pandas computes the window itself).

    Unlike the EWM carries there is NO recurrence to merge: a
    trailing window of size ``window`` sees at most the ``window-1``
    globally-preceding rows, so prepending each partition's carry
    (those rows' values, accumulated across short partitions on the
    driver exactly like :func:`with_boundary_shifts`) and dropping
    the warmup positions reproduces the global answer EXACTLY — NaN
    positions still occupy window slots because the carry ships the
    raw values, NaNs included.

    ``center=True`` windows span [i-w//2, i+(w-1)//2] (pandas'
    LEFT-heavy split), so the carry runs BOTH directions — each partition gets
    its h1 globally-preceding and h2 globally-following values — and
    the kernel pass buffers h2 rows of lookahead before emitting;
    truncated windows at the global edges fall out naturally because
    the carries hold exactly the rows that exist.

    Driver state is n_partitions x (window-1) x n_cols scalars —
    bounded by construction and guarded by ``max_carry_cells``; past
    the guard the error names the per-group Window alternative
    (grouped rolling partitions by key and needs no carry at all).
    """
    import pandas as pd
    from pyspark.sql import types as T

    if window <= 0:
        raise ValueError(f"window must be positive, got {window}")
    ok = dict(_ROLL_LOCAL_STATS)
    if center:
        ok.update(_ROLL_CENTER_EXTRA)
    if stat not in ok:
        raise ValueError(
            f"unsupported local-carry rolling stat {stat!r}; "
            f"supported: {sorted(ok)}")
    bad = [kw for kw in stat_kwargs if kw not in ok[stat]]
    if bad:
        raise TypeError(f"rolling.{stat}() got unexpected kwargs {bad}")
    mp = window if min_periods is None else min_periods
    outs = list(cols)
    vnames = {o: f"__rl_{i}__" for i, o in enumerate(outs)}
    sel = [(F.col(c) if isinstance(c, str) else c).cast("double")
           .alias(vnames[o]) for o, c in cols.items()]
    lay = _range_layout(sdf.select("*", *sel), order_by)

    # pandas' center split is LEFT-heavy for even windows:
    # window spans [i - w//2, i + (w-1)//2]
    h2 = (window - 1) // 2 if center else 0       # right context
    h1 = (window // 2) if center else window - 1  # left context
    carry_pre: dict = {}
    carry_post: dict = {}
    if h1 > 0 or h2 > 0:
        n_parts = lay.rdd.getNumPartitions()
        cells = (h1 + h2) * n_parts * len(outs)
        if cells > max_carry_cells:
            raise ValueError(
                f"rolling {stat} carry would hold ~{cells} "
                f"driver-side values (window={window} x {n_parts} "
                f"partitions x {len(outs)} columns); use "
                f"groupby(...).rolling (per-group windows need no "
                f"cross-partition carry) or raise max_carry_cells")
        desc_w = Window.partitionBy("__pid__") \
            .orderBy(F.col("__mid__").desc())
        asc_w = Window.partitionBy("__pid__") \
            .orderBy(F.col("__mid__").asc())
        sel_rn = lay.withColumn("__drn__", F.row_number().over(desc_w))
        if h2 > 0:
            sel_rn = sel_rn.withColumn("__arn__",
                                       F.row_number().over(asc_w))
            cond = (F.col("__drn__") <= h1) | (F.col("__arn__") <= h2)
            keep = ["__pid__", "__drn__", "__arn__"]
        else:
            cond = F.col("__drn__") <= h1
            keep = ["__pid__", "__drn__"]
        donors = (sel_rn.where(cond)
                  .select(*keep, *[vnames[o] for o in outs]).collect())
        tail_by_pid: dict = {}
        head_by_pid: dict = {}
        for r in donors:
            val = tuple(r[vnames[o]] for o in outs)
            if h1 > 0 and r["__drn__"] <= h1:
                tail_by_pid.setdefault(r["__pid__"], {})[
                    r["__drn__"]] = val
            if h2 > 0 and r["__arn__"] <= h2:
                head_by_pid.setdefault(r["__pid__"], {})[
                    r["__arn__"]] = val
        pids = sorted({int(r["__pid__"]) for r in donors})
        if h1 > 0:
            run: list = []     # last h1 value-tuples seen, global order
            for pid in pids:
                if run:
                    carry_pre[pid] = list(run)
                part = tail_by_pid.get(pid, {})
                vals = [part[d] for d in sorted(part, reverse=True)]
                run = (run + vals)[-h1:]
        if h2 > 0:
            post: list = []    # next h2 value-tuples, global order
            for pid in reversed(pids):
                if post:
                    carry_post[pid] = list(post)
                part = head_by_pid.get(pid, {})
                vals = [part[a] for a in sorted(part)]
                post = (vals + post)[:h2]

    vlist = [vnames[o] for o in outs]
    out_schema = T.StructType(
        list(lay.schema)
        + [T.StructField(o, T.DoubleType()) for o in outs])

    def _kernel(vals: "pd.DataFrame", lo: int, n: int,
                assign_to: "pd.DataFrame"):
        for o in outs:
            roll = vals[vnames[o]].rolling(
                window, min_periods=mp, center=center)
            res = getattr(roll, stat)(**stat_kwargs)
            assign_to[o] = res.iloc[lo:lo + n].to_numpy(dtype="float64")

    def gen_trailing(batches):
        tail = None
        for pdf in batches:
            if not len(pdf):
                continue
            if tail is None:
                pre = carry_pre.get(int(pdf["__pid__"].iloc[0]), [])
                tail = pd.DataFrame(pre, columns=vlist,
                                    dtype="float64")
            vals = pd.concat([tail[vlist], pdf[vlist]],
                             ignore_index=True)
            _kernel(vals, len(tail), len(pdf), pdf)
            tail = vals.iloc[len(vals) - h1:] if h1 else vals.iloc[:0]
            yield pdf

    def gen_center(batches):
        ctx = None          # last h1 raw values before `pending`
        pending = None      # rows buffered for h2 rows of lookahead
        pid = None
        for pdf in batches:
            if not len(pdf):
                continue
            if ctx is None:
                pid = int(pdf["__pid__"].iloc[0])
                pre = carry_pre.get(pid, [])
                ctx = pd.DataFrame(pre, columns=vlist, dtype="float64")
            pending = (pdf if pending is None
                       else pd.concat([pending, pdf],
                                      ignore_index=True))
            if len(pending) > h2:
                emit_n = len(pending) - h2
                vals = pd.concat([ctx, pending[vlist]],
                                 ignore_index=True)
                emit = pending.iloc[:emit_n].copy()
                _kernel(vals, len(ctx), emit_n, emit)
                lo = (max(0, len(ctx) + emit_n - h1) if h1
                      else len(vals))
                ctx = vals.iloc[lo:len(ctx) + emit_n]
                pending = pending.iloc[emit_n:].reset_index(drop=True)
                yield emit
        if pending is not None and len(pending):
            post = pd.DataFrame(carry_post.get(pid, []),
                                columns=vlist, dtype="float64")
            vals = pd.concat([ctx, pending[vlist], post],
                             ignore_index=True)
            out = pending.copy()
            _kernel(vals, len(ctx), len(pending), out)
            yield out

    out = lay.mapInPandas(gen_center if center else gen_trailing,
                          out_schema)
    return out.drop("__mid__", "__pid__", *vlist)


def with_ewm_mean_times(sdf: DataFrame, value_col, time_col,
                        halflife_us: float,
                        order_by: list | None, min_periods: int = 0,
                        name: str = "__ewm__") -> DataFrame:
    """Single-column face of :func:`with_ewm_mean_times_multi`."""
    out = with_ewm_mean_times_multi(
        sdf, {"v": value_col}, time_col, halflife_us, order_by,
        min_periods)
    return out.withColumnRenamed("__ewmt_v__", name)


def with_ewm_mean_times_multi(sdf: DataFrame, values: dict,
                              time_col, halflife_us: float,
                              order_by: list | None,
                              min_periods: int = 0) -> DataFrame:
    """Partition-safe GLOBAL time-decay EWM mean (pandas
    ``ewm(halflife=Timedelta, times=...).mean()``) for ANY number of
    value columns over ONE layout: the weight of an observation
    decays with its actual STAMP distance, 0.5^(dt/hl), not its row
    distance. ``values`` maps tag -> Column; outputs
    ``__ewmt_<tag>__``.

    ROW-ORDER semantics, like pandas: decay deltas follow the
    ``order_by`` row sequence, and times need NOT be monotonic in
    it (a past-dated row simply carries weight > 1 relative to its
    predecessor — the signed analytic fold is the same algebra).
    Null stamps raise ValueError (pandas raises for NaT too),
    gated on a count the pass-1 ends scan already produces.

    Same two-pass carry shape as :func:`with_ewm_mean`, but the
    decayed sums are computed with a SEGMENTED anchor trick instead
    of pandas' fixed-alpha kernel: within a segment whose time span
    is < 50 halflives, num0_i = u_i * cumsum(x_j/u_j) with
    u = 2^(-(t-anchor)/hl) is exact to double precision (terms
    beyond 50 bits are below the accumulator's resolution — the
    same loss the sequential kernel has); segments chain through
    the ANALYTIC time-decay fold num_i += 2^(-(t_i-t_in)/hl)*num_in,
    which is also how the driver prefix-combines the n_partitions
    end states and how partition carries merge in pass 2 — three
    scalars per tag per partition at any timestamp irregularity.
    NaN rows keep their weightless pandas semantics; a row whose
    total weight decays into the DENORMAL range forward-fills the
    last mean (the ratio num/den is invariant under pure decay, and
    a ~1e-322 denominator keeps two mantissa bits — observed
    emitting -5/7 for -0.706 before the guard), mirroring
    with_ewm_mean's y_last carry. Every tag shares the layout, the
    segment boundaries, and both passes.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    if halflife_us <= 0:
        raise ValueError(
            f"halflife must be positive, got {halflife_us}")
    hl = float(halflife_us)
    tags = list(values)
    tcol = F.col(time_col) if isinstance(time_col, str) else time_col
    sel = [(F.col(c) if isinstance(c, str) else c).cast("double")
           .alias(f"__ev_{t}__") for t, c in values.items()]
    sdf = _range_layout(
        sdf.select("*", *sel,
                   F.unix_micros(tcol.cast("timestamp"))
                   .cast("double").alias("__et__")), order_by)

    NEG = -1.0e300

    def _fresh():
        # per tag: [num, den, t_last, cnt, y_last]
        return {tg: [0.0, 0.0, NEG, 0.0, np.nan] for tg in tags}

    span = 50.0 * hl

    def _segments(t):
        """Cut [0, L) into runs whose STAMP RANGE stays under 50
        halflives — the precision bound of the anchor trick. Rows
        arrive in ROW order (pandas computes decay deltas in row
        order, times need not be monotonic), so the general cut
        rule is the running max-min span; sorted stamps take the
        one-searchsorted-per-segment fast path. The chunked
        accumulates keep the general scan ~O(L) for locally
        near-monotonic data."""
        L = len(t)
        segs = []
        i = 0
        if L and bool(np.all(t[1:] >= t[:-1])):
            while i < L:
                j = max(int(np.searchsorted(t, t[i] + span,
                                            side="left")), i + 1)
                segs.append((i, j))
                i = j
            return segs
        CH = 4096
        while i < L:
            j, mx, mn = i, -np.inf, np.inf
            while j < L:
                k = min(j + CH, L)
                rm = np.maximum.accumulate(t[j:k])
                rn = np.minimum.accumulate(t[j:k])
                if mx > -np.inf:
                    rm = np.maximum(rm, mx)
                    rn = np.minimum(rn, mn)
                over = np.nonzero(rm - rn > span)[0]
                if len(over):
                    j += int(over[0])
                    break
                mx, mn = float(rm[-1]), float(rn[-1])
                j = k
            j = max(j, i + 1)
            segs.append((i, j))
            i = j
        return segs

    def _batch_scan(xs: dict, t, states: dict):
        """xs maps tag -> value array; returns {tag: (y, cnt)}."""
        L = len(t)
        segs = _segments(t)
        outs = {}
        for tg in tags:
            x = xs[tg]
            st = states[tg]
            w = np.where(np.isnan(x), 0.0, 1.0)
            m = np.where(np.isnan(x), 0.0, x)
            num = np.empty(L)
            den = np.empty(L)
            n_in, d_in, t_in = st[0], st[1], st[2]
            for (i, j) in segs:
                seg = slice(i, j)
                b = (t[seg] - t[i]) / hl
                u = np.exp2(-b)
                inv = np.exp2(b)
                num0 = u * np.cumsum(m[seg] * inv)
                den0 = u * np.cumsum(w[seg] * inv)
                dk = (np.exp2(-(t[seg] - t_in) / hl)
                      if t_in > NEG else np.zeros(j - i))
                num[seg] = num0 + dk * n_in
                den[seg] = den0 + dk * d_in
                n_in, d_in, t_in = num[j - 1], den[j - 1], t[j - 1]
            cnt = st[3] + np.cumsum(w)
            st[0], st[1], st[2] = n_in, d_in, t_in
            st[3] = cnt[-1] if L else st[3]
            with np.errstate(invalid="ignore", divide="ignore"):
                # a row with an observation has den >= 1; den below
                # that only happens on NaN rows, where the true
                # output IS the previous mean (the ratio is
                # invariant under pure decay). Denormal-range dens
                # corrupt the ratio, so below 1e-250 forward-fill.
                y = np.where(den > 1e-250, num / den, np.nan)
            y = pd.concat([pd.Series([st[4]]), pd.Series(
                np.where(cnt > 0, y, np.nan))],
                ignore_index=True).ffill().to_numpy()[1:]
            if L:
                st[4] = y[-1]
            outs[tg] = (y, cnt)
        return outs

    ef = [T.StructField("__pid__", T.IntegerType()),
          T.StructField("__et0__", T.DoubleType()),
          T.StructField("__enul__", T.LongType())]
    for tg in tags:
        ef += [T.StructField(f"__en_{tg}__", T.DoubleType()),
               T.StructField(f"__ed_{tg}__", T.DoubleType()),
               T.StructField(f"__ec_{tg}__", T.DoubleType()),
               T.StructField(f"__ey_{tg}__", T.DoubleType())]
    ends_schema = T.StructType(ef)

    def _ends(it):
        states, pid, t_last, nul = _fresh(), None, NEG, 0
        for b in it:
            if not len(b):
                continue
            pid = int(b["__pid__"].iloc[0])
            t = b["__et__"].to_numpy(dtype=np.float64)
            nul += int(np.isnan(t).sum())
            _batch_scan({tg: b[f"__ev_{tg}__"]
                         .to_numpy(dtype=np.float64)
                         for tg in tags}, t, states)
            t_last = states[tags[0]][2]
        if pid is not None:
            row = {"__pid__": [pid], "__et0__": [t_last],
                   "__enul__": [nul]}
            for tg in tags:
                st = states[tg]
                row[f"__en_{tg}__"] = [st[0]]
                row[f"__ed_{tg}__"] = [st[1]]
                row[f"__ec_{tg}__"] = [st[3]]
                row[f"__ey_{tg}__"] = [st[4]]
            yield pd.DataFrame(row)

    _rows = (sdf.select("__pid__", "__et__",
                        *[f"__ev_{tg}__" for tg in tags])
             .mapInPandas(_ends, ends_schema).collect())
    nulls = sum(int(r["__enul__"]) for r in _rows)
    if nulls:
        # pandas raises for NaT stamps too ("Cannot convert NaT
        # values to integer") — a NaN __et__ would silently poison
        # the segment scan, so gate on the pass-1 count (free: the
        # ends pass already scanned the column)
        raise ValueError(
            f"ewm(times=...): the times column has {nulls} null "
            "stamp(s); pandas raises for NaT times too — drop or "
            "fill them first")
    erows = {int(r["__pid__"]): r for r in _rows}
    import math as _math
    carries = {}
    acc = {tg: (0.0, 0.0, 0.0, float("nan")) for tg in tags}
    acc_t = NEG
    for pid in sorted(erows):
        carries[pid] = (acc_t, dict(acc))
        e = erows[pid]
        t_end = e["__et0__"]
        # np.exp2, not 2.0**: times may run BACKWARD across a
        # partition boundary (row-order semantics), and a large
        # positive exponent must saturate to inf like the kernel
        # does, not raise OverflowError
        dk = (float(np.exp2(-(t_end - acc_t) / hl))
              if acc_t > NEG and t_end > NEG else 0.0)
        nxt = {}
        for tg in tags:
            a = acc[tg]
            ey = e[f"__ey_{tg}__"]
            nxt[tg] = (e[f"__en_{tg}__"] + dk * a[0],
                       e[f"__ed_{tg}__"] + dk * a[1],
                       a[2] + e[f"__ec_{tg}__"],
                       a[3] if ey is None or _math.isnan(ey)
                       else ey)
        acc = nxt
        if t_end > NEG:
            acc_t = t_end
    out_schema = T.StructType(
        list(sdf.schema.fields)
        + [T.StructField(f"__ewmt_{tg}__", T.DoubleType())
           for tg in tags])
    mp = min_periods

    def _emit(it):
        states, init = _fresh(), False
        for b in it:
            if not len(b):
                continue
            if not init:
                ct, cmap = carries.get(
                    int(b["__pid__"].iloc[0]),
                    (NEG, {tg: (0.0, 0.0, 0.0, np.nan)
                           for tg in tags}))
                for tg in tags:
                    c = cmap[tg]
                    states[tg] = [c[0], c[1], ct, c[2], c[3]]
                init = True
            t = b["__et__"].to_numpy(dtype=np.float64)
            outs = _batch_scan({tg: b[f"__ev_{tg}__"]
                                .to_numpy(dtype=np.float64)
                                for tg in tags}, t, states)
            o = b.copy()
            for tg in tags:
                y, cnt = outs[tg]
                o[f"__ewmt_{tg}__"] = np.where(
                    cnt >= max(mp, 1), y, np.nan)
            yield o

    return (sdf.mapInPandas(_emit, out_schema)
            .drop("__pid__", "__mid__", "__et__",
                  *[f"__ev_{tg}__" for tg in tags]))
