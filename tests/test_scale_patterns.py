"""Skew-salting and bucketing utilities: correctness + plan shape."""

import pytest

SF = "/root/testdata/sf0.001"


def test_salted_groupby_matches_plain(spark):
    from baloo_spark.plans.skew import salted_groupby
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    plain = {tuple(r[:1]): (round(r[1], 4), r[2]) for r in
             li.groupBy("l_returnflag")
             .agg({"l_quantity": "sum", "*": "count"})
             .select("l_returnflag", "sum(l_quantity)", "count(1)").collect()}
    salted = salted_groupby(li, "l_returnflag",
                            {"l_quantity": ["sum", "count"]}, salt=8)
    got = {(r["l_returnflag"],): (round(r["l_quantity_sum"], 4),
                                  r["l_quantity_count"])
           for r in salted.collect()}
    assert got == plain


def test_salted_groupby_mean(spark):
    from baloo_spark.plans.skew import salted_groupby
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    want = {r["l_returnflag"]: round(r["m"], 6) for r in
            li.groupBy("l_returnflag")
            .agg({"l_quantity": "avg"})
            .withColumnRenamed("avg(l_quantity)", "m").collect()}
    got = {r["l_returnflag"]: round(r["l_quantity_mean"], 6) for r in
           salted_groupby(li, "l_returnflag",
                          {"l_quantity": ["mean"]}, salt=8).collect()}
    assert got == want


def test_salted_groupby_rejects_nondecomposable(spark):
    from baloo_spark.plans.skew import salted_groupby
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    with pytest.raises(ValueError):
        salted_groupby(li, "l_returnflag", {"l_quantity": ["var"]})


def test_salted_join_matches_plain(spark):
    from baloo_spark.plans.skew import salted_join
    o = spark.read.parquet(f"{SF}/orders.parquet") \
        .select("o_orderkey", "o_custkey")
    c = spark.read.parquet(f"{SF}/customer.parquet") \
        .select("c_custkey", "c_acctbal") \
        .withColumnRenamed("c_custkey", "o_custkey")
    plain = sorted((r["o_orderkey"], round(r["c_acctbal"], 2))
                   for r in o.join(c, "o_custkey").collect())
    got = sorted((r["o_orderkey"], round(r["c_acctbal"], 2))
                 for r in salted_join(o, c, "o_custkey", salt=4).collect())
    assert got == plain


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    from baloo_spark.plans.bucketing import bucketed_join, write_bucketed
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_cust")
    o = spark.read.parquet(f"{SF}/orders.parquet")
    c = spark.read.parquet(f"{SF}/customer.parquet") \
        .withColumnRenamed("c_custkey", "o_custkey")
    write_bucketed(o, "b_orders", "o_custkey", buckets=8)
    write_bucketed(c, "b_cust", "o_custkey", buckets=8)
    # at toy scale Catalyst would (rightly) broadcast instead of using
    # the buckets; disable broadcast to exercise the big-table path
    # where bucketing is the win
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed_join(spark, "b_orders", "b_cust", "o_custkey")
        plan = j._jdf.queryExecution().executedPlan().toString()
        # the whole point: both sides pre-partitioned => no shuffle
        assert "Exchange hashpartitioning" not in plan
        assert "SortMergeJoin" in plan
        assert j.count() == o.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_cust")


def test_salted_groupby_collect_list_matches_plain(spark):
    """collect_list is the agg where skew actually bites (state grows
    with rows); the salted two-stage form must return the same
    multiset per key as plain groupBy."""
    from pyspark.sql import functions as F

    from baloo_spark.plans.skew import salted_groupby
    li = spark.read.parquet(
        "/root/testdata/sf0.001/lineitem.parquet") \
        .select(F.when((F.col("l_orderkey") % 10) < 3, 0)
                .otherwise(F.col("l_orderkey") % 7 + 1).alias("k"),
                F.col("l_quantity").alias("v"))
    plain = {r["k"]: sorted(r["vs"]) for r in
             li.groupBy("k").agg(F.collect_list("v").alias("vs"))
             .collect()}
    salted = {r["k"]: sorted(r["v_collect_list"]) for r in
              salted_groupby(li, "k", {"v": "collect_list"},
                             salt=8).collect()}
    assert salted == plain
    # the hot key (30% of rows) really is hot in this fixture
    n = sum(len(v) for v in plain.values())
    assert len(plain[0]) / n > 0.25


def test_rolling_and_mode_plans_have_no_global_window(bl):
    """The r5-continuation surfaces must never plan an unpartitioned
    window: Series.rolling composes prefix scans + boundary carries,
    and mode/value_counts(normalize) replace their old global-window
    max/total with one-row broadcast aggregates. A 'Window' node
    without a partition spec single-partitions data-sized input."""
    import numpy as np
    s = bl.Series(np.arange(100, dtype=np.float64), name="v")
    roll = s.rolling(5).mean().to_spark()._jdf.queryExecution() \
        .executedPlan().toString()
    # every window in the rolling plan is partitioned by the physical
    # partition id (work stays local; carries cross boundaries)
    for line in roll.splitlines():
        if "windowspecdefinition(" in line:
            assert "__pid__" in line, f"global window in:\n{line}"
    # mode / normalized value_counts plan NO window at all now —
    # their max/total are one-row broadcast aggregates
    for q in (s.mode(), s.value_counts(normalize=True)):
        plan = q.to_spark()._jdf.queryExecution().executedPlan() \
            .toString()
        assert "windowspecdefinition(" not in plan
        assert "BroadcastNestedLoopJoin" in plan or \
            "BroadcastExchange" in plan
