"""Unit tests for the dense-ordinal plan (plans/ordinal.py) — the
machinery under RangeIndex/slice/iloc/tail."""

import numpy as np


def test_dense_and_complete(spark):
    from baloo_spark.plans.ordinal import with_dense_ordinal
    df = spark.range(0, 1000).repartition(7)
    out = with_dense_ordinal(df.withColumnRenamed("id", "x"))
    ords = sorted(r["__ord__"] for r in out.collect())
    assert ords == list(range(1000))  # dense, complete, no dupes


def test_ordered_assignment_matches_sort(spark):
    from pyspark.sql import functions as F

    from baloo_spark.plans.ordinal import with_dense_ordinal
    import random
    rng = random.Random(7)
    vals = list(range(500))
    rng.shuffle(vals)
    df = spark.createDataFrame([(v,) for v in vals], "v INT").repartition(5)
    out = with_dense_ordinal(df, order_by=[F.col("v").asc()])
    rows = {r["__ord__"]: r["v"] for r in out.collect()}
    # ordinal i must hold the i-th smallest value
    assert all(rows[i] == i for i in range(500))


def test_no_single_partition_window(spark):
    from pyspark.sql import functions as F

    from baloo_spark.plans.ordinal import with_dense_ordinal
    df = spark.range(0, 100).repartition(4)
    out = with_dense_ordinal(df, order_by=[F.col("id").asc()])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
