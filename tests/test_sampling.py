"""Deterministic sampling / splitting (operators/sampling.py).

The contract that matters at 100 TB: assignments depend only on
(key, seed) — never on partitioning, row order, or run count — and
the whole thing stays a narrow map (no shuffle, no RNG state).
"""

import pytest
from pyspark.sql import functions as F

from baloo_spark.operators.sampling import (hash_bucket, hash_sample,
                                            stratified_sample,
                                            train_test_split)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7).alias("grp"),
        F.when(F.col("id") % 3 == 0, "en")
         .when(F.col("id") % 3 == 1, "de").otherwise("fr").alias("lang"))


def test_split_stable_under_repartition(docs):
    a = train_test_split(docs, key="doc_id").select("doc_id", "split")
    b = train_test_split(docs.repartition(13), key="doc_id") \
        .select("doc_id", "split")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_split_fractions_and_coverage(docs):
    out = train_test_split(docs, key="doc_id", seed=1)
    counts = dict(out.groupBy("split").count().collect())
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == 2000
    assert 0.7 < counts["train"] / 2000 < 0.9
    assert 0.05 < counts["val"] / 2000 < 0.15


def test_split_group_leakage_free(docs):
    # split on a DUPLICATED key: every duplicate must land together
    out = train_test_split(docs, key="grp", seed=3)
    n = (out.groupBy("grp").agg(F.countDistinct("split").alias("k"))
         .agg(F.max("k")).first()[0])
    assert n == 1


def test_hash_sample_fraction_and_subset(docs):
    s = hash_sample(docs, 0.25, key="doc_id", seed=5)
    n = s.count()
    assert 0.18 < n / 2000 < 0.32
    # idempotent: the sample of the sample with the same seed is itself
    assert hash_sample(s, 0.25, key="doc_id", seed=5).count() == n
    assert hash_sample(docs, 0.0, key="doc_id").count() == 0
    assert hash_sample(docs, 1.0, key="doc_id").count() == 2000
    with pytest.raises(ValueError):
        hash_sample(docs, 1.5, key="doc_id")


def test_stratified_sample_respects_fractions(docs):
    out = stratified_sample(docs, "lang", {"en": 0.6, "de": 0.2},
                            key="doc_id", seed=2)
    counts = dict(out.groupBy("lang").count().collect())
    assert "fr" not in counts  # absent stratum dropped
    assert 0.45 < counts["en"] / 667 < 0.75
    assert 0.1 < counts["de"] / 667 < 0.3


def test_seed_changes_assignment(docs):
    a = {r[0] for r in hash_sample(docs, 0.5, "doc_id", seed=1)
         .select("doc_id").collect()}
    b = {r[0] for r in hash_sample(docs, 0.5, "doc_id", seed=2)
         .select("doc_id").collect()}
    assert a != b and len(a & b) > 0  # independent-ish, not disjoint


def test_sampling_plan_is_narrow(docs):
    # filter only — no Exchange in the plan (stays a narrow map at any
    # scale; hash_bucket is whole-stage-codegen'd JVM intrinsics)
    plan = hash_sample(docs, 0.3, key="doc_id") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_weighted_sample_rate_and_determinism(spark):
    from pyspark.sql import functions as F

    from baloo_spark.operators.sampling import weighted_sample
    docs = spark.read.parquet(
        "/root/testdata/sf0.01/documents.parquet").select("doc_id", "n_chars")
    # weight rises with length; clamp path exercised via *2
    weighted = docs.withColumn(
        "w", F.least(F.col("n_chars") / 1000.0, F.lit(1.0)))
    kept = weighted_sample(weighted, "w", key="doc_id", seed=3)
    n, wsum = kept.count(), weighted.agg(F.sum("w")).first()[0]
    # E[kept] = sum of weights; allow 3-sigma-ish slack
    assert abs(n - wsum) < 4 * (wsum ** 0.5) + 5
    # deterministic under repartition
    again = weighted_sample(weighted.repartition(7), "w", key="doc_id",
                            seed=3)
    assert {r["doc_id"] for r in kept.collect()} \
        == {r["doc_id"] for r in again.collect()}
    # weight >= 1 keeps everything; <= 0 drops everything
    assert weighted_sample(
        weighted.withColumn("w", F.lit(5.0)), "w", "doc_id").count() \
        == docs.count()
    assert weighted_sample(
        weighted.withColumn("w", F.lit(-1.0)), "w", "doc_id").count() == 0


def test_series_map_small_and_large(bl):
    import pandas as pd
    df = bl.DataFrame({"k": ["a", "b", "c", "d"] * 5})
    small = df["k"].map({"a": "A", "b": "B"}).to_pandas()
    assert set(small[:4]) == {"A", "B", None}
    withdef = df["k"].map({"a": "A"}, default="other").to_pandas()
    assert set(withdef[:4]) == {"A", "other"}
    # large dict -> broadcast-join path, same semantics
    big = {f"k{i}": i for i in range(200)}
    df2 = bl.DataFrame({"k": [f"k{i}" for i in range(10)] + ["zz"]})
    out = df2["k"].map(big).to_pandas()
    assert list(out[:10]) == list(range(10))
    assert pd.isna(out.iloc[10])
