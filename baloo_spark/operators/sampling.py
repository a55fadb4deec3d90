"""Deterministic, engine-portable sampling and dataset splitting.

A 100 TB training-data pipeline needs *reproducible* samples and
train/validation/test splits: re-running the pipeline (or running it
on a different engine) must assign every row to the same bucket. The
reference has no sampling surface (grep-verified over
/root/reference/baloo); these are scale extensions in the spirit of
its deterministic, seed-free operators.

Mechanism: ``bucket = conv(substring(md5(key || ':' || seed), 1, 8),
16, 10) % n_buckets``. md5 is bit-identical in every engine (the
DuckDB oracle replays it as ``('0x' || substr(md5(...), 1, 8))::
BIGINT``), the 32-bit prefix is uniform, and the computation is a
narrow per-row map — no shuffle, no state, no RNG, trivially
parallel at any scale. Contrast ``df.sample(fraction, seed)``: Spark's
native Bernoulli sample is seed-stable only for an identical
partitioning, so a repartitioned rerun silently yields a different
sample; hash-bucketing is stable under any layout.

Skew note: bucketing is on the VALUE of ``key``, so a heavily
duplicated key lands all duplicates in one bucket — that is exactly
the leakage-avoidance property you want for splits (all rows of one
document/user stay on the same side), but it means per-split sizes
track the key distribution, not the row count, when keys repeat.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["hash_bucket", "hash_sample", "weighted_sample", "train_test_split",
           "stratified_sample", "mix_corpora", "temperature_weights"]

_BUCKETS = 1_000_000  # ppm resolution for fractions


def hash_bucket(key: Column | str, n_buckets: int = _BUCKETS,
                seed: int = 0) -> Column:
    """Deterministic uniform bucket in [0, n_buckets) from a key
    column. Same (key, seed) => same bucket on every run, every
    partitioning, and in the DuckDB oracle."""
    key = F.col(key) if isinstance(key, str) else key
    h = F.conv(F.substring(F.md5(F.concat_ws(":", key.cast("string"),
                                             F.lit(str(seed)))), 1, 8),
               16, 10).cast("long")
    return (h % F.lit(n_buckets)).alias("bucket")


def hash_sample(df: DataFrame, fraction: float, key: str,
                seed: int = 0) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by hash of ``key`` — a
    reproducible Bernoulli sample. Narrow map+filter: no shuffle, and
    Catalyst pushes any later column pruning through it."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    cut = int(round(fraction * _BUCKETS))
    return df.where(hash_bucket(key, _BUCKETS, seed) < cut)


def train_test_split(df: DataFrame, key: str, weights: dict | None = None,
                     seed: int = 0, split_col: str = "split") -> DataFrame:
    """Assign every row a split label ('train'/'test'/... per
    ``weights``, default 80/10/10 train/val/test) by hash of ``key``.

    All rows sharing a key land in the same split — group-aware
    splitting that prevents train/test leakage of duplicated
    documents. Returns ``df`` + the label column; filter per split
    downstream (each filter is a narrow scan predicate)."""
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    total = sum(weights.values())
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    b = hash_bucket(key, _BUCKETS, seed)
    expr = None
    edge = 0.0
    names = list(weights)
    for name in names[:-1]:
        edge += weights[name] / total
        cond = b < int(round(edge * _BUCKETS))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    return df.withColumn(split_col, last)


def stratified_sample(df: DataFrame, strata_col: str, fractions: dict,
                      key: str, seed: int = 0) -> DataFrame:
    """Per-stratum deterministic sampling (reproducible ``sampleBy``):
    ``fractions`` maps stratum value -> keep fraction; strata absent
    from the map are dropped. One narrow filter — the per-stratum cut
    is a CASE over ``strata_col``, so no shuffle and no driver-side
    row movement."""
    b = hash_bucket(key, _BUCKETS, seed)
    cut = None
    for val, frac in fractions.items():
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction for {val!r} must be in [0,1]")
        c = F.when(F.col(strata_col) == val, int(round(frac * _BUCKETS)))
        cut = c if cut is None else cut.when(
            F.col(strata_col) == val, int(round(frac * _BUCKETS)))
    cut = cut.otherwise(0) if cut is not None else F.lit(0)
    return df.where(b < cut)


def weighted_sample(df: DataFrame, weight, key: str,
                    seed: int = 0) -> DataFrame:
    """Deterministic per-row weighted Bernoulli sample: keep each row
    with probability = its ``weight`` column/expression (clamped to
    [0, 1]) — quality-weighted corpus downsampling, reproducible
    under any partitioning via the same md5 bucketing as
    :func:`hash_sample`. Narrow map+filter, no shuffle."""
    w = F.col(weight) if isinstance(weight, str) else weight
    cut = (F.least(F.greatest(w.cast("double"), F.lit(0.0)), F.lit(1.0))
           * _BUCKETS)
    return df.where(hash_bucket(key, _BUCKETS, seed) < cut)


def temperature_weights(sizes: dict, alpha: float = 0.3) -> dict:
    """mC4/mT5-style sampling weights for :func:`mix_corpora`:
    w_i proportional to n_i ** alpha. alpha = 1 reproduces natural
    (size-proportional) mixing; alpha -> 0 approaches uniform; the
    mT5 paper uses alpha = 0.3 to upweight low-resource corpora
    without letting tiny ones dominate. Pure metadata arithmetic —
    pass the result straight to mix_corpora(weights=...)."""
    if not sizes:
        raise ValueError("need at least one corpus size")
    if any(n < 0 for n in sizes.values()):
        raise ValueError("sizes must be non-negative")
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    raw = {n: (s ** alpha if s > 0 else 0.0) for n, s in sizes.items()}
    total = sum(raw.values())
    if total == 0:
        raise ValueError("all corpora are empty")
    return {n: w / total for n, w in raw.items()}


def mix_corpora(corpora: dict, weights: dict, key: str,
                total_rows: int | None = None, seed: int = 0,
                source_col: str = "corpus") -> DataFrame:
    """Deterministic weighted dataset mixture: sample each corpus so
    the union approximates the ``weights`` proportions, tagging rows
    with their corpus name.

    ``corpora`` maps name -> DataFrame (shared schema); ``weights``
    maps name -> target share (normalized). ``total_rows=None`` keeps
    the LARGEST mixture consistent with the weights given each corpus'
    size (the binding corpus is kept whole); an explicit budget
    downsamples everything proportionally. Oversubscribed corpora
    (target above their size) are kept whole rather than upsampled —
    repetition policy belongs to the training loader, not the sampler.

    Scale shape: one ``count()`` scalar agg per corpus (metadata-cheap
    on parquet), then a narrow hash filter per corpus and a union —
    no shuffle anywhere, reproducible under any partitioning via the
    same md5 bucketing as :func:`hash_sample`.
    """
    if set(corpora) != set(weights):
        raise ValueError("corpora and weights must have the same keys")
    if not corpora:
        raise ValueError("need at least one corpus")
    total_w = sum(weights.values())
    if total_w <= 0:
        raise ValueError("weights must sum to a positive value")
    shares = {n: w / total_w for n, w in weights.items()}
    sizes = {n: df.count() for n, df in corpora.items()}
    # largest feasible mixture size: min over corpora of size/share
    feasible = min(sizes[n] / shares[n] for n in corpora if shares[n] > 0)
    target = feasible if total_rows is None else min(total_rows, feasible)
    out = None
    for name in sorted(corpora):
        want = shares[name] * target
        frac = min(want / sizes[name], 1.0) if sizes[name] else 0.0
        piece = (hash_sample(corpora[name], frac, key, seed)
                 .withColumn(source_col, F.lit(name)))
        out = piece if out is None else out.unionByName(piece)
    return out
