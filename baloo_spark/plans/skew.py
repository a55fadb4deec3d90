"""Skew mitigation: salted two-stage aggregation and salted joins.

AQE's skew-join splitting (enabled in session.py) covers sort-merge
join skew automatically; these utilities cover the cases AQE does not:
a groupBy where one key holds a large share of all rows (the shuffle
sends every occurrence to one reducer), and broadcast-infeasible
joins against a skewed build side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# aggregations that decompose into (partial, merge) pairs
_MERGEABLE = {
    "sum": (F.sum, F.sum),
    "count": (lambda c: F.count(F.lit(1)), F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
    # the agg where groupBy skew actually bites: scalar aggs (sum/
    # count/...) are skew-IMMUNE in Spark — map-side partial agg
    # collapses a hot key to one row per map task before the shuffle.
    # collect_list partially aggregates too, but its STATE is the
    # list itself, so the hot key's reducer still receives every
    # element; salting divides that list across `salt` reducers and
    # the merge flattens the pieces (element order is layout-
    # dependent either way — same contract as unsalted collect_list)
    "collect_list": (F.collect_list,
                     lambda c: F.flatten(F.collect_list(c))),
}


def salted_groupby(df: DataFrame, keys, aggregations: dict,
                   salt: int = 16) -> DataFrame:
    """Two-stage aggregation: stage 1 groups on (keys, random salt)
    spreading each hot key over ``salt`` reducers; stage 2 merges the
    ``salt`` partials per key. Total work unchanged, max reducer load
    divided by ``salt``.

    Supports the decomposable aggs (sum/count/min/max/collect_list);
    mean is derived as sum/count. Non-decomposable aggs (var/std/
    median) need the unsalted path or sketches.

    When to reach for this: NOT for scalar aggs on a skewed key —
    Spark's map-side partial aggregation already collapses a hot key
    to one row per map task, so plain ``groupBy`` is skew-immune
    there (measured in SCALING.md). It matters when the aggregation
    state grows with the rows (collect_list/collect_set-style), where
    the hot key's reducer otherwise holds its full share of the data.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    salted = df.withColumn("__salt__",
                           (F.rand(seed=42) * salt).cast("int"))

    partial_exprs, final_exprs = [], []
    for c, aggs in aggregations.items():
        for a in ([aggs] if isinstance(aggs, str) else aggs):
            if a == "mean":
                partial_exprs += [F.sum(c).alias(f"__s_{c}"),
                                  F.count(F.lit(1)).alias(f"__n_{c}")]
                final_exprs += [
                    (F.sum(f"__s_{c}") / F.sum(f"__n_{c}"))
                    .alias(f"{c}_mean")]
                continue
            if a not in _MERGEABLE:
                raise ValueError(
                    f"{a} is not decomposable; use plain groupby or a sketch")
            p_fn, m_fn = _MERGEABLE[a]
            partial_exprs.append(p_fn(F.col(c)).alias(f"__p_{a}_{c}"))
            final_exprs.append(m_fn(F.col(f"__p_{a}_{c}")).alias(f"{c}_{a}"))

    partial = salted.groupBy(*keys, "__salt__").agg(*partial_exprs)
    return partial.groupBy(*keys).agg(*final_exprs)


def salted_join(left: DataFrame, right: DataFrame, on, salt: int = 8,
                how: str = "inner") -> DataFrame:
    """Equi-join with a skewed LEFT side: left rows get a random salt
    in [0, salt); the right side is replicated ``salt`` times (explode
    over the salt range) so every (key, salt) bucket can meet. Use
    when the hot keys sit in a table too large to broadcast and AQE's
    split is insufficient.

    Only 'inner' and 'left' are valid: with 'right'/'outer', every
    UNMATCHED right row would surface once per replica (``salt``
    duplicate rows).
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r}: "
            "replicated-right semantics would emit unmatched right "
            "rows once per salt replica")
    on = [on] if isinstance(on, str) else list(on)
    l = left.withColumn("__salt__", (F.rand(seed=42) * salt).cast("int"))
    r = right.withColumn(
        "__salt__", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
    return l.join(r, on + ["__salt__"], how).drop("__salt__")
