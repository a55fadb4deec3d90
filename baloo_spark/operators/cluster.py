"""Distributed k-means clustering over embedding columns.

Complements operators/similarity.train_centroids (which Lloyd-iterates
driver-side on a BOUNDED sample — the right trade for IVF cell
training): this module runs full Lloyd's iterations over the ENTIRE
corpus for workloads where the clustering itself is the product —
semantic bucketing for data curation, topic-balanced sampling,
cluster-level dedup triage.

Scale design per iteration (the classic scalable k-means shape):

- centroids are k x dim doubles — broadcast as a LITERAL expression
  into the assignment projection (no join, no shuffle on the corpus);
- assignment is an argmin over squared distances computed by array
  expressions (JVM-side, codegen);
- the update is ONE map-side-combined hash aggregation: per-cluster
  per-dimension means via dim avg() columns;
- the driver sees only k x dim numbers per iteration (the new
  centroids), never data rows.

So each iteration costs one scan + one k-row-output shuffle, and the
driver state is O(k * dim) regardless of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.layout import spread

__all__ = ["kmeans", "assign_clusters"]


def _cents_literal(cents: list[list[float]]) -> str:
    return "array(" + ",".join(
        "array(" + ",".join(f"{x!r}D" for x in c) + ")" for c in cents
    ) + ")"


def _assign_expr(cents: list[list[float]], vec_col: str):
    """argmin_c ||v - c||^2 as a pure array expression; ties resolve
    to the LOWEST cluster id (array_position finds the first min)."""
    lit = _cents_literal(cents)
    dists = (f"transform({lit}, c -> aggregate(zip_with(c, {vec_col}, "
             f"(a, b) -> (a - CAST(b AS DOUBLE)) * "
             f"(a - CAST(b AS DOUBLE))), 0D, (acc, x) -> acc + x))")
    return (F.expr(f"array_position({dists}, array_min({dists}))")
            .cast("int") - F.lit(1))


def assign_clusters(df: DataFrame, centroids: list[list[float]],
                    vec_col: str = "embedding",
                    out_col: str = "cluster") -> DataFrame:
    """Tag each row with its nearest centroid (squared-euclidean
    argmin, ties to the lowest cluster id). Pure projection — no
    shuffle, safe on streams."""
    return df.withColumn(out_col, _assign_expr(centroids, vec_col))


def kmeans(df: DataFrame, n_clusters: int = 8,
           vec_col: str = "embedding", id_col: str = "vec_id",
           max_iters: int = 20, tol: float = 1e-6,
           sample_size: int = 4096):
    """Full-corpus Lloyd's k-means.

    Returns ``(assignments, centroids, n_iters)``: ``assignments`` is
    ``df`` plus a ``cluster`` column (lazy — one more scan when
    consumed), ``centroids`` the final k x dim list, ``n_iters`` how
    many update rounds ran before the max centroid movement fell
    under ``tol`` (or ``max_iters`` hit).

    Init is deterministic: the hash-ordered bounded sample's first
    ``n_clusters`` distinct vectors (same scheme as
    similarity.train_centroids — no RNG state, layout-independent).
    Empty clusters keep their previous centroid. Float caveat: the
    per-cluster means sum doubles in partition order, so centroids can
    differ in final ulps across layouts; with tol >> ulp the iteration
    count and (for non-degenerate data) the assignment are stable.
    """
    if n_clusters <= 0:
        raise ValueError(f"n_clusters must be positive, got {n_clusters}")
    base = spread(df).select(F.col(id_col),
                             F.col(vec_col).cast("array<double>")
                             .alias("__v__"))
    init_rows = (base.orderBy(F.xxhash64(F.col(id_col)).asc())
                 .limit(sample_size)
                 .select(F.col("__v__")).collect())
    if not init_rows:
        raise ValueError("empty corpus")
    cents: list[list[float]] = []
    seen = set()
    for r in init_rows:
        v = tuple(r["__v__"])
        if v not in seen:
            seen.add(v)
            cents.append(list(v))
        if len(cents) == n_clusters:
            break
    if len(cents) < n_clusters:
        raise ValueError(
            f"only {len(cents)} distinct vectors in the init sample; "
            f"lower n_clusters or raise sample_size")
    dim = len(cents[0])

    n_iters = 0
    for _ in range(max_iters):
        assigned = base.withColumn("__c__",
                                   _assign_expr(cents, "__v__"))
        stats = (assigned.groupBy("__c__")
                 .agg(*[F.avg(F.element_at("__v__", j + 1)).alias(f"m{j}")
                        for j in range(dim)])
                 .collect())
        new_cents = [list(c) for c in cents]       # empty cells keep theirs
        for row in stats:
            new_cents[row["__c__"]] = [row[f"m{j}"] for j in range(dim)]
        shift = max(
            max(abs(a - b) for a, b in zip(nc, oc))
            for nc, oc in zip(new_cents, cents))
        cents = new_cents
        n_iters += 1
        if shift <= tol:
            break

    out = df.withColumn("cluster", _assign_expr(cents, vec_col))
    return out, cents, n_iters
