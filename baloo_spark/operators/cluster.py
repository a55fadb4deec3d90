"""Distributed k-means clustering over embedding columns.

Complements operators/similarity.train_centroids (which Lloyd-iterates
driver-side on a BOUNDED sample — the right trade for IVF cell
training): this module runs full Lloyd's iterations over the ENTIRE
corpus for workloads where the clustering itself is the product —
semantic bucketing for data curation, topic-balanced sampling,
cluster-level dedup triage.

Scale design per iteration (the classic scalable k-means shape):

- centroids are k x dim doubles — shipped to executors either as a
  LITERAL expression (small k x dim: no join, no shuffle, pure
  codegen) or as an Arrow pandas-UDF closure (large k x dim: a
  ~100 MB expression string would kill the parser/codegen long before
  the data does, while a broadcast numpy matrix plus one gemm per
  Arrow batch is exactly what BLAS is for);
- assignment is an argmin over squared distances — no shuffle either
  way;
- the update is ONE map-side-combined hash aggregation: per-cluster
  per-dimension means via dim avg() columns;
- the driver sees only k x dim numbers per iteration (the new
  centroids), never data rows.

So each iteration costs one scan + one k-row-output shuffle, and the
driver state is O(k * dim) regardless of corpus size.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.layout import spread

__all__ = ["kmeans", "assign_clusters"]

# k x dim budget for the literal-expression face: past this the
# centroid array is shipped via a pandas-UDF closure instead (the
# "model as artifact" pattern, same as lm.perplexity_broadcast)
MAX_LITERAL_VALUES = 16384


def _check_finite(cents: list[list[float]]) -> None:
    """Non-finite centroid components (NaN/inf from degenerate input)
    would repr() into SQL that fails to parse ('infD') — or silently
    poison every distance. Fail loudly with the coordinates."""
    for i, c in enumerate(cents):
        if c is None:
            raise ValueError(f"centroid {i} is NULL — the centroid "
                             f"table has a null vector row")
        for j, x in enumerate(c):
            if x is None or not math.isfinite(x):
                raise ValueError(
                    f"non-finite centroid component: cluster {i} "
                    f"dim {j} = {x!r} — the input column has NaN/inf "
                    f"values; clean them upstream (fillna/clip)")


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


def _assign_udf(cents: list[list[float]], vec_col: str):
    """Large-k face: the centroid matrix rides in an Arrow pandas-UDF
    closure; each batch is one (batch x dim) distance computation in
    numpy with argmin ties to the lowest cluster id (np.argmin picks
    the first minimum). Same contract as :func:`_assign_expr`; used
    when k x dim exceeds ``MAX_LITERAL_VALUES`` — a literal that size
    dies in parsing/codegen, a few-MB closure matrix does not."""
    import numpy as np

    from ..functions._udf import scalar_pandas_udf

    C = np.asarray(cents, dtype=np.float64)          # k x dim
    c_sq = (C * C).sum(axis=1)                       # k

    def assign(vecs):
        import pandas as pd
        n = len(vecs)
        if n == 0:
            return pd.Series([], dtype="Int32")
        # NULL or ragged (wrong-dimension) vectors cannot ride through
        # np.stack (a None becomes a 0-d array and stack raises,
        # failing the whole task) — slot them as all-NaN rows so they
        # fall into the same unassignable -> NULL path the literal
        # face takes for them (zip_with null padding => null distance)
        dim = C.shape[1]
        X = np.full((n, dim), np.nan, dtype=np.float64)
        for i, v in enumerate(vecs):
            if v is None:
                continue
            a = np.asarray(v, dtype=np.float64)
            if a.ndim == 1 and a.shape[0] == dim:
                X[i] = a
        # ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2; ||x||^2 is constant
        # per row so argmin needs only the last two terms
        d = c_sq[None, :] - 2.0 * (np.nan_to_num(X) @ C.T)  # batch x k
        out = pd.Series(np.argmin(d, axis=1), dtype="Int32")
        # rows with NULL/NaN components are unassignable -> NULL,
        # matching the literal face (null distances, null argmin)
        bad = ~np.isfinite(X).all(axis=1)
        if bad.any():
            out[bad] = pd.NA
        return out

    return scalar_pandas_udf(assign, "int")(F.col(vec_col))


def _assign_col(cents: list[list[float]], vec_col: str,
                face: str = "auto"):
    _check_finite(cents)
    if face == "literal":
        return _assign_expr(cents, vec_col)
    if face == "udf":
        return _assign_udf(cents, vec_col)
    if face != "auto":
        raise ValueError(f"face must be 'auto', 'literal' or 'udf', "
                         f"got {face!r}")
    n_vals = len(cents) * (len(cents[0]) if cents else 0)
    if n_vals <= MAX_LITERAL_VALUES:
        return _assign_expr(cents, vec_col)
    return _assign_udf(cents, vec_col)


def assign_clusters(df: DataFrame, centroids: list[list[float]],
                    vec_col: str = "embedding",
                    out_col: str = "cluster",
                    face: str = "auto") -> DataFrame:
    """Tag each row with its nearest centroid (squared-euclidean
    argmin, ties to the lowest cluster id). Pure projection — no
    shuffle, safe on streams. ``face='auto'`` (default): small k x
    dim inlines the centroids as a codegen'd literal; past
    ``MAX_LITERAL_VALUES`` the centroid matrix ships in an Arrow
    pandas-UDF closure instead. ``face='literal'`` / ``'udf'`` force
    one path — the two share a contract (argmin ties to the lowest
    id, NULL for NULL/ragged/non-finite vectors), so forcing 'udf'
    at small k is how tests and driver slots pin the 100 TB
    (large-k) path against the same oracle as the literal one."""
    return df.withColumn(out_col, _assign_col(centroids, vec_col, face))


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
    Empty clusters keep their previous centroid, as does any
    per-dimension mean that comes back NULL (a cluster whose members
    are all-null in that dimension). Float caveat: the per-cluster
    means sum doubles in partition order, so centroids can differ in
    final ulps across layouts; with tol >> ulp the iteration count and
    (for non-degenerate data) the assignment are stable.
    """
    if n_clusters <= 0:
        raise ValueError(f"n_clusters must be positive, got {n_clusters}")
    base = spread(df).select(F.col(id_col),
                             F.col(vec_col).cast("array<double>")
                             .alias("__v__"))
    init_rows = (base.orderBy(F.xxhash64(F.col(id_col)).asc())
                 .limit(max(sample_size, n_clusters))
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
    _check_finite(cents)

    n_iters = 0
    for _ in range(max_iters):
        assigned = base.withColumn("__c__",
                                   _assign_col(cents, "__v__"))
        stats = (assigned.groupBy("__c__")
                 .agg(*[F.avg(F.element_at("__v__", j + 1)).alias(f"m{j}")
                        for j in range(dim)])
                 .collect())
        new_cents = [list(c) for c in cents]       # empty cells keep theirs
        for row in stats:
            if row["__c__"] is None:
                # NULL-component vectors are unassignable (null
                # distances) — they must not crash the update
                continue
            # a NULL mean (all members null in dim j) keeps the
            # previous component — None would crash the shift compare
            # and poison the next assignment
            new_cents[row["__c__"]] = [
                row[f"m{j}"] if row[f"m{j}"] is not None
                else cents[row["__c__"]][j]
                for j in range(dim)]
        _check_finite(new_cents)
        shift = max(
            max(abs(a - b) for a, b in zip(nc, oc))
            for nc, oc in zip(new_cents, cents))
        cents = new_cents
        n_iters += 1
        if shift <= tol:
            break

    out = df.withColumn("cluster", _assign_col(cents, vec_col))
    return out, cents, n_iters
