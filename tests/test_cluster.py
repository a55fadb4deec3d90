"""Distributed Lloyd's k-means (operators/cluster.py) and
temperature-based mixture weights (operators/sampling.py).

Engine extensions (no reference analogue): cluster recovery on
well-separated synthetic blobs, convergence, layout independence,
empty-cluster retention, and the mT5 alpha-weighting arithmetic.
"""

import pytest

from baloo_spark.operators.cluster import assign_clusters, kmeans
from baloo_spark.operators.sampling import temperature_weights


def _blobs(spark, per=40, dim=4):
    """Three well-separated blobs: deterministic jitter, centers far
    apart relative to spread so the true partition is unambiguous."""
    centers = [[0.0] * dim, [10.0] * dim, [-10.0] * dim]
    rows = []
    vid = 0
    for ci, c in enumerate(centers):
        for i in range(per):
            jit = [((vid * 7 + j * 13) % 11 - 5) / 10.0
                   for j in range(dim)]
            rows.append((vid, [c[j] + jit[j] for j in range(dim)], ci))
            vid += 1
    return spark.createDataFrame(
        rows, "vec_id LONG, embedding ARRAY<DOUBLE>, truth INT")


@pytest.fixture(scope="module")
def blobs(spark):
    return _blobs(spark)


def test_kmeans_recovers_blobs(blobs):
    out, cents, n_iters = kmeans(blobs, n_clusters=3, max_iters=10)
    assert len(cents) == 3 and n_iters >= 1
    rows = out.select("truth", "cluster").collect()
    # cluster labels are arbitrary — check the partition matches via
    # a consistent truth->cluster bijection
    mapping = {}
    for r in rows:
        mapping.setdefault(r["truth"], r["cluster"])
        assert mapping[r["truth"]] == r["cluster"]
    assert len(set(mapping.values())) == 3


def test_kmeans_converges_under_tol(blobs):
    _, cents1, it1 = kmeans(blobs, n_clusters=3, max_iters=50, tol=1e-9)
    assert it1 < 50  # well-separated blobs converge in a few rounds
    # converged centroids ~= per-blob means
    rows = blobs.collect()
    for c in cents1:
        close = [r for r in rows
                 if abs(r["embedding"][0] - c[0]) < 2.0]
        assert close  # every centroid sits on a blob


def test_kmeans_layout_independent(blobs):
    out1, cents1, _ = kmeans(blobs, n_clusters=3)
    out2, cents2, _ = kmeans(blobs.repartition(7), n_clusters=3)
    a = sorted((r["vec_id"], r["cluster"]) for r in out1.collect())
    b = sorted((r["vec_id"], r["cluster"]) for r in out2.collect())
    assert a == b
    for c1, c2 in zip(cents1, cents2):
        assert c1 == pytest.approx(c2, abs=1e-9)


def test_assign_clusters_is_pure_projection(blobs):
    import io
    from contextlib import redirect_stdout
    tagged = assign_clusters(blobs, [[0.0] * 4, [10.0] * 4])
    buf = io.StringIO()
    with redirect_stdout(buf):
        tagged.explain("formatted")
    plan = buf.getvalue()
    assert "Join" not in plan
    assert "hashpartitioning" not in plan
    got = {r["vec_id"]: r["cluster"] for r in tagged.collect()}
    assert got[0] == 0 and got[40] == 1   # blob membership
    # ties resolve to the lowest cluster id
    spark = blobs.sparkSession
    tie = spark.createDataFrame([(0, [5.0, 5.0, 5.0, 5.0])],
                                "vec_id LONG, embedding ARRAY<DOUBLE>")
    r = assign_clusters(tie, [[0.0] * 4, [10.0] * 4]).first()
    assert r["cluster"] == 0


def test_kmeans_validates_inputs(spark, blobs):
    with pytest.raises(ValueError, match="n_clusters"):
        kmeans(blobs, n_clusters=0)
    dup = spark.createDataFrame(
        [(i, [1.0, 1.0]) for i in range(5)],
        "vec_id LONG, embedding ARRAY<DOUBLE>")
    with pytest.raises(ValueError, match="distinct"):
        kmeans(dup, n_clusters=3)


def test_temperature_weights():
    sizes = {"en": 1_000_000, "fr": 10_000, "yo": 100}
    natural = temperature_weights(sizes, alpha=1.0)
    assert natural["en"] == pytest.approx(1_000_000 / 1_010_100)
    flat = temperature_weights(sizes, alpha=0.0)
    assert flat["en"] == pytest.approx(1 / 3) == pytest.approx(flat["yo"])
    mt5 = temperature_weights(sizes, alpha=0.3)
    # upweights the tail relative to natural, keeps the head first
    assert mt5["yo"] > natural["yo"]
    assert mt5["en"] > mt5["fr"] > mt5["yo"]
    assert sum(mt5.values()) == pytest.approx(1.0)
    with pytest.raises(ValueError):
        temperature_weights({})
    with pytest.raises(ValueError):
        temperature_weights(sizes, alpha=-1)


def test_assign_udf_face_matches_literal(spark, blobs, monkeypatch):
    """Past the literal budget the centroid matrix ships in a pandas-
    UDF closure — assignments must match the expression face."""
    import baloo_spark.operators.cluster as cl
    cents = [[0.0] * 4, [10.0] * 4, [-10.0] * 4]
    lit = {r["vec_id"]: r["cluster"]
           for r in assign_clusters(blobs, cents).collect()}
    monkeypatch.setattr(cl, "MAX_LITERAL_VALUES", 1)
    udf = {r["vec_id"]: r["cluster"]
           for r in cl.assign_clusters(blobs, cents).collect()}
    assert lit == udf


def test_kmeans_large_k_plans_and_runs(spark):
    """k=1024, dim=256 — the regime where the literal face's ~5 MB
    expression string dies in parse/codegen; the UDF face must plan
    and run."""
    import numpy as np
    rng = np.random.default_rng(7)
    n, dim, k = 2048, 256, 1024
    mat = rng.standard_normal((n, dim))
    df = spark.createDataFrame(
        [(i, [float(x) for x in mat[i]]) for i in range(n)],
        "vec_id LONG, embedding ARRAY<DOUBLE>")
    out, cents, n_iters = kmeans(df, n_clusters=k, max_iters=1)
    assert n_iters == 1
    assert len(cents) == k and len(cents[0]) == dim
    rows = out.select("cluster").collect()
    assert len(rows) == n
    assert all(r["cluster"] is not None and 0 <= r["cluster"] < k
               for r in rows)


def test_kmeans_raises_on_nonfinite(spark):
    with pytest.raises(ValueError, match="non-finite"):
        kmeans(spark.createDataFrame(
            [(0, [1.0, 2.0]), (1, [float("nan"), 0.0]),
             (2, [3.0, 4.0])],
            "vec_id LONG, embedding ARRAY<DOUBLE>"), n_clusters=3)


def test_assign_null_component_yields_null_cluster(spark, monkeypatch):
    """A vector with a NULL component is unassignable: both faces must
    emit NULL, never a spurious cluster id."""
    import baloo_spark.operators.cluster as cl
    df = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [1.0, None])],
        "vec_id LONG, embedding ARRAY<DOUBLE>")
    cents = [[0.0, 0.0], [5.0, 5.0]]
    lit = {r["vec_id"]: r["cluster"]
           for r in cl.assign_clusters(df, cents).collect()}
    assert lit[0] == 0 and lit[1] is None
    monkeypatch.setattr(cl, "MAX_LITERAL_VALUES", 1)
    udf = {r["vec_id"]: r["cluster"]
           for r in cl.assign_clusters(df, cents).collect()}
    assert udf == lit


def test_assign_null_and_ragged_vector_both_faces(spark, monkeypatch):
    """ADVICE r4: a NULL (or wrong-dimension) vector crashed the UDF
    face's np.stack while the literal face returned NULL — the two
    faces claim one contract, so both must emit NULL."""
    import baloo_spark.operators.cluster as cl
    df = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, None), (2, [1.0]), (3, [1.0, 2.0, 3.0]),
         (4, [4.0, 5.0])],
        "vec_id LONG, embedding ARRAY<DOUBLE>")
    cents = [[0.0, 0.0], [5.0, 5.0]]
    lit = {r["vec_id"]: r["cluster"]
           for r in cl.assign_clusters(df, cents).collect()}
    assert lit == {0: 0, 1: None, 2: None, 3: None, 4: 1}
    monkeypatch.setattr(cl, "MAX_LITERAL_VALUES", 1)
    udf = {r["vec_id"]: r["cluster"]
           for r in cl.assign_clusters(df, cents).collect()}
    assert udf == lit


def test_ivf_topk_raises_on_nonfinite_centroids(spark):
    """ADVICE r4: a NaN centroid component must fail loudly before the
    literal renders 'nanD' into unparseable SQL (or silently poisons
    every cosine in the join face)."""
    from baloo_spark.operators.similarity import ivf_topk
    corpus = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(8)],
        "vec_id LONG, embedding ARRAY<DOUBLE>")
    queries = spark.createDataFrame(
        [(100, [1.0, 1.0])], "vec_id LONG, embedding ARRAY<DOUBLE>")
    bad = spark.createDataFrame(
        [(0, [float("nan"), 1.0]), (1, [2.0, 2.0])],
        "cent_id INT, cent ARRAY<DOUBLE>")
    with pytest.raises(ValueError, match="non-finite"):
        ivf_topk(queries, corpus, k=2, centroids=bad)


def test_assign_clusters_face_param(spark):
    """face='udf' / 'literal' force the two faces explicitly; both
    match; unknown face raises."""
    import baloo_spark.operators.cluster as cl
    df = spark.createDataFrame(
        [(i, [float(i), float(i % 3)]) for i in range(20)],
        "vec_id LONG, embedding ARRAY<DOUBLE>")
    cents = [[0.0, 0.0], [10.0, 1.0], [19.0, 2.0]]
    lit = {r["vec_id"]: r["cluster"]
           for r in cl.assign_clusters(df, cents, face="literal").collect()}
    udf = {r["vec_id"]: r["cluster"]
           for r in cl.assign_clusters(df, cents, face="udf").collect()}
    assert lit == udf and set(lit.values()) == {0, 1, 2}
    with pytest.raises(ValueError, match="face"):
        cl.assign_clusters(df, cents, face="nope")


def test_semantic_dedup_example(spark):
    """The embedding-side pipeline example runs end-to-end at sf0.001
    and its stage outputs are mutually consistent."""
    import sys
    sys.path.insert(0, "examples")
    from semantic_dedup import run
    out = run(spark, "/root/testdata/sf0.001")
    assert out["vectors_in"] == 500
    assert sum(out["cluster_sizes"].values()) == 500
    assert 0 < out["survivors"] <= out["vectors_in"]
    assert out["topk_rows"] == 15          # 5 probes x k=3
