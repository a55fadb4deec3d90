"""r11 adopt fast path: a row-preserving window/shift op output
assigned back to its source frame is adopted by plain projection
(zero eager Spark jobs), and everything that does NOT qualify still
takes the general positional-join path with identical values."""

import numpy as np
import pandas as pd


def _mkframe(bl, n=12):
    return bl.DataFrame(
        {
            "k": np.array([i % 3 for i in range(n)], dtype=np.int64),
            "v": np.array([float(i * i % 7) for i in range(n)]),
        },
        index=np.arange(n, dtype=np.int64),
    )


def _pd(n=12):
    return pd.DataFrame(
        {
            "k": [i % 3 for i in range(n)],
            "v": [float(i * i % 7) for i in range(n)],
        },
        index=np.arange(n, dtype=np.int64),
    )


def _njobs(spark):
    ids = spark.sparkContext.statusTracker().getJobIdsForGroup(None) or []
    return max(ids) + 1 if ids else 0


def test_adopt_assignment_runs_zero_jobs(bl, spark):
    """The whole point: assignment of a tagged op output is lazy."""
    df = _mkframe(bl)
    s = df["v"].shift(1)          # tagged: row-preserving, all cols kept
    assert s._rowpar_src is df._sdf
    before = _njobs(spark)
    df["prev"] = s
    assert _njobs(spark) == before, "adopt path must not launch jobs"
    # and the values are pandas-exact
    exp = _pd()
    exp["prev"] = exp["v"].shift(1)
    pd.testing.assert_frame_equal(
        df.to_pandas(), exp, check_dtype=False, check_names=False)


def test_adopt_chain_matches_pandas(bl):
    """Chained per-op re-selection (the __spark_entry__ pattern):
    every assignment adopts the CURRENT frame's derivation."""
    df = _mkframe(bl)
    df["d"] = df["v"].diff()
    df["c"] = df["v"].cumsum()
    df["r"] = df["v"].rolling(3).mean()
    df["e"] = df["v"].expanding(1).sum() * 2.0   # _with_col keeps the tag
    df["w"] = df["v"].ewm(alpha=0.5).mean()
    exp = _pd()
    exp["d"] = exp["v"].diff()
    exp["c"] = exp["v"].cumsum()
    exp["r"] = exp["v"].rolling(3).mean()
    exp["e"] = exp["v"].expanding(1).sum() * 2.0
    exp["w"] = exp["v"].ewm(alpha=0.5).mean()
    pd.testing.assert_frame_equal(
        df.to_pandas(), exp, check_dtype=False, check_names=False)


def test_stale_tag_falls_back_to_general_path(bl):
    """A Series captured BEFORE the frame mutates must not be adopted
    (its tag points at the old plan) — and must still align right."""
    df = _mkframe(bl)
    s = df["v"].shift(1)
    df["x"] = df["v"] * 0 + 1.0   # mutate: df._sdf is now a new plan
    assert s._rowpar_src is not df._sdf
    df["prev"] = s                # general positional path
    exp = _pd()
    exp["x"] = 1.0
    exp["prev"] = exp["v"].shift(1)
    pd.testing.assert_frame_equal(
        df.to_pandas(), exp, check_dtype=False, check_names=False)


def test_foreign_frame_never_adopted(bl):
    """Same shape, different frame: values align by index join, not
    by the adopt projection."""
    df = _mkframe(bl)
    other = _mkframe(bl)
    s = other["v"].diff()
    assert s._rowpar_src is not df._sdf
    df["d"] = s
    exp = _pd()
    exp["d"] = exp["v"].diff()
    pd.testing.assert_frame_equal(
        df.to_pandas(), exp, check_dtype=False, check_names=False)


def test_lineage_holds_strong_refs(bl):
    """Regression pin for the id-recycling bug: every plan a frame has
    owned stays alive in _lineage, so a dead plan's id() can never be
    recycled into a false same-plan match."""
    df = _mkframe(bl)
    owned = [df._sdf]
    for i in range(4):
        df[f"c{i}"] = df["v"].shift(i + 1)
        owned.append(df._sdf)
    assert set(df._lineage.keys()) == {id(x) for x in owned}
    assert all(df._lineage[id(x)] is x for x in owned)


def test_overwriting_value_column_still_correct(bl):
    """Overwrite the op's OWN source column: the projection replaces
    it in place and later ops see the new values."""
    df = _mkframe(bl)
    df["v"] = df["v"].cumsum()
    df["d"] = df["v"].diff()
    exp = _pd()
    exp["v"] = exp["v"].cumsum()
    exp["d"] = exp["v"].diff()
    pd.testing.assert_frame_equal(
        df.to_pandas(), exp, check_dtype=False, check_names=False)


def test_r12_newly_tagged_faces_adopt_zero_jobs(bl, spark):
    """r12 extended the tag to the faces r11 missed — ewm var/std
    (both adjust flavors) and the budgeted expanding order stats —
    each of which previously paid the ~8-job positional join on
    every assignment."""
    df = _mkframe(bl).sort_values("k")
    cases = [
        ("ev", lambda s: s.ewm(alpha=0.5).var()),
        ("es", lambda s: s.ewm(alpha=0.5).std()),
        ("evr", lambda s: s.ewm(alpha=0.5, adjust=False).var()),
        ("em", lambda s: s.expanding(1).median()),
    ]
    for name, op in cases:
        s = op(df["v"])
        assert s._rowpar_src is df._sdf, f"{name} face lost the tag"
        before = _njobs(spark)
        df[name] = s
        assert _njobs(spark) == before, \
            f"{name} assignment must adopt (zero jobs)"
    got = df.to_pandas().sort_values("k", kind="stable")
    exp = _pd().sort_values("k", kind="stable")
    exp["ev"] = exp["v"].ewm(alpha=0.5).var()
    exp["es"] = exp["v"].ewm(alpha=0.5).std()
    exp["evr"] = exp["v"].ewm(alpha=0.5, adjust=False).var()
    exp["em"] = exp["v"].expanding(1).median()
    for c in ("ev", "es", "evr", "em"):
        np.testing.assert_allclose(
            got[c].to_numpy(dtype=float), exp[c].to_numpy(dtype=float),
            rtol=1e-9, atol=1e-12, equal_nan=True, err_msg=c)


def test_r12_fused_rolling_single_layout(bl, spark, monkeypatch):
    """rolling sum/count/mean build their prefixes AND the window-ago
    twins from ONE fused range layout (with_prefix_aggs_shifted) —
    the old composition paid a second repartitionByRange + checkpoint
    + collect. Pins the single-layout property and pandas parity
    across partition boundaries (nulls included)."""
    from baloo_spark.plans import ordinal

    real = ordinal._range_layout
    calls = {"n": 0}

    def counting(sdf, order_by):
        calls["n"] += 1
        return real(sdf, order_by)

    n = 57
    vals = np.array([float(i * 3 % 11) for i in range(n)])
    vals[::7] = np.nan
    df = bl.DataFrame(
        {"k": np.arange(n, dtype=np.int64), "v": vals},
        index=np.arange(n, dtype=np.int64)).sort_values("k")
    monkeypatch.setattr(ordinal, "_range_layout", counting)
    try:
        s = df["v"].rolling(5, min_periods=2).mean()
        df["r"] = s
    finally:
        monkeypatch.setattr(ordinal, "_range_layout", real)
    assert calls["n"] == 1, \
        f"fused rolling built {calls['n']} layouts, expected 1"
    got = df.to_pandas()["r"].to_numpy(dtype=float)
    exp = pd.Series(vals).rolling(5, min_periods=2).mean().to_numpy()
    np.testing.assert_allclose(got, exp, rtol=1e-12, equal_nan=True)
