"""Shared fixtures, mirroring the reference's tests/conftest.py:13-121
(tiny deterministic frames: f32/i64/str columns, join pair, duplicate
rows, unsorted series)."""

import os

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "8")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def spark():
    from baloo_spark.session import get_session
    return get_session("baloo_spark_tests")


@pytest.fixture(scope="session")
def bl(spark):
    import baloo_spark
    return baloo_spark


@pytest.fixture
def df_small(bl):
    # mirrors reference df_small (conftest.py:74-75)
    return bl.DataFrame(
        {
            "a": np.array([1, 2, 3, 4, 5], dtype=np.float32),
            "b": np.array([1, 2, 3, 4, 5], dtype=np.int64),
            "c": np.array(["a", "Abc", "goosfraba", "   dC  ", "secrETariat"]),
        },
        index=np.arange(5, dtype=np.int64),
    )


@pytest.fixture
def df1(bl):
    # join pair left (conftest.py:93-103)
    return bl.DataFrame(
        {
            "a": np.arange(5, dtype=np.int64),
            "b": np.array([1, 2, 3, 4, 5], dtype=np.float32),
        },
        index=np.arange(2, 7, dtype=np.int64),
    )


@pytest.fixture
def df2(bl):
    return bl.DataFrame(
        {
            "a": np.array([1, 3, 5], dtype=np.int64),
            "b": np.array([3, 4, 5], dtype=np.float32),
            "c": np.array([4, 5, 6], dtype=np.int64),
        }
    )


@pytest.fixture
def df_dupl(bl):
    # duplicate-rows frame (conftest.py:106-111)
    return bl.DataFrame(
        {
            "a": np.array([0, 1, 1, 2, 3], dtype=np.float32),
            "b": np.array([4, 5, 5, 6, 6], dtype=np.int64),
            "c": np.array([1, 2, 3, 4, 5], dtype=np.int64),
        }
    )


def sorted_records(df):
    """Order-insensitive comparison helper (reference sorts hash-order
    results before comparing, tests/core/test_series.py:15-17)."""
    pdf = df.to_pandas() if hasattr(df, "to_pandas") else df
    recs = pdf.reset_index().to_dict("records") if pdf.index.name or \
        isinstance(pdf.index, __import__("pandas").MultiIndex) else \
        pdf.to_dict("records")
    return sorted(recs, key=lambda r: tuple(str(v) for v in r.values()))
