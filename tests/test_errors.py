"""Error-parity with the reference's check_type/check_dtype surface
(/root/reference/baloo/core/utils.py:6-37,138-143): malformed
constructor arguments raise TypeError with the reference's message
shapes, and unsupported dtypes are rejected up front instead of
failing deep inside Spark marshalling."""

import numpy as np
import pytest


def test_series_bad_dtype_arg(bl):
    with pytest.raises(TypeError, match="Expected a valid NumPy dtype"):
        bl.Series(np.arange(3), dtype="not-a-dtype")


def test_series_bool_dtype_allowed(bl):
    # reference check_dtype: silently allow and convert bool
    sr = bl.Series(np.array([0, 1, 1]), dtype=bool)
    assert sr.to_pandas().tolist() == [False, True, True]


def test_series_bad_name_type(bl):
    with pytest.raises(TypeError, match="Expected:"):
        bl.Series(np.arange(3), name=123)


def test_series_unsupported_dtype(bl):
    with pytest.raises(TypeError, match="is not supported"):
        bl.Series(np.array([1 + 2j, 3 + 4j]))
    with pytest.raises(TypeError, match="is not supported"):
        bl.Series(np.array([1, 2], dtype="timedelta64[s]"))


def test_frame_bad_data_type(bl):
    with pytest.raises(TypeError, match="Expected:"):
        bl.DataFrame([1, 2, 3])


def test_frame_unsupported_column_dtype(bl):
    with pytest.raises(TypeError, match="is not supported"):
        bl.DataFrame({"a": np.array([1 + 2j, 3 + 4j])})


def test_select_missing_column_keyerror(bl):
    df = bl.DataFrame({"a": [1, 2]})
    with pytest.raises(KeyError):
        df["nope"]
    with pytest.raises(KeyError):
        df.drop("nope")
