"""pandas_udf construction helpers.

Kept free of ``from __future__ import annotations`` on purpose: the
pandas_udf eval-type inference resolves the real ``pd.Series`` type
hints at definition time.
"""

import pandas as pd
from pyspark.sql import functions as F


def scalar_pandas_udf(func, ret_type):
    """Wrap ``func(pd.Series) -> array-like`` as an Arrow-vectorized
    scalar pandas UDF with the given Spark return type."""

    def _apply(s: pd.Series) -> pd.Series:
        out = func(s)
        return out if isinstance(out, pd.Series) else pd.Series(out)

    return F.pandas_udf(ret_type)(_apply)


def struct_pandas_udf(func, ret_type):
    """Wrap ``func(pd.Series) -> pd.DataFrame`` as an Arrow-vectorized
    pandas UDF returning a STRUCT column (one field per DataFrame
    column of the given Spark struct type)."""

    def _apply(s: pd.Series) -> pd.DataFrame:
        return func(s)

    return F.pandas_udf(ret_type)(_apply)
