"""Scalar math functions + UDF helpers.

Reference: ``baloo/functions/unary.py:4-83`` — exp log sqrt sin cos
tan asin acos atan sinh cosh tanh erf, each a Weld ``map(arr, |e|
op(e))`` over f32/f64. Here each is the matching built-in
``pyspark.sql.functions`` call — JVM-side, whole-stage codegen, no
Python in the loop. ``raw()`` mirrors the reference's eager-NumPy
decorator (``functions/utils.py:23-60``) as an Arrow pandas_udf.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from ..core.series import Series


def _unary(sql_fn, name):
    def fn(sr: Series) -> Series:
        if not isinstance(sr, Series):
            raise TypeError("expected a baloo_spark Series")
        return sr._with_col(sql_fn(sr._colexpr.cast("double")))
    fn.__name__ = name
    fn._baloo_column_fn = True  # recognized by Series.apply mode 1
    return fn


exp = _unary(F.exp, "exp")
log = _unary(F.log, "log")
sqrt = _unary(F.sqrt, "sqrt")
sin = _unary(F.sin, "sin")
cos = _unary(F.cos, "cos")
tan = _unary(F.tan, "tan")
asin = _unary(F.asin, "asin")
acos = _unary(F.acos, "acos")
atan = _unary(F.atan, "atan")
sinh = _unary(F.sinh, "sinh")
cosh = _unary(F.cosh, "cosh")
tanh = _unary(F.tanh, "tanh")


def _erf_col(c):
    # Abramowitz-Stegun 7.1.26 rational approximation (|err| <= 1.5e-7),
    # composed from built-in Column ops so it stays in codegen.
    # Used only if the runtime lacks a native erf.
    x = F.abs(c)
    t = F.lit(1.0) / (F.lit(1.0) + F.lit(0.3275911) * x)
    poly = (F.lit(0.254829592) * t - F.lit(0.284496736) * t * t
            + F.lit(1.421413741) * t * t * t
            - F.lit(1.453152027) * t * t * t * t
            + F.lit(1.061405429) * t * t * t * t * t)
    y = F.lit(1.0) - poly * F.exp(-x * x)
    return F.when(c < 0, -y).otherwise(y)


erf = _unary(getattr(F, "erf", _erf_col), "erf")


def raw(func):
    """Decorator: eager NumPy function -> Arrow-vectorized column fn
    (reference ``bl.raw``, functions/utils.py:23-60). The wrapped
    function runs per Arrow batch inside executors (pandas_udf), never
    per row and never on the driver."""
    def wrapper(sr: Series, new_dtype=None, **kwargs) -> Series:
        from ..core.dtypes import spark_type_of
        from ._udf import scalar_pandas_udf
        ret = spark_type_of(new_dtype) if new_dtype is not None else sr.spark_type
        _udf = scalar_pandas_udf(
            lambda s: np.asarray(func(s.to_numpy(), **kwargs)), ret)
        return sr._with_col(_udf(sr._colexpr))
    wrapper._baloo_column_fn = True
    wrapper.__name__ = getattr(func, "__name__", "raw")
    return wrapper


def load_cudf(path: str):
    """Reference API parity stub (functions/utils.py:8-20): the
    reference dynamically links C UDFs into Weld programs. The Spark
    equivalent is a JVM UDF jar (spark.udf.registerJavaFunction) or an
    Arrow pandas_udf wrapping a cffi/ctypes call — there is no Weld IR
    to splice C symbols into here.
    """
    raise NotImplementedError(
        "C UDF loading is Weld-specific; register a JVM UDF "
        "(spark.udf.registerJavaFunction) or wrap the C call in raw() "
        "as an Arrow pandas_udf instead")


def sort(sr: Series, ascending: bool = True) -> Series:
    """Eager-style sort of a Series' values (reference ``bl.sort`` =
    ``raw(np.sort)``, functions/raw.py:6-8) — distributed orderBy, not
    a driver-side np.sort."""
    sdf, alias = sr._select()
    out = sdf.orderBy(F.col(alias).asc() if ascending else F.col(alias).desc())
    return Series._make(out, F.col(alias), sr._index_cols, sr.name,
                        [(alias, ascending)])
