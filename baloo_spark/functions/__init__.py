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


def load_cudf(path: str, func_name: str | None = None, dtype="int64"):
    """Dynamically-linked C UDF (reference functions/utils.py:8-20,
    exercised by tests/core/test_series.py:277-288).

    The reference dlopens a Weld-ABI ``.so`` and splices
    ``cudf[name, vec[T]]`` calls into the IR. The Spark-idiomatic
    analogue: hand each Arrow batch's numpy buffer to the C symbol by
    pointer (zero copy) inside the same Arrow ``pandas_udf`` path as
    ``bl.raw`` — so ``sr.apply(load_cudf(so, "udf_add"), scalar=2)``
    is the counterpart of the reference's
    ``sr.apply('cudf[udf_add, vec[i64]]({self}, {scalar})')``.

    C contract::

        void func_name(const T* in, int64_t n, T* out, <scalars...>)

    where ``T`` matches ``dtype`` and trailing scalars are passed in
    kwarg order (Python int -> int64_t, float -> double). Each executor
    dlopens ``path`` locally on first use — at cluster scale ship the
    library with ``spark.files`` so the path resolves on every node.

    Without ``func_name`` this degrades to the reference's exact
    behavior: dlopen with RTLD_GLOBAL, returning the handle.
    """
    import ctypes

    if func_name is None:
        return ctypes.CDLL(path, mode=ctypes.RTLD_GLOBAL)

    np_name = np.dtype(dtype).name

    def call(values: np.ndarray, **scalars):
        import ctypes as ct
        ctype = {"int64": ct.c_int64, "int32": ct.c_int32,
                 "float64": ct.c_double, "float32": ct.c_float}[np_name]
        lib = ct.CDLL(path)  # executor-local dlopen (cached by libc)
        fn = getattr(lib, func_name)
        arr = np.ascontiguousarray(values, dtype=np_name)
        out = np.empty_like(arr)
        argtypes = [ct.POINTER(ctype), ct.c_int64, ct.POINTER(ctype)]
        args = [arr.ctypes.data_as(ct.POINTER(ctype)), ct.c_int64(len(arr)),
                out.ctypes.data_as(ct.POINTER(ctype))]
        for v in scalars.values():
            if isinstance(v, float):
                argtypes.append(ct.c_double)
                args.append(ct.c_double(v))
            else:
                argtypes.append(ct.c_int64)
                args.append(ct.c_int64(int(v)))
        fn.restype = None
        fn.argtypes = argtypes
        fn(*args)
        return out

    call.__name__ = f"cudf_{func_name}"
    return call


def sort(sr: Series, ascending: bool = True) -> Series:
    """Eager-style sort of a Series' values (reference ``bl.sort`` =
    ``raw(np.sort)``, functions/raw.py:6-8) — distributed orderBy, not
    a driver-side np.sort."""
    sdf, alias = sr._select()
    out = sdf.orderBy(F.col(alias).asc() if ascending else F.col(alias).desc())
    return Series._make(out, F.col(alias), sr._index_cols, sr.name,
                        [(alias, ascending)])
