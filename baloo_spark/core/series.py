"""Series: 1-D typed column backed by a lazy Spark DataFrame.

Reference: ``baloo/core/series.py:17`` — a Series holds data (ndarray
or lazy WeldObject) + index + dtype + name. Here the "lazy expression"
is a pyspark ``Column`` over a parent Spark DataFrame; composition of
Series operations composes Column expressions, and Catalyst fuses the
whole pipeline at evaluate time exactly where Weld fused IR fragments
(SURVEY.md §3).

Missing data is native Spark NULL, not the reference's -999 sentinel
(``encoders.py:101-133``); see :mod:`baloo_spark.core.dtypes` for the
compat codec.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..plans.ordinal import ORD_COL, with_dense_ordinal
from .ordering import order_expr, order_exprs, rev_order_exprs
from .dtypes import np_dtype_of, spark_type_of

_VAL = "__val__"
_IDX = "__index__"
# isin value-list budget: literal IN-set below, broadcast-join above
_ISIN_LITERAL_MAX = 1024
# budget for the global expanding order-stat face (a single-
# partition pandas pass: ~80 MB of doubles at the default)
_EXPANDING_STAT_MAX_ROWS = 10_000_000

# aggregations: reference casts numeric aggs to f64 (weld_aggs.py:3,42-49)
_AGG_FNS = {
    "min": F.min,
    "max": F.max,
    "sum": F.sum,
    "prod": F.product,
    "mean": F.avg,
    "var": F.var_samp,      # sample variance (weld_aggs.py:113-151)
    "std": F.stddev_samp,   # sqrt of sample var (weld_aggs.py:154-182)
    "count": F.count,
    # exact interpolated median (engine extension; ANSI
    # percentile_cont(0.5) — same definition as DuckDB median())
    "median": F.median,
}


def _is_numeric(dt: T.DataType) -> bool:
    return isinstance(dt, T.NumericType)


class Series:
    """A named, typed 1-D column with an index.

    Parameters mirror ``baloo.Series(data, index, dtype, name)``
    (``series.py:75-101``). ``data`` may be a numpy array, list, or
    pandas Series.

    Examples (executable — the reference runs its docstrings in CI,
    series.py:32-70; these run under tests/test_doctests.py):

    >>> import numpy as np
    >>> import baloo_spark as bl
    >>> sr = bl.Series(np.array([1.0, 4.0, 9.0]), name="x")
    >>> sr.to_pandas()
    0    1.0
    1    4.0
    2    9.0
    Name: x, dtype: float64
    >>> (sr * 2 + 1).to_pandas().tolist()
    [3.0, 9.0, 19.0]
    >>> sr[sr > 2].to_pandas().tolist()
    [4.0, 9.0]
    >>> print(sr.sum())
    14.0
    >>> sr.agg(["min", "std"]).to_pandas().round(3)
    min    1.000
    std    4.041
    Name: x, dtype: float64
    >>> sr.apply(bl.sqrt).to_pandas().tolist()
    [1.0, 2.0, 3.0]
    >>> sr.apply("{self} * {k}", mapping={"k": 10}).to_pandas().tolist()
    [10.0, 40.0, 90.0]
    >>> sr.apply(np.log1p).to_pandas().round(3).tolist()
    [0.693, 1.609, 2.303]
    >>> sr.astype("int64").to_pandas().tolist()
    [1, 4, 9]
    >>> sr.index.values.tolist()
    [0, 1, 2]
    >>> st = bl.Series(np.array(["a", "Bc"]))
    >>> st.str.upper().to_pandas().tolist()
    ['A', 'BC']
    >>> st.str.find("c").to_pandas().tolist()
    [-1, 1]
    """

    def __init__(self, data=None, index=None, dtype=None, name=None, *,
                 _sdf=None, _col=None, _index_cols=None, _order=None):
        if _sdf is not None:
            self._sdf = _sdf
            self._colexpr = _col
            self._index_cols = list(_index_cols or [])
            self._order = _order
            self.name = name
            return
        import pandas as pd

        from ..session import get_session
        spark = get_session()
        if isinstance(data, Series):
            raise TypeError("Series(data=Series) not supported; use the value directly")
        from .utils import (check_dtype, check_supported_dtype,
                            check_type, spark_df_from_pandas)
        check_type(name, str)
        dtype = check_dtype(dtype)
        if isinstance(data, pd.Series):
            if name is None:
                name = data.name
            if index is None:
                index = data.index.to_numpy()
            data = data.to_numpy()
        arr = np.asarray(data)
        if dtype is not None:
            arr = arr.astype(dtype)
        check_supported_dtype(arr.dtype)
        pdf = pd.DataFrame({_VAL: arr})
        index_cols = []
        if index is not None:
            idx_arr = np.asarray(getattr(index, "values", index))
            pdf[_IDX] = idx_arr
            index_cols = [_IDX]
        sdf = spark_df_from_pandas(spark, pdf)
        sdf = with_dense_ordinal(sdf)
        self._sdf = sdf
        self._colexpr = F.col(_VAL)
        self._index_cols = index_cols or [ORD_COL]
        self._order = [(ORD_COL, True)]
        self.name = name

    # ---------------------------------------------------------------- infra

    @classmethod
    def _make(cls, sdf, col: Column, index_cols, name, order=None) -> "Series":
        return cls(_sdf=sdf, _col=col, _index_cols=index_cols, name=name,
                   _order=order)

    # r11: the source frame sdf when this Series' own sdf is a
    # ROW-PRESERVING derivation of it that retains every source column
    # (the ordinal-machinery op faces: shift/diff/cumsum/rank/rolling/
    # expanding/ewm). DataFrame.__setitem__ uses it to adopt the op's
    # output with a plain projection instead of re-running the dense-
    # ordinal layout on both sides for a positional join (guide §1.2:
    # the jobs the layout pays exist to align two UNRELATED plans;
    # a same-plan derivation needs none of them). Held as a strong
    # reference (not an id): id() of a collected sdf can be reused by
    # a later allocation, which would mis-fire the adopt onto an
    # unrelated frame.
    _rowpar_src = None

    def _tag_rowpar(self, src_sdf) -> "Series":
        self._rowpar_src = src_sdf
        return self

    def _with_col(self, col: Column, name=None) -> "Series":
        out = Series._make(self._sdf, col, self._index_cols,
                           name if name is not None else self.name,
                           self._order)
        out._rowpar_src = self._rowpar_src  # same sdf => same ancestry
        return out

    def _swap_in(self, new: "Series"):
        """In-place adoption hook for the setter faces (r11): the
        Series takes over the written column's plan. pandas
        copy-on-write semantics — writing a Series never writes
        back into a frame it was selected from."""
        self._sdf = new._sdf
        self._colexpr = new._colexpr
        self._index_cols = list(new._index_cols)
        self._order = new._order

    def _select(self, alias=None):
        """Project index cols + the value expression as a Spark DF."""
        alias = alias or self.name or _VAL
        cols = [F.col(c) for c in self._index_cols if c in self._sdf.columns]
        return self._sdf.select(*cols, self._colexpr.alias(alias)), alias

    def to_spark(self):
        sdf, _ = self._select()
        return sdf

    @property
    def dtype(self) -> np.dtype:
        sdf = self._sdf.select(self._colexpr.alias("x"))
        return np_dtype_of(sdf.schema["x"].dataType)

    @property
    def index(self):
        """Index/RangeIndex view of the index column (reference
        series.py:103-115). Values fetch lazily on ``.values`` access
        — one select of just the index column (a driver collect;
        explicit materialization boundary like ``to_pandas``)."""
        from .indexes import Index, RangeIndex

        def fetch(col):
            def _f():
                sdf = self._sdf
                if self._order:
                    ob = order_exprs(self._order, sdf.columns)
                    if ob:
                        sdf = sdf.orderBy(*ob)
                return np.asarray([r[0] for r in sdf.select(col).collect()])
            return _f

        cols = self._index_cols
        if cols == [ORD_COL]:
            ri = RangeIndex(getattr(self, "_len_cache", None))
            ri._fetch = fetch(ORD_COL)
            ri._series = Series._make(self._sdf, F.col(ORD_COL), [ORD_COL],
                                      None, self._order)
            return ri
        ix = Index(name=None if cols[0] == _IDX else cols[0])
        ix._fetch = fetch(cols[0])
        # lazy backing over the SAME plan: ops on the index (filters,
        # arithmetic, astype) compose Columns without collecting.
        # Indexed by ordinal so the projection never self-collides.
        idx = [ORD_COL] if ORD_COL in self._sdf.columns else []
        ix._series = Series._make(self._sdf, F.col(cols[0]), idx,
                                  ix.name, self._order)
        return ix

    @property
    def spark_type(self) -> T.DataType:
        return self._sdf.select(self._colexpr.alias("x")).schema["x"].dataType

    def __len__(self) -> int:
        # eager, like the reference (lazy_result.py:138-156); cached
        # once known (series.py:98-99)
        if getattr(self, "_len_cache", None) is None:
            self._len_cache = self._sdf.count()
        return self._len_cache

    @property
    def shape(self) -> tuple:
        return (len(self),)

    @property
    def size(self) -> int:
        return len(self)

    @property
    def ndim(self) -> int:
        return 1

    @property
    def empty(self) -> bool:
        """True when there are no rows — limit(1) probe, the scan
        short-circuits at the first row."""
        if getattr(self, "_len_cache", None) is not None:
            return self._len_cache == 0
        return self._sdf.limit(1).count() == 0

    def to_numpy(self) -> np.ndarray:
        return self.values

    def to_dict(self) -> dict:
        """Driver-side {index label: value} export via to_pandas."""
        return self.to_pandas().to_dict()

    def __repr__(self):
        return f"Series(name={self.name}, dtype={self.dtype})"

    def __str__(self):
        return self.to_pandas().__str__()

    # ------------------------------------------------------------ alignment

    def _lift(self, other, op):
        """Binary op vs scalar or Series; Series from another frame is
        aligned positionally by ordinal (reference arrays are
        positional, SURVEY.md §1.4)."""
        if isinstance(other, Series):
            if other._sdf is self._sdf:
                return self._with_col(op(self._colexpr, other._colexpr))
            # Cross-frame: align POSITIONALLY (reference arrays zip by
            # position, SURVEY.md §1.4). ORD_COL holds row LABELS which
            # go sparse after a filter, so recompute fresh dense
            # positions on BOTH sides and join on those.
            from ..plans.ordinal import POS_COL
            left, lname = self._ordered_sdf("__l__")
            right, rname = other._ordered_sdf("__r__")
            right = right.select(POS_COL, rname)
            joined = left.join(right, POS_COL, "inner").drop(POS_COL)
            idx = [c for c in self._index_cols if c in joined.columns]
            return Series._make(joined, op(F.col(lname), F.col(rname)), idx,
                                self.name, self._order)
        if isinstance(other, (list, np.ndarray)):
            return self._lift(Series(np.asarray(other)), op)
        from .utils import nan_safe_lit
        # a NaN scalar operand becomes a typed NULL (the codec):
        # comparisons go NULL (falsy in filters — the engine's
        # missing-comparison pin; raw NaN inverts them, NaN sorts
        # GREATEST in Spark so x < NaN was true) and arithmetic
        # yields NULL = the engine's NaN (r11)
        return self._with_col(op(self._colexpr, nan_safe_lit(other)))

    # ----------------------------------------------------------- operators

    # comparisons (generic.py:46-67 -> weld_ops.py:51-94)
    def __lt__(self, o): return self._lift(o, lambda a, b: a < b)
    def __le__(self, o): return self._lift(o, lambda a, b: a <= b)
    def __gt__(self, o): return self._lift(o, lambda a, b: a > b)
    def __ge__(self, o): return self._lift(o, lambda a, b: a >= b)

    def __eq__(self, o):  # noqa: A003 - pandas-style elementwise eq
        return self._lift(o, lambda a, b: a == b)

    def __ne__(self, o):
        return self._lift(o, lambda a, b: a != b)

    __hash__ = object.__hash__

    # boolean combinators (generic.py:95-104 -> weld_ops.py:232-304)
    def __and__(self, o): return self._lift(o, lambda a, b: a & b)
    def __or__(self, o): return self._lift(o, lambda a, b: a | b)
    def __invert__(self): return self._with_col(~self._colexpr)

    # arithmetic (generic.py:75-92 -> weld_ops.py:417-459)
    def _other_is_bool(self, other) -> bool:
        if isinstance(other, Series):
            return other.spark_type.typeName() == "boolean"
        if isinstance(other, (bool, np.bool_)):
            return True
        if isinstance(other, (list, np.ndarray)):
            return np.asarray(other).dtype == bool
        return False

    def _lift_arith(self, other, opname: str, op):
        """NumPy/pandas boolean promotion for arithmetic: a LONE
        boolean operand acts as 0/1 (Spark refuses bool in numeric
        operators outright, so cast it); TWO boolean operands follow
        NumPy — ``+`` is logical OR, ``*`` logical AND, ``%``
        computes on 0/1 ints (pandas gives int8), ``-`` raises
        TypeError and truediv/pow NotImplementedError, matching
        pandas 2.2's own refusals."""
        lb = self.spark_type.typeName() == "boolean"
        rb = self._other_is_bool(other)
        if lb and rb:
            if opname == "add":
                return self._lift(other, lambda a, b: a | b)
            if opname == "mul":
                return self._lift(other, lambda a, b: a & b)
            if opname == "mod":
                # pandas computes bool % bool on 0/1 ints (int8);
                # numpy's int mod by zero is 0, not NULL
                return self._lift(other, lambda a, b: F.when(
                    b.cast("int") == 0,
                    F.when(a.isNotNull(), F.lit(0)))
                    .otherwise(op(a.cast("int"), b.cast("int"))))
            if opname == "sub":
                raise TypeError(
                    "numpy boolean subtract, the `-` operator, is "
                    "not supported, use the bitwise_xor, the `^` "
                    "operator, or the logical_xor function instead")
            raise NotImplementedError(
                f"operator {opname!r} not implemented for bool "
                "dtypes (pandas refuses it too); astype(int) first")
        if lb or rb:
            li = (lambda a: a.cast("int")) if lb else (lambda a: a)
            ri = (lambda b: b.cast("int")) if rb else (lambda b: b)
            return self._lift(other, lambda a, b: op(li(a), ri(b)))
        return self._lift(other, op)

    def __add__(self, o):
        return self._lift_arith(o, "add", lambda a, b: a + b)

    def __radd__(self, o):
        return self._lift_arith(o, "add", lambda a, b: b + a)

    def __sub__(self, o):
        return self._lift_arith(o, "sub", lambda a, b: a - b)

    def __rsub__(self, o):
        return self._lift_arith(o, "sub", lambda a, b: b - a)

    def __mul__(self, o):
        return self._lift_arith(o, "mul", lambda a, b: a * b)

    def __rmul__(self, o):
        return self._lift_arith(o, "mul", lambda a, b: b * a)
    @staticmethod
    def _ieee_div(a, b):
        """IEEE-754 float division (pandas/NumPy): x/0 -> ±inf,
        0/0 -> NaN. Spark's ``/`` returns NULL at zero divisors; the
        zero-divisor branch rebuilds the IEEE result, recovering the
        sign of -0.0 via the string cast (signum collapses it to 0).
        NULL operands still propagate NULL. Integer dividends by a
        zero INT divisor also take this branch (pandas promotes the
        whole column to float there; with a nullable-int flavor —
        pandas Int64 — the result is <NA>, which is what int inputs
        export as when the result column stays integral elsewhere)."""
        sign = (F.when(b.cast("string").startswith("-"), F.lit(-1.0))
                .otherwise(F.lit(1.0))) * F.signum(a)
        return F.when(
            b == 0,
            F.when(a == 0, F.lit(float("nan")))
            .otherwise(sign * F.lit(float("inf")))) \
            .otherwise(a / b)

    def __truediv__(self, o):
        return self._lift_arith(
            o, "truediv", lambda a, b: Series._ieee_div(a, b))

    def __rtruediv__(self, o):
        return self._lift_arith(
            o, "truediv", lambda a, b: Series._ieee_div(b, a))

    def __pow__(self, o):
        return self._lift_arith(o, "pow", lambda a, b: F.pow(a, b))
    @staticmethod
    def _py_mod(a, b):
        # Python/NumPy modulo (sign follows the DIVISOR: -7 % 3 == 2,
        # 7 % -3 == -2); Spark's % is the C remainder (sign of the
        # dividend) and pmod is non-negative-only — neither matches,
        # so shift the remainder by b when the signs disagree.
        r = a % b
        return F.when((r != 0) & (F.signum(r) != F.signum(b)), r + b)             .otherwise(r)

    def __mod__(self, o):
        return self._lift_arith(
            o, "mod", lambda a, b: Series._py_mod(a, b))

    def __rmod__(self, o):
        return self._lift_arith(
            o, "mod", lambda a, b: Series._py_mod(b, a))

    def _named_op(self, other, op, fill_value, reverse=False):
        """pandas named binary ops (``s.add(o, fill_value=...)``):
        fill_value substitutes for the MISSING side before the op;
        both sides missing stays NULL — expressed as one gated
        coalesce, still a single JVM projection."""
        if reverse:
            inner = op
            op = lambda a, b: inner(b, a)  # noqa: E731
        if fill_value is None:
            return self._lift(other, op)

        def fn(a, b):
            fv = F.lit(fill_value)
            return F.when(a.isNull() & b.isNull(), F.lit(None)) \
                .otherwise(op(F.coalesce(a, fv), F.coalesce(b, fv)))
        return self._lift(other, fn)

    def add(self, other, fill_value=None):
        return self._named_op(other, lambda a, b: a + b, fill_value)

    def radd(self, other, fill_value=None):
        return self._named_op(other, lambda a, b: a + b, fill_value, True)

    def sub(self, other, fill_value=None):
        return self._named_op(other, lambda a, b: a - b, fill_value)

    def rsub(self, other, fill_value=None):
        return self._named_op(other, lambda a, b: a - b, fill_value, True)

    def mul(self, other, fill_value=None):
        return self._named_op(other, lambda a, b: a * b, fill_value)

    def rmul(self, other, fill_value=None):
        return self._named_op(other, lambda a, b: a * b, fill_value, True)

    def div(self, other, fill_value=None):
        return self._named_op(other, Series._ieee_div, fill_value)

    truediv = div

    def rdiv(self, other, fill_value=None):
        return self._named_op(other, Series._ieee_div, fill_value, True)

    def pow(self, other, fill_value=None):
        return self._named_op(other, lambda a, b: F.pow(a, b),
                              fill_value)

    def mod(self, other, fill_value=None):
        return self._named_op(
            other, lambda a, b: Series._py_mod(a, b), fill_value)

    # full pandas named-op surface: reverse spellings + long aliases
    rtruediv = rdiv
    divide = div
    multiply = mul
    subtract = sub

    def rpow(self, other, fill_value=None):
        return self._named_op(other, lambda a, b: F.pow(a, b),
                              fill_value, True)

    def rmod(self, other, fill_value=None):
        return self._named_op(
            other, lambda a, b: Series._py_mod(a, b), fill_value, True)

    def floordiv(self, other, fill_value=None):
        return self._named_op(other, self._floor_fn(other, False),
                              fill_value)

    def rfloordiv(self, other, fill_value=None):
        return self._named_op(other, self._floor_fn(other, False),
                              fill_value, True)

    def divmod(self, other, fill_value=None):
        """pandas ``Series.divmod``: (floordiv, mod) pair."""
        return (self.floordiv(other, fill_value),
                self.mod(other, fill_value))

    def rdivmod(self, other, fill_value=None):
        return (self.rfloordiv(other, fill_value),
                self.rmod(other, fill_value))

    def _floor_fn(self, o, reverse: bool):
        # pandas: float operands -> float result, ints stay integral
        from pyspark.sql import types as T
        is_f = isinstance(self.spark_type, (T.DoubleType, T.FloatType))             or isinstance(o, float)             or (isinstance(o, Series)
                and isinstance(o.spark_type, (T.DoubleType, T.FloatType)))
        def fn(a, b):
            num, den = (b, a) if reverse else (a, b)
            x = F.floor(num / den)
            x = x.cast("double") if is_f else x
            if is_f:
                # pandas float floordiv by zero is IEEE (x//0 -> ±inf,
                # 0//0 -> nan), floor-invariant so applied directly;
                # int//0 stays NULL (pandas Int64 <NA> flavor — the
                # float promotion pandas does there is data-dependent
                # dtype, impossible lazily)
                x = F.when(den == 0, Series._ieee_div(num, den)) \
                    .otherwise(x)
            return x
        return fn

    def _floor_div(self, o, reverse: bool):
        if (self.spark_type.typeName() == "boolean"
                and self._other_is_bool(o)):
            # pandas 2.2 raises NotImplementedError for bool//bool
            raise NotImplementedError(
                "operator 'floordiv' not implemented for bool "
                "dtypes (pandas refuses it too); astype(int) first")
        # a LONE bool operand acts as 0/1, like _lift_arith
        if self.spark_type.typeName() == "boolean":
            return self.astype("int64")._floor_div(o, reverse)
        if self._other_is_bool(o):
            if isinstance(o, Series):
                o = o.astype("int64")
            elif isinstance(o, (bool, np.bool_)):
                o = int(o)
            else:
                o = np.asarray(o).astype("int64")
        return self._lift(o, self._floor_fn(o, reverse))

    def __floordiv__(self, o): return self._floor_div(o, False)
    def __rfloordiv__(self, o): return self._floor_div(o, True)
    def __neg__(self): return self._with_col(-self._colexpr)

    # ------------------------------------------------------- missing data

    def isin(self, values) -> "Series":
        """Membership test. Small value lists compile to a literal
        IN-set (Catalyst turns long ones into a hashed InSet, pure
        codegen); past ``_ISIN_LITERAL_MAX`` values the list becomes
        a broadcast-join lookup instead — a 10^5-literal expression
        tree bloats plan serialization/codegen the same way map()'s
        CASE chain and k-means' centroid literal did, and a lookup
        TABLE is the thing that still works when the list is 10^8
        rows on a cluster (swap the broadcast for a shuffle join by
        size, which AQE does). Both faces agree: NULL input => NULL,
        a NULL in ``values`` makes non-matches NULL (SQL IN), NaN
        matches NaN (Spark equality). A Series argument never
        collects: it becomes the lookup table directly (the 100 TB
        face — AQE picks broadcast vs shuffle by size), with the
        null-in-values flag computed as a lazy one-row aggregate."""
        if isinstance(values, Series):
            vs, va = values._select("__ik__")
            lut = (vs.select("__ik__")
                   .where(F.col("__ik__").isNotNull()).distinct())
            nulls = vs.agg(F.max(F.col("__ik__").isNull())
                           .alias("__hn__"))
            joined = (self._sdf
                      .join(lut, self._colexpr == F.col("__ik__"),
                            "left")
                      .crossJoin(F.broadcast(nulls)))
            expr = (F.when(self._colexpr.isNull(), F.lit(None))
                    .when(F.col("__ik__").isNotNull(), F.lit(True))
                    .otherwise(F.when(F.col("__hn__"), F.lit(None))
                               .otherwise(F.lit(False))))
            out = joined.withColumn("__isin__", expr) \
                .drop("__ik__", "__hn__")
            return Series._make(out, F.col("__isin__"),
                                self._index_cols, self.name,
                                self._order)
        vals = list(values)
        if len(vals) <= _ISIN_LITERAL_MAX:
            return self._with_col(self._colexpr.isin(*vals))
        spark = self._sdf.sparkSession
        has_null = any(v is None for v in vals)
        lut = spark.createDataFrame(
            [(v,) for v in vals if v is not None], ["__ik__"]).distinct()
        joined = self._sdf.join(
            F.broadcast(lut), self._colexpr == F.col("__ik__"), "left")
        miss = F.lit(None) if has_null else F.lit(False)
        expr = (F.when(self._colexpr.isNull(), F.lit(None))
                .when(F.col("__ik__").isNotNull(), F.lit(True))
                .otherwise(miss))
        out = joined.withColumn("__isin__", expr).drop("__ik__")
        return Series._make(out, F.col("__isin__"), self._index_cols,
                            self.name, self._order)

    def between(self, lower, upper, inclusive="both") -> "Series":
        """Boundary test (pandas ``Series.between``): ``inclusive``
        takes the pandas 2.x strings 'both'/'neither'/'left'/'right'
        plus the legacy booleans (True='both', False='neither')."""
        from .utils import nan_safe_lit
        mode = {True: "both", False: "neither"}.get(inclusive, inclusive)
        llit, ulit = nan_safe_lit(lower), nan_safe_lit(upper)
        ops = {"both": (self._colexpr >= llit,
                        self._colexpr <= ulit),
               "neither": (self._colexpr > llit,
                           self._colexpr < ulit),
               "left": (self._colexpr >= llit,
                        self._colexpr < ulit),
               "right": (self._colexpr > llit,
                         self._colexpr <= ulit)}
        if mode not in ops:
            raise ValueError(
                "inclusive must be 'both', 'neither', 'left', "
                f"'right' or a bool, got {inclusive!r}")
        lo, hi = ops[mode]
        return self._with_col(lo & hi)

    def _gated(self, cond: "Series", other, keep_when: bool) -> "Series":
        """Shared where/mask body. A NULL cond is False on BOTH faces
        (pandas: where replaces, mask KEEPS — so the mask gate is
        applied directly, never as where(~cond)). ``other`` may be a
        scalar or a Series: the Series face packs (value, gate) into
        a struct through the first alignment so the second alignment
        still sees the un-gated value."""
        if isinstance(other, Series):
            packed = self._lift(cond, lambda a, c: F.struct(
                a.alias("v"),
                F.coalesce(c, F.lit(False)).alias("g")))
            pick = ((lambda s, o: F.when(s["g"], s["v"]).otherwise(o))
                    if keep_when else
                    (lambda s, o: F.when(s["g"], o).otherwise(s["v"])))
            out = packed._lift(other, pick)
            out.name = self.name
            return out
        from .utils import nan_safe_lit
        repl = nan_safe_lit(other)
        gate = ((lambda a, c: F.when(c, a).otherwise(repl))
                if keep_when else
                (lambda a, c: F.when(c, repl).otherwise(a)))
        return self._lift(cond, gate)

    def where(self, cond: "Series", other=None) -> "Series":
        """pandas ``Series.where``: keep values where ``cond`` holds,
        replace the rest with ``other`` (NULL by default; a Series
        ``other`` aligns positionally like any binary op). ``cond``
        from another frame aligns positionally too."""
        return self._gated(cond, other, keep_when=True)

    def mask(self, cond: "Series", other=None) -> "Series":
        """pandas ``Series.mask``: the complement of :meth:`where` —
        replace values WHERE ``cond`` holds. A NULL cond KEEPS the
        value (pandas treats missing cond as False; ``where(~cond)``
        would null it)."""
        return self._gated(cond, other, keep_when=False)

    def isna(self) -> "Series":
        """NULL test (reference: sentinel compare, generic.py:69-73)."""
        return self._with_col(self._colexpr.isNull())

    def notna(self) -> "Series":
        return self._with_col(self._colexpr.isNotNull())

    isnull = isna
    notnull = notna

    def fillna(self, value) -> "Series":
        from .utils import nan_safe_lit
        # a NaN fill value is a no-op under the NaN == NULL pin
        # (nan_safe_lit -> NULL -> coalesce keeps the column),
        # matching pandas' fillna(nan)
        return self._with_col(F.coalesce(self._colexpr,
                                         nan_safe_lit(value)))

    def dropna(self) -> "Series":
        sdf, alias = self._select()
        out = sdf.filter(F.col(alias).isNotNull())
        return Series._make(out, F.col(alias), self._index_cols, self.name,
                            self._order)

    # ----------------------------------------------------------- selection

    def __getitem__(self, key):
        if isinstance(key, Series):
            # boolean-mask filter (series.py:249-252)
            if key._sdf is self._sdf:
                mask_sdf = self._sdf.filter(key._colexpr)
                return Series._make(mask_sdf, self._colexpr, self._index_cols,
                                    self.name, self._order)
            # cross-frame mask: positional (reference weld_ops.py:97-133)
            from ..plans.ordinal import POS_COL
            left, alias = self._ordered_sdf()
            mask_sdf, malias = key._ordered_sdf("__mask__")
            keep = mask_sdf.filter(F.col(malias)).select(POS_COL)
            out = left.join(keep, POS_COL, "left_semi").drop(POS_COL)
            return Series._make(out, F.col(alias), self._index_cols,
                                self.name, self._order)
        if isinstance(key, slice):
            return self._slice(key)
        raise TypeError(f"unsupported key: {type(key)}")

    def __setitem__(self, key, value):
        """``sr[key] = value`` (r11): boolean masks (Series or
        list) and labels ride the loc face; slices are positional
        (the iloc face). A default-constructed Series carries
        RangeIndex LABELS, so integer keys hit rows by label, like
        pandas. Copy-on-write: the write never propagates to a
        frame this Series was selected from."""
        if isinstance(key, slice):
            self.iloc[key] = value
        else:
            self.loc[key] = value

    def filter(self, mask: "Series") -> "Series":
        return self[mask]

    def _ordered_sdf(self, alias=None):
        """sdf with a FRESH dense positional column ``__pos__``.

        ORD_COL values are row LABELS (RangeIndex) — after a filter
        they are sparse, so positions must be recomputed over the
        current row set, ordered by the logical order (or by the
        labels for ingest order).
        """
        from ..plans.ordinal import POS_COL
        alias = alias or self.name or _VAL
        # project index cols AND order cols (the logical order must
        # survive the projection for the fresh positions to be right)
        keep = [c for c in dict.fromkeys(
                    list(self._index_cols)
                    + [c for c, _ in (self._order or [])])
                if c in self._sdf.columns and c != alias]
        sdf = self._sdf.select(*[F.col(c) for c in keep],
                               self._colexpr.alias(alias))
        order = order_exprs(self._order or [], sdf.columns)
        if not order and ORD_COL in sdf.columns:
            order = [F.col(ORD_COL).asc()]
        return with_dense_ordinal(sdf, order or None, name=POS_COL), alias

    def _slice(self, key: slice) -> "Series":
        from ..plans.ordinal import POS_COL
        if (key.step or 1) < 0:
            raise ValueError("negative slice steps are not supported")
        if ((key.start or 0) < 0) or (key.stop is not None
                                      and key.stop < 0):
            # pandas negative positions: one count job normalizes them
            key = slice(*key.indices(len(self)))
        start = key.start or 0
        stop = key.stop
        step = key.step or 1
        sdf, alias = self._ordered_sdf()
        cond = F.col(POS_COL) >= start
        if stop is not None:
            cond = cond & (F.col(POS_COL) < stop)
        if step != 1:
            cond = cond & ((F.col(POS_COL) - start) % step == 0)
        out = sdf.filter(cond).drop(POS_COL)
        return Series._make(out, F.col(alias), self._index_cols, self.name,
                            self._order or ([(ORD_COL, True)]
                                            if ORD_COL in out.columns else None))

    def head(self, n: int = 5) -> "Series":
        if n < 0:
            # pandas head(-n): all but the last n rows
            return self._slice(slice(0, max(len(self) + n, 0)))
        sdf, alias = self._select()
        if self._order:
            sdf = sdf.orderBy(*order_exprs(self._order))
        out = sdf.limit(n)
        return Series._make(out, F.col(alias), self._index_cols, self.name,
                            self._order)

    def tail(self, n: int = 5) -> "Series":
        if n < 0:
            # pandas tail(-n): all but the first n rows
            return self._slice(slice(-n, None))
        return self._slice(slice(max(len(self) - n, 0), None))

    @property
    def iloc(self):
        return _SeriesILoc(self)

    # -------------------------------------------------------- aggregations

    def _agg_expr(self, name: str) -> Column:
        if name not in _AGG_FNS:
            raise ValueError(f"unsupported aggregation: {name}")
        col = self._colexpr
        dt = self.spark_type
        if name == "count":
            return _AGG_FNS[name](col).cast("long")
        if dt.typeName() == "boolean" and name not in ("min", "max"):
            # pandas treats bool series as 0/1 in numeric aggs —
            # .isna().sum() is the canonical null count
            col = col.cast("double")
        if _is_numeric(dt):
            # reference casts all numeric aggs to f64 (weld_aggs.py:3)
            col = col.cast("double")
        out = _AGG_FNS[name](col)
        if name in ("sum", "prod"):
            # empty input -> merger identity (0 / 1), not NULL, matching
            # the reference's Weld merger semantics (weld_aggs.py:32-78)
            out = F.coalesce(out, F.lit(0.0 if name == "sum" else 1.0))
        return out

    def _agg_scalar(self, name: str):
        row = self._sdf.agg(self._agg_expr(name).alias("v")).first()
        return row["v"]

    def min(self): return self._agg_scalar("min")
    def max(self): return self._agg_scalar("max")
    def sum(self): return self._agg_scalar("sum")
    def prod(self): return self._agg_scalar("prod")
    def count(self): return self._agg_scalar("count")
    def mean(self): return self._agg_scalar("mean")
    def var(self): return self._agg_scalar("var")
    def std(self): return self._agg_scalar("std")

    def sem(self, ddof: int = 1):
        """Standard error of the mean (pandas ``Series.sem``):
        std/sqrt(count), one JVM aggregate for both pieces."""
        col = self._colexpr.cast("double")
        row = self._sdf.agg(
            (F.stddev_samp(col) if ddof == 1
             else F.stddev_pop(col)).alias("s"),
            F.count(col).alias("n")).first()
        if not row["n"] or row["s"] is None:
            return float("nan")
        import math
        return row["s"] / math.sqrt(row["n"])

    def skew(self):
        """Bias-corrected sample skewness (pandas ``Series.skew``):
        Spark's ``skewness`` is the POPULATION g1 = m3/m2^1.5 —
        silently different; pandas applies the Fisher-Pearson
        adjustment g1 * sqrt(n(n-1))/(n-2), NaN for n < 3. One JVM
        aggregate either way (engine extension)."""
        col = self._colexpr.cast("double")
        row = self._sdf.agg(F.skewness(col).alias("g1"),
                            F.count(col).alias("n")).first()
        n = row["n"]
        if n < 3:
            return float("nan")
        if row["g1"] is None:
            return 0.0      # zero variance: pandas says 0, Spark NULL
        import math
        return row["g1"] * math.sqrt(n * (n - 1)) / (n - 2)

    def kurt(self):
        """Bias-corrected excess kurtosis (pandas ``Series.kurt``):
        Spark's ``kurtosis`` is the population excess g2; pandas
        corrects by ((n+1)g2 + 6)(n-1)/((n-2)(n-3)), NaN for n < 4."""
        col = self._colexpr.cast("double")
        row = self._sdf.agg(F.kurtosis(col).alias("g2"),
                            F.count(col).alias("n")).first()
        n = row["n"]
        if n < 4:
            return float("nan")
        if row["g2"] is None:
            return 0.0      # zero variance: pandas says 0, Spark NULL
        return ((n + 1) * row["g2"] + 6) * (n - 1) / ((n - 2) * (n - 3))

    kurtosis = kurt

    def _pairwise(self, other: "Series", fn):
        """Pairwise aggregate (corr/cov). Same-frame pairs are one
        JVM aggregate, no data movement. Cross-frame pairs are
        ALIGNED first (pandas flavor): an equi-join on shared index
        columns when both sides carry one, else positionally on
        fresh dense positions (default-RangeIndex semantics, the
        same contract as ``DataFrame.__setitem__``) — then the same
        single aggregate. Rows where either side is NULL are skipped
        by the JVM corr/covar aggregate, matching pandas' pairwise
        NaN handling."""
        if not isinstance(other, Series):
            raise TypeError(f"expected Series, got {type(other).__name__}")
        sdf, a, b = self._pair_sdf(other)
        row = sdf.agg(fn(a.cast("double"), b.cast("double"))
                      .alias("v")).first()
        return row["v"]

    def _pair_sdf(self, other: "Series"):
        """The aligned (sdf, a_col, b_col) triple behind every
        pairwise statistic."""
        if other._sdf is self._sdf:
            return self._sdf, self._colexpr, other._colexpr
        on = [c for c in self._index_cols if c in other._index_cols]
        if on:
            left, la = self._select("__pa__")
            right, rb = other._select("__pb__")
            right = right.select(*on, rb).dropDuplicates(on)
            sdf = left.select(*on, la).join(right, on, "inner")
        else:
            from ..plans.ordinal import POS_COL
            lo, la = self._ordered_sdf("__pa__")
            ro, rb = other._ordered_sdf("__pb__")
            sdf = lo.select(POS_COL, la).join(
                ro.select(POS_COL, rb), POS_COL, "inner")
        return sdf, F.col("__pa__"), F.col("__pb__")

    def combine_first(self, other: "Series") -> "Series":
        """Patch NULLs with ``other``'s values at the same labels
        (pandas ``Series.combine_first``): the pairwise alignment
        every two-Series statistic uses, but FULL OUTER (pandas keeps
        the union of the two indexes, sorted), then one coalesce.
        Same-frame columns collapse to a pure projection.

        Duplicate labels on ONE side multiply rows exactly like
        pandas (the join is the alignment — no dedupe, which would
        pick a nondeterministic survivor). Known divergence: labels
        duplicated on BOTH sides produce the join's per-label cross
        (pandas pairs dups positionally within the label instead)."""
        if other._sdf is self._sdf:
            return self._with_col(
                F.coalesce(self._colexpr, other._colexpr))
        on = [c for c in self._index_cols if c in other._index_cols]
        if on:
            left, la = self._select("__ca__")
            right, rb = other._select("__cb__")
            sdf = left.select(*on, la).join(
                right.select(*on, rb), on, "full_outer")
            keys = on
        else:
            from ..plans.ordinal import POS_COL
            lo, la = self._ordered_sdf("__ca__")
            ro, rb = other._ordered_sdf("__cb__")
            sdf = lo.select(POS_COL, la).join(
                ro.select(POS_COL, rb), POS_COL, "full_outer")
            keys = [POS_COL]
        out = sdf.withColumn(
            "__cf__", F.coalesce(F.col("__ca__"), F.col("__cb__"))) \
            .drop("__ca__", "__cb__")
        return Series._make(out, F.col("__cf__"), keys, self.name,
                            [(k, True) for k in keys])

    def transform(self, func, **kwargs):
        """pandas ``Series.transform`` — elementwise, shape-
        preserving; same engine path as :meth:`apply` (bare function
        names compile to the matching SQL function JVM-side,
        template strings and callables pass through)."""
        import re as _re
        if isinstance(func, str) and _re.fullmatch(r"\w+", func):
            return self.apply(f"{func}({{self}})")
        return self.apply(func, **kwargs)

    def drop(self, labels, errors: str = "raise") -> "Series":
        """Drop rows by index label (pandas ``Series.drop``): an
        anti-filter against a driver-sized label list; with
        ``errors='raise'`` one tiny count verifies every label hits
        (KeyError parity)."""
        if not isinstance(labels, (list, tuple, set)):
            labels = [labels]
        labels = list(labels)
        if not self._index_cols:
            raise ValueError("drop needs an index")
        key = F.col(self._index_cols[0])
        if errors == "raise" and labels:
            hit = (self._label_filtered(labels, keep=True)
                   .select(key.alias("k")).distinct().count())
            if hit < len(set(labels)):
                raise KeyError(f"{labels!r} not found in axis")
        out = self._label_filtered(labels, keep=False)
        return Series._make(out, self._colexpr, self._index_cols,
                            self.name, self._order)

    def _label_filtered(self, labels, keep: bool):
        """Rows whose index label is (not) in a driver-provided
        list: a literal IN-set while small, a (semi/anti) JOIN
        against a lookup table past _ISIN_LITERAL_MAX — the same
        two-face treatment as isin (a 10^5-literal filter bloats
        plan serialization; the anti join keeps NULL-labeled rows
        exactly like the literal face)."""
        key = F.col(self._index_cols[0])
        if len(labels) <= _ISIN_LITERAL_MAX:
            cond = key.isin(*labels)
            return self._sdf.where(cond if keep
                                   else ~cond | key.isNull())
        spark = self._sdf.sparkSession
        lut = spark.createDataFrame(
            [(v,) for v in labels], ["__lbl__"]).distinct()
        return self._sdf.join(lut, key == F.col("__lbl__"),
                              "left_semi" if keep else "left_anti")

    def get(self, key, default=None):
        """Value at index label ``key``, or ``default`` when absent
        (pandas ``Series.get``) — an explicit driver-side scalar
        fetch (one filtered select). Duplicate labels return a
        Series like pandas."""
        rows = (self._sdf.where(F.col(self._index_cols[0]) == key)
                .select(self._colexpr.alias("v")).collect()
                if self._index_cols else [])
        if not rows:
            return default
        if len(rows) == 1:
            return rows[0]["v"]
        return Series(np.array([r["v"] for r in rows]),
                      name=self.name)

    def reset_index(self, drop: bool = False, name=None):
        """pandas ``Series.reset_index``: ``drop=True`` returns the
        values on a fresh RangeIndex (pure projection + fresh
        positions); otherwise a DataFrame with the index as a
        column."""
        from ..plans.ordinal import ORD_COL, POS_COL
        if drop:
            sdf, alias = self._ordered_sdf(self.name or _VAL)
            key = POS_COL
            if ORD_COL not in sdf.columns:
                sdf, key = sdf.withColumnRenamed(POS_COL, ORD_COL), \
                    ORD_COL
            return Series._make(sdf, F.col(alias), [key],
                                self.name, [(key, True)])
        from .frame import DataFrame
        sdf, a = self._select(self.name or "0")
        idx = [c for c in self._index_cols if c in sdf.columns]
        ren = {c: "index" for c in idx if c in (ORD_COL, "__idx__")}
        out = sdf.withColumnsRenamed(ren) if ren else sdf
        new_idx = [ren.get(c, c) for c in idx]
        order = [(ren.get(c, c), asc) for c, asc in (self._order or [])
                 if ren.get(c, c) in out.columns] or None
        return DataFrame._make(out, [], new_idx + [a], order)

    def truncate(self, before=None, after=None) -> "Series":
        """Rows with index label in ``[before, after]`` (pandas
        ``truncate``; assumes a sorted index like pandas) — a pure
        index-range filter, pushdown-friendly."""
        if not self._index_cols:
            raise ValueError("truncate needs an index")
        if before is not None and after is not None:
            try:
                inverted = before > after
            except TypeError:
                inverted = False
            if inverted:
                raise ValueError(
                    f"Truncate: {after!r} must be after {before!r}")
        key = F.col(self._index_cols[0])
        cond = F.lit(True)
        if before is not None:
            cond = cond & (key >= F.lit(before))
        if after is not None:
            cond = cond & (key <= F.lit(after))
        return Series._make(self._sdf.where(cond), self._colexpr,
                            self._index_cols, self.name, self._order)

    def squeeze(self):
        """Scalar when the Series has exactly one row, else self
        (pandas ``squeeze``) — pays one limit-2 probe job."""
        rows = self._sdf.select(self._colexpr.alias("v")) \
            .limit(2).collect()
        if len(rows) == 1:
            return rows[0]["v"]
        return self

    def transpose(self) -> "Series":
        return self

    @property
    def T(self) -> "Series":
        return self

    def add_prefix(self, prefix: str) -> "Series":
        """Prefix every index label (pandas ``Series.add_prefix``
        acts on the INDEX for Series) — one string projection."""
        return self._relabel(lambda c: F.concat(F.lit(prefix),
                                                c.cast("string")))

    def add_suffix(self, suffix: str) -> "Series":
        return self._relabel(lambda c: F.concat(c.cast("string"),
                                                F.lit(suffix)))

    def _relabel(self, fn) -> "Series":
        if not self._index_cols:
            raise ValueError("needs an index")
        k = self._index_cols[0]
        out = self._sdf.withColumn(k, fn(F.col(k)))
        return Series._make(out, self._colexpr, self._index_cols,
                            self.name, self._order)

    def argsort(self) -> "Series":
        """Positions that sort the values, NA last (pandas' future
        ``argsort`` contract; the deprecated -1-for-NaN flavor is not
        reproduced). Distributed as one ordered projection: fresh
        positions stamp the current order, then the result IS the
        position column re-ordered by value — no driver loop."""
        from ..core.ordering import order_expr
        from ..plans.ordinal import POS_COL, with_dense_ordinal
        sdf, alias = self._ordered_sdf(self.name or _VAL)
        # stamp the sorted order (value nulls-last — Spark sorts NaN
        # greatest, so NA lands last like pandas — with positional
        # tiebreak) as a fresh dense ordinal; the result is the
        # original-position column on that ordinal's RangeIndex
        if _IDX in sdf.columns:
            sdf = sdf.drop(_IDX)
        out = with_dense_ordinal(
            sdf, [order_expr(F.col(alias), True),
                  F.col(POS_COL).asc()], name=_IDX)
        return Series._make(out, F.col(POS_COL).cast("long"),
                            [_IDX], self.name, [(_IDX, True)])

    def compare(self, other: "Series"):
        """Rows where the two Series differ (pandas
        ``Series.compare``): the standard pairwise alignment, one
        null-safe inequality filter, self/other columns."""
        from .frame import DataFrame
        sdf, a, b = self._pair_sdf(other)
        keys = [c for c in self._index_cols
                if c in other._index_cols] or \
            [c for c in sdf.columns if c not in ("__pa__", "__pb__")]
        out = (sdf.where(~a.eqNullSafe(b))
               .select(*keys, a.alias("self"), b.alias("other")))
        return DataFrame._make(out, keys, ["self", "other"],
                               [(k, True) for k in keys])

    def align(self, other: "Series", join: str = "outer"):
        """Pair of index-aligned Series (pandas ``Series.align``):
        ONE join by the shared index (outer/inner/left/right), both
        results reading the same joined plan."""
        if join not in ("outer", "inner", "left", "right"):
            raise ValueError(f"bad join {join!r}")
        how = {"outer": "full_outer", "inner": "inner",
               "left": "left", "right": "right"}[join]
        on = [c for c in self._index_cols if c in other._index_cols]
        if on:
            left, la = self._select("__aa__")
            right, rb = other._select("__ab__")
            sdf = left.select(*on, la).join(
                right.select(*on, rb), on, how)
            keys = on
        else:
            from ..plans.ordinal import POS_COL
            lo, la = self._ordered_sdf("__aa__")
            ro, rb = other._ordered_sdf("__ab__")
            sdf = lo.select(POS_COL, la).join(
                ro.select(POS_COL, rb), POS_COL, how)
            keys = [POS_COL]
        mk = lambda col, nm: Series._make(
            sdf, F.col(col), keys, nm, [(k, True) for k in keys])
        return mk("__aa__", self.name), mk("__ab__", other.name)

    def groupby(self, by, dropna: bool = True):
        """pandas ``Series.groupby``: group this Series by another
        Series (``s.groupby(keys).mean()``) or by an index level
        name. The aligned (key, value) pair becomes a two-column
        frame — same-frame keys are a pure projection, cross-frame
        keys ride the standard pairwise alignment join — and the
        full DataFrameGroupBy surface applies, restricted to the
        value column (one hash-agg shuffle for the aggregations)."""
        from .frame import DataFrame
        vname = self.name or _VAL
        if isinstance(by, str):
            if by not in self._index_cols:
                raise KeyError(by)
            sdf, a = self._select(vname)
            fr = DataFrame._make(sdf, [], [by, a], self._order)
            return fr.groupby(by, dropna=dropna)[a]
        if not isinstance(by, Series):
            raise TypeError(
                f"groupby by= must be a Series or an index level "
                f"name, got {type(by).__name__}")
        kname = by.name or "__sgk__"
        if kname == vname:
            kname = f"{kname}_key"
        sdf, a, b = self._pair_sdf(by)
        out = sdf.select(b.alias(kname), a.alias(vname))
        fr = DataFrame._make(out, [], [kname, vname], None)
        return fr.groupby(kname, dropna=dropna)[vname]

    def reindex(self, index, fill_value=None) -> "Series":
        """Conform to new labels (pandas ``Series.reindex``):
        delegates to the frame reindex — the driver-sized label list
        becomes a tiny position-tagged table, ONE keyed join, fills
        only introduced cells."""
        from .frame import DataFrame
        if not self._index_cols:
            raise ValueError("reindex needs an index")
        vname = self.name or _VAL
        sdf, a = self._select(vname)
        fr = DataFrame._make(sdf, list(self._index_cols), [a],
                             self._order)
        return fr.reindex(index=index, fill_value=fill_value)[a]

    def asof(self, where):
        """Last non-null value at or before label(s) ``where``
        (pandas ``Series.asof``). A scalar pays one ordered limit-1
        probe; a list rides the engine's as-of join (union + keyed
        carry, one shuffle — no per-label loop)."""
        if not self._index_cols:
            raise ValueError("asof needs an index")
        k = self._index_cols[0]
        if not isinstance(where, (list, tuple, np.ndarray)):
            from ..plans.ordinal import POS_COL
            sdf, alias = self._ordered_sdf("__asof_v__")
            rows = (sdf
                    .where((F.col(k) <= F.lit(where))
                           & F.col(alias).isNotNull())
                    .orderBy(F.col(k).desc(), F.col(POS_COL).desc())
                    .select(F.col(alias).alias("v"))
                    .limit(1).collect())
            if rows:
                return rows[0]["v"]
            if not self._sdf.limit(1).count():
                # pandas raises on an empty series (IndexError from
                # its index[0] probe) — mirror it
                raise IndexError("asof on an empty Series")
            return None
        from ..operators.joins import asof_join
        spark = self._sdf.sparkSession
        vname = self.name or _VAL
        left = spark.createDataFrame(
            [(i, w) for i, w in enumerate(where)], ["__wpos__", k])
        right = (self._sdf.where(self._colexpr.isNotNull())
                 .select(F.col(k), self._colexpr.alias(vname)))
        out = asof_join(left, right, on=k, direction="backward")
        vcol = vname if vname in out.columns else f"{vname}_right"
        rows = out.orderBy("__wpos__").select(vcol).collect()
        # dtype from ALL collected values, not rows[0]: a None first
        # hit over string values must not force a float array (that
        # raises), and any non-numeric value anywhere means object
        vals = [r[vcol] for r in rows]
        if any(isinstance(v, str) for v in vals):
            dt = object            # non-numeric anywhere => object
        elif (vals and all(v is not None for v in vals)
              and isinstance(self.spark_type, T.IntegralType)):
            dt = np.int64          # pandas keeps int64 when no miss
        else:
            dt = float             # misses become NaN
        return Series(np.array(vals, dtype=dt), name=self.name)

    def at_time(self, time) -> "Series":
        """pandas ``Series.at_time`` — frame delegation (one exact
        integer time-of-day filter)."""
        fr = self._to_frame_for_io().at_time(time)
        return fr[fr._data_cols[0]]

    def between_time(self, start_time, end_time,
                     inclusive: str = "both") -> "Series":
        """pandas ``Series.between_time`` — frame delegation."""
        fr = self._to_frame_for_io().between_time(
            start_time, end_time, inclusive=inclusive)
        return fr[fr._data_cols[0]]

    def asfreq(self, freq: str, method: str | None = None,
               fill_value=None) -> "Series":
        """pandas ``Series.asfreq`` — frame delegation (distributed
        date_range grid + one equi/as-of join)."""
        fr = self._to_frame_for_io().asfreq(
            freq, method=method, fill_value=fill_value)
        return fr[fr._data_cols[0]]

    def factorize(self, sort: bool = False):
        """pandas ``Series.factorize`` — delegates to the top-level
        face (first-appearance order by default via the carried
        ordinals, value order under ``sort=True``; one grouped
        min-position job + a broadcast literal map; 100k-unique
        guard)."""
        from .. import factorize as _fz
        return _fz(self, sort=sort)

    def resample(self, freq: str):
        """pandas ``Series.resample`` over the (timestamp) index —
        frame delegation to the bucket hash-agg + generated gap grid
        machinery; ``.sum/mean/count/min/max/var/std`` return the
        value column per bucket."""
        if not self._index_cols:
            raise ValueError("resample needs a timestamp index")
        from .frame import DataFrame
        k = self._index_cols[0]
        vname = self.name or _VAL
        sdf, a = self._select(vname)
        # the index rides as a DATA column: _Resampler buckets `on`
        # and aggregates the remaining numeric columns
        fr = DataFrame._make(sdf, [], [k, a], self._order)
        return fr.resample(freq, on=k)

    def reindex_like(self, other: "Series",
                     fill_value=None) -> "Series":
        """Conform to ``other``'s index (pandas ``reindex_like``),
        fully DISTRIBUTED: other's index column left-joins this
        Series — no driver-side label collect, unlike the
        list-driven :meth:`reindex`."""
        if not self._index_cols or not other._index_cols:
            raise ValueError("reindex_like needs an index on both")
        from ..plans.ordinal import POS_COL
        k = self._index_cols[0]
        ok_ = other._index_cols[0]
        vname = self.name or _VAL
        sdf, a = self._select(vname)
        # keep other's labels AS-IS (duplicates included — pandas
        # returns one row per duplicate target label) tagged with
        # their positions so the result follows other's order
        osdf, _ = other._ordered_sdf()
        labels = osdf.select(F.col(ok_).alias(k), F.col(POS_COL))
        out = labels.join(sdf, k, "left")
        if fill_value is not None:
            # cells introduced by reindexing fill; matched NULLs stay
            marked = sdf.withColumn("__had__", F.lit(True))
            out = labels.join(marked, k, "left").withColumn(
                a, F.when(F.col("__had__").isNull(),
                          F.lit(fill_value)).otherwise(F.col(a)))                 .drop("__had__")
        return Series._make(out, F.col(a), [k], self.name,
                            [(POS_COL, True)])

    def combine(self, other: "Series", func,
                fill_value=None) -> "Series":
        """pandas ``Series.combine``: elementwise ``func(a, b)`` over
        the aligned pair — the UNION of the two indexes (sorted, like
        pandas), labels present on one side only see ``fill_value``
        (or NaN) on the other. An arbitrary python scalar function is
        the honest slow path — Arrow-batched (one pandas_udf over the
        zipped pair), never a driver loop."""
        from ..functions._udf import scalar_pandas_udf
        from ..plans.ordinal import POS_COL
        import pandas as pd
        if other._sdf is self._sdf:
            sdf = self._sdf.withColumn("__ha__", F.lit(True)) \
                .withColumn("__hb__", F.lit(True))
            a, b = self._colexpr, other._colexpr
            keys = list(self._index_cols)
        else:
            keys = [c for c in self._index_cols
                    if c in other._index_cols]
            if keys:
                left, la = self._select("__pa__")
                right, rb = other._select("__pb__")
                sdf = left.select(*keys, la,
                                  F.lit(True).alias("__ha__")).join(
                    right.select(*keys, rb,
                                 F.lit(True).alias("__hb__")),
                    keys, "full_outer")
            else:
                lo, la = self._ordered_sdf("__pa__")
                ro, rb = other._ordered_sdf("__pb__")
                sdf = lo.select(POS_COL, la,
                                F.lit(True).alias("__ha__")).join(
                    ro.select(POS_COL, rb,
                              F.lit(True).alias("__hb__")),
                    POS_COL, "full_outer")
                keys = [POS_COL]
            a, b = F.col("__pa__"), F.col("__pb__")
        fv = fill_value

        def batch(cols) -> pd.Series:
            # struct inputs arrive as a pandas DataFrame with the
            # field names as columns (Arrow struct batching);
            # fill_value substitutes ONLY for labels missing from a
            # side's index (the __ha__/__hb__ presence markers) —
            # a NaN VALUE at a present label passes through as NaN,
            # exactly pandas
            import numpy as _np
            if hasattr(cols, "columns"):
                xs, ys = cols["a"], cols["b"]
                ha, hb = cols["ha"], cols["hb"]
            else:
                xs = pd.Series([st["a"] for st in cols])
                ys = pd.Series([st["b"] for st in cols])
                ha = pd.Series([st["ha"] for st in cols])
                hb = pd.Series([st["hb"] for st in cols])
            miss = _np.nan if fv is None else fv
            out = []
            for x, y, px, py in zip(xs, ys, ha, hb):
                if not (px is True or px == True):  # noqa: E712
                    x = miss
                elif x is None or (isinstance(x, float) and x != x):
                    x = _np.nan
                if not (py is True or py == True):  # noqa: E712
                    y = miss
                elif y is None or (isinstance(y, float) and y != y):
                    y = _np.nan
                out.append(func(x, y))
            return pd.Series(out)

        # pandas infers the result dtype from func's outputs (an
        # int64 pair with a float-returning func yields float64);
        # Spark needs the type up front, so numeric inputs emit
        # DOUBLE — the common-type promotion — rather than pinning
        # to the left operand's dtype (which silently truncated
        # e.g. lambda a, b: a / b back to long). Integer-valued
        # results therefore come back float64 where pandas may
        # keep int64; values are exact (< 2^53).
        ret_t = (T.DoubleType()
                 if isinstance(self.spark_type, T.NumericType)
                 and isinstance(other.spark_type, T.NumericType)
                 else self.spark_type)
        udf = scalar_pandas_udf(batch, ret_t)
        pair = F.struct(a.alias("a"), b.alias("b"),
                        F.col("__ha__").alias("ha"),
                        F.col("__hb__").alias("hb"))
        keys = [kk for kk in keys if kk in sdf.columns]
        out = sdf.withColumn("__cmb__", udf(pair)) \
            .drop("__ha__", "__hb__")
        return Series._make(out, F.col("__cmb__"), keys, self.name,
                            [(kk, True) for kk in keys])

    @property
    def loc(self):
        """Label-based selection (pandas ``Series.loc``): scalar
        label (KeyError when absent; duplicate labels return a
        Series), label lists (broadcast-joined past the literal
        budget, like isin), and boolean masks."""
        return _SeriesLoc(self)

    def update(self, other: "Series") -> "Series":
        """pandas ``Series.update`` (returning a NEW Series — the
        engine is immutable, same contract as
        :meth:`DataFrame.update`): overwrite values with ``other``'s
        non-null values at matching index labels; self's row set
        never changes (one left join). Duplicate labels in ``other``
        raise like the frame face."""
        from .frame import DataFrame
        if not self._index_cols or not other._index_cols:
            raise ValueError("update needs an index on both sides")
        k = self._index_cols[0]
        vname = self.name or _VAL
        fr = self._to_frame_for_io()
        ok_ = other._index_cols[0]
        osdf, oa = other._select("__updv__")
        osdf = osdf.select(F.col(ok_).alias(k),
                           F.col(oa).alias(vname))
        ofr = DataFrame._make(osdf, [k], [vname], None)
        return fr.update(ofr)[vname]

    def to_csv(self, filepath: str, **kw):
        """CSV sink — the one-column frame delegation of
        :meth:`DataFrame.to_csv` (same single_file= contract)."""
        return self._to_frame_for_io().to_csv(filepath, **kw)

    def to_json(self, filepath: str, **kw):
        """JSON sink — delegates to :meth:`DataFrame.to_json`."""
        return self._to_frame_for_io().to_json(filepath, **kw)

    def to_latex(self, **kw) -> str:
        """Driver-side LaTeX rendering — delegates to
        :meth:`DataFrame.to_latex` on the one-column frame."""
        return self._to_frame_for_io().to_latex(**kw)

    def swaplevel(self, i=0, j=1) -> "Series":
        """Swap two index levels (metadata only, like the frame
        face) — delegates through the one-column frame."""
        fr = self._to_frame_for_io().swaplevel(i, j)
        return fr[self.name or _VAL]

    def droplevel(self, level) -> "Series":
        """Remove one index level — delegates through the
        one-column frame (metadata + column drop, no job)."""
        fr = self._to_frame_for_io().droplevel(level)
        return fr[self.name or _VAL]

    def reorder_levels(self, order) -> "Series":
        """Rearrange index levels (metadata only) — delegates
        through the one-column frame."""
        fr = self._to_frame_for_io().reorder_levels(order)
        return fr[self.name or _VAL]

    def xs(self, key, level=None, drop_level: bool = True):
        """Cross-section at index label ``key`` (pandas
        ``Series.xs``). Without ``level`` on a flat index: the
        matching VALUE, an explicit driver-side fetch like ``iloc``
        scalars; duplicate labels return a Series (``drop_level``
        is a no-op here — pandas parity, probed r11). Without
        ``level`` on a MultiIndex: the first ``len(key)`` levels
        are consumed, ``drop_level`` honored — a distributed
        filter. With ``level=``: a distributed filter on that index
        level with the level dropped — always a Series (pandas
        shape). Delegates to :meth:`DataFrame.xs`."""
        vname = self.name or _VAL
        if level is not None:
            fr = self._to_frame_ordered().xs(key, level=level,
                                             drop_level=drop_level)
            return fr[vname]
        got = self._to_frame_for_io().xs(key,
                                         drop_level=drop_level)
        if isinstance(got, Series):  # pragma: no cover - defensive
            return got
        from .frame import DataFrame
        if isinstance(got, DataFrame):
            return got[vname]
        return got[vname]            # pandas row Series -> scalar

    def _to_frame_for_io(self):
        from .frame import DataFrame
        vname = self.name or _VAL
        sdf, a = self._select(vname)
        return DataFrame._make(sdf, list(self._index_cols), [a],
                               self._order)

    def _to_frame_ordered(self):
        """Like :meth:`_to_frame_for_io` but the ORDER columns
        survive the projection (``_select`` keeps only index cols +
        value, so the logical order dies with it) — for frame-face
        delegations whose result row order matters (loc masks,
        xs(level=))."""
        from .frame import DataFrame
        vname = self.name or _VAL
        keep = [c for c in dict.fromkeys(
                    list(self._index_cols)
                    + [c for c, _ in (self._order or [])])
                if c in self._sdf.columns and c != vname]
        sdf = self._sdf.select(*[F.col(c) for c in keep],
                               self._colexpr.alias(vname))
        return DataFrame._make(sdf, list(self._index_cols), [vname],
                               self._order)

    def corr(self, other: "Series", method: str = "pearson"):
        """Correlation with another Series (pandas ``Series.corr``;
        engine extension — single JVM ``corr`` aggregate).
        ``method='spearman'`` ranks both sides first (average ties,
        NULLs unranked — the pandas recipe: per-column ranks, then
        Pearson over pairwise-complete rows); each rank is a
        partition-safe sort+window, so spearman costs two ordered
        passes on top of the aggregate."""
        if method == "spearman":
            if not isinstance(other, Series):
                raise TypeError(
                    f"expected Series, got {type(other).__name__}")
            from pyspark.sql import Window

            from ..plans.ordinal import with_dense_ordinal
            sdf, a, b = self._pair_sdf(other)
            pair = sdf.select(a.cast("double").alias("__pa__"),
                              b.cast("double").alias("__pb__")) \
                .filter(F.col("__pa__").isNotNull()
                        & F.col("__pb__").isNotNull())
            out = with_dense_ordinal(pair, [F.col("__pa__").asc()],
                                     name="__rna__")
            out = with_dense_ordinal(out, [F.col("__pb__").asc()],
                                     name="__rnb__")
            # average-rank = mean ordinal of the tie group; the tie
            # windows partition BY VALUE (state per group, not per
            # table), and corr is shift-invariant so no +1
            out = out.select(
                F.avg("__rna__").over(Window.partitionBy("__pa__"))
                .alias("__ra__"),
                F.avg("__rnb__").over(Window.partitionBy("__pb__"))
                .alias("__rb__"))
            return out.agg(F.corr("__ra__", "__rb__")
                           .alias("v")).first()["v"]
        if method != "pearson":
            raise ValueError(f"unsupported method {method!r}")
        return self._pairwise(other, F.corr)

    def cov(self, other: "Series"):
        """Sample covariance with another column of the same frame
        (pandas ``Series.cov``; engine extension)."""
        return self._pairwise(other, F.covar_samp)

    def sort_values(self, ascending: bool = True) -> "Series":
        """Sort by value — distributed range-partitioned sort."""
        sdf, alias = self._select()
        out = sdf.orderBy(order_expr(alias, ascending))
        return Series._make(out, F.col(alias), self._index_cols, self.name,
                            [(alias, ascending)])

    def sort_index(self, ascending: bool = True) -> "Series":
        sdf, alias = self._select()
        idx = [c for c in self._index_cols if c in sdf.columns]
        out = sdf.orderBy(*[order_expr(c, ascending) for c in idx])
        return Series._make(out, F.col(alias), self._index_cols, self.name,
                            [(c, ascending) for c in idx])

    def replace(self, to_replace, value=None) -> "Series":
        """pandas ``Series.replace``: scalar→scalar, ``{old: new}``
        dict, and list→scalar / list→list forms. A pure CASE
        projection — zero shuffles, stays in codegen. NaN keys match
        NULL (the sentinel codec equates them); replacements must fit
        the column's Spark type (pandas' cross-dtype upcasting is
        not replicated — mismatches raise at analysis)."""
        if isinstance(to_replace, dict):
            if value is not None:
                raise TypeError(
                    "dict to_replace does not take a value=")
            pairs = list(to_replace.items())
        elif isinstance(to_replace, (list, tuple)):
            if isinstance(value, (list, tuple)):
                if len(value) != len(to_replace):
                    raise ValueError(
                        f"{len(to_replace)} keys but {len(value)} values")
                pairs = list(zip(to_replace, value))
            else:
                pairs = [(o, value) for o in to_replace]
        else:
            pairs = [(to_replace, value)]

        def _k(v):  # NaN keys/values mean NULL under the codec
            return None if isinstance(v, float) and v != v else v

        expr = self._colexpr
        for o, v in pairs:
            expr = F.when(self._colexpr.eqNullSafe(F.lit(_k(o))),
                          F.lit(_k(v))).otherwise(expr)
        return self._with_col(expr, self.name)

    def map(self, mapping: dict, default=None) -> "Series":
        """Value substitution from a dict (pandas ``Series.map``:
        unmapped ⇒ NULL, or ``default``). Small dicts compile to a
        CASE chain (pure codegen); big dicts become a broadcast-join
        lookup table — same result, no driver-side row loop either
        way."""
        if not isinstance(mapping, dict):
            raise TypeError("map expects a dict; for callables use "
                            "apply()")

        def _k(v):
            # NaN keys/values mean NULL under the engine's codec
            # (r11 — a raw NaN literal would poison downstream JVM
            # aggregates; a NaN KEY must match the NULL rows that
            # represent NaN, like pandas' s.map({nan: ...}))
            return None if isinstance(v, float) and v != v else v

        if len(mapping) <= 64:
            expr = (F.lit(default) if default is not None
                    else F.lit(None))
            for k, v in mapping.items():
                expr = F.when(
                    self._colexpr.eqNullSafe(F.lit(_k(k))),
                    F.lit(_k(v))).otherwise(expr)
            return self._with_col(expr, self.name)
        spark = self._sdf.sparkSession
        items = [(_k(k), _k(v)) for k, v in mapping.items()]
        lut = spark.createDataFrame(items, ["__mk__", "__mv__"])
        joined = self._sdf.join(
            F.broadcast(lut),
            self._colexpr.eqNullSafe(F.col("__mk__")), "left")
        val = (F.coalesce(F.col("__mv__"), F.lit(default))
               if default is not None else F.col("__mv__"))
        out = joined.withColumn("__mapped__", val).drop("__mk__", "__mv__")
        return Series._make(out, F.col("__mapped__"), self._index_cols,
                            self.name, self._order)

    def abs(self) -> "Series":
        return self._with_col(F.abs(self._colexpr))

    __abs__ = abs       # builtin abs(sr), like pandas

    def round(self, decimals: int = 0) -> "Series":
        """Round half-to-even (banker's), matching pandas/NumPy —
        Spark's F.round is HALF_UP, which differs at exact .5 ties
        (np.round(2.5) == 2, not 3); F.bround is the HALF_EVEN
        face."""
        return self._with_col(F.bround(self._colexpr, decimals))

    def any(self) -> bool:
        """True if any non-null value is truthy (pandas skipna
        flavor; empty/all-null ⇒ False). One JVM aggregate."""
        v = self._sdf.agg(F.max(self._colexpr.cast("boolean"))
                          .alias("v")).first()["v"]
        return False if v is None else bool(v)

    def all(self) -> bool:
        """True if every non-null value is truthy (pandas skipna
        flavor; empty/all-null ⇒ True). One JVM aggregate."""
        v = self._sdf.agg(F.min(self._colexpr.cast("boolean"))
                          .alias("v")).first()["v"]
        return True if v is None else bool(v)

    def clip(self, lower=None, upper=None) -> "Series":
        """Bound values to [lower, upper] (pandas ``Series.clip``).
        NULL/NaN stays NULL: Spark's greatest/least SKIP nulls, which
        would silently clamp a missing value to the bound — pandas
        propagates NaN, so the whole expression is null-gated. Bounds
        may be scalars or Series (elementwise, positionally aligned);
        a NULL bound leaves the value unclipped, like pandas NaN
        bounds."""
        def gate(fn):
            return lambda a, b: F.when(a.isNull(), F.lit(None)) \
                .otherwise(fn(a, b))
        # a scalar NaN bound is NO bound (pandas) — left as a raw
        # literal it would win every greatest/least (NaN sorts
        # greatest in Spark) and clamp the whole column (r11)
        if isinstance(lower, float) and lower != lower:
            lower = None
        if isinstance(upper, float) and upper != upper:
            upper = None
        out = self
        if lower is not None:
            out = out._lift(lower, gate(F.greatest))
        if upper is not None:
            out = out._lift(upper, gate(F.least))
        return out

    def value_counts(self, ascending: bool = False,
                     normalize: bool = False,
                     dropna: bool = True, bins=None) -> "Series":
        """Distinct values with occurrence counts, ordered by count
        (one hash-agg shuffle; values become the index).
        ``normalize=True`` returns fractions of total instead —
        computed with a scalar subtotal, not a second pass.
        ``dropna=True`` (pandas default) excludes the NULL value;
        pass False to count NULLs as their own row. ``bins=n``
        composes :meth:`cut` (pandas edge math, interval-string
        labels) before counting."""
        if bins is not None:
            return self.cut(bins).value_counts(
                ascending=ascending, normalize=normalize,
                dropna=dropna)
        sdf, alias = self._select()
        if dropna:
            sdf = sdf.filter(F.col(alias).isNotNull())
        cnt = F.count(F.lit(1))
        if normalize:
            # subtotal as a ONE-ROW aggregate broadcast-cross-joined
            # back in — never a global (unpartitioned) window over the
            # distinct-values table, whose cardinality can approach
            # the row count (ids), single-partitioning the plan
            counts = sdf.groupBy(alias).agg(cnt.alias("__n__"))
            tot = counts.agg(
                F.sum("__n__").cast("double").alias("__tot__"))
            out = (counts.crossJoin(F.broadcast(tot))
                   .withColumn("__cnt__", F.col("__n__") / F.col("__tot__"))
                   .drop("__n__", "__tot__"))
        else:
            out = sdf.groupBy(alias).agg(cnt.cast("long").alias("__cnt__"))
        out = out.orderBy(F.col("__cnt__").asc() if ascending
                          else F.col("__cnt__").desc())
        name = "proportion" if normalize else "count"
        return Series._make(out, F.col("__cnt__"), [alias], name,
                            [("__cnt__", ascending)])

    def ffill(self, limit: int | None = None) -> "Series":
        """Forward-fill (pandas ``Series.ffill``) — the frame's
        partition-safe carry machinery on this one column."""
        return self._fill(forward=True, limit=limit)

    def bfill(self, limit: int | None = None) -> "Series":
        return self._fill(forward=False, limit=limit)

    def pad(self, limit: int | None = None) -> "Series":
        """pandas alias of :meth:`ffill`."""
        return self.ffill(limit=limit)

    def backfill(self, limit: int | None = None) -> "Series":
        """pandas alias of :meth:`bfill`."""
        return self.bfill(limit=limit)

    def items(self):
        """Iterate (label, value) pairs (pandas ``Series.items``) —
        an explicit driver materialization like iterrows."""
        s = self.to_pandas()
        return iter(s.items())

    @property
    def iat(self):
        """Positional scalar access (pandas ``Series.iat``) — the
        iloc integer face."""
        return _SeriesILoc(self)

    @property
    def at(self):
        """Label scalar access (pandas ``Series.at``) — the loc
        scalar face (KeyError when absent)."""
        return _SeriesLoc(self)

    @property
    def dtypes(self):
        """pandas alias of :attr:`dtype` (Series.dtypes == dtype)."""
        return self.dtype

    def case_when(self, caselist) -> "Series":
        """pandas 2.2 ``Series.case_when``: (condition, replacement)
        pairs compile to ONE Catalyst CASE chain — fully codegen'd,
        no Python in the loop. Conditions are engine boolean Series
        (aligned to this Series' plan); unmatched rows keep this
        Series' value, like pandas."""
        if not caselist:
            raise ValueError("caselist must not be empty")
        expr = None
        for cond, repl in caselist:
            c = cond._colexpr if isinstance(cond, Series) else cond
            r = repl._colexpr if isinstance(repl, Series) \
                else F.lit(repl)
            expr = (F.when(c, r) if expr is None
                    else expr.when(c, r))
        return self._with_col(expr.otherwise(self._colexpr))

    def searchsorted(self, value, side: str = "left"):
        """Insertion index keeping sort order (pandas
        ``searchsorted``): for side='left' the count of elements
        strictly below ``value``, side='right' counts <= — ONE
        aggregate per call (a scalar), or one grouped pass for a
        list of probes (no per-probe job)."""
        if side not in ("left", "right"):
            raise ValueError("side must be 'left' or 'right'")
        sdf, alias = self._select("__ss__")
        col = F.col(alias)
        vals = (list(value)
                if isinstance(value, (list, tuple, np.ndarray))
                else None)
        if vals is None:
            op = (col < F.lit(value)) if side == "left" \
                else (col <= F.lit(value))
            return int(sdf.agg(F.count(F.when(op, 1))).collect()[0][0])
        aggs = [F.count(F.when(
            (col < F.lit(v)) if side == "left" else (col <= F.lit(v)),
            1)).alias(f"c{i}") for i, v in enumerate(vals)]
        row = sdf.agg(*aggs).collect()[0]
        return np.array([row[f"c{i}"] for i in range(len(vals))])

    def to_string(self, **kw) -> str:
        """Driver-side render (pandas ``to_string``) — an explicit
        materialization boundary like to_pandas."""
        return self.to_pandas().to_string(**kw)

    def to_markdown(self, **kw) -> str:
        return self.to_pandas().to_markdown(**kw)

    def rename_axis(self, name) -> "Series":
        """Rename the INDEX (pandas ``rename_axis``) — a column
        rename in the plan, no job."""
        if not self._index_cols:
            raise ValueError("rename_axis needs an index")
        old = self._index_cols[0]
        sdf = self._sdf.withColumnRenamed(old, name)
        order = [(name if c == old else c, a) for c, a in
                 (self._order or [])]
        return Series._make(sdf, self._colexpr, [name], self.name,
                            order)

    def set_axis(self, labels) -> "Series":
        """Replace the index with ``labels`` (pandas ``set_axis``) —
        a position-keyed join of the new label table, the reindex
        machinery's shape."""
        labels = list(labels)
        n = len(self)
        if len(labels) != n:
            raise ValueError(
                f"Length mismatch: expected {n} elements, got "
                f"{len(labels)}")
        from ..plans.ordinal import POS_COL
        sdf, alias = self._ordered_sdf()
        spark = sdf.sparkSession
        lut = spark.createDataFrame(
            [(i, l) for i, l in enumerate(labels)],
            [POS_COL, _IDX])
        keep = [c for c in sdf.columns
                if c not in self._index_cols]
        out = sdf.select(*keep).join(F.broadcast(lut), POS_COL)
        return Series._make(out, F.col(alias), [_IDX],
                            self.name, [(POS_COL, True)])

    def _fill(self, forward: bool, limit):
        from .frame import DataFrame
        sdf = self._sdf.withColumn("__fv__", self._colexpr)
        tmp = DataFrame._make(sdf, self._index_cols, ["__fv__"],
                              self._order)
        out = tmp._directional_fill(["__fv__"], None, forward, limit)
        return Series._make(out._sdf, F.col("__fv__"),
                            self._index_cols, self.name, self._order)

    def interpolate(self, method: str = "linear", limit: int | None = None,
                    limit_direction: str | None = None) -> "Series":
        """Linear interpolation of NULL runs (pandas
        ``Series.interpolate``): each missing position gets the value
        on the line between its nearest non-null neighbors; a missing
        edge (only one neighbor) extends that neighbor's value, gated
        by ``limit_direction`` exactly like pandas (default
        'forward': leading NULLs stay NULL, trailing ones extend).
        ``limit`` bounds how many consecutive NULLs fill, counted
        from the donor side per direction.

        Partition-safe at scale: ONE fused pass
        (plans/ordinal.py:with_interp_neighbors) builds the dense
        position plus both (position, value) neighbor donors from a
        single range layout — one Window stage, one per-partition
        stats collect, one broadcast join; driver state is
        n_partitions rows. (The naive dense-ordinal + two ffill
        carries paid three layouts — measured 30s vs this at 16x
        sf0.1.)
        """
        if method != "linear":
            raise ValueError(
                f"only method='linear' is supported, got {method!r}")
        limit_direction = limit_direction or "forward"
        if limit_direction not in ("forward", "backward", "both"):
            raise ValueError(
                "limit_direction must be 'forward', 'backward' or "
                f"'both', got {limit_direction!r}")
        if limit is not None and limit < 1:
            raise ValueError("limit must be >= 1")
        from ..plans.ordinal import with_interp_neighbors
        pairs = [(c, a) for c, a in (self._order or [])
                 if c in self._sdf.columns]
        sdf = with_interp_neighbors(
            self._sdf, self._colexpr.cast("double"),
            order_exprs(pairs) if pairs else None)
        sdf = sdf.withColumnRenamed("__v__", "__iv__")
        p, n, fp = F.col("__iprev__"), F.col("__inext__"), F.col("__ip__")
        interp = (p["v"] + (n["v"] - p["v"]) * (fp - p["p"])
                  / (n["p"] - p["p"]))
        cand = F.when(p.isNotNull() & n.isNotNull(), interp) \
            .otherwise(F.coalesce(p["v"], n["v"]))
        fwd = (p.isNotNull() if limit is None
               else p.isNotNull() & ((fp - p["p"]) <= limit))
        bwd = (n.isNotNull() if limit is None
               else n.isNotNull() & ((n["p"] - fp) <= limit))
        elig = {"forward": fwd, "backward": bwd,
                "both": fwd | bwd}[limit_direction]
        res = F.when(F.col("__iv__").isNotNull(), F.col("__iv__")) \
            .otherwise(F.when(elig, cand))
        sdf = sdf.withColumn("__ires__", res) \
            .drop("__iv__", "__iprev__", "__inext__", "__ip__")
        return Series._make(sdf, F.col("__ires__"), self._index_cols,
                            self.name, self._order)

    def repeat(self, repeats: int) -> "Series":
        """Each value repeated ``repeats`` times consecutively
        (pandas ``Series.repeat`` with a scalar): array_repeat +
        the explode machinery, a narrow generator."""
        if repeats < 0:
            raise ValueError("repeats must be >= 0")
        rep = self._with_col(
            F.array_repeat(self._colexpr, repeats))
        # pandas DROPS rows at repeats=0; Series.explode is
        # posexplode_outer (empty array => one NULL row, correct for
        # pandas explode but wrong here) — filter empties first so
        # the outer generator behaves as an inner one.
        sdf, alias = rep._select()
        sdf = sdf.filter(F.size(F.col(alias)) > 0)
        inner = Series._make(sdf, F.col(alias), rep._index_cols,
                             rep.name, rep._order)
        return inner.explode().rename(self.name)

    def to_frame(self, name=None) -> "DataFrame":
        """One-column DataFrame view (pandas ``to_frame``)."""
        from .frame import DataFrame
        alias = name or self.name or "0"
        sdf, a = self._select(alias)
        return DataFrame._make(sdf, self._index_cols, [alias],
                               self._order)

    def rename(self, name) -> "Series":
        out = self._with_col(self._colexpr)
        out.name = name
        return out

    def copy(self, deep: bool = True) -> "Series":
        return self._with_col(self._colexpr)

    def tolist(self) -> list:
        """Driver-side list export (same boundary as to_pandas)."""
        return self.to_pandas().tolist()

    to_list = tolist

    def item(self):
        """The single value of a length-1 Series (pandas ``item``:
        raises otherwise). One limit(2) probe, not a full count."""
        rows = self._select()[0].limit(2).collect()
        if len(rows) != 1:
            raise ValueError(
                f"can only convert a length-1 Series ({'empty' if not rows else '>1 rows'})")
        return rows[0][-1]

    @property
    def hasnans(self) -> bool:
        """True when any value is NULL — a limit(1) filtered probe,
        the scan short-circuits at the first null."""
        sdf, a = self._select()
        return sdf.filter(F.col(a).isNull()).limit(1).count() > 0

    @property
    def is_unique(self) -> bool:
        """One agg: count == approx-free distinct count."""
        sdf, a = self._select()
        r = sdf.agg(F.count(F.lit(1)).alias("n"),
                    F.count_distinct(F.col(a)).alias("d"),
                    F.count(F.col(a)).alias("nn")).first()
        # pandas counts NaN as a value; >1 NULL breaks uniqueness
        return r["d"] + min(r["n"] - r["nn"], 1) == r["n"]

    @property
    def is_monotonic_increasing(self) -> bool:
        return self._monotonic(increasing=True)

    @property
    def is_monotonic_decreasing(self) -> bool:
        return self._monotonic(increasing=False)

    def _monotonic(self, increasing: bool) -> bool:
        """pandas flavor: any NaN -> False; else no adjacent
        violation. One null probe + one boundary-carry shift with a
        limit(1) violation probe — never a global window."""
        if self.hasnans:
            return False
        sh = self.shift(1)
        cur = Series._make(sh._sdf, self._colexpr, self._index_cols,
                           self.name, sh._order)
        bad = (cur < sh) if increasing else (cur > sh)
        sdf, a = bad._select()
        # the head row's shifted neighbor is NULL -> comparison NULL
        # -> filter drops it, as it should
        return sdf.filter(F.col(a)).limit(1).count() == 0

    def argmax(self) -> int:
        """Positional index of the max (pandas ``argmax``): one
        max_by aggregate over the dense position."""
        return self._argpos(True)

    def argmin(self) -> int:
        return self._argpos(False)

    def _argpos(self, is_max: bool) -> int:
        from ..plans.ordinal import with_dense_ordinal
        sdf, a = self._select()
        pairs = [(c, x) for c, x in (self._order or [])
                 if c in sdf.columns]
        sdf = with_dense_ordinal(sdf, order_exprs(pairs) or None,
                                 name="__ap__")
        fn = F.max_by if is_max else F.min_by
        # first-occurrence tiebreak: max_by wants the LARGEST
        # (value, -pos), min_by the SMALLEST (value, pos) — both pick
        # the smallest position among ties, like pandas
        tie = (-F.col("__ap__")) if is_max else F.col("__ap__")
        v = sdf.agg(fn(F.col("__ap__"),
                       F.when(F.col(a).isNotNull(),
                              F.struct(F.col(a).alias("v"),
                                       tie.alias("t"))))
                    .alias("p")).first()["p"]
        return -1 if v is None else int(v)

    def eq(self, o): return self._lift(o, lambda a, b: a == b)
    def ne(self, o): return self._lift(o, lambda a, b: a != b)
    def lt(self, o): return self._lift(o, lambda a, b: a < b)
    def le(self, o): return self._lift(o, lambda a, b: a <= b)
    def gt(self, o): return self._lift(o, lambda a, b: a > b)
    def ge(self, o): return self._lift(o, lambda a, b: a >= b)

    def take(self, indices) -> "Series":
        return self.iloc[list(indices)]

    def sample(self, fraction=None, seed: int = 42, n=None,
               frac=None, random_state=None) -> "Series":
        """Per-partition Bernoulli sample / exact-n hash top-n — the
        frame machinery on this one column."""
        f = self.to_frame("__s__").sample(
            fraction=fraction, seed=seed, n=n, frac=frac,
            random_state=random_state)
        return Series._make(f._sdf, F.col("__s__"), f._index_cols,
                            self.name, f._order)

    def describe(self, approx: bool = False, percentiles=None) -> "Series":
        """count/mean/std/min/quantiles/max as a Series (pandas
        Series.describe) — the frame's ONE-job describe on this
        column."""
        f = self.to_frame("__d__").describe(approx=approx,
                                            percentiles=percentiles)
        return Series._make(f._sdf, F.col("__d__"), f._index_cols,
                            self.name, f._order)

    def drop_duplicates(self, keep: str = "first") -> "Series":
        """Distinct VALUES keeping the first/last occurrence's label
        (pandas flavor) — one hash agg on the value with a positional
        min/max tiebreak."""
        from ..plans.ordinal import with_dense_ordinal
        sdf, a = self._select("__v__")
        pairs = [(c, x) for c, x in (self._order or [])
                 if c in sdf.columns]
        sdf = with_dense_ordinal(sdf, order_exprs(pairs) or None,
                                 name="__dp__")
        agg = (F.min if keep == "first" else F.max)(F.col("__dp__"))
        keep_pos = (sdf.groupBy("__v__")
                    .agg(agg.alias("__dp__"))
                    .withColumnRenamed("__v__", "__kv__")
                    .withColumnRenamed("__dp__", "__kp__"))
        # null-SAFE value match: pandas keeps one NaN row; a
        # null-unsafe semi join would drop every NULL
        out = sdf.join(
            keep_pos,
            F.col("__v__").eqNullSafe(F.col("__kv__"))
            & (F.col("__dp__") == F.col("__kp__")), "left_semi")
        return Series._make(out, F.col("__v__"),
                            self._index_cols, self.name,
                            [("__dp__", True)])

    def duplicated(self, keep: str = "first") -> "Series":
        """Boolean mask of repeated values (pandas flavor) — the
        frame machinery on this one column."""
        f = self.to_frame("__d__")
        return f.duplicated(subset=["__d__"], keep=keep)

    def equals(self, other: "Series") -> bool:
        return self.to_frame("__e__").equals(other.to_frame("__e__"))

    def product(self):
        return self.prod()

    def aggregate(self, *a, **k):
        return self.agg(*a, **k)

    def keys(self):
        return self.index

    def pipe(self, func, *args, **kwargs):
        """pandas ``pipe``: ``func(self, ...)`` — composition sugar."""
        return func(self, *args, **kwargs)

    def first_valid_index(self):
        """Label of the first non-null value (pandas flavor): ONE
        ``min_by`` aggregate over the ordered position — no sort, no
        collect beyond one row."""
        return self._valid_index(first=True)

    def last_valid_index(self):
        return self._valid_index(first=False)

    def _valid_index(self, first: bool):
        from ..plans.ordinal import POS_COL, with_dense_ordinal
        sdf = self._sdf.withColumn("__fv__", self._colexpr)
        pairs = [(c, a) for c, a in (self._order or [])
                 if c in sdf.columns]
        sdf = with_dense_ordinal(sdf, order_exprs(pairs) or None,
                                 name="__fvp__")
        label = None
        for c in self._index_cols:
            if c in sdf.columns and c != ORD_COL:
                label = F.col(c)
                break
        if label is None:
            label = F.col(ORD_COL) if ORD_COL in sdf.columns \
                else F.col("__fvp__")
        agg = (F.min_by if first else F.max_by)(
            label, F.when(F.col("__fv__").isNotNull(),
                          F.col("__fvp__")))
        return sdf.agg(agg.alias("v")).first()["v"]

    def dot(self, other: "Series") -> float:
        """Inner product with another Series (pandas ``Series.dot``):
        positional alignment, then ONE sum-of-products aggregate."""
        pair = self._pairwise_sdf(other)
        row = pair.agg(F.sum(F.col("__x__") * F.col("__y__"))
                       .alias("v")).first()
        return row["v"]

    def _pairwise_sdf(self, other: "Series"):
        """Positionally aligned (__x__, __y__) projection of two
        Series — shared by dot (same machinery class as corr)."""
        from ..plans.ordinal import with_dense_ordinal
        a, aa = self._select("__x__")
        b, bb = other._select("__y__")
        la = with_dense_ordinal(a.select("__x__"), name="__dp__")
        lb = with_dense_ordinal(b.select("__y__"), name="__dp__")
        return la.join(lb, "__dp__", "inner")

    def autocorr(self, lag: int = 1):
        """Lag-N self-correlation (pandas ``Series.autocorr``):
        Pearson between the series and itself shifted. The shift
        output keeps the source column, so both sides share one sdf
        and the stat is a single aggregate after the one-pass
        boundary-carry shift."""
        sh = self.shift(lag)
        orig = Series._make(sh._sdf, self._colexpr, self._index_cols,
                            self.name, sh._order)
        return orig._pairwise(sh, F.corr)

    def nunique(self, dropna: bool = True, approx: bool = False):
        """Distinct-value count (eager scalar, pandas flavor).
        ``approx=True`` uses HyperLogLog++ (approx_count_distinct) —
        the sketch path for extreme-cardinality columns where the
        exact distinct shuffle is the bottleneck."""
        c = self._colexpr
        if approx:
            expr = F.approx_count_distinct(c)
        else:
            expr = F.count_distinct(c)
        row = self._sdf.agg(expr.alias("n")).first()
        n = int(row["n"])
        if not dropna:
            has_null = self._sdf.where(c.isNull()).limit(1).count() > 0
            n += int(has_null)
        return n

    def mode(self) -> "Series":
        """Most frequent value(s) — ALL ties returned, sorted
        ascending (pandas semantics). Two hash aggs, no global sort
        of the data itself."""
        sdf, alias = self._select()
        # pandas mode(dropna=True) default: NaN never counts as a
        # candidate value (it used to win ties as a NULL group here)
        counts = sdf.where(F.col(alias).isNotNull()).groupBy(alias).agg(
            F.count(F.lit(1)).alias("__cnt__"))
        # max count as a ONE-ROW aggregate broadcast back — a global
        # window here would single-partition the distinct-values
        # table, which scales with cardinality
        mx = counts.agg(F.max("__cnt__").alias("__max__"))
        out = (counts.crossJoin(F.broadcast(mx))
               .where(F.col("__cnt__") == F.col("__max__"))
               .select(alias).orderBy(alias))
        return Series._make(out, F.col(alias), [], self.name,
                            [(alias, True)])

    def nlargest(self, n: int = 5) -> "Series":
        """Top-n values: distributed TakeOrdered, never a full sort.
        NaN sorts LAST in both directions like pandas (Spark's asc
        order would otherwise surface NULLs first in ``nsmallest``);
        it only appears when n exceeds the non-null count."""
        sdf, alias = self._select()
        out = sdf.orderBy(F.col(alias).desc_nulls_last()).limit(n)
        return Series._make(out, F.col(alias), self._index_cols, self.name,
                            [(alias, False)])

    def nsmallest(self, n: int = 5) -> "Series":
        sdf, alias = self._select()
        out = sdf.orderBy(F.col(alias).asc_nulls_last()).limit(n)
        return Series._make(out, F.col(alias), self._index_cols, self.name,
                            [(alias, True)])

    def idxmax(self):
        """Index label of the maximum (eager scalar, pandas flavor;
        engine extension). One distributed TakeOrdered(1) — ties break
        on the smallest index, matching pandas' first-occurrence rule
        when the index is the insertion order."""
        return self._idx_of(ascending=False)

    def idxmin(self):
        return self._idx_of(ascending=True)

    def _idx_of(self, ascending: bool):
        idx = self._index_cols[0] if self._index_cols else None
        sdf, alias = self._select()
        if idx is None or idx not in sdf.columns:
            # scan-backed / indexless frame: the label is the fresh
            # dense position (one partition-offset two-pass, no global
            # window — plans/ordinal.py)
            from ..plans.ordinal import POS_COL
            sdf, alias = self._ordered_sdf()
            idx = POS_COL
        val = order_expr(alias, ascending)
        row = sdf.orderBy(val, F.col(idx).asc()).select(idx).first()
        return None if row is None else row[0]

    def shift(self, periods: int = 1, fill_value=None) -> "Series":
        """Values moved by ``periods`` along the logical order, NULLs
        (or ``fill_value``) at the edge (pandas flavor; engine
        extension).

        Partition-safe at any scale: within-partition lag/lead plus a
        driver-side boundary carry of n_partitions x |periods| edge
        values (plans/ordinal.py:with_boundary_shift) — never a global
        single-partition window. Supply a meaningful sort
        (sort_values/sort_index) upstream; an unordered scan shifts in
        the current layout order. ``fill_value`` fills only the
        positions the shift introduced, never nulls that were already
        in the data — a constant marker column rides the same
        one-pass carry to tell the two apart."""
        sdf = self._sdf
        order = order_exprs(self._order or [], sdf.columns)
        if fill_value is None:
            from ..plans.ordinal import with_boundary_shift
            out = with_boundary_shift(sdf, self._colexpr, periods,
                                      order_by=order or None)
        else:
            from ..plans.ordinal import with_boundary_shifts
            out = with_boundary_shifts(
                sdf, {"__shift__": self._colexpr, "__smk__": F.lit(1)},
                periods, order_by=order or None)
            out = out.withColumn(
                "__shift__",
                F.when(F.col("__smk__").isNull(), F.lit(fill_value))
                .otherwise(F.col("__shift__"))).drop("__smk__")
        return Series._make(out, F.col("__shift__"), self._index_cols,
                            self.name, self._order)._tag_rowpar(sdf)

    def diff(self, periods: int = 1) -> "Series":
        """self - self.shift(periods) in one window pass."""
        shifted = self.shift(periods)
        return shifted._with_col(
            self._colexpr.cast("double")
            - F.col("__shift__").cast("double"))

    def _cumulative(self, kind: str) -> "Series":
        sdf = self._sdf
        order = order_exprs(self._order or [], sdf.columns)
        from ..plans.ordinal import with_prefix_aggs
        v = (self._colexpr.cast("double") if kind in ("sum", "prod")
             else self._colexpr)
        out = with_prefix_aggs(sdf, {"__cum__": (v, kind)},
                               order or None)
        # pandas emits NaN AT a missing position while still skipping
        # it in the running accumulation ([1, nan, 2].cumsum() ->
        # [1, nan, 3]) — gate the output, not the accumulator (r5)
        cum = F.when(self._colexpr.isNull(), F.lit(None)) \
            .otherwise(F.col("__cum__"))
        return Series._make(out, cum, self._index_cols,
                            self.name, self._order)._tag_rowpar(sdf)

    def cumsum(self) -> "Series":
        """Cumulative sum along the logical order (pandas flavor;
        engine extension). Partition-safe at any scale: a parallel
        prefix scan (plans/ordinal.with_prefix_aggs), never a global
        single-partition window — same machinery as :meth:`shift`.

        Examples
        --------
        >>> import baloo_spark as bl
        >>> df = bl.DataFrame({"k": [0, 1, 2], "x": [1.0, 2.0, 3.0]})
        >>> df.sort_values("k")["x"].cumsum().to_pandas().tolist()
        [1.0, 3.0, 6.0]
        """
        return self._cumulative("sum")

    def cumprod(self) -> "Series":
        return self._cumulative("prod")

    def cummin(self) -> "Series":
        return self._cumulative("min")

    def cummax(self) -> "Series":
        return self._cumulative("max")

    def pct_change(self, periods: int = 1) -> "Series":
        """Fractional change vs the value ``periods`` back along the
        logical order: x/x.shift(periods) - 1 in one boundary-carry
        window pass (pandas flavor; engine extension)."""
        shifted = self.shift(periods)
        return shifted._with_col(
            self._colexpr.cast("double")
            / F.col("__shift__").cast("double") - 1)

    def rolling(self, window, min_periods: int | None = None,
                center: bool = False):
        """Fixed-size window aggregations along the logical order
        (pandas ``Series.rolling``). Trailing ``.sum() .mean()
        .count() .var() .std()`` compose from partition-safe prefix
        scans (``rolling(i) = prefix(i) - prefix(i - window)``) plus
        ONE shared boundary-carry shift — never a global
        single-partition window. Order statistics (``min max median
        quantile skew kurt sem rank apply``) and every ``center=True``
        window ride the bounded local-carry pass
        (plans/ordinal.with_rolling_locals): one frozen layout, a
        two-sided donor carry, pandas' C kernels in one Arrow pass.
        A str/timedelta ``window`` ('2h', '30min') rolls a TIME
        offset over the datetime index instead — one prefix pass +
        one as-of join (see :class:`_TimeRolling`)."""
        import datetime as _dt
        if isinstance(window, str) or isinstance(
                window, _dt.timedelta) or type(window).__name__ in (
                "Timedelta",):
            if center:
                raise ValueError("offset windows have no center=")
            if isinstance(window, str):
                from .datetimes import freq_to_us
                us = freq_to_us(window)
            else:
                us = int(window.total_seconds() * 1_000_000)
            if us <= 0:
                raise ValueError(f"window offset must be positive, "
                                 f"got {window!r}")
            return _TimeRolling(self, us,
                                1 if min_periods is None
                                else min_periods)
        return _Rolling(self, window, min_periods, center)

    def ewm(self, com=None, span=None, halflife=None, alpha=None,
            min_periods: int = 0, adjust: bool = True,
            ignore_na: bool = False, times=None):
        """Exponentially weighted windows (pandas ``Series.ewm``,
        both ``adjust`` flavors): ``.mean()``. Exactly one of
        com/span/halflife/alpha selects the decay (pandas
        conversions: alpha = 1/(1+com) = 2/(span+1) =
        1-exp(-ln2/halflife)).

        The EWM recurrence is NOT a prefix sum (its closed form
        overflows r^-t), so it runs as a dedicated two-pass decayed
        carry scan — partition-local pandas C kernels plus an
        n_partitions driver carry (plans/ordinal.with_ewm_mean for
        adjust=True's num/den pair; with_ewm_mean_noadjust for the
        recursive streaming-EMA form, whose carry is the (y, w)
        state merged through per-observation affine maps); never a
        global window, never a per-row Python loop."""
        import datetime as _dt
        import pandas as pd
        timeish_hl = isinstance(
            halflife, (str, _dt.timedelta, pd.Timedelta))
        if isinstance(times, Series):
            # the natural pandas spelling ewm(times=df["t"]): a
            # SAME-FRAME Series resolves to its backing column (the
            # stamp values ARE that column, row for row); a foreign
            # Series would need a positional re-alignment join whose
            # cost hides badly inside a decay scan — name the string
            # spelling instead
            nm = times.name
            if (times._sdf is self._sdf and isinstance(nm, str)
                    and nm in self._sdf.columns):
                times = nm
            else:
                raise TypeError(
                    "ewm(times=...) takes a column NAME (or a Series "
                    "selected from this same frame); pass "
                    f"times={nm!r} as a string" if isinstance(nm, str)
                    else "ewm(times=...) takes a column NAME or a "
                    "Series selected from this same frame")
        if times is not None or timeish_hl:
            # TIME-decay flavor (pandas ewm(times=...)): halflife is
            # a Timedelta/offset string; weights follow actual stamp
            # distances (times=None falls back to the datetime index
            # level). pandas only defines adjust=True mean here.
            if halflife is None or any(
                    v is not None for v in (com, span, alpha)):
                raise ValueError(
                    "ewm(times=...) takes halflife (a Timedelta or "
                    "offset string) and no other decay spelling")
            if not adjust:
                raise NotImplementedError(
                    "ewm(times=..., adjust=False) is not supported "
                    "(pandas refuses it too)")
            hl_us = pd.Timedelta(halflife).value / 1000.0
            return _TimeEWM(self, hl_us, times, min_periods)
        given = sum(v is not None
                    for v in (com, span, halflife, alpha))
        if given != 1:
            raise ValueError(
                "pass exactly one of com, span, halflife, alpha")
        import math
        if alpha is None:
            if com is not None:
                alpha = 1.0 / (1.0 + com)
            elif span is not None:
                alpha = 2.0 / (span + 1.0)
            else:
                alpha = 1.0 - math.exp(-math.log(2.0) / halflife)
        return _EWM(self, float(alpha), min_periods, ignore_na,
                    adjust=bool(adjust))

    def expanding(self, min_periods: int = 1):
        """Growing-window aggregations from the first row (pandas
        ``Series.expanding``): ``.sum() .mean() .count() .min()
        .max() .var() .std()``. Every stat composes from
        partition-safe prefix scans (plans/ordinal.with_prefix_aggs)
        — and unlike the fixed rolling window, min/max ARE
        prefix-decomposable here, so every agg is ONE scan pass with
        a kilobyte driver carry, never a global window."""
        return _Expanding(self, min_periods)

    def rank(self, method: str = "average", ascending: bool = True,
             pct: bool = False) -> "Series":
        """Global value rank (pandas flavor, 1-based; default method
        'average' like pandas). Methods map to
        the partition-safe schemes of ``DataFrame.with_rank``:
        'first' -> dense ordinal + 1 (row_number), 'min'/'max'/
        'average' (pandas' default; float ranks) -> that statistic of
        the tie group's consecutive ordinals, 'dense' -> ordinal
        among distinct values.

        NULLs are left unranked (NULL rank — pandas na_option='keep'):
        values sort nulls-LAST so non-null ranks are 1..n_non_null
        regardless of direction. 'first' breaks ties by LOGICAL
        position (a fresh dense positional column over the series
        order), not physical partition layout — the ordinal alone is
        layout-dependent under ties, so ranks would differ across
        repartitions of the same frame."""
        from pyspark.sql import Window

        from ..plans.ordinal import POS_COL, with_dense_ordinal

        def _val_order(alias):
            return (F.col(alias).asc_nulls_last() if ascending
                    else F.col(alias).desc_nulls_last())

        if method == "first":
            sdf, alias = self._ordered_sdf("__rv__")
            ob = [_val_order(alias), F.col(POS_COL).asc()]
            out = with_dense_ordinal(sdf, ob, name="__rank__")
            out = out.withColumn(
                "__rank__",
                F.when(F.col(alias).isNotNull(),
                       (F.col("__rank__") + 1).cast("long"))) \
                .drop(POS_COL)
        elif method in ("min", "average", "max"):
            sdf, alias = self._select("__rv__")
            out = with_dense_ordinal(sdf, [_val_order(alias)],
                                     name="__rn__")
            w = Window.partitionBy(F.col(alias))
            # ranks within a tie group are consecutive ordinals, so
            # min/max/average of the group's ordinals give the three
            # pandas tie policies from the same window
            if method == "min":
                agg = (F.min("__rn__").over(w) + 1).cast("long")
            elif method == "max":
                agg = (F.max("__rn__").over(w) + 1).cast("long")
            else:       # pandas' default: mean rank of the tie group
                agg = (F.avg("__rn__").over(w) + 1).cast("double")
            out = (out.withColumn(
                "__rank__", F.when(F.col(alias).isNotNull(), agg))
                   .drop("__rn__"))
        elif method == "dense":
            sdf, alias = self._select("__rv__")
            distinct = sdf.select(alias).distinct()
            keyed = with_dense_ordinal(distinct, [_val_order(alias)],
                                       name="__dr__")
            cond = sdf[alias].eqNullSafe(keyed[alias])
            out = sdf.join(keyed, cond).drop(keyed[alias])
            out = (out.withColumn(
                "__rank__",
                F.when(F.col(alias).isNotNull(),
                       (F.col("__dr__") + 1).cast("long")))
                   .drop("__dr__"))
        else:
            raise ValueError(
                f"unsupported rank method: {method!r} (supported: "
                f"'average', 'min', 'max', 'first', 'dense')")
        if pct:
            # pandas pct=True: rank / #non-null (dense: / #distinct
            # non-null). A one-row aggregate broadcast-cross-joined in
            # — lazy and scale-safe, never a global window partition.
            denom = (F.count_distinct(F.col(alias)) if method == "dense"
                     else F.count(F.col(alias)))
            cnt = out.agg(denom.cast("double").alias("__nn__"))
            out = out.crossJoin(F.broadcast(cnt))
            out = out.withColumn(
                "__rank__",
                (F.col("__rank__") / F.col("__nn__")).cast("double")) \
                .drop("__nn__")
        return Series._make(out, F.col("__rank__"), self._index_cols,
                            self.name, self._order)._tag_rowpar(self._sdf)

    def quantile(self, q, approx: bool = False,
                 accuracy: int = 10000,
                 interpolation: str = "linear"):
        """Quantiles (engine extension). A scalar ``q`` returns a
        Python float (pandas flavor); a list returns a Series indexed
        by quantile. Default is EXACT linear-interpolated (ANSI
        percentile_cont / DuckDB quantile_cont) — correct locally,
        but the exact aggregate buffers the value multiset per
        partition, so at 100 TB use ``approx=True``: Spark's
        Greenwald-Khanna sketch (percentile_approx) — mergeable,
        bounded memory (~``accuracy`` entries), rank error <=
        1/accuracy, returns an actual data element (discrete;
        ``interpolation`` is ignored on that face). Non-linear exact
        interpolations (lower/higher/nearest/midpoint) resolve exact
        ranks driver-side from one COUNT, then fetch the rank values
        with percentile_disc — still a value-buffering exact
        aggregate; prefer ``approx=True`` at scale."""
        scalar = isinstance(q, (int, float))
        qs = [q] if scalar else list(q)
        d = self._colexpr.cast("double")
        if approx or interpolation == "linear":
            # ONE aggregate with an array of percentages: per-p
            # percentile expressions would each buffer/sketch every
            # row independently
            qarr = F.expr(
                "array(" + ",".join(f"{float(p)!r}D" for p in qs) + ")")
            agg = (F.percentile_approx(d, qarr, F.lit(accuracy))
                   if approx else F.percentile(d, qarr))
            row_df = self._sdf.agg(agg.alias("__qs__")).select(*[
                F.element_at(F.col("__qs__"), F.lit(i + 1)).alias(f"q{p}")
                for i, p in enumerate(qs)])
        else:
            if interpolation not in ("lower", "higher", "nearest",
                                     "midpoint"):
                raise ValueError(
                    f"unknown interpolation {interpolation!r}")
            import math
            n = self._sdf.agg(F.count(d).alias("n")).first()["n"]
            spark = self._sdf.sparkSession
            if n == 0:
                vals = [None] * len(qs)
            else:
                # pandas' np.percentile roundtrip (see qcut)
                hs = [(n - 1) * ((float(p) * 100) / 100) for p in qs]
                needed = sorted({k for h in hs
                                 for k in (math.floor(h), math.ceil(h))})
                tmp = self._sdf.select(d.alias("__pd_v__"))
                # (k+0.5)/n targets 1-indexed rank k+1 robustly:
                # percentile_disc picks the first value with cum
                # fraction >= p, immune to float-rank drift
                row = tmp.agg(*[
                    F.expr(f"percentile_disc({(k + 0.5) / n!r}D) "
                           "WITHIN GROUP (ORDER BY __pd_v__)")
                    .alias(f"r{k}") for k in needed]).first()
                at = {k: row[f"r{k}"] for k in needed}
                vals = []
                for h in hs:
                    a, b = at[math.floor(h)], at[math.ceil(h)]
                    if interpolation == "lower":
                        vals.append(a)
                    elif interpolation == "higher":
                        vals.append(b)
                    elif interpolation == "midpoint":
                        vals.append(None if a is None else (a + b) / 2)
                    else:  # nearest: numpy half-to-even on the rank
                        vals.append(at[round(h)])
            row_df = spark.range(1).select(*[
                F.lit(v).cast("double").alias(f"q{p}")
                for p, v in zip(qs, vals)])
        if scalar:
            v = row_df.first()[f"q{qs[0]}"]
            return float("nan") if v is None else float(v)
        pairs = ", ".join(f"'{p}', `q{p}`" for p in qs)
        out = row_df.select(F.expr(
            f"stack({len(qs)}, {pairs}) as (`{_IDX}`, `__q__`)"))
        return Series._make(out, F.col("__q__"), [_IDX], self.name, None)

    def median(self, approx: bool = False, accuracy: int = 10000):
        fn = (F.percentile_approx(self._colexpr.cast("double"),
                                  F.lit(0.5), F.lit(accuracy))
              if approx else
              F.percentile(self._colexpr.cast("double"), F.lit(0.5)))
        return self._sdf.agg(fn.alias("m")).first()["m"]

    def cut(self, bins, labels=None, right: bool = True) -> "Series":
        """Bin values into explicit intervals (pandas ``pd.cut``:
        half-open ``(a, b]`` by default, ``[a, b)`` with
        ``right=False``; out-of-range ⇒ NULL). ``bins`` may be an int
        (pandas equal-width binning from min/max, with the 0.1%-range
        outer-edge padding so extrema land inside) — that face runs
        ONE tiny min/max aggregate first. ``labels=False`` emits
        integer bin codes. Binning itself is a pure CASE expression —
        no shuffle, ANSI-replayable bit-for-bit."""
        if isinstance(bins, int):
            if bins < 1:
                raise ValueError(f"bins must be >= 1, got {bins}")
            d = self._colexpr.cast("double")
            row = self._sdf.agg(F.min(d).alias("mn"),
                                F.max(d).alias("mx")).first()
            mn, mx = row["mn"], row["mx"]
            if mn is None:
                return self._with_col(
                    F.lit(None).cast("double" if labels is False
                                     else "string"), self.name)
            mn, mx = float(mn), float(mx)
            if mn == mx:  # pandas: widen a degenerate range by 0.1%
                mn -= 0.001 * abs(mn) if mn != 0 else 0.001
                mx += 0.001 * abs(mx) if mx != 0 else 0.001
            step = (mx - mn) / bins
            edges = [mn + i * step for i in range(bins)] + [mx]
            adj = (mx - mn) * 0.001
            if right:
                edges[0] -= adj
            else:
                edges[-1] += adj
            bins = edges
        if len(bins) < 2:
            raise ValueError("need at least 2 bin edges")
        if labels not in (None, False) and len(labels) != len(bins) - 1:
            raise ValueError(f"expected {len(bins) - 1} labels, got "
                             f"{len(labels)}")
        c = self._colexpr.cast("double")
        codes = labels is False
        # pandas prints INTEGER bin edges without decimals
        # ('(0, 1]' for bins=[0,1], '(0.0, 1.0]' for [0.0, 1.0]) —
        # the label dtype follows the edges the caller passed (r11)
        int_edges = all(isinstance(b, (int, np.integer))
                        and not isinstance(b, bool) for b in bins)

        def _e(v):
            return str(int(v)) if int_edges else str(float(v))
        expr = F.lit(None).cast("double" if codes else "string")
        for i in range(len(bins) - 1):
            lo, hi = float(bins[i]), float(bins[i + 1])
            if right:
                cond = (c > lo) & (c <= hi)
                dflt = f"({_e(lo)}, {_e(hi)}]"
            else:
                cond = (c >= lo) & (c < hi)
                dflt = f"[{_e(lo)}, {_e(hi)})"
            lab = (F.lit(float(i)) if codes
                   else F.lit(labels[i] if labels else dflt))
            expr = F.when(cond, lab).otherwise(expr)
        return self._with_col(expr, self.name)

    def qcut(self, q, labels=None, approx: bool = False,
             accuracy: int = 10000, retbins: bool = False,
             duplicates: str = "raise") -> "Series":
        """Quantile-based binning (pandas ``pd.qcut``): ``q``
        equal-frequency bins, or an explicit list of quantiles
        (``[0, .5, 1]``). One tiny percentile aggregate fetches all
        edges in a single array call (one value buffer, not one per
        edge), then binning is the same narrow CASE as :meth:`cut`
        with the first bin closed on the left. ``labels=False`` emits
        integer bin codes; ``duplicates='drop'`` collapses repeated
        edges like pandas. Edges are exact interpolated by default;
        ``approx=True`` swaps in the Greenwald-Khanna sketch
        (percentile_approx) — the 100 TB path, since exact
        percentiles buffer the value multiset."""
        if isinstance(q, int):
            if q < 1:
                raise ValueError(f"q must be >= 1, got {q}")
            ps = [i / q for i in range(q + 1)]
        else:
            ps = [float(p) for p in q]
            if len(ps) < 2 or sorted(ps) != ps \
                    or ps[0] < 0 or ps[-1] > 1:
                raise ValueError(
                    "quantile list must be increasing within [0, 1]")
        d = self._colexpr.cast("double")
        if approx:
            qarr = F.expr(
                "array(" + ",".join(f"{float(p)!r}D" for p in ps) + ")")
            row = self._sdf.agg(F.percentile_approx(
                d, qarr, F.lit(accuracy)).alias("__e__")).first()
            edges = list(row["__e__"])
        else:
            # pandas qcut bins exactly where numpy.quantile's lerp
            # puts the edges — Spark's percentile_cont formula differs
            # in the last ulp (a+(b-a)*t vs lowerVal*(hi-pos)+
            # higherVal*(pos-lo)), which flips edge-valued rows
            # between bins. Resolve exact ranks driver-side from one
            # COUNT, fetch the rank values with percentile_disc
            # ((k+0.5)/n targets 1-indexed rank k+1 robustly), and
            # replay numpy's branchy lerp bit-for-bit. Two tiny jobs;
            # both are mergeable aggregates (percentile_disc buffers
            # the multiset like any exact percentile — approx=True is
            # the 100 TB path either way).
            import math
            n = self._sdf.agg(F.count(d).alias("n")).first()["n"]
            if n == 0:
                edges = [None]
            else:
                # pandas routes quantiles through np.percentile:
                # the q*100 -> /100 roundtrip perturbs p by an ulp,
                # moving the virtual index — replay it for parity
                hs = [(n - 1) * ((float(p) * 100) / 100) for p in ps]
                needed = sorted({k for h in hs
                                 for k in (math.floor(h), math.ceil(h))})
                tmp = self._sdf.select(d.alias("__pd_v__"))
                row = tmp.agg(*[
                    F.expr(f"percentile_disc({(k + 0.5) / n!r}D) "
                           "WITHIN GROUP (ORDER BY __pd_v__)")
                    .alias(f"r{k}") for k in needed]).first()
                at = {k: row[f"r{k}"] for k in needed}
                edges = []
                for h in hs:
                    a, b = at[math.floor(h)], at[math.ceil(h)]
                    t = h - math.floor(h)
                    edges.append((b - (b - a) * (1 - t)) if t >= 0.5
                                 else (a + (b - a) * t))
        if edges and edges[0] is None:  # empty/all-null input
            out = self._with_col(
                F.lit(None).cast("double" if labels is False
                                 else "string"), self.name)
            return (out, []) if retbins else out
        if len(set(edges)) != len(edges):
            if duplicates == "drop":
                edges = sorted(set(edges))
            else:
                raise ValueError(
                    "Bin edges must be unique; pass duplicates='drop'")
        if len(edges) < 2:
            raise ValueError("qcut produced a single bin edge; "
                             "the input is constant")
        nb = len(edges) - 1
        if labels not in (None, False) and len(labels) != nb:
            raise ValueError(f"expected {nb} labels, got {len(labels)}")
        c = self._colexpr.cast("double")
        codes = labels is False
        expr = F.lit(None).cast("double" if codes else "string")
        for i in range(nb):
            lo, hi = edges[i], edges[i + 1]
            cond = ((c >= lo) if i == 0 else (c > lo)) & (c <= hi)
            lab = (F.lit(float(i)) if codes else F.lit(
                labels[i] if labels
                else (f"[{lo}, {hi}]" if i == 0 else f"({lo}, {hi}]")))
            expr = F.when(cond, lab).otherwise(expr)
        out = self._with_col(expr, self.name)
        # retbins: pandas returns the edge array alongside (already
        # driver-sized — it was collected to build the CASE)
        return (out, list(edges)) if retbins else out

    def approx_quantile(self, q, relative_error: float = 0.001) -> list:
        """Sketch-based quantiles (approx_percentile) — the scale path:
        mergeable t-digest-style sketch, no full sort."""
        qs = [q] if isinstance(q, (int, float)) else list(q)
        sdf, alias = self._select()
        return sdf.approxQuantile(alias, [float(p) for p in qs],
                                  relative_error)

    def agg(self, aggregations: list) -> "Series":
        """Multiple aggregations in ONE Spark job (the reference computes
        a shared dependency closure, weld_aggs.py:185-268; Catalyst CSE
        gives us the same for free)."""
        exprs = [self._agg_expr(a).cast("double").alias(a) for a in aggregations]
        row_df = self._sdf.agg(*exprs)
        pairs = ", ".join(f"'{a}', `{a}`" for a in aggregations)
        out = row_df.select(
            F.expr(f"stack({len(aggregations)}, {pairs}) as (`{_IDX}`, `__agg__`)")
        )
        return Series._make(out, F.col("__agg__"), [_IDX], self.name, None)

    # ----------------------------------------------------------- transforms

    def astype(self, dtype) -> "Series":
        """Cast to ``dtype``. Documented divergence from pandas:
        casting a column WITH missing values to an integer type keeps
        them NULL (the result column still reads back as float+NaN in
        pandas) instead of raising IntCastingNaNError — SQL engines
        have a missing value for every type, so the cast is total;
        fillna first if you need pandas' strictness. Likewise an
        unparseable string casts to NULL (pandas
        ``to_numeric(errors='coerce')`` flavor) rather than raising
        ValueError — a lazy engine cannot raise per-row at build
        time."""
        return self._with_col(self._colexpr.cast(spark_type_of(dtype)))

    def unique(self) -> "Series":
        """Distinct values; order NOT preserved (reference hash-dict
        semantics, weld_ops.py:529-569)."""
        sdf, alias = self._select()
        out = sdf.select(alias).distinct()
        return Series._make(out, F.col(alias), [], self.name, None)

    def unstack(self, level: int = -1, max_columns: int = 10000,
                verify_integrity: bool = True) -> "DataFrame":
        """pandas ``Series.unstack``: pivot one index level into
        columns. Needs >= 2 index levels; the chosen level's distinct
        values are collected once (guarded by ``max_columns`` — the
        unstacked width must be driver-sized by definition) and passed
        explicitly to ``groupBy().pivot(...)`` so the plan has no
        hidden distinct job and the column order is deterministic
        (sorted, like pandas). One hash-agg shuffle."""
        from .frame import DataFrame
        idx = [c for c in self._index_cols if c in self._sdf.columns
               and c != ORD_COL]
        if len(idx) < 2:
            raise ValueError(
                "unstack needs a MultiIndex (>= 2 index levels); "
                f"this Series has {idx!r}")
        lvl = idx[level]
        remaining = [c for c in idx if c != lvl]
        sdf, alias = self._select()
        pvals = [r[0] for r in
                 (sdf.select(lvl).where(F.col(lvl).isNotNull())
                  .distinct().limit(max_columns + 1).collect())]
        if len(pvals) > max_columns:
            raise ValueError(
                f"unstack level {lvl!r} has more than {max_columns} "
                "distinct values; raise max_columns= only if you "
                "mean a table that wide")
        pvals.sort()
        if verify_integrity:
            # pandas raises on duplicate (index, level) pairs; F.first
            # would otherwise pick one silently — a wrong answer. One
            # extra hash-agg job, same cost class as the pivot itself;
            # pass verify_integrity=False to skip at scale when
            # uniqueness is guaranteed upstream.
            dup = (sdf.groupBy(*idx)
                   .agg(F.count(F.lit(1)).alias("__n__"))
                   .filter(F.col("__n__") > 1).limit(1).count())
            if dup:
                raise ValueError(
                    "Index contains duplicate entries, cannot reshape")
        out = (sdf.groupBy(*remaining).pivot(lvl, pvals)
               .agg(F.first(alias)))
        return DataFrame._make(
            out, remaining, [c for c in out.columns
                             if c not in remaining],
            [(c, True) for c in remaining])

    def explode(self) -> "Series":
        """pandas ``Series.explode``: one output row per array
        element, index labels repeated; NULL/empty arrays yield one
        NULL row (explode_outer). A narrow generator, no shuffle.
        Intra-row element order stays deterministic through the same
        composite (source ordinal, element position) packing the
        frame's explode uses."""
        from pyspark.sql import types as T
        sdf, alias = self._select()
        if not isinstance(sdf.schema[alias].dataType, T.ArrayType):
            # pandas passes non-list values through unchanged
            return self
        others = [c for c in sdf.columns if c != alias]
        idx = list(self._index_cols)
        if ORD_COL in sdf.columns:
            out = sdf.select(
                *[c for c in others if c != ORD_COL], F.col(ORD_COL),
                F.posexplode_outer(F.col(alias)).alias("__epos__", alias))
            if ORD_COL in idx:
                # pandas repeats the SOURCE index label per element —
                # export the pre-pack ordinal as the row label; the
                # packed (source ord, element pos) composite orders
                out = out.withColumn("__erow__", F.col(ORD_COL))
                idx = [c if c != ORD_COL else "__erow__" for c in idx]
            out = out.withColumn(
                ORD_COL,
                F.shiftleft(F.col(ORD_COL), 21)
                + F.coalesce(F.col("__epos__"), F.lit(0))).drop("__epos__")
            return Series._make(out, F.col(alias), idx, self.name,
                                [(ORD_COL, True)])
        out = sdf.select(
            *others, F.explode_outer(F.col(alias)).alias(alias))
        return Series._make(out, F.col(alias), idx, self.name, None)

    def apply(self, func, mapping: dict | None = None, new_dtype=None, **kwargs):
        """UDF surface (series.py:441-548). Modes:

        1. baloo_spark function (e.g. ``bl.sqrt``) — composes a Column
           expression, stays JVM-side;
        2. SQL expression template string with ``{self}`` placeholder
           (the Spark-idiomatic analogue of the reference's raw Weld IR
           templates, series.py:475-489) — e.g. ``'{self} * 2 + 1'``;
        3. arbitrary Python/NumPy callable — vectorized Arrow
           ``pandas_udf`` (the analogue of ``bl.raw(np.fn)``,
           functions/utils.py:23-60).
        """
        if isinstance(func, str):
            tmpl = func
            if mapping:
                tmpl = tmpl.format(self="{self}", **mapping)
            # Inline this Series' expression SQL so the result stays on
            # the SAME parent frame (keeps setitem/filter lineage
            # intact). str(Column) is not a stable PySpark API: the
            # format is pinned by tests/test_series.py::
            # test_column_repr_format_pinned, and reprs that are not
            # valid SQL (composed Python arithmetic renders as
            # "+(*(x, 2), 1)" on this PySpark) fall back to projecting
            # the expression as a temp column and templating over THAT
            # — same values, lineage moves to a derived plan (the
            # positional-alignment machinery handles cross-frame use).
            from pyspark.errors import AnalysisException, ParseException
            inner = str(self._colexpr)
            if inner.startswith("Column<'") and inner.endswith("'>"):
                inner = inner[len("Column<'"):-2]
            else:
                raise RuntimeError(
                    "PySpark Column repr format changed "
                    f"(got {inner[:60]!r}); Series.apply template mode "
                    "needs updating for this PySpark version")
            try:
                expr = F.expr(tmpl.format(self=f"({inner})"))
                # F.expr defers parsing until analysis on this PySpark;
                # select() analyzes eagerly (no job) so a bad repr
                # fails HERE, inside the try
                self._sdf.select(expr)
                return self._with_col(expr)
            except (ParseException, AnalysisException):
                tmp = "__apply_self__"
                sdf = self._sdf.withColumn(tmp, self._colexpr)
                expr = F.expr(tmpl.format(self=tmp))
                return Series._make(sdf, expr, self._index_cols,
                                    self.name, self._order)
        if getattr(func, "_baloo_column_fn", False):
            return func(self, **kwargs)
        # eager/NumPy mode -> Arrow-vectorized pandas UDF
        from ..functions._udf import scalar_pandas_udf
        ret_type = spark_type_of(new_dtype) if new_dtype is not None else self.spark_type
        _udf = scalar_pandas_udf(
            lambda s: np.asarray(func(s.to_numpy(), **kwargs)), ret_type)
        return self._with_col(_udf(self._colexpr))

    @property
    def str(self):
        from .strings import StringMethods
        return StringMethods(self)

    @property
    def dt(self):
        from .datetimes import DatetimeMethods
        return DatetimeMethods(self)

    @property
    def values(self) -> np.ndarray:
        sdf, alias = self._select()
        if self._order:
            order = [c for c, _ in self._order if c in sdf.columns]
            if order:
                sdf = sdf.orderBy(*order_exprs(self._order, sdf.columns))
        return np.asarray(sdf.toPandas()[alias].to_numpy())

    # ------------------------------------------------------------ evaluate

    def evaluate(self) -> "Series":
        """Force computation (one Spark action) and return a
        materialized-backed Series (reference: series.py:270-293)."""
        sdf, alias = self._select()
        sdf = sdf.persist()
        sdf.count()
        return Series._make(sdf, F.col(alias), self._index_cols, self.name,
                            self._order)

    def to_pandas(self):
        import pandas as pd
        alias = self.name or _VAL
        # project order cols too — they are not always index cols
        # (e.g. loc's position-tagged lookup join orders by request
        # position), and dropping them before the sort silently
        # yields shuffle order
        ordc = [c for c, _ in (self._order or [])
                if c in self._sdf.columns and c != alias
                and c not in self._index_cols]
        keep = [F.col(c) for c in
                list(dict.fromkeys(list(self._index_cols) + ordc))
                if c in self._sdf.columns]
        sdf = self._sdf.select(*keep, self._colexpr.alias(alias))
        if self._order:
            cols = order_exprs(self._order, sdf.columns)
            if cols:
                sdf = sdf.orderBy(*cols)
        sdf = sdf.drop(*ordc)
        pdf = sdf.toPandas()
        idx = [c for c in self._index_cols if c in pdf.columns]
        s = pdf.set_index(idx)[alias] if idx else pdf[alias]
        s.name = self.name
        if idx and idx[0] in (ORD_COL, _IDX) and len(idx) == 1:
            s.index.name = None
        return s


def _window_agg(self, func):
    """pandas ``.agg`` on a window object: a str delegates to the
    named statistic; a list/dict builds a DataFrame column-binding
    one statistic per output column (each statistic is its own pass
    — the convenience face, not a fused plan). The bind is
    POSITIONAL — fresh dense positions on each output's own order
    (every output of one window shares the source row order by
    construction); binding by index label, the previous shape,
    silently mis-aligned and deduped on duplicate-label indexes
    (probe r10 — the time-rolling face hit it first)."""
    if isinstance(func, str):
        return getattr(self, func)()
    items = (list(func.items()) if isinstance(func, dict)
             else [(f, f) for f in func])
    if not items:
        raise ValueError("no results")       # pandas' empty-agg error
    if len({str(n) for n, _ in items}) < len(items):
        raise ValueError(
            "duplicate output names in .agg; engine columns are "
            "uniquely named — use a dict to alias each statistic")
    from ..plans.ordinal import POS_COL
    from .frame import DataFrame
    name0, stat0 = items[0]
    s0 = getattr(self, stat0)()
    out, _ = s0._ordered_sdf(str(name0))
    for name, stat in items[1:]:
        r, _ = getattr(self, stat)()._ordered_sdf("__wa_tmp__")
        out = out.join(
            r.select(POS_COL,
                     F.col("__wa_tmp__").alias(str(name))),
            POS_COL, "left")
    idx = [c for c in s0._index_cols if c in out.columns]
    return DataFrame._make(out, idx, [str(n) for n, _ in items],
                           [(POS_COL, True)])


def _center_rank_tail(n, w, mp, valid_tail, raw, pct):
    """Per-position carried-tail values for center-rank (r11).

    pandas' center-rank kernel carries the last trailing RAW rank
    once the source exhausts; each carried row ``i`` is re-gated on
    the truncated window ``[i + h2 - w + 1, n-1]``'s valid count vs
    ``min_periods`` (NaN below it — note the even-window origin is
    one LEFT of the odd form's ``i - h2``), and under ``pct=True``
    re-normalized by that shrinking count (values may exceed 1.0 —
    pandas parity). Fuzz-verified 2000/2000 vs pandas in r11 across
    (n, w, mp, method, pct, NaN density).

    ``valid_tail``: validity flags of the last ``min(w, n)`` source
    rows. ``raw``: the carried raw (non-pct) trailing rank at
    ``n-1``, or None/NaN. Returns values (float or None) for
    positions ``max(0, n - h2) .. n-1``.
    """
    h2 = (w - 1) // 2
    k = len(valid_tail)
    sfx = np.concatenate(
        [np.cumsum(np.asarray(valid_tail,
                              dtype=np.int64)[::-1])[::-1], [0]])
    raw_nan = raw is None or raw != raw
    vals = []
    for i in range(max(0, n - h2), n):
        lo = max(i + h2 - w + 1, 0)
        cnt = int(sfx[max(lo - (n - k), 0)])
        if cnt < mp or cnt == 0 or raw_nan:
            vals.append(None)
        else:
            vals.append(raw / cnt if pct else raw)
    return vals


def _tail_fill_expr(vals, zone_lo):
    """Column expression filling tail positions ``zone_lo + j`` with
    ``vals[j]`` — a single literal when the values are uniform, an
    array-literal ``element_at`` gather otherwise (≤ h2 entries,
    bounded by the window size)."""
    from ..plans.ordinal import POS_COL
    if len(set(vals)) <= 1:
        v0 = vals[0] if vals else None
        return (F.lit(None).cast("double") if v0 is None
                else F.lit(float(v0)))
    arr = F.array(*[F.lit(None).cast("double") if v is None
                    else F.lit(float(v)) for v in vals])
    return F.element_at(
        arr, (F.col(POS_COL) - F.lit(zone_lo) + 1).cast("int"))


class _Rolling:
    """Fixed-size trailing-window aggregations (see
    :meth:`Series.rolling`). NaN rows occupy window POSITIONS but are
    skipped by the aggregates, and ``min_periods`` counts non-null
    rows — pandas semantics (default ``window`` for every agg,
    count included)."""

    def __init__(self, sr: "Series", window: int,
                 min_periods: int | None, center: bool = False):
        if window <= 0:
            raise ValueError(f"window must be positive, got {window}")
        self._sr = sr
        self._window = window
        self._mp = window if min_periods is None else min_periods
        self._center = bool(center)

    def _compute(self, need_sq: bool, need_rows: bool):
        from ..plans.ordinal import ORD_COL, with_prefix_aggs_shifted
        sr = self._sr
        sdf = sr._sdf
        order = order_exprs(sr._order or [], sdf.columns)
        if not order and ORD_COL in sdf.columns:
            order = [F.col(ORD_COL).asc()]
        v = sr._colexpr.cast("double")
        specs = {"__ps__": (v, "sum"), "__pc__": (sr._colexpr, "count")}
        if need_sq:
            specs["__pq__"] = (v * v, "sum")
        if need_rows:
            specs["__pr__"] = (F.lit(1), "count")
        # r12: prefixes AND their window-ago twins from ONE fused
        # layout + collect (the with_prefix_aggs +
        # with_boundary_shifts composition paid a second
        # repartitionByRange + checkpoint + collect for the shift)
        shifts = {f"{o[:-2]}w__": F.col(o) for o in specs}
        out = with_prefix_aggs_shifted(sdf, specs, self._window,
                                       order or None)
        rsum = F.col("__ps__") - F.coalesce(F.col("__psw__"), F.lit(0.0))
        rcnt = (F.col("__pc__")
                - F.coalesce(F.col("__pcw__"), F.lit(0))).cast("long")
        rsq = (F.col("__pq__") - F.coalesce(F.col("__pqw__"), F.lit(0.0))
               if need_sq else None)
        rrows = ((F.col("__pr__")
                  - F.coalesce(F.col("__prw__"), F.lit(0))).cast("long")
                 if need_rows else None)
        helpers = list(specs) + list(shifts)
        return out, rsum, rcnt, rsq, rrows, helpers

    def _emit(self, builder, mp: int, need_sq: bool = False,
              gate_on_rows: bool = False):
        out, rsum, rcnt, rsq, rrows, helpers = \
            self._compute(need_sq, gate_on_rows)
        # min_periods counts non-null observations — except count(),
        # which pandas gates on window FULLNESS (rows present)
        gate = rrows if gate_on_rows else rcnt
        expr = F.when(gate >= mp if mp > 0 else F.lit(True),
                      builder(rsum, rcnt, rsq))
        out = out.withColumn("__roll__", expr.cast("double")) \
            .drop(*helpers)
        sr = self._sr
        return Series._make(out, F.col("__roll__"), sr._index_cols,
                            sr.name, sr._order)._tag_rowpar(sr._sdf)

    def sum(self) -> "Series":
        if self._center:
            return self._local("sum")
        return self._emit(lambda s, c, q: s, self._mp)

    def mean(self) -> "Series":
        if self._center:
            return self._local("mean")
        return self._emit(lambda s, c, q: s / c, max(self._mp, 1))

    def count(self) -> "Series":
        if self._center:
            return self._local("count")
        return self._emit(lambda s, c, q: c, self._mp,
                          gate_on_rows=True)

    def var(self, ddof: int = 1) -> "Series":
        if self._center:
            return self._local("var", ddof=ddof)

        def build(s, c, q):
            # sum-of-squares identity; tiny negative residue from fp
            # cancellation clamps to 0 (a constant window is var 0)
            num = F.greatest(q - s * s / c, F.lit(0.0))
            return F.when(c > ddof, num / (c - ddof))
        return self._emit(build, max(self._mp, ddof + 1), need_sq=True)

    def std(self, ddof: int = 1) -> "Series":
        if self._center:
            return self._local("std", ddof=ddof)

        def build(s, c, q):
            num = F.greatest(q - s * s / c, F.lit(0.0))
            return F.when(c > ddof, F.sqrt(num / (c - ddof)))
        return self._emit(build, max(self._mp, ddof + 1), need_sq=True)

    def _local(self, stat: str, **kw) -> "Series":
        """Order-statistic / shape stats (min/max/median/quantile/
        skew/kurt/sem/rank) do not decompose into prefix scans;
        they ride plans/ordinal.with_rolling_locals — one frozen
        range layout, a bounded (window-1)-rows-per-partition carry,
        one Arrow pass over pandas' C rolling kernels."""
        from ..plans.ordinal import ORD_COL, with_rolling_locals
        sr = self._sr
        sdf = sr._sdf
        order = order_exprs(sr._order or [], sdf.columns)
        if not order and ORD_COL in sdf.columns:
            order = [F.col(ORD_COL).asc()]
        out = with_rolling_locals(sdf, {"__roll__": sr._colexpr},
                                  self._window, stat, order or None,
                                  self._mp, center=self._center, **kw)
        return Series._make(out, F.col("__roll__"), sr._index_cols,
                            sr.name, sr._order)._tag_rowpar(sdf)

    def min(self) -> "Series":
        return self._local("min")

    def max(self) -> "Series":
        return self._local("max")

    def median(self) -> "Series":
        return self._local("median")

    def quantile(self, q: float = 0.5,
                 interpolation: str = "linear") -> "Series":
        return self._local("quantile", q=q, interpolation=interpolation)

    def skew(self) -> "Series":
        return self._local("skew")

    def kurt(self) -> "Series":
        return self._local("kurt")

    def sem(self, ddof: int = 1) -> "Series":
        return self._local("sem", ddof=ddof)

    def rank(self, method: str = "average",
             pct: bool = False) -> "Series":
        if self._center:
            # pandas' center "rank" IS the shifted trailing rank:
            # center only moves the window bounds (output[i] =
            # trailing_rank[i + h2]); once the source exhausts the
            # kernel CARRIES its last RAW rank — but each carried
            # tail row is re-gated on the TRUNCATED window
            # [i + h2 - w + 1, n-1]'s valid count vs min_periods
            # (r11 fix — with the default mp = window every
            # truncated row is NaN), and under pct=True
            # re-NORMALIZED by that shrinking count (values may
            # exceed 1.0 — pandas parity). One bounded source-tail
            # validity fetch (≤ w rows, skipped when mp ≥ w) + one
            # bounded tail-rank fetch feed the ≤ h2 literals.
            # Fuzz-verified 2000/2000 vs pandas (r11) across
            # (n, w, mp, method, pct, NaN density).
            h2 = (self._window - 1) // 2
            base = _Rolling(self._sr, self._window, self._mp,
                            center=False).rank(method=method,
                                               pct=pct)
            if not h2:
                return base
            shifted = base.shift(-h2)
            from ..plans.ordinal import POS_COL
            n = len(self._sr)
            w, mp = self._window, self._mp
            zone_lo = max(0, n - h2)
            if not n or mp > w - 1:
                vals = [None] * (n - zone_lo)
            else:
                valid = (self._sr.tail(min(w, n)).to_pandas()
                         .notna().to_numpy())
                tail = base.iloc[-1]
                raw = (None if tail is None or tail != tail
                       else (round(float(tail) * int(valid.sum())
                                   * 2) / 2 if pct
                             else float(tail)))
                vals = _center_rank_tail(n, w, mp, valid, raw, pct)
            sdf, a = shifted._ordered_sdf("__cr__")
            fill = _tail_fill_expr(vals, zone_lo)
            out = sdf.withColumn(
                a, F.when(F.col(POS_COL) >= F.lit(zone_lo),
                          fill).otherwise(F.col(a)))
            return Series._make(out, F.col(a),
                                shifted._index_cols, shifted.name,
                                [(POS_COL, True)])
        return self._local("rank", method=method, pct=pct)

    def apply(self, func, raw: bool = False, args=(),
              kwargs=None) -> "Series":
        """Arbitrary per-window callable (pandas ``Rolling.apply``)
        — rides the same local-carry pass; the closure ships to the
        executors, pandas evaluates the windows. The honest slow
        path: prefer the named statistics (JVM or C kernels)."""
        return self._local("apply", func=func, raw=raw, args=args,
                           kwargs=kwargs or {})

    def _pair_stat(self, other: "Series", stat: str,
                   ddof: int = 1) -> "Series":
        """Rolling cov/corr with another Series: the windowed second
        moments DECOMPOSE into prefix sums over jointly-valid pairs
        (sum x, sum y, sum xy, joint count, + sum x², sum y² for
        corr), so this stays JVM-side — one prefix pass, one shared
        boundary shift, no Python. Same-frame pairs share the plan;
        cross-frame pairs align positionally (the engine's
        default-RangeIndex contract) and the fresh position becomes
        the window order."""
        if not isinstance(other, Series):
            raise TypeError(
                f"expected Series, got {type(other).__name__}")
        from ..plans.ordinal import (ORD_COL, POS_COL,
                                     with_boundary_shifts,
                                     with_prefix_aggs)
        sr = self._sr
        if other._sdf is sr._sdf:
            sdf, a, b = sr._sdf, sr._colexpr, other._colexpr
            order = order_exprs(sr._order or [], sdf.columns)
            if not order and ORD_COL in sdf.columns:
                order = [F.col(ORD_COL).asc()]
            idx = sr._index_cols
        else:
            lo, la = sr._ordered_sdf("__pa__")
            ro, rb = other._ordered_sdf("__pb__")
            sdf = lo.join(ro.select(POS_COL, rb), POS_COL, "inner")
            a, b = F.col("__pa__"), F.col("__pb__")
            order = [F.col(POS_COL).asc()]
            idx = [c for c in sr._index_cols if c in sdf.columns]
        both = a.isNotNull() & b.isNotNull()
        ax = F.when(both, a.cast("double"))
        by = F.when(both, b.cast("double"))
        if self._center:
            # centered pair windows: the SAME windowed sums, computed
            # as one centered "sum" local pass over the masked
            # product columns (one layout, one two-sided carry)
            from ..plans.ordinal import with_rolling_locals
            cols = {"__px__": ax, "__py__": by, "__pxy__": ax * by,
                    "__pn__": F.when(both, F.lit(1.0))}
            if stat == "corr":
                cols["__pxx__"] = ax * ax
                cols["__pyy__"] = by * by
            out = with_rolling_locals(sdf, cols, self._window, "sum",
                                      order or None, 0, center=True)
            helpers = list(cols)

            def C(o):
                return F.coalesce(F.col(o), F.lit(0.0))

            n = C("__pn__")
            sx, sy, sxy = C("__px__"), C("__py__"), C("__pxy__")
            sxx, syy = (C("__pxx__"), C("__pyy__")) \
                if stat == "corr" else (None, None)
        else:
            specs = {"__px__": (ax, "sum"), "__py__": (by, "sum"),
                     "__pxy__": (ax * by, "sum"),
                     "__pn__": (ax, "count")}
            if stat == "corr":
                specs["__pxx__"] = (ax * ax, "sum")
                specs["__pyy__"] = (by * by, "sum")
            out = with_prefix_aggs(sdf, specs, order or None)
            shifts = {o[:-2] + "w__": F.col(o) for o in specs}
            out = with_boundary_shifts(out, shifts, self._window,
                                       order_by=order or None)

            def S(o, zero=0.0):
                return F.col(o) - F.coalesce(F.col(o[:-2] + "w__"),
                                             F.lit(zero))

            n = S("__pn__", 0).cast("double")
            sx, sy, sxy = S("__px__"), S("__py__"), S("__pxy__")
            sxx, syy = (S("__pxx__"), S("__pyy__")) \
                if stat == "corr" else (None, None)
            helpers = list(specs) + list(shifts)
        if stat == "cov":
            val = F.when(n > ddof, (sxy - sx * sy / n) / (n - ddof))
        else:
            vx = sxx - sx * sx / n
            vy = syy - sy * sy / n
            val = F.when((n > 1) & (vx > 0) & (vy > 0),
                         (sxy - sx * sy / n) / F.sqrt(vx * vy))
        mp = max(self._mp, 1)
        expr = F.when(n >= mp, val).cast("double")
        out = out.withColumn("__roll__", expr).drop(*helpers)
        return Series._make(out, F.col("__roll__"), idx, sr.name,
                            sr._order)

    def cov(self, other: "Series", ddof: int = 1) -> "Series":
        return self._pair_stat(other, "cov", ddof=ddof)

    def corr(self, other: "Series") -> "Series":
        return self._pair_stat(other, "corr")


# small-side gate for the time-roll subtrahend lookup: below this
# many rows the per-distinct-stamp prefix table broadcasts (a few
# doubles per stamp — ~10 MB at the cap); the row count comes free
# from the prefix pass's totals, so the gate costs no job
_TR_BROADCAST_MAX_ROWS = 200_000


def _tr_driver_prefix_face(sdf, tcol, vals: dict, window_us: int,
                           need_sq: bool):
    """ONE-JOB fast face of :func:`_time_roll_multi` for bounded
    DISTINCT-STAMP inputs: collect (t, values) once (bounded by
    ``_TR_BROADCAST_MAX_ROWS`` via limit), compute every prefix
    column AND its as-of ``_right`` twin with numpy on the driver
    (sequential float64 cumsum — the same accumulation order as the
    single-slice running window), broadcast the per-stamp arrays,
    and attach them in one mapInPandas keyed by the stamp.

    Replaces the general scheme's ~8 scheduling-bound driver jobs
    (range-layout sampling + checkpoint + totals collect + prefix
    window + broadcast-lookup collect) with ONE bounded collect —
    measured 2.5s -> sub-second on the events_window per-stamp legs
    at sf0.1. Returns the joined-equivalent frame (same helper
    column names/types as the general path: ``__pr__``/``__pc_*__``
    LONG, ``__ps_*__``/``__pq_*__`` nullable DOUBLE, all ``_right``
    twins nullable DOUBLE) or ``None`` when a precondition fails —
    more rows than the budget, a NULL stamp, or duplicate stamps
    (whose positional tie rule needs the general scheme). The input
    plan is evaluated twice (bounded collect + the exec pass); the
    callers feed pre-aggregated, checkpoint-backed tables where
    that re-evaluation is a cheap cached read."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    budget = _TR_BROADCAST_MAX_ROWS
    # free probe at scale (r12): when the plan carries a row-count
    # hint (stamped by faces that already counted, e.g. __len__) and
    # it exceeds the budget, skip the bounded collect entirely — on
    # an over-budget input the probe is one wasted job per call
    hint = getattr(sdf, "_baloo_nrows", None)
    if hint is not None and hint > budget:
        return None
    micros = F.unix_micros(F.col(tcol).cast("timestamp"))
    sel = [micros.alias("__t__")] + [
        c.cast("double").alias(f"__v_{t}__") for t, c in vals.items()]
    rows = sdf.select(sel).limit(budget + 1).collect()
    n = len(rows)
    if n == 0 or n > budget:
        return None
    t_list = [r["__t__"] for r in rows]
    if any(t is None for t in t_list):
        return None
    t_arr = np.array(t_list, dtype=np.int64)
    order = np.argsort(t_arr, kind="stable")
    t_sorted = t_arr[order]
    if n > 1 and bool(np.any(t_sorted[1:] <= t_sorted[:-1])):
        return None  # duplicate stamps: positional tie rule
    # doubles carry (values, null_mask) so genuine NaN data stays NaN
    # (F.sum PROPAGATES NaN but SKIPS NULL — r12 aligns the numpy
    # replay with the JVM aggregates: null rows add 0 and don't
    # count, NaN rows poison the running sum and DO count, and the
    # pre-first-observation head is NULL, not NaN)
    prefixes: dict = {"__pr__": (np.arange(1, n + 1, dtype=np.int64),
                                 None)}
    for t in vals:
        raw = [r[f"__v_{t}__"] for r in rows]
        isnull = np.array([x is None for x in raw])[order]
        v = np.array([0.0 if x is None else x for x in raw],
                     dtype=np.float64)[order]
        valid = ~isnull
        pc = np.cumsum(valid).astype(np.int64)
        ps = np.cumsum(np.where(valid, v, 0.0))
        prefixes[f"__ps_{t}__"] = (ps, pc == 0)
        prefixes[f"__pc_{t}__"] = (pc, None)
        if need_sq:
            pq = np.cumsum(np.where(valid, v * v, 0.0))
            prefixes[f"__pq_{t}__"] = (pq, pc == 0)
    # as-of subtrahend: last stamp <= t - offset (window open-left)
    ix = np.searchsorted(t_sorted, t_sorted - int(window_us),
                         side="right") - 1
    miss = ix < 0
    safe = np.clip(ix, 0, None)
    rights = {}
    for k, (arr, msk) in prefixes.items():
        rv = arr[safe].astype(np.float64)
        rmask = miss.copy() if msk is None else (miss | msk[safe])
        rights[f"{k}_right"] = (rv, rmask)
    bcast = sdf.sparkSession.sparkContext.broadcast(
        (t_sorted, prefixes, rights))
    left = sdf.withColumn("__t__", micros)
    fields = list(left.schema.fields)
    for k, (_, msk) in prefixes.items():
        fields.append(T.StructField(
            k, T.DoubleType() if msk is not None else T.LongType()))
    for k in rights:
        fields.append(T.StructField(k, T.DoubleType()))
    out_schema = T.StructType(fields)

    def gen(batches):
        b_t, b_p, b_r = bcast.value
        nn = len(b_t)
        for pdf in batches:
            if not len(pdf):
                continue
            probe = pdf["__t__"].to_numpy(dtype=np.int64)
            pos = np.searchsorted(b_t, probe)
            # the exec pass re-evaluates the input plan; a stamp the
            # bounded collect never saw (non-deterministic source)
            # would silently read an adjacent row's prefix — validate
            # instead of corrupting (r12, clip guards pos == n too)
            pos = np.clip(pos, 0, nn - 1)
            if not bool(np.all(b_t[pos] == probe)):
                raise RuntimeError(
                    "time-roll driver face: executor saw a stamp the "
                    "bounded collect did not — non-deterministic "
                    "input plan; use a checkpointed source")
            for k, (arr, msk) in b_p.items():
                col = arr[pos]
                if msk is None:
                    pdf[k] = col
                else:
                    pdf[k] = pd.arrays.FloatingArray(
                        col.astype(np.float64), msk[pos])
            for k, (rv, rmask) in b_r.items():
                pdf[k] = pd.arrays.FloatingArray(rv[pos].copy(),
                                                 rmask[pos])
            yield pdf

    return left.mapInPandas(gen, out_schema)


def _tr_broadcast_lookup(left, out, micros, keys: list):
    """Broadcast face of the time-roll as-of subtrahend (see
    :func:`_time_roll_multi`): collect the positionally-last prefix
    per distinct stamp (one job), broadcast the sorted arrays, and
    resolve every probe with numpy searchsorted inside one
    mapInPandas — appends ``<k>_right`` DOUBLE columns, NULL when
    the probe precedes every stamp (same contract as the
    union-carry asof path)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    rows = (out.groupBy(micros.alias("__tw__"))
            .agg(F.max_by(F.struct(*[F.col(k) for k in keys]),
                          F.col("__pr__")).alias("__s__"))
            .select("__tw__", *[F.col(f"__s__.{k}").alias(k)
                                for k in keys])
            .collect())
    rows.sort(key=lambda r: r["__tw__"])
    rt = np.array([r["__tw__"] for r in rows], dtype=np.int64)
    rv = {k: np.array([np.nan if r[k] is None else float(r[k])
                       for r in rows], dtype=np.float64)
          for k in keys}
    bcast = left.sparkSession.sparkContext.broadcast((rt, rv))
    out_schema = T.StructType(
        list(left.schema.fields)
        + [T.StructField(f"{k}_right", T.DoubleType())
           for k in keys])

    def gen(batches):
        b_rt, b_rv = bcast.value
        for pdf in batches:
            if not len(pdf):
                continue
            probes = pdf["__tw__"].to_numpy(dtype=np.int64)
            ix = np.searchsorted(b_rt, probes, side="right") - 1
            miss = ix < 0
            safe = np.clip(ix, 0, None)
            for k in keys:
                v = b_rv[k][safe]
                # Float64 masked array: misses AND null prefixes
                # (NaN-coded) both surface as SQL NULL, matching
                # the join path's unmatched/NULL semantics
                arr = pd.array(v, dtype="Float64")
                arr[miss] = pd.NA
                pdf[f"{k}_right"] = arr
            yield pdf

    return left.mapInPandas(gen, out_schema)


def _time_roll_multi(sdf, tcol, order, vals: dict, window_us: int,
                     builder, mp: int, need_sq: bool,
                     gate_on_rows: bool):
    """Shared core of the time-offset rolling faces: per-tag prefix
    sums over ONE pass + ONE as-of lookup for every tag at once.
    ``vals`` maps tag -> value Column. Returns (sdf, {tag: expr}).
    window_agg(i) = prefix(i) - prefix(as-of t_i - offset); the
    strictly-increasing row prefix (__pr__) picks the positionally
    LAST duplicate stamp, reproducing pandas' j <= i tie rule.

    The subtrahend lookup has two faces, chosen by the row count
    the prefix pass's own totals already produced (free, no extra
    job): under ``_TR_BROADCAST_MAX_ROWS`` the per-distinct-stamp
    prefix table collects to the driver and broadcasts, and each
    partition resolves its probes with one numpy searchsorted —
    no union re-layout, no second two-pass scheme (the general
    as-of path paid ~9 scheduling-bound driver jobs on tiny
    inputs); above it the partition-safe union-carry
    :func:`~baloo_spark.operators.joins.asof_join` runs, the 100 TB
    shape."""
    from ..operators.joins import asof_join
    from ..plans.ordinal import with_prefix_aggs
    specs = {"__pr__": (F.lit(1), "count")}
    for t, col in vals.items():
        v = col.cast("double")
        specs[f"__ps_{t}__"] = (v, "sum")
        specs[f"__pc_{t}__"] = (col, "count")
        if need_sq:
            specs[f"__pq_{t}__"] = (v * v, "sum")
    # r11 driver fast face: bounded distinct-stamp inputs skip the
    # whole distributed prefix scheme (one bounded collect instead
    # of ~8 layout/collect jobs) — see _tr_driver_prefix_face; a
    # None return (too many rows / duplicate stamps / null stamps)
    # falls through to the partition-safe general machinery below.
    j = _tr_driver_prefix_face(sdf, tcol, vals, window_us, need_sq)
    if j is None:
        out, totals = with_prefix_aggs(sdf, specs, order,
                                       return_stats=True)
        n_rows = int(totals.get("__pr__") or 0)
        micros = F.unix_micros(F.col(tcol).cast("timestamp"))
        left = out.withColumn("__tw__",
                              micros - F.lit(int(window_us)))
        if n_rows <= _TR_BROADCAST_MAX_ROWS:
            j = _tr_broadcast_lookup(left, out, micros, list(specs))
        else:
            right = (out.groupBy(micros.alias("__tw__"))
                     .agg(F.max_by(F.struct(*[F.col(k)
                                              for k in specs]),
                                   F.col("__pr__")).alias("__s__"))
                     .select("__tw__",
                             *[F.col(f"__s__.{k}").alias(k)
                               for k in specs]))
            j = asof_join(left, right, on="__tw__",
                          right_cols=list(specs))

    def S(o, zero=0.0):
        return F.col(o) - F.coalesce(F.col(f"{o}_right"), F.lit(zero))

    rrows = S("__pr__", 0).cast("long")
    exprs = {}
    for t in vals:
        rsum = S(f"__ps_{t}__")
        rcnt = S(f"__pc_{t}__", 0).cast("long")
        rsq = S(f"__pq_{t}__") if need_sq else None
        gate = rrows if gate_on_rows else rcnt
        exprs[t] = F.when(gate >= mp if mp > 0 else F.lit(True),
                          builder(rsum, rcnt, rsq)).cast("double")
    helpers = (["__tw__", "matched___tw__", "__t__"] + list(specs)
               + [f"{k}_right" for k in specs])
    return j, exprs, helpers


def _dt_index_col(index_cols, sdf):
    return next(
        (c for c in reversed(list(index_cols))
         if c in sdf.columns
         and sdf.schema[c].dataType.typeName()
         in ("timestamp", "timestamp_ntz", "date")), None)


class _TimeRolling:
    """Time-offset trailing windows (pandas ``Series.rolling('2h')``
    over a datetime index): for row i the window is rows j <= i with
    t_j in (t_i - offset, t_i] — pandas' closed='right' semantics
    INCLUDING the positional tie rule for duplicate stamps.

    sum/mean/count/var/std decompose: window_agg(i) = prefix(i) -
    prefix(last row with t <= t_i - offset). The subtrahend is an
    AS-OF lookup, so the whole operator is one prefix pass plus one
    as-of join — both partition-safe two-pass schemes
    (plans/ordinal.py, operators/joins.py) — with no range
    self-join, no per-row Python, and no single-partition window.
    Time-window ORDER statistics do not decompose; use
    ``groupby(...).rolling('2h')`` (a per-group RANGE frame where
    min/max work) or ``resample``.

    Like pandas, the series must already be time-sorted (pandas
    raises on a non-monotonic index; here the prefix order is
    (t, row-order), which equals the row order for monotonic input).
    """

    def __init__(self, sr: "Series", window_us: int,
                 min_periods: int):
        self._sr = sr
        self._us = int(window_us)
        self._mp = min_periods

    def _emit(self, builder, mp: int, need_sq: bool = False,
              gate_on_rows: bool = False) -> "Series":
        from ..plans.ordinal import ORD_COL
        sr = self._sr
        sdf = sr._sdf
        tcol = _dt_index_col(sr._index_cols, sdf)
        if tcol is None:
            raise TypeError(
                "rolling with a time offset needs a datetime index "
                f"level; index levels are {list(sr._index_cols)!r}")
        order = order_exprs(sr._order or [], sdf.columns)
        if not order and ORD_COL in sdf.columns:
            order = [F.col(ORD_COL).asc()]
        order = [F.col(tcol).asc()] + order
        j, exprs, helpers = _time_roll_multi(
            sdf, tcol, order, {"v": sr._colexpr}, self._us,
            builder, mp, need_sq, gate_on_rows)
        keep = [c for c in j.columns if c not in helpers]
        out = j.withColumn("__roll__", exprs["v"]) \
            .select(*keep, "__roll__")
        # one output row per input row (per-stamp lookup attach) ->
        # adopt-eligible (r12)
        return Series._make(out, F.col("__roll__"), sr._index_cols,
                            sr.name, sr._order)._tag_rowpar(sdf)

    def sum(self) -> "Series":
        return self._emit(lambda s, c, q: s, self._mp)

    def mean(self) -> "Series":
        return self._emit(lambda s, c, q: s / c, max(self._mp, 1))

    def count(self) -> "Series":
        return self._emit(lambda s, c, q: c, self._mp,
                          gate_on_rows=True)

    def var(self, ddof: int = 1) -> "Series":
        def build(s, c, q):
            num = F.greatest(q - s * s / c, F.lit(0.0))
            return F.when(c > ddof, num / (c - ddof))
        return self._emit(build, max(self._mp, ddof + 1), need_sq=True)

    def std(self, ddof: int = 1) -> "Series":
        def build(s, c, q):
            num = F.greatest(q - s * s / c, F.lit(0.0))
            return F.when(c > ddof, F.sqrt(num / (c - ddof)))
        return self._emit(build, max(self._mp, ddof + 1), need_sq=True)

    def agg_pairs(self, specs=None, ddof: int = 1):
        """Deliberate gate (r11): pair statistics need TWO columns,
        which a single Series cannot name — use the frame face
        (``df.rolling('2h').agg_pairs({...: ('corr', x, y)})``) or
        the grouped face (``df.groupby(k).rolling('2h')
        .agg_pairs``); single-column moment fusion is ``.agg``."""
        raise NotImplementedError(
            "agg_pairs needs column NAMES for its pair statistics; "
            "use the frame face df.rolling(offset).agg_pairs({...}) "
            "or df.groupby(k).rolling(...).agg_pairs({...}) — for "
            "single-column moment fusion use .agg(['sum','mean',...])"
        )

    def sem(self, ddof: int = 1) -> "Series":
        """pandas' WINDOW sem is sample-std / sqrt(n - ddof) — the
        numerator stays ddof=1 regardless (probe:
        rolling('2h').sem(ddof=0) == std(ddof=1)/sqrt(n)), so it
        decomposes into the same prefix + as-of pass as std. At the
        n == ddof boundary pandas divides a finite sample std by
        sqrt(0): +inf when the window varies, NaN when constant
        (r11 probe — [1,2] ddof=2 -> inf, [5,5] ddof=2 -> NaN)."""
        def build(s, c, q):
            num = F.greatest(q - s * s / c, F.lit(0.0))
            return (F.when((c > 1) & (c > ddof),
                           F.sqrt(num / (c - 1)) / F.sqrt(c - ddof))
                     .when((c > 1) & (c == ddof) & (num > 0),
                           F.lit(float("inf"))))
        return self._emit(build, max(self._mp, 2), need_sq=True)

    def min(self, max_rows: int | None = None) -> "Series":
        return self._order_stat("min", max_rows)

    def max(self, max_rows: int | None = None) -> "Series":
        return self._order_stat("max", max_rows)

    def median(self, max_rows: int | None = None) -> "Series":
        return self._order_stat("median", max_rows)

    def quantile(self, q: float = 0.5,
                 interpolation: str = "linear",
                 max_rows: int | None = None) -> "Series":
        return self._order_stat("quantile", max_rows, q=q,
                                interpolation=interpolation)

    def rank(self, method: str = "average", ascending: bool = True,
             pct: bool = False,
             max_rows: int | None = None) -> "Series":
        return self._order_stat("rank", max_rows, method=method,
                                ascending=ascending, pct=pct)

    def skew(self, max_rows: int | None = None) -> "Series":
        # pandas' kernel owns the exact-zero-variance special case
        # (constant window -> 0.0, near-zero -> NaN), so skew/kurt
        # ride the budgeted pandas pass, not a power-sum prefix
        return self._order_stat("skew", max_rows)

    def kurt(self, max_rows: int | None = None) -> "Series":
        return self._order_stat("kurt", max_rows)

    kurtosis = kurt

    def apply(self, func, raw: bool = False,
              max_rows: int | None = None) -> "Series":
        return self._order_stat("apply", max_rows, func=func,
                                raw=raw)

    def _pair(self, other: "Series", stat: str,
              ddof: int = 1) -> "Series":
        """Time-offset rolling cov/corr with another Series: the
        expanding pair recipe (prefix sums over JOINTLY valid
        pairs, _Expanding._pair) windowed by the shared
        prefix-difference + as-of pass (:func:`_time_roll_multi`) —
        Σx, Σy, Σxy, Σx², Σy², pair-n all decompose, so the pair
        stat costs the same ONE prefix pass + ONE lookup as sum.
        Same-frame pairs share the plan; cross-frame pairs align
        positionally (the engine's pinned alignment)."""
        if not isinstance(other, Series):
            raise TypeError(
                f"expected Series, got {type(other).__name__}")
        from ..plans.ordinal import ORD_COL, POS_COL
        sr = self._sr
        if other._sdf is sr._sdf:
            sdf, a, b = sr._sdf, sr._colexpr, other._colexpr
            order = order_exprs(sr._order or [], sdf.columns)
            if not order and ORD_COL in sdf.columns:
                order = [F.col(ORD_COL).asc()]
            idx = sr._index_cols
        else:
            lo, _ = sr._ordered_sdf("__pa__")
            ro, rb = other._ordered_sdf("__pb__")
            sdf = lo.join(ro.select(POS_COL, rb), POS_COL, "inner")
            a, b = F.col("__pa__"), F.col("__pb__")
            order = [F.col(POS_COL).asc()]
            idx = [c for c in sr._index_cols if c in sdf.columns]
        tcol = _dt_index_col(idx, sdf)
        if tcol is None:
            raise TypeError(
                "rolling with a time offset needs a datetime index "
                f"level; index levels are {list(idx)!r}")
        order = [F.col(tcol).asc()] + list(order or [])
        both = a.isNotNull() & b.isNotNull()
        ax = F.when(both, a.cast("double"))
        by = F.when(both, b.cast("double"))
        vals = {"x": ax, "y": by, "xy": ax * by}
        j, _, helpers = _time_roll_multi(
            sdf, tcol, order, vals, self._us,
            lambda s, c, q: s, 0, True, False)

        def D(k, zero=0.0):
            return F.col(k) - F.coalesce(F.col(f"{k}_right"),
                                         F.lit(zero))

        n = D("__pc_x__", 0).cast("double")
        sx, sy, sxy = D("__ps_x__"), D("__ps_y__"), D("__ps_xy__")
        if stat == "cov":
            val = F.when(n > ddof, (sxy - sx * sy / n) / (n - ddof))
        else:
            # PINNED divergence (COVERAGE.md r10): a zero-variance
            # side yields NaN. pandas' kernel there divides its own
            # roundoff (Σxy - ΣxΣy/n, exactly 0 in real arithmetic)
            # by the zero std and emits a NOISE-SIGNED ±inf — found
            # live on events.parquet (constant user_id window, ±inf
            # vs NaN); the sign is unreproducible by construction
            vx = D("__pq_x__") - sx * sx / n
            vy = D("__pq_y__") - sy * sy / n
            val = F.when((n > 1) & (vx > 0) & (vy > 0),
                         (sxy - sx * sy / n) / F.sqrt(vx * vy))
        mp = max(self._mp, 1)
        expr = F.when(n >= mp, val).cast("double")
        keep = [c for c in j.columns if c not in helpers]
        out = j.withColumn("__roll__", expr).select(*keep, "__roll__")
        return Series._make(out, F.col("__roll__"), idx, sr.name,
                            sr._order)

    def cov(self, other: "Series", ddof: int = 1) -> "Series":
        return self._pair(other, "cov", ddof=ddof)

    def corr(self, other: "Series") -> "Series":
        return self._pair(other, "corr")

    _MOMENT_STATS = ("sum", "mean", "count", "var", "std", "sem")

    def agg(self, func):
        """pandas ``.agg``. When EVERY requested statistic is in the
        moment family (sum/mean/count/var/std/sem — all derived from
        the same Σv, Σv², n, rows prefix columns), the whole request
        runs as ONE prefix pass + ONE as-of lookup instead of one
        full two-pass scheme per statistic (each call costs ~13
        scheduling-bound driver jobs at small inputs and a full
        extra scan at scale — the r10 fusion lesson). Order
        statistics fall back to the per-statistic dispatch."""
        if isinstance(func, str):
            return getattr(self, func)()
        try:
            items = (list(func.items()) if isinstance(func, dict)
                     else [(f, f) for f in func])
        except AttributeError:
            return _window_agg(self, func)
        if not items:
            raise ValueError("no results")
        if len({str(n) for n, _ in items}) < len(items):
            raise ValueError(
                "duplicate output names in .agg; engine columns "
                "are uniquely named — use a dict to alias each "
                "statistic")
        if not all(isinstance(st, str) and st in self._MOMENT_STATS
                   for _, st in items):
            # a requested ORDER statistic: ONE budgeted
            # single-partition pandas pass computes EVERY requested
            # column (pandas' own .agg aligns per ROW — the
            # one-column-bind-per-stat shape _window_agg uses joins
            # by index label, which mis-aligns and dedupes on
            # duplicate stamps; found by probe r10)
            return self._agg_order(items)
        from ..plans.ordinal import ORD_COL
        sr = self._sr
        sdf = sr._sdf
        tcol = _dt_index_col(sr._index_cols, sdf)
        if tcol is None:
            raise TypeError(
                "rolling with a time offset needs a datetime index "
                f"level; index levels are {list(sr._index_cols)!r}")
        order = order_exprs(sr._order or [], sdf.columns)
        if not order and ORD_COL in sdf.columns:
            order = [F.col(ORD_COL).asc()]
        order = [F.col(tcol).asc()] + order
        j, _, helpers = _time_roll_multi(
            sdf, tcol, order, {"v": sr._colexpr}, self._us,
            lambda s, c, q: s, 0, True, False)

        def D(k, zero=0.0):
            return F.col(k) - F.coalesce(F.col(f"{k}_right"),
                                         F.lit(zero))

        s = D("__ps_v__")
        c = D("__pc_v__", 0).cast("long")
        q = D("__pq_v__")
        rows = D("__pr__", 0).cast("long")
        mp = self._mp
        num = F.greatest(q - s * s / c, F.lit(0.0))
        builders = {
            "sum": (s, mp, c),
            "mean": (s / c, max(mp, 1), c),
            "count": (c, mp, rows),
            "var": (F.when(c > 1, num / (c - 1)), max(mp, 2), c),
            "std": (F.when(c > 1, F.sqrt(num / (c - 1))),
                    max(mp, 2), c),
            "sem": (F.when(c > 1, F.sqrt(num / (c - 1))
                           / F.sqrt(c - 1)), max(mp, 2), c),
        }
        outs = []
        for name, st in items:
            e, m, gate = builders[st]
            e = F.when(gate >= m if m > 0 else F.lit(True), e)
            outs.append(e.cast("double").alias(str(name)))
        keep = [cc for cc in j.columns
                if cc not in helpers
                and (cc in sr._index_cols
                     or cc in [o for o, _ in (sr._order or [])])
                and cc not in {str(n) for n, _ in items}]
        from .frame import DataFrame
        return DataFrame._make(j.select(*keep, *outs),
                               list(sr._index_cols),
                               [str(n) for n, _ in items],
                               sr._order)

    aggregate = agg

    def _agg_order(self, items, max_rows: int | None = None):
        """Mixed/order-stat ``.agg``: the budgeted single-partition
        pandas pass (same gate as :meth:`_order_stat`) emitting ONE
        column per requested statistic from one kernel call —
        pandas' own ``rolling.agg`` supplies per-row alignment, so
        duplicate stamps bind correctly."""
        import pandas as pd
        from pyspark.sql import types as T

        from ..plans.ordinal import ORD_COL
        sr = self._sr
        sdf = sr._sdf
        tcol = _dt_index_col(sr._index_cols, sdf)
        if tcol is None:
            raise TypeError(
                "rolling with a time offset needs a datetime index "
                f"level; index levels are {list(sr._index_cols)!r}")
        for _, st in items:
            if not isinstance(st, str):
                raise TypeError(
                    f".agg statistics must be names, got {st!r}")
        budget = (int(max_rows) if max_rows is not None
                  else _EXPANDING_STAT_MAX_ROWS)
        n = sdf.count()
        if n > budget:
            raise ValueError(
                f"time-offset rolling agg with order statistics "
                f"runs as a budgeted single-partition pandas pass: "
                f"{n} rows exceed max_rows={budget}. Raise "
                f"max_rows=, request only "
                f"{'/'.join(self._MOMENT_STATS)} (the fused "
                "prefix-pass family), or use "
                "groupby(...).rolling(...)")
        order = order_exprs(sr._order or [], sdf.columns)
        if not order and ORD_COL in sdf.columns:
            order = [F.col(ORD_COL).asc()]
        order = [F.col(tcol).asc()] + order
        lay = (sdf.select("*", sr._colexpr.cast("double")
                          .alias("__ev__"))
               .repartition(1).sortWithinPartitions(*order))
        mp = max(self._mp, 1)
        us = self._us
        names = [str(nm) for nm, _ in items]
        stats = [st for _, st in items]
        keep_cols = [c for c in lay.columns
                     if c != "__ev__" and c not in names]
        out_schema = T.StructType(
            [f for f in lay.schema.fields
             if f.name in keep_cols]
            + [T.StructField(nm, T.DoubleType()) for nm in names])

        def gen(batches):
            chunks = [b for b in batches if len(b)]
            if not chunks:
                return
            allb = pd.concat(chunks, ignore_index=True)
            s = pd.Series(
                allb["__ev__"].to_numpy(),
                index=pd.DatetimeIndex(pd.to_datetime(allb[tcol])))
            r = s.rolling(pd.Timedelta(us, unit="us"),
                          min_periods=mp)
            res = allb[keep_cols].copy()
            for nm, st in zip(names, stats):
                res[nm] = getattr(r, st)().to_numpy()
            yield res

        out = lay.mapInPandas(gen, out_schema)
        from .frame import DataFrame
        return DataFrame._make(out, list(sr._index_cols), names,
                               sr._order)

    def _order_stat(self, stat: str, max_rows: int | None, **kw):
        """Time-window order statistics do NOT decompose into
        prefix + as-of (unlike sum/mean/var, window_agg(i) is not a
        difference of prefixes), so this face is the same
        EXPLICITLY BUDGETED single-partition pandas pass as the
        global expanding order stats (:meth:`_Expanding._order_stat`
        — one count job gates max_rows, default 10M; above it the
        error names the per-group RANGE-frame and resample
        alternatives). pandas' own time-rolling kernel supplies the
        duplicate-stamp positional tie rule."""
        import pandas as pd
        from pyspark.sql import types as T

        from ..plans.ordinal import ORD_COL
        sr = self._sr
        sdf = sr._sdf
        tcol = _dt_index_col(sr._index_cols, sdf)
        if tcol is None:
            raise TypeError(
                "rolling with a time offset needs a datetime index "
                f"level; index levels are {list(sr._index_cols)!r}")
        budget = (int(max_rows) if max_rows is not None
                  else _EXPANDING_STAT_MAX_ROWS)
        n = sdf.count()
        if n > budget:
            raise ValueError(
                f"time-offset rolling {stat} does not decompose "
                f"into prefix + as-of, so this face is a budgeted "
                f"single-partition pandas pass: {n} rows exceed "
                f"max_rows={budget}. Raise max_rows=, use "
                f"groupby(...).rolling('2h').{stat}() (a per-group "
                "RANGE frame) or resample")
        order = order_exprs(sr._order or [], sdf.columns)
        if not order and ORD_COL in sdf.columns:
            order = [F.col(ORD_COL).asc()]
        order = [F.col(tcol).asc()] + order
        lay = (sdf.select("*", sr._colexpr.cast("double")
                          .alias("__ev__"))
               .repartition(1).sortWithinPartitions(*order))
        mp = max(self._mp, 1)
        us = self._us
        out_schema = T.StructType(
            list(lay.schema.fields)
            + [T.StructField("__roll__", T.DoubleType())])

        def gen(batches):
            chunks = [b for b in batches if len(b)]
            if not chunks:
                return
            allb = pd.concat(chunks, ignore_index=True)
            s = pd.Series(
                allb["__ev__"].to_numpy(),
                index=pd.DatetimeIndex(pd.to_datetime(allb[tcol])))
            allb["__roll__"] = getattr(
                s.rolling(pd.Timedelta(us, unit="us"),
                          min_periods=mp), stat)(**kw).to_numpy()
            yield allb

        out = lay.mapInPandas(gen, out_schema).drop("__ev__")
        # row-preserving over sdf -> adopt-eligible (r12)
        return Series._make(out, F.col("__roll__"), sr._index_cols,
                            sr.name, sr._order)._tag_rowpar(sdf)


class _TimeEWM:
    """Time-decay EWM mean (see :meth:`Series.ewm` with ``times=``):
    weights follow actual stamp distances, 0.5^(dt/halflife). Rides
    plans/ordinal.with_ewm_mean_times — the segmented-anchor
    two-pass carry scan. ``times`` is a column name, or None for the
    series' datetime index level."""

    def __init__(self, sr: "Series", halflife_us: float,
                 times, min_periods: int):
        self._sr = sr
        self._us = float(halflife_us)
        self._times = times
        self._mp = min_periods

    def mean(self) -> "Series":
        from ..plans.ordinal import ORD_COL, with_ewm_mean_times
        sr = self._sr
        sdf = sr._sdf
        times = self._times
        if times is None or times is True:
            times = _dt_index_col(sr._index_cols, sdf)
            if times is None:
                raise TypeError(
                    "ewm(times=...) needs a times column name or a "
                    "datetime index level")
        elif times not in sdf.columns:
            raise KeyError(times)
        # ROW order, not times order: pandas computes decay deltas
        # in row sequence even when times run backward (probe:
        # times=[Jan1, Jan3, Jan2] -> [1.0, 1.8, 2.142857]); the
        # scan's signed analytic fold handles non-monotonic stamps
        order = order_exprs(sr._order or [], sdf.columns)
        if not order and ORD_COL in sdf.columns:
            order = [F.col(ORD_COL).asc()]
        out = with_ewm_mean_times(sdf, sr._colexpr, times, self._us,
                                  order, self._mp)
        return Series._make(out, F.col("__ewm__"), sr._index_cols,
                            sr.name, sr._order)._tag_rowpar(sdf)


class _EWM:
    """Exponentially weighted mean (see :meth:`Series.ewm`)."""

    def __init__(self, sr: "Series", alpha: float, min_periods: int,
                 ignore_na: bool, adjust: bool = True):
        self._sr = sr
        self._alpha = alpha
        self._mp = min_periods
        self._ignore_na = ignore_na
        self._adjust = adjust

    def mean(self) -> "Series":
        from ..plans.ordinal import (ORD_COL, with_ewm_mean,
                                     with_ewm_mean_noadjust)
        sr = self._sr
        sdf = sr._sdf
        order = order_exprs(sr._order or [], sdf.columns)
        if not order and ORD_COL in sdf.columns:
            order = [F.col(ORD_COL).asc()]
        scan = with_ewm_mean if self._adjust else with_ewm_mean_noadjust
        out = scan(sdf, sr._colexpr, self._alpha,
                   order or None, self._mp, self._ignore_na)
        return Series._make(out, F.col("__ewm__"), sr._index_cols,
                            sr.name, sr._order)._tag_rowpar(sdf)

    def _stat(self, stat: str, bias: bool = False) -> "Series":
        """sum/var/std. adjust=True rides the four-decayed-sums scan
        (plans/ordinal.with_ewm_stats); adjust=False var/std ride the
        kernel-state perturbation carry
        (plans/ordinal.with_ewm_noadjust_stats) — the renormalizing
        recurrence is not a fixed-weight decayed sum. sum stays
        adjust=True-only because pandas itself refuses
        ewm(adjust=False).sum()."""
        sr = self._sr
        sdf = sr._sdf
        order = order_exprs(sr._order or [], sdf.columns)
        from ..plans.ordinal import (ORD_COL, with_ewm_stats,
                                     with_ewm_noadjust_stats)
        if not order and ORD_COL in sdf.columns:
            order = [F.col(ORD_COL).asc()]
        if not self._adjust:
            if stat == "sum":
                raise NotImplementedError(
                    "ewm(adjust=False).sum() is not supported "
                    "(pandas refuses it too); use adjust=True")
            out = with_ewm_noadjust_stats(
                sdf, {"v": (sr._colexpr, sr._colexpr, (stat,))},
                self._alpha, order or None, self._mp,
                self._ignore_na, bias=bias)
            # row-preserving over sdf -> adopt-eligible (r12; the
            # mean face already tagged, var/std had been missed and
            # every assignment paid the ~8-job positional join)
            return Series._make(out, F.col(f"__ewmna_{stat}_v__"),
                                sr._index_cols, sr.name,
                                sr._order)._tag_rowpar(sdf)
        out = with_ewm_stats(sdf, sr._colexpr, self._alpha,
                             order or None, self._mp,
                             self._ignore_na, bias=bias,
                             stats=(stat,))
        return Series._make(out, F.col(f"__ewm_{stat}__"),
                            sr._index_cols, sr.name,
                            sr._order)._tag_rowpar(sdf)

    def sum(self) -> "Series":
        return self._stat("sum")

    def var(self, bias: bool = False) -> "Series":
        return self._stat("var", bias=bias)

    def std(self, bias: bool = False) -> "Series":
        return self._stat("std", bias=bias)

    def _pair(self, other: "Series", stat: str,
              bias: bool = False) -> "Series":
        """cov/corr with another Series: the standard pairwise
        alignment, then the seven-decayed-sums scan for adjust=True
        (plans/ordinal.with_ewm_pair_stats) or the kernel-state
        perturbation carry for adjust=False
        (plans/ordinal.with_ewm_noadjust_stats); observations need
        BOTH sides non-null, like pandas."""
        from ..plans.ordinal import (POS_COL, with_ewm_pair_stats,
                                     with_ewm_noadjust_stats)
        sr = self._sr
        sdf, a, b = sr._pair_sdf(other)
        on = [c for c in sr._index_cols if c in other._index_cols]
        keys = on or [POS_COL]
        if not self._adjust:
            out = with_ewm_noadjust_stats(
                sdf, {"p": (a, b, (stat,))}, self._alpha,
                [F.col(k).asc() for k in keys], self._mp,
                self._ignore_na, bias=bias)
            return Series._make(out, F.col(f"__ewmna_{stat}_p__"),
                                keys, sr.name,
                                [(k, True) for k in keys])
        out = with_ewm_pair_stats(
            sdf, a, b, self._alpha,
            [F.col(k).asc() for k in keys], self._mp,
            self._ignore_na, bias=bias, stat=stat)
        return Series._make(out, F.col("__ewmp__"), keys, sr.name,
                            [(k, True) for k in keys])

    def cov(self, other: "Series", bias: bool = False) -> "Series":
        return self._pair(other, "cov", bias=bias)

    def corr(self, other: "Series") -> "Series":
        return self._pair(other, "corr")


class _Expanding:
    """Growing-window aggregations (see :meth:`Series.expanding`).
    NaN rows occupy positions but are skipped by the aggregates;
    ``min_periods`` counts non-null observations, except ``count()``
    which pandas gates on rows present — mirroring _Rolling."""

    def __init__(self, sr: "Series", min_periods: int = 1):
        if min_periods < 0:
            raise ValueError(
                f"min_periods must be >= 0, got {min_periods}")
        self._sr = sr
        self._mp = min_periods

    def _emit(self, extra_specs: dict, builder, mp: int,
              gate_on_rows: bool = False):
        from ..plans.ordinal import ORD_COL, with_prefix_aggs
        sr = self._sr
        sdf = sr._sdf
        order = order_exprs(sr._order or [], sdf.columns)
        if not order and ORD_COL in sdf.columns:
            order = [F.col(ORD_COL).asc()]
        specs = {"__pc__": (sr._colexpr, "count")}
        if gate_on_rows:
            specs["__pr__"] = (F.lit(1), "count")
        specs.update(extra_specs)
        out = with_prefix_aggs(sdf, specs, order or None)
        gate = F.col("__pr__") if gate_on_rows else F.col("__pc__")
        expr = F.when(gate >= mp if mp > 0 else F.lit(True), builder())
        out = out.withColumn("__exp__", expr.cast("double")) \
            .drop(*specs)
        return Series._make(out, F.col("__exp__"), sr._index_cols,
                            sr.name, sr._order)._tag_rowpar(sdf)

    def _v(self):
        return self._sr._colexpr.cast("double")

    def sum(self) -> "Series":
        return self._emit({"__ps__": (self._v(), "sum")},
                          lambda: F.coalesce(F.col("__ps__"),
                                             F.lit(0.0)), self._mp)

    def mean(self) -> "Series":
        return self._emit({"__ps__": (self._v(), "sum")},
                          lambda: F.col("__ps__") / F.col("__pc__"),
                          max(self._mp, 1))

    def count(self) -> "Series":
        return self._emit({}, lambda: F.col("__pc__"), self._mp,
                          gate_on_rows=True)

    def min(self) -> "Series":
        return self._emit({"__pm__": (self._sr._colexpr, "min")},
                          lambda: F.col("__pm__"), max(self._mp, 1))

    def max(self) -> "Series":
        return self._emit({"__pm__": (self._sr._colexpr, "max")},
                          lambda: F.col("__pm__"), max(self._mp, 1))

    def median(self, max_rows: int | None = None):
        """Global expanding median — see :meth:`_order_stat` for the
        budget contract."""
        return self._order_stat("median", max_rows)

    def quantile(self, q: float = 0.5,
                 interpolation: str = "linear",
                 max_rows: int | None = None):
        """Global expanding quantile — see :meth:`_order_stat`."""
        return self._order_stat("quantile", max_rows, q=q,
                                interpolation=interpolation)

    def rank(self, method: str = "average", ascending: bool = True,
             pct: bool = False, max_rows: int | None = None):
        """Global expanding rank — full history per row, so it
        rides the budgeted pass (see :meth:`_order_stat`)."""
        return self._order_stat("rank", max_rows, method=method,
                                ascending=ascending, pct=pct)

    def apply(self, func, raw: bool = False, args=(), kwargs=None,
              max_rows: int | None = None):
        """Global expanding apply (arbitrary per-window callable) —
        the honest slow path, on the budgeted pass."""
        return self._order_stat("apply", max_rows, func=func,
                                raw=raw, args=args,
                                kwargs=kwargs or {})

    def _order_stat(self, stat: str, max_rows: int | None, **kw):
        """Global expanding order statistic. Row i needs its FULL
        history (no bounded carry exists — unlike the fixed-window
        order stats, which carry w-1 donor rows), so this face is an
        EXPLICITLY BUDGETED single-partition pandas pass, the same
        honest-gate pattern as tokenize/lm: one count job checks the
        budget (default ``_EXPANDING_STAT_MAX_ROWS``), then one
        ordered partition runs pandas' expanding C kernel once.
        Above the budget it raises naming the distributed
        alternatives (fixed rolling window / grouped expanding,
        where groups are local)."""
        import pandas as pd
        from pyspark.sql import types as T

        from ..plans.ordinal import ORD_COL
        sr = self._sr
        sdf = sr._sdf
        budget = (int(max_rows) if max_rows is not None
                  else _EXPANDING_STAT_MAX_ROWS)
        n = sdf.count()
        if n > budget:
            raise ValueError(
                f"global expanding {stat} needs the full history "
                f"per row (no bounded carry exists), so this face "
                f"is a budgeted single-partition pandas pass: "
                f"{n} rows exceed max_rows={budget}. Raise "
                f"max_rows=, use a fixed rolling window, or "
                f"groupby(...).expanding().{stat}() (groups are "
                "local)")
        order = order_exprs(sr._order or [], sdf.columns)
        if not order and ORD_COL in sdf.columns:
            order = [F.col(ORD_COL).asc()]
        lay = sdf.select("*", sr._colexpr.cast("double")
                         .alias("__ev__")).repartition(1)
        if order:
            lay = lay.sortWithinPartitions(*order)
        mp = self._mp
        out_schema = T.StructType(
            list(lay.schema.fields)
            + [T.StructField("__exp__", T.DoubleType())])

        def gen(batches):
            chunks = [b for b in batches if len(b)]
            if not chunks:
                return
            allb = pd.concat(chunks, ignore_index=True)
            allb["__exp__"] = getattr(
                allb["__ev__"].expanding(mp), stat)(**kw).to_numpy()
            yield allb

        out = lay.mapInPandas(gen, out_schema).drop("__ev__")
        # row-preserving over sdf -> adopt-eligible (r12)
        return Series._make(out, F.col("__exp__"), sr._index_cols,
                            sr.name, sr._order)._tag_rowpar(sdf)

    def var(self, ddof: int = 1) -> "Series":
        def build():
            s, c = F.col("__ps__"), F.col("__pc__")
            num = F.greatest(F.col("__pq__") - s * s / c, F.lit(0.0))
            return F.when(c > ddof, num / (c - ddof))
        v = self._v()
        return self._emit({"__ps__": (v, "sum"),
                           "__pq__": (v * v, "sum")},
                          build, max(self._mp, ddof + 1))

    def std(self, ddof: int = 1) -> "Series":
        def build():
            s, c = F.col("__ps__"), F.col("__pc__")
            num = F.greatest(F.col("__pq__") - s * s / c, F.lit(0.0))
            return F.when(c > ddof, F.sqrt(num / (c - ddof)))
        v = self._v()
        return self._emit({"__ps__": (v, "sum"),
                           "__pq__": (v * v, "sum")},
                          build, max(self._mp, ddof + 1))

    def sem(self, ddof: int = 1) -> "Series":
        """Standard error over the growing window — same prefix
        sums. pandas' WINDOW sem is SAMPLE-std / sqrt(n - ddof):
        the numerator stays ddof=1 regardless of the ddof argument
        (probed r10 on expanding AND rolling — the old
        std(ddof)/sqrt(n-ddof) form diverged for ddof=0; unlike the
        scalar Series.sem, which is std/sqrt(n))."""
        def build():
            s, c = F.col("__ps__"), F.col("__pc__")
            num = F.greatest(F.col("__pq__") - s * s / c, F.lit(0.0))
            # n == ddof boundary: pandas emits +inf (finite std /
            # sqrt(0)) unless the window is constant (0/0 -> NaN)
            return (F.when((c > 1) & (c > ddof),
                           F.sqrt(num / (c - 1))
                           / F.sqrt(c - ddof))
                     .when((c > 1) & (c == ddof) & (num > 0),
                           F.lit(float("inf"))))
        v = self._v()
        return self._emit({"__ps__": (v, "sum"),
                           "__pq__": (v * v, "sum")},
                          build, max(self._mp, 2))

    def _center(self):
        """Global mean of the series (one tiny agg job): skew/kurt
        are SHIFT-INVARIANT, so prefix sums of (x - mu)^k keep the
        third/fourth powers near zero instead of ~mean^4 — without
        this the sum-of-powers identities cancel catastrophically on
        large-mean data (prices ~1e5 -> x^4 ~ 1e20 per row)."""
        row = self._sr._sdf.agg(
            F.avg(self._v()).alias("m")).first()
        return float(row["m"]) if row["m"] is not None else 0.0

    def skew(self) -> "Series":
        """Bias-corrected sample skewness over the growing window
        (pandas ``Expanding.skew``): prefix sums of the centered
        first three powers, Fisher-Pearson adjustment, NaN below 3
        observations — one prefix pass + one scalar pre-agg."""
        mu = self._center()

        def build():
            c = F.col("__pc__").cast("double")
            s1, s2, s3 = F.col("__ps__"), F.col("__pq__"), F.col("__p3__")
            m = s1 / c
            m2 = F.greatest(s2 / c - m * m, F.lit(0.0))
            m3 = s3 / c - 3 * m * s2 / c + 2 * m * m * m
            g1 = m3 / F.pow(m2, 1.5)
            adj = F.sqrt(c * (c - 1)) / (c - 2)
            # pandas' window kernels special-case EXACT zero
            # variance (a constant window) as skew 0.0 — near-zero
            # variance stays NaN (their eps threshold)
            return F.when(c >= 3,
                          F.when(m2 > 0, g1 * adj)
                          .otherwise(F.when(m2 == 0, F.lit(0.0))))
        y = self._v() - F.lit(mu)
        return self._emit({"__ps__": (y, "sum"),
                           "__pq__": (y * y, "sum"),
                           "__p3__": (y * y * y, "sum")},
                          build, max(self._mp, 3))

    def kurt(self) -> "Series":
        """Bias-corrected excess kurtosis over the growing window
        (pandas ``Expanding.kurt``): centered prefix sums up to the
        fourth power, the (n+1)g2+6 correction, NaN below 4 obs."""
        mu = self._center()

        def build():
            c = F.col("__pc__").cast("double")
            s1, s2 = F.col("__ps__"), F.col("__pq__")
            s3, s4 = F.col("__p3__"), F.col("__p4__")
            m = s1 / c
            m2 = F.greatest(s2 / c - m * m, F.lit(0.0))
            m4 = (s4 / c - 4 * m * s3 / c + 6 * m * m * s2 / c
                  - 3 * m * m * m * m)
            g2 = m4 / (m2 * m2) - 3
            corr = ((c + 1) * g2 + 6) * (c - 1) / ((c - 2) * (c - 3))
            # pandas' window kernels emit -3.0 (the raw excess of a
            # point mass, uncorrected) for EXACT zero variance
            return F.when(c >= 4,
                          F.when(m2 > 0, corr)
                          .otherwise(F.when(m2 == 0, F.lit(-3.0))))
        y = self._v() - F.lit(mu)
        return self._emit({"__ps__": (y, "sum"),
                           "__pq__": (y * y, "sum"),
                           "__p3__": (y * y * y, "sum"),
                           "__p4__": (y * y * y * y, "sum")},
                          build, max(self._mp, 4))

    def _pair(self, other: "Series", stat: str,
              ddof: int = 1) -> "Series":
        """Expanding cov/corr with another Series: prefix sums over
        the JOINTLY valid pairs — the rolling pair scan without the
        boundary shift. Same-frame pairs share the plan; cross-frame
        pairs align positionally."""
        if not isinstance(other, Series):
            raise TypeError(
                f"expected Series, got {type(other).__name__}")
        from ..plans.ordinal import (ORD_COL, POS_COL,
                                     with_prefix_aggs)
        sr = self._sr
        if other._sdf is sr._sdf:
            sdf, a, b = sr._sdf, sr._colexpr, other._colexpr
            order = order_exprs(sr._order or [], sdf.columns)
            if not order and ORD_COL in sdf.columns:
                order = [F.col(ORD_COL).asc()]
            idx = sr._index_cols
        else:
            lo, la = sr._ordered_sdf("__pa__")
            ro, rb = other._ordered_sdf("__pb__")
            sdf = lo.join(ro.select(POS_COL, rb), POS_COL, "inner")
            a, b = F.col("__pa__"), F.col("__pb__")
            order = [F.col(POS_COL).asc()]
            idx = [c for c in sr._index_cols if c in sdf.columns]
        both = a.isNotNull() & b.isNotNull()
        ax = F.when(both, a.cast("double"))
        by = F.when(both, b.cast("double"))
        specs = {"__px__": (ax, "sum"), "__py__": (by, "sum"),
                 "__pxy__": (ax * by, "sum"), "__pn__": (ax, "count")}
        if stat == "corr":
            specs["__pxx__"] = (ax * ax, "sum")
            specs["__pyy__"] = (by * by, "sum")
        out = with_prefix_aggs(sdf, specs, order or None)
        n = F.col("__pn__").cast("double")
        sx, sy, sxy = F.col("__px__"), F.col("__py__"), F.col("__pxy__")
        if stat == "cov":
            val = F.when(n > ddof, (sxy - sx * sy / n) / (n - ddof))
        else:
            vx = F.col("__pxx__") - sx * sx / n
            vy = F.col("__pyy__") - sy * sy / n
            val = F.when((n > 1) & (vx > 0) & (vy > 0),
                         (sxy - sx * sy / n) / F.sqrt(vx * vy))
        mp = max(self._mp, 1)
        expr = F.when(n >= mp, val).cast("double")
        out = out.withColumn("__exp__", expr).drop(*specs)
        return Series._make(out, F.col("__exp__"), idx, sr.name,
                            sr._order)

    def cov(self, other: "Series", ddof: int = 1) -> "Series":
        return self._pair(other, "cov", ddof=ddof)

    def corr(self, other: "Series") -> "Series":
        return self._pair(other, "corr")


def _norm_pos(i: int, n: int) -> int:
    """pandas negative position -> absolute (IndexError past front)."""
    if i < 0:
        i += n
        if i < 0:
            raise IndexError(f"iloc index {i - n} out of range")
    return i


class CallableSeries(Series):
    """A Series that is ALSO a no-arg callable returning itself —
    the compatibility shim behind the ``.dt`` accessor (r11):
    pandas spells calendar fields as PROPERTIES (``sr.dt.year``)
    while the engine historically spelled them as methods
    (``sr.dt.year()``); the accessor now returns this type so both
    spellings work."""

    def __call__(self):
        return self


class _SeriesILoc:
    """Positional lookup (core/indexing.py:9-54)."""

    def __init__(self, sr: Series):
        self._sr = sr

    def __getitem__(self, key):
        from ..plans.ordinal import POS_COL
        if isinstance(key, (int, np.integer)):
            key = int(key)
            if key < 0:
                key = _norm_pos(key, len(self._sr))
        if isinstance(key, int):
            sdf, alias = self._sr._ordered_sdf()
            row = sdf.filter(F.col(POS_COL) == key).select(alias).first()
            if row is None:
                raise IndexError(f"iloc index {key} out of range")
            return row[alias]
        if isinstance(key, slice):
            return self._sr._slice(key)
        if isinstance(key, (list, np.ndarray)):
            if any(int(i) < 0 for i in key):
                n = len(self._sr)
                key = [_norm_pos(int(i), n) for i in key]
            # gather by ordinal list via broadcast join (weld_ops.py:333-367)
            sdf, alias = self._sr._ordered_sdf()
            spark = sdf.sparkSession
            want = spark.createDataFrame(
                [(int(i), int(p)) for p, i in enumerate(key)],
                f"{POS_COL} LONG, __gather__ LONG")
            sdf = sdf.drop(ORD_COL) if ORD_COL in sdf.columns else sdf
            out = (sdf.join(F.broadcast(want), POS_COL)
                   .drop(POS_COL).withColumnRenamed("__gather__", ORD_COL))
            return Series._make(out, F.col(alias), self._sr._index_cols,
                                self._sr.name, [(ORD_COL, True)])
        raise TypeError(f"unsupported iloc key: {type(key)}")

    def __setitem__(self, key, value):
        """``sr.iloc[rows] = value`` / ``sr.iat[i] = value`` (r11):
        the positional write — lifts through the one-column frame's
        iloc face (ordinal conditions, no collect) and adopts the
        result in place (copy-on-write: no parent-frame
        write-back)."""
        sr = self._sr
        vname = sr.name or _VAL
        fr = sr._to_frame_ordered()
        fr.iloc[key, 0] = value
        sr._swap_in(fr[vname])


class _SeriesLoc:
    """Label indexer behind :attr:`Series.loc`."""

    def __init__(self, sr: "Series"):
        self._sr = sr

    def __getitem__(self, key):
        sr = self._sr
        if isinstance(key, slice):
            if key == slice(None):
                return sr
            raise TypeError("label slices are not supported in loc; "
                            "use iloc for positional slices")
        if isinstance(key, Series):
            # pandas .loc label-aligns a FOREIGN boolean Series and
            # reads a NON-boolean Series' values as requested
            # labels (same contract as the frame face — see
            # frame._loc_bool_series/_loc_label_series);
            # same-lineage boolean masks keep the cheap filter
            from pyspark.sql import types as T
            dt = key._sdf.select(
                key._colexpr.alias("__m__")).schema[0].dataType
            if (isinstance(dt, T.BooleanType)
                    and key._sdf is sr._sdf):
                return sr[key]
            from .frame import _loc_bool_series
            fr = sr._to_frame_ordered()
            return _loc_bool_series(fr, key)[sr.name or _VAL]
        if not sr._index_cols:
            raise ValueError("loc needs an index")
        k = sr._index_cols[0]
        if isinstance(key, (list, tuple, np.ndarray)):
            labels = list(key)
            # a BOOLEAN list/array is a positional MASK in pandas
            # (length-checked IndexError), not labels
            if labels and all(isinstance(v, (bool, np.bool_))
                              for v in labels):
                n = len(sr)
                if len(labels) != n:
                    raise IndexError(
                        f"Boolean index has wrong length: "
                        f"{len(labels)} instead of {n}")
                return sr.iloc[[i for i, b in enumerate(labels)
                                if b]]
            # pandas returns rows in the REQUESTED label order with
            # repeated labels duplicated (s.loc[['a','a']] has two
            # rows) — a position-tagged lookup join, the reindex
            # shape, not an isin filter (which kept original order
            # and deduped). One tiny probe job raises KeyError on
            # any miss; the lookup table is driver-sized, so the
            # broadcast is bounded.
            from ..plans.ordinal import POS_COL
            vname = sr.name or _VAL
            sdf, a = sr._ordered_sdf(vname)
            spark = sdf.sparkSession
            want = spark.createDataFrame(
                [(int(p), lbl) for p, lbl in enumerate(labels)],
                ["__wpos__", "__wlbl__"])
            # KeyError gate: one tiny job counts HIT labels (semi
            # join, small side broadcast). After it passes every
            # requested label matches, so the gather itself is an
            # INNER join — the broadcastable shape (a row-preserving
            # outer join cannot broadcast its preserved side).
            uniq = want.select("__wlbl__").distinct()
            hit = (sdf.join(F.broadcast(uniq),
                            F.col("__wlbl__").eqNullSafe(F.col(k)),
                            "left_semi")
                   .select(k).distinct().count())
            if hit < len(set(labels)):
                raise KeyError(f"{labels!r} not all in index")
            out = (sdf.join(F.broadcast(want),
                            F.col("__wlbl__").eqNullSafe(F.col(k)),
                            "inner")
                   .drop("__wlbl__"))
            return Series._make(out, F.col(a), sr._index_cols,
                                sr.name, [("__wpos__", True),
                                          (POS_COL, True)])
        sentinel = object()
        got = sr.get(key, sentinel)
        if got is sentinel:
            raise KeyError(key)
        return got

    def __setitem__(self, key, value):
        """``sr.loc[rows] = value`` / ``sr.at[label] = value``
        (r11): lifts through the one-column frame and rides the
        frame loc-set projection — same gates (enlargement refused
        with the concat alternative named, null-safe label hits,
        boolean lists positional, foreign boolean Series
        label-aligned) — then adopts the result in place.
        Copy-on-write: the write never propagates to a frame this
        Series was selected from. Tuple keys (MultiIndex label
        writes) are refused — spell them on the frame face."""
        if isinstance(key, tuple):
            raise NotImplementedError(
                "MultiIndex label writes are not supported on the "
                "Series face (a tuple key is ambiguous with the "
                "frame's (rows, col) spelling); use "
                "df.loc[labels, col] = value on the owning frame")
        sr = self._sr
        vname = sr.name or _VAL
        fr = sr._to_frame_ordered()
        fr.loc[key, vname] = value
        sr._swap_in(fr[vname])


_Rolling.agg = _Rolling.aggregate = _window_agg


def _expanding_agg(self, func):
    """pandas ``.agg`` on an expanding window. The moment family —
    sum/mean/count/min/max/var/std/sem, ALL prefix-decomposable for
    growing windows — fuses into ONE with_prefix_aggs pass (the
    r10 fusion lesson: each separate call pays its own
    layout+carry scheme). Order statistics fall back to the
    positional per-stat binder."""
    _MOMENT = ("sum", "mean", "count", "min", "max", "var", "std",
               "sem")
    if isinstance(func, str):
        return getattr(self, func)()
    try:
        items = (list(func.items()) if isinstance(func, dict)
                 else [(f, f) for f in func])
    except AttributeError:
        return _window_agg(self, func)
    if not items:
        raise ValueError("no results")
    if len({str(n) for n, _ in items}) < len(items):
        raise ValueError(
            "duplicate output names in .agg; engine columns are "
            "uniquely named — use a dict to alias each statistic")
    if not all(isinstance(st, str) and st in _MOMENT
               for _, st in items):
        return _window_agg(self, func)
    from ..plans.ordinal import ORD_COL, with_prefix_aggs
    from .frame import DataFrame
    sr = self._sr
    sdf = sr._sdf
    order = order_exprs(sr._order or [], sdf.columns)
    if not order and ORD_COL in sdf.columns:
        order = [F.col(ORD_COL).asc()]
    stats = {st for _, st in items}
    v = sr._colexpr.cast("double")
    specs = {"__pc__": (sr._colexpr, "count"),
             "__pr__": (F.lit(1), "count")}
    if stats & {"sum", "mean", "var", "std", "sem"}:
        specs["__ps__"] = (v, "sum")
    if stats & {"var", "std", "sem"}:
        specs["__pq__"] = (v * v, "sum")
    if "min" in stats:
        specs["__pmin__"] = (sr._colexpr, "min")
    if "max" in stats:
        specs["__pmax__"] = (sr._colexpr, "max")
    out = with_prefix_aggs(sdf, specs, order or None)
    s, c = F.col("__ps__"), F.col("__pc__")
    num = F.greatest(F.col("__pq__") - s * s / c, F.lit(0.0))
    mp = self._mp

    def gated(e, m, rows_gate=False):
        gate = F.col("__pr__") if rows_gate else c
        return (F.when(gate >= m, e) if m > 0 else e)

    builders = {
        "sum": lambda: gated(F.coalesce(s, F.lit(0.0)), mp),
        "mean": lambda: gated(s / c, max(mp, 1)),
        "count": lambda: gated(c, mp, rows_gate=True),
        "min": lambda: gated(F.col("__pmin__"), max(mp, 1)),
        "max": lambda: gated(F.col("__pmax__"), max(mp, 1)),
        "var": lambda: gated(F.when(c > 1, num / (c - 1)),
                             max(mp, 2)),
        "std": lambda: gated(F.when(c > 1, F.sqrt(num / (c - 1))),
                             max(mp, 2)),
        "sem": lambda: gated(F.when(c > 1, F.sqrt(num / (c - 1))
                                    / F.sqrt(c - 1)), max(mp, 2)),
    }
    outs = [builders[st]().cast("double").alias(str(nm))
            for nm, st in items]
    keep = [cc for cc in out.columns
            if cc not in specs
            and (cc in sr._index_cols
                 or cc in [o for o, _ in (sr._order or [])]
                 or cc == ORD_COL)
            and cc not in {str(nm) for nm, _ in items}]
    return DataFrame._make(out.select(*keep, *outs),
                           list(sr._index_cols),
                           [str(nm) for nm, _ in items], sr._order)


_Expanding.agg = _Expanding.aggregate = _expanding_agg
# _TimeRolling defines its own fused agg (moment family in one
# prefix pass); _window_agg remains its order-stat fallback inside
_EWM.agg = _EWM.aggregate = _window_agg
