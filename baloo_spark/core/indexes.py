"""Index types.

Reference: ``baloo/core/indexes/`` — Index (named typed label column,
base.py:11), RangeIndex (lazy 0..n, range.py:8), MultiIndex (list of
Index columns, multi.py:14 — explicitly NOT pandas levels: it "merely
groups a few columns together to act as an index").

In this engine an index is metadata over ordinary Spark columns: the
frame tracks which columns are index columns, and every distributed
operation (merge-on-index, dropna, sort_index, to_pandas round-trip)
runs on those columns inside the Spark plan. The classes here carry
the names/values for API parity at the construction and introspection
boundaries; values attached to a live frame are fetched lazily (one
select of just the index columns) only when ``.values`` is read.
"""

from __future__ import annotations

import numpy as np


class Index:
    """Named, typed label column (reference base.py:11-78).

    Lazily Series-backed: construction from driver-side data is cheap
    (a numpy array, no Spark plan yet), but every OPERATION —
    comparison, arithmetic, ``&|~``, boolean filter, slice, ``head``/
    ``tail``, ``astype``, ``isna``/``dropna``/``fillna`` — routes
    through a backing lazy :class:`~baloo_spark.core.series.Series`,
    so it composes Catalyst Column expressions exactly like Series
    does (reference: Index shares BinaryOps/BitOps with Series,
    base.py:11,64-103). Nothing evaluates until ``.values`` /
    ``evaluate()``; an Index attached to a live frame operates over
    the frame's own plan without collecting.

    Examples (executable, tests/test_doctests.py):

    >>> import numpy as np
    >>> from baloo_spark.core.indexes import Index
    >>> ix = Index(np.arange(5), np.dtype(np.int64))
    >>> ix
    Index(name=None, dtype=int64)
    >>> out = ix[ix < 3] * 10     # composes lazily — no Spark job yet
    >>> out._values is None
    True
    >>> out.values.tolist()       # evaluation happens here
    [0, 10, 20]
    >>> ix.astype('float64').dtype.name   # schema-only, no evaluation
    'float64'
    >>> (ix.min(), ix.max())      # aggs are f64, reference parity
    (0.0, 4.0)
    """

    def __init__(self, data=None, dtype=None, name=None):
        self.name = name
        self._values = None
        self._fetch = None   # numpy supplier attached by DataFrame.index
        self._series = None  # lazy backing Series (built on demand)
        if data is not None:
            from .series import Series
            if isinstance(data, Index):
                self._values, self._series = data._values, data._series
                self._fetch = data._fetch
                if name is None:
                    self.name = data.name
            elif isinstance(data, Series):
                self._series = data
                if name is None:
                    self.name = data.name
            else:
                self._values = np.asarray(getattr(data, "values", data),
                                          dtype=dtype)

    # ------------------------------------------------------------ backing

    @classmethod
    def _from_series(cls, sr, name=None) -> "Index":
        ix = cls(name=name if name is not None else sr.name)
        ix._series = sr
        return ix

    @property
    def _backing(self):
        """The lazy Series this Index operates through. For a
        raw-data Index it is built once from the held values; for a
        frame-attached Index it is the frame's own index column (no
        collect)."""
        if self._series is None:
            from .series import Series
            vals = self.values
            if vals is None:
                raise ValueError("Index has no data")
            self._series = Series(
                vals, name=self.name if isinstance(self.name, str) else None)
        return self._series

    def _lazy(self, sr) -> "Index":
        ix = Index._from_series(sr)
        ix.name = self.name
        return ix

    @staticmethod
    def _unwrap(other):
        return other._backing if isinstance(other, Index) else other

    # ------------------------------------------------------- introspection

    @property
    def values(self):
        if self._values is None:
            if self._fetch is not None:
                self._values = self._fetch()
            elif self._series is not None:
                self._values = self._series.values
        return self._values

    @property
    def dtype(self):
        if self._values is not None:
            return self._values.dtype
        if self._series is not None:
            return self._series.dtype  # schema-only, no evaluation
        v = self.values
        return None if v is None else v.dtype

    def __len__(self):
        if self._values is None and self._series is not None:
            return len(self._series)  # count, not collect
        v = self.values
        return 0 if v is None else len(v)

    @property
    def empty(self) -> bool:
        return len(self) == 0

    def evaluate(self) -> "Index":
        """Force computation; return a materialized Index (reference
        base.py:180-193)."""
        return Index(self.values, name=self.name)

    # -------------------------------- lazy operators (reference BinaryOps)

    # comparisons vs scalar/array/Index -> lazy boolean Index
    def __lt__(self, o): return self._lazy(self._backing < Index._unwrap(o))
    def __le__(self, o): return self._lazy(self._backing <= Index._unwrap(o))
    def __gt__(self, o): return self._lazy(self._backing > Index._unwrap(o))
    def __ge__(self, o): return self._lazy(self._backing >= Index._unwrap(o))

    def __eq__(self, o):  # noqa: A003 - pandas-style elementwise eq
        return self._lazy(self._backing == Index._unwrap(o))

    def __ne__(self, o):
        return self._lazy(self._backing != Index._unwrap(o))

    __hash__ = None  # elementwise __eq__ (same stance as Series)

    # bit ops (reference BitOps -> weld_array_op)
    def __and__(self, o): return self._lazy(self._backing & Index._unwrap(o))
    def __or__(self, o): return self._lazy(self._backing | Index._unwrap(o))
    def __invert__(self): return self._lazy(~self._backing)

    def isin(self, values):
        """Label membership mask (pandas ``Index.isin``) — lazy, same
        two-face literal/broadcast-join treatment as Series.isin."""
        return self._lazy(self._backing.isin(values))

    # arithmetic (reference base.py:84-103; result stays an Index)
    def __add__(self, o): return self._lazy(self._backing + Index._unwrap(o))
    def __radd__(self, o): return self.__add__(o)
    def __sub__(self, o): return self._lazy(self._backing - Index._unwrap(o))
    def __mul__(self, o): return self._lazy(self._backing * Index._unwrap(o))
    def __rmul__(self, o): return self.__mul__(o)
    def __truediv__(self, o):
        return self._lazy(self._backing / Index._unwrap(o))
    def __pow__(self, o): return self._lazy(self._backing ** Index._unwrap(o))
    def __mod__(self, o): return self._lazy(self._backing % Index._unwrap(o))

    # ------------------------------------- aggregations (LazyArrayResult)

    def min(self):
        """Minimum label (reference lazy_result.py:116-126; eager here
        like every Series aggregation — one Spark job)."""
        return self._backing.min()

    def max(self):
        return self._backing.max()

    # ----------------------------------------- Series-backed delegations

    def unique(self) -> "Index":
        return self._lazy(self._backing.unique())

    def nunique(self, dropna: bool = True):
        return self._backing.nunique(dropna=dropna)

    def value_counts(self, **kw):
        return self._backing.value_counts(**kw)

    def sort_values(self, ascending: bool = True) -> "Index":
        return self._lazy(self._backing.sort_values(
            ascending=ascending))

    def argmax(self) -> int:
        return self._backing.argmax()

    def argmin(self) -> int:
        return self._backing.argmin()

    def tolist(self) -> list:
        return self._backing.tolist()

    to_list = tolist

    def drop_duplicates(self, keep: str = "first") -> "Index":
        return self._lazy(self._backing.drop_duplicates(keep=keep))

    def duplicated(self, keep: str = "first"):
        return self._backing.duplicated(keep=keep)

    @property
    def is_unique(self) -> bool:
        return self._backing.is_unique

    @property
    def is_monotonic_increasing(self) -> bool:
        return self._backing.is_monotonic_increasing

    @property
    def is_monotonic_decreasing(self) -> bool:
        return self._backing.is_monotonic_decreasing

    def _set_op(self, other, op: str) -> "Index":
        """DISTINCT-label set algebra (pandas union/intersection/
        difference, sort=None flavor: result sorted, NaN last).
        Documented divergences: pandas' union keeps max multiplicity
        when an input holds duplicate labels (distributed set
        operators are distinct by nature — duplicated-label indexes
        are the corner the engine's uniqueness guards discourage
        anyway), and pandas SKIPS the sort when either input is
        empty (returns self's order) — the engine always sorts
        (checking emptiness would cost an eager count per call)."""
        from .series import Series
        a = self._backing._select("__ix__")[0].select("__ix__")
        b = Index._unwrap(other)._select("__ix__")[0].select("__ix__")
        out = {"union": a.union(b).distinct(),
               "intersection": a.intersect(b),
               "difference": a.subtract(b)}[op]
        from pyspark.sql import functions as F
        from .ordering import order_expr
        sr = Series._make(out.orderBy(order_expr("__ix__", True)),
                          F.col("__ix__"), None, self.name,
                          [("__ix__", True)])
        return self._lazy(sr)

    def union(self, other) -> "Index":
        return self._set_op(other, "union")

    def intersection(self, other) -> "Index":
        return self._set_op(other, "intersection")

    def difference(self, other) -> "Index":
        return self._set_op(other, "difference")

    # ------------------------------------------------- missing data / cast

    def isna(self) -> "Index":
        return self._lazy(self._backing.isna())

    def notna(self) -> "Index":
        return self._lazy(self._backing.notna())

    def dropna(self) -> "Index":
        return self._lazy(self._backing.dropna())

    def fillna(self, value) -> "Index":
        return self._lazy(self._backing.fillna(value))

    def astype(self, dtype) -> "Index":
        return self._lazy(self._backing.astype(dtype))

    # ----------------------------------------------------------- selection

    def __getitem__(self, item):
        from .series import Series
        if isinstance(item, (Index, Series)):
            # boolean-mask filter, built lazily (reference base.py:146-160)
            mask = item._backing if isinstance(item, Index) else item
            return self._lazy(self._backing[mask])
        if isinstance(item, slice):
            start, stop = item.start, item.stop
            if (start is not None and start < 0) or \
                    (stop is not None and stop < 0):
                n = len(self)
                start = None if start is None else (
                    max(n + start, 0) if start < 0 else start)
                stop = None if stop is None else (
                    n + stop if stop < 0 else stop)
                item = slice(start, stop, item.step)
            return self._lazy(self._backing[item])
        # numpy fancy/positional selection stays a driver-side gather
        return Index(self.values[item], name=self.name)

    def head(self, n: int = 5) -> "Index":
        return self._lazy(self._backing.head(n))

    def tail(self, n: int = 5) -> "Index":
        return self._lazy(self._backing.tail(n))

    # ---------------------------------------------------------- interop

    def to_pandas(self):
        import pandas as pd
        return pd.Index(self.values, name=self.name)

    @classmethod
    def from_pandas(cls, index) -> "Index":
        return cls(np.asarray(index), name=index.name)

    def __repr__(self):
        return f"Index(name={self.name}, dtype={self.dtype})"

    def __str__(self):
        return str(self.values)


class RangeIndex(Index):
    """Lazy start..stop:step (reference weld_range, range.py:43-63).
    Never materialized driver-side; on a live frame it is realized as
    the __ord__ column on demand through the scale-safe dense-ordinal
    plan (:mod:`baloo_spark.plans.ordinal`). ``RangeIndex(5)`` means
    0..4, like the reference and ``range``."""

    def __init__(self, start: int | None = None, stop: int | None = None,
                 step: int = 1, name=None):
        super().__init__(None, None, name)
        if stop is None:
            start, stop = 0, start
        if step is not None and step < 1:
            # reference range.py:104
            raise ValueError("Only positive steps are currently supported")
        self.start, self.stop, self.step = start or 0, stop, step or 1

    @property
    def values(self):
        if self._values is not None:
            return self._values
        if self.stop is None and self._fetch is not None:
            self._values = self._fetch()
            return self._values
        if self.stop is None and self._series is not None:
            self._values = self._series.values
            return self._values
        if self.stop is None:
            return None
        return np.arange(self.start, self.stop, self.step)

    def __len__(self):
        if self.stop is not None:
            return len(range(self.start, self.stop, self.step))
        return super().__len__()

    def __repr__(self):
        return (f"RangeIndex(start={self.start}, stop={self.stop}, "
                f"step={self.step})")


class MultiIndex:
    """Group of Index columns acting together as the frame's index
    (reference multi.py:14-59 — NOT pandas labels/levels; just named
    columns).

    Construction is a driver-side operation by definition (you hand it
    arrays), so the levels are numpy-backed here; once attached to a
    DataFrame via ``index=`` or ``set_index(list)`` the levels live as
    ordinary Spark columns and all heavy operations stay distributed.

    Examples
    --------
    >>> import numpy as np
    >>> from baloo_spark.core.indexes import MultiIndex
    >>> mi = MultiIndex([[1, 2, 3], np.array([4., 5., 6.])],
    ...                 names=['i1', 'i2'])
    >>> mi
    MultiIndex(names=['i1', 'i2'])
    >>> len(mi)
    3
    >>> [ix.name for ix in mi.values]
    ['i1', 'i2']
    """

    def __init__(self, data: list, names: list | None = None):
        if names is not None and len(names) != len(data):
            # reference multi.py:271-272
            raise ValueError("Expected all or none of the columns to be named")
        names = names or [getattr(d, "name", None) for d in data]
        self.indexes = []
        for d, n in zip(data, names):
            ix = d if isinstance(d, Index) else Index(d, name=n)
            if ix.name is None:
                ix.name = n
            self.indexes.append(ix)
        lens = {len(ix) for ix in self.indexes if ix._values is not None}
        if len(lens) > 1:
            raise ValueError(f"MultiIndex levels differ in length: {lens}")
        self.names = [ix.name for ix in self.indexes]

    @property
    def values(self) -> list:
        """List of the level Index objects (reference multi.py:61-71)."""
        return self.indexes

    @property
    def dtypes(self) -> list:
        return [ix.dtype for ix in self.indexes]

    @property
    def empty(self) -> bool:
        return len(self.indexes) == 0 or all(
            len(ix) == 0 for ix in self.indexes)

    def __len__(self):
        return 0 if not self.indexes else len(self.indexes[0])

    def _level_names(self, prefix: str = "level_") -> list:
        """Effective column names — unnamed levels get ``level_<i>``
        (reference multi.py:143-145)."""
        return [f"{prefix}{i}" if n is None else n
                for i, n in enumerate(self.names)]

    def __getitem__(self, item):
        """Boolean-mask or slice selection applied to every level
        (reference multi.py:162-193)."""
        if isinstance(item, slice):
            return MultiIndex([ix[item] for ix in self.indexes], self.names)
        mask = np.asarray(getattr(item, "values", item))
        if mask.dtype != np.bool_:
            raise TypeError("Expected a boolean mask or slice")
        return MultiIndex([ix[mask] for ix in self.indexes], self.names)

    def dropna(self) -> "MultiIndex":
        """Rows where EVERY level is non-null (reference
        multi.py:213-225: AND of per-level notna)."""
        from functools import reduce
        mask = reduce(lambda a, b: a & b,
                      (ix.notna() for ix in self.indexes))
        return self[mask]

    def tail(self, n: int = 5) -> "MultiIndex":
        return self[slice(-n, None)]

    @classmethod
    def from_pandas(cls, index) -> "MultiIndex":
        """From a pandas MultiIndex (reference multi.py:227-246)."""
        levels = [Index(np.asarray(index.get_level_values(i)),
                        name=index.names[i])
                  for i in range(index.nlevels)]
        return cls(levels, list(index.names))

    def to_pandas(self):
        """To a pandas MultiIndex (reference multi.py:248-263)."""
        import pandas as pd
        return pd.MultiIndex.from_arrays(
            [ix.values for ix in self.indexes], names=self.names)

    def __repr__(self):
        return f"MultiIndex(names={self.names})"

    def __str__(self):
        import pandas as pd
        return str(pd.DataFrame(
            {n: ix.values for n, ix in
             zip(self._level_names(), self.indexes)}))
