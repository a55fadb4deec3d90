"""Index types.

Reference: ``baloo/core/indexes/`` — Index (named typed label column,
base.py:11), RangeIndex (lazy 0..n, range.py:8), MultiIndex (list of
Index columns, multi.py:14 — explicitly NOT pandas levels).

In this engine an index is metadata over ordinary Spark columns: the
frame tracks which columns are index columns. These classes exist for
API parity when constructing frames and for introspection; RangeIndex
is realized lazily through the scale-safe dense-ordinal plan
(:mod:`baloo_spark.plans.ordinal`) only when a positional op needs it.
"""

from __future__ import annotations

import numpy as np


class Index:
    def __init__(self, data=None, dtype=None, name=None):
        self.name = name
        self._values = None
        if data is not None:
            self._values = np.asarray(data, dtype=dtype)

    @property
    def values(self):
        return self._values

    def __repr__(self):
        return f"Index(name={self.name})"


class RangeIndex(Index):
    """Lazy 0..n-1 (reference weld_range, range.py:63). Never
    materialized driver-side; realized as the __ord__ column on
    demand."""

    def __init__(self, stop: int | None = None, name=None):
        super().__init__(None, None, name)
        self.stop = stop

    @property
    def values(self):
        if self.stop is None:
            return None
        return np.arange(self.stop)

    def __repr__(self):
        return f"RangeIndex(stop={self.stop})"


class MultiIndex:
    """List of Index columns with names (multi.py:44-59)."""

    def __init__(self, data: list, names: list | None = None):
        names = names or [None] * len(data)
        self.indexes = [d if isinstance(d, Index) else Index(d, name=n)
                        for d, n in zip(data, names)]
        self.names = [ix.name for ix in self.indexes]

    def __repr__(self):
        return f"MultiIndex(names={self.names})"
