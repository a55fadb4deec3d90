"""pandas-parity sort ordering, in ONE place.

pandas puts NaN LAST in both sort directions (na_position='last'
default); Spark's bare ``asc()`` is nulls-FIRST. Every site that
materializes a frame's logical order OR rebuilds it from the
``(col, ascending)`` metadata must use these helpers — a mismatch
between the materialized sort and a later rebuild (positional ops,
to_pandas, shift/cumsum layouts) would silently misplace rows with
null sort keys.

``rev_order_expr`` is the EXACT reversal (tail, bfill): reversing
nulls-last-ascending is nulls-FIRST-descending, which a naive
"flip the direction" rebuild gets wrong for null keys.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def order_expr(c, asc: bool):
    col = F.col(c) if isinstance(c, str) else c
    return col.asc_nulls_last() if asc else col.desc_nulls_last()


def rev_order_expr(c, asc: bool):
    col = F.col(c) if isinstance(c, str) else c
    return col.desc_nulls_first() if asc else col.asc_nulls_first()


def order_exprs(pairs, cols=None):
    return [order_expr(c, a) for c, a in pairs
            if cols is None or c in cols]


def rev_order_exprs(pairs, cols=None):
    return [rev_order_expr(c, a) for c, a in pairs
            if cols is None or c in cols]
