"""baloo_spark: a PySpark-native analytics engine with the query and
data-processing capabilities of radujica/baloo (reference read-only at
/root/reference), re-expressed Spark-first.

The reference builds lazy Weld-IR graphs JIT-compiled per evaluate
(``baloo/weld/pyweld/weldobject.py:142-230``); this engine builds lazy
Spark DataFrame DAGs planned by Catalyst and executed by Tungsten
whole-stage codegen, distributed over partitions instead of a single
process. See SURVEY.md for the full design mapping.
"""

from .core.frame import DataFrame
from .core.series import Series
from .core.indexes import Index, MultiIndex, RangeIndex
from .functions import (acos, asin, atan, cos, cosh, erf, exp, load_cudf,
                        log, raw, sin, sinh, sort, sqrt, tan, tanh)
from .io import read_csv, read_json, read_orc, read_parquet
from .session import get_session

__version__ = "0.1.0"


def sql(query: str) -> "DataFrame":
    """Run a Spark SQL query and wrap the result — the escape hatch
    into the full SQL surface (window frames, lateral views, hints,
    ...). Register frames as sources with ``DataFrame.to_view(name)``.
    Lazy like everything else: Catalyst plans the query; nothing runs
    until an action."""
    return DataFrame.from_spark(get_session().sql(query))


def merge_asof(left: "DataFrame", right: "DataFrame", on: str,
               by=None, tolerance: int | None = None,
               suffix: str = "_right", direction: str = "backward",
               allow_exact_matches: bool = True) -> "DataFrame":
    """pandas-style ``pd.merge_asof`` over engine frames: for each
    left row, attach the matching right row on ``on`` — the most
    recent with ``right.on <= left.on`` (``direction='backward'``,
    default), the first with ``right.on >= left.on`` (``'forward'``),
    or whichever is closer in time (``'nearest'``, ties to backward)
    — matching ``by`` keys; ``tolerance`` caps the match distance in
    seconds. Thin wrapper over ``operators.joins.asof_join`` (the
    scale path: union + keyed carry window, one shuffle, no range
    explosion)."""
    from .operators.joins import asof_join
    out = asof_join(left.to_spark(), right.to_spark(), on=on, by=by,
                    tolerance=tolerance, suffix=suffix,
                    direction=direction,
                    allow_exact_matches=allow_exact_matches)
    return DataFrame.from_spark(out)


def concat(frames: list, axis: int = 0) -> "DataFrame":
    """pandas-style top-level concatenation (engine extension — the
    reference has no set ops, SURVEY.md §2.6).

    ``axis=0`` (default): row-wise; columns matched by name, missing
    columns become NULL. ``axis=1``: column-wise — frames are aligned
    POSITIONALLY (each gets a fresh dense ordinal along its logical
    order and they equi-join on it; rows past the shortest frame get
    NULLs via full-outer, like pandas' index alignment on default
    RangeIndexes). Duplicate column names across frames raise —
    Spark frames cannot hold two columns of one name (pandas allows
    the ambiguity; rename first)."""
    if not frames:
        raise ValueError("concat of empty list")
    if axis == 0:
        out = frames[0]
        for f in frames[1:]:
            out = out.concat(f)
        return out
    if axis != 1:
        raise ValueError(f"axis must be 0 or 1, got {axis!r}")
    from pyspark.sql import functions as F

    from .core.frame import DataFrame
    from .plans.ordinal import POS_COL
    seen: dict = {}
    for i, f in enumerate(frames):
        for c in f.columns:
            if c in seen:
                raise ValueError(
                    f"duplicate column {c!r} in frames {seen[c]} and "
                    f"{i} — rename before concat(axis=1)")
            seen[c] = i
    joined = None
    data: list = []
    for i, f in enumerate(frames):
        part = f._ordered_sdf().select(
            POS_COL, *[c for c in f._data_cols])
        data += list(f._data_cols)
        joined = part if joined is None else             joined.join(part, POS_COL, "full_outer")
    from .plans.ordinal import ORD_COL
    out = joined.withColumnRenamed(POS_COL, ORD_COL)
    return DataFrame._make(out, [ORD_COL], data, [(ORD_COL, True)])

__all__ = [
    "DataFrame", "Series", "Index", "MultiIndex", "RangeIndex",
    "read_csv", "read_parquet", "read_json", "read_orc", "get_session",
    "exp", "log", "sqrt", "sin", "cos", "tan", "asin", "acos", "atan",
    "sinh", "cosh", "tanh", "erf", "raw", "sort", "load_cudf", "concat",
    "sql", "merge_asof",
]
