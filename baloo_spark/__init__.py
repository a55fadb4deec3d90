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


def concat(frames: list) -> "DataFrame":
    """Row-wise concatenation of frames (pandas-style top-level;
    engine extension — the reference has no set ops, SURVEY.md §2.6).
    Columns are matched by name; missing columns become NULL."""
    if not frames:
        raise ValueError("concat of empty list")
    out = frames[0]
    for f in frames[1:]:
        out = out.concat(f)
    return out

__all__ = [
    "DataFrame", "Series", "Index", "MultiIndex", "RangeIndex",
    "read_csv", "read_parquet", "read_json", "read_orc", "get_session",
    "exp", "log", "sqrt", "sin", "cos", "tan", "asin", "acos", "atan",
    "sinh", "cosh", "tanh", "erf", "raw", "sort", "load_cudf", "concat",
    "sql", "merge_asof",
]
