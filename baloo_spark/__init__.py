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


def get_dummies(data, prefix=None, prefix_sep: str = "_",
                dummy_na: bool = False, columns=None,
                max_categories: int = 10000) -> "DataFrame":
    """pandas-style ``pd.get_dummies``: one-hot indicator columns
    for string columns of a DataFrame (or for a Series). The
    category inventory is ONE distinct job across all target
    columns, guarded by ``max_categories`` per column with an error
    naming the offender — at any scale the inventory is categories,
    not rows, and the encoding itself is a pure projection (zero
    shuffles). NULL rows get 0 in every indicator (pandas), or
    their own ``_nan`` column with ``dummy_na=True``."""
    from functools import reduce

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    if isinstance(data, Series):
        sdf, alias = data._select("__gd_v__")
        frame = DataFrame.from_spark(sdf.withColumnRenamed(
            "__gd_v__", data.name or "value"))
        # pandas Series input: bare category values as column names
        # unless a prefix is given
        return get_dummies(frame,
                           prefix="" if prefix is None else prefix,
                           prefix_sep="" if prefix is None
                           else prefix_sep,
                           dummy_na=dummy_na,
                           columns=[data.name or "value"],
                           max_categories=max_categories)
    df = data
    sch = {f.name: f.dataType for f in df._sdf.schema.fields}
    targets = (list(columns) if columns is not None else
               [c for c in df._data_cols
                if isinstance(sch[c], T.StringType)])
    missing = [c for c in targets if c not in df._data_cols]
    if missing:
        raise KeyError(missing[0])
    if not targets:
        return df
    inv = reduce(lambda a, b: a.unionByName(b), [
        df._sdf.select(F.lit(c).alias("__c__"),
                       F.col(c).cast("string").alias("__v__"))
        .distinct() for c in targets])
    cats: dict = {c: [] for c in targets}
    for r in inv.collect():
        if r["__v__"] is not None:
            cats[r["__c__"]].append(r["__v__"])
    for c, vs in cats.items():
        if len(vs) > max_categories:
            raise ValueError(
                f"column {c!r} has {len(vs)} categories, over the "
                f"max_categories={max_categories} budget — one-hot "
                "would explode the schema; raise the budget or hash "
                "the column instead")
    sdf = df._sdf
    keep = [c for c in sdf.columns if c not in targets]
    dummies, names = [], []
    for c in targets:
        if isinstance(prefix, dict):
            pre = prefix.get(c, c)
        else:
            pre = prefix if prefix is not None else c
        for v in sorted(cats[c]):
            names.append(f"{pre}{prefix_sep}{v}")
            dummies.append(
                F.when(F.col(c).cast("string") == v, 1).otherwise(0)
                .cast("int").alias(names[-1]))
        if dummy_na:
            names.append(f"{pre}{prefix_sep}nan")
            dummies.append(F.col(c).isNull().cast("int")
                           .alias(names[-1]))
    out = sdf.select(*[F.col(c) for c in keep], *dummies)
    data_cols = [c for c in df._data_cols if c not in targets] + names
    return DataFrame._make(out, df._index_cols, data_cols, df._order)


def crosstab(index: "Series", columns: "Series",
             rownames=None, colnames=None) -> "DataFrame":
    """pandas-style ``pd.crosstab(a, b)`` frequency table. The two
    Series align like every pairwise statistic (same frame, shared
    index join, or positional), then Spark's native
    ``stat.crosstab`` builds the contingency table in one pass —
    distinct values of ``columns`` become result columns, so keep
    that side low-cardinality (Spark caps at 10k distinct). Axis
    naming follows pandas: ``rownames=``/``colnames=`` win, else the
    Series' own names, else ``row_0``/``col_0``."""
    from pyspark.sql import functions as F

    for arg, nm in ((rownames, "rownames"), (colnames, "colnames")):
        if arg is not None and len(arg) != 1:
            raise AssertionError(
                "arrays and names must have the same length")
    na = (rownames[0] if rownames is not None
          else index.name if index.name is not None else "row_0")
    nb = (colnames[0] if colnames is not None
          else columns.name if columns.name is not None else "col_0")
    sdf, a, b = index._pair_sdf(columns)
    # pandas drops any observation where EITHER key is missing
    # (dropna has no False face in pd.crosstab's counting) — without
    # this gate Spark's crosstab emits a 'null' row/column
    ct = (sdf.select(a.cast("string").alias(na),
                     b.cast("string").alias(nb))
          .where(F.col(na).isNotNull() & F.col(nb).isNotNull())
          .stat.crosstab(na, nb))
    # Spark names the key column '<na>_<nb>'; pandas names the index
    # axis by the ROW name alone (row_0 when unnamed)
    spark_key = f"{na}_{nb}"
    ct = ct.withColumnRenamed(spark_key, na).orderBy(na)
    return DataFrame._make(ct, [na],
                           [c for c in ct.columns if c != na],
                           [(na, True)])


def cut(x: "Series", bins, labels=None, right: bool = True) -> "Series":
    """Top-level ``pd.cut`` spelling — delegates to
    :meth:`Series.cut`."""
    return x.cut(bins, labels=labels, right=right)


def qcut(x: "Series", q, labels=None, duplicates: str = "raise",
         **kw) -> "Series":
    """Top-level ``pd.qcut`` spelling — delegates to
    :meth:`Series.qcut` (``approx=True`` for the sketch path)."""
    return x.qcut(q, labels=labels, duplicates=duplicates, **kw)


def date_range(start, end=None, periods=None, freq: str = "D",
               name: str | None = None) -> "Series":
    """Distributed ``pd.date_range``: ``spark.range`` over the period
    count — a billion-row grid never touches the driver. Fixed-width
    frequencies (D/h/min/s/...) use exact epoch-microsecond
    arithmetic; calendar frequencies (``ME``/``M`` month end, ``MS``
    month start, ``YE``/``Y``/``A`` year end, ``YS`` year start,
    with integer multiples) use ``add_months`` off a pandas-anchored
    first tick (start rolls forward to the next on-offset timestamp,
    time of day preserved — pinned against pd.date_range). Pass
    ``end`` (inclusive, pandas flavor) or ``periods``."""
    import re

    import pandas as pd
    from pyspark.sql import functions as F

    from .core.datetimes import freq_to_us
    from .core.series import _VAL
    from .plans.ordinal import ORD_COL

    if (end is None) == (periods is None):
        raise ValueError("pass exactly one of end= or periods=")
    spark = get_session()

    cal = re.fullmatch(r"(\d*)\s*(ME|MS|AS|YE|YS|M|Y|A)", str(freq))
    if cal:
        mult = int(cal.group(1) or 1)
        kind = {"M": "ME", "Y": "YE", "A": "YE", "AS": "YS"}.get(
            cal.group(2), cal.group(2))
        step = mult * (12 if kind in ("YE", "YS") else 1)
        s = pd.Timestamp(start)
        time_us = (s.value // 1000) % 86_400_000_000
        # anchor = the month holding the FIRST on-offset tick
        if kind == "ME":
            ay, am = s.year, s.month          # month end >= any day
        elif kind == "MS":
            ay, am = ((s.year, s.month) if s.day == 1
                      else (s.year + (s.month == 12),
                            s.month % 12 + 1))
        elif kind == "YE":
            ay, am = s.year, 12
        else:                                  # YS
            ay, am = ((s.year, 1) if (s.month, s.day) == (1, 1)
                      else (s.year + 1, 1))
        anchor = pd.Timestamp(year=ay, month=am, day=1)

        def tick(i: int) -> pd.Timestamp:
            m = anchor + pd.DateOffset(months=i * step)
            d = (m + pd.offsets.MonthEnd(0) if kind in ("ME", "YE")
                 else m)
            return d + pd.Timedelta(microseconds=time_us)

        if periods is None:
            e = pd.Timestamp(end)
            dm = (e.year * 12 + e.month) - (ay * 12 + am)
            periods = max(0, dm // step + 1)
            while periods and tick(periods - 1) > e:
                periods -= 1
        anchor_lit = F.lit(anchor.date())
        month = F.add_months(anchor_lit,
                             (F.col("id") * F.lit(step)).cast("int"))
        day = F.last_day(month) if kind in ("ME", "YE") else month
        sdf = spark.range(int(periods)).select(
            F.col("id").alias(ORD_COL),
            F.timestamp_micros(
                F.unix_micros(day.cast("timestamp"))
                + F.lit(int(time_us))).alias(_VAL))
        return Series._make(sdf, F.col(_VAL), [ORD_COL], name,
                            [(ORD_COL, True)])

    wk = re.fullmatch(
        r"(\d*)\s*W(?:-(MON|TUE|WED|THU|FRI|SAT|SUN))?", str(freq))
    if wk:
        # weekly anchored: roll start forward to the anchor weekday
        # (pandas W = W-SUN; same-day counts as on-offset, time
        # preserved), then it is a fixed 7-day grid
        anchor_wd = {"MON": 0, "TUE": 1, "WED": 2, "THU": 3,
                     "FRI": 4, "SAT": 5, "SUN": 6}[wk.group(2) or "SUN"]
        s = pd.Timestamp(start)
        s = s + pd.Timedelta(days=(anchor_wd - s.weekday()) % 7)
        start = s
        us = int(wk.group(1) or 1) * 7 * 86_400_000_000
    else:
        us = freq_to_us(freq)
    s_us = pd.Timestamp(start).value // 1000
    if periods is None:
        e_us = pd.Timestamp(end).value // 1000
        periods = 0 if e_us < s_us else (e_us - s_us) // us + 1
    sdf = spark.range(int(periods)).select(
        F.col("id").alias(ORD_COL),
        F.timestamp_micros(F.lit(s_us) + F.col("id") * F.lit(us))
        .alias(_VAL))
    return Series._make(sdf, F.col(_VAL), [ORD_COL], name,
                        [(ORD_COL, True)])


def unique(values):
    """pandas-style top-level ``pd.unique``: a baloo Series runs the
    distributed distinct (Series.unique); array-likes go through
    pandas on the driver (they are driver-sized by definition)."""
    from .core.series import Series
    if isinstance(values, Series):
        return values.unique()
    import pandas as pd
    return pd.unique(values)


def to_timedelta(arg, unit: str | None = None):
    """pandas-style ``pd.to_timedelta`` (default ``unit=None``, like
    pandas — a string like ``"90min"`` carries its own unit, and
    pandas raises if one is also passed). A baloo Series of NUMBERS
    becomes a DayTimeInterval column (``make_dt_interval`` on the
    unit-scaled seconds — interval columns add to timestamps in
    Spark arithmetic; this path defaults to seconds when no unit is
    given); scalars and array-likes go through pandas on the driver
    (offsets are driver-sized by definition)."""
    from pyspark.sql import functions as F

    from .core.series import Series
    if isinstance(arg, Series):
        scale = {"s": 1.0, "ms": 1e-3, "us": 1e-6, "m": 60.0,
                 "min": 60.0, "h": 3600.0, "d": 86400.0,
                 "D": 86400.0}.get(unit if unit is not None else "s")
        if scale is None:
            raise ValueError(f"unsupported unit {unit!r}")
        secs = arg._colexpr.cast("double") * F.lit(scale)
        return arg._with_col(F.make_dt_interval(
            F.lit(0), F.lit(0), F.lit(0), secs))
    import pandas as pd
    if unit is None:
        return pd.to_timedelta(arg)
    return pd.to_timedelta(arg, unit=unit)


def to_datetime(arg: "Series", format: str | None = None,
                unit: str | None = None,
                errors: str = "raise") -> "Series":
    """pandas-style ``pd.to_datetime`` over a Series. String input
    parses with ``format`` (C strftime codes translated to Java
    patterns, or a Java pattern directly) or Spark's default
    timestamp parsing; numeric input needs ``unit`` ('s', 'ms',
    'us'). ``errors='coerce'`` maps unparseable values to NULL
    (try_to_timestamp); 'raise' surfaces the ANSI parse error at
    action time. Pure codegen-side expressions."""
    from pyspark.sql import functions as F

    if unit is not None:
        fn = {"s": F.timestamp_seconds, "ms": F.timestamp_millis,
              "us": F.timestamp_micros}.get(unit)
        if fn is None:
            raise ValueError(f"unsupported unit {unit!r}")
        cast = {"s": "long", "ms": "long", "us": "long"}[unit]
        return arg._with_col(fn(arg._colexpr.cast(cast)))
    fmt = format
    if fmt is not None and "%" in fmt:
        # shares strftime's translator (literal runs quoted so stray
        # letters aren't read as Java directives)
        from .core.datetimes import DatetimeMethods
        fmt = DatetimeMethods._c_to_java(fmt)
    if fmt is None:
        parse = (F.try_to_timestamp if errors == "coerce"
                 else F.to_timestamp)
        return arg._with_col(parse(arg._colexpr))
    if errors == "coerce":
        return arg._with_col(
            F.try_to_timestamp(arg._colexpr, F.lit(fmt)))
    return arg._with_col(F.to_timestamp(arg._colexpr, fmt))


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
    from .core.series import Series as _S
    if all(isinstance(f, _S) for f in frames):
        if axis == 0:
            # Series concat -> one longer Series (unionByName of the
            # value projections; index renumbers like ignore_index)
            name = frames[0].name
            parts = [f._select("__cc__")[0].select("__cc__")
                     for f in frames]
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
            from pyspark.sql import functions as F
            return _S._make(out, F.col("__cc__"), None, name, None)
        # axis=1: Series become single-column frames, positional align
        frames = [f.to_frame() if hasattr(f, "to_frame") else f
                  for f in frames]
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
    "sql", "merge_asof", "get_dummies", "cut", "qcut", "to_datetime",
    "date_range", "crosstab",
]


def merge(left: "DataFrame", right: "DataFrame", **kwargs) -> "DataFrame":
    """Top-level pandas ``pd.merge`` — delegates to
    ``DataFrame.merge`` (same join planning, broadcast/AQE rules)."""
    return left.merge(right, **kwargs)


def pivot_table(data: "DataFrame", **kwargs) -> "DataFrame":
    """Top-level pandas ``pd.pivot_table`` delegate."""
    return data.pivot_table(**kwargs)


def melt(frame: "DataFrame", **kwargs) -> "DataFrame":
    """Top-level pandas ``pd.melt`` delegate."""
    return frame.melt(**kwargs)


def to_numeric(arg: "Series", errors: str = "raise") -> "Series":
    """pandas ``to_numeric`` flavor: cast to double.
    ``errors='coerce'`` is the natural SQL cast (unparseable ->
    NULL). ``errors='raise'`` (the pandas default) runs ONE eager
    probe agg counting values a cast would silently NULL and raises
    like pandas if any exist — the caller explicitly asked to be
    told, so a silent coerce there could mask data corruption. Use
    'coerce' to stay fully lazy."""
    if errors not in ("raise", "coerce"):
        raise ValueError("errors must be 'raise' or 'coerce'")
    if errors == "raise":
        from pyspark.sql import functions as F
        sdf, alias = arg._select()
        col = F.col(alias)
        bad = sdf.agg(F.count(F.when(
            col.isNotNull() & col.cast("double").isNull(), 1))
            .alias("n")).collect()[0]["n"]
        if bad:
            raise ValueError(
                f"Unable to parse {bad} value(s) as numeric "
                "(pandas to_numeric errors='raise'); pass "
                "errors='coerce' to NULL them lazily instead")
    return arg._with_col(arg._colexpr.cast("double"))


def isna(obj: "Series") -> "Series":
    return obj.isna()


def notna(obj: "Series") -> "Series":
    return obj.notna()


isnull = isna
notnull = notna


def factorize(values: "Series", sort: bool = False):
    """pandas ``factorize``: (codes Series, uniques list). The
    pandas default is FIRST-APPEARANCE order — the engine carries
    ordinals, so uniques rank by ``min(position)`` per value (one
    extra agg on the same distinct job, still one shuffle);
    ``sort=True`` ranks by value instead. The code assignment is a
    pure projection over a broadcast literal map — no second
    shuffle. Guarded at 100k uniques."""
    from pyspark.sql import functions as F
    from .plans.ordinal import POS_COL
    sdf, alias = values._ordered_sdf()
    rows = (sdf.where(F.col(alias).isNotNull())
            .groupBy(alias).agg(F.min(POS_COL).alias("__fpos__"))
            .limit(100_001).collect())
    if len(rows) > 100_000:
        raise ValueError(
            "factorize found more than 100k distinct values — codes "
            "for a column that wide belong in a join, not a literal "
            "map; use merge against a keyed table instead")
    if sort:
        uniques = sorted(r[alias] for r in rows)
    else:
        uniques = [r[alias] for r in
                   sorted(rows, key=lambda r: r["__fpos__"])]
    mapping = {u: i for i, u in enumerate(uniques)}
    codes = values.map(mapping, default=-1)
    return codes.fillna(-1).astype("int64"), uniques
