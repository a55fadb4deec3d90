"""IO: sources and sinks.

Reference has eager pandas-delegating CSV only (``baloo/io/csv.py``);
we read with Spark's native distributed readers (predicate pushdown +
column pruning reach the scan) and add parquet/json — free via Spark,
flagged as extensions (SURVEY.md §2.1).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..core.frame import DataFrame
from ..core.dtypes import spark_type_of
from ..session import get_session


def read_csv(filepath: str, sep: str = ",", header: int | str | None = 0,
             names: list | None = None, usecols: list | None = None,
             dtype=None, converters: dict | None = None,
             skiprows: int = 0, nrows: int | None = None,
             multiline: bool = False, comment: str | None = None,
             na_values=None, encoding: str | None = None) -> DataFrame:
    """CSV source (reference signature incl. converters, io/csv.py:6-52)
    via ``spark.read.csv`` — distributed, schema-inferred.

    ``converters``: {column: callable} applied per column. Callables
    run as Arrow-vectorized pandas UDFs over batches (the reference
    hands them to pandas eagerly) — never per row.

    Quoting: RFC 4180 — embedded quotes arrive doubled (""), the
    format both to_csv faces write (Spark's reader default is
    backslash-escape, which silently mangles RFC files — r5 probe).
    ``multiline=True`` parses quoted embedded newlines; it is OFF by
    default because multiLine CSV is not splittable (each file parses
    on one task — a scan-parallelism cliff at 100 TB; prefer parquet
    for data with newlines).
    """
    spark = get_session()
    reader = spark.read.option("sep", sep).option(
        "header", header is not None and header is not False).option(
        "escape", '"').option("multiLine", multiline).option(
        "inferSchema", True)
    if comment:
        if len(comment) != 1:
            raise ValueError("comment must be a single character")
        reader = reader.option("comment", comment)
    if encoding:
        reader = reader.option("encoding", encoding)
    if isinstance(na_values, str):
        reader = reader.option("nullValue", na_values)
    sdf = reader.csv(filepath)
    if na_values is not None and not isinstance(na_values, str):
        # a LIST of sentinels: Spark's reader takes one nullValue, so
        # the rest null out post-read — a pure projection over the
        # string-typed columns (numeric columns already failed to
        # parse the sentinel and are string here anyway)
        sents = [str(v) for v in na_values]
        str_cols = [f.name for f in sdf.schema.fields
                    if f.dataType.typeName() == "string"]
        # pandas parity: a numeric column that was inferred as string
        # BECAUSE it held the sentinel must come back numeric after
        # null-out. One probe agg over the string columns finds the
        # sentinel-affected ones whose remaining values all parse
        # (CSV inference already scans the file; this single extra
        # agg is the price of list-sentinels, a rare path).
        recast: dict[str, str] = {}
        if str_cols:
            aggs = []
            for c in str_cols:
                clean = F.when(~F.col(c).isin(*sents), F.col(c))
                aggs += [
                    F.count(F.when(F.col(c).isin(*sents), 1))
                    .alias(f"__h_{c}"),
                    F.count(clean).alias(f"__n_{c}"),
                    F.count(clean.try_cast("double")).alias(f"__d_{c}"),
                    F.count(clean.try_cast("bigint")).alias(f"__l_{c}"),
                ]
            row = sdf.agg(*aggs).collect()[0]
            for c in str_cols:
                h, n = row[f"__h_{c}"], row[f"__n_{c}"]
                if h > 0 and n > 0 and row[f"__d_{c}"] == n:
                    recast[c] = ("bigint" if row[f"__l_{c}"] == n
                                 else "double")
                elif h > 0 and n == 0:
                    # entirely sentinels: pandas infers an all-NaN
                    # float64 column, not an all-NULL string one
                    recast[c] = "double"
        sdf = sdf.select(*[
            (F.when(F.col(c).isin(*sents), F.lit(None))
             .otherwise(F.col(c)).cast(recast.get(c, "string")).alias(c)
             if t.typeName() == "string" else F.col(c))
            for c, t in ((f.name, f.dataType)
                         for f in sdf.schema.fields)])
    if header is not None and header is not False and not names:
        # pandas parity: empty header cells (e.g. a written index
        # column, reference tests/io/files/df1.csv) become
        # "Unnamed: N", not Spark's "_cN" fallback
        renames = {c: f"Unnamed: {c[2:]}" for c in sdf.columns
                   if c.startswith("_c") and c[2:].isdigit()}
        if renames:
            sdf = sdf.withColumnsRenamed(renames)
    if names:
        sdf = sdf.toDF(*names)
    if skiprows:
        # positional skip: the reference skips file rows; emulate via offset
        sdf = sdf.offset(skiprows)
    if nrows is not None:
        sdf = sdf.limit(nrows)
    if usecols:
        sdf = sdf.select(*usecols)
    if dtype:
        if isinstance(dtype, dict):
            for c, t in dtype.items():
                sdf = sdf.withColumn(c, F.col(c).cast(spark_type_of(t)))
        else:
            t = spark_type_of(dtype)
            sdf = sdf.select(*[F.col(c).cast(t) for c in sdf.columns])
    if converters:
        from ..functions._udf import scalar_pandas_udf
        for c, fn in converters.items():
            field = sdf.schema[c]
            udf = scalar_pandas_udf(
                lambda s, _fn=fn: s.map(_fn), field.dataType)
            sdf = sdf.withColumn(c, udf(F.col(c)))
    return DataFrame.from_spark(sdf)


def read_parquet(filepath: str, columns: list | None = None) -> DataFrame:
    """Parquet source (extension; the driver's testdata format).
    Column selection here prunes at the scan (ReadSchema)."""
    spark = get_session()
    sdf = spark.read.parquet(filepath)
    if columns:
        sdf = sdf.select(*columns)
    return DataFrame.from_spark(sdf)


def read_json(filepath: str) -> DataFrame:
    spark = get_session()
    return DataFrame.from_spark(spark.read.json(filepath))


def read_orc(filepath: str, columns: list | None = None) -> DataFrame:
    """ORC source (extension; same pushdown/pruning properties as
    parquet — column selection reaches the scan's ReadSchema)."""
    spark = get_session()
    sdf = spark.read.orc(filepath)
    if columns:
        sdf = sdf.select(*columns)
    return DataFrame.from_spark(sdf)
