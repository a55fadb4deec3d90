"""Type system: the reference's 7 NumPy dtypes <-> Spark SQL types.

Reference universe (``baloo/weld/convertors/encoders.py:13-24``):
int16/int32/int64/float32/float64/bool/bytes_. We map bytes_ ->
StringType (the reference is ASCII-bytes only, ``encoders.py:10-11``)
and, as engine extensions, pass through Spark-native Timestamp/Date/
Decimal/Array/Map types the reference lacks (SURVEY.md §1.2).

Missing data: the reference uses per-type sentinels (-999 / 'None' /
False, ``encoders.py:101-133``); we use native Spark NULL everywhere
and provide a sentinel codec for byte-parity checks
(:func:`sentinel_for`, :func:`encode_sentinels`, :func:`decode_sentinels`).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import types as T

# numpy dtype char -> Spark type (reference: encoders.py:13-24)
_NP_TO_SPARK = {
    "h": T.ShortType(),
    "i": T.IntegerType(),
    "l": T.LongType(),
    "q": T.LongType(),
    "f": T.FloatType(),
    "d": T.DoubleType(),
    "?": T.BooleanType(),
    "S": T.StringType(),
    "U": T.StringType(),
    "O": T.StringType(),
    "M": T.TimestampType(),  # extension: reference has no datetime
}

_SPARK_TO_NP = {
    T.ShortType(): np.dtype(np.int16),
    T.IntegerType(): np.dtype(np.int32),
    T.LongType(): np.dtype(np.int64),
    T.FloatType(): np.dtype(np.float32),
    T.DoubleType(): np.dtype(np.float64),
    T.BooleanType(): np.dtype(np.bool_),
    T.StringType(): np.dtype(object),
}

# Missing-data sentinels of the reference convention
# (encoders.py:101-133); used only by the compat codec.
_SENTINELS = {
    T.ShortType(): -999,
    T.IntegerType(): -999,
    T.LongType(): -999,
    T.FloatType(): -999.0,
    T.DoubleType(): -999.0,
    T.StringType(): "None",
    T.BooleanType(): False,
}


def spark_type_of(dtype) -> T.DataType:
    """np.dtype / dtype-like / str -> Spark DataType."""
    if isinstance(dtype, T.DataType):
        return dtype
    if isinstance(dtype, str):
        # allow spark-style names too
        simple = {
            "int16": T.ShortType(), "short": T.ShortType(),
            "int32": T.IntegerType(), "int": T.IntegerType(),
            "int64": T.LongType(), "long": T.LongType(),
            "float32": T.FloatType(), "float": T.FloatType(),
            "float64": T.DoubleType(), "double": T.DoubleType(),
            "bool": T.BooleanType(), "boolean": T.BooleanType(),
            "str": T.StringType(), "string": T.StringType(),
            "bytes": T.StringType(),
            "timestamp": T.TimestampType(), "date": T.DateType(),
        }
        if dtype in simple:
            return simple[dtype]
        dtype = np.dtype(dtype)
    dtype = np.dtype(dtype)
    ch = dtype.char
    if ch not in _NP_TO_SPARK:
        raise TypeError(f"Unsupported dtype: {dtype}")
    return _NP_TO_SPARK[ch]


def np_dtype_of(spark_type: T.DataType) -> np.dtype:
    """Spark DataType -> numpy dtype (best effort for extensions)."""
    if spark_type in _SPARK_TO_NP:
        return _SPARK_TO_NP[spark_type]
    if isinstance(spark_type, (T.TimestampType, T.TimestampNTZType)):
        return np.dtype("datetime64[us]")
    return np.dtype(object)


def sentinel_for(spark_type: T.DataType):
    """The reference's missing-data sentinel for a type (encoders.py:101-109)."""
    return _SENTINELS.get(spark_type)


def encode_sentinels(df, columns=None):
    """NULL -> reference sentinel, for byte-parity with the reference."""
    from pyspark.sql import functions as F
    out = df
    for f in df.schema.fields:
        if columns is not None and f.name not in columns:
            continue
        s = sentinel_for(f.dataType)
        if s is not None:
            out = out.withColumn(f.name, F.coalesce(F.col(f.name), F.lit(s)))
    return out


def decode_sentinels(df, columns=None):
    """Reference sentinel -> NULL (ingesting reference-convention data)."""
    from pyspark.sql import functions as F
    out = df
    for f in df.schema.fields:
        if columns is not None and f.name not in columns:
            continue
        s = sentinel_for(f.dataType)
        if s is not None and not isinstance(f.dataType, T.BooleanType):
            out = out.withColumn(
                f.name, F.when(F.col(f.name) == F.lit(s), None).otherwise(F.col(f.name))
            )
    return out
