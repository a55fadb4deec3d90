"""Datetime accessor: ``sr.dt.*`` as JVM-side Column expressions.

Engine extension — the reference has NO datetime type (SURVEY.md
§1.2: Weld's universe is bool/ints/floats/bytes); this mirrors the
pandas ``.dt`` namespace over Spark TimestampType/DateType columns so
calendar extraction stays inside whole-stage codegen (the same ops
the ``extract_ops`` driver slot proves via SQL templates).

r11: pandas-PROPERTY fields (year/month/.../is_*) are properties here too,
returning a CallableSeries so the engine's historical method spelling
(``sr.dt.year()``) keeps working; genuine pandas METHODS (day_name,
month_name, normalize, floor/ceil/round, strftime, isocalendar,
total_seconds) remain methods.

Pandas semantic notes handled here:
- ``dayofweek``: Monday=0 (Spark's ``dayofweek`` is Sunday=1).
- ``week``: ISO week of year.
- ``strftime``: Spark ``date_format`` patterns (Java style), which
  differ from C ``%`` codes — documented, not translated.
"""

from __future__ import annotations

from pyspark.sql import functions as F


class DatetimeMethods:
    def __init__(self, sr):
        self._sr = sr

    def _map(self, fn, name=None):
        from .series import CallableSeries
        out = self._sr._with_col(fn(self._sr._colexpr), name)
        return CallableSeries._make(out._sdf, out._colexpr,
                                    out._index_cols, out.name,
                                    out._order)

    @property
    def year(self):
        return self._map(F.year)

    @property
    def month(self):
        return self._map(F.month)

    @property
    def day(self):
        return self._map(F.dayofmonth)

    @property
    def hour(self):
        return self._map(F.hour)

    @property
    def minute(self):
        return self._map(F.minute)

    @property
    def second(self):
        return self._map(F.second)

    @property
    def dayofweek(self):
        # pandas: Monday=0..Sunday=6; Spark dayofweek: Sunday=1..Saturday=7
        return self._map(lambda c: (F.dayofweek(c) + 5) % 7)

    @property
    def dayofyear(self):
        return self._map(F.dayofyear)

    @property
    def week(self):
        return self._map(F.weekofyear)

    @property
    def quarter(self):
        return self._map(F.quarter)

    @property
    def date(self):
        return self._map(F.to_date)

    @property
    def microsecond(self):
        """Sub-second microseconds (pandas ``dt.microsecond``) —
        integer epoch-microsecond remainder, codegen-side."""
        return self._map(lambda c: (F.unix_micros(
            c.cast("timestamp")) % 1_000_000).cast("int"))

    @property
    def millisecond(self):
        return self._map(lambda c: ((F.unix_micros(
            c.cast("timestamp")) % 1_000_000) / 1000).cast("int"))

    @property
    def days_in_month(self):
        """Days in the value's month (pandas ``dt.days_in_month``)."""
        return self._map(lambda c: F.dayofmonth(F.last_day(c)))

    @property
    def is_month_start(self):
        return self._map(lambda c: F.when(c.isNotNull(),
                                          F.dayofmonth(c) == 1))

    @property
    def is_month_end(self):
        return self._map(lambda c: F.when(
            c.isNotNull(),
            F.to_date(c) == F.last_day(c)))

    @property
    def is_quarter_start(self):
        return self._map(lambda c: F.when(
            c.isNotNull(),
            (F.dayofmonth(c) == 1) & (F.month(c) % 3 == 1)))

    @property
    def is_quarter_end(self):
        return self._map(lambda c: F.when(
            c.isNotNull(),
            (F.to_date(c) == F.last_day(c)) & (F.month(c) % 3 == 0)))

    @property
    def is_year_start(self):
        return self._map(lambda c: F.when(c.isNotNull(),
                                          F.dayofyear(c) == 1))

    @property
    def is_year_end(self):
        return self._map(lambda c: F.when(
            c.isNotNull(),
            (F.month(c) == 12) & (F.dayofmonth(c) == 31)))

    @property
    def is_leap_year(self):
        return self._map(lambda c: F.when(
            c.isNotNull(),
            ((F.year(c) % 4 == 0) & (F.year(c) % 100 != 0))
            | (F.year(c) % 400 == 0)))

    def day_name(self):
        """Weekday name (pandas ``dt.day_name()``)."""
        return self._map(lambda c: F.date_format(c, "EEEE"))

    def month_name(self):
        return self._map(lambda c: F.date_format(c, "MMMM"))

    def normalize(self):
        """Midnight-floor keeping the timestamp type (pandas
        ``dt.normalize``)."""
        return self._map(lambda c: F.date_trunc("day", c))

    _FLOOR_FREQS = {
        # pandas offset aliases -> Spark date_trunc units; Spark's own
        # unit names pass through. date_trunc on an UNKNOWN unit
        # returns NULL silently — the exact failure this map guards
        # (dt.floor('H') used to yield NaT for every row).
        "Y": "year", "A": "year", "M": "month", "W": "week",
        "D": "day", "H": "hour", "h": "hour", "T": "minute",
        "min": "minute", "S": "second", "s": "second",
        "year": "year", "quarter": "quarter", "month": "month",
        "week": "week", "day": "day", "hour": "hour",
        "minute": "minute", "second": "second",
        "ms": "millisecond", "L": "millisecond",
        "millisecond": "millisecond",
        "us": "microsecond", "U": "microsecond",
        "microsecond": "microsecond",
    }

    # fixed-width units (microseconds each) — the only ones a
    # multiple like '15min'/'2H'/'30S' is well-defined for; pandas
    # likewise rejects non-fixed multiples (months, weeks).
    _FIXED_US = {
        "D": 86_400_000_000, "day": 86_400_000_000,
        "H": 3_600_000_000, "h": 3_600_000_000, "hour": 3_600_000_000,
        "min": 60_000_000, "T": 60_000_000, "minute": 60_000_000,
        "S": 1_000_000, "s": 1_000_000, "second": 1_000_000,
        "ms": 1_000, "L": 1_000, "millisecond": 1_000,
        "us": 1, "U": 1, "microsecond": 1,
    }

    def floor(self, freq: str):
        """Truncate to the given frequency (pandas ``dt.floor``);
        accepts pandas offset aliases ('D', 'H'/'h', 'min'/'T', 'S',
        'ms', 'us'), fixed-width multiples ('15min', '2H', '30S'),
        and Spark date_trunc unit names. Unknown frequencies raise
        instead of Spark's silent all-NULL. Multiples floor exact
        integer epoch-microseconds (toward -inf, so pre-1970 rows
        match pandas); no doubles touch the arithmetic."""
        import re as _re
        m = _re.fullmatch(r"(\d+)\s*([A-Za-z]+)", freq)
        if m and m.group(2) in self._FIXED_US:
            n, unit = int(m.group(1)), m.group(2)
            if n == 0:
                raise ValueError("floor frequency multiple must be >= 1")
            width = n * self._FIXED_US[unit]
            # unix_micros needs TIMESTAMP; raw parquet reads surface
            # TIMESTAMP_NTZ — reinterpret (session TZ pinned UTC, so
            # identity) and cast the result back to the input type
            sdf, alias = self._sr._select()
            styp = sdf.schema[alias].dataType.typeName()

            def fn(c):
                us = F.unix_micros(c.cast("timestamp"))
                # Python-style nonnegative remainder: exact floor
                # toward -inf on longs, pre-epoch included
                rem = ((us % width) + width) % width
                out = F.timestamp_micros(us - rem)
                return out.cast(styp) if styp != "timestamp" else out
            return self._map(fn)
        unit = self._FLOOR_FREQS.get(freq) or \
            self._FLOOR_FREQS.get(freq.lower())
        if unit is None:
            raise ValueError(
                f"unsupported floor frequency {freq!r}; one of "
                f"{sorted(set(self._FLOOR_FREQS))} or a fixed-width "
                f"multiple like '15min'")
        return self._map(lambda c: F.date_trunc(unit, c))

    @property
    def weekday(self):
        """Monday=0 like pandas (alias of dayofweek)."""
        return self.dayofweek

    @property
    def day_of_week(self):
        return self.dayofweek

    @property
    def day_of_year(self):
        return self.dayofyear

    @property
    def daysinmonth(self):
        return self.days_in_month

    @property
    def weekofyear(self):
        return self.week

    @property
    def time(self):
        """Time-of-day as a 'HH:mm:ss[.ffffff]' string (Spark has no
        standalone time type; pandas returns datetime.time objects —
        the string form round-trips and compares correctly)."""
        return self._map(lambda c: F.when(
            F.date_format(c, "SSSSSS") == "000000",
            F.date_format(c, "HH:mm:ss"))
            .otherwise(F.date_format(c, "HH:mm:ss.SSSSSS")))

    def isocalendar(self):
        """ISO (year, week, day) as a DataFrame (pandas flavor) —
        pure projections; ISO year differs from calendar year at
        year boundaries (Spark's YEAROFWEEK handles it)."""
        from .frame import DataFrame
        sr = self._sr
        sdf, alias = sr._select("__ic__")
        out = sdf.select(
            *[F.col(c) for c in sr._index_cols
              if c in sdf.columns],
            F.expr("extract(YEAROFWEEK FROM __ic__)").cast("long")
            .alias("year"),
            F.weekofyear(F.col("__ic__")).cast("long").alias("week"),
            F.expr("extract(DAYOFWEEK_ISO FROM __ic__)").cast("long")
            .alias("day"))
        return DataFrame._make(out, sr._index_cols,
                               ["year", "week", "day"], sr._order)

    def _interval_us(self):
        sdf, alias = self._sr._select()
        tname = sdf.schema[alias].dataType.typeName()
        if "interval" not in tname:
            raise TypeError(
                f"timedelta accessor needs an interval Series, got "
                f"{tname}")
        epoch = F.lit("1970-01-01 00:00:00").cast("timestamp")
        return lambda c: F.unix_micros(epoch + c)

    @property
    def days(self):
        """Whole-day component of a timedelta (pandas ``dt.days``:
        floor division, negative intervals round toward -inf)."""
        us = self._interval_us()
        day = 86_400_000_000
        return self._map(lambda c: F.floor(us(c) / day).cast("long"))

    @property
    def seconds(self):
        """Seconds within the day component (pandas: always in
        [0, 86400))."""
        us = self._interval_us()
        day = 86_400_000_000
        return self._map(lambda c: (
            ((F.floor(us(c) / 1_000_000)
              % 86_400) + 86_400) % 86_400).cast("long"))

    @property
    def microseconds(self):
        """Microseconds within the second component (pandas:
        [0, 1e6))."""
        us = self._interval_us()
        return self._map(lambda c: (
            ((us(c) % 1_000_000) + 1_000_000) % 1_000_000)
            .cast("long"))

    def total_seconds(self):
        """Duration in (fractional) seconds for timedelta values —
        timestamp subtraction yields Spark day-time intervals, which
        read back exactly as microseconds via
        ``unix_micros(epoch + interval)`` (cast-to-long truncates to
        whole seconds, interval division is not a Column op)."""
        sdf, alias = self._sr._select()
        tname = sdf.schema[alias].dataType.typeName()
        if "interval" not in tname:
            raise TypeError(
                "total_seconds needs a timedelta (interval) Series — "
                f"got {tname}; subtract two datetime Series first")
        epoch = F.lit("1970-01-01 00:00:00").cast("timestamp")
        return self._map(
            lambda c: F.unix_micros(epoch + c) / F.lit(1_000_000.0))

    def _fixed_width_us(self, freq: str, what: str) -> int:
        """Parse a FIXED-width pandas frequency ('min', '15min', '2H',
        'ms', ...) to its microsecond width. ceil/round only make
        sense for fixed widths (pandas raises on 'M' too)."""
        import re as _re
        m = _re.fullmatch(r"(\d+)\s*([A-Za-z]+)", freq)
        if m and m.group(2) in self._FIXED_US:
            n = int(m.group(1))
            if n == 0:
                raise ValueError(f"{what} frequency multiple must be >= 1")
            return n * self._FIXED_US[m.group(2)]
        if freq in self._FIXED_US:
            return self._FIXED_US[freq]
        raise ValueError(
            f"unsupported {what} frequency {freq!r}; a fixed-width "
            f"unit of {sorted(set(self._FIXED_US))} or a multiple "
            "like '15min'")

    def _epoch_us_map(self, fn_us):
        """Apply an exact integer epoch-microsecond transform,
        reinterpreting TIMESTAMP_NTZ under the pinned-UTC session and
        casting back to the input type (same scheme as floor)."""
        sdf, alias = self._sr._select()
        styp = sdf.schema[alias].dataType.typeName()

        def fn(c):
            out = F.timestamp_micros(fn_us(F.unix_micros(
                c.cast("timestamp"))))
            return out.cast(styp) if styp != "timestamp" else out
        return self._map(fn)

    def ceil(self, freq: str):
        """Round up to the next multiple of a fixed frequency (pandas
        ``dt.ceil``; values already on a boundary stay put). Exact
        long arithmetic — pre-epoch rows round toward +inf like
        pandas."""
        width = self._fixed_width_us(freq, "ceil")

        def up(us):
            rem = ((us % width) + width) % width
            return us - rem + F.when(rem > 0, width).otherwise(F.lit(0))
        return self._epoch_us_map(up)

    def round(self, freq: str):
        """Round to the nearest multiple of a fixed frequency with
        pandas' HALF-TO-EVEN tie rule (00:00:30 -> 00:00, 00:01:30 ->
        00:02 at 'min'). Exact long arithmetic on epoch microseconds;
        the tie parity check divides an exactly-width-divisible long,
        safe in double for every fixed width above 'us' (where ties
        cannot occur)."""
        width = self._fixed_width_us(freq, "round")

        def near(us):
            rem = ((us % width) + width) % width
            base = us - rem
            even = F.pmod(F.floor(base / F.lit(width)).cast("long"),
                          F.lit(2)) == 0
            return (F.when(rem * 2 < width, base)
                    .when(rem * 2 > width, base + width)
                    .otherwise(F.when(even, base)
                               .otherwise(base + width)))
        return self._epoch_us_map(near)

    _STRF = {"%Y": "yyyy", "%y": "yy", "%m": "MM", "%d": "dd",
             "%H": "HH", "%I": "hh", "%M": "mm", "%S": "ss",
             "%f": "SSSSSS", "%a": "EEE", "%A": "EEEE", "%b": "MMM",
             "%B": "MMMM", "%j": "DDD", "%p": "a"}

    @classmethod
    def _c_to_java(cls, fmt: str) -> str:
        """Translate C/pandas strftime '%' codes to a Java datetime
        pattern, quoting literal runs so stray letters are not
        interpreted as directives."""
        out, lit = [], []

        def flush():
            if lit:
                s = "".join(lit).replace("'", "''")
                out.append(f"'{s}'" if any(ch.isalpha() for ch in s)
                           else s)
                lit.clear()

        i = 0
        while i < len(fmt):
            if fmt[i] == "%" and i + 1 < len(fmt):
                code = fmt[i:i + 2]
                if code == "%%":
                    lit.append("%")
                elif code in cls._STRF:
                    flush()
                    out.append(cls._STRF[code])
                else:
                    raise ValueError(
                        f"unsupported strftime code {code!r}")
                i += 2
            else:
                lit.append(fmt[i])
                i += 1
        flush()
        return "".join(out)

    def strftime(self, fmt: str):
        """Format timestamps (pandas ``dt.strftime``): C '%' codes
        are translated to the Java pattern Spark's date_format
        expects ('%Y/%m/%d %H:%M' just works); a format WITHOUT '%'
        is passed through as a raw Spark/Java pattern (the documented
        pre-r5 behavior, e.g. 'yyyy-MM-dd HH:mm')."""
        java = self._c_to_java(fmt) if "%" in fmt else fmt
        return self._map(lambda c: F.date_format(c, java))

    def unix(self):
        """Seconds since epoch (engine extension)."""
        return self._map(F.unix_timestamp)


def freq_to_us(freq: str) -> int:
    """Fixed-width pandas offset alias (optionally with a multiple,
    '15min'/'2H'/'30S') to exact microseconds — the grid arithmetic
    behind ``bl.date_range`` and ``DataFrame.resample``. Anchored
    frequencies (weeks, months) are not fixed-width and raise."""
    import re
    m = re.fullmatch(r"(\d*)\s*([A-Za-z]+)", freq)
    unit = m.group(2) if m else None
    if unit not in DatetimeMethods._FIXED_US:
        raise ValueError(
            f"unsupported fixed-width frequency {freq!r}; one of "
            f"{sorted(set(DatetimeMethods._FIXED_US))} with an "
            "optional integer multiple")
    n = int(m.group(1) or 1)
    if n < 1:
        raise ValueError("frequency multiple must be >= 1")
    return n * DatetimeMethods._FIXED_US[unit]
