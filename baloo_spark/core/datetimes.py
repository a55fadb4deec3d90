"""Datetime accessor: ``sr.dt.*`` as JVM-side Column expressions.

Engine extension — the reference has NO datetime type (SURVEY.md
§1.2: Weld's universe is bool/ints/floats/bytes); this mirrors the
pandas ``.dt`` namespace over Spark TimestampType/DateType columns so
calendar extraction stays inside whole-stage codegen (the same ops
the ``extract_ops`` driver slot proves via SQL templates).

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
        return self._sr._with_col(fn(self._sr._colexpr), name)

    def year(self):
        return self._map(F.year)

    def month(self):
        return self._map(F.month)

    def day(self):
        return self._map(F.dayofmonth)

    def hour(self):
        return self._map(F.hour)

    def minute(self):
        return self._map(F.minute)

    def second(self):
        return self._map(F.second)

    def dayofweek(self):
        # pandas: Monday=0..Sunday=6; Spark dayofweek: Sunday=1..Saturday=7
        return self._map(lambda c: (F.dayofweek(c) + 5) % 7)

    def dayofyear(self):
        return self._map(F.dayofyear)

    def week(self):
        return self._map(F.weekofyear)

    def quarter(self):
        return self._map(F.quarter)

    def date(self):
        return self._map(F.to_date)

    def floor(self, freq: str):
        """Truncate to 'year'/'month'/'week'/'day'/'hour'/'minute' —
        maps to date_trunc (always returns timestamp, like pandas
        dt.floor)."""
        return self._map(lambda c: F.date_trunc(freq, c))

    def strftime(self, fmt: str):
        """Format using Spark/Java datetime patterns (e.g.
        'yyyy-MM-dd HH:mm'), NOT C strftime '%' codes."""
        return self._map(lambda c: F.date_format(c, fmt))

    def unix(self):
        """Seconds since epoch (engine extension)."""
        return self._map(F.unix_timestamp)
