"""String methods: ``sr.str.*`` accessor.

Reference: ``baloo/core/strings.py`` (API) -> ``baloo/weld/weld_str.py``
(633 LoC of hand-rolled per-byte Weld loops). Every method here is a
built-in JVM-side Column expression (whole-stage codegen) — no Python
in the hot path. Semantics follow the reference where they differ
from Spark defaults (capitalize, replace-first-only, split-side,
find with bounds, get with negative index / out-of-range -> NULL).

The reference is ASCII-bytes-only (encoders.py:10-11); we operate on
full unicode strings — a strict superset.
"""

from __future__ import annotations

import re as _re_mod

from pyspark.sql import functions as F


def _re_escape(s: str) -> str:
    return _re_mod.escape(s)


class StringMethods:
    def __init__(self, sr):
        # pandas parity: .str on a non-string column raises instead
        # of silently casting (a numeric Series getting .lower() is a
        # bug in user code). The check reads the analyzed schema —
        # no Spark job.
        t = sr.spark_type.typeName()
        # arrays of strings are legal .str targets too (str.join /
        # post-split element ops, like pandas object-of-list
        # series); binary admits str.decode
        if t not in ("string", "null", "array", "binary"):
            raise AttributeError(
                "Can only use .str accessor with string values! "
                f"(column dtype is {t}; astype(str) first)")
        self._sr = sr

    def _map(self, fn, name=None):
        return self._sr._with_col(fn(self._sr._colexpr), name)

    # strings.py:12-30 -> weld_str.py:6-73
    def lower(self):
        return self._map(F.lower)

    def upper(self):
        return self._map(F.upper)

    def capitalize(self):
        """First char upper, rest lower (strings.py:32-40). NOT
        F.initcap (which capitalizes every word)."""
        return self._map(lambda c: F.concat(
            F.upper(F.substring(c, 1, 1)),
            F.lower(c.substr(F.lit(2), F.length(c)))))

    def get(self, i: int):
        """i-th char; negative i from the end; out-of-range -> NULL
        (strings.py:42-56, tests/core/test_series_str.py:14-15)."""
        def fn(c):
            if i >= 0:
                ch = F.substring(c, i + 1, 1)
            else:
                ch = c.substr(F.length(c) + i + 1, F.lit(1))
            return F.when(F.length(c) > abs(i) - (1 if i < 0 else 0), ch) \
                if i < 0 else F.when(F.length(c) > i, ch)
        return self._map(fn)

    def strip(self):
        """Trim ASCII spaces both ends (strings.py:58-68)."""
        return self._map(F.trim)

    def slice(self, start: int | None = None, stop: int | None = None,
              step: int = 1):
        """Per-element substring with full Python slice semantics
        (strings.py:70-93 has positive bounds only; negative
        start/stop/step follow pandas ``str.slice``)."""
        if step == 0:
            raise ValueError("slice step cannot be zero")

        def fn(c):
            length = F.length(c)
            if step > 0:
                lo = 0 if start is None else start
                st = (F.least(F.lit(lo), length) if lo >= 0
                      else F.greatest(length + lo, F.lit(0)))
                if stop is None:
                    en = length
                elif stop >= 0:
                    en = F.least(F.lit(stop), length)
                else:
                    en = F.greatest(length + stop, F.lit(0))
                sub = c.substr(st + 1, F.greatest(en - st, F.lit(0)))
                if step == 1:
                    return sub
                # stay JVM-side: split to chars, keep every step-th, rejoin
                chars = F.filter(F.split(sub, ""),
                                 lambda x, i: (i % step) == 0)
                return F.array_join(chars, "")
            # negative step: keep indices en < i <= st with
            # (st - i) % |step| == 0, then reverse the kept chars
            if start is None:
                st = length - 1
            elif start >= 0:
                st = F.least(F.lit(start), length - 1)
            else:
                st = length + start  # < 0 selects nothing below
            if stop is None:
                en = F.lit(-1)
            elif stop >= 0:
                en = F.least(F.lit(stop), length - 1)
            else:
                en = F.greatest(length + stop, F.lit(-1))
            kept = F.filter(
                F.split(c, ""),
                lambda x, i: (i <= st) & (i > en)
                             & (((st - i) % (-step)) == 0))
            return F.array_join(F.reverse(kept), "")
        return self._map(fn)

    def contains(self, pat: str, case: bool = True, na=None,
                 regex: bool = True):
        """pandas ``str.contains``: REGEX by default, unanchored
        (``re.search``). r11 fix — the face previously followed the
        reference's literal-substring semantics (strings.py:95-109),
        silently diverging on metacharacter patterns;
        ``regex=False`` is that literal face. ``case=False``
        case-folds; ``na=`` fills results for missing inputs
        (pandas default propagates missing). Java regex dialect —
        documented, not translated."""
        def fn(c):
            if regex:
                out = c.rlike(f"(?i){pat}" if not case else pat)
            else:
                out = (F.lower(c).contains(pat.lower())
                       if not case else c.contains(pat))
            if na is not None:
                out = F.when(c.isNull(),
                             F.lit(bool(na))).otherwise(out)
            return out
        return self._map(fn)

    def startswith(self, pat: str, na=None):
        def fn(c):
            out = c.startswith(pat)
            if na is not None:
                out = F.when(c.isNull(),
                             F.lit(bool(na))).otherwise(out)
            return out
        return self._map(fn)

    def endswith(self, pat: str, na=None):
        def fn(c):
            out = c.endswith(pat)
            if na is not None:
                out = F.when(c.isNull(),
                             F.lit(bool(na))).otherwise(out)
            return out
        return self._map(fn)

    def join(self, sep: str):
        """Join array-of-strings elements (pandas ``str.join`` on a
        list column) — array_join, one expression."""
        return self._map(lambda c: F.array_join(c, sep))

    def translate(self, table: dict):
        """Per-character mapping (python str.translate with a
        {ord/char: char-or-None} table): 1:1 mappings compile to
        Spark's native ``translate``; deletions (None values) become
        one character-class regexp_replace. Pure expressions."""
        frm = to = dele = ""
        for k, v in table.items():
            ch = chr(k) if isinstance(k, int) else k
            if v is None or v == "":
                dele += ch
            else:
                frm += ch
                to += v if isinstance(v, str) else chr(v)

        def fn(c):
            out = F.translate(c, frm, to) if frm else c
            if dele:
                out = F.regexp_replace(
                    out, "[" + _re_escape(dele) + "]", "")
            return out
        return self._map(fn)

    def casefold(self):
        """Aggressive lowercase (pandas casefold; JVM lower covers
        the common cases — full Unicode casefolding differences are
        rare)."""
        return self._map(F.lower)

    def center(self, width: int, fillchar: str = " "):
        """Pad both sides to ``width`` (python str.center: the extra
        char goes RIGHT)."""
        left = lambda c: F.floor((width - F.length(c)) / 2)  # noqa: E731
        return self._map(lambda c: F.when(
            F.length(c) >= width, c).otherwise(
            F.rpad(F.lpad(c, (left(c) + F.length(c)).cast("int"),
                          fillchar), width, fillchar)))

    def findall(self, pat: str):
        """All regex matches per row as an array (pandas findall) —
        regexp_extract_all, one JVM expression. Spark defaults to
        group 1; a group-less pattern extracts the whole match
        (group 0), matching pandas."""
        import re as _re
        grp = 1 if _re.compile(pat).groups >= 1 else 0
        return self._map(lambda c: F.regexp_extract_all(
            c, F.lit(pat), F.lit(grp)))

    def rfind(self, sub: str):
        """Last index of ``sub``, -1 when absent (python rfind):
        length minus the reversed find."""
        n = len(sub)
        rsub = sub[::-1]
        return self._map(lambda c: F.when(
            F.instr(F.reverse(c), F.lit(rsub)) > 0,
            F.length(c) - F.instr(F.reverse(c), F.lit(rsub))
            - F.lit(n - 1)).otherwise(F.lit(-1)))

    def rsplit(self, pat: str = " ", n: int = -1):
        """Split from the RIGHT (pandas rsplit): reverse, split
        left-limited, un-reverse elements and order. Whole-string
        reversal keeps it one expression chain."""
        if n < 0:
            return self._map(lambda c: F.split(c, _re_escape(pat)))
        rpat = pat[::-1]
        return self._map(lambda c: F.reverse(F.transform(
            F.split(F.reverse(c), _re_escape(rpat), n + 1),
            lambda e: F.reverse(e))))

    def partition(self, sep: str = " "):
        """3-struct (head, sep, tail) around the FIRST separator
        (pandas partition returns a 3-column frame; here a struct
        column — address the parts as ``.str.partition()['0']``
        etc. via Series field access)."""
        return self._map(lambda c: F.when(
            c.contains(sep),
            F.struct(
                F.substring_index(c, sep, 1).alias("0"),
                F.lit(sep).alias("1"),
                F.substr(c, F.instr(c, F.lit(sep)) + len(sep),
                         F.length(c)).alias("2")))
            .otherwise(F.struct(c.alias("0"), F.lit("").alias("1"),
                                F.lit("").alias("2"))))

    def slice_replace(self, start=None, stop=None, repl: str = ""):
        """Replace [start, stop) with ``repl`` (pandas
        slice_replace; non-negative bounds)."""
        s = 0 if start is None else start
        return self._map(lambda c: F.concat(
            F.substr(c, F.lit(1), F.lit(s)),
            F.lit(repl),
            F.lit("") if stop is None
            else F.substr(c, F.lit(stop + 1), F.length(c))))

    def isdecimal(self):
        return self._map(self._is_match(r"(?U)^\d+$"))

    def istitle(self):
        """Titlecase test (python str.istitle): at least one
        uppercase, no uppercase directly after a letter (kills
        ALL-CAPS), no letter-run starting lowercase."""
        return self._map(lambda c: F.when(
            c.isNotNull(),
            c.rlike(r"(?U)\p{Lu}")
            & ~c.rlike(r"(?U)\p{L}\p{Lu}")
            & ~c.rlike(r"(?U)(^|[^\p{L}])\p{Ll}")))

    def normalize(self, form: str = "NFC"):
        """Unicode normalization via an Arrow batch (no JVM
        normalizer is exposed as a SQL function)."""
        import unicodedata

        from ..functions._udf import scalar_pandas_udf
        from pyspark.sql import types as T
        udf = scalar_pandas_udf(
            lambda s, _f=form: s.map(
                lambda x: unicodedata.normalize(_f, x)
                if x is not None else None),
            T.StringType())
        return self._map(udf)

    def match(self, pat: str):
        """Regex match anchored at the START (pandas ``str.match`` =
        ``re.match``): rlike with a leading anchor. Java regex; the
        (?U) flag gives Python-parity unicode classes if needed."""
        return self._map(lambda c: c.rlike(f"^(?:{pat})"))

    def fullmatch(self, pat: str):
        """Whole-string regex match (pandas ``str.fullmatch``)."""
        return self._map(lambda c: c.rlike(f"^(?:{pat})$"))

    def removeprefix(self, prefix: str):
        """Drop ``prefix`` when present (pandas/str.removeprefix)."""
        n = len(prefix)
        return self._map(
            lambda c: F.when(c.startswith(prefix),
                             c.substr(F.lit(n + 1), F.length(c)))
            .otherwise(c))

    def removesuffix(self, suffix: str):
        n = len(suffix)
        return self._map(
            lambda c: F.when(c.endswith(suffix),
                             c.substr(F.lit(1), F.length(c) - n))
            .otherwise(c))

    def find(self, sub: str, start: int = 0, end: int | None = None):
        """First index of ``sub`` in [start, end), else -1
        (strings.py:143-169); negative start/end count from the end
        like Python ``str.find``."""
        def fn(c):
            length = F.length(c)
            st = (F.lit(start) if start >= 0
                  else F.greatest(length + start, F.lit(0)))
            if end is None:
                en = length
            elif end >= 0:
                en = F.least(F.lit(end), length)
            else:
                en = F.greatest(length + end, F.lit(0))
            hay = c.substr(st + 1, F.greatest(en - st, F.lit(0)))
            loc = F.locate(sub, hay)
            res = F.when(st > en, F.lit(-1)).otherwise(
                F.coalesce(F.when(loc > 0, loc - 1 + st), F.lit(-1)))
            if start >= 0:
                # a positive start past the end always misses (Python
                # returns -1 even for sub='')
                res = F.when(F.lit(start) > length, F.lit(-1)) \
                    .otherwise(res)
            return F.when(c.isNotNull(), res).cast("long")
        return self._map(fn)

    def replace(self, pat: str, rep: str):
        """Replace FIRST occurrence only (strings.py:171-188) — literal,
        not regex; implemented with locate + concat to avoid regex
        escaping entirely."""
        def fn(c):
            pos = F.locate(pat, c)
            return F.when(
                pos > 0,
                F.concat(c.substr(F.lit(1), pos - 1),
                         F.lit(rep),
                         c.substr(pos + len(pat), F.length(c)))
            ).otherwise(c)
        return self._map(fn)

    def split(self, pat: str, side: str = "left"):
        """Split at FIRST occurrence of ``pat``; return left or right
        part (strings.py:190-219). No match: left -> whole string,
        right -> NULL."""
        def fn(c):
            pos = F.locate(pat, c)
            if side == "left":
                return F.when(pos > 0, c.substr(F.lit(1), pos - 1)).otherwise(c)
            if side == "right":
                return F.when(pos > 0, c.substr(pos + len(pat), F.length(c)))
            raise ValueError("side must be 'left' or 'right'")
        return self._map(fn)

    # ------------------------------------------------ engine extensions

    def length(self):
        return self._map(F.length)

    def len(self):
        """pandas ``str.len`` (alias of :meth:`length`)."""
        return self._map(F.length)

    def count(self, pat: str):
        """Occurrences of regex ``pat`` per value (pandas
        ``str.count``); NULL stays NULL."""
        return self._map(lambda c: F.regexp_count(c, F.lit(pat)))

    def repeat(self, n: int):
        """Concatenate each value ``n`` times (pandas
        ``str.repeat`` with a scalar)."""
        return self._map(lambda c: F.repeat(c, n))

    def zfill(self, width: int):
        """Left-pad with '0' to ``width``, sign-aware like Python's
        ``str.zfill`` ('-2'.zfill(3) == '-02'); pandas parity."""
        def fn(c):
            sign = F.substring(c, 1, 1)
            signed = sign.isin("-", "+")
            rest = F.when(signed,
                          c.substr(F.lit(2), F.length(c))).otherwise(c)
            pad = F.when(signed,
                         F.concat(sign, F.lpad(rest, width - 1, "0"))) \
                .otherwise(F.lpad(c, width, "0"))
            # lpad TRUNCATES below width; zfill never truncates
            return F.when(F.length(c) >= width, c).otherwise(pad)
        return self._map(fn)

    def lstrip(self):
        """Trim ASCII spaces from the left (pandas ``str.lstrip``)."""
        return self._map(F.ltrim)

    def rstrip(self):
        """Trim ASCII spaces from the right (pandas ``str.rstrip``)."""
        return self._map(F.rtrim)

    def pad(self, width: int, side: str = "left",
            fillchar: str = " "):
        """Pad to ``width`` (pandas ``str.pad``); never truncates —
        Spark's lpad/rpad DO truncate below width, so they're gated
        on length. ``side`` ∈ {'left', 'right', 'both'}."""
        if side not in ("left", "right", "both"):
            raise ValueError(f"side must be left/right/both, got {side!r}")

        def fn(c):
            if side == "left":
                padded = F.lpad(c, width, fillchar)
            elif side == "right":
                padded = F.rpad(c, width, fillchar)
            else:
                lw = (F.lit(width) - F.length(c)) / 2
                padded = F.rpad(
                    F.lpad(c, (F.length(c)
                               + F.floor(lw)).cast("int"), fillchar),
                    width, fillchar)
            return F.when(F.length(c) >= width, c).otherwise(padded)
        return self._map(fn)

    def ljust(self, width: int, fillchar: str = " "):
        """pandas ``str.ljust`` — pad on the RIGHT."""
        return self.pad(width, "right", fillchar)

    def rjust(self, width: int, fillchar: str = " "):
        """pandas ``str.rjust`` — pad on the LEFT."""
        return self.pad(width, "left", fillchar)

    def title(self):
        """Python ``str.title`` semantics (pandas parity): uppercase
        the letter starting each ALPHA RUN — 'a1b2' -> 'A1B2', which
        initcap (whitespace-word-based) gets wrong. Char-level
        transform with an index lookback, all JVM-side."""
        def fn(c):
            arr = F.split(c, "")
            alpha = r"(?U)^[^\W\d_]$"
            return F.when(c.isNotNull(), F.concat_ws("", F.transform(
                arr, lambda ch, i: F.when(
                    ch.rlike(alpha)
                    & ((i == F.lit(0))
                       | ~F.element_at(arr, F.greatest(i, F.lit(1)))
                       .rlike(alpha)),
                    F.upper(ch)).otherwise(F.lower(ch)))))
        return self._map(fn)

    def swapcase(self):
        """Swap case per character: split to chars, flip each with a
        CASE, concat back — all JVM-side array expressions (the
        lambda drops out of whole-stage codegen into interpreted
        eval, acceptable for a per-char string op)."""
        return self._map(lambda c: F.when(c.isNotNull(), F.concat_ws(
            "", F.transform(F.split(c, ""),
                            lambda ch: F.when(ch == F.upper(ch),
                                              F.lower(ch))
                            .otherwise(F.upper(ch))))))

    def _is_match(self, pattern: str):
        """Python str.is* contract: non-empty AND every char in the
        class (NULL propagates)."""
        return lambda c: F.when(c.isNotNull(),
                                c.rlike(pattern))

    def isdigit(self):
        return self._map(self._is_match(r"(?U)^\d+$"))

    def isalpha(self):
        # (?U): Java regex char classes are ASCII by default; the
        # UNICODE_CHARACTER_CLASS flag matches Python's str.isalpha
        return self._map(self._is_match(r"(?U)^[^\W\d_]+$"))

    def isalnum(self):
        return self._map(self._is_match(r"(?U)^[^\W_]+$"))

    def isnumeric(self):
        return self._map(self._is_match(r"(?U)^\d+$"))

    def isspace(self):
        return self._map(self._is_match(r"(?U)^\s+$"))

    def isupper(self):
        """Python contract: at least one cased char, none lowercase."""
        return self._map(lambda c: F.when(
            c.isNotNull(), c.rlike("[A-Za-z]") & (c == F.upper(c))))

    def islower(self):
        return self._map(lambda c: F.when(
            c.isNotNull(), c.rlike("[A-Za-z]") & (c == F.lower(c))))

    def cat(self, others=None, sep: str = ""):
        """Element-wise concatenation with another Series/column
        (pandas ``str.cat`` with ``others``; NULL in either side
        gives NULL, like pandas' default NaN propagation). Without
        ``others``, pandas collapses to one string — a driver-sized
        reduction this engine deliberately does not offer; pass
        others."""
        if others is None:
            raise ValueError("str.cat without others= reduces the "
                             "whole column to one driver-side string; "
                             "pass others= (element-wise form)")
        o = others._colexpr if hasattr(others, "_colexpr") else F.lit(others)
        return self._map(
            lambda c: F.concat(c, F.lit(sep), o) if sep else F.concat(c, o))

    def regexp_extract(self, pattern: str, group: int = 0):
        return self._map(lambda c: F.regexp_extract(c, pattern, group))

    def extract(self, pat: str, expand: bool = True):
        """pandas ``str.extract``: regex capture groups become
        columns (a DataFrame when ``expand=True`` or >1 group, a
        Series for one group with ``expand=False``). Non-matching
        rows yield NULL — Spark's regexp_extract returns '' there,
        so each group expression is gated by an rlike match. One
        projection; group COUNT comes from compiling the pattern
        driver-side (no data touched)."""
        import re as _re
        ngroups = _re.compile(pat).groups
        if ngroups == 0:
            raise ValueError("pattern contains no capture groups")
        names = {v: k for k, v
                 in _re.compile(pat).groupindex.items()}
        # Java regex spells named groups (?<name>...), Python
        # (?P<name>...); translate so both dialects accept the pattern
        pat = pat.replace("(?P<", "(?<").replace("(?P=", r"\k<")
        sr = self._sr
        c = sr._colexpr

        def grp(i):
            return F.when(c.rlike(pat),
                          F.regexp_extract(c, pat, i))
        if ngroups == 1 and not expand:
            return sr._with_col(grp(1))
        from .frame import DataFrame
        cols = {names.get(i, str(i - 1)): grp(i)
                for i in range(1, ngroups + 1)}
        sdf = sr._sdf.select(
            *[F.col(x) for x in sr._index_cols
              if x in sr._sdf.columns],
            *[e.alias(n) for n, e in cols.items()])
        return DataFrame._make(sdf, sr._index_cols, list(cols),
                               sr._order)

    def regexp_replace(self, pattern: str, rep: str):
        return self._map(lambda c: F.regexp_replace(c, pattern, rep))

    def rpartition(self, sep: str = " "):
        """3-struct (head, sep, tail) around the LAST separator
        (pandas rpartition; struct-column flavor like
        :meth:`partition`). No match: ('', '', whole) — the mirror
        of partition's (whole, '', '')."""
        n = len(sep)
        rsep = sep[::-1]

        def fn(c):
            # 0-based index of the LAST occurrence (rfind formula)
            idx0 = F.length(c) - F.instr(F.reverse(c), F.lit(rsep)) \
                - F.lit(n - 1)
            return F.when(
                F.instr(F.reverse(c), F.lit(rsep)) > 0,
                F.struct(
                    c.substr(F.lit(1), idx0).alias("0"),
                    F.lit(sep).alias("1"),
                    c.substr(idx0 + 1 + n, F.length(c)).alias("2")))                 .when(c.isNotNull(),
                       F.struct(F.lit("").alias("0"),
                                F.lit("").alias("1"),
                                c.alias("2")))
        return self._map(fn)

    def index(self, sub: str, start: int = 0,
              end: int | None = None):
        """Like :meth:`find` but raises ``ValueError`` when any
        element misses (python ``str.index`` contract) — one eager
        probe agg counts the -1s before the lazy result returns,
        the to_numeric(errors='raise') pattern."""
        out = self.find(sub, start, end)
        self._raise_on_miss(out, "index")
        return out

    def rindex(self, sub: str):
        """Like :meth:`rfind` but raises on any miss (python
        ``str.rindex``)."""
        out = self.rfind(sub)
        self._raise_on_miss(out, "rindex")
        return out

    def _raise_on_miss(self, out, name):
        sdf, alias = out._select("__ix__")
        bad = sdf.agg(F.count(F.when(F.col(alias) == -1, 1))
                      .alias("n")).collect()[0]["n"]
        if bad:
            raise ValueError(
                f"substring not found in {bad} element(s) "
                f"(str.{name} raises like python; use "
                f"find/rfind for -1 sentinels)")

    def extractall(self, pat: str):
        """pandas ``str.extractall``: EVERY regex match becomes a
        row — capture groups as columns, indexed by (original
        label, match ordinal). One projection of per-group
        regexp_extract_all arrays zipped and posexploded; rows
        without matches drop, like pandas. Stays JVM-side — no
        Python in the loop."""
        import re as _re
        ngroups = _re.compile(pat).groups
        if ngroups == 0:
            raise ValueError("pattern contains no capture groups")
        names = {v: k for k, v
                 in _re.compile(pat).groupindex.items()}
        pat = pat.replace("(?P<", "(?<").replace("(?P=", r"\k<")
        sr = self._sr
        c = sr._colexpr
        zipped = F.arrays_zip(
            *[F.regexp_extract_all(c, F.lit(pat), F.lit(i))
              .alias(f"g{i}") for i in range(1, ngroups + 1)])
        idx = [F.col(x) for x in sr._index_cols
               if x in sr._sdf.columns]
        ex = sr._sdf.select(
            *idx, F.posexplode(zipped).alias("match", "__z__"))
        cols = {names.get(i, str(i - 1)): F.col(f"__z__.g{i}")
                for i in range(1, ngroups + 1)}
        out = ex.select(*[F.col(x) for x in sr._index_cols
                          if x in ex.columns],
                        F.col("match"),
                        *[e.alias(nm) for nm, e in cols.items()])
        from .frame import DataFrame
        return DataFrame._make(
            out, [*sr._index_cols, "match"], list(cols),
            [(k, True) for k in (*sr._index_cols, "match")])

    def get_dummies(self, sep: str = "|"):
        """Indicator columns from sep-joined label strings (pandas
        ``str.get_dummies``). The label vocabulary is collected
        once (driver-sized by construction — these are categorical
        tags, guarded at 10k); each indicator is a pure
        array_contains projection, no shuffle."""
        sr = self._sr
        c = sr._colexpr
        arr = F.split(c, _re_escape(sep))
        labels = [r["l"] for r in
                  sr._sdf.select(F.explode(arr).alias("l"))
                  .where(F.col("l") != "").distinct()
                  .limit(10_001).collect()]
        if len(labels) > 10_000:
            raise ValueError(
                "get_dummies found >10k distinct labels — that is "
                "a join table, not a column set")
        labels = sorted(labels)
        from .frame import DataFrame
        idx = [F.col(x) for x in sr._index_cols
               if x in sr._sdf.columns]
        out = sr._sdf.select(
            *idx,
            *[F.when(F.array_contains(arr, lab), 1).otherwise(0)
              .cast("long").alias(lab) for lab in labels])
        return DataFrame._make(out, sr._index_cols, labels,
                               sr._order)

    def wrap(self, width: int, **kw):
        """Line-wrap each element at ``width`` (pandas str.wrap) —
        python's textwrap has no JVM twin, so this is the honest
        Arrow-batched slow path."""
        import textwrap

        from ..functions._udf import scalar_pandas_udf
        from pyspark.sql import types as T
        tw = textwrap.TextWrapper(width=width, **kw)
        udf = scalar_pandas_udf(
            lambda s: s.map(lambda x: tw.fill(x)
                            if x is not None else None),
            T.StringType())
        return self._map(udf)

    def encode(self, encoding: str = "utf-8"):
        """String -> binary bytes (pandas str.encode) —
        F.encode, one JVM expression."""
        return self._map(lambda c: F.encode(c, encoding))

    def decode(self, encoding: str = "utf-8"):
        """Binary -> string (pandas str.decode) — F.decode."""
        return self._map(lambda c: F.decode(c, encoding))
