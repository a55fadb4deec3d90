"""String method tests — golden values mirror the reference's
tests/core/test_series_str.py:9-43 on the same fixture strings."""

import numpy as np
import pytest


@pytest.fixture
def sr(bl):
    return bl.Series(np.array(["a", "Abc", "goosfraba", "   dC  ", "secrETariat"]),
                     name="c")


def vals(s):
    return s.to_pandas().tolist()


def test_lower_upper(sr):
    assert vals(sr.str.lower()) == ["a", "abc", "goosfraba", "   dc  ", "secretariat"]
    assert vals(sr.str.upper()) == ["A", "ABC", "GOOSFRABA", "   DC  ", "SECRETARIAT"]


def test_capitalize(sr):
    # first char upper, rest lower — NOT initcap
    assert vals(sr.str.capitalize()) == ["A", "Abc", "Goosfraba", "   dc  ", "Secretariat"]


def test_get(sr):
    assert vals(sr.str.get(1)) == [None, "b", "o", " ", "e"]
    assert vals(sr.str.get(-2)) == [None, "b", "b", " ", "a"]  # negative index


def test_strip(sr):
    assert vals(sr.str.strip()) == ["a", "Abc", "goosfraba", "dC", "secrETariat"]


def test_slice(sr):
    assert vals(sr.str.slice(1, 3)) == ["", "bc", "oo", "  ", "ec"]
    assert vals(sr.str.slice(1, 5, 2)) == ["", "b", "os", " d", "er"]


def test_contains_startswith_endswith(sr):
    assert vals(sr.str.contains("ab")) == [False, False, True, False, False]
    assert vals(sr.str.startswith("go")) == [False, False, True, False, False]
    assert vals(sr.str.endswith("t")) == [False, False, False, False, True]


def test_find(sr):
    assert vals(sr.str.find("a")) == [0, -1, 6, -1, 6]
    assert vals(sr.str.find("a", 1)) == [-1, -1, 6, -1, 6]
    assert vals(sr.str.find("a", 0, 3)) == [0, -1, -1, -1, -1]


def test_replace_first_only(sr):
    assert vals(sr.str.replace("a", "X")) == \
        ["X", "Abc", "goosfrXba", "   dC  ", "secrETXriat"]


def test_split(sr):
    assert vals(sr.str.split("b", "left")) == \
        ["a", "A", "goosfra", "   dC  ", "secrETariat"]
    assert vals(sr.str.split("b", "right")) == [None, "c", "a", None, None]


def test_str_len_count_repeat_zfill_parity(bl):
    """r5 probe batch: pandas parity for the four added str methods,
    NULLs included."""
    import numpy as np
    import pandas as pd
    vals = ["aXaX", "", None, "b"]
    sr = bl.Series(np.array(vals, dtype=object), name="s")
    ps = pd.Series(vals)

    got_len = sr.str.len().to_pandas().tolist()
    want_len = ps.str.len().tolist()
    assert all((a != a and b != b) or a == b
               for a, b in zip([float(x) if x is not None else float("nan")
                                for x in got_len], want_len))

    got_cnt = sr.str.count("X").to_pandas().tolist()
    want_cnt = ps.str.count("X").tolist()
    assert all((a != a and b != b) or float(a) == b
               for a, b in zip([x if x is not None else float("nan")
                                for x in got_cnt], want_cnt))

    assert sr.str.repeat(2).to_pandas().tolist()[:2] == ["aXaXaXaX", ""]

    zvals = ["4", "-2", "+7", "12345", None, "-"]
    zs = bl.Series(np.array(zvals, dtype=object), name="z")
    got_z = zs.str.zfill(3).to_pandas().tolist()
    want_z = pd.Series(zvals).str.zfill(3).tolist()
    assert [g for g in got_z] == [None if w != w and not isinstance(w, str)
                                  else w for w in want_z]


def test_str_cat_elementwise(bl):
    import numpy as np
    import pandas as pd
    a = bl.DataFrame({"x": np.array(["a", None, "c"], dtype=object),
                      "y": np.array(["1", "2", None], dtype=object)})
    got = a["x"].str.cat(a["y"], sep="-").to_pandas().tolist()
    want = pd.Series(["a", None, "c"]).str.cat(
        pd.Series(["1", "2", None]), sep="-").tolist()
    assert [g for g in got] == [None if w != w else w for w in want]
    import pytest
    with pytest.raises(ValueError, match="others"):
        a["x"].str.cat()


def test_slice_negative_bounds_and_step_parity(bl):
    # full Python slice semantics, pinned against pandas (r5 probe
    # sweep found positive-only normalization gave silent wrong
    # answers for negative start/stop and a loud error for step<0)
    import pandas as pd
    strs = ["", "a", "Abc", "  pad  ", "a.b*c", "aaa", "multi word here",
            None, "0042", "-7"]
    sr = bl.Series(np.array(strs, dtype=object), name="s")
    ps = pd.Series(strs)
    cases = [(-3, None, 1), (2, -1, 1), (None, None, -1), (-1, -3, -1),
             (5, 2, -1), (3, None, -2), (-2, None, -2), (1, -10, -1),
             (10, None, -1), (-10, None, -1), (2, 2, -1), (-10, 50, 2),
             (None, -2, 1), (-4, -1, 2), (None, 3, -1)]
    for a, b, st in cases:
        got = vals(sr.str.slice(a, b, st))
        want = [None if v is None else v for v in ps.str.slice(a, b, st)]
        assert got == want, (a, b, st, got, want)
    with pytest.raises(ValueError):
        sr.str.slice(0, None, 0)


def test_find_negative_bounds_parity(bl):
    import pandas as pd
    strs = ["", "a", "Abc", "  pad  ", "aaa", None, "0042"]
    sr = bl.Series(np.array(strs, dtype=object), name="s")
    ps = pd.Series(strs)
    cases = [("a", -3, None), ("a", 0, -1), ("a", -10, -1), ("", 10, None),
             ("", 3, 3), ("a", 10, None), ("a", 2, 1), ("a", -1, None),
             ("pad", -6, -2), ("4", 0, None)]
    for sub, a, b in cases:
        got = [None if pd.isna(v) else int(v) for v in vals(sr.str.find(sub, a, b))]
        want = [None if pd.isna(v) else int(v) for v in ps.str.find(sub, a, b)]
        assert got == want, (sub, a, b, got, want)


def test_str_pad_family_matches_pandas(bl):
    import numpy as np
    import pandas as pd
    vals = ["Hello World", "abc", "AB-12", "  pad  ", "", None, "123",
            "3.14", "ALLUP", "low", "Mixed Case", "-42", "  ",
            "ünïcode", "a1b2"]
    s = bl.DataFrame({"v": np.array(vals, dtype=object)})["v"]
    p = pd.Series(vals)
    cases = [
        ("lstrip", {}), ("rstrip", {}),
        ("pad", {"width": 8}), ("pad", {"width": 8, "side": "right"}),
        ("pad", {"width": 8, "side": "both"}),
        ("ljust", {"width": 7, "fillchar": "*"}),
        ("rjust", {"width": 7, "fillchar": "*"}),
        ("title", {}), ("swapcase", {}),
    ]
    for name, kw in cases:
        got = getattr(s.str, name)(**kw).to_pandas().tolist()
        want = getattr(p.str, name)(**kw).tolist()
        norm = lambda xs: [None if x is None
                           or (isinstance(x, float) and x != x) else x
                           for x in xs]
        assert norm(got) == norm(want), (name, kw)


def test_str_ischecks_match_python(bl):
    """is* follow Python's unicode-aware char classes ((?U) regex
    flag — Java classes are ASCII by default)."""
    import numpy as np
    import pandas as pd
    vals = ["abc", "AB12", "123", "3.14", "", None, "  ", "ünïcode",
            "a1b2", "ALL", "low"]
    s = bl.DataFrame({"v": np.array(vals, dtype=object)})["v"]
    p = pd.Series(vals)
    for m in ("isdigit", "isalpha", "isalnum", "isnumeric",
              "isspace", "isupper", "islower"):
        got = getattr(s.str, m)().to_pandas().tolist()
        want = getattr(p.str, m)().tolist()
        norm = lambda xs: [None if x is None
                           or (isinstance(x, float) and x != x)
                           else bool(x) for x in xs]
        assert norm(got) == norm(want), m


def test_corr_spearman_pairwise_complete(bl):
    """spearman = rank-then-Pearson over PAIRWISE-COMPLETE rows (the
    pandas/scipy recipe: mask first, then rank)."""
    import numpy as np
    import pandas as pd
    x = [1., 2., np.nan, 4., 5., 7., 3., 4.]
    y = [2., 1., 6., 8., 11., np.nan, 2.5, 8.]
    px, py = pd.Series(x), pd.Series(y)
    mask = px.notna() & py.notna()
    want = px[mask].rank().corr(py[mask].rank())
    df = bl.DataFrame({"x": np.array(x), "y": np.array(y)})
    assert abs(df["x"].corr(df["y"], method="spearman") - want) < 1e-9
    other = bl.DataFrame({"y": np.array(y)})
    assert abs(df["x"].corr(other["y"], method="spearman") - want) < 1e-9


def test_str_match_fullmatch_removefix(bl):
    import numpy as np
    import pandas as pd
    vals = ["abc", "abcabc", "xabc", "ABC", "", "ab"]
    p = pd.Series(vals)
    b = bl.Series(np.array(vals, dtype=object))
    assert b.str.match("ab.").to_pandas().tolist() == \
        p.str.match("ab.").tolist()
    assert b.str.fullmatch("ab.").to_pandas().tolist() == \
        p.str.fullmatch("ab.").tolist()
    assert b.str.removeprefix("ab").to_pandas().tolist() == \
        p.str.removeprefix("ab").tolist()
    assert b.str.removesuffix("bc").to_pandas().tolist() == \
        p.str.removesuffix("bc").tolist()


def test_str_extract_matches_pandas(bl):
    """str.extract: capture groups -> columns, non-match -> NULL
    (rlike-gated — Spark's regexp_extract returns '' there), Python
    (?P<name>) named groups translated to the Java dialect."""
    import numpy as np
    import pandas as pd
    ps = pd.Series(["a1", "b22", "zz"])
    bs = bl.Series(np.array(["a1", "b22", "zz"], dtype=object))
    got = bs.str.extract(r"([a-z])(\d+)").to_pandas()
    want = ps.str.extract(r"([a-z])(\d+)")
    assert got.columns.tolist() == [str(c) for c in want.columns]
    assert got.fillna("-").values.tolist() == \
        want.fillna("-").values.tolist()
    assert bs.str.extract(r"(?P<ch>[a-z])").to_pandas() \
        .columns.tolist() == ["ch"]
    assert bs.str.extract(r"(\d+)", expand=False).to_pandas() \
        .fillna("-").tolist() == \
        ps.str.extract(r"(\d+)", expand=False).fillna("-").tolist()
    import pytest
    with pytest.raises(ValueError, match="capture"):
        bs.str.extract("abc")


def test_str_sweep_additions(bl):
    """casefold/center/findall/rfind/rsplit/partition/slice_replace/
    isdecimal/istitle/normalize — all JVM expressions except the
    Arrow-batched unicode normalize."""
    import numpy as np
    import pandas as pd
    vals = ["hello world foo", "a-b-c-d", "xyz", ""]
    p = pd.Series(vals)
    b = bl.Series(np.array(vals, dtype=object))
    assert b.str.center(7, "*").to_pandas().tolist() == \
        p.str.center(7, "*").tolist()
    assert [list(x) for x in b.str.findall(r"[a-z]+").to_pandas()] \
        == [list(x) for x in p.str.findall(r"[a-z]+")]
    assert b.str.rfind("o").to_pandas().tolist() == \
        p.str.rfind("o").tolist()
    assert list(b.str.rsplit("-", n=1).to_pandas()[1]) == \
        p.str.rsplit("-", n=1)[1]
    part = b.str.partition(" ").to_pandas()[0]
    assert (part["0"], part["1"], part["2"]) == \
        tuple(p.str.partition(" ").values.tolist()[0])
    assert b.str.slice_replace(1, 3, "XX").to_pandas().tolist() == \
        p.str.slice_replace(1, 3, "XX").tolist()
    assert bl.Series(np.array(["12", "a2"], dtype=object)) \
        .str.isdecimal().to_pandas().tolist() == [True, False]
    tv = ["Hello World", "hello", "HELLO", "Hello world", "123",
          "A", "Aa Bb", "a B"]
    assert bl.Series(np.array(tv, dtype=object)).str.istitle() \
        .to_pandas().tolist() == pd.Series(tv).str.istitle().tolist()
    import unicodedata
    assert bl.Series(np.array(["é"], dtype=object)) \
        .str.normalize("NFC").to_pandas().tolist() == \
        [unicodedata.normalize("NFC", "é")]


def test_str_join_translate_repeat(bl):
    """str.join over array columns (the .str guard admits
    array<string>), str.translate (native translate + one regex for
    deletions), Series.repeat (array_repeat + explode, source index
    labels repeat like pandas)."""
    import numpy as np
    import pandas as pd
    p = pd.Series(["a-b", "c"])
    b = bl.Series(np.array(["a-b", "c"], dtype=object))
    assert b.str.rsplit("-").str.join("+").to_pandas().tolist() == \
        p.str.rsplit("-").str.join("+").tolist()
    assert b.str.translate({"a": "X", "-": None}).to_pandas() \
        .tolist() == \
        p.str.translate(str.maketrans({"a": "X", "-": None})).tolist()
    rep = b.repeat(2).to_pandas()
    assert rep.tolist() == p.repeat(2).tolist()
    assert rep.index.tolist() == p.repeat(2).index.tolist()
    # repeats=0 DROPS rows (pandas), not one-NULL-row-per-input
    # (that's explode's empty-list contract, not repeat's)
    assert b.repeat(0).to_pandas().tolist() == p.repeat(0).tolist() == []
    assert b.repeat(1).to_pandas().tolist() == p.repeat(1).tolist()
    pn = pd.Series([1.0, np.nan])
    bn = bl.Series(np.array([1.0, np.nan]))
    assert bn.repeat(2).to_pandas().fillna(-1).tolist() == \
        pn.repeat(2).fillna(-1).tolist()


def test_r8_str_sweep(bl):
    """r8 dir(pd.Series.str) sweep closures: rpartition (last-sep
    3-struct; no-match = ('', '', whole); NULL stays NULL),
    index/rindex (find/rfind + eager ValueError on any miss),
    extractall (every match a row, (label, match) index, named
    groups), get_dummies (indicator columns off a collected label
    vocabulary), wrap (Arrow textwrap), encode/decode round trip."""
    import pandas as pd

    ps = pd.Series(["a-b-c", "x", None, "q-r"])
    s = bl.Series(ps.to_numpy(dtype=object))
    got = s.str.rpartition("-").to_pandas()
    want = ps.str.rpartition("-")
    for i in range(len(ps)):
        g = got.iloc[i]
        if g is None:
            assert want.iloc[i].isna().all()
        else:
            assert [g["0"], g["1"], g["2"]] == want.iloc[i].tolist()

    s2 = bl.Series(np.array(["abc", "zzc"], dtype=object))
    assert vals(s2.str.index("c")) == [2, 2]
    with pytest.raises(ValueError, match="not found"):
        s2.str.index("a")
    assert vals(s2.str.rindex("c")) == [2, 2]
    with pytest.raises(ValueError, match="not found"):
        s2.str.rindex("b")

    psx = pd.Series(["a1b2", "c3", "zz"])
    sx = bl.Series(psx.to_numpy(dtype=object))
    for pat in (r"([a-z])(\d)", r"(?P<key>[a-z])(?P<val>\d)"):
        got = sx.str.extractall(pat).to_pandas()
        want = psx.str.extractall(pat)
        # unnamed groups: engine columns are strings ('0','1') —
        # the extract() convention; pandas uses ints
        assert list(got.columns) == [str(c) for c in want.columns]
        assert got.values.tolist() == want.values.tolist()
        assert got.index.tolist() == want.index.tolist()

    pg = pd.Series(["a|b", "b", None, "a|c"])
    sg = bl.Series(pg.to_numpy(dtype=object))
    got = sg.str.get_dummies("|").to_pandas()
    want = pg.str.get_dummies("|")
    assert list(got.columns) == list(want.columns)
    assert got.values.tolist() == want.values.tolist()

    pw = pd.Series(["the quick brown fox jumps", None])
    sw = bl.Series(pw.to_numpy(dtype=object))
    assert vals(sw.str.wrap(10))[0] == pw.str.wrap(10).iloc[0]

    se = bl.Series(np.array(["héllo", "x"], dtype=object))
    assert vals(se.str.encode("utf-8").str.decode("utf-8")) == \
        ["héllo", "x"]


def test_str_contains_regex_default_r11(bl):
    """r11: str.contains is REGEX by default (pandas re.search
    semantics; previously the reference's literal-substring face,
    which silently diverged on metacharacter patterns).
    regex=False is the literal face; case=False case-folds; na=
    fills missing results. startswith/endswith gain na= too."""
    import numpy as np
    import pandas as pd
    s = bl.Series(np.array(["a.b", "acb", None], dtype=object))
    p = pd.Series(["a.b", "acb", None])

    def tri(x):
        return [None if v is None or v != v else bool(v)
                for v in x]

    for kw in ({}, {"regex": False}, {"case": False},
               {"na": False}, {"regex": False, "na": True}):
        assert tri(s.str.contains("a.b", **kw).to_pandas()) == \
            tri(p.str.contains("a.b", **kw)), kw
    assert tri(s.str.startswith("a", na=True).to_pandas()) == \
        tri(p.str.startswith("a", na=True))
    assert tri(s.str.endswith("b", na=False).to_pandas()) == \
        tri(p.str.endswith("b", na=False))
