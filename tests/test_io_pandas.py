"""IO + pandas interop tests (reference tests/io/test_csv.py and
tests/core/test_pandas.py)."""

import numpy as np
import pandas as pd
import pytest


def test_csv_round_trip(bl, tmp_path):
    # T7 golden round-trip (tests/io/test_csv.py:13-32)
    df = bl.DataFrame({"a": np.array([0, 1, 2], dtype=np.int64),
                       "b": np.array([1.0, 2.0, 3.0])})
    path = str(tmp_path / "out.csv")
    df.to_csv(path, index=False)
    back = bl.read_csv(path)
    pdf = back.to_pandas().sort_values("a").reset_index(drop=True)
    assert pdf["a"].tolist() == [0, 1, 2]
    assert pdf["b"].tolist() == [1.0, 2.0, 3.0]


def test_reference_golden_csv(bl, tmp_path):
    """Read the reference's checked-in golden fixture
    (/root/reference/tests/io/files/df1.csv, exercised by its
    tests/io/test_csv.py:13-32): unnamed index column, int + float
    columns — pins separator/header/dtype-inference parity against
    the actual reference file, then round-trips it through to_csv."""
    import os
    golden = "/root/reference/tests/io/files/df1.csv"
    if not os.path.exists(golden):
        pytest.skip("reference fixture not available")
    df = bl.read_csv(golden)
    pdf = df.to_pandas().sort_values("Unnamed: 0").reset_index(drop=True)
    # same frame pandas sees (the reference's expected `df1`)
    exp = pd.read_csv(golden)
    assert list(pdf.columns) == list(exp.columns) == ["Unnamed: 0", "a", "b"]
    assert pdf["Unnamed: 0"].tolist() == [2, 3, 4, 5, 6]
    assert pdf["a"].tolist() == exp["a"].tolist()
    assert pdf["b"].tolist() == exp["b"].tolist()
    assert str(pdf["b"].dtype) == "float64"  # 1.0 stays float, not int
    # reference test_to_csv: write then re-read equals the original
    out = str(tmp_path / "df1_test.csv")
    df.set_index("Unnamed: 0").to_csv(out)
    back = bl.read_csv(out).to_pandas().sort_values("Unnamed: 0") \
        .reset_index(drop=True)
    assert back["a"].tolist() == exp["a"].tolist()
    assert back["b"].tolist() == exp["b"].tolist()


def test_csv_usecols_nrows(bl, tmp_path):
    df = bl.DataFrame({"a": np.arange(10, dtype=np.int64),
                       "b": np.arange(10, dtype=np.float64),
                       "c": np.array([str(i) for i in range(10)])})
    path = str(tmp_path / "u.csv")
    df.to_csv(path, index=False)
    back = bl.read_csv(path, usecols=["a", "c"], nrows=4)
    assert back.columns == ["a", "c"]
    assert len(back) == 4


def test_parquet_round_trip(bl, tmp_path):
    df = bl.DataFrame({"k": np.array([1, 2, 3], dtype=np.int64),
                       "v": np.array(["x", "y", "z"])})
    path = str(tmp_path / "t.parquet")
    df.to_parquet(path)
    back = bl.read_parquet(path)
    got = back.to_pandas().sort_values("k")
    assert got["v"].tolist() == ["x", "y", "z"]


def test_from_to_pandas_round_trip(bl):
    pdf = pd.DataFrame({"x": [1.5, 2.5], "y": ["a", "b"]})
    df = bl.DataFrame.from_pandas(pdf)
    back = df.to_pandas()
    assert back["x"].tolist() == [1.5, 2.5]
    assert back["y"].tolist() == ["a", "b"]


def test_series_pandas_round_trip(bl):
    ps = pd.Series([3.0, 1.0, 2.0], name="v", index=[10, 11, 12])
    sr = bl.Series(ps)
    back = sr.to_pandas()
    assert back.tolist() == [3.0, 1.0, 2.0]
    assert back.index.tolist() == [10, 11, 12]
    assert back.name == "v"


def test_multiindex_groupby_to_pandas(bl, df_dupl):
    out = df_dupl.groupby(["a", "b"]).sum().to_pandas()
    assert isinstance(out.index, pd.MultiIndex)
    assert out.index.names == ["a", "b"]


def test_sentinel_codec(spark, bl):
    # compat codec: NULL <-> reference sentinels (encoders.py:101-133)
    from baloo_spark.core.dtypes import decode_sentinels, encode_sentinels
    sdf = spark.createDataFrame(
        [(1, None, None), (2, 5.0, "x")], "id LONG, v DOUBLE, s STRING")
    enc = encode_sentinels(sdf).collect()
    by_id = {r["id"]: r for r in enc}
    assert by_id[1]["v"] == -999.0 and by_id[1]["s"] == "None"
    dec = decode_sentinels(encode_sentinels(sdf)).collect()
    by_id = {r["id"]: r for r in dec}
    assert by_id[1]["v"] is None and by_id[1]["s"] is None
    assert by_id[2]["v"] == 5.0


def test_csv_roundtrip_hostile_content(bl, tmp_path):
    """r5 probe: embedded separators, RFC-doubled quotes, quoted
    newlines (multiline=True), trailing whitespace, and NULL must
    survive BOTH to_csv faces. Spark's reader default is
    backslash-escape, which silently mangles RFC quote-doubling —
    the reader now pins escape='\"'."""
    import numpy as np
    vals = ["plain", "with,comma", 'with "quotes"', "multi\nline",
            "trail space ", None]
    df = bl.DataFrame({"i": np.array(range(len(vals)), dtype=np.int64),
                       "s": np.array(vals, dtype=object)})

    def back(path, **kw):
        got = bl.read_csv(path, multiline=True, **kw) \
            .to_pandas().sort_values("i")["s"]
        return [None if (isinstance(x, float) and x != x) else x
                for x in got]

    p1 = str(tmp_path / "single.csv")
    df.to_csv(p1)
    assert back(p1) == vals
    p2 = str(tmp_path / "dist")
    df.to_csv(p2, single_file=False)
    assert back(p2) == vals


def test_read_csv_comment_na_values(bl, tmp_path):
    """comment= (reader option) and na_values= (single -> nullValue
    option; list -> post-read projection over string columns)."""
    p = tmp_path / "t.csv"
    p.write_text("a,b\n# skip me\n1,x\n2,NA\n3,none\n")
    df = bl.read_csv(str(p), comment="#", na_values=["NA", "none"])
    got = df.to_pandas()
    assert got["a"].tolist() == [1, 2, 3]
    assert got["b"].fillna("-").tolist() == ["x", "-", "-"]
    df2 = bl.read_csv(str(p), comment="#", na_values="NA")
    assert df2.to_pandas()["b"].fillna("-").tolist() == \
        ["x", "-", "none"]
    # a NUMERIC column inferred as string only because it held a list
    # sentinel comes back numeric after null-out (pandas re-parses)
    p2 = tmp_path / "t2.csv"
    p2.write_text("a,b,c\n1,x,1.5\nMISSING,MISSING,2.5\n3,y,MISSING\n")
    got = bl.read_csv(str(p2), na_values=["MISSING"]).to_pandas()
    want = pd.read_csv(str(p2), na_values=["MISSING"])
    assert [str(t) for t in got.dtypes] == [str(t) for t in want.dtypes]
    assert got["a"].fillna(-9).tolist() == want["a"].fillna(-9).tolist()
    assert got["c"].fillna(-9).tolist() == want["c"].fillna(-9).tolist()
    # a column consisting ENTIRELY of sentinels comes back as an
    # all-NaN float64 column like pandas, not an all-NULL string one
    p3 = tmp_path / "t3.csv"
    p3.write_text("a,b\n1,NA\n2,NA\n")
    got = bl.read_csv(str(p3), na_values=["NA"]).to_pandas()
    want = pd.read_csv(str(p3), na_values=["NA"])
    # (column "a" dtype is Spark's inference — int32 where pandas
    # says int64, the documented reader divergence; "b" is the fix)
    assert str(got["b"].dtype) == str(want["b"].dtype) == "float64"
    assert got["b"].isna().all() and want["b"].isna().all()
