"""Math / UDF surface tests (reference tests/core/test_functions.py)."""

import numpy as np
import pytest


@pytest.fixture
def sr(bl):
    return bl.Series(np.array([0.1, 0.5, 1.0, 2.0], dtype=np.float64), name="x")


def test_unary_math(bl, sr):
    x = np.array([0.1, 0.5, 1.0, 2.0])
    for name in ["exp", "log", "sqrt", "sin", "cos", "tan", "sinh", "cosh", "tanh"]:
        got = getattr(bl, name)(sr).to_pandas().to_numpy()
        np.testing.assert_allclose(got, getattr(np, name)(x), rtol=1e-12)
    for name in ["asin", "acos", "atan"]:
        small = bl.Series(np.array([0.1, 0.5, 0.9]))
        got = getattr(bl, name)(small).to_pandas().to_numpy()
        np.testing.assert_allclose(got, getattr(np, "arc" + name[1:])(np.array([0.1, 0.5, 0.9])), rtol=1e-12)


def test_erf(bl, sr):
    import math
    got = bl.erf(sr).to_pandas().to_numpy()
    want = np.array([math.erf(v) for v in [0.1, 0.5, 1.0, 2.0]])
    np.testing.assert_allclose(got, want, atol=2e-7)


def test_raw_decorator(bl, sr):
    clip = bl.raw(lambda a: np.clip(a, 0.4, 1.5))
    assert clip(sr).to_pandas().tolist() == [0.4, 0.5, 1.0, 1.5]


def test_sort_function(bl):
    sr = bl.Series(np.array([3.0, 1.0, 2.0]))
    assert bl.sort(sr).to_pandas().tolist() == [1.0, 2.0, 3.0]
    assert bl.sort(sr, ascending=False).to_pandas().tolist() == [3.0, 2.0, 1.0]


def test_apply_expr_template_with_mapping(sr):
    out = sr.apply("{self} * {k} + {b}", mapping={"k": 2, "b": 1})
    assert out.to_pandas().tolist() == [1.2, 2.0, 3.0, 5.0]


def test_load_cudf(bl, tmp_path):
    # mirrors /root/reference/tests/core/test_series.py:277-288
    # (test_cudf: udf_add over vec[i64] with a +2 scalar); compiled
    # here instead of a checked-in .so
    import shutil
    import subprocess
    cc = shutil.which("cc") or shutil.which("gcc")
    if cc is None:
        pytest.skip("no C compiler in environment")
    src = tmp_path / "udf_c.c"
    src.write_text(
        "#include <stdint.h>\n"
        "void udf_add(const int64_t* in, int64_t n, int64_t* out,"
        " int64_t scalar) {\n"
        "  for (int64_t i = 0; i < n; i++) out[i] = in[i] + scalar;\n"
        "}\n")
    so = tmp_path / "udf_c.so"
    subprocess.run([cc, "-shared", "-fPIC", "-O2", "-o", str(so), str(src)],
                   check=True)
    udf_add = bl.load_cudf(str(so), "udf_add")
    sr = bl.Series(np.arange(1, 6, dtype=np.int64))
    out = sr.apply(udf_add, scalar=2).to_pandas().tolist()
    assert out == [3, 4, 5, 6, 7]


def test_load_cudf_plain_dlopen(bl, tmp_path):
    # reference behavior without func_name: just dlopen (RTLD_GLOBAL)
    import ctypes
    import shutil
    import subprocess
    cc = shutil.which("cc") or shutil.which("gcc")
    if cc is None:
        pytest.skip("no C compiler in environment")
    src = tmp_path / "noop.c"
    src.write_text("int baloo_noop(void) { return 42; }\n")
    so = tmp_path / "noop.so"
    subprocess.run([cc, "-shared", "-fPIC", "-o", str(so), str(src)],
                   check=True)
    handle = bl.load_cudf(str(so))
    assert isinstance(handle, ctypes.CDLL)
    assert handle.baloo_noop() == 42
