"""Executable doctests on the public core surface.

The reference runs every public docstring's doctests in CI
(/root/reference/.travis.yml:16, e.g. series.py:32-70,
frame.py:33-123); this is the analogue — the Examples blocks in the
DataFrame/Series/index docstrings actually execute, so API drift in
the documented surface fails the build.
"""

import doctest

FLAGS = doctest.NORMALIZE_WHITESPACE | doctest.ELLIPSIS


def _run(mod):
    res = doctest.testmod(mod, optionflags=FLAGS, verbose=False)
    assert res.attempted > 0, f"no doctests collected from {mod.__name__}"
    assert res.failed == 0, f"{res.failed} doctest failures in {mod.__name__}"


def test_frame_doctests(bl):
    import baloo_spark.core.frame as mod
    _run(mod)


def test_series_doctests(bl):
    import baloo_spark.core.series as mod
    _run(mod)


def test_indexes_doctests(bl):
    import baloo_spark.core.indexes as mod
    _run(mod)
