"""Driver-contract guard: every queries() entry must build and
analyze; a sample fully executes; oracle keys must match query keys.

Full value-vs-oracle checking lives in tools/check_oracle.py (run
explicitly); this test keeps `pytest tests/` sufficient to catch
contract breakage (unresolved columns, bad schemas, missing keys).
"""

import pytest

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
           "/root/testdata/sf0.1"]
SF = SF_DIRS[0]


@pytest.fixture(scope="module")
def entry():
    import __spark_entry__ as e
    return e


# FIRST in the file on purpose: analysis-only (no execution), so a
# testdata regeneration that changes any table's physical schema fails
# in seconds against EVERY sf directory — before the driver runs.
# (VERDICT r2: an events.parquet dtype change silently killed 6 slots
# plus the whole bench; this is the guard against that class.)
@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_every_query_analyzes(spark, entry, sf_dir):
    failures = []
    for name, fn in entry.queries().items():
        try:
            df = fn(spark, sf_dir)
            _ = df.schema  # forces analysis: resolution + type checks
        except Exception as exc:  # noqa: BLE001 - collecting all failures
            failures.append(f"{name}: {str(exc).splitlines()[0][:150]}")
    assert not failures, "\n".join(failures)


def test_entry_returns_rows(spark, entry):
    df = entry.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert len(df.schema.fields) >= 3


def test_oracle_keys_subset_of_queries(entry):
    qs = set(entry.queries())
    os_ = set(entry.oracle_sql())
    assert os_ <= qs, f"oracles without queries: {sorted(os_ - qs)}"
    # every driver slot carries a value oracle — none are rows-only
    assert qs - os_ == set()


@pytest.mark.parametrize("name", [
    "q1_pricing_summary", "merge_inner_left", "events_sessions",
    "dedup_exact", "embedding_topk", "grouped_zscore",
])
def test_sample_queries_execute(spark, entry, name):
    df = entry.queries()[name](spark, SF)
    assert df.count() > 0


def test_all_queries_inside_driver_window(entry):
    # the driver's correctness gate records only the FIRST 50 entries
    # of queries(): every implemented family must sit inside that
    # window to keep a hard correctness signal each round. The set is
    # exactly 50 — adding a 51st family means folding two existing
    # slots together first (the r2 prod/astype pattern).
    keys = list(entry.queries())
    assert len(keys) == 50
    assert keys[49] == "doc_pipeline_stats"  # window boundary pinned
