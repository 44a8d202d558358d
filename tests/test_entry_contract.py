"""Driver-contract smoke tests for __spark_entry__.py."""

from __future__ import annotations

import __spark_entry__ as entry_mod


def test_entry_runs(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert set(df.columns) == {
        "outcome",
        "n",
        "sum_k",
        "min_backoff_ms",
        "max_backoff_ms",
    }


def test_queries_and_oracles_align():
    qs = entry_mod.queries()
    os_ = entry_mod.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 38
    # every oracle is a non-empty SQL string
    assert all(isinstance(v, str) and "SELECT" in v.upper() for v in os_.values())
