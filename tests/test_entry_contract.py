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


def test_doc_query_counts_match_registry():
    """Round-5 advisor: README/SURVEY query counts drifted from the
    registry mid-round. Generate the check instead of hand-syncing:
    the 'N/N' in README's correctness-gate bullet and SURVEY's
    'N registered queries' line must equal len(all_queries())."""
    import os
    import re

    from ziggurat_spark.queries import all_queries

    n = len(all_queries())
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    readme = open(os.path.join(repo, "README.md")).read()
    m = re.search(r"(\d+)/\1 at sf0\.01 AND sf0\.001", readme)
    assert m, "README correctness-gate count line missing"
    assert int(m.group(1)) == n, (
        f"README says {m.group(1)} queries, registry has {n}"
    )
    survey = open(os.path.join(repo, "SURVEY.md")).read()
    m = re.search(r"\*\*Surface:\*\* (\d+) registered queries", survey)
    assert m, "SURVEY surface count line missing"
    assert int(m.group(1)) == n, (
        f"SURVEY says {m.group(1)} queries, registry has {n}"
    )
