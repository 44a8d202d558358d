"""The correctness gate, run locally: every registered query must
match its DuckDB oracle at sf0.001 (the driver repeats this at
sf0.01 — ziggurat_spark.oracle run_all covers that manually)."""

from __future__ import annotations

import pytest

from ziggurat_spark.oracle import check_query, duck_connection
from ziggurat_spark.queries import all_queries

from conftest import SF_SMALL

NAMES = sorted(all_queries())


@pytest.fixture(scope="module")
def duck():
    return duck_connection(SF_SMALL)


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(spark, duck, name):
    res = check_query(spark, duck, name, SF_SMALL)
    assert res.ok, f"{name}: {res.detail}"
