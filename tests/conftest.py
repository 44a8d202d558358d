from __future__ import annotations

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SF_SMALL = os.environ.get("ZS_TEST_SF", "/root/testdata/sf0.001")
SF_ORACLE = os.environ.get("ZS_ORACLE_SF", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    from ziggurat_spark.session import get_session

    s = get_session(app_name="ziggurat_spark_tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMALL


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: full-surface oracle sweep at sf0.01 (-m slow)"
    )


def pytest_collection_modifyitems(config, items):
    # slow tests run only when explicitly selected (-m slow)
    if config.getoption("-m"):
        return
    skip = pytest.mark.skip(reason="slow: run with -m slow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
