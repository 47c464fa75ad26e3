from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from marketstream_etl_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("marketstream-tests", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark_prop(spark):
    """Alias fixture for hypothesis tests (function-scoped @given works with
    a session-scoped session)."""
    return spark
