from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")  # keep test JVM small & fast

from ficaria_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "gate: full Spark-vs-DuckDB oracle gate at sf0.001 (~3.5 min; "
        "deselect with -m 'not gate' for a fast loop)")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("ficaria-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
