from __future__ import annotations

import os

import pytest

SF_SMALL = "/root/testdata/sf0.001"
SF_MEDIUM = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from blow_spark import get_spark

    cpus = min(8, os.cpu_count() or 8)
    s = get_spark(app_name="blow_spark_tests", master=f"local[{cpus}]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return os.environ.get("BLOW_SPARK_TEST_SF_DIR", SF_SMALL)
