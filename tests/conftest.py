from __future__ import annotations

import os

import pytest

SF_SMALL = "/root/testdata/sf0.001"
SF_MEDIUM = "/root/testdata/sf0.01"

# Enforce materialize.checkpoint_small's ≤16k-row domain-bounded
# contract across every query the suite runs (round-14 verdict item #5:
# documented but unenforced — a data-proportional call site would
# serialize a stage at scale). The probe is limit-pushdown-bounded and
# only active under this flag, so production sessions pay nothing.
os.environ.setdefault("BLOW_SPARK_DEBUG_CHECKPOINT_SMALL", "1")


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
