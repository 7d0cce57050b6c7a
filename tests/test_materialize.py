"""spill_to_parquet lifecycle pins (round-10 verdict item #6).

The spill dirs must not accumulate for the process lifetime: the LRU
bound keeps at most _MAX_LIVE_SPILLS dirs live, eviction deletes the
OLDEST dir from disk, and the atexit sweep removes the remainder — so
two consecutive full-catalog runs leave the tempdir population flat.
"""

from __future__ import annotations

import glob
import os
import tempfile

from blow_spark import materialize as M


def test_spill_lru_bound_and_eviction(spark):
    base = spark.range(3).toDF("x")
    before = M.live_spill_count()
    first_paths = []
    # push well past the bound with tiny spills
    for i in range(8):
        old_bound = M._MAX_LIVE_SPILLS
        try:
            M._MAX_LIVE_SPILLS = 5
            df = M.spill_to_parquet(base, prefix="blow_spark_lru_test_")
            assert df.count() == 3
            if i == 0:
                # capture the first dir: it must be evicted later
                first_paths = [p for p in M._live_spills if "lru_test" in p]
        finally:
            M._MAX_LIVE_SPILLS = old_bound
    # bound held while the small bound was in force
    live_test_dirs = [p for p in M._live_spills if "lru_test" in p]
    assert len(live_test_dirs) <= 5
    # the first spill dir was evicted AND removed from disk
    for p in first_paths:
        assert p not in M._live_spills
        assert not os.path.exists(p)
    # surviving registered dirs really exist
    for p in live_test_dirs:
        assert os.path.isdir(p)
    # registry grew by at most the bound
    assert M.live_spill_count() - before <= 5


def test_spill_sweep_all_clears_disk(spark):
    base = spark.range(2).toDF("x")
    M.spill_to_parquet(base, prefix="blow_spark_sweep_test_")
    paths = [p for p in M._live_spills if "sweep_test" in p]
    assert paths and all(os.path.isdir(p) for p in paths)
    M._sweep_all()
    assert M.live_spill_count() == 0
    assert all(not os.path.exists(p) for p in paths)


def test_tempdir_population_flat_across_repeated_use(spark):
    """Two identical 'runs' leave the same number of spill dirs in the
    OS tempdir (the round-10 'two consecutive full-catalog runs' pin,
    scaled down: the property is the bound, not the catalog)."""
    base = spark.range(4).toDF("x")
    tmp = tempfile.gettempdir()

    def run(n):
        old = M._MAX_LIVE_SPILLS
        try:
            M._MAX_LIVE_SPILLS = 6
            for _ in range(n):
                M.spill_to_parquet(base, prefix="blow_spark_flat_test_")
        finally:
            M._MAX_LIVE_SPILLS = old
        return len(glob.glob(os.path.join(tmp, "blow_spark_flat_test_*")))

    after_first = run(10)
    after_second = run(10)
    assert after_first == after_second == 6
