"""Round-14 optimization pins.

Focused tests for optimization-round internals changes whose behavior
is not visible through the oracle compare alone:

- the scale-adaptive streaming state-partition rule (windows_streaming.
  _state_partitions): derived from staged input bytes, env-overridable,
  capped at the session's configured parallelism — so the local default
  shrinks state machinery without hard-coding a local[32] constant.
- _scaled_state_shuffle restores the session conf even when the drained
  query raises.
"""

from __future__ import annotations

import os

import pytest

from blow_spark.queries import windows_streaming as ws


class _FakeConf:
    def __init__(self, n):
        self._vals = {"spark.sql.shuffle.partitions": str(n)}

    def get(self, k):
        return self._vals[k]

    def set(self, k, v):
        self._vals[k] = str(v)


class _FakeSpark:
    def __init__(self, n):
        self.conf = _FakeConf(n)


def _dir_of_bytes(tmp_path, name, n_bytes):
    d = tmp_path / name
    d.mkdir()
    (d / "part-0.parquet").write_bytes(b"\0" * n_bytes)
    return str(d)


def test_state_partitions_floor_small_input(tmp_path):
    # a ~2 MB staged fixture needs the floor (4), not the session's 32:
    # state machinery is per-partition, compute still gets parallelism
    d = _dir_of_bytes(tmp_path, "small", 2 << 20)
    assert ws._state_partitions(_FakeSpark(32), d) == 4


def test_state_partitions_scales_with_bytes(tmp_path):
    # 40 MB at 4 MB/partition -> 10; growth is linear in staged volume
    d = _dir_of_bytes(tmp_path, "mid", 40 << 20)
    assert ws._state_partitions(_FakeSpark(32), d) == 10


def test_state_partitions_capped_at_session(tmp_path):
    # a deployment that set shuffle.partitions externally keeps its
    # shard count as the ceiling — the rule never EXCEEDS the session
    d = _dir_of_bytes(tmp_path, "big", 1 << 30)
    assert ws._state_partitions(_FakeSpark(16), d) == 16


def test_state_partitions_sums_multiple_dirs(tmp_path):
    a = _dir_of_bytes(tmp_path, "a", 20 << 20)
    b = _dir_of_bytes(tmp_path, "b", 20 << 20)
    assert ws._state_partitions(_FakeSpark(64), (a, b)) == 10


def test_state_partitions_env_override(tmp_path, monkeypatch):
    monkeypatch.setenv("BLOW_SPARK_STREAM_STATE_PARTITIONS", "7")
    d = _dir_of_bytes(tmp_path, "any", 1 << 20)
    assert ws._state_partitions(_FakeSpark(32), d) == 7


def test_scaled_state_shuffle_restores_on_error(tmp_path):
    spark = _FakeSpark(32)
    d = _dir_of_bytes(tmp_path, "x", 1 << 20)
    with pytest.raises(RuntimeError):
        with ws._scaled_state_shuffle(spark, d):
            assert spark.conf.get("spark.sql.shuffle.partitions") == "4"
            raise RuntimeError("boom")
    assert spark.conf.get("spark.sql.shuffle.partitions") == "32"


# ---------------------------------------------------------------------------
# Batch 4: _spread's scan-parallelism estimate charges openCostInBytes
# (Spark packs tiny files into splits, so N small files ≠ N tasks) and
# the spilled verify-candidate scan is spread before the verify joins.
# ---------------------------------------------------------------------------


def test_spread_repartitions_many_tiny_files(spark, tmp_path):
    # 8 tiny parquet files: the pre-r14 estimate max(n_files, bytes/max_pb)
    # called this 8-wide and no-oped; Spark's openCost packing actually
    # scans it as ~1 task. _spread must now spread it.
    from blow_spark.dedup import _spread

    path = str(tmp_path / "tiny8")
    spark.range(0, 800).repartition(8).write.mode("overwrite").parquet(path)
    scan = spark.read.parquet(path)
    out = _spread(scan)
    assert (
        out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    ), "many-tiny-files scan was not spread to default parallelism"


def test_spread_noops_when_scan_already_wide(spark, tmp_path):
    # With maxPartitionBytes tiny and openCost zero, the SAME dir is
    # estimated as >= target splits — _spread must return the input
    # unchanged (no repartition barrier on already-wide inputs).
    from blow_spark.dedup import _spread

    path = str(tmp_path / "wide")
    spark.range(0, 20000).repartition(4).write.mode("overwrite").parquet(path)
    old_mpb = spark.conf.get("spark.sql.files.maxPartitionBytes")
    old_oc = spark.conf.get("spark.sql.files.openCostInBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", "1024b")
        spark.conf.set("spark.sql.files.openCostInBytes", "0b")
        scan = spark.read.parquet(path)
        assert _spread(scan) is scan
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old_mpb)
        spark.conf.set("spark.sql.files.openCostInBytes", old_oc)
