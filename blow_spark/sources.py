"""Sources and sinks.

The reference's only source is an in-memory generator pushed into a channel
(``maps/maps.go:39-49``) and its only sink discards records
(``maps/maps.go:51-54``). Here sources are Spark's lazy scans — columnar,
predicate-pushdown-capable — and sinks are real writers. SURVEY.md §2.2
rows "Scans/sources" and "Sinks".
"""

from __future__ import annotations

import os
from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar parquet scan. Catalyst prunes columns / pushes predicates.

    ``events.ts`` has shipped as two physical types across fixture
    generations: TIMESTAMP(NANOS) (which Spark's vectorized reader
    rejects — read as a nanosecond long and truncated to microseconds
    with integer division; ``div`` not ``/`` because float division loses
    precision above 2^53) and plain TIMESTAMP(MICROS) (read natively,
    surfacing as TIMESTAMP_NTZ). Both normalize to session-zone
    TimestampType at µs precision, exactly what DuckDB yields for the
    same file, so oracle comparisons stay exact either way. The session
    time zone is pinned UTC before the NTZ→timestamp cast: on a vanilla
    (driver-contract) session the JVM-default zone would otherwise
    reinterpret wall times, and a DST gap/fold on a non-UTC host could
    shift values vs DuckDB's naive timestamps."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        df = spark.read.parquet(path)
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str, names: Iterable[str] = TPCH_TABLES) -> dict[str, DataFrame]:
    return {name: read_table(spark, sf_dir, name) for name in names}


def register_views(spark: SparkSession, sf_dir: str, names: Iterable[str] = TPCH_TABLES) -> None:
    """Expose the fixture tables to spark.sql(...) as temp views."""
    for name, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(name)


def range_source(spark: SparkSession, n: int, partitions: int | None = None) -> DataFrame:
    """Integer generator source — the analog of the reference's
    ``FizzGenerator`` (cmd/fizzbuzz/fizzbuzz.go:11-17), distributed."""
    return spark.range(0, n, numPartitions=partitions) if partitions else spark.range(0, n)


def read_csv(spark: SparkSession, path: str, schema: T.StructType | str | None = None, **options) -> DataFrame:
    opts = {"header": "true", **options}
    reader = spark.read.options(**opts)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.csv(path)


def read_json(spark: SparkSession, path: str, schema: T.StructType | str | None = None, **options) -> DataFrame:
    reader = spark.read.options(**options)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite", partition_by: list[str] | None = None) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", "true").csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)


def sink(df: DataFrame) -> int:
    """Terminal action that forces the pipeline to run to completion and
    discards results — semantic twin of the reference's ``Source.Sink()``
    (maps/maps.go:51-54), which drains the channel. Returns the row count
    (free observability the reference lacked)."""
    return df.count()


# --- JDBC (SURVEY.md §2.2 "Scans/sources": external RDBMS) ----------------


def jdbc_reader(
    spark: SparkSession,
    url: str,
    table: str,
    *,
    partition_column: str | None = None,
    lower_bound: int | str | None = None,
    upper_bound: int | str | None = None,
    num_partitions: int | None = None,
    fetch_size: int = 10_000,
    properties: dict[str, str] | None = None,
):
    """Configured JDBC DataFrameReader (not yet loaded).

    Scale posture: a bare JDBC read is ONE task hammering the database.
    ``partition_column`` + bounds + ``num_partitions`` split the scan
    into N range predicates executed as N parallel tasks — the only way
    a JDBC scan participates in a distributed plan. Catalyst pushes
    filters and column pruning through to the generated SQL.
    ``fetch_size`` batches the cursor (driver default is often 10 rows —
    pathological over a WAN). Split so tests can assert the contract
    without a database driver on the classpath; ``read_jdbc`` loads."""
    opts = jdbc_options(
        url,
        table,
        partition_column=partition_column,
        lower_bound=lower_bound,
        upper_bound=upper_bound,
        num_partitions=num_partitions,
        fetch_size=fetch_size,
        properties=properties,
    )
    return spark.read.format("jdbc").options(**opts)


def jdbc_options(
    url: str,
    table: str,
    *,
    partition_column: str | None = None,
    lower_bound: int | str | None = None,
    upper_bound: int | str | None = None,
    num_partitions: int | None = None,
    fetch_size: int = 10_000,
    properties: dict[str, str] | None = None,
) -> dict[str, str]:
    """The exact option map handed to Spark's JDBC relation provider —
    pure, so the connector contract is unit-testable without a driver."""
    opts = {"url": url, "dbtable": table, "fetchsize": str(fetch_size)}
    if partition_column is not None:
        if lower_bound is None or upper_bound is None or num_partitions is None:
            raise ValueError(
                "partition_column requires lower_bound, upper_bound and num_partitions"
            )
        opts.update(
            partitionColumn=partition_column,
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
            numPartitions=str(num_partitions),
        )
    opts.update(properties or {})
    return opts


def read_jdbc(spark: SparkSession, url: str, table: str, **kwargs) -> DataFrame:
    """Load a JDBC table (see ``jdbc_reader`` for the parallelism knobs).
    Requires the vendor driver jar on the classpath; raises Spark's
    driver-not-found error otherwise (import-gated in tests, like TWS)."""
    return jdbc_reader(spark, url, table, **kwargs).load()


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    batch_size: int = 10_000,
    properties: dict[str, str] | None = None,
) -> None:
    """JDBC sink: each task writes its partition over its own connection
    (N-way parallel INSERT), ``batchsize`` rows per round trip. Repartition
    upstream to control the connection count hitting the database."""
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batch_size))
        .mode(mode)
    )
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.save()


# --- Kafka (SURVEY.md §2.2 "Scans/sources" / "Streaming") ------------------


def kafka_reader(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: str,
    *,
    streaming: bool = True,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
    options: dict[str, str] | None = None,
):
    """Configured Kafka reader (not yet loaded): streaming (readStream)
    or batch (read — bounded offset-range scans for backfill).

    Scale posture: one Spark task per Kafka partition; throughput scales
    with topic partitioning, not executor count beyond it.
    ``max_offsets_per_trigger`` bounds each micro-batch (the streaming
    backpressure knob — the analog of the reference's cap-100 channel
    buffers, maps/maps.go:41). Split from load so the contract is
    testable without the kafka-sql connector jar."""
    opts = kafka_options(
        bootstrap_servers,
        topics,
        starting_offsets=starting_offsets,
        max_offsets_per_trigger=max_offsets_per_trigger,
        options=options,
    )
    base = spark.readStream if streaming else spark.read
    return base.format("kafka").options(**opts)


def kafka_options(
    bootstrap_servers: str,
    topics: str,
    *,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
    options: dict[str, str] | None = None,
) -> dict[str, str]:
    """The exact option map handed to the kafka source provider — pure,
    unit-testable without the connector jar."""
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topics,
        "startingOffsets": starting_offsets,
    }
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    opts.update(options or {})
    return opts


def read_kafka_stream(spark: SparkSession, bootstrap_servers: str, topics: str, **kwargs) -> DataFrame:
    """Kafka streaming source → (key, value, topic, partition, offset,
    timestamp) micro-batches. Requires the spark-sql-kafka connector on
    the classpath (absent in this container — gated in tests)."""
    return kafka_reader(spark, bootstrap_servers, topics, streaming=True, **kwargs).load()


def read_kafka_batch(spark: SparkSession, bootstrap_servers: str, topics: str, **kwargs) -> DataFrame:
    """Bounded Kafka scan (read, not readStream) — the backfill path."""
    return kafka_reader(spark, bootstrap_servers, topics, streaming=False, **kwargs).load()


def kafka_value_json(df: DataFrame, schema: T.StructType | str) -> DataFrame:
    """Decode Kafka's binary ``value`` as JSON into typed columns +
    (key, topic, partition, offset, ts) passthrough — the standard first
    projection after a Kafka scan."""
    from pyspark.sql import functions as F

    return df.select(
        F.col("key").cast("string").alias("key"),
        F.from_json(F.col("value").cast("string"), schema).alias("v"),
        "topic",
        "partition",
        "offset",
        F.col("timestamp").alias("kafka_ts"),
    ).select("key", "v.*", "topic", "partition", "offset", "kafka_ts")


# --- Avro wire format (connector-gated DataSource; codec is local) --------
#
# The Spark distribution on this box ships avro-1.12.1.jar (the codec
# library) but NOT spark-avro (the DataSource), and a live `--packages
# org.apache.spark:spark-avro_2.13:4.1.2` resolution was attempted in
# round 7 and failed with `Host repo1.maven.org not found` /
# `Host repos.spark-packages.org not found` (no network route to any
# Maven repo) — the same permanent env-gate as the Kafka connector.
# So, exactly like Kafka's wire-schema twin, the Avro BINARY ENCODING
# itself (the part a pipeline must get right regardless of which jar
# does the file I/O) is implemented here from the public Avro 1.12 spec
# (binary encoding: zigzag-varint longs, length-prefixed UTF-8 strings,
# record = concatenated field encodings in schema order) as
# Arrow-batched pandas UDFs, and `source_avro_shape_decode` gates the
# round trip against a DuckDB oracle that independently predicts byte
# lengths and the leading varint byte.


def _avro_zigzag_bytes(n: int) -> bytes:
    """Avro binary encoding of a long: zigzag then base-128 varint
    (Avro 1.12 spec, "Binary Encoding > Primitive Types")."""
    zz = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = zz & 0x7F
        zz >>= 7
        if zz:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _avro_read_long(buf: bytes, pos: int) -> tuple[int, int]:
    shift, acc = 0, 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not (b & 0x80):
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), pos


def avro_encode_long_string(df: DataFrame, long_col: str, str_col: str, out_col: str = "avro") -> DataFrame:
    """Encode (long, string) rows as Avro binary records (spec order:
    zigzag-varint long, then zigzag-varint byte length + UTF-8 bytes).
    Arrow-batched mapInPandas — per-batch Python, never per-row py4j.
    All input columns pass through; the record lands in ``out_col``."""
    from blow_spark.shipping import ensure_package_shipped

    ensure_package_shipped(df.sparkSession)
    passthrough = df.columns

    def _enc(batches):
        for pdf in batches:
            pdf[out_col] = [
                _avro_zigzag_bytes(int(n))
                + _avro_zigzag_bytes(len(str(s).encode("utf-8")))
                + str(s).encode("utf-8")
                for n, s in zip(pdf[long_col], pdf[str_col])
            ]
            yield pdf

    # NOTE: not df.schema.add(...) — StructType.add MUTATES the df's own
    # schema object, desyncing the Python-side column list from the JVM plan.
    schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.BinaryType())]
    )
    out = df.mapInPandas(_enc, schema=schema)
    return out.select(*passthrough, out_col)


def avro_decode_long_string(df: DataFrame, bin_col: str, long_name: str, str_name: str) -> DataFrame:
    """Inverse of avro_encode_long_string: parse the two-field Avro
    binary record back into typed columns (plus the record's byte length,
    so the oracle can pin the encoding size independently). Other input
    columns pass through."""
    from blow_spark.shipping import ensure_package_shipped

    ensure_package_shipped(df.sparkSession)
    keep = [c for c in df.columns if c != bin_col]

    def _dec(batches):
        for pdf in batches:
            ids, texts, lens = [], [], []
            for buf in pdf[bin_col]:
                buf = bytes(buf)
                n, pos = _avro_read_long(buf, 0)
                slen, pos = _avro_read_long(buf, pos)
                ids.append(n)
                texts.append(buf[pos : pos + slen].decode("utf-8"))
                lens.append(len(buf))
            out = pdf[keep].copy()
            out[long_name] = ids
            out[str_name] = texts
            out["avro_len"] = lens
            yield out

    schema = T.StructType(
        [f for f in df.schema.fields if f.name != bin_col]
        + [
            T.StructField(long_name, T.LongType()),
            T.StructField(str_name, T.StringType()),
            T.StructField("avro_len", T.IntegerType()),
        ]
    )
    return df.mapInPandas(_dec, schema=schema)


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Avro FILE scan — requires the spark-avro DataSource, which is not
    on this box's classpath and unreachable via --packages (no Maven
    route; see the live-attempt note above). Kept as the real front door
    so the call site is correct the moment the jar is present; the wire
    codec above is what `source_avro_shape_decode` certifies meanwhile."""
    return spark.read.format("avro").load(path)


# --- streaming sources (SURVEY.md §2.2 "Streaming") -----------------------


def stream_rate(spark: SparkSession, rows_per_second: int = 100) -> DataFrame:
    return spark.readStream.format("rate").option("rowsPerSecond", str(rows_per_second)).load()


def stream_parquet_dir(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """File-based streaming source: new parquet files in ``path`` become
    micro-batches. Schema must be supplied (no inference on streams)."""
    return spark.readStream.schema(schema).parquet(path)
