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
    same file, so oracle comparisons stay exact either way."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
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


# --- streaming sources (SURVEY.md §2.2 "Streaming") -----------------------


def stream_rate(spark: SparkSession, rows_per_second: int = 100) -> DataFrame:
    return spark.readStream.format("rate").option("rowsPerSecond", str(rows_per_second)).load()


def stream_parquet_dir(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """File-based streaming source: new parquet files in ``path`` become
    micro-batches. Schema must be supplied (no inference on streams)."""
    return spark.readStream.schema(schema).parquet(path)
