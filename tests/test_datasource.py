"""Python DataSource generator (blow_spark.datasource): the reference's
Generator contract as a planned, partitioned Spark scan — batch and
streaming micro-batch readers."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from blow_spark import datasource


def test_batch_generator_values_and_partitioning(spark):
    datasource.register(spark)
    df = spark.read.format("blow_generator").option("n", 5000).option("partitions", 8).load()
    agg = df.agg(
        F.count("*").alias("cnt"), F.sum("n").alias("s"), F.min("n").alias("lo"), F.max("n").alias("hi")
    ).collect()[0]
    assert agg["cnt"] == 5000
    assert agg["s"] == 5000 * 4999 // 2
    assert (agg["lo"], agg["hi"]) == (0, 4999)
    # the generator is split into genuinely parallel slices
    assert df.rdd.getNumPartitions() == 8


def test_batch_generator_uneven_split(spark):
    datasource.register(spark)
    df = spark.read.format("blow_generator").option("n", 10).option("partitions", 3).load()
    assert sorted(r["n"] for r in df.collect()) == list(range(10))


def test_filter_pushdown_prunes_generation(spark):
    """Range predicates on n reach the reader and narrow generation: the
    reader object absorbs them and partitions() spans only the surviving
    interval (the custom-source analog of parquet pushdown)."""
    from pyspark.sql.datasource import EqualTo, GreaterThanOrEqual, LessThan

    r = datasource.GeneratorReader({"n": "1000", "partitions": "4"})
    leftover = list(r.pushFilters([GreaterThanOrEqual(("n",), 100), LessThan(("n",), 200)]))
    assert leftover == []  # both fully absorbed
    parts = r.partitions()
    assert min(p.start for p in parts) == 100
    assert max(p.end for p in parts) == 200
    assert sum(p.end - p.start for p in parts) == 100

    r2 = datasource.GeneratorReader({"n": "1000"})
    assert list(r2.pushFilters([EqualTo(("n",), 7)])) == []
    assert [(p.start, p.end) for p in r2.partitions()] == [(7, 8)]

    # end-to-end through Catalyst: values correct under a pushed filter
    datasource.register(spark)
    df = (
        spark.read.format("blow_generator")
        .option("n", 1000)
        .load()
        .filter("n >= 990 AND n < 995")
    )
    assert sorted(row["n"] for row in df.collect()) == [990, 991, 992, 993, 994]


def test_stream_generator_microbatches(spark):
    """The unbounded-generator path: micro-batches advance the offset by
    rows_per_batch; all n rows arrive exactly once."""
    datasource.register(spark)
    stream = (
        spark.readStream.format("blow_generator")
        .option("n", 3000)
        .option("rows_per_batch", 1000)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("gen_stream")
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            got = spark.sql("SELECT COUNT(*) AS c FROM gen_stream").collect()[0]["c"]
            if got >= 3000:
                break
            time.sleep(0.5)
        rows = spark.sql("SELECT n FROM gen_stream").collect()
        assert sorted(r["n"] for r in rows) == list(range(3000))  # exactly once
    finally:
        q.stop()
