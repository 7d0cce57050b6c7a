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


def test_stream_reader_restart_contract():
    """Offset-log restart protocol (round-2 advice): a fresh reader whose
    in-memory watermark restarted at 0 must never re-emit rows below the
    committed offset the engine hands back as `start`. The regressed
    batch plans EMPTY, the watermark snaps forward, and the remaining
    rows arrive exactly once."""
    opts = {"n": "10000", "rows_per_batch": "1000"}
    r = datasource.GeneratorStreamReader(opts)
    emitted, start = [], r.initialOffset()
    for _ in range(5):
        end = r.latestOffset()
        for p in r.partitions(start, end):
            emitted += list(range(p.start, p.end))
        r.commit(end)
        start = end
    assert emitted == list(range(5000))

    r2 = datasource.GeneratorStreamReader(opts)  # restart: state lost
    start, emitted2 = {"index": 5000}, []
    for _ in range(8):
        end = r2.latestOffset()
        for p in r2.partitions(start, end):
            emitted2 += list(range(p.start, p.end))
        r2.commit(end)
        start = end
    assert emitted2 == list(range(5000, 10000)), emitted2[:10]

    # restart with a pending UNCOMMITTED WAL batch: the engine replays it
    # via partitions(start, end) BEFORE any latestOffset call and the
    # reader must produce the slice faithfully (exactly-once for replays
    # belongs to the engine+sink, not the reader)
    r3 = datasource.GeneratorStreamReader(opts)
    replay = [
        (p.start, p.end)
        for p in r3.partitions({"index": 4000}, {"index": 5000})
    ]
    assert replay == [(4000, 5000)]
    r3.commit({"index": 5000})
    end = r3.latestOffset()
    nxt = [(p.start, p.end) for p in r3.partitions({"index": 5000}, end)]
    assert nxt == [(5000, 6000)], nxt  # resumes after the replay, no gap


def test_stream_generator_checkpoint_restart_exactly_once(spark, tmp_path):
    """Real checkpointed restart through the engine: stop the query after
    some batches committed, restart from the same checkpoint (a brand-new
    reader instance), and assert the file sink holds every row exactly
    once."""
    datasource.register(spark)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def start_query():
        return (
            spark.readStream.format("blow_generator")
            .option("n", 4000)
            .option("rows_per_batch", 1000)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="100 milliseconds")
            .start()
        )

    q = start_query()
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            try:
                if spark.read.parquet(out).count() >= 1000:
                    break
            except Exception:
                pass
            time.sleep(0.3)
    finally:
        q.stop()

    q2 = start_query()
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.read.parquet(out).count() >= 4000:
                break
            time.sleep(0.3)
    finally:
        q2.stop()
    got = [r["n"] for r in spark.read.parquet(out).collect()]
    assert sorted(got) == list(range(4000)), f"{len(got)} rows, {len(set(got))} distinct"


def test_custom_sink_v2_commit_protocol(spark, tmp_path):
    """The Sink() contract as a Python DataSource WRITER: rows land as
    JSONL via the two-phase commit — temp-per-attempt, driver publishes
    only committed files, manifest stamped last. Read-back must match
    exactly and the manifest must account for every row."""
    import json
    import os

    datasource.register(spark)
    out = str(tmp_path / "sink_out")
    os.makedirs(out, exist_ok=True)
    df = spark.range(1000).selectExpr("id AS n", "id * 2 AS v").repartition(4)
    df.write.format("blow_sink").option("path", out).mode("append").save()

    man = datasource.read_sink_manifest(out)
    assert man["rows"] == 1000
    rows = []
    for fname in man["files"]:
        with open(os.path.join(out, fname)) as f:
            rows += [json.loads(line) for line in f]
    assert sorted(r["n"] for r in rows) == list(range(1000))
    assert all(r["v"] == r["n"] * 2 for r in rows)
    assert not os.path.exists(os.path.join(out, "_temp"))  # swept on commit


def test_custom_sink_abort_leaves_no_published_files(tmp_path):
    """Driver-side abort path: written attempt temps are swept and no
    manifest appears — a failed job is invisible to readers."""
    import os

    from pyspark.sql import types as T

    out = str(tmp_path / "sink_abort")
    os.makedirs(out, exist_ok=True)
    schema = T.StructType([T.StructField("n", T.LongType())])
    w = datasource.JsonDirSinkWriter({"path": out}, schema, overwrite=False)
    msg = w.write(iter([(1,), (2,)]))
    assert os.path.exists(msg.temp_path)
    w.abort([msg])
    assert not os.path.exists(os.path.join(out, "_temp"))
    assert not os.path.exists(os.path.join(out, "_MANIFEST"))
    assert [f for f in os.listdir(out) if f.startswith("part-")] == []


def test_custom_stream_sink_exactly_once(spark, tmp_path):
    """Generator source → custom Python streaming SINK, end to end: every
    row lands exactly once across micro-batches, each batch publishes
    under its own manifest, and a replayed commit is an idempotent
    no-op."""
    import json
    import os

    datasource.register(spark)
    out = str(tmp_path / "stream_sink_out")
    os.makedirs(out, exist_ok=True)
    q = (
        spark.readStream.format("blow_generator")
        .option("n", 3000)
        .option("rows_per_batch", 1000)
        .load()
        .writeStream.format("blow_sink")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="100 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            man = datasource.read_stream_sink_manifests(out)
            if man["rows"] >= 3000:
                break
            time.sleep(0.3)
    finally:
        q.stop()
    man = datasource.read_stream_sink_manifests(out)
    assert man["rows"] == 3000 and len(man["batches"]) >= 3
    rows = []
    for fname in man["files"]:
        with open(os.path.join(out, fname)) as f:
            rows += [json.loads(line)["n"] for line in f]
    assert sorted(rows) == list(range(3000))  # exactly once

    # replayed-batch idempotence: re-committing an already-manifested
    # batch publishes nothing new
    from pyspark.sql import types as T

    schema = T.StructType([T.StructField("n", T.LongType())])
    w = datasource.JsonDirStreamSinkWriter({"path": out}, schema)
    msg = w.write(iter([(999999,)]))
    replay_batch = man["batches"][0]
    w.commit([msg], replay_batch)
    man2 = datasource.read_stream_sink_manifests(out)
    assert man2["rows"] == 3000 and sorted(man2["batches"]) == sorted(man["batches"])


def test_custom_sink_orphan_attempt_never_published(tmp_path):
    """Task-retry semantics of the commit protocol: a failed attempt's
    temp file (orphan) must never be published — the driver publishes
    ONLY files named by the commit messages of successful attempts, and
    sweeps the rest."""
    import os

    from pyspark.sql import types as T

    out = str(tmp_path / "sink_retry")
    os.makedirs(out, exist_ok=True)
    schema = T.StructType([T.StructField("n", T.LongType())])
    w = datasource.JsonDirSinkWriter({"path": out}, schema, overwrite=False)
    m0 = w.write(iter([(1,), (2,)]))  # attempt 0: "fails" after writing
    m1 = w.write(iter([(1,), (2,)]))  # attempt 1: succeeds
    assert m0.temp_path != m1.temp_path  # attempts never collide
    w.commit([m1])
    man = datasource.read_sink_manifest(out)
    assert man["rows"] == 2
    published = [f for f in os.listdir(out) if f.startswith("part-")]
    assert len(published) == 1  # the orphan was swept, not published
    assert not os.path.exists(os.path.join(out, "_temp"))
