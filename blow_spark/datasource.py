"""User-defined generator sources via the Spark 4 Python DataSource API.

This is the deepest parity point with the reference: blow's core
abstraction is a user-supplied ``Generator`` pushing records into the
engine (``maps/maps.go:8-10``, ``GeneratorSource`` :39-49), and its demo
source is ``FizzGenerator`` emitting 0..9999 (``cmd/fizzbuzz/
fizzbuzz.go:11-17``). Spark's idiomatic counterpart is a first-class
``DataSource``: the generator becomes a *planned, partitioned scan* —
Catalyst sees a schema, splits the range into N ``InputPartition``s
(parallel generation, vs the reference's single goroutine), and each
task materializes only its slice. The streaming variant exposes the
same generator as an offset-tracked micro-batch source (the unbounded
``Generator`` case: a blow generator that never returns ≙ a stream).

Scale: generation is embarrassingly parallel — partitions carry (start,
end) bounds only, no data moves until tasks run, and downstream
shuffles see an ordinary partitioned relation.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)


class RangeSlice(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class GeneratorSource(DataSource):
    """``format("blow_generator")``: emits ``n`` sequential longs as
    column ``n`` across ``partitions`` independent slices.

    Options: n (row count, default 10000), partitions (default 8).
    Batch and streaming (``rows_per_batch`` per micro-batch, default
    1000) readers share the same slicing."""

    @classmethod
    def name(cls) -> str:
        return "blow_generator"

    def schema(self) -> str:
        return "n BIGINT"

    def reader(self, schema) -> "GeneratorReader":
        return GeneratorReader(self.options)

    def streamReader(self, schema) -> "GeneratorStreamReader":
        return GeneratorStreamReader(self.options)


class GeneratorReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 10_000))
        self.num_parts = max(1, int(options.get("partitions", 8)))
        self.lo = 0
        self.hi = self.n  # exclusive

    def pushFilters(self, filters):
        """Range predicates on ``n`` prune GENERATION, not just output:
        Catalyst hands down the conjunction, the reader narrows [lo, hi),
        and pruned rows are never produced — the custom-source analog of
        parquet predicate pushdown. Fully-handled filters are absorbed
        (not yielded back), so Spark plans no redundant re-filter."""
        for f in filters:
            if getattr(f, "attribute", None) != ("n",) or not isinstance(
                getattr(f, "value", None), int
            ):
                yield f
                continue
            v = f.value
            if isinstance(f, GreaterThan):
                self.lo = max(self.lo, v + 1)
            elif isinstance(f, GreaterThanOrEqual):
                self.lo = max(self.lo, v)
            elif isinstance(f, LessThan):
                self.hi = min(self.hi, v)
            elif isinstance(f, LessThanOrEqual):
                self.hi = min(self.hi, v + 1)
            elif isinstance(f, EqualTo):
                self.lo, self.hi = max(self.lo, v), min(self.hi, v + 1)
            else:
                yield f

    def partitions(self):
        lo, hi = self.lo, max(self.lo, self.hi)
        count = hi - lo
        step = max(1, -(-count // self.num_parts))  # ceil
        return [RangeSlice(s, min(s + step, hi)) for s in range(lo, hi, step)] or [
            RangeSlice(0, 0)
        ]

    def read(self, partition: RangeSlice):
        for i in range(partition.start, partition.end):
            yield (i,)


class GeneratorStreamReader(DataSourceStreamReader):
    """The unbounded-generator case: offsets are plain row indices; each
    micro-batch advances the high-water mark by ``rows_per_batch`` until
    ``n`` rows have been emitted (an infinite stream would simply never
    cap).

    Exactly-once across restarts (round-2 advice fixed): a fresh reader's
    in-memory watermark restarts at 0 while the offset log may hold a
    committed index far ahead, and the naive form re-emitted committed
    rows once the watermark climbed back. The engine's observed restart
    protocol (instrumented against a real checkpointed restart) is:
    uncommitted WAL batches are REPLAYED via ``partitions(start, end)``
    BEFORE any ``latestOffset`` call, and a replayed slice must be
    produced faithfully — exactly-once for replays is the engine+sink's
    job (same batch id, idempotent sink commit), not the reader's. So
    the reader distinguishes the two cases by provenance of ``end``:

    * ``end`` ≤ the highest offset THIS instance returned from
      ``latestOffset`` → a batch this incarnation planned: clamp its
      floor to ``_floor`` (committed progress evidence), so a regressed
      batch emits nothing instead of duplicating.
    * ``end`` ahead of anything this instance returned → a previous
      incarnation's WAL entry being replayed: produce it exactly.

    ``_floor`` accumulates ends from ``commit`` plus any start/end the
    engine shows that outruns this instance's own offers — both are
    proof of prior progress — and ``latestOffset`` never returns less,
    so after the one self-healing empty batch the stream resumes at the
    committed index with no duplicate and no gap. Contract-pinned
    (simulated protocol + real engine restart) in
    tests/test_datasource.py."""

    def __init__(self, options):
        self.n = int(options.get("n", 10_000))
        self.rows_per_batch = int(options.get("rows_per_batch", 1_000))
        self._returned_max = 0  # highest offset offered by MY latestOffset
        self._floor = 0  # proven prior progress (commits + foreign WAL)

    def initialOffset(self):
        return {"index": 0}

    def latestOffset(self):
        # called once per micro-batch: advance the target watermark,
        # monotone and never below proven prior progress
        base = max(self._returned_max, self._floor)
        nxt = min(base + self.rows_per_batch, max(self.n, base))
        self._returned_max = nxt
        return {"index": nxt}

    def partitions(self, start, end):
        s, e = start["index"], end["index"]
        if s > self._returned_max:
            self._floor = max(self._floor, s)
        if e > self._returned_max:
            # previous incarnation's WAL batch: replay it faithfully
            self._floor = max(self._floor, e)
            lo, hi = s, e
        else:
            # a batch planned from this instance's own offers: clamp to
            # proven progress so a post-restart regression emits nothing
            lo = max(s, self._floor)
            hi = max(e, lo)
        return [RangeSlice(lo, hi)]

    def read(self, partition: RangeSlice):
        for i in range(partition.start, partition.end):
            yield (i,)

    def commit(self, end):
        self._floor = max(self._floor, end["index"])

    def stop(self):
        pass


# --------------------------------------------------------------------------
# The Sink() contract as a custom Python DataSource WRITER (V2 commit
# protocol) — the write-side twin of GeneratorSource. blow's Sink is a
# user-owned consumer draining the final channel (maps/maps.go:51-57, one
# goroutine, no delivery guarantee on crash); Spark's idiomatic
# counterpart is a planned write with task attempts, commit messages, and
# a job-level commit/abort decision on the driver.
# --------------------------------------------------------------------------


class _SinkCommit(WriterCommitMessage):
    def __init__(self, temp_path: str, rows: int):
        self.temp_path = temp_path
        self.rows = rows


class JsonDirSink(DataSource):
    """``format("blow_sink")``: writes rows as JSON-lines files under
    ``path`` with the V2 two-phase commit — each task writes a uniquely
    named temp file and returns it as a commit MESSAGE; only the driver,
    after every task succeeded, renames the temp files into place and
    stamps a manifest. A failed/straggler task attempt leaves an orphan
    temp no reader ever sees (readers trust the manifest), and job abort
    deletes the temps — the exactly-once file-sink discipline the
    reference's Sink goroutine lacks. Options: path (required)."""

    @classmethod
    def name(cls) -> str:
        return "blow_sink"

    def schema(self) -> str:  # pragma: no cover - writer-only source
        return "value STRING"

    def writer(self, schema, overwrite: bool) -> "JsonDirSinkWriter":
        return JsonDirSinkWriter(self.options, schema, overwrite)

    def streamWriter(self, schema, overwrite: bool) -> "JsonDirStreamSinkWriter":
        return JsonDirStreamSinkWriter(self.options, schema)


class JsonDirSinkWriter(DataSourceWriter):
    def __init__(self, options, schema, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("blow_sink requires option 'path'")
        self.fields = [f.name for f in schema.fields]
        self.overwrite = overwrite

    def write(self, iterator) -> _SinkCommit:
        """Executor-side: one temp JSONL file per task ATTEMPT (uuid name
        → retries never collide), fsync'd before the commit message is
        returned so a task counted successful has durable bytes."""
        import json
        import os
        import uuid

        os.makedirs(os.path.join(self.path, "_temp"), exist_ok=True)
        temp = os.path.join(self.path, "_temp", f"part-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(temp, "w") as f:
            for row in iterator:
                f.write(json.dumps(dict(zip(self.fields, row)), default=str) + "\n")
                n += 1
            f.flush()
            os.fsync(f.fileno())
        return _SinkCommit(temp, n)

    def commit(self, messages) -> None:
        """Driver-side, all tasks succeeded: publish exactly the files
        named by commit messages (orphan attempts stay in _temp, swept
        here), then stamp the manifest LAST — a crash mid-commit leaves
        no manifest, so readers see the old state, never a half-write."""
        import json
        import os
        import shutil

        if self.overwrite:
            for f in os.listdir(self.path):
                if f.startswith("part-"):
                    os.remove(os.path.join(self.path, f))
        published, total = [], 0
        for i, m in enumerate(messages):
            if m is None or m.rows == 0:
                continue
            final = os.path.join(self.path, f"part-{i:05d}.jsonl")
            os.replace(m.temp_path, final)
            published.append(os.path.basename(final))
            total += m.rows
        shutil.rmtree(os.path.join(self.path, "_temp"), ignore_errors=True)
        manifest = {"files": published, "rows": total}
        tmp_manifest = os.path.join(self.path, "_MANIFEST.tmp")
        with open(tmp_manifest, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp_manifest, os.path.join(self.path, "_MANIFEST"))

    def abort(self, messages) -> None:
        import shutil
        import os

        shutil.rmtree(os.path.join(self.path, "_temp"), ignore_errors=True)


class JsonDirStreamSinkWriter(DataSourceStreamWriter):
    """Streaming twin of JsonDirSinkWriter: same per-attempt temp files,
    but the job-level commit becomes a PER-MICROBATCH commit keyed by
    ``batchId`` — files publish as ``part-<batch>-<i>.jsonl`` under a
    ``_MANIFEST-<batch>`` stamped last, and a REPLAYED batch (restart
    after the engine committed its offsets but before/within our
    publish) is detected by its existing manifest and skipped, which is
    exactly the idempotent-sink half of Structured Streaming's
    exactly-once contract (offset log ∧ idempotent writes)."""

    def __init__(self, options, schema):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("blow_sink requires option 'path'")
        self.fields = [f.name for f in schema.fields]

    write = JsonDirSinkWriter.write  # same attempt-temp discipline

    def commit(self, messages, batchId: int) -> None:
        import json
        import os
        import shutil

        manifest_path = os.path.join(self.path, f"_MANIFEST-{batchId}")
        if os.path.exists(manifest_path):
            # replayed micro-batch: already published — idempotent no-op
            shutil.rmtree(os.path.join(self.path, "_temp"), ignore_errors=True)
            return
        published, total = [], 0
        for i, m in enumerate(messages):
            if m is None or m.rows == 0:
                continue
            final = os.path.join(self.path, f"part-{batchId:05d}-{i:05d}.jsonl")
            os.replace(m.temp_path, final)
            published.append(os.path.basename(final))
            total += m.rows
        shutil.rmtree(os.path.join(self.path, "_temp"), ignore_errors=True)
        tmp_manifest = manifest_path + ".tmp"
        with open(tmp_manifest, "w") as f:
            json.dump({"files": published, "rows": total, "batch": batchId}, f)
        os.replace(tmp_manifest, manifest_path)

    def abort(self, messages, batchId: int) -> None:
        import shutil
        import os

        shutil.rmtree(os.path.join(self.path, "_temp"), ignore_errors=True)


def read_sink_manifest(path: str) -> dict:
    """The reader side of the sink's commit protocol: only
    manifest-listed files exist as far as consumers are concerned."""
    import json
    import os

    with open(os.path.join(path, "_MANIFEST")) as f:
        return json.load(f)


def read_stream_sink_manifests(path: str) -> dict:
    """Union of all committed micro-batch manifests (streaming sink):
    {files: [...], rows: N, batches: [...]} — files from uncommitted or
    aborted batches are invisible, exactly like the batch manifest."""
    import glob
    import json
    import os

    files, rows, batches = [], 0, []
    for mp in sorted(glob.glob(os.path.join(path, "_MANIFEST-*"))):
        if mp.endswith(".tmp"):
            continue
        with open(mp) as f:
            m = json.load(f)
        files += m["files"]
        rows += m["rows"]
        batches.append(m["batch"])
    return {"files": files, "rows": rows, "batches": batches}


def register(spark) -> None:
    """Idempotently register the generator source with a session. The
    DataSource class cloudpickles by module reference, so the package is
    shipped to executor workers first (external drivers start outside
    the repo)."""
    from blow_spark.shipping import ensure_package_shipped

    ensure_package_shipped(spark)
    # Spark refuses a reader that implements pushFilters while the
    # feature flag is off (vanilla sessions default it off) — enable it
    # alongside registration; it is a runtime SQL conf.
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(GeneratorSource)
    spark.dataSource.register(JsonDirSink)
