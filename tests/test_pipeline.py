"""blow-parity pipeline surface: the semantic contracts of SURVEY.md §2.3
pinned as tests (flatMap multiplicity, filter-as-zero-emission, golden
fizzbuzz counts from FIXTURES.md F0)."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from blow_spark.pipeline import Pipeline, fizzbuzz_native, fizzbuzz_pipeline

GOLDEN = {"fizzbuzz": 667, "fizz": 2667, "buzz": 1333}
LITERAL = 5333


def _word_counts(rows):
    c = Counter(r["word"] for r in rows)
    named = {k: c[k] for k in GOLDEN}
    literal = sum(v for k, v in c.items() if k not in GOLDEN)
    return named, literal


def test_fizzbuzz_pipeline_golden(spark):
    """F0 golden: exactly 10,000 rows; class counts fizzbuzz=667,
    fizz=2667, buzz=1333, literal=5333 (cmd/fizzbuzz/fizzbuzz.go:21-46)."""
    rows = fizzbuzz_pipeline(spark).collect()
    assert len(rows) == 10_000
    named, literal = _word_counts(rows)
    assert named == GOLDEN and literal == LITERAL


def test_fizzbuzz_native_matches_pipeline(spark):
    """UDF path and Catalyst-native path agree row-for-row."""
    a = {(r["number"], r["word"]) for r in fizzbuzz_pipeline(spark, 2000).collect()}
    b = {(r["number"], r["word"]) for r in fizzbuzz_native(spark, 2000).collect()}
    assert a == b


def test_flat_map_multiplicity(spark):
    """SURVEY §2.3.1: a mapper may emit 0..N records per input."""

    def emit_n(row):
        for i in range(row.id % 3):  # 0, 1, or 2 emissions
            yield {"src": row.id, "copy": i}

    out = Pipeline.range_source(spark, 9).flat_map(emit_n, "src long, copy long").collect()
    # ids 0,3,6 emit 0; 1,4,7 emit 1; 2,5,8 emit 2 → total 9
    assert len(out) == 9
    assert {(r.src, r.copy) for r in out} == {
        (1, 0), (4, 0), (7, 0), (2, 0), (2, 1), (5, 0), (5, 1), (8, 0), (8, 1)
    }


def test_flat_map_as_filter(spark):
    """Zero-emission = filter (the reference expresses filters this way)."""

    def keep_even(row):
        if row.id % 2 == 0:
            yield {"id": row.id}

    out = Pipeline.range_source(spark, 100).flat_map(keep_even, "id long").collect()
    assert sorted(r.id for r in out) == list(range(0, 100, 2))


def test_flat_map_parallel_key_routing(spark):
    """MapLocalParallel contract: same-key records land in the same task
    (maps/maps.go:88-91). Observed via partition id equality per key."""

    def tag_partition(row):
        import os

        yield {"k": row.k, "pid": os.getpid()}

    src = spark.range(200).select((F.col("id") % 7).alias("k"))
    out = (
        Pipeline.from_dataframe(src)
        .flat_map_parallel(tag_partition, "k long, pid long", n=4, key_col="k")
        .collect()
    )
    by_key = {}
    for r in out:
        by_key.setdefault(r.k, set()).add(r.pid)
    # a key may share a worker with others, but never spans two
    assert all(len(pids) == 1 for pids in by_key.values())


def test_generator_source_and_sink(spark):
    p = Pipeline.generator_source(
        spark, [(i, f"r{i}") for i in range(50)], "id long, name string"
    )
    assert p.sink() == 50


def test_observe_metrics(spark):
    p = Pipeline.range_source(spark, 100).observe("m", F.count(F.lit(1)).alias("n"))
    assert p.sink() == 100


def test_udtf_multiplicity_contract(spark):
    """The UDTF path must honor flatMap multiplicity exactly: 0 rows for
    multiples of 7 (not 15), 2 rows for multiples of 15, else 1."""
    from collections import Counter

    from blow_spark.queries import queries

    rows = queries()["pipeline_fizzbuzz_udtf"](spark, "/root/testdata/sf0.001").collect()
    per_input = Counter(r.number for r in rows)
    assert per_input[15] == 2 and per_input[30] == 2
    assert 7 not in per_input and 49 not in per_input
    assert per_input[1] == 1 and per_input[3] == 1
    assert 105 in per_input and per_input[105] == 2  # 15 wins over 7


def test_cogroup_asof_matches_window_form(spark):
    """Three engine-side as-of implementations (range-join, union+window,
    cogroup merge_asof) must agree row-for-row."""
    from blow_spark.queries import queries

    sf = "/root/testdata/sf0.001"
    qs = queries()
    cg = {
        (r.event_id, r.last_click_ts)
        for r in qs["join_asof_cogroup"](spark, sf).collect()
    }
    uw = {
        (r.event_id, r.asof_ts)
        for r in qs["ops_asof_union_window"](spark, sf).collect()
    }
    assert cg == uw and cg
