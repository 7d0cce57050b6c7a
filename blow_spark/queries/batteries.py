"""Scalar/aggregate function batteries, round 2: boolean aggregates,
regexp functions, array set algebra.

Fills SURVEY.md §2.2 "Scalar functions" / "Aggregations" corners not yet
covered by the earlier batteries (scalar_string_funcs*, array_funcs,
higher_order_array_funcs): FILTER-style conditional counting, BOOL_AND /
BOOL_OR, regexp_count / regexp_extract_all, and set algebra over arrays
(union / intersect / except / position), each oracle-paired with DuckDB.

The reference has none of these as operators (its only scalar computation
is the fizzbuzz mapper's modulo tests, cmd/fizzbuzz/fizzbuzz.go:24-45);
they are first-class here per the §2.2 checklist.

Determinism notes (see queries/__init__ docstring for the house rules):
booleans leave the engine as BIGINT 0/1 (pandas bool vs object dtype
drift), counts as BIGINT, and every array is sorted before emission so
engine-specific element order can't perturb the value hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from blow_spark.materialize import scratch_dir as _scratch_dir
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from blow_spark.queries import register
from blow_spark.sources import read_table


@register(
    "agg_boolean_counting",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) FILTER (WHERE o_totalprice > 150000) AS BIGINT) AS n_big,
           CAST(BOOL_AND(o_totalprice > 0) AS BIGINT)                    AS all_positive,
           CAST(BOOL_OR(o_orderstatus = 'F') AS BIGINT)                  AS any_finished,
           CAST(COUNT(*) FILTER (WHERE o_orderdate >= TIMESTAMP '1995-01-01')
                AS BIGINT)                                               AS n_since_95,
           COUNT(*)                                                      AS n_rows
    FROM orders
    GROUP BY o_orderpriority
    """,
    tags=("agg", "boolean"),
)
def agg_boolean_counting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional counting + boolean aggregates (count_if / bool_and /
    bool_or — SQL's COUNT(*) FILTER and EVERY/ANY). All codegen'd JVM
    aggregates with map-side partials: one shuffle keyed by the (5-value)
    group key regardless of input size."""
    o = read_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count_if(F.col("o_totalprice") > 150000).alias("n_big"),
        F.bool_and(F.col("o_totalprice") > 0).cast("bigint").alias("all_positive"),
        F.bool_or(F.col("o_orderstatus") == "F").cast("bigint").alias("any_finished"),
        F.count_if(F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp")).alias(
            "n_since_95"
        ),
        F.count("*").alias("n_rows"),
    )


@register(
    "scalar_regexp_funcs",
    oracle=r"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+')) AS BIGINT)  AS n_word_matches,
           COALESCE(regexp_extract(text, '([0-9]+)', 1), '')           AS first_number,
           CAST(LENGTH(regexp_replace(text, '[aeiou]', '', 'g')) AS BIGINT)
                                                                       AS len_devoweled,
           array_to_string(regexp_extract_all(text, '[A-Za-z]+')[1:5], '|')
                                                                       AS head_words
    FROM documents
    """,
    tags=("scalar", "regexp"),
)
def scalar_regexp_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp battery: match counting (regexp_count), group extraction
    (regexp_extract), global substitution (regexp_replace), and
    extract-all → array. Patterns stick to character classes + capture
    groups — the portable core where Java regex (Spark) and RE2 (DuckDB
    oracle) provably agree."""
    d = read_table(spark, sf_dir, "documents")
    words = F.regexp_extract_all(F.col("text"), F.lit("[A-Za-z]+"), 0)
    return d.select(
        "doc_id",
        F.regexp_count("text", F.lit("[A-Za-z]+")).cast("bigint").alias("n_word_matches"),
        F.regexp_extract("text", "([0-9]+)", 1).alias("first_number"),
        F.length(F.regexp_replace("text", "[aeiou]", "")).cast("bigint").alias("len_devoweled"),
        F.concat_ws("|", F.slice(words, 1, 5)).alias("head_words"),
    )


@register(
    "array_set_algebra",
    oracle="""
    WITH t AS (
      SELECT l_orderkey, l_linenumber,
             generate_series(1, 1 + l_orderkey % 5)                     AS a1,
             generate_series(CAST(l_partkey % 4 AS BIGINT) + 1,
                             CAST(l_partkey % 4 AS BIGINT) + 4)         AS a2
      FROM lineitem
    )
    SELECT l_orderkey, l_linenumber,
           COALESCE(array_to_string(list_sort(list_distinct(list_concat(a1, a2))), ','), '')             AS union_csv,
           COALESCE(array_to_string(list_sort(list_intersect(a1, a2)), ','), '')                         AS intersect_csv,
           COALESCE(array_to_string(list_sort(list_filter(a1, x -> NOT list_contains(a2, x))), ','), '') AS except_csv,
           CAST(list_contains(a1, 3) AS BIGINT)                         AS has_three,
           CAST(COALESCE(list_position(a1, CAST(l_linenumber AS BIGINT)), 0)
                AS BIGINT)                                              AS pos_linenumber
    FROM t
    """,
    tags=("array", "set"),
)
def array_set_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set algebra (union / intersect / except / contains /
    position) over sequences derived from lineitem keys. Arrays are
    sorted, then serialized to CSV strings: the driver's canonicalizer
    sorts result columns with pandas, which cannot order list cells
    (unhashable) — scalar string columns keep the same information and
    are hashable on both engines. All JVM built-ins — per-row work, no
    shuffle beyond the scan."""
    li = read_table(spark, sf_dir, "lineitem")
    a1 = F.sequence(F.lit(1).cast("bigint"), 1 + F.pmod(F.col("l_orderkey"), F.lit(5)))
    a2_lo = F.pmod(F.col("l_partkey"), F.lit(4)) + 1
    a2 = F.sequence(a2_lo, a2_lo + 3)
    t = li.select("l_orderkey", "l_linenumber", a1.alias("a1"), a2.alias("a2"))

    def _csv(col):
        return F.concat_ws(",", F.array_sort(col).cast("array<string>"))

    return t.select(
        "l_orderkey",
        "l_linenumber",
        _csv(F.array_union("a1", "a2")).alias("union_csv"),
        _csv(F.array_intersect("a1", "a2")).alias("intersect_csv"),
        _csv(F.array_except("a1", "a2")).alias("except_csv"),
        F.array_contains("a1", F.lit(3).cast("bigint")).cast("bigint").alias("has_three"),
        F.array_position("a1", F.col("l_linenumber").cast("bigint"))
        .cast("bigint")
        .alias("pos_linenumber"),
    )


@register(
    "window_time_range_frame",
    oracle="""
    SELECT event_id, user_id, ts,
           COUNT(*) OVER w AS n_last_hour,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sum_last_hour
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    """,
    tags=("window", "frame", "timeseries"),
)
def window_time_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-interval RANGE frame: per-user trailing-1-hour event count and
    value sum — the sliding-aggregate shape metric pipelines use
    constantly. Distinct from the numeric RANGE frame already covered
    (window_first_last_range): the frame bound is an INTERVAL over the
    event-time ORDER BY, which PySpark's rangeBetween(long, long) can't
    express — it goes through the SQL window spec. RANGE includes
    equal-ts peers, so ties can't perturb the result. Exact decimal sum
    per the house money rule. One shuffle on user_id."""
    e = read_table(spark, sf_dir, "events")
    frame = (
        "OVER (PARTITION BY user_id ORDER BY ts "
        "RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)"
    )
    return e.selectExpr(
        "event_id",
        "user_id",
        "ts",
        f"COUNT(*) {frame} AS n_last_hour",
        f"CAST(SUM(CAST(value AS DECIMAL(18,6))) {frame} AS DOUBLE) AS sum_last_hour",
    )


@register(
    "orders_retention_cohort",
    oracle="""
    WITH f AS (
      SELECT o_custkey, date_trunc('month', MIN(o_orderdate)) AS cohort_month
      FROM orders GROUP BY o_custkey
    )
    SELECT cohort_month,
           date_trunc('month', o.o_orderdate) AS order_month,
           COUNT(DISTINCT o.o_custkey)        AS n_customers,
           COUNT(*)                           AS n_orders
    FROM orders o JOIN f USING (o_custkey)
    GROUP BY 1, 2
    """,
    tags=("agg", "cohort", "analytics"),
)
def orders_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: customers bucketed by first-order month,
    activity counted per (cohort_month, order_month) cell — the classic
    product-analytics rollup. Two shuffles (min-per-customer, then the
    cell group-by); the cohort dimension joins back broadcast-size at any
    realistic customer count relative to the fact table."""
    o = read_table(spark, sf_dir, "orders")
    first = o.groupBy("o_custkey").agg(
        F.date_trunc("month", F.min("o_orderdate")).alias("cohort_month")
    )
    return (
        o.join(first, "o_custkey")
        .groupBy(
            "cohort_month", F.date_trunc("month", F.col("o_orderdate")).alias("order_month")
        )
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count("*").alias("n_orders"),
        )
    )


@register(
    "basket_part_pairs",
    oracle="""
    WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
           COUNT(*) AS n_orders_together
    FROM d a JOIN d b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
    HAVING COUNT(*) >= 2
    """,
    tags=("join", "cooccurrence", "analytics"),
)
def basket_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence mining: part pairs appearing together
    in ≥ 2 orders, via a within-order self-join on canonicalized
    (part_a < part_b) pairs. Pair fan-out is C(items_per_order, 2) —
    bounded by the small per-order basket, not the table size, so the
    self-join shuffles on l_orderkey and stays linear in orders at any
    scale. The HAVING prunes the singleton long tail before it leaves
    the aggregation."""
    li = read_table(spark, sf_dir, "lineitem")
    d = li.select("l_orderkey", "l_partkey").distinct()
    a, b = d.alias("a"), d.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"), F.col("b.l_partkey").alias("part_b")
        )
        .agg(F.count("*").alias("n_orders_together"))
        .filter(F.col("n_orders_together") >= 2)
    )


@register(
    "events_anomaly_zscore",
    oracle="""
    WITH m AS (
      SELECT event_type,
             CAST(COUNT(*) AS DOUBLE)                                    AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)           AS sx,
             CAST(SUM(CAST(value AS DECIMAL(19,6)) * CAST(value AS DECIMAL(19,6)))
                  AS DOUBLE)                                             AS sxx
      FROM events GROUP BY event_type
    )
    SELECT event_id, e.event_type, value,
           ROUND((value - sx / n) / sqrt(sxx / n - (sx / n) * (sx / n)), 6) AS zscore
    FROM events e JOIN m ON e.event_type = m.event_type
    WHERE ABS((value - sx / n) / sqrt(sxx / n - (sx / n) * (sx / n))) > 2.0
    """,
    tags=("agg", "stats", "anomaly"),
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score outlier detection: flag events whose value sits > 2σ from
    the per-type population mean. Moments come from exact DECIMAL sums
    (the agg_corr_covar_exact discipline: decimal partials, one closed
    form in doubles — multiplication in decimal ≥(19,6) so DuckDB takes
    its int128 path) broadcast-joined back to the stream; division and
    sqrt are correctly-rounded IEEE ops so both engines agree bit-for-bit,
    with a 6-dp round for belt-and-suspenders. The tiny per-type moment
    table broadcasts at any scale; the filter runs map-side."""
    e = read_table(spark, sf_dir, "events")
    dec = F.col("value").cast("decimal(18,6)")
    dec19 = F.col("value").cast("decimal(19,6)")
    m = e.groupBy(F.col("event_type").alias("mt")).agg(
        F.count("*").cast("double").alias("n"),
        F.sum(dec).cast("double").alias("sx"),
        F.sum(dec19 * dec19).cast("double").alias("sxx"),
    )
    mean = F.col("sx") / F.col("n")
    std = F.sqrt(F.col("sxx") / F.col("n") - mean * mean)
    z = (F.col("value") - mean) / std
    return (
        e.join(F.broadcast(m), e.event_type == m.mt)
        .filter(F.abs(z) > 2.0)
        .select("event_id", "event_type", "value", F.round(z, 6).alias("zscore"))
    )


@register(
    "sink_partitioned_pruned_scan",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
    FROM lineitem
    WHERE MONTH(l_shipdate) = 3
    GROUP BY l_returnflag
    """,
    tags=("sink", "source", "partitioning"),
)
def sink_partitioned_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style partitioned sink + partition-PRUNED scan, end to end:
    lineitem written partitionBy(ship_month), read back with a partition
    filter, aggregated. The filter resolves against directory names, so
    the scan physically touches 1/12 of the files — the layout decision
    that turns a 100 TB full scan into a sub-TB one (the physical plan's
    PartitionFilters row; asserted in tests/test_plans.py for the same
    pattern). Partition-column type inference round-trips the int month.
    Oracle states the equivalent semantic filter over the raw table."""

    li = read_table(spark, sf_dir, "lineitem")
    stage = _scratch_dir("blow_spark_part_")
    (
        li.withColumn("ship_month", F.month("l_shipdate"))
        .write.mode("overwrite")
        .partitionBy("ship_month")
        .parquet(stage)
    )
    back = spark.read.parquet(stage).filter(F.col("ship_month") == 3)
    return back.groupBy("l_returnflag").agg(
        F.count("*").alias("n_rows"),
        F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double").alias("sum_qty"),
    )


@register(
    "agg_hll_sketch_union",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS approx_distinct_parts,
           COUNT(*)                                  AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg", "approx", "sketch"),
)
def agg_hll_sketch_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL sketches (Apache DataSketches, built into Spark 4):
    per-(returnflag, linestatus) part-key sketches, then hll_union_agg up
    to the returnflag level and estimate. Mergeability IS the scale
    architecture for distinct counts — pre-aggregated sketches union
    across partitions/days without re-touching raw data, the pattern a
    100 TB rollup needs (vs countDistinct's full re-shuffle per level).

    Oracle-paired since round 4 (was rows-only) via the exactness
    region: at lgK=16 the sketch stays in its coupon (exact) phase up to
    ~2^14 distinct keys, and the union of coupon-phase sketches is
    itself coupon-phase — so sketch→union→estimate returns the EXACT
    distinct count at every gate sf (200/2000 part keys, measured), and
    the DuckDB exact COUNT(DISTINCT) is a valid equality oracle for the
    whole merge pipeline. Past the coupon phase the same plan degrades
    to estimation; tests/test_relational.py keeps union==direct and
    error-bound pins on the default-lgK variant."""
    li = read_table(spark, sf_dir, "lineitem")
    fine = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.expr("hll_sketch_agg(l_partkey, 16)").alias("sk"),
        F.count("*").alias("n"),
    )
    return fine.groupBy("l_returnflag").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_distinct_parts"),
        F.sum("n").alias("n_rows"),
    )


@register(
    "rollup_incremental_merge",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty_cents,
           MIN(l_shipdate) AS first_ship,
           MAX(l_shipdate) AS last_ship
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg", "incremental", "rollup"),
)
def rollup_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-rollup maintenance: the historical rollup
    (shipdate < 1997) and the newly-arrived delta (≥ 1997) are aggregated
    SEPARATELY, then merged by re-aggregating the partial states
    (SUM of counts, SUM of sums, MIN of mins, MAX of maxes) — the
    arrival-of-a-new-partition pattern that avoids re-touching history.
    The oracle is the FULL recompute over all rows, so the hash check
    proves merge(base, delta) ≡ recompute — the algebraic property that
    makes incremental maintenance sound. All states here are
    self-mergeable; AVG-style states would carry (sum, count) pairs."""
    li = read_table(spark, sf_dir, "lineitem")
    cut = F.lit("1997-01-01").cast("timestamp")

    def rollup(part: DataFrame) -> DataFrame:
        return part.groupBy("l_returnflag").agg(
            F.count("*").alias("n_rows"),
            F.sum(F.round(F.col("l_quantity") * 100).cast("long")).alias("qty_cents"),
            F.min("l_shipdate").alias("first_ship"),
            F.max("l_shipdate").alias("last_ship"),
        )

    base = rollup(li.filter(F.col("l_shipdate") < cut))
    delta = rollup(li.filter(F.col("l_shipdate") >= cut))
    return (
        base.unionByName(delta)
        .groupBy("l_returnflag")
        .agg(
            F.sum("n_rows").alias("n_rows"),
            F.sum("qty_cents").alias("qty_cents"),
            F.min("first_ship").alias("first_ship"),
            F.max("last_ship").alias("last_ship"),
        )
    )


@register(
    "agg_kll_quantile_rollup",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT)                            AS n_rows,
           round(quantile_disc(l_extendedprice, 0.5), 2)       AS p50_est,
           round(quantile_disc(l_extendedprice, 0.95), 2)      AS p95_est
    FROM lineitem GROUP BY l_returnflag
    UNION ALL
    SELECT '__ALL__'                                           AS l_returnflag,
           CAST(COUNT(*) AS BIGINT)                            AS n_rows,
           round(quantile_disc(l_extendedprice, 0.5), 2)       AS p50_est,
           round(quantile_disc(l_extendedprice, 0.95), 2)      AS p95_est
    FROM lineitem
    """,
    tags=("agg", "approx", "sketch", "quantile"),
)
def agg_kll_quantile_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable KLL quantile sketches (Apache DataSketches, built into
    Spark 4): per-returnflag sketches of extended price → p50/p95
    estimates, plus an __ALL__ row whose sketch is the MERGE of the
    per-group sketches (kll_sketch_merge over the collected group
    sketches — 3 elements, so the interpreted fold is irrelevant).
    Mergeability is the scale architecture for percentile rollups: daily
    partition sketches merge into weekly/monthly quantiles without
    re-touching raw data, where exact percentiles would re-shuffle
    everything per level.

    Oracle-paired since round 4 (was rows-only) via the exactness
    region, with the bound set by the MERGED row, not the groups:
    k=65535 ≥ the gate-sf TOTAL row count (~6k @ sf0.001, ~60k @
    sf0.01), so no partition layout or merge order can force a
    compaction anywhere — per-group and __ALL__ quantiles are the
    exact discrete quantile (inclusive-rank convention == DuckDB
    quantile_disc, measured bit-equal under both the vanilla-driver
    and shuffle_partitions=8 session shapes). The measured trap that
    set this bound: k=32768 covers every GROUP (20k rows) but the
    60k-item merged row then compacts LAYOUT-DEPENDENTLY — exact under
    one partitioning, 1-2 ranks off under another (caught by the full
    sf0.01 sweep, round 4). Past k the identical plan degrades to
    KLL's bounded rank error; tests/test_relational.py keeps the
    rank-error pins on the default-k variant."""
    li = read_table(spark, sf_dir, "lineitem")
    per = li.groupBy("l_returnflag").agg(
        F.expr(
            "kll_sketch_agg_double(CAST(l_extendedprice AS DOUBLE), 65535)"
        ).alias("sk")
    )

    def stats(sk):
        return [
            F.kll_sketch_get_n_double(sk).alias("n_rows"),
            F.round(F.kll_sketch_get_quantile_double(sk, F.lit(0.5)), 2).alias("p50_est"),
            F.round(F.kll_sketch_get_quantile_double(sk, F.lit(0.95)), 2).alias("p95_est"),
        ]

    per_group = per.select("l_returnflag", *stats(F.col("sk")))
    merged_sk = F.aggregate(
        F.expr("slice(sks, 2, size(sks) - 1)"),
        F.element_at("sks", 1),
        lambda acc, x: F.kll_sketch_merge_double(acc, x),
    )
    merged = (
        per.agg(F.collect_list("sk").alias("sks"))
        .select(merged_sk.alias("m"))
        .select(F.lit("__ALL__").alias("l_returnflag"), *stats(F.col("m")))
    )
    return per_group.unionByName(merged)


@register(
    "source_schema_evolution",
    oracle="""
    WITH merged AS (
      SELECT l_orderkey, l_linenumber, l_returnflag,
             CAST(NULL AS DOUBLE) AS l_discount
      FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, l_returnflag, l_discount FROM lineitem
    )
    SELECT l_returnflag,
           COUNT(*)                                              AS n_rows,
           CAST(COUNT(l_discount) AS BIGINT)                     AS n_with_disc,
           CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc
    FROM merged
    GROUP BY l_returnflag
    """,
    tags=("source", "schema-evolution"),
)
def source_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet schema evolution: an old file set written WITHOUT
    l_discount and a new one written WITH it, read together under
    mergeSchema=true — the add-a-column migration every long-lived 100 TB
    table goes through (per-file schemas reconciled at scan; old files
    surface NULL for the new column, pinned by n_with_disc = half the
    rows). Oracle replays the union with an explicit NULL leg."""

    li = read_table(spark, sf_dir, "lineitem")
    stage = _scratch_dir("blow_spark_evo_")
    old_cols = ["l_orderkey", "l_linenumber", "l_returnflag"]
    li.select(*old_cols).write.mode("overwrite").parquet(stage + "/v1")
    li.select(*old_cols, "l_discount").write.mode("overwrite").parquet(stage + "/v2")
    merged = spark.read.option("mergeSchema", "true").parquet(stage + "/v1", stage + "/v2")
    return merged.groupBy("l_returnflag").agg(
        F.count("*").alias("n_rows"),
        F.count("l_discount").cast("bigint").alias("n_with_disc"),
        F.sum(F.col("l_discount").cast("decimal(18,4)")).cast("double").alias("sum_disc"),
    )


@register(
    "scalar_try_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_linenumber - 1 = 0 THEN NULL
                ELSE l_extendedprice / (l_linenumber - 1) END      AS safe_div,
           CAST(NULL AS BIGINT)                                   AS overflow_add,
           TRY_CAST(l_returnflag AS BIGINT)                        AS bad_cast,
           TRY_CAST(CASE WHEN l_linenumber % 2 = 0 THEN '1 2'
                         ELSE CAST(l_linenumber AS VARCHAR) END AS BIGINT)
                                                                   AS parse_mixed,
           CAST((generate_series(1, 3))[9] AS BIGINT)              AS oob_element
    FROM lineitem
    """,
    tags=("scalar", "ansi", "error-safe"),
)
def scalar_try_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe (try_*) expression battery — the ANSI-mode escape
    hatches a dirty-data pipeline needs so one bad row NULLs instead of
    failing the job: division by zero, bigint overflow, unparseable
    casts, out-of-bounds array access. The oracle states each NULL
    outcome declaratively (DuckDB throws on overflow rather than
    NULLing, so the overflow leg is the constant its semantics imply:
    MAX_BIGINT + (key+1) always overflows — keys are ≥ 0). parse_mixed alternates
    a parseable integer string with an unparseable one, pinning both
    TRY_CAST outcomes per row. (Fractional strings are deliberately
    avoided: DuckDB's TRY_CAST('25.0' AS BIGINT) rounds to 25 while
    Spark's NULLs — a real cross-engine semantic divergence.)"""
    li = read_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.try_divide(F.col("l_extendedprice"), F.col("l_linenumber") - 1).alias("safe_div"),
        F.try_add(F.lit(9223372036854775807), F.col("l_orderkey") + 1).alias("overflow_add"),
        F.expr("TRY_CAST(l_returnflag AS BIGINT)").alias("bad_cast"),
        F.expr(
            "TRY_CAST(CASE WHEN l_linenumber % 2 = 0 THEN '1 2' "
            "ELSE CAST(l_linenumber AS STRING) END AS BIGINT)"
        ).alias("parse_mixed"),
        F.try_element_at(F.sequence(F.lit(1), F.lit(3)), F.lit(9))
        .cast("bigint")
        .alias("oob_element"),
    )


@register(
    "window_nth_value_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity,
           nth_value(l_quantity, 2) OVER w                          AS second_qty,
           nth_value(CASE WHEN l_returnflag <> 'R' THEN l_quantity END,
                     2 IGNORE NULLS) OVER w                         AS second_kept_qty,
           lead(l_quantity, 1, -1.0) OVER w                         AS next_qty,
           first_value(CASE WHEN l_returnflag <> 'R' THEN l_quantity END
                       IGNORE NULLS) OVER w                         AS first_kept_qty
    FROM lineitem
    WINDOW w AS (PARTITION BY l_orderkey
                 ORDER BY l_linenumber, l_partkey, l_suppkey,
                          CAST(ROUND(l_quantity * 100, 0) AS BIGINT),
                          CAST(ROUND(l_extendedprice * 10000, 0) AS BIGINT))
    """,
    tags=("window", "analytic"),
)
def window_nth_value_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nth_value (plain + IGNORE NULLS), lead-with-default, and
    first_value IGNORE NULLS — the analytic corners the earlier window
    batteries don't touch. Default growing frame on both sides. The sort
    key is (linenumber, partkey, suppkey, fixed-point qty, fixed-point
    price): (l_orderkey, l_linenumber) alone is NOT unique in the
    fixture, and lead/nth_value over a non-total order are free to pick
    either peer — caught at sf0.01 where the tie population is 10×. Any
    remaining full-key ties are entire-row duplicates, which are
    interchangeable. The IGNORE NULLS legs skip 'R'-flagged rows — the
    carry-forward-past-gaps idiom (same family as the LOCF gap fill)."""
    li = read_table(spark, sf_dir, "lineitem")
    w = W.partitionBy("l_orderkey").orderBy(
        "l_linenumber",
        "l_partkey",
        "l_suppkey",
        F.round(F.col("l_quantity") * 100, 0).cast("bigint"),
        F.round(F.col("l_extendedprice") * 10000, 0).cast("bigint"),
    )
    kept = F.when(F.col("l_returnflag") != "R", F.col("l_quantity"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        F.nth_value("l_quantity", 2).over(w).alias("second_qty"),
        F.nth_value(kept, 2, ignoreNulls=True).over(w).alias("second_kept_qty"),
        F.lead("l_quantity", 1, -1.0).over(w).alias("next_qty"),
        F.first(kept, ignorenulls=True).over(w).alias("first_kept_qty"),
    )


@register(
    "agg_multi_distinct",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey)  AS n_parts,
           COUNT(DISTINCT l_suppkey)  AS n_supps,
           COUNT(DISTINCT l_orderkey) AS n_orders,
           SUM(CAST(ROUND(l_quantity * 10000, 0) AS BIGINT)) / 10000.0 AS sum_qty,
           COUNT(*)                   AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg", "distinct"),
)
def agg_multi_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THREE different COUNT(DISTINCT) columns plus plain aggregates in
    one GROUP BY — the multi-distinct shape Catalyst plans with an
    Expand node (each row replicated once per distinct group, then a
    two-level aggregate). Distinct from agg_distinct_counts (single
    distinct column): multi-distinct is its own planning problem —
    the Expand multiplies shuffle rows by the distinct-column count,
    which is why sketch rollups (agg_hll_sketch_union) replace this
    exact form at the 100 TB rollup layer when estimates suffice."""
    li = read_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        (F.sum(F.round(F.col("l_quantity") * 10000, 0).cast("long")) / 10000.0).alias(
            "sum_qty"
        ),
        F.count("*").alias("n_rows"),
    )


@register(
    "join_asof_tolerance",
    oracle="""
    SELECT e.event_id,
           e.user_id,
           CASE WHEN c.ts >= e.ts - INTERVAL 15 MINUTE THEN c.ts END AS recent_click_ts,
           CAST(CASE WHEN c.ts >= e.ts - INTERVAL 15 MINUTE THEN 1 ELSE 0 END
                AS BIGINT) AS within_tolerance
    FROM (SELECT * FROM events WHERE event_type = 'error') e
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON e.user_id = c.user_id AND e.ts > c.ts
    """,
    tags=("join", "asof", "tolerance"),
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a staleness TOLERANCE (pandas merge_asof's
    `tolerance=`): the most recent earlier click is only attached if it
    happened within 15 minutes of the error — older matches are nulled,
    the "don't join stale reference data" guard a point-in-time
    enrichment needs. Same range-join + max core as join_asof with the
    tolerance applied as a post-predicate; the scalable single-shuffle
    form is blow_spark.ops.asof_join + the same predicate."""
    ev = read_table(spark, sf_dir, "events")
    err = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", F.col("ts").alias("err_ts")
    )
    clk = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    asof = (
        err.join(
            clk,
            (F.col("user_id") == F.col("c_user")) & (F.col("err_ts") > F.col("c_ts")),
            "left",
        )
        .groupBy("event_id", "user_id", "err_ts")
        .agg(F.max("c_ts").alias("last_click_ts"))
    )
    in_tol = F.col("last_click_ts") >= F.col("err_ts") - F.expr("INTERVAL 15 MINUTE")
    return asof.select(
        "event_id",
        "user_id",
        F.when(in_tol, F.col("last_click_ts")).alias("recent_click_ts"),
        F.when(in_tol, F.lit(1)).otherwise(0).cast("bigint").alias("within_tolerance"),
    )


@register(
    "sort_limit_offset_page",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20 OFFSET 40
    """,
    tags=("sort", "limit", "offset"),
)
def sort_limit_offset_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyset-free pagination: page 3 of a 20-row listing (ORDER BY a
    provably total key, OFFSET 40 LIMIT 20). Catalyst folds
    sort+offset+limit into one TakeOrderedAndProject-style global top-60
    — each partition contributes at most 60 rows, the driver keeps the
    window — so no full sort materializes. (OFFSET cost grows with page
    depth; deep pagination belongs on a keyset predicate instead, which
    is ordinary filter pushdown.)"""
    o = read_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .offset(40)
        .limit(20)
    )


@register(
    "sort_null_ordering",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderstatus = 'O' THEN NULL ELSE o_totalprice END AS settled_price
    FROM orders
    ORDER BY settled_price DESC NULLS LAST, o_orderkey
    LIMIT 30
    """,
    tags=("sort", "nulls"),
)
def sort_null_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit NULL placement in sort order (DESC NULLS LAST): open
    orders surface a NULL settled price and must sink below every real
    value — engines default this differently (Spark DESC puts NULLs
    last, ANSI databases first), so the ordering is pinned explicitly
    on both sides. o_orderkey tiebreak keeps the LIMIT 30 row set
    total-ordered; plans as a global top-k, no full sort."""
    o = read_table(spark, sf_dir, "orders")
    settled = F.when(F.col("o_orderstatus") != "O", F.col("o_totalprice"))
    return (
        o.select("o_orderkey", settled.alias("settled_price"))
        .orderBy(F.col("settled_price").desc_nulls_last(), "o_orderkey")
        .limit(30)
    )


@register(
    "scalar_date_arith_battery",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate + INTERVAL 1 MONTH AS VARCHAR)          AS plus_month,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR)     AS month_end,
           CAST(CAST(date_trunc('week', o_orderdate) AS TIMESTAMP) AS VARCHAR)    AS week_start,
           CAST(CAST(date_trunc('quarter', o_orderdate) AS TIMESTAMP) AS VARCHAR) AS quarter_start,
           CAST(datediff('day', o_orderdate,
                         TIMESTAMP '2024-06-30 00:00:00') AS BIGINT) AS days_to_cutoff,
           CAST(EXTRACT(dow FROM o_orderdate) AS BIGINT)            AS dow_sun0,
           CAST(EXTRACT(doy FROM o_orderdate) AS BIGINT)            AS day_of_year,
           CAST(EXTRACT(week FROM o_orderdate) AS BIGINT)           AS iso_week
    FROM orders
    WHERE o_orderkey < 500
    """,
    tags=("scalar", "date", "battery"),
)
def scalar_date_arith_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/interval arithmetic battery over the calendar functions a
    reporting layer leans on: month addition (with end-of-month clamp
    semantics shared by both engines), last_day, week/quarter
    truncation, day difference against a fixed cutoff, and the
    dow/doy/ISO-week extract family. Date-typed results are emitted as
    ISO strings to make the cross-engine comparison type-exact
    (timestamps vs dates normalize differently in pandas). Spark's
    dayofweek is 1-based Sunday; DuckDB's dow is 0-based Sunday — the
    ``-1`` aligns the two conventions (both engines' docs state them;
    the oracle-gate would catch any drift). All map-side codegen'd
    scans — nothing shuffles."""
    o = read_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.add_months(d, 1).cast("timestamp").cast("string").alias("plus_month"),
        F.last_day(d).cast("string").alias("month_end"),
        F.date_trunc("week", d).cast("string").alias("week_start"),
        F.date_trunc("quarter", d).cast("string").alias("quarter_start"),
        F.datediff(F.lit("2024-06-30").cast("date"), d.cast("date"))
        .cast("long")
        .alias("days_to_cutoff"),
        (F.dayofweek(d) - 1).cast("long").alias("dow_sun0"),
        F.dayofyear(d).cast("long").alias("day_of_year"),
        F.weekofyear(d).cast("long").alias("iso_week"),
    )


@register(
    "diag_key_skew_profile",
    oracle="""
    WITH per_key AS (
      SELECT l_partkey AS key, CAST(COUNT(*) AS BIGINT) AS n
      FROM lineitem GROUP BY l_partkey
    ), stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
             CAST(MAX(n) AS BIGINT) AS max_mult,
             CAST(SUM(n) AS BIGINT) AS n_rows,
             quantile_cont(n, 0.5) AS p50_mult,
             quantile_cont(n, 0.99) AS p99_mult
      FROM per_key
    ), heavy AS (
      SELECT array_to_string(list(CAST(key AS VARCHAR)), ',') AS top_keys
      FROM (SELECT key FROM per_key ORDER BY n DESC, key LIMIT 3) t
    )
    SELECT n_keys, n_rows, max_mult, p50_mult, p99_mult,
           CAST(max_mult AS DOUBLE) / (CAST(n_rows AS DOUBLE) / n_keys) AS skew_factor,
           top_keys
    FROM stats CROSS JOIN heavy
    """,
    tags=("diag", "skew", "agg"),
)
def diag_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew profile — the diagnostic a 100 TB run consults
    BEFORE picking a join strategy (broadcast / salt / AQE skew-split):
    per-key multiplicity distribution (p50/p99/max), the max-to-mean
    skew factor, and the top-3 heavy keys (deterministic (count desc,
    key) tie-break). One map-side-combined count per key, then a 5-row
    reduction — the profile costs one scan, which is why it's worth
    running before a shuffle that costs many. The skew_factor division
    chain is written identically on both engines."""
    li = read_table(spark, sf_dir, "lineitem")
    per_key = li.groupBy(F.col("l_partkey").alias("key")).agg(F.count("*").alias("n"))
    stats = per_key.agg(
        F.count("*").alias("n_keys"),
        F.max("n").alias("max_mult"),
        F.sum("n").alias("n_rows"),
        F.percentile("n", 0.5).alias("p50_mult"),
        F.percentile("n", 0.99).alias("p99_mult"),
    )
    heavy = (
        per_key.orderBy(F.col("n").desc(), "key")
        .limit(3)
        .agg(F.concat_ws(",", F.collect_list(F.col("key").cast("string"))).alias("top_keys"))
    )
    skew = F.col("max_mult").cast("double") / (
        F.col("n_rows").cast("double") / F.col("n_keys")
    )
    return stats.crossJoin(heavy).select(
        "n_keys", "n_rows", "max_mult", "p50_mult", "p99_mult",
        skew.alias("skew_factor"), "top_keys",
    )


@register(
    "events_anomaly_robust_mad",
    oracle="""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY event_type
    ), mad AS (
      SELECT e.event_type, quantile_cont(abs(e.value - m.med), 0.5) AS mad
      FROM events e JOIN med m USING (event_type)
      GROUP BY e.event_type
    )
    SELECT e.event_id, e.event_type, e.value, m.med, d.mad
    FROM events e
    JOIN med m USING (event_type)
    JOIN mad d USING (event_type)
    WHERE abs(e.value - m.med) > 3 * d.mad AND d.mad > 0
    """,
    tags=("agg", "anomaly", "robust", "percentile"),
)
def events_anomaly_robust_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection: median/MAD instead of mean/stddev —
    the estimator that does NOT move when the outliers it hunts
    contaminate the baseline (z-score's circularity;
    ``events_anomaly_zscore`` is the classical twin). Inherently
    two-pass: per-type exact median, then the median of absolute
    deviations FROM that median, then the 3-MAD flag — three
    vocabulary-sized aggregates broadcast back over one events scan
    each. Exact interpolated medians are bit-identical across engines
    (probed by agg_percentiles_exact), so no rounding is needed; at
    100 TB both medians swap to the KLL sketch (agg_kll_quantile_rollup)
    with the same plan shape."""
    e = read_table(spark, sf_dir, "events")
    med = e.groupBy("event_type").agg(F.median("value").alias("med"))
    dev = e.join(F.broadcast(med), "event_type")
    mad = dev.groupBy("event_type").agg(
        F.median(F.abs(F.col("value") - F.col("med"))).alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .filter(
            (F.abs(F.col("value") - F.col("med")) > 3 * F.col("mad"))
            & (F.col("mad") > 0)
        )
        .select("event_id", "event_type", "value", "med", "mad")
    )


@register(
    "agg_approx_topk_mergeable",
    oracle="""
    SELECT o_orderpriority AS item, CAST(COUNT(*) AS BIGINT) AS n
    FROM orders GROUP BY o_orderpriority
    """,
    tags=("agg", "approx", "sketch", "topk", "spark4"),
)
def agg_approx_topk_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed heavy hitters via Spark 4's MERGEABLE approx_top_k:
    accumulate per partition-group, combine the states, estimate once —
    the two-phase rollup shape that lets daily top-k states merge into
    monthly top-k WITHOUT re-touching raw events (same architecture as
    the KLL/HLL rollups). The sketch is EXACT whenever the true distinct
    count fits its capacity — deliberately the case here (5 priorities,
    k budget 10), which is what makes an approximate operator
    oracle-pairable against plain GROUP BY counts; on a high-cardinality
    column it degrades gracefully to top-k-with-error and would register
    rows-only (agg_approx_sketches itself flipped to oracle-paired in
    round 4 by the same exactness-region technique)."""
    read_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql("""
      WITH parts AS (
        SELECT o_orderstatus, approx_top_k_accumulate(o_orderpriority, 10) AS st
        FROM orders GROUP BY o_orderstatus
      ), merged AS (
        SELECT approx_top_k_estimate(approx_top_k_combine(st), 10) AS tk FROM parts
      )
      SELECT item, CAST(count AS BIGINT) AS n FROM (SELECT inline(tk) FROM merged)
    """)


@register(
    "agg_theta_sketch_distinct",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS n_distinct_est
    FROM orders GROUP BY o_orderstatus
    """,
    tags=("agg", "approx", "sketch", "spark4"),
)
def agg_theta_sketch_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta sketch distinct counting (Apache DataSketches, Spark 4
    builtin) — the mergeable sketch family that, unlike HLL, also
    supports set OPERATIONS on the sketch states at the library level.
    Theta is exact below its retention threshold (default 2^12 entries);
    the 5-value priority column sits firmly in that region, so the
    estimate equals COUNT(DISTINCT) and the sketch path is
    oracle-checkable. Past the retention threshold theta
    degrades to bounded relative error, as the HLL/KLL rollups do past
    their own exactness regions."""
    o = read_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.expr("theta_sketch_estimate(theta_sketch_agg(o_orderpriority))")
        .cast("bigint")
        .alias("n_distinct_est")
    )


@register(
    "relational_transpose",
    oracle="""
    WITH s AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty_cents
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT 'n_rows' AS key,
           (SELECT n_rows FROM s WHERE l_returnflag = 'A') AS A,
           (SELECT n_rows FROM s WHERE l_returnflag = 'N') AS N,
           (SELECT n_rows FROM s WHERE l_returnflag = 'R') AS R
    UNION ALL
    SELECT 'qty_cents',
           (SELECT qty_cents FROM s WHERE l_returnflag = 'A'),
           (SELECT qty_cents FROM s WHERE l_returnflag = 'N'),
           (SELECT qty_cents FROM s WHERE l_returnflag = 'R')
    """,
    tags=("relational", "transpose", "spark4"),
)
def relational_transpose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 ``DataFrame.transpose()``: rows↔columns over a small
    aggregate — the metrics-as-rows report shape (each measure becomes a
    row, each group a column). The transpose operates on the 3-row
    aggregate, never the fact table — the only sane place for a
    transpose at scale, since the result schema is data-dependent
    (one column per input ROW; Spark collects the key column to the
    driver at plan time, which is why the input must already be
    aggregate-small). Integer measures keep the hash check exact; the
    oracle derives the same grid with scalar subqueries."""
    li = read_table(spark, sf_dir, "lineitem")
    summary = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n_rows"),
        F.sum(F.round(F.col("l_quantity") * 100).cast("long")).alias("qty_cents"),
    )
    return summary.transpose()


@register(
    "sql_session_variables_front_door",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
    FROM orders
    WHERE o_totalprice BETWEEN 50000.0 AND 200000.0 AND o_orderstatus = 'F'
    GROUP BY o_orderpriority
    """,
    tags=("sql", "variables", "spark4"),
)
def sql_session_variables_front_door(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL session variables (DECLARE VARIABLE / SET VAR) as the
    parameter-binding surface: thresholds live in typed session state
    and the query references them BY NAME — the scripting-style
    alternative to `:name` bind parameters (`sql_parameterized_query`),
    useful when one session runs a parameter sweep without rebuilding
    query text. DECLARE OR REPLACE keeps the builder idempotent in
    long-lived sessions (the driver and bench reuse one session for the
    whole catalog). The oracle inlines the same literals — variable
    resolution happens at analysis time, so the plan is identical to
    the literal form (constant-folded, filters pushed)."""
    from blow_spark.sources import register_views

    register_views(spark, sf_dir, ["orders"])
    spark.sql("DECLARE OR REPLACE VARIABLE price_lo DOUBLE DEFAULT 50000.0")
    spark.sql("DECLARE OR REPLACE VARIABLE price_hi DOUBLE DEFAULT 200000.0")
    spark.sql("DECLARE OR REPLACE VARIABLE status STRING DEFAULT 'F'")
    spark.sql("SET VAR price_lo = 50000.0")
    spark.sql("SET VAR price_hi = 200000.0")
    spark.sql("SET VAR status = 'F'")
    return spark.sql(
        """
        SELECT o_orderpriority,
               COUNT(*) AS n,
               SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS total_cents
        FROM orders
        WHERE o_totalprice BETWEEN price_lo AND price_hi
          AND o_orderstatus = status
        GROUP BY o_orderpriority
        """
    )


_RECURSIVE_CTE_SQL = """
WITH RECURSIVE bounds AS (
  SELECT CAST(MIN(o_orderdate) AS DATE) AS d0 FROM orders
), idx(n) AS (
  SELECT 0
  UNION ALL
  SELECT c FROM (
    SELECT n * 2 + 1 AS c FROM idx
    UNION ALL
    SELECT n * 2 + 2 AS c FROM idx
  ) ch WHERE c < 90
), spine(order_day) AS (
  SELECT CAST(d0 + n * INTERVAL 1 DAY AS DATE) FROM idx CROSS JOIN bounds
)
SELECT CAST(s.order_day AS STRING) AS order_day,
       CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders,
       CAST(COALESCE(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)), 0)
            AS BIGINT) AS revenue_cents
FROM spine s LEFT JOIN orders o ON o.o_orderdate = s.order_day
GROUP BY s.order_day
"""


@register(
    "sql_recursive_cte_front_door",
    oracle=_RECURSIVE_CTE_SQL,
    tags=("sql", "recursive", "spark4"),
)
def sql_recursive_cte_front_door(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 WITH RECURSIVE through the SQL front door with ONE shared
    query text: a recursive calendar spine (90 days from the earliest
    order date) LEFT JOINed to orders gives gap-FILLED daily order
    counts — days with zero orders appear as explicit zero rows, the
    classic reporting shape a plain GROUP BY cannot produce. Recursion
    is the one relational feature the engine previously expressed only
    through unrolled oracles (graph BFS, k-core peels); Spark 4
    executes it natively as an iterative union-loop plan, and DuckDB
    runs the identical text, so spine length, the interval arithmetic
    (`CAST(d0 + n * INTERVAL 1 DAY AS DATE)` — the form both engines
    type as DATE), and the zero-fill COALESCE are all hash-checked.

    Scale note: Spark materializes ONE JOB PER RECURSION LEVEL, so the
    naive +1-day chain (90 levels) costs 90 scheduling rounds — measured
    16.6 s at sf0.01 against ~1.5 s for this form. The spine therefore
    recurses over HEAP-NUMBERED indices (children 2n+1 / 2n+2 cover
    0..89 uniquely): two recursive branches per level, depth ⌈log₂ 90⌉ =
    7 — the recursive-doubling trick that turns any bounded
    integer-spine recursion from O(n) scheduling rounds into O(log n).
    The spine is 90 rows at ANY corpus scale; the only data-scale work
    is the one date-keyed join."""
    from blow_spark.sources import register_views

    register_views(spark, sf_dir, ["orders"])
    return spark.sql(_RECURSIVE_CTE_SQL)


@register(
    "source_xml_roundtrip",
    oracle="""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(LENGTH(text)) AS BIGINT) AS sum_text_chars,
           CAST(SUM(n_chars) AS BIGINT) AS sum_n_chars,
           CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id
    FROM documents
    GROUP BY lang
    """,
    tags=("source", "sink", "xml", "spark4"),
)
def source_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 built-in XML data source, write → read → aggregate: the
    documents table (free text with XML-special characters) goes out
    through the StAX writer and back through the schema-inferring
    reader, then aggregates per language. The oracle computes the same
    aggregate from the ORIGINAL parquet, so the hash proves the XML
    codec round-trips every byte (entity escaping, whitespace, unicode)
    and infers the numeric columns back to BIGINT — the sixth file
    format next to parquet/csv/json/orc/text. SUM(LENGTH(text)) is the
    fidelity witness: one mangled entity shifts it. Schema inference
    reads the files once more at plan time; a 100 TB deployment passes
    an explicit schema instead (same reader), as the csv/json batteries
    do."""

    docs = read_table(spark, sf_dir, "documents")
    stage = _scratch_dir("blow_spark_xml_")
    (
        docs.write.format("xml")
        .option("rowTag", "doc")
        .mode("overwrite")
        .save(stage + "/docs_xml")
    )
    back = (
        spark.read.format("xml")
        .option("rowTag", "doc")
        .load(stage + "/docs_xml")
    )
    return back.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.length("text")).alias("sum_text_chars"),
        F.sum("n_chars").alias("sum_n_chars"),
        F.sum("doc_id").alias("sum_doc_id"),
    )


@register(
    "sink_sorted_clustered_scan",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
    FROM lineitem
    WHERE l_shipdate >= DATE '1995-06-01' AND l_shipdate < DATE '1995-07-01'
    GROUP BY l_returnflag
    """,
    tags=("sink", "source", "sorting", "clustering"),
)
def sink_sorted_clustered_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Globally-SORTED table layout + range-predicate scan, end to end:
    lineitem is range-partitioned on l_shipdate (16 non-overlapping
    shards), sorted within each shard, written, and re-read with a
    one-month predicate. Because the file key-ranges don't overlap, a
    range predicate physically touches ~1/⌈span/month⌉ of the files via
    parquet min/max footer stats — the sort-based sibling of
    `sink_partitioned_pruned_scan`'s directory pruning and the layout
    Delta/Iceberg call clustering. Non-overlap is proven from the
    actual footers in tests/test_plans.py; the oracle states the
    equivalent semantic filter over the raw table. At 100 TB the same
    two calls (repartitionByRange + sortWithinPartitions) scale out:
    range partitioning samples the key distribution, so shards stay
    balanced under skew."""

    li = read_table(spark, sf_dir, "lineitem")
    stage = _scratch_dir("blow_spark_sorted_")
    (
        li.repartitionByRange(16, "l_shipdate")
        .sortWithinPartitions("l_shipdate")
        .write.mode("overwrite")
        .parquet(stage + "/li_sorted")
    )
    back = spark.read.parquet(stage + "/li_sorted").filter(
        (F.col("l_shipdate") >= F.lit("1995-06-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1995-07-01").cast("date"))
    )
    return back.groupBy("l_returnflag").agg(
        F.count("*").alias("n_rows"),
        F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double").alias("sum_qty"),
    )


@register(
    "agg_bitmap_exact_distinct",
    oracle="""
    SELECT o_orderpriority,
           CAST(2 AS INT) AS n_parts,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_distinct_merged,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_distinct_direct
    FROM orders
    GROUP BY o_orderpriority
    """,
    tags=("agg", "distinct", "bitmap", "mergeable"),
)
def agg_bitmap_exact_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT mergeable distinct counting via Spark's bitmap aggregates
    (bitmap_bucket_number / bitmap_construct_agg / bitmap_or_agg /
    bitmap_count, SPARK-44245) — the third point on the catalog's
    distinct-count spectrum: COUNT(DISTINCT) re-shuffles raw keys and
    cannot pre-aggregate; the HLL/theta sketches (`agg_hll_sketch_union`,
    `agg_theta_sketch_distinct`) pre-aggregate but approximate; bitmaps
    pre-aggregate AND stay exact, at a state cost of 4 KB per occupied
    32768-key bucket — the Databricks incremental-MV recipe for exact
    distincts over append-only facts.

    Mergeability is EXERCISED, not assumed: the input is split into two
    deterministic halves (o_orderkey mod 2 — both non-empty at every
    gate sf), per-half per-bucket bitmaps are built independently
    (bitmap_construct_agg), OR-merged across halves (bitmap_or_agg —
    the associative rollup step an incremental pipeline would run per
    batch), and counted; a direct single-pass bitmap count rides the
    same result row. The DuckDB oracle states both columns as plain
    COUNT(DISTINCT), so the driver hash proves the sharded-merge path
    bit-equals the exact answer. Shuffles are keyed on (group, bucket)
    — at 100 TB each reduce task holds bitmaps, never key sets, and a
    new day's partition merges into a stored bitmap table without
    touching history (the same contract `rollup_incremental_merge`
    pins for SUM/COUNT)."""
    orders = read_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("bm_orders")
    return spark.sql(
        """
        WITH halves AS (
          SELECT o_orderpriority,
                 o_orderkey % 2 AS part,
                 bitmap_bucket_number(o_custkey) AS bno,
                 bitmap_construct_agg(bitmap_bit_position(o_custkey)) AS bm
          FROM bm_orders
          GROUP BY o_orderpriority, o_orderkey % 2,
                   bitmap_bucket_number(o_custkey)
        ), merged AS (
          SELECT o_orderpriority,
                 bno,
                 bitmap_or_agg(bm) AS bm
          FROM halves
          GROUP BY o_orderpriority, bno
        ), parts_ct AS (
          SELECT o_orderpriority, CAST(COUNT(DISTINCT part) AS INT) AS n_parts
          FROM halves GROUP BY o_orderpriority
        ), direct AS (
          SELECT o_orderpriority,
                 bitmap_bucket_number(o_custkey) AS bno,
                 bitmap_construct_agg(bitmap_bit_position(o_custkey)) AS bm
          FROM bm_orders
          GROUP BY o_orderpriority, bitmap_bucket_number(o_custkey)
        )
        , merged_counts AS (
          SELECT o_orderpriority,
                 CAST(SUM(bitmap_count(bm)) AS BIGINT) AS n_distinct_merged
          FROM merged GROUP BY o_orderpriority
        ), direct_counts AS (
          SELECT o_orderpriority,
                 CAST(SUM(bitmap_count(bm)) AS BIGINT) AS n_distinct_direct
          FROM direct GROUP BY o_orderpriority
        )
        SELECT m.o_orderpriority, p.n_parts, m.n_distinct_merged,
               d.n_distinct_direct
        FROM merged_counts m
        JOIN parts_ct p USING (o_orderpriority)
        JOIN direct_counts d USING (o_orderpriority)
        """
    )


_CMS_DEPTH = 4  # independent hash rows
_CMS_WIDTH = 64  # buckets per row


@register(
    "agg_countmin_heavy_hitters",
    oracle="""
    SELECT o_orderstatus, o_orderpriority AS item,
           CAST(COUNT(*) AS BIGINT) AS est_n
    FROM orders GROUP BY o_orderstatus, o_orderpriority
    """,
    tags=("agg", "approx", "sketch", "mergeable"),
)
def agg_countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch frequency estimation (Cormode & Muthukrishnan,
    J. Algorithms 2005), built as pure DataFrame aggregation and with
    its MERGE exercised in-plan: the sketch for each order-status group
    is a d×w counter matrix (d=4 hash rows via xxhash64(item, row), w=64
    buckets); two sketches are built INDEPENDENTLY over the two
    o_orderkey-parity halves of orders, merged by element-wise addition
    (the CMS merge operator — what lets daily sketches roll into monthly
    ones without re-touching raw data, same architecture as the
    HLL/KLL/theta/bitmap rollups in this file), and every distinct key
    is then estimated as min over rows of its bucket counts.

    Exactness region: the estimate is exact iff each key has at least
    one hash row where it collides with nothing — guaranteed-checked
    here by the oracle itself (plain GROUP BY counts): with 5 distinct
    priorities in 4 independent rows of 64 buckets, an all-rows
    collision needs ~(1/64)^4 luck, and the key set is scale-invariant,
    so the region is stable across SFs (calibrated at both gate SFs per
    tests/test_exactness_regions.py conventions). On a high-cardinality
    column the same plan degrades to the documented CMS overestimate
    bound (err ≤ e/w · N with prob 1 - e^-d) and would register
    rows-only, like the other sketches past their regions.

    Scale shape: the sketch table is ≤ |status|·2·d·w rows regardless of
    input size — the explode(d) fans each input row into d counter
    updates that partial-aggregate MAP-SIDE down to the counter matrix,
    so the only shuffle is sketch-sized, and the probe join broadcasts
    the merged matrix. Reference has no aggregation operators at all
    (SURVEY.md §2.2); this is §2.2-checklist "mergeable sketches"
    coverage."""
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderstatus",
        F.col("o_orderpriority").alias("item"),
        (F.col("o_orderkey") % 2).alias("half"),
    )
    rows = F.explode(F.array(*[F.lit(i) for i in range(_CMS_DEPTH)])).alias("row")
    updates = o.select("o_orderstatus", "item", "half", rows).withColumn(
        "bucket", F.pmod(F.xxhash64("item", "row"), F.lit(_CMS_WIDTH))
    )
    half_sketch = updates.groupBy("o_orderstatus", "half", "row", "bucket").agg(
        F.count("*").alias("cnt")
    )
    # CMS merge = element-wise counter addition across the two halves.
    merged = half_sketch.groupBy("o_orderstatus", "row", "bucket").agg(
        F.sum("cnt").alias("cnt")
    )
    keys = o.select("o_orderstatus", "item").distinct()
    probes = keys.select("o_orderstatus", "item", rows).withColumn(
        "bucket", F.pmod(F.xxhash64("item", "row"), F.lit(_CMS_WIDTH))
    )
    return (
        probes.join(F.broadcast(merged), ["o_orderstatus", "row", "bucket"])
        .groupBy("o_orderstatus", "item")
        .agg(F.min("cnt").cast("bigint").alias("est_n"))
    )
