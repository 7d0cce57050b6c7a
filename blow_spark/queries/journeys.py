"""User-journey & survival analytics over the ``events`` fixture:
Kaplan-Meier retention, top user paths, sequential event patterns,
bitmap-rolling DAU/MAU, and time-weighted averages.

These are the product-analytics readouts every event warehouse serves
(Amplitude/Mixpanel-class queries), re-expressed as single-pass Spark
plans. Reference parity note: the reference engine (wizgrao/blow) has no
analytics surface — maps/maps.go:8-14 is its entire operator vocabulary —
so these are extension operators from the task brief's analytics mandate.

Determinism notes (catalog conventions, see queries/__init__ docstring):

* every continuous output is either pure-integer (counts, basis points,
  fixed-point micro-units) or a ROUND(x, 6) of arithmetic whose inputs
  are integers exactly representable in float64 — both engines perform
  the identical correctly-rounded IEEE ops;
* the Kaplan-Meier cumulative product goes through exp(sum(ln ·)) with a
  zero-factor guard (ln is the one libm-bound op here; ROUND-6 absorbs
  any last-ulp divergence — same precedent as text_bigram_logprob);
* top-k outputs ORDER BY a provably total key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from blow_spark.queries import register
from blow_spark.sources import read_table

# Users whose last event falls on/after this date are right-censored
# (still active when the observation window closed — the fixture spans
# January 2024, so the final 3 days are the censoring horizon).
_KM_CENSOR_DATE = "2024-01-28"
_EPOCH_DAY0 = "2024-01-01"  # fixture start; day-index origin for MAU
_PATH_LEN = 5
_MAU_WINDOW_DAYS = 6  # 7-day window = current day + 6 preceding


@register(
    "events_kaplan_meier_retention",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
             date_diff('day', CAST(MIN(ts) AS DATE), CAST(MAX(ts) AS DATE))
               AS dur,
             CAST(MAX(ts) AS DATE) >= DATE '{_KM_CENSOR_DATE}' AS censored
      FROM events GROUP BY user_id
    ), by_day AS (
      SELECT CAST(dur AS BIGINT) AS t,
             CAST(COUNT(*) FILTER (WHERE NOT censored) AS BIGINT) AS n_events,
             CAST(COUNT(*) FILTER (WHERE censored) AS BIGINT) AS n_censored
      FROM per_user GROUP BY dur
    ), tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM per_user
    ), risk AS (
      SELECT t, n_events, n_censored,
             n_total
               - SUM(n_events + n_censored) OVER (ORDER BY t)
               + (n_events + n_censored) AS n_risk
      FROM by_day CROSS JOIN tot
    )
    SELECT t, CAST(n_risk AS BIGINT) AS n_risk, n_events, n_censored,
           CASE WHEN MAX(CASE WHEN n_events >= n_risk THEN 1 ELSE 0 END)
                       OVER (ORDER BY t) = 1
                THEN 0.0
                ELSE ROUND(EXP(SUM(CASE WHEN n_events > 0 AND n_events < n_risk
                                        THEN LN(CAST(n_risk - n_events AS DOUBLE)
                                                / n_risk)
                                        ELSE 0.0 END) OVER (ORDER BY t)), 6)
           END AS survival
    FROM risk
    """,
    tags=("analytics", "survival", "events"),
)
def events_kaplan_meier_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier retention curve over user lifetimes (Kaplan & Meier,
    JASA 1958): lifetime = whole days between a user's first and last
    event; users still active in the observation window's final days are
    right-censored (they contribute to the at-risk set but never to the
    death counts). Per distinct lifetime day t the query emits the
    at-risk count, event (churn) count, censor count, and the KM
    survival estimate S(t) = prod_{s<=t} (1 - d_s / n_s), computed as
    exp(sum(ln factors)) with an exact-zero guard for the d == n edge
    (ln(0) never evaluated in either engine).

    Scale: one user-keyed aggregate (the only corpus-scale shuffle), then
    everything runs on the day-level table whose row count is bounded by
    the CALENDAR SPAN, not the data — the two cumulative windows over it
    are single-partition by construction but constant-size, the same
    whitelisted pattern as the global-rank offsets tables
    (tests/test_plan_guard.py WHITELIST). n_total arrives as a one-row
    broadcast cross join."""
    e = read_table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.datediff(F.to_date(F.max("ts")), F.to_date(F.min("ts")))
        .cast("bigint")
        .alias("dur"),
        (F.to_date(F.max("ts")) >= F.lit(_KM_CENSOR_DATE).cast("date")).alias(
            "censored"
        ),
    )
    by_day = per_user.groupBy(F.col("dur").alias("t")).agg(
        F.count_if(~F.col("censored")).cast("bigint").alias("n_events"),
        F.count_if(F.col("censored")).cast("bigint").alias("n_censored"),
    )
    tot = per_user.agg(F.count("*").cast("bigint").alias("n_total"))
    w = W.orderBy("t").rowsBetween(W.unboundedPreceding, W.currentRow)
    leaving = F.col("n_events") + F.col("n_censored")
    risk = by_day.crossJoin(F.broadcast(tot)).withColumn(
        "n_risk",
        (F.col("n_total") - F.sum(leaving).over(w) + leaving).cast("bigint"),
    )
    dead = F.col("n_events")
    at_risk = F.col("n_risk")
    log_factor = F.when(
        (dead > 0) & (dead < at_risk),
        F.log((at_risk - dead).cast("double") / at_risk),
    ).otherwise(F.lit(0.0))
    hit_zero = F.max(F.when(dead >= at_risk, 1).otherwise(0)).over(w)
    return risk.select(
        "t",
        "n_risk",
        "n_events",
        "n_censored",
        F.when(hit_zero == 1, F.lit(0.0))
        .otherwise(F.round(F.exp(F.sum(log_factor).over(w)), 6))
        .alias("survival"),
    )


@register(
    "events_top_paths",
    oracle=f"""
    WITH r AS (
      SELECT user_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    ), paths AS (
      SELECT user_id,
             string_agg(event_type, '>' ORDER BY rn) AS path
      FROM r WHERE rn <= {_PATH_LEN} GROUP BY user_id
    )
    SELECT path, CAST(COUNT(*) AS BIGINT) AS n_users
    FROM paths GROUP BY path
    ORDER BY n_users DESC, path
    LIMIT 20
    """,
    tags=("analytics", "journey", "events"),
)
def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top onboarding paths: each user's first 5 events (by time, with
    event_id as the total tiebreak) concatenated into a '>' journey
    string, counted across users, top-20 by (n_users DESC, path ASC) —
    a provably total order, so the LIMIT row set is unique.

    Scale: the row_number window and the per-user fold share ONE
    user-keyed shuffle (groupBy reuses the window's partitioning), and
    the window truncates every user to 5 rows BEFORE collect — a user
    with 10M events contributes 5, never an unbounded in-memory array.
    The path-level aggregate and top-k run on the (≤ |event_types|^5)
    path domain via TakeOrderedAndProject — no global sort."""
    e = read_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    r = e.select(
        "user_id", "event_type", F.row_number().over(w).alias("rn")
    ).filter(F.col("rn") <= _PATH_LEN)
    paths = r.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
                lambda s: s["event_type"],
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").cast("bigint").alias("n_users"))
        .orderBy(F.desc("n_users"), "path")
        .limit(20)
    )


@register(
    "events_sequential_patterns",
    oracle="""
    WITH seq AS (
      SELECT user_id,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev,
             event_type AS curr
      FROM events
    )
    SELECT prev || '>' || curr AS pattern,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM seq WHERE prev IS NOT NULL
    GROUP BY prev || '>' || curr
    """,
    tags=("analytics", "journey", "events"),
)
def events_sequential_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent consecutive event-type bigrams (the depth-2 slice of
    sequential-pattern mining, PrefixSpan-style but closed-form): for
    every adjacent pair of events in a user's timeline, count total
    occurrences and distinct users exhibiting the transition — the
    input to funnel design and next-action models.

    Scale: one user-keyed window shuffle produces the lag pairs; the
    pattern aggregate runs on a |event_types|² domain. No self-join —
    the naive ts-adjacency join shuffles the event table twice and
    needs an anti-condition for adjacency; lag is one pass."""
    e = read_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        F.lag("event_type").over(w).alias("prev"),
        F.col("event_type").alias("curr"),
    ).filter(F.col("prev").isNotNull())
    return seq.groupBy(
        F.concat_ws(">", "prev", "curr").alias("pattern")
    ).agg(
        F.count("*").cast("bigint").alias("n_occurrences"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
    )


@register(
    "events_mau_bitmap_rolling",
    oracle=f"""
    WITH ev AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ), days AS (
      SELECT DISTINCT day FROM ev
    )
    SELECT CAST(d.day AS VARCHAR) AS day,
           CAST(COUNT(DISTINCT CASE WHEN e.day = d.day
                                    THEN e.user_id END) AS BIGINT) AS dau,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS mau7
    FROM days d
    JOIN ev e ON e.day BETWEEN d.day - {_MAU_WINDOW_DAYS} AND d.day
    GROUP BY d.day
    """,
    tags=("analytics", "events", "bitmap", "distinct"),
)
def events_mau_bitmap_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day active users (the DAU/MAU board metric) via EXACT
    mergeable bitmaps instead of the naive day×window COUNT(DISTINCT)
    re-scan: per (day, 32768-user bucket) the user set densifies into
    one bitmap (bitmap_construct_agg; Spark's bitmap buckets are
    32768 bits = 4 KB each), a RANGE window ORs the trailing 7
    days per bucket (bitmap_or_agg — set union as bit-OR), and
    bitmap_count sums across buckets. The oracle recomputes with a
    brute-force range self-join, proving the bitmap algebra exact.

    Scale: the events table shuffles ONCE, keyed (day, bucket), into a
    table bounded by days × (users / 32768) — at 10^9 users and a year
    that is ~11M 4-KB rows (~45 GB state), independent of event count (the naive
    plan re-shuffles all events once per window day). The bucket-keyed
    RANGE window is fully parallel; the day-level rollup is calendar-
    bounded. Bucket×day densification (a broadcast cross join of two
    tiny distinct sets) guarantees a bucket quiet TODAY still surfaces
    its last-6-days users."""
    e = read_table(spark, sf_dir, "events")
    day0 = F.lit(_EPOCH_DAY0).cast("date")
    b1 = (
        e.select(
            F.datediff(F.to_date("ts"), day0).alias("di"),
            F.expr("bitmap_bucket_number(user_id)").alias("bkt"),
            F.expr("bitmap_bit_position(user_id)").alias("pos"),
        )
        .groupBy("di", "bkt")
        .agg(F.expr("bitmap_construct_agg(pos)").alias("bm"))
    )
    days = b1.select("di").distinct()
    bkts = b1.select("bkt").distinct()
    dense = days.crossJoin(F.broadcast(bkts)).join(b1, ["di", "bkt"], "left")
    w = (
        W.partitionBy("bkt")
        .orderBy("di")
        .rangeBetween(-_MAU_WINDOW_DAYS, W.currentRow)
    )
    per_bucket = dense.select(
        "di",
        F.coalesce(F.expr("bitmap_count(bm)"), F.lit(0)).alias("dau_part"),
        F.coalesce(
            F.call_function(
                "bitmap_count", F.expr("bitmap_or_agg(bm)").over(w)
            ),
            F.lit(0),
        ).alias("mau_part"),
    )
    return per_bucket.groupBy("di").agg(
        F.sum("dau_part").cast("bigint").alias("dau"),
        F.sum("mau_part").cast("bigint").alias("mau7"),
    ).select(
        F.date_add(day0, F.col("di")).cast("string").alias("day"),
        "dau",
        "mau7",
    )


@register(
    "timeseries_time_weighted_avg",
    oracle="""
    WITH seq AS (
      SELECT user_id,
             (LEAD(epoch_us(ts)) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id)
              - epoch_us(ts)) // 1000000 AS dur_s,
             CAST(ROUND(value * 10000) AS BIGINT) AS val_e4
      FROM events
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_intervals,
           CAST(SUM(dur_s) AS BIGINT) AS total_seconds,
           ROUND(CAST(SUM(dur_s * val_e4) AS DOUBLE)
                 / CAST(SUM(dur_s) AS DOUBLE) / 10000.0, 6) AS twap
    FROM seq WHERE dur_s IS NOT NULL AND dur_s > 0
    GROUP BY user_id
    """,
    tags=("timeseries", "analytics", "events"),
)
def timeseries_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average (TWAP): each observation's value holds until
    the next observation, so the mean weights every value by its holding
    duration in whole seconds — the correct average for irregularly
    sampled series (a plain AVG over-weights bursty periods). The last
    observation per key has no successor and is excluded (standard
    left-closed TWAP over the observed span).

    Determinism envelope: val_e4 = ROUND(value·10⁴) ≤ ~3.3×10⁶ on the
    fixture, dur_s ≤ 2.6×10⁶ (the 30-day span), so every per-user sum
    stays < 2⁵³ and the double division of exact integers is correctly
    rounded identically in both engines; ROUND-6 seals it. Past ~10¹⁵
    in the product the sums upgrade to DECIMAL(38,0) — documented here
    as the envelope.

    Scale: ONE user-keyed shuffle — the lead window and the per-user
    aggregate share the partitioning; no self-join (the naive adjacency
    join shuffles twice)."""
    e = read_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    seq = e.select(
        "user_id",
        (F.lead(us).over(w) - us).alias("diff_us"),
        F.round(F.col("value") * 10000).cast("bigint").alias("val_e4"),
    ).withColumn("dur_s", F.expr("diff_us div 1000000"))
    seq = seq.filter(F.col("dur_s").isNotNull() & (F.col("dur_s") > 0))
    return seq.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n_intervals"),
        F.sum("dur_s").cast("bigint").alias("total_seconds"),
        F.round(
            F.sum(F.col("dur_s") * F.col("val_e4")).cast("double")
            / F.sum("dur_s").cast("double")
            / 10000.0,
            6,
        ).alias("twap"),
    )


_M4_BUCKETS = 50


@register(
    "timeseries_m4_downsample",
    oracle=f"""
    WITH bounds AS (
      SELECT MIN(epoch_us(ts)) AS lo, MAX(epoch_us(ts)) AS hi FROM events
    ), pts AS (
      SELECT event_type, event_id, ts,
             CAST(ROUND(value * 10000) AS BIGINT) AS v_e4,
             CAST(((epoch_us(ts) - b.lo) * {_M4_BUCKETS})
                  // (b.hi - b.lo + 1) AS BIGINT) AS bucket
      FROM events CROSS JOIN bounds b
    ), ranked AS (
      SELECT *,
             ROW_NUMBER() OVER (PARTITION BY event_type, bucket
                                ORDER BY ts, event_id) AS rn_a,
             ROW_NUMBER() OVER (PARTITION BY event_type, bucket
                                ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM pts
    )
    SELECT event_type, bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(v_e4) AS BIGINT) AS vmin_e4,
           CAST(MAX(v_e4) AS BIGINT) AS vmax_e4,
           CAST(MAX(CASE WHEN rn_a = 1 THEN v_e4 END) AS BIGINT) AS first_e4,
           CAST(MAX(CASE WHEN rn_d = 1 THEN v_e4 END) AS BIGINT) AS last_e4
    FROM ranked GROUP BY event_type, bucket
    """,
    tags=("timeseries", "downsample", "events"),
)
def timeseries_m4_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 downsampling (Jugel et al., VLDB 2014): per series and fixed
    time bucket (one per output pixel, {_M4_BUCKETS} here), keep exactly
    the four value-and-time extrema a pixel-perfect line rendering needs
    — min, max, first, last — the provably error-free reduction for
    line-chart visualization (any other point cannot change a drawn
    pixel). Values fixed-pointed to e4 integers; first/last resolved by
    the (ts, event_id) total order via two rank columns sharing one
    window sort.

    Scale: ONE (series, bucket)-keyed shuffle; the two row_numbers and
    the five aggregates all run inside that partitioning. Bucket bounds
    are a 1-row broadcast. Output is |series|×{_M4_BUCKETS} rows no matter
    how many points came in — the whole point of M4."""
    e = read_table(spark, sf_dir, "events")
    bounds = e.agg(
        F.min(F.unix_micros("ts")).alias("lo"),
        F.max(F.unix_micros("ts")).alias("hi"),
    )
    pts = e.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        "event_id",
        "ts",
        F.round(F.col("value") * 10000).cast("bigint").alias("v_e4"),
        F.expr(
            f"((unix_micros(ts) - lo) * {_M4_BUCKETS}) div (hi - lo + 1)"
        ).alias("bucket"),
    )
    wa = W.partitionBy("event_type", "bucket").orderBy("ts", "event_id")
    wd = W.partitionBy("event_type", "bucket").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    ranked = pts.select(
        "event_type",
        "bucket",
        "v_e4",
        F.row_number().over(wa).alias("rn_a"),
        F.row_number().over(wd).alias("rn_d"),
    )
    return ranked.groupBy("event_type", "bucket").agg(
        F.count("*").cast("bigint").alias("n"),
        F.min("v_e4").cast("bigint").alias("vmin_e4"),
        F.max("v_e4").cast("bigint").alias("vmax_e4"),
        F.max(F.when(F.col("rn_a") == 1, F.col("v_e4")))
        .cast("bigint")
        .alias("first_e4"),
        F.max(F.when(F.col("rn_d") == 1, F.col("v_e4")))
        .cast("bigint")
        .alias("last_e4"),
    )


@register(
    "timeseries_cusum_deviation",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(ROUND(value * 10000) AS BIGINT)) AS BIGINT) AS s_e4,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ), tot AS (
      SELECT event_type,
             CAST(SUM(s_e4) AS BIGINT) AS tot_s,
             CAST(SUM(n) AS BIGINT) AS tot_n
      FROM daily GROUP BY event_type
    ), dev AS (
      SELECT d.event_type, d.day,
             d.s_e4 * t.tot_n - t.tot_s * d.n AS dev_scaled,
             t.tot_n
      FROM daily d JOIN tot t USING (event_type)
    )
    SELECT event_type, CAST(day AS VARCHAR) AS day,
           CAST(SUM(dev_scaled) OVER (PARTITION BY event_type ORDER BY day)
                AS BIGINT) AS cusum_scaled,
           ROUND(CAST(SUM(dev_scaled) OVER (PARTITION BY event_type
                                            ORDER BY day) AS DOUBLE)
                 / tot_n / 10000.0, 6) AS cusum_value
    FROM dev
    """,
    tags=("timeseries", "anomaly", "events"),
)
def timeseries_cusum_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM control chart (Page, Biometrika 1954 — the V-mask form):
    per series, the running sum of daily deviations from the series'
    own mean; a persistent drift accumulates while noise cancels, which
    a pointwise z-score (events_anomaly_zscore) cannot see. Kept EXACT
    by integer cross-multiplication: deviation of day d scales to
    s_d·N − S·n_d (s=daily fixed-point sum, n=daily count, S/N series
    totals) — a pure-integer window sum, no float accumulation order to
    diverge on; the value-unit column divides once at the end (inputs
    < 2^53, correctly rounded identically, ROUND-6).

    Scale: one (series, day) aggregate, one series-total re-aggregate
    joined back (series-keyed, tiny), and a series-partitioned
    cumulative window over calendar-bounded rows. Integer envelope:
    s_d·N < 2^63 up to ~10⁹ events/series/day at e4 scale — past that,
    DECIMAL(38,0)."""
    e = read_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(
        F.sum(F.round(F.col("value") * 10000).cast("bigint"))
        .cast("bigint")
        .alias("s_e4"),
        F.count("*").cast("bigint").alias("n"),
    )
    tot = daily.groupBy("event_type").agg(
        F.sum("s_e4").cast("bigint").alias("tot_s"),
        F.sum("n").cast("bigint").alias("tot_n"),
    )
    dev = daily.join(tot, "event_type").select(
        "event_type",
        "day",
        (F.col("s_e4") * F.col("tot_n") - F.col("tot_s") * F.col("n")).alias(
            "dev_scaled"
        ),
        "tot_n",
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cusum = F.sum("dev_scaled").over(w)
    return dev.select(
        "event_type",
        F.col("day").cast("string").alias("day"),
        cusum.cast("bigint").alias("cusum_scaled"),
        F.round(
            cusum.cast("double") / F.col("tot_n") / 10000.0, 6
        ).alias("cusum_value"),
    )


@register(
    "events_time_to_convert",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS fv_us
      FROM events GROUP BY user_id
    ), conv AS (
      SELECT e.user_id,
             (MIN(epoch_us(e.ts)) - u.fv_us) // 1000000 AS latency_s
      FROM per_user u
      JOIN events e ON e.user_id = u.user_id
       AND e.event_type = 'purchase' AND epoch_us(e.ts) > u.fv_us
      GROUP BY e.user_id, u.fv_us
    ), ranked AS (
      SELECT user_id, latency_s,
             ROW_NUMBER() OVER (ORDER BY latency_s, user_id) AS rn,
             COUNT(*) OVER () AS n
      FROM conv
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_converted,
           CAST(MAX(CASE WHEN rn = (n - 1) * 25 // 100 + 1
                         THEN latency_s END) AS BIGINT) AS p25_s,
           CAST(MAX(CASE WHEN rn = (n - 1) * 50 // 100 + 1
                         THEN latency_s END) AS BIGINT) AS p50_s,
           CAST(MAX(CASE WHEN rn = (n - 1) * 90 // 100 + 1
                         THEN latency_s END) AS BIGINT) AS p90_s
    FROM ranked
    """,
    tags=("analytics", "funnel", "events"),
)
def events_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: for every user, the whole-second
    latency from their FIRST view to their first purchase AFTER it,
    summarized as exact order-statistic percentiles (p25/p50/p90 at the
    lower-index convention rank = (n-1)·p/100 + 1) — the funnel-latency
    readout that complements events_funnel_conversion's rate.

    Scale: one user-keyed aggregate derives the first view per user in
    a single conditional-MIN pass; first-purchase-after-view is a
    user-keyed join + MIN (no event-log self-join at event granularity
    — the oracle replays with one for independence). The percentile
    selection runs on the converted-users table via
    ops.global_row_number (two-phase range rank, no data-scale
    single-partition window); the total count joins back as a 1-row
    broadcast so the rank→index arithmetic stays in-plan (no driver
    scalar)."""
    from blow_spark import ops

    e = read_table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "view", F.unix_micros("ts"))
        ).alias("fv_us"),
    )
    purch = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.unix_micros("ts").alias("p_us")
    )
    conv = (
        purch.join(per_user, "user_id")
        .filter(F.col("fv_us").isNotNull() & (F.col("p_us") > F.col("fv_us")))
        .groupBy("user_id", "fv_us")
        .agg(F.min("p_us").alias("fp_us"))
        .select(
            "user_id",
            F.expr("(fp_us - fv_us) div 1000000").alias("latency_s"),
        )
    )
    ranked = ops.global_row_number(
        conv, [F.col("latency_s").asc(), F.col("user_id").asc()], out_col="rn"
    )
    tot = ranked.agg(F.count("*").cast("bigint").alias("n"))
    at = ranked.crossJoin(F.broadcast(tot))

    def pick(p: int):
        idx = (F.col("n") - 1) * p / F.lit(100)
        # integer floor of an exact small-int ratio, then +1
        return F.max(
            F.when(
                F.col("rn") == F.floor(idx).cast("bigint") + 1,
                F.col("latency_s"),
            )
        ).cast("bigint")

    return at.agg(
        F.max("n").cast("bigint").alias("n_converted"),
        pick(25).alias("p25_s"),
        pick(50).alias("p50_s"),
        pick(90).alias("p90_s"),
    )


@register(
    "events_activity_heatmap",
    oracle="""
    SELECT CAST(date_part('dow', ts) AS INT) AS dow,
           CAST(date_part('hour', ts) AS INT) AS hour,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    GROUP BY date_part('dow', ts), date_part('hour', ts)
    """,
    tags=("analytics", "events"),
)
def events_activity_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week × hour activity heatmap (0 = Sunday, matching
    PostgreSQL/DuckDB dow; Spark's dayofweek is 1-based so it shifts by
    one) with event and distinct-user counts — the standard seasonality
    panel. One grouped aggregate with a ≤168-row output; the distinct
    runs as Spark's partial-distinct expand."""
    e = read_table(spark, sf_dir, "events")
    return e.groupBy(
        (F.dayofweek("ts") - 1).cast("int").alias("dow"),
        F.hour("ts").cast("int").alias("hour"),
    ).agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
    )


_COHORT_WEEKS = 4


@register(
    "events_cohort_retention_weekly",
    oracle=f"""
    WITH weekly AS (
      SELECT DISTINCT user_id,
             CAST(date_diff('day', DATE '{_EPOCH_DAY0}', CAST(ts AS DATE)) // 7
                  AS INT) AS week
      FROM events
    ), cohorts AS (
      SELECT user_id, MIN(week) AS cohort FROM weekly GROUP BY user_id
    )
    SELECT c.cohort,
           w.week - c.cohort AS week_offset,
           CAST(COUNT(DISTINCT w.user_id) AS BIGINT) AS n_active
    FROM cohorts c
    JOIN weekly w ON w.user_id = c.user_id
    WHERE w.week - c.cohort < {_COHORT_WEEKS}
    GROUP BY c.cohort, w.week - c.cohort
    """,
    tags=("analytics", "retention", "events"),
)
def events_cohort_retention_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention triangle: users grouped by first-active
    week (the cohort); for each later week offset, how many of the
    cohort were active — the classic retention matrix, offset 0 being
    cohort size (companion to orders_retention_cohort, which cuts by
    calendar month over orders). Pure integer counts.

    Scale: distinct (user, week) is one user-keyed reduction; the
    cohort table re-aggregates it (no second corpus pass) and joins
    back user-keyed — both shuffles on the same key, so AQE coalesces
    them onto one partitioning. Output is a weeks×offsets triangle,
    calendar-bounded."""
    e = read_table(spark, sf_dir, "events")
    weekly = e.select(
        "user_id",
        F.expr(
            f"datediff(to_date(ts), date'{_EPOCH_DAY0}') div 7"
        ).cast("int").alias("week"),
    ).distinct()
    cohorts = weekly.groupBy("user_id").agg(F.min("week").alias("cohort"))
    j = weekly.join(cohorts, "user_id").withColumn(
        "week_offset", F.col("week") - F.col("cohort")
    )
    return (
        j.filter(F.col("week_offset") < _COHORT_WEEKS)
        .groupBy("cohort", "week_offset")
        .agg(F.countDistinct("user_id").cast("bigint").alias("n_active"))
    )


_FUNNEL_WINDOW_H = 48


@register(
    "events_window_funnel_depth",
    oracle=f"""
    WITH t1 AS (
      SELECT user_id, MIN(epoch_us(ts)) AS t1
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ), t2 AS (
      SELECT e.user_id, MIN(epoch_us(e.ts)) AS t2
      FROM events e JOIN t1 ON e.user_id = t1.user_id
      WHERE e.event_type = 'click' AND epoch_us(e.ts) > t1.t1
        AND epoch_us(e.ts) <= t1.t1 + {_FUNNEL_WINDOW_H} * 3600000000::BIGINT
      GROUP BY e.user_id
    ), t3 AS (
      SELECT e.user_id, MIN(epoch_us(e.ts)) AS t3
      FROM events e
      JOIN t1 ON e.user_id = t1.user_id
      JOIN t2 ON e.user_id = t2.user_id
      WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > t2.t2
        AND epoch_us(e.ts) <= t1.t1 + {_FUNNEL_WINDOW_H} * 3600000000::BIGINT
      GROUP BY e.user_id
    ), users AS (
      SELECT DISTINCT user_id FROM events
    ), depth AS (
      SELECT u.user_id,
             CASE WHEN t3.t3 IS NOT NULL THEN 3
                  WHEN t2.t2 IS NOT NULL THEN 2
                  WHEN t1.t1 IS NOT NULL THEN 1
                  ELSE 0 END AS depth
      FROM users u
      LEFT JOIN t1 ON u.user_id = t1.user_id
      LEFT JOIN t2 ON u.user_id = t2.user_id
      LEFT JOIN t3 ON u.user_id = t3.user_id
    )
    SELECT CAST(depth AS INT) AS depth,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM depth GROUP BY depth
    """,
    tags=("analytics", "funnel", "events"),
)
def events_window_funnel_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed funnel depth (ClickHouse ``windowFunnel`` parity): for
    the ordered chain view → click → purchase, each user's depth is the
    longest prefix completed with every later step STRICTLY after its
    predecessor and inside a 48h window anchored at the FIRST view —
    the exact sequenced-within-window semantics (a click before the
    first view, or a purchase outside the window, does not count; a
    plain per-type MIN comparison would get both wrong). Output is the
    depth histogram.

    Scale: three user-keyed conditional-MIN passes, one per funnel step
    — each step's anchor joins back user-keyed, so all shuffles share
    one partitioning (the alternative single-pass form collects each
    user's full event array: unbounded per-user state; ClickHouse pays
    that memory, this plan pays one extra keyed pass per step and
    streams). Depth histogram is a ≤4-row rollup."""
    e = read_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    win = _FUNNEL_WINDOW_H * 3_600_000_000
    t1 = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min(us).alias("t1"))
    )
    t2 = (
        e.filter(F.col("event_type") == "click")
        .join(t1, "user_id")
        .filter((us > F.col("t1")) & (us <= F.col("t1") + win))
        .groupBy("user_id")
        .agg(F.min(us).alias("t2"))
    )
    t3 = (
        e.filter(F.col("event_type") == "purchase")
        .join(t1, "user_id")
        .join(t2, "user_id")
        .filter((us > F.col("t2")) & (us <= F.col("t1") + win))
        .groupBy("user_id")
        .agg(F.min(us).alias("t3"))
    )
    users = e.select("user_id").distinct()
    depth = (
        users.join(t1, "user_id", "left")
        .join(t2, "user_id", "left")
        .join(t3, "user_id", "left")
        .select(
            F.when(F.col("t3").isNotNull(), 3)
            .when(F.col("t2").isNotNull(), 2)
            .when(F.col("t1").isNotNull(), 1)
            .otherwise(0)
            .cast("int")
            .alias("depth")
        )
    )
    return depth.groupBy("depth").agg(
        F.count("*").cast("bigint").alias("n_users")
    )


@register(
    "events_bounce_rate",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  OR LAG(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ), numbered AS (
      SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS session_no
      FROM marked
    ), sessions AS (
      SELECT user_id, session_no,
             CAST(MIN(ts) AS DATE) AS day,
             COUNT(*) AS n_events
      FROM numbered GROUP BY user_id, session_no
    )
    SELECT CAST(day AS VARCHAR) AS day,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(COUNT(*) FILTER (WHERE n_events = 1) AS BIGINT) AS n_bounces,
           ROUND(CAST(COUNT(*) FILTER (WHERE n_events = 1) AS DOUBLE)
                 / COUNT(*), 6) AS bounce_rate
    FROM sessions GROUP BY day
    """,
    tags=("analytics", "session", "events"),
)
def events_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily bounce rate: the share of 30-min-gap sessions containing
    exactly ONE event, grouped by the session's start day — the
    engagement-quality KPI next to raw session counts (window_session).
    Spark side sessionizes with the native session_window aggregate;
    the oracle replays with the gaps-and-islands rewrite (the catalog's
    established equivalence, cf. window_session) — the hash-match
    re-proves session_window == islands on a new derived metric.

    Scale: one user-keyed session aggregate, one calendar-bounded day
    rollup. Pure integer counts + one ROUND-6 ratio."""
    e = read_table(spark, sf_dir, "events")
    sessions = e.groupBy(
        F.session_window("ts", "30 minutes").alias("w"), "user_id"
    ).agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("first_ts"),
    )
    days = sessions.select(
        F.to_date("first_ts").cast("string").alias("day"),
        F.col("n_events"),
    )
    return days.groupBy("day").agg(
        F.count("*").cast("bigint").alias("n_sessions"),
        F.count_if(F.col("n_events") == 1).cast("bigint").alias("n_bounces"),
        F.round(
            F.count_if(F.col("n_events") == 1).cast("double") / F.count("*"),
            6,
        ).alias("bounce_rate"),
    )


@register(
    "events_longest_streak",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id,
             date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS di
      FROM events
    ), grouped AS (
      SELECT user_id, di,
             di - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY di)
               AS grp
      FROM days
    ), streaks AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS streak_days,
             CAST(MIN(di) AS BIGINT) AS start_di
      FROM grouped GROUP BY user_id, grp
    ), best AS (
      SELECT user_id, streak_days, start_di,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY streak_days DESC, start_di) AS rn
      FROM streaks
    )
    SELECT user_id, streak_days AS longest_streak_days,
           start_di AS streak_start_day_index
    FROM best WHERE rn = 1
    """,
    tags=("analytics", "journey", "events"),
)
def events_longest_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user (the engagement
    metric behind every 'N-day streak' badge), via the gaps-and-islands
    identity: over a user's DISTINCT active day indices in order,
    day_index − row_number is constant exactly within a consecutive
    run, so one partitioned window + one group-by finds every streak;
    ties between equal-length streaks resolve to the earliest. Pure
    integer day arithmetic.

    Scale: distinct (user, day) is the only corpus-scale reduction;
    the islands window and both aggregates stay user-partitioned —
    fully parallel, no global state."""
    e = read_table(spark, sf_dir, "events")
    days = e.select(
        "user_id",
        F.datediff(
            F.to_date("ts"), F.lit(_EPOCH_DAY0).cast("date")
        ).alias("di"),
    ).distinct()
    w = W.partitionBy("user_id").orderBy("di")
    grouped = days.withColumn(
        "grp", F.col("di") - F.row_number().over(w)
    )
    streaks = grouped.groupBy("user_id", "grp").agg(
        F.count("*").cast("bigint").alias("streak_days"),
        F.min("di").cast("bigint").alias("start_di"),
    )
    wb = W.partitionBy("user_id").orderBy(
        F.desc("streak_days"), F.asc("start_di")
    )
    return (
        streaks.withColumn("rn", F.row_number().over(wb))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("streak_days").alias("longest_streak_days"),
            F.col("start_di").alias("streak_start_day_index"),
        )
    )


@register(
    "events_power_user_curve",
    oracle="""
    WITH per_user AS (
      SELECT strftime(ts, '%Y-%m') AS month, user_id,
             CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS active_days
      FROM events
      GROUP BY 1, 2
    )
    SELECT month, active_days,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM per_user
    GROUP BY month, active_days
    """,
    tags=("analytics", "events", "engagement"),
)
def events_power_user_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-user curve (the L28/L30 engagement histogram): for each
    calendar month, how many users were active exactly d distinct days —
    the smile-vs-frown shape product teams read before any retention
    metric (Facebook's classic growth-accounting chart). Bounded output:
    months × 31 rows.

    Scale: one (month, user)-keyed COUNT(DISTINCT day) — the distinct
    collapses inside the keyed aggregate, no window — then a
    constant-size histogram rollup. Both aggregates are map-side
    combinable; nothing shuffles twice at data scale."""
    e = read_table(spark, sf_dir, "events")
    per_user = (
        e.select(
            F.date_format("ts", "yyyy-MM").alias("month"),
            "user_id",
            F.to_date("ts").alias("day"),
        )
        .groupBy("month", "user_id")
        .agg(F.countDistinct("day").alias("active_days"))
    )
    return per_user.groupBy("month", "active_days").agg(
        F.count("*").cast("bigint").alias("n_users")
    )


@register(
    "events_path_entropy",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events
    ), trans AS (
      SELECT event_type, next_type, CAST(COUNT(*) AS BIGINT) AS c
      FROM seq WHERE next_type IS NOT NULL
      GROUP BY event_type, next_type
    ), outdeg AS (
      SELECT event_type, CAST(SUM(c) AS BIGINT) AS n_out
      FROM trans GROUP BY event_type
    ), terms AS (
      SELECT t.event_type,
             CAST(ROUND(-(CAST(t.c AS DOUBLE) / o.n_out)
                        * LN(CAST(t.c AS DOUBLE) / o.n_out) / LN(2.0)
                        * 1000000) AS BIGINT) AS term_e6,
             t.c
      FROM trans t JOIN outdeg o USING (event_type)
    )
    SELECT t.event_type, o.n_out,
           CAST(COUNT(*) AS BIGINT) AS n_next_types,
           CAST(SUM(t.term_e6) AS BIGINT) AS entropy_e6_sum,
           ROUND(CAST(SUM(t.term_e6) AS DOUBLE) / 1e6, 4) AS entropy_bits
    FROM terms t JOIN outdeg o USING (event_type)
    GROUP BY t.event_type, o.n_out
    ORDER BY t.event_type
    """,
    tags=("events", "journeys", "stats"),
)
def events_path_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each event type's NEXT-event distribution —
    the journey-predictability readout (entropy ≈ 0 bits: users always
    do the same thing next; log₂|types| bits: anything can happen) that
    complements the raw transition counts of events_funnel_transitions
    with the information-theoretic summary. Transition probabilities
    are single divisions of exact BIGINT counts; each −p·log₂p term is
    fix-pointed at e6 per (type → next) CELL — the cell domain is the
    event-type vocabulary squared (≤ 5² here), bounded at any corpus
    size — so the per-type sums are exact integers in both engines.
    e6 (not the house e9) is deliberate: LN evaluates at runtime in
    BOTH engines, and a JVM-vs-libm log ulp (~1e-16 relative) could
    flip an e9 term sitting on a .5 rounding boundary; the coarser e6
    fixpoint widens the guard band by 1000× so a last-ulp divergence
    cannot reach the rounded digit.

    Scale: one partitioned LEAD window (parallel by user) + one keyed
    count reduce the corpus to the type² cell table; everything after
    is constant-size. Reference analog: blow's per-record Mapper
    (maps/maps.go:12-14) cannot see cross-record order at all."""
    e = read_table(spark, sf_dir, "events")
    seq = e.select(
        "event_type",
        F.lead("event_type")
        .over(W.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("next_type"),
    )
    trans = (
        seq.where(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    outdeg = trans.groupBy("event_type").agg(
        F.sum("c").cast("bigint").alias("n_out")
    )
    p = F.col("c").cast("double") / F.col("n_out")
    terms = trans.join(F.broadcast(outdeg), "event_type").select(
        "event_type",
        "n_out",
        F.round(-p * F.log(p) / F.log(F.lit(2.0)) * 1e6)
        .cast("bigint")
        .alias("term_e6"),
    )
    return (
        terms.groupBy("event_type", "n_out")
        .agg(
            F.count("*").cast("bigint").alias("n_next_types"),
            F.sum("term_e6").cast("bigint").alias("entropy_e6_sum"),
        )
        .select(
            "event_type",
            "n_out",
            "n_next_types",
            "entropy_e6_sum",
            F.round(F.col("entropy_e6_sum").cast("double") / 1e6, 4).alias(
                "entropy_bits"
            ),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Frequent ordered sub-sequences (sequential-pattern support)
# --------------------------------------------------------------------------


@register(
    "events_frequent_subsequences",
    oracle="""
    WITH marked AS (
      SELECT user_id, event_id, event_type, ts,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  OR LAG(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ), numbered AS (
      SELECT *, SUM(is_new) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS session_no
      FROM marked
    ), tg AS (
      SELECT user_id, session_no, event_type,
             MIN(epoch_us(ts)) AS mn, MAX(epoch_us(ts)) AS mx
      FROM numbered GROUP BY 1, 2, 3
    ), ns AS (
      SELECT COUNT(*) AS n_sessions
      FROM (SELECT DISTINCT user_id, session_no FROM tg) s
    ), ta AS (
      SELECT event_type, COUNT(*) AS n_a FROM tg GROUP BY 1
    ), pairs AS (
      SELECT a.event_type AS a_type, b.event_type AS b_type,
             COUNT(*) AS n_ab
      FROM tg a JOIN tg b
        ON a.user_id = b.user_id AND a.session_no = b.session_no
       AND a.event_type <> b.event_type AND a.mn < b.mx
      GROUP BY 1, 2
    )
    SELECT p.a_type, p.b_type,
           CAST(ta.n_a AS BIGINT) AS n_sessions_a,
           CAST(p.n_ab AS BIGINT) AS n_sessions_pair,
           CAST(ns.n_sessions AS BIGINT) AS n_sessions,
           CAST(p.n_ab * 1000000 // ns.n_sessions AS BIGINT) AS support_e6,
           CAST(p.n_ab * 1000000 // ta.n_a AS BIGINT) AS confidence_e6
    FROM pairs p JOIN ta ON p.a_type = ta.event_type, ns
    ORDER BY p.a_type, p.b_type
    """,
    tags=("events", "sessions", "sequential-pattern", "exact"),
)
def events_frequent_subsequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential-pattern support for length-2 event-type subsequences
    (the support/confidence core of GSP / PrefixSpan — Srikant &
    Agrawal, EDBT 1996; Pei et al., ICDE 2001): for every ordered type
    pair (a, b), the number of user sessions containing SOME a-event
    strictly before SOME b-event, with per-pattern support and
    confidence as exact e6 floor divisions. Sessions are the repo's
    30-minute-gap sessionization, here via the gaps-and-islands
    windows REPLICATED IDENTICALLY in both engines (lag + running sum
    ordered by (ts, event_id) — a deterministic total order, so
    session numbering can never diverge).

    Scale: the sessionization windows partition by user_id; the pair
    join runs at (session, TYPE) grain — ≤ |event-type| ≈ 5 rows per
    session regardless of session length, so the per-session fan-out
    is ≤ 25 and the 'a before b' test needs only each type's min/max
    timestamp (exists t_a < t_b ⟺ min_a < max_b) — the standard
    poly-time projection that keeps GSP counting linear. One
    data-scale sessionization shuffle + one type-grain aggregate;
    output is |types|² rows. Reference analog: none
    (maps/maps.go:8-21)."""
    e = read_table(spark, sf_dir, "events")
    wl = W.partitionBy("user_id").orderBy("ts", "event_id")
    marked = e.select(
        "user_id",
        "event_id",
        "event_type",
        "ts",
        F.when(
            (
                F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(wl)
                > 1_800_000_000
            )
            | F.lag("ts").over(wl).isNull(),
            1,
        )
        .otherwise(0)
        .alias("is_new"),
    )
    numbered = marked.select(
        "user_id",
        "event_type",
        "ts",
        F.sum("is_new")
        .over(wl.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("session_no"),
    )
    from blow_spark.materialize import spill_to_parquet

    # (session, type) grain; spilled — four branches (session count,
    # per-type supports, both pair sides) consume it, and each would
    # otherwise re-run the sessionization windows over the corpus
    tg = spill_to_parquet(
        numbered.groupBy("user_id", "session_no", "event_type").agg(
            F.min(F.unix_micros("ts")).alias("mn"),
            F.max(F.unix_micros("ts")).alias("mx"),
        )
    )
    ns = (
        tg.select("user_id", "session_no")
        .distinct()
        .agg(F.count("*").alias("n_sessions"))
    )
    ta = tg.groupBy("event_type").agg(F.count("*").alias("n_a"))
    a = tg.select(
        "user_id", "session_no", F.col("event_type").alias("a_type"), "mn"
    )
    b = tg.select(
        "user_id", "session_no", F.col("event_type").alias("b_type"), "mx"
    )
    pairs = (
        a.join(b, ["user_id", "session_no"])
        .filter(
            (F.col("a_type") != F.col("b_type")) & (F.col("mn") < F.col("mx"))
        )
        .groupBy("a_type", "b_type")
        .agg(F.count("*").alias("n_ab"))
    )
    return (
        pairs.join(
            F.broadcast(ta.withColumnRenamed("event_type", "a_type")), "a_type"
        )
        .crossJoin(F.broadcast(ns))
        .select(
            "a_type",
            "b_type",
            F.col("n_a").cast("long").alias("n_sessions_a"),
            F.col("n_ab").cast("long").alias("n_sessions_pair"),
            F.col("n_sessions").cast("long").alias("n_sessions"),
            F.expr("CAST(n_ab * 1000000 div n_sessions AS BIGINT)").alias(
                "support_e6"
            ),
            F.expr("CAST(n_ab * 1000000 div n_a AS BIGINT)").alias(
                "confidence_e6"
            ),
        )
        .orderBy("a_type", "b_type")
    )
