"""Product-analytics and finance-curve operators: DAU/WAU stickiness,
peak concurrency (interval sweep), cohort lifetime value, maximum
drawdown, and lagged cross-correlation.

These are the dashboard-level metrics a growth/finance team computes
over the event and order streams every day; each one is a named,
oracle-paired catalog query built from exact integer sums so the
driver hash matches DuckDB bit-for-bit.

Scale notes are per-query; the common themes are (a) aggregate FIRST
so every ordered window runs over a bounded day-grain series, never
raw events, and (b) the two genuinely global order-statistics
(concurrency sweep) go through ops.global_running_sum's two-phase
range-partitioned prefix sum rather than any single-partition window.

Reference parity note: the reference engine (wizgrao/blow) has no
analytics surface (maps/maps.go:8-14); these are extension operators
from the task brief's analytics mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from blow_spark.ops import global_running_sum
from blow_spark.queries import register
from blow_spark.sources import read_table


@register(
    "events_stickiness_dau_wau",
    oracle="""
    WITH userdays AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ), dau AS (
      SELECT day, CAST(COUNT(*) AS BIGINT) AS dau
      FROM userdays GROUP BY day
    ), wau AS (
      SELECT d.day, CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS wau
      FROM dau d
      JOIN userdays a
        ON a.day <= d.day AND a.day >= d.day - INTERVAL 6 DAY
      GROUP BY d.day
    )
    SELECT CAST(d.day AS VARCHAR) AS day, d.dau, w.wau,
           ROUND(CAST(d.dau AS DOUBLE) / w.wau, 6) AS stickiness
    FROM dau d JOIN wau w USING (day)
    ORDER BY d.day
    """,
    tags=("events", "product", "journeys"),
)
def events_stickiness_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/WAU stickiness per day — the standard engagement-frequency
    ratio ("what fraction of this week's actives came back today?").
    WAU is a 7-day ROLLING distinct-user count; rolling distinct does
    not decompose into window partials, so each (user, day) activity
    row is EXPANDED to the 7 future days it keeps the user "weekly
    active" for, and WAU(d) is a plain count-distinct at day d.

    Scale: the expansion is a map-side 7× fan-out of the user-DAY
    grain (already deduplicated — far smaller than raw events),
    followed by one (day)-keyed distinct aggregate; no non-equi join,
    no ordered window at all. The oracle spells the same semantics as
    a range join, which is fine single-node but would be the wrong
    distributed plan."""
    e = read_table(spark, sf_dir, "events")
    userdays = e.select(
        F.to_date("ts").alias("day"), "user_id"
    ).distinct()
    dau = userdays.groupBy("day").agg(
        F.count("*").cast("bigint").alias("dau")
    )
    contrib = userdays.select(
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), 6))
        ).alias("day"),
        "user_id",
    )
    wau = contrib.groupBy("day").agg(
        F.countDistinct("user_id").cast("bigint").alias("wau")
    )
    return (
        dau.join(wau, "day")
        .select(
            F.col("day").cast("string").alias("day"),
            "dau",
            "wau",
            F.round(F.col("dau").cast("double") / F.col("wau"), 6).alias(
                "stickiness"
            ),
        )
        .orderBy("day")
    )


@register(
    "events_concurrency_peak",
    oracle="""
    WITH spans AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             MIN(ts) AS t0, MAX(ts) AS t1
      FROM events GROUP BY user_id, CAST(ts AS DATE)
    ), pts AS (
      SELECT t0 AS ts, 1 AS delta, user_id FROM spans
      UNION ALL
      SELECT t1 AS ts, -1 AS delta, user_id FROM spans
    ), run AS (
      SELECT ts, delta,
             SUM(delta) OVER (ORDER BY ts, delta DESC, user_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS conc
      FROM pts
    ), mx AS (
      SELECT CAST(MAX(conc) AS BIGINT) AS peak_concurrency FROM run
    )
    SELECT m.peak_concurrency,
           MIN(r.ts) AS first_peak_ts,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM spans) AS n_spans
    FROM run r JOIN mx m ON r.conc = m.peak_concurrency
    GROUP BY m.peak_concurrency
    """,
    tags=("events", "product", "intervals"),
)
def events_concurrency_peak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrency over user activity spans — the classic
    +1/−1 boundary-sweep interval problem ("how many users were on
    simultaneously at the worst moment, and when?"). Each user-day
    span [min ts, max ts] emits a +1 start and a −1 end point; the
    signed running sum over (ts, starts-before-ends, user_id) IS the
    live concurrency, its max is the peak, and the earliest point
    attaining it is the incident timestamp. Touching spans count as
    concurrent (start sorts before end at equal ts).

    Scale: spans aggregate first (one user/day-keyed shuffle), the
    sweep is ops.global_running_sum's two-phase range-partitioned
    prefix sum over a SIGNED step column — the exact contract the
    round-7 SUM-not-MAX fix guarantees — and the peak row resolves
    via a 1-row broadcast, not a second global sort."""
    e = read_table(spark, sf_dir, "events")
    spans = e.groupBy(
        "user_id", F.to_date("ts").alias("day")
    ).agg(F.min("ts").alias("t0"), F.max("ts").alias("t1"))
    pts = spans.select(
        F.col("t0").alias("ts"), F.lit(1).alias("delta"), "user_id"
    ).unionAll(
        spans.select(
            F.col("t1").alias("ts"), F.lit(-1).alias("delta"), "user_id"
        )
    )
    run = global_running_sum(
        pts,
        [F.col("ts").asc(), F.col("delta").desc(), F.col("user_id").asc()],
        "delta",
        out_col="conc",
    )
    mx = run.agg(F.max("conc").cast("bigint").alias("peak_concurrency"))
    n = spans.agg(F.count("*").cast("bigint").alias("n_spans"))
    return (
        run.join(
            F.broadcast(mx), run["conc"] == mx["peak_concurrency"], "inner"
        )
        .groupBy("peak_concurrency")
        .agg(F.min("ts").alias("first_peak_ts"))
        .crossJoin(F.broadcast(n))
        .select("peak_concurrency", "first_peak_ts", "n_spans")
    )


@register(
    "orders_cohort_ltv",
    oracle="""
    WITH firsts AS (
      SELECT o_custkey,
             DATE_TRUNC('month', MIN(o_orderdate)) AS cohort_month
      FROM orders GROUP BY o_custkey
    ), sized AS (
      SELECT cohort_month, CAST(COUNT(*) AS BIGINT) AS cohort_size
      FROM firsts GROUP BY cohort_month
    ), rev AS (
      SELECT f.cohort_month,
             CAST(DATEDIFF('month', f.cohort_month,
                           DATE_TRUNC('month', o.o_orderdate)) AS INT)
               AS age_months,
             CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS rev_cents
      FROM orders o JOIN firsts f ON o.o_custkey = f.o_custkey
      GROUP BY 1, 2
    )
    SELECT CAST(CAST(r.cohort_month AS DATE) AS VARCHAR) AS cohort_month,
           r.age_months,
           s.cohort_size,
           CAST(SUM(r.rev_cents)
                  OVER (PARTITION BY r.cohort_month ORDER BY r.age_months
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum_rev_cents,
           ROUND(CAST(SUM(r.rev_cents)
                        OVER (PARTITION BY r.cohort_month
                              ORDER BY r.age_months
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS DOUBLE)
                 / s.cohort_size / 100.0, 6) AS ltv_per_customer
    FROM rev r JOIN sized s USING (cohort_month)
    ORDER BY cohort_month, age_months
    """,
    tags=("orders", "product", "cohort"),
)
def orders_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves: customers cohort by first-order
    month, and each cohort's CUMULATIVE revenue per customer is
    tracked by month-age — the curve a growth team reads payback
    periods off. Composes with orders_retention_cohort (same cohort
    axis, revenue instead of presence).

    Scale: first-order month is one customer-keyed aggregate; revenue
    buckets to (cohort, age) grain BEFORE any window, so the
    cumulative-sum window runs over ≤ #months rows per cohort
    partition (bounded by calendar length, independent of order
    volume). Cents stay BIGINT end to end; the per-customer division
    is the only double."""
    o = read_table(spark, sf_dir, "orders")
    firsts = o.groupBy("o_custkey").agg(
        F.date_trunc("month", F.min("o_orderdate")).alias("cohort_month")
    )
    sized = firsts.groupBy("cohort_month").agg(
        F.count("*").cast("bigint").alias("cohort_size")
    )
    rev = (
        o.join(firsts, "o_custkey")
        .groupBy(
            "cohort_month",
            F.months_between(
                F.date_trunc("month", F.col("o_orderdate")),
                F.col("cohort_month"),
            )
            .cast("int")
            .alias("age_months"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("rev_cents")
        )
    )
    w = (
        W.partitionBy("cohort_month")
        .orderBy("age_months")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        rev.join(sized, "cohort_month")
        .select(
            F.col("cohort_month").cast("date").cast("string").alias(
                "cohort_month"
            ),
            "age_months",
            "cohort_size",
            F.sum("rev_cents").over(w).cast("bigint").alias("cum_rev_cents"),
            F.round(
                F.sum("rev_cents").over(w).cast("double")
                / F.col("cohort_size")
                / 100.0,
                6,
            ).alias("ltv_per_customer"),
        )
        .orderBy("cohort_month", "age_months")
    )


@register(
    "finance_max_drawdown",
    oracle="""
    WITH daily AS (
      SELECT c.c_mktsegment,
             CAST(o.o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS rev
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    ), curve AS (
      SELECT c_mktsegment, day, rev,
             MAX(rev) OVER (PARTITION BY c_mktsegment ORDER BY day
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS peak
      FROM daily
    ), dd AS (
      SELECT c_mktsegment, day, rev, peak,
             peak - rev AS drawdown
      FROM curve
    ), mx AS (
      SELECT c_mktsegment,
             CAST(MAX(drawdown) AS BIGINT) AS max_drawdown_cents
      FROM dd GROUP BY c_mktsegment
    )
    SELECT d.c_mktsegment,
           m.max_drawdown_cents,
           CAST(MIN(d.day) AS VARCHAR) AS trough_day,
           ROUND(CAST(m.max_drawdown_cents AS DOUBLE)
                 / MIN(d.peak), 6) AS drawdown_frac
    FROM dd d
    JOIN mx m ON d.c_mktsegment = m.c_mktsegment
             AND d.drawdown = m.max_drawdown_cents
    GROUP BY d.c_mktsegment, m.max_drawdown_cents
    ORDER BY d.c_mktsegment
    """,
    tags=("orders", "finance", "timeseries"),
)
def finance_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown of each market segment's daily-revenue series:
    the largest drop from a historical peak (running max − current),
    plus the trough day and the drop as a fraction of that peak — the
    risk-curve statistic finance applies to any KPI series. Tie on
    equal drawdowns resolves to the earliest trough day, and the
    fraction uses the peak in force AT the trough (MIN(peak) over the
    tied trough rows is exact because peak is constant once drawdown
    is maximal for a given peak).

    Scale: the fact join and daily rollup do all the data-scale work;
    the running-max window then runs per segment over day-grain rows
    (≤ #days per partition, bounded by calendar, not data volume).
    The max-drawdown row resolves by a segment-keyed join, not a
    second ordered pass."""
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    daily = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("c_mktsegment", F.to_date("o_orderdate").alias("day"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("rev")
        )
    )
    wpk = (
        W.partitionBy("c_mktsegment")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    dd = daily.select(
        "c_mktsegment",
        "day",
        "rev",
        F.max("rev").over(wpk).alias("peak"),
    ).withColumn("drawdown", F.col("peak") - F.col("rev"))
    mx = dd.groupBy("c_mktsegment").agg(
        F.max("drawdown").cast("bigint").alias("max_drawdown_cents")
    ).select(
        F.col("c_mktsegment").alias("seg_mx"), "max_drawdown_cents"
    )
    return (
        dd.join(
            mx,
            (dd["c_mktsegment"] == mx["seg_mx"])
            & (dd["drawdown"] == mx["max_drawdown_cents"]),
        )
        .drop("seg_mx")
        .groupBy("c_mktsegment", "max_drawdown_cents")
        .agg(
            F.min("day").cast("string").alias("trough_day"),
            F.round(
                F.col("max_drawdown_cents").cast("double") / F.min("peak"), 6
            ).alias("drawdown_frac"),
        )
        .select(
            "c_mktsegment", "max_drawdown_cents", "trough_day", "drawdown_frac"
        )
        .orderBy("c_mktsegment")
    )


@register(
    "timeseries_cross_correlation",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS rev,
             CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY 1
    ), lags AS (
      SELECT UNNEST([0, 1, 2, 3, 4, 5, 6, 7]) AS lag
    ), paired AS (
      SELECT l.lag, a.rev AS x, b.n_orders AS y
      FROM daily a
      CROSS JOIN lags l
      JOIN daily b ON b.day = a.day - CAST(l.lag AS INT) * INTERVAL 1 DAY
    ), m AS (
      SELECT lag,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(x AS HUGEINT)) AS DOUBLE) AS sx,
             CAST(SUM(CAST(y AS HUGEINT)) AS DOUBLE) AS sy,
             CAST(SUM(CAST(x AS HUGEINT) * x) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(y AS HUGEINT) * y) AS DOUBLE) AS syy,
             CAST(SUM(CAST(x AS HUGEINT) * y) AS DOUBLE) AS sxy
      FROM paired GROUP BY lag
    )
    SELECT lag, CAST(n AS BIGINT) AS n,
           ROUND((n * sxy - sx * sy)
                 / (SQRT(n * sxx - sx * sx) * SQRT(n * syy - sy * sy)),
                 6) AS xcorr
    FROM m
    ORDER BY lag
    """,
    tags=("timeseries", "orders", "stats"),
)
def timeseries_cross_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lagged cross-correlation between daily revenue and daily order
    COUNT ℓ days earlier, ℓ = 0..7 — "does volume lead value, and by
    how many days?" (the CCF a forecaster inspects before adding a
    lagged regressor). Pearson per lag over exact BIGINT day sums;
    edge days without a ℓ-back partner drop out per lag, exactly as
    in the oracle.

    Scale: the day-grain series is tiny after the first rollup; the
    8× lag fan-out and the self-equi-join on (day−ℓ) happen on that
    bounded series, never on raw orders. Moment sums widen to
    DECIMAL(38,0) (rev² ≈ 10²² per day-pair)."""
    o = read_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("rev"),
        F.count("*").cast("bigint").alias("n_orders"),
    )
    lags = spark.range(8).select(F.col("id").cast("int").alias("lag"))
    a = daily.select(F.col("day").alias("d_a"), F.col("rev").alias("x"))
    b = daily.select(F.col("day").alias("d_b"), F.col("n_orders").alias("y"))
    paired = (
        a.crossJoin(F.broadcast(lags))
        .withColumn("d_match", F.expr("date_sub(d_a, lag)"))
        .join(b, F.col("d_match") == F.col("d_b"))
    )
    xd = F.col("x").cast("decimal(38,0)")
    yd = F.col("y").cast("decimal(38,0)")
    m = paired.groupBy("lag").agg(
        F.count("*").cast("double").alias("n"),
        F.sum(xd).cast("double").alias("sx"),
        F.sum(yd).cast("double").alias("sy"),
        F.sum(xd * F.col("x")).cast("double").alias("sxx"),
        F.sum(yd * F.col("y")).cast("double").alias("syy"),
        F.sum(xd * F.col("y")).cast("double").alias("sxy"),
    )
    n, sx, sy, sxx, syy, sxy = (
        F.col(c) for c in ("n", "sx", "sy", "sxx", "syy", "sxy")
    )
    return m.select(
        "lag",
        n.cast("bigint").alias("n"),
        F.round(
            (n * sxy - sx * sy)
            / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)),
            6,
        ).alias("xcorr"),
    ).orderBy("lag")


@register(
    "sample_priority_weighted",
    oracle="""
    WITH w AS (
      SELECT o_orderkey AS id,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS wt,
             CAST(CONCAT('0x', SUBSTRING(md5(CAST(o_orderkey AS VARCHAR)),
                                         1, 10)) AS BIGINT) + 1 AS h
      FROM orders
    ), keyed AS (
      SELECT id, wt, h, (h * 1000000) // wt AS sortkey
      FROM w
    ), lim AS (
      SELECT id, wt, h, sortkey,
             ROW_NUMBER() OVER (ORDER BY sortkey, id) AS rn
      FROM keyed
      ORDER BY sortkey, id LIMIT 21
    ), thr AS (
      SELECT wt * 1099511627776.0 / h AS tau
      FROM lim WHERE rn = 21
    )
    SELECT l.id AS o_orderkey, l.wt AS weight_cents,
           ROUND(l.wt * 1099511627776.0 / l.h, 2) AS priority,
           ROUND(t.tau, 2) AS tau,
           ROUND(GREATEST(CAST(l.wt AS DOUBLE), t.tau) / 100.0, 2)
             AS est_dollars
    FROM lim l CROSS JOIN thr t
    WHERE l.rn <= 20
    ORDER BY o_orderkey
    """,
    tags=("sample", "orders"),
)
def sample_priority_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Priority sampling (Duffield, Lund & Thorup, JACM 2007): each
    record draws priority wᵢ/uᵢ from a hash-derived uniform uᵢ, the
    top-k priorities form the sample, and max(wᵢ, τ) — τ the (k+1)-th
    priority — is an UNBIASED estimator of any subset's weight sum:
    THE way to keep a tiny weighted sample of a 100 TB fact stream
    that still answers "how much revenue did segment X have?". k=20
    over orders weighted by order value; deterministic (md5-derived
    u, no RNG — identical sample on every rerun and retry).

    Engine-exact: the selection ORDER is the integer key
    (h·10⁶ div w) ascending (h/w ascending ⇔ priority descending) with
    id tiebreaks — floor-division collisions fall to the tiebreak, so
    both engines pick the identical k+1 rows; τ and the estimates are
    then closed-form doubles over those rows' exact (w, h).

    Scale: the whole query is a map-side key computation plus ONE
    TakeOrderedAndProject head of k+1 rows (per-partition heaps, no
    global sort, no shuffle of the fact table); the threshold fold-in
    is a 1-row broadcast. Envelope: h ≤ 2⁴⁰ so h·10⁶ < 2⁶³ always;
    any integer weight ≥ 1 is admissible."""
    o = read_table(spark, sf_dir, "orders")
    wt = F.round(F.col("o_totalprice") * 100).cast("bigint")
    h = (
        F.conv(
            F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 10),
            16,
            10,
        ).cast("long")
        + 1
    )
    keyed = o.select(
        F.col("o_orderkey").alias("id"),
        wt.alias("wt"),
        h.alias("h"),
    ).withColumn(
        # exact bigint floor division — h·10⁶ can exceed 2⁵³, so the
        # double-division spelling would round the numerator; `div`
        # stays in integer arithmetic like the oracle's `//`.
        "sortkey",
        F.expr("(h * 1000000L) div wt").cast("bigint"),
    )
    lim = keyed.orderBy("sortkey", "id").limit(21)
    boundary = lim.agg(
        F.max(F.struct("sortkey", "id")).alias("m")
    ).select(F.col("m.sortkey").alias("bk"), F.col("m.id").alias("bid"))
    tau_row = (
        lim.join(
            F.broadcast(boundary),
            (F.col("sortkey") == F.col("bk")) & (F.col("id") == F.col("bid")),
        )
        .select(
            (F.col("wt") * 1099511627776.0 / F.col("h")).alias("tau"),
            "bk",
            "bid",
        )
    )
    return (
        lim.crossJoin(F.broadcast(tau_row))
        .where(
            (F.col("sortkey") != F.col("bk")) | (F.col("id") != F.col("bid"))
        )
        .select(
            F.col("id").alias("o_orderkey"),
            F.col("wt").alias("weight_cents"),
            F.round(F.col("wt") * 1099511627776.0 / F.col("h"), 2).alias(
                "priority"
            ),
            F.round(F.col("tau"), 2).alias("tau"),
            F.round(
                F.greatest(F.col("wt").cast("double"), F.col("tau")) / 100.0,
                2,
            ).alias("est_dollars"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "timeseries_theil_sen_trend",
    oracle="""
    WITH monthly AS (
      SELECT c.c_mktsegment AS seg,
             DATE_DIFF('month', DATE '1990-01-01',
                       DATE_TRUNC('month', o.o_orderdate)) AS m,
             CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS rev
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    ), pairs AS (
      SELECT a.seg,
             CAST(b.rev - a.rev AS DOUBLE) / (b.m - a.m) AS slope
      FROM monthly a JOIN monthly b
        ON a.seg = b.seg AND b.m > a.m
    )
    SELECT seg,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           ROUND(MEDIAN(slope) / 100.0, 6) AS theil_sen_dollars_per_month
    FROM pairs
    GROUP BY seg
    ORDER BY seg
    """,
    tags=("timeseries", "stats", "orders"),
)
def timeseries_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend (Theil 1950; Sen, JASA 1968): the median
    of all pairwise slopes of each segment's MONTHLY-revenue series —
    the slope estimator with a 29% breakdown point that one wild
    flash-sale month cannot drag (unlike OLS). Slopes are exact-integer
    differences over exact month gaps, so both engines form identical
    doubles; the median interpolates identically.

    Scale: the O(n²) pair join runs on the MONTH-GRAIN rollup — n is
    bounded by the calendar (~10² months/decade → ≤10⁴ pairs per
    segment), never by order volume; the fact-table work is the one
    monthly aggregate. Month grain is deliberate: Spark's exact
    percentile BUFFERS each group's values, so a decade of DAILY pairs
    (~10⁶ doubles/group) would pressure a 1 GB vanilla driver heap —
    the finer-grain escape hatch is percentile_approx or the Siegel
    repeated median, noted in SCALE.md."""
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    monthly = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.months_between(
                F.date_trunc("month", F.col("o_orderdate")),
                F.lit("1990-01-01").cast("date"),
            )
            .cast("bigint")
            .alias("m"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("rev")
        )
    )
    a = monthly.select(
        F.col("seg"), F.col("m").alias("m1"), F.col("rev").alias("r1")
    )
    b = monthly.select(
        F.col("seg").alias("seg_b"),
        F.col("m").alias("m2"),
        F.col("rev").alias("r2"),
    )
    pairs = a.join(
        b, (F.col("seg") == F.col("seg_b")) & (F.col("m2") > F.col("m1"))
    ).select(
        "seg",
        (
            (F.col("r2") - F.col("r1")).cast("double")
            / (F.col("m2") - F.col("m1"))
        ).alias("slope"),
    )
    return (
        pairs.groupBy("seg")
        .agg(
            F.count("*").cast("bigint").alias("n_pairs"),
            F.round(F.expr("percentile(slope, 0.5)") / 100.0, 6).alias(
                "theil_sen_dollars_per_month"
            ),
        )
        .orderBy("seg")
    )


@register(
    "timeseries_mann_kendall_trend",
    oracle="""
    WITH monthly AS (
      SELECT c.c_mktsegment AS seg,
             DATE_DIFF('month', DATE '1990-01-01',
                       DATE_TRUNC('month', o.o_orderdate)) AS m,
             CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS rev
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    ), s AS (
      SELECT a.seg,
             CAST(SUM(CASE WHEN b.rev > a.rev THEN 1
                           WHEN b.rev < a.rev THEN -1 ELSE 0 END)
                  AS BIGINT) AS s_stat
      FROM monthly a JOIN monthly b ON a.seg = b.seg AND b.m > a.m
      GROUP BY a.seg
    ), nn AS (
      SELECT seg, CAST(COUNT(*) AS BIGINT) AS n FROM monthly GROUP BY seg
    ), ties AS (
      SELECT seg,
             CAST(COALESCE(SUM(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT)
               AS tie_term
      FROM (SELECT seg, rev, CAST(COUNT(*) AS BIGINT) AS t
            FROM monthly GROUP BY seg, rev) g
      WHERE t > 1
      GROUP BY seg
    ), v AS (
      SELECT n.seg, n.n, s.s_stat,
             (n.n * (n.n - 1) * (2 * n.n + 5)
              - COALESCE(t.tie_term, 0)) / 18.0 AS var_s
      FROM nn n
      JOIN s USING (seg)
      LEFT JOIN ties t ON t.seg = n.seg
    )
    SELECT seg, n AS n_months, s_stat,
           ROUND(var_s, 6) AS var_s,
           ROUND(CASE WHEN s_stat > 0 THEN (s_stat - 1) / SQRT(var_s)
                      WHEN s_stat < 0 THEN (s_stat + 1) / SQRT(var_s)
                      ELSE 0.0 END, 6) AS z_stat,
           CASE WHEN ABS(CASE WHEN s_stat > 0
                              THEN (s_stat - 1) / SQRT(var_s)
                              WHEN s_stat < 0
                              THEN (s_stat + 1) / SQRT(var_s)
                              ELSE 0.0 END) > 1.96
                THEN CASE WHEN s_stat > 0 THEN 'increasing'
                          ELSE 'decreasing' END
                ELSE 'no_trend' END AS trend
    FROM v
    ORDER BY seg
    """,
    tags=("timeseries", "stats", "orders"),
)
def timeseries_mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall monotonic-trend test (Mann 1945; Kendall 1975) per
    segment: S = Σ sign(revⱼ − revᵢ) over ordered day pairs, with the
    exact tie-corrected variance and the continuity-corrected z — the
    standard nonparametric "is this KPI actually drifting?" gate used
    before anyone fits a trend line. S and the tie term are exact
    BIGINTs; z is one closed-form double.

    Scale: same month-grain pair join as Theil-Sen (calendar-bounded,
    never data-bounded; S is a streaming SUM so no group buffering at
    all); the tie correction is a (seg, rev)-keyed count — one extra
    map-side-combinable aggregate."""
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    monthly = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.months_between(
                F.date_trunc("month", F.col("o_orderdate")),
                F.lit("1990-01-01").cast("date"),
            )
            .cast("bigint")
            .alias("m"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("rev")
        )
    )
    a = monthly.select("seg", F.col("m").alias("m1"), F.col("rev").alias("r1"))
    b = monthly.select(
        F.col("seg").alias("seg_b"),
        F.col("m").alias("m2"),
        F.col("rev").alias("r2"),
    )
    s = (
        a.join(b, (F.col("seg") == F.col("seg_b")) & (F.col("m2") > F.col("m1")))
        .groupBy("seg")
        .agg(
            F.sum(
                F.when(F.col("r2") > F.col("r1"), 1)
                .when(F.col("r2") < F.col("r1"), -1)
                .otherwise(0)
            )
            .cast("bigint")
            .alias("s_stat")
        )
    )
    nn = monthly.groupBy("seg").agg(F.count("*").cast("bigint").alias("n"))
    ties = (
        monthly.groupBy("seg", "rev")
        .agg(F.count("*").cast("bigint").alias("t"))
        .where(F.col("t") > 1)
        .groupBy("seg")
        .agg(
            F.coalesce(
                F.sum(
                    F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("tie_term")
        )
    )
    v = (
        nn.join(s, "seg")
        .join(ties, "seg", "left")
        .select(
            "seg",
            "n",
            "s_stat",
            (
                (
                    F.col("n")
                    * (F.col("n") - 1)
                    * (2 * F.col("n") + 5)
                    - F.coalesce(F.col("tie_term"), F.lit(0))
                )
                / 18.0
            ).alias("var_s"),
        )
    )
    z = (
        F.when(
            F.col("s_stat") > 0,
            (F.col("s_stat") - 1) / F.sqrt(F.col("var_s")),
        )
        .when(
            F.col("s_stat") < 0,
            (F.col("s_stat") + 1) / F.sqrt(F.col("var_s")),
        )
        .otherwise(F.lit(0.0))
    )
    return v.select(
        "seg",
        F.col("n").alias("n_months"),
        "s_stat",
        F.round("var_s", 6).alias("var_s"),
        F.round(z, 6).alias("z_stat"),
        F.when(
            F.abs(z) > 1.96,
            F.when(F.col("s_stat") > 0, F.lit("increasing")).otherwise(
                F.lit("decreasing")
            ),
        )
        .otherwise(F.lit("no_trend"))
        .alias("trend"),
    ).orderBy("seg")


@register(
    "orders_interpurchase_percentiles",
    oracle="""
    WITH seq AS (
      SELECT c.c_mktsegment AS seg, o.o_custkey,
             DATEDIFF('day',
                      LAG(o.o_orderdate) OVER (PARTITION BY o.o_custkey
                                               ORDER BY o.o_orderdate,
                                                        o.o_orderkey),
                      o.o_orderdate) AS gap
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ), gaps AS (
      SELECT seg, CAST(gap AS BIGINT) AS gap,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM seq WHERE gap IS NOT NULL GROUP BY seg, gap
    ), cum AS (
      SELECT seg, gap, c,
             SUM(c) OVER (PARTITION BY seg ORDER BY gap
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS cumc,
             SUM(c) OVER (PARTITION BY seg) AS n
      FROM gaps
    ), pct AS (
      SELECT UNNEST([50, 90]) AS pctl
    )
    SELECT c.seg, p.pctl, CAST(MIN(c.n) AS BIGINT) AS n_gaps,
           CAST(MIN(c.gap) AS BIGINT) AS gap_days
    FROM cum c CROSS JOIN pct p
    WHERE c.cumc >= CEIL(p.pctl / 100.0 * c.n)
    GROUP BY c.seg, p.pctl
    ORDER BY c.seg, p.pctl
    """,
    tags=("orders", "product", "timeseries"),
)
def orders_interpurchase_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-purchase-time P50/P90 per market segment — the repeat-
    purchase cadence a lifecycle team sets re-engagement timers from.
    Gaps come from a PER-CUSTOMER lag window (bounded by each
    customer's history); the percentiles are EXACT type-1 quantiles
    read off a (segment, gap)-grain cumulative count — no value
    buffering anywhere, because day gaps are small integers and the
    distinct-gap domain is calendar-bounded (~10³ values), not
    data-bounded. That is the scalable exact-quantile trick for any
    integer-valued metric: histogram at value grain, then one bounded
    cumulative pass (contrast percentile(), which buffers every row
    of the group).

    Engine-exact: thresholds are CEIL(q·n) over exact BIGINTs; the
    answer is the minimal gap meeting the threshold — integers end to
    end."""
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    wlag = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .select(
            F.col("c_mktsegment").alias("seg"),
            "o_custkey",
            F.datediff(
                F.col("o_orderdate"), F.lag("o_orderdate").over(wlag)
            ).alias("gap"),
        )
        .where(F.col("gap").isNotNull())
    )
    gaps = seq.groupBy("seg", F.col("gap").cast("bigint").alias("gap")).agg(
        F.count("*").cast("bigint").alias("c")
    )
    wcum = (
        W.partitionBy("seg")
        .orderBy("gap")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wn = W.partitionBy("seg")
    cum = gaps.select(
        "seg",
        "gap",
        F.sum("c").over(wcum).alias("cumc"),
        F.sum("c").over(wn).alias("n"),
    )
    pct = spark.range(2).select(
        F.when(F.col("id") == 0, 50).otherwise(90).alias("pctl")
    )
    return (
        cum.crossJoin(F.broadcast(pct))
        .where(
            F.col("cumc") >= F.ceil(F.col("pctl") / 100.0 * F.col("n"))
        )
        .groupBy("seg", "pctl")
        .agg(
            F.min("n").cast("bigint").alias("n_gaps"),
            F.min("gap").cast("bigint").alias("gap_days"),
        )
        .orderBy("seg", "pctl")
    )


@register(
    "events_rolling_retention_d1_d7",
    oracle="""
    WITH userdays AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ), dau AS (
      SELECT day, CAST(COUNT(*) AS BIGINT) AS dau
      FROM userdays GROUP BY day
    ), mx AS (
      SELECT MAX(day) AS max_day FROM userdays
    ), ret AS (
      SELECT b.day,
             CAST(SUM(CASE WHEN f1.user_id IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS d1_retained,
             CAST(SUM(CASE WHEN f7.user_id IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS d7_retained
      FROM userdays b
      LEFT JOIN userdays f1
        ON f1.user_id = b.user_id AND f1.day = b.day + INTERVAL 1 DAY
      LEFT JOIN userdays f7
        ON f7.user_id = b.user_id AND f7.day = b.day + INTERVAL 7 DAY
      GROUP BY b.day
    )
    SELECT CAST(r.day AS VARCHAR) AS day, d.dau,
           r.d1_retained,
           ROUND(CAST(r.d1_retained AS DOUBLE) / d.dau, 6) AS d1_rate,
           r.d7_retained,
           ROUND(CAST(r.d7_retained AS DOUBLE) / d.dau, 6) AS d7_rate
    FROM ret r
    JOIN dau d USING (day)
    CROSS JOIN mx
    WHERE r.day + INTERVAL 7 DAY <= mx.max_day
    ORDER BY r.day
    """,
    tags=("events", "product", "journeys"),
)
def events_rolling_retention_d1_d7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling D1/D7 retention: of the users active on day d, the
    fraction active again exactly 1 and exactly 7 days later — the
    unsmoothed bounded-window retention curve growth teams track
    daily (cohort-free, unlike events_cohort_retention_weekly). Days
    whose +7 horizon exceeds the observation window are excluded so
    every reported rate has a full denominator.

    Scale: everything runs on the deduplicated user-DAY grain. Each
    retention horizon is ONE equi-join on (user, day+k) — the shifted
    key is computed map-side, so there is no range join and no window
    at all; the horizon cut is a 1-row max-day broadcast."""
    e = read_table(spark, sf_dir, "events")
    userdays = e.select(F.to_date("ts").alias("day"), "user_id").distinct()
    dau = userdays.groupBy("day").agg(F.count("*").cast("bigint").alias("dau"))
    f1 = userdays.select(
        F.date_sub(F.col("day"), 1).alias("day"),
        F.col("user_id").alias("u1"),
    )
    f7 = userdays.select(
        F.date_sub(F.col("day"), 7).alias("day"),
        F.col("user_id").alias("u7"),
    )
    ret = (
        userdays.join(
            f1,
            (userdays["day"] == f1["day"]) & (userdays["user_id"] == f1["u1"]),
            "left",
        )
        .drop(f1["day"])
        .join(
            f7,
            (userdays["day"] == f7["day"]) & (userdays["user_id"] == f7["u7"]),
            "left",
        )
        .drop(f7["day"])
        .groupBy(userdays["day"])
        .agg(
            F.sum(F.col("u1").isNotNull().cast("long"))
            .cast("bigint")
            .alias("d1_retained"),
            F.sum(F.col("u7").isNotNull().cast("long"))
            .cast("bigint")
            .alias("d7_retained"),
        )
    )
    mx = userdays.agg(F.max("day").alias("max_day"))
    return (
        ret.join(dau, "day")
        .crossJoin(F.broadcast(mx))
        .where(F.date_add(F.col("day"), 7) <= F.col("max_day"))
        .select(
            F.col("day").cast("string").alias("day"),
            "dau",
            "d1_retained",
            F.round(
                F.col("d1_retained").cast("double") / F.col("dau"), 6
            ).alias("d1_rate"),
            "d7_retained",
            F.round(
                F.col("d7_retained").cast("double") / F.col("dau"), 6
            ).alias("d7_rate"),
        )
        .orderBy("day")
    )


@register(
    "timeseries_burst_detection_kleinberg",
    oracle="""
    WITH RECURSIVE counts AS (
      SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n
      FROM events WHERE event_type = 'error'
      GROUP BY 1
    ), base AS (
      SELECT day, n, ROW_NUMBER() OVER (ORDER BY day) AS t FROM counts
    ), params AS (
      SELECT CAST(SUM(n) AS DOUBLE) / COUNT(*) AS lam0,
             CAST(COUNT(*) AS BIGINT) AS tt
      FROM base
    ), costs AS (
      SELECT b.t, b.day, b.n,
             CAST(ROUND((p.lam0 - b.n * LN(p.lam0)) * 1000000) AS BIGINT)
               AS c0,
             CAST(ROUND((2 * p.lam0 - b.n * LN(2 * p.lam0)) * 1000000)
                  AS BIGINT) AS c1,
             CAST(ROUND(LN(CAST(p.tt AS DOUBLE)) * 1000000) AS BIGINT)
               AS tr
      FROM base b CROSS JOIN params p
    ), dp AS (
      SELECT t, day, n, c0 AS v0, c1 + tr AS v1, tr
      FROM costs WHERE t = 1
      UNION ALL
      SELECT c.t, c.day, c.n,
             c.c0 + LEAST(d.v0, d.v1),
             c.c1 + LEAST(d.v0 + c.tr, d.v1),
             c.tr
      FROM dp d JOIN costs c ON c.t = d.t + 1
    )
    SELECT CAST(day AS VARCHAR) AS day, n AS n_events, v0, v1,
           CAST(v1 < v0 AS BOOLEAN) AS in_burst
    FROM dp
    ORDER BY day
    """,
    tags=("timeseries", "events", "stateful"),
)
def timeseries_burst_detection_kleinberg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kleinberg burst detection (KDD 2002), two-state automaton over
    the daily error-count series: state 0 emits at the base rate
    lambda0, state 1 at 2*lambda0, switching INTO burst costs
    gamma = ln(T); the forward dynamic program's running costs (v0, v1)
    mark a day as bursting when the burst state is strictly cheaper -
    the principled alternative to threshold alerts (a one-day spike is
    absorbed by the transition cost; a sustained elevation flips the
    state). Poisson emission costs drop the state-independent ln(n!)
    term, which cancels in every comparison - so no factorial/lgamma
    is needed in either engine.

    Engine-exact: all per-day costs fix-point to e6 BIGINTs BEFORE the
    DP, so the entire recurrence is integer min/plus arithmetic -
    identical in pandas (Spark side) and the recursive CTE (oracle);
    ln carries the documented 1-ulp allowance under the rounding.

    Scale: the data-scale work is ONE day-keyed count; the DP is
    inherently sequential but runs on the CALENDAR-bounded series
    (~10^3 rows/decade) inside one applyInPandas group - the same
    bounded-stateful shape as the M4/seasonal family. Per-key burst
    detection over many series parallelizes by the group key for
    free."""
    import math

    import pandas as _pd

    e = read_table(spark, sf_dir, "events")
    counts = (
        e.where(F.col("event_type") == "error")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.count("*").cast("bigint").alias("n"))
        .withColumn("g", F.lit(1))
    )

    def dp(pdf: _pd.DataFrame) -> _pd.DataFrame:
        pdf = pdf.sort_values("day").reset_index(drop=True)
        s_total = int(pdf["n"].sum())
        t_len = len(pdf)
        lam0 = s_total / t_len

        def _rha(x: float) -> int:
            # SQL ROUND semantics (half away from zero); Python's
            # built-in round() is banker's (half to even) and would
            # diverge from the DuckDB oracle on exact .5 costs.
            return int(math.copysign(math.floor(abs(x) + 0.5), x))

        tr = _rha(math.log(float(t_len)) * 1_000_000)
        days, ns, v0s, v1s, bursts = [], [], [], [], []
        v0 = v1 = None
        for _, r in pdf.iterrows():
            n = int(r["n"])
            c0 = _rha((lam0 - n * math.log(lam0)) * 1_000_000)
            c1 = _rha((2 * lam0 - n * math.log(2 * lam0)) * 1_000_000)
            if v0 is None:
                v0, v1 = c0, c1 + tr
            else:
                v0, v1 = (
                    c0 + min(v0, v1),
                    c1 + min(v0 + tr, v1),
                )
            days.append(str(r["day"]))
            ns.append(n)
            v0s.append(v0)
            v1s.append(v1)
            bursts.append(v1 < v0)
        return _pd.DataFrame(
            {
                "day": days,
                "n_events": ns,
                "v0": v0s,
                "v1": v1s,
                "in_burst": bursts,
            }
        )

    return (
        counts.groupBy("g")
        .applyInPandas(
            dp,
            "day string, n_events long, v0 long, v1 long, in_burst boolean",
        )
        .orderBy("day")
    )


@register(
    "timeseries_anomaly_shesd",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1
    ), seas AS (
      SELECT DAYOFWEEK(day) AS dow, MEDIAN(n) AS med_dow
      FROM daily GROUP BY 1
    ), resid AS (
      SELECT d.day, d.n, d.n - s.med_dow AS r
      FROM daily d JOIN seas s ON DAYOFWEEK(d.day) = s.dow
    ), m1 AS (
      SELECT MEDIAN(r) AS med, MEDIAN(ABS(r - (SELECT MEDIAN(r) FROM resid)))
               AS mad
      FROM resid
    ), z1 AS (
      SELECT r.day, r.n, r.r,
             ABS(r.r - m.med) / (1.4826 * m.mad) AS z,
             ROW_NUMBER() OVER (ORDER BY ABS(r.r - m.med) DESC, r.day) AS rn
      FROM resid r CROSS JOIN m1 m
    ), o1 AS (SELECT * FROM z1 WHERE rn = 1),
    rem2 AS (SELECT day, n, r FROM z1 WHERE rn > 1),
    m2 AS (
      SELECT MEDIAN(r) AS med, MEDIAN(ABS(r - (SELECT MEDIAN(r) FROM rem2)))
               AS mad
      FROM rem2
    ), z2 AS (
      SELECT r.day, r.n, r.r,
             ABS(r.r - m.med) / (1.4826 * m.mad) AS z,
             ROW_NUMBER() OVER (ORDER BY ABS(r.r - m.med) DESC, r.day) AS rn
      FROM rem2 r CROSS JOIN m2 m
    ), o2 AS (SELECT * FROM z2 WHERE rn = 1),
    rem3 AS (SELECT day, n, r FROM z2 WHERE rn > 1),
    m3 AS (
      SELECT MEDIAN(r) AS med, MEDIAN(ABS(r - (SELECT MEDIAN(r) FROM rem3)))
               AS mad
      FROM rem3
    ), z3 AS (
      SELECT r.day, r.n, r.r,
             ABS(r.r - m.med) / (1.4826 * m.mad) AS z,
             ROW_NUMBER() OVER (ORDER BY ABS(r.r - m.med) DESC, r.day) AS rn
      FROM rem3 r CROSS JOIN m3 m
    ), o3 AS (SELECT * FROM z3 WHERE rn = 1),
    outs AS (
      SELECT 1 AS round, day, n, r, z FROM o1
      UNION ALL SELECT 2, day, n, r, z FROM o2
      UNION ALL SELECT 3, day, n, r, z FROM o3
    )
    SELECT round, CAST(day AS VARCHAR) AS day, n AS n_events,
           ROUND(r, 6) AS residual, ROUND(z, 6) AS z_score
    FROM outs WHERE z > 3.0
    ORDER BY round
    """,
    tags=("timeseries", "events", "anomaly"),
)
def timeseries_anomaly_shesd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-Hybrid ESD anomaly detection (Hochenbaum, Vallis &
    Kejariwal 2017 — the Twitter AnomalyDetection algorithm, simplified
    to a fixed 3σ robust threshold in place of the t-quantile ladder):
    remove day-of-week seasonality with PER-DOW MEDIANS, then run three
    unrolled ESD rounds — each takes the remaining days' median/MAD,
    flags the most extreme residual if its robust z exceeds 3, and
    removes it before re-estimating — the repeated re-estimation is
    what lets ESD find the SECOND anomaly that a one-shot z-score
    misses when the first one inflates the spread (masking).

    Engine-exact: residuals are integer-or-half values (integer counts
    minus medians), every median/MAD interpolates identically, and
    each round's argmax breaks ties by day.

    Scale: one day-keyed count is the only data-scale pass; all three
    rounds run on the CALENDAR-bounded residual table (the tiny
    per-round windows sort ≤10³ rows). k rounds unroll statically —
    the plan is k small passes, not a loop."""
    e = read_table(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").cast("bigint").alias("n")
    )
    seas = daily.groupBy(F.dayofweek("day").alias("dow")).agg(
        F.expr("percentile(n, 0.5)").alias("med_dow")
    )
    resid = (
        daily.withColumn("dow", F.dayofweek("day"))
        .join(F.broadcast(seas), "dow")
        .select("day", "n", (F.col("n") - F.col("med_dow")).alias("r"))
    )

    from blow_spark.materialize import spill_to_parquet

    def esd_round(rem: DataFrame, rno: int):
        # spill the round input: each round is referenced by both the
        # flagged-row branch and the remainder branch, and rounds nest
        # — without the spill the day-grain plan re-inlines ~2^k times
        # (and the naive argmax-by-window variant put 12 single-
        # partition windows in the plan; the broadcast argmax below
        # puts zero)
        rem = spill_to_parquet(rem, f"blow_spark_shesd_{rno}_")
        med = rem.agg(F.expr("percentile(r, 0.5)").alias("med"))
        mad = (
            rem.crossJoin(F.broadcast(med))
            .agg(
                F.expr("percentile(abs(r - med), 0.5)").alias("mad"),
                F.first("med").alias("med"),
            )
        )
        z = rem.crossJoin(F.broadcast(mad)).select(
            "day",
            "n",
            "r",
            (F.abs(F.col("r") - F.col("med")) / (1.4826 * F.col("mad"))).alias(
                "z"
            ),
            F.abs(F.col("r") - F.col("med")).alias("dev"),
        )
        mx = z.agg(F.max("dev").alias("mxdev"))
        pick = (
            z.join(F.broadcast(mx), F.col("dev") == F.col("mxdev"))
            .agg(F.min("day").alias("pick_day"))
        )
        out = z.join(
            F.broadcast(pick), F.col("day") == F.col("pick_day")
        ).select(F.lit(rno).alias("round"), "day", "n", "r", "z")
        rest = z.join(
            F.broadcast(pick), F.col("day") == F.col("pick_day"), "left_anti"
        ).select("day", "n", "r")
        return out, rest

    o1, rem2 = esd_round(resid, 1)
    o2, rem3 = esd_round(rem2, 2)
    o3, _ = esd_round(rem3, 3)
    outs = o1.unionAll(o2).unionAll(o3)
    return (
        outs.where(F.col("z") > 3.0)
        .select(
            "round",
            F.col("day").cast("string").alias("day"),
            F.col("n").alias("n_events"),
            F.round("r", 6).alias("residual"),
            F.round("z", 6).alias("z_score"),
        )
        .orderBy("round")
    )


@register(
    "events_decayed_engagement_score",
    oracle="""
    WITH ref AS (
      SELECT MAX(ts) AS t_ref FROM events
    ), weighted AS (
      SELECT e.user_id,
             CASE WHEN DATEDIFF('day', CAST(e.ts AS DATE),
                                CAST(r.t_ref AS DATE)) // 7 >= 40
                  THEN 0
                  ELSE (CAST(1099511627776 AS BIGINT) >>
                        (DATEDIFF('day', CAST(e.ts AS DATE),
                                  CAST(r.t_ref AS DATE)) // 7))
             END AS w
      FROM events e CROSS JOIN ref r
    )
    SELECT user_id,
           CAST(SUM(w) AS BIGINT) AS score,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM weighted
    GROUP BY user_id
    ORDER BY score DESC, user_id
    LIMIT 20
    """,
    tags=("events", "product", "feature"),
)
def events_decayed_engagement_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-decayed engagement score with WEEKLY HALVING: each event
    contributes 2^(40 − age_weeks) units, so last week's action is
    worth twice the week before's — the standard recency-weighted
    counter behind ranking features and churn scores, in its
    EXACT-integer form (the smooth exp(−λt) variant multiplies a
    per-event transcendental into the sum; halving per whole week is
    a power of two, so scores are exact BIGINTs, reproducible across
    engines, retries, and reorderings — no 1-ulp exposure at all).
    Top-20 users, ties by id.

    Scale: the reference time is a 1-row broadcast; the weight is a
    map-side shift; then ONE user-keyed sum and a
    TakeOrderedAndProject head. Envelope: 2⁴⁰ max weight × 10⁶
    events/user stays under 2⁶³; the 40-week clamp zeroes the tail
    rather than shifting past the word."""
    e = read_table(spark, sf_dir, "events")
    ref = e.agg(F.max("ts").alias("t_ref"))
    return (
        e.crossJoin(F.broadcast(ref))
        .withColumn(
            "weeks",
            (F.datediff(F.to_date("t_ref"), F.to_date("ts")) / 7).cast(
                "int"
            ),
        )
        .select(
            "user_id",
            F.when(F.col("weeks") >= 40, F.lit(0).cast("bigint"))
            .otherwise(
                F.expr(
                    "shiftright(CAST(1099511627776 AS BIGINT),"
                    " CAST(weeks AS INT))"
                )
            )
            .alias("w"),
        )
        .groupBy("user_id")
        .agg(
            F.sum("w").cast("bigint").alias("score"),
            F.count("*").cast("bigint").alias("n_events"),
        )
        .orderBy(F.col("score").desc(), F.col("user_id").asc())
        .limit(20)
    )


@register(
    "events_hourly_load_p95",
    oracle="""
    WITH hourly AS (
      SELECT DAYOFWEEK(CAST(ts AS DATE)) + 1 AS dow,
             EXTRACT(HOUR FROM ts) AS hr,
             CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS load
      FROM events GROUP BY 1, 2, 3
    ), vals AS (
      SELECT dow, hr, load, CAST(COUNT(*) AS BIGINT) AS c
      FROM hourly GROUP BY dow, hr, load
    ), cum AS (
      SELECT dow, hr, load,
             SUM(c) OVER (PARTITION BY dow, hr ORDER BY load
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS cumc,
             SUM(c) OVER (PARTITION BY dow, hr) AS n
      FROM vals
    )
    SELECT dow, hr, CAST(MIN(n) AS BIGINT) AS n_slots,
           CAST(MIN(load) AS BIGINT) AS p95_load
    FROM cum
    WHERE cumc >= CEIL(0.95 * n)
    GROUP BY dow, hr
    ORDER BY dow, hr
    """,
    tags=("events", "product", "capacity"),
)
def events_hourly_load_p95(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P95 hourly event load per (day-of-week, hour) slot — the
    capacity-planning percentile an SRE sizes autoscaling floors
    from. Exact type-1 quantiles via the integer-metric histogram
    trick (value-grain counts + bounded cumulative pass — loads are
    integers, so no percentile() buffering), the same pattern as
    orders_interpurchase_percentiles.

    Scale: one (dow, hr, day)-keyed count over events, then all work
    runs on the slot×load grain (bounded by calendar × distinct load
    values); cumulative windows partition per slot."""
    e = read_table(spark, sf_dir, "events")
    hourly = e.groupBy(
        F.dayofweek(F.to_date("ts")).alias("dow"),
        F.hour("ts").alias("hr"),
        F.to_date("ts").alias("day"),
    ).agg(F.count("*").cast("bigint").alias("load"))
    vals = hourly.groupBy("dow", "hr", "load").agg(
        F.count("*").cast("bigint").alias("c")
    )
    wc = (
        W.partitionBy("dow", "hr")
        .orderBy("load")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wn = W.partitionBy("dow", "hr")
    cum = vals.select(
        "dow",
        "hr",
        "load",
        F.sum("c").over(wc).alias("cumc"),
        F.sum("c").over(wn).alias("n"),
    )
    return (
        cum.where(F.col("cumc") >= F.ceil(0.95 * F.col("n")))
        .groupBy("dow", "hr")
        .agg(
            F.min("n").cast("bigint").alias("n_slots"),
            F.min("load").cast("bigint").alias("p95_load"),
        )
        .orderBy("dow", "hr")
    )


# Spend-tier bands (cents) for the migration matrix and the timeline
# midpoint split. Bands chosen so all three tiers are populated at the
# gate SFs (per-customer half-period spend ~ 10^7-10^8 cents).
_MIG_LOW_CENTS = 50_000_000
_MIG_MID_CENTS = 100_000_000


@register(
    "orders_tier_migration_matrix",
    oracle=f"""
    WITH bounds AS (
      SELECT MIN(o_orderdate) AS lo, MAX(o_orderdate) AS hi FROM orders
    ), tagged AS (
      SELECT o.o_custkey,
             CASE WHEN o.o_orderdate <
                       b.lo + TO_SECONDS((CAST(EPOCH(b.hi) AS BIGINT)
                                          - CAST(EPOCH(b.lo) AS BIGINT)) // 2)
                  THEN 'p1' ELSE 'p2' END AS period,
             CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS cents
      FROM orders o CROSS JOIN bounds b
    ), spend AS (
      SELECT o_custkey, period,
             CAST(SUM(cents) AS BIGINT) AS tot
      FROM tagged GROUP BY o_custkey, period
    ), tiers AS (
      SELECT o_custkey, period,
             CASE WHEN tot < {_MIG_LOW_CENTS} THEN 'low'
                  WHEN tot < {_MIG_MID_CENTS} THEN 'mid'
                  ELSE 'high' END AS tier
      FROM spend
    ), p1 AS (SELECT o_custkey, tier AS tier_from FROM tiers
              WHERE period = 'p1'),
    p2 AS (SELECT o_custkey, tier AS tier_to FROM tiers
           WHERE period = 'p2')
    SELECT COALESCE(p1.tier_from, 'absent') AS tier_from,
           COALESCE(p2.tier_to, 'absent') AS tier_to,
           CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM p1 FULL OUTER JOIN p2 ON p1.o_custkey = p2.o_custkey
    GROUP BY 1, 2
    ORDER BY tier_from, tier_to
    """,
    tags=("orders", "product", "lifecycle"),
)
def orders_tier_migration_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spend-tier migration matrix between the two halves of the
    observation window: each customer tiers (low/mid/high, fixed cent
    bands) by half-period spend, and the FULL-OUTER transition counts
    — including churn-to-absent and new-from-absent — are the
    lifecycle flow a CRM team reads upgrade/downgrade/churn rates
    off. The timeline midpoint derives from the data (1-row min/max
    broadcast), so the query is calendar-free.

    Scale: one customer×period-keyed sum, a map-side CASE tier, and a
    customer-keyed full-outer self-join of the two period slices —
    every shuffle is on the customer key; output is the constant
    4×4 tier matrix."""
    o = read_table(spark, sf_dir, "orders")
    bounds = o.agg(
        F.min("o_orderdate").alias("lo"), F.max("o_orderdate").alias("hi")
    )
    diff = F.unix_timestamp("hi") - F.unix_timestamp("lo")
    mid = F.timestamp_seconds(
        (F.unix_timestamp("lo") + (diff - diff % 2) / 2).cast("long")
    )
    tagged = o.crossJoin(F.broadcast(bounds)).select(
        "o_custkey",
        F.when(F.col("o_orderdate") < mid, "p1").otherwise("p2").alias(
            "period"
        ),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    spend = tagged.groupBy("o_custkey", "period").agg(
        F.sum("cents").cast("bigint").alias("tot")
    )
    tiers = spend.select(
        "o_custkey",
        "period",
        F.when(F.col("tot") < _MIG_LOW_CENTS, "low")
        .when(F.col("tot") < _MIG_MID_CENTS, "mid")
        .otherwise("high")
        .alias("tier"),
    )
    p1 = tiers.where(F.col("period") == "p1").select(
        F.col("o_custkey").alias("ck1"), F.col("tier").alias("tier_from")
    )
    p2 = tiers.where(F.col("period") == "p2").select(
        F.col("o_custkey").alias("ck2"), F.col("tier").alias("tier_to")
    )
    return (
        p1.join(p2, F.col("ck1") == F.col("ck2"), "full_outer")
        .groupBy(
            F.coalesce(F.col("tier_from"), F.lit("absent")).alias(
                "tier_from"
            ),
            F.coalesce(F.col("tier_to"), F.lit("absent")).alias("tier_to"),
        )
        .agg(F.count("*").cast("bigint").alias("n_customers"))
        .orderBy("tier_from", "tier_to")
    )


@register(
    "orders_dow_effect_anova",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             DAYOFWEEK(CAST(o_orderdate AS DATE)) + 1 AS dow,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS rev
      FROM orders GROUP BY 1, 2
    ), g AS (
      SELECT dow,
             CAST(COUNT(*) AS BIGINT) AS n_g,
             CAST(SUM(rev) AS DOUBLE) AS s_g,
             CAST(SUM(CAST(rev AS HUGEINT) * rev) AS DOUBLE) AS ss_g
      FROM daily GROUP BY dow
    ), t AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(n_g) AS BIGINT) AS n,
             SUM(s_g) AS s, SUM(ss_g) AS ss,
             SUM(s_g * s_g / n_g) AS sb
      FROM g
    )
    SELECT k, n,
           ROUND((sb - s * s / n) / (k - 1)
                 / ((ss - sb) / (n - k)), 6) AS f_stat,
           ROUND((sb - s * s / n) / (ss - s * s / n), 6) AS eta_squared,
           CAST((sb - s * s / n) / (k - 1) / ((ss - sb) / (n - k)) > 2.1
                AS BOOLEAN) AS dow_effect_at_05
    FROM t
    """,
    tags=("orders", "timeseries", "stats"),
)
def orders_dow_effect_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week effect test on daily revenue: one-way ANOVA of the
    day-grain revenue series across the 7 weekday groups — the "is
    there real weekly seasonality?" gate a forecaster runs BEFORE
    fitting seasonal terms (and the justification step for
    orders_seasonal_index's per-dow factors). F compares against the
    F(6, large) 95th percentile ≈ 2.1.

    Scale: the only data-scale pass is the daily rollup; the moment
    aggregate runs on the calendar-bounded day table (7 output
    rows → 1-row combine)."""
    o = read_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.to_date("o_orderdate").alias("day"),
        F.dayofweek(F.to_date("o_orderdate")).alias("dow"),
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("rev")
    )
    revd = F.col("rev").cast("decimal(38,0)")
    g = daily.groupBy("dow").agg(
        F.count("*").cast("bigint").alias("n_g"),
        F.sum("rev").cast("double").alias("s_g"),
        F.sum(revd * F.col("rev")).cast("double").alias("ss_g"),
    )
    t = g.agg(
        F.count("*").cast("bigint").alias("k"),
        F.sum("n_g").cast("bigint").alias("n"),
        F.sum("s_g").alias("s"),
        F.sum("ss_g").alias("ss"),
        F.sum(F.col("s_g") * F.col("s_g") / F.col("n_g")).alias("sb"),
    )
    k, n, s, ss, sb = (F.col(c) for c in ("k", "n", "s", "ss", "sb"))
    fstat = (sb - s * s / n) / (k - 1) / ((ss - sb) / (n - k))
    return t.select(
        "k",
        "n",
        F.round(fstat, 6).alias("f_stat"),
        F.round((sb - s * s / n) / (ss - s * s / n), 6).alias("eta_squared"),
        (fstat > 2.1).alias("dow_effect_at_05"),
    )


@register(
    "timeseries_wow_change_alerts",
    oracle="""
    WITH weekly AS (
      SELECT event_type,
             DATE_DIFF('week', DATE '1990-01-01',
                       DATE_TRUNC('week', CAST(ts AS DATE))) AS wk,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ), lagged AS (
      SELECT event_type, wk, n,
             LAG(n) OVER (PARTITION BY event_type ORDER BY wk) AS prev_n,
             LAG(wk) OVER (PARTITION BY event_type ORDER BY wk) AS prev_wk
      FROM weekly
    )
    SELECT event_type, wk, n, prev_n,
           ROUND((CAST(n AS DOUBLE) - prev_n) / prev_n, 6) AS wow_change,
           CAST(ABS((CAST(n AS DOUBLE) - prev_n) / prev_n) > 0.2
                AS BOOLEAN) AS alert_20pct
    FROM lagged
    WHERE prev_n IS NOT NULL AND prev_wk = wk - 1
    ORDER BY event_type, wk
    """,
    tags=("timeseries", "events", "anomaly"),
)
def timeseries_wow_change_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week volume change per event type with a ±20% alert
    flag — the simplest production health monitor (every metrics
    platform ships it before anything model-based), made
    gap-correct: a week following a MISSING week is excluded rather
    than silently compared against a stale predecessor (the prev_wk =
    wk−1 guard — the subtle bug in naive LAG-based WoW).

    Scale: one (type, week)-keyed count; the lag window partitions
    per event type over calendar-bounded week rows."""
    e = read_table(spark, sf_dir, "events")
    weekly = e.groupBy(
        "event_type",
        (
            F.datediff(
                F.date_trunc("week", F.to_date("ts")),
                F.lit("1990-01-01").cast("date"),
            )
            / 7
        )
        .cast("bigint")
        .alias("wk"),
    ).agg(F.count("*").cast("bigint").alias("n"))
    w = W.partitionBy("event_type").orderBy("wk")
    lagged = weekly.select(
        "event_type",
        "wk",
        "n",
        F.lag("n").over(w).alias("prev_n"),
        F.lag("wk").over(w).alias("prev_wk"),
    )
    chg = (F.col("n").cast("double") - F.col("prev_n")) / F.col("prev_n")
    return (
        lagged.where(
            F.col("prev_n").isNotNull() & (F.col("prev_wk") == F.col("wk") - 1)
        )
        .select(
            "event_type",
            "wk",
            "n",
            "prev_n",
            F.round(chg, 6).alias("wow_change"),
            (F.abs(chg) > 0.2).alias("alert_20pct"),
        )
        .orderBy("event_type", "wk")
    )
