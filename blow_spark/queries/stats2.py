"""Second statistics battery: one-way ANOVA, Jarque-Bera normality,
Benford first-digit law, Cohen's d / Hedges' g effect sizes, the
two-sample Kolmogorov-Smirnov test, and Spearman rank correlation.

Together with stats.py (Welch t, chi-square, Mann-Whitney U, BH-FDR)
this completes the classical-inference shelf an experimentation /
data-quality platform needs on top of the catalog's metric tables.
Every test reduces to exact integer/decimal moment or count sums (one
keyed shuffle at most) followed by a closed-form double expression, so
all six are engine-exact and oracle-paired.

The two order-statistics tests (KS, Spearman) are the interesting ones
at 100 TB: both need a GLOBAL cumulative over a sorted axis, which is
exactly what ops.global_running_sum provides without any data-scale
single-partition window — range-partition on the sort key, per-
partition prefix sums, constant-size offsets branch. KS additionally
folds its two arms' ECDFs into ONE signed running sum
(n1·c0 − n0·c1), exercising the signed-value contract fixed in round
7 (ops.py global_running_sum).

Reference parity note: the reference engine (wizgrao/blow) has no
statistics surface (maps/maps.go:8-14 is its whole operator
vocabulary); these are extension operators from the task brief's
analytics mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from blow_spark.ops import global_running_sum
from blow_spark.queries import register
from blow_spark.sources import read_table

# KS rejection threshold: c(alpha)=1.358 for alpha=0.05 (two-sided,
# large-sample Smirnov approximation).
_KS_C_ALPHA = 1.358


@register(
    "stats_anova_oneway",
    oracle="""
    WITH g AS (
      SELECT o_orderpriority,
             CAST(COUNT(*) AS BIGINT) AS n_g,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                  AS DOUBLE) AS s_g,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS HUGEINT)
                      * CAST(ROUND(o_totalprice * 100) AS BIGINT))
                  AS DOUBLE) AS ss_g
      FROM orders
      GROUP BY o_orderpriority
    ), t AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(n_g) AS BIGINT) AS n,
             SUM(s_g) AS s,
             SUM(ss_g) AS ss,
             SUM(s_g * s_g / n_g) AS sb
      FROM g
    )
    SELECT k, n,
           ROUND((sb - s * s / n) / (k - 1)
                 / ((ss - sb) / (n - k)), 6) AS f_stat,
           ROUND((sb - s * s / n) / (ss - s * s / n), 6) AS eta_squared
    FROM t
    """,
    tags=("stats", "orders"),
)
def stats_anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F-test of order value across the five order
    priorities — "does priority class move spend?". Between/within sums
    of squares come from per-group (n, Σy, Σy²) over exact cent
    integers; F = (SSB/(k−1))/(SSW/(N−k)) and the η² effect size are
    closed-form doubles over those sums.

    Scale: one map-side-combinable groupBy over the fact table (k=5
    output rows), then a 1-row combine — the same two-level aggregate
    shape as every sketch rollup in the catalog; nothing is ordered,
    nothing is broadcast. Σy² widens to DECIMAL(38,0)/HUGEINT (cents²
    ≈ 10¹⁵ → exact past 10²² rows per group)."""
    o = read_table(spark, sf_dir, "orders")
    y = F.round(F.col("o_totalprice") * 100).cast("bigint")
    yd = y.cast("decimal(38,0)")
    g = o.groupBy("o_orderpriority").agg(
        F.count("*").cast("bigint").alias("n_g"),
        F.sum(y).cast("double").alias("s_g"),
        F.sum(yd * y).cast("double").alias("ss_g"),
    )
    t = g.agg(
        F.count("*").cast("bigint").alias("k"),
        F.sum("n_g").cast("bigint").alias("n"),
        F.sum("s_g").alias("s"),
        F.sum("ss_g").alias("ss"),
        F.sum(F.col("s_g") * F.col("s_g") / F.col("n_g")).alias("sb"),
    )
    k, n, s, ss, sb = (F.col(c) for c in ("k", "n", "s", "ss", "sb"))
    return t.select(
        "k",
        "n",
        F.round((sb - s * s / n) / (k - 1) / ((ss - sb) / (n - k)), 6).alias(
            "f_stat"
        ),
        F.round((sb - s * s / n) / (ss - s * s / n), 6).alias("eta_squared"),
    )


@register(
    "stats_jarque_bera",
    oracle="""
    WITH m AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                  AS DOUBLE) AS s1,
             CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS HUGEINT)
                      * CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                  AS DOUBLE) AS s2,
             CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS HUGEINT)
                      * CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                      * CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                  AS DOUBLE) AS s3,
             CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS HUGEINT)
                      * CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                      * CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                      * CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                  AS DOUBLE) AS s4
      FROM lineitem
      GROUP BY l_returnflag
    ), c AS (
      SELECT l_returnflag, n,
             (s3 / n - 3 * (s1 / n) * (s2 / n)
              + 2 * (s1 / n) * (s1 / n) * (s1 / n))
               / ((s2 / n - (s1 / n) * (s1 / n))
                  * SQRT(s2 / n - (s1 / n) * (s1 / n))) AS skw,
             (s4 / n - 4 * (s1 / n) * (s3 / n)
              + 6 * (s1 / n) * (s1 / n) * (s2 / n)
              - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n))
               / ((s2 / n - (s1 / n) * (s1 / n))
                  * (s2 / n - (s1 / n) * (s1 / n))) - 3 AS ek
      FROM m
    )
    SELECT l_returnflag,
           CAST(n AS BIGINT) AS n,
           ROUND(n / 6.0 * (skw * skw + ek * ek / 4.0), 6) AS jb_stat,
           CAST(n / 6.0 * (skw * skw + ek * ek / 4.0) > 5.991
                AS BOOLEAN) AS reject_normal_05
    FROM c
    ORDER BY l_returnflag
    """,
    tags=("stats", "lineitem"),
)
def stats_jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jarque-Bera normality test per group: JB = n/6·(S² + K²/4) over
    the exact sample skewness S and excess kurtosis K (Jarque & Bera
    1980) — the standard "is this metric even remotely Gaussian?" gate
    before anyone quotes a z-interval on it. Rejection compares against
    the chi-square(2) 95th percentile (5.991).

    Scale: identical shape to agg_skewness_kurtosis — ONE map-side-
    combinable moment aggregate (Σx..Σx⁴ as DECIMAL(38,0)/HUGEINT cent
    sums), closed-form doubles after; same 10¹⁰-rows-per-group
    envelope, same m2·sqrt(m2) spelling for the 1.5 power."""
    li = read_table(spark, sf_dir, "lineitem")
    x = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    xd = x.cast("decimal(38,0)")
    m = li.groupBy("l_returnflag").agg(
        F.count("*").cast("double").alias("n"),
        F.sum(x).cast("double").alias("s1"),
        F.sum(xd * x).cast("double").alias("s2"),
        F.sum(xd * x * x).cast("double").alias("s3"),
        F.sum(xd * x * x * x).cast("double").alias("s4"),
    )
    n = F.col("n")
    mean = F.col("s1") / n
    m2 = F.col("s2") / n - mean * mean
    m3 = F.col("s3") / n - 3 * mean * (F.col("s2") / n) + 2 * mean * mean * mean
    m4 = (
        F.col("s4") / n
        - 4 * mean * (F.col("s3") / n)
        + 6 * mean * mean * (F.col("s2") / n)
        - 3 * mean * mean * mean * mean
    )
    skw = m3 / (m2 * F.sqrt(m2))
    ek = m4 / (m2 * m2) - 3
    jb = n / 6.0 * (skw * skw + ek * ek / 4.0)
    return m.select(
        "l_returnflag",
        n.cast("bigint").alias("n"),
        F.round(jb, 6).alias("jb_stat"),
        (jb > 5.991).alias("reject_normal_05"),
    ).orderBy("l_returnflag")


@register(
    "stats_benford_first_digit",
    oracle="""
    WITH d AS (
      SELECT CAST(SUBSTRING(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)
                                 AS VARCHAR), 1, 1) AS INT) AS digit
      FROM orders
      WHERE o_totalprice > 0
    ), obs AS (
      SELECT digit, CAST(COUNT(*) AS BIGINT) AS observed
      FROM d GROUP BY digit
    ), tot AS (
      SELECT CAST(SUM(observed) AS DOUBLE) AS n FROM obs
    ), rows_ AS (
      SELECT o.digit, o.observed,
             t.n * LOG10(1.0 + 1.0 / o.digit) AS expected
      FROM obs o CROSS JOIN tot t
    ), chi AS (
      SELECT SUM((observed - expected) * (observed - expected) / expected)
               AS chi2
      FROM rows_
    )
    SELECT r.digit, r.observed,
           ROUND(r.expected, 6) AS expected,
           ROUND(c.chi2, 6) AS chi2_total,
           CAST(c.chi2 > 15.507 AS BOOLEAN) AS reject_benford_05
    FROM rows_ r CROSS JOIN chi c
    ORDER BY r.digit
    """,
    tags=("stats", "dq", "orders"),
)
def stats_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit screen over order values — the classic
    fabricated-data / broken-upstream detector (Benford 1938; standard
    in fraud audit). The first significant digit is taken from the
    CENT integer's decimal string (exact in both engines — no
    floor(log10(double)) boundary hazard at powers of ten), observed
    counts are compared to N·log10(1+1/d), and the chi-square(8)
    statistic decides at the 95th percentile (15.507).

    Scale: one map-side-combinable 9-group aggregate; the grand total
    and the chi-square fold back as 1-row broadcast cross joins (no
    global window). log10 carries the catalog's documented 1-ulp
    JVM-vs-libm allowance under ROUND-6."""
    o = read_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 0)
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    obs = (
        o.select(
            F.substring(cents.cast("string"), 1, 1).cast("int").alias("digit")
        )
        .groupBy("digit")
        .agg(F.count("*").cast("bigint").alias("observed"))
    )
    tot = obs.agg(F.sum("observed").cast("double").alias("n"))
    rows = obs.crossJoin(F.broadcast(tot)).select(
        "digit",
        "observed",
        (F.col("n") * F.log10(1.0 + 1.0 / F.col("digit"))).alias("expected"),
    )
    chi = rows.agg(
        F.sum(
            (F.col("observed") - F.col("expected"))
            * (F.col("observed") - F.col("expected"))
            / F.col("expected")
        ).alias("chi2")
    )
    return (
        rows.crossJoin(F.broadcast(chi))
        .select(
            "digit",
            "observed",
            F.round("expected", 6).alias("expected"),
            F.round("chi2", 6).alias("chi2_total"),
            (F.col("chi2") > 15.507).alias("reject_benford_05"),
        )
        .orderBy("digit")
    )


@register(
    "stats_cohens_d_effect",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             CAST(user_id % 2 AS INT) AS arm,
             CAST(ROUND(COALESCE(SUM(CAST(value AS DECIMAL(18,6))), 0)
                        * 1000000) AS BIGINT) AS yi
      FROM events
      GROUP BY user_id
    ), arms AS (
      SELECT CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
             CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(SUM(CASE WHEN arm = 0 THEN yi ELSE 0 END) AS DOUBLE) AS s0,
             CAST(SUM(CASE WHEN arm = 1 THEN yi ELSE 0 END) AS DOUBLE) AS s1,
             CAST(SUM(CASE WHEN arm = 0
                           THEN CAST(yi AS HUGEINT) * yi ELSE 0 END)
                  AS DOUBLE) AS ss0,
             CAST(SUM(CASE WHEN arm = 1
                           THEN CAST(yi AS HUGEINT) * yi ELSE 0 END)
                  AS DOUBLE) AS ss1
      FROM per_user
    ), d AS (
      SELECT n0, n1,
             (s0 / n0 - s1 / n1)
               / SQRT(((ss0 - s0 * s0 / n0) + (ss1 - s1 * s1 / n1))
                      / (n0 + n1 - 2.0)) AS cd
      FROM arms
    )
    SELECT n0, n1,
           ROUND(cd, 6) AS cohens_d,
           ROUND(cd * (1.0 - 3.0 / (4.0 * (n0 + n1) - 9.0)), 6) AS hedges_g
    FROM d
    """,
    tags=("stats", "experiment", "events"),
)
def stats_cohens_d_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's d standardized effect size between the two hash-assigned
    experiment arms, with the Hedges' g small-sample correction
    (Hedges 1981) — the number a readout quotes NEXT to the p-value so
    "significant" can't hide "trivially small". Pooled SD uses the
    exact (n, Σy, Σy²) per arm from ONE conditional aggregate — the
    same moment table Welch's t reads (stats.py), so the two queries
    stay consistent by construction.

    Scale: one user-keyed shuffle → 1-row moment combine; Σy² widened
    to DECIMAL(38,0)/HUGEINT. Closed-form doubles after."""
    e = read_table(spark, sf_dir, "events")
    per_user = (
        e.groupBy("user_id")
        .agg(
            F.round(
                F.coalesce(F.sum(F.col("value").cast("decimal(18,6)")), F.lit(0))
                * 1_000_000
            )
            .cast("bigint")
            .alias("yi")
        )
        .select((F.col("user_id") % 2).cast("int").alias("arm"), "yi")
    )
    a0 = (F.col("arm") == 0).cast("long")
    a1 = (F.col("arm") == 1).cast("long")
    yi_dec = F.col("yi").cast("decimal(38,0)")
    arms = per_user.agg(
        F.sum(a0).alias("n0"),
        F.sum(a1).alias("n1"),
        F.sum(a0 * F.col("yi")).cast("double").alias("s0"),
        F.sum(a1 * F.col("yi")).cast("double").alias("s1"),
        F.sum(F.when(F.col("arm") == 0, yi_dec * F.col("yi")).otherwise(F.lit(0)))
        .cast("double")
        .alias("ss0"),
        F.sum(F.when(F.col("arm") == 1, yi_dec * F.col("yi")).otherwise(F.lit(0)))
        .cast("double")
        .alias("ss1"),
    )
    n0, n1 = F.col("n0"), F.col("n1")
    s0, s1, ss0, ss1 = (F.col(c) for c in ("s0", "s1", "ss0", "ss1"))
    cd = (s0 / n0 - s1 / n1) / F.sqrt(
        ((ss0 - s0 * s0 / n0) + (ss1 - s1 * s1 / n1)) / (n0 + n1 - 2.0)
    )
    return arms.select(
        "n0",
        "n1",
        F.round(cd, 6).alias("cohens_d"),
        F.round(cd * (1.0 - 3.0 / (4.0 * (n0 + n1) - 9.0)), 6).alias("hedges_g"),
    )


@register(
    "stats_ks_two_sample",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             CAST(user_id % 2 AS INT) AS arm,
             CAST(ROUND(COALESCE(SUM(CAST(value AS DECIMAL(18,6))), 0)
                        * 1000000) AS BIGINT) AS yi
      FROM events
      GROUP BY user_id
    ), vals AS (
      SELECT yi,
             CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
             CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1
      FROM per_user GROUP BY yi
    ), tot AS (
      SELECT CAST(SUM(c0) AS BIGINT) AS n0, CAST(SUM(c1) AS BIGINT) AS n1
      FROM vals
    ), run AS (
      SELECT v.yi,
             SUM(t.n1 * v.c0 - t.n0 * v.c1)
               OVER (ORDER BY v.yi
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS signed_run,
             t.n0, t.n1
      FROM vals v CROSS JOIN tot t
    )
    SELECT n0, n1,
           ROUND(CAST(MAX(ABS(signed_run)) AS DOUBLE) / (n0 * n1), 6)
             AS ks_d,
           ROUND(1.358 * SQRT((n0 + n1) / (1.0 * n0 * n1)), 6) AS crit_05,
           CAST(CAST(MAX(ABS(signed_run)) AS DOUBLE) / (n0 * n1)
                > 1.358 * SQRT((n0 + n1) / (1.0 * n0 * n1))
                AS BOOLEAN) AS reject_05
    FROM run
    GROUP BY n0, n1
    """,
    tags=("stats", "experiment", "events"),
)
def stats_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov test between the two hash-assigned
    arms' per-user metric DISTRIBUTIONS — the nonparametric "did the
    whole shape shift?" companion to Welch's mean test. D =
    max|F0−F1| folds both ECDFs into ONE signed integer running sum:
    at each distinct metric value, n1·c0 − n0·c1 steps the scaled gap
    n0·n1·(F0−F1), so D = max|running|/(n0·n1) — exact integer
    arithmetic until the final division. Rejection uses the Smirnov
    large-sample critical value c(0.05)·sqrt((n0+n1)/(n0·n1)).

    Scale: user-keyed shuffle → value-grain counts (groupBy yi), then
    ops.global_running_sum's two-phase range-partitioned prefix sum —
    NO data-scale single-partition window; the signed value exercises
    the round-7 SUM(tot)-not-MAX(run) fix. Envelope: |running| ≤
    n0·n1 < 2⁶³ up to ~3·10⁹ users per arm; past that the step values
    rescale to DECIMAL(38,0)."""
    e = read_table(spark, sf_dir, "events")
    per_user = (
        e.groupBy("user_id")
        .agg(
            F.round(
                F.coalesce(F.sum(F.col("value").cast("decimal(18,6)")), F.lit(0))
                * 1_000_000
            )
            .cast("bigint")
            .alias("yi")
        )
        .select((F.col("user_id") % 2).cast("int").alias("arm"), "yi")
    )
    vals = per_user.groupBy("yi").agg(
        F.sum((F.col("arm") == 0).cast("long")).cast("bigint").alias("c0"),
        F.sum((F.col("arm") == 1).cast("long")).cast("bigint").alias("c1"),
    )
    tot = vals.agg(
        F.sum("c0").cast("bigint").alias("n0"),
        F.sum("c1").cast("bigint").alias("n1"),
    )
    stepped = vals.crossJoin(F.broadcast(tot)).withColumn(
        "step", F.col("n1") * F.col("c0") - F.col("n0") * F.col("c1")
    )
    run = global_running_sum(stepped, ["yi"], "step", out_col="signed_run")
    d_scaled = run.groupBy("n0", "n1").agg(
        F.max(F.abs(F.col("signed_run"))).alias("max_run")
    )
    n0, n1 = F.col("n0"), F.col("n1")
    ks = F.col("max_run").cast("double") / (n0 * n1)
    crit = _KS_C_ALPHA * F.sqrt((n0 + n1) / (1.0 * n0 * n1))
    return d_scaled.select(
        "n0",
        "n1",
        F.round(ks, 6).alias("ks_d"),
        F.round(crit, 6).alias("crit_05"),
        (ks > crit).alias("reject_05"),
    )


@register(
    "stats_spearman_rank_corr",
    oracle="""
    WITH pairs AS (
      SELECT l_orderkey,
             CAST(ROUND(SUM(l_quantity) * 100) AS BIGINT) AS x,
             CAST(ROUND(SUM(l_extendedprice) * 100) AS BIGINT) AS y
      FROM lineitem GROUP BY l_orderkey
    ), rx AS (
      SELECT l_orderkey,
             2 * (RANK() OVER (ORDER BY x))
               + (COUNT(*) OVER (PARTITION BY x)) - 1 AS rx2
      FROM pairs
    ), ry AS (
      SELECT l_orderkey,
             2 * (RANK() OVER (ORDER BY y))
               + (COUNT(*) OVER (PARTITION BY y)) - 1 AS ry2
      FROM pairs
    ), m AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(rx2 AS HUGEINT)) AS DOUBLE) AS sx,
             CAST(SUM(CAST(ry2 AS HUGEINT)) AS DOUBLE) AS sy,
             CAST(SUM(CAST(rx2 AS HUGEINT) * rx2) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(ry2 AS HUGEINT) * ry2) AS DOUBLE) AS syy,
             CAST(SUM(CAST(rx2 AS HUGEINT) * ry2) AS DOUBLE) AS sxy
      FROM rx JOIN ry USING (l_orderkey)
    )
    SELECT CAST(n AS BIGINT) AS n,
           ROUND((n * sxy - sx * sy)
                 / (SQRT(n * sxx - sx * sx) * SQRT(n * syy - sy * sy)),
                 6) AS spearman_rho
    FROM m
    """,
    tags=("stats", "lineitem"),
)
def stats_spearman_rank_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between per-order total quantity and
    total revenue — the monotonic-association readout that survives
    outliers and nonlinearity where Pearson doesn't (Spearman 1904).
    Average ranks with exact tie handling, kept INTEGER by working in
    doubled ranks: rx2 = 2·(#values below) + (#ties) + 1 ≡
    2·RANK() + tiecount − 1, so ρ = Pearson over (rx2, ry2) needs no
    .5 fractions until the closed-form double expression.

    Scale: ranks come from value-grain counts (groupBy x) +
    ops.global_running_sum — range-partitioned prefix counts, NO
    data-scale single-partition window, NO global rank window — then
    join back to the pair table by value. Doubled-rank moment sums
    widen to DECIMAL(38,0): Σrx2² ≈ 4N³ stays exact past 10¹²
    pairs."""
    li = read_table(spark, sf_dir, "lineitem")
    pairs = li.groupBy("l_orderkey").agg(
        F.round(F.sum("l_quantity") * 100).cast("bigint").alias("x"),
        F.round(F.sum("l_extendedprice") * 100).cast("bigint").alias("y"),
    )

    def doubled_ranks(col: str, out: str) -> DataFrame:
        counts = pairs.groupBy(col).agg(F.count("*").cast("bigint").alias("c"))
        run = global_running_sum(counts, [col], "c", out_col="cum")
        # below = cum - c; doubled average rank = 2*below + c + 1
        return run.select(
            col,
            (2 * (F.col("cum") - F.col("c")) + F.col("c") + 1).alias(out),
        )

    rx = doubled_ranks("x", "rx2")
    ry = doubled_ranks("y", "ry2")
    ranked = pairs.join(rx, "x").join(ry, "y")
    rx2d = F.col("rx2").cast("decimal(38,0)")
    ry2d = F.col("ry2").cast("decimal(38,0)")
    m = ranked.agg(
        F.count("*").cast("double").alias("n"),
        F.sum(rx2d).cast("double").alias("sx"),
        F.sum(ry2d).cast("double").alias("sy"),
        F.sum(rx2d * F.col("rx2")).cast("double").alias("sxx"),
        F.sum(ry2d * F.col("ry2")).cast("double").alias("syy"),
        F.sum(rx2d * F.col("ry2")).cast("double").alias("sxy"),
    )
    n, sx, sy, sxx, syy, sxy = (
        F.col(c) for c in ("n", "sx", "sy", "sxx", "syy", "sxy")
    )
    return m.select(
        n.cast("bigint").alias("n"),
        F.round(
            (n * sxy - sx * sy)
            / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)),
            6,
        ).alias("spearman_rho"),
    )


@register(
    "stats_ols_two_feature",
    oracle="""
    WITH t AS (
      SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS y,
             CAST(ROUND(l_quantity * 100) AS BIGINT) AS x1,
             CAST(ROUND(l_discount * 10000) AS BIGINT) AS x2
      FROM lineitem
    ), m AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(x1 AS HUGEINT)) AS DOUBLE) AS s1,
             CAST(SUM(CAST(x2 AS HUGEINT)) AS DOUBLE) AS s2,
             CAST(SUM(CAST(y AS HUGEINT)) AS DOUBLE) AS sy,
             CAST(SUM(CAST(x1 AS HUGEINT) * x1) AS DOUBLE) AS s11,
             CAST(SUM(CAST(x1 AS HUGEINT) * x2) AS DOUBLE) AS s12,
             CAST(SUM(CAST(x2 AS HUGEINT) * x2) AS DOUBLE) AS s22,
             CAST(SUM(CAST(x1 AS HUGEINT) * y) AS DOUBLE) AS s1y,
             CAST(SUM(CAST(x2 AS HUGEINT) * y) AS DOUBLE) AS s2y,
             CAST(SUM(CAST(y AS HUGEINT) * y) AS DOUBLE) AS syy
      FROM t
    ), c AS (
      SELECT n, sy,
             s11 - s1 * s1 / n AS a11,
             s12 - s1 * s2 / n AS a12,
             s22 - s2 * s2 / n AS a22,
             s1y - s1 * sy / n AS b1v,
             s2y - s2 * sy / n AS b2v,
             syy - sy * sy / n AS tss,
             s1 / n AS m1, s2 / n AS m2, sy / n AS my
      FROM m
    ), sol AS (
      SELECT n, my, m1, m2, tss, b1v, b2v, a11, a12, a22,
             (b1v * a22 - b2v * a12) / (a11 * a22 - a12 * a12) AS beta1,
             (b2v * a11 - b1v * a12) / (a11 * a22 - a12 * a12) AS beta2
      FROM c
    )
    SELECT CAST(n AS BIGINT) AS n,
           ROUND((my - beta1 * m1 - beta2 * m2) / 100.0, 6) AS beta0_dollars,
           ROUND(beta1, 6) AS beta1_per_qty,
           ROUND(beta2, 6) AS beta2_per_disc,
           ROUND((beta1 * b1v + beta2 * b2v) / tss, 6) AS r_squared
    FROM sol
    """,
    tags=("stats", "ml", "lineitem"),
)
def stats_ols_two_feature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-feature ordinary least squares by the closed-form normal
    equations: extendedprice ~ quantity + discount, solved with
    Cramer's rule on the 2x2 centered Gram matrix - distributed linear
    regression with NO iteration, NO gradient, just one exact moment
    aggregate (the textbook trick that scales OLS to any row count as
    long as the feature count stays tiny). R-squared comes from the
    same sums.

    Scale: ONE map-side-combinable aggregate over the fact table
    produces all nine sums; everything after is 1-row closed-form
    double arithmetic spelled identically in both engines. Cross
    moments widen to DECIMAL(38,0)/HUGEINT (x1*y ~ 10^10 per row ->
    exact past 10^27 rows). The k-feature generalization (k x k
    Gram + LU solve on the driver) is noted in SCALE.md; k <= 2 keeps
    the whole solve inside the SQL expression tree."""
    li = read_table(spark, sf_dir, "lineitem")
    y = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    x1 = F.round(F.col("l_quantity") * 100).cast("bigint")
    x2 = F.round(F.col("l_discount") * 10000).cast("bigint")
    t = li.select(y.alias("y"), x1.alias("x1"), x2.alias("x2"))
    d = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    m = t.agg(
        F.count("*").cast("double").alias("n"),
        F.sum(d("x1")).cast("double").alias("s1"),
        F.sum(d("x2")).cast("double").alias("s2"),
        F.sum(d("y")).cast("double").alias("sy"),
        F.sum(d("x1") * F.col("x1")).cast("double").alias("s11"),
        F.sum(d("x1") * F.col("x2")).cast("double").alias("s12"),
        F.sum(d("x2") * F.col("x2")).cast("double").alias("s22"),
        F.sum(d("x1") * F.col("y")).cast("double").alias("s1y"),
        F.sum(d("x2") * F.col("y")).cast("double").alias("s2y"),
        F.sum(d("y") * F.col("y")).cast("double").alias("syy"),
    )
    n = F.col("n")
    a11 = F.col("s11") - F.col("s1") * F.col("s1") / n
    a12 = F.col("s12") - F.col("s1") * F.col("s2") / n
    a22 = F.col("s22") - F.col("s2") * F.col("s2") / n
    b1v = F.col("s1y") - F.col("s1") * F.col("sy") / n
    b2v = F.col("s2y") - F.col("s2") * F.col("sy") / n
    tss = F.col("syy") - F.col("sy") * F.col("sy") / n
    det = a11 * a22 - a12 * a12
    beta1 = (b1v * a22 - b2v * a12) / det
    beta2 = (b2v * a11 - b1v * a12) / det
    m1, m2, my = F.col("s1") / n, F.col("s2") / n, F.col("sy") / n
    return m.select(
        n.cast("bigint").alias("n"),
        F.round((my - beta1 * m1 - beta2 * m2) / 100.0, 6).alias(
            "beta0_dollars"
        ),
        F.round(beta1, 6).alias("beta1_per_qty"),
        F.round(beta2, 6).alias("beta2_per_disc"),
        F.round((beta1 * b1v + beta2 * b2v) / tss, 6).alias("r_squared"),
    )


@register(
    "stats_power_mde",
    oracle="""
    WITH per_user AS (
      SELECT event_type, user_id,
             CAST(user_id % 2 AS INT) AS arm,
             CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))) * 1000000)
                  AS BIGINT) AS yi
      FROM events
      GROUP BY event_type, user_id
    ), arms AS (
      SELECT event_type,
             CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
             CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(SUM(CASE WHEN arm = 0 THEN yi ELSE 0 END) AS DOUBLE) AS s0,
             CAST(SUM(CASE WHEN arm = 0
                           THEN CAST(yi AS HUGEINT) * yi ELSE 0 END)
                  AS DOUBLE) AS ss0,
             CAST(SUM(CASE WHEN arm = 1 THEN yi ELSE 0 END) AS DOUBLE) AS s1,
             CAST(SUM(CASE WHEN arm = 1
                           THEN CAST(yi AS HUGEINT) * yi ELSE 0 END)
                  AS DOUBLE) AS ss1
      FROM per_user
      GROUP BY event_type
    ), d AS (
      SELECT event_type, n0, n1,
             s0 / n0 AS mean0,
             ((ss0 - s0 * s0 / n0) + (ss1 - s1 * s1 / n1))
               / (n0 + n1 - 2.0) AS pooled_var
      FROM arms
    )
    SELECT event_type, n0, n1,
           ROUND(mean0 / 1000000.0, 6) AS baseline_mean,
           ROUND(2.801585 * SQRT(pooled_var * (1.0 / n0 + 1.0 / n1))
                 / 1000000.0, 6) AS mde_abs,
           ROUND(2.801585 * SQRT(pooled_var * (1.0 / n0 + 1.0 / n1))
                 / mean0, 6) AS mde_rel
    FROM d
    ORDER BY event_type
    """,
    tags=("stats", "experiment", "events"),
)
def stats_power_mde(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum detectable effect at 80% power / 5% two-sided alpha for
    each event-type metric, at the experiment's ACTUAL arm sizes:
    MDE = (z_{0.975} + z_{0.80})*sqrt(s2p*(1/n0 + 1/n1)) with
    z constants folded to 2.801585 - the pre-launch sizing readout
    every experimentation platform shows next to the assignment
    counts ("you cannot detect less than X% with this traffic").

    Scale: one (event_type, user)-keyed aggregate then a per-type
    1-row moment combine, exactly the Welch/Cohen shape; pooled
    variance from exact DECIMAL/HUGEINT micro-unit sums; the z
    quantiles are compile-time constants so no special functions
    enter the plan."""
    e = read_table(spark, sf_dir, "events")
    per_user = (
        e.groupBy("event_type", "user_id")
        .agg(
            F.round(F.sum(F.col("value").cast("decimal(18,6)")) * 1_000_000)
            .cast("bigint")
            .alias("yi")
        )
        .select(
            "event_type",
            (F.col("user_id") % 2).cast("int").alias("arm"),
            "yi",
        )
    )
    a0 = (F.col("arm") == 0).cast("long")
    a1 = (F.col("arm") == 1).cast("long")
    yi_dec = F.col("yi").cast("decimal(38,0)")
    arms = per_user.groupBy("event_type").agg(
        F.sum(a0).cast("bigint").alias("n0"),
        F.sum(a1).cast("bigint").alias("n1"),
        F.sum(a0 * F.col("yi")).cast("double").alias("s0"),
        F.sum(F.when(F.col("arm") == 0, yi_dec * F.col("yi")).otherwise(F.lit(0)))
        .cast("double")
        .alias("ss0"),
        F.sum(a1 * F.col("yi")).cast("double").alias("s1"),
        F.sum(F.when(F.col("arm") == 1, yi_dec * F.col("yi")).otherwise(F.lit(0)))
        .cast("double")
        .alias("ss1"),
    )
    n0, n1 = F.col("n0"), F.col("n1")
    mean0 = F.col("s0") / n0
    pooled_var = (
        (F.col("ss0") - F.col("s0") * F.col("s0") / n0)
        + (F.col("ss1") - F.col("s1") * F.col("s1") / n1)
    ) / (n0 + n1 - 2.0)
    mde = 2.801585 * F.sqrt(pooled_var * (1.0 / n0 + 1.0 / n1))
    return arms.select(
        "event_type",
        "n0",
        "n1",
        F.round(mean0 / 1_000_000.0, 6).alias("baseline_mean"),
        F.round(mde / 1_000_000.0, 6).alias("mde_abs"),
        F.round(mde / mean0, 6).alias("mde_rel"),
    ).orderBy("event_type")


@register(
    "stats_negbin_moments_fit",
    oracle="""
    WITH per_cust AS (
      SELECT c.c_mktsegment AS seg, c.c_custkey,
             CAST(COUNT(o.o_orderkey) AS BIGINT) AS k
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    ), m AS (
      SELECT seg,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(k) AS DOUBLE) AS s1,
             CAST(SUM(CAST(k AS HUGEINT) * k) AS DOUBLE) AS s2
      FROM per_cust GROUP BY seg
    ), mv AS (
      SELECT seg, n, s1 / n AS mean,
             (s2 - s1 * s1 / n) / (n - 1.0) AS var
      FROM m
    )
    SELECT seg, CAST(n AS BIGINT) AS n_customers,
           ROUND(mean, 6) AS mean_orders,
           ROUND(var, 6) AS var_orders,
           CAST(var > mean AS BOOLEAN) AS overdispersed,
           ROUND(CASE WHEN var > mean
                      THEN mean * mean / (var - mean) END, 6) AS r_hat,
           ROUND(CASE WHEN var > mean THEN mean / var END, 6) AS p_hat
    FROM mv
    ORDER BY seg
    """,
    tags=("stats", "orders", "customer"),
)
def stats_negbin_moments_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Negative-binomial method-of-moments fit of per-customer order
    counts per segment: r̂ = m²/(v−m), p̂ = m/v — the standard
    overdispersed count model behind purchase-frequency and BTYD-style
    CLV analyses (Poisson fails the moment v > m, which the
    overdispersed flag makes explicit; r̂/p̂ are NULL when the data is
    under-dispersed and the model is inadmissible). Zero-order
    customers enter through the LEFT join — dropping them silently
    biases m̂ upward, the classic mistake this query refuses.

    Scale: one customer-keyed count (the LEFT join preserves the
    zero class), one segment-keyed exact moment aggregate, closed-form
    doubles after; Σk² widens to DECIMAL(38,0)/HUGEINT."""
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    per_cust = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy(
            F.col("c_mktsegment").alias("seg"), "c_custkey"
        )
        .agg(F.count("o_orderkey").cast("bigint").alias("k"))
    )
    kd = F.col("k").cast("decimal(38,0)")
    m = per_cust.groupBy("seg").agg(
        F.count("*").cast("double").alias("n"),
        F.sum("k").cast("double").alias("s1"),
        F.sum(kd * F.col("k")).cast("double").alias("s2"),
    )
    n = F.col("n")
    mean = F.col("s1") / n
    var = (F.col("s2") - F.col("s1") * F.col("s1") / n) / (n - 1.0)
    return m.select(
        "seg",
        n.cast("bigint").alias("n_customers"),
        F.round(mean, 6).alias("mean_orders"),
        F.round(var, 6).alias("var_orders"),
        (var > mean).alias("overdispersed"),
        F.round(
            F.when(var > mean, mean * mean / (var - mean)), 6
        ).alias("r_hat"),
        F.round(F.when(var > mean, mean / var), 6).alias("p_hat"),
    ).orderBy("seg")


@register(
    "drift_ks_by_source",
    oracle="""
    WITH vals AS (
      SELECT source, n_chars AS v, CAST(COUNT(*) AS BIGINT) AS c
      FROM documents GROUP BY source, n_chars
    ), allv AS (
      SELECT v, CAST(SUM(c) AS BIGINT) AS c_all FROM vals GROUP BY v
    ), sizes AS (
      SELECT source, CAST(SUM(c) AS BIGINT) AS n_s FROM vals GROUP BY source
    ), tot AS (
      SELECT CAST(SUM(c_all) AS BIGINT) AS n FROM allv
    ), grid AS (
      SELECT s.source, a.v, a.c_all, COALESCE(g.c, 0) AS c_s,
             s2.n_s, t.n
      FROM sizes s
      CROSS JOIN allv a
      CROSS JOIN tot t
      JOIN sizes s2 ON s2.source = s.source
      LEFT JOIN vals g ON g.source = s.source AND g.v = a.v
    ), cums AS (
      SELECT source, v, n_s, n,
             SUM(c_s) OVER (PARTITION BY source ORDER BY v
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cum_s,
             SUM(c_all) OVER (PARTITION BY source ORDER BY v
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS cum_all
      FROM grid
    ), d AS (
      SELECT source, n_s, n,
             CAST(MAX(ABS((n - n_s) * cum_s - n_s * (cum_all - cum_s)))
                  AS BIGINT) AS num
      FROM cums GROUP BY source, n_s, n
    )
    SELECT source, n_s,
           ROUND(CAST(num AS DOUBLE) / (n_s * (n - n_s)), 6) AS ks_d,
           ROUND(1.358 * SQRT(CAST(n AS DOUBLE)
                              / (n_s * (n - n_s))), 6) AS crit_05,
           CAST(CAST(num AS DOUBLE) / (n_s * (n - n_s))
                > 1.358 * SQRT(CAST(n AS DOUBLE) / (n_s * (n - n_s)))
                AS BOOLEAN) AS drifted
    FROM d
    ORDER BY source
    """,
    tags=("stats", "dq", "drift", "documents"),
)
def drift_ks_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source distribution drift by two-sample KS: each source's
    document-length distribution against the REST of the corpus —
    the shape-sensitive companion to drift_psi_by_source (PSI needs
    binning choices; KS reads the whole ECDF). D = max over values of
    |(N−n_s)·cum_s − n_s·(cum_rest)| / (n_s·(N−n_s)) — exact integer
    numerators until the final division, Smirnov critical value at
    α=0.05.

    Scale: value-grain counts (n_chars is integer — the domain is
    bounded by max document length, not corpus size), a source×value
    grid whose cumulative windows partition PER SOURCE (no global
    window; cum_all is accumulated inside the same per-source
    partition, dodging the single-partition trap entirely), one max
    per source. Envelope: |num| ≤ n_s·N < 2⁶³ to ~3·10⁹ docs."""
    d = read_table(spark, sf_dir, "documents")
    vals = d.groupBy("source", F.col("n_chars").alias("v")).agg(
        F.count("*").cast("bigint").alias("c")
    )
    allv = vals.groupBy("v").agg(F.sum("c").cast("bigint").alias("c_all"))
    sizes = vals.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("n_s")
    )
    tot = allv.agg(F.sum("c_all").cast("bigint").alias("n"))
    grid = (
        sizes.crossJoin(F.broadcast(allv))
        .crossJoin(F.broadcast(tot))
        .join(
            vals.select(
                F.col("source").alias("src_g"),
                F.col("v").alias("v_g"),
                F.col("c").alias("c_s"),
            ),
            (F.col("source") == F.col("src_g")) & (F.col("v") == F.col("v_g")),
            "left",
        )
        .select(
            "source",
            "v",
            "c_all",
            F.coalesce(F.col("c_s"), F.lit(0)).alias("c_s"),
            "n_s",
            "n",
        )
    )
    wc = (
        W.partitionBy("source")
        .orderBy("v")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cums = grid.select(
        "source",
        "n_s",
        "n",
        F.sum("c_s").over(wc).alias("cum_s"),
        F.sum("c_all").over(wc).alias("cum_all"),
    )
    dres = cums.groupBy("source", "n_s", "n").agg(
        F.max(
            F.abs(
                (F.col("n") - F.col("n_s")) * F.col("cum_s")
                - F.col("n_s") * (F.col("cum_all") - F.col("cum_s"))
            )
        )
        .cast("bigint")
        .alias("num")
    )
    ks = F.col("num").cast("double") / (F.col("n_s") * (F.col("n") - F.col("n_s")))
    crit = 1.358 * F.sqrt(
        F.col("n").cast("double") / (F.col("n_s") * (F.col("n") - F.col("n_s")))
    )
    return dres.select(
        "source",
        "n_s",
        F.round(ks, 6).alias("ks_d"),
        F.round(crit, 6).alias("crit_05"),
        (ks > crit).alias("drifted"),
    ).orderBy("source")


@register(
    "stats_price_elasticity_loglog",
    oracle="""
    WITH t AS (
      SELECT p.p_brand,
             CAST(ROUND(LN(l.l_extendedprice / l.l_quantity) * 1000000)
                  AS BIGINT) AS lp,
             CAST(ROUND(LN(l.l_quantity) * 1000000) AS BIGINT) AS lq
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE l.l_quantity > 0 AND l.l_extendedprice > 0
    ), m AS (
      SELECT p_brand,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(lp AS HUGEINT)) AS DOUBLE) AS sx,
             CAST(SUM(CAST(lq AS HUGEINT)) AS DOUBLE) AS sy,
             CAST(SUM(CAST(lp AS HUGEINT) * lp) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(lq AS HUGEINT) * lq) AS DOUBLE) AS syy,
             CAST(SUM(CAST(lp AS HUGEINT) * lq) AS DOUBLE) AS sxy
      FROM t GROUP BY p_brand
    )
    SELECT p_brand, CAST(n AS BIGINT) AS n,
           ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
             AS elasticity,
           ROUND(POW(n * sxy - sx * sy, 2)
                 / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
             AS r_squared
    FROM m
    ORDER BY p_brand
    """,
    tags=("stats", "econ", "lineitem"),
)
def stats_price_elasticity_loglog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Own-price elasticity of demand per brand by the log-log
    regression ln(qty) ~ ln(unit price): the OLS slope IS the
    elasticity (a 1% price move shifts quantity by elasticity %) —
    the pricing team's first-pass demand readout. Unit price is
    extendedprice/quantity; both logs fix-point to e6 integers AT THE
    ROW so the moment sums are order-independent exact integers, and
    the slope/R² are closed-form doubles — the same discipline as the
    geometric-mean battery (ln carries the documented 1-ulp
    allowance under the fixed-point rounding).

    Scale: one fact-dim join (part broadcasts at dim scale) + ONE
    map-side-combinable moment aggregate per brand; ln moments widen
    to DECIMAL(38,0)/HUGEINT (lp² ≈ 10¹⁴)."""
    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part")
    t = (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .where((F.col("l_quantity") > 0) & (F.col("l_extendedprice") > 0))
        .select(
            "p_brand",
            F.round(
                F.log(F.col("l_extendedprice") / F.col("l_quantity"))
                * 1_000_000
            )
            .cast("bigint")
            .alias("lp"),
            F.round(F.log(F.col("l_quantity")) * 1_000_000)
            .cast("bigint")
            .alias("lq"),
        )
    )
    lpd = F.col("lp").cast("decimal(38,0)")
    lqd = F.col("lq").cast("decimal(38,0)")
    m = t.groupBy("p_brand").agg(
        F.count("*").cast("double").alias("n"),
        F.sum(lpd).cast("double").alias("sx"),
        F.sum(lqd).cast("double").alias("sy"),
        F.sum(lpd * F.col("lp")).cast("double").alias("sxx"),
        F.sum(lqd * F.col("lq")).cast("double").alias("syy"),
        F.sum(lpd * F.col("lq")).cast("double").alias("sxy"),
    )
    n, sx, sy, sxx, syy, sxy = (
        F.col(c) for c in ("n", "sx", "sy", "sxx", "syy", "sxy")
    )
    return m.select(
        "p_brand",
        n.cast("bigint").alias("n"),
        F.round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6).alias(
            "elasticity"
        ),
        F.round(
            F.pow(n * sxy - sx * sy, 2)
            / ((n * sxx - sx * sx) * (n * syy - sy * sy)),
            6,
        ).alias("r_squared"),
    ).orderBy("p_brand")


@register(
    "experiment_msprt_sequential",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(SUM(CASE WHEN user_id % 2 = 1
                           THEN CAST(ROUND(value * 10000) AS BIGINT)
                           ELSE -CAST(ROUND(value * 10000) AS BIGINT) END)
                  AS BIGINT) AS diff_e4,
             CAST(SUM(CAST(ROUND(value * 10000) AS HUGEINT)
                      * CAST(ROUND(value * 10000) AS BIGINT)) AS DOUBLE)
               AS ss
      FROM events GROUP BY 1
    ), cum AS (
      SELECT day,
             CAST(SUM(diff_e4) OVER w AS BIGINT) AS s,
             SUM(ss) OVER w AS v
      FROM daily
      WINDOW w AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW)
    ), lam AS (
      SELECT day, s, v,
             SQRT(v / (v + 1000000000000.0))
               * EXP((CAST(s AS DOUBLE) * s) * 1000000000000.0
                     / (2.0 * v * (v + 1000000000000.0))) AS lambda
      FROM cum
    )
    SELECT CAST(day AS VARCHAR) AS day, s AS s_e4,
           ROUND(lambda, 6) AS mixture_lr,
           ROUND(LEAST(1.0, 1.0 / lambda), 6) AS always_valid_p,
           CAST(lambda > 20.0 AS BOOLEAN) AS reject_at_005
    FROM lam
    ORDER BY day
    """,
    tags=("experiment", "stats", "events", "sequential"),
)
def experiment_msprt_sequential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture sequential probability ratio test (mSPRT — Johari,
    Koomen, Pekelis & Walsh, KDD 2017): the always-valid experiment
    monitor that lets you PEEK every day without inflating false
    positives, unlike the fixed-horizon t-test the catalog already
    has. The statistic Λ_t = sqrt(V/(V+h))·exp(S²h/(2V(V+h))) grows
    with the cumulative treatment-control gap S over the cumulative
    second moment V (mixture variance h = 10¹² in e4 fixed-point
    units); 1/Λ is the always-valid p-value, and Λ > 1/α rejects.

    Engine-exact: S is an exact signed BIGINT cumulative (arm sign
    applied per event in e4 fixed-point), V an exact HUGEINT/DECIMAL
    cumulative realized in double; Λ is one closed-form double per
    day, ROUND-6.

    Scale: one day-keyed aggregate over events, then cumulative
    windows over the CALENDAR-bounded day table (≤10³ rows — same
    class as the CUSUM/KM whitelisted windows, ordered but tiny).
    The per-day decision needs no global state beyond (S, V)."""
    e = read_table(spark, sf_dir, "events")
    v4 = F.round(F.col("value") * 10_000).cast("bigint")
    v4d = v4.cast("decimal(38,0)")
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(
            F.when(F.col("user_id") % 2 == 1, v4).otherwise(-v4)
        )
        .cast("bigint")
        .alias("diff_e4"),
        F.sum(v4d * v4).cast("double").alias("ss"),
    )
    wc = W.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = daily.select(
        "day",
        F.sum("diff_e4").over(wc).cast("bigint").alias("s"),
        F.sum("ss").over(wc).alias("v"),
    )
    h = 1_000_000_000_000.0
    lam = F.sqrt(F.col("v") / (F.col("v") + h)) * F.exp(
        (F.col("s").cast("double") * F.col("s"))
        * h
        / (2.0 * F.col("v") * (F.col("v") + h))
    )
    return cum.select(
        F.col("day").cast("string").alias("day"),
        F.col("s").alias("s_e4"),
        F.round(lam, 6).alias("mixture_lr"),
        F.round(F.least(F.lit(1.0), 1.0 / lam), 6).alias("always_valid_p"),
        (lam > 20.0).alias("reject_at_005"),
    ).orderBy("day")


# Hill estimator order-statistic depth (top-k tail sample).
_HILL_K = 200


@register(
    "stats_hill_tail_index",
    oracle=f"""
    WITH ranked AS (
      SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
             o_orderkey,
             ROW_NUMBER() OVER (ORDER BY ROUND(o_totalprice * 100) DESC,
                                o_orderkey) AS rn
      FROM orders
    ), top AS (
      SELECT cents, rn FROM ranked WHERE rn <= {_HILL_K + 1}
    ), thr AS (
      SELECT CAST(cents AS DOUBLE) AS xk FROM top WHERE rn = {_HILL_K + 1}
    ), lns AS (
      SELECT CAST(ROUND(LN(t.cents / r.xk) * 1000000000) AS BIGINT)
               AS ln_e9
      FROM top t CROSS JOIN thr r
      WHERE t.rn <= {_HILL_K}
    )
    SELECT CAST({_HILL_K} AS BIGINT) AS k,
           CAST(SUM(ln_e9) AS BIGINT) AS sum_ln_e9,
           ROUND({_HILL_K} * 1000000000.0 / SUM(ln_e9), 6) AS hill_alpha,
           ROUND(CAST(SUM(ln_e9) AS DOUBLE) / {_HILL_K} / 1000000000.0, 6)
             AS mean_excess_ln
    FROM lns
    """,
    tags=("stats", "orders", "tail"),
)
def stats_hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill tail-index estimator (Hill, Annals of Statistics 1975):
    α̂ = k / Σᵢ ln(x₍ᵢ₎/x₍ₖ₊₁₎) over the top-k order values — THE
    standard heavy-tail diagnostic (α ≤ 2 means infinite variance:
    means and CIs on that metric are lies; α̂ also calibrates the
    ABC/Pareto and whale-revenue analyses the catalog already ships).
    Per-term logs fix-point to e9 integers so the sum is
    order-independent; α̂ is one closed-form double.

    Scale: the ONLY data-scale operation is a k+1 TakeOrdered head
    (per-partition heaps — no global sort, no shuffle of the fact
    table); everything after runs on k+1 ≈ 200 rows. The rank window
    in the oracle is single-node DuckDB's equivalent; the Spark plan
    has no rank window at all."""
    o = read_table(spark, sf_dir, "orders")
    top = (
        o.select(
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
            "o_orderkey",
        )
        .orderBy(F.col("cents").desc(), F.col("o_orderkey").asc())
        .limit(_HILL_K + 1)
    )
    from blow_spark.materialize import spill_to_parquet

    top = spill_to_parquet(top, "blow_spark_hill_")
    # the (k+1)-th order statistic is the LAST of the k+1 spilled rows
    # under (cents desc, orderkey asc) = the FIRST under the reversed
    # order; excluding exactly that row leaves the k tail rows even
    # when values tie at the threshold — no rank window needed
    thr = (
        top.orderBy(F.col("cents").asc(), F.col("o_orderkey").desc())
        .limit(1)
        .select(
            F.col("cents").cast("double").alias("xk"),
            F.col("o_orderkey").alias("k_key"),
        )
    )
    lns = (
        top.crossJoin(F.broadcast(thr))
        .where(F.col("o_orderkey") != F.col("k_key"))
        .select(
            F.round(F.log(F.col("cents") / F.col("xk")) * 1_000_000_000)
            .cast("bigint")
            .alias("ln_e9")
        )
    )
    return lns.agg(
        F.lit(_HILL_K).cast("bigint").alias("k"),
        F.sum("ln_e9").cast("bigint").alias("sum_ln_e9"),
        F.round(_HILL_K * 1_000_000_000.0 / F.sum("ln_e9"), 6).alias(
            "hill_alpha"
        ),
        F.round(
            F.sum("ln_e9").cast("double") / _HILL_K / 1_000_000_000.0, 6
        ).alias("mean_excess_ln"),
    )


@register(
    "stats_bowley_skewness",
    oracle="""
    WITH daily AS (
      SELECT c.c_mktsegment AS seg, CAST(o.o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS rev
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    )
    SELECT seg,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           ROUND(QUANTILE_CONT(rev, 0.25), 6) AS q1,
           ROUND(QUANTILE_CONT(rev, 0.50), 6) AS q2,
           ROUND(QUANTILE_CONT(rev, 0.75), 6) AS q3,
           ROUND((QUANTILE_CONT(rev, 0.75) + QUANTILE_CONT(rev, 0.25)
                  - 2 * QUANTILE_CONT(rev, 0.50))
                 / (QUANTILE_CONT(rev, 0.75) - QUANTILE_CONT(rev, 0.25)),
                 6) AS bowley_skew
    FROM daily
    GROUP BY seg
    ORDER BY seg
    """,
    tags=("stats", "orders", "robust"),
)
def stats_bowley_skewness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bowley's quartile skewness (Q₃+Q₁−2Q₂)/(Q₃−Q₁) of each
    segment's daily-revenue distribution — the robust companion to
    the moment-based skewness battery: bounded in [−1, 1] and immune
    to the single outlier day that dominates a third moment. Both
    engines interpolate the same type-7 continuous quantiles over
    exact cent integers.

    Scale: the percentile buffers only the CALENDAR-bounded day-grain
    series per segment (≤10³ values/group — the documented safe zone
    for exact percentile; the corpus-scale path for unbounded groups
    is the integer-histogram trick of orders_interpurchase_percentiles)."""
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    daily = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.to_date("o_orderdate").alias("day"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("rev")
        )
    )
    q1 = F.expr("percentile(rev, 0.25)")
    q2 = F.expr("percentile(rev, 0.50)")
    q3 = F.expr("percentile(rev, 0.75)")
    return (
        daily.groupBy("seg")
        .agg(
            F.count("*").cast("bigint").alias("n_days"),
            F.round(q1, 6).alias("q1"),
            F.round(q2, 6).alias("q2"),
            F.round(q3, 6).alias("q3"),
            F.round((q3 + q1 - 2 * q2) / (q3 - q1), 6).alias("bowley_skew"),
        )
        .orderBy("seg")
    )
