"""Classical statistical tests as distributed one-pass aggregates:
Welch's t-test, the chi-square independence test, the Mann-Whitney U
rank-sum test, Benjamini-Hochberg FDR control, exact per-group mode,
and geometric/harmonic means.

These are the inference primitives an experimentation/quality platform
runs ON TOP of the metric tables the rest of the catalog produces —
each one reduces to exact integer/decimal moment sums (one shuffle)
followed by a closed-form scalar formula, so they are engine-exact and
oracle-paired like every other aggregate in the catalog.

Reference parity note: the reference engine (wizgrao/blow) has no
statistics surface (maps/maps.go:8-14 is its whole operator
vocabulary); these are extension operators from the task brief's
analytics mandate.

Determinism conventions (catalog-wide): metric values fix-point to
BIGINT before any sum (float groupBy sums are order-nondeterministic);
squared/cubed moments widen to DECIMAL(38,0) / HUGEINT before summing;
the final test statistic is one closed-form double expression over
those exact sums, ROUND-6 (ROUND-9 for p-values). sqrt is correctly
rounded IEEE-754 in both engines; ln/exp carry the documented 1-ulp
JVM-vs-libm allowance under the fixed-point rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from blow_spark.queries import register
from blow_spark.sources import read_table

_BH_ALPHA = 0.05  # Benjamini-Hochberg FDR level


@register(
    "stats_welch_ttest",
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
    )
    SELECT n0, n1,
           ROUND(s0 / n0 / 1000000.0, 6) AS mean_0,
           ROUND(s1 / n1 / 1000000.0, 6) AS mean_1,
           ROUND((s0 / n0 - s1 / n1)
                 / SQRT((n0 * ss0 - s0 * s0) / (n0 * (n0 - 1.0)) / n0
                        + (n1 * ss1 - s1 * s1) / (n1 * (n1 - 1.0)) / n1),
                 6) AS t_stat,
           ROUND(POW((n0 * ss0 - s0 * s0) / (n0 * (n0 - 1.0)) / n0
                     + (n1 * ss1 - s1 * s1) / (n1 * (n1 - 1.0)) / n1, 2)
                 / (POW((n0 * ss0 - s0 * s0) / (n0 * (n0 - 1.0)) / n0, 2)
                      / (n0 - 1.0)
                    + POW((n1 * ss1 - s1 * s1) / (n1 * (n1 - 1.0)) / n1, 2)
                      / (n1 - 1.0)),
                 6) AS welch_df
    FROM arms
    """,
    tags=("stats", "experiment", "events"),
)
def stats_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test (Welch 1947) between two
    hash-assigned experiment arms on the per-user total event value —
    the default two-sample readout when arm variances differ (always,
    in practice). Per-user metrics fix-point to micro-units, the two
    arms' (n, Σy, Σy²) come from ONE conditional aggregate (no
    per-arm re-scan, no join), and t plus the Welch-Satterthwaite
    degrees of freedom are closed-form doubles over those exact sums.

    Scale: one user-keyed shuffle builds the per-user metric (the same
    table CUPED uses), then a map-side-combined 1-row moment aggregate;
    Σy² widens to DECIMAL(38,0)/HUGEINT so the moments stay exact far
    past int64 (yi ~ 10^10 → yi² ~ 10^20). The t formula never sees a
    float partial sum."""
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
    se0 = (n0 * F.col("ss0") - F.col("s0") * F.col("s0")) / (n0 * (n0 - 1.0)) / n0
    se1 = (n1 * F.col("ss1") - F.col("s1") * F.col("s1")) / (n1 * (n1 - 1.0)) / n1
    return arms.select(
        "n0",
        "n1",
        F.round(F.col("s0") / n0 / 1e6, 6).alias("mean_0"),
        F.round(F.col("s1") / n1 / 1e6, 6).alias("mean_1"),
        F.round(
            (F.col("s0") / n0 - F.col("s1") / n1) / F.sqrt(se0 + se1), 6
        ).alias("t_stat"),
        F.round(
            F.pow(se0 + se1, 2)
            / (F.pow(se0, 2) / (n0 - 1.0) + F.pow(se1, 2) / (n1 - 1.0)),
            6,
        ).alias("welch_df"),
    )


@register(
    "stats_chi_square_independence",
    oracle="""
    WITH cells AS (
      SELECT c.c_mktsegment AS seg, r.r_name AS region,
             CAST(COUNT(*) AS BIGINT) AS o
      FROM customer c
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      GROUP BY c.c_mktsegment, r.r_name
    ), marg AS (
      SELECT seg, region, o,
             SUM(o) OVER (PARTITION BY seg) AS rt,
             SUM(o) OVER (PARTITION BY region) AS ct,
             SUM(o) OVER () AS n
      FROM cells
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n,
           CAST((COUNT(DISTINCT seg) - 1) * (COUNT(DISTINCT region) - 1)
                AS BIGINT) AS df,
           ROUND(SUM(CAST(ROUND(
                   POW(o - CAST(rt AS DOUBLE) * ct / n, 2)
                     / (CAST(rt AS DOUBLE) * ct / n) * 1000000000)
                 AS BIGINT)) / 1000000000.0, 6) AS chi2_stat
    FROM marg
    """,
    tags=("stats", "relational", "join"),
)
def stats_chi_square_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square test of independence (Pearson 1900) between
    customer market segment and home region: the contingency table is
    one distributed aggregate; expected counts and the statistic are
    arithmetic over that tiny cell table. Each cell's
    (O−E)²/E term fix-points to nano-units BEFORE the final sum, so the
    25-term reduction is an exact integer add in any order.

    Scale: customer joins the two dimension tables via broadcast (no
    shuffle), then ONE (segment, region)-keyed aggregate reduces the
    corpus to |segments|×|regions| cells — everything after is
    constant-size. The margin windows run on that cell table: the two
    partitioned ones are trivially parallel and the grand-total window
    is a whitelisted single task over ≤25 domain-bounded rows (same
    class as the Kaplan-Meier day table)."""
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region")
    cells = (
        c.join(F.broadcast(n), n.n_nationkey == c.c_nationkey)
        .join(F.broadcast(r), r.r_regionkey == n.n_regionkey)
        .groupBy(F.col("c_mktsegment").alias("seg"), F.col("r_name").alias("region"))
        .agg(F.count("*").alias("o"))
    )
    marg = cells.select(
        "seg",
        "region",
        "o",
        F.sum("o").over(W.partitionBy("seg")).alias("rt"),
        F.sum("o").over(W.partitionBy("region")).alias("ct"),
        F.sum("o").over(W.partitionBy()).alias("n"),
    )
    e = F.col("rt").cast("double") * F.col("ct") / F.col("n")
    term_fix = F.round(F.pow(F.col("o") - e, 2) / e * 1e9).cast("bigint")
    return marg.agg(
        F.max("n").cast("bigint").alias("n"),
        (
            (F.countDistinct("seg") - 1) * (F.countDistinct("region") - 1)
        )
        .cast("bigint")
        .alias("df"),
        F.round(F.sum(term_fix) / 1e9, 6).alias("chi2_stat"),
    )


@register(
    "stats_mann_whitney_u",
    oracle="""
    WITH counts AS (
      SELECT CAST(l_quantity AS BIGINT) AS v,
             CAST(SUM(CASE WHEN l_orderkey % 2 = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS ca,
             CAST(COUNT(*) AS BIGINT) AS tot
      FROM lineitem
      GROUP BY CAST(l_quantity AS BIGINT)
    ), ranked AS (
      SELECT v, ca, tot,
             COALESCE(SUM(tot) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumb
      FROM counts
    ), sums AS (
      SELECT CAST(SUM(ca) AS BIGINT) AS na,
             CAST(SUM(tot - ca) AS BIGINT) AS nb,
             SUM(CAST(ca AS HUGEINT) * (2 * cumb + tot + 1)) AS r2a,
             CAST(SUM(CAST(tot AS HUGEINT) * tot * tot - tot) AS DOUBLE)
               AS tie3
      FROM ranked
    )
    SELECT na, nb,
           CAST(r2a - CAST(na AS HUGEINT) * (na + 1) AS VARCHAR) AS u_a_x2,
           CAST(FLOOR(
             (CAST(r2a - CAST(na AS HUGEINT) * (na + 1) AS DOUBLE) / 2
                  - CAST(na AS DOUBLE) * nb / 2)
                 / SQRT(CAST(na AS DOUBLE) * nb / 12.0
                        * ((na + nb + 1.0)
                           - tie3 / (CAST(na + nb AS DOUBLE)
                                     * (na + nb - 1.0))))
             * 1000000.0) AS BIGINT) AS z_stat_e6
    FROM sums
    """,
    tags=("stats", "rank", "lineitem"),
)
def stats_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum test (Mann & Whitney 1947) comparing the
    l_quantity distribution between even- and odd-keyed orders, with
    the normal approximation UNDER TIE CORRECTION — the nonparametric
    two-sample test a metrics platform reaches for when means mislead.
    Because quantity has a bounded integer domain, average ranks come
    from per-VALUE counts, not per-row ranks: rank-sum doubles to stay
    integral (avg rank of a tie group = cumb + (t+1)/2, so 2R_A =
    Σ c_A·(2·cumb + t + 1)), and the tie term Σ(t³−t) widens to
    DECIMAL(38,0)/HUGEINT (t ~ N/50 makes t³ pass int64 near N≈10^13).
    Round-14 guard (r13 verdict item #3 — this row had only 102×
    headroom at sf100): u_a_x2 = 2U_A is O(n²) and crosses int64 near
    sf1000, so it now ships as the catalog's established VARCHAR exact
    transport over the DECIMAL(38,0)/HUGEINT value (same as
    vector_power_iteration_step / bollinger dev_xn) — exact at any
    n < 10^19², no silent wrap, no raise needed. z_stat became
    z_stat_e6 via tie-free FLOOR (a sqrt is irrational, so no integer
    path exists; FLOOR on the bit-equal IEEE doubles has no
    fractional-decimal tie class, unlike ROUND(x, 6)).

    Scale: ONE value-keyed aggregate reduces the corpus to ≤50 rows
    (the quantity domain); the cumulative window over that table is a
    whitelisted single task over domain-bounded rows. No per-row rank
    is ever materialized — the classic trick for rank statistics over
    low-cardinality domains at any data size."""
    li = read_table(spark, sf_dir, "lineitem")
    counts = (
        li.select(
            F.col("l_quantity").cast("bigint").alias("v"),
            (F.col("l_orderkey") % 2 == 0).cast("long").alias("is_a"),
        )
        .groupBy("v")
        .agg(F.sum("is_a").alias("ca"), F.count("*").alias("tot"))
    )
    ranked = counts.withColumn(
        "cumb",
        F.coalesce(
            F.sum("tot").over(
                W.orderBy("v").rowsBetween(W.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    )
    tot_dec = F.col("tot").cast("decimal(38,0)")
    sums = ranked.agg(
        F.sum("ca").alias("na"),
        F.sum(F.col("tot") - F.col("ca")).alias("nb"),
        F.sum(
            F.col("ca").cast("decimal(38,0)")
            * (2 * F.col("cumb") + F.col("tot") + 1)
        ).alias("r2a"),
        F.sum(tot_dec * F.col("tot") * F.col("tot") - F.col("tot"))
        .cast("double")
        .alias("tie3"),
    )
    na, nb = F.col("na"), F.col("nb")
    u2 = F.col("r2a") - na.cast("decimal(38,0)") * (na + 1)
    nn = na.cast("double") + nb
    return sums.select(
        na.cast("bigint").alias("na"),
        nb.cast("bigint").alias("nb"),
        u2.cast("string").alias("u_a_x2"),
        F.floor(
            (u2.cast("double") / 2 - na.cast("double") * nb / 2)
            / F.sqrt(
                na.cast("double") * nb / 12.0
                * ((nn + 1.0) - F.col("tie3") / (nn * (nn - 1.0)))
            )
            * 1000000.0
        )
        .cast("bigint")
        .alias("z_stat_e6"),
    )


@register(
    "stats_benjamini_hochberg",
    oracle=f"""
    WITH per_brand AS (
      SELECT p_brand,
             CAST(COUNT(*) AS BIGINT) AS n_b,
             CAST(SUM(CAST(ROUND(p_retailprice * 100) AS BIGINT)) AS BIGINT)
               AS s_b,
             SUM(CAST(ROUND(p_retailprice * 100) AS HUGEINT)
                 * CAST(ROUND(p_retailprice * 100) AS BIGINT)) AS ssq_b
      FROM part
      GROUP BY p_brand
    ), gstats AS (
      SELECT CAST(SUM(n_b) AS DOUBLE) AS n,
             CAST(SUM(s_b) AS DOUBLE) AS s,
             CAST(SUM(ssq_b) AS DOUBLE) AS ss
      FROM per_brand
    ), pvals AS (
      SELECT p_brand, n_b,
             ROUND(LEAST(1.0, 1.0 /
               POW((CAST(s_b AS DOUBLE) / n_b - g.s / g.n)
                   / (SQRT((g.n * g.ss - g.s * g.s) / (g.n * (g.n - 1.0)))
                      / SQRT(CAST(n_b AS DOUBLE))), 2)), 9) AS p_cheb
      FROM per_brand CROSS JOIN gstats g
    ), ranked AS (
      SELECT p_brand, n_b, p_cheb,
             CAST(ROW_NUMBER() OVER (ORDER BY p_cheb, p_brand) AS BIGINT)
               AS p_rank,
             CAST(COUNT(*) OVER () AS BIGINT) AS m
      FROM pvals
    ), cut AS (
      SELECT *,
             MAX(CASE WHEN p_cheb <= {_BH_ALPHA} * p_rank / m
                      THEN p_rank ELSE 0 END) OVER () AS k_max
      FROM ranked
    )
    SELECT p_brand, n_b, p_cheb, p_rank,
           ROUND({_BH_ALPHA} * p_rank / m, 9) AS bh_threshold,
           p_rank <= k_max AS rejected
    FROM cut
    """,
    tags=("stats", "multiple-testing", "part"),
)
def stats_benjamini_hochberg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg FDR control (Benjamini & Hochberg 1995) over
    one hypothesis per part brand: does the brand's mean retail price
    deviate from the global mean? Per-brand z-scores come from exact
    cent-integer sums; the per-test p-value is the distribution-free
    Chebyshev bound p = min(1, 1/z²) (deterministic — no CDF needed),
    and the BH step-up rule rejects every hypothesis ranked at or below
    the LARGEST k with p_(k) ≤ αk/m. Step-up matters: a hypothesis can
    be rejected even where its own threshold fails, so the max-k window
    realizes the actual procedure, not the per-row shortcut.

    Scale: one brand-keyed aggregate reduces the corpus to |brands|
    rows (25 here — a bounded label domain); the rank and max-k windows
    run on that constant-size table (whitelisted single task, same
    class as the chi-square cell table). Σprice² widens to
    DECIMAL(38,0)/HUGEINT before the variance formula."""
    p = read_table(spark, sf_dir, "part")
    cents = F.round(F.col("p_retailprice") * 100).cast("bigint")
    per_brand = p.groupBy("p_brand").agg(
        F.count("*").alias("n_b"),
        F.sum(cents).alias("s_b"),
        F.sum(cents.cast("decimal(38,0)") * cents).alias("ssq_b"),
    )
    glob = per_brand.agg(
        F.sum("n_b").cast("double").alias("n"),
        F.sum("s_b").cast("double").alias("s"),
        F.sum("ssq_b").cast("double").alias("ss_tot"),
    )
    j = per_brand.crossJoin(F.broadcast(glob))
    sd = F.sqrt(
        (F.col("n") * F.col("ss_tot") - F.col("s") * F.col("s"))
        / (F.col("n") * (F.col("n") - 1.0))
    )
    z = (F.col("s_b").cast("double") / F.col("n_b") - F.col("s") / F.col("n")) / (
        sd / F.sqrt(F.col("n_b").cast("double"))
    )
    pvals = j.select(
        "p_brand",
        "n_b",
        F.round(F.least(F.lit(1.0), 1.0 / F.pow(z, 2)), 9).alias("p_cheb"),
    )
    ranked = pvals.select(
        "p_brand",
        "n_b",
        "p_cheb",
        F.row_number()
        .over(W.orderBy("p_cheb", "p_brand"))
        .cast("bigint")
        .alias("p_rank"),
        F.count("*").over(W.partitionBy()).cast("bigint").alias("m"),
    )
    thresh = F.lit(_BH_ALPHA) * F.col("p_rank") / F.col("m")
    cut = ranked.withColumn(
        "k_max",
        F.max(
            F.when(F.col("p_cheb") <= thresh, F.col("p_rank")).otherwise(F.lit(0))
        ).over(W.partitionBy()),
    )
    return cut.select(
        "p_brand",
        "n_b",
        "p_cheb",
        "p_rank",
        F.round(thresh, 9).alias("bh_threshold"),
        (F.col("p_rank") <= F.col("k_max")).alias("rejected"),
    )


@register(
    "agg_mode_exact",
    oracle="""
    WITH counts AS (
      SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS v,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM lineitem
      GROUP BY l_returnflag, CAST(l_quantity AS BIGINT)
    ), ranked AS (
      SELECT l_returnflag, v, cnt,
             ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                ORDER BY cnt DESC, v ASC) AS rn
      FROM counts
    )
    SELECT l_returnflag, v AS mode_quantity, cnt AS mode_count
    FROM ranked WHERE rn = 1
    """,
    tags=("agg", "mode", "lineitem"),
)
def agg_mode_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group MODE (most frequent value) with a deterministic
    tie-break (smallest value wins) — the one descriptive statistic SQL
    engines historically left out (ANSI added MODE() as an inverse
    distribution function; its tie behavior is implementation-defined,
    so the catalog pins it explicitly via the two-key rank).

    Scale: (group, value)-keyed count — map-side combinable — then a
    per-GROUP rank over the value domain (≤50 rows per group here;
    bounded by the value domain, never by data size). The same shape
    as agg_argmax_deterministic; no global window, no collect."""
    li = read_table(spark, sf_dir, "lineitem")
    counts = (
        li.select("l_returnflag", F.col("l_quantity").cast("bigint").alias("v"))
        .groupBy("l_returnflag", "v")
        .agg(F.count("*").alias("cnt"))
    )
    rn = F.row_number().over(
        W.partitionBy("l_returnflag").orderBy(F.col("cnt").desc(), F.col("v").asc())
    )
    return (
        counts.withColumn("rn", rn)
        .filter(F.col("rn") == 1)
        .select(
            "l_returnflag",
            F.col("v").alias("mode_quantity"),
            F.col("cnt").alias("mode_count"),
        )
    )


@register(
    "agg_geo_harmonic_means",
    oracle="""
    SELECT p_brand,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(EXP(CAST(SUM(CAST(ROUND(LN(p_retailprice) * 1000000)
                                   AS BIGINT)) AS DOUBLE)
                     / COUNT(*) / 1000000.0), 6) AS geo_mean,
           ROUND(COUNT(*) * 1000000000000.0
                 / CAST(SUM(CAST(ROUND(1000000000000.0 / p_retailprice)
                                 AS BIGINT)) AS DOUBLE), 6) AS harmonic_mean
    FROM part
    GROUP BY p_brand
    """,
    tags=("agg", "means", "part"),
)
def agg_geo_harmonic_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geometric and harmonic means per brand — the right averages for
    ratios and rates (price indices, per-unit costs) where the
    arithmetic mean overstates. Both reduce to ONE exact integer sum
    per group: ln(x) and 1/x fix-point per row (micro-units / 10⁻¹²
    reciprocal units) so the shuffled partial sums are
    order-insensitive BIGINTs; exp and the final division happen once
    per group, ROUND-6 (ln/exp carry the catalog's 1-ulp allowance
    inside the fixed-point rounding).

    Scale: a single map-side-combinable groupBy — the same cost as an
    AVG; no windows, no second pass."""
    p = read_table(spark, sf_dir, "part")
    lnfix = F.round(F.log(F.col("p_retailprice")) * 1e6).cast("bigint")
    invfix = F.round(F.lit(1e12) / F.col("p_retailprice")).cast("bigint")
    return p.groupBy("p_brand").agg(
        F.count("*").cast("bigint").alias("n"),
        F.round(
            F.exp(F.sum(lnfix).cast("double") / F.count("*") / 1e6), 6
        ).alias("geo_mean"),
        F.round(
            F.count("*") * 1e12 / F.sum(invfix).cast("double"), 6
        ).alias("harmonic_mean"),
    )


@register(
    "agg_skewness_kurtosis",
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
    )
    SELECT l_returnflag,
           CAST(n AS BIGINT) AS n,
           ROUND((s3 / n - 3 * (s1 / n) * (s2 / n) + 2 * (s1 / n) * (s1 / n) * (s1 / n))
                 / ((s2 / n - (s1 / n) * (s1 / n))
                    * SQRT(s2 / n - (s1 / n) * (s1 / n))), 6) AS skewness,
           ROUND((s4 / n - 4 * (s1 / n) * (s3 / n)
                  + 6 * (s1 / n) * (s1 / n) * (s2 / n)
                  - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n))
                 / ((s2 / n - (s1 / n) * (s1 / n))
                    * (s2 / n - (s1 / n) * (s1 / n))) - 3, 6) AS excess_kurtosis
    FROM m
    ORDER BY l_returnflag
    """,
    tags=("agg", "stats", "lineitem"),
)
def agg_skewness_kurtosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact population skewness and excess kurtosis per group from raw
    integer moments — the distribution-shape diagnostics next to
    avg/stddev on any metrics board. Spark's built-in skewness()/
    kurtosis() accumulate FLOATS in shuffle order (nondeterministic
    across runs); this computes Σx, Σx², Σx³, Σx⁴ as exact
    DECIMAL(38,0)/HUGEINT cent sums in ONE map-side-combinable
    aggregate, then expands the central moments in doubles — both
    engines run the identical IEEE expression on identical integers,
    so the result is bit-stable (m2^1.5 deliberately spelled
    m2·sqrt(m2): sqrt is correctly rounded where pow is not).

    Envelope: x⁴ ≈ 10²⁸ at 10⁷-cent values, so per-group sums stay
    inside DECIMAL(38,0)/HUGEINT for ~10¹⁰ rows per group; past that
    the standard fix is the two-pass shifted-moment form (subtract an
    approximate group mean first), noted in SCALE.md rather than
    implemented — the one-pass form is the production default."""
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
    return m.select(
        "l_returnflag",
        n.cast("bigint").alias("n"),
        F.round(m3 / (m2 * F.sqrt(m2)), 6).alias("skewness"),
        F.round(m4 / (m2 * m2) - 3, 6).alias("excess_kurtosis"),
    ).orderBy("l_returnflag")
