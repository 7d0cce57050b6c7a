"""Experimentation & marketing analytics: multi-touch attribution and
CUPED variance-reduced experiment readout.

The measurement side of a product-analytics platform: attribution
distributes conversion credit across the touchpoints that preceded each
conversion (last-touch / first-touch / linear, the three standard
models), and CUPED (Deng, Xu, Kohavi & Walker, WSDM 2013) adjusts an
experiment metric with a pre-period covariate to shrink variance —
the workhorse readout at every large experimentation platform.

Reference parity note: the reference engine (wizgrao/blow) has no
analytics surface — maps/maps.go:8-14 is its entire operator
vocabulary — so these are extension operators from the task brief's
analytics mandate, over the synthetic `events` fixture.

Determinism: attribution credit is integer BASIS POINTS (10000 per
conversion; ``10000 DIV n`` per touch with the remainder pinned to the
most recent touch), CUPED moments are exact DECIMAL partial sums with
one closed-form double division at the end, rounded — the same
fixed-point/decimal conventions the rest of the catalog uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from blow_spark.queries import register
from blow_spark.sources import read_table

_LOOKBACK_DAYS = 7
_BP = 10_000  # basis points distributed per conversion
_CUPED_SPLIT = "2024-01-16 00:00:00"  # pre/post boundary (fixture spans Jan)


@register(
    "events_attribution_multitouch",
    oracle=f"""
    WITH conv AS (
      SELECT event_id AS conv_id, user_id, ts
      FROM events WHERE event_type = 'purchase'
    ), touch AS (
      SELECT event_id, user_id, ts, event_type AS channel,
             CAST(json_extract_string(props, 'k') AS INT) % 4 AS campaign
      FROM events WHERE event_type IN ('view', 'click')
    ), pair AS (
      SELECT c.conv_id, t.event_id, t.channel, t.campaign, t.ts,
             COUNT(*) OVER (PARTITION BY c.conv_id) AS n_touches,
             ROW_NUMBER() OVER (PARTITION BY c.conv_id
                                ORDER BY t.ts DESC, t.event_id DESC) AS r_last,
             ROW_NUMBER() OVER (PARTITION BY c.conv_id
                                ORDER BY t.ts ASC, t.event_id ASC) AS r_first
      FROM conv c JOIN touch t ON t.user_id = c.user_id
      WHERE t.ts < c.ts AND t.ts >= c.ts - INTERVAL {_LOOKBACK_DAYS} DAY
    )
    SELECT channel, campaign,
           CAST(COUNT(*) AS BIGINT) AS n_touch_credits,
           CAST(SUM(CASE WHEN r_last = 1 THEN {_BP} ELSE 0 END) AS BIGINT)
             AS credit_last_bp,
           CAST(SUM(CASE WHEN r_first = 1 THEN {_BP} ELSE 0 END) AS BIGINT)
             AS credit_first_bp,
           CAST(SUM({_BP} // n_touches
                    + CASE WHEN r_last = 1 THEN {_BP} % n_touches ELSE 0 END)
                AS BIGINT) AS credit_linear_bp
    FROM pair
    GROUP BY channel, campaign
    """,
    tags=("analytics", "attribution", "events"),
)
def events_attribution_multitouch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch conversion attribution, three models in one pass:
    every purchase looks back 7 days over the user's view/click touches;
    last-touch and first-touch give the full 10000 bp to one end of the
    window, linear splits ``10000 DIV n`` per touch with the integer
    remainder pinned to the most recent touch — so every model
    distributes EXACTLY 10000 bp per attributed conversion (an invariant
    the test suite checks) and the per-(channel, campaign) credit table
    is pure-integer, hash-exact.

    Scale shape: the conversion×touch pair join is user-keyed (the
    interval condition prunes within each user's partition) — the same
    bucketed-by-entity shape as the as-of joins; at 100 TB both sides
    bucket by user_id and the join never crosses users. The per-
    conversion windows partition by conversion id (≤ touches-per-week
    rows each, never data-scale). Campaign comes from the JSON props
    via get_json_object — pushed into the same scan."""
    e = read_table(spark, sf_dir, "events")
    conv = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("conv_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    touch = e.filter(F.col("event_type").isin("view", "click")).select(
        "event_id",
        "user_id",
        "ts",
        F.col("event_type").alias("channel"),
        (F.get_json_object("props", "$.k").cast("int") % 4).alias("campaign"),
    )
    pair = conv.join(
        touch,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("ts") < F.col("c_ts"))
        & (F.col("ts") >= F.col("c_ts") - F.expr(f"INTERVAL {_LOOKBACK_DAYS} DAYS")),
    )
    by_conv = W.partitionBy("conv_id")
    pair = pair.select(
        "conv_id",
        "channel",
        "campaign",
        F.count("*").over(by_conv).alias("n_touches"),
        F.row_number()
        .over(by_conv.orderBy(F.col("ts").desc(), F.col("event_id").desc()))
        .alias("r_last"),
        F.row_number()
        .over(by_conv.orderBy(F.col("ts").asc(), F.col("event_id").asc()))
        .alias("r_first"),
    )
    last1 = (F.col("r_last") == 1).cast("long")
    first1 = (F.col("r_first") == 1).cast("long")
    return pair.groupBy("channel", "campaign").agg(
        F.count("*").alias("n_touch_credits"),
        F.sum(last1 * _BP).alias("credit_last_bp"),
        F.sum(first1 * _BP).alias("credit_first_bp"),
        F.sum(
            F.expr(f"{_BP} DIV n_touches")
            + last1 * F.expr(f"{_BP} % n_touches")
        ).alias("credit_linear_bp"),
    )


@register(
    "experiment_cuped_readout",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
             CAST(user_id % 2 AS INT) AS arm,
             CAST(ROUND(COALESCE(SUM(CASE WHEN ts < TIMESTAMP '{_CUPED_SPLIT}'
                       THEN CAST(value AS DECIMAL(18,6)) END), 0) * 1000000)
                  AS BIGINT) AS xi,
             CAST(ROUND(COALESCE(SUM(CASE WHEN ts >= TIMESTAMP '{_CUPED_SPLIT}'
                            AND event_type = 'purchase'
                       THEN CAST(value AS DECIMAL(18,6)) END), 0) * 1000000)
                  AS BIGINT) AS yi
      FROM events
      GROUP BY user_id
    ), pooled AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(xi) AS DOUBLE) AS sx,
             CAST(SUM(yi) AS DOUBLE) AS sy,
             CAST(SUM(CAST(xi AS HUGEINT) * yi) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(xi AS HUGEINT) * xi) AS DOUBLE) AS sxx
      FROM per_user
    ), arm_stats AS (
      SELECT arm,
             CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(SUM(xi) AS DOUBLE) AS a_sx,
             CAST(SUM(yi) AS DOUBLE) AS a_sy
      FROM per_user
      GROUP BY arm
    )
    SELECT a.arm, a.n_users,
           ROUND(a.a_sy / a.n_users / 1000000.0, 6) AS mean_y,
           ROUND((p.n * p.sxy - p.sx * p.sy) / (p.n * p.sxx - p.sx * p.sx), 9)
             AS theta,
           ROUND((a.a_sy / a.n_users
                 - ((p.n * p.sxy - p.sx * p.sy) / (p.n * p.sxx - p.sx * p.sx))
                   * (a.a_sx / a.n_users - p.sx / p.n)) / 1000000.0, 6)
             AS mean_y_cuped
    FROM arm_stats a CROSS JOIN pooled p
    """,
    tags=("analytics", "experiment", "cuped", "events"),
)
def experiment_cuped_readout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance-reduced experiment readout (Deng et al., WSDM
    2013): per-user pre-period activity (all event value before Jan 16)
    is the covariate X, post-period purchase value is the metric Y, arms
    are a deterministic user-id hash split, and the adjusted mean is
    ``mean(Y) − θ·(mean(X_arm) − mean(X_pooled))`` with
    ``θ = cov(X,Y)/var(X)`` estimated POOLED — the exact recipe every
    large experimentation platform runs nightly. All moments are exact
    DECIMAL partial sums (the ``agg_corr_covar_exact`` convention:
    associative-exact, engine- and partitioning-independent) with one
    closed-form double division at the end, rounded.

    Scale shape: one user-keyed shuffle builds per_user; pooled moments
    and per-arm sums are two one-row/two-row aggregates over it
    (map-side combinable), joined by a 1-row broadcast cross join — at
    100 TB the only data-scale pass is the first aggregate, identical
    to the Q1 shape."""
    e = read_table(spark, sf_dir, "events")
    split = F.lit(_CUPED_SPLIT).cast("timestamp")
    dec = F.col("value").cast("decimal(18,6)")
    per_user = e.groupBy("user_id").agg(
        F.round(
            F.coalesce(F.sum(F.when(F.col("ts") < split, dec)), F.lit(0))
            * 1_000_000
        )
        .cast("long")
        .alias("xi"),
        F.round(
            F.coalesce(
                F.sum(
                    F.when(
                        (F.col("ts") >= split)
                        & (F.col("event_type") == "purchase"),
                        dec,
                    )
                ),
                F.lit(0),
            )
            * 1_000_000
        )
        .cast("long")
        .alias("yi"),
    ).select((F.col("user_id") % 2).cast("int").alias("arm"), "xi", "yi")
    # µ-unit BIGINT cross-products in DECIMAL(38,0) (HUGEINT on the
    # oracle side): exact up to the single shared integer→double cast,
    # which both engines round identically from the same integer.
    xw = F.col("xi").cast("decimal(19,0)")
    yw = F.col("yi").cast("decimal(19,0)")
    pooled = per_user.agg(
        F.count("*").cast("double").alias("n"),
        F.sum("xi").cast("double").alias("sx"),
        F.sum("yi").cast("double").alias("sy"),
        F.sum(xw * yw).cast("double").alias("sxy"),
        F.sum(xw * xw).cast("double").alias("sxx"),
    )
    arm_stats = per_user.groupBy("arm").agg(
        F.count("*").alias("n_users"),
        F.sum("xi").cast("double").alias("a_sx"),
        F.sum("yi").cast("double").alias("a_sy"),
    )
    j = arm_stats.crossJoin(F.broadcast(pooled))
    theta = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    mean_y = F.col("a_sy") / F.col("n_users")
    mean_x = F.col("a_sx") / F.col("n_users")
    mu_x = F.col("sx") / F.col("n")
    return j.select(
        "arm",
        "n_users",
        F.round(mean_y / 1_000_000.0, 6).alias("mean_y"),
        F.round(theta, 9).alias("theta"),
        F.round((mean_y - theta * (mean_x - mu_x)) / 1_000_000.0, 6).alias(
            "mean_y_cuped"
        ),
    )


_B_REPLICAS = 200  # bootstrap replicas
# Poisson(1) inverse-CDF thresholds at 16 bits — the sample_poisson_
# bootstrap constants (floor(CDF·2^16), capped at 6)
_POIS = (24109, 48218, 60273, 64291, 65296, 65497)


@register(
    "experiment_bootstrap_uplift_ci",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
             CAST(user_id % 2 AS INT) AS arm,
             CAST(ROUND(COALESCE(SUM(CASE WHEN ts >= TIMESTAMP '{_CUPED_SPLIT}'
                            AND event_type = 'purchase'
                       THEN CAST(value AS DECIMAL(18,6)) END), 0) * 1000000)
                  AS BIGINT) AS yi
      FROM events
      GROUP BY user_id
    ), rep AS (
      SELECT u.user_id, u.arm, u.yi, r.r,
             (strpos('0123456789abcdef', substr(md5(CONCAT(CAST(u.user_id AS VARCHAR), ':', CAST(r.r AS VARCHAR))), 3, 1)) - 1) * 4096
           + (strpos('0123456789abcdef', substr(md5(CONCAT(CAST(u.user_id AS VARCHAR), ':', CAST(r.r AS VARCHAR))), 4, 1)) - 1) * 256
           + (strpos('0123456789abcdef', substr(md5(CONCAT(CAST(u.user_id AS VARCHAR), ':', CAST(r.r AS VARCHAR))), 5, 1)) - 1) * 16
           + (strpos('0123456789abcdef', substr(md5(CONCAT(CAST(u.user_id AS VARCHAR), ':', CAST(r.r AS VARCHAR))), 6, 1)) - 1) AS u16
      FROM per_user u CROSS JOIN (SELECT UNNEST(RANGE(1, {_B_REPLICAS} + 1)) AS r) r
    ), w AS (
      SELECT r, arm, yi,
             CASE WHEN u16 < {_POIS[0]} THEN 0
                  WHEN u16 < {_POIS[1]} THEN 1
                  WHEN u16 < {_POIS[2]} THEN 2
                  WHEN u16 < {_POIS[3]} THEN 3
                  WHEN u16 < {_POIS[4]} THEN 4
                  WHEN u16 < {_POIS[5]} THEN 5
                  ELSE 6 END AS w
      FROM rep
    ), by_rep AS (
      SELECT r,
             SUM(CASE WHEN arm = 1 THEN CAST(w AS HUGEINT) * yi ELSE 0 END) AS s1,
             SUM(CASE WHEN arm = 1 THEN w ELSE 0 END) AS n1,
             SUM(CASE WHEN arm = 0 THEN CAST(w AS HUGEINT) * yi ELSE 0 END) AS s0,
             SUM(CASE WHEN arm = 0 THEN w ELSE 0 END) AS n0
      FROM w GROUP BY r
    ), uplift AS (
      SELECT r,
             CAST(ROUND(CAST(s1 * n0 - s0 * n1 AS DOUBLE)
                        / CAST(CAST(n1 AS HUGEINT) * n0 AS DOUBLE)) AS BIGINT)
               AS uplift_mu
      FROM by_rep WHERE n1 > 0 AND n0 > 0
    ), point AS (
      SELECT CAST(ROUND(CAST(p.s1 * p.n0 - p.s0 * p.n1 AS DOUBLE)
                        / CAST(CAST(p.n1 AS HUGEINT) * p.n0 AS DOUBLE)) AS BIGINT)
               AS uplift_point_mu
      FROM (
        SELECT SUM(CASE WHEN arm = 1 THEN CAST(yi AS HUGEINT) ELSE 0 END) AS s1,
               SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS n1,
               SUM(CASE WHEN arm = 0 THEN CAST(yi AS HUGEINT) ELSE 0 END) AS s0,
               SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS n0
        FROM per_user) p
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_replicas,
           (SELECT uplift_point_mu FROM point) AS uplift_point_mu,
           ROUND(quantile_cont(uplift_mu, 0.025), 6) AS ci_lo_mu,
           ROUND(quantile_cont(uplift_mu, 0.975), 6) AS ci_hi_mu
    FROM uplift
    """,
    tags=("analytics", "experiment", "bootstrap", "events"),
)
def experiment_bootstrap_uplift_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bootstrap confidence interval for the A/B uplift via the POISSON
    bootstrap (Chamandy et al. 2012 — the distributed-data form): each
    user contributes w ~ Poisson(1) copies per replica, weights derived
    from fixed integer inverse-CDF thresholds over 16 bits of
    md5(user_id:replica) — no RNG state, no coordination, bit-identical
    on re-run — and each of the 200 replicas' uplift is the exact
    integer µ-unit ratio ``(S1·n0 − S0·n1)/(n1·n0)``. The 95% interval
    is exact linear-interpolation percentiles over the 200 integers
    (the `agg_percentiles_exact` pairing: Spark `percentile` ≡ DuckDB
    `quantile_cont`). Completes the experimentation readout next to
    `experiment_cuped_readout`: point estimate, variance-reduced mean,
    and now resampled uncertainty.

    Scale shape: the user×replica table is the only fan-out (|users|·B
    rows, pure map from one user-keyed aggregate); per-replica sums are
    one shuffle keyed by (replica, arm) — B·2 groups — and the
    percentile runs over B rows, constant-size by construction. At
    100 TB the per-user aggregate is the only data-scale pass."""
    e = read_table(spark, sf_dir, "events")
    split = F.lit(_CUPED_SPLIT).cast("timestamp")
    dec = F.col("value").cast("decimal(18,6)")
    per_user = e.groupBy("user_id").agg(
        F.round(
            F.coalesce(
                F.sum(
                    F.when(
                        (F.col("ts") >= split)
                        & (F.col("event_type") == "purchase"),
                        dec,
                    )
                ),
                F.lit(0),
            )
            * 1_000_000
        )
        .cast("long")
        .alias("yi"),
    ).select("user_id", (F.col("user_id") % 2).cast("int").alias("arm"), "yi")
    rep = per_user.select(
        "user_id",
        "arm",
        "yi",
        F.explode(F.sequence(F.lit(1), F.lit(_B_REPLICAS))).alias("r"),
    )
    u16 = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.col("user_id"), F.col("r"))), 3, 4
        ),
        16,
        10,
    ).cast("int")
    w = (
        F.when(u16 < _POIS[0], 0)
        .when(u16 < _POIS[1], 1)
        .when(u16 < _POIS[2], 2)
        .when(u16 < _POIS[3], 3)
        .when(u16 < _POIS[4], 4)
        .when(u16 < _POIS[5], 5)
        .otherwise(6)
    )
    rep = rep.select("r", "arm", "yi", w.alias("w"))
    wd = F.col("w").cast("decimal(19,0)")
    by_rep = rep.groupBy("r").agg(
        F.sum(F.when(F.col("arm") == 1, wd * F.col("yi")).otherwise(F.lit(0))).alias("s1"),
        F.sum(F.when(F.col("arm") == 1, F.col("w")).otherwise(F.lit(0))).alias("n1"),
        F.sum(F.when(F.col("arm") == 0, wd * F.col("yi")).otherwise(F.lit(0))).alias("s0"),
        F.sum(F.when(F.col("arm") == 0, F.col("w")).otherwise(F.lit(0))).alias("n0"),
    )
    n1d = F.col("n1").cast("decimal(19,0)")
    n0d = F.col("n0").cast("decimal(19,0)")
    uplift = by_rep.filter((F.col("n1") > 0) & (F.col("n0") > 0)).select(
        F.round(
            (F.col("s1") * n0d - F.col("s0") * n1d).cast("double")
            / (n1d * n0d).cast("double")
        )
        .cast("long")
        .alias("uplift_mu")
    )
    yid = F.col("yi").cast("decimal(19,0)")
    point = per_user.agg(
        F.sum(F.when(F.col("arm") == 1, yid).otherwise(F.lit(0))).alias("s1"),
        F.sum(F.when(F.col("arm") == 1, F.lit(1)).otherwise(F.lit(0))).alias("n1"),
        F.sum(F.when(F.col("arm") == 0, yid).otherwise(F.lit(0))).alias("s0"),
        F.sum(F.when(F.col("arm") == 0, F.lit(1)).otherwise(F.lit(0))).alias("n0"),
    ).select(
        F.round(
            (
                F.col("s1") * F.col("n0").cast("decimal(19,0)")
                - F.col("s0") * F.col("n1").cast("decimal(19,0)")
            ).cast("double")
            / (
                F.col("n1").cast("decimal(19,0)")
                * F.col("n0").cast("decimal(19,0)")
            ).cast("double")
        )
        .cast("long")
        .alias("uplift_point_mu")
    )
    agg = uplift.agg(
        F.count("*").alias("n_replicas"),
        F.round(F.expr("percentile(uplift_mu, 0.025D)"), 6).alias("ci_lo_mu"),
        F.round(F.expr("percentile(uplift_mu, 0.975D)"), 6).alias("ci_hi_mu"),
    )
    return agg.crossJoin(F.broadcast(point)).select(
        "n_replicas", "uplift_point_mu", "ci_lo_mu", "ci_hi_mu"
    )


# --------------------------------------------------------------------------
# Sample-ratio mismatch: the experiment trust gate
# --------------------------------------------------------------------------


@register(
    "experiment_srm_check",
    oracle="""
    WITH users AS (
      SELECT DISTINCT user_id FROM events
    ), assigned AS (
      SELECT user_id,
             CAST(user_id % 2 AS INT) AS arm_healthy,
             CASE WHEN CAST(('0x' || substring(md5('srm:' || CAST(user_id AS VARCHAR)), 1, 13))
                       AS BIGINT) % 100 < 41 THEN 0 ELSE 1 END AS arm_biased
      FROM users
    ), long AS (
      SELECT 'healthy_mod2' AS assignment, arm_healthy AS arm FROM assigned
      UNION ALL
      SELECT 'biased_hash41', arm_biased FROM assigned
    ), counts AS (
      SELECT assignment,
             CAST(COUNT(*) FILTER (WHERE arm = 0) AS BIGINT) AS n_a,
             CAST(COUNT(*) FILTER (WHERE arm = 1) AS BIGINT) AS n_b
      FROM long GROUP BY assignment
    )
    SELECT assignment, n_a, n_b,
           ROUND(CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE) / (n_a + n_b), 6)
             AS chi2,
           (CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE) / (n_a + n_b)) > 3.841459
             AS srm_detected
    FROM counts
    """,
    tags=("experiment", "analytics", "governance"),
)
def experiment_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio mismatch check — the trust gate every A/B readout
    (``experiment_cuped_readout``, ``experiment_bootstrap_uplift_ci``)
    should pass first: a χ² goodness-of-fit test that the realized arm
    split matches the designed 50/50 (Fabijan et al., ICSE-SEIP 2019
    popularized it as the #1 experiment-invalidator). For a two-arm
    50/50 design the statistic collapses to the exact closed form
    χ² = (n_a − n_b)²/(n_a + n_b) — integer numerator, one IEEE
    division, threshold 3.841 (p = 0.05, 1 dof).

    Two data-derived assignment rules make the gate non-vacuous in BOTH
    directions at the driver's sf0.01 gate: the healthy ``user_id % 2``
    split passes (χ² = 0 at 75/75) and a planted 41/59 hash-biased
    split is DETECTED (60/90 → χ² = 6.0 > 3.84) — so the oracle hash
    certifies the detector fires on real imbalance and stays quiet on a
    real balanced split. At sf0.001's 15 users neither flips (correct:
    χ² has no power at n = 15 — the test statistic, not the operator,
    is sample-bound). One distinct-users shuffle; the χ² algebra runs
    on a two-row aggregate."""
    users = read_table(spark, sf_dir, "events").select("user_id").distinct()
    h = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("srm:"), F.col("user_id").cast("string"))), 1, 13
            ),
            16,
            10,
        ).cast("long")
        % 100
    )
    assigned = users.select(
        (F.col("user_id") % 2).cast("int").alias("arm_healthy"),
        F.when(h < 41, 0).otherwise(1).alias("arm_biased"),
    )
    # ONE aggregate over the user census covers both assignment rules;
    # the 1-row result unpivots to the 2-row report (no double scan).
    wide = assigned.agg(
        F.count_if(F.col("arm_healthy") == 0).cast("long").alias("h_a"),
        F.count_if(F.col("arm_healthy") == 1).cast("long").alias("h_b"),
        F.count_if(F.col("arm_biased") == 0).cast("long").alias("b_a"),
        F.count_if(F.col("arm_biased") == 1).cast("long").alias("b_b"),
    )
    counts = wide.selectExpr(
        "stack(2, 'healthy_mod2', h_a, h_b, 'biased_hash41', b_a, b_b) "
        "AS (assignment, n_a, n_b)"
    )
    diff2 = (F.col("n_a") - F.col("n_b")) * (F.col("n_a") - F.col("n_b"))
    chi2 = diff2.cast("double") / (F.col("n_a") + F.col("n_b"))
    return counts.select(
        "assignment",
        "n_a",
        "n_b",
        F.round(chi2, 6).alias("chi2"),
        (chi2 > 3.841459).alias("srm_detected"),
    )


_Z95 = 1.959964  # two-sided 95% normal quantile


@register(
    "experiment_bayes_beta_posterior",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
             CAST(user_id % 2 AS INT) AS arm,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS converted
      FROM events GROUP BY user_id
    ), agg AS (
      SELECT arm,
             CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(SUM(converted) AS BIGINT) AS conversions
      FROM per_user GROUP BY arm
    )
    SELECT arm, n_users, conversions,
           ROUND(CAST(1 + conversions AS DOUBLE) / (2 + n_users), 6)
             AS post_mean,
           ROUND(CAST(1 + conversions AS DOUBLE) / (2 + n_users)
                 - {_Z95} * SQRT((CAST(1 + conversions AS DOUBLE) / (2 + n_users))
                                 * (1.0 - CAST(1 + conversions AS DOUBLE) / (2 + n_users))
                                 / (n_users + 3)), 6) AS ci_low,
           ROUND(CAST(1 + conversions AS DOUBLE) / (2 + n_users)
                 + {_Z95} * SQRT((CAST(1 + conversions AS DOUBLE) / (2 + n_users))
                                 * (1.0 - CAST(1 + conversions AS DOUBLE) / (2 + n_users))
                                 / (n_users + 3)), 6) AS ci_high
    FROM agg
    """,
    tags=("experiment", "analytics", "bayes"),
)
def experiment_bayes_beta_posterior(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bayesian conversion readout: per experiment arm (the catalog's
    standard ``user_id % 2`` assignment, shared with the CUPED and SRM
    queries), the Beta(1+c, 1+n-c) posterior over the conversion rate
    under a uniform Beta(1,1) prior — posterior mean (1+c)/(2+n) and a
    95% credible interval via the normal approximation with posterior
    variance p(1-p)/(n+3). Every figure is a closed-form function of two
    integer aggregates, so both engines perform the identical correctly-
    rounded double ops (sqrt is IEEE-exact); ROUND-6 seals the hash.

    Scale: one user-keyed aggregate (the only corpus-scale shuffle) into
    a 2-row arm table; the posterior algebra is constant-size."""
    e = read_table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted")
    )
    agg = per_user.groupBy(
        (F.col("user_id") % 2).cast("int").alias("arm")
    ).agg(
        F.count("*").cast("bigint").alias("n_users"),
        F.sum("converted").cast("bigint").alias("conversions"),
    )
    p = (F.lit(1) + F.col("conversions")).cast("double") / (
        F.lit(2) + F.col("n_users")
    )
    half = F.lit(_Z95) * F.sqrt(p * (F.lit(1.0) - p) / (F.col("n_users") + 3))
    return agg.select(
        "arm",
        "n_users",
        "conversions",
        F.round(p, 6).alias("post_mean"),
        F.round(p - half, 6).alias("ci_low"),
        F.round(p + half, 6).alias("ci_high"),
    )


@register(
    "experiment_delta_method_ratio_ci",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
             CAST(user_id % 2 AS INT) AS arm,
             CAST(SUM(CAST(ROUND(value * 10000) AS BIGINT)) AS BIGINT) AS y_e4,
             CAST(COUNT(*) AS BIGINT) AS n_ev
      FROM events GROUP BY user_id
    ), moments AS (
      SELECT arm,
             CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(SUM(y_e4) AS BIGINT) AS sy,
             CAST(SUM(n_ev) AS BIGINT) AS sn,
             CAST(SUM(y_e4 * y_e4) AS BIGINT) AS syy,
             CAST(SUM(n_ev * n_ev) AS BIGINT) AS snn,
             CAST(SUM(y_e4 * n_ev) AS BIGINT) AS syn
      FROM per_user GROUP BY arm
    ), alg AS (
      SELECT arm, n_users, sy, sn,
             CAST(sy AS DOUBLE) / sn AS r,
             (CAST(syy AS DOUBLE) / n_users
                - (CAST(sy AS DOUBLE) / n_users) * (CAST(sy AS DOUBLE) / n_users))
               AS vy,
             (CAST(snn AS DOUBLE) / n_users
                - (CAST(sn AS DOUBLE) / n_users) * (CAST(sn AS DOUBLE) / n_users))
               AS vn,
             (CAST(syn AS DOUBLE) / n_users
                - (CAST(sy AS DOUBLE) / n_users) * (CAST(sn AS DOUBLE) / n_users))
               AS cyn,
             CAST(sn AS DOUBLE) / n_users AS nbar
      FROM moments
    )
    SELECT arm, n_users,
           ROUND(r / 10000.0, 6) AS ratio,
           ROUND((r - {_Z95} * SQRT(
                    (vy - 2.0 * r * cyn + r * r * vn)
                      / (n_users * nbar * nbar))) / 10000.0, 6) AS ci_low,
           ROUND((r + {_Z95} * SQRT(
                    (vy - 2.0 * r * cyn + r * r * vn)
                      / (n_users * nbar * nbar))) / 10000.0, 6) AS ci_high
    FROM alg
    """,
    tags=("experiment", "analytics"),
)
def experiment_delta_method_ratio_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-method confidence interval for a RATIO metric (value per
    event, the 'revenue per session' shape) with the USER as the
    randomization unit — the readout every experimentation platform
    needs once the metric denominator is not the unit of randomization
    (naively treating events as i.i.d. understates variance; Deng et
    al., KDD 2018 'Applying the Delta Method in Metric Analytics').
    R = ΣY/ΣN per arm; Var(R) ≈ (σ²_Y − 2R·σ_YN + R²·σ²_N)/(n·n̄²) from
    five integer moment sums. Everything up to the final algebra is
    exact fixed-point integers; the closed-form doubles are identical
    correctly-rounded ops in both engines, sealed with ROUND-6.

    Scale: ONE user-keyed aggregate then a 2-row arm rollup carrying
    five moments — the same one-pass moment pattern as
    experiment_cuped_readout. Integer envelope: Σy² < 2^63 holds to
    ~10⁹ e4-scaled value units per user; past that the moment columns
    upgrade to DECIMAL(38,0) (documented, same rule as CUPED)."""
    e = read_table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.sum(F.round(F.col("value") * 10000).cast("bigint"))
        .cast("bigint")
        .alias("y_e4"),
        F.count("*").cast("bigint").alias("n_ev"),
    )
    m = per_user.groupBy(
        (F.col("user_id") % 2).cast("int").alias("arm")
    ).agg(
        F.count("*").cast("bigint").alias("n_users"),
        F.sum("y_e4").cast("bigint").alias("sy"),
        F.sum("n_ev").cast("bigint").alias("sn"),
        F.sum(F.col("y_e4") * F.col("y_e4")).cast("bigint").alias("syy"),
        F.sum(F.col("n_ev") * F.col("n_ev")).cast("bigint").alias("snn"),
        F.sum(F.col("y_e4") * F.col("n_ev")).cast("bigint").alias("syn"),
    )
    n = F.col("n_users")
    r = F.col("sy").cast("double") / F.col("sn")
    my = F.col("sy").cast("double") / n
    mn = F.col("sn").cast("double") / n
    vy = F.col("syy").cast("double") / n - my * my
    vn = F.col("snn").cast("double") / n - mn * mn
    cyn = F.col("syn").cast("double") / n - my * mn
    half = F.lit(_Z95) * F.sqrt(
        (vy - 2.0 * r * cyn + r * r * vn) / (n * mn * mn)
    )
    return m.select(
        "arm",
        "n_users",
        F.round(r / 10000.0, 6).alias("ratio"),
        F.round((r - half) / 10000.0, 6).alias("ci_low"),
        F.round((r + half) / 10000.0, 6).alias("ci_high"),
    )
