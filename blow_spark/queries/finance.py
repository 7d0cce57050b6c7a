"""Round-10 market/finance analytics shelf.

The price/volume statistics a trading- or revenue-analytics user runs:
volume-weighted average price (VWAP), Bollinger-band breakout
detection, CAPM beta of each brand's revenue series against the
market, and Herfindahl-Hirschman revenue concentration.

Reference parity note: the reference engine (wizgrao/blow,
maps/maps.go:8-21) has no aggregation or window surface; this shelf
extends the product-analytics family (queries/product.py — max
drawdown, cohort LTV) with the price-series operators it lacks.

Engine-exactness: prices/revenues ride as exact cent BIGINTs; rolling
means are integer divisions; the Bollinger breakout FLAG is decided by
a pure-integer inequality (never by a rounded sqrt); CAPM moments use
the n-scaled integer-numerator trick in DECIMAL(38,0) so the only
doubles are final single divisions on identical operands.

Scale design: everything aggregates to (brand × day) grain — calendar-
bounded — before any window; the per-brand windows are partitioned
(parallel); the market series is a 1-row-per-day broadcast join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from blow_spark.queries import register
from blow_spark.sources import read_table


@register(
    "finance_vwap_monthly",
    oracle="""
    WITH jl AS (
      SELECT p.p_brand AS brand,
             date_trunc('month', l.l_shipdate) AS month,
             CAST(ROUND(l.l_extendedprice * 100) AS BIGINT) AS price_cents,
             CAST(l.l_quantity AS BIGINT) AS qty
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    )
    SELECT brand, month,
           CAST(SUM(price_cents * qty) AS BIGINT) AS pv_cents,
           CAST(SUM(qty) AS BIGINT) AS vol,
           ROUND(CAST(SUM(price_cents * qty) AS DOUBLE) / SUM(qty) / 100.0, 6)
             AS vwap
    FROM jl
    GROUP BY brand, month
    ORDER BY brand, month
    """,
    tags=("finance", "agg", "lineitem"),
)
def finance_vwap_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-weighted average price per (brand, month) — THE execution
    benchmark of trading systems, here over line-item prices weighted
    by quantity. Both the price·volume numerator and the volume
    denominator are exact BIGINTs (cent-scaled price × integer
    quantity), so the VWAP is one final division of identical integers.

    Scale: one broadcast join (part is the dimension side) + one keyed
    aggregate to the calendar-bounded (25 brands × months) grain —
    map-side combinable, no window anywhere. Reference analog: blow
    (maps/maps.go:8-21) has no grouped aggregation at all."""
    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part")
    jl = li.join(F.broadcast(p), p.p_partkey == li.l_partkey).select(
        F.col("p_brand").alias("brand"),
        F.date_trunc("month", "l_shipdate").alias("month"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("price_cents"),
        F.col("l_quantity").cast("bigint").alias("qty"),
    )
    return (
        jl.groupBy("brand", "month")
        .agg(
            F.sum(F.col("price_cents") * F.col("qty"))
            .cast("bigint")
            .alias("pv_cents"),
            F.sum("qty").cast("bigint").alias("vol"),
        )
        .select(
            "brand",
            "month",
            "pv_cents",
            "vol",
            F.round(
                F.col("pv_cents").cast("double") / F.col("vol") / 100.0, 6
            ).alias("vwap"),
        )
        .orderBy("brand", "month")
    )


_BB_N = 20  # Bollinger window length


@register(
    "finance_bollinger_breakouts",
    oracle=f"""
    WITH daily AS (
      SELECT p.p_brand AS brand, CAST(l.l_shipdate AS DATE) AS day,
             CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS rev_cents
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY 1, 2
    ), rolled AS (
      SELECT brand, day, rev_cents,
             COUNT(*) OVER w AS n,
             SUM(rev_cents) OVER w AS s,
             SUM(CAST(rev_cents AS HUGEINT) * rev_cents) OVER w AS ssq
      FROM daily
      WINDOW w AS (PARTITION BY brand ORDER BY day
                   ROWS BETWEEN {_BB_N - 1} PRECEDING AND CURRENT ROW)
    )
    SELECT brand, CAST(day AS VARCHAR) AS day, rev_cents,
           CAST(s * 100 // n AS BIGINT) AS mean_cents_x100,
           CAST(CAST(rev_cents AS HUGEINT) * n - s AS VARCHAR) AS dev_xn,
           CAST((CAST(rev_cents AS HUGEINT) * n - s)
                * (CAST(rev_cents AS HUGEINT) * n - s)
                > 4 * (n * ssq - CAST(s AS HUGEINT) * s)
                AS BIGINT) AS is_breakout,
           ROUND(SQRT(CAST(n * ssq - CAST(s AS HUGEINT) * s AS DOUBLE))
                 / n / 100.0, 4) AS sigma_dollars
    FROM rolled
    WHERE n = {_BB_N}
    ORDER BY brand, day
    """,
    tags=("finance", "window", "exact"),
)
def finance_bollinger_breakouts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger-band breakout detection (Bollinger 1980s; the ±2σ
    rolling envelope) over each brand's daily revenue series, with the
    breakout FLAG decided by a PURE-INTEGER inequality: |x − µ| > 2σ
    ⟺ (n·x − S)² > 4·(n·SSq − S²), all BIGINT/DECIMAL — the flag can
    never flip on a libm sqrt ulp, which matters because a flipped flag
    changes the row VALUES where a rounded band only drifts. The σ
    column is reported (not compared against) at 4 decimals.

    Scale: the corpus reduces to (brand × day) calendar-bounded grain
    in one keyed aggregate; the 20-row rolling window is partitioned by
    brand (parallel at any width). The n-scaled deviation is also
    emitted (as text — it exceeds int64 by design) so downstream exact
    replays don't recompute the window."""
    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part")
    daily = (
        li.join(F.broadcast(p), p.p_partkey == li.l_partkey)
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.col("l_shipdate").cast("date").alias("day"),
        )
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("rev_cents")
        )
    )
    w = (
        W.partitionBy("brand")
        .orderBy("day")
        .rowsBetween(-(_BB_N - 1), 0)
    )
    dec = F.col("rev_cents").cast("decimal(38,0)")
    rolled = daily.select(
        "brand",
        "day",
        "rev_cents",
        F.count("*").over(w).alias("n"),
        F.sum("rev_cents").over(w).alias("s"),
        F.sum(dec * F.col("rev_cents")).over(w).alias("ssq"),
    )
    n, s, ssq = F.col("n"), F.col("s"), F.col("ssq")
    dev_xn = F.col("rev_cents").cast("decimal(38,0)") * n - s
    var_xn2 = n.cast("decimal(38,0)") * ssq - s.cast("decimal(38,0)") * s
    return (
        rolled.where(n == _BB_N)
        .select(
            "brand",
            F.col("day").cast("string").alias("day"),
            "rev_cents",
            F.expr("s * 100 div n").cast("bigint").alias("mean_cents_x100"),
            dev_xn.cast("decimal(38,0)").cast("string").alias("dev_xn"),
            (dev_xn * dev_xn > 4 * var_xn2)
            .cast("bigint")
            .alias("is_breakout"),
            F.round(F.sqrt(var_xn2.cast("double")) / n / 100.0, 4).alias(
                "sigma_dollars"
            ),
        )
        .orderBy("brand", "day")
    )


@register(
    "finance_capm_beta",
    oracle="""
    WITH daily AS (
      SELECT p.p_brand AS brand, CAST(l.l_shipdate AS DATE) AS day,
             CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS rev_cents
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY 1, 2
    ), market AS (
      SELECT day, CAST(SUM(rev_cents) AS BIGINT) AS mkt_cents
      FROM daily GROUP BY day
    ), brand_r AS (
      SELECT brand, day,
             CAST(ROUND((CAST(rev_cents AS DOUBLE)
                         / LAG(rev_cents) OVER (PARTITION BY brand
                                                ORDER BY day) - 1.0)
                        * 1000000000) AS BIGINT) AS r_e9
      FROM daily
    ), mkt_r AS (
      SELECT day,
             CAST(ROUND((CAST(mkt_cents AS DOUBLE)
                         / LAG(mkt_cents) OVER (ORDER BY day) - 1.0)
                        * 1000000000) AS BIGINT) AS m_e9
      FROM market
    ), joined AS (
      SELECT b.brand, b.r_e9, m.m_e9
      FROM brand_r b JOIN mkt_r m ON b.day = m.day
      WHERE b.r_e9 IS NOT NULL AND m.m_e9 IS NOT NULL
    ), moments AS (
      SELECT brand,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(r_e9) AS BIGINT) AS sx,
             CAST(SUM(m_e9) AS BIGINT) AS sm,
             SUM(CAST(r_e9 AS HUGEINT) * m_e9) AS sxm,
             SUM(CAST(m_e9 AS HUGEINT) * m_e9) AS smm
      FROM joined GROUP BY brand
    )
    SELECT brand, n,
           ROUND(CAST(n * sxm - CAST(sx AS HUGEINT) * sm AS DOUBLE)
                 / CAST(n * smm - CAST(sm AS HUGEINT) * sm AS DOUBLE), 6)
             AS beta
    FROM moments
    ORDER BY brand
    """,
    tags=("finance", "stats"),
)
def finance_capm_beta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CAPM beta (Sharpe 1964) of each brand's daily revenue-return
    series against the all-brand "market" return: β = cov(r, m)/var(m).
    Returns are single divisions of exact cent integers (IEEE-identical
    both engines), fix-pointed at e9 per day BEFORE any sum — the house
    per-term rule — so the moment sums are exact integers (DECIMAL 38
    for the cross products) and β is one final division of identical
    operands. Covariance uses the n-scaled numerator identity
    n·Σxy − Σx·Σy, never a mean subtraction in doubles.

    Scale: (brand × day) and (day) grains are calendar-bounded; the
    market series joins back by day (broadcast-size). The per-brand
    LAG windows are partitioned (parallel). Reference analog: none —
    blow has no windows or joins (SURVEY §2.2)."""
    from blow_spark.materialize import spill_to_parquet

    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part")
    # the daily grain feeds both the brand-return and market branches;
    # spilled so the lineitem scan + join + aggregate runs once
    daily = spill_to_parquet(
        li.join(F.broadcast(p), p.p_partkey == li.l_partkey)
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.col("l_shipdate").cast("date").alias("day"),
        )
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("rev_cents")
        ),
        "blow_spark_capm_daily_",
    )
    market = daily.groupBy("day").agg(
        F.sum("rev_cents").cast("bigint").alias("mkt_cents")
    )
    brand_r = daily.select(
        "brand",
        "day",
        F.round(
            (
                F.col("rev_cents").cast("double")
                / F.lag("rev_cents").over(W.partitionBy("brand").orderBy("day"))
                - 1.0
            )
            * 1e9
        )
        .cast("bigint")
        .alias("r_e9"),
    )
    mkt_r = market.select(
        "day",
        F.round(
            (
                F.col("mkt_cents").cast("double")
                / F.lag("mkt_cents").over(W.partitionBy(F.lit(1)).orderBy("day"))
                - 1.0
            )
            * 1e9
        )
        .cast("bigint")
        .alias("m_e9"),
    )
    joined = brand_r.join(F.broadcast(mkt_r), "day").where(
        F.col("r_e9").isNotNull() & F.col("m_e9").isNotNull()
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    moments = joined.groupBy("brand").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("r_e9").cast("bigint").alias("sx"),
        F.sum("m_e9").cast("bigint").alias("sm"),
        F.sum(dec("r_e9") * F.col("m_e9")).alias("sxm"),
        F.sum(dec("m_e9") * F.col("m_e9")).alias("smm"),
    )
    n = F.col("n").cast("decimal(38,0)")
    cov_num = n * F.col("sxm") - dec("sx") * F.col("sm")
    var_num = n * F.col("smm") - dec("sm") * F.col("sm")
    return moments.select(
        "brand",
        "n",
        F.round(cov_num.cast("double") / var_num.cast("double"), 6).alias("beta"),
    ).orderBy("brand")


@register(
    "finance_herfindahl_concentration",
    oracle="""
    WITH rev AS (
      SELECT c.c_mktsegment AS segment, o.o_custkey,
             CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS rev_cents
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY 1, 2
    ), seg AS (
      SELECT segment,
             CAST(COUNT(*) AS BIGINT) AS n_customers,
             CAST(SUM(rev_cents) AS BIGINT) AS seg_cents,
             SUM(CAST(rev_cents AS HUGEINT) * rev_cents) AS sumsq
      FROM rev GROUP BY segment
    )
    SELECT segment, n_customers, seg_cents,
           CAST(ROUND(CAST(sumsq AS DOUBLE)
                      / (CAST(seg_cents AS DOUBLE) * seg_cents)
                      * 1000000) AS BIGINT) AS hhi_e6
    FROM seg
    ORDER BY segment
    """,
    tags=("finance", "agg"),
)
def finance_herfindahl_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman concentration index per market segment —
    HHI = Σ (customer share)² of segment revenue, the antitrust/risk
    measure of how concentrated a revenue base is (monopoly → 1,
    atomized → 1/n). The identity Σ(sᵢ/S)² = Σsᵢ²/S² keeps everything
    integral: per-customer revenues are exact cents, their squares sum
    in DECIMAL(38,0)/HUGEINT, and the index is ONE division of
    identical operands, fix-pointed at e6.

    Scale: two keyed aggregates (customer grain, then segment grain),
    both map-side combinable; complements agg_gini_concentration with
    the other standard concentration functional."""
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    rev = (
        o.join(F.broadcast(c), c.c_custkey == o.o_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"), "o_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("rev_cents")
        )
    )
    seg = rev.groupBy("segment").agg(
        F.count("*").cast("bigint").alias("n_customers"),
        F.sum("rev_cents").cast("bigint").alias("seg_cents"),
        F.sum(F.col("rev_cents").cast("decimal(38,0)") * F.col("rev_cents")).alias(
            "sumsq"
        ),
    )
    return seg.select(
        "segment",
        "n_customers",
        "seg_cents",
        F.round(
            F.col("sumsq").cast("double")
            / (F.col("seg_cents").cast("double") * F.col("seg_cents"))
            * 1e6
        )
        .cast("bigint")
        .alias("hhi_e6"),
    ).orderBy("segment")


# --------------------------------------------------------------------------
# Holt linear-trend smoothing as an exact dyadic lag fan (round 10)
# --------------------------------------------------------------------------

_HOLT_K = 16


def _holt_coeffs() -> tuple[list[int], list[int], int]:
    """Impulse-response coefficients of Holt's linear-trend smoother
    (α = 1/2, β = 1/4 — dyadic, so every coefficient is an exact binary
    rational): l_t = Σᵢ hₗ[i]·x_{t−i}, b_t = Σᵢ h_b[i]·x_{t−i} for the
    zero-init system, truncated at K = 16 lags (tail weight ≈ 0.2% of
    the unit step). Computed ONCE with exact Fractions and scaled to a
    common 2⁴⁸ denominator; both engines receive the SAME integer
    literals, so the smoother is pure fixed-point arithmetic."""
    from fractions import Fraction as Fr

    A, B = Fr(1, 2), Fr(1, 4)
    hl, hb = [], []
    l_prev, b_prev = Fr(0), Fr(0)
    for t in range(_HOLT_K):
        x = Fr(1) if t == 0 else Fr(0)
        lv = A * x + (1 - A) * (l_prev + b_prev)
        bv = B * (lv - l_prev) + (1 - B) * b_prev
        hl.append(lv)
        hb.append(bv)
        l_prev, b_prev = lv, bv
    d = 1 << 48
    cl = [f * d for f in hl]
    cb = [f * d for f in hb]
    assert all(c.denominator == 1 for c in cl + cb)
    return [int(c) for c in cl], [int(c) for c in cb], d


_HOLT_CL, _HOLT_CB, _HOLT_D = _holt_coeffs()

#: e4 reporting denominator: level_x/trend_x are cents scaled by 2^48,
#: so dollars*1e4 = x * 1e4 / (2^48 * 100)
_HOLT_E4_DEN = _HOLT_D * 100


def _holt_e4_duck(x: str) -> str:
    """Exact half-away-from-zero e4 scaling of a 2^48-cent fixed-point
    value, in pure HUGEINT arithmetic. The previous
    ROUND(x::DOUBLE/…, 4) hit a 4-decimal TIE at sf1 (round-13 overflow
    audit): Spark's round() goes through BigDecimal.valueOf (shortest
    decimal repr, HALF_UP) while DuckDB rounds the exact binary double,
    and the two disagree exactly on ties. Integer division can't."""
    den = _HOLT_E4_DEN
    return (
        f"CAST(CASE WHEN {x} >= 0 "
        f"THEN (2 * CAST({x} AS HUGEINT) * 10000 + {den}) // {2 * den} "
        f"ELSE -((2 * CAST(-({x}) AS HUGEINT) * 10000 + {den}) // {2 * den}) "
        f"END AS BIGINT)"
    )


def _holt_e4_spark(x: str):
    """Spark twin of _holt_e4_duck, built over the column expression
    ``x`` (decimal `div` truncates toward zero, matching DuckDB's `//`
    on the non-negative operands this CASE feeds it)."""
    den = _HOLT_E4_DEN
    return F.expr(
        f"CAST(CASE WHEN ({x}) >= 0 "
        f"THEN (2 * CAST({x} AS DECIMAL(38,0)) * 10000 + {den}) "
        f"div CAST({2 * den} AS DECIMAL(38,0)) "
        f"ELSE -((2 * CAST(-({x}) AS DECIMAL(38,0)) * 10000 + {den}) "
        f"div CAST({2 * den} AS DECIMAL(38,0))) "
        f"END AS BIGINT)"
    )


def _holt_duck_sum(coeffs: list[int]) -> str:
    return " + ".join(
        f"CAST({c} AS HUGEINT) * LAG(rev_cents, {i}) OVER w"
        for i, c in enumerate(coeffs)
    )


@register(
    "timeseries_holt_linear_dyadic",
    oracle=f"""
    WITH daily AS (
      SELECT p.p_brand AS brand, CAST(l.l_shipdate AS DATE) AS day,
             CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS rev_cents
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY 1, 2
    ), rolled AS (
      SELECT brand, day, rev_cents,
             COUNT(*) OVER (PARTITION BY brand ORDER BY day
                            ROWS BETWEEN {_HOLT_K - 1} PRECEDING
                            AND CURRENT ROW) AS n,
             {_holt_duck_sum(_HOLT_CL)} AS level_x,
             {_holt_duck_sum(_HOLT_CB)} AS trend_x
      FROM daily
      WINDOW w AS (PARTITION BY brand ORDER BY day)
    )
    SELECT brand, CAST(day AS VARCHAR) AS day, rev_cents,
           CAST(level_x AS VARCHAR) AS level_x,
           {_holt_e4_duck('level_x')} AS level_e4,
           {_holt_e4_duck('trend_x')} AS trend_e4,
           {_holt_e4_duck('(level_x + trend_x)')} AS forecast_e4
    FROM rolled
    WHERE n = {_HOLT_K}
    ORDER BY brand, day
    """,
    tags=("timeseries", "window", "exact"),
)
def timeseries_holt_linear_dyadic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear-trend exponential smoothing (Holt 1957) over each
    brand's daily revenue, EXACT: with dyadic gains (α = 1/2, β = 1/4)
    the level/trend recursion is a linear filter whose impulse response
    is all binary rationals, so the {_HOLT_K}-lag span-limited smoother
    becomes a FIXED integer lag fan — Python derives the coefficients
    once with exact Fractions at a 2⁴⁸ common denominator and injects
    the SAME literals into both plans (the Holt extension of
    timeseries_ewma_dyadic's single-state trick; the tail it drops is
    ≈0.2% of a unit step). Level, trend, and the one-step forecast
    l + b are DECIMAL/HUGEINT sums of literal×BIGINT products — no
    recursion, no state, and (since the round-13 overflow audit) no
    doubles AT ALL: the e4 reporting scale is an exact half-away
    integer division (the old ROUND-on-double hit a 4-decimal tie at
    sf1 where Spark's BigDecimal HALF_UP and DuckDB's binary round
    disagree).

    Scale: turns an inherently SEQUENTIAL recursion into an ordinary
    partitioned window (one shuffle on brand, {_HOLT_K} LAGs) — the
    same reformulation that lets a 1000-executor cluster smooth every
    series in one pass instead of scanning per-series state in order."""
    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part")
    daily = (
        li.join(F.broadcast(p), p.p_partkey == li.l_partkey)
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.col("l_shipdate").cast("date").alias("day"),
        )
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("rev_cents")
        )
    )
    w = W.partitionBy("brand").orderBy("day")
    wn = w.rowsBetween(-(_HOLT_K - 1), 0)

    def fan(coeffs: list[int]):
        total = None
        for i, c in enumerate(coeffs):
            term = F.lit(c).cast("decimal(38,0)") * F.lag("rev_cents", i).over(w)
            total = term if total is None else total + term
        return total

    rolled = daily.select(
        "brand",
        "day",
        "rev_cents",
        F.count("*").over(wn).alias("n"),
        fan(_HOLT_CL).alias("level_x"),
        fan(_HOLT_CB).alias("trend_x"),
    )
    return (
        rolled.where(F.col("n") == _HOLT_K)
        .select(
            "brand",
            F.col("day").cast("string").alias("day"),
            "rev_cents",
            F.col("level_x").cast("string").alias("level_x"),
            _holt_e4_spark("level_x").alias("level_e4"),
            _holt_e4_spark("trend_x").alias("trend_e4"),
            _holt_e4_spark("level_x + trend_x").alias("forecast_e4"),
        )
        .orderBy("brand", "day")
    )


@register(
    "finance_sharpe_sortino",
    oracle="""
    WITH daily AS (
      SELECT p.p_brand AS brand, CAST(l.l_shipdate AS DATE) AS day,
             CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS rev_cents
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY 1, 2
    ), deltas AS (
      SELECT brand,
             rev_cents - LAG(rev_cents) OVER (PARTITION BY brand
                                              ORDER BY day) AS d
      FROM daily
    ), agg AS (
      SELECT brand, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(d) AS BIGINT) AS s,
             SUM(CAST(d AS HUGEINT) * d) AS ssq,
             SUM(CASE WHEN d < 0 THEN CAST(d AS HUGEINT) * d
                      ELSE CAST(0 AS HUGEINT) END) AS dd
      FROM deltas WHERE d IS NOT NULL GROUP BY brand
    )
    SELECT brand, n, s AS sum_delta_cents,
           CAST(ROUND(1000000.0 * s
                / SQRT(CAST(n * ssq - CAST(s AS HUGEINT) * s AS DOUBLE)))
                AS BIGINT) AS sharpe_e6,
           CASE WHEN dd = 0 THEN NULL
                ELSE CAST(ROUND(1000000.0 * s
                     / SQRT(CAST(n * dd AS DOUBLE))) AS BIGINT)
           END AS sortino_e6
    FROM agg ORDER BY brand
    """,
    tags=("finance", "window", "exact"),
)
def finance_sharpe_sortino(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sharpe and Sortino ratios of each brand's day-over-day revenue
    CHANGES (the stationary series — raw revenue levels have no risk
    interpretation): Sharpe = mean(Δ)/σ(Δ) computed as the
    algebraically-identical S/√(n·ΣΔ²−S²) so every moment is an exact
    integer (HUGEINT/DECIMAL(38,0) — ΣΔ² overflows 64 bits at sf ≥ 1),
    and Sortino replaces the denominator with the DOWNSIDE deviation
    √(n·Σ min(Δ,0)²) per Sortino & Price (J. Investing 1994). Doubles
    appear only in the two final sqrt-divisions on identical operands.

    Scale: one keyed aggregate to (brand × day), one brand-partitioned
    lag window (25-way parallel, calendar-bounded), one keyed
    aggregate. Reference analog: blow (maps/maps.go:8-21) has no
    windows; companion to finance_bollinger_breakouts."""
    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part")
    daily = (
        li.join(F.broadcast(p), p.p_partkey == li.l_partkey)
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.col("l_shipdate").cast("date").alias("day"),
        )
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("rev_cents")
        )
    )
    deltas = daily.select(
        "brand",
        (
            F.col("rev_cents")
            - F.lag("rev_cents").over(W.partitionBy("brand").orderBy("day"))
        ).alias("d"),
    ).where(F.col("d").isNotNull())
    dd = F.col("d").cast("decimal(38,0)")
    agg = deltas.groupBy("brand").agg(
        F.count("*").alias("n"),
        F.sum("d").cast("bigint").alias("s"),
        F.sum(dd * F.col("d")).alias("ssq"),
        F.sum(
            F.when(F.col("d") < 0, dd * F.col("d")).otherwise(
                F.lit(0).cast("decimal(38,0)")
            )
        ).alias("dd"),
    )
    nd = F.col("n").cast("decimal(38,0)")
    return agg.select(
        "brand",
        "n",
        F.col("s").alias("sum_delta_cents"),
        F.round(
            1000000.0
            * F.col("s")
            / F.sqrt(
                (
                    nd * F.col("ssq")
                    - F.col("s").cast("decimal(38,0)") * F.col("s")
                ).cast("double")
            )
        )
        .cast("bigint")
        .alias("sharpe_e6"),
        F.when(F.col("dd") == 0, F.lit(None).cast("bigint"))
        .otherwise(
            F.round(
                1000000.0 * F.col("s") / F.sqrt((nd * F.col("dd")).cast("double"))
            ).cast("bigint")
        )
        .alias("sortino_e6"),
    ).orderBy("brand")


# --------------------------------------------------------------------------
# Historical VaR / CVaR (round 12)
# --------------------------------------------------------------------------

_VAR_ALPHA_MICRO = 50_000  # 5% tail, in micro-units (integer ceil math)


@register(
    "finance_var_cvar_historical",
    oracle=f"""
    WITH daily AS (
      SELECT c.c_nationkey AS nk, CAST(o.o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY 1, 2
    ), deltas AS (
      SELECT nk, day,
             cents - LAG(cents) OVER (PARTITION BY nk ORDER BY day) AS d
      FROM daily
    ), ranked AS (
      SELECT nk, d,
             ROW_NUMBER() OVER (PARTITION BY nk ORDER BY d, day) AS rn,
             COUNT(*) OVER (PARTITION BY nk) AS n
      FROM deltas WHERE d IS NOT NULL
    ), k AS (
      SELECT nk, d, rn, n,
             ({_VAR_ALPHA_MICRO} * n + 999999) // 1000000 AS kk
      FROM ranked
    )
    SELECT nk, CAST(MAX(n) AS BIGINT) AS n_days,
           CAST(MAX(kk) AS BIGINT) AS k_tail,
           CAST(MAX(CASE WHEN rn = kk THEN -d END) AS BIGINT) AS var95_cents,
           CAST(ROUND(1000.0 * SUM(CASE WHEN rn <= kk THEN -d ELSE 0 END)
                      / MAX(kk)) AS BIGINT) AS cvar95_cents_e3
    FROM k GROUP BY nk ORDER BY nk
    """,
    tags=("finance", "risk", "orders", "exact"),
)
def finance_var_cvar_historical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Historical (non-parametric) Value-at-Risk and Conditional VaR /
    Expected Shortfall at 95% on day-over-day revenue deltas per nation
    — the tail-risk pair every risk desk reports (Artzner et al.,
    Math. Finance 1999 established CVaR as the coherent one; VaR alone
    ignores tail shape). Exact order statistics, no distributional
    assumption: losses are the NEGATED deltas, VaR₉₅ is the k-th worst
    loss with k = ⌈0.05·n⌉ in floor-biased integer micro-arithmetic
    (the prefix-filter ceil discipline — never an IEEE ceil), CVaR₉₅ is
    the exact mean of the k worst, carried as an e3 fixpoint
    (ROUND(1000·Σloss/k) on identical exact integer operands — sign-
    safe, unlike integer division whose floor-vs-truncate semantics
    diverge on the negative sums a calm series produces).

    Scale: one date-keyed reduction to the calendar-bounded daily
    series, one nation-partitioned lag/rank window (25-way parallel,
    never global), value-grain output. Reference analog: none."""
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    daily = (
        o.join(F.broadcast(c), c.c_custkey == o.o_custkey)
        .groupBy(
            F.col("c_nationkey").alias("nk"),
            F.to_date("o_orderdate").alias("day"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("cents")
        )
    )
    wlag = W.partitionBy("nk").orderBy("day")
    deltas = daily.select(
        "nk",
        "day",
        (F.col("cents") - F.lag("cents").over(wlag)).alias("d"),
    ).filter(F.col("d").isNotNull())
    wrank = W.partitionBy("nk").orderBy("d", "day")
    ranked = deltas.select(
        "nk",
        "d",
        F.row_number().over(wrank).alias("rn"),
        F.count("*").over(W.partitionBy("nk")).alias("n"),
    ).withColumn(
        "kk",
        F.expr(f"({_VAR_ALPHA_MICRO} * n + 999999) div 1000000"),
    )
    return (
        ranked.groupBy("nk")
        .agg(
            F.max("n").cast("bigint").alias("n_days"),
            F.max("kk").cast("bigint").alias("k_tail"),
            F.max(F.when(F.col("rn") == F.col("kk"), -F.col("d")))
            .cast("bigint")
            .alias("var95_cents"),
            F.round(
                1000.0
                * F.sum(
                    F.when(F.col("rn") <= F.col("kk"), -F.col("d")).otherwise(0)
                )
                / F.max("kk")
            )
            .cast("bigint")
            .alias("cvar95_cents_e3"),
        )
        .orderBy("nk")
    )
