"""Round-14 continuation shelf — drift / variance / autoregression ops:

* the Brown-Forsythe robust variance-homogeneity test (Brown &
  Forsythe, JASA 1974; the median-centered Levene 1960) — exact
  integer group medians + fixed-point F readout;
* Yule-Walker AR(2) coefficients (Yule 1927, Walker 1931) on the
  hourly mean-value series — closed-form Cramer solve over exact
  scaled-deviation autocovariances;
* the Page-Hinkley sequential drift statistic (Page, Biometrika 1954;
  Hinkley 1971) — cumulative mean-deviation test with integer
  running means;
* unnormalized Haar wavelet level energies (Haar 1910; Mallat's
  pyramid, IEEE TPAMI 1989) — dyadic pairwise sum/difference
  cascade, exact integers end to end with VARCHAR transport for the
  >int64 energy sums.

Reference parity note: the reference engine (wizgrao/blow,
maps/maps.go:8-21) has no aggregation/window surface; this shelf
extends the stats/timeseries families (queries/stats*.py) the brief's
analytics mandate requires.

Engine-exactness: inputs are e1/e2/e3 fixed-point BIGINT bins of the
double `value` column (FLOOR(value·10^k) — one IEEE multiply + floor
on identical doubles, deterministic in both engines); every
cumulative/moment quantity is BIGINT or DECIMAL(38,0)/HUGEINT; every
rational readout is a truncating integer division on identical
operands (both `div` and `//` truncate, and every divisor here is
positive, so floor-vs-truncate can never diverge).

Scale design: the Brown-Forsythe pipeline aggregates to VALUE
grain (one row per distinct e3 bin per group) before any window, and
every window partitions by `event_type` — no single-partition window
anywhere. The hourly-series operators reduce the corpus to the
720-hour fixture calendar (one data-scale shuffle each); everything
after runs at calendar grain, which grows with the observation span,
never the data. Magnitude envelopes per operator are documented
inline; mean-based series are sf-INVARIANT by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from blow_spark.queries import register
from blow_spark.sources import read_table

#: the repo-wide events fixture calendar: 30 days of January 2024.
_CAL_HOURS = 720
#: unix HOURS at 2024-01-01T00:00:00Z (1704067200 s / 3600).
_T0_H = 473352

#: Page-Hinkley magnitude tolerance / alarm threshold, e3 units.
_PH_DELTA_E3 = 2000  # 2.0 value units
_PH_LAMBDA_E3 = 20000  # 20.0 value units

#: Haar cascade depth (512 = 2^9 hours in scope, 6 detail levels).
_HAAR_N = 512
_HAAR_LEVELS = 6


def _hourly_series(spark: SparkSession, sf_dir: str, scale: int, how: str):
    """Dense per-type hourly integer series over the fixture calendar:
    (event_type, h ∈ [0, {_CAL_HOURS}), x) with x = the hour's
    floor-mean ('mean') or sum ('sum') of FLOOR(value·scale).

    One data-scale shuffle (the (type, hour) aggregate); the dense
    grid is types × {_CAL_HOURS} rows — calendar-bounded. The hourly
    aggregate is SPILLED (it is calendar-sized and every caller
    consumes it through ≥ 2 branches — the type grid and the value
    join — which would otherwise re-run the corpus scan per branch)."""
    from blow_spark.materialize import spill_to_parquet

    e = read_table(spark, sf_dir, "events")
    per = (
        e.select(
            "event_type",
            (F.expr("unix_micros(ts) div 3600000000") - F.lit(_T0_H)).alias("h"),
            F.floor(F.col("value") * scale).cast("long").alias("v"),
        )
        .where((F.col("h") >= 0) & (F.col("h") < _CAL_HOURS))
        .groupBy("event_type", "h")
        .agg(F.sum("v").alias("s"), F.count("*").alias("c"))
    )
    per = spill_to_parquet(per)
    grid = (
        per.select("event_type")
        .distinct()
        .crossJoin(
            F.broadcast(spark.range(_CAL_HOURS).select(F.col("id").alias("h")))
        )
    )
    x = F.expr("s div c") if how == "mean" else F.col("s")
    return grid.join(per, ["event_type", "h"], "left").select(
        "event_type", "h", F.coalesce(x, F.lit(0)).cast("long").alias("x")
    )


def _hourly_series_sql(scale: int, how: str) -> str:
    """DuckDB twin of :func:`_hourly_series` as a WITH-clause prefix
    ending in a ``dense(event_type, h, x)`` CTE."""
    x = "s // c" if how == "mean" else "s"
    return f"""
    per AS (
      SELECT event_type,
             (epoch_us(ts) // 3600000000) - {_T0_H} AS h,
             SUM(CAST(FLOOR(value * {scale}) AS BIGINT)) AS s,
             COUNT(*) AS c
      FROM events
      WHERE (epoch_us(ts) // 3600000000) - {_T0_H} >= 0
        AND (epoch_us(ts) // 3600000000) - {_T0_H} < {_CAL_HOURS}
      GROUP BY 1, 2
    ), grid AS (
      SELECT t.event_type, g.h
      FROM (SELECT DISTINCT event_type FROM per) t,
           (SELECT UNNEST(range(0, {_CAL_HOURS})) AS h) g
    ), dense AS (
      SELECT grid.event_type, grid.h,
             CAST(COALESCE({x}, 0) AS BIGINT) AS x
      FROM grid LEFT JOIN per
        ON grid.event_type = per.event_type AND grid.h = per.h
    )"""


# --------------------------------------------------------------------------
# Brown-Forsythe (median-centered Levene) variance homogeneity
# --------------------------------------------------------------------------


@register(
    "stats_levene_brown_forsythe",
    oracle="""
    WITH binned AS (
      SELECT event_type, CAST(FLOOR(value * 1000) AS BIGINT) AS v
      FROM events
    ), cnt AS (
      SELECT event_type, v, COUNT(*) AS c
      FROM binned GROUP BY 1, 2
    ), cum AS (
      SELECT event_type, v, c,
             SUM(c) OVER (PARTITION BY event_type ORDER BY v) AS cc,
             SUM(c) OVER (PARTITION BY event_type) AS n_g
      FROM cnt
    ), med AS (
      SELECT event_type, MIN(v) AS med_e3
      FROM cum WHERE 2 * cc >= n_g GROUP BY 1
    ), z AS (
      SELECT c.event_type, c.c, ABS(c.v - m.med_e3) AS z
      FROM cnt c JOIN med m ON c.event_type = m.event_type
    ), grp AS (
      SELECT event_type,
             SUM(c) AS n_g,
             SUM(CAST(c AS HUGEINT) * z) AS s1
      FROM z GROUP BY 1
    ), grp2 AS (
      SELECT event_type, n_g, s1,
             (s1 * 1000000 // n_g) AS zbar_e6
      FROM grp
    ), gtot AS (
      SELECT SUM(n_g) AS n, COUNT(*) AS k,
             (SUM(s1) * 1000000 // SUM(n_g)) AS gbar_e6
      FROM grp2
    ), ssw AS (
      SELECT SUM(CAST(z.c AS HUGEINT)
                 * (z.z * 1000000 - g.zbar_e6)
                 * (z.z * 1000000 - g.zbar_e6)) AS ssw_e12
      FROM z JOIN grp2 g ON z.event_type = g.event_type
    ), ssb AS (
      SELECT SUM(CAST(g.n_g AS HUGEINT)
                 * (g.zbar_e6 - gl.gbar_e6)
                 * (g.zbar_e6 - gl.gbar_e6)) AS ssb_e12
      FROM grp2 g, gtot gl
    ), f AS (
      SELECT CASE WHEN ssw.ssw_e12 = 0 THEN NULL
                  ELSE CAST(((ssb.ssb_e12 * 1000000 // ssw.ssw_e12)
                             * (gl.n - gl.k)) // (gl.k - 1) AS BIGINT)
             END AS f_e6,
             CAST(gl.n AS BIGINT) AS n_total,
             CAST(gl.k AS BIGINT) AS k
      FROM ssb, ssw, gtot gl
    )
    SELECT g.event_type,
           CAST(g.n_g AS BIGINT) AS n_g,
           m.med_e3,
           CAST(g.s1 AS BIGINT) AS sum_absdev_e3,
           CAST(g.zbar_e6 AS BIGINT) AS zbar_e6,
           f.f_e6, f.n_total, f.k
    FROM grp2 g JOIN med m ON g.event_type = m.event_type, f
    ORDER BY g.event_type
    """,
    tags=("stats", "nonparametric", "events", "exact"),
)
def stats_levene_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe variance-homogeneity test (Brown & Forsythe,
    JASA 1974): one-way ANOVA F on absolute deviations from the GROUP
    MEDIAN (the robust median-centered variant of Levene 1960),
    groups = event types, values e3-binned. The group median is the
    exact lower median selected by integer cumulative counts at value
    grain (min v with 2·cum ≥ n); z-moments are HUGEINT/DECIMAL(38,0);
    the group/grand means are e6 integer floor divisions; SSB/SSW are
    exact e12-scaled integer sums about those floored centers, and
    F's e6 readout is a two-stage truncating division (ratio first,
    then the (N−k)/(k−1) degrees-of-freedom factor) so no operand
    nears the DECIMAL(38,0) bound (SSB_e12·1e6 ≤ ~1e37 at sf100).

    Scale: everything runs at (type, e3-bin) VALUE grain after one
    data-scale counting shuffle; medians come from event_type-
    partitioned cumulative windows (no single-partition window); the
    global F row broadcast-joins back onto the ≤|event_type| group
    rows. The value-grain count table and the |z| table are SPILLED —
    five downstream branches (median, group moments, SSW, SSB, the
    output join) consume them, and each would otherwise re-run the
    corpus counting shuffle. Reference analog: none
    (maps/maps.go:8-21)."""
    from blow_spark.materialize import spill_to_parquet

    e = read_table(spark, sf_dir, "events")
    cnt = spill_to_parquet(
        e.select(
            "event_type",
            F.floor(F.col("value") * 1000).cast("long").alias("v"),
        )
        .groupBy("event_type", "v")
        .agg(F.count("*").alias("c"))
    )
    wcum = W.partitionBy("event_type").orderBy("v")
    wall = W.partitionBy("event_type")
    cum = cnt.select(
        "event_type",
        "v",
        "c",
        F.sum("c").over(wcum).alias("cc"),
        F.sum("c").over(wall).alias("n_g"),
    )
    med = (
        cum.filter(2 * F.col("cc") >= F.col("n_g"))
        .groupBy("event_type")
        .agg(F.min("v").alias("med_e3"))
    )
    z = spill_to_parquet(
        cnt.join(med, "event_type").select(
            "event_type", "c", F.abs(F.col("v") - F.col("med_e3")).alias("z")
        )
    )
    grp = z.groupBy("event_type").agg(
        F.sum("c").alias("n_g"),
        F.sum(F.expr("CAST(c AS DECIMAL(38,0)) * z")).alias("s1"),
    )
    grp2 = grp.select(
        "event_type",
        "n_g",
        "s1",
        F.expr("s1 * 1000000 div n_g").alias("zbar_e6"),
    )
    glob = grp2.agg(
        F.sum("n_g").alias("n"),
        F.count("*").alias("k"),
        F.expr("SUM(s1) * 1000000 div SUM(n_g)").alias("gbar_e6"),
    )
    ssw = (
        z.join(grp2.select("event_type", "zbar_e6"), "event_type")
        .agg(
            F.sum(
                F.expr(
                    "CAST(c AS DECIMAL(38,0)) * (z * 1000000 - zbar_e6)"
                    " * (z * 1000000 - zbar_e6)"
                )
            ).alias("ssw_e12")
        )
    )
    ssb = grp2.crossJoin(F.broadcast(glob)).agg(
        F.sum(
            F.expr(
                "CAST(n_g AS DECIMAL(38,0)) * (zbar_e6 - gbar_e6)"
                " * (zbar_e6 - gbar_e6)"
            )
        ).alias("ssb_e12")
    )
    f = (
        ssb.crossJoin(F.broadcast(ssw))
        .crossJoin(F.broadcast(glob))
        .select(
            F.expr(
                "CASE WHEN ssw_e12 = 0 THEN NULL ELSE "
                "CAST(((ssb_e12 * 1000000 div ssw_e12) * (n - k)) div (k - 1)"
                " AS BIGINT) END"
            ).alias("f_e6"),
            F.col("n").cast("long").alias("n_total"),
            F.col("k").cast("long").alias("k"),
        )
    )
    return (
        grp2.join(med, "event_type")
        .crossJoin(F.broadcast(f))
        .select(
            "event_type",
            F.col("n_g").cast("long").alias("n_g"),
            "med_e3",
            F.col("s1").cast("long").alias("sum_absdev_e3"),
            F.col("zbar_e6").cast("long").alias("zbar_e6"),
            "f_e6",
            "n_total",
            "k",
        )
        .orderBy("event_type")
    )

# --------------------------------------------------------------------------
# Yule-Walker AR(2)
# --------------------------------------------------------------------------


def _phi_div_duck(num: str, den: str) -> str:
    """Sign-split truncating e6 fixed-point division for the AR
    coefficient readouts, staged e3+e3 so no operand exceeds
    den·1e3 (den = c0²−c1² sits near the DECIMAL(38,0)/HUGEINT bound
    at extreme value envelopes; a single ·1e6 stage would cross it).
    Truncation (not half-away) convention, identical in both engines
    because every staged operand is non-negative."""
    f = (
        f"((({{n}}) // ({den})) * 1000000"
        f" + (((({{n}}) % ({den})) * 1000) // ({den})) * 1000"
        f" + ((((({{n}}) % ({den})) * 1000) % ({den})) * 1000) // ({den}))"
    )
    return (
        f"CAST(CASE WHEN ({den}) <= 0 THEN NULL "
        f"WHEN ({num}) >= 0 THEN {f.format(n=num)} "
        f"ELSE -{f.format(n=f'(-({num}))')} END AS BIGINT)"
    )


def _phi_div_spark(num: str, den: str):
    """Spark twin of :func:`_phi_div_duck` (`div`/`%` truncate in both
    engines; all staged operands non-negative under the sign split)."""
    f = (
        f"((({{n}}) div ({den})) * 1000000"
        f" + (((({{n}}) % ({den})) * 1000) div ({den})) * 1000"
        f" + ((((({{n}}) % ({den})) * 1000) % ({den})) * 1000) div ({den}))"
    )
    return F.expr(
        f"CAST(CASE WHEN ({den}) <= 0 THEN NULL "
        f"WHEN ({num}) >= 0 THEN {f.format(n=num)} "
        f"ELSE -{f.format(n=f'(-({num}))')} END AS BIGINT)"
    )


@register(
    "timeseries_yule_walker_ar2",
    oracle=f"""
    WITH {_hourly_series_sql(1, "mean")},
    tot AS (
      SELECT event_type, SUM(x) AS sx FROM dense GROUP BY 1
    ), dev AS (
      SELECT d.event_type, d.h,
             CAST({_CAL_HOURS} AS BIGINT) * d.x - t.sx AS dd
      FROM dense d JOIN tot t ON d.event_type = t.event_type
    ), lagged AS (
      SELECT event_type, dd,
             LEAD(dd, 1) OVER (PARTITION BY event_type ORDER BY h) AS d1,
             LEAD(dd, 2) OVER (PARTITION BY event_type ORDER BY h) AS d2
      FROM dev
    ), cov AS (
      SELECT event_type,
             SUM(CAST(dd AS HUGEINT) * dd) AS c0,
             SUM(CASE WHEN d1 IS NULL THEN 0
                      ELSE CAST(dd AS HUGEINT) * d1 END) AS c1,
             SUM(CASE WHEN d2 IS NULL THEN 0
                      ELSE CAST(dd AS HUGEINT) * d2 END) AS c2
      FROM lagged GROUP BY 1
    )
    SELECT event_type,
           CAST({_CAL_HOURS} AS BIGINT) AS n,
           CAST(c0 AS BIGINT) AS c0,
           CAST(c1 AS BIGINT) AS c1,
           CAST(c2 AS BIGINT) AS c2,
           {_phi_div_duck("c1 * (c0 - c2)", "c0 * c0 - c1 * c1")} AS phi1_e6,
           {_phi_div_duck("c2 * c0 - c1 * c1", "c0 * c0 - c1 * c1")} AS phi2_e6
    FROM cov
    ORDER BY event_type
    """,
    tags=("timeseries", "autoregression", "events", "exact"),
)
def timeseries_yule_walker_ar2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yule-Walker AR(2) fit (Yule 1927; Walker 1931) per event type
    on the hourly integer-mean value series over the {_CAL_HOURS}-hour
    fixture calendar: autocovariance sums c0/c1/c2 over exact n-scaled
    deviations (dd = n·x − Σx, integer — the repo's standard
    fraction-free centering), then the closed-form Cramer solve
    φ1 = c1(c0−c2)/(c0²−c1²), φ2 = (c2c0−c1²)/(c0²−c1²) as staged
    sign-split truncating e6 fixed-point divisions (no operand exceeds
    den·1e3; see _phi_div_duck).

    Magnitude envelope: the series is the hourly MEAN (sf-invariant by
    construction — integer floor-means bounded by the value domain V):
    |dd| ≤ 2nV, c ≤ n(2nV)² ≈ 1.4e15 at V=1e3, so c² ≈ 2e30 and the
    staged readout peaks at den·1e3 ≈ 2e33 — inside DECIMAL(38,0)/
    HUGEINT with ≥ 1e4× headroom at ANY sf (V would have to exceed
    ~3e4, 100× the fixture's value domain, to threaten the bound).

    Scale: one data-scale shuffle (the (type, hour) mean aggregate);
    the dense grid, LEAD windows (event_type-partitioned), and the
    Cramer solve all run at calendar grain. Reference analog: none
    (maps/maps.go:8-21)."""
    dense = _hourly_series(spark, sf_dir, 1, "mean")
    tot = dense.groupBy("event_type").agg(F.sum("x").alias("sx"))
    dev = dense.join(tot, "event_type").select(
        "event_type",
        "h",
        (F.lit(_CAL_HOURS).cast("long") * F.col("x") - F.col("sx")).alias("dd"),
    )
    w = W.partitionBy("event_type").orderBy("h")
    lagged = dev.select(
        "event_type",
        "dd",
        F.lead("dd", 1).over(w).alias("d1"),
        F.lead("dd", 2).over(w).alias("d2"),
    )
    dec = "CAST(dd AS DECIMAL(38,0))"
    cov = lagged.groupBy("event_type").agg(
        F.sum(F.expr(f"{dec} * dd")).alias("c0"),
        F.sum(F.expr(f"CASE WHEN d1 IS NULL THEN 0 ELSE {dec} * d1 END")).alias(
            "c1"
        ),
        F.sum(F.expr(f"CASE WHEN d2 IS NULL THEN 0 ELSE {dec} * d2 END")).alias(
            "c2"
        ),
    )
    return cov.select(
        "event_type",
        F.lit(_CAL_HOURS).cast("long").alias("n"),
        F.col("c0").cast("long").alias("c0"),
        F.col("c1").cast("long").alias("c1"),
        F.col("c2").cast("long").alias("c2"),
        _phi_div_spark("c1 * (c0 - c2)", "c0 * c0 - c1 * c1").alias("phi1_e6"),
        _phi_div_spark("c2 * c0 - c1 * c1", "c0 * c0 - c1 * c1").alias(
            "phi2_e6"
        ),
    ).orderBy("event_type")


# --------------------------------------------------------------------------
# Page-Hinkley sequential drift
# --------------------------------------------------------------------------


@register(
    "timeseries_page_hinkley",
    oracle=f"""
    WITH {_hourly_series_sql(1000, "mean")},
    cums AS (
      SELECT event_type, h, x,
             SUM(x) OVER (PARTITION BY event_type ORDER BY h) AS cx
      FROM dense
    ), terms AS (
      SELECT event_type, h,
             x - (cx // (h + 1)) - {_PH_DELTA_E3} AS term
      FROM cums
    ), m AS (
      SELECT event_type, h,
             SUM(term) OVER (PARTITION BY event_type ORDER BY h) AS mt
      FROM terms
    ), ph AS (
      SELECT event_type, h,
             mt - MIN(mt) OVER (PARTITION BY event_type ORDER BY h) AS ph
      FROM m
    ), mx AS (
      SELECT event_type, MAX(ph) AS max_ph_e3 FROM ph GROUP BY 1
    )
    SELECT p.event_type,
           CAST({_CAL_HOURS} AS BIGINT) AS n,
           CAST(m.max_ph_e3 AS BIGINT) AS max_ph_e3,
           CAST(MIN(CASE WHEN p.ph = m.max_ph_e3 THEN p.h END) AS BIGINT)
             AS h_at_max,
           CAST(MIN(CASE WHEN p.ph >= {_PH_LAMBDA_E3} THEN p.h END) AS BIGINT)
             AS first_alarm_h,
           CAST(SUM(CASE WHEN p.ph >= {_PH_LAMBDA_E3} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_alarm_hours
    FROM ph p JOIN mx m ON p.event_type = m.event_type
    GROUP BY 1, 3
    ORDER BY 1
    """,
    tags=("timeseries", "drift", "events", "exact"),
)
def timeseries_page_hinkley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-Hinkley sequential drift statistic (Page, Biometrika 1954;
    Hinkley, Biometrika 1971 — the standard streaming-drift test, cf.
    Gama et al., "A survey on concept drift adaptation", CSUR 2014)
    per event type on the hourly e3 floor-mean series: with running
    mean m_t = ⌊Σx/t⌋, the cumulative deviation M_t = Σ(x_i − m_i − δ)
    and PH_t = M_t − min_{i<=t} M_i flags an upward mean shift when
    PH ≥ λ (δ={_PH_DELTA_E3}e-3, λ={_PH_LAMBDA_E3}e-3 value units).
    Every quantity is an exact BIGINT (the running mean is a floor
    division of non-negative integers — identical in both engines);
    `h_at_max`/`first_alarm_h` pin argmax/first-crossing
    deterministically (smallest hour).

    Scale: one data-scale shuffle (the (type, hour) aggregate), then
    three event_type-partitioned cumulative windows at calendar grain.
    The statistic is mean-based — magnitudes are sf-invariant.
    Reference analog: none (maps/maps.go:8-21)."""
    dense = _hourly_series(spark, sf_dir, 1000, "mean")
    w = W.partitionBy("event_type").orderBy("h")
    cums = dense.select(
        "event_type", "h", "x", F.sum("x").over(w).alias("cx")
    )
    terms = cums.select(
        "event_type",
        "h",
        (
            F.col("x")
            - F.expr("cx div (h + 1)")
            - F.lit(_PH_DELTA_E3)
        ).alias("term"),
    )
    m = terms.select(
        "event_type", "h", F.sum("term").over(w).alias("mt")
    )
    ph = m.select(
        "event_type",
        "h",
        (F.col("mt") - F.min("mt").over(w)).alias("ph"),
    )
    mx = ph.groupBy("event_type").agg(F.max("ph").alias("max_ph_e3"))
    return (
        ph.join(mx, "event_type")
        .groupBy("event_type", "max_ph_e3")
        .agg(
            F.min(F.when(F.col("ph") == F.col("max_ph_e3"), F.col("h")))
            .cast("long")
            .alias("h_at_max"),
            F.min(F.when(F.col("ph") >= _PH_LAMBDA_E3, F.col("h")))
            .cast("long")
            .alias("first_alarm_h"),
            F.sum(F.when(F.col("ph") >= _PH_LAMBDA_E3, 1).otherwise(0))
            .cast("long")
            .alias("n_alarm_hours"),
        )
        .select(
            "event_type",
            F.lit(_CAL_HOURS).cast("long").alias("n"),
            F.col("max_ph_e3").cast("long").alias("max_ph_e3"),
            "h_at_max",
            "first_alarm_h",
            "n_alarm_hours",
        )
        .orderBy("event_type")
    )

# --------------------------------------------------------------------------
# Haar wavelet level energies
# --------------------------------------------------------------------------


def _haar_oracle() -> str:
    """Unrolled {_HAAR_LEVELS}-level Haar cascade oracle (the
    materialized-unroll discipline of the tokenizer-EM / DTW
    oracles): lvl_k pairs lvl_{k-1} by halved hour index — s is the
    pair sum, d the pair difference."""
    lvls = ",\n    ".join(
        f"""lvl{k} AS (
      SELECT event_type, h // 2 AS h,
             SUM(s) AS s,
             SUM(CASE WHEN h % 2 = 0 THEN s ELSE -s END) AS d
      FROM lvl{k - 1} GROUP BY 1, 2
    )"""
        for k in range(1, _HAAR_LEVELS + 1)
    )
    parts = [
        """SELECT event_type, CAST(0 AS BIGINT) AS level, 'input' AS kind,
           CAST(COUNT(*) AS BIGINT) AS n_coeffs,
           CAST(SUM(CAST(s AS HUGEINT) * s) AS VARCHAR) AS energy
    FROM lvl0 GROUP BY 1"""
    ]
    parts += [
        f"""SELECT event_type, CAST({k} AS BIGINT), 'detail',
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CAST(d AS HUGEINT) * d) AS VARCHAR)
    FROM lvl{k} GROUP BY 1"""
        for k in range(1, _HAAR_LEVELS + 1)
    ]
    parts.append(
        f"""SELECT event_type, CAST({_HAAR_LEVELS} AS BIGINT), 'approx',
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CAST(s AS HUGEINT) * s) AS VARCHAR)
    FROM lvl{_HAAR_LEVELS} GROUP BY 1"""
    )
    unions = "\n    UNION ALL\n    ".join(parts)
    return f"""
    WITH {_hourly_series_sql(100, "sum")},
    lvl0 AS (
      SELECT event_type, h, x AS s FROM dense WHERE h < {_HAAR_N}
    ),
    {lvls}
    {unions}
    ORDER BY 1, 2, 3
    """


@register(
    "timeseries_haar_wavelet_energy",
    oracle=_haar_oracle(),
    tags=("timeseries", "wavelet", "events", "exact"),
)
def timeseries_haar_wavelet_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unnormalized Haar wavelet decomposition (Haar, Math. Annalen
    1910; Mallat's pyramid algorithm, IEEE TPAMI 1989) of each event
    type's hourly e2 value-sum series over the first {_HAAR_N} = 2^9
    calendar hours: {_HAAR_LEVELS} cascade levels of pairwise sums
    (approximation) and differences (detail), reporting the EXACT
    integer energy Σd² per detail level plus the input and final-
    approximation energies — the multi-resolution variance screen
    (which timescale carries the signal's power) that complements the
    existing spectral/seasonal queries. The unnormalized transform
    stays in integers end to end (the 2^l normalization is a
    documented constant); energies ride DECIMAL(38,0)/HUGEINT with
    VARCHAR transport (the round-14 >int64 convention), so no wrap at
    ANY sf (d² ≤ (2^6·hourly-sum)², ~7e20 at sf100, ~7e24 at sf10000,
    against a 1e38 envelope). Energy conservation
    sum_l 2^-l·E_l + 2^-L·E_approx = E_input is externally
    checkable from the emitted rows.

    Scale: one data-scale shuffle (the (type, hour) sum aggregate);
    the cascade is {_HAAR_LEVELS} tiny aggregates at ≤ {_HAAR_N}-row
    calendar grain per type — each level HALVES. Reference analog:
    none (maps/maps.go:8-21)."""
    from functools import reduce

    dense = _hourly_series(spark, sf_dir, 100, "sum")
    cur = dense.filter(F.col("h") < _HAAR_N).select(
        "event_type", "h", F.col("x").alias("s")
    )

    def energy(df: DataFrame, col: str, level: int, kind: str) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.count("*").cast("long").alias("n_coeffs"),
            F.expr(
                f"CAST(CAST(SUM(CAST({col} AS DECIMAL(38,0)) * {col})"
                f" AS DECIMAL(38,0)) AS STRING)"
            ).alias("energy"),
        ).select(
            "event_type",
            F.lit(level).cast("long").alias("level"),
            F.lit(kind).alias("kind"),
            "n_coeffs",
            "energy",
        )

    out = [energy(cur, "s", 0, "input")]
    for lvl in range(1, _HAAR_LEVELS + 1):
        cur = cur.groupBy(
            "event_type", F.expr("h div 2").alias("h")
        ).agg(
            F.sum("s").alias("s"),
            F.sum(
                F.when(F.col("h") % 2 == 0, F.col("s")).otherwise(-F.col("s"))
            ).alias("d"),
        )
        out.append(energy(cur, "d", lvl, "detail"))
    out.append(energy(cur, "s", _HAAR_LEVELS, "approx"))
    return reduce(DataFrame.unionByName, out).orderBy(
        "event_type", "level", "kind"
    )

# --------------------------------------------------------------------------
# 1-D Kalman filter (local-level model)
# --------------------------------------------------------------------------

#: local-level Kalman noise parameters, e9 fixed point: process noise
#: Q = 0.01, observation noise R = 1.0 (in squared e3-value units).
_KAL_Q_E9 = 10_000_000
_KAL_R_E9 = 1_000_000_000

#: Kalman gain for the predicted variance (s.p + Q), e9, truncating —
#: repeated inline because recursive-CTE arms cannot name it.
_KAL_KK = (
    f"(((s.p + {_KAL_Q_E9}) * 1000000000)"
    f" // (s.p + {_KAL_Q_E9} + {_KAL_R_E9}))"
)


@register(
    "timeseries_kalman_filter_1d",
    oracle=f"""
    WITH RECURSIVE {_hourly_series_sql(1000, "mean")},
    kal AS (
      SELECT event_type, CAST(0 AS BIGINT) AS h, x AS xhat,
             CAST(1000000000 AS BIGINT) AS p,
             CAST(0 AS BIGINT) AS kk,
             CAST(0 AS BIGINT) AS sa,
             CAST(0 AS BIGINT) AS ma,
             CAST(0 AS BIGINT) AS hmax
      FROM dense WHERE h = 0
      UNION ALL
      SELECT d.event_type, d.h,
             s.xhat + (({_KAL_KK} * (d.x - s.xhat)) // 1000000000),
             (((1000000000 - {_KAL_KK}) * (s.p + {_KAL_Q_E9}))
              // 1000000000),
             {_KAL_KK},
             s.sa + ABS(d.x - s.xhat),
             CASE WHEN ABS(d.x - s.xhat) > s.ma
                  THEN ABS(d.x - s.xhat) ELSE s.ma END,
             CASE WHEN ABS(d.x - s.xhat) > s.ma THEN d.h ELSE s.hmax END
      FROM kal s JOIN dense d
        ON d.event_type = s.event_type AND d.h = s.h + 1
    )
    SELECT event_type,
           CAST({_CAL_HOURS} AS BIGINT) AS n,
           xhat AS xhat_final_e3,
           p AS p_final_e9,
           kk AS k_final_e9,
           sa AS sum_abs_innov_e3,
           ma AS max_abs_innov_e3,
           hmax AS h_at_max
    FROM kal WHERE h = {_CAL_HOURS - 1}
    ORDER BY event_type
    """,
    tags=("timeseries", "filter", "events", "exact", "recursion"),
)
def timeseries_kalman_filter_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar Kalman filter for the local-level (random-walk + noise)
    model (Kalman, J. Basic Eng. 1960; the structural form of Harvey,
    "Forecasting, structural time series models and the Kalman
    filter", 1989) per event type over the hourly e3 floor-mean
    series: P' = P + Q, K = P'/(P'+R), x̂ += K·(z − x̂),
    P = (1−K)·P' — the whole recursion in e9/e3 TRUNCATING integer
    fixed point (DuckDB `//`, Spark/pandas sign-aware trunc-div, both
    truncate toward zero, replicated exactly), so the two engines run
    the identical 719-step integer recurrence. Outputs: final state,
    final variance, converged gain, and the innovation diagnostics
    (Σ|z−x̂|, max, first argmax hour). The Spark side runs the real
    per-key sequential filter in applyInPandas (one tiny group per
    type); the oracle is a 719-step recursive CTE — the
    materialized-unroll discipline of the DTW/tokenizer oracles, in
    recursive form.

    Magnitudes: (P+Q)·1e9 ≤ 1.02e18 and K·innov ≤ 6.6e14 — int64-safe
    at ANY sf (the series is mean-based). Scale: one data-scale
    shuffle (the hourly aggregate, spill-backed); the recursion runs
    at calendar grain per type — state-space filtering parallelizes
    over SERIES, which is exactly how a 100 TB per-entity smoothing
    pass shards. Reference analog: none (maps/maps.go:8-21)."""
    import pandas as pd

    dense = _hourly_series(spark, sf_dir, 1000, "mean")

    q, r, n_h = _KAL_Q_E9, _KAL_R_E9, _CAL_HOURS

    def tdiv(a: int, b: int) -> int:
        qq = abs(a) // b
        return qq if a >= 0 else -qq

    def kalman(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("h")
        xs = [int(v) for v in pdf["x"]]
        xhat, p = xs[0], 10**9
        kk = sa = ma = hmax = 0
        for h in range(1, n_h):
            pp = p + q
            kk = (pp * 10**9) // (pp + r)
            innov = xs[h] - xhat
            xhat = xhat + tdiv(kk * innov, 10**9)
            p = ((10**9 - kk) * pp) // 10**9
            sa += abs(innov)
            if abs(innov) > ma:
                ma, hmax = abs(innov), h
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "n": [n_h],
                "xhat_final_e3": [xhat],
                "p_final_e9": [p],
                "k_final_e9": [kk],
                "sum_abs_innov_e3": [sa],
                "max_abs_innov_e3": [ma],
                "h_at_max": [hmax],
            }
        )

    return (
        dense.groupBy("event_type")
        .applyInPandas(
            kalman,
            "event_type string, n long, xhat_final_e3 long, p_final_e9 long,"
            " k_final_e9 long, sum_abs_innov_e3 long, max_abs_innov_e3 long,"
            " h_at_max long",
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Theil-Sen robust slope
# --------------------------------------------------------------------------

#: fixture calendar in days; pair count C(30, 2) is a compile-time
#: constant, so the median rank is too.
_TS_DAYS = 30
_TS_PAIRS = _TS_DAYS * (_TS_DAYS - 1) // 2
_TS_MED_RANK = (_TS_PAIRS + 1) // 2
#: unix DAYS at 2024-01-01 (1704067200 / 86400).
_T0_D = 19723


@register(
    "stats_theil_sen_slope",
    oracle=f"""
    WITH per AS (
      SELECT event_type,
             (epoch_us(ts) // 86400000000) - {_T0_D} AS d,
             SUM(CAST(FLOOR(value * 1000) AS BIGINT)) AS s,
             COUNT(*) AS c
      FROM events
      WHERE (epoch_us(ts) // 86400000000) - {_T0_D} >= 0
        AND (epoch_us(ts) // 86400000000) - {_T0_D} < {_TS_DAYS}
      GROUP BY 1, 2
    ), grid AS (
      SELECT t.event_type, g.d
      FROM (SELECT DISTINCT event_type FROM per) t,
           (SELECT UNNEST(range(0, {_TS_DAYS})) AS d) g
    ), dense AS (
      SELECT grid.event_type, grid.d,
             CAST(COALESCE(s // c, 0) AS BIGINT) AS x
      FROM grid LEFT JOIN per
        ON grid.event_type = per.event_type AND grid.d = per.d
    ), pairs AS (
      SELECT a.event_type,
             b.x - a.x AS num,
             b.d - a.d AS den
      FROM dense a JOIN dense b
        ON a.event_type = b.event_type AND a.d < b.d
    ), ranked AS (
      SELECT event_type, num, den,
             ROW_NUMBER() OVER (
               PARTITION BY event_type
               ORDER BY CAST(num AS DOUBLE) / den, num, den
             ) AS rn
      FROM pairs
    )
    SELECT event_type,
           CAST({_TS_DAYS} AS BIGINT) AS n_days,
           CAST({_TS_PAIRS} AS BIGINT) AS n_pairs,
           CAST(num AS BIGINT) AS slope_num_e3,
           CAST(den AS BIGINT) AS slope_den_days,
           CAST((num * 1000000) // den AS BIGINT) AS slope_e6
    FROM ranked WHERE rn = {_TS_MED_RANK}
    ORDER BY event_type
    """,
    tags=("stats", "robust", "events", "exact"),
)
def stats_theil_sen_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend slope (Theil 1950; Sen, JASA 1968 — the
    29.3%-breakdown median-of-pairwise-slopes estimator, the robust
    companion to the existing Mann-Kendall trend TEST) per event type
    on the daily e3 floor-mean series: all C({_TS_DAYS},2) =
    {_TS_PAIRS} pairwise slopes (x_j−x_i)/(j−i) as exact integer
    rationals, median selected at the constant rank {_TS_MED_RANK}
    under the deterministic total order (IEEE double of the ratio —
    identical int64→double division in both engines — with (num, den)
    tiebreak), reported as the exact rational PLUS a truncating e6
    readout (num·1e6 ≤ 3.3e11, int64-trivial; `div` and `//` both
    truncate toward zero, so no sign split is needed).

    Scale: one data-scale shuffle to (type, day) grain; the pair join
    is CALENDAR-BOUNDED ({_TS_PAIRS} rows per type at any sf — the
    quadratic term grows with the observation span, never the data,
    the matrix-profile argument); the ranking window partitions by
    event_type. The series is mean-based — magnitudes sf-invariant.
    Reference analog: none (maps/maps.go:8-21)."""
    e = read_table(spark, sf_dir, "events")
    per = (
        e.select(
            "event_type",
            (F.expr("unix_micros(ts) div 86400000000") - F.lit(_T0_D)).alias(
                "d"
            ),
            F.floor(F.col("value") * 1000).cast("long").alias("v"),
        )
        .where((F.col("d") >= 0) & (F.col("d") < _TS_DAYS))
        .groupBy("event_type", "d")
        .agg(F.sum("v").alias("s"), F.count("*").alias("c"))
    )
    from blow_spark.materialize import spill_to_parquet

    per = spill_to_parquet(per)
    grid = (
        per.select("event_type")
        .distinct()
        .crossJoin(
            F.broadcast(spark.range(_TS_DAYS).select(F.col("id").alias("d")))
        )
    )
    dense = grid.join(per, ["event_type", "d"], "left").select(
        "event_type",
        "d",
        F.coalesce(F.expr("s div c"), F.lit(0)).cast("long").alias("x"),
    )
    a = dense.select(
        "event_type", F.col("d").alias("da"), F.col("x").alias("xa")
    )
    b = dense.select(
        "event_type", F.col("d").alias("db"), F.col("x").alias("xb")
    )
    pairs = (
        a.join(b, "event_type")
        .filter(F.col("da") < F.col("db"))
        .select(
            "event_type",
            (F.col("xb") - F.col("xa")).alias("num"),
            (F.col("db") - F.col("da")).alias("den"),
        )
    )
    w = W.partitionBy("event_type").orderBy(
        F.expr("CAST(num AS DOUBLE) / den"), "num", "den"
    )
    ranked = pairs.select(
        "event_type", "num", "den", F.row_number().over(w).alias("rn")
    )
    return (
        ranked.filter(F.col("rn") == _TS_MED_RANK)
        .select(
            "event_type",
            F.lit(_TS_DAYS).cast("long").alias("n_days"),
            F.lit(_TS_PAIRS).cast("long").alias("n_pairs"),
            F.col("num").cast("long").alias("slope_num_e3"),
            F.col("den").cast("long").alias("slope_den_days"),
            F.expr("CAST((num * 1000000) div den AS BIGINT)").alias(
                "slope_e6"
            ),
        )
        .orderBy("event_type")
    )

# --------------------------------------------------------------------------
# LTTB downsampling
# --------------------------------------------------------------------------

#: LTTB: 720 hourly points -> 30 fixed 24-hour buckets; first/last
#: points pinned (the endpoint rule of the original algorithm).
_LTTB_BW = 24
_LTTB_NB = _CAL_HOURS // _LTTB_BW

#: scaled triangle area (x2, and further scaled by the next-bucket
#: count so the centroid never divides): candidate c against anchor
#: (s.h_sel, s.x_sel) and next-bucket sums nb — repeated inline
#: because recursive-CTE arms cannot name intermediates.
def _lttb_area(h: str, x: str) -> str:
    return (
        f"ABS((s.h_sel * nb.cnt - nb.hs) * ({x} - s.x_sel)"
        f" - (s.h_sel - {h}) * (nb.xs - s.x_sel * nb.cnt))"
    )


@register(
    "timeseries_lttb_downsample",
    oracle=f"""
    WITH RECURSIVE {_hourly_series_sql(1000, "mean")},
    bsum AS (
      SELECT event_type, h // {_LTTB_BW} AS b,
             SUM(h) AS hs, SUM(x) AS xs, COUNT(*) AS cnt
      FROM dense GROUP BY 1, 2
    ),
    sel AS (
      SELECT event_type, CAST(0 AS BIGINT) AS b,
             CAST(0 AS BIGINT) AS h_sel, x AS x_sel
      FROM dense WHERE h = 0
      UNION ALL
      SELECT s.event_type, s.b + 1, c.h, c.x
      FROM sel s
      JOIN dense c ON c.event_type = s.event_type
        AND c.h // {_LTTB_BW} = s.b + 1
      JOIN bsum nb ON nb.event_type = s.event_type AND nb.b = s.b + 2
      WHERE s.b + 1 <= {_LTTB_NB - 2}
        AND NOT EXISTS (
          SELECT 1 FROM dense c2
          WHERE c2.event_type = s.event_type
            AND c2.h // {_LTTB_BW} = s.b + 1
            AND ({_lttb_area("c2.h", "c2.x")} > {_lttb_area("c.h", "c.x")}
                 OR ({_lttb_area("c2.h", "c2.x")} = {_lttb_area("c.h", "c.x")}
                     AND c2.h < c.h))
        )
    )
    SELECT event_type, b, h_sel, x_sel FROM sel
    UNION ALL
    SELECT event_type, CAST({_LTTB_NB - 1} AS BIGINT) AS b,
           CAST(h AS BIGINT) AS h_sel, x AS x_sel
    FROM dense WHERE h = {_CAL_HOURS - 1}
    ORDER BY event_type, b
    """,
    tags=("timeseries", "downsample", "events", "exact", "recursion"),
)
def timeseries_lttb_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-Triangle-Three-Buckets downsampling (Steinarsson, MSc
    thesis, U. Iceland 2013 — the de-facto time-series viz
    downsampler, complementing the existing error-bounded M4): the
    hourly e3 floor-mean series reduces 720 → {_LTTB_NB} points; the
    first/last points are pinned, and each middle bucket keeps the
    point maximizing the triangle area with the PREVIOUSLY SELECTED
    point and the NEXT bucket's centroid. The area comparison is
    EXACT integers — scaled ×2×cnt so the centroid never divides
    (|(h_a·cnt − Σh)(x_c − x_a) − (h_a − h_c)(Σx − x_a·cnt)| ≤ ~1e10,
    int64-trivial) — with a smallest-hour tiebreak, so the sequential
    selection is deterministic and identical in both engines. Spark
    runs the real per-series scan in applyInPandas; the oracle is a
    ({_LTTB_NB} − 2)-step recursive CTE whose argmax is an anti-join
    (recursive arms cannot aggregate).

    Scale: one data-scale shuffle (the hourly aggregate,
    spill-backed); selection runs at calendar grain per series — the
    same per-entity sharding as the Kalman filter. Mean-based, so
    magnitudes are sf-invariant. Reference analog: none
    (maps/maps.go:8-21)."""
    import pandas as pd

    dense = _hourly_series(spark, sf_dir, 1000, "mean")
    bw, nb = _LTTB_BW, _LTTB_NB

    def lttb(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("h")
        xs = [int(v) for v in pdf["x"]]
        hs = list(range(len(xs)))
        out_b, out_h, out_x = [0], [0], [xs[0]]
        ha, xa = 0, xs[0]
        for b in range(1, nb - 1):
            lo, hi = b * bw, (b + 1) * bw
            nlo, nhi = (b + 1) * bw, (b + 2) * bw
            cnt = nhi - nlo
            hsum = sum(hs[nlo:nhi])
            xsum = sum(xs[nlo:nhi])
            best = None
            for h in range(lo, hi):
                area = abs(
                    (ha * cnt - hsum) * (xs[h] - xa)
                    - (ha - h) * (xsum - xa * cnt)
                )
                if best is None or area > best[0]:
                    best = (area, h)
            ha, xa = best[1], xs[best[1]]
            out_b.append(b)
            out_h.append(ha)
            out_x.append(xa)
        out_b.append(nb - 1)
        out_h.append(len(xs) - 1)
        out_x.append(xs[-1])
        return pd.DataFrame(
            {
                "event_type": pdf["event_type"].iloc[0],
                "b": out_b,
                "h_sel": out_h,
                "x_sel": out_x,
            }
        )

    return (
        dense.groupBy("event_type")
        .applyInPandas(lttb, "event_type string, b long, h_sel long, x_sel long")
        .orderBy("event_type", "b")
    )
