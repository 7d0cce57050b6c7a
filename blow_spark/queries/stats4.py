"""Round-11 evaluation + inequality + nonparametric shelf:

* exact Average Precision (the area-under-PR ranking metric) with
  integer round-half-up precision terms — no float summation anywhere;
* Matthews correlation coefficient from exact confusion counts;
* the economic Gini coefficient (rank-weighted Lorenz form) on exact
  cent integers;
* the Wilcoxon signed-rank test (the PAIRED companion to the existing
  Mann-Whitney U), with exact ×2-scaled midranks;
* 2-feature PCA via closed-form symmetric 2×2 eigendecomposition over
  n-scaled exact integer moments.

Reference parity note: the reference engine (wizgrao/blow,
maps/maps.go:8-21) has no aggregation surface; this shelf extends the
stats/eval families (queries/stats*.py, evalrank.py) the brief's
analytics mandate requires.

Engine-exactness: every ranking/confusion/moment quantity is an exact
BIGINT (or DECIMAL(38,0)/HUGEINT where n-scaling overflows 64 bits);
rational outputs are either round-half-up integer floor divisions
((2a+b) div 2b — no floats at all) or ONE final division/sqrt on
identical integer operands in both engines (IEEE-deterministic, the
CAPM-beta pattern).

Scale design: everything aggregates or windows on a real partition key
(event_type / nation / brand) — no global single-partition window; the
grouped grains are label-domain-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from blow_spark.queries import register
from blow_spark.sources import read_table


# --------------------------------------------------------------------------
# Average Precision
# --------------------------------------------------------------------------


@register(
    "eval_average_precision",
    oracle="""
    WITH ranked AS (
      SELECT event_type,
             CAST(event_id % 5 = 0 AS BIGINT) AS rel,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY value DESC, event_id) AS k
      FROM events
    ), cum AS (
      SELECT event_type, rel, k,
             SUM(rel) OVER (PARTITION BY event_type ORDER BY k) AS c
      FROM ranked
    ), terms AS (
      SELECT event_type,
             -- round-half-up of c*1e9/k, pure integer:
             CASE WHEN rel = 1
                  THEN (c * 2000000000 + k) // (2 * k)
                  ELSE 0 END AS prec_e9,
             rel
      FROM cum
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(rel) AS BIGINT) AS n_pos,
           CAST(SUM(prec_e9) AS BIGINT) AS sum_prec_e9,
           CAST(SUM(prec_e9) // SUM(rel) AS BIGINT) AS ap_e9
    FROM terms GROUP BY event_type ORDER BY event_type
    """,
    tags=("eval", "ranking", "events", "exact"),
)
def eval_average_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Average Precision per query group (event_type): rank by a
    provably total key (value DESC, event_id), precision@k at each
    relevant rank as a ROUND-HALF-UP e9-scaled integer
    ((2·c·10⁹ + k) div 2k — never a float), summed as BIGINTs and
    divided by the positive count with integer floor division. This is
    the ranking-eval metric the existing NDCG/MRR/ROC-AUC shelf lacked
    (AP = area under the precision-recall curve), computed with zero
    float-summation-order exposure.

    Scale: one partitioned window (event_type is the query key — the
    real per-query grain of an IR eval) + one keyed aggregate.
    Reference analog: none (blow has no windows or aggregation)."""
    e = read_table(spark, sf_dir, "events")
    win = W.partitionBy("event_type").orderBy(
        F.col("value").desc(), F.col("event_id")
    )
    ranked = e.select(
        "event_type",
        (F.col("event_id") % 5 == 0).cast("bigint").alias("rel"),
        F.row_number().over(win).alias("k"),
    )
    cum = ranked.withColumn(
        "c",
        F.sum("rel").over(
            W.partitionBy("event_type").orderBy("k")
        ),
    )
    terms = cum.select(
        "event_type",
        "rel",
        F.when(
            F.col("rel") == 1,
            F.expr("(c * 2000000000L + k) div (2 * k)"),
        )
        .otherwise(F.lit(0))
        .alias("prec_e9"),
    )
    return (
        terms.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("rel").alias("n_pos"),
            F.sum("prec_e9").alias("sum_prec_e9"),
        )
        .select(
            "event_type",
            "n",
            "n_pos",
            "sum_prec_e9",
            F.expr("sum_prec_e9 div n_pos").alias("ap_e9"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Matthews correlation coefficient
# --------------------------------------------------------------------------


@register(
    "eval_matthews_corrcoef",
    oracle="""
    WITH lab AS (
      SELECT event_type,
             CAST(event_id % 3 = 0 AS BIGINT) AS act,
             CAST(event_id % 6 = 0 OR (event_id % 3 <> 0 AND event_id % 7 = 0)
                  AS BIGINT) AS pred
      FROM events
    ), conf AS (
      SELECT event_type,
             CAST(SUM(act * pred) AS BIGINT) AS tp,
             CAST(SUM((1 - act) * (1 - pred)) AS BIGINT) AS tn,
             CAST(SUM((1 - act) * pred) AS BIGINT) AS fp,
             CAST(SUM(act * (1 - pred)) AS BIGINT) AS fn
      FROM lab GROUP BY event_type
    )
    SELECT event_type, tp, tn, fp, fn,
           CASE WHEN tp+fp = 0 OR tp+fn = 0 OR tn+fp = 0 OR tn+fn = 0 THEN NULL
                ELSE CAST(ROUND(1000000.0 * (tp*tn - fp*fn)
                     / (SQRT(CAST((tp+fp)*(tp+fn) AS DOUBLE))
                        * SQRT(CAST((tn+fp)*(tn+fn) AS DOUBLE)))) AS BIGINT)
           END AS mcc_e6
    FROM conf ORDER BY event_type
    """,
    tags=("eval", "classification", "events", "exact"),
)
def eval_matthews_corrcoef(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matthews correlation coefficient per event_type from EXACT
    confusion counts — the single-number binary-classification metric
    that stays honest under class imbalance (unlike accuracy/F1, it
    uses all four confusion cells). The fixture's predictor fires on
    a subset of positives (id%6) plus a disjoint false-alarm rule
    (id%7 on negatives), so every cell is populated. tp/tn/fp/fn are
    exact integers; the MCC is one final expression on identical
    integer operands — each 2-way margin product (tp+fp)(tp+fn) stays
    ≤ n² in BIGINT (the degenerate-margin guard tests each margin
    INDIVIDUALLY, never the 4-way product, whose n⁴ growth overflows
    int64 at sf ≥ 1 — round-11 ADVICE), each sqrt is
    IEEE-correctly-rounded on an exactly-representable double, so both
    engines compute bit-identical results before the e6 round.

    Scale: one map-side-combinable keyed aggregate. Reference analog:
    none."""
    e = read_table(spark, sf_dir, "events")
    lab = e.select(
        "event_type",
        (F.col("event_id") % 3 == 0).cast("bigint").alias("act"),
        (
            (F.col("event_id") % 6 == 0)
            | ((F.col("event_id") % 3 != 0) & (F.col("event_id") % 7 == 0))
        )
        .cast("bigint")
        .alias("pred"),
    )
    conf = lab.groupBy("event_type").agg(
        F.sum(F.col("act") * F.col("pred")).alias("tp"),
        F.sum((1 - F.col("act")) * (1 - F.col("pred"))).alias("tn"),
        F.sum((1 - F.col("act")) * F.col("pred")).alias("fp"),
        F.sum(F.col("act") * (1 - F.col("pred"))).alias("fn"),
    )
    mcc = F.when(
        ((F.col("tp") + F.col("fp")) == 0)
        | ((F.col("tp") + F.col("fn")) == 0)
        | ((F.col("tn") + F.col("fp")) == 0)
        | ((F.col("tn") + F.col("fn")) == 0),
        F.lit(None).cast("bigint"),
    ).otherwise(
        F.round(
            1000000.0
            * (F.col("tp") * F.col("tn") - F.col("fp") * F.col("fn"))
            / (
                F.sqrt(
                    ((F.col("tp") + F.col("fp")) * (F.col("tp") + F.col("fn"))).cast(
                        "double"
                    )
                )
                * F.sqrt(
                    ((F.col("tn") + F.col("fp")) * (F.col("tn") + F.col("fn"))).cast(
                        "double"
                    )
                )
            )
        ).cast("bigint")
    )
    return conf.select(
        "event_type", "tp", "tn", "fp", "fn", mcc.alias("mcc_e6")
    ).orderBy("event_type")


# --------------------------------------------------------------------------
# Gini coefficient
# --------------------------------------------------------------------------


@register(
    "stats_gini_coefficient",
    oracle="""
    WITH spend AS (
      SELECT c.c_nationkey AS nk, o.o_custkey,
             CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY 1, 2
    ), ranked AS (
      SELECT nk, cents,
             ROW_NUMBER() OVER (PARTITION BY nk
                                ORDER BY cents, o_custkey) AS i
      FROM spend
    ), agg AS (
      SELECT nk, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(cents) AS BIGINT) AS total_cents,
             SUM(CAST(i AS HUGEINT) * cents) AS iwx
      FROM ranked GROUP BY nk
    )
    SELECT nk, n, total_cents,
           CAST(ROUND(1000000.0
                * CAST(2 * iwx - (n + 1) * CAST(total_cents AS HUGEINT) AS DOUBLE)
                / CAST(CAST(n AS HUGEINT) * total_cents AS DOUBLE)) AS BIGINT)
             AS gini_e6
    FROM agg ORDER BY nk
    """,
    tags=("stats", "inequality", "orders", "exact"),
)
def stats_gini_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The economic Gini coefficient of customer spend per nation —
    the inequality readout a marketplace/governance dashboard carries —
    in the exact rank-weighted Lorenz form
    G = (2·Σ i·x₍ᵢ₎ − (n+1)·Σx) / (n·Σx) over ascending cent-exact
    spend. Σ i·x rides in DECIMAL(38,0)/HUGEINT (i ≤ n, x ≤ 10¹⁰ cents
    ⇒ the product overflows 64 bits at sf ≥ 1); the only double is the
    ONE final division on identical operands. Value ties get
    consecutive ranks, which Gini is provably invariant to (within a
    tie block Σ i·x = x·Σ i regardless of order).

    Scale: aggregate to (nation × customer) grain, one partitioned
    ranking window, one keyed aggregate — the window key is the nation
    (25-way parallel), never a global sort. Reference analog: none."""
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    spend = (
        o.join(F.broadcast(c), c.c_custkey == o.o_custkey)
        .groupBy(F.col("c_nationkey").alias("nk"), "o_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("cents")
        )
    )
    ranked = spend.withColumn(
        "i",
        F.row_number().over(
            W.partitionBy("nk").orderBy("cents", "o_custkey")
        ),
    )
    agg = ranked.groupBy("nk").agg(
        F.count("*").alias("n"),
        F.sum("cents").alias("total_cents"),
        F.sum(F.col("i").cast("decimal(38,0)") * F.col("cents")).alias("iwx"),
    )
    return agg.select(
        "nk",
        "n",
        "total_cents",
        F.round(
            1000000.0
            * (
                2 * F.col("iwx")
                - (F.col("n") + 1).cast("decimal(38,0)") * F.col("total_cents")
            ).cast("double")
            / (F.col("n").cast("decimal(38,0)") * F.col("total_cents")).cast(
                "double"
            )
        )
        .cast("bigint")
        .alias("gini_e6"),
    ).orderBy("nk")


# --------------------------------------------------------------------------
# Wilcoxon signed-rank
# --------------------------------------------------------------------------


@register(
    "stats_wilcoxon_signed_rank",
    oracle="""
    WITH halves AS (
      SELECT c.c_nationkey AS nk, o.o_custkey,
             CAST(SUM(CASE WHEN EXTRACT(month FROM o.o_orderdate) <= 6
                      THEN CAST(ROUND(o.o_totalprice * 100) AS BIGINT)
                      ELSE 0 END) AS BIGINT) AS h1,
             CAST(SUM(CASE WHEN EXTRACT(month FROM o.o_orderdate) > 6
                      THEN CAST(ROUND(o.o_totalprice * 100) AS BIGINT)
                      ELSE 0 END) AS BIGINT) AS h2
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY 1, 2
    ), diffs AS (
      SELECT nk, h2 - h1 AS d, ABS(h2 - h1) AS ad
      FROM halves WHERE h2 <> h1
    ), rk AS (
      SELECT nk, d,
             -- 2x the tie-averaged midrank, exactly: 2r + c - 1
             2 * RANK() OVER (PARTITION BY nk ORDER BY ad)
               + COUNT(*) OVER (PARTITION BY nk, ad) - 1 AS rank_x2
      FROM diffs
    )
    SELECT nk, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN d > 0 THEN rank_x2 ELSE 0 END) AS BIGINT)
             AS w_plus_x2,
           CAST(SUM(CASE WHEN d < 0 THEN rank_x2 ELSE 0 END) AS BIGINT)
             AS w_minus_x2,
           CAST(COUNT(*) * (COUNT(*) + 1) AS BIGINT) AS w_total_x2
    FROM rk GROUP BY nk ORDER BY nk
    """,
    tags=("stats", "nonparametric", "orders", "exact"),
)
def stats_wilcoxon_signed_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Wilcoxon signed-rank test statistic per nation — the PAIRED
    companion to the existing Mann-Whitney U shelf: did customer spend
    shift between calendar halves H1/H2? Zero differences drop (the
    standard Pratt-excluded form); tied |d| get AVERAGE midranks held
    exact by the ×2 scaling (2·avg-rank = 2·RANK + tiecount − 1, always
    an integer). W⁺+W⁻ = n(n+1)/2 rides along (×2) as an in-result
    invariant the hash certifies.

    Scale: aggregate to (nation × customer) grain, then one
    nation-partitioned ranking window — 25-way parallel, never a global
    sort. Reference analog: none."""
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    halves = (
        o.join(F.broadcast(c), c.c_custkey == o.o_custkey)
        .groupBy(F.col("c_nationkey").alias("nk"), "o_custkey")
        .agg(
            F.sum(F.when(F.month("o_orderdate") <= 6, cents).otherwise(0))
            .cast("bigint")
            .alias("h1"),
            F.sum(F.when(F.month("o_orderdate") > 6, cents).otherwise(0))
            .cast("bigint")
            .alias("h2"),
        )
    )
    diffs = halves.where(F.col("h2") != F.col("h1")).select(
        "nk",
        (F.col("h2") - F.col("h1")).alias("d"),
        F.abs(F.col("h2") - F.col("h1")).alias("ad"),
    )
    rk = diffs.select(
        "nk",
        "d",
        (
            2 * F.rank().over(W.partitionBy("nk").orderBy("ad"))
            + F.count("*").over(W.partitionBy("nk", "ad"))
            - 1
        ).alias("rank_x2"),
    )
    return (
        rk.groupBy("nk")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.when(F.col("d") > 0, F.col("rank_x2")).otherwise(0))
            .cast("bigint")
            .alias("w_plus_x2"),
            F.sum(F.when(F.col("d") < 0, F.col("rank_x2")).otherwise(0))
            .cast("bigint")
            .alias("w_minus_x2"),
        )
        .select(
            "nk",
            "n",
            "w_plus_x2",
            "w_minus_x2",
            (F.col("n") * (F.col("n") + 1)).cast("bigint").alias("w_total_x2"),
        )
        .orderBy("nk")
    )


# --------------------------------------------------------------------------
# 2-feature PCA (closed-form symmetric eigendecomposition)
# --------------------------------------------------------------------------


@register(
    "ml_pca_two_feature",
    oracle="""
    WITH pts AS (
      SELECT p.p_brand AS brand,
             CAST(ROUND(l.l_extendedprice * 100) AS BIGINT) AS x,
             CAST(l.l_quantity AS BIGINT) * 100000 AS y
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ), mom AS (
      SELECT brand, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy,
             SUM(CAST(x AS HUGEINT) * x) AS sxx,
             SUM(CAST(y AS HUGEINT) * y) AS syy,
             SUM(CAST(x AS HUGEINT) * y) AS sxy
      FROM pts GROUP BY brand
    ), cov AS (
      -- n^2-scaled central second moments, exact HUGEINTs
      SELECT brand, n,
             n * sxx - sx * sx AS cxx,
             n * syy - sy * sy AS cyy,
             n * sxy - sx * sy AS cxy
      FROM mom
    )
    SELECT brand, n,
           CASE WHEN cxx + cyy = 0 THEN NULL
                ELSE CAST(ROUND(1000000.0
                * ((CAST(cxx AS DOUBLE) + CAST(cyy AS DOUBLE)
                    + SQRT((CAST(cxx AS DOUBLE) - CAST(cyy AS DOUBLE))
                           * (CAST(cxx AS DOUBLE) - CAST(cyy AS DOUBLE))
                           + 4.0 * CAST(cxy AS DOUBLE) * CAST(cxy AS DOUBLE)))
                   / 2.0)
                / (CAST(cxx AS DOUBLE) + CAST(cyy AS DOUBLE))) AS BIGINT)
           END AS ev1_share_e6,
           CASE WHEN cxx + cyy = 0 THEN NULL
                ELSE CAST(ROUND(1000000.0
                * ((CAST(cxx AS DOUBLE) + CAST(cyy AS DOUBLE)
                    - SQRT((CAST(cxx AS DOUBLE) - CAST(cyy AS DOUBLE))
                           * (CAST(cxx AS DOUBLE) - CAST(cyy AS DOUBLE))
                           + 4.0 * CAST(cxy AS DOUBLE) * CAST(cxy AS DOUBLE)))
                   / (CAST(cxx AS DOUBLE) + CAST(cyy AS DOUBLE)
                      + SQRT((CAST(cxx AS DOUBLE) - CAST(cyy AS DOUBLE))
                             * (CAST(cxx AS DOUBLE) - CAST(cyy AS DOUBLE))
                             + 4.0 * CAST(cxy AS DOUBLE) * CAST(cxy AS DOUBLE))))
                ) AS BIGINT)
           END AS eigen_ratio_e6
    FROM cov ORDER BY brand
    """,
    tags=("ml", "pca", "lineitem", "exact"),
)
def ml_pca_two_feature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand 2-feature PCA (price vs quantity) via the CLOSED-FORM
    symmetric 2×2 eigendecomposition — λ = (tr ± √((cxx−cyy)² + 4cxy²))/2
    on n²-scaled central moments (n·Σx² − (Σx)² etc.) held exact in
    DECIMAL(38,0)/HUGEINT. Quantity is pre-scaled ×10⁵ so the two
    features live at comparable variance (the un-standardized form is
    rank-degenerate against cent-scaled prices) — and since
    extendedprice = quantity × unit price, the leading component is a
    genuine correlated blend, not an axis. The explained-variance share of the first
    component (ev1_share_e6) and the eigenvalue ratio lambda2/lambda1
    (eigen_ratio_e6 - the anisotropy/condition readout) are the
    feature-redundancy readouts a
    training-data pipeline uses to decide whether two signals are one.
    Doubles appear only at the very end, applied to IDENTICAL exact
    integers in both engines (cast → sub/mul/add → one sqrt → one
    divide, each IEEE-deterministic) — the CAPM-beta discipline.

    Scale: one broadcast dim join + one map-side-combinable aggregate
    to the 25-brand grain; the eigen algebra runs on 25 rows.
    Reference analog: none."""
    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part")
    pts = li.join(F.broadcast(p), p.p_partkey == li.l_partkey).select(
        F.col("p_brand").alias("brand"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("x"),
        (F.col("l_quantity").cast("bigint") * 100000).alias("y"),
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    mom = pts.groupBy("brand").agg(
        F.count("*").alias("n"),
        F.sum("x").cast("decimal(38,0)").alias("sx"),
        F.sum("y").cast("decimal(38,0)").alias("sy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x")).alias("sxx"),
        F.sum(F.col("y").cast("decimal(38,0)") * F.col("y")).alias("syy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("y")).alias("sxy"),
    )
    cov = mom.select(
        "brand",
        "n",
        (dec("n") * F.col("sxx") - F.col("sx") * F.col("sx")).alias("cxx"),
        (dec("n") * F.col("syy") - F.col("sy") * F.col("sy")).alias("cyy"),
        (dec("n") * F.col("sxy") - F.col("sx") * F.col("sy")).alias("cxy"),
    )
    cxx, cyy, cxy = (F.col(c).cast("double") for c in ("cxx", "cyy", "cxy"))
    disc = F.sqrt((cxx - cyy) * (cxx - cyy) + 4.0 * cxy * cxy)
    lam1 = (cxx + cyy + disc) / 2.0
    # a zero trace (all points in a brand identical => cxx = cyy = 0,
    # hence disc = 0 too) degenerates every denominator below; NULL it
    # on both engines (round-11 ADVICE — Spark ANSI would throw where
    # DuckDB yields inf/nan)
    trace_zero = (F.col("cxx") + F.col("cyy")) == 0
    # both outputs are BOUNDED ratios e6-rounded: a last-ulp difference
    # between DuckDB's HUGEINT->DOUBLE and Spark's DECIMAL->DOUBLE cast
    # (observed on the raw lambda magnitude ~1e13) vanishes under the
    # coarse fixpoint; never emit the raw eigenvalue double
    return cov.select(
        "brand",
        "n",
        F.when(trace_zero, F.lit(None).cast("bigint"))
        .otherwise(F.round(1000000.0 * lam1 / (cxx + cyy)).cast("bigint"))
        .alias("ev1_share_e6"),
        F.when(trace_zero, F.lit(None).cast("bigint"))
        .otherwise(
            F.round(1000000.0 * (cxx + cyy - disc) / (cxx + cyy + disc)).cast(
                "bigint"
            )
        )
        .alias("eigen_ratio_e6"),
    ).orderBy("brand")


# --------------------------------------------------------------------------
# Band-limited dynamic time warping
# --------------------------------------------------------------------------

_DTW_LEN = 12  # series length (days of 1995-03)
_DTW_BAND = 2  # Sakoe-Chiba band half-width


def _dtw_cells() -> list[tuple[int, int]]:
    """Band cells in diagonal (i+j) order — the DP's topological order."""
    cells = []
    for d in range(2, 2 * _DTW_LEN + 1):
        for i in range(1, _DTW_LEN + 1):
            j = d - i
            if 1 <= j <= _DTW_LEN and abs(i - j) <= _DTW_BAND:
                cells.append((i, j))
    return cells


def _dtw_oracle() -> str:
    """Unrolled-CTE DTW oracle: one CTE per anti-diagonal, each adding
    that diagonal's cells as columns referencing the previous CTE — the
    same materialized-unroll discipline as the tokenizer-EM oracles
    (a recursive CTE can't see two diagonals back)."""
    days = ", ".join(str(i) for i in range(1, _DTW_LEN + 1))
    xcols = ", ".join(
        f"MAX(CASE WHEN i = {i} THEN x END) AS x{i}"
        for i in range(1, _DTW_LEN + 1)
    )
    mcols = ", ".join(
        f"MAX(CASE WHEN i = {i} THEN m END) AS m{i}"
        for i in range(1, _DTW_LEN + 1)
    )
    head = f"""
    WITH daily AS (
      SELECT p.p_brand AS brand,
             CAST(EXTRACT(day FROM l.l_shipdate) AS INT) AS i,
             CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS rev
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE l.l_shipdate >= TIMESTAMP '1995-03-01'
        AND l.l_shipdate < TIMESTAMP '1995-03-{_DTW_LEN + 1:02d}'
      GROUP BY 1, 2
    ), brands AS (
      SELECT DISTINCT p_brand AS brand FROM part
    ), cal AS (
      SELECT UNNEST([{days}]) AS i
    ), dense AS (
      SELECT b.brand, c.i, COALESCE(d.rev, 0) AS x
      FROM brands b CROSS JOIN cal c
      LEFT JOIN daily d ON d.brand = b.brand AND d.i = c.i
    ), mkt AS (
      SELECT i, CAST(SUM(x) // (SELECT COUNT(*) FROM brands) AS BIGINT) AS m
      FROM dense GROUP BY i
    ), wide AS (
      SELECT brand, {xcols} FROM dense GROUP BY brand
    ), mw AS (
      SELECT {mcols} FROM mkt
    ), s1 AS (
      SELECT wide.*, {', '.join(f'mw.m{i}' for i in range(1, _DTW_LEN + 1))}
      FROM wide CROSS JOIN mw
    )"""
    # group cells by diagonal; one CTE per diagonal (cells in a
    # diagonal only depend on the two previous diagonals)
    by_diag: dict[int, list[tuple[int, int]]] = {}
    for i, j in _dtw_cells():
        by_diag.setdefault(i + j, []).append((i, j))
    ctes = [head]
    prev = "s1"
    for d in sorted(by_diag):
        exprs = []
        for i, j in by_diag[d]:
            cost = f"ABS(x{i} - m{j})"
            preds = [
                f"c{pi}_{pj}"
                for pi, pj in ((i - 1, j), (i, j - 1), (i - 1, j - 1))
                if pi >= 1 and pj >= 1 and abs(pi - pj) <= _DTW_BAND
            ]
            if not preds:  # the (1,1) origin
                exprs.append(f"{cost} AS c{i}_{j}")
            else:
                exprs.append(f"{cost} + LEAST({', '.join(preds)}) AS c{i}_{j}")
        cur = f"s{d}"
        ctes.append(f", {cur} AS (SELECT *, {', '.join(exprs)} FROM {prev})")
        prev = cur
    return "".join(ctes) + f"""
    SELECT brand, CAST(c{_DTW_LEN}_{_DTW_LEN} AS BIGINT) AS dtw_cost
    FROM {prev} ORDER BY brand
    """


@register(
    "timeseries_dtw_band_distance",
    oracle=_dtw_oracle(),
    tags=("timeseries", "dtw", "lineitem", "exact"),
)
def timeseries_dtw_band_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band-limited dynamic time warping (Sakoe & Chiba, IEEE TASSP
    1978) between each brand's daily-revenue series and the market-mean
    series over a fixed {_DTW_LEN}-day calendar window — the
    elastic-alignment distance that rewards shape similarity under
    small time shifts, which plain Euclidean/correlation measures
    (the existing cross-correlation query) cannot. Costs are exact
    cent BIGINTs (|x_i − m_j| on integer series; the market mean is an
    integer floor division), so the banded DP is exact integer
    arithmetic end to end. The Spark side runs the real per-key DP in
    applyInPandas (numpy, O(len·band) per series); the oracle unrolls
    the identical DP as one CTE per anti-diagonal — the
    materialized-unroll discipline of the tokenizer-EM oracles.

    Scale: series are CALENDAR-BOUNDED (the {_DTW_LEN}-day window is
    the grain, never the corpus), so the applyInPandas groups are tiny
    and uniformly sized; one aggregate + one broadcast of the
    {_DTW_LEN}-row market series. At 100 TB the brand×day aggregate is
    the only data-scale shuffle. Reference analog: none."""
    import numpy as np
    import pandas as pd

    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part")
    daily = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1995-03-01").cast("timestamp"))
            & (
                F.col("l_shipdate")
                < F.lit(f"1995-03-{_DTW_LEN + 1:02d}").cast("timestamp")
            )
        )
        .join(F.broadcast(p), p.p_partkey == li.l_partkey)
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.dayofmonth("l_shipdate").alias("i"),
        )
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("rev")
        )
    )
    brands = p.select(F.col("p_brand").alias("brand")).distinct()
    nb = brands.agg(F.count("*").alias("nb"))
    cal = spark.range(1, _DTW_LEN + 1).select(F.col("id").cast("int").alias("i"))
    dense = (
        brands.crossJoin(F.broadcast(cal))
        .join(daily, ["brand", "i"], "left")
        .select("brand", "i", F.coalesce("rev", F.lit(0)).alias("x"))
    )
    mkt = (
        dense.groupBy("i")
        .agg(F.sum("x").alias("tot"))
        .crossJoin(F.broadcast(nb))
        .select("i", F.expr("tot div nb").alias("m"))
    )
    joined = dense.join(F.broadcast(mkt), "i").select("brand", "i", "x", "m")

    band, n = _DTW_BAND, _DTW_LEN

    def dtw(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("i")
        x = pdf["x"].to_numpy(dtype=np.int64)
        m = pdf["m"].to_numpy(dtype=np.int64)
        inf = np.iinfo(np.int64).max // 4
        dp = np.full((n + 1, n + 1), inf, dtype=np.int64)
        dp[0, 0] = 0
        for i in range(1, n + 1):
            for j in range(max(1, i - band), min(n, i + band) + 1):
                cost = abs(x[i - 1] - m[j - 1])
                dp[i, j] = cost + min(dp[i - 1, j], dp[i, j - 1], dp[i - 1, j - 1])
        return pd.DataFrame(
            {"brand": [pdf["brand"].iloc[0]], "dtw_cost": [int(dp[n, n])]}
        )

    return (
        joined.groupBy("brand")
        .applyInPandas(dtw, "brand string, dtw_cost long")
        .orderBy("brand")
    )


# --------------------------------------------------------------------------
# Krippendorff's alpha (nominal)
# --------------------------------------------------------------------------


@register(
    "eval_krippendorff_alpha_nominal",
    oracle="""
    WITH ratings AS (
      SELECT event_type,
             CAST(event_id % 3 AS BIGINT) AS r1,
             CAST(CASE WHEN event_id % 7 = 0 THEN (event_id % 3 + 1) % 3
                       ELSE event_id % 3 END AS BIGINT) AS r2,
             CAST(CASE WHEN event_id % 11 = 0 THEN (event_id % 3 + 2) % 3
                       ELSE event_id % 3 END AS BIGINT) AS r3
      FROM events
    ), units AS (
      -- per-unit disagreeing pairs: sum_c n_c(m-n_c) = 2 * d_pairs
      SELECT event_type,
             CAST(r1 <> r2 AS BIGINT) + CAST(r1 <> r3 AS BIGINT)
               + CAST(r2 <> r3 AS BIGINT) AS dpairs,
             r1, r2, r3
      FROM ratings
    ), agg AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_units,
             CAST(SUM(dpairs) AS BIGINT) AS do_pairs,
             CAST(SUM(CAST(r1 = 0 AS BIGINT) + CAST(r2 = 0 AS BIGINT)
                      + CAST(r3 = 0 AS BIGINT)) AS BIGINT) AS n_cat0,
             CAST(SUM(CAST(r1 = 1 AS BIGINT) + CAST(r2 = 1 AS BIGINT)
                      + CAST(r3 = 1 AS BIGINT)) AS BIGINT) AS n_cat1,
             CAST(SUM(CAST(r1 = 2 AS BIGINT) + CAST(r2 = 2 AS BIGINT)
                      + CAST(r3 = 2 AS BIGINT)) AS BIGINT) AS n_cat2
      FROM units GROUP BY event_type
    )
    SELECT event_type, n_units, do_pairs, n_cat0, n_cat1, n_cat2,
           CAST(ROUND(1000000.0 * (1.0
             - CAST(2 * CAST(do_pairs AS HUGEINT)
                    * (3 * n_units) * (3 * n_units - 1) AS DOUBLE)
               / CAST(6 * CAST(n_units AS HUGEINT)
                      * (CAST(n_cat0 AS HUGEINT) * (3 * n_units - n_cat0)
                         + CAST(n_cat1 AS HUGEINT) * (3 * n_units - n_cat1)
                         + CAST(n_cat2 AS HUGEINT) * (3 * n_units - n_cat2))
                      AS DOUBLE))) AS BIGINT) AS alpha_e6
    FROM agg ORDER BY event_type
    """,
    tags=("eval", "agreement", "events", "exact"),
)
def eval_krippendorff_alpha_nominal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Krippendorff's alpha for nominal data, 3 raters, complete data
    (Krippendorff, "Content Analysis", 2004) — the inter-annotator
    agreement coefficient that (unlike the existing Cohen/Fleiss kappa
    pair) is also defined for missing data and non-nominal metrics,
    making it the standard label-quality gate for crowd-sourced
    training labels. Computed in the exact pairwise form: observed
    disagreement via Σ_c n_uc(m−n_uc) = 2·(disagreeing pairs) per unit,
    expected disagreement from the pooled category totals, so
    α = 1 − [2·Dₒ·N(N−1)] / [m(m−1)·n·Σ_c N_c(N−N_c)] with every
    operand an exact integer (HUGEINT/DECIMAL — the cross products pass
    2⁶³ at sf ≥ 1) and ONE final double division. The fixture's raters
    are a base rule plus two deterministic dissent rules (id%7, id%11),
    so agreement is high but not perfect and every category is
    populated.

    Scale: one map-side-combinable keyed aggregate — per-unit
    disagreement needs no shuffle at all (the three ratings are
    columns, not rows). Reference analog: none."""
    e = read_table(spark, sf_dir, "events")
    base = (F.col("event_id") % 3).cast("bigint")
    r = e.select(
        "event_type",
        base.alias("r1"),
        F.when(F.col("event_id") % 7 == 0, (base + 1) % 3)
        .otherwise(base)
        .cast("bigint")
        .alias("r2"),
        F.when(F.col("event_id") % 11 == 0, (base + 2) % 3)
        .otherwise(base)
        .cast("bigint")
        .alias("r3"),
    )
    units = r.select(
        "event_type",
        (
            (F.col("r1") != F.col("r2")).cast("bigint")
            + (F.col("r1") != F.col("r3")).cast("bigint")
            + (F.col("r2") != F.col("r3")).cast("bigint")
        ).alias("dpairs"),
        "r1",
        "r2",
        "r3",
    )

    def ncat(c: int):
        return (
            (F.col("r1") == c).cast("bigint")
            + (F.col("r2") == c).cast("bigint")
            + (F.col("r3") == c).cast("bigint")
        )

    agg = units.groupBy("event_type").agg(
        F.count("*").alias("n_units"),
        F.sum("dpairs").cast("bigint").alias("do_pairs"),
        F.sum(ncat(0)).cast("bigint").alias("n_cat0"),
        F.sum(ncat(1)).cast("bigint").alias("n_cat1"),
        F.sum(ncat(2)).cast("bigint").alias("n_cat2"),
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    n3 = 3 * F.col("n_units")
    de_sum = (
        dec("n_cat0") * (n3 - F.col("n_cat0"))
        + dec("n_cat1") * (n3 - F.col("n_cat1"))
        + dec("n_cat2") * (n3 - F.col("n_cat2"))
    )
    return agg.select(
        "event_type",
        "n_units",
        "do_pairs",
        "n_cat0",
        "n_cat1",
        "n_cat2",
        F.round(
            1000000.0
            * (
                1.0
                - (2 * dec("do_pairs") * n3 * (n3 - 1)).cast("double")
                / (6 * dec("n_units") * de_sum).cast("double")
            )
        )
        .cast("bigint")
        .alias("alpha_e6"),
    ).orderBy("event_type")


# --------------------------------------------------------------------------
# One Newton/IRLS step of logistic regression (closed form at beta = 0)
# --------------------------------------------------------------------------


@register(
    "ml_logistic_newton_step",
    oracle="""
    WITH pts AS (
      SELECT event_type,
             CAST(ROUND(value) AS BIGINT) AS x,
             CAST(event_id % 3 = 0 AS BIGINT) AS y
      FROM events
    ), mom AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS HUGEINT) AS sx,
             SUM(CAST(x AS HUGEINT) * x) AS sxx,
             CAST(SUM(2 * y - 1) AS HUGEINT) AS g0x2,
             CAST(SUM(x * (2 * y - 1)) AS HUGEINT) AS g1x2
      FROM pts GROUP BY event_type
    )
    SELECT event_type, n,
           CAST(ROUND(1000000.0
                * CAST(2 * (sxx * g0x2 - sx * g1x2) AS DOUBLE)
                / CAST(n * sxx - sx * sx AS DOUBLE)) AS BIGINT)
             AS beta0_e6,
           CAST(ROUND(1000000.0
                * CAST(2 * (CAST(n AS HUGEINT) * g1x2 - sx * g0x2) AS DOUBLE)
                / CAST(n * sxx - sx * sx AS DOUBLE)) AS BIGINT)
             AS beta1_e6
    FROM mom ORDER BY event_type
    """,
    tags=("ml", "regression", "events", "exact"),
)
def ml_logistic_newton_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE Newton-Raphson/IRLS step of logistic regression (intercept +
    one feature) from β = 0, per event_type — the distributed GLM inner
    loop in closed form: at β = 0 every fitted probability is ½, so the
    gradient is X'(y−½) and the Hessian is X'X/4, giving
    β₁ = 4·(X'X)⁻¹X'(y−½) by the 2×2 Cramer inverse:
    β₀ = 2(Σx²·Σ(2y−1) − Σx·Σx(2y−1)) / (nΣx² − (Σx)²) and the matching
    slope — every sufficient statistic an exact integer (the ×2 trick
    absorbs the ½), HUGEINT/DECIMAL(38,0) cross products, ONE final
    double division per coefficient. This is exactly how IRLS
    distributes at 100 TB: one map-side-combinable moment aggregate per
    step, driver-side 2×2 solve — no per-row model state anywhere.

    Scale: one keyed aggregate; the solve runs on label-domain-sized
    rows. Reference analog: none."""
    e = read_table(spark, sf_dir, "events")
    pts = e.select(
        "event_type",
        F.round("value").cast("bigint").alias("x"),
        (F.col("event_id") % 3 == 0).cast("bigint").alias("y"),
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    mom = pts.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("x").cast("decimal(38,0)").alias("sx"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x")).alias("sxx"),
        F.sum(2 * F.col("y") - 1).cast("decimal(38,0)").alias("g0x2"),
        F.sum(F.col("x") * (2 * F.col("y") - 1))
        .cast("decimal(38,0)")
        .alias("g1x2"),
    )
    det = (dec("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    return mom.select(
        "event_type",
        "n",
        F.round(
            1000000.0
            * (
                2 * (F.col("sxx") * F.col("g0x2") - F.col("sx") * F.col("g1x2"))
            ).cast("double")
            / det
        )
        .cast("bigint")
        .alias("beta0_e6"),
        F.round(
            1000000.0
            * (
                2 * (dec("n") * F.col("g1x2") - F.col("sx") * F.col("g0x2"))
            ).cast("double")
            / det
        )
        .cast("bigint")
        .alias("beta1_e6"),
    ).orderBy("event_type")


# --------------------------------------------------------------------------
# Rescaled-range (R/S) ladder — Hurst analysis
# --------------------------------------------------------------------------

_RS_SCALES = (8, 16, 32)


def _rs_oracle() -> str:
    """Per-(brand, scale) rescaled range over consecutive trading-day
    blocks: R·m = max(m·D_k) − min(m·D_k) with m·D_k = m·Σ_{i≤k}x_i −
    k·Σx (exact BIGINTs), S = √((m·Σx² − (Σx)²))/m, so
    R/S = (R·m)/√(m·Σx² − (Σx)²) — exact integers into one sqrt."""
    parts = []
    for m in _RS_SCALES:
        parts.append(f"""
    SELECT brand, CAST({m} AS INT) AS scale_m,
           CAST(COUNT(*) AS BIGINT) AS n_blocks,
           CAST(SUM(rs_e6) AS BIGINT) AS sum_rs_e6,
           CAST(SUM(rs_e6) // COUNT(*) AS BIGINT) AS mean_rs_e6
    FROM (
      SELECT brand, blk,
             CAST(ROUND(1000000.0 * (MAX(md) - MIN(md))
                  / SQRT(CAST({m} * SUM(xsq) - CAST(SUM(x) AS HUGEINT) * SUM(x)
                         AS DOUBLE))) AS BIGINT) AS rs_e6
      FROM (
        SELECT brand, blk, x, CAST(x AS HUGEINT) * x AS xsq,
               {m} * SUM(x) OVER (PARTITION BY brand, blk ORDER BY rn)
                 - rk * SUM(x) OVER (PARTITION BY brand, blk) AS md
        FROM (
          SELECT brand, x, rn, (rn - 1) // {m} AS blk,
                 CAST((rn - 1) % {m} + 1 AS BIGINT) AS rk
          FROM series
        )
        QUALIFY COUNT(*) OVER (PARTITION BY brand, blk) = {m}
      )
      GROUP BY brand, blk
      HAVING {m} * SUM(xsq) > CAST(SUM(x) AS HUGEINT) * SUM(x)
    )
    GROUP BY brand""")
    return f"""
    WITH daily AS (
      SELECT p.p_brand AS brand, CAST(l.l_shipdate AS DATE) AS day,
             CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS x
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY 1, 2
    ), series AS (
      SELECT brand, x,
             ROW_NUMBER() OVER (PARTITION BY brand ORDER BY day) AS rn
      FROM daily
    )
    {" UNION ALL ".join(parts)}
    ORDER BY brand, scale_m
    """


@register(
    "timeseries_hurst_rs_ladder",
    oracle=_rs_oracle(),
    tags=("timeseries", "hurst", "lineitem", "exact"),
)
def timeseries_hurst_rs_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rescaled-range (R/S) analysis ladder (Hurst 1951; Mandelbrot &
    Wallis 1969) of each brand's daily-revenue series at block scales
    m ∈ {_RS_SCALES}: per consecutive m-day block, the range of
    cumulative mean-deviations over the block's standard deviation —
    the mean R/S per scale is the ladder whose log-log slope is the
    Hurst exponent (persistence vs mean-reversion). Every quantity is
    exact until one sqrt: m·D_k = m·(running Σx) − k·Σx and
    R·m = max−min are BIGINTs, the denominator √(m·Σx²−(Σx)²) is one
    IEEE sqrt of an exact integer, each block's R/S rounds at e6, and
    the per-scale mean is an integer floor division — no float
    summation anywhere. (The slope itself needs logs; the ladder is
    the engine deliverable, slope-fitting is a 3-point client-side
    read.)

    Scale: one keyed aggregate to (brand×day), brand-partitioned
    windows (25-way parallel), blocks are calendar-bounded. Reference
    analog: none; companion to finance_sharpe_sortino on the same
    grain."""
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
            .alias("x")
        )
    )
    from blow_spark.materialize import spill_to_parquet

    # the trading-day series feeds one branch PER SCALE — spill it once
    # so the lineitem join+aggregate+rank run once, not len(_RS_SCALES)
    # times (the linkage._purchase_edges discipline)
    series = spill_to_parquet(
        daily.select(
            "brand",
            "x",
            F.row_number()
            .over(W.partitionBy("brand").orderBy("day"))
            .alias("rn"),
        ),
        "blow_spark_rs_series_",
    )
    outs = []
    for m in _RS_SCALES:
        blk = series.select(
            "brand",
            "x",
            "rn",
            F.expr(f"(rn - 1) div {m}").alias("blk"),
            F.expr(f"CAST((rn - 1) % {m} + 1 AS BIGINT)").alias("rk"),
        )
        wblk = W.partitionBy("brand", "blk")
        wrun = wblk.orderBy("rn")
        md = blk.select(
            "brand",
            "blk",
            "x",
            (F.col("x").cast("decimal(38,0)") * F.col("x")).alias("xsq"),
            (
                m * F.sum("x").over(wrun)
                - F.col("rk") * F.sum("x").over(wblk)
            ).alias("md"),
            F.count("*").over(wblk).alias("blen"),
        ).where(F.col("blen") == m)
        per_block = (
            md.groupBy("brand", "blk")
            .agg(
                F.max("md").alias("mx"),
                F.min("md").alias("mn"),
                F.sum("x").cast("decimal(38,0)").alias("s"),
                F.sum("xsq").alias("ssq"),
            )
            .where(
                m * F.col("ssq") > F.col("s") * F.col("s")
            )
            .select(
                "brand",
                F.round(
                    1000000.0
                    * (F.col("mx") - F.col("mn"))
                    / F.sqrt(
                        (m * F.col("ssq") - F.col("s") * F.col("s")).cast(
                            "double"
                        )
                    )
                )
                .cast("bigint")
                .alias("rs_e6"),
            )
        )
        outs.append(
            per_block.groupBy("brand").agg(
                F.lit(m).cast("int").alias("scale_m"),
                F.count("*").alias("n_blocks"),
                F.sum("rs_e6").cast("bigint").alias("sum_rs_e6"),
                F.expr("CAST(SUM(rs_e6) div COUNT(*) AS BIGINT)").alias(
                    "mean_rs_e6"
                ),
            ).select("brand", "scale_m", "n_blocks", "sum_rs_e6", "mean_rs_e6")
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("brand", "scale_m")


# --------------------------------------------------------------------------
# Theil T inequality + between-nation decomposition
# --------------------------------------------------------------------------


@register(
    "stats_theil_inequality",
    oracle="""
    WITH spend AS (
      SELECT c.c_nationkey AS nk,
             CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY c.c_nationkey, o.o_custkey
    ), g AS (
      SELECT nk, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(cents) AS BIGINT) AS s
      FROM spend GROUP BY nk
    ), within AS (
      SELECT sp.nk, g.n, g.s,
             CAST(SUM(CAST(ROUND(1000000.0
                 * (CAST(sp.cents AS DOUBLE) * g.n / g.s)
                 * LN(CAST(sp.cents AS DOUBLE) * g.n / g.s)) AS BIGINT))
               AS BIGINT) AS term_sum_e6
      FROM spend sp JOIN g USING (nk)
      GROUP BY sp.nk, g.n, g.s
    ), tot AS (
      SELECT CAST(SUM(n) AS BIGINT) AS n_all, CAST(SUM(s) AS BIGINT) AS s_all
      FROM g
    )
    SELECT 'nation:' || CAST(w.nk AS VARCHAR) AS component,
           w.n, w.s AS sum_cents,
           CAST(GREATEST(w.term_sum_e6, 0) // w.n AS BIGINT) AS theil_e6
    FROM within w
    UNION ALL
    SELECT 'between' AS component, t.n_all AS n, t.s_all AS sum_cents,
           CAST(SUM(CAST(ROUND(1000000.0
               * (CAST(g.s AS DOUBLE) / t.s_all)
               * LN((CAST(g.s AS DOUBLE) / t.s_all)
                    / (CAST(g.n AS DOUBLE) / t.n_all))) AS BIGINT))
             AS BIGINT) AS theil_e6
    FROM g CROSS JOIN tot t GROUP BY t.n_all, t.s_all
    ORDER BY component
    """,
    tags=("stats", "inequality", "orders"),
)
def stats_theil_inequality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil T inequality index of customer spend, per nation, plus the
    BETWEEN-nation component of Theil's decomposition (Theil,
    "Economics and Information Theory", 1967) — the entropy-based
    companion to stats_gini_coefficient that, unlike Gini, decomposes
    additively into within + between parts (the property governance
    dashboards use to attribute inequality to segments). Each entropy
    term r·ln(r) is computed as a double in BOTH engines and rounded at
    the e6 fixpoint BEFORE summation (BIGINT term sums; the per-nation
    mean clamps the rounded term sum at 0 FIRST — Theil T ≥ 0 by
    Jensen, but per-term e6 rounding can drive a near-zero sum a hair
    negative, where Spark's ``div`` truncates toward zero while
    DuckDB's ``//`` floors (round-11 ADVICE); on a non-negative
    numerator the two agree exactly) — the
    corpus_length_kl_by_source discipline: the e6
    guard band absorbs the JVM-vs-libm LN ulp divergence except on a
    measure-zero .5 boundary, which the round-10 ADVICE review accepted
    as this catalog's documented exposure for runtime transcendentals.

    Scale: aggregate to (nation × customer), one grouped entropy pass,
    a 25-row between-component — map-side combinable throughout.
    Reference analog: none."""
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    from blow_spark.materialize import spill_to_parquet

    # the customer-spend table feeds both the group moments and the
    # entropy pass — spill once so the orders scan+join runs once
    spend = spill_to_parquet(
        o.join(F.broadcast(c), c.c_custkey == o.o_custkey)
        .groupBy(F.col("c_nationkey").alias("nk"), "o_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("cents")
        ),
        "blow_spark_theil_spend_",
    )
    g = spend.groupBy("nk").agg(
        F.count("*").alias("n"), F.sum("cents").cast("bigint").alias("s")
    )
    r = F.col("cents").cast("double") * F.col("n") / F.col("s")
    within = (
        spend.join(F.broadcast(g), "nk")
        .groupBy("nk", "n", "s")
        .agg(
            F.sum(F.round(1000000.0 * r * F.log(r)).cast("bigint"))
            .cast("bigint")
            .alias("term_sum_e6")
        )
    )
    tot = g.agg(
        F.sum("n").cast("bigint").alias("n_all"),
        F.sum("s").cast("bigint").alias("s_all"),
    )
    nation_rows = within.select(
        F.concat(F.lit("nation:"), F.col("nk").cast("string")).alias(
            "component"
        ),
        "n",
        F.col("s").alias("sum_cents"),
        F.expr("CAST(GREATEST(term_sum_e6, 0) div n AS BIGINT)").alias("theil_e6"),
    )
    sh = F.col("s").cast("double") / F.col("s_all")
    ph = F.col("n").cast("double") / F.col("n_all")
    between_row = (
        g.crossJoin(F.broadcast(tot))
        .groupBy("n_all", "s_all")
        .agg(
            F.sum(F.round(1000000.0 * sh * F.log(sh / ph)).cast("bigint"))
            .cast("bigint")
            .alias("theil_e6")
        )
        .select(
            F.lit("between").alias("component"),
            F.col("n_all").alias("n"),
            F.col("s_all").alias("sum_cents"),
            "theil_e6",
        )
    )
    return nation_rows.unionByName(between_row).orderBy("component")


# --------------------------------------------------------------------------
# Weekly spectral energy (Goertzel-grade DFT bin, zero runtime trig)
# --------------------------------------------------------------------------

_SPEC_N = 28  # analysis window: 4 weeks of trading days
_SPEC_K = 4  # bin k=4 over N=28 -> period 7 days (weekly seasonality)


def _spec_tables() -> tuple[list[int], list[int]]:
    """cos/sin at the weekly bin, e9-fixpointed in PYTHON and injected
    as integer literals into BOTH plans — the NDCG discount-table
    discipline: no runtime transcendentals, no JVM-vs-libm exposure."""
    import math

    cos_e9, sin_e9 = [], []
    for t in range(_SPEC_N):
        ang = 2.0 * math.pi * _SPEC_K * t / _SPEC_N
        cos_e9.append(round(math.cos(ang) * 1_000_000_000))
        sin_e9.append(round(math.sin(ang) * 1_000_000_000))
    return cos_e9, sin_e9


def _spec_oracle() -> str:
    cos_e9, sin_e9 = _spec_tables()
    trig = ", ".join(
        f"({t}, {c}, {s})" for t, (c, s) in enumerate(zip(cos_e9, sin_e9))
    )
    return f"""
    WITH trig(t, c_e9, s_e9) AS (VALUES {trig}),
    daily AS (
      SELECT p.p_brand AS brand, CAST(l.l_shipdate AS DATE) AS day,
             CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS x
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY 1, 2
    ), series AS (
      SELECT brand, x,
             ROW_NUMBER() OVER (PARTITION BY brand ORDER BY day) - 1 AS rn
      FROM daily
      QUALIFY rn < {_SPEC_N}
    ), dot AS (
      SELECT s.brand, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(s.x) AS BIGINT) AS dc,
             SUM(CAST(s.x AS HUGEINT) * t.c_e9) AS re_e9,
             SUM(CAST(s.x AS HUGEINT) * t.s_e9) AS im_e9
      FROM series s JOIN trig t ON t.t = s.rn
      GROUP BY s.brand HAVING COUNT(*) = {_SPEC_N}
    )
    SELECT brand, n, dc AS dc_cents,
           CAST(re_e9 AS VARCHAR) AS re_e9,
           CAST(im_e9 AS VARCHAR) AS im_e9,
           CAST(ROUND(1000000.0
                * SQRT(CAST(re_e9 AS DOUBLE) * CAST(re_e9 AS DOUBLE)
                       + CAST(im_e9 AS DOUBLE) * CAST(im_e9 AS DOUBLE))
                / (1000000000.0 * dc)) AS BIGINT) AS weekly_over_dc_e6
    FROM dot ORDER BY brand
    """


@register(
    "timeseries_weekly_spectral_energy",
    oracle=_spec_oracle(),
    tags=("timeseries", "spectral", "lineitem", "exact"),
)
def timeseries_weekly_spectral_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-bin DFT at the WEEKLY frequency (bin k={_SPEC_K} over an
    N={_SPEC_N}-day window — what a Goertzel pass computes) for each
    brand's daily-revenue series: the seasonal-energy readout that says
    "does this series pulse on a 7-day cycle?" without running a full
    FFT. ZERO runtime transcendentals: the cos/sin table is fix-pointed
    at e9 in Python and injected into BOTH plans as integer literals
    (the NDCG discount-table discipline), so the real/imag dot products
    are exact HUGEINT/DECIMAL sums; the amplitude-over-DC ratio is the
    single final sqrt+division, e6-rounded. The exact integer re/im
    parts ride in the result (as strings — they pass 2⁶³) so the hash
    certifies the full dot product, not just the rounded ratio.

    Scale: one keyed aggregate to (brand×day), a broadcast 28-row trig
    table, one grouped dot product — map-side combinable; the window is
    calendar-bounded. Reference analog: none; the frequency-domain
    companion to timeseries_autocorrelation."""
    import builtins

    cos_e9, sin_e9 = _spec_tables()
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
            .alias("x")
        )
    )
    series = daily.select(
        "brand",
        "x",
        (
            F.row_number().over(W.partitionBy("brand").orderBy("day")) - 1
        ).alias("rn"),
    ).where(F.col("rn") < _SPEC_N)
    trig = spark.createDataFrame(
        [(t, c, s) for t, (c, s) in enumerate(zip(cos_e9, sin_e9))],
        "t int, c_e9 long, s_e9 long",
    )
    dot = (
        series.join(F.broadcast(trig), series.rn == trig.t)
        .groupBy("brand")
        .agg(
            F.count("*").alias("n"),
            F.sum("x").cast("bigint").alias("dc"),
            F.sum(F.col("x").cast("decimal(38,0)") * F.col("c_e9")).alias(
                "re_e9"
            ),
            F.sum(F.col("x").cast("decimal(38,0)") * F.col("s_e9")).alias(
                "im_e9"
            ),
        )
        .where(F.col("n") == _SPEC_N)
    )
    re_d, im_d = F.col("re_e9").cast("double"), F.col("im_e9").cast("double")
    return dot.select(
        "brand",
        "n",
        F.col("dc").alias("dc_cents"),
        F.col("re_e9").cast("string").alias("re_e9"),
        F.col("im_e9").cast("string").alias("im_e9"),
        F.round(
            1000000.0
            * F.sqrt(re_d * re_d + im_d * im_d)
            / (1000000000.0 * F.col("dc"))
        )
        .cast("bigint")
        .alias("weekly_over_dc_e6"),
    ).orderBy("brand")


# --------------------------------------------------------------------------
# Ljung-Box portmanteau test (round 12)
# --------------------------------------------------------------------------

_LB_H = 10  # lags pooled into Q
#: chi-square 95th percentile at h=10 dof (Abramowitz & Stegun table
#: 26.8), e6-fixpointed in PYTHON and injected into BOTH plans — the
#: NDCG discount-table discipline: no runtime quantile function needed.
_LB_CRIT_E6 = 18_307_038


@register(
    "stats_ljung_box_whiteness",
    oracle=f"""
    WITH daily AS (
      SELECT datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
               AS di,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS x
      FROM orders GROUP BY 1
    ), g AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(x) AS DOUBLE) AS s,
             CAST(SUM(CAST(x AS HUGEINT) * x) AS DOUBLE) AS sxx
      FROM daily
    ), lags AS (
      SELECT unnest(range(1, {_LB_H} + 1)) AS k
    ), p AS (
      SELECT l.k,
             CAST(COUNT(*) AS BIGINT) AS n_pairs,
             CAST(SUM(CAST(a.x AS HUGEINT) * b.x) AS DOUBLE) AS sxy,
             CAST(SUM(a.x) AS DOUBLE) AS sh,
             CAST(SUM(b.x) AS DOUBLE) AS st
      FROM daily a
      JOIN lags l ON TRUE
      JOIN daily b ON b.di = a.di + l.k
      GROUP BY l.k
    ), rk AS (
      SELECT p.k, g.n,
             CAST(ROUND(1000000.0
               * (p.sxy - (g.s / g.n) * (p.sh + p.st)
                  + p.n_pairs * (g.s / g.n) * (g.s / g.n))
               / (g.sxx - g.n * (g.s / g.n) * (g.s / g.n))) AS BIGINT)
               AS rk_e6
      FROM p CROSS JOIN g
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_days,
           CAST({_LB_H} AS INT) AS h,
           CAST(ROUND(MAX(n) * (MAX(n) + 2.0)
                * SUM((rk_e6 / 1000000.0) * (rk_e6 / 1000000.0)
                      / (n - k)) * 1000000.0) AS BIGINT)
             AS q_e6,
           CAST({_LB_CRIT_E6} AS BIGINT) AS crit_e6,
           ROUND(MAX(n) * (MAX(n) + 2.0)
                * SUM((rk_e6 / 1000000.0) * (rk_e6 / 1000000.0)
                      / (n - k)) * 1000000.0)
             > {_LB_CRIT_E6} AS reject_white_noise
    FROM rk
    """,
    tags=("stats", "timeseries", "orders"),
)
def stats_ljung_box_whiteness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box portmanteau whiteness test (Ljung & Box, Biometrika
    1978) on the daily-revenue series: Q = n(n+2)·Σ_(k≤h) ρ̂_k²/(n−k)
    pooled over h={_LB_H} lags, compared against the χ²₁₀ 95th
    percentile — the one-number "is there ANY autocorrelation left"
    readout run on forecast residuals and metric series before trusting
    a model. Builds on timeseries_autocorrelation's exact-integer ACF
    expansion: each ρ̂_k is e6-fixpointed FIRST (so both engines pool
    identical integers), Q is one bounded expression on those integers,
    and the critical value is an injected table constant (Abramowitz &
    Stegun 26.8) — no runtime quantile function.

    Scale: identical to the ACF query — one date-keyed reduction of the
    fact table, then constant-size lag work. Reference analog: none."""
    from blow_spark.materialize import spill_to_parquet

    o = read_table(spark, sf_dir, "orders")
    daily = spill_to_parquet(
        o.groupBy(
            F.datediff(
                F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date")
            ).alias("di")
        ).agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("x")
        ),
        "blow_spark_lb_",
    )
    g = daily.agg(
        F.count("*").cast("double").alias("n"),
        F.sum("x").cast("double").alias("s"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x"))
        .cast("double")
        .alias("sxx"),
    )
    lags = daily.sparkSession.range(1, _LB_H + 1).select(
        F.col("id").cast("int").alias("k")
    )
    a = daily.alias("a")
    b = daily.alias("b")
    p = (
        a.crossJoin(F.broadcast(lags))
        .join(b, F.col("b.di") == F.col("a.di") + F.col("k"))
        .groupBy("k")
        .agg(
            F.count("*").cast("bigint").alias("n_pairs"),
            F.sum(F.col("a.x").cast("decimal(38,0)") * F.col("b.x"))
            .cast("double")
            .alias("sxy"),
            F.sum("a.x").cast("double").alias("sh"),
            F.sum("b.x").cast("double").alias("st"),
        )
    )
    mean = F.col("s") / F.col("n")
    rk = p.crossJoin(F.broadcast(g)).select(
        "k",
        "n",
        F.round(
            1000000.0
            * (
                F.col("sxy")
                - mean * (F.col("sh") + F.col("st"))
                + F.col("n_pairs") * mean * mean
            )
            / (F.col("sxx") - F.col("n") * mean * mean)
        )
        .cast("bigint")
        .alias("rk_e6"),
    )
    rho2_term = (
        (F.col("rk_e6") / 1000000.0)
        * (F.col("rk_e6") / 1000000.0)
        / (F.col("n") - F.col("k"))
    )
    q = F.max("n") * (F.max("n") + 2.0) * F.sum(rho2_term) * 1000000.0
    return rk.agg(
        F.max("n").cast("bigint").alias("n_days"),
        F.lit(_LB_H).cast("int").alias("h"),
        F.round(q).cast("bigint").alias("q_e6"),
        F.lit(_LB_CRIT_E6).cast("bigint").alias("crit_e6"),
        (F.round(q) > _LB_CRIT_E6).alias("reject_white_noise"),
    )


# --------------------------------------------------------------------------
# Gumbel block-maxima fit (round 12)
# --------------------------------------------------------------------------

#: injected constants (the NDCG discount-table discipline — no runtime
#: transcendentals): sqrt(6)/pi and the Euler-Mascheroni constant for
#: the Gumbel method-of-moments, and c12 = -ln(-ln(1 - 1/12)) for the
#: 12-block return level. e12 fixpoints, divided back in-plan.
_GUM_S6PI_E12 = 779_696_801_234
_GUM_GAMMA_E12 = 577_215_664_902
_GUM_C12_E12 = 2_441_716_398_881


@register(
    "stats_gumbel_block_maxima",
    oracle=f"""
    WITH daily AS (
      SELECT c.c_nationkey AS nk,
             date_trunc('month', CAST(o.o_orderdate AS DATE)) AS mon,
             CAST(o.o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY 1, 2, 3
    ), blockmax AS (
      SELECT nk, mon, CAST(MAX(cents) AS BIGINT) AS x
      FROM daily GROUP BY nk, mon
    ), mom AS (
      SELECT nk, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS s,
             -- sxx stays HUGEINT: it only feeds a DOUBLE downstream,
             -- and the BIGINT cast overflowed at sf1 (2.3e20 > 2^63;
             -- round-13 overflow audit, same class as the MCC fix)
             SUM(CAST(x AS HUGEINT) * x) AS sxx
      FROM blockmax GROUP BY nk
    )
    SELECT nk, n,
           CAST(ROUND(CAST(s AS DOUBLE) / n) AS BIGINT) AS mean_cents,
           CAST(ROUND(({_GUM_S6PI_E12} / 1e12)
                * SQRT((CAST(sxx AS DOUBLE) - CAST(s AS DOUBLE) * s / n)
                       / (n - 1))) AS BIGINT) AS scale_cents,
           CAST(ROUND(CAST(s AS DOUBLE) / n
                - ({_GUM_GAMMA_E12} / 1e12) * ({_GUM_S6PI_E12} / 1e12)
                  * SQRT((CAST(sxx AS DOUBLE) - CAST(s AS DOUBLE) * s / n)
                         / (n - 1))) AS BIGINT) AS loc_cents,
           CAST(ROUND(CAST(s AS DOUBLE) / n
                + (({_GUM_C12_E12} - {_GUM_GAMMA_E12}) / 1e12)
                  * ({_GUM_S6PI_E12} / 1e12)
                  * SQRT((CAST(sxx AS DOUBLE) - CAST(s AS DOUBLE) * s / n)
                         / (n - 1))) AS BIGINT) AS return_level_12_cents
    FROM mom WHERE n >= 2 ORDER BY nk
    """,
    tags=("stats", "extreme-value", "orders", "exact"),
)
def stats_gumbel_block_maxima(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gumbel (EV type I) fit of monthly block maxima of daily revenue
    per nation — classical extreme-value analysis (Gumbel, "Statistics
    of Extremes", 1958; the Fisher-Tippett-Gnedenko theorem says block
    maxima of light-tailed daily sums converge to exactly this family):
    method-of-moments scale σ̂ = s·√6/π and location μ̂ = x̄ − γ·σ̂,
    plus the 12-block RETURN LEVEL x₁₂ = μ̂ − σ̂·ln(−ln(1−1/12)) — the
    level exceeded once a year on average, the risk readout capacity
    planning actually consumes. √6/π, the
    Euler-Mascheroni constant, and c₁₂ are e12 table constants injected
    into BOTH plans (zero runtime transcendentals except one sqrt on
    identical exact moments); block maxima, n, Σx, Σx² are exact
    BIGINTs; outputs round to whole cents on identical doubles.

    Scale: two keyed aggregates (day grain, then month-max grain), both
    map-side combinable; the fit runs on the 25-nation moment table.
    Reference analog: none."""
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    daily = (
        o.join(F.broadcast(c), c.c_custkey == o.o_custkey)
        .groupBy(
            F.col("c_nationkey").alias("nk"),
            F.trunc("o_orderdate", "month").alias("mon"),
            F.to_date("o_orderdate").alias("day"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("cents")
        )
    )
    blockmax = daily.groupBy("nk", "mon").agg(
        F.max("cents").cast("bigint").alias("x")
    )
    mom = blockmax.groupBy("nk").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("s"),
        # decimal(38,0), NOT bigint: Σx² reached 2.3e20 at sf1 (the
        # round-13 overflow audit's one thrown error) and only feeds
        # the double-valued sd below
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x")).alias("sxx"),
    )
    mean = F.col("s").cast("double") / F.col("n")
    sd = F.sqrt(
        (
            F.col("sxx").cast("double")
            - F.col("s").cast("double") * F.col("s") / F.col("n")
        )
        / (F.col("n") - 1)
    )
    s6pi = _GUM_S6PI_E12 / 1e12
    gamma = _GUM_GAMMA_E12 / 1e12
    c12 = _GUM_C12_E12 / 1e12
    scale = s6pi * sd
    return (
        mom.filter(F.col("n") >= 2)
        .select(
            "nk",
            "n",
            F.round(mean).cast("bigint").alias("mean_cents"),
            F.round(scale).cast("bigint").alias("scale_cents"),
            F.round(mean - gamma * scale).cast("bigint").alias("loc_cents"),
            F.round(mean + (c12 - gamma) * scale)
            .cast("bigint")
            .alias("return_level_12_cents"),
        )
        .orderBy("nk")
    )
