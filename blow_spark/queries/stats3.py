"""Round-9 statistics & evaluation shelf: inter-annotator agreement,
information-theoretic dependence, classifier calibration, rank
correlation with ties, rank-based ANOVA, and exponential smoothing.

These are the measurement operators an LLM labeling/eval pipeline runs
over its own outputs — agreement between labeling passes (kappa),
leakage between metadata columns (mutual information), probability
calibration of a quality classifier (ECE), and monotone-association /
distribution-shift checks that don't assume normality (Kendall τ-b,
Kruskal-Wallis).

Reference parity note: the reference engine (wizgrao/blow,
maps/maps.go:8-21) has no aggregate surface at all; this shelf extends
the repo's classical-statistics family (queries/stats.py, stats2.py)
with the agreement/calibration measures those modules don't cover.

Engine-exactness follows the catalog rules: counts stay BIGINT,
transcendental outputs are fix-pointed per TERM before any sum (so
float summation order can't diverge), and single divisions of
identical integer operands are IEEE-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from blow_spark.queries import register
from blow_spark.sources import read_table

# Cohen's kappa: two deterministic length-based "annotators" over the
# documents table (character count vs whitespace word count — correlated
# but not identical raters, so the kappa is informative). Thresholds are
# the fixture medians, documented constants.
_KAPPA_CHARS = 306
_KAPPA_WORDS = 56


@register(
    "eval_cohens_kappa",
    oracle=f"""
    WITH lab AS (
      SELECT CAST(n_chars >= {_KAPPA_CHARS} AS INT) AS a,
             CAST(len(string_split(text, ' ')) >= {_KAPPA_WORDS} AS INT) AS b
      FROM documents
    ), m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(a * b) AS BIGINT) AS n11,
             CAST(SUM(a * (1 - b)) AS BIGINT) AS n10,
             CAST(SUM((1 - a) * b) AS BIGINT) AS n01,
             CAST(SUM((1 - a) * (1 - b)) AS BIGINT) AS n00
      FROM lab
    )
    SELECT n, n11, n10, n01, n00,
           CAST(ROUND(CAST((n11 + n00) AS DOUBLE) / n * 1000000)
                AS BIGINT) AS po_e6,
           CAST(ROUND(CAST(((n11 + n10) * (n11 + n01)
                          + (n01 + n00) * (n10 + n00)) AS DOUBLE)
                      / (n * n) * 1000000) AS BIGINT) AS pe_e6,
           CAST(ROUND((CAST((n11 + n00) AS DOUBLE) / n
                      - CAST(((n11 + n10) * (n11 + n01)
                            + (n01 + n00) * (n10 + n00)) AS DOUBLE)
                        / (n * n))
                     / (1 - CAST(((n11 + n10) * (n11 + n01)
                                + (n01 + n00) * (n10 + n00)) AS DOUBLE)
                           / (n * n)) * 1000000) AS BIGINT) AS kappa_e6
    FROM m
    """,
    tags=("eval", "stats", "documents"),
)
def eval_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa (Cohen 1960) — chance-corrected agreement between
    two raters, THE gate metric for LLM labeling pipelines (two model
    passes, or model vs human sample): po = observed agreement, pe =
    expected agreement from the raters' marginals, κ = (po−pe)/(1−pe).
    Raters here are two deterministic length rules over documents
    (chars ≥ median vs words ≥ median) so the confusion matrix is
    data-derived and reproducible.

    Engine-exact: the confusion matrix is pure integer counts; po and
    pe are single divisions of identical BIGINT operands (IEEE-
    identical across engines — pe's numerator stays exact: marginal
    products ≤ n² < 2⁶³ for n < 3·10⁹); κ is arithmetic on those two
    identical doubles, fix-pointed to e6 once at the end.

    Scale: one map-side-combinable 1-row aggregate over the corpus —
    no shuffle of document bodies, no Python."""
    d = read_table(spark, sf_dir, "documents")
    lab = d.select(
        (F.col("n_chars") >= _KAPPA_CHARS).cast("int").alias("a"),
        (F.size(F.split(F.col("text"), " ")) >= _KAPPA_WORDS)
        .cast("int")
        .alias("b"),
    )
    m = lab.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.col("a") * F.col("b")).cast("bigint").alias("n11"),
        F.sum(F.col("a") * (1 - F.col("b"))).cast("bigint").alias("n10"),
        F.sum((1 - F.col("a")) * F.col("b")).cast("bigint").alias("n01"),
        F.sum((1 - F.col("a")) * (1 - F.col("b"))).cast("bigint").alias("n00"),
    )
    po = (F.col("n11") + F.col("n00")).cast("double") / F.col("n")
    pe = (
        (F.col("n11") + F.col("n10")) * (F.col("n11") + F.col("n01"))
        + (F.col("n01") + F.col("n00")) * (F.col("n10") + F.col("n00"))
    ).cast("double") / (F.col("n") * F.col("n"))
    return m.select(
        "n",
        "n11",
        "n10",
        "n01",
        "n00",
        F.round(po * 1_000_000).cast("bigint").alias("po_e6"),
        F.round(pe * 1_000_000).cast("bigint").alias("pe_e6"),
        F.round((po - pe) / (1 - pe) * 1_000_000).cast("bigint").alias("kappa_e6"),
    )


@register(
    "stats_mutual_information",
    oracle="""
    WITH cells AS (
      SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS c
      FROM documents GROUP BY lang, source
    ), mx AS (
      SELECT lang, CAST(SUM(c) AS BIGINT) AS cx FROM cells GROUP BY lang
    ), my AS (
      SELECT source, CAST(SUM(c) AS BIGINT) AS cy FROM cells GROUP BY source
    ), nn AS (
      SELECT CAST(SUM(c) AS BIGINT) AS n FROM cells
    ), terms AS (
      SELECT CAST(ROUND(c * LN(CAST(c AS DOUBLE) * n
                               / (CAST(cx AS DOUBLE) * cy)) * 1000000)
                  AS BIGINT) AS t_e6
      FROM cells JOIN mx USING (lang) JOIN my USING (source) CROSS JOIN nn
    ), hx AS (
      SELECT CAST(SUM(CAST(ROUND(cx * LN(CAST(n AS DOUBLE) / cx) * 1000000)
                           AS BIGINT)) AS BIGINT) AS s
      FROM mx CROSS JOIN nn
    ), hy AS (
      SELECT CAST(SUM(CAST(ROUND(cy * LN(CAST(n AS DOUBLE) / cy) * 1000000)
                           AS BIGINT)) AS BIGINT) AS s
      FROM my CROSS JOIN nn
    ), mi AS (
      SELECT CAST(SUM(t_e6) AS BIGINT) AS s,
             CAST(COUNT(*) AS BIGINT) AS n_cells
      FROM terms
    )
    SELECT nn.n AS n_docs, mi.n_cells,
           CAST(ROUND(CAST(mi.s AS DOUBLE) / nn.n) AS BIGINT) AS mi_e6,
           CAST(ROUND(CAST(hx.s AS DOUBLE) / nn.n) AS BIGINT) AS h_lang_e6,
           CAST(ROUND(CAST(hy.s AS DOUBLE) / nn.n) AS BIGINT) AS h_source_e6,
           CAST(ROUND(CAST(mi.s AS DOUBLE) / nn.n * 1000000
                      / SQRT(ROUND(CAST(hx.s AS DOUBLE) / nn.n)
                             * ROUND(CAST(hy.s AS DOUBLE) / nn.n)))
                AS BIGINT) AS nmi_e6
    FROM mi CROSS JOIN hx CROSS JOIN hy CROSS JOIN nn
    """,
    tags=("stats", "information", "documents"),
)
def stats_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between two categorical metadata columns
    (lang × source over documents) with entropies and normalized MI —
    the dependence probe a mixing pipeline runs to catch metadata
    leakage (e.g. is "source" secretly a language partition?):
    MI = Σ p(x,y)·ln(p(x,y)/(p(x)p(y))), NMI = MI/√(H(x)H(y)).

    Engine-exact: every transcendental term is fix-pointed to e6 AT
    THE CELL (c·ln(cN/(cx·cy)) is an integer per cell) so the sum is
    BIGINT and float summation order cannot diverge; the final /N and
    √ are single operations on identical integers. Envelope:
    c·ln(·)·10⁶ stays under 2⁵³ for cell counts up to ~4·10⁸.

    Scale: one (lang, source)-keyed count — map-side combinable, cells
    bounded by the label-domain product, margins are trivial rollups of
    the cell table. No second corpus scan, no Python."""
    from blow_spark.materialize import spill_to_parquet

    d = read_table(spark, sf_dir, "documents")
    # vocabulary-sized; spilled because margins, totals and terms all
    # re-read it (without this the corpus count re-runs four times)
    cells = spill_to_parquet(
        d.groupBy("lang", "source").agg(
            F.count("*").cast("bigint").alias("c")
        ),
        "blow_spark_mi_cells_",
    )
    mx = cells.groupBy("lang").agg(F.sum("c").cast("bigint").alias("cx"))
    my = cells.groupBy("source").agg(F.sum("c").cast("bigint").alias("cy"))
    nn = cells.agg(F.sum("c").cast("bigint").alias("n"))
    terms = (
        cells.join(mx, "lang")
        .join(my, "source")
        .crossJoin(F.broadcast(nn))
        .select(
            F.round(
                F.col("c")
                * F.log(
                    F.col("c").cast("double")
                    * F.col("n")
                    / (F.col("cx").cast("double") * F.col("cy"))
                )
                * 1_000_000
            )
            .cast("bigint")
            .alias("t_e6")
        )
    )
    mi = terms.agg(
        F.sum("t_e6").cast("bigint").alias("s"),
        F.count("*").cast("bigint").alias("n_cells"),
    )
    hx = (
        mx.crossJoin(F.broadcast(nn))
        .select(
            F.round(
                F.col("cx") * F.log(F.col("n").cast("double") / F.col("cx")) * 1_000_000
            )
            .cast("bigint")
            .alias("t")
        )
        .agg(F.sum("t").cast("bigint").alias("s"))
    )
    hy = (
        my.crossJoin(F.broadcast(nn))
        .select(
            F.round(
                F.col("cy") * F.log(F.col("n").cast("double") / F.col("cy")) * 1_000_000
            )
            .cast("bigint")
            .alias("t")
        )
        .agg(F.sum("t").cast("bigint").alias("s"))
    )
    mi_e6 = F.round(F.col("s").cast("double") / F.col("n")).cast("bigint")
    hx_e6 = F.round(F.col("hxs").cast("double") / F.col("n")).cast("bigint")
    hy_e6 = F.round(F.col("hys").cast("double") / F.col("n")).cast("bigint")
    return (
        mi.crossJoin(hx.select(F.col("s").alias("hxs")))
        .crossJoin(hy.select(F.col("s").alias("hys")))
        .crossJoin(F.broadcast(nn))
        .select(
            F.col("n").alias("n_docs"),
            "n_cells",
            mi_e6.alias("mi_e6"),
            hx_e6.alias("h_lang_e6"),
            hy_e6.alias("h_source_e6"),
            F.round(
                F.col("s").cast("double")
                / F.col("n")
                * 1_000_000
                / F.sqrt(hx_e6 * hy_e6)
            )
            .cast("bigint")
            .alias("nmi_e6"),
        )
    )


@register(
    "eval_expected_calibration_error",
    oracle="""
    WITH scored AS (
      SELECT
        CAST(('0x' || substring(md5('cal:p:' || CAST(doc_id AS VARCHAR)), 1, 13))
             AS BIGINT) % 1000000 AS p_e6,
        CAST(('0x' || substring(md5('cal:y:' || CAST(doc_id AS VARCHAR)), 1, 13))
             AS BIGINT) % 1000000 AS u_e6
      FROM documents
    ), binned AS (
      SELECT p_e6 // 100000 AS bin,
             p_e6,
             CAST(u_e6 < p_e6 AS INT) AS y
      FROM scored
    ), agg AS (
      SELECT bin,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(p_e6) AS BIGINT) AS sum_p,
             CAST(SUM(y) AS BIGINT) AS n_pos
      FROM binned GROUP BY bin
    ), rounded AS (
      SELECT bin, n,
             CAST(ROUND(CAST(sum_p AS DOUBLE) / n) AS BIGINT) AS conf_e6,
             CAST(ROUND(CAST(n_pos AS DOUBLE) * 1000000 / n) AS BIGINT) AS acc_e6
      FROM agg
    ), gaps AS (
      SELECT bin, n, conf_e6, acc_e6,
             ABS(acc_e6 - conf_e6) AS gap_e6
      FROM rounded
    ), tot AS (
      SELECT CAST(ROUND(CAST(SUM(n * gap_e6) AS DOUBLE) / SUM(n)) AS BIGINT)
             AS ece_e6
      FROM gaps
    )
    SELECT g.bin, g.n, g.conf_e6, g.acc_e6, g.gap_e6, t.ece_e6
    FROM gaps g CROSS JOIN tot t
    ORDER BY g.bin
    """,
    tags=("eval", "calibration", "documents"),
)
def eval_expected_calibration_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected Calibration Error (Naeini et al., AAAI 2015 — the
    standard reliability metric for classifier probability outputs,
    e.g. the corpus quality classifier before its scores gate a
    mixture): documents get a deterministic pseudo-probability p and a
    Bernoulli(p) label from two INDEPENDENT md5-derived uniforms (so
    the generator is perfectly calibrated in expectation and ECE
    measures finite-sample deviation), 10 fixed-width probability
    bins, per-bin confidence vs accuracy gap, ECE = Σ (n_b/N)·|gap_b|.

    Engine-exact: p and the label are pure integer hash arithmetic
    (the md5-13-nibble device the spatial family uses); per-bin conf
    and acc round single BIGINT-operand divisions; the gap is integer
    arithmetic on the ROUNDED values, and ECE is one more single
    division (Σ n·gap ≤ N·10⁶ < 2⁵³ for N < 9·10⁹).

    Scale: map-side hash + one 10-group aggregate — no shuffle beyond
    the 10-row combine, no Python, no second scan."""
    d = read_table(spark, sf_dir, "documents")

    def _h(tag: str):
        return F.conv(
            F.substring(
                F.md5(F.concat(F.lit(tag), F.col("doc_id").cast("string"))),
                1,
                13,
            ),
            16,
            10,
        ).cast("long") % 1_000_000

    binned = d.select(
        _h("cal:p:").alias("p_e6"), _h("cal:y:").alias("u_e6")
    ).select(
        F.expr("p_e6 div 100000").alias("bin"),
        "p_e6",
        (F.col("u_e6") < F.col("p_e6")).cast("int").alias("y"),
    )
    agg = binned.groupBy("bin").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("p_e6").cast("bigint").alias("sum_p"),
        F.sum("y").cast("bigint").alias("n_pos"),
    )
    rounded = agg.select(
        "bin",
        "n",
        F.round(F.col("sum_p").cast("double") / F.col("n"))
        .cast("bigint")
        .alias("conf_e6"),
        F.round(F.col("n_pos").cast("double") * 1_000_000 / F.col("n"))
        .cast("bigint")
        .alias("acc_e6"),
    )
    gaps = rounded.withColumn(
        "gap_e6", F.abs(F.col("acc_e6") - F.col("conf_e6"))
    )
    tot = gaps.agg(
        F.round(
            F.sum(F.col("n") * F.col("gap_e6")).cast("double") / F.sum("n")
        )
        .cast("bigint")
        .alias("ece_e6")
    )
    return (
        gaps.crossJoin(F.broadcast(tot))
        .select("bin", "n", "conf_e6", "acc_e6", "gap_e6", "ece_e6")
        .orderBy("bin")
    )


@register(
    "stats_kendall_tau_b",
    oracle="""
    WITH m AS (
      SELECT strftime(o_orderdate, '%Y-%m') AS mon,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS rev,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM orders GROUP BY strftime(o_orderdate, '%Y-%m')
    ), p AS (
      SELECT a.rev AS xa, b.rev AS xb, a.cnt AS ya, b.cnt AS yb
      FROM m a JOIN m b ON a.mon < b.mon
    ), s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n0,
             CAST(SUM(CASE WHEN (xa < xb AND ya < yb)
                             OR (xa > xb AND ya > yb) THEN 1 ELSE 0 END)
                  AS BIGINT) AS conc,
             CAST(SUM(CASE WHEN (xa < xb AND ya > yb)
                             OR (xa > xb AND ya < yb) THEN 1 ELSE 0 END)
                  AS BIGINT) AS disc,
             CAST(SUM(CASE WHEN xa = xb THEN 1 ELSE 0 END) AS BIGINT) AS tie_x,
             CAST(SUM(CASE WHEN ya = yb THEN 1 ELSE 0 END) AS BIGINT) AS tie_y
      FROM p
    )
    SELECT n0, conc, disc, tie_x, tie_y,
           CAST(ROUND(CAST(conc - disc AS DOUBLE)
                      / SQRT(CAST((n0 - tie_x) AS DOUBLE) * (n0 - tie_y))
                      * 1000000) AS BIGINT) AS tau_b_e6
    FROM s
    """,
    tags=("stats", "correlation", "orders"),
)
def stats_kendall_tau_b(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall τ-b rank correlation WITH tie correction (Kendall 1945)
    between monthly revenue and monthly order count — the
    nonparametric monotone-association twin of the Spearman query in
    stats.py (τ-b differs: it counts concordant/discordant PAIRS and
    corrects both margins for ties, the estimator of choice when the
    series is short and tied). τ-b = (C−D)/√((n₀−Tx)(n₀−Ty)).

    Engine-exact: concordance bits are pure integer comparisons on
    BIGINT cent/count values; the only doubles are the final single
    division and √ of identical integer operands, fix-pointed to e6.

    Scale: the pair join runs at MONTH grain — the series length is
    the date span (a constant per dataset, not a row count), so the
    O(T²) pair table is span-bounded exactly like the Theil-Sen and
    Mann-Kendall queries (SCALE.md:634-639); everything before it is
    one month-keyed map-side-combinable rollup of orders."""
    o = read_table(spark, sf_dir, "orders")
    m = o.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("mon")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("rev"),
        F.count("*").cast("bigint").alias("cnt"),
    )
    a = m.select(
        F.col("mon").alias("mon_a"),
        F.col("rev").alias("xa"),
        F.col("cnt").alias("ya"),
    )
    b = m.select(
        F.col("mon").alias("mon_b"),
        F.col("rev").alias("xb"),
        F.col("cnt").alias("yb"),
    )
    p = a.join(b, F.col("mon_a") < F.col("mon_b"))
    conc = (
        ((F.col("xa") < F.col("xb")) & (F.col("ya") < F.col("yb")))
        | ((F.col("xa") > F.col("xb")) & (F.col("ya") > F.col("yb")))
    ).cast("int")
    disc = (
        ((F.col("xa") < F.col("xb")) & (F.col("ya") > F.col("yb")))
        | ((F.col("xa") > F.col("xb")) & (F.col("ya") < F.col("yb")))
    ).cast("int")
    s = p.agg(
        F.count("*").cast("bigint").alias("n0"),
        F.sum(conc).cast("bigint").alias("conc"),
        F.sum(disc).cast("bigint").alias("disc"),
        F.sum((F.col("xa") == F.col("xb")).cast("int"))
        .cast("bigint")
        .alias("tie_x"),
        F.sum((F.col("ya") == F.col("yb")).cast("int"))
        .cast("bigint")
        .alias("tie_y"),
    )
    return s.select(
        "n0",
        "conc",
        "disc",
        "tie_x",
        "tie_y",
        F.round(
            (F.col("conc") - F.col("disc")).cast("double")
            / F.sqrt(
                (F.col("n0") - F.col("tie_x")).cast("double")
                * (F.col("n0") - F.col("tie_y"))
            )
            * 1_000_000
        )
        .cast("bigint")
        .alias("tau_b_e6"),
    )


@register(
    "stats_kruskal_wallis",
    oracle="""
    WITH c AS (
      SELECT c_mktsegment AS seg,
             CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal
      FROM customer
    ), vg AS (
      SELECT bal, CAST(COUNT(*) AS BIGINT) AS cnt FROM c GROUP BY bal
    ), cum AS (
      SELECT bal, cnt,
             CAST(SUM(cnt) OVER (ORDER BY bal
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) - cnt AS BIGINT) AS cumlt
      FROM vg
    ), r2 AS (
      SELECT bal, 2 * cumlt + cnt + 1 AS rr FROM cum
    ), cell AS (
      SELECT seg, bal, CAST(COUNT(*) AS BIGINT) AS cg
      FROM c GROUP BY seg, bal
    ), grp AS (
      SELECT seg, CAST(SUM(cg) AS BIGINT) AS n_g,
             CAST(SUM(cg * r2.rr) AS BIGINT) AS s2
      FROM cell JOIN r2 USING (bal) GROUP BY seg
    ), nn AS (
      SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM vg
    ), dev AS (
      SELECT seg, n_g, s2,
             CAST(s2 AS DOUBLE) / (2 * n_g)
               - (CAST(n AS DOUBLE) + 1) / 2 AS d
      FROM grp CROSS JOIN nn
    ), hterm AS (
      SELECT seg, n_g,
             CAST(ROUND(CAST(s2 AS DOUBLE) / (2 * n_g) * 1000000)
                  AS BIGINT) AS mean_rank_e6,
             CAST(ROUND(12.0 * n_g * (d * d)
                        / (CAST(n AS DOUBLE) * (n + 1)) * 1000000000)
                  AS BIGINT) AS h_e9
      FROM dev CROSS JOIN nn
    ), ties AS (
      SELECT CAST(SUM(cnt * cnt * cnt - cnt) AS BIGINT) AS st FROM vg
    ), hh AS (
      SELECT CAST(SUM(h_e9) AS BIGINT) AS h9 FROM hterm
    ), cc AS (
      SELECT 1.0 - CAST(st AS DOUBLE)
                   / (CAST(n AS DOUBLE) * n * n - n) AS corr
      FROM ties CROSS JOIN nn
    )
    SELECT h.seg, h.n_g AS n, h.mean_rank_e6,
           CAST(ROUND(CAST(hh.h9 AS DOUBLE) / 1000) AS BIGINT) AS h_e6,
           CAST(ROUND(cc.corr * 1000000) AS BIGINT) AS tie_c_e6,
           CAST(ROUND(CAST(hh.h9 AS DOUBLE) / cc.corr / 1000)
                AS BIGINT) AS h_corrected_e6
    FROM hterm h CROSS JOIN hh CROSS JOIN cc
    ORDER BY h.seg
    """,
    tags=("stats", "nonparametric", "customer"),
)
def stats_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H test (Kruskal & Wallis, JASA 1952) — the
    rank-based one-way ANOVA: does account balance differ across the 5
    market segments WITHOUT assuming normality? Midranks with ties,
    H = 12/(N(N+1))·Σ n_g(r̄_g − r̄)², tie-corrected by
    C = 1 − Σ(t³−t)/(N³−N). Completes the nonparametric shelf next to
    Mann-Whitney (two groups) and the classical ANOVA (stats.py).

    Engine-exact: midranks are kept as INTEGER doubled-ranks
    (2·cumlt + t + 1) built from value-grain counts, so per-group rank
    sums are exact BIGINTs; each group's H contribution is fix-pointed
    to e9 before the 5-term sum (float order can't diverge); the tie
    correction is a single division of deterministically-converted
    BIGINTs. Envelope: Σ(t³−t) needs max tie group ≤ 2·10⁶;
    doubled-rank sums stay exact BIGINT to N ≈ 2·10⁹.

    Scale: value-grain tables only — the cumulative below-count rides
    ops.global_running_sum's two-phase prefix sum (NO single-partition
    window at data scale, same as the Spearman/KS queries); everything
    else is keyed aggregates over (value) and (segment, value) cells."""
    from blow_spark import ops

    c = read_table(spark, sf_dir, "customer").select(
        F.col("c_mktsegment").alias("seg"),
        F.round(F.col("c_acctbal") * 100).cast("bigint").alias("bal"),
    )
    from blow_spark.materialize import spill_to_parquet

    # value-grain; spilled — the prefix sum, tie correction and total all
    # consume it (without this the corpus count re-runs three times)
    vg = spill_to_parquet(
        c.groupBy("bal").agg(F.count("*").cast("bigint").alias("cnt")),
        "blow_spark_kw_vg_",
    )
    cum = ops.global_running_sum(
        vg, [F.col("bal")], "cnt", out_col="run"
    ).select("bal", "cnt", (F.col("run") - F.col("cnt")).alias("cumlt"))
    r2 = cum.select(
        "bal", (2 * F.col("cumlt") + F.col("cnt") + 1).alias("rr")
    )
    cell = c.groupBy("seg", "bal").agg(F.count("*").cast("bigint").alias("cg"))
    grp = (
        cell.join(r2, "bal")
        .groupBy("seg")
        .agg(
            F.sum("cg").cast("bigint").alias("n_g"),
            F.sum(F.col("cg") * F.col("rr")).cast("bigint").alias("s2"),
        )
    )
    nn = vg.agg(F.sum("cnt").cast("bigint").alias("n"))
    dev = grp.crossJoin(F.broadcast(nn)).select(
        "seg",
        "n_g",
        "s2",
        "n",
        (
            F.col("s2").cast("double") / (2 * F.col("n_g"))
            - (F.col("n").cast("double") + 1) / 2
        ).alias("d"),
    )
    hterm = dev.select(
        "seg",
        "n_g",
        F.round(F.col("s2").cast("double") / (2 * F.col("n_g")) * 1_000_000)
        .cast("bigint")
        .alias("mean_rank_e6"),
        F.round(
            F.lit(12.0)
            * F.col("n_g")
            * (F.col("d") * F.col("d"))
            / (F.col("n").cast("double") * (F.col("n") + 1))
            * 1_000_000_000
        )
        .cast("bigint")
        .alias("h_e9"),
    )
    ties = vg.agg(
        F.sum(F.col("cnt") * F.col("cnt") * F.col("cnt") - F.col("cnt"))
        .cast("bigint")
        .alias("st")
    )
    hh = hterm.agg(F.sum("h_e9").cast("bigint").alias("h9"))
    cc = ties.crossJoin(F.broadcast(nn)).select(
        (
            F.lit(1.0)
            - F.col("st").cast("double")
            / (
                F.col("n").cast("double") * F.col("n") * F.col("n")
                - F.col("n")
            )
        ).alias("corr")
    )
    return (
        hterm.crossJoin(F.broadcast(hh))
        .crossJoin(F.broadcast(cc))
        .select(
            "seg",
            F.col("n_g").alias("n"),
            "mean_rank_e6",
            F.round(F.col("h9").cast("double") / 1000).cast("bigint").alias("h_e6"),
            F.round(F.col("corr") * 1_000_000).cast("bigint").alias("tie_c_e6"),
            F.round(F.col("h9").cast("double") / F.col("corr") / 1000)
            .cast("bigint")
            .alias("h_corrected_e6"),
        )
        .orderBy("seg")
    )


_ES_ALPHA = 0.3   # smoothing weight (1-α = 0.7 decay per day)
_ES_TAIL = 10     # output: the last N days with forecasts


@register(
    "timeseries_exponential_smoothing",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS x
      FROM events WHERE event_type = 'error' GROUP BY CAST(ts AS DATE)
    ), span AS (
      SELECT MIN(day) AS mind, MAX(day) AS maxd FROM daily
    ), cal AS (
      SELECT UNNEST(generate_series(mind, maxd, INTERVAL 1 DAY))::DATE AS day
      FROM span
    ), series AS (
      SELECT date_diff('day', s.mind, c.day) + 1 AS idx,
             c.day, COALESCE(d.x, 0) AS x
      FROM cal c CROSS JOIN span s LEFT JOIN daily d ON d.day = c.day
    ), w AS (
      SELECT t.idx AS t, i.idx AS i,
             CAST(ROUND(CASE WHEN i.idx = 1
                        THEN POWER({1 - _ES_ALPHA}, t.idx - 1)
                        ELSE {_ES_ALPHA} * POWER({1 - _ES_ALPHA}, t.idx - i.idx)
                        END * 1000000000) AS BIGINT) AS w_e9,
             i.x
      FROM series t JOIN series i ON i.idx <= t.idx
    ), sm AS (
      SELECT t, CAST(SUM(w_e9 * x) AS BIGINT) AS s_e9 FROM w GROUP BY t
    ), tt AS (
      SELECT CAST(MAX(idx) AS BIGINT) AS tmax FROM series
    )
    SELECT CAST(s.day AS VARCHAR) AS day, s.x AS n_events,
           CAST(ROUND(CAST(cur.s_e9 AS DOUBLE) / 1000) AS BIGINT) AS smooth_e6,
           CAST(ROUND(CAST(prev.s_e9 AS DOUBLE) / 1000) AS BIGINT)
             AS forecast_e6,
           ABS(s.x * 1000000
               - CAST(ROUND(CAST(prev.s_e9 AS DOUBLE) / 1000) AS BIGINT))
             AS abs_err_e6
    FROM series s
    JOIN sm cur ON cur.t = s.idx
    JOIN sm prev ON prev.t = s.idx - 1
    CROSS JOIN tt
    WHERE s.idx > tt.tmax - {_ES_TAIL}
    ORDER BY s.day
    """,
    tags=("timeseries", "forecast", "events"),
)
def timeseries_exponential_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simple exponential smoothing over the daily error-event series
    (zero-filled calendar), with the one-step-ahead forecast and its
    absolute error for the last 10 days — the classical ES baseline
    (Brown 1956) next to the seasonal-naive backtest in product.py.

    The recurrence s_t = αx_t + (1−α)s_{t−1} is NOT run as a sequential
    loop: with s_1 = x_1 it has the closed form
    s_t = (1−α)^{{t−1}}x_1 + Σ_{{i≥2}} α(1−α)^{{t−i}}x_i, so the whole
    series is ONE span-bounded pair join (weight table t×i) plus a
    keyed sum — the same de-recursion device the repo uses for prefix
    sums. Each weight is fix-pointed to e9 BEFORE multiplying, so the
    per-day sum is exact BIGINT (Σ weights ≤ 10⁹ keeps Σ w·x < 2⁶³ for
    daily counts up to 10⁹) and float summation order cannot diverge;
    POWER carries the catalog's 1-ulp allowance under the rounding.

    Scale: the day-grain series is tiny after the first rollup (the
    span is a property of the dataset's time range, not its row
    count); the t×i pair table is span² — the only corpus-scale work
    is the one map-side-combinable daily count."""
    from blow_spark.materialize import spill_to_parquet

    e = read_table(spark, sf_dir, "events")
    daily = (
        e.where(F.col("event_type") == "error")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.count("*").cast("bigint").alias("x"))
    )
    span = daily.agg(
        F.min("day").alias("mind"), F.max("day").alias("maxd")
    )
    cal = span.select(
        F.explode(F.expr("sequence(mind, maxd, interval 1 day)")).alias("day")
    )
    # day-grain (span-bounded); spilled — the weight join reads it from
    # both sides and the output joins it again, so without this the
    # corpus daily count re-runs four times
    series = spill_to_parquet(
        cal.crossJoin(F.broadcast(span))
        .join(daily, "day", "left")
        .select(
            (F.datediff(F.col("day"), F.col("mind")) + 1)
            .cast("bigint")
            .alias("idx"),
            "day",
            F.coalesce(F.col("x"), F.lit(0)).cast("bigint").alias("x"),
        ),
        "blow_spark_es_series_",
    )
    t = series.select(F.col("idx").alias("t"))
    i = series.select(F.col("idx").alias("i"), "x")
    w = (
        t.join(i, F.col("i") <= F.col("t"))
        .select(
            "t",
            F.round(
                F.when(
                    F.col("i") == 1,
                    F.pow(F.lit(1 - _ES_ALPHA), F.col("t") - 1),
                ).otherwise(
                    F.lit(_ES_ALPHA)
                    * F.pow(F.lit(1 - _ES_ALPHA), F.col("t") - F.col("i"))
                )
                * 1_000_000_000
            )
            .cast("bigint")
            .alias("w_e9"),
            "x",
        )
    )
    sm = spill_to_parquet(
        w.groupBy("t").agg(
            F.sum(F.col("w_e9") * F.col("x")).cast("bigint").alias("s_e9")
        ),
        "blow_spark_es_sm_",
    )
    tt = series.agg(F.max("idx").cast("bigint").alias("tmax"))
    cur = sm.select(F.col("t").alias("idx"), F.col("s_e9").alias("cur_e9"))
    prev = sm.select(
        (F.col("t") + 1).alias("idx"), F.col("s_e9").alias("prev_e9")
    )
    fc = F.round(F.col("prev_e9").cast("double") / 1000).cast("bigint")
    return (
        series.join(cur, "idx")
        .join(prev, "idx")
        .crossJoin(F.broadcast(tt))
        .where(F.col("idx") > F.col("tmax") - _ES_TAIL)
        .select(
            F.col("day").cast("string").alias("day"),
            F.col("x").alias("n_events"),
            F.round(F.col("cur_e9").cast("double") / 1000)
            .cast("bigint")
            .alias("smooth_e6"),
            fc.alias("forecast_e6"),
            F.abs(F.col("x") * 1_000_000 - fc).alias("abs_err_e6"),
        )
        .orderBy("day")
    )


@register(
    "timeseries_cusum_changepoint",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS x
      FROM events WHERE event_type = 'error' GROUP BY CAST(ts AS DATE)
    ), span AS (
      SELECT MIN(day) AS mind, MAX(day) AS maxd FROM daily
    ), cal AS (
      SELECT UNNEST(generate_series(mind, maxd, INTERVAL 1 DAY))::DATE AS day
      FROM span
    ), series AS (
      SELECT c.day, COALESCE(d.x, 0) AS x
      FROM cal c LEFT JOIN daily d ON d.day = c.day
    ), mom AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(CAST(x AS HUGEINT) * x) AS DOUBLE) AS sxx
      FROM series
    ), params AS (
      SELECT n, sx,
             CAST(ROUND(CAST(sx AS DOUBLE) * 1000000 / n) AS BIGINT)
               AS target_e6,
             CAST(ROUND(4 * SQRT((sxx - CAST(sx AS DOUBLE) * sx / n) / n)
                        * 1000000) AS BIGINT) AS threshold_e6
      FROM mom
    ), dev AS (
      SELECT s.day, s.x,
             s.x * 1000000 - p.target_e6 - p.target_e6 // 2 AS d_e6,
             p.threshold_e6
      FROM series s CROSS JOIN params p
    ), pref AS (
      SELECT day, x, threshold_e6,
             CAST(SUM(d_e6) OVER (ORDER BY day
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS s_t
      FROM dev
    ), cusum AS (
      SELECT day, x, threshold_e6, s_t,
             s_t - LEAST(0, MIN(s_t) OVER (ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
               AS c_e6
      FROM pref
    )
    SELECT CAST(day AS VARCHAR) AS day, x AS n_events,
           CAST(c_e6 AS BIGINT) AS cusum_e6, threshold_e6,
           c_e6 > threshold_e6 AS in_alarm
    FROM cusum ORDER BY day
    """,
    tags=("timeseries", "changepoint", "events"),
)
def timeseries_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM changepoint detection (Page, Biometrika 1954)
    over the daily error-event series — the sequential shift detector
    next to S-H-ESD (point anomalies) and the WoW alerts (fixed-lag):
    C_t = max(0, C_{t-1} + x_t − μ − k) with slack k = μ/2, alarm when
    C_t exceeds 4σ. The clamped recurrence is de-recursed to
    C_t = S_t − min(0, min_{j≤t} S_j) over the deviation prefix sums,
    so it's two window passes, not a sequential loop.

    Engine-exact: deviations, prefix sums and the running min are pure
    e6-unit BIGINT arithmetic (target fix-points once, the slack is an
    integer halving); σ uses exact HUGEINT/DECIMAL moments with single
    deterministic casts.

    Scale: the only corpus-scale work is the daily count; the CUSUM
    windows run on the zero-filled CALENDAR series — one row per day
    of the observation span (a property of the dataset's time range,
    not its row count), the same calendar-bounded single-partition
    class as events_kaplan_meier_retention (whitelisted in
    tests/test_plan_guard.py with that justification)."""
    from pyspark.sql import Window as W

    e = read_table(spark, sf_dir, "events")
    daily = (
        e.where(F.col("event_type") == "error")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.count("*").cast("bigint").alias("x"))
    )
    span = daily.agg(F.min("day").alias("mind"), F.max("day").alias("maxd"))
    cal = span.select(
        F.explode(F.expr("sequence(mind, maxd, interval 1 day)")).alias("day")
    )
    from blow_spark.materialize import spill_to_parquet

    # day-grain; spilled — moments and the CUSUM pass both read it
    series = spill_to_parquet(
        cal.join(daily, "day", "left").select(
            "day", F.coalesce(F.col("x"), F.lit(0)).cast("bigint").alias("x")
        ),
        "blow_spark_cusum_series_",
    )
    mom = series.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum(F.col("x").cast("decimal(19,0)") * F.col("x"))
        .cast("double")
        .alias("sxx"),
    )
    params = mom.select(
        F.round(F.col("sx").cast("double") * 1_000_000 / F.col("n"))
        .cast("bigint")
        .alias("target_e6"),
        F.round(
            4
            * F.sqrt(
                (
                    F.col("sxx")
                    - F.col("sx").cast("double") * F.col("sx") / F.col("n")
                )
                / F.col("n")
            )
            * 1_000_000
        )
        .cast("bigint")
        .alias("threshold_e6"),
    )
    dev = series.crossJoin(F.broadcast(params)).select(
        "day",
        "x",
        (
            F.col("x") * 1_000_000
            - F.col("target_e6")
            - F.expr("target_e6 div 2")
        ).alias("d_e6"),
        "threshold_e6",
    )
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    pref = dev.withColumn("s_t", F.sum("d_e6").over(w).cast("bigint"))
    cusum = pref.withColumn(
        "c_e6",
        (F.col("s_t") - F.least(F.lit(0).cast("bigint"), F.min("s_t").over(w))),
    )
    return cusum.select(
        F.col("day").cast("string").alias("day"),
        F.col("x").alias("n_events"),
        F.col("c_e6").cast("bigint").alias("cusum_e6"),
        "threshold_e6",
        (F.col("c_e6") > F.col("threshold_e6")).alias("in_alarm"),
    ).orderBy("day")


# --------------------------------------------------------------------------
# Tukey fences outlier census (round 10)
# --------------------------------------------------------------------------

_TK_BUCKET = 10000  # $100 buckets (cent-integer div) — fixed price domain


@register(
    "stats_tukey_fences_outliers",
    oracle=f"""
    WITH b AS (
      SELECT c.c_mktsegment AS segment,
             CAST(ROUND(o.o_totalprice * 100) AS BIGINT) // {_TK_BUCKET} AS bkt
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ), hist AS (
      SELECT segment, bkt, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM b GROUP BY segment, bkt
    ), cum AS (
      SELECT segment, bkt, cnt,
             SUM(cnt) OVER (PARTITION BY segment ORDER BY bkt) AS c,
             SUM(cnt) OVER (PARTITION BY segment) AS n
      FROM hist
    ), q AS (
      SELECT segment, CAST(MAX(n) AS BIGINT) AS n,
             CAST(MIN(CASE WHEN 4 * c >= n THEN bkt END) AS BIGINT) AS q1_b,
             CAST(MIN(CASE WHEN 4 * c >= 3 * n THEN bkt END) AS BIGINT)
               AS q3_b
      FROM cum GROUP BY segment
    )
    SELECT q.segment, q.n, q.q1_b, q.q3_b,
           CAST(COALESCE(SUM(CASE WHEN 2 * h.bkt < 5 * q.q1_b - 3 * q.q3_b
                                  THEN h.cnt END), 0) AS BIGINT)
             AS n_low_outliers,
           CAST(COALESCE(SUM(CASE WHEN 2 * h.bkt > 5 * q.q3_b - 3 * q.q1_b
                                  THEN h.cnt END), 0) AS BIGINT)
             AS n_high_outliers
    FROM q JOIN hist h ON h.segment = q.segment
    GROUP BY q.segment, q.n, q.q1_b, q.q3_b
    ORDER BY q.segment
    """,
    tags=("stats", "outlier", "exact"),
)
def stats_tukey_fences_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey boxplot-fence outlier census per market segment (Tukey,
    EDA 1977): order totals bucketed to the fixed $100 grid, type-1
    quartiles read off the per-segment cumulative histogram (4·cum ≥ n
    and 4·cum ≥ 3n — integer inequalities, no interpolation), and the
    1.5·IQR fences applied as PURE-INTEGER inequalities — x < Q1 −
    1.5(Q3−Q1) ⟺ 2x < 5·Q1 − 3·Q3 — so the outlier counts can never
    flip on a double. The bucket DOMAIN is fixed by the price model
    (≤ ~6000 buckets), not by corpus size.

    Scale: one keyed count reduces the corpus to (segment × bucket)
    cells; the cumulative windows are partitioned by segment over the
    bounded bucket domain; the fence census re-joins the tiny histogram
    — no per-row quantile buffering anywhere (the same
    histogram-quantile discipline as orders_interpurchase_percentiles)."""
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    b = o.join(F.broadcast(c), c.c_custkey == o.o_custkey).select(
        F.col("c_mktsegment").alias("segment"),
        F.expr(
            f"CAST(ROUND(o_totalprice * 100) AS BIGINT) div {_TK_BUCKET}"
        ).alias("bkt"),
    )
    from blow_spark.materialize import spill_to_parquet

    hist = spill_to_parquet(
        b.groupBy("segment", "bkt").agg(F.count("*").cast("bigint").alias("cnt")),
        "blow_spark_tukey_hist_",
    )
    wseg = W.partitionBy("segment").orderBy("bkt")
    cum = hist.select(
        "segment",
        "bkt",
        "cnt",
        F.sum("cnt").over(wseg.rowsBetween(W.unboundedPreceding, 0)).alias("c"),
        F.sum("cnt").over(W.partitionBy("segment")).alias("n"),
    )
    q = cum.groupBy("segment").agg(
        F.max("n").cast("bigint").alias("n"),
        F.min(F.when(4 * F.col("c") >= F.col("n"), F.col("bkt")))
        .cast("bigint")
        .alias("q1_b"),
        F.min(F.when(4 * F.col("c") >= 3 * F.col("n"), F.col("bkt")))
        .cast("bigint")
        .alias("q3_b"),
    )
    return (
        q.join(hist.select("segment", "bkt", "cnt"), "segment")
        .groupBy("segment", "n", "q1_b", "q3_b")
        .agg(
            F.coalesce(
                F.sum(
                    F.when(
                        2 * F.col("bkt") < 5 * F.col("q1_b") - 3 * F.col("q3_b"),
                        F.col("cnt"),
                    )
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("n_low_outliers"),
            F.coalesce(
                F.sum(
                    F.when(
                        2 * F.col("bkt") > 5 * F.col("q3_b") - 3 * F.col("q1_b"),
                        F.col("cnt"),
                    )
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("n_high_outliers"),
        )
        .orderBy("segment")
    )


# --------------------------------------------------------------------------
# Seasonal-strength diagnostic (round 10)
# --------------------------------------------------------------------------


@register(
    "timeseries_seasonal_strength",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(dayofweek(o_orderdate) AS BIGINT) AS dow,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS x
      FROM orders GROUP BY 1, 2
    ), dowm AS (
      SELECT dow, CAST(SUM(x) AS BIGINT) AS s_d, CAST(COUNT(*) AS BIGINT)
               AS n_d
      FROM daily GROUP BY dow
    ), tot AS (
      SELECT CAST(SUM(x) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS n
      FROM daily
    ), terms AS (
      SELECT CAST(ROUND((CAST(d.x AS DOUBLE) * m.n_d - m.s_d) / m.n_d
                        / 100.0 * 10000) AS BIGINT) AS r_e4,
             CAST(ROUND((CAST(d.x AS DOUBLE) * t.n - t.s) / t.n
                        / 100.0 * 10000) AS BIGINT) AS d_e4
      FROM daily d JOIN dowm m USING (dow) CROSS JOIN tot t
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(CAST(r_e4 AS HUGEINT) * r_e4) AS VARCHAR) AS ss_resid,
           CAST(SUM(CAST(d_e4 AS HUGEINT) * d_e4) AS VARCHAR) AS ss_total,
           ROUND(1.0 - CAST(SUM(CAST(r_e4 AS HUGEINT) * r_e4) AS DOUBLE)
                       / CAST(SUM(CAST(d_e4 AS HUGEINT) * d_e4) AS DOUBLE),
                 6) AS seasonal_strength
    FROM terms
    """,
    tags=("timeseries", "stats"),
)
def timeseries_seasonal_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-strength diagnostic F_s = 1 − SS(resid)/SS(detrended)
    (Hyndman & Athanasopoulos, "Forecasting: P&P" §12 — the measure STL
    dashboards report) for the weekly cycle of daily order revenue
    under the additive day-of-week model: residual = x − dow-mean,
    detrended = x − grand mean. Both deviations are single divisions of
    exact cent integers ((x·n_d − S_d)/n_d — the n-scaled identity, no
    mean subtraction in accumulated doubles), fix-pointed at e4 dollars
    per DAY before the square-sums, which ride HUGEINT/DECIMAL so the
    whole statistic is one final division.

    Scale: the corpus reduces to the calendar-bounded day grain in one
    keyed aggregate; the 7-row DOW means and the 1-row total broadcast.
    Complements timeseries_seasonal_decompose (which emits the
    components) with the one-number strength readout."""
    o = read_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderdate").cast("date").alias("day"),
        F.dayofweek("o_orderdate").cast("bigint").alias("dow"),
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("x")
    )
    dowm = daily.groupBy("dow").agg(
        F.sum("x").cast("bigint").alias("s_d"),
        F.count("*").cast("bigint").alias("n_d"),
    )
    tot = daily.agg(
        F.sum("x").cast("bigint").alias("s"),
        F.count("*").cast("bigint").alias("n"),
    )
    terms = (
        daily.join(F.broadcast(dowm), "dow")
        .crossJoin(F.broadcast(tot))
        .select(
            F.round(
                (F.col("x").cast("double") * F.col("n_d") - F.col("s_d"))
                / F.col("n_d")
                / 100.0
                * 1e4
            )
            .cast("bigint")
            .alias("r_e4"),
            F.round(
                (F.col("x").cast("double") * F.col("n") - F.col("s"))
                / F.col("n")
                / 100.0
                * 1e4
            )
            .cast("bigint")
            .alias("d_e4"),
        )
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    return terms.agg(
        F.count("*").cast("bigint").alias("n_days"),
        F.sum(dec("r_e4") * F.col("r_e4")).cast("decimal(38,0)")
        .cast("string")
        .alias("ss_resid"),
        F.sum(dec("d_e4") * F.col("d_e4")).cast("decimal(38,0)")
        .cast("string")
        .alias("ss_total"),
        F.round(
            F.lit(1.0)
            - F.sum(dec("r_e4") * F.col("r_e4")).cast("double")
            / F.sum(dec("d_e4") * F.col("d_e4")).cast("double"),
            6,
        ).alias("seasonal_strength"),
    )


_MP_M = 7  # subsequence length (one week)
_MP_EXCL = 4  # trivial-match exclusion zone: |i - j| >= ceil(m/2) + 1


@register(
    "timeseries_matrix_profile",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS v
      FROM orders GROUP BY 1
    ), span AS (
      SELECT MIN(day) AS mind, MAX(day) AS maxd FROM daily
    ), cal AS (
      SELECT UNNEST(generate_series(mind, maxd, INTERVAL 1 DAY))::DATE AS day,
             mind
      FROM span
    ), series AS (
      SELECT DATEDIFF('day', c.mind, c.day) AS t, c.day,
             COALESCE(d.v, 0) AS v
      FROM cal c LEFT JOIN daily d ON d.day = c.day
    ), n_ AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n FROM series
    ), pairs AS (
      SELECT b.t - a.t AS d, a.t AS t, a.v AS v1, b.v AS v2
      FROM series a JOIN series b ON b.t >= a.t
    ), winsum AS (
      SELECT d, t,
             SUM(CAST(v1 AS HUGEINT) * v2) OVER w AS dot,
             SUM(CAST(v1 AS HUGEINT)) OVER w AS sa,
             COUNT(*) OVER w AS cnt
      FROM pairs
      WINDOW w AS (PARTITION BY d ORDER BY t
                   ROWS BETWEEN CURRENT ROW AND {_MP_M - 1} FOLLOWING)
    ), stats AS (
      SELECT t AS i, sa AS s1, dot AS s2,
             {_MP_M} * dot - sa * sa AS var_m2
      FROM winsum WHERE d = 0 AND cnt = {_MP_M}
    ), dists AS (
      SELECT w.t AS i, w.t + w.d AS j,
             CAST(ROUND(1000000.0 * SQRT(GREATEST(0.0,
               2.0 * {_MP_M} * (1.0
                 - CAST({_MP_M} * w.dot - si.s1 * sj.s1 AS DOUBLE)
                   / (SQRT(CAST(si.var_m2 AS DOUBLE))
                      * SQRT(CAST(sj.var_m2 AS DOUBLE)))))))
               AS BIGINT) AS dist_e6
      FROM winsum w
      JOIN stats si ON si.i = w.t
      JOIN stats sj ON sj.i = w.t + w.d
      WHERE w.d >= {_MP_EXCL} AND w.cnt = {_MP_M}
        AND si.var_m2 > 0 AND sj.var_m2 > 0
    ), sym AS (
      SELECT i, j, dist_e6 FROM dists
      UNION ALL
      SELECT j AS i, i AS j, dist_e6 FROM dists
    ), mp1 AS (
      SELECT i, MIN(dist_e6) AS mp_e6 FROM sym GROUP BY i
    ), mp AS (
      SELECT b.i, m1.mp_e6, MIN(b.j) AS nn_j
      FROM sym b JOIN mp1 m1 ON m1.i = b.i AND b.dist_e6 = m1.mp_e6
      GROUP BY 1, 2
    ), ext AS (
      SELECT MIN(mp_e6) AS lo, MAX(mp_e6) AS hi FROM mp
    )
    SELECT s.i,
           CAST(CAST(sp.mind + s.i * INTERVAL 1 DAY AS DATE) AS VARCHAR)
             AS day,
           m.mp_e6, m.nn_j,
           COALESCE(m.mp_e6 = e.lo, FALSE) AS is_motif,
           COALESCE(m.mp_e6 = e.hi, FALSE) AS is_discord
    FROM stats s
    LEFT JOIN mp m ON m.i = s.i
    CROSS JOIN ext e CROSS JOIN span sp
    ORDER BY s.i
    """,
    tags=("timeseries", "similarity", "orders"),
)
def timeseries_matrix_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matrix profile (Yeh et al., ICDM 2016) of the daily-revenue
    series: for every week-long (m=7) subsequence, the z-normalized
    Euclidean distance to its nearest non-trivial match (exclusion
    zone |i−j| < 4), the nearest neighbor's start index, and the
    global motif/discord flags — THE time-series primitive behind
    motif discovery, anomaly (discord) hunting, and shapelet mining.

    Spark-first shape — the STOMP diagonal trick (Zhu et al., ICDM
    2016) made relational: all-pairs products group by DIAGONAL
    d = j−i, and every per-pair dot product is a PARTITIONED window
    sum along its diagonal (frame = m rows ordered by i), so the
    quadratic stage is ordinary partitioned window aggregation — no
    single-partition window, no per-row Python. Per-window sums land
    exactly once from the d=0 diagonal.

    Engine-exactness: revenue stays integer cents; dots/sums are
    DECIMAL(38,0)/HUGEINT (v₁·v₂ crosses int64 already at sf0.1's
    ~3.7e9-cent days — overflow-audit headroom to sf100's 1.4e25);
    the correlation→distance conversion is one identical IEEE
    double expression per pair over those exact integers (sqrt IS
    correctly rounded by IEEE-754, unlike ln/pow), e6-rounded;
    zero-variance windows (possible in the zero-filled tails at
    sparse SFs) are excluded by the EXACT integer test m·S2−S1²=0
    and surface as NULL profile rows. Nearest-neighbor ties break
    to the smallest j in pure integer arithmetic.

    Scale: the pair count is CALENDAR-bounded (n ≈ observation days,
    invariant in row count — the fact table reduces to one row per
    day first), so the quadratic term grows with the time span, not
    the data; a decade of days is ~3.7k, 13M pairs across 3.7k
    diagonal partitions — embarrassingly parallel window sums."""
    from blow_spark.materialize import spill_to_parquet

    m = _MP_M
    o = read_table(spark, sf_dir, "orders")
    daily = (
        o.groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("v")
        )
    )
    span = daily.agg(
        F.min("day").alias("mind"), F.max("day").alias("maxd")
    )
    cal = span.select(
        "mind",
        F.explode(
            F.sequence("mind", "maxd", F.expr("interval 1 day"))
        ).alias("day"),
    )
    series = spill_to_parquet(
        cal.join(daily, "day", "left").select(
            F.datediff("day", "mind").cast("bigint").alias("t"),
            "day",
            F.coalesce("v", F.lit(0)).cast("bigint").alias("v"),
        ),
        "blow_spark_mp_",
    )
    a = series.select(F.col("t").alias("ta"), F.col("v").alias("v1"))
    b = series.select(F.col("t").alias("tb"), F.col("v").alias("v2"))
    pairs = a.join(F.broadcast(b), F.col("tb") >= F.col("ta")).select(
        (F.col("tb") - F.col("ta")).alias("d"),
        F.col("ta").alias("t"),
        "v1",
        "v2",
    )
    d38 = "decimal(38,0)"
    w = W.partitionBy("d").orderBy("t").rowsBetween(0, m - 1)
    winsum = pairs.select(
        "d",
        "t",
        F.sum((F.col("v1").cast(d38) * F.col("v2"))).over(w).alias("dot"),
        F.sum(F.col("v1").cast(d38)).over(w).alias("sa"),
        F.count("*").over(w).alias("cnt"),
    )
    stats = spill_to_parquet(
        winsum.where((F.col("d") == 0) & (F.col("cnt") == m)).select(
            F.col("t").alias("i"),
            F.col("sa").alias("s1"),
            F.col("dot").alias("s2"),
            (F.lit(m) * F.col("dot") - F.col("sa") * F.col("sa")).alias(
                "var_m2"
            ),
        ),
        "blow_spark_mp_stats_",
    )
    si = stats.select(
        F.col("i").alias("ii"),
        F.col("s1").alias("s1i"),
        F.col("var_m2").alias("vari"),
    )
    sj = stats.select(
        F.col("i").alias("jj"),
        F.col("s1").alias("s1j"),
        F.col("var_m2").alias("varj"),
    )
    rho_num = (F.lit(m) * F.col("dot") - F.col("s1i") * F.col("s1j")).cast(
        "double"
    )
    den = F.sqrt(F.col("vari").cast("double")) * F.sqrt(
        F.col("varj").cast("double")
    )
    dist_e6 = (
        F.round(
            1000000.0
            * F.sqrt(
                F.greatest(
                    F.lit(0.0), 2.0 * m * (F.lit(1.0) - rho_num / den)
                )
            )
        )
        .cast("bigint")
        .alias("dist_e6")
    )
    dists = spill_to_parquet(
        winsum.where((F.col("d") >= _MP_EXCL) & (F.col("cnt") == m))
        .join(F.broadcast(si), F.col("ii") == F.col("t"))
        .join(F.broadcast(sj), F.col("jj") == F.col("t") + F.col("d"))
        .where((F.col("vari") > 0) & (F.col("varj") > 0))
        .select(
            F.col("t").alias("i"), (F.col("t") + F.col("d")).alias("j"), dist_e6
        ),
        "blow_spark_mp_dists_",
    )
    both = dists.unionByName(
        dists.select(
            F.col("j").alias("i"), F.col("i").alias("j"), "dist_e6"
        )
    )
    mp = both.groupBy("i").agg(
        F.min(F.struct("dist_e6", "j")).alias("mn")
    ).select(
        "i",
        F.col("mn.dist_e6").alias("mp_e6"),
        F.col("mn.j").alias("nn_j"),
    )
    ext = mp.agg(
        F.min("mp_e6").alias("lo"), F.max("mp_e6").alias("hi")
    )
    return (
        stats.select("i")
        .join(mp, "i", "left")
        .crossJoin(F.broadcast(ext))
        .crossJoin(F.broadcast(span.select("mind")))
        .select(
            "i",
            F.date_add("mind", F.col("i").cast("int"))
            .cast("string")
            .alias("day"),
            "mp_e6",
            "nn_j",
            F.coalesce(F.col("mp_e6") == F.col("lo"), F.lit(False)).alias(
                "is_motif"
            ),
            F.coalesce(F.col("mp_e6") == F.col("hi"), F.lit(False)).alias(
                "is_discord"
            ),
        )
        .orderBy("i")
    )
