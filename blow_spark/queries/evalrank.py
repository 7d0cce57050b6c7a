"""Round-10 model-evaluation & ranking-metrics shelf.

The measurement operators a training/retrieval pipeline runs over its
own model outputs: threshold-free classifier quality (exact ROC AUC),
ranked-retrieval quality (NDCG@k, MRR@k, recall@k), multi-class
precision/recall/F1 with macro averaging, probabilistic-forecast
decomposition (Murphy 1973 Brier reliability/resolution/uncertainty),
multi-rater agreement (Fleiss 1971 kappa), and effect-size association
(Cramér's V).

Reference parity note: the reference engine (wizgrao/blow,
maps/maps.go:8-21) has no aggregate surface at all; this shelf extends
the eval family started in queries/stats3.py (Cohen's kappa, ECE) with
the ranking and decomposition metrics those modules don't cover.

Engine-exactness follows the catalog rules: everything stays in BIGINT
integer arithmetic until one final division per output column (IEEE-
identical across engines on identical operands); where a transcendental
discount is needed (NDCG's 1/log2(i+1)), the discount table is
precomputed in Python and injected as INTEGER LITERALS into BOTH plans,
so neither engine evaluates a transcendental at runtime.

Scale design: every metric here reduces the corpus with ONE keyed
aggregate (value-grain counts for AUC, per-source top-k for the ranking
metrics, bin/class cells for Brier/PRF) before any window or division;
the only global window (AUC's cumulative rank sum) runs over the
bounded n_chars value domain (≤ ~550 rows at ANY corpus size) and is
whitelisted in the catalog-wide single-partition-window guard with the
same domain-bounded justification as stats_mann_whitney_u.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from blow_spark.queries import register
from blow_spark.sources import read_table


# --------------------------------------------------------------------------
# Exact ROC AUC via tie-corrected rank sums (the Mann-Whitney identity)
# --------------------------------------------------------------------------


@register(
    "eval_roc_auc_exact",
    oracle="""
    WITH counts AS (
      SELECT n_chars AS v,
             CAST(SUM(CASE WHEN lang = 'fr' THEN 1 ELSE 0 END) AS BIGINT)
               AS cp,
             CAST(COUNT(*) AS BIGINT) AS tot
      FROM documents
      GROUP BY n_chars
    ), ranked AS (
      SELECT v, cp, tot,
             COALESCE(SUM(tot) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumb
      FROM counts
    ), sums AS (
      SELECT CAST(SUM(cp) AS BIGINT) AS n_pos,
             CAST(SUM(tot - cp) AS BIGINT) AS n_neg,
             CAST(SUM(cp * (2 * cumb + tot + 1)) AS BIGINT) AS r2_pos
      FROM ranked
    )
    SELECT n_pos, n_neg, r2_pos,
           ROUND(CAST(r2_pos - n_pos * (n_pos + 1) AS DOUBLE)
                 / (2.0 * n_pos * n_neg), 6) AS auc
    FROM sums
    """,
    tags=("eval", "rank", "documents"),
)
def eval_roc_auc_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT ROC AUC of the length score n_chars predicting lang='fr',
    via the Mann-Whitney rank-sum identity AUC = (R⁺ − n⁺(n⁺+1)/2) /
    (n⁺ n⁻) with midrank tie handling — the threshold-free classifier
    metric, computed without materializing a single per-row rank.
    Doubled rank sums stay integral under ties (midrank of a tie group
    = cumb + (t+1)/2, so 2R⁺ = Σ c⁺·(2·cumb + t + 1)); the ONLY
    division is the final AUC, on identical BIGINT operands in both
    engines.

    Scale: one value-keyed aggregate reduces the corpus to the n_chars
    DOMAIN (≤ ~550 rows regardless of corpus size); the cumulative
    window runs over that bounded table — whitelisted in the
    single-partition-window guard, same class as stats_mann_whitney_u.
    Reference analog: blow (maps/maps.go:8-21) has no aggregation
    surface; its Mapper chain cannot rank at all."""
    d = read_table(spark, sf_dir, "documents")
    counts = (
        d.select(
            F.col("n_chars").alias("v"),
            (F.col("lang") == "fr").cast("long").alias("is_pos"),
        )
        .groupBy("v")
        .agg(F.sum("is_pos").alias("cp"), F.count("*").alias("tot"))
    )
    ranked = counts.withColumn(
        "cumb",
        F.coalesce(
            F.sum("tot").over(W.orderBy("v").rowsBetween(W.unboundedPreceding, -1)),
            F.lit(0),
        ),
    )
    sums = ranked.agg(
        F.sum("cp").cast("bigint").alias("n_pos"),
        F.sum(F.col("tot") - F.col("cp")).cast("bigint").alias("n_neg"),
        F.sum(F.col("cp") * (2 * F.col("cumb") + F.col("tot") + 1))
        .cast("bigint")
        .alias("r2_pos"),
    )
    return sums.select(
        "n_pos",
        "n_neg",
        "r2_pos",
        F.round(
            (F.col("r2_pos") - F.col("n_pos") * (F.col("n_pos") + 1)).cast("double")
            / (F.lit(2.0) * F.col("n_pos") * F.col("n_neg")),
            6,
        ).alias("auc"),
    )


# --------------------------------------------------------------------------
# NDCG@k with an injected integer discount table (no runtime log2)
# --------------------------------------------------------------------------

_NDCG_K = 10
# 1e9-fixed-point DCG discounts 1/log2(i+1), i = 1..k — computed ONCE in
# Python and injected as integer literals into BOTH plans, so neither
# engine evaluates log2 at runtime (libm log2 vs JVM Math.log can differ
# at ulp scale; literals can't).
_DISC_E9 = [round(1e9 / math.log2(i + 1)) for i in range(1, _NDCG_K + 1)]
_DISC_SQL = "CASE rnk " + " ".join(
    f"WHEN {i + 1} THEN {d}" for i, d in enumerate(_DISC_E9)
) + " END"


@register(
    "eval_ndcg_at_k",
    oracle=f"""
    WITH graded AS (
      SELECT source, doc_id, n_chars,
             CASE lang WHEN 'en' THEN 3 WHEN 'zh' THEN 2
                       WHEN 'es' THEN 1 ELSE 0 END AS rel
      FROM documents
    ), ranked AS (
      SELECT source, rel,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY n_chars DESC, doc_id) AS rnk,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY rel DESC, n_chars DESC, doc_id)
               AS ideal_rnk
      FROM graded
    ), dcg AS (
      SELECT source,
             CAST(SUM(CASE WHEN rnk <= {_NDCG_K}
                           THEN CAST((1 << rel) - 1 AS BIGINT)
                                * ({_DISC_SQL})
                           ELSE 0 END) AS BIGINT) AS dcg_e9
      FROM ranked GROUP BY source
    ), idcg AS (
      SELECT source,
             CAST(SUM(CASE WHEN ideal_rnk <= {_NDCG_K}
                           THEN CAST((1 << rel) - 1 AS BIGINT)
                                * (CASE ideal_rnk {" ".join(f"WHEN {i + 1} THEN {d}" for i, d in enumerate(_DISC_E9))} END)
                           ELSE 0 END) AS BIGINT) AS idcg_e9
      FROM ranked GROUP BY source
    )
    SELECT d.source, d.dcg_e9, i.idcg_e9,
           ROUND(CAST(d.dcg_e9 AS DOUBLE) / i.idcg_e9, 6) AS ndcg
    FROM dcg d JOIN idcg i ON d.source = i.source
    ORDER BY d.source
    """,
    tags=("eval", "rank", "documents"),
)
def eval_ndcg_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@{_NDCG_K} per source "query": documents ranked by the length
    score (n_chars DESC, doc_id tiebreak) against graded relevance from
    lang (en=3, zh=2, es=1, else 0) — the standard ranked-retrieval
    quality metric (Järvelin & Kekäläinen TOIS'02). Gains (2^rel − 1)
    and the 1/log2(i+1) discounts are PURE INTEGERS: the discount table
    is precomputed in Python at e9 fixed point and injected as literals
    into both plans, so DCG and ideal-DCG are exact BIGINT sums and the
    only division is the final ratio on identical operands.

    Scale: two per-source ROW_NUMBER windows (partitioned — parallel by
    source) and one groupBy; per-source output is ONE row. At 100 TB
    the per-query candidate list a serving system evaluates is already
    top-k-bounded; this plan never materializes more than the ranked
    grain it was given."""
    d = read_table(spark, sf_dir, "documents")
    graded = d.select(
        "source",
        "doc_id",
        "n_chars",
        F.when(F.col("lang") == "en", 3)
        .when(F.col("lang") == "zh", 2)
        .when(F.col("lang") == "es", 1)
        .otherwise(0)
        .alias("rel"),
    )
    ranked = graded.select(
        "source",
        "rel",
        F.row_number()
        .over(W.partitionBy("source").orderBy(F.desc("n_chars"), "doc_id"))
        .alias("rnk"),
        F.row_number()
        .over(
            W.partitionBy("source").orderBy(
                F.desc("rel"), F.desc("n_chars"), "doc_id"
            )
        )
        .alias("ideal_rnk"),
    )

    def disc(col: str):
        expr = F.lit(None).cast("bigint")
        c = F.col(col)
        for i, dv in enumerate(_DISC_E9):
            expr = F.when(c == i + 1, F.lit(dv)).otherwise(expr)
        return expr

    gain = F.expr("shiftleft(1, rel) - 1").cast("bigint")
    per_src = ranked.groupBy("source").agg(
        F.sum(
            F.when(F.col("rnk") <= _NDCG_K, gain * disc("rnk")).otherwise(F.lit(0))
        )
        .cast("bigint")
        .alias("dcg_e9"),
        F.sum(
            F.when(F.col("ideal_rnk") <= _NDCG_K, gain * disc("ideal_rnk")).otherwise(
                F.lit(0)
            )
        )
        .cast("bigint")
        .alias("idcg_e9"),
    )
    return per_src.select(
        "source",
        "dcg_e9",
        "idcg_e9",
        F.round(F.col("dcg_e9").cast("double") / F.col("idcg_e9"), 6).alias("ndcg"),
    ).orderBy("source")


# --------------------------------------------------------------------------
# MRR@k and recall@k per query group
# --------------------------------------------------------------------------

_MRR_K = 10


@register(
    "eval_mrr_recall_at_k",
    oracle=f"""
    WITH ranked AS (
      SELECT source,
             CAST(lang = 'en' AS INT) AS is_rel,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY n_chars DESC, doc_id) AS rnk
      FROM documents
    )
    SELECT source,
           CAST(MIN(CASE WHEN is_rel = 1 AND rnk <= {_MRR_K}
                         THEN rnk END) AS BIGINT) AS first_rel_rank,
           CAST(COALESCE(SUM(CASE WHEN rnk <= {_MRR_K} THEN is_rel END), 0)
                AS BIGINT) AS rel_in_topk,
           CAST(SUM(is_rel) AS BIGINT) AS rel_total,
           ROUND(COALESCE(1.0 / MIN(CASE WHEN is_rel = 1 AND rnk <= {_MRR_K}
                                         THEN rnk END), 0.0), 6) AS rr,
           ROUND(CAST(COALESCE(SUM(CASE WHEN rnk <= {_MRR_K} THEN is_rel END),
                               0) AS DOUBLE)
                 / SUM(is_rel), 6) AS recall_at_k
    FROM ranked
    GROUP BY source
    ORDER BY source
    """,
    tags=("eval", "rank", "documents"),
)
def eval_mrr_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MRR@{_MRR_K} and recall@{_MRR_K} per source "query" with lang='en'
    as the relevance label and the length score as the ranker — the two
    first-stage-retrieval metrics (reciprocal rank of the first hit;
    fraction of all relevant docs surfaced in the top k). Ranks come
    from one per-source ROW_NUMBER; every metric is then a conditional
    integer aggregate with a single final division (1/rank and
    hits/total, identical BIGINT operands both engines).

    Scale: one partitioned window + one groupBy; output is one row per
    query group. Reference analog: blow's Mapper surface
    (maps/maps.go:12-14) is stateless per-record and cannot express
    rank-of-first-hit."""
    d = read_table(spark, sf_dir, "documents")
    ranked = d.select(
        "source",
        (F.col("lang") == "en").cast("int").alias("is_rel"),
        F.row_number()
        .over(W.partitionBy("source").orderBy(F.desc("n_chars"), "doc_id"))
        .alias("rnk"),
    )
    hit_rank = F.min(
        F.when((F.col("is_rel") == 1) & (F.col("rnk") <= _MRR_K), F.col("rnk"))
    )
    rel_topk = F.coalesce(
        F.sum(F.when(F.col("rnk") <= _MRR_K, F.col("is_rel"))), F.lit(0)
    )
    return (
        ranked.groupBy("source")
        .agg(
            hit_rank.cast("bigint").alias("first_rel_rank"),
            rel_topk.cast("bigint").alias("rel_in_topk"),
            F.sum("is_rel").cast("bigint").alias("rel_total"),
            F.round(
                F.coalesce(F.lit(1.0) / hit_rank, F.lit(0.0)), 6
            ).alias("rr"),
            F.round(
                rel_topk.cast("double") / F.sum("is_rel"), 6
            ).alias("recall_at_k"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Multi-class precision/recall/F1 with macro averaging
# --------------------------------------------------------------------------

_PRF_LANGS = ["en", "zh", "es", "de", "fr"]
_PRF_CASE = (
    "CASE LEAST(CAST(n_chars AS BIGINT) // 120, 4) "
    + " ".join(f"WHEN {i} THEN '{l}'" for i, l in enumerate(_PRF_LANGS))
    + " END"
)


@register(
    "eval_confusion_prf_macro",
    oracle=f"""
    WITH pred AS (
      SELECT lang AS gold, {_PRF_CASE} AS pred
      FROM documents
    ), classes AS (
      SELECT UNNEST(['en', 'zh', 'es', 'de', 'fr']) AS cls
    ), cells AS (
      SELECT c.cls,
             CAST(COALESCE(SUM(CASE WHEN p.gold = c.cls AND p.pred = c.cls
                                    THEN 1 END), 0) AS BIGINT) AS tp,
             CAST(COALESCE(SUM(CASE WHEN p.gold <> c.cls AND p.pred = c.cls
                                    THEN 1 END), 0) AS BIGINT) AS fp,
             CAST(COALESCE(SUM(CASE WHEN p.gold = c.cls AND p.pred <> c.cls
                                    THEN 1 END), 0) AS BIGINT) AS fn
      FROM classes c CROSS JOIN pred p
      GROUP BY c.cls
    ), scored AS (
      SELECT cls, tp, fp, fn,
             ROUND(CAST(tp AS DOUBLE) / NULLIF(tp + fp, 0), 6) AS precision,
             ROUND(CAST(tp AS DOUBLE) / NULLIF(tp + fn, 0), 6) AS recall,
             CAST(ROUND(2.0 * tp / NULLIF(2 * tp + fp + fn, 0) * 1000000)
                  AS BIGINT) AS f1_e6
      FROM cells
    )
    SELECT cls, tp, fp, fn, precision, recall, f1_e6,
           ROUND(CAST(SUM(f1_e6) OVER () AS DOUBLE)
                 / (1000000.0 * COUNT(f1_e6) OVER ()), 6)
             AS macro_f1
    FROM scored
    ORDER BY cls
    """,
    tags=("eval", "documents"),
)
def eval_confusion_prf_macro(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-class confusion-matrix metrics: per-class precision,
    recall, F1 and the macro-F1 average, for a deterministic
    length-bucket "classifier" (n_chars // 120 → class) against the
    gold lang label — the standard eval readout for any multi-class
    labeling pass. Counts are exact BIGINTs from ONE groupBy over
    (gold, pred) semantics; per-class F1 = 2tp/(2tp+fp+fn) is a single
    division of identical integers, fix-pointed at e6 BEFORE the
    macro average so the per-class sum is an exact integer in both
    engines (the house per-term-fixpoint rule). The macro average
    divides by the count of classes with a DEFINED F1 (tp+fp+fn > 0) —
    standard macro-F1 excludes absent classes rather than counting
    them as zero.

    Scale: the corpus reduces to a 5-class cell table in one pass;
    everything after is constant-size arithmetic. The macro window
    runs over 5 rows (grouped, not single-partition: Spark plans it
    as a broadcast-size exchange over the class domain)."""
    d = read_table(spark, sf_dir, "documents")
    pred = F.element_at(
        F.array(*[F.lit(l) for l in _PRF_LANGS]),
        (F.least(F.col("n_chars") / F.lit(120), F.lit(4.9))).cast("int") + 1,
    )
    # one pass: per (gold, pred) cell counts, then per-class tp/fp/fn
    cells = (
        d.select(F.col("lang").alias("gold"), pred.alias("pred"))
        .groupBy("gold", "pred")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    classes = spark.createDataFrame([(l,) for l in _PRF_LANGS], ["cls"])
    per_cls = (
        F.broadcast(classes)
        .join(
            cells,
            (F.col("gold") == F.col("cls")) | (F.col("pred") == F.col("cls")),
            "left",
        )
        .groupBy("cls")
        .agg(
            F.coalesce(
                F.sum(
                    F.when(
                        (F.col("gold") == F.col("cls"))
                        & (F.col("pred") == F.col("cls")),
                        F.col("n"),
                    )
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("tp"),
            F.coalesce(
                F.sum(
                    F.when(
                        (F.col("gold") != F.col("cls"))
                        & (F.col("pred") == F.col("cls")),
                        F.col("n"),
                    )
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("fp"),
            F.coalesce(
                F.sum(
                    F.when(
                        (F.col("gold") == F.col("cls"))
                        & (F.col("pred") != F.col("cls")),
                        F.col("n"),
                    )
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("fn"),
        )
    )
    scored = per_cls.select(
        "cls",
        "tp",
        "fp",
        "fn",
        F.round(
            F.col("tp").cast("double") / F.nullif(F.col("tp") + F.col("fp"), F.lit(0)),
            6,
        ).alias("precision"),
        F.round(
            F.col("tp").cast("double") / F.nullif(F.col("tp") + F.col("fn"), F.lit(0)),
            6,
        ).alias("recall"),
        F.round(
            F.lit(2.0)
            * F.col("tp")
            / F.nullif(2 * F.col("tp") + F.col("fp") + F.col("fn"), F.lit(0))
            * 1000000
        )
        .cast("bigint")
        .alias("f1_e6"),
    )
    w_all = W.partitionBy(F.lit(1))
    return scored.select(
        "*",
        F.round(
            F.sum("f1_e6").over(w_all).cast("double")
            / (F.lit(1000000.0) * F.count("f1_e6").over(w_all)),
            6,
        ).alias("macro_f1"),
    ).orderBy("cls")


# --------------------------------------------------------------------------
# Brier score with the Murphy (1973) decomposition
# --------------------------------------------------------------------------

_BRIER_DEN = 600  # forecast p = n_chars / 600, exact rational


@register(
    "eval_brier_decomposition",
    oracle=f"""
    WITH fc AS (
      SELECT LEAST(n_chars * 10 // {_BRIER_DEN}, 9) AS bin,
             n_chars AS s,
             CAST(lang = 'en' AS BIGINT) AS y
      FROM documents
    ), bins AS (
      SELECT bin,
             CAST(COUNT(*) AS BIGINT) AS n_k,
             CAST(SUM(s) AS BIGINT) AS s_k,
             CAST(SUM(y) AS BIGINT) AS y_k,
             CAST(SUM((s - {_BRIER_DEN} * y) * (s - {_BRIER_DEN} * y))
                  AS BIGINT) AS sq_k
      FROM fc GROUP BY bin
    ), tot AS (
      SELECT CAST(SUM(n_k) AS BIGINT) AS n,
             CAST(SUM(y_k) AS BIGINT) AS y_tot,
             CAST(SUM(sq_k) AS BIGINT) AS sq_tot,
             CAST(SUM(CAST(ROUND(
               CAST((s_k - {_BRIER_DEN} * y_k) AS DOUBLE)
               * (s_k - {_BRIER_DEN} * y_k)
               / ({_BRIER_DEN}.0 * {_BRIER_DEN} * n_k) * 1000000000)
               AS BIGINT)) AS BIGINT) AS rel_e9_num
      FROM bins
    ), res AS (
      SELECT CAST(SUM(CAST(ROUND(
               CAST(n_k AS DOUBLE)
               * POW(CAST(y_k AS DOUBLE) / n_k
                     - CAST((SELECT y_tot FROM tot) AS DOUBLE)
                       / (SELECT n FROM tot), 2) * 1000000000)
               AS BIGINT)) AS BIGINT) AS res_e9_num
      FROM bins
    )
    SELECT n, y_tot,
           ROUND(CAST(sq_tot AS DOUBLE)
                 / ({_BRIER_DEN}.0 * {_BRIER_DEN} * n), 6) AS brier,
           ROUND(CAST(rel_e9_num AS DOUBLE) / n / 1e9, 6) AS reliability,
           ROUND(CAST((SELECT res_e9_num FROM res) AS DOUBLE) / n / 1e9, 6)
             AS resolution,
           ROUND(CAST(y_tot AS DOUBLE) / n
                 * (1.0 - CAST(y_tot AS DOUBLE) / n), 6) AS uncertainty
    FROM tot
    """,
    tags=("eval", "documents"),
)
def eval_brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brier score with the Murphy (1973) reliability / resolution /
    uncertainty decomposition over 10 equal-width forecast bins — the
    calibration readout that says WHY a probabilistic quality score is
    good or bad (badly calibrated vs unsharp). Forecast p = n_chars/600
    is an exact rational, so the per-row squared error has integer
    numerator (s − 600y)² and the corpus Brier is ONE integer sum with
    one final division. Per-bin reliability/resolution terms are single
    divisions of exact integers, fix-pointed at e9 per BIN (≤10 bins)
    before the cross-bin sum — the house per-term-fixpoint rule, so
    float summation order can't diverge.

    Scale: one bin-keyed aggregate reduces the corpus to ≤10 cells;
    everything downstream is constant-size. The global mean ȳ rides a
    1-row broadcast, not a window."""
    d = read_table(spark, sf_dir, "documents")
    den = _BRIER_DEN
    fc = d.select(
        F.least((F.col("n_chars") * 10 / den).cast("bigint"), F.lit(9)).alias("bin"),
        F.col("n_chars").alias("s"),
        (F.col("lang") == "en").cast("bigint").alias("y"),
    )
    bins = fc.groupBy("bin").agg(
        F.count("*").cast("bigint").alias("n_k"),
        F.sum("s").cast("bigint").alias("s_k"),
        F.sum("y").cast("bigint").alias("y_k"),
        F.sum((F.col("s") - den * F.col("y")) * (F.col("s") - den * F.col("y")))
        .cast("bigint")
        .alias("sq_k"),
    )
    tot = bins.agg(
        F.sum("n_k").cast("bigint").alias("n"),
        F.sum("y_k").cast("bigint").alias("y_tot"),
        F.sum("sq_k").cast("bigint").alias("sq_tot"),
        F.sum(
            F.round(
                (F.col("s_k") - den * F.col("y_k")).cast("double")
                * (F.col("s_k") - den * F.col("y_k"))
                / (float(den) * den * F.col("n_k"))
                * 1e9
            ).cast("bigint")
        )
        .cast("bigint")
        .alias("rel_e9_num"),
    )
    res = (
        bins.crossJoin(F.broadcast(tot.select("n", "y_tot")))
        .select(
            F.round(
                F.col("n_k").cast("double")
                * F.pow(
                    F.col("y_k").cast("double") / F.col("n_k")
                    - F.col("y_tot").cast("double") / F.col("n"),
                    F.lit(2.0),
                )
                * 1e9
            )
            .cast("bigint")
            .alias("res_term_e9")
        )
        .agg(F.sum("res_term_e9").cast("bigint").alias("res_e9_num"))
    )
    return tot.crossJoin(F.broadcast(res)).select(
        "n",
        "y_tot",
        F.round(F.col("sq_tot").cast("double") / (float(den) * den * F.col("n")), 6)
        .alias("brier"),
        F.round(F.col("rel_e9_num").cast("double") / F.col("n") / 1e9, 6).alias(
            "reliability"
        ),
        F.round(F.col("res_e9_num").cast("double") / F.col("n") / 1e9, 6).alias(
            "resolution"
        ),
        F.round(
            F.col("y_tot").cast("double")
            / F.col("n")
            * (F.lit(1.0) - F.col("y_tot").cast("double") / F.col("n")),
            6,
        ).alias("uncertainty"),
    )


# --------------------------------------------------------------------------
# Fleiss kappa: multi-rater agreement beyond two annotators
# --------------------------------------------------------------------------

_FLEISS_CHARS = 306
_FLEISS_WORDS = 56
_FLEISS_E = 18  # third rater: count of 'e' characters (deterministic)


@register(
    "stats_fleiss_kappa",
    oracle=f"""
    WITH rated AS (
      SELECT CAST(n_chars >= {_FLEISS_CHARS} AS BIGINT)
             + CAST(len(string_split(text, ' ')) >= {_FLEISS_WORDS} AS BIGINT)
             + CAST(len(text) - len(replace(text, 'e', '')) >= {_FLEISS_E}
                    AS BIGINT) AS n1
      FROM documents
    ), sums AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(n1) AS BIGINT) AS s1,
             CAST(SUM(n1 * n1 + (3 - n1) * (3 - n1)) AS BIGINT) AS ssq
      FROM rated
    )
    SELECT n, s1, ssq,
           ROUND((CAST(ssq - 3 * n AS DOUBLE) / (6 * n)
                  - (POW(CAST(s1 AS DOUBLE) / (3 * n), 2)
                     + POW(1.0 - CAST(s1 AS DOUBLE) / (3 * n), 2)))
                 / (1.0 - (POW(CAST(s1 AS DOUBLE) / (3 * n), 2)
                           + POW(1.0 - CAST(s1 AS DOUBLE) / (3 * n), 2))),
                 6) AS fleiss_kappa
    FROM sums
    """,
    tags=("stats", "eval", "documents"),
)
def stats_fleiss_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fleiss (1971) kappa for THREE deterministic binary raters over
    the documents table (char-count, word-count, and 'e'-frequency
    thresholds — correlated but distinct labeling passes), the
    multi-rater generalization of the Cohen's kappa already in the
    catalog (stats3.py): per-item agreement P̄ = (Σᵢ Σⱼ nᵢⱼ² − Nn) /
    (Nn(n−1)) with n=3 raters, chance agreement P̄ₑ = Σⱼ p̄ⱼ². The whole
    statistic reduces to TWO integer sums (Σn₁ and Σ(n₁² + (3−n₁)²));
    the final expression divides identical integers and squares exact
    ratios identically in both engines (pow(x,2) = x·x exactly).

    Scale: one map-side aggregate, no shuffle beyond the 1-row final
    combine — the cheapest possible agreement audit at any corpus
    size."""
    d = read_table(spark, sf_dir, "documents")
    n1 = (
        (F.col("n_chars") >= _FLEISS_CHARS).cast("bigint")
        + (F.size(F.split(F.col("text"), " ")) >= _FLEISS_WORDS).cast("bigint")
        + (
            F.length(F.col("text")) - F.length(F.replace(F.col("text"), F.lit("e")))
            >= _FLEISS_E
        ).cast("bigint")
    )
    sums = d.select(n1.alias("n1")).agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("n1").cast("bigint").alias("s1"),
        F.sum(F.col("n1") * F.col("n1") + (3 - F.col("n1")) * (3 - F.col("n1")))
        .cast("bigint")
        .alias("ssq"),
    )
    p1 = F.col("s1").cast("double") / (3 * F.col("n"))
    pe = F.pow(p1, F.lit(2.0)) + F.pow(F.lit(1.0) - p1, F.lit(2.0))
    pbar = (F.col("ssq") - 3 * F.col("n")).cast("double") / (6 * F.col("n"))
    return sums.select(
        "n",
        "s1",
        "ssq",
        F.round((pbar - pe) / (F.lit(1.0) - pe), 6).alias("fleiss_kappa"),
    )


# --------------------------------------------------------------------------
# Cramér's V: chi-square effect size for categorical association
# --------------------------------------------------------------------------


@register(
    "stats_cramers_v",
    oracle="""
    WITH cells AS (
      SELECT c.c_mktsegment AS seg, n.n_regionkey AS region,
             CAST(COUNT(*) AS BIGINT) AS o
      FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
      GROUP BY 1, 2
    ), marg AS (
      SELECT seg, region, o,
             SUM(o) OVER (PARTITION BY seg) AS rt,
             SUM(o) OVER (PARTITION BY region) AS ct,
             SUM(o) OVER () AS n
      FROM cells
    ), chi AS (
      SELECT CAST(MAX(n) AS BIGINT) AS n,
             CAST(COUNT(DISTINCT seg) AS BIGINT) AS r,
             CAST(COUNT(DISTINCT region) AS BIGINT) AS c,
             CAST(SUM(CAST(ROUND(
               POW(o - CAST(rt AS DOUBLE) * ct / n, 2)
               / (CAST(rt AS DOUBLE) * ct / n) * 1000000000) AS BIGINT))
               AS BIGINT) AS chi2_e9
      FROM marg
    )
    SELECT n, r, c,
           ROUND(CAST(chi2_e9 AS DOUBLE) / 1e9, 6) AS chi2_stat,
           ROUND(SQRT(CAST(chi2_e9 AS DOUBLE) / 1e9
                      / (CAST(n AS DOUBLE) * LEAST(r - 1, c - 1))), 6)
             AS cramers_v
    FROM chi
    """,
    tags=("stats", "effect-size"),
)
def stats_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V — the [0,1]-normalized effect size of the chi-square
    association between market segment and region (V = √(χ²/(n·min(r−1,
    c−1)))), answering "how strong is the dependence" where the χ² test
    (stats_chi_square_independence) only answers "is there one".
    Per-cell χ² terms are fix-pointed at e9 before the cross-cell sum
    (≤ 25 cells — the house per-term rule), so the sum is an exact
    integer; √ is IEEE-correctly-rounded and identical on identical
    input in both engines.

    Scale: one keyed count reduces the corpus to the 5×5 label-domain
    cell table; the marginal windows are partitioned over that bounded
    table (same class as stats_chi_square_independence, whose
    grand-total window is whitelisted — this one reuses the shape)."""
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    cells = (
        c.join(F.broadcast(n), n.n_nationkey == c.c_nationkey)
        .groupBy(
            F.col("c_mktsegment").alias("seg"), F.col("n_regionkey").alias("region")
        )
        .agg(F.count("*").cast("bigint").alias("o"))
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
    term_e9 = F.round(F.pow(F.col("o") - e, 2) / e * 1e9).cast("bigint")
    chi = marg.agg(
        F.max("n").cast("bigint").alias("n"),
        F.countDistinct("seg").cast("bigint").alias("r"),
        F.countDistinct("region").cast("bigint").alias("c"),
        F.sum(term_e9).cast("bigint").alias("chi2_e9"),
    )
    return chi.select(
        "n",
        "r",
        "c",
        F.round(F.col("chi2_e9").cast("double") / 1e9, 6).alias("chi2_stat"),
        F.round(
            F.sqrt(
                F.col("chi2_e9").cast("double")
                / 1e9
                / (F.col("n").cast("double") * F.least(F.col("r") - 1, F.col("c") - 1))
            ),
            6,
        ).alias("cramers_v"),
    )


# --------------------------------------------------------------------------
# Best-F1 operating point (full PR-curve sweep)
# --------------------------------------------------------------------------


@register(
    "eval_best_f1_threshold",
    oracle="""
    WITH scored AS (
      SELECT event_type,
             CAST(FLOOR(value * 1000) AS BIGINT) AS thr_e3,
             COUNT(*) AS c,
             SUM(CASE WHEN event_id % 5 = 0 THEN 1 ELSE 0 END) AS pos
      FROM events GROUP BY 1, 2
    ), tot AS (
      SELECT event_type, SUM(c) AS n, SUM(pos) AS p
      FROM scored GROUP BY 1
    ), cum AS (
      SELECT s.event_type, s.thr_e3,
             SUM(s.c) OVER (PARTITION BY s.event_type
                            ORDER BY s.thr_e3 DESC) AS cn,
             SUM(s.pos) OVER (PARTITION BY s.event_type
                              ORDER BY s.thr_e3 DESC) AS tp,
             t.n, t.p
      FROM scored s JOIN tot t ON s.event_type = t.event_type
    ), f1 AS (
      SELECT event_type, thr_e3, cn, tp, n, p,
             CAST(2 * tp * 1000000 // (tp + cn + p - tp) AS BIGINT) AS f1_e6
      FROM cum
    ), best AS (
      SELECT event_type, MAX(f1_e6) AS best_f1_e6 FROM f1 GROUP BY 1
    )
    SELECT b.event_type,
           CAST(ANY_VALUE(f.n) AS BIGINT) AS n,
           CAST(ANY_VALUE(f.p) AS BIGINT) AS n_pos,
           CAST(b.best_f1_e6 AS BIGINT) AS best_f1_e6,
           CAST(MIN(CASE WHEN f.f1_e6 = b.best_f1_e6 THEN f.thr_e3 END)
                AS BIGINT) AS thr_e3_at_best,
           CAST(MAX(CASE WHEN f.f1_e6 = b.best_f1_e6 THEN f.tp END)
                AS BIGINT) AS tp_at_best,
           CAST(MAX(CASE WHEN f.f1_e6 = b.best_f1_e6 THEN f.cn - f.tp END)
                AS BIGINT) AS fp_at_best
    FROM best b JOIN f1 f ON b.event_type = f.event_type
    GROUP BY 1, 4
    ORDER BY 1
    """,
    tags=("eval", "classification", "events", "exact"),
)
def eval_best_f1_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best-F1 operating point from the FULL precision-recall sweep
    (the threshold-selection step of van Rijsbergen's F-measure, 1979;
    cf. Davis & Goadrich, ICML 2006 on PR curves): per event type,
    every distinct e3-binned score is a candidate threshold 'predict
    positive iff value ≥ θ'; cumulative TP/FP come from score-grain
    counts cumulated DESCENDING, F1 = 2TP/(2TP+FP+FN) is an exact e6
    floor division (2·tp·1e6 // (tp + cn + P − tp), all BIGINT), and
    the reported operating point is the max-F1 row with the SMALLEST
    threshold under ties (deterministic). tp/fp at that point are the
    MAX over tied rows — tp and fp are monotone non-decreasing in
    descending θ, so the max of each is attained exactly at the
    smallest-θ tied row: all three readouts name ONE operating
    point.

    Relevance labels: the catalog's standard synthetic oracle
    `event_id % 5 = 0` (the eval_average_precision convention).

    Scale: ONE data-scale shuffle to (type, e3-score) grain; the
    cumulative windows partition by event_type at value grain; the
    argmax join-back runs at the same grain. At sf100 counts sit at
    ~1e8 — the f1 numerator 2·tp·1e6 ≤ 2e14, int64-safe past sf10000.
    Reference analog: none (maps/maps.go:8-21)."""
    e = read_table(spark, sf_dir, "events")
    from blow_spark.materialize import spill_to_parquet

    # (type, e3-score) grain; spilled — totals, the cumulative sweep
    # and the argmax join-back all consume it (one corpus shuffle)
    scored = spill_to_parquet(
        e.select(
            "event_type",
            F.floor(F.col("value") * 1000).cast("long").alias("thr_e3"),
            F.when(F.col("event_id") % 5 == 0, 1).otherwise(0).alias("pos"),
        )
        .groupBy("event_type", "thr_e3")
        .agg(F.count("*").alias("c"), F.sum("pos").alias("pos"))
    )
    tot = scored.groupBy("event_type").agg(
        F.sum("c").alias("n"), F.sum("pos").alias("p")
    )
    wd = W.partitionBy("event_type").orderBy(F.col("thr_e3").desc())
    cum = scored.join(tot, "event_type").select(
        "event_type",
        "thr_e3",
        F.sum("c").over(wd).alias("cn"),
        F.sum("pos").over(wd).alias("tp"),
        "n",
        "p",
    )
    f1 = cum.select(
        "event_type",
        "thr_e3",
        "cn",
        "tp",
        "n",
        "p",
        F.expr("CAST(2 * tp * 1000000 div (tp + cn + p - tp) AS BIGINT)").alias(
            "f1_e6"
        ),
    )
    best = f1.groupBy("event_type").agg(F.max("f1_e6").alias("best_f1_e6"))
    at = F.col("f1_e6") == F.col("best_f1_e6")
    return (
        f1.join(best, "event_type")
        .groupBy("event_type", "best_f1_e6")
        .agg(
            F.any_value("n").cast("long").alias("n"),
            F.any_value("p").cast("long").alias("n_pos"),
            F.min(F.when(at, F.col("thr_e3"))).cast("long").alias(
                "thr_e3_at_best"
            ),
            F.max(F.when(at, F.col("tp"))).cast("long").alias("tp_at_best"),
            F.max(F.when(at, F.col("cn") - F.col("tp")))
            .cast("long")
            .alias("fp_at_best"),
        )
        .select(
            "event_type",
            "n",
            "n_pos",
            F.col("best_f1_e6").cast("long").alias("best_f1_e6"),
            "thr_e3_at_best",
            "tp_at_best",
            "fp_at_best",
        )
        .orderBy("event_type")
    )
