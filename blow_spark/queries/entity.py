"""Entity resolution: fuzzy (edit-distance) matching with lossless
q-gram blocking.

The record-linkage primitive every catalog/CRM-scale dedup needs: find
all pairs of distinct names within Levenshtein distance k WITHOUT the
O(N²) cross join, by blocking on shared character q-grams with the
classic count-filter bound (Gravano et al., VLDB 2001: one edit
operation destroys at most q q-grams, so a pair within distance k
shares at least max(|G(a)|,|G(b)|) − k·q q-grams), then exact-verifying
only the candidates.

Reference parity note: the reference engine (wizgrao/blow) has no join
surface at all (maps/maps.go:8-14); this extends the repo's exact
similarity-join family (prefix-filter Jaccard in dedup.py) to
edit-distance semantics.

The ORACLE is the blocking-free brute force — the driver's hash check
therefore proves the blocking lost no pair (the same recall-as-gate
device dedup_jaccard_prefix_filter uses).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from blow_spark.queries import register
from blow_spark.sources import read_table

_K = 2  # max edit distance
_Q = 2  # q-gram width


@register(
    "join_fuzzy_levenshtein_block",
    oracle=f"""
    WITH names AS (SELECT DISTINCT p_name AS name FROM part)
    SELECT a.name AS name_a, b.name AS name_b,
           CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist
    FROM names a JOIN names b ON a.name < b.name
    WHERE levenshtein(a.name, b.name) <= {_K}
    """,
    tags=("join", "fuzzy", "entity-resolution", "dedup"),
)
def join_fuzzy_levenshtein_block(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All distinct part-name pairs within Levenshtein distance 2, via
    LOSSLESS q-gram blocking: explode each name into positional-free
    bigrams, self-join the bigram inverted index, keep pairs sharing
    ≥ max(|G(a)|,|G(b)|) − k·q bigrams (the count-filter bound) AND
    within the length band |len(a)−len(b)| ≤ k, then exact-verify with
    the built-in levenshtein. Strings too short for the bound to bite
    (≤ k·q bigrams) fall into one SHORT block verified directly within
    the length band — the fixture has none, but the path keeps the
    operator total (an adversarial all-short corpus degrades to banded
    verify, the documented worst case, like the LSH boilerplate-bucket
    cap).

    The oracle is the BLOCKING-FREE brute force over all distinct
    pairs, so the hash check is a recall proof: any pair the blocking
    dropped turns the row red. Scale shape: the cross join is replaced
    by the bigram bucket join (fan-out tracks shared-bigram density,
    not N²); distinct() is one shuffle over the name column only;
    verify cost is |candidates|·O(len²) cellwise DP, JVM-side."""
    names = (
        read_table(spark, sf_dir, "part")
        .select(F.col("p_name").alias("name"))
        .distinct()
        .select("name", F.length("name").alias("len"))
    )
    grams = names.select(
        "name",
        "len",
        F.explode(
            F.array_distinct(
                F.expr(
                    f"transform(sequence(1, length(name) - {_Q} + 1), "
                    f"i -> substring(name, i, {_Q}))"
                )
            )
        ).alias("g"),
    )
    ng = grams.groupBy("name", "len").agg(F.count("*").alias("nb"))
    ga = grams.select(
        F.col("name").alias("name_a"), F.col("len").alias("len_a"), "g"
    )
    gb = grams.select(
        F.col("name").alias("name_b"), F.col("len").alias("len_b"), "g"
    )
    shared = (
        ga.join(gb, "g")
        .filter(
            (F.col("name_a") < F.col("name_b"))
            & (F.abs(F.col("len_a") - F.col("len_b")) <= _K)
        )
        .groupBy("name_a", "name_b")
        .agg(F.count("*").alias("n_shared"))
    )
    na = ng.select(
        F.col("name").alias("name_a"), F.col("nb").alias("nb_a")
    )
    nb = ng.select(
        F.col("name").alias("name_b"), F.col("nb").alias("nb_b")
    )
    cand_blocked = (
        shared.join(F.broadcast(na), "name_a")
        .join(F.broadcast(nb), "name_b")
        .filter(
            F.col("n_shared")
            >= F.greatest("nb_a", "nb_b") - F.lit(_K * _Q)
        )
        .select("name_a", "name_b")
    )
    # SHORT block: names whose bigram sets are too small for the count
    # bound to exclude anything — banded direct verify keeps losslessness
    short = ng.filter(F.col("nb") <= _K * _Q).select(
        F.col("name").alias("name_a"), F.col("len").alias("len_a")
    )
    all_b = names.select(
        F.col("name").alias("name_b"), F.col("len").alias("len_b")
    )
    cand_short = (
        short.join(
            all_b,
            (F.col("name_a") < F.col("name_b"))
            & (F.abs(F.col("len_a") - F.col("len_b")) <= _K),
        )
        .select("name_a", "name_b")
    )
    cands = cand_blocked.unionAll(cand_short).distinct()
    return cands.select(
        "name_a",
        "name_b",
        F.levenshtein("name_a", "name_b").cast("long").alias("dist"),
    ).filter(F.col("dist") <= _K)


# Fellegi-Sunter documented priors: P(field agrees | same entity).
# The u-probabilities (agreement among NON-matches) are estimated from
# the blocked candidate pairs themselves — at fixture scale every
# blocked pair is a non-match, which is exactly the standard
# u-estimation assumption (matches are vanishingly rare among random
# pairs). Thresholds in e6 log-units.
_FS_M_SEG = 0.95
_FS_M_BAL = 0.90
_FS_UPPER_E6 = 2_000_000   # weight above → link
_FS_LOWER_E6 = -2_000_000  # weight below → non-link
# Data-adaptive blocking: per nation, B = ceil(n/DEPTH) equi-width
# bands over the EXACT observed cents range, so bands multiply with
# the data and the expected block size stays ≈ DEPTH at any scale.
# CAP is the enforced worst-case: any block that still exceeds it
# (value skew) is salted into ceil(cnt/CAP) deterministic sub-blocks.
_FS_DEPTH = 100   # target rows per block
_FS_CAP = 400     # hard per-block row cap before salted sub-blocking


def _fs_blocked_rows(c: DataFrame) -> DataFrame:
    """Attach the adaptive block key (rule, band, sub) to each customer
    row of ``c`` (columns c_custkey, c_nationkey, c_mktsegment, bal).

    Per nation: B = ceil(n / DEPTH) equi-width bigint bands over the
    exact observed cents range (rule 0) plus the half-shifted grid
    (rule 1); any (nation, rule, band) block above CAP rows is salted
    into ceil(cnt / CAP) sub-blocks keyed by c_custkey mod n_sub. All
    integer arithmetic, so the DuckDB oracle replays it bit-exactly.
    Shared by er_fellegi_sunter_linkage and its block-size pin test.
    """
    stats = c.groupBy("c_nationkey").agg(
        F.min("bal").alias("lo"),
        (F.max("bal") - F.min("bal") + F.lit(1)).cast("bigint").alias("span"),
        F.expr(f"(count(*) + {_FS_DEPTH - 1}) div {_FS_DEPTH}")
        .cast("bigint")
        .alias("nb"),
    )
    keyed = (
        c.join(F.broadcast(stats), "c_nationkey")
        .withColumn("rule", F.explode(F.array(F.lit(0), F.lit(1))))
        .withColumn(
            "band",
            F.expr(
                "CASE WHEN rule = 0 THEN ((bal - lo) * nb) div span "
                "ELSE (2 * (bal - lo) * nb + span) div (2 * span) END"
            ).cast("bigint"),
        )
        .select("c_custkey", "c_nationkey", "c_mktsegment", "bal", "rule", "band")
    )
    # block sizes via a BLOCK-KEYED window (cardinality grows with N,
    # per-partition state ≈ DEPTH rows) — one pass, no join-back, so the
    # keyed subtree isn't recomputed for a counts branch.
    from pyspark.sql import Window as W

    wspec = W.partitionBy("c_nationkey", "rule", "band")
    return keyed.withColumn("n_blk", F.count("*").over(wspec)).withColumn(
        "sub",
        F.expr(f"c_custkey % ((n_blk + {_FS_CAP - 1}) div {_FS_CAP})").cast(
            "bigint"
        ),
    )


@register(
    "er_fellegi_sunter_linkage",
    oracle=f"""
    WITH c AS (
      SELECT c_custkey, c_nationkey, c_mktsegment,
             CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal
      FROM customer
    ), stats AS (
      SELECT c_nationkey,
             MIN(bal) AS lo,
             MAX(bal) - MIN(bal) + 1 AS span,
             (COUNT(*) + {_FS_DEPTH - 1}) // {_FS_DEPTH} AS nb
      FROM c GROUP BY c_nationkey
    ), keyed AS (
      SELECT c.c_custkey, c.c_nationkey, c.c_mktsegment, c.bal, r.rule,
             CASE WHEN r.rule = 0
                  THEN ((c.bal - s.lo) * s.nb) // s.span
                  ELSE (2 * (c.bal - s.lo) * s.nb + s.span) // (2 * s.span)
             END AS band
      FROM c JOIN stats s ON c.c_nationkey = s.c_nationkey
      CROSS JOIN (VALUES (0), (1)) AS r(rule)
    ), sized AS (
      SELECT c_custkey, c_nationkey, c_mktsegment, bal, rule, band,
             c_custkey % ((COUNT(*) OVER (PARTITION BY c_nationkey, rule,
                                          band) + {_FS_CAP - 1})
                          // {_FS_CAP}) AS sub
      FROM keyed
    ), pairs AS (
      SELECT DISTINCT id_a, id_b, agr_seg, agr_bal FROM (
        SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
               CAST(a.c_mktsegment = b.c_mktsegment AS INT) AS agr_seg,
               CAST(ABS(a.bal - b.bal) <= 5000 AS INT) AS agr_bal
        FROM sized a JOIN sized b
          ON a.c_nationkey = b.c_nationkey AND a.rule = b.rule
         AND a.band = b.band AND a.sub = b.sub
         AND a.c_custkey < b.c_custkey
      )
    ), u AS (
      SELECT CAST(SUM(agr_seg) AS DOUBLE) / COUNT(*) AS u_seg,
             CAST(SUM(agr_bal) AS DOUBLE) / COUNT(*) AS u_bal,
             CAST(COUNT(*) AS BIGINT) AS n_pairs
      FROM pairs
    ), weighted AS (
      SELECT p.agr_seg, p.agr_bal, u.n_pairs,
             CAST(ROUND((CASE WHEN p.agr_seg = 1
                          THEN LN({_FS_M_SEG} / u.u_seg)
                          ELSE LN((1 - {_FS_M_SEG}) / (1 - u.u_seg)) END
                        + CASE WHEN p.agr_bal = 1
                          THEN LN({_FS_M_BAL} / u.u_bal)
                          ELSE LN((1 - {_FS_M_BAL}) / (1 - u.u_bal)) END)
                        * 1000000) AS BIGINT) AS w_e6
      FROM pairs p CROSS JOIN u
    )
    SELECT agr_seg, agr_bal,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(w_e6) AS BIGINT) AS weight_e6,
           CASE WHEN MIN(w_e6) > {_FS_UPPER_E6} THEN 'link'
                WHEN MIN(w_e6) < {_FS_LOWER_E6} THEN 'non-link'
                ELSE 'possible' END AS decision,
           CAST(MIN(n_pairs) AS BIGINT) AS blocked_pairs
    FROM weighted
    GROUP BY agr_seg, agr_bal
    ORDER BY agr_seg, agr_bal
    """,
    tags=("er", "linkage", "customer"),
)
def er_fellegi_sunter_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter probabilistic record linkage (JASA 1969 — the
    framework under every production matcher from Splink to AWS
    Entity Resolution): blocked candidate pairs are compared on a
    field vector (segment equality, balance within $50), each pattern
    scores Σ ln(m/u) for agreements and Σ ln((1−m)/(1−u)) for
    disagreements, and the weight thresholds into link / possible /
    non-link. m-probabilities are documented priors;
    u-probabilities are ESTIMATED FROM THE DATA as the blocked pairs'
    own agreement rates (the standard random-pair assumption), so the
    weights move with the fixture, not with constants.

    Engine-exact: agreement bits are integers, u-rates are exact
    rational doubles, each pattern's weight fix-points to e6 AT THE
    PAIR before the per-pattern MIN (identical pattern → identical
    weight, so MIN is a no-op that keeps the aggregate deterministic).
    The blocker itself is pure bigint arithmetic (band = (pos*B) div
    span), so both engines derive identical blocks and identical
    candidate pairs.

    Scale: the blocker is DATA-ADAPTIVE, Splink-style (union of two
    size-capped blocking rules). Per nation, B = ceil(n/100) equi-width
    bands over the exact cents range, so the band COUNT grows with the
    data and expected block size stays ≈ 100 rows at any N — candidate
    pairs grow ∝ N·DEPTH (linear), not N²/constant. Rule 2 is the same
    grid half-shifted, so any pair within half a bandwidth of each
    other in balance shares a block in at least one rule (the standard
    union-of-rules recall device); the UNION is deduped on (id_a,id_b).
    A hard cap backstops value skew: any block above 400 rows is
    salted into ceil(cnt/CAP) deterministic sub-blocks (c_custkey mod
    n_sub), so no task ever materializes more than ~CAP² candidate
    comparisons. Evidence: tests/test_round9.py pins max block size
    ≤ CAP and flat across a 10× row growth; SCALE.md has the
    blocked_pairs sf0.01→0.1→1 slope row (linear). The u-estimate is
    one 1-row aggregate over the same pairs (no second scan of the
    base table); pattern space is 2^#fields rows. The 25-row per-nation
    stats table is the only broadcast (fixed nation domain)."""
    c = read_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        "c_mktsegment",
        F.round(F.col("c_acctbal") * 100).cast("bigint").alias("bal"),
    )
    from blow_spark.materialize import spill_to_parquet

    # spill once: BOTH sides of the self-join read the blocked rows, so
    # without this the whole blocking subtree (scan + stats + window)
    # executes twice.
    keyed = spill_to_parquet(_fs_blocked_rows(c), "blow_spark_fs_blocked_")
    a = keyed.select(
        F.col("c_custkey").alias("id_a"),
        F.col("c_nationkey").alias("nk_a"),
        F.col("c_mktsegment").alias("seg_a"),
        F.col("bal").alias("bal_a"),
        F.col("rule").alias("rule_a"),
        F.col("band").alias("band_a"),
        F.col("sub").alias("sub_a"),
    )
    b = keyed.select(
        F.col("c_custkey").alias("id_b"),
        F.col("c_nationkey").alias("nk_b"),
        F.col("c_mktsegment").alias("seg_b"),
        F.col("bal").alias("bal_b"),
        F.col("rule").alias("rule_b"),
        F.col("band").alias("band_b"),
        F.col("sub").alias("sub_b"),
    )
    pairs = (
        a.join(
            b,
            (F.col("nk_a") == F.col("nk_b"))
            & (F.col("rule_a") == F.col("rule_b"))
            & (F.col("band_a") == F.col("band_b"))
            & (F.col("sub_a") == F.col("sub_b"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .select(
            "id_a",
            "id_b",
            (F.col("seg_a") == F.col("seg_b")).cast("int").alias("agr_seg"),
            (F.abs(F.col("bal_a") - F.col("bal_b")) <= 5000)
            .cast("int")
            .alias("agr_bal"),
        )
        .distinct()
        .select("agr_seg", "agr_bal")
    )
    # Round-15 (guide §2.1 "don't run passes twice"): `pairs` used to be
    # referenced by BOTH the u-estimate aggregate and the weighted rows,
    # so the blocked self-join + (id_a, id_b)-distinct executed twice.
    # The pattern space is 2^#fields = 4 rows, so everything downstream
    # is arithmetic over the pattern COUNTS: aggregate once, truncate
    # the 4-row table (checkpoint_small), and derive u-rates and weights
    # from it. u_seg = Σ n_i·agr_seg_i / Σ n_i is the identical exact
    # integer-sum ratio; the per-pattern weight expressions are the same
    # doubles on the same inputs, so every output value is unchanged
    # (oracle-verified both SFs).
    from blow_spark.materialize import checkpoint_small

    patt = checkpoint_small(
        pairs.groupBy("agr_seg", "agr_bal").agg(
            F.count("*").cast("bigint").alias("n")
        )
    )
    u = patt.agg(
        (
            F.sum(F.col("agr_seg") * F.col("n")).cast("double") / F.sum("n")
        ).alias("u_seg"),
        (
            F.sum(F.col("agr_bal") * F.col("n")).cast("double") / F.sum("n")
        ).alias("u_bal"),
        F.sum("n").cast("bigint").alias("n_pairs"),
    )
    w_seg = F.when(
        F.col("agr_seg") == 1, F.log(F.lit(_FS_M_SEG) / F.col("u_seg"))
    ).otherwise(F.log(F.lit(1 - _FS_M_SEG) / (1 - F.col("u_seg"))))
    w_bal = F.when(
        F.col("agr_bal") == 1, F.log(F.lit(_FS_M_BAL) / F.col("u_bal"))
    ).otherwise(F.log(F.lit(1 - _FS_M_BAL) / (1 - F.col("u_bal"))))
    weighted = patt.crossJoin(F.broadcast(u)).select(
        "agr_seg",
        "agr_bal",
        "n",
        F.col("n_pairs").alias("blocked_pairs"),
        F.round((w_seg + w_bal) * 1_000_000).cast("bigint").alias("weight_e6"),
    )
    return (
        weighted.select(
            "agr_seg",
            "agr_bal",
            "n",
            "weight_e6",
            F.when(F.col("weight_e6") > _FS_UPPER_E6, "link")
            .when(F.col("weight_e6") < _FS_LOWER_E6, "non-link")
            .otherwise("possible")
            .alias("decision"),
            "blocked_pairs",
        )
        .orderBy("agr_seg", "agr_bal")
    )


_JW_TOPK = 25
_JW_CAP = 400  # per-block row cap (same backstop device as _fs_blocked_rows)


def _jaro_winkler_py(s1: str, s2: str) -> float:
    """Exact replica of DuckDB's jaro_winkler_similarity (standard
    Winkler variant: p=0.1, boost threshold 0.7, prefix ≤4) — verified
    value-identical against the native function on adversarial pairs
    (transpositions, prefix boosts, zero-match, empty strings). Lives
    here so both the pandas UDF and tests share one definition."""
    if s1 == s2:
        return 1.0
    l1, l2 = len(s1), len(s2)
    if l1 == 0 or l2 == 0:
        return 0.0
    match_dist = max(l1, l2) // 2 - 1
    m1 = [False] * l1
    m2 = [False] * l2
    m = 0
    for i in range(l1):
        lo = max(0, i - match_dist)
        hi = min(l2, i + match_dist + 1)
        for j in range(lo, hi):
            if not m2[j] and s1[i] == s2[j]:
                m1[i] = m2[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(l1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    j = (m / l1 + m / l2 + (m - t) / m) / 3
    if j > 0.7:
        pre = 0
        for a, b in zip(s1[:4], s2[:4]):
            if a != b:
                break
            pre += 1
        return j + pre * 0.1 * (1 - j)
    return j


@register(
    "join_jaro_winkler_topk",
    oracle=f"""
    WITH names AS (
      SELECT DISTINCT p_name AS name FROM part
    ), keyed AS (
      SELECT name,
             string_split(name, ' ')[1] AS tok1,
             CAST(('0x' || substring(md5(name), 1, 13)) AS BIGINT) AS hid
      FROM names
    ), sized AS (
      SELECT k.name, k.tok1,
             k.hid % ((cnt.n_blk + {_JW_CAP - 1}) // {_JW_CAP}) AS sub
      FROM keyed k JOIN (
        SELECT tok1, COUNT(*) AS n_blk FROM keyed GROUP BY tok1
      ) cnt ON k.tok1 = cnt.tok1
    )
    SELECT a.name AS name_a, b.name AS name_b,
           CAST(ROUND(jaro_winkler_similarity(a.name, b.name) * 1000000)
                AS BIGINT) AS jw_e6
    FROM sized a JOIN sized b
      ON a.tok1 = b.tok1 AND a.sub = b.sub AND a.name < b.name
    ORDER BY jw_e6 DESC, name_a, name_b
    LIMIT {_JW_TOPK}
    """,
    tags=("join", "fuzzy", "entity-resolution", "part"),
)
def join_jaro_winkler_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jaro-Winkler fuzzy-name join (Winkler 1990, the Census-Bureau
    matcher — the similarity inside Splink/dedupe's default comparison
    levels), completing the string-similarity family next to the
    Levenshtein band join above: top-{_JW_TOPK} most-similar distinct
    part-name pairs under first-token blocking.

    The ORACLE side uses DuckDB's NATIVE jaro_winkler_similarity while
    this side runs an Arrow-batched pandas UDF — the hash match proves
    the UDF agrees with an independent C++ implementation on every
    surviving pair (the text_unicode_nfc_normalize device). The UDF is
    a sanctioned Python path: Spark has no JW builtin, and the UDF
    runs per PAIR BATCH after blocking pruned the candidate set.

    Scale: first-token blocking is the standard JW heuristic (Winkler
    similarity is prefix-dominated, so cross-first-token pairs are
    rarely matches); block sizes follow the name VOCABULARY, so the
    same {_JW_CAP}-row cap as _fs_blocked_rows salts any hot block
    into hash sub-blocks (tests/test_round9.py pins the FS device).
    Pair volume is Σ_b C(n_b,2) with n_b ≤ ~{_JW_CAP} — the docstring
    makes no lossless claim: JW blocking is recall-heuristic by
    nature, and the oracle replays the identical blocker."""
    from blow_spark.shipping import ensure_package_shipped

    ensure_package_shipped(spark)  # the UDF closure imports this module
    names = (
        read_table(spark, sf_dir, "part").select("p_name").distinct()
        .select(F.col("p_name").alias("name"))
    )
    keyed = names.select(
        "name",
        F.split(F.col("name"), " ").getItem(0).alias("tok1"),
        F.conv(F.substring(F.md5(F.col("name")), 1, 13), 16, 10)
        .cast("long")
        .alias("hid"),
    )
    counts = keyed.groupBy("tok1").agg(F.count("*").alias("n_blk"))
    sized = keyed.join(counts, "tok1").select(
        "name",
        "tok1",
        F.expr(f"hid % ((n_blk + {_JW_CAP - 1}) div {_JW_CAP})").alias("sub"),
    )
    a = sized.select(
        F.col("name").alias("name_a"), F.col("tok1").alias("t1"), F.col("sub").alias("s1")
    )
    b = sized.select(
        F.col("name").alias("name_b"), F.col("tok1").alias("t1"), F.col("sub").alias("s1")
    )
    pairs = a.join(b, ["t1", "s1"]).where(F.col("name_a") < F.col("name_b"))

    @pandas_udf("double")
    def jw_udf(sa: pd.Series, sb: pd.Series) -> pd.Series:
        return pd.Series(
            [_jaro_winkler_py(x, y) for x, y in zip(sa, sb)], dtype="float64"
        )

    return (
        pairs.select(
            "name_a",
            "name_b",
            F.round(jw_udf(F.col("name_a"), F.col("name_b")) * 1_000_000)
            .cast("bigint")
            .alias("jw_e6"),
        )
        .orderBy(F.col("jw_e6").desc(), "name_a", "name_b")
        .limit(_JW_TOPK)
    )


# --------------------------------------------------------------------------
# Soundex phonetic blocking
# --------------------------------------------------------------------------

#: American Soundex letter→code map (Russell & Odell, US patents
#: 1261167/1435663, 1918/1922). Simplified variant: H/W are treated as
#: vowels (code 0) rather than transparent separators — deterministic
#: and engine-identical; the difference only affects words with
#: c-H-c same-code sandwiches, none of which occur in the fixture
#: vocabularies (asserted by the n_words column).
_SX_LETTERS = "AEIOUYHWBFPVCGJKQSXZDTLMNR"
_SX_CODES = "00000000111122222222334556"


def _sx_collapse(expr: str, global_flag: bool) -> str:
    """Collapse adjacent equal code digits — one regexp_replace per
    digit class because DuckDB's RE2 has NO pattern backreferences
    (the '(\\d)\\1+' idiom silently fails to match there, verified
    live), so the portable form enumerates '11+'…'66+'."""
    g = ", 'g'" if global_flag else ""
    for d in "123456":
        expr = f"regexp_replace({expr}, '{d}{d}+', '{d}'{g})"
    return expr


def _sx_sql(ucol: str, duck: bool) -> str:
    """Full Soundex expression over an upper-cased word column."""
    g = ", 'g'" if duck else ""
    collapsed = _sx_collapse(
        f"translate({ucol}, '{_SX_LETTERS}', '{_SX_CODES}')", duck
    )
    digits = f"regexp_replace(substr({collapsed}, 2), '0', ''{g})"
    return f"concat(substr({ucol}, 1, 1), rpad(substr({digits}, 1, 3), 3, '0'))"


@register(
    "er_soundex_blocking",
    oracle=f"""
    WITH words AS (
      SELECT split_part(p_name, ' ', 1) AS w FROM part
      UNION ALL
      SELECT split_part(p_name, ' ', 2) FROM part
    ), wc AS (
      SELECT w, COUNT(*) AS n FROM words GROUP BY 1
    ), coded AS (
      SELECT w, n, {_sx_sql("upper(w)", True)} AS sx FROM wc
    )
    SELECT sx AS soundex_code,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(n) AS BIGINT) AS n_tokens,
           CAST((CAST(SUM(n) AS HUGEINT) * SUM(n) - SUM(CAST(n AS HUGEINT) * n)) // 2 AS BIGINT)
             AS cross_word_pairs,
           MIN(w) AS min_word
    FROM coded
    GROUP BY 1
    ORDER BY 1
    """,
    tags=("er", "phonetic", "blocking", "part", "exact"),
)
def er_soundex_blocking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soundex phonetic blocking for entity resolution (Russell &
    Odell's 1918/1922 coding; the canonical ER blocking key per
    Christen, "Data Matching", Springer 2012 §4.3): every word of
    every part name is coded to its 4-character Soundex class, and
    each block reports its word diversity and the CROSS-WORD candidate
    pair count (Σn)²−Σn² / 2 — the pairs a phonetic blocker would
    send to a match scorer, computed FROM COUNTS at word grain in
    DECIMAL(38,0)/HUGEINT integer arithmetic (the
    lossless-blocking accounting used by the q-gram/PPJoin shelf; no
    pair is ever materialized). The fixture vocabulary realizes a true
    phonetic collision (red/rod → R300), so the blocking behavior is
    exercised, not vacuous. The Soundex expression is built portably:
    DuckDB's RE2 has no pattern backreferences, so run-collapse
    enumerates the six digit classes (see _sx_collapse) — the exact
    same expression tree evaluates in both engines.

    Scale: two projections + one word-grain count shuffle; everything
    downstream runs at vocabulary grain. Pair counts are closed-form
    integers (no quadratic materialization anywhere). Reference
    analog: none (maps/maps.go:8-21)."""
    p = read_table(spark, sf_dir, "part")
    w1 = p.select(F.substring_index("p_name", " ", 1).alias("w"))
    w2 = p.select(
        F.substring_index(
            F.substring_index("p_name", " ", 2), " ", -1
        ).alias("w")
    )
    wc = (
        w1.unionByName(w2)
        .groupBy("w")
        .agg(F.count("*").alias("n"))
    )
    coded = wc.select(
        "w", "n", F.expr(_sx_sql("upper(w)", False)).alias("sx")
    )
    return (
        coded.groupBy(F.col("sx").alias("soundex_code"))
        .agg(
            F.count("*").cast("long").alias("n_words"),
            F.sum("n").cast("long").alias("n_tokens"),
            F.expr(
                "CAST((CAST(SUM(n) AS DECIMAL(38,0)) * SUM(n)"
                " - SUM(CAST(n AS DECIMAL(38,0)) * n)) div 2 AS BIGINT)"
            ).alias("cross_word_pairs"),
            F.min("w").alias("min_word"),
        )
        .orderBy("soundex_code")
    )
