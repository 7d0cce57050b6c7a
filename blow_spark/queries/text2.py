"""Second text battery: RAKE keyword extraction and Unicode NFC
normalization.

Reference parity note: the reference engine (wizgrao/blow) has no text
surface (maps/maps.go:8-14); extension operators from the task brief's
LLM-data-pipeline mandate, companions to queries/text.py.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from blow_spark.queries import register
from blow_spark.sources import read_table

# RAKE phrase delimiters present in the synthetic corpus.
_RAKE_STOPWORDS = ("a", "the")
_RAKE_TOPK = 15

# Appended to every document before normalization so the NFC path is
# exercised non-vacuously on the ASCII fixture: 'e'+COMBINING ACUTE and
# 'i'+COMBINING DIAERESIS compose under NFC; the zero-width space and
# BOM must be stripped explicitly (NFC does not remove them).
_NFC_SUFFIX = " cafe\u0301 nai\u0308ve\u200bword\ufeff"


@register(
    "text_rake_keywords",
    oracle=f"""
    WITH toks AS (
      SELECT d.doc_id, t.pos, t.tok,
             t.tok IN ('a', 'the') AS is_stop
      FROM documents d,
           LATERAL (SELECT UNNEST(string_split(d.text, ' ')) AS tok,
                           UNNEST(generate_series(
                             1, len(string_split(d.text, ' ')))) AS pos) t
      WHERE t.tok <> ''
    ), nonstop AS (
      SELECT doc_id, pos, tok,
             pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos)
               AS grp
      FROM toks WHERE NOT is_stop
    ), phrases AS (
      SELECT doc_id, grp,
             STRING_AGG(tok, ' ' ORDER BY pos) AS phrase,
             CAST(COUNT(*) AS BIGINT) AS plen
      FROM nonstop GROUP BY doc_id, grp
    ), word_occ AS (
      SELECT n.tok, p.plen
      FROM nonstop n JOIN phrases p
        ON n.doc_id = p.doc_id AND n.grp = p.grp
    ), word_scores AS (
      SELECT tok,
             CAST(ROUND(CAST(SUM(plen) AS DOUBLE) * 1000000 / COUNT(*))
                  AS BIGINT) AS score_e6
      FROM word_occ GROUP BY tok
    ), phrase_scores AS (
      SELECT p.phrase,
             CAST(COUNT(DISTINCT p.doc_id || '#' || p.grp) AS BIGINT)
               AS occurrences,
             CAST(SUM(w.score_e6) AS BIGINT)
               / CAST(COUNT(DISTINCT p.doc_id || '#' || p.grp) AS BIGINT)
               AS score_e6
      FROM phrases p
      JOIN nonstop n ON n.doc_id = p.doc_id AND n.grp = p.grp
      JOIN word_scores w ON w.tok = n.tok
      GROUP BY p.phrase
    )
    SELECT phrase, occurrences,
           ROUND(score_e6 / 1000000.0, 6) AS rake_score
    FROM phrase_scores
    ORDER BY score_e6 DESC, phrase
    LIMIT {_RAKE_TOPK}
    """,
    tags=("text", "keywords", "documents"),
)
def text_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010): candidate phrases
    are maximal stopword-free token runs; each word scores
    deg(w)/freq(w) where deg sums the lengths of every phrase the word
    occurs in; a phrase scores the sum of its words' scores — the
    zero-model keyword extractor a corpus-triage pipeline runs before
    anything learned. Top-{_RAKE_TOPK} corpus-wide phrases, ties by
    phrase text.

    Engine-exact: word scores fix-point to e6 integers BEFORE the
    phrase sum (float sum order never matters), and a phrase's total
    divides by its occurrence count in exact integer arithmetic
    (identical text → identical word multiset → identical sum, so the
    division is exact per distinct phrase).

    Scale: tokenize is a map-side posexplode; phrase assembly is one
    (doc, grp)-keyed aggregate whose islands come from a PER-DOCUMENT
    window (bounded by doc length); word stats and the phrase-word
    join are token-keyed shuffles — the same shapes as the BPE/TF-IDF
    family; final top-k is TakeOrderedAndProject."""
    d = read_table(spark, sf_dir, "documents")
    toks = (
        d.select(
            "doc_id",
            F.posexplode(F.split(F.col("text"), " ")).alias("pos0", "tok"),
        )
        .where(F.col("tok") != "")
        .select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok")
    )
    nonstop = (
        toks.where(~F.col("tok").isin(*_RAKE_STOPWORDS))
        .withColumn(
            "grp",
            F.col("pos")
            - F.row_number().over(
                W.partitionBy("doc_id").orderBy("pos")
            ),
        )
    )
    phrases = nonstop.groupBy("doc_id", "grp").agg(
        F.array_join(
            F.expr(
                "transform(array_sort(collect_list(struct(pos, tok))),"
                " s -> s.tok)"
            ),
            " ",
        ).alias("phrase"),
        F.count("*").cast("bigint").alias("plen"),
    )
    word_occ = nonstop.join(phrases, ["doc_id", "grp"]).select("tok", "plen")
    word_scores = word_occ.groupBy("tok").agg(
        F.round(F.sum("plen").cast("double") * 1_000_000 / F.count("*"))
        .cast("bigint")
        .alias("score_e6")
    )
    phrase_scores = (
        phrases.join(nonstop, ["doc_id", "grp"])
        .join(word_scores, "tok")
        .groupBy("phrase")
        .agg(
            F.countDistinct(
                F.concat_ws("#", F.col("doc_id"), F.col("grp"))
            )
            .cast("bigint")
            .alias("occurrences"),
            F.sum("score_e6").cast("bigint").alias("sum_e6"),
        )
        .select(
            "phrase",
            "occurrences",
            (F.col("sum_e6") / F.col("occurrences"))
            .cast("bigint")
            .alias("score_e6"),
        )
    )
    return (
        phrase_scores.orderBy(F.col("score_e6").desc(), F.col("phrase").asc())
        .limit(_RAKE_TOPK)
        .select(
            "phrase",
            "occurrences",
            F.round(F.col("score_e6") / 1_000_000.0, 6).alias("rake_score"),
        )
    )


@register(
    "text_unicode_nfc_normalize",
    oracle=f"""
    WITH dirty AS (
      SELECT doc_id, text || ' cafe' || CHR(769) || ' nai' || CHR(776)
               || 've' || CHR(8203) || 'word' || CHR(65279) AS raw
      FROM documents
    ), cleaned AS (
      SELECT doc_id, raw,
             nfc_normalize(REPLACE(REPLACE(raw, CHR(8203), ''),
                                   CHR(65279), '')) AS nfc
      FROM dirty
    )
    SELECT doc_id,
           CAST(LENGTH(raw) AS BIGINT) AS raw_chars,
           CAST(LENGTH(nfc) AS BIGINT) AS nfc_chars,
           CAST(LENGTH(raw) - LENGTH(nfc) AS BIGINT) AS removed,
           MD5(nfc) AS nfc_md5
    FROM cleaned
    ORDER BY doc_id
    """,
    tags=("text", "unicode", "documents"),
)
def text_unicode_nfc_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode NFC normalization + invisible-codepoint strip — the
    first cleaning pass any multilingual corpus needs (decomposed
    accents from OCR/mac filesystems, zero-width spaces and BOMs from
    web scrapes, all of which break tokenizers and dedup hashes). Each
    document gets a synthetic suffix with combining marks, a ZWSP and
    a BOM so the fixture exercises the path non-vacuously; the check
    is each row's post-NFC md5 plus exact before/after codepoint
    counts (combining pairs compose −2, invisibles strip −2).

    Scale: Spark has no built-in NFC, so this is one of the catalog's
    sanctioned Python paths — an Arrow-batched pandas UDF
    (unicodedata.normalize per BATCH column, not per row), map-only,
    no shuffle at all; the oracle uses DuckDB's native nfc_normalize
    to prove the UDF agrees with an independent ICU-grade
    implementation on every row."""
    d = read_table(spark, sf_dir, "documents")

    @pandas_udf("string")
    def nfc_strip(s: pd.Series) -> pd.Series:
        return s.map(
            lambda t: unicodedata.normalize(
                "NFC", t.replace("\u200b", "").replace("\ufeff", "")
            )
        )

    dirty = d.select(
        "doc_id", F.concat(F.col("text"), F.lit(_NFC_SUFFIX)).alias("raw")
    )
    cleaned = dirty.withColumn("nfc", nfc_strip(F.col("raw")))
    return cleaned.select(
        "doc_id",
        F.length("raw").cast("bigint").alias("raw_chars"),
        F.length("nfc").cast("bigint").alias("nfc_chars"),
        (F.length("raw") - F.length("nfc")).cast("bigint").alias("removed"),
        F.md5(F.col("nfc")).alias("nfc_md5"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Unigram-LM Viterbi segmentation (SentencePiece's other half, next to
# the BPE family in queries/corpus.py). Integer e6 min/plus DP over
# word positions. The oracle unrolls the DP as MATERIALIZED CTEs
# (plain CTEs inline PER REFERENCE, and a 4-branch 12-step recurrence
# inlines into a 4^12-node plan — measured hang); the Spark side runs
# the identical recurrence imperatively with a spill per step for the
# same reason.
# ---------------------------------------------------------------------------

_UNI_MAX_WORD = 12
_UNI_MAX_PIECE = 4
_UNI_TOPK = 30


def _unigram_base_ctes() -> list[str]:
    """Shared oracle CTEs: word frequencies and the INITIAL
    substring-count piece costs (θ₀)."""
    pos_vals = ", ".join(
        f"({i}, {l})"
        for i in range(1, _UNI_MAX_WORD + 1)
        for l in range(1, _UNI_MAX_PIECE + 1)
        if i + l - 1 <= _UNI_MAX_WORD
    )
    return [
        """tok AS (
      SELECT UNNEST(string_split(text, ' ')) AS word FROM documents
    )""",
        f"""wf AS MATERIALIZED (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS wf
      FROM tok WHERE LENGTH(word) <= {_UNI_MAX_WORD} AND word <> ''
      GROUP BY word
    )""",
        f"""pieces AS MATERIALIZED (
      SELECT SUBSTRING(w.word, p.i, p.l) AS piece,
             CAST(SUM(w.wf) AS BIGINT) AS cnt
      FROM wf w
      JOIN (VALUES {pos_vals}) AS p(i, l)
        ON p.i + p.l - 1 <= LENGTH(w.word)
      GROUP BY SUBSTRING(w.word, p.i, p.l)
    )""",
        """tot AS (
      SELECT CAST(SUM(cnt) AS DOUBLE) AS tot FROM pieces
    )""",
        """pcost AS MATERIALIZED (
      SELECT piece,
             CAST(ROUND(-LN(CAST(cnt AS DOUBLE) / tot) * 1000000)
                  AS BIGINT) AS c
      FROM pieces CROSS JOIN tot
    )""",
    ]


def _unigram_dp_ctes(pcost_name: str, prefix: str) -> list[str]:
    """Unrolled MATERIALIZED-CTE Viterbi chain under a given piece-cost
    table; emits {prefix}dp0..{prefix}dp12 and {prefix}best."""
    ctes = [
        f"""{prefix}dp0 AS MATERIALIZED (
      SELECT word, CAST(0 AS BIGINT) AS cost, '' AS path FROM wf
    )"""
    ]
    for i in range(1, _UNI_MAX_WORD + 1):
        branches = []
        for l in range(1, _UNI_MAX_PIECE + 1):
            if i - l < 0:
                continue
            branches.append(
                f"""SELECT d.word, d.cost + c.c AS cost,
               CASE WHEN d.path = '' THEN c.piece
                    ELSE d.path || ' ' || c.piece END AS path
        FROM {prefix}dp{i - l} d
        JOIN {pcost_name} c ON c.piece = SUBSTRING(d.word, {i - l + 1}, {l})
        WHERE LENGTH(d.word) >= {i}"""
            )
        union = "\n        UNION ALL\n        ".join(branches)
        ctes.append(
            f"""{prefix}dp{i} AS MATERIALIZED (
      SELECT word, cost, path FROM (
        SELECT word, cost, path,
               ROW_NUMBER() OVER (PARTITION BY word
                                  ORDER BY cost, path) AS rn
        FROM (
        {union}
        ) u
      ) r WHERE rn = 1
    )"""
        )
    finals = "\n      UNION ALL\n      ".join(
        f"SELECT word, cost, path FROM {prefix}dp{i} WHERE LENGTH(word) = {i}"
        for i in range(1, _UNI_MAX_WORD + 1)
    )
    ctes.append(f"""{prefix}best AS MATERIALIZED (
      {finals}
    )""")
    return ctes


def _unigram_oracle_sql() -> str:
    ctes = _unigram_base_ctes() + _unigram_dp_ctes("pcost", "")
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT b.word, w.wf AS freq,
           b.cost AS cost_e6,
           CAST(LENGTH(b.path) - LENGTH(REPLACE(b.path, ' ', '')) + 1
                AS BIGINT) AS n_pieces,
           b.path AS segmentation
    FROM best b JOIN wf w ON w.word = b.word
    ORDER BY w.wf DESC, b.word
    LIMIT {_UNI_TOPK}"""
    )


def _unigram_em_oracle_sql() -> str:
    """Two full hard-EM rounds, each a complete unrolled Viterbi chain
    plus the closed-form M-step, with per-round repriced totals."""
    ctes = _unigram_base_ctes()
    # round 1: segment under θ₀
    ctes += _unigram_dp_ctes("pcost", "r1")
    ctes += [
        """occ1 AS MATERIALIZED (
      SELECT b.word, w.wf, UNNEST(string_split(b.path, ' ')) AS piece
      FROM r1best b JOIN wf w ON w.word = b.word
    )""",
        """cnt1 AS MATERIALIZED (
      SELECT piece, CAST(SUM(wf) AS BIGINT) AS cnt
      FROM occ1 GROUP BY piece
    )""",
        """tot1 AS (
      SELECT CAST(SUM(cnt) AS DOUBLE) AS tot,
             CAST(SUM(cnt) AS BIGINT) AS tk,
             CAST(COUNT(*) AS BIGINT) AS np
      FROM cnt1
    )""",
        """pcost1 AS MATERIALIZED (
      SELECT piece,
             CAST(ROUND(-LN(CAST(cnt AS DOUBLE) / tot) * 1000000)
                  AS BIGINT) AS c
      FROM cnt1 CROSS JOIN tot1
    )""",
        """stat0 AS (
      SELECT CAST(SUM(w.wf * b.cost) AS BIGINT) AS total
      FROM r1best b JOIN wf w ON w.word = b.word
    )""",
        """stat1 AS (
      SELECT CAST(SUM(o.wf * p.c) AS BIGINT) AS total
      FROM occ1 o JOIN pcost1 p ON p.piece = o.piece
    )""",
    ]
    # round 2: segment under θ₁
    ctes += _unigram_dp_ctes("pcost1", "r2")
    ctes += [
        """occ2 AS MATERIALIZED (
      SELECT b.word, w.wf, UNNEST(string_split(b.path, ' ')) AS piece
      FROM r2best b JOIN wf w ON w.word = b.word
    )""",
        """cnt2 AS MATERIALIZED (
      SELECT piece, CAST(SUM(wf) AS BIGINT) AS cnt
      FROM occ2 GROUP BY piece
    )""",
        """tot2 AS (
      SELECT CAST(SUM(cnt) AS DOUBLE) AS tot,
             CAST(SUM(cnt) AS BIGINT) AS tk,
             CAST(COUNT(*) AS BIGINT) AS np
      FROM cnt2
    )""",
        """pcost2 AS MATERIALIZED (
      SELECT piece,
             CAST(ROUND(-LN(CAST(cnt AS DOUBLE) / tot) * 1000000)
                  AS BIGINT) AS c
      FROM cnt2 CROSS JOIN tot2
    )""",
        """stat2 AS (
      SELECT CAST(SUM(o.wf * p.c) AS BIGINT) AS total
      FROM occ2 o JOIN pcost2 p ON p.piece = o.piece
    )""",
    ]
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + """
    SELECT * FROM (
      SELECT CAST(0 AS BIGINT) AS em_round, s0.total AS total_cost_e6,
             t1.np AS n_pieces_used, t1.tk AS piece_tokens,
             TRUE AS monotone_ok
      FROM stat0 s0 CROSS JOIN tot1 t1
      UNION ALL
      SELECT CAST(1 AS BIGINT), s1.total, t1.np, t1.tk,
             s1.total <= s0.total + 2 * t1.tk
      FROM stat1 s1 CROSS JOIN stat0 s0 CROSS JOIN tot1 t1
      UNION ALL
      SELECT CAST(2 AS BIGINT), s2.total, t2.np, t2.tk,
             s2.total <= s1.total + t1.tk + t2.tk
      FROM stat2 s2 CROSS JOIN stat1 s1
      CROSS JOIN tot1 t1 CROSS JOIN tot2 t2
    ) ORDER BY em_round"""
    )


def _uni_wf_pcost(spark: SparkSession, sf_dir: str):
    """Word frequencies and the initial substring-count piece costs
    (θ₀), both materialized once (they feed every DP step). Round-15:
    vocabulary-grain tables ride materialize.checkpoint_sublinear —
    lineage cut in the block manager instead of a parquet write job +
    commit + scan per table (the spills were the operator's job floor:
    6 per EM run over ≤228-row tables at sf0.1)."""
    from blow_spark.materialize import checkpoint_sublinear

    d = read_table(spark, sf_dir, "documents")
    tok = d.select(
        F.explode(F.split(F.col("text"), " ")).alias("word")
    ).where((F.col("word") != "") & (F.length("word") <= _UNI_MAX_WORD))
    wf = checkpoint_sublinear(
        tok.groupBy("word").agg(F.count("*").cast("bigint").alias("wf"))
    )
    positions = [
        (i, l)
        for i in range(1, _UNI_MAX_WORD + 1)
        for l in range(1, _UNI_MAX_PIECE + 1)
        if i + l - 1 <= _UNI_MAX_WORD
    ]
    pos_df = spark.createDataFrame(positions, "i int, l int")
    pieces = (
        wf.crossJoin(F.broadcast(pos_df))
        .where(F.col("i") + F.col("l") - 1 <= F.length("word"))
        .groupBy(F.expr("substring(word, i, l)").alias("piece"))
        .agg(F.sum("wf").cast("bigint").alias("cnt"))
    )
    tot = pieces.agg(F.sum("cnt").cast("double").alias("tot"))
    pcost = checkpoint_sublinear(
        pieces.crossJoin(F.broadcast(tot)).select(
            "piece",
            F.round(-F.log(F.col("cnt") / F.col("tot")) * 1_000_000)
            .cast("bigint")
            .alias("c"),
        )
    )
    return wf, pcost


def _uni_viterbi_best(wf: DataFrame, pcost: DataFrame, tag: str) -> DataFrame:
    """Integer min/plus Viterbi over word positions under a given
    piece-cost table: one row per word with its optimal (cost, path),
    (cost, path)-ordered deterministic tie-breaks.

    Optimization round 14 (guide §2.4/§4.1): the DP used to run as 12
    MATERIALIZED steps — each a broadcast join + a word-keyed
    row_number window (one shuffle) + a parquet spill, i.e. ~24 jobs
    and 12 shuffles per E-step, all over a VOCABULARY-sized table
    whose per-word state is ≤ 13 tiny (cost, path) structs. It now
    runs as ONE plan: gather each word's applicable (start, len) piece
    costs into a map (one broadcast join + one word-keyed aggregate =
    the only shuffle), then run the whole 12-position DP per word
    inside a single JVM higher-order `aggregate` expression — no
    Python boundary, no per-step spill, no window. The 4¹²-node
    plan-inlining blowup the old per-step materialization guarded
    against cannot occur: the recurrence lives in ONE expression over
    an array accumulator, not in nested DataFrame plans.

    Equivalence (oracle-checked at sf0.001 + sf0.01): identical
    integer arithmetic; the per-position argmin over candidate
    branches is `array_min` over (cost, path) structs, whose struct
    ordering == the old ROW_NUMBER ... ORDER BY cost, path tie-break
    (binary string compare on both engines); a position with no
    surviving branch (possible under EM-restricted θ support) yields a
    NULL dp entry, and words whose final dp entry is NULL drop out —
    exactly the old inner-join semantics."""
    pos_df = pcost.sparkSession.createDataFrame(
        [
            (i, l)
            for i in range(1, _UNI_MAX_WORD + 1)
            for l in range(1, _UNI_MAX_PIECE + 1)
            if i + l - 1 <= _UNI_MAX_WORD
        ],
        "i int, l int",
    )
    # one row per (word, start, len) whose piece exists in θ; key packs
    # (start, len) into a small int for the in-expression map lookup
    cand = (
        wf.select("word")
        .crossJoin(F.broadcast(pos_df))
        .where(F.col("i") + F.col("l") - 1 <= F.length("word"))
        .join(
            F.broadcast(pcost),
            F.col("piece") == F.expr("substring(word, i, l)"),
        )
        .groupBy("word")
        .agg(
            F.map_from_entries(
                F.collect_list(
                    F.struct(
                        (F.col("i") * 8 + F.col("l")).alias("k"),
                        F.col("c").alias("v"),
                    )
                )
            ).alias("m")
        )
    )

    def step(acc, i):
        def branch(l):
            start = i - l + 1
            prev = F.element_at(acc, start)  # acc[start] == dp[i-l]
            c = F.try_element_at(F.col("m"), start * 8 + F.lit(l))
            piece = F.col("word").substr(start, F.lit(l))
            return F.when(
                prev.isNotNull() & c.isNotNull(),
                F.struct(
                    (prev["cost"] + c).alias("cost"),
                    F.when(prev["path"] == "", piece)
                    .otherwise(F.concat(prev["path"], F.lit(" "), piece))
                    .alias("path"),
                ),
            )

        cands = F.filter(
            F.transform(
                F.sequence(F.lit(1), F.least(F.lit(_UNI_MAX_PIECE), i)),
                branch,
            ),
            lambda x: x.isNotNull(),
        )
        return F.concat(acc, F.array(F.array_min(cands)))

    dp = F.aggregate(
        F.sequence(F.lit(1), F.length("word")),
        F.array(
            F.struct(
                F.lit(0).cast("bigint").alias("cost"),
                F.lit("").alias("path"),
            )
        ),
        step,
    )
    last = F.element_at(dp, F.length("word") + 1)
    return (
        cand.select("word", last.alias("st"))
        .where(F.col("st").isNotNull())
        .select(
            "word",
            F.col("st.cost").alias("cost"),
            F.col("st.path").alias("path"),
        )
    )


@register(
    "tokenizer_unigram_viterbi_segment",
    oracle=_unigram_oracle_sql(),
    tags=("tokenizer", "corpus", "documents"),
)
def tokenizer_unigram_viterbi_segment(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Unigram-LM Viterbi segmentation (Kudo, ACL 2018 — the
    SentencePiece model, completing the tokenizer shelf next to BPE in
    queries/corpus.py): candidate pieces are all substrings up to
    length 4 weighted by corpus word frequency, piece cost is
    −ln(count/total) fix-pointed to e6 integers, and each word's
    optimal segmentation is the min-cost path of an integer min/plus
    DP over its ≤12 character positions (single-char pieces exist by
    construction, so the DP is total). Top-30 corpus words with their
    optimal splits, costs, and piece counts.

    Engine-exact: the recurrence is identical integer arithmetic on
    both sides with (cost, path)-ordered deterministic tie-breaks at
    every position; ln carries the catalog's 1-ulp allowance under
    the e6 rounding.

    Scale: word-frequency and piece tables are VOCABULARY-sized
    (sublinear — the only corpus-scale pass is tokenize+count). The
    DP MUST NOT be written as a plain CTE/DataFrame chain: CTEs
    inline per reference, and this 4-branch 12-step recurrence
    inlines into a 4¹² ≈ 16M-node plan (measured: DuckDB hung, and
    Catalyst would blow up identically). The oracle therefore
    MATERIALIZES each dpᵢ (`AS MATERIALIZED` — 12 small linear steps
    over vocabulary-sized tables); the Spark side (round-14
    optimization) runs the whole per-word DP inside ONE higher-order
    `aggregate` expression over a per-word (start, len)→cost map —
    one broadcast join + one word-keyed shuffle, no per-step
    materialization, and no plan blowup because the recurrence lives
    in a single expression, not nested plans. The FULL EM loop
    (re-estimate pcost from Viterbi counts, re-segment) is registered
    as tokenizer_unigram_em below, with a likelihood-monotonicity
    proof bit per round."""
    wf, pcost = _uni_wf_pcost(spark, sf_dir)
    best = _uni_viterbi_best(wf, pcost, "uni")
    return (
        # wf is a checkpointed vocabulary-grain table (no size stats
        # for auto-broadcast) — hint it explicitly
        best.join(F.broadcast(wf), "word")
        .select(
            "word",
            F.col("wf").alias("freq"),
            F.col("cost").alias("cost_e6"),
            (
                F.length("path")
                - F.length(F.regexp_replace("path", " ", ""))
                + 1
            )
            .cast("bigint")
            .alias("n_pieces"),
            F.col("path").alias("segmentation"),
        )
        .orderBy(F.col("freq").desc(), "word")
        .limit(_UNI_TOPK)
    )


def _uni_m_step(best: DataFrame, wf: DataFrame):
    """Hard-EM M-step: corpus-weighted piece counts from a Viterbi
    segmentation, the re-estimated cost table θ (materialized — it
    feeds the next E-step's DP join and the repricing), and the 1-row
    (tokens, distinct-piece) stats."""
    from blow_spark.materialize import checkpoint_sublinear

    occ = best.join(F.broadcast(wf), "word").select(
        "wf", F.explode(F.split("path", " ")).alias("piece")
    )
    cnt = occ.groupBy("piece").agg(F.sum("wf").cast("bigint").alias("cnt"))
    tot = cnt.agg(
        F.sum("cnt").cast("double").alias("tot"),
        F.sum("cnt").cast("bigint").alias("tk"),
        F.count("*").cast("bigint").alias("np"),
    )
    pcost = checkpoint_sublinear(
        cnt.crossJoin(F.broadcast(tot.select("tot"))).select(
            "piece",
            F.round(-F.log(F.col("cnt") / F.col("tot")) * 1_000_000)
            .cast("bigint")
            .alias("c"),
        )
    )
    return occ, pcost, tot


@register(
    "tokenizer_unigram_em",
    oracle=_unigram_em_oracle_sql(),
    tags=("tokenizer", "corpus", "documents", "iterative"),
)
def tokenizer_unigram_em(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL unigram-LM hard-EM loop (Kudo, ACL 2018 — Viterbi-EM, the
    SentencePiece training iteration), two complete rounds: segment
    every corpus word under θ₀ (substring-count costs), re-estimate
    piece costs from the corpus-weighted Viterbi piece counts (the
    closed-form M-step: the empirical unigram distribution of the
    current segmentation), re-segment under θ₁, re-estimate θ₂. Emits
    one row per round with the REPRICED total corpus cost
    Σ wf·cost(s_t under θ_t) and a monotone_ok proof bit — hard EM
    guarantees L(θ_t, s_t) ≤ L(θ_{t-1}, s_{t-1}) in exact arithmetic
    (E-step: s_t minimizes cost under θ_{t-1}; M-step: the empirical
    distribution minimizes cost of s_t), so the bit allows only the e6
    fix-point rounding slack (≤1 unit per piece token). Registered as
    the full loop, not one plan-identical step, exactly as
    pagerank/k-core/LPA register theirs (round-8 verdict item #3).

    Engine-exact: both engines run the identical integer DP per round
    and the identical closed-form M-step; the monotonicity inequality
    is REALIZED IN THE RESULT ROWS so the oracle hash proves it on
    both engines independently.

    Scale: every table after the one corpus tokenize+count pass is
    VOCABULARY-sized; each round is ONE single-plan Viterbi E-step
    (the higher-order-aggregate DP of _uni_viterbi_best — round-14
    optimization; the oracle keeps its 12 AS MATERIALIZED steps
    because a plain CTE chain inlines into a 4¹²-node plan, measured
    hang) spilled once, plus one keyed piece-count shuffle for the
    M-step. Cost per round is a handful of Spark jobs, not data
    volume; rounds are strictly sequential by nature (EM is an
    inherently iterative fixpoint)."""
    from blow_spark.materialize import checkpoint_sublinear

    wf, pcost0 = _uni_wf_pcost(spark, sf_dir)
    # round 1: E-step under θ₀, M-step → θ₁. Each round's Viterbi table
    # materializes ONCE (it feeds the M-step, the occ⋈θ repricing AND
    # the next round) — with the single-plan DP of _uni_viterbi_best
    # this is the only materialization per round, vs 12 per-step spills
    # before the round-14 optimization; round-15 moves it (and every
    # other vocabulary-grain table here) from parquet spill to
    # checkpoint_sublinear — see _uni_wf_pcost.
    best1 = checkpoint_sublinear(_uni_viterbi_best(wf, pcost0, "uniem_r1"))
    occ1, pcost1, tot1 = _uni_m_step(best1, wf)
    stat0 = best1.join(F.broadcast(wf), "word").agg(
        F.sum(F.col("wf") * F.col("cost")).cast("bigint").alias("total0")
    )
    stat1 = (
        occ1.join(F.broadcast(pcost1), "piece")
        .agg(F.sum(F.col("wf") * F.col("c")).cast("bigint").alias("total1"))
    )
    # round 2: E-step under θ₁, M-step → θ₂
    best2 = checkpoint_sublinear(_uni_viterbi_best(wf, pcost1, "uniem_r2"))
    occ2, pcost2, tot2 = _uni_m_step(best2, wf)
    stat2 = (
        occ2.join(F.broadcast(pcost2), "piece")
        .agg(F.sum(F.col("wf") * F.col("c")).cast("bigint").alias("total2"))
    )
    t1 = tot1.select(
        F.col("tk").alias("tk1"), F.col("np").alias("np1")
    )
    t2 = tot2.select(
        F.col("tk").alias("tk2"), F.col("np").alias("np2")
    )
    row0 = (
        stat0.crossJoin(t1)
        .select(
            F.lit(0).cast("bigint").alias("em_round"),
            F.col("total0").alias("total_cost_e6"),
            F.col("np1").alias("n_pieces_used"),
            F.col("tk1").alias("piece_tokens"),
            F.lit(True).alias("monotone_ok"),
        )
    )
    row1 = (
        stat1.crossJoin(stat0).crossJoin(t1)
        .select(
            F.lit(1).cast("bigint").alias("em_round"),
            F.col("total1").alias("total_cost_e6"),
            F.col("np1").alias("n_pieces_used"),
            F.col("tk1").alias("piece_tokens"),
            (F.col("total1") <= F.col("total0") + 2 * F.col("tk1")).alias(
                "monotone_ok"
            ),
        )
    )
    row2 = (
        stat2.crossJoin(stat1).crossJoin(t1).crossJoin(t2)
        .select(
            F.lit(2).cast("bigint").alias("em_round"),
            F.col("total2").alias("total_cost_e6"),
            F.col("np2").alias("n_pieces_used"),
            F.col("tk2").alias("piece_tokens"),
            (
                F.col("total2")
                <= F.col("total1") + F.col("tk1") + F.col("tk2")
            ).alias("monotone_ok"),
        )
    )
    return row0.unionAll(row1).unionAll(row2).orderBy("em_round")


@register(
    "corpus_heldout_bigram_perplexity",
    oracle="""
    WITH tagged AS (
      SELECT doc_id, lang, text,
             CASE WHEN substr(md5(text), 1, 1) <= 'b' THEN 'train'
                  WHEN substr(md5(text), 1, 1) <= 'd' THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    ), toks AS (
      SELECT d.doc_id, d.lang, d.split, t.pos, t.tok
      FROM tagged d,
           LATERAL (SELECT UNNEST(string_split(d.text, ' ')) AS tok,
                           UNNEST(generate_series(
                             1, len(string_split(d.text, ' ')))) AS pos) t
      WHERE t.tok <> ''
    ), bigrams AS (
      SELECT a.lang, a.split, a.tok AS w1, b.tok AS w2
      FROM toks a JOIN toks b
        ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
    ), c2 AS (
      SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2
      FROM bigrams WHERE split = 'train' GROUP BY w1, w2
    ), c1 AS (
      SELECT w1, CAST(SUM(c2) AS BIGINT) AS c1 FROM c2 GROUP BY w1
    ), vocab AS (
      SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS v
      FROM toks WHERE split = 'train'
    ), scored AS (
      SELECT b.lang,
             CAST(ROUND(-LN((COALESCE(c2.c2, 0) + 1.0)
                            / (COALESCE(c1.c1, 0) + v.v)) * 1000000)
                  AS BIGINT) AS nll_e6
      FROM bigrams b
      CROSS JOIN vocab v
      LEFT JOIN c2 ON c2.w1 = b.w1 AND c2.w2 = b.w2
      LEFT JOIN c1 ON c1.w1 = b.w1
      WHERE b.split = 'val'
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS val_bigrams,
           CAST(SUM(nll_e6) AS BIGINT) AS total_nll_e6,
           ROUND(EXP(CAST(SUM(nll_e6) AS DOUBLE) / COUNT(*) / 1000000.0),
                 6) AS perplexity
    FROM scored
    GROUP BY lang
    ORDER BY lang
    """,
    tags=("corpus", "lm", "eval", "documents"),
)
def corpus_heldout_bigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HELD-OUT bigram perplexity per language: the add-one-smoothed
    bigram model is counted on the TRAIN split only and evaluated on
    the VAL split (the same content-addressed split as
    split_train_val_test) — the train/eval hygiene every LM data
    ablation needs, where the existing text_bigram_logprob scores the
    corpus on itself. Smoothed probabilities are rationals
    ((c2+1)/(c1+V)), each token's NLL fix-points to an e6 integer
    BEFORE the per-language sum, and PPL = exp(mean NLL) is the one
    closed-form double at the end.

    Scale: tokenize + two count aggregates (bigram-type and context
    tables are VOCABULARY²-bounded, sublinear in the corpus); scoring
    is one left join of val bigrams against the count tables on the
    bigram key. The vocabulary scalar is a 1-row broadcast."""
    d = read_table(spark, sf_dir, "documents")
    nib = F.substring(F.md5("text"), 1, 1)
    tagged = d.select(
        "doc_id",
        "lang",
        "text",
        F.when(nib <= "b", "train")
        .when(nib <= "d", "val")
        .otherwise("test")
        .alias("split"),
    )
    toks = (
        tagged.select(
            "doc_id",
            "lang",
            "split",
            F.posexplode(F.split("text", " ")).alias("pos0", "tok"),
        )
        .where(F.col("tok") != "")
        .select("doc_id", "lang", "split", (F.col("pos0") + 1).alias("pos"), "tok")
    )
    a = toks.select("doc_id", "lang", "split", "pos", F.col("tok").alias("w1"))
    b = toks.select(
        F.col("doc_id").alias("doc_b"),
        (F.col("pos") - 1).alias("pos_b"),
        F.col("tok").alias("w2"),
    )
    bigrams = a.join(
        b, (F.col("doc_id") == F.col("doc_b")) & (F.col("pos") == F.col("pos_b"))
    ).select("lang", "split", "w1", "w2")
    c2 = (
        bigrams.where(F.col("split") == "train")
        .groupBy("w1", "w2")
        .agg(F.count("*").cast("bigint").alias("c2"))
    )
    c1 = c2.groupBy("w1").agg(F.sum("c2").cast("bigint").alias("c1"))
    vocab = (
        toks.where(F.col("split") == "train")
        .agg(F.countDistinct("tok").cast("bigint").alias("v"))
    )
    scored = (
        bigrams.where(F.col("split") == "val")
        .crossJoin(F.broadcast(vocab))
        .join(c2, ["w1", "w2"], "left")
        .join(c1, "w1", "left")
        .select(
            "lang",
            F.round(
                -F.log(
                    (F.coalesce(F.col("c2"), F.lit(0)) + 1.0)
                    / (F.coalesce(F.col("c1"), F.lit(0)) + F.col("v"))
                )
                * 1_000_000
            )
            .cast("bigint")
            .alias("nll_e6"),
        )
    )
    return (
        scored.groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("val_bigrams"),
            F.sum("nll_e6").cast("bigint").alias("total_nll_e6"),
        )
        .select(
            "lang",
            "val_bigrams",
            "total_nll_e6",
            F.round(
                F.exp(
                    F.col("total_nll_e6").cast("double")
                    / F.col("val_bigrams")
                    / 1_000_000.0
                ),
                6,
            ).alias("perplexity"),
        )
        .orderBy("lang")
    )


@register(
    "text_lexical_diversity_ttr",
    oracle="""
    WITH toks AS (
      SELECT d.lang, t.tok
      FROM documents d,
           LATERAL (SELECT UNNEST(string_split(d.text, ' ')) AS tok) t
      WHERE t.tok <> ''
    ), m AS (
      SELECT lang,
             CAST(COUNT(*) AS BIGINT) AS n_tokens,
             CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_types
      FROM toks GROUP BY lang
    )
    SELECT lang, n_tokens, n_types,
           ROUND(CAST(n_types AS DOUBLE) / n_tokens, 6) AS ttr,
           ROUND(LN(CAST(n_types AS DOUBLE)) / LN(CAST(n_tokens AS DOUBLE)),
                 6) AS herdan_c,
           ROUND(CAST(n_types AS DOUBLE)
                 / SQRT(CAST(n_tokens AS DOUBLE)), 6) AS guiraud_r
    FROM m
    ORDER BY lang
    """,
    tags=("text", "quality", "documents"),
)
def text_lexical_diversity_ttr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical diversity per language: raw type-token ratio plus the
    two length-corrected classics — Herdan's C (ln V / ln N, stable
    under corpus growth where raw TTR collapses) and Guiraud's R
    (V/√N) — the vocabulary-richness signals a corpus-quality
    dashboard tracks next to the entropy and repetition batteries
    (low diversity flags template/boilerplate floods). Exact integer
    type/token counts; the ratios are closed-form doubles under the
    documented ln allowance.

    Scale: one tokenize pass, one (lang, token)-keyed distinct and a
    lang-keyed count — vocabulary-bounded state, corpus-linear
    scan."""
    d = read_table(spark, sf_dir, "documents")
    toks = d.select(
        "lang", F.explode(F.split("text", " ")).alias("tok")
    ).where(F.col("tok") != "")
    m = toks.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_tokens"),
        F.countDistinct("tok").cast("bigint").alias("n_types"),
    )
    nt = F.col("n_tokens").cast("double")
    ty = F.col("n_types").cast("double")
    return m.select(
        "lang",
        "n_tokens",
        "n_types",
        F.round(ty / nt, 6).alias("ttr"),
        F.round(F.log(ty) / F.log(nt), 6).alias("herdan_c"),
        F.round(ty / F.sqrt(nt), 6).alias("guiraud_r"),
    ).orderBy("lang")


@register(
    "dedup_rate_by_source",
    oracle="""
    WITH hashed AS (
      SELECT source, md5(text) AS h, n_chars FROM documents
    ), per_hash AS (
      SELECT source, h, CAST(COUNT(*) AS BIGINT) AS c,
             CAST(SUM(n_chars) AS BIGINT) AS bytes_all,
             CAST(MIN(n_chars) AS BIGINT) AS bytes_keep
      FROM hashed GROUP BY source, h
    )
    SELECT source,
           CAST(SUM(c) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_unique,
           CAST(SUM(c) - COUNT(*) AS BIGINT) AS n_dupes,
           ROUND(CAST(SUM(c) - COUNT(*) AS DOUBLE) / SUM(c), 6)
             AS dup_rate,
           CAST(SUM(bytes_all - bytes_keep) AS BIGINT)
             AS reclaimable_chars
    FROM per_hash
    GROUP BY source
    ORDER BY source
    """,
    tags=("dedup", "governance", "documents"),
)
def dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source exact-duplicate rate report — the governance readout
    a data-acquisition team reads BEFORE running the expensive near-
    dup passes ("which feed is flooding us with copies, and how many
    chars would dedup reclaim?"). Content-addressed by md5(text)
    WITHIN source, so cross-source near-identical content stays out
    of scope (that is dedup_minhash_lsh's job); reports doc counts,
    unique counts, dup rate, and reclaimable character volume.

    Scale: digests computed where the text lives; the shuffle carries
    (source, 16-byte digest, length) — never bodies; two keyed
    aggregates, the same shape as multimodal_payload_dedup."""
    d = read_table(spark, sf_dir, "documents")
    per_hash = d.select(
        "source", F.md5("text").alias("h"), "n_chars"
    ).groupBy("source", "h").agg(
        F.count("*").cast("bigint").alias("c"),
        F.sum("n_chars").cast("bigint").alias("bytes_all"),
        F.min("n_chars").cast("bigint").alias("bytes_keep"),
    )
    return (
        per_hash.groupBy("source")
        .agg(
            F.sum("c").cast("bigint").alias("n_docs"),
            F.count("*").cast("bigint").alias("n_unique"),
            (F.sum("c") - F.count("*")).cast("bigint").alias("n_dupes"),
            F.round(
                (F.sum("c") - F.count("*")).cast("double") / F.sum("c"), 6
            ).alias("dup_rate"),
            F.sum(F.col("bytes_all") - F.col("bytes_keep"))
            .cast("bigint")
            .alias("reclaimable_chars"),
        )
        .orderBy("source")
    )


_PMI_MIN_COUNT = 5
_PMI_TOPK = 20


@register(
    "text_pmi_collocations",
    oracle=rf"""
    WITH toks AS (
      SELECT doc_id, tok, pos
      FROM (
        SELECT doc_id,
               unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok,
               generate_subscripts(
                 regexp_split_to_array(trim(lower(text)), '\s+'), 1) AS pos
        FROM documents
      )
    ), bg AS (
      SELECT doc_id, tok AS w1,
             LEAD(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
      FROM toks
    ), bigrams AS (
      SELECT w1, w2 FROM bg WHERE w2 IS NOT NULL
    ), c12 AS (
      SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
      FROM bigrams GROUP BY w1, w2
    ), cw AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS cw FROM toks GROUP BY tok
    ), nt AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS nt FROM toks
    ), nb AS (
      SELECT CAST(SUM(c12) AS BIGINT) AS nb FROM c12
    )
    SELECT s.w1, s.w2, s.c12, a.cw AS c1, b.cw AS c2,
           CAST(ROUND(LN(CAST(s.c12 AS DOUBLE) * nt.nt * nt.nt
                         / (CAST(nb.nb AS DOUBLE) * a.cw * b.cw))
                      * 1000000) AS BIGINT) AS pmi_e6
    FROM c12 s
    JOIN cw a ON a.tok = s.w1
    JOIN cw b ON b.tok = s.w2
    CROSS JOIN nt CROSS JOIN nb
    WHERE s.c12 >= {_PMI_MIN_COUNT}
    ORDER BY pmi_e6 DESC, s.w1, s.w2
    LIMIT {_PMI_TOPK}
    """,
    tags=("text", "collocation", "documents"),
)
def text_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise-mutual-information collocations (Church & Hanks, CL
    1990) — the classic "statistically glued" adjacent-word-pair
    detector a corpus pipeline uses to find multiword units before
    tokenizer training: PMI = ln(p(w1,w2)/(p(w1)p(w2))) with the joint
    over bigram positions and marginals over token positions, minimum
    joint count 5, top-20 by PMI with a totally-ordered tiebreak.

    Engine-exact: counts BIGINT; PMI is one LN over a single chain of
    multiply/divide on identical operands, fix-pointed to e6 (the
    catalog's 1-ulp allowance).

    Scale: bigram and unigram tables are vocabulary-sized after one
    (w1,w2)-keyed and one token-keyed map-side-combinable count; the
    min-count cut prunes the long tail BEFORE the marginal joins; the
    1-row totals broadcast. Same shuffle inventory as
    text_bigram_logprob minus its corpus-scale re-join."""
    from blow_spark import functions as BF

    d = read_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.posexplode(BF.tokenize_ws(F.lower(F.col("text")))).alias("pos", "tok"),
    )
    bigrams = (
        toks.select(
            "doc_id",
            F.col("tok").alias("w1"),
            F.lead("tok").over(W.partitionBy("doc_id").orderBy("pos")).alias("w2"),
        )
        .filter(F.col("w2").isNotNull())
        .select("w1", "w2")
    )
    c12 = bigrams.groupBy("w1", "w2").agg(
        F.count("*").cast("bigint").alias("c12")
    )
    cw = toks.groupBy("tok").agg(F.count("*").cast("bigint").alias("cw"))
    # total tokens from the vocab table, not a second corpus pass
    nt = cw.agg(F.sum("cw").cast("bigint").alias("nt"))
    nb = c12.agg(F.sum("c12").cast("bigint").alias("nb"))
    a = cw.select(F.col("tok").alias("w1"), F.col("cw").alias("c1"))
    b = cw.select(F.col("tok").alias("w2"), F.col("cw").alias("c2"))
    return (
        c12.where(F.col("c12") >= _PMI_MIN_COUNT)
        .join(a, "w1")
        .join(b, "w2")
        .crossJoin(F.broadcast(nt))
        .crossJoin(F.broadcast(nb))
        .select(
            "w1",
            "w2",
            "c12",
            "c1",
            "c2",
            F.round(
                F.log(
                    F.col("c12").cast("double")
                    * F.col("nt")
                    * F.col("nt")
                    / (
                        F.col("nb").cast("double")
                        * F.col("c1")
                        * F.col("c2")
                    )
                )
                * 1_000_000
            )
            .cast("bigint")
            .alias("pmi_e6"),
        )
        .orderBy(F.col("pmi_e6").desc(), "w1", "w2")
        .limit(_PMI_TOPK)
    )


@register(
    "text_flesch_reading_ease",
    oracle=r"""
    WITH m AS (
      SELECT doc_id,
             CAST(len(list_filter(string_split(text, ' '),
                                  x -> x <> '')) AS BIGINT) AS n_words,
             CAST(GREATEST(1, len(regexp_extract_all(text, '[.!?]')))
                  AS BIGINT) AS n_sentences,
             CAST(GREATEST(1, len(regexp_extract_all(lower(text),
                                                     '[aeiouy]+')))
                  AS BIGINT) AS n_syllables
      FROM documents
    )
    SELECT doc_id, n_words, n_sentences, n_syllables,
           CAST(ROUND((206.835
                       - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
                       - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words))
                      * 1000000) AS BIGINT) AS flesch_e6
    FROM m
    ORDER BY doc_id
    """,
    tags=("text", "quality", "documents"),
)
def text_flesch_reading_ease(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease score (Flesch 1948) per document — the
    readability feature every text-quality stack carries next to the
    length/punctuation ratios in queries/text.py: 206.835 −
    1.015·(words/sentences) − 84.6·(syllables/words), with syllables
    approximated as vowel-group runs (the standard heuristic when no
    dictionary is available) and both denominators floored at 1.

    Engine-exact: the three counts are integer regexp/split
    cardinalities computed identically by both engines; the score is
    two single divisions of identical BIGINT operands and constant
    arithmetic, fix-pointed to e6.

    Scale: map-only — no shuffle at all, no Python; the regexp work
    happens in the scan stage."""
    d = read_table(spark, sf_dir, "documents")
    m = d.select(
        "doc_id",
        F.size(F.filter(F.split(F.col("text"), " "), lambda x: x != ""))
        .cast("bigint")
        .alias("n_words"),
        F.greatest(
            F.lit(1),
            F.size(F.expr("regexp_extract_all(text, '[.!?]', 0)")),
        )
        .cast("bigint")
        .alias("n_sentences"),
        F.greatest(
            F.lit(1),
            F.size(F.expr("regexp_extract_all(lower(text), '[aeiouy]+', 0)")),
        )
        .cast("bigint")
        .alias("n_syllables"),
    )
    return m.select(
        "doc_id",
        "n_words",
        "n_sentences",
        "n_syllables",
        F.round(
            (
                F.lit(206.835)
                - F.lit(1.015)
                * (F.col("n_words").cast("double") / F.col("n_sentences"))
                - F.lit(84.6)
                * (F.col("n_syllables").cast("double") / F.col("n_words"))
            )
            * 1_000_000
        )
        .cast("bigint")
        .alias("flesch_e6"),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# Per-source length-distribution KL divergence (round 10)
# --------------------------------------------------------------------------

_KL_BUCKET = 50  # n_chars bucket width → ≤ ~12 buckets over the fixture domain


@register(
    "corpus_length_kl_by_source",
    oracle=f"""
    WITH bucketed AS (
      SELECT source, n_chars // {_KL_BUCKET} AS bucket FROM documents
    ), per_src AS (
      SELECT source, bucket, CAST(COUNT(*) AS BIGINT) AS c
      FROM bucketed GROUP BY source, bucket
    ), src_tot AS (
      SELECT source, CAST(SUM(c) AS BIGINT) AS n_src FROM per_src
      GROUP BY source
    ), gbl AS (
      SELECT bucket, CAST(SUM(c) AS BIGINT) AS g FROM per_src GROUP BY bucket
    ), gbl_tot AS (
      SELECT CAST(SUM(g) AS BIGINT) AS n_all FROM gbl
    ), terms AS (
      SELECT p.source,
             CAST(ROUND(CAST(p.c AS DOUBLE) / t.n_src
                        * LN(CAST(p.c AS DOUBLE) * gt.n_all
                             / (CAST(g.g AS DOUBLE) * t.n_src))
                        * 1000000) AS BIGINT) AS term_e6
      FROM per_src p
      JOIN src_tot t USING (source)
      JOIN gbl g USING (bucket)
      CROSS JOIN gbl_tot gt
    )
    SELECT source, CAST(SUM(term_e6) AS BIGINT) AS kl_e6_sum,
           ROUND(CAST(SUM(term_e6) AS DOUBLE) / 1e6, 4) AS kl_nats
    FROM terms GROUP BY source
    ORDER BY source
    """,
    tags=("corpus", "text", "stats"),
)
def corpus_length_kl_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KL divergence of each source's document-length distribution from
    the corpus-wide distribution, over {_KL_BUCKET}-char buckets — the
    data-mix drift diagnostic a pretraining pipeline runs per ingest
    (is this source's length profile unusual?); KL(p‖q) in nats via
    Σ p·ln(p/q). The log argument collapses to a ratio of four exact
    BIGINTs (c·N / (g·n_src)), each term is ONE division + one log,
    fix-pointed at e6 per (source, bucket) cell — the bucket domain is
    bounded (≤ ~12 cells per source at any corpus size), so the
    per-term sums are exact integers in both engines. e6 (not the
    house e9) is deliberate: LN runs at query time in BOTH engines,
    and a JVM-vs-libm ulp could flip an e9 term on a .5 rounding
    boundary; e6 widens the guard band 1000×. Every source
    bucket's mass is a subset of the global bucket's, so q > 0 wherever
    p > 0 — no smoothing needed by construction.

    Scale: one (source, bucket)-keyed count reduces the corpus; the
    global marginals re-aggregate that cell table (bounded), and the
    1-row corpus total broadcasts. Complements drift_psi_by_source
    (PSI on a different feature axis) with the information-theoretic
    functional."""
    from blow_spark.materialize import spill_to_parquet

    d = read_table(spark, sf_dir, "documents")
    # the cell table feeds three branches (terms, per-source totals,
    # global marginals); spilled so the corpus scan+count runs once
    per_src = spill_to_parquet(
        d.select("source", F.expr(f"n_chars div {_KL_BUCKET}").alias("bucket"))
        .groupBy("source", "bucket")
        .agg(F.count("*").cast("bigint").alias("c")),
        "blow_spark_kl_cells_",
    )
    src_tot = per_src.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("n_src")
    )
    glob = per_src.groupBy("bucket").agg(F.sum("c").cast("bigint").alias("g"))
    glob_tot = glob.agg(F.sum("g").cast("bigint").alias("n_all"))
    terms = (
        per_src.join(F.broadcast(src_tot), "source")
        .join(F.broadcast(glob), "bucket")
        .crossJoin(F.broadcast(glob_tot))
        .select(
            "source",
            F.round(
                F.col("c").cast("double")
                / F.col("n_src")
                * F.log(
                    F.col("c").cast("double")
                    * F.col("n_all")
                    / (F.col("g").cast("double") * F.col("n_src"))
                )
                * 1e6
            )
            .cast("bigint")
            .alias("term_e6"),
        )
    )
    return (
        terms.groupBy("source")
        .agg(F.sum("term_e6").cast("bigint").alias("kl_e6_sum"))
        .select(
            "source",
            "kl_e6_sum",
            F.round(F.col("kl_e6_sum").cast("double") / 1e6, 4).alias("kl_nats"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# WordPiece greedy longest-match tokenizer (round 10)
# --------------------------------------------------------------------------

_WP_MAX_WORD = 12
_WP_MAX_PIECE = 4
_WP_VOCAB_K = 200  # multi-char vocab entries (all single chars always kept)
_WP_TOPK = 40

_WP_POSITIONS = [
    (i, l)
    for i in range(1, _WP_MAX_WORD + 1)
    for l in range(1, _WP_MAX_PIECE + 1)
    if i + l - 1 <= _WP_MAX_WORD
]


def _wp_oracle_sql() -> str:
    """Unrolled greedy longest-match chain: one MATERIALIZED CTE per
    consume step (each step eats ≥1 char, so ⌈max_word⌉ steps suffice),
    mirroring the Spark side's per-step spill — the same inline-vs-
    materialize lesson the unigram Viterbi oracle learned."""
    pos_values = ", ".join(f"({i}, {l})" for i, l in _WP_POSITIONS)
    ctes = [
        f"""tok AS MATERIALIZED (
      SELECT UNNEST(string_split(text, ' ')) AS word FROM documents
    )""",
        f"""wf AS MATERIALIZED (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS wf FROM tok
      WHERE word <> '' AND LENGTH(word) <= {_WP_MAX_WORD}
      GROUP BY word
    )""",
        f"""pospairs(i, l) AS (VALUES {pos_values})""",
        """piece_occ AS MATERIALIZED (
      SELECT CASE WHEN p.i = 1 THEN substring(w.word, p.i, p.l)
                  ELSE '##' || substring(w.word, p.i, p.l) END AS key,
             p.l AS l,
             CAST(SUM(w.wf) AS BIGINT) AS cnt
      FROM wf w JOIN pospairs p ON p.i + p.l - 1 <= LENGTH(w.word)
      GROUP BY 1, 2
    )""",
        f"""vocab AS MATERIALIZED (
      SELECT key, l FROM piece_occ WHERE l = 1
      UNION
      SELECT key, l FROM (
        SELECT key, l FROM piece_occ WHERE l > 1
        ORDER BY cnt DESC, key LIMIT {_WP_VOCAB_K}
      )
    )""",
        """s0 AS MATERIALIZED (
      SELECT word, 1 AS pos, '' AS seg FROM wf
    )""",
    ]
    prev = "s0"
    for k in range(1, _WP_MAX_WORD + 1):
        ctes.append(
            f"""s{k} AS MATERIALIZED (
      SELECT s.word,
             CASE WHEN s.pos > LENGTH(s.word) THEN s.pos
                  ELSE s.pos + MAX(v.l) END AS pos,
             CASE WHEN s.pos > LENGTH(s.word) THEN s.seg
                  ELSE s.seg || ' ' || arg_max(v.key, v.l) END AS seg
      FROM {prev} s
      LEFT JOIN pospairs p
        ON p.i = 1 AND s.pos + p.l - 1 <= LENGTH(s.word)
        AND s.pos <= LENGTH(s.word)
      LEFT JOIN vocab v
        ON v.key = CASE WHEN s.pos = 1
                        THEN substring(s.word, s.pos, p.l)
                        ELSE '##' || substring(s.word, s.pos, p.l) END
        AND v.l = p.l
      GROUP BY s.word, s.pos, s.seg
    )"""
        )
        prev = f"s{k}"
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT w.word, w.wf,
           CAST(LENGTH(s.seg) - LENGTH(REPLACE(s.seg, ' ', ''))
                AS BIGINT) AS n_pieces,
           TRIM(s.seg) AS segmentation
    FROM {prev} s JOIN wf w ON w.word = s.word
    ORDER BY w.wf DESC, w.word
    LIMIT {_WP_TOPK}"""
    )


@register(
    "tokenizer_wordpiece_greedy",
    oracle=_wp_oracle_sql(),
    tags=("tokenizer", "text", "corpus"),
)
def tokenizer_wordpiece_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WordPiece greedy longest-match-first tokenization (Wu et al.
    2016, the BERT tokenizer) — the third member of the tokenizer trio
    next to BPE (tokenizer_bpe_merges) and unigram-LM Viterbi
    (tokenizer_unigram_viterbi_segment): a data-derived vocabulary of
    word-initial and '##'-continuation pieces (all single characters
    plus the top-{_WP_VOCAB_K} multi-char pieces by corpus-weighted
    frequency, ties broken lexically), then each word consumed left to
    right taking the LONGEST vocab piece at each position. Because
    every single character is in the vocabulary by construction, no
    word hits UNK and each step consumes ≥ 1 char, so
    {_WP_MAX_WORD} unrolled steps segment every word exactly.

    Scale: all state is WORD-grain — the distinct-word table, never the
    corpus (the corpus is touched once, for frequencies). The longest
    vocab match per (word, position) is precomputed by ONE broadcast
    join against the bounded vocabulary + one word-keyed argmax, and
    the 12-step left-to-right consume loop runs inside a single JVM
    higher-order `aggregate` expression (round-14 optimization — the
    old per-step spill chain existed because a naive 12-step lazy
    chain re-derives every prior step per reference, the same
    plan-inlining blowup the Viterbi DP measured; a single expression
    over a per-word map has no such blowup, and the oracle keeps its
    MATERIALIZED CTEs). Greedy selection is exact integer/string
    logic — no doubles anywhere, so the driver hash pins the entire
    matcher."""
    from blow_spark.materialize import spill_to_parquet

    d = read_table(spark, sf_dir, "documents")
    tok = d.select(F.explode(F.split(F.col("text"), " ")).alias("word")).where(
        (F.col("word") != "") & (F.length("word") <= _WP_MAX_WORD)
    )
    wf = spill_to_parquet(
        tok.groupBy("word").agg(F.count("*").cast("bigint").alias("wf")),
        "blow_spark_wp_wf_",
    )
    pos_df = spark.createDataFrame(_WP_POSITIONS, "i int, l int")
    key_expr = F.when(
        F.col("i") == 1, F.expr("substring(word, i, l)")
    ).otherwise(F.concat(F.lit("##"), F.expr("substring(word, i, l)")))
    piece_occ = (
        wf.join(
            F.broadcast(pos_df),
            F.col("i") + F.col("l") - 1 <= F.length("word"),
        )
        .groupBy(key_expr.alias("key"), "l")
        .agg(F.sum("wf").cast("bigint").alias("cnt"))
    )
    singles = piece_occ.where(F.col("l") == 1).select("key", "l")
    multi = (
        piece_occ.where(F.col("l") > 1)
        .orderBy(F.desc("cnt"), "key")
        .limit(_WP_VOCAB_K)
        .select("key", "l")
    )
    vocab = spill_to_parquet(singles.union(multi).distinct(), "blow_spark_wp_vocab_")

    # Optimization round 14 (guide §2.4/§4.1): the greedy consume loop
    # used to run as 12 MATERIALIZED steps — each a broadcast vocab join
    # + a (word, pos, seg)-keyed aggregate (one shuffle) + a parquet
    # spill, ~24 jobs per run over the WORD-grain state table. It now
    # runs as ONE plan: per (word, position) the longest matching vocab
    # piece is precomputed (the same broadcast vocab join, once), packed
    # into a per-word map (the only shuffles: the (word, i) argmax and
    # the word-keyed map build, both map-side combinable), and the
    # 12-step left-to-right walk happens inside a single JVM
    # higher-order `aggregate` expression — no per-step spill, no
    # Python. Equivalence (oracle-checked at sf0.001 + sf0.01): the
    # per-position argmax over (l, key) is identical (l values are
    # distinct per position, so max l determines the key); every single
    # char is in the vocabulary by construction, so the walk always
    # advances and terminates within 12 steps exactly as before.
    hits = (
        wf.select("word")
        .crossJoin(F.broadcast(pos_df))
        .where(F.col("i") + F.col("l") - 1 <= F.length("word"))
        .select(
            "word",
            "i",
            "l",
            F.when(F.col("i") == 1, F.expr("substring(word, i, l)"))
            .otherwise(
                F.concat(F.lit("##"), F.expr("substring(word, i, l)"))
            )
            .alias("key"),
        )
        .join(F.broadcast(vocab), ["key", "l"])
        .groupBy("word", "i")
        .agg(
            F.max("l").alias("best_l"),
            F.max_by("key", "l").alias("best_key"),
        )
        .groupBy("word")
        .agg(
            F.map_from_entries(
                F.collect_list(
                    F.struct(
                        F.col("i").alias("k"),
                        F.struct(
                            F.col("best_l").alias("l"),
                            F.col("best_key").alias("key"),
                        ).alias("v"),
                    )
                )
            ).alias("m")
        )
    )

    def step(acc, _k):
        pos = acc["pos"]
        hit = F.try_element_at(F.col("m"), pos)
        return F.when(pos > F.length("word"), acc).otherwise(
            F.struct(
                (pos + hit["l"]).alias("pos"),
                F.concat(acc["seg"], F.lit(" "), hit["key"]).alias("seg"),
            )
        )

    state = F.aggregate(
        F.sequence(F.lit(1), F.lit(_WP_MAX_WORD)),
        F.struct(F.lit(1).cast("int").alias("pos"), F.lit("").alias("seg")),
        step,
    )
    return (
        hits.select("word", state.alias("st"))
        .join(wf, "word")
        .select(
            "word",
            "wf",
            (
                F.length("st.seg")
                - F.length(F.replace(F.col("st.seg"), F.lit(" ")))
            )
            .cast("bigint")
            .alias("n_pieces"),
            F.trim(F.col("st.seg")).alias("segmentation"),
        )
        .orderBy(F.desc("wf"), "word")
        .limit(_WP_TOPK)
    )


_TR_STEP = """
      SELECT e.dst AS node,
             CAST(150000000 + (85 * SUM((CAST(e.nw_e6 AS HUGEINT)
                                         * p.pr_e9) // 1000000)) // 100
                  AS BIGINT) AS pr_e9
      FROM nwe e JOIN {prev} p ON p.node = e.src
      GROUP BY e.dst
"""


@register(
    "text_textrank_keywords",
    oracle=rf"""
    WITH toks AS (
      SELECT regexp_split_to_array(trim(lower(text)), '\s+') AS t
      FROM documents
    ), adj AS (
      SELECT t[g] AS a, t[g + 1] AS b
      FROM toks, LATERAL (SELECT UNNEST(range(1, len(t))) AS g) _
      WHERE len(t) >= 2
    ), und AS (
      SELECT LEAST(a, b) AS u, GREATEST(a, b) AS v,
             CAST(COUNT(*) AS BIGINT) AS w
      FROM adj
      WHERE LENGTH(a) >= 3 AND LENGTH(b) >= 3 AND a <> b
      GROUP BY 1, 2
    ), edges AS (
      SELECT u AS src, v AS dst, w FROM und
      UNION ALL
      SELECT v AS src, u AS dst, w FROM und
    ), wdeg AS (
      SELECT src, CAST(SUM(w) AS BIGINT) AS wd FROM edges GROUP BY src
    ), nwe AS (
      SELECT e.src, e.dst, (e.w * 1000000) // d.wd AS nw_e6
      FROM edges e JOIN wdeg d ON d.src = e.src
    ), n_ AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n FROM wdeg
    ), p0 AS (
      SELECT src AS node, 1000000000 // n_.n AS pr_e9 FROM wdeg CROSS JOIN n_
    ), p1 AS ({_TR_STEP.format(prev="p0")}),
    p2 AS ({_TR_STEP.format(prev="p1")}),
    p3 AS ({_TR_STEP.format(prev="p2")})
    SELECT p3.node AS keyword, CAST(p3.pr_e9 AS BIGINT) AS pr_e9,
           d.wd AS weighted_degree, ec.n_neighbors
    FROM p3
    JOIN wdeg d ON d.src = p3.node
    JOIN (SELECT src, CAST(COUNT(*) AS BIGINT) AS n_neighbors
          FROM edges GROUP BY src) ec ON ec.src = p3.node
    ORDER BY p3.pr_e9 DESC, p3.node
    """,
    tags=("text", "keywords", "graph", "iterative"),
)
def text_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau, EMNLP 2004):
    corpus-level weighted PageRank (d = 0.85, 3 unrolled iterations)
    over the word co-occurrence graph — vertices are candidate tokens
    (length ≥ 3), edges connect ADJACENT candidates (window 2 over the
    original token stream), weighted by corpus co-occurrence count.

    Engine-exactness: unlike graph_pagerank_bipartite's end-rounded
    doubles, the whole iteration is FIXED-POINT INTEGER — transition
    weights are pre-normalized once to e6 (nw = w·10⁶ div wdeg), ranks
    live at e9, and each step is
    pr' = 0.15e9 + (85·Σ(nw·pr div 10⁶)) div 100 — every operation a
    positive-integer floor division with identical semantics in both
    engines, so all three iterations compare EXACTLY (no 1e-15
    summation-order slack to round away). The per-edge product
    nw_e6·pr_e9 and the per-node transfer sum are carried in
    DECIMAL(38,0)/HUGEINT (round-14 ADVICE fix: the product is NOT
    int64-safe unconditionally — total rank mass grows to
    ≈ 0.41e9·|V| over the 3 steps, so a hub rank concentrated from
    ~10⁵ high-nw neighbors pushes nw·pr past 2⁶³ long before the
    ranks themselves do). The remaining envelope is the BIGINT pr_e9
    OUTPUT column itself: exact while per-node rank < 2⁶³, i.e.
    vocabularies to ~2·10¹⁰ distinct terms — hub topology can no
    longer overflow any intermediate.

    Scale: the corpus-proportional work is ONE map-side pass (the
    adjacency pairs come from an in-array transform, never a
    positional self-join) into a vocabulary-pair-grain count — the
    same reduce-to-domain-then-iterate shape as the tokenizers; the
    3 rank iterations join edge and rank tables at vocabulary grain
    (spilled once, reused each round)."""
    from blow_spark.materialize import spill_to_parquet

    d = read_table(spark, sf_dir, "documents")
    toks = d.select(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+").alias("t")
    )
    adj = (
        toks.where(F.size("t") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t) - 1),"
                    " i -> struct(t[i-1] AS a, t[i] AS b))"
                )
            ).alias("z")
        )
        .select(F.col("z.a").alias("a"), F.col("z.b").alias("b"))
    )
    und = (
        adj.where(
            (F.length("a") >= 3)
            & (F.length("b") >= 3)
            & (F.col("a") != F.col("b"))
        )
        .groupBy(
            F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
        )
        .agg(F.count("*").alias("w"))
    )
    edges = und.select(
        F.col("u").alias("src"), F.col("v").alias("dst"), "w"
    ).unionByName(
        und.select(F.col("v").alias("src"), F.col("u").alias("dst"), "w")
    )
    wdeg = edges.groupBy("src").agg(F.sum("w").cast("bigint").alias("wd"))
    nwe = spill_to_parquet(
        edges.join(wdeg, "src").select(
            "src", "dst", F.expr("(w * 1000000L) div wd").alias("nw_e6")
        ),
        "blow_spark_textrank_",
    )
    wdeg_s = spill_to_parquet(wdeg, "blow_spark_textrank_deg_")
    n_ = wdeg_s.agg(F.count("*").cast("bigint").alias("n"))
    pr = wdeg_s.crossJoin(F.broadcast(n_)).select(
        F.col("src").alias("node"),
        F.expr("1000000000L div n").alias("pr_e9"),
    )
    for _ in range(3):
        pr = (
            nwe.join(pr, F.col("node") == F.col("src"))
            .groupBy("dst")
            .agg(
                (
                    F.lit(150000000).cast("bigint")
                    + F.expr(
                        "(85 * sum(cast((cast(nw_e6 as decimal(38,0))"
                        " * pr_e9) div 1000000 as decimal(38,0))))"
                        " div 100"
                    )
                ).alias("pr_e9")
            )
            .select(F.col("dst").alias("node"), "pr_e9")
        )
    ec = nwe.groupBy("src").agg(F.count("*").cast("bigint").alias("n_neighbors"))
    return (
        pr.join(wdeg_s, F.col("node") == wdeg_s["src"])
        .drop(wdeg_s["src"])
        .join(ec, F.col("node") == ec["src"])
        .drop(ec["src"])
        .select(
            F.col("node").alias("keyword"),
            "pr_e9",
            F.col("wd").alias("weighted_degree"),
            "n_neighbors",
        )
        .orderBy(F.col("pr_e9").desc(), "keyword")
    )


def _sym_d1(col: str) -> str:
    """SQL list of all 1-deletion variants of ``col`` (DuckDB form)."""
    return (
        f"list_transform(range(1, len({col}) + 1), "
        f"i -> substr({col}, 1, i - 1) || substr({col}, i + 1, len({col})))"
    )


@register(
    "text_symspell_correction",
    oracle=rf"""
    WITH vocab AS (
      SELECT tok AS term, CAST(COUNT(*) AS BIGINT) AS freq
      FROM (
        SELECT UNNEST(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
        FROM documents
      ) WHERE LENGTH(tok) >= 3
      GROUP BY tok
    ), vix AS (
      SELECT term, freq, UNNEST(
        list_distinct(list_concat(
          [term],
          list_concat(
            {_sym_d1('term')},
            flatten(list_transform({_sym_d1('term')},
                                   w -> {_sym_d1('w')}))
          )
        ))
      ) AS variant
      FROM vocab
    ), typos AS (
      SELECT term AS source, freq AS source_freq,
             substr(term, 1,
                    CAST(CAST(CONCAT('0x', substr(md5(term), 1, 6))
                              AS BIGINT) % LENGTH(term) AS INTEGER))
             || substr(term,
                       CAST(CAST(CONCAT('0x', substr(md5(term), 1, 6))
                                 AS BIGINT) % LENGTH(term) AS INTEGER) + 2)
               AS typo
      FROM vocab WHERE LENGTH(term) >= 4
    ), tix AS (
      SELECT source, typo, UNNEST(
        list_distinct(list_concat(
          [typo],
          list_concat(
            {_sym_d1('typo')},
            flatten(list_transform({_sym_d1('typo')},
                                   w -> {_sym_d1('w')}))
          )
        ))
      ) AS variant
      FROM typos
    ), cand AS (
      SELECT DISTINCT t.source, t.typo, v.term, v.freq
      FROM tix t JOIN vix v ON v.variant = t.variant
    ), verified AS (
      SELECT source, typo, term, freq,
             CAST(levenshtein(typo, term) AS BIGINT) AS dist
      FROM cand
      WHERE levenshtein(typo, term) <= 2
    ), b1 AS (
      SELECT source, typo, MIN(dist) AS mindist,
             CAST(COUNT(*) AS BIGINT) AS n_candidates
      FROM verified GROUP BY source, typo
    ), b2 AS (
      SELECT v.source, v.typo, b1.mindist, b1.n_candidates,
             MAX(v.freq) AS maxfreq
      FROM verified v
      JOIN b1 ON b1.source = v.source AND b1.typo = v.typo
             AND v.dist = b1.mindist
      GROUP BY 1, 2, 3, 4
    )
    SELECT v.source, v.typo, MIN(v.term) AS correction,
           b2.mindist AS edit_distance, b2.maxfreq AS correction_freq,
           b2.n_candidates,
           MIN(v.term) = v.source AS recovered
    FROM verified v
    JOIN b2 ON b2.source = v.source AND b2.typo = v.typo
           AND v.dist = b2.mindist AND v.freq = b2.maxfreq
    GROUP BY v.source, v.typo, b2.mindist, b2.maxfreq, b2.n_candidates
    ORDER BY v.source
    """,
    tags=("text", "fuzzy", "join"),
)
def text_symspell_correction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SymSpell spelling correction (Garbe's symmetric-delete
    algorithm): fuzzy lookup at edit distance ≤ 2 becomes an EXACT
    equi-join by indexing BOTH sides under their ≤2-deletion
    neighborhoods — Garbe's completeness argument: any pair within
    Levenshtein 2 shares a deletion variant when both sides delete up
    to 2 (substitutions delete the differing position from each side,
    insertions delete from the longer side) — and candidates are then
    VERIFIED with true Levenshtein, so the blocking is lossless the
    same way dedup_jaccard_prefix_filter's is. Queries are
    deterministic synthetic typos: each vocab term ≥ 4 chars drops
    the md5-derived character. Per typo: the best correction by
    (edit distance, corpus frequency DESC, term), candidate count,
    and whether the original term was recovered.

    Engine-exactness: everything is strings, BIGINT counts, and both
    engines' built-in unit-cost Levenshtein; the (dist, −freq, term)
    argmin is a lexicographic struct MIN in both.

    Scale: the delete index is VOCABULARY-grain (terms × ~L² variants
    — the classic SymSpell space-for-join trade, ~1e8 rows for a 1M
    vocab, built once and reusable); the corpus contributes one
    map-side token-count pass; the candidate join is an equi-join on
    variant strings with verification only on the (small) collision
    set — never an all-pairs distance scan."""
    from blow_spark.materialize import spill_to_parquet

    d = read_table(spark, sf_dir, "documents")
    sym_d1 = (
        "transform(sequence(1, length({c})), "
        "i -> concat(substring({c}, 1, i - 1), "
        "substring({c}, i + 1, length({c}))))"
    )
    vocab = spill_to_parquet(
        d.select(
            F.explode(
                F.split(F.trim(F.lower(F.col("text"))), r"\s+")
            ).alias("tok")
        )
        .where(F.length("tok") >= 3)
        .groupBy(F.col("tok").alias("term"))
        .agg(F.count("*").alias("freq")),
        "blow_spark_symspell_",
    )
    d1 = sym_d1.format(c="term")
    vix = vocab.select(
        "term",
        "freq",
        F.explode(
            F.array_distinct(
                F.concat(
                    F.array(F.col("term")),
                    F.expr(d1),
                    F.flatten(
                        F.expr(
                            f"transform({d1}, w -> " + sym_d1.format(c="w") + ")"
                        )
                    ),
                )
            )
        ).alias("variant"),
    )
    typos = vocab.where(F.length("term") >= 4).select(
        F.col("term").alias("source"),
        F.concat(
            F.expr(
                "substr(term, 1, cast(cast(conv(substring(md5(term),1,6),16,10)"
                " as bigint) % length(term) as int))"
            ),
            F.expr(
                "substr(term, cast(cast(conv(substring(md5(term),1,6),16,10)"
                " as bigint) % length(term) as int) + 2)"
            ),
        ).alias("typo"),
    )
    t1 = sym_d1.format(c="typo")
    tix = typos.select(
        "source",
        "typo",
        F.explode(
            F.array_distinct(
                F.concat(
                    F.array(F.col("typo")),
                    F.expr(t1),
                    F.flatten(
                        F.expr(
                            f"transform({t1}, w -> "
                            + sym_d1.format(c="w")
                            + ")"
                        )
                    ),
                )
            )
        ).alias("variant"),
    )
    cand = (
        tix.join(vix, "variant")
        .select("source", "typo", "term", "freq")
        .distinct()
    )
    verified = cand.where(
        F.levenshtein("typo", "term") <= 2
    ).select(
        "source",
        "typo",
        "term",
        "freq",
        F.levenshtein("typo", "term").cast("bigint").alias("dist"),
    )
    best = verified.groupBy("source", "typo").agg(
        F.min(
            F.struct("dist", (-F.col("freq")).alias("negfreq"), "term")
        ).alias("b"),
        F.count("*").cast("bigint").alias("n_candidates"),
    )
    return best.select(
        "source",
        "typo",
        F.col("b.term").alias("correction"),
        F.col("b.dist").alias("edit_distance"),
        (-F.col("b.negfreq")).cast("bigint").alias("correction_freq"),
        "n_candidates",
        (F.col("b.term") == F.col("source")).alias("recovered"),
    ).orderBy("source")
