"""Corpus-preparation operators, round 2: PII redaction, C4-style
sentence filtering, dedup-cluster canonicalization, token-length
histograms.

These extend the training-data-pipeline surface (task brief; SURVEY.md
§2.2 "Extension ops") beyond the round-1 set (quality signals, dedup
families, packing, mixing): the cleaning / redaction / cluster-resolution
steps a 100 TB corpus pass runs between dedup and tokenization. The
reference implements none of this (its entire operator surface is the
distributed flatMap, maps/maps.go:12-14).

All hot-path work is JVM built-ins (regexp, higher-order array ops);
nothing touches Python per-row. Each query is oracle-paired with DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from blow_spark import dedup
from blow_spark.queries import register
from blow_spark.sources import read_table

# Portable regexes (Java regex and RE2 agree): character classes, bounded
# quantifiers, capture groups — no backrefs, no lookaround.
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\+1-555-[0-9]{4}"
_IP_RE = r"(?:[0-9]{1,3}\.){3}[0-9]{1,3}"


@register(
    "text_pii_redaction",
    oracle=rf"""
    WITH aug AS (
      SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@mail.example.com or +1-555-'
                  || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                  || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7' AS t
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, '{_EMAIL_RE}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(t, '{_PHONE_RE}')) AS BIGINT) AS n_phones,
           CAST(len(regexp_extract_all(t, '{_IP_RE}')) AS BIGINT)    AS n_ips,
           right(regexp_replace(regexp_replace(regexp_replace(t,
                 '{_EMAIL_RE}', '<EMAIL>', 'g'),
                 '{_PHONE_RE}', '<PHONE>', 'g'),
                 '{_IP_RE}', '<IP>', 'g'), 60)                       AS redacted_tail
    FROM aug
    """,
    tags=("text", "pii", "llm"),
)
def text_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction: detect + mask emails, phone numbers, and IPv4
    addresses. The fixture text carries no guaranteed PII, so each doc is
    deterministically augmented with synthetic PII derived from doc_id
    (so the masks provably fire), then redacted in a fixed replacement
    order (email → phone → ip; order matters, pinned on both sides).
    Pure regexp built-ins: scales as a single scan, no shuffle."""
    d = read_table(spark, sf_dir, "documents")
    aug = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example.com or +1-555-"),
        F.lpad(F.pmod(F.col("doc_id"), F.lit(10000)).cast("string"), 4, "0"),
        F.lit(" from 10.0."),
        F.pmod(F.col("doc_id"), F.lit(256)).cast("string"),
        F.lit(".7"),
    )
    t = d.select("doc_id", aug.alias("t"))
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("t"), _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
        ),
        _IP_RE,
        "<IP>",
    )
    return t.select(
        "doc_id",
        F.regexp_count("t", F.lit(_EMAIL_RE)).cast("bigint").alias("n_emails"),
        F.regexp_count("t", F.lit(_PHONE_RE)).cast("bigint").alias("n_phones"),
        F.regexp_count("t", F.lit(_IP_RE)).cast("bigint").alias("n_ips"),
        F.right(redacted, F.lit(60)).alias("redacted_tail"),
    )


@register(
    "text_c4_sentence_filter",
    oracle=r"""
    WITH s AS (
      SELECT doc_id, regexp_split_to_array(text, '\.\s+') AS sents
      FROM documents
    ), k AS (
      SELECT doc_id, sents,
             list_filter(sents,
                         x -> LENGTH(trim(x)) > 0
                          AND len(regexp_split_to_array(trim(x), '\s+')) >= 5) AS kept
      FROM s
    )
    SELECT doc_id,
           CAST(len(sents) AS BIGINT)                 AS n_sentences,
           CAST(len(kept) AS BIGINT)                  AS n_kept,
           CAST(len(kept) AS DOUBLE) / len(sents)     AS kept_fraction,
           array_to_string(kept, '. ')                AS kept_text
    FROM k
    """,
    tags=("text", "quality", "llm"),
)
def text_c4_sentence_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style structural cleaning: split each document into sentences,
    keep only sentences with ≥ 5 words, reassemble, and report the kept
    fraction (a per-doc quality signal C4 uses at the line level). The
    sentence split and word count run as higher-order array functions —
    off the codegen path but still JVM-side and Arrow-free; at 100 TB
    this remains a pure scan with no shuffle."""
    d = read_table(spark, sf_dir, "documents")
    sents = F.split(F.col("text"), r"\.\s+")
    t = d.select("doc_id", sents.alias("sents"))
    kept = F.filter(
        F.col("sents"),
        lambda x: (F.length(F.trim(x)) > 0)
        & (F.size(F.split(F.trim(x), r"\s+")) >= 5),
    )
    k = t.select("doc_id", "sents", kept.alias("kept"))
    return k.select(
        "doc_id",
        F.size("sents").cast("bigint").alias("n_sentences"),
        F.size("kept").cast("bigint").alias("n_kept"),
        (F.size("kept").cast("double") / F.size("sents")).alias("kept_fraction"),
        F.concat_ws(". ", "kept").alias("kept_text"),
    )


@register(
    "dedup_cluster_canonical",
    oracle=r"""
    WITH RECURSIVE toks AS (
      SELECT doc_id AS doc, regexp_split_to_array(trim(lower(text)), '\s+') AS t
      FROM documents
    ), base AS (
      SELECT doc,
             list_distinct(list_transform(
               range(1, len(t) - 1),
               i -> array_to_string(t[i:i+2], ' '))) AS sh
      FROM toks
      WHERE len(t) >= 3
    ), exploded AS (
      SELECT doc, unnest(sh) AS g FROM base
    ), rare AS (
      SELECT g FROM exploded GROUP BY g HAVING COUNT(*) <= 50
    ), blocked AS (
      SELECT e.doc, e.g FROM exploded e JOIN rare USING (g)
    ), cand AS (
      SELECT DISTINCT l.doc AS id_a, r.doc AS id_b
      FROM blocked l JOIN blocked r ON l.g = r.g AND l.doc < r.doc
    ), pairs AS (
      SELECT id_a, id_b
      FROM (
        SELECT id_a, id_b,
               CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                 / len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
        FROM cand
        JOIN base a ON a.doc = id_a
        JOIN base b ON b.doc = id_b) s
      WHERE jaccard >= 0.4
    ), edges AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION
      SELECT id_b, id_a FROM pairs
    ), reach(node, comp) AS (
      SELECT a, a FROM edges
      UNION
      SELECT e.a, r.comp FROM edges e JOIN reach r ON e.b = r.node
    ), comps AS (
      SELECT node, MIN(comp) AS comp FROM reach GROUP BY node
    )
    SELECT CAST(comp AS BIGINT)                                  AS keep_id,
           CAST(COUNT(*) AS BIGINT)                              AS n_members,
           CAST(COUNT(*) - 1 AS BIGINT)                          AS n_dropped,
           array_to_string(list_sort(list(node)), ',')           AS members_csv
    FROM comps
    GROUP BY comp
    """,
    tags=("dedup", "cluster", "iterative", "llm"),
)
def dedup_cluster_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster resolution — the step after near-dup clustering: per
    connected component, elect the canonical survivor (min doc_id = the
    component label itself) and list the members to drop. This is the
    keep/drop manifest a dedup pass hands to the writer. Built on the
    same exact-Jaccard edges + iterative min-label components as
    dedup_clusters; the final group-by shuffles only (node, comp) pairs."""
    d = read_table(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(d, text_col="text", id_col="doc_id", threshold=0.4)
    comps = dedup.connected_components(pairs)
    return comps.groupBy(F.col("comp").alias("keep_id")).agg(
        F.count("*").alias("n_members"),
        (F.count("*") - 1).alias("n_dropped"),
        F.concat_ws(",", F.sort_array(F.collect_list("node"))).alias("members_csv"),
    )


@register(
    "docs_token_length_histogram",
    oracle="""
    WITH t AS (
      SELECT source,
             LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 AS n_tokens
      FROM documents
    )
    SELECT source,
           CASE WHEN n_tokens < 32 THEN 'lt_32'
                WHEN n_tokens < 64 THEN '32_63'
                WHEN n_tokens < 128 THEN '64_127'
                WHEN n_tokens < 256 THEN '128_255'
                ELSE 'ge_256' END                       AS bucket,
           COUNT(*)                                     AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT)                AS total_tokens,
           CAST(MIN(n_tokens) AS BIGINT)                AS min_tokens,
           CAST(MAX(n_tokens) AS BIGINT)                AS max_tokens
    FROM t
    GROUP BY source, bucket
    """,
    tags=("text", "stats", "llm"),
)
def docs_token_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-length histogram per source — the distribution a packing /
    curriculum stage reads before choosing chunk sizes. Fixed CASE
    buckets (power-of-two edges in integer arithmetic, no float log2
    whose last-ulp could flip a boundary doc between engines). One
    map-side-combined shuffle on (source, bucket)."""
    d = read_table(spark, sf_dir, "documents")
    n_chars = F.length("text")
    n_nospace = F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
    n_tokens = (n_chars - n_nospace + 1).alias("n_tokens")
    t = d.select("source", n_tokens)
    bucket = (
        F.when(F.col("n_tokens") < 32, "lt_32")
        .when(F.col("n_tokens") < 64, "32_63")
        .when(F.col("n_tokens") < 128, "64_127")
        .when(F.col("n_tokens") < 256, "128_255")
        .otherwise("ge_256")
    )
    return (
        t.select("source", "n_tokens", bucket.alias("bucket"))
        .groupBy("source", "bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.min("n_tokens").cast("bigint").alias("min_tokens"),
            F.max("n_tokens").cast("bigint").alias("max_tokens"),
        )
    )


@register(
    "dedup_boilerplate_sentences",
    oracle=r"""
    WITH s AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(text, '\.\s+')) AS raw
      FROM documents
    ), norm AS (
      SELECT doc_id, trim(lower(raw)) AS sent FROM s
      WHERE LENGTH(trim(raw)) >= 20
    )
    SELECT MD5(sent)                        AS sent_hash,
           COUNT(DISTINCT doc_id)           AS n_docs,
           COUNT(*)                         AS n_occurrences,
           MIN(sent)                        AS sample_sentence
    FROM norm
    GROUP BY sent
    HAVING COUNT(DISTINCT doc_id) >= 3
    """,
    tags=("dedup", "text", "llm"),
)
def dedup_boilerplate_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document (sentence/paragraph-level) dedup: find boilerplate
    sentences repeated across ≥ 3 distinct documents — the
    header/footer/disclaimer removal pass that document-level dedup
    can't see (two different pages sharing a cookie banner are not
    near-dups of each other). Explode → normalize → hash-groupBy; the
    shuffle carries (16-byte hash, doc_id) pairs, never sentence text,
    except the one MIN(sent) sample kept per group for triage. The
    manifest this emits drives a later semi-join strip pass."""
    d = read_table(spark, sf_dir, "documents")
    sent = F.explode(F.split(F.col("text"), r"\.\s+")).alias("raw")
    norm = (
        d.select("doc_id", sent)
        .filter(F.length(F.trim(F.col("raw"))) >= 20)
        .select("doc_id", F.trim(F.lower(F.col("raw"))).alias("sent"))
    )
    return (
        norm.groupBy("sent")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count("*").alias("n_occurrences"),
            F.min("sent").alias("sample_sentence"),
        )
        .filter(F.col("n_docs") >= 3)
        .select(
            F.md5("sent").alias("sent_hash"),
            "n_docs",
            "n_occurrences",
            "sample_sentence",
        )
    )


@register(
    "text_unigram_logprob",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
      FROM documents
    ), freq AS (
      SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok
    ), tot AS (
      SELECT CAST(SUM(c) AS DOUBLE) AS t FROM freq
    ), scored AS (
      SELECT doc_id,
             CAST(ROUND(LN(CAST(c AS DOUBLE) / t) * 1000000, 0) AS BIGINT) AS lp
      FROM toks JOIN freq USING (tok) CROSS JOIN tot
    )
    SELECT doc_id,
           COUNT(*) AS n_tokens,
           CAST(SUM(lp) AS DOUBLE) / COUNT(*) / 1000000.0 AS avg_logprob
    FROM scored
    GROUP BY doc_id
    """,
    tags=("text", "quality", "llm"),
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model scoring: per-doc mean log-probability under
    the corpus's own unigram distribution — the cheap perplexity proxy
    quality filters use when no LM is available (low avg logprob ⇒
    unusual token mix ⇒ candidate junk). Two-pass: corpus term
    frequencies (one shuffle on token), broadcast-join back, per-doc
    aggregate. ln() differs by ≤1 ulp between libm and the JVM, so each
    token's logprob is fixed-pointed to µ-units (round → BIGINT) before
    summation — the house rule for transcendentals — making the per-doc
    sum order-free and engine-exact. At 100 TB the frequency table is
    the only global state and it's Zipf-small after a min-count cut."""
    from blow_spark import functions as BF

    d = read_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(BF.tokenize_ws(F.lower(F.col("text")))).alias("tok")
    )
    freq = toks.groupBy("tok").agg(F.count("*").alias("c"))
    tot = freq.agg(F.sum("c").cast("double").alias("t"))
    scored = toks.join(F.broadcast(freq), "tok").crossJoin(F.broadcast(tot)).select(
        "doc_id",
        F.round(F.log(F.col("c").cast("double") / F.col("t")) * 1_000_000, 0)
        .cast("bigint")
        .alias("lp"),
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        (F.sum("lp").cast("double") / F.count("*") / 1_000_000.0).alias("avg_logprob"),
    )


@register(
    "text_bm25_search",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
      FROM documents
    ), dl AS (
      SELECT doc_id, CAST(COUNT(*) AS DOUBLE) AS dl FROM toks GROUP BY doc_id
    ), stats AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
             SUM(dl) / COUNT(*)       AS avgdl
      FROM dl
    ), tf AS (
      SELECT doc_id, tok, CAST(COUNT(*) AS DOUBLE) AS tf
      FROM toks WHERE tok IN ('window', 'join', 'stream')
      GROUP BY doc_id, tok
    ), dft AS (
      SELECT tok, CAST(COUNT(*) AS DOUBLE) AS dft FROM tf GROUP BY tok
    ), contrib AS (
      SELECT tf.doc_id,
             CAST(ROUND(
               LN(1 + (n_docs - dft + 0.5) / (dft + 0.5))
               * tf * (1.2 + 1) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / avgdl))
               * 1000000, 0) AS BIGINT) AS c_micro
      FROM tf JOIN dft USING (tok) JOIN dl USING (doc_id) CROSS JOIN stats
    )
    SELECT doc_id,
           COUNT(*)                                   AS n_terms_matched,
           CAST(SUM(c_micro) AS BIGINT)               AS score_micro,
           CAST(SUM(c_micro) AS DOUBLE) / 1000000.0   AS bm25
    FROM contrib
    GROUP BY doc_id
    """,
    tags=("text", "retrieval", "llm"),
)
def text_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 retrieval scoring (k1=1.2, b=0.75) for the query
    {window, join, stream} — the lexical ranking half of a RAG/dedup
    retrieval stack, built on the same tf/df/dl statistics as
    text_tfidf_top_terms. Per-(doc, term) contributions are fixed-pointed
    to µ-units before the per-doc sum (ln differs by ≤1 ulp across
    engines and float addition isn't associative — the bigint sum is
    order-free and engine-exact; the house transcendental rule). Shape at
    scale: tf is one shuffle on (doc, term) with the query terms filter
    pushed into the scan; df and the corpus stats are broadcast-size."""
    from blow_spark import functions as BF

    K1, B = 1.2, 0.75
    terms = ["window", "join", "stream"]
    d = read_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(BF.tokenize_ws(F.lower(F.col("text")))).alias("tok")
    )
    dl = toks.groupBy("doc_id").agg(F.count("*").cast("double").alias("dl"))
    stats = dl.agg(
        F.count("*").cast("double").alias("n_docs"),
        (F.sum("dl") / F.count("*")).alias("avgdl"),
    )
    tf = (
        toks.filter(F.col("tok").isin(terms))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").cast("double").alias("tf"))
    )
    dft = tf.groupBy("tok").agg(F.count("*").cast("double").alias("dft"))
    idf = F.log(1 + (F.col("n_docs") - F.col("dft") + 0.5) / (F.col("dft") + 0.5))
    tf_part = (F.col("tf") * (K1 + 1)) / (
        F.col("tf") + K1 * (1 - B + B * F.col("dl") / F.col("avgdl"))
    )
    contrib = (
        tf.join(F.broadcast(dft), "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.round(idf * tf_part * 1_000_000, 0).cast("bigint").alias("c_micro"),
        )
    )
    return contrib.groupBy("doc_id").agg(
        F.count("*").alias("n_terms_matched"),
        F.sum("c_micro").cast("bigint").alias("score_micro"),
        (F.sum("c_micro").cast("double") / 1_000_000.0).alias("bm25"),
    )


_VOCAB_SQL = r"""
    WITH toks AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
      FROM documents
    ), freq AS (
      SELECT tok, COUNT(*) AS n_occurrences FROM toks GROUP BY tok
    )
    SELECT tok,
           n_occurrences,
           CAST(ROW_NUMBER() OVER (ORDER BY n_occurrences DESC, tok) AS BIGINT)
               AS token_id
    FROM freq
    WHERE n_occurrences >= 3
"""


@register(
    "tokenizer_vocab_build",
    oracle=_VOCAB_SQL,
    tags=("text", "tokenizer", "llm"),
)
def tokenizer_vocab_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary construction — the first half of tokenization: corpus
    term frequencies, a min-count cut (≥3), and dense token ids assigned
    by frequency rank with the token string as tiebreaker (a total
    order, so ids are reproducible across runs and engines — the
    property a training run needs to resume against the same vocab).
    One shuffle for the freq count; the id assignment is the two-phase
    exact global rank (ops.global_row_number: range partition →
    within-partition row_number → broadcast offsets), NOT a
    no-partition window — a 100 TB web corpus with a ≥3-occurrence
    floor still yields 10^8+ surviving tokens, far too many for a
    single task to sort (round-3 verdict item #2)."""
    from blow_spark import functions as BF
    from blow_spark.ops import global_row_number

    d = read_table(spark, sf_dir, "documents")
    toks = d.select(F.explode(BF.tokenize_ws(F.lower(F.col("text")))).alias("tok"))
    freq = toks.groupBy("tok").agg(F.count("*").alias("n_occurrences")).filter(
        F.col("n_occurrences") >= 3
    )
    return global_row_number(
        freq, [F.col("n_occurrences").desc(), F.col("tok")], out_col="token_id"
    ).select("tok", "n_occurrences", "token_id")


@register(
    "corpus_encode_tokens",
    oracle=rf"""
    WITH vocab AS ({_VOCAB_SQL}),
    split AS (
      SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
      FROM documents
    ), toks AS (
      SELECT doc_id, u.i AS pos, t[u.i] AS tok
      FROM split, UNNEST(range(1, least(len(t), 32) + 1)) AS u(i)
    )
    SELECT doc_id,
           array_to_string(
             array_agg(COALESCE(CAST(v.token_id AS VARCHAR), '0')
                       ORDER BY toks.pos), ',') AS token_ids_csv,
           COUNT(*)                             AS n_encoded,
           CAST(COUNT(v.token_id) AS BIGINT)    AS n_in_vocab
    FROM toks LEFT JOIN vocab v USING (tok)
    GROUP BY doc_id
    """,
    tags=("text", "tokenizer", "llm"),
)
def corpus_encode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token→id encoding — the second half of tokenization: each doc's
    first 32 tokens mapped through the vocabulary (OOV → 0), emitted as
    an ORDERED id sequence. The order-preserving trick under a
    distributed join: posexplode carries the position, the vocab join is
    broadcast (vocab is Zipf-small), and the sequence reassembles with
    array_agg ordered by position — the exact pattern any per-element
    enrich-then-reassemble pipeline uses at scale (the join is map-side,
    the only shuffle is the per-doc regroup)."""
    from blow_spark import functions as BF

    d = read_table(spark, sf_dir, "documents")
    vocab = tokenizer_vocab_build(spark, sf_dir).select("tok", "token_id")
    toks = (
        d.select(
            "doc_id",
            F.posexplode(BF.tokenize_ws(F.lower(F.col("text")))).alias("pos0", "tok"),
        )
        .withColumn("pos", F.col("pos0") + 1)
        .filter(F.col("pos") <= 32)
    )
    joined = toks.join(F.broadcast(vocab), "tok", "left")
    return (
        joined.groupBy("doc_id")
        .agg(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col("pos"),
                                F.coalesce(F.col("token_id").cast("string"), F.lit("0")).alias(
                                    "tid"
                                ),
                            )
                        )
                    ),
                    lambda s: s["tid"],
                ),
            ).alias("token_ids_csv"),
            F.count("*").alias("n_encoded"),
            F.count("token_id").cast("bigint").alias("n_in_vocab"),
        )
    )


@register(
    "mix_token_budget",
    oracle="""
    WITH t AS (
      SELECT doc_id, source,
             LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 AS n_tokens,
             md5(text) AS h
      FROM documents
    ), c AS (
      SELECT doc_id, source, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_tokens
      FROM t
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT)          AS kept_docs,
           CAST(SUM(n_tokens) AS BIGINT)     AS kept_tokens,
           CAST(MAX(cum_tokens) AS BIGINT)   AS budget_used
    FROM c
    WHERE cum_tokens <= 20000
    GROUP BY source
    """,
    tags=("pipeline", "mix", "llm"),
)
def mix_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-BUDGETED data recipe: each source contributes documents in a
    deterministic content-hash order until its token budget (20 k here)
    is exhausted — the way a training mix is actually specified
    ("20 B tokens of web, 5 B of code"), vs the RATIO recipe of
    mix_sources_weighted. The running total is one window cumsum per
    source (hash order makes the prefix a uniform sample, and the
    cutoff deterministic across engines); docs whose cumulative count
    would exceed the budget are dropped. At 100 TB this is one exchange
    keyed by source — and because the hash order is uniform, a
    cluster-scale variant can pre-filter with a hash cutoff estimated
    from per-source token totals (the stratified-sampling trick in
    sample_stratified_exact_k) before the exact window pass."""
    d = read_table(spark, sf_dir, "documents")
    n_chars = F.length("text")
    n_nospace = F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
    t = d.select(
        "doc_id",
        "source",
        (n_chars - n_nospace + 1).alias("n_tokens"),
        F.md5("text").alias("h"),
    )
    w = (
        W.partitionBy("source")
        .orderBy("h", "doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    c = t.withColumn("cum_tokens", F.sum("n_tokens").over(w)).filter(
        F.col("cum_tokens") <= 20000
    )
    return c.groupBy("source").agg(
        F.count("*").alias("kept_docs"),
        F.sum("n_tokens").alias("kept_tokens"),
        F.max("cum_tokens").alias("budget_used"),
    )


@register(
    "corpus_shuffle_shards",
    oracle="""
    WITH pos AS (
      SELECT doc_id, source,
             CAST(CONCAT('0x', SUBSTRING(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS p
      FROM documents
    )
    SELECT p % 32 AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MIN(p) AS BIGINT) AS min_pos,
           CAST(MAX(p) AS BIGINT) AS max_pos,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
    FROM pos
    GROUP BY shard
    """,
    tags=("pipeline", "shuffle", "llm"),
)
def corpus_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded global corpus shuffle into training shards — the "randomize
    document order before training" primitive: every doc gets a
    content-independent pseudo-random position (md5 of its id — the one
    cross-engine-stable hash, unlike xxhash64), shard = position mod 32.
    The registered result is the per-shard census (counts, position
    range, source mixing degree) that validates the permutation is
    balanced and source-interleaved; the production writer is the same
    plan ending in repartitionByRange(position).sortWithinPartitions +
    partitioned write, giving globally-shuffled, evenly-sized, resumable
    shards with NO random state — re-running any subset of tasks yields
    identical output (deterministic retry, the property the reference's
    redelivery protocol lacks, maps/dispatch.go retry path)."""
    d = read_table(spark, sf_dir, "documents")
    p = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10).cast(
        "long"
    )
    pos = d.select("doc_id", "source", p.alias("p"))
    return pos.groupBy(F.pmod("p", F.lit(32)).alias("shard")).agg(
        F.count("*").alias("n_docs"),
        F.min("p").alias("min_pos"),
        F.max("p").alias("max_pos"),
        F.countDistinct("source").alias("n_sources"),
    )


@register(
    "corpus_chunk_overlap",
    oracle="""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
      FROM documents WHERE doc_id < 200
    ), chunks AS (
      SELECT doc_id, len(t) AS n_tokens,
             UNNEST(RANGE(0, GREATEST(CAST(CEIL((len(t) - 32) / 96.0) AS BIGINT), 1))) AS chunk_idx
      FROM toks
    )
    SELECT c.doc_id, c.chunk_idx,
           c.chunk_idx * 96 + 1 AS tok_start,
           LEAST(c.chunk_idx * 96 + 128, c.n_tokens) AS tok_end,
           array_to_string(t.t[(c.chunk_idx * 96 + 1):(LEAST(c.chunk_idx * 96 + 128, c.n_tokens))], ' ') AS chunk_text
    FROM chunks c JOIN toks t USING (doc_id)
    """,
    tags=("pipeline", "chunk", "llm", "rag"),
)
def corpus_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking WITH OVERLAP — the RAG /
    long-context ingestion primitive: 128-token windows advancing by 96
    (32-token overlap), last window clamped to the document end, so every
    token appears in ≥1 chunk and context straddles boundaries. One
    map-side pass: tokenize, explode the chunk index range, slice — no
    shuffle at all (chunking is embarrassingly parallel; the downstream
    embed/index stages are where exchanges happen). 1-based token
    positions in the output match the SQL slice convention."""
    d = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    toks = d.select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("t")
    ).select("doc_id", "t", F.size("t").alias("n_tokens"))
    n_chunks = F.greatest(
        F.ceil((F.col("n_tokens") - F.lit(32)) / F.lit(96.0)).cast("long"), F.lit(1)
    )
    chunks = toks.select(
        "doc_id",
        "t",
        "n_tokens",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
    )
    tok_start = F.col("chunk_idx") * 96 + 1
    tok_end = F.least(F.col("chunk_idx") * 96 + 128, F.col("n_tokens"))
    return chunks.select(
        "doc_id",
        "chunk_idx",
        tok_start.alias("tok_start"),
        tok_end.alias("tok_end"),
        F.concat_ws(
            " ", F.slice(F.col("t"), tok_start, tok_end - tok_start + 1)
        ).alias("chunk_text"),
    )


def _bpe_round_oracle(prev: str, rnd: int) -> tuple[str, str]:
    """One BPE round as DuckDB CTEs: pair counts from v{prev}, the argmax
    pair as t{rnd} (with its count), the merged vocab as v{rnd}."""
    return (
        f"""
    p{rnd} AS (
      SELECT a[i] AS l, a[i+1] AS r, CAST(SUM(n) AS BIGINT) AS cnt
      FROM (SELECT n, string_split(trim(s, '|'), '|') AS a FROM {prev}),
           unnest(range(1, len(a))) AS u(i)
      GROUP BY 1, 2
    ), t{rnd} AS (
      SELECT {rnd} AS round, l, r, l || r AS merged, cnt
      FROM p{rnd} ORDER BY cnt DESC, l, r LIMIT 1
    ), v{rnd} AS (
      SELECT w, n,
             replace(s, '|' || t.l || '|' || t.r || '|',
                        '|' || t.l || t.r || '|') AS s
      FROM {prev}, t{rnd} t
    )""",
        f"SELECT round, l, r, merged, cnt FROM t{rnd}",
    )


_BPE_ROUNDS = 6

_bpe_ctes, _bpe_selects = [], []
for _r in range(1, _BPE_ROUNDS + 1):
    _cte, _sel = _bpe_round_oracle(f"v{_r - 1}", _r)
    _bpe_ctes.append(_cte)
    _bpe_selects.append(_sel)

_BPE_ORACLE = (
    r"""
    WITH wf AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS n
      FROM (
        SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS w
        FROM documents
      )
      WHERE regexp_matches(w, '^[a-z]+$')
      GROUP BY w ORDER BY n DESC, w LIMIT 500
    ), v0 AS (
      SELECT w, n, '|' || array_to_string(string_split(w, ''), '|') || '|' AS s
      FROM wf
    ),"""
    + ",".join(_bpe_ctes)
    + " ".join(f"\n    {s}\n    UNION ALL" for s in _bpe_selects[:-1])
    + "\n    "
    + _bpe_selects[-1]
)


@register("tokenizer_bpe_merges", oracle=_BPE_ORACLE, tags=("corpus", "tokenizer", "bpe"))
def tokenizer_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-pair-encoding merge TRAINING — the data-dependent iterative
    half of tokenizer construction (``tokenizer_vocab_build`` is the
    static half). Six merge rounds over the 500 most frequent all-alpha
    words: each round counts adjacent-symbol pairs weighted by word
    frequency, takes the argmax pair under the total order
    (count DESC, left, right), and merges it everywhere with a
    separator-delimited left-to-right non-overlapping string replace —
    semantics both engines implement identically (pinned above with
    '|a|a|a|' -> '|aa|a|'), so the whole iterative trainer is
    oracle-paired, not rows-only.

    Scale shape: the ONLY corpus-scale pass is the word-frequency count
    (one shuffle); the merge loop runs on the Zipf-truncated vocab table
    (500 rows), where per-round pair extraction is a trivially small HOF
    — the interpreted-lambda rule (SCALE.md) targets corpus-scale rows,
    not a fixed-500-row control table. Each round's 500-row vocab and
    1-row argmax are materialized with ``checkpoint_small`` (round-14 —
    the lazy chain re-planned the whole history per round, 63 Exchanges
    in the returned plan; see _bpe_train); a production run with 10^5
    vocab rows and 10^4 merges would spill the vocab per round
    (materialize.spill_to_parquet) exactly like the other iterative
    operators. The argmax pair joins back as a one-row broadcast — no
    driver collect in the loop."""
    out, _cur = _bpe_train(spark, sf_dir)
    return out


def _bpe_train(spark: SparkSession, sf_dir: str):
    """Shared BPE trainer chain: returns (merges_df, final_vocab_df) —
    merges_df = the six (round, l, r, merged, cnt) rows, final_vocab_df
    = the top-500 word table carrying its POST-merge segmentation
    string ``s``. Used by tokenizer_bpe_merges (emits the merges) and
    corpus_bpe_encode (applies the segmentations to the corpus).

    Round-14 (guide §5 / §3.3 "very large plans — materialise an
    intermediate to truncate"): the vocab table is CONSTANT-SIZE (500
    rows) yet the six rounds previously chained LAZILY — the returned
    plan carried 63 Exchanges (every round's pair-count aggregate plus
    the corpus word-frequency pass, re-planned under each round's
    argmax), and each unionAll output row re-ran the full chain to its
    round. ``checkpoint_small`` per round (the materialization the
    other iterative operators use for domain-bounded tables) makes each
    round one tiny job over the checkpointed 500-row table: identical
    arithmetic, identical tie-breaks, plan 63 Exchanges → 2. A
    production run with 10^5 vocab rows and 10^4 merges would
    spill_to_parquet instead (data-proportional table on shared
    storage), as before."""
    from blow_spark.materialize import checkpoint_small

    d = read_table(spark, sf_dir, "documents")
    from blow_spark import functions as BF

    toks = d.select(F.explode(BF.tokenize_ws(F.lower(F.col("text")))).alias("w"))
    wf = (
        toks.filter(F.col("w").rlike("^[a-z]+$"))
        .groupBy("w")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "w")
        .limit(500)
    )
    cur = checkpoint_small(
        wf.select(
            "w", "n",
            F.concat(F.lit("|"), F.array_join(F.split("w", ""), "|"), F.lit("|")).alias("s"),
        )
    )
    out = None
    for rnd in range(1, _BPE_ROUNDS + 1):
        pairs = cur.select(
            "n",
            # CASE guard: Spark sequence(1, 0) counts DOWN ([1, 0]), so a
            # single-symbol word must shortcut to an empty pair list
            F.explode(
                F.expr(
                    "CASE WHEN size(split(trim(BOTH '|' FROM s), '\\\\|')) < 2"
                    " THEN array()"
                    " ELSE transform(sequence(1, size(split(trim(BOTH '|' FROM s), '\\\\|')) - 1),"
                    " i -> struct(split(trim(BOTH '|' FROM s), '\\\\|')[i-1] AS l,"
                    "             split(trim(BOTH '|' FROM s), '\\\\|')[i]   AS r)) END"
                )
            ).alias("p"),
        ).select("n", "p.l", "p.r")
        cnt = pairs.groupBy("l", "r").agg(F.sum("n").alias("cnt"))
        # one-row argmax, materialized so the round row, the merge join
        # and every later round read it instead of re-running the chain
        top = checkpoint_small(cnt.orderBy(F.desc("cnt"), "l", "r").limit(1))
        row = top.select(
            F.lit(rnd).alias("round"), "l", "r",
            F.concat("l", "r").alias("merged"), "cnt",
        )
        out = row if out is None else out.unionAll(row)
        cur = checkpoint_small(
            cur.crossJoin(
                F.broadcast(top.select(F.col("l").alias("_l"), F.col("r").alias("_r")))
            ).select(
                "w", "n",
                F.expr(
                    "replace(s, '|' || _l || '|' || _r || '|', '|' || _l || _r || '|')"
                ).alias("s"),
            )
        )
    return out, cur


@register(
    "text_quality_classifier",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
      FROM documents
    ), feat AS (
      SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_tokens,
             CAST(1000000 * SUM(LEN(tok)) // COUNT(*) AS BIGINT) AS mean_wlen_micro,
             CAST(1000000 * SUM(CASE WHEN tok IN ('the','a','an','of','to','and','in','is','it','that')
                                     THEN 1 ELSE 0 END) // COUNT(*) AS BIGINT) AS stop_micro
      FROM toks GROUP BY doc_id
    ), chars AS (
      SELECT doc_id,
             CAST(1000000 * LEN(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                  // GREATEST(LEN(text), 1) AS BIGINT) AS alpha_micro
      FROM documents
    ), scored AS (
      SELECT f.doc_id, n_tokens, mean_wlen_micro, stop_micro, alpha_micro,
             CAST(-2500000000 AS BIGINT)
             + 300 * LEAST(n_tokens, 1000) * 1000
             + 450 * stop_micro
             + 650 * alpha_micro
             - 180 * mean_wlen_micro AS score_nano
      FROM feat f JOIN chars c ON f.doc_id = c.doc_id
    )
    SELECT doc_id, n_tokens, mean_wlen_micro, stop_micro, alpha_micro,
           score_nano,
           CAST(score_nano >= 0 AS INT) AS keep
    FROM scored
    """,
    tags=("text", "quality", "llm", "classifier"),
)
def text_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-classifier INFERENCE, the fastText/DCLM-filter shape
    (public recipe: CCNet / DCLM / FineWeb quality gates): engineered
    per-doc features × a fixed weight vector → linear score → keep bit.
    The weights stand in for an offline-trained model (shipping a real
    fastText binary is out of scope — the SPARK-side shape is the
    point: one scan, all-JVM feature extraction, a broadcastable weight
    vector, and a map-side keep decision that composes with the recipe
    operators downstream).

    Exactness engineering (the house fixed-point rule, no
    transcendentals at all here): every ratio feature is an integer
    micro-unit via `1e6·num div den` (floor division on BOTH engines —
    DuckDB `//` == Spark `div` for non-negative operands), weights are
    integers in milli-units, so the score is a pure BIGINT dot product:
    engine-exact at any parallelism, no rounding anywhere. n_tokens is
    capped (LEAST 1000) before weighting so one runaway document cannot
    saturate the feature the way an unbounded count would.

    At 100 TB: one scan, zero shuffles beyond the per-doc token
    aggregate (map-side combinable), no global state — the classifier
    rides the ingest scan. The reference has no content operators at
    all (SURVEY §2.2 'Extension ops')."""
    from blow_spark import functions as BF

    d = read_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(BF.tokenize_ws(F.lower(F.col("text")))).alias("tok")
    )
    stop = F.col("tok").isin(
        "the", "a", "an", "of", "to", "and", "in", "is", "it", "that"
    )
    feat = toks.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.expr("1000000 * SUM(length(tok)) div COUNT(*)").alias("mean_wlen_micro"),
        (
            F.lit(1_000_000) * F.sum(stop.cast("long"))
        ).alias("_stop_num"),
    ).select(
        "doc_id",
        "n_tokens",
        "mean_wlen_micro",
        F.expr("_stop_num div n_tokens").alias("stop_micro"),
    )
    chars = d.select(
        "doc_id",
        F.expr(
            "1000000 * length(regexp_replace(text, '[^A-Za-z]', ''))"
            " div greatest(length(text), 1)"
        ).alias("alpha_micro"),
    )
    scored = feat.join(chars, "doc_id").select(
        "doc_id",
        "n_tokens",
        "mean_wlen_micro",
        "stop_micro",
        "alpha_micro",
        (
            F.lit(-2_500_000_000)
            + F.lit(300) * F.least(F.col("n_tokens"), F.lit(1000)) * F.lit(1000)
            + F.lit(450) * F.col("stop_micro")
            + F.lit(650) * F.col("alpha_micro")
            - F.lit(180) * F.col("mean_wlen_micro")
        ).alias("score_nano"),
    )
    return scored.withColumn("keep", (F.col("score_nano") >= 0).cast("int"))


@register(
    "mix_dsir_importance",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, lang,
             unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
      FROM documents
    ), raw AS (
      SELECT tok, COUNT(*) AS c_raw FROM toks GROUP BY tok
    ), tgt AS (
      SELECT tok, COUNT(*) AS c_tgt FROM toks WHERE lang = 'en' GROUP BY tok
    ), norms AS (
      SELECT (SELECT SUM(c_raw) FROM raw) AS n_raw,
             (SELECT COALESCE(SUM(c_tgt), 0) FROM tgt) AS n_tgt,
             (SELECT COUNT(*) FROM raw) AS v
    ), ratio AS (
      SELECT r.tok,
             CAST(ROUND(
               (LN(CAST(COALESCE(t.c_tgt, 0) + 1 AS DOUBLE) / (n_tgt + v))
              - LN(CAST(r.c_raw + 1 AS DOUBLE) / (n_raw + v))) * 1000000, 0)
             AS BIGINT) AS lr_micro
      FROM raw r LEFT JOIN tgt t ON r.tok = t.tok CROSS JOIN norms
    )
    SELECT doc_id,
           COUNT(*) AS n_tokens,
           CAST(SUM(lr_micro) AS BIGINT) AS dsir_weight_micro,
           CAST(SUM(lr_micro) >= 0 AS INT) AS target_like
    FROM toks JOIN ratio USING (tok)
    GROUP BY doc_id
    """,
    tags=("mix", "sampling", "llm", "dsir"),
)
def mix_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weighting (Xie et al., "Data Selection for
    Language Models via Importance Resampling", NeurIPS 2023 — public
    literature, implemented from the paper's math): score every raw
    document by how target-like its token distribution is,
    weight(doc) = Σ_tok [ln p̂_target(tok) − ln p̂_raw(tok)], with
    Laplace-smoothed unigram LMs (the paper's hashed-ngram estimator
    degenerates to this at unigram order). Target here = the corpus's
    English slice; raw = everything. Downstream a recipe samples
    ∝ exp(weight) — this operator produces the weights and the
    threshold bit the simple top-k selection variant uses.

    Plan shape at 100 TB: two Zipf-small frequency tables (one shuffle
    each, map-side combinable), broadcast-joined back to the token
    stream, one per-doc aggregate — the same two-pass skeleton as
    text_unigram_logprob, which is the point: DSIR at scale IS a pair
    of unigram LMs plus one keyed reduce. ln() is fixed-pointed to
    µ-units per token (the house rule for transcendentals) so the
    per-doc BIGINT sum is order-free and engine-exact; the smoothed
    ratio uses (c+1)/(N+V) on both engines with integer c, N, V."""
    from blow_spark import functions as BF

    d = read_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", "lang",
        F.explode(BF.tokenize_ws(F.lower(F.col("text")))).alias("tok"),
    )
    raw = toks.groupBy("tok").agg(F.count("*").alias("c_raw"))
    tgt = toks.filter(F.col("lang") == "en").groupBy("tok").agg(
        F.count("*").alias("c_tgt")
    )
    norms = raw.agg(
        F.sum("c_raw").alias("n_raw"), F.count("*").alias("v")
    ).crossJoin(
        F.broadcast(
            tgt.agg(F.coalesce(F.sum("c_tgt"), F.lit(0)).alias("n_tgt"))
        )
    )
    lr = (
        F.log(
            (F.coalesce(F.col("c_tgt"), F.lit(0)) + 1).cast("double")
            / (F.col("n_tgt") + F.col("v"))
        )
        - F.log((F.col("c_raw") + 1).cast("double") / (F.col("n_raw") + F.col("v")))
    )
    ratio = (
        raw.join(F.broadcast(tgt), "tok", "left")
        .crossJoin(F.broadcast(norms))
        .select(
            "tok",
            F.round(lr * 1_000_000, 0).cast("bigint").alias("lr_micro"),
        )
    )
    return (
        toks.join(F.broadcast(ratio), "tok")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("lr_micro").alias("dsir_weight_micro"),
            (F.sum("lr_micro") >= 0).cast("int").alias("target_like"),
        )
    )


_BPE_ENCODE_ORACLE = (
    r"""
    WITH wf AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS n
      FROM (
        SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS w
        FROM documents
      )
      WHERE regexp_matches(w, '^[a-z]+$')
      GROUP BY w ORDER BY n DESC, w LIMIT 500
    ), v0 AS (
      SELECT w, n, '|' || array_to_string(string_split(w, ''), '|') || '|' AS s
      FROM wf
    ),"""
    + ",".join(_bpe_ctes)
    + r""",
    dtoks AS (
      SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS w
      FROM documents
    ), enc AS (
      SELECT d.doc_id,
             CASE WHEN v.w IS NOT NULL
                  THEN len(string_split(trim(v.s, '|'), '|'))
                  ELSE length(d.w) END AS n_sym
      FROM dtoks d LEFT JOIN v6 v ON d.w = v.w
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT)  AS n_words,
           CAST(SUM(n_sym) AS BIGINT) AS n_bpe_tokens
    FROM enc GROUP BY doc_id
    """
)


@register("corpus_bpe_encode", oracle=_BPE_ENCODE_ORACLE, tags=("corpus", "tokenizer", "bpe"))
def corpus_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE ENCODING with the trained merges — the third leg of the
    tokenizer family (vocab build → merge training → encode), closing
    the loop: the corpus is re-tokenized under the segmentations the
    six trained merges produce. Per document: word count and the BPE
    token count (in-vocab words contribute their post-merge symbol
    count; out-of-vocab words fall back to character-level — one token
    per character, the standard byte/char fallback).

    Scale shape — the reason this is the RIGHT factorization: merges
    apply to the DISTINCT-word table (vocab-scale, 500 rows), never to
    the token stream; the corpus-scale work is one broadcast join of
    the token stream against the 500-row segmentation map plus a
    map-combinable per-doc aggregate. A naive per-token merge
    application would run the iterative replace chain over every token
    occurrence — O(corpus · merges) string work instead of
    O(vocab · merges). The oracle replays the identical trainer CTE
    chain and the identical encode join, so the whole train→encode
    pipeline is hash-checked end to end (data-dependent merges
    included)."""
    _merges, vocab = _bpe_train(spark, sf_dir)
    seg = vocab.select(
        "w",
        F.size(F.split(F.expr("trim(BOTH '|' FROM s)"), "\\|")).alias("n_sym_v"),
    )
    d = read_table(spark, sf_dir, "documents")
    from blow_spark import functions as BF

    dtoks = d.select(
        "doc_id", F.explode(BF.tokenize_ws(F.lower(F.col("text")))).alias("w")
    )
    enc = dtoks.join(F.broadcast(seg), "w", "left").select(
        "doc_id",
        F.coalesce(F.col("n_sym_v"), F.length("w")).alias("n_sym"),
    )
    return enc.groupBy("doc_id").agg(
        F.count("*").alias("n_words"),
        F.sum("n_sym").alias("n_bpe_tokens"),
    )


@register(
    "text_bigram_logprob",
    oracle=r"""
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
      SELECT doc_id, w1, w2 FROM bg WHERE w2 IS NOT NULL
    ), c12 AS (
      SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
      FROM bigrams GROUP BY w1, w2
    ), c1 AS (
      SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM c12 GROUP BY w1
    ), v AS (
      SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS v FROM toks
    ), scored AS (
      SELECT b.doc_id,
             CAST(ROUND(LN((CAST(c12.c12 AS DOUBLE) + 1.0)
                           / (CAST(c1.c1 AS DOUBLE) + v.v))
                        * 1000000, 0) AS BIGINT) AS lp
      FROM bigrams b
      JOIN c12 ON b.w1 = c12.w1 AND b.w2 = c12.w2
      JOIN c1  ON b.w1 = c1.w1
      CROSS JOIN v
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT)                      AS n_bigrams,
           CAST(SUM(lp) AS BIGINT)                       AS logprob_mu_total,
           CAST(SUM(lp) AS DOUBLE) / COUNT(*) / 1000000.0 AS avg_logprob
    FROM scored GROUP BY doc_id
    """,
    tags=("text", "quality", "llm"),
)
def text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model scoring with Laplace smoothing — the CCNet
    / KenLM-style perplexity filter one order above text_unigram_logprob:
    each document's mean log P(w_i | w_{i-1}) under the corpus's own
    bigram distribution, p = (c(w1,w2)+1) / (c(w1)+V). Word order now
    matters (shuffled text scores low even with a natural unigram mix),
    which is exactly what the unigram proxy cannot see.

    Plan: positions from posexplode, next-token via a per-doc window
    (parallel across docs), bigram counts in one (w1,w2)-keyed shuffle;
    the context totals c1 derive from the bigram table (a re-aggregate
    of counts, not a second corpus pass) and V is a one-row broadcast.
    Scoring joins the token stream to the count table on (w1,w2) — at
    100 TB the bigram table is the big state (∝ distinct bigrams, far
    sublinear in corpus size but too big to broadcast), so this join
    SHUFFLES both sides on the bigram key; a min-count cut on c12 is
    the documented knob when it must shrink. Each bigram's logprob is
    µ-unit fixed-pointed before the per-doc sum (house rule), making
    the result engine-exact."""
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
    )
    c12 = bigrams.groupBy("w1", "w2").agg(F.count("*").cast("bigint").alias("c12"))
    c1 = c12.groupBy("w1").agg(F.sum("c12").cast("bigint").alias("c1"))
    v = toks.agg(F.countDistinct("tok").cast("bigint").alias("v"))
    scored = (
        bigrams.join(c12, ["w1", "w2"])
        .join(c1, "w1")
        .crossJoin(F.broadcast(v))
        .select(
            "doc_id",
            F.round(
                F.log(
                    (F.col("c12").cast("double") + F.lit(1.0))
                    / (F.col("c1").cast("double") + F.col("v"))
                )
                * 1_000_000,
                0,
            )
            .cast("bigint")
            .alias("lp"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_bigrams"),
        F.sum("lp").cast("bigint").alias("logprob_mu_total"),
        (F.sum("lp").cast("double") / F.count("*") / 1_000_000.0).alias(
            "avg_logprob"
        ),
    )


_ZIPF_TOP = 200
_ZIPF_E6 = 1_000_000.0


@register(
    "corpus_zipf_exponent",
    oracle=f"""
    WITH cnt AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS c
      FROM (
        SELECT unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS tok
        FROM documents
      ) GROUP BY tok
    ), ranked AS (
      SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, tok) AS r
      FROM cnt
    ), pts AS (
      SELECT CAST(ROUND(LN(CAST(r AS DOUBLE)) * {_ZIPF_E6}) AS BIGINT) AS x,
             CAST(ROUND(LN(CAST(c AS DOUBLE)) * {_ZIPF_E6}) AS BIGINT) AS y
      FROM ranked WHERE r <= {_ZIPF_TOP}
    ), sums AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx
      FROM pts
    )
    SELECT n AS n_points,
           ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS slope,
           ROUND(-(CAST(n * sxy - sx * sy AS DOUBLE)
                   / CAST(n * sxx - sx * sx AS DOUBLE)), 6) AS zipf_exponent
    FROM sums
    """,
    tags=("corpus", "stats", "llm"),
)
def corpus_zipf_exponent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law exponent of the corpus vocabulary (Zipf 1949; natural
    language sits near s≈1): ordinary least squares of ln(frequency) on
    ln(rank) over the top-{_ZIPF_TOP} tokens — the one-number corpus
    health check a data pipeline tracks across snapshots (a drifting
    exponent flags boilerplate floods or tokenizer regressions before
    any downstream metric moves). Log points are e6 fixed-point
    integers, so the five OLS moment sums are exact BIGINTs and the
    closed-form slope is one correctly-rounded double division, ROUND-6.

    Scale: one corpus tokenize + count (the vocabulary table), ranks
    via ops.global_row_number (two-phase, no data-scale single-partition
    window), moments in a 1-row aggregate over {_ZIPF_TOP} points.
    Envelope (on the post-cancellation numerator/denominator — the
    values actually cast to double): n·sxy and n·sxx stay within int64
    for c_max up to ~e^43 ≈ 10^18 token occurrences, far beyond any
    corpus. They exceed 2^53 already at realistic counts, but
    determinism is unaffected: both engines run the identical int64
    arithmetic and the identical int64→double conversion, so the one
    ROUND-6 division sees bit-identical operands."""
    from blow_spark import functions as BF
    from blow_spark import ops

    d = read_table(spark, sf_dir, "documents")
    cnt = (
        d.select(
            F.explode(BF.tokenize_ws(F.lower(F.col("text")))).alias("tok")
        )
        .groupBy("tok")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    ranked = ops.global_row_number(
        cnt, [F.col("c").desc(), F.col("tok").asc()], out_col="r"
    ).filter(F.col("r") <= _ZIPF_TOP)
    pts = ranked.select(
        F.round(F.log(F.col("r").cast("double")) * _ZIPF_E6)
        .cast("bigint")
        .alias("x"),
        F.round(F.log(F.col("c").cast("double")) * _ZIPF_E6)
        .cast("bigint")
        .alias("y"),
    )
    sums = pts.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    return sums.select(
        F.col("n").alias("n_points"),
        F.round(num / den, 6).alias("slope"),
        F.round(-(num / den), 6).alias("zipf_exponent"),
    )


@register(
    "corpus_heaps_law_fit",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
      FROM documents
    ), first_doc AS (
      SELECT tok, CAST(MIN(doc_id) AS BIGINT) AS fd FROM toks GROUP BY tok
    ), per_doc AS (
      SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_toks
      FROM toks t GROUP BY t.doc_id
    ), new_types AS (
      SELECT fd AS doc_id, CAST(COUNT(*) AS BIGINT) AS nt
      FROM first_doc GROUP BY fd
    ), curve AS (
      SELECT p.doc_id,
             CAST(SUM(p.n_toks) OVER (ORDER BY p.doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS big_n,
             CAST(SUM(COALESCE(n.nt, 0)) OVER (ORDER BY p.doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS v
      FROM per_doc p LEFT JOIN new_types n ON n.doc_id = p.doc_id
    ), pts AS (
      SELECT CAST(ROUND(LN(CAST(big_n AS DOUBLE)) * 1000000) AS BIGINT) AS x,
             CAST(ROUND(LN(CAST(v AS DOUBLE)) * 1000000) AS BIGINT) AS y
      FROM curve
    ), mom AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS d,
             CAST(SUM(x) AS DOUBLE) AS sx,
             CAST(SUM(y) AS DOUBLE) AS sy,
             CAST(SUM(CAST(x AS HUGEINT) * y) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(x AS HUGEINT) * x) AS DOUBLE) AS sxx
      FROM pts
    ), tot AS (
      SELECT CAST(MAX(big_n) AS BIGINT) AS total_tokens,
             CAST(MAX(v) AS BIGINT) AS vocab_size,
             CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM curve
    )
    SELECT t.n_docs, t.total_tokens, t.vocab_size,
           CAST(ROUND((m.d * m.sxy - m.sx * m.sy)
                      / (m.d * m.sxx - m.sx * m.sx) * 1000000)
                AS BIGINT) AS beta_e6,
           CAST(ROUND((m.sy - (m.d * m.sxy - m.sx * m.sy)
                              / (m.d * m.sxx - m.sx * m.sx) * m.sx)
                      / m.d) AS BIGINT) AS intercept_e6
    FROM mom m CROSS JOIN tot t
    """,
    tags=("corpus", "tokenizer", "documents"),
)
def corpus_heaps_law_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary-growth fit (Heaps 1978; the companion of
    the Zipf exponent above): V(N) ≈ k·N^β, estimated by OLS on the
    log-log vocabulary-growth curve — how fast new types appear as the
    corpus streams in doc-id order. The growth exponent is the number
    a tokenizer-budget planner needs (how big does the vocab get at
    100× the corpus?).

    Plan: each token's FIRST document is one token-keyed MIN; per-doc
    new-type and token counts are doc-keyed aggregates; the cumulative
    (N_d, V_d) curve rides ops.global_running_sum TWICE (no data-scale
    single-partition window — the two offsets branches are whitelisted
    constant-size); the OLS runs on e6-fix-pointed ln points with
    DECIMAL(38,0) cross-moments (the CUPED device), so the only
    doubles are deterministic decimal→double casts and single
    divisions.

    Scale: everything after the tokenize pass is vocabulary- or
    doc-grain; moments are map-side-combinable. Envelope: ln points
    ≤ ~50e6 each, so Σx² ≤ docs·2.5e15 — exact in DECIMAL(38,0) to
    ~10²² docs."""
    from blow_spark import functions as BF
    from blow_spark import ops

    from blow_spark.materialize import spill_to_parquet

    d = read_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(BF.tokenize_ws(F.lower(F.col("text")))).alias("tok")
    )
    # ONE corpus tokenize pass: the doc-term table (doc-vocab grain)
    # spills, and first-occurrence / per-doc counts are cheap rollups
    dt = spill_to_parquet(
        toks.groupBy("doc_id", "tok").agg(
            F.count("*").cast("bigint").alias("cnt")
        ),
        "blow_spark_heaps_dt_",
    )
    first_doc = dt.groupBy("tok").agg(
        F.min("doc_id").cast("bigint").alias("fd")
    )
    per_doc = dt.groupBy("doc_id").agg(
        F.sum("cnt").cast("bigint").alias("n_toks")
    )
    new_types = first_doc.groupBy(F.col("fd").alias("doc_id")).agg(
        F.count("*").cast("bigint").alias("nt")
    )
    base = per_doc.join(new_types, "doc_id", "left").select(
        "doc_id",
        "n_toks",
        F.coalesce(F.col("nt"), F.lit(0)).cast("bigint").alias("nt"),
    )
    c1 = ops.global_running_sum(base, [F.col("doc_id")], "n_toks", out_col="big_n")
    curve = ops.global_running_sum(c1, [F.col("doc_id")], "nt", out_col="v")
    pts = curve.select(
        F.round(F.log(F.col("big_n").cast("double")) * 1_000_000)
        .cast("bigint")
        .alias("x"),
        F.round(F.log(F.col("v").cast("double")) * 1_000_000)
        .cast("bigint")
        .alias("y"),
    )
    xw = F.col("x").cast("decimal(19,0)")
    yw = F.col("y").cast("decimal(19,0)")
    mom = pts.agg(
        F.count("*").cast("double").alias("d"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(xw * yw).cast("double").alias("sxy"),
        F.sum(xw * xw).cast("double").alias("sxx"),
    )
    tot = curve.agg(
        F.max("big_n").cast("bigint").alias("total_tokens"),
        F.max("v").cast("bigint").alias("vocab_size"),
        F.count("*").cast("bigint").alias("n_docs"),
    )
    slope = (F.col("d") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("d") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return mom.crossJoin(F.broadcast(tot)).select(
        "n_docs",
        "total_tokens",
        "vocab_size",
        F.round(slope * 1_000_000).cast("bigint").alias("beta_e6"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("d"))
        .cast("bigint")
        .alias("intercept_e6"),
    )


# --------------------------------------------------------------------------
# Good-Turing frequency smoothing (round 12)
# --------------------------------------------------------------------------

_GT_MAX_R = 10  # report the head of the count-of-counts ladder


@register(
    "corpus_good_turing_counts",
    oracle=f"""
    WITH cnt AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS r
      FROM (
        SELECT unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS tok
        FROM documents
      ) GROUP BY tok
    ), coc AS (
      SELECT r, CAST(COUNT(*) AS BIGINT) AS n_r FROM cnt GROUP BY r
    ), tot AS (
      SELECT CAST(SUM(r * n_r) AS BIGINT) AS n_tokens,
             CAST(SUM(CASE WHEN r = 1 THEN n_r ELSE 0 END) AS BIGINT) AS n1
      FROM coc
    )
    SELECT c.r, c.n_r,
           CAST(COALESCE(nx.n_r, 0) AS BIGINT) AS n_r_next,
           CASE WHEN nx.n_r IS NULL THEN NULL
                ELSE CAST(ROUND(1000000.0 * (c.r + 1) * nx.n_r / c.n_r)
                          AS BIGINT)
           END AS r_star_e6,
           CAST(ROUND(1000000.0 * t.n1 / t.n_tokens) AS BIGINT)
             AS unseen_mass_e6
    FROM coc c
    LEFT JOIN coc nx ON nx.r = c.r + 1
    CROSS JOIN tot t
    WHERE c.r <= {_GT_MAX_R}
    ORDER BY c.r
    """,
    tags=("corpus", "smoothing", "documents", "exact"),
)
def corpus_good_turing_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Good-Turing frequency re-estimation (Good, Biometrika 1953 — the
    Turing-attributed smoothing every n-gram LM family builds on, incl.
    the Katz backoff and the Kneser-Ney discount this catalog already
    carries): the count-of-counts ladder N_r for r ≤ {_GT_MAX_R}, the
    adjusted counts r* = (r+1)·N_(r+1)/N_r at the e6 fixpoint, and the
    unseen-probability mass P₀ = N₁/N — the number that says how much
    of the corpus's token distribution is still UNOBSERVED, which a
    data pipeline reads to decide whether more data or more dedup is
    the next dollar. r* is NULL where N_(r+1) = 0 (the raw estimator is
    undefined there; smoothing-by-regression is the Zipf-fit query's
    job). Everything is exact integer arithmetic until the one bounded
    e6-rounded division on identical operands.

    Scale: one corpus tokenize + token-grain count, then a VALUE-GRAIN
    count-of-counts aggregate (≤ distinct-count rows) and a ladder
    self-join on r — the heavy lifting is the same map-side-combinable
    shape as corpus_zipf_exponent; everything after the vocabulary
    table is value-domain-sized. Reference analog: none."""
    from blow_spark import functions as BF
    from blow_spark.materialize import spill_to_parquet

    d = read_table(spark, sf_dir, "documents")
    cnt = (
        d.select(F.explode(BF.tokenize_ws(F.lower(F.col("text")))).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").cast("bigint").alias("r"))
    )
    # the count-of-counts table feeds THREE consumers (totals, the
    # r+1 ladder join, the main rows): spill once so the corpus
    # tokenize+count — the only data-scale work — runs exactly once
    coc = spill_to_parquet(
        cnt.groupBy("r").agg(F.count("*").cast("bigint").alias("n_r")),
        "blow_spark_gt_",
    )
    tot = coc.agg(
        F.sum(F.col("r") * F.col("n_r")).cast("bigint").alias("n_tokens"),
        F.sum(F.when(F.col("r") == 1, F.col("n_r")).otherwise(0))
        .cast("bigint")
        .alias("n1"),
    )
    nxt = coc.select((F.col("r") - 1).alias("r"), F.col("n_r").alias("n_r_next_"))
    return (
        coc.filter(F.col("r") <= _GT_MAX_R)
        .join(nxt, "r", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "r",
            "n_r",
            F.coalesce("n_r_next_", F.lit(0)).cast("bigint").alias("n_r_next"),
            F.when(F.col("n_r_next_").isNull(), F.lit(None).cast("bigint"))
            .otherwise(
                F.round(
                    1000000.0
                    * (F.col("r") + 1)
                    * F.col("n_r_next_")
                    / F.col("n_r")
                ).cast("bigint")
            )
            .alias("r_star_e6"),
            F.round(1000000.0 * F.col("n1") / F.col("n_tokens"))
            .cast("bigint")
            .alias("unseen_mass_e6"),
        )
        .orderBy("r")
    )
