"""Text-analysis and deduplication queries over the ``documents`` fixture.

The training-data-pipeline surface (task brief + SURVEY.md §2.2 "Extension
ops"): exact dedup, near-dedup (MinHash-LSH / SimHash / n-gram Jaccard —
implementations in blow_spark.dedup), language ID, quality scoring, token
counting, fingerprinting (blow_spark.functions).

Oracle-able queries pair with ANSI SQL; sketch-based ones (MinHash, SimHash)
are engine-specific and register rows-only, with exact-Jaccard verification
in tests/test_dedup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from blow_spark import dedup, functions as BF
from blow_spark.queries import register
from blow_spark.sources import read_table


@register(
    "dedup_exact",
    oracle="""
    SELECT h AS text_hash,
           CAST(MIN(doc_id) AS BIGINT) AS keep_id,
           COUNT(*) AS n_copies
    FROM (SELECT doc_id, MD5(LOWER(TRIM(text))) AS h FROM documents) t
    GROUP BY h
    """,
    tags=("dedup", "text"),
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: normalize → content hash → groupBy, keeping the lowest
    doc_id per hash. One shuffle on the hash; at 100 TB the hash (16 bytes)
    shuffles instead of the document bodies."""
    d = read_table(spark, sf_dir, "documents")
    return dedup.exact_dedup_groups(d, text_col="text", id_col="doc_id")


@register(
    "text_stats",
    oracle="""
    SELECT doc_id,
           LENGTH(text)                                   AS n_chars_calc,
           LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 AS n_tokens,
           CAST(LENGTH(REPLACE(text, ' ', '')) AS DOUBLE)
             / (LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1) AS avg_token_len,
           lang, source
    FROM documents
    """,
    tags=("text", "stats"),
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token statistics, computed purely with JVM-side string
    built-ins (no Python on the hot path)."""
    d = read_table(spark, sf_dir, "documents")
    n_chars = F.length("text")
    n_nospace = F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
    n_tokens = n_chars - n_nospace + 1
    return d.select(
        "doc_id",
        n_chars.alias("n_chars_calc"),
        n_tokens.alias("n_tokens"),
        (n_nospace.cast("double") / n_tokens).alias("avg_token_len"),
        "lang",
        "source",
    )


@register(
    "text_quality_score",
    oracle="""
    SELECT doc_id,
           CASE WHEN LENGTH(text) >= 100 THEN 1.0 ELSE LENGTH(text) / 100.0 END * 0.5
         + CASE WHEN (LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1) >= 20 THEN 1.0
                ELSE (LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1) / 20.0 END * 0.5
           AS quality_score
    FROM documents
    """,
    tags=("text", "quality"),
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    return d.select("doc_id", BF.quality_score(F.col("text")).alias("quality_score"))


@register("text_lang_id", oracle=None, tags=("text", "langid"))
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID (stopword-hit scoring over a per-language
    marker list). No SQL oracle (the marker tables live engine-side);
    tests/test_text.py checks accuracy against the fixture's `lang` truth
    column instead."""
    d = read_table(spark, sf_dir, "documents")
    return d.select("doc_id", "lang", BF.lang_id(F.col("text")).alias("lang_pred"))


@register(
    "text_fingerprint",
    oracle=None,
    tags=("text", "fingerprint"),
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit document fingerprint (xxhash64 over normalized shingles) —
    engine-specific hash, rows-only check; stability pinned in tests."""
    d = read_table(spark, sf_dir, "documents")
    return d.select("doc_id", BF.doc_fingerprint(F.col("text")).alias("fingerprint"))


@register("dedup_minhash_lsh", oracle=None, tags=("dedup", "minhash"))
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-duplicate candidate pairs (shingle → 64 minhashes →
    8 bands → band-bucket equi-join → exact Jaccard re-rank ≥ 0.5).
    Sketches are engine-specific → rows-only; tests verify against exact
    n-gram Jaccard on the same corpus."""
    d = read_table(spark, sf_dir, "documents")
    return dedup.minhash_lsh_pairs(d, text_col="text", id_col="doc_id", threshold=0.5)


@register("dedup_simhash", oracle=None, tags=("dedup", "simhash"))
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup: 64-bit simhash per doc, Hamming-band bucketing,
    candidate pairs within Hamming distance ≤ 8."""
    d = read_table(spark, sf_dir, "documents")
    return dedup.simhash_pairs(d, text_col="text", id_col="doc_id", max_hamming=8)


@register(
    "dedup_ngram_jaccard",
    oracle=None,
    tags=("dedup", "jaccard"),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard similarity for candidate pairs sharing a rare
    token (blocking key), pairs with J ≥ 0.4. Exact but quadratic within
    block — the ground-truth used to validate the sketch methods."""
    d = read_table(spark, sf_dir, "documents")
    return dedup.ngram_jaccard_pairs(d, text_col="text", id_col="doc_id", threshold=0.4)
