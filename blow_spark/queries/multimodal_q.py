"""Multimodal-column queries: binary payload + typed metadata over the
documents fixture (payloads synthesized deterministically from text — the
container ships no codecs, so decode is stubbed; the Spark-side plumbing
is real and oracled where byte semantics are SQL-expressible)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from blow_spark import multimodal
from blow_spark.queries import register
from blow_spark.sources import read_table


@register(
    "multimodal_binary_meta",
    oracle="""
    SELECT doc_id,
           OCTET_LENGTH(ENCODE(text))      AS n_bytes,
           SHA256(text)                    AS content_sha,
           OCTET_LENGTH(ENCODE(text)) % 640 + 1 AS width
    FROM documents
    """,
    tags=("multimodal", "binary"),
)
def multimodal_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary column + metadata extraction: blob size, content digest,
    synthesized dimensions. Byte-exact across engines (UTF-8 encode +
    SHA-256 are specifications, not implementations)."""
    d = multimodal.with_synthetic_media(read_table(spark, sf_dir, "documents"))
    return d.select(
        "doc_id",
        F.length("content").cast("long").alias("n_bytes"),
        F.sha2("content", 256).alias("content_sha"),
        F.col("meta.width").cast("long").alias("width"),
    )


@register("multimodal_byte_features", oracle=None, tags=("multimodal", "features"))
def multimodal_byte_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads (entropy +
    byte histogram via mapInPandas) — the decode-and-featurize plumbing
    with the codec stubbed. Verified against local numpy in
    tests/test_multimodal.py. The 16-bin histogram is serialized to a CSV
    string so every output column is scalar (the driver's canonicalizer
    cannot sort list cells)."""
    d = multimodal.with_synthetic_media(read_table(spark, sf_dir, "documents"))
    feats = multimodal.extract_byte_features(d)
    return feats.select(
        "doc_id",
        "n_bytes",
        F.round("byte_entropy", 6).alias("byte_entropy"),
        F.concat_ws(
            ",", F.transform("byte_hist", lambda x: F.format_string("%.6f", x))
        ).alias("byte_hist_csv"),
    )


@register(
    "multimodal_frame_sample",
    oracle="""
    WITH b AS (
      SELECT doc_id, hex(ENCODE(text)) AS hx,
             OCTET_LENGTH(ENCODE(text)) AS total
      FROM documents
    )
    SELECT doc_id,
           CAST(i AS BIGINT) AS frame_no,
           substring(hx, 2 * (i * GREATEST(total - 64, 0) // 3) + 1, 128) AS frame_hex,
           CAST(LENGTH(substring(hx, 2 * (i * GREATEST(total - 64, 0) // 3) + 1, 128)) // 2
                AS BIGINT) AS frame_len
    FROM b, (SELECT UNNEST(range(0, 4)) AS i) s
    """,
    tags=("multimodal", "frames"),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1 blob → N frame rows (video-frame-sampling shape): deterministic
    evenly-spaced byte slices, posexploded. Frames are emitted as hex
    strings: this DuckDB build has no BLOB substring/sha, but byte slices
    are exactly reproducible as substrings of hex(blob) at doubled
    offsets — giving the oracle full byte-level coverage of the slicing
    arithmetic."""
    d = multimodal.with_synthetic_media(read_table(spark, sf_dir, "documents"))
    frames = multimodal.sample_frames(d, n_frames=4, frame_bytes=64)
    return frames.select(
        "doc_id",
        F.col("frame_no").cast("bigint").alias("frame_no"),
        F.hex("frame_bytes").alias("frame_hex"),
        F.length("frame_bytes").cast("bigint").alias("frame_len"),
    )


@register("multimodal_resize_batch", oracle=None, tags=("multimodal", "resize"))
def multimodal_resize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode → nearest-neighbor resize → per-image checksum over Arrow
    batches (mapInPandas) — the image-preprocessing stage with the codec
    stubbed (deterministic fake decode, task-brief sanctioned). Rows-only:
    the fake-decode byte→pixel mapping isn't SQL-expressible; resize
    arithmetic is verified against local numpy in tests/test_multimodal.py."""
    d = multimodal.with_synthetic_media(read_table(spark, sf_dir, "documents"))
    return multimodal.resize_features(d, out_h=4, out_w=4)


@register("multimodal_audio_energy", oracle=None, tags=("multimodal", "audio"))
def multimodal_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio modality path: decode (stub) → fixed-window framing →
    per-window RMS/peak, via mapInPandas — the silence-detection pass.
    Rows-only (fake PCM decode isn't SQL-expressible); window math is
    verified against local numpy in tests/test_multimodal.py."""
    d = multimodal.with_synthetic_media(read_table(spark, sf_dir, "documents"))
    return multimodal.audio_window_features(d, window_samples=256)


@register(
    "multimodal_payload_dedup",
    oracle="""
    WITH norm AS (
      SELECT doc_id, SHA256(LOWER(TRIM(text))) AS payload_sha,
             OCTET_LENGTH(ENCODE(text)) AS n_bytes
      FROM documents
    )
    SELECT payload_sha,
           CAST(MIN(doc_id) AS BIGINT)     AS keep_id,
           COUNT(*)                        AS n_copies,
           CAST(SUM(n_bytes) AS BIGINT)    AS total_bytes,
           CAST(SUM(n_bytes) - MIN(n_bytes) AS BIGINT) AS reclaimable_bytes
    FROM norm
    GROUP BY payload_sha
    """,
    tags=("multimodal", "dedup", "binary"),
)
def multimodal_payload_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup over BINARY payloads — the no-decode media dedup pass
    (identical image/audio files recur constantly in crawled corpora):
    content-address each blob with SHA-256 computed from a normalized
    view of the payload, group, elect the lowest-id survivor, and report
    reclaimable bytes — the dedup savings estimate a storage pass
    reports before deleting. Digests are computed where the bytes live:
    the shuffle carries (32-byte digest, id, size), never payloads —
    at 100 TB of media that is the entire difference between a feasible
    pass and an infeasible one."""
    d = multimodal.with_synthetic_media(read_table(spark, sf_dir, "documents"))
    norm = d.select(
        "doc_id",
        F.sha2(F.lower(F.trim(F.col("content").cast("string"))).cast("binary"), 256).alias(
            "payload_sha"
        ),
        F.length("content").cast("long").alias("n_bytes"),
    )
    return norm.groupBy("payload_sha").agg(
        F.min("doc_id").cast("bigint").alias("keep_id"),
        F.count("*").alias("n_copies"),
        F.sum("n_bytes").cast("bigint").alias("total_bytes"),
        (F.sum("n_bytes") - F.min("n_bytes")).cast("bigint").alias("reclaimable_bytes"),
    )
