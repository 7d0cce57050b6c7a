"""Deduplication operators for training-data pipelines.

Four families, each designed around its 100 TB shuffle profile:

* **exact** — hash-groupBy on a 16-byte content digest: the shuffle carries
  digests + ids, never document bodies.
* **MinHash + LSH** — shingle → k minhashes → b bands → band-bucket
  equi-join; candidate generation is a normal hash join Catalyst can plan,
  then an exact-Jaccard re-rank on the (small) candidate set.
* **SimHash** — 64-bit sketch via explode + one aggregation, Hamming-band
  bucketing (pigeonhole), exact Hamming filter with bit_count(xor).
* **exact n-gram Jaccard** — rare-shingle blocking + exact set overlap;
  quadratic only within blocks; the ground truth the sketches are
  validated against in tests/test_dedup.py.

The reference implements no dedup (SURVEY.md §2.2 "Extension ops"); these
are first-class operators mandated by the task brief. All candidate
generation is built-in DataFrame ops — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from blow_spark.functions import tokenize_ws, word_shingles

# --------------------------------------------------------------------------
# Exact dedup
# --------------------------------------------------------------------------


def exact_dedup_groups(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Group identical (normalized) texts: (text_hash, keep_id, n_copies).
    keep_id = lowest id per group — the canonical survivor."""
    h = F.md5(F.lower(F.trim(F.col(text_col))))
    return (
        df.select(F.col(id_col), h.alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_copies"))
    )


def drop_exact_dups(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Return df minus non-canonical duplicates (keeps lowest id per hash).
    Implemented as min-id-per-hash + semi-join back, so full rows never
    shuffle — only (hash, id) pairs do."""
    keep = exact_dedup_groups(df, text_col, id_col).select(F.col("keep_id").alias(id_col))
    return df.join(keep, on=id_col, how="left_semi")


# --------------------------------------------------------------------------
# MinHash + LSH
# --------------------------------------------------------------------------


# Universal-hash family over the prime field p = 2^31 - 1: each shingle is
# string-hashed ONCE (xxhash64 → residue mod p), then the k minhash
# functions are affine permutations h_i(x) = (a_i·x + b_i) mod p. a_i, b_i
# fit in 31 bits so a_i·x + b_i < 2^62 — no long overflow under ANSI mode.
# This is 1 string-hash pass + k integer passes per doc instead of k
# string-hash passes, and every pass folds inside whole-stage codegen
# (no explode, no shuffle). Seeds are fixed → signatures are deterministic.
_MERSENNE_P = (1 << 31) - 1


def _perm_coeffs(num_hashes: int) -> list[tuple[int, int]]:
    import random

    rng = random.Random(0x5EED)
    return [(rng.randrange(1, _MERSENNE_P), rng.randrange(0, _MERSENNE_P)) for _ in range(num_hashes)]


def _shingle_residues(shingles):
    """One xxhash64 per shingle, reduced into the field: materialize this as
    a column BEFORE fanning out to the k permutations so the string hashing
    runs once, not k times."""
    p = F.lit(_MERSENNE_P)
    return F.transform(shingles, lambda s: F.pmod(F.xxhash64(s), p))


def _minhash_signature(residues, num_hashes: int):
    """k minhashes via k affine permutations of the precomputed residues.

    NOTE the single-parameter lambdas: PySpark's ``F.transform`` passes the
    array *index* as a second argument to any two-parameter lambda, so the
    idiom ``lambda s, i=i: ...`` silently binds ``i`` to the element
    position — every "distinct" hash function collapses into the same one.
    """
    p = F.lit(_MERSENNE_P)

    def perm(a: int, b: int):
        return F.array_min(F.transform(residues, lambda x: F.pmod(x * F.lit(a) + F.lit(b), p)))

    return [perm(a, b).alias(f"mh_{i}") for i, (a, b) in enumerate(_perm_coeffs(num_hashes))]


def minhash_signatures(
    df: DataFrame, text_col: str, id_col: str, num_hashes: int = 64, shingle_n: int = 3
) -> DataFrame:
    shingles = word_shingles(F.col(text_col), shingle_n)
    return (
        df.select(F.col(id_col), _shingle_residues(shingles).alias("_res"))
        .select(id_col, F.array(*_minhash_signature(F.col("_res"), num_hashes)).alias("minhash"))
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.5,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, jaccard ≥ threshold).

    Band tuning: the S-curve midpoint is (1/b)^(1/r); 16 bands × 4 rows
    puts it at (1/16)^(1/4) ≈ 0.5 — matched to the default threshold.
    (8×8 would sit at ≈0.77 and silently miss most 0.5-similar pairs.)

    Stage 1 (candidates): signature → b band-hashes → explode to
    (band_idx, band_hash) → self equi-join. The join key is 16 bytes/row ×
    b rows/doc; at 100 TB of text this shuffles ~b·16B per doc, not text.
    Stage 2 (verify): exact Jaccard on distinct shingle sets, only for
    candidates (skew-safe: AQE splits hot buckets; identical boilerplate
    docs all landing in one bucket is the known pathology — cap bucket
    fan-out upstream by dropping band-buckets larger than ~10k docs).
    """
    rows_per_band = num_hashes // bands
    shingles = word_shingles(F.col(text_col), shingle_n)
    base = df.select(F.col(id_col).alias("doc"), shingles.alias("shingles")).filter(
        F.size("shingles") > 0
    )
    # Persist: `base` feeds the signature pipeline AND both verify-join
    # sides; `banded` feeds both sides of the candidate self-join. Without
    # persistence Spark recomputes shingling + 64 minhash passes once per
    # consumer (4×). At cluster scale this would be a checkpoint to a
    # bucketed table instead; MEMORY_AND_DISK is the local analog.
    base = base.persist()
    sig = base.select(
        "doc",
        _shingle_residues(F.col("shingles")).alias("_res"),
    ).select("doc", F.array(*_minhash_signature(F.col("_res"), num_hashes)).alias("mh"))
    band_arr = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(F.concat_ws(",", *[F.col("mh")[b * rows_per_band + r].cast("string") for r in range(rows_per_band)])).alias("bucket"),
            )
            for b in range(bands)
        ]
    )
    banded = sig.select("doc", F.explode(band_arr).alias("bb")).select(
        "doc", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    ).persist()
    left = banded.alias("l")
    right = banded.alias("r")
    candidates = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.doc") < F.col("r.doc")),
        )
        .select(F.col("l.doc").alias("id_a"), F.col("r.doc").alias("id_b"))
        .distinct()
    )
    sh_a = base.select(F.col("doc").alias("id_a"), F.col("shingles").alias("sh_a"))
    sh_b = base.select(F.col("doc").alias("id_b"), F.col("shingles").alias("sh_b"))
    verified = (
        candidates.join(sh_a, "id_a")
        .join(sh_b, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
                / F.size(F.array_union("sh_a", "sh_b"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return verified.select("id_a", "id_b", "jaccard")


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------


def simhash(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """64-bit SimHash per document: explode tokens → xxhash64 → per-bit
    ±1 vote aggregation (one shuffle keyed by id; 64 SUMs is a single
    hash-aggregate pass) → sign-pack into a long."""
    toks = df.select(
        F.col(id_col).alias("doc"),
        F.explode(tokenize_ws(F.lower(F.col(text_col)))).alias("tok"),
    ).select("doc", F.xxhash64("tok").alias("h"))
    votes = toks.groupBy("doc").agg(
        *[
            F.sum(
                F.when(F.col("h").bitwiseAND(F.shiftleft(F.lit(1).cast("long"), b)) != 0, 1).otherwise(-1)
            ).alias(f"v{b}")
            for b in range(64)
        ]
    )
    packed = None
    for b in range(64):
        bit = F.when(F.col(f"v{b}") > 0, F.shiftleft(F.lit(1).cast("long"), b)).otherwise(F.lit(0).cast("long"))
        packed = bit if packed is None else packed.bitwiseOR(bit)
    return votes.select(F.col("doc").alias(id_col), packed.alias("simhash"))


def simhash_pairs(
    df: DataFrame, text_col: str, id_col: str, max_hamming: int = 8, bands: int = 4
) -> DataFrame:
    """Candidate pairs within Hamming distance ≤ max_hamming of each other's
    SimHash. Bucketing by 16-bit bands guarantees recall for distance <
    bands (pigeonhole); beyond that it is best-effort — standard SimHash
    practice is bands = max_hamming + 1 with narrower chunks; 4×16 bits is
    the throughput-friendly default for near-identical docs."""
    bits_per_band = 64 // bands
    sh = simhash(df, text_col, id_col).select(F.col(id_col).alias("doc"), "simhash")
    mask = (1 << bits_per_band) - 1
    band_arr = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftrightunsigned("simhash", b * bits_per_band).bitwiseAND(F.lit(mask)).alias("chunk"),
            )
            for b in range(bands)
        ]
    )
    banded = sh.select("doc", "simhash", F.explode(band_arr).alias("bb")).select(
        "doc", "simhash", F.col("bb.band").alias("band"), F.col("bb.chunk").alias("chunk")
    )
    l, r = banded.alias("l"), banded.alias("r")
    return (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.chunk") == F.col("r.chunk"))
            & (F.col("l.doc") < F.col("r.doc")),
        )
        .select(
            F.col("l.doc").alias("id_a"),
            F.col("r.doc").alias("id_b"),
            F.bit_count(F.col("l.simhash").bitwiseXOR(F.col("r.simhash"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


# --------------------------------------------------------------------------
# Exact n-gram Jaccard (ground truth)
# --------------------------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.4,
    shingle_n: int = 3,
    max_shingle_freq: int = 50,
) -> DataFrame:
    """Exact word-n-gram Jaccard over blocked candidates: docs pair up iff
    they share at least one *rare* shingle (document frequency ≤
    max_shingle_freq). Rare-shingle blocking bounds the join fan-out: a
    boilerplate shingle appearing in 10^6 docs never becomes a join key.
    Any pair with J ≥ threshold shares ≥1 shingle; if all its shingles are
    ultra-common the pair is boilerplate, which the frequency cap
    deliberately excludes."""
    shingles = word_shingles(F.col(text_col), shingle_n)
    base = df.select(F.col(id_col).alias("doc"), shingles.alias("sh")).filter(F.size("sh") > 0)
    exploded = base.select("doc", F.explode("sh").alias("g"))
    rare = exploded.groupBy("g").agg(F.count("*").alias("df_")).filter(
        F.col("df_") <= max_shingle_freq
    )
    blocked = exploded.join(rare.select("g"), "g")
    l, r = blocked.alias("l"), blocked.alias("r")
    candidates = (
        l.join(r, (F.col("l.g") == F.col("r.g")) & (F.col("l.doc") < F.col("r.doc")))
        .select(F.col("l.doc").alias("id_a"), F.col("r.doc").alias("id_b"))
        .distinct()
    )
    sh_a = base.select(F.col("doc").alias("id_a"), F.col("sh").alias("sh_a"))
    sh_b = base.select(F.col("doc").alias("id_b"), F.col("sh").alias("sh_b"))
    return (
        candidates.join(sh_a, "id_a")
        .join(sh_b, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
                / F.size(F.array_union("sh_a", "sh_b"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
