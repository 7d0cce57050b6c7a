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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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
