"""Round-9 pins.

1. The Fellegi-Sunter blocker (round-8 verdict item #1) is now
   data-adaptive: per-nation band count grows ∝ N so block size stays
   ≈ _FS_DEPTH regardless of corpus size, and a hard _FS_CAP salts any
   skew-inflated block into deterministic sub-blocks. These tests pin
   both properties so the docstring's bounded-fan-out claim carries a
   receipt (the round-8 verdict's item #6 pattern: claims need pins).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from blow_spark.queries.entity import _FS_CAP, _FS_DEPTH, _fs_blocked_rows
from blow_spark.sources import read_table

SF_SMALL = "/root/testdata/sf0.001"
SF_MEDIUM = "/root/testdata/sf0.01"


def _customer_cents(spark, sf_dir):
    return read_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        "c_mktsegment",
        F.round(F.col("c_acctbal") * 100).cast("bigint").alias("bal"),
    )


def _max_block(df) -> int:
    return (
        _fs_blocked_rows(df)
        .groupBy("c_nationkey", "rule", "band", "sub")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )


def test_fs_block_size_capped_and_sublinear(spark):
    """10× more rows must NOT mean 10× bigger blocks: the adaptive
    band count absorbs growth, so max block size is capped by _FS_CAP
    and grows <2× across a 10× row replica of sf0.01."""
    base = _customer_cents(spark, SF_MEDIUM)
    # key-offset 10× replica: same machinery scale_sf1.py uses — every
    # replica keeps the balance distribution, keys shifted so pairs
    # across replicas stay distinct rows.
    reps = [
        base.withColumn("c_custkey", F.col("c_custkey") + F.lit(i * 10_000_000))
        for i in range(10)
    ]
    big = reps[0]
    for r in reps[1:]:
        big = big.union(r)

    m_small = _max_block(_customer_cents(spark, SF_SMALL))
    m_base = _max_block(base)
    m_big = _max_block(big)

    assert m_small <= _FS_CAP
    assert m_base <= _FS_CAP
    assert m_big <= _FS_CAP
    # sublinear: 10× the rows, block size must grow far less than 10×.
    # (It converges to ~_FS_DEPTH in expectation; with only ~60
    # distinct balances per nation in the sf0.01 base, band-occupancy
    # fluctuation can double a band — the hard bound is _FS_CAP, the
    # growth bound is "well under proportional".)
    assert m_big < (10 * m_base) // 2


def test_fs_skew_backstop_salts_hot_block(spark):
    """Adversarial value skew (every balance identical → one band per
    nation) must trip the CAP salting: no sub-block exceeds ~CAP even
    though the band itself holds thousands of rows."""
    n = 5000
    df = spark.range(1, n + 1).select(
        F.col("id").alias("c_custkey"),
        F.lit(7).alias("c_nationkey"),
        F.lit("BUILDING").alias("c_mktsegment"),
        F.lit(123_456).cast("bigint").alias("bal"),
    )
    blocks = (
        _fs_blocked_rows(df)
        .groupBy("c_nationkey", "rule", "band", "sub")
        .count()
    )
    mx = blocks.agg(F.max("count")).collect()[0][0]
    n_sub = blocks.select("sub").distinct().count()
    assert mx <= _FS_CAP
    assert n_sub >= n // _FS_CAP  # the salt actually fanned out


def test_fs_blocker_is_lossless_within_half_band(spark):
    """Recall contract of the union-of-two-rules blocker: any two rows
    of the same nation whose band positions differ by less than half a
    bandwidth share a block in rule 0 or rule 1 (before CAP salting).
    Verified exhaustively on the sf0.001 fixture: every same-nation
    pair within 1/(2B) of the cents range co-blocks in some rule."""
    c = _customer_cents(spark, SF_SMALL)
    keyed = _fs_blocked_rows(c).select(
        "c_custkey", "c_nationkey", "bal", "rule", "band"
    )
    stats = c.groupBy("c_nationkey").agg(
        F.min("bal").alias("lo"),
        (F.max("bal") - F.min("bal") + F.lit(1)).cast("bigint").alias("span"),
        F.expr(f"(count(*) + {_FS_DEPTH - 1}) div {_FS_DEPTH}")
        .cast("bigint")
        .alias("nb"),
    )
    a = c.select(
        F.col("c_custkey").alias("id_a"),
        F.col("c_nationkey").alias("nk"),
        F.col("bal").alias("bal_a"),
    )
    b = c.select(
        F.col("c_custkey").alias("id_b"),
        F.col("c_nationkey").alias("nk"),
        F.col("bal").alias("bal_b"),
    )
    close = (
        a.join(b, ["nk"])
        .filter(F.col("id_a") < F.col("id_b"))
        .join(stats, F.col("nk") == F.col("c_nationkey"))
        # strictly inside half a bandwidth: |Δbal| * nb * 2 < span
        .filter(F.abs(F.col("bal_a") - F.col("bal_b")) * F.col("nb") * 2 < F.col("span"))
        .select("id_a", "id_b")
    )
    ka = keyed.select(
        F.col("c_custkey").alias("id_a"),
        F.col("c_nationkey").alias("nk"),
        F.col("rule").alias("r"),
        F.col("band").alias("bd"),
    )
    kb = keyed.select(
        F.col("c_custkey").alias("id_b"),
        F.col("c_nationkey").alias("nk"),
        F.col("rule").alias("r"),
        F.col("band").alias("bd"),
    )
    coblocked = ka.join(kb, ["nk", "r", "bd"]).select("id_a", "id_b").distinct()
    missed = close.join(coblocked, ["id_a", "id_b"], "left_anti").count()
    assert missed == 0


def test_no_brace_placeholders_in_catalog_docstrings():
    """Round-8 ADVICE item 3: docstrings with {_CONST} placeholders
    leaked literal brace text into QUERIES.md. register() now
    interpolates module constants; this pins the whole catalog clean."""
    import blow_spark.queries as Q

    Q.queries()
    offenders = [
        n for n, q in Q.REGISTRY.items() if "{_" in (q.builder.__doc__ or "")
    ]
    assert offenders == []


def test_unigram_em_cost_monotone(spark):
    """Round-8 verdict item #3: the full EM loop is registered
    (tokenizer_unigram_em) and its Σcost is non-increasing — every
    round's monotone_ok proof bit is realized true, and the first
    M-step strictly improves on the substring-count initialization."""
    from blow_spark.queries.text2 import tokenizer_unigram_em

    rows = tokenizer_unigram_em(spark, SF_SMALL).collect()
    assert [r["em_round"] for r in rows] == [0, 1, 2]
    assert all(r["monotone_ok"] for r in rows)
    assert rows[1]["total_cost_e6"] < rows[0]["total_cost_e6"]
    assert rows[2]["total_cost_e6"] <= rows[1]["total_cost_e6"] + 2 * rows[1][
        "piece_tokens"
    ]


def test_scale_claims_carry_receipts():
    """Claims ledger (round-8 verdict item #6): any registered query
    whose docstring makes a strong scale claim — bounded/capped
    fan-out, 'never <grows with> corpus/data size', 'independent of
    corpus/data/N' — must carry a receipt: the docstring cites
    SCALE.md or a test file, OR the query name appears in SCALE.md
    (a measured slope row) or in a dedicated test module. Rounds 6
    and 8 each caught a bounded-fan-out claim with nothing behind it;
    this makes the pattern structurally impossible to repeat."""
    import glob
    import re

    import blow_spark.queries as Q

    Q.queries()
    scale = open("/root/repo/SCALE.md").read()
    tests_blob = ""
    for p in glob.glob("/root/repo/tests/*.py"):
        if "test_queries_oracle" in p:  # auto-enrollment is not a receipt
            continue
        tests_blob += open(p).read()
    strong = re.compile(
        r"(bounds?|caps?|capped|bounding)\b[^.]*\bfan-?out"
        r"|fan-?out[^.]*\b(bound|cap)"
        r"|never [^.]*\b(corpus|data) (size|volume)"
        r"|independent of (corpus|data|N)\b",
        re.I | re.S,
    )
    receipt_doc = re.compile(r"SCALE\.md|tests/test_\w+\.py", re.I)
    offenders = []
    for name, q in Q.REGISTRY.items():
        doc = q.builder.__doc__ or ""
        if strong.search(doc):
            backed = (
                bool(receipt_doc.search(doc))
                or name in scale
                or name in tests_blob
            )
            if not backed:
                offenders.append(name)
    assert offenders == [], (
        f"scale claims without a SCALE.md slope row or pinned test: {offenders}"
    )


def test_ktruss_cascade_and_fixpoint(spark):
    """graph_ktruss_prune must actually prune (the loop is not
    vacuous: the part co-order graph cascades for several rounds) and
    must reach the fixpoint within its registered rounds (final
    n_removed = 0, converged bit realized true)."""
    from blow_spark.queries.graph2 import graph_ktruss_prune

    rows = graph_ktruss_prune(spark, SF_SMALL).collect()
    assert rows[0]["n_removed"] > 0          # pruning exercised
    assert rows[-1]["n_removed"] == 0        # fixpoint reached
    assert rows[-1]["converged"] is True
