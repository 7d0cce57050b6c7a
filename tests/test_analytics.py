"""Semantic pins for the round-5 session-2 analytics/governance operators.

Each new operator's algorithm-specific claim is checked against an
INDEPENDENT third implementation (Python stdlib) on top of the
catalog-wide Spark-vs-DuckDB oracle gate in test_queries_oracle.py —
three engines agreeing is the strongest cheap evidence the semantics
are the ones we documented, not an artifact shared by two SQL dialects.
"""

from __future__ import annotations

import re

from blow_spark.queries import queries

ALL_QUERIES = queries()


def test_pattern_match_agrees_with_python_re(spark, sf_dir):
    """has_conversion / n_paths must equal Python re's leftmost-first
    non-overlapping semantics on every emitted sequence (third engine:
    Java regex == RE2 == CPython sre on this closed alphabet)."""
    rows = ALL_QUERIES["events_pattern_match"](spark, sf_dir).collect()
    assert rows, "no per-user sequences emitted"
    pat = re.compile(r"v[^p]*c[^p]*p")
    n_hits = 0
    for r in rows:
        assert len(r["seq"]) == r["n_events"]
        assert set(r["seq"]) <= set("vcpes")
        expect_paths = len(pat.findall(r["seq"]))
        assert r["n_paths"] == expect_paths, r
        assert r["has_conversion"] == (1 if expect_paths else 0), r
        n_hits += r["has_conversion"]
    # the fixture funnel actually fires for some users (non-vacuous test)
    assert n_hits > 0


def test_dq_audit_shape_and_nonvacuous(spark, sf_dir):
    """8 expectations, counts consistent, and the temporal rule really
    fails on the fixture (the generator enforces no ship-after-order
    constraint) so the audit gate is non-vacuous."""
    rows = {r["expectation"]: r for r in
            ALL_QUERIES["dq_expectations_audit"](spark, sf_dir).collect()}
    assert len(rows) == 8
    for r in rows.values():
        assert 0 <= r["n_violations"] <= r["n_checked"]
        assert r["passed"] == (1 if r["n_violations"] == 0 else 0)
    assert rows["lineitem.l_shipdate.after_orderdate"]["n_violations"] > 0
    assert rows["orders.o_orderkey.unique"]["passed"] == 1
    assert rows["orders.o_custkey.fk_customer"]["passed"] == 1
    assert rows["lineitem.l_orderkey.fk_orders"]["passed"] == 1


def test_k_anonymity_invariants(spark, sf_dir):
    """Every published class at levels 0-2 has >= k rows (the actual
    k-anonymity property — the iterative-suppression ladder counts only
    the rows that DISPLAY each generalized tuple); total rows are
    conserved; the ladder is non-trivially exercised."""
    from blow_spark.queries.governance import _K
    from blow_spark.sources import read_table

    rows = ALL_QUERIES["privacy_k_anonymity"](spark, sf_dir).collect()
    n_customers = read_table(spark, sf_dir, "customer").count()
    assert sum(r["n_rows"] for r in rows) == n_customers
    levels = set()
    for r in rows:
        levels.add(r["anon_level"])
        if r["anon_level"] <= 2:
            assert r["n_rows"] >= _K, r
        stars = [r["gen_bal_bucket"] == "*", r["gen_segment"] == "*",
                 r["gen_nation"] == "*"]
        # generalization is monotone: level L wildcards exactly the L
        # finest quasi-identifier columns
        assert stars == [lvl < r["anon_level"] for lvl in range(3)], r
    assert len(levels) >= 2, f"ladder not exercised: {levels}"


def test_negative_pairs_properties(spark, sf_dir):
    """Pairs are cross-source, self-free, bounded at 4 per anchor, and
    cover most anchors (the ring multiplier keeps probes spread)."""
    rows = ALL_QUERIES["sample_negative_pairs"](spark, sf_dir).collect()
    assert rows
    per_anchor = {}
    for r in rows:
        assert r["anchor_source"] != r["neg_source"], r
        assert r["anchor_doc_id"] != r["neg_doc_id"], r
        assert 1 <= r["j"] <= 4
        per_anchor.setdefault(r["anchor_doc_id"], set()).add(r["j"])
    assert all(len(js) <= 4 for js in per_anchor.values())
    from blow_spark.sources import read_table
    n_docs = read_table(spark, sf_dir, "documents").count()
    # 20 uniform sources -> a probe dies ~1/20 of the time; anchors with
    # ZERO surviving probes should be rare
    assert len(per_anchor) > 0.9 * n_docs


def test_quantile_calibration_monotone_and_bounded(spark, sf_dir):
    """Within a source, calibration preserves order; gidx spans [1, N];
    extremes map to extremes (rs=1 -> gidx=1, rs=ns -> gidx=N)."""
    rows = ALL_QUERIES["score_quantile_calibration"](spark, sf_dir).collect()
    n = len(rows)
    by_src = {}
    for r in rows:
        assert 1 <= r["gidx"] <= n
        by_src.setdefault(r["source"], []).append(r)
    for src, rs in by_src.items():
        rs.sort(key=lambda r: r["src_rank"])
        assert rs[0]["gidx"] == 1
        assert rs[-1]["gidx"] == n
        for a, b in zip(rs, rs[1:]):
            assert a["calibrated_score"] <= b["calibrated_score"], (src, a, b)
            assert a["raw_score"] <= b["raw_score"]


def test_char_entropy_matches_python(spark, sf_dir):
    """Third engine: recompute H = sum c*round(ln(n/c)*1e6) from Python
    Counter over the same lowered text; bound check 0 <= H <= ln(k)."""
    import math
    from collections import Counter

    import duckdb

    rows = ALL_QUERIES["text_char_entropy"](spark, sf_dir).collect()
    texts = dict(
        duckdb.sql(
            f"SELECT doc_id, lower(text) FROM "
            f"read_parquet('{sf_dir}/documents.parquet') WHERE length(text) > 0"
        ).fetchall()
    )
    assert len(rows) == len(texts)
    for r in rows:
        cnt = Counter(texts[r["doc_id"]])
        n = sum(cnt.values())
        total = sum(c * round(math.log(n / c) * 1_000_000) for c in cnt.values())
        assert r["n_chars_ci"] == n
        assert r["n_distinct_chars"] == len(cnt)
        assert r["entropy_mu_total"] == total, r["doc_id"]
        assert 0 <= r["entropy_nats"] <= math.log(len(cnt)) + 1e-9


def test_bigram_logprob_matches_python(spark, sf_dir):
    """Third engine: full corpus bigram-LM recompute in Python
    (Laplace smoothing, µ-unit fixed point) must agree bit-exactly."""
    import math
    import re as _re
    from collections import Counter

    import duckdb

    rows = ALL_QUERIES["text_bigram_logprob"](spark, sf_dir).collect()
    texts = duckdb.sql(
        f"SELECT doc_id, trim(lower(text)) FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    doc_toks = {d: _re.split(r"\s+", t) for d, t in texts}
    c12: Counter = Counter()
    vocab = set()
    for toks in doc_toks.values():
        vocab.update(toks)
        c12.update(zip(toks, toks[1:]))
    c1: Counter = Counter()
    for (w1, _), c in c12.items():
        c1[w1] += c
    v = len(vocab)
    for r in rows:
        toks = doc_toks[r["doc_id"]]
        lps = [
            round(math.log((c12[(a, b)] + 1.0) / (c1[a] + v)) * 1_000_000)
            for a, b in zip(toks, toks[1:])
        ]
        assert r["n_bigrams"] == len(lps)
        assert r["logprob_mu_total"] == sum(lps), r["doc_id"]


def test_kcore_fixpoint_and_unroll_margin(spark, sf_dir):
    """Every surviving node keeps >= k neighbors inside the core (the
    defining property), and convergence rounds stay comfortably inside
    the oracle's unroll depth (ops.kcore raises past it, so this pins
    the MARGIN, not just non-failure)."""
    from blow_spark.queries.pipeline_ops import _KCORE_K, _KCORE_UNROLL

    df = ALL_QUERIES["graph_kcore_decomposition"](spark, sf_dir)
    rows = df.collect()
    info = df.kcore_info
    assert rows, "core emptied — sparsification rule broke"
    assert all(r["core_degree"] >= _KCORE_K for r in rows)
    assert info["rounds"] <= _KCORE_UNROLL - 2, info
    assert info["n_nodes_out"] == len(rows)
    assert len({r["co_threshold"] for r in rows}) == 1


def test_ewma_matches_python(spark, sf_dir):
    """Third engine: recompute the 16-lag dyadic EWMA in pure Python
    over each user's (ts, event_id)-ordered series; bit-exact."""
    import duckdb

    from blow_spark.queries.windows_streaming import _EWMA_K

    rows = ALL_QUERIES["timeseries_ewma_dyadic"](spark, sf_dir).collect()
    series = duckdb.sql(
        f"SELECT user_id, event_id, CAST(ROUND(value*100) AS BIGINT) "
        f"FROM read_parquet('{sf_dir}/events.parquet') ORDER BY user_id, ts, event_id"
    ).fetchall()
    per_user: dict = {}
    expect = {}
    for uid, eid, cents in series:
        hist = per_user.setdefault(uid, [])
        hist.append(cents)
        num = den = 0
        for i in range(min(_EWMA_K, len(hist))):
            w = 1 << (_EWMA_K - 1 - i)
            num += hist[-1 - i] * w
            den += w
        expect[eid] = (num, den)
    for r in rows:
        num, den = expect[r["event_id"]]
        assert (r["ewma_num"], r["ewma_den"]) == (num, den), r["event_id"]


def test_psi_nonnegative_and_nonvacuous(spark, sf_dir):
    """(p-q)ln(p/q) >= 0 termwise, so PSI >= 0 always — and the fixture
    sources genuinely differ from the global mix (some PSI > 0)."""
    rows = ALL_QUERIES["drift_psi_by_source"](spark, sf_dir).collect()
    assert rows
    assert all(r["psi"] >= 0 for r in rows)
    assert any(r["psi"] > 0 for r in rows)
    assert all(r["psi_den"] > 0 for r in rows)


def test_standardize_dims_exact_centering(spark, sf_dir):
    """Sum of diff_num per dimension is EXACTLY zero (integer algebra:
    sum(q*n - S) = n*S - n*S), and z has ~unit scale."""
    import math

    df = ALL_QUERIES["vector_standardize_dims"](spark, sf_dir)
    from pyspark.sql import functions as F

    agg = df.groupBy("dim").agg(
        F.sum("diff_num").alias("sd"),
        F.sum(F.col("z") * F.col("z")).alias("z2"),
        F.count("*").alias("n"),
    ).collect()
    assert agg
    for r in agg:
        assert r["sd"] == 0, r["dim"]
        # sum(z^2) = n * var/var = n exactly up to float error when var>0
        assert math.isclose(r["z2"], r["n"], rel_tol=1e-9)


def test_versioned_table_commit_race_and_isolation(spark, sf_dir):
    """Two threads committing concurrently get DISTINCT versions (the
    fail-if-exists manifest makes the race safe); a pre-planted
    conflicting manifest forces the optimistic retry path; and v1's
    content is byte-stable after later commits (snapshot isolation)."""
    from concurrent.futures import ThreadPoolExecutor

    from blow_spark import ops

    from blow_spark.materialize import scratch_dir

    path = scratch_dir(prefix="vtable_test_")
    df1 = spark.range(10).withColumnRenamed("id", "k")
    v1 = ops.versioned_commit(spark, df1, path)
    assert v1 == 1
    v1_rows = sorted(r["k"] for r in ops.versioned_read(spark, path, 1).collect())

    with ThreadPoolExecutor(2) as ex:
        futs = [
            ex.submit(
                ops.versioned_commit, spark, spark.range(n).withColumnRenamed("id", "k"), path
            )
            for n in (20, 30)
        ]
        got = sorted(f.result() for f in futs)
    assert got == [2, 3], got

    # plant a manifest at the next version: commit must retry past it
    import json, os
    with open(os.path.join(path, f"_v{4:012d}.manifest.json"), "w") as f:
        json.dump({"version": 4, "snapshot": "snap-planted-nonexistent"}, f)
    v5 = ops.versioned_commit(spark, df1, path)
    assert v5 == 5
    assert ops.versioned_latest(path) == 5

    # snapshot isolation: v1 unchanged through all later commits
    assert sorted(r["k"] for r in ops.versioned_read(spark, path, 1).collect()) == v1_rows
    assert len(ops.versioned_read(spark, path, 5).collect()) == 10


def test_attribution_models_conserve_basis_points(spark, sf_dir):
    """Every attribution model must distribute EXACTLY 10000 bp per
    attributed conversion — checked against an independent Python
    replay of the lookback-window semantics over the raw events."""
    import datetime as dt

    from blow_spark.sources import read_table

    rows = ALL_QUERIES["events_attribution_multitouch"](spark, sf_dir).collect()
    assert rows, "no attributed credit"
    ev = read_table(spark, sf_dir, "events").collect()
    convs = [r for r in ev if r.event_type == "purchase"]
    touches = sorted(
        (r for r in ev if r.event_type in ("view", "click")),
        key=lambda r: (r.ts, r.event_id),
    )
    look = dt.timedelta(days=7)
    n_attributed = 0
    py_linear: dict[tuple, int] = {}
    for c in convs:
        win = [
            t
            for t in touches
            if t.user_id == c.user_id and c.ts - look <= t.ts < c.ts
        ]
        if not win:
            continue
        n_attributed += 1
        n = len(win)
        last = max(win, key=lambda t: (t.ts, t.event_id))
        for t in win:
            import json

            key = (t.event_type, json.loads(t.props)["k"] % 4)
            py_linear[key] = (
                py_linear.get(key, 0)
                + 10000 // n
                + (10000 % n if t is last else 0)
            )
    total_bp = 10000 * n_attributed
    assert sum(r.credit_last_bp for r in rows) == total_bp
    assert sum(r.credit_first_bp for r in rows) == total_bp
    assert sum(r.credit_linear_bp for r in rows) == total_bp
    spark_linear = {(r.channel, r.campaign): r.credit_linear_bp for r in rows}
    assert spark_linear == py_linear


def test_cuped_reduces_to_identity_when_theta_applied_to_pooled_mean(
    spark, sf_dir
):
    """Weighted by arm size, the CUPED-adjusted means must average back
    to the pooled unadjusted mean (the adjustment is mean-preserving:
    Σ n_a·θ·(x̄_a − x̄) = 0), and each arm's adjustment must equal
    −θ·(x̄_arm − x̄_pooled) recomputed independently in Python."""
    rows = ALL_QUERIES["experiment_cuped_readout"](spark, sf_dir).collect()
    assert len(rows) == 2
    n_tot = sum(r.n_users for r in rows)
    pooled_raw = sum(r.mean_y * r.n_users for r in rows) / n_tot
    pooled_adj = sum(r.mean_y_cuped * r.n_users for r in rows) / n_tot
    assert abs(pooled_raw - pooled_adj) < 1e-5
    assert rows[0].theta == rows[1].theta


def test_versioned_vacuum_expires_old_snapshots_keeps_readable_tip(spark, tmp_path):
    """VACUUM must: drop versions below the retention cut (manifest AND
    snapshot dir), keep every retained version byte-readable, sweep
    crashed-commit orphans only past the grace period, and be
    idempotent."""
    import os

    from blow_spark import ops

    path = str(tmp_path / "vtab")
    for n in (3, 5, 7):
        ops.versioned_commit(spark, spark.range(n).withColumnRenamed("id", "k"), path)
    # a crashed commit: snapshot written, manifest never published
    orphan = os.path.join(path, "snap-deadbeef")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "part-0.parquet"), "wb") as f:
        f.write(b"junk")

    # grace period protects the maybe-in-flight orphan
    rep = ops.versioned_vacuum(path, keep_last=2, orphan_grace_sec=10_000)
    assert rep["removed_versions"] == [1]
    assert rep["kept_versions"] == [2, 3]
    assert rep["removed_orphans"] == []
    assert os.path.isdir(orphan)

    # zero grace sweeps it
    rep2 = ops.versioned_vacuum(path, keep_last=2, orphan_grace_sec=0)
    assert rep2["removed_versions"] == []
    assert rep2["removed_orphans"] == ["snap-deadbeef"]
    assert not os.path.isdir(orphan)

    # retained versions still read exactly; expired version is gone
    assert len(ops.versioned_read(spark, path, 2).collect()) == 5
    assert len(ops.versioned_read(spark, path, 3).collect()) == 7
    try:
        ops.versioned_read(spark, path, 1)
        raise AssertionError("expired version still readable")
    except FileNotFoundError:
        pass
    # idempotent
    rep3 = ops.versioned_vacuum(path, keep_last=2, orphan_grace_sec=0)
    assert rep3 == {"removed_versions": [], "removed_orphans": [], "kept_versions": [2, 3]}
    # vacuumed table still accepts new commits
    v4 = ops.versioned_commit(spark, spark.range(2).withColumnRenamed("id", "k"), path)
    assert v4 == 4 and len(ops.versioned_read(spark, path).collect()) == 2

    # keep_last=0 would delete every manifest and reset the version
    # counter — the monotonic-version contract forbids it (round-6 advice)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="keep_last"):
        ops.versioned_vacuum(path, keep_last=0)

    # a commit that crashed between the _tmp manifest write and the
    # os.link: the stale temp file is swept once past the grace window
    stale_tmp = os.path.join(path, "_tmp-feedface-99")
    with open(stale_tmp, "w") as f:
        f.write("{}")
    repg = ops.versioned_vacuum(path, keep_last=2, orphan_grace_sec=10_000)
    assert os.path.isfile(stale_tmp)  # grace protects a maybe-live commit
    rep4 = ops.versioned_vacuum(path, keep_last=2, orphan_grace_sec=0)
    assert "_tmp-feedface-99" in rep4["removed_orphans"]
    assert not os.path.exists(stale_tmp)
    assert repg["kept_versions"] == [3, 4]


def test_bootstrap_ci_brackets_point_and_is_deterministic(spark, sf_dir):
    """The 95% Poisson-bootstrap interval must bracket the full-sample
    point estimate (200 replicas, resampling noise ≫ |point| on this
    fixture), be properly ordered, and reproduce bit-identically on a
    second run (hash-derived weights, no RNG state)."""
    q = ALL_QUERIES["experiment_bootstrap_uplift_ci"]
    r1 = q(spark, sf_dir).collect()[0]
    assert r1.n_replicas == 200
    assert r1.ci_lo_mu < r1.ci_hi_mu
    assert r1.ci_lo_mu <= r1.uplift_point_mu <= r1.ci_hi_mu
    r2 = q(spark, sf_dir).collect()[0]
    assert r1 == r2
