"""Retrieval-stack semantics: RRF fusion and MMR rerank invariants.

The oracle gate (test_queries_oracle) already pins exact engine
equality; these tests pin the retrieval PROPERTIES that make the
operators meaningful, so a future refactor can't stay hash-green by
accident while breaking the contract (e.g. by changing both sides
symmetrically).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from blow_spark import similarity
from blow_spark.queries import queries
from blow_spark.queries import retrieval as R
from blow_spark.sources import read_table

ALL = queries()


@pytest.fixture(scope="module")
def rrf_rows(spark, sf_dir):
    return ALL["search_rrf_hybrid_fusion"](spark, sf_dir).collect()


@pytest.fixture(scope="module")
def mmr_rows(spark, sf_dir):
    return ALL["search_mmr_rerank"](spark, sf_dir).collect()


def test_rrf_shape_and_scores(rrf_rows):
    by_q = {}
    for r in rrf_rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == set(range(R._N_QUERIES))
    for q, rows in by_q.items():
        assert len(rows) == R._FUSED_TOPK
        rows = sorted(rows, key=lambda r: r.fused_rank)
        assert [r.fused_rank for r in rows] == list(range(1, R._FUSED_TOPK + 1))
        # fused order is (rrf_score desc, doc_id asc) — totally ordered
        keys = [(-r.rrf_score, r.doc_id) for r in rows]
        assert keys == sorted(keys)
        # a doc can appear in at most both lists
        assert all(1 <= r.n_lists <= 2 for r in rows)
        # max possible contribution: two rank-1 hits
        cap = 2 * (R._RRF_NUM // (R._RRF_K + 1))
        assert all(0 < r.rrf_score <= cap for r in rows)
        # no query retrieves itself
        assert all(r.doc_id != q for r in rows)


def test_rrf_both_rankers_contribute(rrf_rows):
    """Fusion is only 'hybrid' if some fused hit was found by BOTH
    rankers somewhere in the fixture — n_lists == 2 must occur."""
    assert any(r.n_lists == 2 for r in rrf_rows)


def test_mmr_shape_and_trajectory(spark, sf_dir, mmr_rows):
    by_q = {}
    for r in mmr_rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == set(range(R._N_QUERIES))
    e = read_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < R._N_QUERIES)
    cand = {
        (r.query_id, r.neighbor_id): r
        for r in similarity.brute_force_topk(q, e, k=R._MMR_CANDS).collect()
    }
    top1 = {
        r.query_id: r.neighbor_id
        for r in similarity.brute_force_topk(q, e, k=1).collect()
    }
    for qid, rows in by_q.items():
        rows = sorted(rows, key=lambda r: r.step)
        assert [r.step for r in rows] == list(range(1, R._MMR_SELECT + 1))
        picked = [r.doc_id for r in rows]
        # selections are distinct and drawn from the exact-cosine top-25
        assert len(set(picked)) == R._MMR_SELECT
        assert all((qid, d) in cand for d in picked)
        # step 1 is pure relevance: the exact-cosine top-1
        assert picked[0] == top1[qid]
        # λ=0.7 integer scores: step s ≥ 2 is 7·rel_µ − 3·maxsim_µ with
        # maxsim_µ ∈ [−10⁶, 10⁶] (cosine range) — bound both sides
        # (±1 µ-unit slack for the half-up vs banker's rounding split)
        for r in rows[1:]:
            rel_mu = int(round(cand[(qid, r.doc_id)].cos_sim * 1_000_000))
            assert 7 * (rel_mu - 1) - 3_000_000 <= r.score_mu <= 7 * (rel_mu + 1) + 3_000_000


def test_mmr_diversifies_vs_pure_relevance(spark, sf_dir, mmr_rows):
    """On at least one fixture query, MMR's selection set must differ
    from the pure-relevance top-5 — otherwise the penalty term is dead
    code at gate scale and the operator proves nothing."""
    e = read_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < R._N_QUERIES)
    top5 = {}
    for r in similarity.brute_force_topk(q, e, k=R._MMR_SELECT).collect():
        top5.setdefault(r.query_id, set()).add(r.neighbor_id)
    mmr_sets = {}
    for r in mmr_rows:
        mmr_sets.setdefault(r.query_id, set()).add(r.doc_id)
    assert any(mmr_sets[qid] != top5[qid] for qid in mmr_sets)
