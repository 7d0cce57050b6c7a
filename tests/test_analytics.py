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
