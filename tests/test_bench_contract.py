"""Driver-contract guard for bench.py's stdout (round-6 verdict item #2).

The external driver captures only the LAST ~2000 characters of bench.py's
stdout and json-parses the final line; BENCH_r05/r06 recorded
``parsed: null`` because the single output line grew past that window.
These tests pin the fix: the summary line stays parseable and bounded at
ANY catalog size, including a simulated tail-2000 capture."""

from __future__ import annotations

import json
import subprocess
import sys

import bench


def _fake_timings(n: int) -> dict[str, float]:
    return {f"some_rather_long_query_name_{i:04d}": round(0.123 + i * 0.017, 3) for i in range(n)}


def test_summary_line_bounded_and_parseable_at_any_size():
    for n in (1, 10, 84, 200, 500, 2000):
        line = bench.summary_line(_fake_timings(n), 0.1)
        assert len(line) < 1800, f"n={n}: line {len(line)} chars"
        parsed = json.loads(line)
        assert parsed["metric"] == "headline_suite_wall_clock"
        assert parsed["unit"] == "sec"
        assert parsed["n_queries"] == n
        assert abs(parsed["value"] - round(sum(_fake_timings(n).values()), 3)) < 1e-9
        # contract shape keeps a queries dict (slowest-first subset)
        assert isinstance(parsed["queries"], dict)
        if parsed["queries"]:
            slowest = max(_fake_timings(n).values())
            assert slowest in parsed["queries"].values()


def test_tail_2000_capture_of_simulated_run_parses():
    """Exactly what the driver does: take the last 2000 chars of stdout,
    split lines, json.loads the final one. Simulate a noisy full run
    (warn spam + the summary) without starting Spark."""
    prog = (
        "import bench, sys\n"
        "sys.stdout.write('WARN noise line\\n' * 50)\n"
        "t = {f'q{i:03d}': 1.5 + i for i in range(300)}\n"
        "print(bench.summary_line(t, 0.1))\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", prog], capture_output=True, text=True, cwd="/root/repo"
    )
    assert out.returncode == 0, out.stderr
    tail = out.stdout[-2000:]
    last = [l for l in tail.splitlines() if l.strip()][-1]
    parsed = json.loads(last)
    assert parsed["n_queries"] == 300
    assert parsed["unit"] == "sec"


def test_headline_queries_all_registered():
    from blow_spark.queries import queries

    catalog = queries()
    missing = [q for q in bench.HEADLINE if q not in catalog]
    assert not missing, f"bench HEADLINE references unregistered queries: {missing}"


def test_core_tier_policy():
    """Round-9 tier policy: CORE is a subset of HEADLINE, stays near 40
    entries, and the summary line's visible per-query rows draw ONLY
    from CORE — so the driver-visible tail is stable round over round
    while EXTENDED still counts toward the total."""
    assert set(bench.CORE) <= set(bench.HEADLINE)
    # 51 after round-13 verdict item #7 added the typed-state streaming
    # runtime row; CORE only grows on explicit verdict/family decisions
    assert len(bench.CORE) <= 52
    t = {q: 1.0 + i * 0.01 for i, q in enumerate(bench.HEADLINE)}
    parsed = json.loads(bench.summary_line(t, 0.1, core=bench.CORE))
    assert parsed["n_queries"] == len(bench.HEADLINE)
    assert parsed["queries"]  # something is visible
    assert all(k in set(bench.CORE) for k in parsed["queries"])
    # total still covers the whole suite, not just the visible tier
    assert abs(parsed["value"] - round(sum(t.values()), 3)) < 1e-9


def test_per_round_detail_sidecar_naming(tmp_path):
    """Round-10 verdict item #3: bench writes BOTH the stable
    BENCH_DETAIL.json and a per-round BENCH_DETAIL_r{N}.json so
    round-over-round per-query deltas are computable. The round is
    inferred as (newest driver BENCH_r{N}.json on disk) + 1."""
    d = str(tmp_path)
    assert bench.current_round(d) == 1
    (tmp_path / "BENCH_r07.json").write_text("{}")
    (tmp_path / "BENCH_r10.json").write_text("{}")
    (tmp_path / "BENCH_r2.json").write_text("{}")  # driver pads; tolerate not
    assert bench.current_round(d) == 11
    paths = bench.detail_sidecar_paths(d)
    assert paths[0].endswith("/BENCH_DETAIL.json")
    assert paths[1].endswith("/BENCH_DETAIL_r11.json")


def test_sample_query_outlier_tiebreak():
    """Round-11 verdict item #3: two samples disagreeing >3x get a
    third run, min-of-3 wins, and every raw sample is preserved."""
    # quiet pair: exactly two samples, no tiebreak
    seq = iter([1.0, 1.1])
    best, samples = bench.sample_query(lambda: next(seq))
    assert samples == [1.0, 1.1] and best == 1.0
    # interference pair: third sample drawn, min-of-3 reported
    seq = iter([13.6, 1.0, 0.9])
    best, samples = bench.sample_query(lambda: next(seq))
    assert samples == [13.6, 1.0, 0.9] and best == 0.9
    # boundary: exactly 3x is NOT an outlier (strict >)
    seq = iter([3.0, 1.0])
    best, samples = bench.sample_query(lambda: next(seq))
    assert samples == [3.0, 1.0] and best == 1.0


def test_detail_sidecar_schema_includes_samples():
    """The committed per-round sidecar written by the NEW harness must
    carry the raw samples map: every timed query appears, its reported
    timing is the min of its samples, and a >3x pair has a third."""
    import os

    r = bench.current_round("/root/repo")
    per_round = f"/root/repo/BENCH_DETAIL_r{r:02d}.json"
    if not os.path.exists(per_round):
        return  # this round's bench has not been run yet
    d = json.load(open(per_round))
    if "samples" not in d:
        return  # sidecar predates the outlier-proof harness
    assert set(d["samples"]) == set(d["queries"])
    for name, ss in d["samples"].items():
        assert 2 <= len(ss) <= bench.MAX_SAMPLES
        assert abs(min(ss) - d["queries"][name]) < 2e-3
        if len(ss) == 2 and min(ss) > 0:
            assert max(ss) <= d["outlier_ratio"] * min(ss) + 1e-9


def test_sample_query_cross_round_tiebreak():
    """Round-12 verdict item #2: when min-of-N exceeds 2x the prior
    round's committed value for the same pinned plan, keep sampling up
    to MAX_SAMPLES; sub-second readings never trigger it."""
    # common-mode interference spans both base samples (intra-pair
    # ratio < 3x so the old tiebreak is blind) -> extra samples drawn
    seq = iter([5.0, 5.5, 4.8, 1.9])
    best, samples = bench.sample_query(lambda: next(seq), prior_best=2.0)
    assert samples == [5.0, 5.5, 4.8, 1.9] and best == 1.9
    # stops as soon as min-of-N drops under the bar (3 samples, not 4)
    seq = iter([5.0, 5.5, 3.9])
    best, samples = bench.sample_query(lambda: next(seq), prior_best=2.0)
    assert samples == [5.0, 5.5, 3.9] and best == 3.9
    # no prior -> no cross-round sampling
    seq = iter([5.0, 5.5])
    best, samples = bench.sample_query(lambda: next(seq), prior_best=None)
    assert samples == [5.0, 5.5]
    # within 2x of prior -> quiet
    seq = iter([3.5, 3.6])
    best, samples = bench.sample_query(lambda: next(seq), prior_best=2.0)
    assert samples == [3.5, 3.6]
    # sub-second floor: 0.4s vs a 0.1s prior is jitter, not interference
    seq = iter([0.4, 0.45])
    best, samples = bench.sample_query(lambda: next(seq), prior_best=0.1)
    assert samples == [0.4, 0.45]


def test_sample_query_first_appearance_third_sample():
    """Round-13 verdict item #1: a query with no baseline anywhere
    (first appearance) gets a MANDATORY third sample — both r13 base
    samples inflated together and the intra-pair >3x test stayed
    silent, so min-of-2 recorded interference as plan cost."""
    # quiet pair but first appearance -> third sample drawn anyway
    seq = iter([6.0, 6.1, 2.0])
    best, samples = bench.sample_query(
        lambda: next(seq), prior_best=None, first_appearance=True
    )
    assert samples == [6.0, 6.1, 2.0] and best == 2.0
    # sub-second first appearance: scheduler jitter, no extra run
    seq = iter([0.4, 0.45])
    best, samples = bench.sample_query(
        lambda: next(seq), prior_best=None, first_appearance=True
    )
    assert samples == [0.4, 0.45]
    # intra-pair outlier already drew a third -> no fourth
    seq = iter([13.6, 1.1, 1.0])
    best, samples = bench.sample_query(
        lambda: next(seq), prior_best=None, first_appearance=True
    )
    assert samples == [13.6, 1.1, 1.0]
    # a prior exists -> the cross-round loop governs, not this path
    seq = iter([5.0, 5.5, 4.8, 1.9])
    best, samples = bench.sample_query(
        lambda: next(seq), prior_best=2.0, first_appearance=False
    )
    assert samples == [5.0, 5.5, 4.8, 1.9] and best == 1.9


def test_load_committed_detail_reads_git_head(tmp_path):
    """The same-round fallback baseline comes from git HEAD, never the
    working tree (the driver's own run overwrites the latter)."""
    import subprocess

    d = str(tmp_path)
    # no git repo -> {}
    assert bench.load_committed_detail(d) == {}
    subprocess.run(["git", "init", "-q", d], check=True)
    name = f"BENCH_DETAIL_r{bench.current_round(d):02d}.json"
    (tmp_path / name).write_text(json.dumps({"sf": 0.1, "queries": {"q": 1.5}}))
    # file exists in the working tree but NOT at HEAD -> still {}
    assert bench.load_committed_detail(d) == {}
    subprocess.run(
        ["git", "-C", d, "-c", "user.email=t@t", "-c", "user.name=t",
         "commit", "-q", "-m", "x", "--allow-empty"],
        check=True,
    )
    subprocess.run(["git", "-C", d, "add", name], check=True)
    subprocess.run(
        ["git", "-C", d, "-c", "user.email=t@t", "-c", "user.name=t",
         "commit", "-q", "-m", "detail"],
        check=True,
    )
    got = bench.load_committed_detail(d)
    assert got == {"sf": 0.1, "queries": {"q": 1.5}}
    # the committed copy wins over a diverged working tree
    (tmp_path / name).write_text(json.dumps({"sf": 0.1, "queries": {"q": 99.0}}))
    assert bench.load_committed_detail(d)["queries"]["q"] == 1.5


def test_audit_tier_subtotal():
    """Round-13 verdict item #5: AUDIT certification queries are
    subtotaled separately and excluded from the headline value; the
    production twins stay in CORE/EXTENDED."""
    assert set(bench.AUDIT) <= set(bench.HEADLINE)
    assert "similarity_lsh_topk_plan" not in bench.AUDIT  # production twin
    assert "dedup_minhash_lsh" not in bench.AUDIT
    t = {q: 1.0 for q in bench.HEADLINE}
    for q in bench.AUDIT:
        t[q] = 10.0
    parsed = json.loads(bench.summary_line(t, 0.1, core=bench.CORE, audit=bench.AUDIT))
    assert parsed["n_audit"] == len(bench.AUDIT)
    assert abs(parsed["audit_sec"] - 10.0 * len(bench.AUDIT)) < 1e-9
    assert abs(parsed["value"] - (len(bench.HEADLINE) - len(bench.AUDIT))) < 1e-9
    # without the audit kwarg the line keeps the old all-inclusive shape
    parsed2 = json.loads(bench.summary_line(t, 0.1, core=bench.CORE))
    assert "audit_sec" not in parsed2
    assert abs(parsed2["value"] - round(sum(t.values()), 3)) < 1e-9


def test_streaming_typed_state_in_core():
    """Round-13 verdict item #7: the typed-state streaming operator
    runs through the real availableNow runtime every bench round."""
    assert "streaming_typed_state_totals" in bench.CORE
    assert "streaming_typed_state_totals" in bench.HEADLINE


def test_current_pins_parses_live_plan_guard():
    """current_pins must read the live BENCH_EXCHANGE_PINS literal:
    every HEADLINE query except the runtime-tagged streaming rows has a
    2-list pin."""
    pins = bench.current_pins("/root/repo")
    assert len(pins) >= 180
    assert pins["flagship_fizzbuzz_agg"] == [1, 0]
    for v in pins.values():
        assert isinstance(v, list) and len(v) == 2


def test_parse_args_help_and_rejects_unknown():
    """Round-12 verdict item #2 (argparse guard): --help exits cleanly
    BEFORE any Spark work; unknown args are an error, not a silent
    multi-minute bench run."""
    import pytest

    with pytest.raises(SystemExit) as e:
        bench.parse_args(["--help"])
    assert e.value.code == 0
    with pytest.raises(SystemExit) as e:
        bench.parse_args(["--bogus"])
    assert e.value.code == 2
    bench.parse_args([])  # the real invocation shape is accepted


def test_repo_current_round_matches_live_artifacts():
    """In the real repo the sidecar must name THIS round (>= 11 as of
    round 11) and the per-round file, once written, must agree with the
    stable one for its round."""
    import os

    r = bench.current_round("/root/repo")
    assert r >= 11
    per_round = f"/root/repo/BENCH_DETAIL_r{r:02d}.json"
    if os.path.exists(per_round) and os.path.exists("/root/repo/BENCH_DETAIL.json"):
        a = json.load(open(per_round))
        b = json.load(open("/root/repo/BENCH_DETAIL.json"))
        if b.get("round") == r:
            assert a == b
