"""CLI front door (python -m blow_spark)."""

from __future__ import annotations

import pytest

from blow_spark.__main__ import list_queries, main


def test_list_contains_flagship_and_marks_oracles():
    lines = list_queries()
    assert len(lines) > 200
    flag = [ln for ln in lines if ln.startswith("flagship_fizzbuzz_agg ")]
    assert flag and "[oracle]" in flag[0]
    rows_only = [ln for ln in lines if "[rows-only]" in ln]
    assert rows_only  # sketch/stub queries are marked


def test_list_tag_filter():
    lines = list_queries("similarity")
    assert lines and all("similarity" in ln for ln in lines)
    assert not list_queries("no-such-tag")


def test_unknown_query_exit_code(capsys):
    assert main(["run", "nope_not_a_query"]) == 2
    assert "unknown query" in capsys.readouterr().err


def test_run_executes(spark, sf_dir, capsys):
    # reuses the session fixture via getOrCreate inside main()
    rc = main(["run", "flagship_fizzbuzz_agg", "--sf-dir", sf_dir, "--limit", "5"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "rows_shown" in out


def test_explain_prints_plan(spark, sf_dir, capsys):
    rc = main(["explain", "scan_filter_project", "--sf-dir", sf_dir])
    assert rc == 0
    assert "Physical Plan" in capsys.readouterr().out
