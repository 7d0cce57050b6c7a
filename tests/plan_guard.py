"""Shared detector for the catalog-wide global-window guard.

A ``Window`` (or ``WindowGroupLimit``) whose input arrives through an
``Exchange SinglePartition`` serializes its entire input through ONE
task — the canonical 100 TB scale-killer. The guard walks every
registered batch query's physical plan text and flags each such
occurrence; tests/test_plan_guard.py asserts the set of flagged queries
exactly equals the documented whitelist of pinned-small branches (e.g.
the one-row-per-partition offsets windows of ops.global_row_number).
"""

from __future__ import annotations

import re

_DEPTH_RE = re.compile(r"^[ :+|-]*")


def _depth(line: str) -> int:
    return len(_DEPTH_RE.match(line).group(0))


def _node_name(line: str) -> str:
    body = line[_depth(line):]
    body = re.sub(r"^\*\(\d+\)\s*", "", body)  # WholeStageCodegen marker
    return body


def single_partition_windows(plan: str) -> list[str]:
    """Return one entry per `Exchange SinglePartition` that feeds a
    Window/WindowGroupLimit ancestor, described as 'WindowNode <- depth'."""
    lines = [l for l in plan.splitlines() if l.strip()]
    hits: list[str] = []
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" not in line:
            continue
        d = _depth(line)
        # walk up the ancestor chain (nearest line above with smaller
        # depth, repeatedly), passing through Sort only: the offending
        # shape is exactly `Window <- [Sort <-] Exchange SinglePartition`
        # (an empty-PARTITION-BY window's required distribution). Any
        # other intervening node (BroadcastExchange, HashAggregate,
        # another shuffle...) means the single-partition exchange serves
        # something else — e.g. a 1-row global aggregate under a
        # broadcast join — not the window's input.
        cur = d
        for j in range(i - 1, -1, -1):
            dj = _depth(lines[j])
            if dj < cur:
                cur = dj
                name = _node_name(lines[j])
                if name.startswith(("Window", "WindowGroupLimit")):
                    hits.append(name.split("[")[0].strip())
                    break
                if not name.startswith("Sort"):
                    break
    return hits


def physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def exchange_counts(plan: str) -> tuple[int, int]:
    """(n_shuffle_exchanges, n_broadcast_exchanges) in a physical plan.

    Node-name based (not substring): `ReusedExchange` / `ReusedBroadcast`
    nodes are NOT counted — a reuse is free at runtime, and counting it
    would make the pin depend on Catalyst's reuse bookkeeping rather
    than on how many shuffles/broadcasts actually materialize. Used by
    tests/test_plan_guard.py to pin the shuffle budget of every
    headline-bench query: a lost broadcast shows up as (+1 shuffle,
    -1 broadcast), a doubled shuffle as +1 shuffle — structural
    regression detection instead of bench-noise archaeology."""
    n_shuffle = n_broadcast = 0
    for line in plan.splitlines():
        if not line.strip():
            continue
        name = _node_name(line)
        if name.startswith("Exchange "):
            n_shuffle += 1
        elif name.startswith("BroadcastExchange"):
            n_broadcast += 1
    return n_shuffle, n_broadcast
