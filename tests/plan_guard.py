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
