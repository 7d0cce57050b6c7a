"""Aho-Corasick multi-pattern matcher (Aho & Corasick, CACM 1975) —
the one-pass blocklist scanner a 100 TB text pipeline needs: match ALL
of a pattern set against every document in a single left-to-right scan
(O(len(doc) + matches)), instead of one regex/contains pass per
pattern. The automaton is built once on the driver (pattern sets are
KB-scale) and ships to executors inside the mapInPandas closure — the
broadcast-small-side discipline.

Pure-Python tables (dict goto / list fail / merged output lists) —
per-character work is a dict probe, and batches amortize the Python
overhead per Arrow batch, not per row.

Reference parity note: the reference engine (wizgrao/blow,
maps/maps.go:12-14) has no string-matching surface; extension operator
from the brief's text-analysis mandate.
"""

from __future__ import annotations

from collections import deque


def build_automaton(
    patterns: tuple[str, ...],
) -> tuple[list[dict[str, int]], list[int], list[tuple[int, ...]]]:
    """Build (goto, fail, out): trie transitions, failure links, and
    per-node MERGED pattern-id output lists (each node's outputs
    include its suffix-link chain's outputs, so the scan never walks
    fail links to report matches)."""
    goto: list[dict[str, int]] = [{}]
    fail: list[int] = [0]
    out: list[list[int]] = [[]]
    for pid, pat in enumerate(patterns):
        node = 0
        for ch in pat:
            nxt = goto[node].get(ch)
            if nxt is None:
                goto.append({})
                fail.append(0)
                out.append([])
                nxt = len(goto) - 1
                goto[node][ch] = nxt
            node = nxt
        out[node].append(pid)
    queue: deque[int] = deque()
    for child in goto[0].values():
        fail[child] = 0
        queue.append(child)
    while queue:
        u = queue.popleft()
        for ch, v in goto[u].items():
            queue.append(v)
            f = fail[u]
            while f and ch not in goto[f]:
                f = fail[f]
            cand = goto[f].get(ch, 0)
            fail[v] = cand if cand != v else 0
            out[v] = out[v] + out[fail[v]]
    return goto, fail, [tuple(o) for o in out]


def count_matches(
    text: str,
    goto: list[dict[str, int]],
    fail: list[int],
    out: list[tuple[int, ...]],
    n_patterns: int,
) -> list[int]:
    """One-pass scan: per-pattern occurrence counts (ALL occurrences,
    including patterns nested inside longer matches — the merged
    output lists report every pattern ending at each position)."""
    counts = [0] * n_patterns
    node = 0
    for ch in text:
        while node and ch not in goto[node]:
            node = fail[node]
        node = goto[node].get(ch, 0)
        for pid in out[node]:
            counts[pid] += 1
    return counts
