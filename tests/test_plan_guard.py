"""Catalog-wide global-window guard (round-3 verdict item #8).

Every registered batch query's physical plan is scanned for the
100 TB scale-killer shape `Window <- [Sort <-] Exchange SinglePartition`
(an empty-PARTITION-BY window serializing its whole input through one
task). The flagged set must EXACTLY equal the documented whitelist —
new global windows fail this test, and so does an unexplained
disappearance of a whitelisted one (keeps the whitelist honest).

Runtime-tagged (streaming) queries are excluded: calling them executes
a full stream; their plans are window-free micro-batch pipelines pinned
by their own tests.
"""

from __future__ import annotations

from plan_guard import physical_plan, single_partition_windows

from blow_spark.queries import REGISTRY, queries

# Pinned-small branches: each is the per-PARTITION offsets table of the
# two-phase exact global rank (ops.global_row_number and its inline twin
# in sort_equidepth_global_rank / curriculum_length_buckets). That table
# has ONE ROW PER RANGE PARTITION (~32 at any data size — it scales with
# cluster width, not data), so its running-sum window is a constant-size
# single task by construction.
WHITELIST = {
    "corpus_encode_tokens": 1,       # vocab id offsets (via global_row_number)
    "curriculum_length_buckets": 1,  # quartile rank offsets
    "sort_equidepth_global_rank": 1, # equi-depth histogram rank offsets
    "tokenizer_vocab_build": 1,      # vocab id offsets
}


def test_no_unwhitelisted_single_partition_windows(spark):
    qs = queries()
    names = [n for n, q in REGISTRY.items() if "runtime" not in q.tags]
    sf = "/root/testdata/sf0.001"
    flagged: dict[str, int] = {}
    for n in sorted(names):
        df = qs[n](spark, sf)
        hits = single_partition_windows(physical_plan(df))
        if hits:
            flagged[n] = len(hits)
    assert flagged == WHITELIST, (
        f"single-partition window set drifted.\n"
        f"  new offenders: { {k: v for k, v in flagged.items() if k not in WHITELIST} }\n"
        f"  missing whitelisted: { {k: v for k, v in WHITELIST.items() if k not in flagged} }\n"
        f"  count changes: { {k: (WHITELIST[k], flagged[k]) for k in WHITELIST if k in flagged and flagged[k] != WHITELIST[k]} }"
    )
