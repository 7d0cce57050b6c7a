#!/usr/bin/env python
"""One-command full-catalog oracle sweep — the proven bug-finder, committed.

Reproduces the driver's t2 correctness gate over the ENTIRE registered
catalog at any scale factor, under the DRIVER's session shape (vanilla
SparkSession, no custom configs) — the combination that caught the
round-4 KLL partition-layout fragility (SURVEY.md §7.7): the committed
pytest gate runs at sf0.001 with shuffle_partitions=8, so
layout-dependent exactness regions can pass there and still fail the
real driver at sf0.01. Run this before committing any new
exactness-region query, and after any fixture change:

    python scripts/sweep.py --sf 0.01

Options:
    --sf 0.01                  scale factor (dir /root/testdata/sf<sf>)
    --sf-dir PATH              explicit fixture dir (overrides --sf)
    --only a,b,c               restrict to named queries
    --order least-recently-driver-sampled
                               order the sweep by driver-sample recency
                               (never-sampled first, then oldest round):
                               the queries the driver is most likely to
                               hit on first exposure next round. With
                               --limit N this is the pre-snapshot gate
                               (verify skill checklist item 2).
    --limit N                  run only the first N (after ordering)
    --shuffle-partitions N     ALSO pin shuffle partitions (pytest's
                               shape is 8) — exactness-region claims
                               must hold under BOTH shapes, so run the
                               sweep twice when validating one
    --master local[N]          default local[8] (the driver's shape)

Exit code 0 iff every oracle-paired query matches strictly (exact value
compare via blow_spark.oracle.compare — at least as strict as the
driver's hash) and every rows-only query runs to completion. Prints a
one-line JSON summary last, per the repo's harness convention.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf", default="0.01")
    ap.add_argument("--sf-dir", default=None)
    ap.add_argument("--only", default=None)
    ap.add_argument("--order", default=None, choices=["least-recently-driver-sampled"])
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    ap.add_argument("--master", default="local[8]")
    args = ap.parse_args()

    sf_dir = args.sf_dir or f"/root/testdata/sf{args.sf}"
    if not os.path.isdir(sf_dir):
        print(f"fixture dir {sf_dir} does not exist", file=sys.stderr)
        return 2

    from pyspark.sql import SparkSession

    # vanilla session = the driver's shape; NO blow_spark.get_spark configs
    b = SparkSession.builder.master(args.master).appName("blow_spark_sweep")
    if args.shuffle_partitions is not None:
        b = b.config("spark.sql.shuffle.partitions", str(args.shuffle_partitions))
    spark = b.getOrCreate()

    from blow_spark.oracle import compare, duckdb_run
    from blow_spark.queries import oracle_sql, queries

    qs, oracles = queries(), oracle_sql()
    names = sorted(qs)
    if args.only:
        picked = [n.strip() for n in args.only.split(",") if n.strip()]
        unknown = [n for n in picked if n not in qs]
        if unknown:
            print(f"unknown queries: {unknown}", file=sys.stderr)
            return 2
        names = picked

    if args.order == "least-recently-driver-sampled":
        # Most-recent driver round that sampled each query, scraped from
        # the committed CORRECTNESS_r*.json files. Never-sampled queries
        # sort first (round 0), then ascending by last-sampled round —
        # i.e. the queries the driver's observed no-repeat pattern makes
        # likeliest to hit on FIRST EXPOSURE next round. Name tiebreak
        # keeps the order deterministic.
        import glob
        import re

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        last_round: dict[str, int] = {}
        for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
            m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
            if not m:
                continue
            rnd = int(m.group(1))
            try:
                with open(path) as fh:
                    sampled = json.load(fh)
            except (OSError, json.JSONDecodeError):
                continue
            for q in sampled:
                last_round[q] = max(last_round.get(q, 0), rnd)
        names = sorted(names, key=lambda n: (last_round.get(n, 0), n))
        n_never = sum(1 for n in names if n not in last_round)
        print(
            f"order=least-recently-driver-sampled: {n_never} never-sampled, "
            f"{len(names) - n_never} sampled across {len(set(last_round.values()))} rounds",
            flush=True,
        )

    if args.limit is not None:
        names = names[: args.limit]

    t0 = time.time()
    n_pass = n_fail = n_rows_only = 0
    failures: dict[str, str] = {}
    for i, name in enumerate(names, 1):
        try:
            sdf = qs[name](spark, sf_dir)
            if name in oracles:
                res = compare(name, sdf, duckdb_run(oracles[name], sf_dir))
                if res.ok:
                    n_pass += 1
                    status = "ok"
                else:
                    n_fail += 1
                    failures[name] = res.detail
                    status = f"FAIL {res.detail[:160]}"
            else:
                assert sdf.count() >= 0 and len(sdf.schema.fields) > 0
                n_rows_only += 1
                status = "rows-only ok"
        except Exception as exc:  # a query that errors is a failure, not a skip
            n_fail += 1
            failures[name] = f"{type(exc).__name__}: {exc}"
            status = f"ERROR {type(exc).__name__}: {str(exc)[:160]}"
            if os.environ.get("SWEEP_VERBOSE"):
                traceback.print_exc()
        print(f"[{i}/{len(names)}] {name}: {status}", flush=True)

    elapsed = round(time.time() - t0, 1)
    print(
        json.dumps(
            {
                "metric": "oracle_sweep",
                "sf_dir": sf_dir,
                "shuffle_partitions": args.shuffle_partitions,
                "queries": len(names),
                "oracle_pass": n_pass,
                "rows_only_pass": n_rows_only,
                "fail": n_fail,
                "failures": failures,
                "sec": elapsed,
            }
        ),
        flush=True,
    )
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
