#!/usr/bin/env python
"""Profile one or more catalog queries in isolation (optimization round).

For each named query: run through the noop sink N times (same methodology
as bench.py), print per-run wall seconds, and optionally dump
``explain('formatted')`` to a file for the plans/ record.

Usage:
    python scripts/profile_query.py [--n 3] [--explain-dir plans/r14] \
        [--suffix before] name [name ...]

Environment: SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as in bench.py.
"""

from __future__ import annotations

import argparse
import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--suffix", default="before")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from blow_spark import get_spark
    from blow_spark.queries import queries

    spark = get_spark(app_name="blow_spark_profile")
    catalog = queries()
    # warm codegen/session exactly like bench.py
    catalog["flagship_fizzbuzz_agg"](spark, sf_dir).write.mode(
        "overwrite"
    ).format("noop").save()

    for name in args.names:
        spark.sparkContext.setJobDescription(f"profile:{name}")
        runs = []
        for _ in range(args.n):
            t0 = time.perf_counter()
            catalog[name](spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            runs.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
            # Release py4j proxies so the ContextCleaner can reclaim
            # prior runs' localCheckpoint RDDs / broadcasts — without
            # this, session garbage accumulates and later runs measure
            # interference, not the plan (observed: pagerank 7->17 s
            # over 4 runs without collect, flat ~5.5-6 s with it).
            gc.collect()
        print(f"{name}: min={min(runs)} runs={runs}", flush=True)
        if args.explain_dir:
            os.makedirs(args.explain_dir, exist_ok=True)
            df = catalog[name](spark, sf_dir)
            path = os.path.join(
                args.explain_dir, f"{name}_{args.suffix}.txt"
            )
            with open(path, "w") as fh:
                fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                ))
    spark.sparkContext.setJobDescription(None)
    spark.stop()


if __name__ == "__main__":
    main()
