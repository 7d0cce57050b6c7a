#!/usr/bin/env python
"""Dump explain('formatted') for named catalog queries WITHOUT executing
them (driver-side planning only) — used to capture before/after plans
while the machine is busy elsewhere.

Usage:
    python scripts/dump_plans.py --out plans/r14 --suffix before name...
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--out", default="plans/r14")
    ap.add_argument("--suffix", default="before")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from blow_spark import get_spark
    from blow_spark.queries import queries

    spark = get_spark(app_name="blow_spark_plans")
    catalog = queries()
    os.makedirs(args.out, exist_ok=True)
    for name in args.names:
        df = catalog[name](spark, sf_dir)
        path = os.path.join(args.out, f"{name}_{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(
                df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
            )
        print("wrote", path, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
