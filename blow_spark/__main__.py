"""Command-line front door: ``python -m blow_spark <cmd>``.

The reference's user experience is a Go program you edit and run
(cmd/fizzbuzz/server/server.go); here the catalog is the product, so the
CLI exposes it directly: list the registered queries, run one against a
fixture directory, or print its executed plan.

    python -m blow_spark list [--tag TAG]
    python -m blow_spark run <query> [--sf-dir DIR] [--limit N] [--json]
    python -m blow_spark explain <query> [--sf-dir DIR]
"""

from __future__ import annotations

import argparse
import json
import sys


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="blow_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("list", help="list registered queries")
    sp.add_argument("--tag", help="only queries carrying this tag")

    for name in ("run", "explain"):
        sp = sub.add_parser(name)
        sp.add_argument("query")
        sp.add_argument("--sf-dir", default="/root/testdata/sf0.01")
        if name == "run":
            sp.add_argument("--limit", type=int, default=20)
            sp.add_argument("--json", action="store_true")
    return p


def list_queries(tag: str | None = None) -> list[str]:
    from blow_spark.queries import REGISTRY, queries

    queries()
    lines = []
    for name, q in sorted(REGISTRY.items()):
        if tag and tag not in q.tags:
            continue
        mark = "oracle" if q.oracle else "rows-only"
        lines.append(f"{name}  [{mark}]  tags={','.join(q.tags)}")
    return lines


def main(argv: list[str] | None = None) -> int:
    args = _build_parser().parse_args(argv)

    if args.cmd == "list":
        for line in list_queries(args.tag):
            print(line)
        return 0

    from blow_spark.queries import queries
    from blow_spark.session import get_spark

    catalog = queries()
    if args.query not in catalog:
        print(f"unknown query: {args.query!r} (see `python -m blow_spark list`)", file=sys.stderr)
        return 2
    spark = get_spark(app_name=f"blow_spark_{args.cmd}")
    df = catalog[args.query](spark, args.sf_dir)

    if args.cmd == "explain":
        df.explain("formatted")
        return 0

    if args.json:
        for row in df.limit(args.limit).toJSON().collect():
            print(row)
    else:
        df.show(args.limit, truncate=False)
    print(json.dumps({"query": args.query, "rows_shown": min(args.limit, df.count())}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
