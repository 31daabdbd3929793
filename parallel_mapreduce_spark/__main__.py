"""CLI entry point: run/list/explain registered queries.

    python -m parallel_mapreduce_spark list
    python -m parallel_mapreduce_spark run wordcount --sf-dir /root/testdata/sf0.01
    python -m parallel_mapreduce_spark run q1_pricing_summary --limit 5 --json
    python -m parallel_mapreduce_spark explain cosine_topk

The same registry the verification driver consumes backs the CLI, so
anything listed here is oracle-checked surface. `run` prints the result
table (or JSON lines) and `explain` prints the formatted physical plan —
the loop used to iterate on plan shape.
"""

from __future__ import annotations

import argparse
import os
import sys


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="parallel_mapreduce_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list registered queries (* = has oracle)")

    run = sub.add_parser("run", help="run a query and print its result")
    run.add_argument("name")
    run.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    )
    run.add_argument("--limit", type=int, default=20)
    run.add_argument("--json", action="store_true", help="JSON lines instead of a table")

    ex = sub.add_parser("explain", help="print a query's formatted physical plan")
    ex.add_argument("name")
    ex.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    )
    return p


def main(argv: list[str] | None = None) -> int:
    from parallel_mapreduce_spark.registry import QUERIES, _load_all

    args = _build_parser().parse_args(argv)
    _load_all()

    if args.cmd == "list":
        for name, spec in sorted(QUERIES.items()):
            marker = "*" if spec.oracle else " "
            print(f"{marker} {name}")
        return 0

    if args.name not in QUERIES:
        print(f"unknown query: {args.name!r} (see `list`)", file=sys.stderr)
        return 2

    from parallel_mapreduce_spark.session import get_spark

    spark = get_spark("pmr-cli")
    df = QUERIES[args.name].fn(spark, args.sf_dir)
    if args.cmd == "explain":
        df.explain("formatted")
        return 0
    if args.json:
        for row in df.limit(args.limit).toJSON().collect():
            print(row)
    else:
        df.show(args.limit, truncate=40)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
