"""Command-line entry point: the user-facing face of the engine.

The reference is driven by running its numbered scripts by hand (or
cron); here the equivalent is one CLI over the whole query catalog:

    python -m youtube_etl_automated_pipeline_spark list
    python -m youtube_etl_automated_pipeline_spark run flagship_enrich_dedup_agg \
        --sf-dir /root/testdata/sf0.01 --limit 20
    python -m youtube_etl_automated_pipeline_spark explain q1_pricing_summary
    python -m youtube_etl_automated_pipeline_spark pipeline --sf-dir ... --out ...

`run` prints the result (bounded by --limit), `explain` prints the
formatted physical plan (the scale-audit surface), `pipeline` executes
the reference's full A->AD chain and writes the wide fact table.
"""

from __future__ import annotations

import argparse
import os
import sys


def _entrymod():
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if repo_root not in sys.path:
        sys.path.insert(0, repo_root)
    import __spark_entry__ as entry

    return entry


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="youtube_etl_automated_pipeline_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list every named query in the catalog")

    runp = sub.add_parser("run", help="execute a named query and print rows")
    runp.add_argument("query")
    runp.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    runp.add_argument("--limit", type=int, default=20)

    exp = sub.add_parser("explain", help="print a query's physical plan")
    exp.add_argument("query")
    exp.add_argument("--sf-dir", default="/root/testdata/sf0.01")

    pipe = sub.add_parser(
        "pipeline", help="run the full A->AD wide-fact pipeline and write parquet"
    )
    pipe.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    pipe.add_argument("--out", required=True)

    args = p.parse_args(argv)
    entry = _entrymod()

    if args.cmd == "list":
        for name in sorted(entry.queries()):
            print(name)
        return 0

    from youtube_etl_automated_pipeline_spark.session import get_spark

    spark = get_spark("cli")
    try:
        if args.cmd == "run":
            qs = entry.queries()
            if args.query not in qs:
                print(f"unknown query {args.query!r}; see `list`", file=sys.stderr)
                return 2
            qs[args.query](spark, args.sf_dir).show(args.limit, truncate=False)
        elif args.cmd == "explain":
            qs = entry.queries()
            if args.query not in qs:
                print(f"unknown query {args.query!r}; see `list`", file=sys.stderr)
                return 2
            qs[args.query](spark, args.sf_dir).explain("formatted")
        elif args.cmd == "pipeline":
            from youtube_etl_automated_pipeline_spark.plans.queries_pipeline import (
                pipeline_e2e,
            )

            df = pipeline_e2e(spark, args.sf_dir)
            df.write.mode("overwrite").parquet(args.out)
            print(f"wrote {args.out}")
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
