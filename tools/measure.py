"""Optimization measurement harness (r08/r09).

Times individual registry queries in isolation (min-of-N, noop sink —
guide section 1.4) and dumps ``explain("formatted")`` plans to
``plans/<round>/<query>_<tag>.txt`` so before/after plan claims are
auditable without running Spark.

Usage:
    python tools/measure.py [--sf DIR] [--runs N] [--tag before|after|'']
                            [--plans-only] query [query ...]

Writes one JSON line per query to stdout: {"query":..., "sec":...}.
Jobs are labelled (guide section 1.5) so the UI/event log is readable.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--tag", default="")
    ap.add_argument("--plans-only", action="store_true")
    ap.add_argument("--round", default="r09")
    args = ap.parse_args()

    from youtube_etl_automated_pipeline_spark.session import get_spark
    from __spark_entry__ import queries

    qs = queries()
    unknown = [q for q in args.queries if q not in qs]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        sys.exit(2)

    spark = get_spark("measure")
    # match bench.py posture: shared-relation warm mode + JVM warmup
    os.environ.setdefault("SPARK_GRAFT_SHARED_SCAN", "1")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    for name in args.queries:
        fn = qs[name]
        if args.tag:
            try:
                df = fn(spark, args.sf)
                plan = spark._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
                path = os.path.join(REPO, "plans", args.round, f"{name}_{args.tag}.txt")
                with open(path, "w") as f:
                    f.write(plan)
            except Exception as e:  # streaming queries execute at build
                print(json.dumps({"query": name, "plan_err": str(e)[:200]}))
        if args.plans_only:
            continue
        best = float("inf")
        for _ in range(args.runs):
            spark.sparkContext.setJobDescription(f"measure: {name}")
            t0 = time.perf_counter()
            df = fn(spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
        print(json.dumps({"query": name, "sec": round(best, 3)}))
        sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()
