#!/usr/bin/env python3
"""Batch entry point: build the three reference marts parquet -> parquet.

The analog of the reference's three spark-submit jobs + Airflow DAG
(src/dags/project_dag.py), collapsed into one typed CLI. The reference
chains step_1 >> step_2 >> step_3 as an orchestration convention only —
no step reads another's output (SURVEY.md §3) — so here the three marts
are built from one shared session and can be materialized independently.

Usage:
  python scripts/run_marts.py --events PATH --cities PATH --out DIR \\
      --date 2022-06-15 --max-km 100 [--marts user,zone,friends]

Input layout = the reference's: a Hive date-partitioned events table with
the nested ``event`` struct (schemas.GEO_EVENTS) and a cities table
(schemas.GEO_CITIES).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--events", required=True, help="events table path")
    ap.add_argument("--cities", required=True, help="cities table path")
    ap.add_argument("--out", required=True, help="output directory for marts")
    ap.add_argument("--date", required=True, help="friends processing date YYYY-MM-DD")
    ap.add_argument("--max-km", type=float, default=100.0,
                    help="friends distance threshold (reference default)")
    ap.add_argument("--marts", default="user,zone,friends",
                    help="comma list: user,zone,friends")
    ap.add_argument("--parallel", action="store_true",
                    help="materialize the marts concurrently (they are "
                         "independent — SURVEY.md §3; the reference's "
                         "step_1 >> step_2 >> step_3 chain is convention)")
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from hdfs_with_pyspark_spark import schemas
    from hdfs_with_pyspark_spark.marts import reference as R
    from hdfs_with_pyspark_spark.session import get_spark
    from hdfs_with_pyspark_spark.sources.io import (
        read_events_partition,
        read_geo_events,
        write_parquet,
    )

    spark = get_spark("run-marts")
    events = read_geo_events(spark, args.events)
    cities = spark.read.schema(schemas.GEO_CITIES).parquet(args.cities)

    todo = set(args.marts.split(","))
    jobs = []
    if "user" in todo:
        jobs.append(("user_mart", lambda: write_parquet(
            R.user_mart(events, cities),
            os.path.join(args.out, "user_mart"))))
    if "zone" in todo:
        jobs.append(("zone_mart", lambda: write_parquet(
            R.zone_mart(events, cities),
            os.path.join(args.out, "zone_mart"))))
    if "friends" in todo:
        on_date = read_events_partition(spark, args.events, args.date)
        jobs.append(("friend_recommendations", lambda: write_parquet(
            R.friend_recommendations(events, on_date, cities, args.max_km)
             .withColumn("processed_dttm", F.date_format("processed_dttm",
                                                         "yyyy-MM-dd HH:mm:ss")),
            os.path.join(args.out, "friend_recommendations"))))

    if args.parallel and len(jobs) > 1:
        # One session, one thread per materialization: Spark schedules the
        # three write jobs' stages concurrently across the executor pool —
        # the DAG-level parallelism the reference's sequential
        # SparkSubmitOperator chain leaves on the table.
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=len(jobs)) as pool:
            futures = {pool.submit(fn): name for name, fn in jobs}
            for fut in futures:
                fut.result()  # propagate the first failure
    else:
        for _, fn in jobs:
            fn()
    print(f"done: {sorted(todo)} -> {args.out}")


if __name__ == "__main__":
    main()
