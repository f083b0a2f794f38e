#!/usr/bin/env python3
"""Batch entry point: build the three reference marts parquet -> parquet.

The analog of the reference's three spark-submit jobs + Airflow DAG
(src/dags/project_dag.py), collapsed into one typed CLI. The reference
chains step_1 >> step_2 >> step_3 as an orchestration convention only —
no step reads another's output (SURVEY.md §3) — so here the three marts
are built from one shared session as an in-process DAG
(hdfs_with_pyspark_spark.pipeline): independent marts run concurrently,
each with a transient-failure retry budget, and one mart failing still
materializes the others (parquet sinks overwrite, so retries are
idempotent). ``--serial`` degrades to the reference's sequential shape.

Usage:
  spark-submit scripts/run_marts.py --events PATH --cities PATH --out DIR \\
      --date 2022-06-15 --max-km 100 [--marts user,zone,friends] \\
      [--retries 2] [--serial]
  spark-submit scripts/run_marts.py --mart user        # self-contained demo

(``python scripts/run_marts.py`` works identically — the script builds
its own local session when spark-submit hasn't provided a master.)

Input layout = the reference's: a Hive date-partitioned events table with
the nested ``event`` struct (schemas.GEO_EVENTS) and a cities table
(schemas.GEO_CITIES). When ``--events``/``--cities`` are omitted, a
deterministic demo fixture in that exact layout is materialized under the
session scratch dir (sources/demo.py) so the orchestration surface can be
smoke-run with zero external state; ``--out`` then defaults to the
scratch dir too, and ``--date`` to the demo's message-dense date.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--events", help="events table path (default: demo fixture)")
    ap.add_argument("--cities", help="cities table path (default: demo fixture)")
    ap.add_argument("--out", help="output directory for marts "
                                  "(default: session scratch dir)")
    ap.add_argument("--date", help="friends processing date YYYY-MM-DD "
                                   "(default: the demo fixture's date)")
    ap.add_argument("--max-km", type=float, default=100.0,
                    help="friends distance threshold (reference default)")
    ap.add_argument("--marts", "--mart", dest="marts",
                    default="user,zone,friends",
                    help="comma list: user,zone,friends")
    ap.add_argument("--serial", action="store_true",
                    help="one mart at a time (the reference's sequential "
                         "chain); default runs the independent marts "
                         "concurrently in the shared session")
    ap.add_argument("--retries", type=int, default=2,
                    help="per-mart retry budget for transient failures")
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from hdfs_with_pyspark_spark import schemas
    from hdfs_with_pyspark_spark.marts import reference as R
    from hdfs_with_pyspark_spark.pipeline import DAG, Task
    from hdfs_with_pyspark_spark.session import get_spark
    from hdfs_with_pyspark_spark.sources.io import (
        read_events_partition,
        read_geo_events,
        write_parquet,
    )

    spark = get_spark("run-marts")

    if not args.events or not args.cities:
        from hdfs_with_pyspark_spark.sources.demo import (
            DEMO_DATE,
            ensure_demo_inputs,
        )
        from hdfs_with_pyspark_spark.session import scratch_dir
        demo_events, demo_cities = ensure_demo_inputs(
            spark, scratch_dir(spark, "demo_inputs"))
        args.events = args.events or demo_events
        args.cities = args.cities or demo_cities
        args.date = args.date or DEMO_DATE
    if not args.out:
        from hdfs_with_pyspark_spark.session import scratch_dir
        args.out = scratch_dir(spark, "marts_out")
    if not args.date:
        ap.error("--date is required when --events is given")

    events = read_geo_events(spark, args.events)
    cities = spark.read.schema(schemas.GEO_CITIES).parquet(args.cities)

    todo = set(args.marts.split(","))
    dag = DAG("marts", max_workers=1 if args.serial else None)
    if "user" in todo:
        dag.add(Task("user_mart", lambda: write_parquet(
            R.user_mart(events, cities),
            os.path.join(args.out, "user_mart")), retries=args.retries))
    if "zone" in todo:
        dag.add(Task("zone_mart", lambda: write_parquet(
            R.zone_mart(events, cities),
            os.path.join(args.out, "zone_mart")), retries=args.retries))
    if "friends" in todo:
        on_date = read_events_partition(spark, args.events, args.date)
        dag.add(Task("friend_recommendations", lambda: write_parquet(
            R.friend_recommendations(events, on_date, cities, args.max_km)
             .withColumn("processed_dttm", F.date_format("processed_dttm",
                                                         "yyyy-MM-dd HH:mm:ss")),
            os.path.join(args.out, "friend_recommendations")),
            retries=args.retries))

    # One session, one DAG thread per ready mart: Spark schedules the
    # write jobs' stages concurrently across the executor pool — the
    # DAG-level parallelism the reference's sequential
    # SparkSubmitOperator chain leaves on the table. Failures retry with
    # backoff (sinks overwrite => idempotent), and a mart that exhausts
    # its budget doesn't stop the others.
    reports = dag.run(raise_on_failure=False)
    for name, rep in reports.items():
        print(f"{name}: {rep.state.value} "
              f"({rep.attempts} attempt(s), {rep.seconds:.1f}s)"
              + (f" — {rep.error}" if rep.error else ""))
    if any(r.state.value != "success" for r in reports.values()):
        sys.exit(1)
    print(f"done: {sorted(todo)} -> {args.out}")


if __name__ == "__main__":
    main()
