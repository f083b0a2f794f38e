#!/usr/bin/env python3
"""Head-to-head throughput: this engine vs the reference, same data, same JVM.

The build goal is "matches-or-beats the reference's single-node
throughput at the same data scale". The reference's functions are plain
(DataFrame -> DataFrame) PySpark (only its main() hardcodes YARN), so
this script imports them from $REFERENCE_DIR (default /root/reference),
generates a reference-layout geo dataset (nested event struct, Hive
date partitions, 25-city dimension), and times

  * step 1, user mart:  reference project_step_1 chain  vs  marts.reference.user_mart
  * step 2, zone mart:  reference project_step_2 chain  vs  marts.reference.zone_mart

both materialized with a parquet write, best of RUNS runs each.
Prints one JSON line. Skips quietly (exit 0) if the reference tree is
not present — the engine repo stays standalone; the reference is never
imported by library code, only by this optional measurement script.

Usage: python scripts/bench_vs_reference.py [--events N] [--runs K]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_SCRIPTS = os.path.join(
    os.environ.get("REFERENCE_DIR", "/root/reference"), "src", "scripts")


def gen_data(spark, out_events: str, out_cities: str, n_events: int,
             n_users: int = 2000) -> None:
    """Reference-layout synthetic data, built with Spark expressions (no
    driver-side row list): ~n_events 'message' rows across 2000 users x
    60 days with deterministic coords, plus the 25-city dimension."""
    from pyspark.sql import functions as F

    users = n_users
    days = 60
    base = spark.range(n_events).select(
        (F.col("id") % users).alias("u"),
        (F.col("id") % days + 1).alias("day"),
        F.col("id").alias("mid"))
    ts = (F.date_add(F.lit("2022-04-01").cast("date"), (F.col("day") - 1).cast("int"))
           .cast("timestamp") + F.expr("INTERVAL 12 HOURS"))
    lat = -44.0 + ((F.col("u") * 37 + F.col("mid") * 13) % 3400) / 100.0
    lon = 112.0 + ((F.col("u") * 59 + F.col("mid") * 17) % 4200) / 100.0
    is_sub = (F.col("mid") % 10) == 0   # every 10th event is a subscription
    events = base.select(
        F.struct(
            F.when(~is_sub, F.col("u")).alias("message_from"),
            F.when(~is_sub, (F.col("u") + 1 + F.col("mid") % 7) % users)
             .alias("message_to"),
            F.when(~is_sub, F.col("mid")).alias("message_id"),
            F.when(~is_sub, ts).alias("message_ts"),
            ts.alias("datetime"),
            F.lit(None).cast("long").alias("reaction_from"),
            F.when(is_sub, F.col("u")).alias("user"),
            F.when(is_sub, F.col("u") % 100).alias("subscription_channel"),
        ).alias("event"),
        F.when(is_sub, "subscription").otherwise("message").alias("event_type"),
        lat.alias("lat"),
        lon.alias("lon"),
        F.date_format(ts, "yyyy-MM-dd").alias("date"))
    events.write.mode("overwrite").partitionBy("date").parquet(out_events)

    cities = spark.range(25).select(
        F.col("id").cast("int").alias("id"),
        F.concat(F.lit("CITY_"), F.col("id")).alias("city"),
        (-44.0 + (F.col("id") * 53 % 25) * 1.37).alias("lat"),
        (112.0 + (F.col("id") * 29 % 25) * 1.68).alias("lon"))
    cities.write.mode("overwrite").parquet(out_cities)


def timed(fn, runs: int) -> float:
    best = None
    for _ in range(runs):
        t0 = time.time()
        fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=300_000)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--workdir", default="/tmp/bench_vs_reference")
    ap.add_argument("--marts", default="user,zone,friends",
                    help="comma-set of marts to time (100M+ single-mart "
                         "points stay affordable)")
    ap.add_argument("--users", type=int, default=2000,
                    help="synthetic user cardinality (default matches the "
                         "recorded 1M/10M/100M points; scale it with "
                         "--events for realistic per-user volume — 2000 "
                         "users at 1B events means 500k events/user, "
                         "which blows up per-user window state in ANY "
                         "engine)")
    ap.add_argument("--sides", default="ref,mine",
                    help="comma-set of sides to time: engine-only scale "
                         "probes (--sides mine) skip the reference at "
                         "sizes where its superlinear crossJoin would "
                         "run for hours")
    args = ap.parse_args()
    marts = {m.strip() for m in args.marts.split(",") if m.strip()}
    sides = {s.strip() for s in args.sides.split(",") if s.strip()}

    if not os.path.isdir(REFERENCE_SCRIPTS):
        print(json.dumps({"skipped": "reference tree not found"}))
        return
    sys.path.insert(0, REFERENCE_SCRIPTS)
    import project_step_1 as ref1            # noqa: E402
    import project_step_2 as ref2            # noqa: E402

    from hdfs_with_pyspark_spark.marts import reference as mine
    from hdfs_with_pyspark_spark.session import get_spark

    spark = get_spark("bench-vs-reference")
    shutil.rmtree(args.workdir, ignore_errors=True)
    ev_path = os.path.join(args.workdir, "events")
    city_path = os.path.join(args.workdir, "cities")
    gen_data(spark, ev_path, city_path, args.events, args.users)

    def ref_user_mart():
        ev = ref1.read_events_geo(ev_path, spark)
        cities = ref1.read_city_geo(city_path, spark)
        mg = ref1.message_geo(ev, cities)
        out = ref1.user_mart(ref1.last_geo(mg), ref1.home_geo(mg),
                             ref1.travel(mg, ref1.home_geo(mg)))
        out.write.mode("overwrite").parquet(os.path.join(args.workdir, "ref_user"))
        spark.catalog.clearCache()

    def my_user_mart():
        from hdfs_with_pyspark_spark.sources.io import read_geo_events
        ev = read_geo_events(spark, ev_path)
        cities = spark.read.parquet(city_path)
        mine.user_mart(ev, cities).write.mode("overwrite").parquet(
            os.path.join(args.workdir, "my_user"))
        spark.catalog.clearCache()

    def ref_zone_mart():
        ev = ref2.read_events_geo(ev_path, spark)
        cities = ref2.read_city_geo(city_path, spark)
        out = ref2.events_count_period(
            ref2.events_with_zone(cities, ref2.events_with_geo(
                ev, ref2.last_message(ev))))
        out.write.mode("overwrite").parquet(os.path.join(args.workdir, "ref_zone"))
        spark.catalog.clearCache()

    def my_zone_mart():
        from hdfs_with_pyspark_spark.sources.io import read_geo_events
        ev = read_geo_events(spark, ev_path)
        cities = spark.read.parquet(city_path)
        mine.zone_mart(ev, cities).write.mode("overwrite").parquet(
            os.path.join(args.workdir, "my_zone"))
        spark.catalog.clearCache()

    import project_step_3 as ref3            # noqa: E402
    the_date = "2022-04-15"
    max_km = 300.0

    # NOTE on step 3: timings are comparable, results are not identical —
    # this engine fixes the reference's user_right self-pairing bug
    # (project_step_3.py:134, SURVEY.md §2.12) and uses deterministic
    # tie-breaks, so the pair sets differ slightly by design.
    def ref_friends():
        ev = ref3.read_events_geo(ev_path, spark)
        subs = ref3.subscribers(ev)
        comm = ref3.communicating_subscribers(ev, subs)
        on_date = ref3.read_events_geo_date(ev_path, the_date, spark)
        cand = ref3.possible_subscribers_to_communicate(
            subs, comm, on_date, the_date, max_km)
        cities = ref3.read_city_geo(city_path, spark)
        out = ref3.define_possible_subscribers_to_communicate_with_zone(cities, cand)
        out.write.mode("overwrite").parquet(os.path.join(args.workdir, "ref_friends"))
        spark.catalog.clearCache()

    def my_friends():
        from hdfs_with_pyspark_spark.sources.io import (
            read_events_partition, read_geo_events)
        ev = read_geo_events(spark, ev_path)
        on_date = read_events_partition(spark, ev_path, the_date)
        cities = spark.read.parquet(city_path)
        mine.friend_recommendations(ev, on_date, cities, max_km) \
            .write.mode("overwrite").parquet(os.path.join(args.workdir, "my_friends"))
        spark.catalog.clearCache()

    pairs = {"user": ("user_mart", ref_user_mart, my_user_mart),
             "zone": ("zone_mart", ref_zone_mart, my_zone_mart),
             "friends": ("friend_recommendations", ref_friends, my_friends)}
    result = {"n_events": args.events, "n_users": args.users,
              "runs_per_side": args.runs}
    for short, (k, ref_fn, my_fn) in pairs.items():
        if short not in marts:
            continue
        result[k] = {}
        if "ref" in sides:
            result[k]["reference_sec"] = timed(ref_fn, args.runs)
        if "mine" in sides:
            result[k]["engine_sec"] = timed(my_fn, args.runs)
        r = result[k].get("reference_sec")
        m = result[k].get("engine_sec")
        if r is not None and m:
            result[k]["speedup"] = round(r / m, 2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
