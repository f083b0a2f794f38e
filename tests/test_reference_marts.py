"""End-to-end tests for the reference-shaped mart API (marts/reference.py)
on a hand-built fixture with per-value expectations, exercising the full
reference data layout: nested event struct, Hive date-partitioned parquet
(partitioned write S3 + pruned partition read S2).

Fixture geography: alpha(0,0), bravo(10,10) ~1565 km away, charlie(0.5,0.5)
~78 km from alpha. u1 lives 27 active days near alpha then moves to bravo;
u2 pings near charlie then moves to bravo; u3 stays near charlie. u2+u3
co-subscribe channel 100 and never message each other.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from hdfs_with_pyspark_spark import schemas
from hdfs_with_pyspark_spark.marts import reference as R
from hdfs_with_pyspark_spark.sources.io import (
    read_events_partition,
    read_geo_events,
    write_parquet,
)


def _ts(day: int, hour: int = 12) -> datetime.datetime:
    return datetime.datetime(2024, 1, day, hour, 0, 0)


def _msg(uid, day, lat, lon, mid, to=None, hour=12):
    return ((uid, to, mid, _ts(day, hour), _ts(day, hour), None, None, None),
            "message", lat, lon, f"2024-01-{day:02d}")


def _sub(uid, channel, day):
    return ((None, None, None, None, _ts(day), None, uid, channel),
            "subscription", None, None, f"2024-01-{day:02d}")


@pytest.fixture(scope="module")
def geo_tables(spark, tmp_path_factory):
    rows, mid = [], 0
    for d in range(1, 28):                      # u1: 27 active days at alpha
        mid += 1
        rows.append(_msg(1, d, 0.0, 0.001 * d, mid))
    mid += 1
    rows.append(_msg(1, 10, 0.0, 0.01, mid, to=2, hour=13))  # u1 -> u2
    for d in (28, 29):                          # u1 moves to bravo
        mid += 1
        rows.append(_msg(1, d, 10.0, 10.0, mid))
    mid += 1
    rows.append(_msg(2, 15, 0.4, 0.4, mid, to=1))   # u2 near charlie
    mid += 1
    rows.append(_msg(2, 20, 10.0, 10.0, mid))       # u2 moves to bravo
    mid += 1
    rows.append(_msg(3, 15, 0.5, 0.5, mid, to=1))   # u3 at charlie
    rows += [_sub(2, 100, 2), _sub(3, 100, 3), _sub(1, 200, 2)]

    path = str(tmp_path_factory.mktemp("geo") / "events")
    events = spark.createDataFrame(rows, schemas.GEO_EVENTS)
    write_parquet(events, path, partition_by=["date"])   # S3 partitioned sink

    cities = spark.createDataFrame(
        [(1, "alpha", 0.0, 0.0), (2, "bravo", 10.0, 10.0),
         (3, "charlie", 0.5, 0.5)], schemas.GEO_CITIES)
    return path, cities


def test_partitioned_layout_prunes(spark, geo_tables):
    path, _ = geo_tables
    df = read_events_partition(spark, path, "2024-01-15")
    assert df.count() == 3                      # u1 + u2 + u3 messages that day
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(date" in plan  # pruned scan, not full


def test_user_mart_values(spark, geo_tables):
    path, cities = geo_tables
    events = read_geo_events(spark, path)
    out = {r["user_id"]: r for r in R.user_mart(events, cities).collect()}
    assert set(out) == {1, 2, 3}
    u1, u2, u3 = out[1], out[2], out[3]
    assert (u1["act_city"], u1["home_city"]) == ("bravo", "alpha")
    assert u1["travel_count"] == 1 and u1["travel_array"] == ["bravo"]
    assert (u2["act_city"], u2["home_city"]) == ("bravo", None)
    assert u2["travel_array"] == ["charlie", "bravo"]
    assert (u3["act_city"], u3["home_city"]) == ("charlie", None)
    assert u3["travel_array"] == ["charlie"]
    # Sydney local time: January is AEDT = UTC+11
    assert out[1]["local_time"] == _ts(29, 23)


def test_home_requires_full_streak(spark, geo_tables):
    path, cities = geo_tables
    events = read_geo_events(spark, path)
    msgs = R.message_geo(events, cities)
    # 27 active days qualify; 28 required -> nobody qualifies
    assert R.home_geo(msgs, streak_days=28).count() == 0
    assert {r["user_id"] for r in R.home_geo(msgs, streak_days=27).collect()} == {1}


def test_zone_mart_shape_and_totals(spark, geo_tables):
    path, cities = geo_tables
    events = read_geo_events(spark, path)
    zm = R.zone_mart(events, cities)
    cols = set(zm.columns)
    assert {"month", "week", "city_id",
            "week_message", "week_subscription",
            "month_message", "month_reaction"} <= cols
    total_msgs = zm.agg(F.sum("week_message")).first()[0]
    assert total_msgs == 33                      # every message counted once
    # subscriptions have no coords; they backfill to the actor's last
    # message position, so they land in a zone too
    assert zm.agg(F.sum("week_subscription")).first()[0] == 3


def test_friend_recommendations_pair_and_zone(spark, geo_tables):
    path, cities = geo_tables
    events = read_geo_events(spark, path)
    on_date = read_events_partition(spark, path, "2024-01-15")
    recs = R.friend_recommendations(events, on_date, cities, max_km=100.0).collect()
    assert len(recs) == 1
    r = recs[0]
    # co-subscribed (channel 100), never communicated, ~15.6 km apart;
    # midpoint (0.45, 0.45) is nearest charlie
    assert (r["user_left"], r["user_right"], r["zone_id"]) == (3, 2, 3)


def test_friend_distance_threshold_excludes(spark, geo_tables):
    path, cities = geo_tables
    events = read_geo_events(spark, path)
    on_date = read_events_partition(spark, path, "2024-01-15")
    assert R.friend_recommendations(events, on_date, cities, max_km=10.0).count() == 0


def test_run_marts_cli(spark, geo_tables, tmp_path):
    # The spark-submit-style batch entry (the analog of the reference's
    # three jobs + DAG) must build all three marts parquet -> parquet.
    import sys
    sys.path.insert(0, "scripts")
    import run_marts

    path, cities = geo_tables
    cities_path = str(tmp_path / "cities")
    cities.write.mode("overwrite").parquet(cities_path)
    out = str(tmp_path / "marts")
    run_marts.main(["--events", path, "--cities", cities_path,
                    "--out", out, "--date", "2024-01-15", "--max-km", "100"])
    user = spark.read.parquet(f"{out}/user_mart")
    zone = spark.read.parquet(f"{out}/zone_mart")
    friends = spark.read.parquet(f"{out}/friend_recommendations")
    assert user.count() == 3 and {"user_id", "act_city", "home_city"} <= set(user.columns)
    assert zone.count() > 0 and "week_message" in zone.columns
    # u2+u3 co-subscribed, never messaged, both at charlie on the 15th
    [rec] = friends.collect()
    assert (rec["user_left"], rec["user_right"]) == (3, 2)


def test_run_marts_cli_serial(spark, geo_tables, tmp_path):
    # The default run materializes the three independent marts as a
    # concurrent in-session DAG; --serial degrades to the reference's
    # one-at-a-time chain and must produce identical outputs.
    import sys
    sys.path.insert(0, "scripts")
    import run_marts

    path, cities = geo_tables
    cities_path = str(tmp_path / "cities_p")
    cities.write.mode("overwrite").parquet(cities_path)
    out = str(tmp_path / "marts_p")
    run_marts.main(["--events", path, "--cities", cities_path,
                    "--out", out, "--date", "2024-01-15", "--max-km", "100",
                    "--serial"])
    user = spark.read.parquet(f"{out}/user_mart")
    friends = spark.read.parquet(f"{out}/friend_recommendations")
    assert user.count() == 3
    [rec] = friends.collect()
    assert (rec["user_left"], rec["user_right"]) == (3, 2)


def test_marts_on_empty_events(spark, geo_tables):
    # Operators must degrade to empty results — not crash — on an empty
    # (but schema-complete) event table: the day-one / empty-partition
    # case every incremental pipeline hits.
    _, cities = geo_tables
    empty = spark.createDataFrame([], schemas.GEO_EVENTS)
    assert R.user_mart(empty, cities).count() == 0
    assert R.zone_mart(empty, cities).count() == 0
    assert R.friend_recommendations(empty, empty, cities, 100.0).count() == 0


def test_nearest_city_null_coords_keep_rows(spark, geo_tables):
    # NULL coordinates must pass through with NULL city, not be dropped:
    # the zone mart depends on that contract for its geo backfill.
    from hdfs_with_pyspark_spark.operators.spatial import nearest_city
    _, cities = geo_tables
    df = spark.createDataFrame(
        [(1, 0.0, 0.0), (2, None, None)],
        "id long, lat double, lon double")
    out = {r["id"]: r["city"] for r in nearest_city(df, cities).collect()}
    assert out[1] is not None and out[2] is None


def test_friend_channel_cap_equivalence_and_bite(spark, geo_tables):
    path, cities = geo_tables
    events = read_geo_events(spark, path)
    on_date = read_events_partition(spark, path, "2024-01-15")
    base = R.friend_recommendations(events, on_date, cities, max_km=100.0)
    # a cap above every channel's membership changes nothing
    capped = R.friend_recommendations(events, on_date, cities, max_km=100.0,
                                      max_channel_members=1000)
    key = lambda df: {(r["user_left"], r["user_right"], r["zone_id"])
                      for r in df.collect()}
    assert key(capped) == key(base) and len(key(base)) > 0
    # cap=1 leaves one member per channel -> no pairs can form
    solo = R.friend_recommendations(events, on_date, cities, max_km=100.0,
                                    max_channel_members=1)
    assert solo.count() == 0
