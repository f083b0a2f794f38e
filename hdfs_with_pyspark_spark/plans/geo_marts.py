"""The reference's three geo marts (SURVEY.md §2.12 D1-D15), re-expressed
over the driver testdata.

The testdata has no geo tables, so coordinates are synthesized
deterministically from integer keys (functions/geo.py) — identical doubles
in Spark and DuckDB — and the messenger roles are mapped onto the events
table:

  * position of an event       -> synth (lat, lon); ~14% NULL
  * city dimension             -> nation + synth coords (25 rows, broadcast)
  * "message"                  -> event_type = 'click'
  * message recipient          -> synth (user_id + event_id) % 150
  * "subscription" + channel   -> event_type = 'signup', channel = props.k
  * processing date partition  -> calendar date of ts

Every reference operator keeps its exact shape: nearest-city argmin (D2),
latest-event window (D4), gaps-and-islands home city (D5), lag-based
travel change-points (D6), pre-aggregate-then-zone pivot mart (D9-D11),
co-subscription pair expansion minus communicated pairs under a distance
threshold (D12-D15). Deviations from the reference (deterministic
tie-breaks, the project_step_3.py:134 user_right bug fixed, one canonical
event-time rule) are documented inline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hdfs_with_pyspark_spark.functions.geo import (
    SQL_CITIES,
    SQL_EVENT_LAT,
    SQL_EVENT_LON,
    haversine_km,
    sql_haversine_km,
    synth_cities,
    with_synth_event_coords,
)
from hdfs_with_pyspark_spark.operators.pairs import canonicalize_pair
from hdfs_with_pyspark_spark.operators.spatial import nearest_city
from hdfs_with_pyspark_spark.operators.windows import (
    change_points,
    latest_per_key,
    streaks,
    top1_per_key,
)
from hdfs_with_pyspark_spark.plans.registry import ensure_session, register
from hdfs_with_pyspark_spark.sources.io import read_table

# Home-city streak threshold: the reference uses 27 active days over months
# of data (project_step_1.py:79); the testdata spans ~30 days with ~25
# cities, so 2+ consecutive active days in one city is the equivalent
# non-trivial threshold.
HOME_STREAK_DAYS = 2
# Friend-recommendation distance threshold (reference: 100 km over real
# cities; synth coords spread ~4000 km, so 300 km keeps the result set
# non-trivial but selective).
FRIEND_MAX_KM = 300.0
# The single processed date for the friends mart (reference takes it as a
# CLI arg, project_dag.py:61).
FRIEND_DATE = "2024-01-15"
# Sydney offset for the oracle-checked local_time: the testdata window is
# January (AEDT, UTC+11) so a fixed interval is exact; the mart API proper
# uses from_utc_timestamp (functions/timeutil.py).
SYDNEY_OFFSET_HOURS = 11

# ---------------------------------------------------------------------------
# Shared Spark-side building blocks
# ---------------------------------------------------------------------------


def _positioned_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events with synth coords, positioned rows only (D3 input shape)."""
    ev = read_table(spark, sf_dir, "events")
    return with_synth_event_coords(ev).where(F.col("lat").isNotNull())


def _assigned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positioned events with their nearest city (D2/D3): zero-shuffle
    map-side argmin against the broadcast-small city dimension."""
    cities = synth_cities(read_table(spark, sf_dir, "nation"))
    return nearest_city(_positioned_events(spark, sf_dir), cities)


# Oracle-side twin of _assigned: cross join + row_number argmin. DuckDB has
# no map-side fold, but at sf0.01 (10k x 25) this is instant.
_SQL_ASSIGNED = f"""
cities AS ({SQL_CITIES}),
ev AS (
  SELECT event_id, user_id, event_type, ts, value, props,
         {SQL_EVENT_LAT} AS lat, {SQL_EVENT_LON} AS lon
  FROM events
),
pos AS (SELECT * FROM ev WHERE lat IS NOT NULL),
assigned AS (
  SELECT event_id, user_id, event_type, ts, value, props, lat, lon, city_id, city
  FROM (
    SELECT e.*, c.city_id, c.city,
           ROW_NUMBER() OVER (
             PARTITION BY e.event_id
             ORDER BY {sql_haversine_km('e.lat', 'e.lon', 'c.city_lat', 'c.city_lon')} ASC,
                      c.city_id ASC) AS rn
    FROM pos e CROSS JOIN cities c
  ) WHERE rn = 1
)
"""


# ---------------------------------------------------------------------------
# Flagship: per-city event-type counts (D9+D10 core — the whole spine:
# scan -> project -> filter -> nearest-city argmin -> agg).
# ---------------------------------------------------------------------------
@register("geo_city_event_counts", oracle=f"""
WITH {_SQL_ASSIGNED}
SELECT city, event_type, CAST(COUNT(*) AS BIGINT) AS n_events
FROM assigned
GROUP BY city, event_type
""")
def geo_city_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_session(spark)
    return (_assigned(spark, sf_dir)
            .groupBy("city", "event_type")
            .agg(F.count("*").alias("n_events")))


# ---------------------------------------------------------------------------
# D4 — act_city: each user's latest positioned event -> city + local time.
# Reference keeps ALL max-ts ties then first() (project_step_1.py:42-51);
# here row_number over (ts desc, event_id desc) — deterministic.
# ---------------------------------------------------------------------------
@register("user_act_city", oracle=f"""
WITH {_SQL_ASSIGNED}
SELECT user_id, city AS act_city,
       strftime(ts + INTERVAL {SYDNEY_OFFSET_HOURS} HOUR,
                '%Y-%m-%d %H:%M:%S') AS local_time
FROM (
  SELECT user_id, city, ts,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM assigned
) WHERE rn = 1
""")
def user_act_city(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_session(spark)
    last = latest_per_key(_assigned(spark, sf_dir), keys=["user_id"],
                          ts="ts", tiebreak=["event_id"])
    return last.select(
        "user_id",
        F.col("city").alias("act_city"),
        F.date_format(F.col("ts") + F.expr(f"INTERVAL {SYDNEY_OFFSET_HOURS} HOURS"),
                      "yyyy-MM-dd HH:mm:ss").alias("local_time"))


# ---------------------------------------------------------------------------
# D5 — home_city: gaps-and-islands over (user, active date, city).
# Deviation from the reference (documented, SURVEY.md §7.4.5): the
# reference's lag-filter-then-row_number drops the first day of every
# non-latest island (project_step_1.py:66-79), undercounting those streaks
# by one; this engine uses the classic dense_rank - row_number islands,
# which counts every island exactly. Pick = latest streak_end, then longest,
# then lexicographically smallest city — fully deterministic (the reference
# uses first() under ties, project_step_1.py:82).
# ---------------------------------------------------------------------------
@register("user_home_city", oracle=f"""
WITH {_SQL_ASSIGNED},
d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS dt, city FROM assigned),
r AS (
  SELECT user_id, city, dt,
         DENSE_RANK() OVER (PARTITION BY user_id ORDER BY dt DESC) AS rk,
         ROW_NUMBER() OVER (PARTITION BY user_id, city ORDER BY dt DESC) AS rn
  FROM d),
s AS (
  SELECT user_id, city, rk - rn AS island,
         MAX(dt) AS streak_end, COUNT(*) AS streak_len
  FROM r GROUP BY 1, 2, 3),
q AS (
  SELECT user_id, city, streak_end, streak_len,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY streak_end DESC, streak_len DESC,
                                     city ASC) AS pick
  FROM s WHERE streak_len >= {HOME_STREAK_DAYS})
SELECT user_id, city AS home_city,
       strftime(streak_end, '%Y-%m-%d') AS home_streak_end,
       CAST(streak_len AS BIGINT) AS home_streak_days
FROM q WHERE pick = 1
""")
def user_home_city(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_session(spark)
    daily = (_assigned(spark, sf_dir)
             .select("user_id", F.to_date("ts").alias("dt"), "city"))
    s = streaks(daily, key="user_id", group="city", date_col="dt")
    qualified = s.where(F.col("streak_len") >= HOME_STREAK_DAYS)
    picked = top1_per_key(qualified, keys=["user_id"],
                          order=[F.col("streak_end").desc(),
                                 F.col("streak_len").desc(),
                                 F.col("city").asc()])
    return picked.select(
        "user_id",
        F.col("city").alias("home_city"),
        F.date_format("streak_end", "yyyy-MM-dd").alias("home_streak_end"),
        F.col("streak_len").alias("home_streak_days"))


# ---------------------------------------------------------------------------
# D6 — travel: ordered city change-points per user, minus the home city
# (anti join), with count and the ordered path. The reference's
# collect_list order is shuffle-dependent (project_step_1.py:103, SURVEY.md
# §2.4 A6); here the path is array_sort over (ts, event_id) structs —
# deterministic — and rendered as a '->' string so the oracle can
# string_agg it.
# ---------------------------------------------------------------------------
@register("user_travel", oracle=f"""
WITH {_SQL_ASSIGNED},
ordered AS (
  SELECT user_id, city, ts, event_id,
         LAG(city) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_city
  FROM assigned),
changes AS (
  SELECT user_id, city, ts, event_id FROM ordered
  WHERE prev_city IS NULL OR city <> prev_city),
d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS dt, city FROM assigned),
r AS (
  SELECT user_id, city, dt,
         DENSE_RANK() OVER (PARTITION BY user_id ORDER BY dt DESC) AS rk,
         ROW_NUMBER() OVER (PARTITION BY user_id, city ORDER BY dt DESC) AS rn
  FROM d),
s AS (
  SELECT user_id, city, rk - rn AS island,
         MAX(dt) AS streak_end, COUNT(*) AS streak_len
  FROM r GROUP BY 1, 2, 3),
q AS (
  SELECT user_id, city,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY streak_end DESC, streak_len DESC,
                                     city ASC) AS pick
  FROM s WHERE streak_len >= {HOME_STREAK_DAYS}),
home AS (SELECT user_id, city FROM q WHERE pick = 1)
SELECT c.user_id,
       CAST(COUNT(*) AS BIGINT) AS travel_count,
       string_agg(c.city, '->' ORDER BY c.ts, c.event_id) AS travel_path
FROM changes c
LEFT JOIN home h ON h.user_id = c.user_id AND h.city = c.city
WHERE h.user_id IS NULL
GROUP BY c.user_id
""")
def user_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_session(spark)
    assigned = _assigned(spark, sf_dir)
    changes = change_points(assigned.select("user_id", "ts", "event_id", "city"),
                            keys=["user_id"], order=["ts", "event_id"],
                            value="city")
    home = user_home_city(spark, sf_dir).select(
        "user_id", F.col("home_city").alias("city"))
    visits = changes.join(home, ["user_id", "city"], "left_anti")
    path = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct("ts", "event_id", "city"))),
            lambda x: x["city"]),
        "->")
    return (visits.groupBy("user_id")
                  .agg(F.count("*").alias("travel_count"),
                       path.alias("travel_path")))


# ---------------------------------------------------------------------------
# D7 — user mart: act_city ⟕ home_city ⟕ travel (project_step_1.py:108-112).
# ---------------------------------------------------------------------------
@register("user_mart", oracle=f"""
WITH {_SQL_ASSIGNED},
last_ev AS (
  SELECT user_id, city AS act_city,
         strftime(ts + INTERVAL {SYDNEY_OFFSET_HOURS} HOUR,
                  '%Y-%m-%d %H:%M:%S') AS local_time
  FROM (
    SELECT user_id, city, ts,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM assigned
  ) WHERE rn = 1),
d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS dt, city FROM assigned),
r AS (
  SELECT user_id, city, dt,
         DENSE_RANK() OVER (PARTITION BY user_id ORDER BY dt DESC) AS rk,
         ROW_NUMBER() OVER (PARTITION BY user_id, city ORDER BY dt DESC) AS rn
  FROM d),
s AS (
  SELECT user_id, city, rk - rn AS island,
         MAX(dt) AS streak_end, COUNT(*) AS streak_len
  FROM r GROUP BY 1, 2, 3),
q AS (
  SELECT user_id, city,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY streak_end DESC, streak_len DESC,
                                     city ASC) AS pick
  FROM s WHERE streak_len >= {HOME_STREAK_DAYS}),
home AS (SELECT user_id, city AS home_city FROM q WHERE pick = 1),
ordered AS (
  SELECT user_id, city, ts, event_id,
         LAG(city) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_city
  FROM assigned),
changes AS (
  SELECT user_id, city, ts, event_id FROM ordered
  WHERE prev_city IS NULL OR city <> prev_city),
travel AS (
  SELECT c.user_id,
         CAST(COUNT(*) AS BIGINT) AS travel_count,
         string_agg(c.city, '->' ORDER BY c.ts, c.event_id) AS travel_path
  FROM changes c
  LEFT JOIN home h ON h.user_id = c.user_id AND c.city = h.home_city
  WHERE h.user_id IS NULL
  GROUP BY c.user_id)
SELECT l.user_id, l.act_city, l.local_time, h.home_city,
       t.travel_count, t.travel_path
FROM last_ev l
LEFT JOIN home h USING (user_id)
LEFT JOIN travel t USING (user_id)
""")
def user_mart(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_session(spark)
    act = user_act_city(spark, sf_dir)
    home = user_home_city(spark, sf_dir).select("user_id", "home_city")
    travel = user_travel(spark, sf_dir)
    return (act.join(home, ["user_id"], "left")
               .join(travel, ["user_id"], "left")
               .select("user_id", "act_city", "local_time", "home_city",
                       "travel_count", "travel_path"))
