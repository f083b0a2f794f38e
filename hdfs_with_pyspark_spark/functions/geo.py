"""Geospatial expression builders (SURVEY.md §2.8 F4, §2.12 D1).

``haversine_km`` re-expresses the reference's ``distance``
(reference: src/scripts/common_func.py:4-13) as a pure Column-expression
builder — no UDF, fully codegen'd by Tungsten. The reference hardcodes
K = 3.1415926535/180; we use the correctly-rounded double for pi/180 and
document the (sub-meter) deviation.

Because the driver's testdata has no geo tables, the geo operators are
exercised over *deterministically synthesized* coordinates derived from
integer keys with exact integer arithmetic — identical in Spark and in the
DuckDB oracle SQL (both compute the same IEEE-754 doubles). The SQL
fragments live next to the Column builders so the two can never drift.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# pi/180, correctly rounded double. The reference uses 3.1415926535/180
# (common_func.py:8); difference is < 1e-10 relative — sub-meter at Earth
# scale. Documented deviation for exactness of the constant.
DEG = 0.017453292519943295
EARTH_RADIUS_KM = 6371.0


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in km between two (lat, lon) pairs, degrees in.

    distance = 2 R asin(sqrt(sin^2(dlat/2) + cos(lat1) cos(lat2) sin^2(dlon/2)))
    (reference semantics: common_func.py:4-13). Pure Column expression:
    executes inside whole-stage codegen, zero Python round-trips.
    """
    dlat = (lat1 - lat2) * DEG / 2.0
    dlon = (lon1 - lon2) * DEG / 2.0
    a = (
        F.pow(F.sin(dlat), 2)
        + F.cos(lat1 * DEG) * F.cos(lat2 * DEG) * F.pow(F.sin(dlon), 2)
    )
    return 2.0 * EARTH_RADIUS_KM * F.asin(F.sqrt(a))


def sql_haversine_km(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    """ANSI-SQL rendering of :func:`haversine_km` for the DuckDB oracle."""
    return (
        f"(2.0 * {EARTH_RADIUS_KM} * asin(sqrt("
        f"pow(sin((({lat1}) - ({lat2})) * {DEG} / 2.0), 2) "
        f"+ cos(({lat1}) * {DEG}) * cos(({lat2}) * {DEG}) "
        f"* pow(sin((({lon1}) - ({lon2})) * {DEG} / 2.0), 2))))"
    )


# ---------------------------------------------------------------------------
# Synthetic coordinates over the driver testdata (AU-like bounding box,
# FIXTURES.md §B): events get a per-event position derived from
# (user_id, event_id); the `nation` table doubles as the city dimension.
# All arithmetic is integer-exact before one final double division, so the
# Spark and DuckDB values are bit-identical.
# ---------------------------------------------------------------------------

# ~14% of events have no position (event_id % 7 == 0), exercising the
# reference's null-coords handling (project_step_2.py:51-52).
SQL_EVENT_LAT = ("(CASE WHEN event_id % 7 = 0 THEN NULL ELSE "
                 "-44.0 + ((user_id * 37 + event_id * 13) % 3400) / 100.0 END)")
SQL_EVENT_LON = ("(CASE WHEN event_id % 7 = 0 THEN NULL ELSE "
                 "112.0 + ((user_id * 59 + event_id * 17) % 4200) / 100.0 END)")

# City dimension synthesized from `nation` (25 rows — broadcastable, like the
# reference's cities table, common_func.py:19). 53 and 29 are coprime with 25
# so both coordinate sequences are permutations: all 25 cities distinct.
SQL_CITIES = (
    "SELECT n_nationkey AS city_id, n_name AS city, "
    "-44.0 + ((n_nationkey * 53) % 25) * 1.37 AS city_lat, "
    "112.0 + ((n_nationkey * 29) % 25) * 1.68 AS city_lon "
    "FROM nation"
)


def with_synth_event_coords(events: DataFrame) -> DataFrame:
    """Attach the synthetic (lat, lon) columns to the events table."""
    has_pos = F.col("event_id") % 7 != 0
    lat = -44.0 + ((F.col("user_id") * 37 + F.col("event_id") * 13) % 3400) / 100.0
    lon = 112.0 + ((F.col("user_id") * 59 + F.col("event_id") * 17) % 4200) / 100.0
    return (events
            .withColumn("lat", F.when(has_pos, lat))
            .withColumn("lon", F.when(has_pos, lon)))


def synth_cities(nation: DataFrame) -> DataFrame:
    """City dimension (id, name, lat, lon) synthesized from `nation`."""
    return nation.select(
        F.col("n_nationkey").alias("city_id"),
        F.col("n_name").alias("city"),
        (-44.0 + ((F.col("n_nationkey") * 53) % 25) * 1.37).alias("city_lat"),
        (112.0 + ((F.col("n_nationkey") * 29) % 25) * 1.68).alias("city_lon"),
    )
