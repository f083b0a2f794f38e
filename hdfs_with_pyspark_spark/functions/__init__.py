from hdfs_with_pyspark_spark.functions.geo import (
    haversine_km,
    sql_haversine_km,
    with_synth_event_coords,
    synth_cities,
    SQL_EVENT_LAT,
    SQL_EVENT_LON,
    SQL_CITIES,
)
from hdfs_with_pyspark_spark.functions.timeutil import (
    event_time,
    local_time,
    iso_week,
    event_month,
    event_date_str,
)

__all__ = [
    "haversine_km",
    "sql_haversine_km",
    "with_synth_event_coords",
    "synth_cities",
    "SQL_EVENT_LAT",
    "SQL_EVENT_LON",
    "SQL_CITIES",
    "event_time",
    "local_time",
    "iso_week",
    "event_month",
    "event_date_str",
]
