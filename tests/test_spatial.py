"""Unit tests for haversine + the three nearest-city strategies
(SURVEY.md §2.12 D1/D2; tie semantics §7.4.1-2)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from hdfs_with_pyspark_spark.functions.geo import haversine_km
from hdfs_with_pyspark_spark.operators.spatial import (
    nearest_city,
    nearest_city_crossjoin,
    nearest_city_gridded,
)


@pytest.fixture(scope="module")
def cities(spark):
    return spark.createDataFrame(
        [(1, "alpha", -33.87, 151.21),   # Sydney-ish
         (2, "bravo", -37.81, 144.96),   # Melbourne-ish
         (3, "charlie", -27.47, 153.03)],  # Brisbane-ish
        "city_id int, city string, city_lat double, city_lon double")


def test_haversine_known_distance(spark):
    # Sydney <-> Melbourne great-circle distance is ~713 km.
    df = spark.createDataFrame([(-33.8688, 151.2093, -37.8136, 144.9631)],
                               "a double, b double, c double, d double")
    km = df.select(haversine_km(F.col("a"), F.col("b"), F.col("c"), F.col("d"))
                   .alias("km")).first()["km"]
    assert math.isclose(km, 713.0, abs_tol=5.0)


def test_haversine_zero(spark):
    df = spark.createDataFrame([(-33.0, 151.0)], "a double, b double")
    km = df.select(haversine_km(F.col("a"), F.col("b"), F.col("a"), F.col("b"))
                   .alias("km")).first()["km"]
    assert km == 0.0


def _points(spark):
    return spark.createDataFrame(
        [(1, -33.9, 151.2),    # near alpha
         (2, -37.5, 145.0),    # near bravo
         (3, -27.0, 153.0),    # near charlie
         (4, None, None)],     # no position
        "pid int, lat double, lon double")


def test_nearest_city_mapside(spark, cities):
    out = {r["pid"]: r["city"]
           for r in nearest_city(_points(spark), cities).collect()}
    assert out == {1: "alpha", 2: "bravo", 3: "charlie", 4: None}


def test_nearest_city_strategies_agree(spark, cities):
    pts = _points(spark).where(F.col("lat").isNotNull())
    a = sorted((r["pid"], r["city_id"]) for r in nearest_city(pts, cities).collect())
    b = sorted((r["pid"], r["city_id"])
               for r in nearest_city_crossjoin(pts, cities).collect())
    c = sorted((r["pid"], r["city_id"])
               for r in nearest_city_gridded(pts, cities, cell_deg=20.0).collect())
    # small cells: some best-candidates exceed the margin -> exercises the
    # distance-margin fallback path
    d = sorted((r["pid"], r["city_id"])
               for r in nearest_city_gridded(pts, cities, cell_deg=1.0).collect())
    assert a == b == c == d


def test_nearest_city_gridded_fallback(spark, cities):
    # A point far outside every city's 3x3 neighborhood with a tiny cell size
    # must still resolve via the broadcast fallback.
    far = spark.createDataFrame([(9, -10.0, 112.0)], "pid int, lat double, lon double")
    out = nearest_city_gridded(far, cities, cell_deg=0.5).collect()
    assert len(out) == 1 and out[0]["city_id"] is not None


def test_nearest_city_tie_breaks_lowest_id(spark):
    # Point exactly equidistant between two cities on the same latitude:
    # the reference keeps BOTH rows (common_func.py:22 min+filter); this
    # engine deterministically keeps the lowest city_id (SURVEY.md §7.4.1).
    cities = spark.createDataFrame(
        [(2, "east", 0.0, 10.0), (1, "west", 0.0, 0.0)],
        "city_id int, city string, city_lat double, city_lon double")
    pt = spark.createDataFrame([(1, 0.0, 5.0)], "pid int, lat double, lon double")
    for fn in (nearest_city, nearest_city_crossjoin):
        got = fn(pt, cities).collect()
        assert len(got) == 1 and got[0]["city_id"] == 1


def test_city_cache_bounded_and_clearable(spark):
    from hdfs_with_pyspark_spark.operators import spatial as sp
    sp.clear_city_cache()
    assert sp._CITY_ROWS_CACHE == {}
    for i in range(sp._CITY_ROWS_CACHE_MAX + 5):
        cities = spark.createDataFrame(
            [(i, f"c{i}", float(i % 10), 0.0)],
            "city_id int, city string, city_lat double, city_lon double")
        sp._city_rows(cities)
    # bounded: the memo never exceeds its cap, however many distinct
    # dimensions a long-lived service cycles through
    assert len(sp._CITY_ROWS_CACHE) <= sp._CITY_ROWS_CACHE_MAX
    sp.clear_city_cache()
    assert sp._CITY_ROWS_CACHE == {}
