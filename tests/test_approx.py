"""Approximate-aggregate scale paths (SURVEY.md §7: at 100 TB the exact
percentile / count-distinct shuffles all values; the mergeable-sketch
forms are the production path). These tests pin the accuracy contract:
approx results land within the documented error of the exact ones on
real testdata — so swapping exact -> approx at scale is a config change,
not a semantics change."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_approx_count_distinct_within_rsd(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    exact, approx = ev.agg(
        F.countDistinct("user_id").alias("e"),
        F.approx_count_distinct("user_id", rsd=0.05).alias("a")).first()
    assert abs(approx - exact) <= max(3.0, 0.15 * exact)


def test_approx_percentile_within_accuracy(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    exact, approx = li.agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("e"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("a")).first()
    assert abs(approx - exact) / exact < 0.01
