"""salted_join must be result-identical to a plain join on skewed data."""

from __future__ import annotations

from pyspark.sql import functions as F

from hdfs_with_pyspark_spark.operators.skew import salted_join


def _skewed_frames(spark):
    # 90% of left rows share one hot key
    left = spark.range(2000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 100)
         .alias("k"),
        F.col("id").alias("payload"))
    right = spark.range(100).select(
        F.col("id").alias("k"),
        (F.col("id") * 2).alias("attr"))
    return left, right


def test_salted_inner_join_matches_plain(spark):
    left, right = _skewed_frames(spark)
    plain = sorted(map(tuple, left.join(right, ["k"]).collect()))
    salted = sorted(map(tuple, salted_join(left, right, ["k"], n_salts=8).collect()))
    assert salted == plain
    assert len(plain) == 2000  # every left row matched exactly once


def test_salted_left_join_keeps_unmatched(spark):
    left, right = _skewed_frames(spark)
    right_small = right.where(F.col("k") < 50)
    plain = sorted(map(tuple, left.join(right_small, ["k"], "left").collect()))
    salted = sorted(map(tuple,
                        salted_join(left, right_small, ["k"], n_salts=8,
                                    how="left").collect()))
    assert salted == plain


def test_salt_column_never_leaks(spark):
    left, right = _skewed_frames(spark)
    out = salted_join(left, right, ["k"])
    assert "__salt" not in out.columns
