"""Bucketed-table co-located join: the pre-shuffle trade for repeated
big-big joins (SURVEY.md §7; the 100 TB answer when neither side
broadcasts and the same key joins run nightly).

Writing both sides bucketed+sorted on the join key lets the sort-merge
join consume the buckets directly — the plan must contain NO Exchange.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_exchange(spark, tmp_path, no_broadcast):
    left = spark.range(10_000).select(F.col("id").alias("k"),
                                      (F.col("id") * 3).alias("a"))
    right = spark.range(5_000).select(F.col("id").alias("k"),
                                      (F.col("id") + 1).alias("b"))
    for name, df in (("bkt_left", left), ("bkt_right", right)):
        (df.write.mode("overwrite")
           .option("path", str(tmp_path / name))
           .bucketBy(8, "k").sortBy("k")
           .saveAsTable(name))
    try:
        joined = spark.table("bkt_left").join(spark.table("bkt_right"), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan            # buckets line up: no shuffle
        assert "SortMergeJoin" in plan
        assert joined.count() == 5_000
    finally:
        for name in ("bkt_left", "bkt_right"):
            spark.sql(f"DROP TABLE IF EXISTS {name}")
