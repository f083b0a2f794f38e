"""Registered table-maintenance queries (MERGE upsert, SCD2).

Deterministic update batches derived from the customer dimension itself
(every 7th key gets +100 balance, three literal inserts) so the merge
semantics are oracle-checkable without external state. The write-back
side of the operators is round-trip-tested in tests/ (parquet sink +
re-read); the registered queries prove the merge JOIN semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdfs_with_pyspark_spark.operators.merge import merge_upsert, scd2_apply
from hdfs_with_pyspark_spark.plans.registry import register, ensure_session
from hdfs_with_pyspark_spark.sources.io import read_table

NEW_ROWS = [(900001, "NEW_CUST_1", 10.0),
            (900002, "NEW_CUST_2", 20.5),
            (900003, "NEW_CUST_3", 0.0)]
_SQL_NEW = ", ".join(f"({k}, '{n}', {b})" for k, n, b in NEW_ROWS)


def _update_batch(cust: DataFrame) -> DataFrame:
    """Every 7th customer with +100 balance, plus three inserts."""
    mod = (cust.where(F.col("c_custkey") % 7 == 0)
               .select("c_custkey", "c_name",
                       F.round(F.col("c_acctbal") + 100, 2).alias("c_acctbal")))
    spark = cust.sparkSession
    new = spark.createDataFrame(NEW_ROWS, "c_custkey long, c_name string, "
                                          "c_acctbal double")
    return mod.unionByName(new)


@register("customers_upsert", oracle=f"""
WITH src AS (
  SELECT c_custkey, c_name, ROUND(c_acctbal + 100, 2) AS c_acctbal
  FROM customer WHERE c_custkey % 7 = 0
  UNION ALL
  SELECT * FROM (VALUES {_SQL_NEW}) v(c_custkey, c_name, c_acctbal)),
t AS (SELECT c_custkey, c_name, ROUND(c_acctbal, 2) AS c_acctbal
      FROM customer)
SELECT COALESCE(s.c_custkey, t.c_custkey) AS c_custkey,
       CASE WHEN s.c_custkey IS NOT NULL THEN s.c_name
            ELSE t.c_name END AS c_name,
       CASE WHEN s.c_custkey IS NOT NULL THEN s.c_acctbal
            ELSE t.c_acctbal END AS c_acctbal,
       (s.c_custkey IS NOT NULL) AS updated
FROM t FULL OUTER JOIN src s ON s.c_custkey = t.c_custkey
""")
def customers_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD1 merge of a deterministic update batch into customers.

    One full-outer shuffle join on the key — with a bucketed target only
    the batch side moves; under AQE a small batch broadcasts.
    """
    ensure_session(spark)
    cust = (read_table(spark, sf_dir, "customer")
            .select("c_custkey", "c_name",
                    F.round("c_acctbal", 2).alias("c_acctbal")))
    return merge_upsert(cust, _update_batch(cust), key="c_custkey")


@register("customers_scd2", oracle=f"""
WITH src AS (
  SELECT c_custkey, c_name, ROUND(c_acctbal + 100, 2) AS c_acctbal
  FROM customer WHERE c_custkey % 7 = 0
  UNION ALL
  SELECT * FROM (VALUES {_SQL_NEW}) v(c_custkey, c_name, c_acctbal)),
dim AS (SELECT c_custkey, c_name, ROUND(c_acctbal, 2) AS c_acctbal,
               CAST(1 AS BIGINT) AS version, TRUE AS is_current
        FROM customer)
SELECT c_custkey, c_name, c_acctbal, version,
       CASE WHEN c_custkey IN (SELECT c_custkey FROM src)
            THEN FALSE ELSE is_current END AS is_current
FROM dim
UNION ALL
SELECT s.c_custkey, s.c_name, s.c_acctbal,
       CASE WHEN d.c_custkey IS NULL THEN 1 ELSE 2 END AS version,
       TRUE AS is_current
FROM src s LEFT JOIN (SELECT DISTINCT c_custkey FROM dim) d
  ON d.c_custkey = s.c_custkey
""")
def customers_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 application of the same batch onto a version-1 dimension:
    updated keys close their current row and append version 2; the
    three new keys insert at version 1."""
    ensure_session(spark)
    cust = (read_table(spark, sf_dir, "customer")
            .select("c_custkey", "c_name",
                    F.round("c_acctbal", 2).alias("c_acctbal"),
                    F.lit(1).cast("long").alias("version"),
                    F.lit(True).alias("is_current")))
    return scd2_apply(cust, _update_batch(cust), key="c_custkey")
