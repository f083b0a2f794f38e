"""SQL-string frontend.

The reference has no SQL surface (SURVEY.md §3: "the frontend is the
PySpark DataFrame DSL itself"); this engine exposes one anyway — the
testdata tables registered as temp views over the schema-enforced scans,
so any ANSI query runs via ``spark.sql`` with the same pushdown/pruning
as the DataFrame path (temp views are lazy plan aliases, not
materializations; Catalyst sees straight through them).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from hdfs_with_pyspark_spark.sources.io import read_table

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def register_views(spark: SparkSession, sf_dir: str,
                   tables: list[str] | None = None) -> None:
    """Register every testdata table as a temp view named after itself."""
    for name in tables or TABLES:
        read_table(spark, sf_dir, name).createOrReplaceTempView(name)


def sql(spark: SparkSession, sf_dir: str, query: str):
    """Run one SQL string against the registered views."""
    register_views(spark, sf_dir)
    return spark.sql(query)
